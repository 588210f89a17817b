"""Persistent XLA compilation cache.

First compiles of the paper-scale programs take minutes on this host
(remote-compile path); the persistent cache makes every later process
reuse them. Enabled by the CLI, bench.py, and __graft_entry__ — library
users opt in with enable_compilation_cache().
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at a writable directory
    (default: <repo>/.jax_cache or $CAPTIONKIT_CACHE_DIR). Safe to call
    multiple times."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "CAPTIONKIT_CACHE_DIR",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)
                ))),
                ".jax_cache",
            ),
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
