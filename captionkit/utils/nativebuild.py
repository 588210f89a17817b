"""One-shot, on-demand build of the native C++ helpers.

The repo does not commit binaries (they are host-specific: -march=native),
so a fresh checkout has no libcider.so / libfeatstore.so and the metric /
feature-store layers would silently fall back to their (much slower)
Python twins. The loaders call ensure_native_built() before giving up:
one quiet `make -C native` per process, disabled with
CAPTIONKIT_NO_NATIVE_BUILD=1 (e.g. sandboxed CI without a toolchain).
"""

from __future__ import annotations

import os
import subprocess

_attempted = False

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def ensure_native_built() -> bool:
    """Run `make -C native` once per process if allowed. Returns True if a
    build was attempted and succeeded (the caller should re-probe paths).

    Cross-process safe: concurrent workers on a fresh checkout (pytest
    workers, several benches) serialize on an flock'd lockfile so no
    process ever dlopens a half-linked .so."""
    global _attempted
    if _attempted or os.environ.get("CAPTIONKIT_NO_NATIVE_BUILD"):
        return False
    _attempted = True
    native = os.path.abspath(NATIVE_DIR)
    if not os.path.exists(os.path.join(native, "Makefile")):
        return False
    try:
        import fcntl

        with open(os.path.join(native, ".build.lock"), "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)  # released on close
            proc = subprocess.run(
                ["make", "-C", native],
                capture_output=True, timeout=120,
            )
            return proc.returncode == 0
    except (OSError, subprocess.TimeoutExpired):
        return False
