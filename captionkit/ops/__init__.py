"""Pallas TPU kernels for the hot cells (SURVEY.md §3.5 'Intra-op kernels').

The reference's native math lives in cuDNN's fused LSTM; these kernels are
its TPU-native replacement. Every kernel has a pure-jnp twin in
``captionkit.nn`` and a parity test in ``tests/test_ops_pallas.py``.
"""

from __future__ import annotations

import functools

import jax


@functools.cache
def pallas_supported() -> bool:
    """True when the default backend can run our Mosaic TPU kernels."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False
