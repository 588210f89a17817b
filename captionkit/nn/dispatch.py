"""Kernel dispatch: pure-jnp reference cells vs fused Pallas kernels.

Models never import kernels directly; they ask this module for the cell
functions given the config. That keeps one numeric interface with two
backends (SURVEY.md §8.1 step 9: "swap in behind the nn interface") and lets
the parity tests diff them.
"""

from __future__ import annotations

from typing import Callable

from captionkit.nn import attention as _att
from captionkit.nn import cells as _cells


def _pallas_available() -> bool:
    try:
        from captionkit.ops import pallas_supported

        return pallas_supported()
    except Exception:
        return False


def get_lstm_cell_fn(use_pallas: bool = False) -> Callable:
    if use_pallas and _pallas_available():
        from captionkit.ops.lstm import fused_lstm_cell

        return fused_lstm_cell
    return _cells.lstm_cell


def get_copy_lstm_cell_fn(use_pallas: bool = False) -> Callable:
    if use_pallas and _pallas_available():
        from captionkit.ops.lstm import fused_copy_lstm_cell

        return fused_copy_lstm_cell
    return _cells.copy_lstm_cell


def get_attention_fn(use_pallas: bool = False) -> Callable:
    if use_pallas and _pallas_available():
        from captionkit.ops.attention import fused_additive_attention

        return fused_additive_attention
    return _att.additive_attention
