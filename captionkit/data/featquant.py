"""int8 feature feed: per-region symmetric quantization of bottom-up
region features for the host->device transfer.

Why this exists: on a transfer-bound host (the axon-tunnel chip this
project benches on, and any deployment where features arrive over a
network) the serving wall is H2D feature bytes, not compute —
bench_serve's sustained-load sweep saturates at 86-92% of the measured
pipe bandwidth. ``decode.feed_dtype="bfloat16"`` halves the bytes;
``"int8"`` halves them again: a [R, F] f32 row (36x2048 = 288 KiB)
ships as int8 q + one f32 scale per region (72 KiB + 144 B).

Scheme: symmetric per-region (per [b, r] row over the feature axis),
zero-point-free — dequantization is a single fused multiply on device.
scale = amax/127, q = clip(rint(x/scale), -127, 127). Bottom-up
Faster-R-CNN features are post-ReLU (non-negative), so symmetric
quantization spends one sign bit it doesn't strictly need; an
asymmetric scheme would buy <1 bit of precision at the cost of a
zero-point add in the hot dequant — not worth it (the quality cost of
the whole scheme is already measured at ~0% caption churn, see
examples/int8_quality_tradeoff.py --knob feed).

Element-wise error bound: |x - deq(q)| <= scale/2 + bf16 rounding
= amax * (1/254 + ~1/256) < 0.8% of the row's max magnitude.

Quantization runs on HOST (NumPy, before the transfer — that is the
point); dequantization runs ON DEVICE inside the jitted decode program,
straight to the bf16 grid the model computes its visual context in
anyway (models/editnet.py encode casts to bf16), so downstream numerics
match the bfloat16 feed path, not a third grid.

The reference has no serving surface at all (SURVEY.md §2 — offline
eval scripts only); this is deployment machinery the TPU rebuild adds.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

#: feed_dtype values the decode/serving surfaces accept.
FEED_DTYPES = ("float32", "bfloat16", "int8")


def quantize_features(feats: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host-side: [..., R, F] float features -> (q int8 [..., R, F],
    scale float32 [..., R]). Symmetric per-region; all-zero rows get
    scale 1.0 (q is then all zero, dequant exact)."""
    feats = np.asarray(feats, np.float32)
    amax = np.max(np.abs(feats), axis=-1)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(feats / scale[..., None]), -127, 127)
    return q.astype(np.int8), scale


def dequantize_features(q, scale):
    """Device-side (jit-traceable): (q int8, scale f32 [..., R]) ->
    bfloat16 features. f32 multiply, then one cast to the same bf16
    grid the bfloat16 feed path ships on."""
    import jax.numpy as jnp

    return (q.astype(jnp.float32) * scale[..., None]).astype(jnp.bfloat16)


def quantize_for_feed(
    feats: Optional[np.ndarray], feed_dtype: str
) -> Union[None, np.ndarray, tuple[np.ndarray, np.ndarray]]:
    """Host-side feed staging: cast to the feed dtype, or quantize to
    the (q, scale) pair when feed_dtype == "int8". None passes through
    (text-only DCNet batches carry no features)."""
    if feats is None:
        return None
    if feed_dtype == "int8":
        return quantize_features(feats)
    import jax.numpy as jnp

    dt = jnp.dtype(feed_dtype)
    return feats if feats.dtype == dt else feats.astype(dt)


def feed_to_device(staged):
    """jnp.asarray for a staged feed (array or (q, scale) pair)."""
    import jax.numpy as jnp

    if staged is None:
        return None
    if isinstance(staged, tuple):
        return tuple(jnp.asarray(x) for x in staged)
    return jnp.asarray(staged)


def dequantize_for_feed(features, feed_dtype: str):
    """In-jit entry: undo quantize_for_feed. For "int8" expects the
    (q, scale) pair and returns bf16 features; other dtypes pass
    through (the model's encode handles its own casts)."""
    if features is None or feed_dtype != "int8":
        return features
    q, scale = features
    return dequantize_features(q, scale)
