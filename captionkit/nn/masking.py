"""Device-side masking helpers (static shapes everywhere)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def length_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """[B] int lengths -> [B, max_len] bool (True = real token)."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def mask_logits(logits: jax.Array, mask: jax.Array) -> jax.Array:
    """Set masked positions to NEG_INF (softmax-safe)."""
    return jnp.where(mask, logits, NEG_INF)


def masked_cross_entropy(
    logits: jax.Array,  # [B, T, V]
    targets: jax.Array,  # [B, T] int32
    mask: jax.Array,  # [B, T] bool/float — which steps count
    *,
    label_smoothing: float = 0.0,
) -> jax.Array:
    """Token-mean masked CE (the reference's pack_padded CE, SURVEY.md §3.2
    'Output head'). Log-softmax in fp32."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    mask = mask.astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def top5_accuracy(
    logits: jax.Array, targets: jax.Array, mask: jax.Array
) -> jax.Array:
    """Reference training loops report top-5 word accuracy
    (SURVEY.md §6 metrics row).

    Computed as a rank check — the target is top-5 iff fewer than 5 logits
    strictly exceed it — which is one compare+reduce over V instead of a
    top_k sort of [B, T, V] (the sort cost ~40% of the whole train step at
    paper scale; docs/DESIGN.md round 2)."""
    tgt = jnp.take_along_axis(logits, targets[..., None], axis=-1)
    rank = jnp.sum((logits > tgt).astype(jnp.int32), axis=-1)  # [B, T]
    hit = rank < 5
    mask = mask.astype(jnp.float32)
    return jnp.sum(hit * mask) / jnp.maximum(jnp.sum(mask), 1.0)
