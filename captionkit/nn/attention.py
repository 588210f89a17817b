"""Additive (Bahdanau) attention and SCMA selection.

Reference semantics (SURVEY.md §3.2, §4.2; paper §3):

* Visual attention (Up-Down style): score_i = wᵀ tanh(W_e e_i + W_q q),
  α = softmax(score), ctx = Σ α_i e_i over the 36 region features. The same
  module attends over DCNet's encoder hidden states.
* **SCMA**: the same additive scoring over the *caption encoder's hidden
  states* {h_i}, but what is returned is a selection over the corresponding
  *cell states* {c_i} — the memory pool the Copy-LSTM may copy
  (SURVEY.md §4.2 'SCMA' frame). Selection mode is configurable
  (SURVEY.md §8.3 hard-part #1):
    - "soft": c* = Σ β_i c_i (differentiable everywhere)
    - "hard": c* = c_argmax(β) with a straight-through estimator so the
      score MLP still receives gradient.

TPU notes: keys are pre-projected once per sequence (W_e e_i is hoisted out
of the decode loop into the model's `encode`), so the per-step cost is one
[B,H]x[H,A] matmul + a fused VPU tanh/softmax — a prime Pallas fusion
candidate (captionkit.ops.attention).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from captionkit.nn.masking import NEG_INF, mask_logits


@struct.dataclass
class AdditiveAttentionParams:
    w_enc: Any  # [enc_dim, A]   key projection (precomputable)
    w_q: Any  # [q_dim, A]       query projection
    v: Any  # [A]                score vector
    b: Any  # [A]                bias inside tanh


def init_additive_attention(
    key, enc_dim: int, q_dim: int, att_dim: int
) -> AdditiveAttentionParams:
    k1, k2, k3 = jax.random.split(key, 3)
    s_e = 1.0 / jnp.sqrt(enc_dim)
    s_q = 1.0 / jnp.sqrt(q_dim)
    s_a = 1.0 / jnp.sqrt(att_dim)
    u = jax.random.uniform
    return AdditiveAttentionParams(
        w_enc=u(k1, (enc_dim, att_dim), jnp.float32, -s_e, s_e),
        w_q=u(k2, (q_dim, att_dim), jnp.float32, -s_q, s_q),
        v=u(k3, (att_dim,), jnp.float32, -s_a, s_a),
        b=jnp.zeros((att_dim,), jnp.float32),
    )


def project_keys(
    params: AdditiveAttentionParams,
    enc: jax.Array,  # [B, N, enc_dim]
    *,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Hoist W_e·e_i out of the decode loop: [B, N, A]."""
    dt = compute_dtype
    return jnp.einsum(
        "bne,ea->bna", enc.astype(dt), params.w_enc.astype(dt),
        preferred_element_type=jnp.float32,
    )


def additive_attention(
    params: AdditiveAttentionParams,
    keys: jax.Array,  # [B, N, A]   pre-projected (project_keys)
    values: jax.Array,  # [B, N, V] what gets mixed (features / enc states)
    query: jax.Array,  # [B*G, q_dim] — G > 1 is the grouped (beam) form
    mask: Optional[jax.Array] = None,  # [B, N] bool, True = attendable
    *,
    compute_dtype: jnp.dtype = jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Returns (context [B*G, V], weights [B*G, N]).

    Grouped queries: when the query batch is G× the key batch (beam search
    flattens B images × K beams into B*K queries over per-image context),
    keys/values stay UNREPLICATED — the K-fold HBM traffic and memory of
    repeating 36×2048 features per beam was the dominant decode cost.
    Rows of a group must be contiguous (beam b*K..b*K+K-1), which is how
    decode/beam.py lays them out.
    """
    dt = compute_dtype
    kB = keys.shape[0]
    qB = query.shape[0]
    q = jnp.dot(query.astype(dt), params.w_q.astype(dt),
                preferred_element_type=jnp.float32)  # [qB, A]
    if qB == kB:
        e = jnp.tanh(keys + q[:, None, :] + params.b)  # [B, N, A]
        scores = jnp.einsum("bna,a->bn", e, params.v)  # fp32
        if mask is not None:
            scores = mask_logits(scores, mask)
        weights = jax.nn.softmax(scores, axis=-1)  # [B, N]
        ctx = jnp.einsum(
            "bn,bnv->bv", weights.astype(values.dtype), values,
            preferred_element_type=jnp.float32,
        )
        return ctx, weights
    if qB % kB:
        raise ValueError(
            f"query batch {qB} is not a multiple of key batch {kB}"
        )
    G = qB // kB
    qg = q.reshape(kB, G, -1)
    e = jnp.tanh(keys[:, None, :, :] + qg[:, :, None, :] + params.b)
    scores = jnp.einsum("bgna,a->bgn", e, params.v)
    if mask is not None:
        scores = mask_logits(scores, mask[:, None, :])
    weights = jax.nn.softmax(scores, axis=-1)  # [B, G, N]
    ctx = jnp.einsum(
        "bgn,bnv->bgv", weights.astype(values.dtype), values,
        preferred_element_type=jnp.float32,
    )
    return ctx.reshape(qB, -1), weights.reshape(qB, scores.shape[-1])


def scma_select(
    params: AdditiveAttentionParams,
    keys: jax.Array,  # [B, T, A]  pre-projected encoder hidden states
    memories: jax.Array,  # [B, T, H] encoder CELL states (the copy pool)
    query: jax.Array,  # [B, q_dim]
    mask: Optional[jax.Array] = None,  # [B, T]
    *,
    mode: str = "soft",
    compute_dtype: jnp.dtype = jnp.float32,
    attention_fn=None,  # kernel override (captionkit.nn.dispatch)
) -> tuple[jax.Array, jax.Array]:
    """Selective Copy Memory Attention: score {h_i} with the decoder query,
    select from {c_i}. Returns (c_star [B, H], weights [B, T])."""
    attn = attention_fn or additive_attention
    ctx_soft, weights = attn(
        params, keys, memories, query, mask, compute_dtype=compute_dtype
    )
    if mode == "soft":
        # The attention read over `memories` as values IS the soft select.
        c_star = ctx_soft
    elif mode == "hard":
        # Straight-through: forward = gather at argmax; backward = soft mix.
        idx = jnp.argmax(weights, axis=-1).astype(jnp.int32)  # [qB]
        kB = memories.shape[0]
        qB = idx.shape[0]
        G = qB // kB
        hard = jnp.take_along_axis(
            memories,
            idx.reshape(kB, G)[:, :, None],
            axis=1,
        ).reshape(qB, -1)
        c_star = ctx_soft + jax.lax.stop_gradient(hard - ctx_soft)
    else:
        raise ValueError(f"unknown SCMA mode {mode!r}")
    return c_star, weights
