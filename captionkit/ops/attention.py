"""Fused Pallas TPU kernel for additive attention (visual + SCMA scoring).

One kernel fuses the whole per-step attention read (SURVEY.md §4.2 frames
2-3) over a batch tile, keeping the [TB, N, A] intermediate in VMEM:

    qa     = q @ Wq                       (MXU)
    e      = tanh(keys + qa[:, None] + b) (VPU, 3D)
    s      = e · v                        (reduction over A)
    w      = softmax(s + mask·-inf)       (VPU)
    ctx    = Σ_n w_n · values_n           (MXU, batched)

keys are pre-projected at encode time (captionkit.nn.attention.project_keys)
so the N×enc_dim matmul never enters the decode loop. The jnp twin is
captionkit.nn.attention.additive_attention; parity enforced in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from captionkit.nn.attention import AdditiveAttentionParams

NEG_INF = -1e9


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_axis(x: jax.Array, axis: int, target: int) -> jax.Array:
    pad = target - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _attention_kernel(keys_ref, values_ref, q_ref, wq_ref, v_ref, b_ref,
                      nvalid_ref, ctx_ref, w_ref):
    dt = jnp.float32
    qa = jnp.dot(q_ref[...], wq_ref[...], preferred_element_type=dt)
    e = jnp.tanh(keys_ref[...].astype(dt) + qa[:, None, :]
                 + b_ref[0][None, None, :].astype(dt))
    # Batched contractions are written as multiply+reduce: Mosaic cannot
    # lower einsum's batched dot_general forms, and with N<=~50 regions
    # these reductions are VPU work anyway.
    scores = jnp.sum(e * v_ref[0][None, None, :].astype(dt), axis=-1)
    TB, N = scores.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (TB, N), 1)
    scores = jnp.where(pos < nvalid_ref[...], scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    ew = jnp.exp(scores - m)
    w = ew / jnp.sum(ew, axis=-1, keepdims=True)
    ctx = jnp.sum(
        w[:, :, None] * values_ref[...].astype(dt), axis=1
    )
    ctx_ref[...] = ctx.astype(ctx_ref.dtype)
    w_ref[...] = w.astype(w_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "compute_dtype"))
def fused_additive_attention(
    params: AdditiveAttentionParams,
    keys: jax.Array,  # [B, N, A] pre-projected
    values: jax.Array,  # [B, N, V]
    query: jax.Array,  # [B, Q]
    mask: jax.Array | None = None,  # [B, N] bool (True = attendable)
    *,
    compute_dtype: jnp.dtype = jnp.float32,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in fused twin of captionkit.nn.attention.additive_attention."""
    B, N, A = keys.shape
    Vd = values.shape[-1]
    Q = query.shape[-1]
    dt = compute_dtype

    # CONTRACT: masks must be contiguous-prefix (length) masks — the only
    # kind this framework produces. The kernel reduces the mask to a
    # per-row valid count; a non-prefix mask would be silently reinterpreted
    # as its prefix of the same cardinality. Use the jnp twin
    # (nn.attention.additive_attention) for arbitrary masks.
    if mask is None:
        nvalid = jnp.full((B,), N, jnp.int32)
    else:
        nvalid = jnp.sum(mask.astype(jnp.int32), axis=-1)

    Np = _round_up(N, 8)
    Ap = _round_up(A, 128)
    Vp = _round_up(Vd, 128)
    Qp = _round_up(Q, 128)
    s = jnp.dtype(dt).itemsize
    # Fit double-buffered blocks in VMEM: keys/values dominate
    # (TB x Np x [Ap+Vp]); wq is grid-constant but still double-buffered.
    budget = 12 * 1024 * 1024
    TB = 8
    for tb in (256, 128, 64, 32, 16, 8):
        blocks = (
            tb * Np * Ap * s + tb * Np * Vp * s + tb * Qp * s
            + Qp * Ap * s + 2 * Ap * s + tb * 4
            + tb * Vp * 4 + tb * Np * 4  # fp32 outputs
        )
        if 2 * blocks <= budget:
            TB = tb
            break
    TB = min(TB, _round_up(B, 8))
    Bp = _round_up(B, TB)

    keys_p = _pad_axis(_pad_axis(_pad_axis(keys, 2, Ap), 1, Np), 0, Bp)
    vals_p = _pad_axis(_pad_axis(_pad_axis(values.astype(dt), 2, Vp), 1, Np),
                       0, Bp)
    q_p = _pad_axis(_pad_axis(query.astype(dt), 1, Qp), 0, Bp)
    wq_p = _pad_axis(_pad_axis(params.w_q.astype(dt), 0, Qp), 1, Ap)
    v_p = _pad_axis(params.v, 0, Ap)[None, :]
    b_p = _pad_axis(params.b, 0, Ap)[None, :]
    nvalid_p = _pad_axis(nvalid, 0, Bp)[:, None]

    grid = (Bp // TB,)
    ctx, w = pl.pallas_call(
        _attention_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, Np, Ap), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Np, Vp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Qp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Qp, Ap), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ap), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ap), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, Vp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, Np), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Vp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Np), jnp.float32),
        ],
        interpret=interpret,
    )(keys_p, vals_p, q_p, wq_p, v_p, b_p, nvalid_p)
    return ctx[:B, :Vd], w[:B, :N]
