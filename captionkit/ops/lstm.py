"""Fused Pallas TPU kernels for the LSTM and Copy-LSTM cells.

The reference's recurrent math runs inside cuDNN's fused LSTM kernels
(SURVEY.md §3.5 'Intra-op kernels' row); these are the TPU-native
replacement. One ``pallas_call`` per cell step computes, entirely in VMEM:

    z_g   = x @ Wx[g] + h @ Wh[g] + b[g]      (4 gate matmuls on the MXU)
    c'    = σ(f)·c + σ(i)·tanh(g)             (VPU)
    h'    = σ(o)·tanh(c')                     (VPU)

and for the Copy-LSTM additionally the copy gate
    r  = σ(x @ Wrx + h @ Wrh + c* @ Wrc + br)
    c' = r·c* + (1-r)·c_gen

Layout decisions (see pallas_guide.md):
* Weights are pre-reshaped once per call to gate-major [4, D, H] so a
  single grid step owns an H-tile of ALL four gates — the fusion point the
  (i|f|g|o)-concatenated [D, 4H] layout would break.
* Grid = (H/TH, B/TB) with the batch dim minor, so weight blocks (index
  depends only on the H tile) stay resident in VMEM across the inner batch
  sweep.
* Matmuls run in the input dtype (bf16 by default from the models) with
  fp32 accumulation (`preferred_element_type`); gate math is fp32.
* Shapes are padded to (8, 128)-aligned tiles by the caller wrapper; the
  grid covers the padded space and the wrapper slices the result.

Numerics must match captionkit.nn.cells bit-closely; tests/test_ops_pallas.py
diffs them on every shape class (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from captionkit.nn.cells import CopyLSTMParams, LSTMParams


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_axis(x: jax.Array, axis: int, target: int) -> jax.Array:
    pad = target - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pick_tiles(B: int, H: int) -> tuple[int, int]:
    tb = min(_round_up(B, 8), 256)
    th = min(_round_up(H, 128), 512)
    return tb, th


# ---------------------------------------------------------------------------
# Standard LSTM cell
# ---------------------------------------------------------------------------


def _lstm_kernel(x_ref, h_ref, c_ref, wx_ref, wh_ref, b_ref,
                 h_out_ref, c_out_ref):
    x = x_ref[...]
    h = h_ref[...]
    dt = jnp.float32

    def gate(g):
        return (
            jnp.dot(x, wx_ref[g], preferred_element_type=dt)
            + jnp.dot(h, wh_ref[g], preferred_element_type=dt)
            + b_ref[g][None, :].astype(dt)
        )

    i = jax.nn.sigmoid(gate(0))
    f = jax.nn.sigmoid(gate(1))
    g = jnp.tanh(gate(2))
    o = jax.nn.sigmoid(gate(3))
    c_new = f * c_ref[...].astype(dt) + i * g
    h_out_ref[...] = (o * jnp.tanh(c_new)).astype(h_out_ref.dtype)
    c_out_ref[...] = c_new.astype(c_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "compute_dtype"))
def fused_lstm_cell(
    params: LSTMParams,
    x: jax.Array,  # [B, D]
    h: jax.Array,  # [B, H]
    c: jax.Array,  # [B, H]
    *,
    compute_dtype: jnp.dtype = jnp.float32,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in fused twin of captionkit.nn.cells.lstm_cell."""
    B, D = x.shape
    H = h.shape[1]
    dt = compute_dtype
    TB, TH = _pick_tiles(B, H)
    Bp, Dp, Hp = _round_up(B, TB), _round_up(D, 128), _round_up(H, TH)

    wx = params.wx.reshape(D, 4, H).transpose(1, 0, 2).astype(dt)  # [4,D,H]
    wh = params.wh.reshape(H, 4, H).transpose(1, 0, 2).astype(dt)
    b = params.b.reshape(4, H)

    xp = _pad_axis(_pad_axis(x.astype(dt), 1, Dp), 0, Bp)
    hp = _pad_axis(_pad_axis(h.astype(dt), 1, Hp), 0, Bp)
    cp = _pad_axis(_pad_axis(c, 1, Hp), 0, Bp)
    wxp = _pad_axis(_pad_axis(wx, 1, Dp), 2, Hp)
    whp = _pad_axis(_pad_axis(wh, 1, Hp), 2, Hp)
    bp = _pad_axis(b, 1, Hp)

    grid = (Hp // TH, Bp // TB)
    h_new, c_new = pl.pallas_call(
        _lstm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, Dp), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((TB, Hp), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),  # h (full H for matmul)
            pl.BlockSpec((TB, TH), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),  # c tile
            pl.BlockSpec((4, Dp, TH), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),  # wx
            pl.BlockSpec((4, Hp, TH), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),  # wh
            pl.BlockSpec((4, TH), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),  # b
        ],
        out_specs=[
            pl.BlockSpec((TB, TH), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, TH), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
        ],
        interpret=interpret,
    )(xp, hp, cp, wxp, whp, bp)
    return h_new[:B, :H], c_new[:B, :H]


# ---------------------------------------------------------------------------
# Copy-LSTM cell (SCMA-selected memory blended via the copy gate)
# ---------------------------------------------------------------------------


def _copy_lstm_kernel(x_ref, h_ref, c_ref, cstar_ref, wx_ref, wh_ref, b_ref,
                      wr_ref, br_ref, h_out_ref, c_out_ref):
    x = x_ref[...]
    h = h_ref[...]
    c_star_full = cstar_ref[...]  # [TB, Hp] (full H: needed for Wrc matmul)
    dt = jnp.float32

    def gate(g):
        return (
            jnp.dot(x, wx_ref[g], preferred_element_type=dt)
            + jnp.dot(h, wh_ref[g], preferred_element_type=dt)
            + b_ref[g][None, :].astype(dt)
        )

    i = jax.nn.sigmoid(gate(0))
    f = jax.nn.sigmoid(gate(1))
    g = jnp.tanh(gate(2))
    o = jax.nn.sigmoid(gate(3))
    c_gen = f * c_ref[...].astype(dt) + i * g

    # Copy gate: wr_ref packs [Wrx; Wrh; Wrc] stacked on the contraction dim
    # so it rides one MXU matmul: r = σ([x|h|c*] @ Wr + br).
    xyz = jnp.concatenate([x, h, c_star_full], axis=-1)
    r = jax.nn.sigmoid(
        jnp.dot(xyz, wr_ref[...], preferred_element_type=dt)
        + br_ref[0][None, :].astype(dt)
    )
    j = pl.program_id(0)
    th = c_ref.shape[1]
    c_star_tile = jax.lax.dynamic_slice_in_dim(
        c_star_full.astype(dt), j * th, th, axis=1
    )
    c_new = r * c_star_tile + (1.0 - r) * c_gen
    h_out_ref[...] = (o * jnp.tanh(c_new)).astype(h_out_ref.dtype)
    c_out_ref[...] = c_new.astype(c_out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "compute_dtype"))
def fused_copy_lstm_cell(
    params: CopyLSTMParams,
    x: jax.Array,  # [B, D]
    h: jax.Array,  # [B, H]
    c: jax.Array,  # [B, H]
    c_star: jax.Array,  # [B, H]
    *,
    compute_dtype: jnp.dtype = jnp.float32,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in fused twin of captionkit.nn.cells.copy_lstm_cell."""
    B, D = x.shape
    H = h.shape[1]
    dt = compute_dtype
    TB, TH = _pick_tiles(B, H)
    Bp, Dp, Hp = _round_up(B, TB), _round_up(D, 128), _round_up(H, TH)

    wx = params.base.wx.reshape(D, 4, H).transpose(1, 0, 2).astype(dt)
    wh = params.base.wh.reshape(H, 4, H).transpose(1, 0, 2).astype(dt)
    b = params.base.b.reshape(4, H)
    # Stack the three copy-gate kernels along the contraction dim, padded
    # per segment so the packed layout matches [x | h | c*].
    wr = jnp.concatenate(
        [
            _pad_axis(params.wrx.astype(dt), 0, Dp),
            _pad_axis(params.wrh.astype(dt), 0, Hp),
            _pad_axis(params.wrc.astype(dt), 0, Hp),
        ],
        axis=0,
    )  # [Dp + 2Hp, H]

    xp = _pad_axis(_pad_axis(x.astype(dt), 1, Dp), 0, Bp)
    hp = _pad_axis(_pad_axis(h.astype(dt), 1, Hp), 0, Bp)
    cp = _pad_axis(_pad_axis(c, 1, Hp), 0, Bp)
    csp = _pad_axis(_pad_axis(c_star.astype(dt), 1, Hp), 0, Bp)
    wxp = _pad_axis(_pad_axis(wx, 1, Dp), 2, Hp)
    whp = _pad_axis(_pad_axis(wh, 1, Hp), 2, Hp)
    bp = _pad_axis(b, 1, Hp)
    wrp = _pad_axis(wr, 1, Hp)
    brp = _pad_axis(params.br, 0, Hp)[None, :]
    K = Dp + 2 * Hp

    grid = (Hp // TH, Bp // TB)
    h_new, c_new = pl.pallas_call(
        _copy_lstm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, Dp), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((TB, Hp), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),  # h
            pl.BlockSpec((TB, TH), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),  # c tile
            pl.BlockSpec((TB, Hp), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),  # c_star (full H)
            pl.BlockSpec((4, Dp, TH), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),  # wx
            pl.BlockSpec((4, Hp, TH), lambda j, i: (0, 0, j),
                         memory_space=pltpu.VMEM),  # wh
            pl.BlockSpec((4, TH), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),  # b
            pl.BlockSpec((K, TH), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),  # wr packed
            pl.BlockSpec((1, TH), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),  # br
        ],
        out_specs=[
            pl.BlockSpec((TB, TH), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, TH), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
        ],
        interpret=interpret,
    )(xp, hp, cp, csp, wxp, whp, bp, wrp, brp)
    return h_new[:B, :H], c_new[:B, :H]
