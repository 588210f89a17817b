"""Fused Pallas TPU kernels for the LSTM and Copy-LSTM cells.

The reference's recurrent math runs inside cuDNN's fused LSTM kernels
(SURVEY.md §3.5 'Intra-op kernels' row); these are the TPU-native
replacement. One ``pallas_call`` per cell step computes, entirely in VMEM:

    z_g   = [x|h] @ W[g] + b[g]               (gate matmuls on the MXU)
    c'    = σ(f)·c + σ(i)·tanh(g)             (VPU)
    h'    = σ(o)·tanh(c')                     (VPU)

and for the Copy-LSTM additionally the copy gate
    r  = σ([x|h|c*] @ W[4] + br)
    c' = r·c* + (1-r)·c_gen

Layout decisions (see pallas_guide.md):
* The input and recurrent kernels are packed once per call into one
  gate-major weight [G, K, H] over the concatenated contraction
  [x|h(|c*)], so each gate is exactly one MXU contraction.
* The grid is (H-tiles, B-tiles, K-tiles) with K innermost: gate partial
  sums accumulate in an fp32 VMEM scratch across K steps (the canonical
  Pallas matmul accumulation pattern), and the nonlinear state update runs
  once on the final K step. This keeps every resident block small enough
  for the ~16MB VMEM budget at paper scale (D=4096, H=1024) — one big
  [K, H] weight block cannot fit, which is why the contraction must tile.
* For the Copy-LSTM the i/f/g/o gate rows covering c* are zero, so one
  packed weight serves all five gates with identical contraction bounds.
* Matmuls run in compute_dtype (bf16 from the model configs) with fp32
  accumulation; gate math is fp32.

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

VMEM_BUDGET = 10 * 1024 * 1024  # headroom under the ~16MB/core limit


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_axis(x: jax.Array, axis: int, target: int) -> jax.Array:
    pad = target - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pick_tiles(
    B: int, K: int, H: int, itemsize: int, n_gates: int
) -> tuple[int, int, int]:
    """(TB, TH, TK) such that double-buffered blocks + the fp32 gate
    accumulator fit the VMEM budget."""
    for th in (256, 128):
        for tb in (512, 256, 128, 64, 32, 16, 8):
            for tk in (1024, 512, 256, 128):
                xh = tb * tk * itemsize
                w = n_gates * tk * th * itemsize
                state = tb * th * 4  # c tile (fp32)
                outs = 2 * tb * th * 4
                acc = n_gates * tb * th * 4  # scratch, single-buffered
                total = 2 * (xh + w + state + outs) + acc
                if total <= VMEM_BUDGET:
                    return (
                        min(tb, _round_up(B, 8)),
                        min(th, _round_up(H, 128)),
                        min(tk, _round_up(K, 128)),
                    )
    return 8, 128, 128


def _make_cell_kernel(n_gates: int, copy_gate: bool):
    """Shared kernel body for LSTM (4 gates) and Copy-LSTM (5 gates)."""

    def kernel(xh_ref, c_ref, cstar_ref, w_ref, b_ref,
               h_out_ref, c_out_ref, acc_ref):
        k = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        xh = xh_ref[...]
        # Load the 3-D weight block once, slice per gate as an ARRAY (a
        # 3-D ref slice fed straight into dot produces dimension numbers
        # Mosaic's TPU dot lowering rejects).
        w_all = w_ref[...]
        for g in range(n_gates):
            acc_ref[g] += jnp.dot(
                xh, w_all[g], preferred_element_type=jnp.float32
            )

        @pl.when(k == nk - 1)
        def _():
            i = jax.nn.sigmoid(acc_ref[0] + b_ref[0][None, :])
            f = jax.nn.sigmoid(acc_ref[1] + b_ref[1][None, :])
            g = jnp.tanh(acc_ref[2] + b_ref[2][None, :])
            o = jax.nn.sigmoid(acc_ref[3] + b_ref[3][None, :])
            c_gen = f * c_ref[...].astype(jnp.float32) + i * g
            if copy_gate:
                r = jax.nn.sigmoid(acc_ref[4] + b_ref[4][None, :])
                c_star = cstar_ref[...].astype(jnp.float32)
                c_new = r * c_star + (1.0 - r) * c_gen
            else:
                c_new = c_gen
            h_out_ref[...] = (o * jnp.tanh(c_new)).astype(h_out_ref.dtype)
            c_out_ref[...] = c_new.astype(c_out_ref.dtype)

    return kernel


def _run_cell(
    xh: jax.Array,  # [B, K] packed inputs (already compute_dtype)
    c: jax.Array,  # [B, H] fp32
    c_star,  # [B, H] or None
    w: jax.Array,  # [G, K, H] packed gate-major weights (compute_dtype)
    b: jax.Array,  # [G, H] fp32
    *,
    interpret: bool,
) -> tuple[jax.Array, jax.Array]:
    B, K = xh.shape
    G, _, H = w.shape
    copy_gate = c_star is not None
    TB, TH, TK = _pick_tiles(B, K, H, xh.dtype.itemsize, G)
    Bp = _round_up(B, TB)
    Kp = _round_up(K, TK)
    Hp = _round_up(H, TH)

    xh_p = _pad_axis(_pad_axis(xh, 1, Kp), 0, Bp)
    c_p = _pad_axis(_pad_axis(c, 1, Hp), 0, Bp)
    cs_p = (
        _pad_axis(_pad_axis(c_star, 1, Hp), 0, Bp)
        if copy_gate
        else jnp.zeros((Bp, Hp), c.dtype)
    )
    w_p = _pad_axis(_pad_axis(w, 1, Kp), 2, Hp)
    b_p = _pad_axis(b, 1, Hp)

    grid = (Hp // TH, Bp // TB, Kp // TK)
    h_new, c_new = pl.pallas_call(
        _make_cell_kernel(G, copy_gate),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, TK), lambda j, i, k: (i, k),
                         memory_space=pltpu.VMEM),  # xh
            pl.BlockSpec((TB, TH), lambda j, i, k: (i, j),
                         memory_space=pltpu.VMEM),  # c
            pl.BlockSpec((TB, TH), lambda j, i, k: (i, j),
                         memory_space=pltpu.VMEM),  # c_star
            pl.BlockSpec((G, TK, TH), lambda j, i, k: (0, k, j),
                         memory_space=pltpu.VMEM),  # w
            pl.BlockSpec((G, TH), lambda j, i, k: (0, j),
                         memory_space=pltpu.VMEM),  # b
        ],
        out_specs=[
            pl.BlockSpec((TB, TH), lambda j, i, k: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, TH), lambda j, i, k: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((G, TB, TH), jnp.float32)],
        interpret=interpret,
    )(xh_p, c_p, cs_p, w_p, b_p)
    return h_new[:B, :H], c_new[:B, :H]


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
    dt = compute_dtype
    D = x.shape[1]
    H = h.shape[1]
    xh = jnp.concatenate([x.astype(dt), h.astype(dt)], axis=1)  # [B, D+H]
    # [D+H, 4H] -> gate-major [4, D+H, H]
    w = (
        jnp.concatenate([params.wx, params.wh], axis=0)
        .reshape(D + H, 4, H)
        .transpose(1, 0, 2)
        .astype(dt)
    )
    b = params.b.reshape(4, H).astype(jnp.float32)
    return _run_cell(xh, c, None, w, b, interpret=interpret)


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
    """Drop-in fused twin of captionkit.nn.cells.copy_lstm_cell.

    Packs [x|h|c*] as one contraction; gates i/f/g/o get zero weights on
    the c* rows (c* feeds only the copy gate), so all five gates share one
    accumulation loop with no extra control flow.
    """
    dt = compute_dtype
    D = x.shape[1]
    H = h.shape[1]
    xhc = jnp.concatenate(
        [x.astype(dt), h.astype(dt), c_star.astype(dt)], axis=1
    )  # [B, D+2H]
    base = (
        jnp.concatenate([params.base.wx, params.base.wh], axis=0)
        .reshape(D + H, 4, H)
        .transpose(1, 0, 2)
    )  # [4, D+H, H]
    base = jnp.concatenate(
        [base, jnp.zeros((4, H, H), base.dtype)], axis=1
    )  # [4, D+2H, H]: c* rows are zero for i/f/g/o
    wr = jnp.concatenate(
        [params.wrx, params.wrh, params.wrc], axis=0
    )[None]  # [1, D+2H, H]
    w = jnp.concatenate([base, wr], axis=0).astype(dt)  # [5, D+2H, H]
    b = jnp.concatenate(
        [params.base.b.reshape(4, H), params.br.reshape(1, H)], axis=0
    ).astype(jnp.float32)
    return _run_cell(xhc, c, c_star, w, b, interpret=interpret)
