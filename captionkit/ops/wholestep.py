"""Whole-step kernel: visual gate + Copy-LSTM + vocab head in ONE
pallas_call — the last untried fusion level of the decode step.

History (docs/DESIGN.md "the kernel story, settled"): rounds 1-3
measured every lower escalation level — isolated cells LOSE to XLA,
the fused vocab head WINS (+24%, default on), the two-kernel cell
megastep (ops/megastep.py) LOSES by ~120µs/step. Round 4 closed the
whole-step question by ARITHMETIC: a cells+head kernel is bounded by
the megastep measurement plus the only new saving — the [N, H]
inter-kernel HBM hop of the head input h (~26µs at paper scale) —
which lands below the XLA-cells band. The round-4 verdict accepted
that closure but flagged it as a transfer assumption, not a
measurement. THIS module is the measurement: the megastep lang kernel
(visual gate + Copy-LSTM) extended with the fused head's online
LSE/top-k body on a (row-block, vocab-tile) grid, so h_lang never
touches HBM between the cell and the head.

Grid: (Np // TN, Vp // TV), rows outer. At j == 0 the cell body runs
once per row block and parks h_lang (cast to compute dtype) in VMEM
scratch; every j then computes one [TN, TV] logits tile from scratch
and feeds the SAME _lse_topk_update the production head kernel uses —
numerics and tie-breaks are identical by construction.

Enabled by ModelConfig.cell_impl="wholestep" (beam decode, soft-SCMA
EditNet, float head only — every other path falls back like
cell_impl="pallas" does). Measured on chip in round 5, session 11:
see docs/DESIGN.md for the verdict this module exists to produce.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from captionkit.ops.head import _lse_topk_update, _pad_axis, _NEG
from captionkit.ops.megastep import (
    _VMEM_LIMIT,
    _pad_to,
    _round_up,
    CellPack,
    att_phase,
)

# Row-block / vocab-tile defaults: TN=512 matches both the megastep lang
# kernel's row block and the production head kernel's measured-fastest
# tile; TV=1024 matches the head. The lang weights (~44MB bf16 at paper
# scale) are grid-constant blocks loaded once; the head W streams per
# (row block, vocab tile) exactly as in ops/head.py.
_TN, _TV = 512, 1024


def _make_lang_head_kernel(dt, k: int, TV: int):
    def kernel(vhat_ref, h_att_ref, h_lang_ref, c_lang_ref, c_star_ref,
               gate_w_ref, gate_b_ref,
               lang_wv_ref, lang_wha_ref, lang_wh_ref, lang_b_ref,
               wr_v_ref, wr_ha_ref, wr_hl_ref, wr_c_ref, br_ref,
               head_w_ref, head_b_ref,
               h_lang_out, c_lang_out, vals_out, idx_out, lse_out,
               h_scr, run_vals, run_idx, run_m, run_s):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            # --- cell body: byte-for-byte the megastep lang kernel ----
            pf = jnp.float32
            h_att_dt = h_att_ref[...].astype(dt)
            h_lang_dt = h_lang_ref[...].astype(dt)
            gpre = (
                jnp.dot(h_att_dt, gate_w_ref[...],
                        preferred_element_type=pf)
                + gate_b_ref[...]
            )
            v_hat = (jax.nn.sigmoid(gpre) * vhat_ref[...]).astype(dt)

            z2 = (
                jnp.dot(v_hat, lang_wv_ref[...],
                        preferred_element_type=pf)
                + jnp.dot(h_att_dt, lang_wha_ref[...],
                          preferred_element_type=pf)
                + jnp.dot(h_lang_dt, lang_wh_ref[...],
                          preferred_element_type=pf)
                + lang_b_ref[...]
            )
            i2, f2, g2, o2 = jnp.split(z2, 4, axis=-1)
            i2 = jax.nn.sigmoid(i2)
            f2 = jax.nn.sigmoid(f2)
            g2 = jnp.tanh(g2)
            o2 = jax.nn.sigmoid(o2)
            c_star = c_star_ref[...]
            c_gen = f2 * c_lang_ref[...] + i2 * g2

            rpre = (
                jnp.dot(v_hat, wr_v_ref[...], preferred_element_type=pf)
                + jnp.dot(h_att_dt, wr_ha_ref[...],
                          preferred_element_type=pf)
                + jnp.dot(h_lang_dt, wr_hl_ref[...],
                          preferred_element_type=pf)
                + jnp.dot(c_star.astype(dt), wr_c_ref[...],
                          preferred_element_type=pf)
                + br_ref[...]
            )
            r = jax.nn.sigmoid(rpre)
            c_lang = r * c_star + (1.0 - r) * c_gen
            h_lang = o2 * jnp.tanh(c_lang)
            h_lang_out[...] = h_lang
            c_lang_out[...] = c_lang
            # Park the head input in VMEM for every vocab tile of this
            # row block — the HBM hop the fusion exists to remove. Cast
            # matches fused_head_topk's h.astype(dt) on its input.
            h_scr[...] = h_lang.astype(dt)

        # --- head body: one logits tile + the shared LSE/top-k update ---
        logits = (
            jnp.dot(h_scr[...], head_w_ref[...],
                    preferred_element_type=jnp.float32)
            + head_b_ref[...]
        )  # [TN, TV] fp32
        _lse_topk_update(logits, k, TV, vals_out, idx_out, lse_out,
                         run_vals, run_idx, run_m, run_s)

    return kernel


def fused_lang_head_topk(
    pack: CellPack,
    vhat_raw: jax.Array,  # [N, Fp] fp32 (att_phase output)
    h_att2: jax.Array,  # [N, Hp] fp32 (att_phase output)
    c_star: jax.Array,  # [N, Hp] fp32 (att_phase output)
    h_lang: jax.Array,  # [N, H] fp32 (pre-step state)
    c_lang: jax.Array,  # [N, H] fp32
    head_w: jax.Array,  # [H_or_Hp, V*] (pre-cast/padded ok)
    head_b: jax.Array,  # [V*] fp32
    *,
    k: int,
    compute_dtype=jnp.float32,
    interpret: bool = False,
    tiles: tuple[int, int] | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused lang-cell + vocab-head: returns (h_lang', c_lang',
    top_vals [N,k] fp32, top_idx [N,k] int32, lse [N] fp32) with
    h_lang' never round-tripping HBM between cell and head."""
    dt = compute_dtype
    N = h_lang.shape[0]
    H = h_lang.shape[1]
    Hp = pack.w_ha.shape[0]
    Fp = pack.gate_w.shape[1]
    V = head_w.shape[1]

    TN, TV = tiles or (_TN, _TV)
    TN = min(TN, _round_up(N, 8))
    TV = min(TV, _round_up(V, 128))
    Np, Vp = _round_up(N, TN), _round_up(V, TV)

    rp = lambda x: _pad_to(x, 0, Np)
    h_lang_p = rp(_pad_to(h_lang, 1, Hp))
    c_lang_p = rp(_pad_to(c_lang, 1, Hp))
    vhat_p = rp(vhat_raw).astype(dt)
    h_att_p = rp(h_att2)
    c_star_p = rp(c_star)

    # Head weights: pad H rows to Hp with zeros (padded h_lang columns
    # are zero too, so the dot is exact) and V cols to the tile multiple
    # with -1e30 bias so padded vocab ids never reach the top-k and
    # contribute exp(-inf)=0 to the LSE — same contract as ops/head.py.
    w_p = _pad_axis(_pad_axis(head_w.astype(dt), 0, Hp), 1, Vp)
    b_p = _pad_axis(head_b.astype(jnp.float32).reshape(-1), 0, Vp,
                    value=_NEG).reshape(1, Vp)

    kcols = _round_up(k, 128)
    rows = lambda width: pl.BlockSpec(
        (TN, width), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    wconst = lambda d1, d2: pl.BlockSpec(
        (d1, d2), lambda i, j: (0, 0), memory_space=pltpu.VMEM)

    return_shapes = [
        jax.ShapeDtypeStruct((Np, Hp), jnp.float32),  # h_lang'
        jax.ShapeDtypeStruct((Np, Hp), jnp.float32),  # c_lang'
        jax.ShapeDtypeStruct((Np, k), jnp.float32),
        jax.ShapeDtypeStruct((Np, k), jnp.int32),
        jax.ShapeDtypeStruct((Np, 1), jnp.float32),
    ]
    h2, c2, vals, idx, lse = pl.pallas_call(
        _make_lang_head_kernel(dt, k, TV),
        grid=(Np // TN, Vp // TV),
        in_specs=[
            rows(Fp), rows(Hp), rows(Hp), rows(Hp), rows(Hp),
            wconst(Hp, Fp), wconst(1, Fp),
            wconst(Fp, 4 * Hp), wconst(Hp, 4 * Hp), wconst(Hp, 4 * Hp),
            wconst(1, 4 * Hp),
            wconst(Fp, Hp), wconst(Hp, Hp), wconst(Hp, Hp),
            wconst(Hp, Hp), wconst(1, Hp),
            pl.BlockSpec((Hp, TV), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # head W
            pl.BlockSpec((1, TV), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # head b
        ],
        out_specs=[
            rows(Hp), rows(Hp), rows(k), rows(k), rows(1),
        ],
        out_shape=return_shapes,
        scratch_shapes=[
            pltpu.VMEM((TN, Hp), dt),  # parked h_lang'
            pltpu.VMEM((TN, kcols), jnp.float32),  # run_vals
            pltpu.VMEM((TN, kcols), jnp.float32),  # run_idx
            pltpu.VMEM((TN, 128), jnp.float32),  # run_m
            pltpu.VMEM((TN, 128), jnp.float32),  # run_s
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(
        vhat_p, h_att_p, h_lang_p, c_lang_p, c_star_p,
        pack.gate_w, pack.gate_b,
        pack.lang_wv, pack.lang_wha, pack.lang_wh, pack.lang_b,
        pack.wr_v, pack.wr_ha, pack.wr_hl, pack.wr_c, pack.br,
        w_p, b_p,
    )
    unp = lambda x: x[:N, :H] if Hp != H else x[:N]
    return unp(h2), unp(c2), vals[:N], idx[:N], lse[:N, 0]


def fused_step_topk(
    pack: CellPack,
    state_h_att: jax.Array,  # [N, H] fp32
    state_c_att: jax.Array,
    state_h_lang: jax.Array,
    state_c_lang: jax.Array,
    emb: jax.Array,  # [N, E] fp32
    head_w: jax.Array,
    head_b: jax.Array,
    *,
    k: int,
    num_regions: int,
    compute_dtype=jnp.float32,
    interpret: bool = False,
    tiles: tuple[int, int] | None = None,
):
    """The full whole-step decode: att kernel + context einsums
    (megastep.att_phase, unchanged) then the fused lang+head kernel.
    Returns (h_att', c_att', h_lang', c_lang', vals, idx, lse)."""
    dt = compute_dtype
    H = state_h_att.shape[1]
    Hp = pack.w_ha.shape[0]
    h_att2, c_att2, vhat_raw, c_star = att_phase(
        pack, state_h_att, state_c_att, state_h_lang, emb,
        num_regions=num_regions, compute_dtype=dt, interpret=interpret,
    )
    h2, c2, vals, idx, lse = fused_lang_head_topk(
        pack, vhat_raw, h_att2, c_star, state_h_lang, state_c_lang,
        head_w, head_b, k=k, compute_dtype=dt, interpret=interpret,
        tiles=tiles,
    )
    unp = lambda x: x[:, :H] if Hp != H else x
    return unp(h_att2), unp(c_att2), h2, c2, vals, idx, lse
