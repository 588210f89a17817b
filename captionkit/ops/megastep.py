"""Fused EditNet decode-step cell kernels (the round-3 "cell-complex"
escalation, docs/DESIGN.md "Round-3 candidates").

The beam decode step's two LSTM matmuls run at MXU speed of light under
XLA, but the glue between them does not: the x_var/xh/xhc concats, the
gate pre-activation buffers (z, z2, rpre), and the attention query/score
intermediates each round-trip [B*K, ~4H]-sized tensors through HBM every
step — the profiled "layout/copies tail". These kernels keep all of that
in VMEM:

* ``att_block`` (kernel A): attention-LSTM gates from SPLIT matmuls
  (emb/h_lang/h_att each against their own weight slice — no [N, E+2H]
  concat is ever materialized) + the visual and SCMA additive-attention
  scores and softmaxes, with grouped-query layout native (K query rows
  per image over unreplicated per-image keys).
* the α→v̂ and β→c* reads stay OUTSIDE, as XLA grouped einsums — they are
  bandwidth-floor ops XLA already does optimally (114us for the 75MB
  feature read at paper scale), and doing them in-kernel would force
  per-image matmuls Mosaic lowers poorly.
* ``lang_block`` (kernel B): the visual context gate + the Copy-LSTM
  (base gates + copy gate, again from split matmuls — no xh/xhc
  concats) + the c*/c_gen blend.

Numerics: matmuls in compute dtype with fp32 accumulation, gate math and
softmax in fp32 — the same contract as the jnp path (captionkit.nn). The
fp32 accumulation ORDER differs (split matmuls sum parts; the jnp path
contracts one packed operand), so outputs match the reference step to
~1e-5 relative at fp32, not bitwise; tests/test_megastep.py pins that.

All feature dims are padded to lane/sublane multiples host-side, ONCE per
batch (prepare_cell_pack) — padded gate blocks are arranged per-gate so
i|f|g|o slice boundaries stay aligned, and padded attention rows are
masked to NEG_INF before softmax. Everything is exercisable in interpret
mode on CPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from captionkit.nn.masking import NEG_INF

_VMEM_LIMIT = 100 * 1024 * 1024  # v5e has 128MB; the default 16MB strands it


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_to(x: jax.Array, axis: int, target: int) -> jax.Array:
    pad = target - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pad_gates(w: jax.Array, hp: int) -> jax.Array:
    """Pad the 4H gate axis per gate block so i|f|g|o boundaries stay at
    multiples of the padded hidden dim. w: [..., 4H] -> [..., 4Hp]."""
    h = w.shape[-1] // 4
    if h == hp:
        return w
    w4 = w.reshape(*w.shape[:-1], 4, h)
    return _pad_to(w4, w4.ndim - 1, hp).reshape(*w.shape[:-1], 4 * hp)


class CellPack(NamedTuple):
    """Padded weights + per-image context for the fused step (built once
    per decode batch by prepare_cell_pack; everything static-shaped)."""

    # kernel A weights (dt unless noted)
    w_emb: jax.Array  # [Ep, 4Hp]
    w_hl: jax.Array  # [Hp, 4Hp]   att-LSTM recurrent (h_lang slice)
    w_ha: jax.Array  # [Hp, 4Hp]   att-LSTM recurrent (h_att slice)
    vis_wq: jax.Array  # [Hp, Ap]
    vis_v: jax.Array  # [1, Ap] fp32
    vis_b: jax.Array  # [1, Ap] fp32
    scma_wq: jax.Array  # [Hp, Ap]
    scma_v: jax.Array  # [1, Ap] fp32
    scma_b: jax.Array  # [1, Ap] fp32
    # kernel B weights
    gate_w: jax.Array  # [Hp, Fp]
    gate_b: jax.Array  # [1, Fp] fp32
    lang_wv: jax.Array  # [Fp, 4Hp]  Copy-LSTM base wx (v̂ slice)
    lang_wha: jax.Array  # [Hp, 4Hp] Copy-LSTM base wx (h_att slice)
    lang_wh: jax.Array  # [Hp, 4Hp]  Copy-LSTM base recurrent
    lang_b: jax.Array  # [1, 4Hp] fp32
    wr_v: jax.Array  # [Fp, Hp]   copy gate (v̂ slice)
    wr_ha: jax.Array  # [Hp, Hp]  copy gate (h_att slice)
    wr_hl: jax.Array  # [Hp, Hp]  copy gate (recurrent slice)
    wr_c: jax.Array  # [Hp, Hp]   copy gate (c* slice)
    br: jax.Array  # [1, Hp] fp32
    # per-image context, padded (dt)
    vis_keys: jax.Array  # [B, Rp, Ap]
    features: jax.Array  # [B, Rp, Fp]
    scma_keys: jax.Array  # [B, Tp, Ap]
    enc_cs: jax.Array  # [B, Tp, Hp]
    scma_mask: jax.Array  # [B, Tp] fp32 (1 = attendable; padding is 0)
    # hoisted att-LSTM pre-activation incl. bias, per row [N, 4Hp] fp32
    zvb: jax.Array


def prepare_cell_pack(params, cfg, ctx) -> CellPack:
    """Pad weights/context to the kernel grid once per decode batch.

    ctx is the (beam-expanded) EditNetContext; its per-image leaves stay
    per-image. The rows-per-image group size K is recovered statically at
    step time from the row/image shape ratio."""
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    E, H, A, F = cfg.emb_dim, cfg.hidden_dim, cfg.att_dim, cfg.feat_dim
    R = ctx.features.shape[1]
    T = ctx.enc_cs.shape[1]
    Ep, Hp = _round_up(E, 128), _round_up(H, 128)
    Ap, Fp = _round_up(A, 128), _round_up(F, 128)
    # second-minor (sublane) padding for the 3-D key tensors; 16 covers
    # both fp32 (8) and bf16 (16) tiling.
    Rp, Tp = _round_up(R, 16), _round_up(T, 16)

    wx = params.att_lstm.wx  # [E + F + H, 4H]
    row = lambda v: v.reshape(1, -1).astype(jnp.float32)

    def wpad(w, rows):  # [in, 4H] -> [rows, 4Hp] dt
        return _pad_to(_pad_gates(w, Hp), 0, rows).astype(dt)

    def qpad(w, rows, cols):  # [in, out] -> [rows, cols] dt
        return _pad_to(_pad_to(w, 1, cols), 0, rows).astype(dt)

    lwx = params.lang_lstm.base.wx  # [F + H, 4H]
    zvb = _pad_gates(
        ctx.att_zv + params.att_lstm.b, Hp
    ).astype(jnp.float32)
    return CellPack(
        w_emb=wpad(wx[:E], Ep),
        w_hl=wpad(wx[E + F:], Hp),
        w_ha=wpad(params.att_lstm.wh, Hp),
        vis_wq=qpad(params.vis_attention.w_q, Hp, Ap),
        vis_v=row(_pad_to(params.vis_attention.v, 0, Ap)),
        vis_b=row(_pad_to(params.vis_attention.b, 0, Ap)),
        scma_wq=qpad(params.scma.w_q, Hp, Ap),
        scma_v=row(_pad_to(params.scma.v, 0, Ap)),
        scma_b=row(_pad_to(params.scma.b, 0, Ap)),
        gate_w=qpad(params.vis_gate_w, Hp, Fp),
        gate_b=row(_pad_to(params.vis_gate_b, 0, Fp)),
        lang_wv=wpad(lwx[:F], Fp),
        lang_wha=wpad(lwx[F:], Hp),
        lang_wh=wpad(params.lang_lstm.base.wh, Hp),
        lang_b=row(_pad_gates(params.lang_lstm.base.b, Hp)),
        wr_v=qpad(params.lang_lstm.wrx[:F], Fp, Hp),
        wr_ha=qpad(params.lang_lstm.wrx[F:], Hp, Hp),
        wr_hl=qpad(params.lang_lstm.wrh, Hp, Hp),
        wr_c=qpad(params.lang_lstm.wrc, Hp, Hp),
        br=row(_pad_to(params.lang_lstm.br, 0, Hp)),
        vis_keys=_pad_to(_pad_to(ctx.vis_keys, 2, Ap), 1, Rp).astype(dt),
        features=_pad_to(_pad_to(ctx.features, 2, Fp), 1, Rp).astype(dt),
        scma_keys=_pad_to(_pad_to(ctx.scma_keys, 2, Ap), 1, Tp).astype(dt),
        enc_cs=_pad_to(_pad_to(ctx.enc_cs, 2, Hp), 1, Tp).astype(dt),
        scma_mask=_pad_to(ctx.mask, 1, Tp).astype(jnp.float32),
        zvb=zvb,
    )


# --------------------------------------------------------------------------
# Kernel A: att-LSTM + attention scores/softmaxes
# --------------------------------------------------------------------------


def _make_att_kernel(K: int, R: int, dt):
    def kernel(emb_ref, h_att_ref, c_att_ref, h_lang_ref, zvb_ref,
               w_emb_ref, w_hl_ref, w_ha_ref,
               vis_wq_ref, vis_v_ref, vis_b_ref, vis_keys_ref,
               scma_wq_ref, scma_v_ref, scma_b_ref, scma_keys_ref,
               mask_ref,
               h_att_out, c_att_out, alpha_out, beta_out):
        pf = jnp.float32
        # 1. att-LSTM gate pre-activations from split matmuls — the
        # [emb | h_lang | h_att] concat never exists.
        z = (
            jnp.dot(emb_ref[...], w_emb_ref[...],
                    preferred_element_type=pf)
            + jnp.dot(h_lang_ref[...].astype(dt), w_hl_ref[...],
                      preferred_element_type=pf)
            + jnp.dot(h_att_ref[...].astype(dt), w_ha_ref[...],
                      preferred_element_type=pf)
            + zvb_ref[...]
        )  # [Nb, 4Hp] fp32
        i, f, g, o = jnp.split(z, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_att = f * c_att_ref[...] + i * g
        h_att = o * jnp.tanh(c_att)
        h_att_out[...] = h_att
        c_att_out[...] = c_att
        h_att_dt = h_att.astype(dt)

        # 2. additive attention scores, grouped layout: per-image keys
        # repeated K-fold across the row axis IN VMEM (never in HBM).
        def scores(wq_ref, v_ref, b_ref, keys_ref, valid):
            q = jnp.dot(h_att_dt, wq_ref[...],
                        preferred_element_type=pf)  # [Nb, Ap]
            keys = jnp.repeat(keys_ref[...], K, axis=0)  # [Nb, Np, Ap]
            e = jnp.tanh(keys + q[:, None, :] + b_ref[...][None, :, :])
            s = jnp.sum(e * v_ref[...][None, :, :], axis=-1)  # [Nb, Np]
            s = jnp.where(valid, s, NEG_INF)
            return jax.nn.softmax(s, axis=-1)

        rshape = (h_att.shape[0], vis_keys_ref.shape[1])
        col = jax.lax.broadcasted_iota(jnp.int32, rshape, 1)
        alpha_out[...] = scores(
            vis_wq_ref, vis_v_ref, vis_b_ref, vis_keys_ref, col < R
        ).astype(alpha_out.dtype)
        # SCMA validity comes entirely from the (padded-with-False) mask.
        mask_rep = jnp.repeat(mask_ref[...], K, axis=0) > 0.0  # [Nb, Tp]
        beta_out[...] = scores(
            scma_wq_ref, scma_v_ref, scma_b_ref, scma_keys_ref, mask_rep
        ).astype(beta_out.dtype)

    return kernel


# --------------------------------------------------------------------------
# Kernel B: visual gate + Copy-LSTM
# --------------------------------------------------------------------------


def _make_lang_kernel(dt):
    def kernel(vhat_ref, h_att_ref, h_lang_ref, c_lang_ref, c_star_ref,
               gate_w_ref, gate_b_ref,
               lang_wv_ref, lang_wha_ref, lang_wh_ref, lang_b_ref,
               wr_v_ref, wr_ha_ref, wr_hl_ref, wr_c_ref, br_ref,
               h_lang_out, c_lang_out):
        pf = jnp.float32
        h_att_dt = h_att_ref[...].astype(dt)
        h_lang_dt = h_lang_ref[...].astype(dt)
        # visual context gate (compute-dtype matmul, fp32 sigmoid/blend)
        gpre = (
            jnp.dot(h_att_dt, gate_w_ref[...], preferred_element_type=pf)
            + gate_b_ref[...]
        )
        v_hat = (jax.nn.sigmoid(gpre) * vhat_ref[...]).astype(dt)

        # Copy-LSTM base gates from split matmuls (no [v̂|h_att|h_lang]
        # concat).
        z2 = (
            jnp.dot(v_hat, lang_wv_ref[...], preferred_element_type=pf)
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
            + jnp.dot(h_att_dt, wr_ha_ref[...], preferred_element_type=pf)
            + jnp.dot(h_lang_dt, wr_hl_ref[...],
                      preferred_element_type=pf)
            + jnp.dot(c_star.astype(dt), wr_c_ref[...],
                      preferred_element_type=pf)
            + br_ref[...]
        )
        r = jax.nn.sigmoid(rpre)
        c_lang = r * c_star + (1.0 - r) * c_gen
        h_lang_out[...] = o2 * jnp.tanh(c_lang)
        c_lang_out[...] = c_lang

    return kernel


# --------------------------------------------------------------------------
# Host wrappers
# --------------------------------------------------------------------------


def _pick_g(B: int, K: int, target_rows: int) -> int:
    """Largest divisor of B with G*K <= target_rows (>=1)."""
    best = 1
    for g in range(1, B + 1):
        if B % g == 0 and g * K <= target_rows:
            best = g
    return best


def att_phase(
    pack: CellPack,
    state_h_att: jax.Array,  # [N, H] fp32
    state_c_att: jax.Array,
    state_h_lang: jax.Array,
    emb: jax.Array,  # [N, E] fp32 (cast to dt here)
    *,
    num_regions: int,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Kernel A + the grouped context einsums — the first half of the
    fused decode step, shared by fused_step_hidden and the whole-step
    experiment (ops.wholestep). Returns Hp-padded
    (h_att' [N,Hp] fp32, c_att' [N,Hp] fp32, vhat_raw [N,Fp] fp32,
    c_star [N,Hp] fp32)."""
    dt = compute_dtype
    R = num_regions
    B = pack.features.shape[0]
    N = state_h_att.shape[0]
    if N % B:
        raise ValueError(f"row count {N} not a multiple of image count {B}")
    K = N // B
    Hp = pack.w_ha.shape[0]
    Ep = pack.w_emb.shape[0]
    Fp = pack.gate_w.shape[1]
    Ap = pack.vis_wq.shape[1]
    Rp, Tp = pack.vis_keys.shape[1], pack.scma_keys.shape[1]

    hp = lambda x: _pad_to(x, 1, Hp)
    h_att = hp(state_h_att)
    c_att = hp(state_c_att)
    h_lang = hp(state_h_lang)
    emb_p = _pad_to(emb, 1, Ep).astype(dt)

    G = _pick_g(B, K, 256)
    Nb = G * K
    grid = (B // G,)

    rows = lambda width: pl.BlockSpec(
        (Nb, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    imgs = lambda d1, d2: pl.BlockSpec(
        (G, d1, d2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    wconst = lambda d1, d2: pl.BlockSpec(
        (d1, d2), lambda i: (0, 0), memory_space=pltpu.VMEM)

    h_att2, c_att2, alpha, beta = pl.pallas_call(
        _make_att_kernel(K, R, dt),
        grid=grid,
        in_specs=[
            rows(Ep), rows(Hp), rows(Hp), rows(Hp), rows(4 * Hp),
            wconst(Ep, 4 * Hp), wconst(Hp, 4 * Hp), wconst(Hp, 4 * Hp),
            wconst(Hp, Ap), wconst(1, Ap), wconst(1, Ap), imgs(Rp, Ap),
            wconst(Hp, Ap), wconst(1, Ap), wconst(1, Ap), imgs(Tp, Ap),
            pl.BlockSpec((G, Tp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[rows(Hp), rows(Hp), rows(Rp), rows(Tp)],
        out_shape=[
            jax.ShapeDtypeStruct((N, Hp), jnp.float32),
            jax.ShapeDtypeStruct((N, Hp), jnp.float32),
            jax.ShapeDtypeStruct((N, Rp), dt),
            jax.ShapeDtypeStruct((N, Tp), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(
        emb_p, h_att, c_att, h_lang, pack.zvb,
        pack.w_emb, pack.w_hl, pack.w_ha,
        pack.vis_wq, pack.vis_v, pack.vis_b, pack.vis_keys,
        pack.scma_wq, pack.scma_v, pack.scma_b, pack.scma_keys,
        pack.scma_mask,
    )

    # Grouped context reads — XLA's bandwidth-floor einsums (padded α/β
    # columns are exactly zero, padded feature/cell rows are zero, so the
    # padded contraction equals the true one).
    vhat_raw = jnp.einsum(
        "bkr,brf->bkf", alpha.reshape(B, K, Rp), pack.features,
        preferred_element_type=jnp.float32,
    ).reshape(N, Fp)
    c_star = jnp.einsum(
        "bkt,bth->bkh", beta.reshape(B, K, Tp), pack.enc_cs,
        preferred_element_type=jnp.float32,
    ).reshape(N, Hp)
    return h_att2, c_att2, vhat_raw, c_star


def fused_step_hidden(
    pack: CellPack,
    state_h_att: jax.Array,  # [N, H] fp32
    state_c_att: jax.Array,
    state_h_lang: jax.Array,
    state_c_lang: jax.Array,
    emb: jax.Array,  # [N, E] fp32 (cast to dt here)
    *,
    num_regions: int,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One EditNet decode step up to (but not including) the vocab head —
    the fused twin of models.editnet._step_hidden at train=False,
    scma_select='soft'. Returns (h_att', c_att', h_lang', c_lang');
    h_lang' is what the head consumes.

    All group/size statics are recovered from (static) array shapes: the
    rows-per-image K is N // B; only the true region count comes in as a
    parameter (visual attention has no mask to encode it)."""
    dt = compute_dtype
    N = state_h_att.shape[0]
    H = state_h_att.shape[1]
    Hp = pack.w_ha.shape[0]
    Fp = pack.gate_w.shape[1]

    h_att2, c_att2, vhat_raw, c_star = att_phase(
        pack, state_h_att, state_c_att, state_h_lang, emb,
        num_regions=num_regions, compute_dtype=dt, interpret=interpret,
    )
    h_lang = _pad_to(state_h_lang, 1, Hp)
    c_lang = _pad_to(state_c_lang, 1, Hp)
    wconst = lambda d1, d2: pl.BlockSpec(
        (d1, d2), lambda i: (0, 0), memory_space=pltpu.VMEM)

    NbB = min(512, N) if N % min(512, N) == 0 else N
    rowsb = lambda width: pl.BlockSpec(
        (NbB, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    h_lang2, c_lang2 = pl.pallas_call(
        _make_lang_kernel(dt),
        grid=(N // NbB,),
        in_specs=[
            rowsb(Fp), rowsb(Hp), rowsb(Hp), rowsb(Hp), rowsb(Hp),
            wconst(Hp, Fp), wconst(1, Fp),
            wconst(Fp, 4 * Hp), wconst(Hp, 4 * Hp), wconst(Hp, 4 * Hp),
            wconst(1, 4 * Hp),
            wconst(Fp, Hp), wconst(Hp, Hp), wconst(Hp, Hp),
            wconst(Hp, Hp), wconst(1, Hp),
        ],
        out_specs=[rowsb(Hp), rowsb(Hp)],
        out_shape=[
            jax.ShapeDtypeStruct((N, Hp), jnp.float32),
            jax.ShapeDtypeStruct((N, Hp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(
        vhat_raw.astype(dt), h_att2, h_lang, c_lang, c_star,
        pack.gate_w, pack.gate_b,
        pack.lang_wv, pack.lang_wha, pack.lang_wh, pack.lang_b,
        pack.wr_v, pack.wr_ha, pack.wr_hl, pack.wr_c, pack.br,
    )

    unp = lambda x: x[:, :H] if Hp != H else x
    return unp(h_att2), unp(c_att2), unp(h_lang2), unp(c_lang2)


# --------------------------------------------------------------------------
# DCNet sibling: score kernel -> XLA grouped context einsum -> gate+LSTM
# --------------------------------------------------------------------------


class DCNetCellPack(NamedTuple):
    """Padded weights/context for DCNet's fused decode step (textual
    config only — dcnet_use_visual falls back to the jnp path)."""

    att_wq: jax.Array  # [Hp, Ap] dt
    att_v: jax.Array  # [1, Ap] fp32
    att_b: jax.Array  # [1, Ap] fp32
    gate_w: jax.Array  # [Hp, Hp] dt
    gate_b: jax.Array  # [1, Hp] fp32
    w_emb: jax.Array  # [Ep, 4Hp] dt  decoder.wx emb slice
    w_part: jax.Array  # [Hp, 4Hp] dt decoder.wx gated-context slice
    w_h: jax.Array  # [Hp, 4Hp] dt    decoder recurrent
    b: jax.Array  # [1, 4Hp] fp32
    att_keys: jax.Array  # [B, Tp, Ap] dt
    enc_hs: jax.Array  # [B, Tp, Hp] dt
    mask: jax.Array  # [B, Tp] fp32 (1 = attendable; padding is 0)


def prepare_dcnet_cell_pack(params, cfg, ctx) -> DCNetCellPack:
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    E, H, A = cfg.emb_dim, cfg.hidden_dim, cfg.att_dim
    T = ctx.enc_hs.shape[1]
    Ep, Hp = _round_up(E, 128), _round_up(H, 128)
    Ap, Tp = _round_up(A, 128), _round_up(T, 16)
    row = lambda v: v.reshape(1, -1).astype(jnp.float32)

    def wpad(w, rows):
        return _pad_to(_pad_gates(w, Hp), 0, rows).astype(dt)

    def qpad(w, rows, cols):
        return _pad_to(_pad_to(w, 1, cols), 0, rows).astype(dt)

    return DCNetCellPack(
        att_wq=qpad(params.attention.w_q, Hp, Ap),
        att_v=row(_pad_to(params.attention.v, 0, Ap)),
        att_b=row(_pad_to(params.attention.b, 0, Ap)),
        gate_w=qpad(params.gate_w, Hp, Hp),
        gate_b=row(_pad_to(params.gate_b, 0, Hp)),
        w_emb=wpad(params.decoder.wx[:E], Ep),
        w_part=wpad(params.decoder.wx[E:], Hp),
        w_h=wpad(params.decoder.wh, Hp),
        b=row(_pad_gates(params.decoder.b, Hp)),
        att_keys=_pad_to(_pad_to(ctx.att_keys, 2, Ap), 1, Tp).astype(dt),
        enc_hs=_pad_to(_pad_to(ctx.enc_hs, 2, Hp), 1, Tp).astype(dt),
        mask=_pad_to(ctx.mask, 1, Tp).astype(jnp.float32),
    )


def _make_dcnet_score_kernel(K: int, dt):
    def kernel(h_ref, wq_ref, v_ref, b_ref, keys_ref, mask_ref, omega_out):
        pf = jnp.float32
        q = jnp.dot(h_ref[...].astype(dt), wq_ref[...],
                    preferred_element_type=pf)  # [Nb, Ap]
        keys = jnp.repeat(keys_ref[...], K, axis=0)  # [Nb, Tp, Ap]
        e = jnp.tanh(keys + q[:, None, :] + b_ref[...][None, :, :])
        s = jnp.sum(e * v_ref[...][None, :, :], axis=-1)  # [Nb, Tp]
        valid = jnp.repeat(mask_ref[...], K, axis=0) > 0.0
        s = jnp.where(valid, s, NEG_INF)
        omega_out[...] = jax.nn.softmax(s, axis=-1).astype(omega_out.dtype)

    return kernel


def _make_dcnet_lstm_kernel(dt):
    def kernel(emb_ref, ctx_ref, h_ref, c_ref,
               gate_w_ref, gate_b_ref, w_emb_ref, w_part_ref, w_h_ref,
               b_ref, h_out, c_out):
        pf = jnp.float32
        h_dt = h_ref[...].astype(dt)
        gate = jax.nn.sigmoid(
            jnp.dot(h_dt, gate_w_ref[...], preferred_element_type=pf)
            + gate_b_ref[...]
        )
        part = (gate * ctx_ref[...]).astype(dt)
        z = (
            jnp.dot(emb_ref[...], w_emb_ref[...],
                    preferred_element_type=pf)
            + jnp.dot(part, w_part_ref[...], preferred_element_type=pf)
            + jnp.dot(h_dt, w_h_ref[...], preferred_element_type=pf)
            + b_ref[...]
        )
        i, f, g, o = jnp.split(z, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c_ref[...] + i * g
        h_out[...] = o * jnp.tanh(c)
        c_out[...] = c

    return kernel


def dcnet_fused_step_hidden(
    pack: DCNetCellPack,
    state_h: jax.Array,  # [N, H] fp32
    state_c: jax.Array,
    emb: jax.Array,  # [N, E] fp32
    *,
    compute_dtype=jnp.float32,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """DCNet decode step up to the vocab head — fused twin of
    models.dcnet._step_hidden (textual config, train=False)."""
    dt = compute_dtype
    B = pack.enc_hs.shape[0]
    N, H = state_h.shape
    if N % B:
        raise ValueError(f"row count {N} not a multiple of image count {B}")
    K = N // B
    Hp = pack.w_h.shape[0]
    Ep = pack.w_emb.shape[0]
    Ap = pack.att_wq.shape[1]
    Tp = pack.att_keys.shape[1]

    h = _pad_to(state_h, 1, Hp)
    c = _pad_to(state_c, 1, Hp)
    emb_p = _pad_to(emb, 1, Ep).astype(dt)

    G = _pick_g(B, K, 256)
    Nb = G * K
    rows = lambda width: pl.BlockSpec(
        (Nb, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    wconst = lambda d1, d2: pl.BlockSpec(
        (d1, d2), lambda i: (0, 0), memory_space=pltpu.VMEM)

    omega = pl.pallas_call(
        _make_dcnet_score_kernel(K, dt),
        grid=(B // G,),
        in_specs=[
            rows(Hp),
            wconst(Hp, Ap), wconst(1, Ap), wconst(1, Ap),
            pl.BlockSpec((G, Tp, Ap), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Tp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=rows(Tp),
        out_shape=jax.ShapeDtypeStruct((N, Tp), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(h, pack.att_wq, pack.att_v, pack.att_b, pack.att_keys, pack.mask)

    att_ctx = jnp.einsum(
        "bkt,bth->bkh", omega.reshape(B, K, Tp), pack.enc_hs,
        preferred_element_type=jnp.float32,
    ).reshape(N, Hp)

    NbB = min(512, N) if N % min(512, N) == 0 else N
    rowsb = lambda width: pl.BlockSpec(
        (NbB, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    h2, c2 = pl.pallas_call(
        _make_dcnet_lstm_kernel(dt),
        grid=(N // NbB,),
        in_specs=[
            rowsb(Ep), rowsb(Hp), rowsb(Hp), rowsb(Hp),
            wconst(Hp, Hp), wconst(1, Hp),
            wconst(Ep, 4 * Hp), wconst(Hp, 4 * Hp), wconst(Hp, 4 * Hp),
            wconst(1, 4 * Hp),
        ],
        out_specs=[rowsb(Hp), rowsb(Hp)],
        out_shape=[
            jax.ShapeDtypeStruct((N, Hp), jnp.float32),
            jax.ShapeDtypeStruct((N, Hp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(emb_p, att_ctx, h, c,
      pack.gate_w, pack.gate_b, pack.w_emb, pack.w_part, pack.w_h, pack.b)

    unp = lambda x: x[:, :H] if Hp != H else x
    return unp(h2), unp(c2)
