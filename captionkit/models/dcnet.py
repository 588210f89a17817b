"""DCNet — LSTM denoising auto-encoder over the existing caption.

Reference behaviour (SURVEY.md §1, §3.2, §4.1; paper §3.1): an LSTM encoder
reads the (imperfect) existing caption; an attentive LSTM decoder
reconstructs the ground-truth caption, attending additively over the
encoder's hidden states, with a sigmoid gate on the context vector
(Up-Down-family "f_beta" gate) and a linear head to vocab logits.
⟦cite: dcnet.py — reference mount empty at build time, SURVEY.md §0⟧

TPU design notes:
* The encoder runs once per sequence in ``encode`` (a single lax.scan);
  attention keys (W_e·h_i) are projected there, hoisting that matmul out of
  the decode loop entirely.
* ``step`` is branch-free and static-shaped: one fused [B, E+H]x[...,4H]
  LSTM matmul + one attention read. It is the unit the Pallas kernels
  accelerate (captionkit.ops).
* Optional visual conditioning (``cfg.dcnet_use_visual``, SURVEY.md §8.4
  open item): when on, a second attention head over region features is
  concatenated into the decoder input.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from captionkit.models.base import HeadInfo, ModelDef, dropout
from captionkit.nn.attention import (
    AdditiveAttentionParams,
    init_additive_attention,
    project_keys,
)
from captionkit.nn.cells import LSTMParams, init_lstm, lstm_encode
from captionkit.nn.dispatch import get_attention_fn, get_lstm_cell_fn
from captionkit.nn.masking import length_mask
from captionkit.utils.config import ModelConfig


@struct.dataclass
class DCNetParams:
    embedding: Any  # [V, E]
    encoder: LSTMParams  # E -> H
    attention: AdditiveAttentionParams  # keys: enc H, query: dec H
    gate_w: Any  # [H, H]  context gate (f_beta): sigmoid(W h_dec)
    gate_b: Any  # [H]
    decoder: LSTMParams  # (E + H [+ F]) -> H
    fc_w: Any  # [H, V]
    fc_b: Any  # [V]
    vis_attention: Optional[AdditiveAttentionParams] = None  # visual (opt.)
    init_h_w: Any = None  # [H, H] decoder h0 from encoder final h
    init_c_w: Any = None  # [H, H] decoder c0 from encoder final c
    init_h_b: Any = None  # [H]
    init_c_b: Any = None  # [H]


@struct.dataclass
class DCNetContext:
    enc_hs: jax.Array  # [B, T, H] encoder hidden states (attention values)
    att_keys: jax.Array  # [B, T, A] projected keys
    mask: jax.Array  # [B, T] bool
    h0: jax.Array  # [B, H] decoder init hidden
    c0: jax.Array  # [B, H]
    features: Optional[jax.Array] = None  # [B, R, F] when visual is on
    vis_keys: Optional[jax.Array] = None  # [B, R, A]
    # Pre-padded fused-head weights (prepare_topk; see editnet.py).
    head_w: Optional[jax.Array] = None  # [H, Vp] compute dtype (or int8)
    head_b: Optional[jax.Array] = None  # [Vp] fp32, padding = -1e30
    # Per-column dequant scales when cfg.head_quant == "int8".
    head_scale: Optional[jax.Array] = None  # [Vp] fp32
    # Fused decode-cell pack (ops.megastep.DCNetCellPack), stashed by
    # prepare_topk when cfg.cell_impl == "pallas" (textual config only).
    cell_pack: Optional[Any] = None


@struct.dataclass
class DCNetState:
    h: jax.Array  # [B, H]
    c: jax.Array  # [B, H]


def _u(key, shape, scale):
    return jax.random.uniform(key, shape, jnp.float32, -scale, scale)


def init(rng: jax.Array, cfg: ModelConfig) -> DCNetParams:
    E, H, A, V = cfg.emb_dim, cfg.hidden_dim, cfg.att_dim, cfg.vocab_size
    ks = jax.random.split(rng, 10)
    dec_in = E + H + (cfg.feat_dim if cfg.dcnet_use_visual else 0)
    vis_att = (
        init_additive_attention(ks[7], cfg.feat_dim, H, A)
        if cfg.dcnet_use_visual
        else None
    )
    return DCNetParams(
        embedding=_u(ks[0], (V, E), 0.1),
        encoder=init_lstm(ks[1], E, H),
        attention=init_additive_attention(ks[2], H, H, A),
        gate_w=_u(ks[3], (H, H), 1.0 / jnp.sqrt(H)),
        gate_b=jnp.zeros((H,), jnp.float32),
        decoder=init_lstm(ks[4], dec_in, H),
        fc_w=_u(ks[5], (H, V), 1.0 / jnp.sqrt(H)),
        fc_b=jnp.zeros((V,), jnp.float32),
        vis_attention=vis_att,
        init_h_w=_u(ks[8], (H, H), 1.0 / jnp.sqrt(H)),
        init_c_w=_u(ks[9], (H, H), 1.0 / jnp.sqrt(H)),
        init_h_b=jnp.zeros((H,), jnp.float32),
        init_c_b=jnp.zeros((H,), jnp.float32),
    )


def _cdt(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def encode(
    params: DCNetParams,
    cfg: ModelConfig,
    features: Optional[jax.Array],  # [B, R, F] (ignored unless visual on)
    existing: jax.Array,  # [B, T] int32
    existing_len: jax.Array,  # [B]
) -> DCNetContext:
    dt = _cdt(cfg)
    emb = params.embedding[existing]  # [B, T, E]
    hs, cs = lstm_encode(params.encoder, emb, existing_len, compute_dtype=dt)
    # Stored in compute dtype: the decode loop re-reads these from HBM
    # every step (×beam_width) — bandwidth, not FLOPs, bounds the step.
    keys = project_keys(params.attention, hs, compute_dtype=dt).astype(dt)
    mask = length_mask(existing_len, existing.shape[1])
    # Decoder init from the final (frozen-at-length) encoder state — the
    # tutorial-family init_hidden_state pattern: a bare Linear, NO
    # activation (sgrvinod-family init_h/init_c; an extra tanh here would
    # desync converted reference checkpoints from step 0). ⟦cite⟧
    h_last = hs[:, -1, :]
    c_last = cs[:, -1, :]
    h0 = h_last @ params.init_h_w + params.init_h_b
    c0 = c_last @ params.init_c_w + params.init_c_b
    vis_keys = None
    feats = None
    if cfg.dcnet_use_visual and params.vis_attention is not None:
        feats = features.astype(dt)
        vis_keys = project_keys(params.vis_attention, features,
                                compute_dtype=dt).astype(dt)
    return DCNetContext(
        enc_hs=hs.astype(dt), att_keys=keys, mask=mask, h0=h0, c0=c0,
        features=feats, vis_keys=vis_keys,
    )


def init_state(params: DCNetParams, ctx: DCNetContext) -> DCNetState:
    return DCNetState(h=ctx.h0, c=ctx.c0)


def beam_expand(ctx: DCNetContext, k: int) -> DCNetContext:
    """Repeat only the decoder-init states (become per-beam recurrent
    state); encoder states/keys/masks stay per-image for grouped
    attention."""
    return ctx.replace(
        h0=jnp.repeat(ctx.h0, k, axis=0),
        c0=jnp.repeat(ctx.c0, k, axis=0),
    )


def _step_hidden(
    params: DCNetParams,
    cfg: ModelConfig,
    ctx: DCNetContext,
    state: DCNetState,
    token: jax.Array,  # [B] int32
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> tuple[DCNetState, jax.Array]:
    """One decode step up to the vocab head (SURVEY.md §4.1 inner loop,
    device-resident)."""
    dt = _cdt(cfg)
    lstm_cell = get_lstm_cell_fn()
    emb = params.embedding[token]  # [B, E]

    if ctx.cell_pack is not None and not train:
        # Fused cell kernels (cfg.cell_impl == "pallas"; pack built by
        # prepare_topk). Inference-only; dropout is identity here.
        from captionkit.ops import pallas_supported
        from captionkit.ops.megastep import dcnet_fused_step_hidden

        h, c = dcnet_fused_step_hidden(
            ctx.cell_pack, state.h, state.c, emb, compute_dtype=dt,
            interpret=not pallas_supported(),
        )
        return DCNetState(h=h, c=c), h
    x = jnp.concatenate(
        [emb] + _recurrent_contexts(params, cfg, ctx, state.h), axis=-1
    )
    h, c = lstm_cell(params.decoder, x, state.h, state.c, compute_dtype=dt)
    out = dropout(h, cfg.dropout, rng, train)
    return DCNetState(h=h, c=c), out


def _recurrent_contexts(
    params: DCNetParams,
    cfg: ModelConfig,
    ctx: DCNetContext,
    h: jax.Array,  # [B, H] decoder hidden (attention query)
    attn_out: Optional[dict] = None,
) -> list[jax.Array]:
    """The state-dependent decoder inputs: gated text attention context
    (+ optional visual context). When ``attn_out`` is given, the attention
    distributions are written into it (introspection path)."""
    dt = _cdt(cfg)
    attention = get_attention_fn()
    att_ctx, alpha = attention(
        params.attention, ctx.att_keys, ctx.enc_hs, h, ctx.mask,
        compute_dtype=dt,
    )  # [B, H]
    if attn_out is not None:
        attn_out["alpha"] = alpha  # over existing-caption positions
    # Gate matmul in compute dtype (matches every other matmul; the
    # sigmoid and the gating multiply stay fp32).
    gate = jax.nn.sigmoid(
        jnp.dot(h.astype(dt), params.gate_w.astype(dt),
                preferred_element_type=jnp.float32)
        + params.gate_b
    )
    parts = [gate * att_ctx]
    if ctx.features is not None and params.vis_attention is not None:
        vis_ctx, vis_alpha = attention(
            params.vis_attention, ctx.vis_keys, ctx.features, h,
            None, compute_dtype=dt,
        )
        if attn_out is not None:
            attn_out["vis_alpha"] = vis_alpha
        parts.append(vis_ctx)
    return parts


def step_attn(
    params: DCNetParams,
    cfg: ModelConfig,
    ctx: DCNetContext,
    state: DCNetState,
    token: jax.Array,
) -> tuple[DCNetState, jax.Array, dict]:
    """Introspection step (ModelDef.step_attn): ``step``'s math plus the
    text-attention distribution over the existing caption's positions
    ("alpha"; plus "vis_alpha" when the visual flag is on) — which source
    word the denoiser reads while emitting each output word."""
    dt = _cdt(cfg)
    lstm_cell = get_lstm_cell_fn()
    emb = params.embedding[token]
    attn: dict = {}
    x = jnp.concatenate(
        [emb] + _recurrent_contexts(params, cfg, ctx, state.h, attn),
        axis=-1,
    )
    h, c = lstm_cell(params.decoder, x, state.h, state.c, compute_dtype=dt)
    logits = (
        jnp.dot(h.astype(dt), params.fc_w.astype(dt),
                preferred_element_type=jnp.float32)
        + params.fc_b
    ).astype(jnp.float32)
    return DCNetState(h=h, c=c), logits, attn


def forward_seq(
    params: DCNetParams,
    cfg: ModelConfig,
    ctx: DCNetContext,
    state0: DCNetState,
    tokens_in: jax.Array,  # [B, T]
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jax.Array:
    """Training-optimized teacher forcing (see editnet.forward_seq — same
    restructuring): embedding gather, the emb-slice of the decoder gate
    matmul, and the vocab head run OUTSIDE the scan as batched ops, so
    their backward pass is one matmul/scatter over B·T rows instead of T
    per-step dW accumulations. Row-wise identical math to scanning
    `step`."""
    from captionkit.nn.cells import lstm_gates

    dt = _cdt(cfg)
    E = cfg.emb_dim
    T = tokens_in.shape[1]
    base_rng = rng if rng is not None else jax.random.PRNGKey(0)

    emb_seq = params.embedding[tokens_in]  # [B, T, E]
    z_x = (
        jnp.einsum(
            "bte,ef->btf", emb_seq.astype(dt),
            params.decoder.wx[:E].astype(dt),
            preferred_element_type=jnp.float32,
        )
        + params.decoder.b
    )  # [B, T, 4H] fp32
    w_rec = jnp.concatenate(
        [params.decoder.wx[E:], params.decoder.wh], axis=0
    ).astype(dt)

    if cfg.dcnet_deferred_backward and not cfg.dcnet_use_visual:
        from captionkit.models.dcnet_backward import dcnet_recurrent_seq

        static = (cfg.compute_dtype, float(cfg.dropout), bool(train), T)
        ins = {
            "w_rec_ctx": params.decoder.wx[E:],
            "w_rec_h": params.decoder.wh,
            "att_wq": params.attention.w_q,
            "att_v": params.attention.v,
            "att_b": params.attention.b,
            "gate_w": params.gate_w,
            "gate_b": params.gate_b,
            "att_keys": ctx.att_keys,
            "enc_hs": ctx.enc_hs,
            "mask": ctx.mask,
            "state0": (state0.h, state0.c),
            "zx": jnp.swapaxes(z_x, 0, 1),
            "rng": base_rng,
        }
        outs = jnp.swapaxes(dcnet_recurrent_seq(static, ins), 0, 1)
        return (
            jnp.einsum(
                "bth,hv->btv", outs.astype(dt), params.fc_w.astype(dt),
                preferred_element_type=jnp.float32,
            )
            + params.fc_b
        ).astype(jnp.float32)

    def body(carry, inp):
        state = carry
        z_t, t = inp
        step_rng = jax.random.fold_in(base_rng, t) if train else None
        x_rec = jnp.concatenate(
            _recurrent_contexts(params, cfg, ctx, state.h) + [state.h],
            axis=-1,
        ).astype(dt)
        z = z_t + jnp.dot(x_rec, w_rec, preferred_element_type=jnp.float32)
        h, c = lstm_gates(z, state.c)
        out = dropout(h, cfg.dropout, step_rng, train)
        return DCNetState(h=h, c=c), out

    _, outs = jax.lax.scan(
        body, state0, (jnp.swapaxes(z_x, 0, 1), jnp.arange(T))
    )
    outs = jnp.swapaxes(outs, 0, 1)  # [B, T, H]
    logits = (
        jnp.einsum(
            "bth,hv->btv", outs.astype(dt), params.fc_w.astype(dt),
            preferred_element_type=jnp.float32,
        )
        + params.fc_b
    ).astype(jnp.float32)
    return logits


def step(
    params: DCNetParams,
    cfg: ModelConfig,
    ctx: DCNetContext,
    state: DCNetState,
    token: jax.Array,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> tuple[DCNetState, jax.Array]:
    new_state, out = _step_hidden(params, cfg, ctx, state, token, rng, train)
    dt = _cdt(cfg)
    logits = (
        jnp.dot(out.astype(dt), params.fc_w.astype(dt),
                preferred_element_type=jnp.float32)
        + params.fc_b
    ).astype(jnp.float32)
    return new_state, logits


def step_topk(
    params: DCNetParams,
    cfg: ModelConfig,
    ctx: DCNetContext,
    state: DCNetState,
    token: jax.Array,
    k: int,
) -> tuple[DCNetState, jax.Array, jax.Array, jax.Array]:
    """Decode step with the fused vocab head (captionkit.ops.head)."""
    from captionkit.models.editnet import _head_topk

    new_state, out = _step_hidden(params, cfg, ctx, state, token, None,
                                  False)
    vals, idx, lse = _head_topk(params, cfg, ctx, out, k)
    return new_state, vals, idx, lse


def prepare_topk(
    params: DCNetParams,
    cfg: ModelConfig,
    ctx: DCNetContext,
    k: int,
) -> DCNetContext:
    """Stash pre-padded fused-head weights in ctx (see editnet.prepare_topk
    — one pad+convert per batch instead of per decode step) and, when
    cfg.cell_impl == "pallas", the fused-cell pack (textual config only —
    the visual variant falls back to the jnp step)."""
    if cfg.cell_impl == "pallas" and not cfg.dcnet_use_visual:
        from captionkit.ops.megastep import prepare_dcnet_cell_pack

        ctx = ctx.replace(cell_pack=prepare_dcnet_cell_pack(params, cfg,
                                                            ctx))
    n_rows = ctx.h0.shape[0]
    if cfg.head_quant == "int8":
        from captionkit.ops.head import quantize_head

        w_q, scale, b_p = quantize_head(
            params.fc_w, params.fc_b, n_rows=n_rows, k=k
        )
        return ctx.replace(head_w=w_q, head_b=b_p, head_scale=scale)
    if cfg.head_impl == "xla":
        return ctx
    from captionkit.ops.head import prepad_head

    w_p, b_p = prepad_head(
        params.fc_w, params.fc_b, n_rows=n_rows, k=k,
        compute_dtype=_cdt(cfg),
    )
    return ctx.replace(head_w=w_p, head_b=b_p)


def make_model(cfg: ModelConfig) -> ModelDef:
    return ModelDef(
        name="dcnet",
        init=lambda rng: init(rng, cfg),
        encode=lambda params, features, existing, existing_len: encode(
            params, cfg, features, existing, existing_len
        ),
        init_state=init_state,
        step=lambda params, ctx, state, token, rng=None, train=False: step(
            params, cfg, ctx, state, token, rng, train
        ),
        beam_expand=beam_expand,
        step_topk=(
            (lambda params, ctx, state, token, k: step_topk(
                params, cfg, ctx, state, token, k
            ))
            if cfg.use_fused_head else None
        ),
        prepare_topk=(
            (lambda params, ctx, k: prepare_topk(params, cfg, ctx, k))
            if cfg.use_fused_head else None
        ),
        forward_seq=(
            lambda params, ctx, state0, tokens_in, rng=None, train=False:
            forward_seq(params, cfg, ctx, state0, tokens_in, rng, train)
        ),
        step_attn=(
            lambda params, ctx, state, token: step_attn(
                params, cfg, ctx, state, token
            )
        ),
        step_hidden=(
            lambda params, ctx, state, token: _step_hidden(
                params, cfg, ctx, state, token, None, False
            )
        ),
        head_info=HeadInfo(
            get_wb=lambda p: (p.fc_w, p.fc_b),
            impl=cfg.head_impl,
            quant=cfg.head_quant,
            compute_dtype=_cdt(cfg),
            extract=cfg.head_extract,
        ),
    )
