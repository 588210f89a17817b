"""EditNet — visually grounded caption editor with SCMA + Copy-LSTM.

Reference behaviour (SURVEY.md §1, §3.2, §4.2; paper §3.2):

1. An LSTM encoder reads the existing caption, retaining BOTH hidden states
   {h_i} and cell states {c_i} — the memory pool SCMA copies from.
2. A top-down (Up-Down style) two-LSTM decoder over 36x2048 bottom-up region
   features:
     - Attention-LSTM: x_t = [w_emb_t ; v̄ ; h^lang_{t-1}] -> h^att_t
     - visual attention over V queried by h^att_t -> v̂_t (gated)
     - SCMA: score {h_i} with h^att_t, select from {c_i} -> c*_t
     - Copy-LSTM: x̃ = [v̂_t ; h^att_t], copy gate blends c* into the cell
     - fc(h^lang_t) -> vocab logits
⟦cite: editnet.py — reference mount empty at build time, SURVEY.md §0⟧

TPU design notes:
* ``encode`` runs the caption encoder once and pre-projects BOTH attention
  key sets (visual + SCMA), so a decode step is exactly: 2 fused LSTM-cell
  matmuls + 2 attention reads — all MXU/VPU work on static shapes.
* The entire recurrent state is four [B, H] arrays; beam search reorders it
  with one gather (SURVEY.md §8.3 hard-part #2). The SCMA memory pool lives
  in ctx (per-image, broadcast across beams) — it is NOT part of the beam
  state, which keeps the reorder cheap.
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
    scma_select,
)
from captionkit.nn.cells import (
    CopyLSTMParams,
    LSTMParams,
    init_copy_lstm,
    init_lstm,
    lstm_encode,
    lstm_gates,
)
from captionkit.nn.dispatch import (
    get_attention_fn,
    get_copy_lstm_cell_fn,
)
from captionkit.nn.masking import length_mask
from captionkit.utils.config import ModelConfig


@struct.dataclass
class EditNetParams:
    embedding: Any  # [V, E]
    encoder: LSTMParams  # caption encoder: E -> H
    att_lstm: LSTMParams  # [E + F + H] -> H
    vis_attention: AdditiveAttentionParams  # keys from F, query H
    vis_gate_w: Any  # [H, F] context gate on v̂
    vis_gate_b: Any  # [F]
    scma: AdditiveAttentionParams  # keys from enc H, query H
    lang_lstm: CopyLSTMParams  # [F + H] -> H, with copy gate
    fc_w: Any  # [H, V]
    fc_b: Any  # [V]


@struct.dataclass
class EditNetContext:
    features: jax.Array  # [B, R, F] region features (attention values)
    vis_keys: jax.Array  # [B, R, A]
    v_mean: jax.Array  # [B, F]
    att_zv: jax.Array  # [B, 4H]  hoisted v̄·Wx_v att-LSTM pre-activation
    enc_hs: jax.Array  # [B, T, H]   (SCMA scoring targets)
    enc_cs: jax.Array  # [B, T, H]   (SCMA copy pool)
    scma_keys: jax.Array  # [B, T, A]
    mask: jax.Array  # [B, T] bool
    # Decode-loop-invariant fused-head weights, stashed by prepare_topk
    # (pre-padded to the kernel tile grid + pre-converted to compute
    # dtype) so the while_loop body's pad/convert become no-ops.
    head_w: Optional[jax.Array] = None  # [H, Vp] compute dtype (or int8)
    head_b: Optional[jax.Array] = None  # [Vp] fp32, padding = -1e30
    # Per-column dequant scales when cfg.head_quant == "int8" (head_w is
    # then the int8-quantized weight from ops.head.quantize_head).
    head_scale: Optional[jax.Array] = None  # [Vp] fp32
    # Fused decode-cell pack (ops.megastep.CellPack), stashed by
    # prepare_topk when cfg.cell_impl == "pallas": padded weights +
    # context for the two cell kernels, built once per decode batch.
    cell_pack: Optional[Any] = None


@struct.dataclass
class EditNetState:
    h_att: jax.Array  # [B, H]
    c_att: jax.Array  # [B, H]
    h_lang: jax.Array  # [B, H]
    c_lang: jax.Array  # [B, H]


def _u(key, shape, scale):
    return jax.random.uniform(key, shape, jnp.float32, -scale, scale)


def init(rng: jax.Array, cfg: ModelConfig) -> EditNetParams:
    E, H, A, V, F = (
        cfg.emb_dim, cfg.hidden_dim, cfg.att_dim, cfg.vocab_size,
        cfg.feat_dim,
    )
    ks = jax.random.split(rng, 9)
    return EditNetParams(
        embedding=_u(ks[0], (V, E), 0.1),
        encoder=init_lstm(ks[1], E, H),
        att_lstm=init_lstm(ks[2], E + F + H, H),
        vis_attention=init_additive_attention(ks[3], F, H, A),
        vis_gate_w=_u(ks[4], (H, F), 1.0 / jnp.sqrt(H)),
        vis_gate_b=jnp.zeros((F,), jnp.float32),
        scma=init_additive_attention(ks[5], H, H, A),
        lang_lstm=init_copy_lstm(ks[6], F + H, H),
        fc_w=_u(ks[7], (H, V), 1.0 / jnp.sqrt(H)),
        fc_b=jnp.zeros((V,), jnp.float32),
    )


def _cdt(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


def encode(
    params: EditNetParams,
    cfg: ModelConfig,
    features: jax.Array,  # [B, R, F]
    existing: jax.Array,  # [B, T]
    existing_len: jax.Array,  # [B]
) -> EditNetContext:
    dt = _cdt(cfg)
    E, F = cfg.emb_dim, cfg.feat_dim
    emb = params.embedding[existing]
    hs, cs = lstm_encode(params.encoder, emb, existing_len, compute_dtype=dt)
    v_mean = jnp.mean(features, axis=1)  # [B, F] fp32
    # The att-LSTM consumes x_t = [w_emb_t ; v̄ ; h_lang]; the v̄ slice of
    # that matmul is STEP-INVARIANT (v̄ never changes during decode), yet
    # at paper scale it is 40% of the step's largest matmul — recomputed
    # per step × per beam in a naive port. Hoist it here: one [B, F]x[F, 4H]
    # matmul per sequence, added to the per-step gate pre-activations.
    att_zv = jnp.dot(
        v_mean.astype(dt), params.att_lstm.wx[E:E + F].astype(dt),
        preferred_element_type=jnp.float32,
    )
    # Context tensors are stored in compute dtype: the decode loop re-reads
    # features/keys/encoder states from HBM every step (×beam_width), so
    # bf16 storage halves the dominant HBM traffic of the step
    # (perf breakdown: the beam step is bandwidth-bound, not FLOP-bound).
    return EditNetContext(
        features=features.astype(dt),
        vis_keys=project_keys(params.vis_attention, features,
                              compute_dtype=dt).astype(dt),
        v_mean=v_mean.astype(dt),
        att_zv=att_zv,
        enc_hs=hs.astype(dt),
        enc_cs=cs.astype(dt),
        scma_keys=project_keys(params.scma, hs, compute_dtype=dt).astype(dt),
        mask=length_mask(existing_len, existing.shape[1]),
    )


def init_state(params: EditNetParams, ctx: EditNetContext) -> EditNetState:
    # Sized from v_mean: under beam expansion it is the per-beam leaf
    # (features stay per-image for grouped attention).
    B = ctx.v_mean.shape[0]
    H = params.fc_w.shape[0]
    z = jnp.zeros((B, H), jnp.float32)
    return EditNetState(h_att=z, c_att=z, h_lang=z, c_lang=z)


def beam_expand(ctx: EditNetContext, k: int) -> EditNetContext:
    """Repeat only v_mean (consumed in the att-LSTM input concat, so it
    must be [B*K]) and att_zv; all attention keys/values/masks stay
    per-image.

    att_zv is repeated HERE, outside the decode loop, on purpose: XLA's
    while-loop LICM declines to hoist the [B*K, 4H] broadcast (it avoids
    materializing large loop-invariant buffers), so leaving the repeat to
    _step_hidden re-ran broadcast+reshape every step — 90us/step of pure
    HBM churn at paper scale (round-3 profile: broadcast_in_dim.315 25us
    + reshape.395 65us, both x44 inside while.6). One 42MB materialization
    per batch replaces 44 of them."""
    return ctx.replace(
        v_mean=jnp.repeat(ctx.v_mean, k, axis=0),
        att_zv=jnp.repeat(ctx.att_zv, k, axis=0),
    )


def _step_hidden(
    params: EditNetParams,
    cfg: ModelConfig,
    ctx: EditNetContext,
    state: EditNetState,
    token: jax.Array,  # [B]
    rng: Optional[jax.Array] = None,
    train: bool = False,
    return_attn: bool = False,
):
    """One EditNet decode step up to (but not including) the vocab head —
    SURVEY.md §4.2's hot loop, one fused trace. Returns the (possibly
    dropped-out) language hidden state the head consumes; with
    ``return_attn`` also the attention distributions (jnp path only —
    the fused cell kernels don't emit them)."""
    dt = _cdt(cfg)
    emb = params.embedding[token]  # [B, E]

    if ctx.cell_pack is not None and not train and not return_attn:
        # Fused cell kernels (cfg.cell_impl == "pallas"; the pack was
        # built by prepare_topk from this exact ctx). Inference-only:
        # the kernels have no backward and skip dropout.
        from captionkit.ops import pallas_supported
        from captionkit.ops.megastep import fused_step_hidden

        h_att, c_att, h_lang, c_lang = fused_step_hidden(
            ctx.cell_pack, state.h_att, state.c_att, state.h_lang,
            state.c_lang, emb, num_regions=cfg.num_regions,
            compute_dtype=dt, interpret=not pallas_supported(),
        )
        return (
            EditNetState(h_att=h_att, c_att=c_att, h_lang=h_lang,
                         c_lang=c_lang),
            h_lang,
        )

    # 1. Attention LSTM: gate pre-activations from a [E+H+H, 4H] matmul
    # over the step-VARYING inputs plus the hoisted step-invariant v̄ term
    # (ctx.att_zv, computed once in encode; per-image under grouped beam
    # layout).
    E, F = cfg.emb_dim, cfg.feat_dim
    # Loop-invariant weight assembly — XLA hoists it out of scan/while.
    w_att = jnp.concatenate(
        [params.att_lstm.wx[:E], params.att_lstm.wx[E + F:],
         params.att_lstm.wh], axis=0,
    ).astype(dt)
    x_var = jnp.concatenate(
        [emb, state.h_lang, state.h_att], axis=-1
    ).astype(dt)
    z = jnp.dot(x_var, w_att, preferred_element_type=jnp.float32)
    zv = ctx.att_zv  # [B, 4H]
    N, B = z.shape[0], zv.shape[0]
    if N != B:  # grouped beam layout: rows contiguous per image
        # Fallback only — beam_expand pre-repeats att_zv to [B*K] so
        # beam decode never takes this branch (XLA's while-loop LICM
        # declines to hoist the big broadcast; see beam_expand). Kept
        # for callers that pass a grouped ctx without beam_expand.
        zv = jnp.repeat(zv, N // B, axis=0)
    h_att, c_att = lstm_gates(z + zv + params.att_lstm.b, state.c_att)

    return _finish_step(params, cfg, ctx, state, h_att, c_att, rng, train,
                        return_attn=return_attn)


def _finish_step(
    params: EditNetParams,
    cfg: ModelConfig,
    ctx: EditNetContext,
    state: EditNetState,
    h_att: jax.Array,
    c_att: jax.Array,
    rng: Optional[jax.Array],
    train: bool,
    return_attn: bool = False,
):
    """Steps 2–4 of the decode step (visual attention, SCMA, Copy-LSTM)
    given the already-computed attention-LSTM state. With ``return_attn``
    a third element carries the step's attention distributions — the
    paper's qualitative analysis surface (visual α over regions, SCMA β
    over the existing caption's positions)."""
    dt = _cdt(cfg)
    copy_lstm_cell = get_copy_lstm_cell_fn()
    attention = get_attention_fn()

    # 2. Visual attention over regions (no mask: all 36 regions valid).
    v_hat, alpha = attention(
        params.vis_attention, ctx.vis_keys, ctx.features, h_att,
        None, compute_dtype=dt,
    )  # [B, F]
    # Cast the attended read to compute dtype at the source: its only
    # consumers (gate multiply, then the Copy-LSTM matmuls) eat dt
    # anyway, and casting here lets XLA emit the [B, F] read in dt
    # instead of round-tripping a 2x-wide fp32 buffer through HBM
    # (round-3 profile: ~33us/step at paper beam shapes). At fp32
    # compute dtype these casts are no-ops.
    v_hat = v_hat.astype(dt)
    # Gate matmul in compute dtype like every other matmul of the step
    # ([B*K, H] x [H, F] — at paper beam shapes an fp32 dot here costs
    # ~3x its bf16 twin on the MXU); the sigmoid and blend stay fp32.
    gate = jax.nn.sigmoid(
        jnp.dot(h_att.astype(dt), params.vis_gate_w.astype(dt),
                preferred_element_type=jnp.float32)
        + params.vis_gate_b
    )
    v_hat = (gate * v_hat).astype(dt)

    # 3. SCMA: select a memory cell state from the caption encoder.
    c_star, beta = scma_select(
        params.scma, ctx.scma_keys, ctx.enc_cs, h_att, ctx.mask,
        mode=cfg.scma_select, compute_dtype=dt, attention_fn=attention,
    )  # [B, H]

    # 4. Copy-LSTM language model.
    x_lang = jnp.concatenate([v_hat, h_att], axis=-1)
    h_lang, c_lang = copy_lstm_cell(
        params.lang_lstm, x_lang, state.h_lang, state.c_lang, c_star,
        compute_dtype=dt,
    )

    out = dropout(h_lang, cfg.dropout, rng, train)
    new_state = EditNetState(h_att=h_att, c_att=c_att, h_lang=h_lang,
                             c_lang=c_lang)
    if return_attn:
        # Key convention (decode.introspect relies on it): "vis_alpha" =
        # distribution over REGIONS, "beta"/"alpha" = distributions over
        # the existing caption's positions (word-resolvable).
        return new_state, out, {"vis_alpha": alpha, "beta": beta}
    return new_state, out


def forward_seq(
    params: EditNetParams,
    cfg: ModelConfig,
    ctx: EditNetContext,
    state0: EditNetState,
    tokens_in: jax.Array,  # [B, T]
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jax.Array:
    """Training-optimized teacher forcing (ModelDef.forward_seq).

    Row-wise identical math to scanning `step`, restructured so nothing
    that is independent of the recurrent state lives inside the scan:

    * embedding lookup for ALL timesteps — one gather (its gradient is
      one scatter over B·T rows instead of T scatter-adds into the 39MB
      table);
    * the emb-slice of the att-LSTM gate matmul — one [B·T, E]x[E, 4H]
      contraction (its dW is one matmul instead of T accumulations);
    * the hoisted v̄ term (ctx.att_zv, also step-invariant);
    * the vocab head — one [B·T, H]x[H, V] matmul after the scan (its
      39MB fp32 dW was previously accumulated per timestep).

    The scan carries only the genuinely recurrent math: the h-side gate
    matmuls, attention/SCMA reads, and the Copy-LSTM.
    """
    dt = _cdt(cfg)
    E = cfg.emb_dim
    T = tokens_in.shape[1]
    base_rng = rng if rng is not None else jax.random.PRNGKey(0)

    emb_seq = params.embedding[tokens_in]  # [B, T, E]
    z_x = (
        jnp.einsum(
            "bte,ef->btf", emb_seq.astype(dt),
            params.att_lstm.wx[:E].astype(dt),
            preferred_element_type=jnp.float32,
        )
        + ctx.att_zv[:, None, :]
        + params.att_lstm.b
    )  # [B, T, 4H] fp32

    F = cfg.feat_dim
    w_rec = jnp.concatenate(
        [params.att_lstm.wx[E + F:], params.att_lstm.wh], axis=0
    ).astype(dt)  # [(H_lang + H_att), 4H]

    if cfg.deferred_backward and cfg.scma_select == "soft":
        from captionkit.models.editnet_backward import _recurrent_seq

        static = (cfg.compute_dtype, float(cfg.dropout), bool(train), T)
        ins = {
            "w_rec_lang": params.att_lstm.wx[E + F:],
            "w_rec_att": params.att_lstm.wh,
            "lang_wx": params.lang_lstm.base.wx,
            "lang_wh": params.lang_lstm.base.wh,
            "lang_b": params.lang_lstm.base.b,
            "lang_wrx": params.lang_lstm.wrx,
            "lang_wrh": params.lang_lstm.wrh,
            "lang_wrc": params.lang_lstm.wrc,
            "lang_br": params.lang_lstm.br,
            "vis_wq": params.vis_attention.w_q,
            "vis_v": params.vis_attention.v,
            "vis_b": params.vis_attention.b,
            "gate_w": params.vis_gate_w,
            "gate_b": params.vis_gate_b,
            "scma_wq": params.scma.w_q,
            "scma_v": params.scma.v,
            "scma_b": params.scma.b,
            "vis_keys": ctx.vis_keys,
            "features": ctx.features,
            "scma_keys": ctx.scma_keys,
            "enc_cs": ctx.enc_cs,
            "mask": ctx.mask,
            "state0": (state0.h_att, state0.c_att,
                       state0.h_lang, state0.c_lang),
            "zx": jnp.swapaxes(z_x, 0, 1),
            "rng": base_rng,
        }
        outs = jnp.swapaxes(_recurrent_seq(static, ins), 0, 1)
        return (
            jnp.einsum(
                "bth,hv->btv", outs.astype(dt), params.fc_w.astype(dt),
                preferred_element_type=jnp.float32,
            )
            + params.fc_b
        ).astype(jnp.float32)

    def body(carry, inp):
        state = carry
        z_t, t = inp  # [B, 4H], []
        step_rng = jax.random.fold_in(base_rng, t) if train else None
        hh = jnp.concatenate(
            [state.h_lang, state.h_att], axis=-1
        ).astype(dt)
        z = z_t + jnp.dot(hh, w_rec, preferred_element_type=jnp.float32)
        h_att, c_att = lstm_gates(z, state.c_att)
        state, out = _finish_step(
            params, cfg, ctx, state, h_att, c_att, step_rng, train
        )
        return state, out

    # (scan unroll measured: unroll=3 -> 17.9, unroll=7 -> 18.8 steps/s
    # vs 21.0 at unroll=1, B=256 — bloats the body without fusing the
    # per-step dW accumulates, so it stays rolled. lax.scan's experimental
    # _split_transpose was also measured: no effect at these shapes.)
    _, outs = jax.lax.scan(
        body, state0, (jnp.swapaxes(z_x, 0, 1), jnp.arange(T))
    )  # outs [T, B, H]
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
    params: EditNetParams,
    cfg: ModelConfig,
    ctx: EditNetContext,
    state: EditNetState,
    token: jax.Array,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> tuple[EditNetState, jax.Array]:
    new_state, out = _step_hidden(params, cfg, ctx, state, token, rng, train)
    dt = _cdt(cfg)
    # Vocab head on the MXU in compute dtype (the single largest matmul of
    # the step: [B, H] x [H, ~9.5k]); logits accumulate in fp32.
    logits = (
        jnp.dot(out.astype(dt), params.fc_w.astype(dt),
                preferred_element_type=jnp.float32)
        + params.fc_b
    ).astype(jnp.float32)
    return new_state, logits


def step_attn(
    params: EditNetParams,
    cfg: ModelConfig,
    ctx: EditNetContext,
    state: EditNetState,
    token: jax.Array,
) -> tuple[EditNetState, jax.Array, dict]:
    """Introspection step (ModelDef.step_attn): same math as ``step`` but
    also returns {"alpha": [B, R] visual attention over regions,
    "beta": [B, T] SCMA distribution over existing-caption positions} —
    the arrays behind the paper's qualitative figures (which word was
    copied from where, which region grounded each generated word)."""
    new_state, out, attn = _step_hidden(
        params, cfg, ctx, state, token, None, False, return_attn=True
    )
    dt = _cdt(cfg)
    logits = (
        jnp.dot(out.astype(dt), params.fc_w.astype(dt),
                preferred_element_type=jnp.float32)
        + params.fc_b
    ).astype(jnp.float32)
    return new_state, logits, attn


def prepare_topk(
    params: EditNetParams,
    cfg: ModelConfig,
    ctx: EditNetContext,
    k: int,
) -> EditNetContext:
    """Stash the decode-loop-invariant precomputations in ctx: the
    pre-padded fused-head weights (ops.head.prepad_head) and, when
    cfg.cell_impl == "pallas", the fused-cell pack (ops.megastep) — one
    pad+convert per batch instead of per decode step."""
    if (cfg.cell_impl in ("pallas", "wholestep")
            and cfg.scma_select == "soft"):
        from captionkit.ops.megastep import prepare_cell_pack

        ctx = ctx.replace(cell_pack=prepare_cell_pack(params, cfg, ctx))
    n_rows = ctx.v_mean.shape[0]
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


def step_topk(
    params: EditNetParams,
    cfg: ModelConfig,
    ctx: EditNetContext,
    state: EditNetState,
    token: jax.Array,
    k: int,
) -> tuple[EditNetState, jax.Array, jax.Array, jax.Array]:
    """Decode step with the fused head: returns (state, top-k logit values,
    their vocab ids, log-sum-exp) without materializing [B, V] logits."""
    if (cfg.cell_impl == "wholestep" and ctx.cell_pack is not None
            and cfg.head_impl == "pallas" and cfg.head_quant == "none"):
        # Whole-step kernel (ops/wholestep.py): lang cell + vocab head in
        # ONE pallas_call — the measured answer to the round-4 arithmetic
        # bound (docs/DESIGN.md). Float head only; int8/xla heads and
        # non-prepared ctx fall through to the two-program path below.
        from captionkit.ops import pallas_supported
        from captionkit.ops.wholestep import fused_step_topk

        emb = params.embedding[token]
        w = params.fc_w if ctx.head_w is None else ctx.head_w
        b = params.fc_b if ctx.head_b is None else ctx.head_b
        h_att, c_att, h_lang, c_lang, vals, idx, lse = fused_step_topk(
            ctx.cell_pack, state.h_att, state.c_att, state.h_lang,
            state.c_lang, emb, w, b, k=k, num_regions=cfg.num_regions,
            compute_dtype=_cdt(cfg), interpret=not pallas_supported(),
        )
        return (
            EditNetState(h_att=h_att, c_att=c_att, h_lang=h_lang,
                         c_lang=c_lang),
            vals, idx, lse,
        )
    new_state, out = _step_hidden(params, cfg, ctx, state, token, None,
                                  False)
    vals, idx, lse = _head_topk(params, cfg, ctx, out, k)
    return new_state, vals, idx, lse


def _head_topk(params, cfg, ctx, out, k):
    """Dispatch the vocab-head top-k: float fused kernel (default), plain
    XLA, or the int8-quantized twins of either (cfg.head_quant)."""
    if cfg.head_quant == "int8":
        from captionkit.ops import pallas_supported
        from captionkit.ops.head import (
            fused_head_topk_int8,
            quantize_head,
            xla_head_topk_int8,
        )

        if ctx.head_scale is None:  # topk without prepare: quantize inline
            w_q, scale, b_p = quantize_head(
                params.fc_w, params.fc_b, n_rows=out.shape[0], k=k
            )
        else:
            w_q, scale, b_p = ctx.head_w, ctx.head_scale, ctx.head_b
        if cfg.head_impl == "xla":
            return xla_head_topk_int8(out, w_q, scale, b_p, k=k)
        return fused_head_topk_int8(
            out, w_q, scale, b_p, k=k, interpret=not pallas_supported(),
            extract=cfg.head_extract,
        )
    if cfg.head_impl == "xla":
        from captionkit.ops.head import xla_head_topk

        return xla_head_topk(
            out, params.fc_w, params.fc_b, k=k, compute_dtype=_cdt(cfg)
        )
    from captionkit.ops import pallas_supported
    from captionkit.ops.head import fused_head_topk

    w = params.fc_w if ctx.head_w is None else ctx.head_w
    b = params.fc_b if ctx.head_b is None else ctx.head_b
    return fused_head_topk(
        out, w, b, k=k, compute_dtype=_cdt(cfg),
        interpret=not pallas_supported(), extract=cfg.head_extract,
    )


def make_model(cfg: ModelConfig) -> ModelDef:
    return ModelDef(
        name="editnet",
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
        # Training-optimized teacher forcing.
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
