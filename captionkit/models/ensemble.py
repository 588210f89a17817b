"""Decode-time model ensembling: one ModelDef over M stacked checkpoints.

The captioning-community standard for squeezing the last CIDEr point out
of trained models is to average several same-architecture checkpoints'
per-step distributions during decode (AoANet/ruotianluo eval_ensemble
style; the reference repo ships single models, but its AoANet input
captions are routinely produced by exactly this kind of ensemble —
SURVEY.md §3.1 "Existing-caption source"). captionkit makes it a
ModelDef combinator, so every existing decode surface — greedy,
sampling, beam (register AND backptr), the stacked DCNet→EditNet
pipeline, the pipelined split driver, serving — runs ensembles with
zero changes to the loops.

TPU-first shape: member parameters are STACKED on a new leading axis
(`stack_params`) and every per-member computation is one `jax.vmap`
over that axis — M members run as one compiled program whose matmuls
are batched over the member axis, not M sequential model calls. Inside
ctx/state pytrees the member axis lives on **axis 1** (leaves are
[B, M, ...] / [B*K, M, ...]): axis 0 stays the batch axis, so beam
search's flat-index state reorder (`decode/beam.py reorder_model_state`)
and its `B = leaves(ctx)[0].shape[0]` batch discovery work untouched.

Combination modes (both renormalized downstream by the decode loops'
log_softmax / softmax / argmax — all invariant to a per-row constant):
* ``"logprob"`` (default) — the renormalized geometric mean of member
  distributions. Computed as the arithmetic **mean of member logits**:
  mean_m log_softmax(z_m) = mean_m(z_m) − mean_m(lse_m), and the second
  term is a per-row constant the downstream renorm absorbs, so the M
  per-member log_softmax passes are redundant work (round-4 verdict).
  Sharper than prob-averaging; the usual choice for beam search.
* ``"prob"`` — log of the arithmetic mean of member probabilities
  (computed stably as logsumexp(logp, member_axis) − log M), the
  classic mixture ensemble. This mode genuinely needs every member's
  full renormalized distribution.

Fused-head fast path (``mode="logprob"`` only): because the combined
score is the mean of member logits, and

    mean_m(h_m @ W_m + b_m) = [h_0 ‖ … ‖ h_{M-1}] @ [[W_0/M], …] + b̄,

the M member heads collapse into ONE [B·K, M·H] × [M·H, V] matmul over
member-concatenated hiddens and pre-concatenated weights — which the
existing fused vocab-head kernel (ops/head.py: matmul + online LSE +
per-row top-k, logits never in HBM) runs unchanged with H′ = M·H. The
ensemble therefore exposes `step_topk`/`prepare_topk` in logprob mode:
members run `step_hidden` (pre-head recurrent math, vmapped over the
member axis) and the combined head replaces M materialized [B·K, V]
logits round-trips. Beam results are exactly the fallback path's: the
fused branch accumulates vals − lse = log_softmax(mean logits), which
equals log_softmax(mean member log-probs) identically. ``prob`` mode
keeps the XLA fallback (full distributions are genuinely required
before any top-k there).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import struct

from captionkit.models.base import ModelDef

_MODES = ("logprob", "prob")


def stack_params(params_list: Sequence[Any]) -> Any:
    """Stack M structurally-identical parameter pytrees on a new axis 0.

    The result is the `params` argument for `ensemble_model(...)`'s
    ModelDef. Raises if the trees disagree in structure or leaf shapes
    (checkpoints from different configs cannot be ensembled).
    """
    if not params_list:
        raise ValueError("stack_params needs at least one member")
    treedefs = {str(jax.tree_util.tree_structure(p)) for p in params_list}
    if len(treedefs) != 1:
        raise ValueError(
            "ensemble members have different parameter structures "
            "(mixed architectures or configs?)"
        )
    first = jax.tree.leaves(params_list[0])
    for i, p in enumerate(params_list[1:], start=1):
        for a, b in zip(first, jax.tree.leaves(p)):
            if jnp.shape(a) != jnp.shape(b):
                raise ValueError(
                    f"ensemble member {i} leaf shape {jnp.shape(b)} != "
                    f"member 0 shape {jnp.shape(a)} "
                    "(different model dims cannot be ensembled)"
                )
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *params_list)


def _swap01(tree: Any) -> Any:
    """[M, B, ...] leaves -> [B, M, ...] (and back — it's an involution)."""
    return jax.tree.map(lambda x: jnp.moveaxis(x, 0, 1), tree)


def _combine(logits_bm: jax.Array, mode: str) -> jax.Array:
    """[B, M, V] member logits -> [B, V] ensemble scores (fp32).

    Returned scores are log-probabilities up to a per-row constant; the
    decode loops all renormalize (log_softmax before scoring, softmax /
    categorical / argmax for sampling and greedy), which makes either
    mode exact. For "logprob" the mean of raw member logits differs from
    the mean of member log-probs by exactly mean_m(lse_m) per row, so
    the M log_softmax passes are skipped (identical post-renorm —
    pinned by tests/test_ensemble.py::test_combine_logprob_mean_logits).
    """
    if mode == "logprob":
        return jnp.mean(logits_bm.astype(jnp.float32), axis=1)
    # prob: log(mean_m exp(logp)) = logsumexp over members - log M
    logp = jax.nn.log_softmax(logits_bm.astype(jnp.float32), axis=-1)
    m = logits_bm.shape[1]
    return jax.scipy.special.logsumexp(logp, axis=1) - jnp.log(
        jnp.float32(m)
    )


@struct.dataclass
class _EnsembleTopkCtx:
    """Ensemble ctx after prepare_topk: the member ctx (leaves
    [B·K, M, ...]) plus the decode-loop-invariant COMBINED head — member
    fc weights concatenated on the feature axis and pre-scaled by 1/M
    ([M·H, Vp], padded/quantized to the kernel tile grid), mean bias.
    Lives only between beam search's prepare_topk call and the loop
    body's step_topk calls, so no other surface sees the wrapper."""

    member: Any
    head_w: Optional[jax.Array] = None  # [M*H, Vp] compute dtype or int8
    head_b: Optional[jax.Array] = None  # [Vp] fp32 (padding = -1e30)
    head_scale: Optional[jax.Array] = None  # [Vp] fp32 (int8 only)


def _member_ctx(ctx: Any) -> Any:
    return ctx.member if isinstance(ctx, _EnsembleTopkCtx) else ctx


def _combined_head_wb(member: ModelDef, params: Any
                      ) -> tuple[jax.Array, jax.Array]:
    """(w_cat [M*H, V] fp32, b_mean [V] fp32) implementing the mean of
    member logits as one matmul: rows are member-major (member m owns
    rows m·H..(m+1)·H−1), matching h_m.reshape(B, M*H)'s layout."""
    w_m, b_m = member.head_info.get_wb(params)  # [M, H, V], [M, V]
    M, H, V = w_m.shape
    w_cat = (w_m.astype(jnp.float32) / jnp.float32(M)).reshape(M * H, V)
    return w_cat, jnp.mean(b_m.astype(jnp.float32), axis=0)


def ensemble_model(
    member: ModelDef,
    num_members: int,
    *,
    mode: str = "logprob",
) -> ModelDef:
    """Wrap a ModelDef so it decodes an M-member checkpoint ensemble.

    `member` is the single-model definition (e.g. `get_model(mcfg)`);
    the returned ModelDef's `params` argument is `stack_params([...])`
    of M checkpoints of that exact config. All members share one
    architecture/config — that is what makes the vmap legal.
    """
    if mode not in _MODES:
        raise ValueError(f"ensemble mode must be one of {_MODES}, got "
                         f"{mode!r}")
    if num_members < 1:
        raise ValueError("num_members must be >= 1")
    M = num_members

    def init(rng: jax.Array) -> Any:
        # M independent inits — handy for tests; real ensembles load
        # trained checkpoints via stack_params.
        return stack_params(
            [member.init(r) for r in jax.random.split(rng, M)]
        )

    def encode(params, features, existing, existing_len):
        ctx_m = jax.vmap(member.encode, in_axes=(0, None, None, None))(
            params, features, existing, existing_len
        )  # leaves [M, B, ...]
        return _swap01(ctx_m)  # leaves [B, M, ...]

    def init_state(params, ctx):
        state_m = jax.vmap(member.init_state, in_axes=(0, 1), out_axes=0)(
            params, _member_ctx(ctx)
        )  # leaves [M, B, ...]
        return _swap01(state_m)

    def step(params, ctx, state, token, rng=None, train=False):
        def one(p, c, s):
            return member.step(p, c, s, token, rng, train)

        state_m, logits_m = jax.vmap(
            one, in_axes=(0, 1, 1), out_axes=(1, 1)
        )(params, _member_ctx(ctx), state)
        # state leaves [B, M, ...]; logits [B, M, V]
        return state_m, _combine(logits_m, mode)

    beam_expand = None
    if member.beam_expand is not None:

        def beam_expand(ctx, k):
            # Member beam_expand repeats only the leaves that need
            # per-beam copies; run it per member on the member axis.
            return _swap01(
                jax.vmap(
                    lambda c: member.beam_expand(c, k), in_axes=1
                )(ctx)
            )

    # Fused combined head (module docstring): logprob mode only — the
    # mean of member logits is one [B·K, M·H] x [M·H, V] matmul, which
    # the member's configured head machinery (Pallas fused top-k / XLA /
    # int8 twins) runs unchanged with H' = M·H. prob mode genuinely
    # needs every member's full renormalized distribution before any
    # top-k, so it keeps beam search's XLA fallback branch.
    fused_ok = (
        mode == "logprob"
        and member.step_topk is not None  # member config enables it
        and member.step_hidden is not None
        and member.head_info is not None
    )
    prepare_topk = step_topk = None
    if fused_ok:
        hi = member.head_info

        def prepare_topk(params, ctx, k):
            w_cat, b_mean = _combined_head_wb(member, params)
            n_rows = jax.tree.leaves(ctx)[0].shape[0]  # B*K
            if hi.quant == "int8":
                from captionkit.ops.head import quantize_head

                w_q, scale, b_p = quantize_head(
                    w_cat, b_mean, n_rows=n_rows, k=k
                )
                return _EnsembleTopkCtx(
                    member=ctx, head_w=w_q, head_b=b_p, head_scale=scale
                )
            if hi.impl == "xla":
                # No tile padding needed; hoist the concat/scale only.
                return _EnsembleTopkCtx(
                    member=ctx,
                    head_w=w_cat.astype(hi.compute_dtype),
                    head_b=b_mean,
                )
            from captionkit.ops.head import prepad_head

            w_p, b_p = prepad_head(
                w_cat, b_mean, n_rows=n_rows, k=k,
                compute_dtype=hi.compute_dtype,
            )
            return _EnsembleTopkCtx(member=ctx, head_w=w_p, head_b=b_p)

        def step_topk(params, ctx, state, token, k):
            mctx = _member_ctx(ctx)

            def one(p, c, s):
                return member.step_hidden(p, c, s, token)

            state_m, h_m = jax.vmap(
                one, in_axes=(0, 1, 1), out_axes=(1, 1)
            )(params, mctx, state)  # h_m [B, M, H]
            B = h_m.shape[0]
            h_cat = h_m.reshape(B, M * h_m.shape[2])  # member-major
            if isinstance(ctx, _EnsembleTopkCtx) and ctx.head_w is not None:
                w, b, scale = ctx.head_w, ctx.head_b, ctx.head_scale
            else:  # step_topk without prepare: build the head inline
                w, b = _combined_head_wb(member, params)
                scale = None
                if hi.quant == "int8":
                    from captionkit.ops.head import quantize_head

                    w, scale, b = quantize_head(w, b, n_rows=B, k=k)
            if hi.quant == "int8":
                from captionkit.ops import pallas_supported
                from captionkit.ops.head import (
                    fused_head_topk_int8,
                    xla_head_topk_int8,
                )

                if hi.impl == "xla":
                    vals, idx, lse = xla_head_topk_int8(
                        h_cat, w, scale, b, k=k
                    )
                else:
                    vals, idx, lse = fused_head_topk_int8(
                        h_cat, w, scale, b, k=k,
                        interpret=not pallas_supported(),
                        extract=hi.extract,
                    )
            elif hi.impl == "xla":
                from captionkit.ops.head import xla_head_topk

                vals, idx, lse = xla_head_topk(
                    h_cat, w, b, k=k, compute_dtype=hi.compute_dtype
                )
            else:
                from captionkit.ops import pallas_supported
                from captionkit.ops.head import fused_head_topk

                vals, idx, lse = fused_head_topk(
                    h_cat, w, b, k=k, compute_dtype=hi.compute_dtype,
                    interpret=not pallas_supported(), extract=hi.extract,
                )
            return state_m, vals, idx, lse

    step_attn = None
    if member.step_attn is not None:

        def step_attn(params, ctx, state, token):
            def one(p, c, s):
                return member.step_attn(p, c, s, token)

            state_m, logits_m, attn_m = jax.vmap(
                one, in_axes=(0, 1, 1), out_axes=(1, 1, 1)
            )(params, _member_ctx(ctx), state)
            # Introspection reports the ensemble's mean attention — the
            # distribution family the averaged next-token scores actually
            # attended with.
            attn = jax.tree.map(lambda a: jnp.mean(a, axis=1), attn_m)
            return state_m, _combine(logits_m, mode), attn

    return ModelDef(
        name=f"ensemble{M}[{member.name},{mode}]",
        init=init,
        encode=encode,
        init_state=init_state,
        step=step,
        beam_expand=beam_expand,
        step_topk=step_topk,
        prepare_topk=prepare_topk,
        forward_seq=None,
        step_attn=step_attn,
    )


def load_ensemble_params(
    member: ModelDef, paths: Sequence[str], template: Optional[Any] = None
) -> Any:
    """stack_params over M `save_params_npz` checkpoints of `member`."""
    from captionkit.train.checkpoint import load_params_npz

    if template is None:
        template = member.init(jax.random.PRNGKey(0))
    return stack_params([load_params_npz(template, p) for p in paths])
