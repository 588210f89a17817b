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
log_softmax):
* ``"logprob"`` (default) — arithmetic mean of member log-probs, i.e.
  the renormalized geometric mean of member distributions. Sharper than
  prob-averaging; the usual choice for beam search.
* ``"prob"`` — log of the arithmetic mean of member probabilities
  (computed stably as logsumexp(logp, member_axis) − log M), the
  classic mixture ensemble.

The fused vocab-head fast path (`step_topk`) is intentionally absent:
averaging needs every member's FULL distribution before the top-k, so
the per-member [B, V] logits must materialize — beam search's
measured XLA fallback branch handles that (decode/beam.py
select_candidates, else-branch). Cost model: an M-ensemble pays ~M× the
step FLOPs plus the fused-head win it gives up; measured numbers live
in docs/DESIGN.md ("Ensemble decode").
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp

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

    Returned scores are log-probabilities up to a constant; the decode
    loops all re-apply log_softmax, which renormalizes either mode
    exactly.
    """
    logp = jax.nn.log_softmax(logits_bm.astype(jnp.float32), axis=-1)
    if mode == "logprob":
        return jnp.mean(logp, axis=1)
    # prob: log(mean_m exp(logp)) = logsumexp over members - log M
    m = logits_bm.shape[1]
    return jax.scipy.special.logsumexp(logp, axis=1) - jnp.log(
        jnp.float32(m)
    )


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
            params, ctx
        )  # leaves [M, B, ...]
        return _swap01(state_m)

    def step(params, ctx, state, token, rng=None, train=False):
        def one(p, c, s):
            return member.step(p, c, s, token, rng, train)

        state_m, logits_m = jax.vmap(
            one, in_axes=(0, 1, 1), out_axes=(1, 1)
        )(params, ctx, state)  # state leaves [B, M, ...]; logits [B, M, V]
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

    step_attn = None
    if member.step_attn is not None:

        def step_attn(params, ctx, state, token):
            def one(p, c, s):
                return member.step_attn(p, c, s, token)

            state_m, logits_m, attn_m = jax.vmap(
                one, in_axes=(0, 1, 1), out_axes=(1, 1, 1)
            )(params, ctx, state)
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
        # step_topk/prepare_topk deliberately None: the fused head's
        # per-row top-k happens before member averaging could (module
        # docstring); beam search's XLA fallback materializes the member
        # logits the average needs.
        step_topk=None,
        prepare_topk=None,
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
