"""The decoder-step protocol shared by every model (SURVEY.md §8.1 step 3).

A model is a ``ModelDef`` — a bundle of pure functions over explicit
parameter pytrees (flax.struct dataclasses). No framework module state:
everything threads through arguments, so the same ``step`` runs under
``lax.scan`` (teacher forcing, greedy, SCST sampling) and inside the beam
search's ``lax.while_loop`` with flattened [B*K] batches.

Shapes convention:
* ``ctx``    — per-sequence static context pytree, leaves [B, ...]
* ``state``  — recurrent state pytree, leaves [B, ...]; beam search reorders
               it with a gather, so every leaf's axis 0 must be batch.
* ``step``   — (params, ctx, state, token[B] int32, rng|None, train)
               -> (state, logits[B, V] fp32)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

# (params, rng, batch_features, existing, existing_len) -> ctx
EncodeFn = Callable[..., Any]
# (params, ctx) -> state
InitStateFn = Callable[..., Any]
# (params, ctx, state, token, rng, train) -> (state, logits)
StepFn = Callable[..., tuple[Any, jax.Array]]


@dataclass(frozen=True)
class HeadInfo:
    """Static description of a model's vocab head, for combinators that
    build DERIVED heads from member parameters (models/ensemble.py builds
    a [M*H, V] concatenated mean-logits head for logprob ensembles).

    ``get_wb(params) -> (w [H, V], b [V])`` is a pure accessor — applied
    to ``stack_params`` trees it returns member-stacked ([M, H, V],
    [M, V]) weights because it is plain attribute access. ``impl`` /
    ``quant`` / ``compute_dtype`` mirror the model's configured head
    dispatch (ModelConfig.head_impl / head_quant / compute dtype)."""

    get_wb: Callable[[Any], tuple[jax.Array, jax.Array]]
    impl: str = "pallas"  # "pallas" | "xla"
    quant: str = "none"  # "none" | "int8"
    compute_dtype: Any = jnp.float32
    extract: str = "mask"  # in-kernel top-k algorithm (head_extract)


@dataclass(frozen=True)
class ModelDef:
    """A caption editor: encode once, then step a token at a time."""

    name: str
    init: Callable[..., Any]  # (rng, cfg) -> params
    encode: EncodeFn
    init_state: InitStateFn
    step: StepFn
    # Optional beam-aware context expansion: (ctx, k) -> ctx where only the
    # leaves that genuinely need a per-beam copy are repeated; heavy
    # attention keys/values stay per-image and the attention layers handle
    # grouped [B*K] queries (captionkit.nn.attention). None => beam search
    # falls back to repeating every leaf.
    beam_expand: Optional[Callable[[Any, int], Any]] = None
    # Optional fused decode head: (params, ctx, state, token, k) ->
    # (new_state, top_vals [B,k] fp32 raw logits, top_idx [B,k] int32,
    # lse [B] fp32). When present, beam search never materializes the
    # [B, V] logits — the vocab head + log-softmax + per-row top-k run in
    # one Pallas kernel (captionkit.ops.head; round-2 profiling found the
    # XLA vocab tail was 42% of beam-step device time).
    step_topk: Optional[Callable[..., Any]] = None
    # Optional decode-loop-invariant precomputation for the fused head:
    # (params, ctx, k) -> ctx. Called once by beam search after
    # beam_expand, BEFORE the while_loop, so per-step loop-invariant work
    # XLA declines to hoist (e.g. padding the [H, V] head weight to the
    # kernel's tile grid — 37us/step at paper scale) happens once per
    # batch instead of once per step.
    prepare_topk: Optional[Callable[[Any, Any, int], Any]] = None
    # Optional training-optimized teacher forcing: (params, ctx, state0,
    # tokens_in [B,T], rng, train) -> logits [B,T,V]. Row-wise identical
    # math to scanning `step`, but the parts of the step that do not
    # depend on recurrent state — the embedding lookup, the input-side
    # slice of the gate matmul, and the vocab head — run OUTSIDE the scan
    # as single batched matmuls. The win is the backward pass: scanning
    # the full step makes XLA accumulate dW for EVERY weight once per
    # timestep (~200MB of HBM read+write per token step at paper scale —
    # the embedding-table and fc-head gradients alone are 39MB each);
    # hoisting turns those into one matmul/scatter over B*T rows.
    forward_seq: Optional[Callable[..., jax.Array]] = None
    # Optional pre-head decode step: (params, ctx, state, token) ->
    # (state, hidden [B, H]) — the same recurrent math as `step` stopped
    # BEFORE the vocab head (inference-only: no rng/dropout). Combinators
    # that substitute their own head (the ensemble's concatenated
    # mean-logits head) run this instead of `step` so the member [B, V]
    # logits never materialize.
    step_hidden: Optional[Callable[..., tuple[Any, jax.Array]]] = None
    # Optional vocab-head description (HeadInfo) for those combinators.
    head_info: Optional[HeadInfo] = None
    # Optional introspection step: (params, ctx, state, token) ->
    # (state, logits, attn dict) where attn carries the step's attention
    # distributions (e.g. EditNet's visual alpha over regions and SCMA
    # beta over existing-caption positions) — the surface behind the
    # paper's qualitative copy/ground analyses (decode.introspect).
    step_attn: Optional[Callable[..., Any]] = None


def teacher_forcing_logits(
    model: ModelDef,
    params: Any,
    ctx: Any,
    state: Any,
    tokens_in: jax.Array,  # [B, T] decoder inputs (<start> w1 ... w_{T-1})
    *,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jax.Array:
    """Run the step function over gold inputs with lax.scan.

    Replaces the reference's Python per-timestep decoder loop
    (SURVEY.md §4.1 'HOT LOOP') with one compiled scan. Returns
    logits [B, T, V] — logits[:, t] predicts the token after tokens_in[:, t].
    """
    if model.forward_seq is not None:
        return model.forward_seq(params, ctx, state, tokens_in, rng, train)
    T = tokens_in.shape[1]
    base_rng = rng if rng is not None else jax.random.PRNGKey(0)

    def body(carry, inp):
        state = carry
        tok, t = inp
        step_rng = jax.random.fold_in(base_rng, t) if train else None
        state, logits = model.step(params, ctx, state, tok, step_rng, train)
        return state, logits

    _, logits = jax.lax.scan(
        body,
        state,
        (jnp.swapaxes(tokens_in, 0, 1), jnp.arange(T)),
    )
    return jnp.swapaxes(logits, 0, 1)


def dropout(
    x: jax.Array, rate: float, rng: Optional[jax.Array], train: bool
) -> jax.Array:
    """Inverted dropout; identity when not training or rate == 0."""
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
