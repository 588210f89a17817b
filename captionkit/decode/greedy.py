"""Greedy and sampling rollouts as single lax.scan programs.

Replaces the reference's per-image Python argmax loop (SURVEY.md §4.3) and
the SCST sample/greedy rollout loops (SURVEY.md §4.4) with device-resident
scans over static max_len. Finished rows keep emitting <pad> with zero
log-prob, so batch decode needs no ragged handling.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from captionkit.models.base import ModelDef


class Rollout(NamedTuple):
    tokens: jax.Array  # [B, L] int32 generated tokens (pad after <end>)
    logprobs: jax.Array  # [B, L] fp32 log p(token) (0 after finish)
    mask: jax.Array  # [B, L] bool — True where the token was really emitted
    lengths: jax.Array  # [B] int32 number of emitted tokens (incl. <end>)


def greedy_decode(
    model: ModelDef,
    params: Any,
    ctx: Any,
    *,
    start_id: int,
    end_id: int,
    pad_id: int = 0,
    max_len: int = 22,
) -> Rollout:
    """Batched greedy decode: one scan, argmax feedback."""
    return _rollout(
        model, params, ctx,
        start_id=start_id, end_id=end_id, pad_id=pad_id, max_len=max_len,
        rng=None, temperature=1.0,
    )


def sample_decode(
    model: ModelDef,
    params: Any,
    ctx: Any,
    rng: jax.Array,
    *,
    start_id: int,
    end_id: int,
    pad_id: int = 0,
    max_len: int = 22,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> Rollout:
    """Batched multinomial sampling rollout (the SCST 'sample' leg,
    SURVEY.md §4.4). Per-step log-probs are returned for REINFORCE.

    ``top_k`` (> 0) restricts sampling to each step's k highest-logit
    tokens; ``top_p`` (< 1.0) to the smallest set whose softmax mass
    reaches p (nucleus sampling) — both standard truncations the
    reference's plain multinomial lacks. They compose: top_k first,
    then top_p over the survivors. Temperature applies before both.
    The returned log-probs are of the TRUNCATED, renormalized
    distribution (what was actually sampled from), which is what
    REINFORCE needs if these are ever used for training rollouts."""
    return _rollout(
        model, params, ctx,
        start_id=start_id, end_id=end_id, pad_id=pad_id, max_len=max_len,
        rng=rng, temperature=temperature, top_k=top_k, top_p=top_p,
    )


def _truncate_logits(logits: jax.Array, top_k: int, top_p: float
                     ) -> jax.Array:
    """Mask logits outside the top-k / nucleus set to -inf (fp32 in/out).
    Exact tie behavior: top_k keeps every token tied with the k-th value
    (a superset, never fewer); top_p keeps the minimal prefix of the
    descending-prob order whose mass reaches p (the threshold token that
    crosses p is kept)."""
    neg = jnp.float32(-1e30)
    if top_k and top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][:, -1:]  # [B, 1]
        logits = jnp.where(logits >= kth, logits, neg)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]  # desc
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # exclusive cumulative mass BEFORE each position: a token is in
        # the nucleus iff the mass before it is still < top_p (so the
        # token crossing the boundary is kept).
        before = cum - probs
        keep_sorted = before < top_p
        # threshold = smallest kept logit in the sorted order
        thresh = jnp.min(
            jnp.where(keep_sorted, sorted_logits, jnp.float32(1e30)),
            axis=-1, keepdims=True,
        )
        logits = jnp.where(logits >= thresh, logits, neg)
    return logits


def _rollout(
    model: ModelDef,
    params: Any,
    ctx: Any,
    *,
    start_id: int,
    end_id: int,
    pad_id: int,
    max_len: int,
    rng: Optional[jax.Array],
    temperature: float,
    top_k: int = 0,
    top_p: float = 1.0,
) -> Rollout:
    state = model.init_state(params, ctx)
    batch = jax.tree.leaves(state)[0].shape[0]
    tok0 = jnp.full((batch,), start_id, jnp.int32)
    done0 = jnp.zeros((batch,), bool)

    def body(carry, t):
        state, tok, done = carry
        # Note: the fused head (model.step_topk, k=1) was measured SLOWER
        # than XLA here (20.8k vs 22.3k captions/s at B=512): greedy has
        # no K*V sort to eliminate, and at B (not B*K) rows the kernel's
        # fixed top-k/LSE overhead outweighs the logits round-trip it
        # saves. Beam search keeps the fused head; greedy keeps XLA.
        state, logits = model.step(params, ctx, state, tok, None, False)
        if rng is None:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            scaled = logits.astype(jnp.float32) / temperature
            if top_k or top_p < 1.0:
                scaled = _truncate_logits(scaled, top_k, top_p)
            # log-probs of the (possibly truncated, renormalized)
            # distribution actually sampled from.
            logp = jax.nn.log_softmax(scaled, axis=-1)
            step_rng = jax.random.fold_in(rng, t)
            nxt = jax.random.categorical(
                step_rng, scaled, axis=-1
            ).astype(jnp.int32)
        emitted = jnp.logical_not(done)
        nxt = jnp.where(emitted, nxt, pad_id)
        tok_logp = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
        tok_logp = jnp.where(emitted, tok_logp, 0.0)
        done = done | (nxt == end_id)
        return (state, nxt, done), (nxt, tok_logp, emitted)

    (_, _, _), (tokens, logprobs, mask) = jax.lax.scan(
        body, (state, tok0, done0), jnp.arange(max_len)
    )
    tokens = jnp.swapaxes(tokens, 0, 1)  # [B, L]
    logprobs = jnp.swapaxes(logprobs, 0, 1)
    mask = jnp.swapaxes(mask, 0, 1)
    lengths = jnp.sum(mask.astype(jnp.int32), axis=-1)
    return Rollout(tokens=tokens, logprobs=logprobs, mask=mask,
                   lengths=lengths)
