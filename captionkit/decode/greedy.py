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
) -> Rollout:
    """Batched multinomial sampling rollout (the SCST 'sample' leg,
    SURVEY.md §4.4). Per-step log-probs are returned for REINFORCE."""
    return _rollout(
        model, params, ctx,
        start_id=start_id, end_id=end_id, pad_id=pad_id, max_len=max_len,
        rng=rng, temperature=temperature,
    )


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
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if rng is None:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            step_rng = jax.random.fold_in(rng, t)
            nxt = jax.random.categorical(
                step_rng, logits.astype(jnp.float32) / temperature, axis=-1
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
