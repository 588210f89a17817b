"""Greedy decode with attention traces — the analysis surface behind the
paper's qualitative figures (Show, Edit & Tell §qualitative: which
existing-caption word SCMA copies from at each output step, which region
the visual attention grounds each word in).

Token semantics are IDENTICAL to decode.greedy.greedy_decode (same
argmax/done/pad rules — pinned by test); the only addition is that the
scan also stacks each step's attention distributions from the model's
``step_attn`` hook:

Key convention (models guarantee it): ``vis_alpha`` is always a
distribution over REGIONS; ``alpha``/``beta`` are always distributions
over the existing caption's positions and resolve to source words.

* EditNet: ``vis_alpha`` [B, L, R] over regions, ``beta`` [B, L, T] over
  the existing caption's positions.
* DCNet: ``alpha`` [B, L, T] over the existing caption (plus
  ``vis_alpha`` when the visual flag is on).

Host-side, ``attention_report`` turns one image's trace into a readable
per-step record (emitted word, top attended source word, weight).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from captionkit.decode.greedy import Rollout
from captionkit.models.base import ModelDef


class AttentionTrace(NamedTuple):
    rollout: Rollout
    # dict of [B, L, N] fp32 arrays, keys model-specific ("alpha",
    # "beta", "vis_alpha").
    attention: dict[str, jax.Array]


def greedy_decode_with_attention(
    model: ModelDef,
    params: Any,
    ctx: Any,
    *,
    start_id: int,
    end_id: int,
    pad_id: int = 0,
    max_len: int = 22,
) -> AttentionTrace:
    if model.step_attn is None:
        raise ValueError(f"model {model.name!r} has no step_attn hook")
    state = model.init_state(params, ctx)
    batch = jax.tree.leaves(state)[0].shape[0]
    tok0 = jnp.full((batch,), start_id, jnp.int32)
    done0 = jnp.zeros((batch,), bool)

    def body(carry, _):
        state, tok, done = carry
        state, logits, attn = model.step_attn(params, ctx, state, tok)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        emitted = jnp.logical_not(done)
        nxt = jnp.where(emitted, nxt, pad_id)
        tok_logp = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
        tok_logp = jnp.where(emitted, tok_logp, 0.0)
        done = done | (nxt == end_id)
        attn = {k: v.astype(jnp.float32) for k, v in attn.items()}
        return (state, nxt, done), (nxt, tok_logp, emitted, attn)

    (_, _, _), (tokens, logprobs, mask, attns) = jax.lax.scan(
        body, (state, tok0, done0), None, length=max_len
    )
    roll = Rollout(
        tokens=jnp.swapaxes(tokens, 0, 1),
        logprobs=jnp.swapaxes(logprobs, 0, 1),
        mask=jnp.swapaxes(mask, 0, 1),
        lengths=jnp.sum(jnp.swapaxes(mask, 0, 1).astype(jnp.int32), -1),
    )
    attention = {k: jnp.swapaxes(v, 0, 1) for k, v in attns.items()}
    return AttentionTrace(rollout=roll, attention=attention)


def attention_report(
    trace: AttentionTrace,
    image: int,
    vocab,
    existing_tokens: np.ndarray,  # [T] the existing caption's ids
) -> list[dict]:
    """One image's per-step record: emitted word + the argmax source of
    each attention distribution (SCMA beta / text alpha resolve to the
    existing caption's words; visual alpha to a region index)."""
    toks = np.asarray(trace.rollout.tokens[image])
    mask = np.asarray(trace.rollout.mask[image])
    # Positional (no special-token stripping): beta/alpha index the
    # encoder's padded positions, so the word list must align 1:1.
    existing_words = vocab.decode(np.asarray(existing_tokens),
                                  strip_special=False)
    out = []
    for t in range(len(toks)):
        if not mask[t]:
            break
        rec: dict = {
            "step": t,
            "word": vocab.id2word.get(int(toks[t]), "<unk>"),
        }
        for key, arr in trace.attention.items():
            dist = np.asarray(arr[image, t])
            j = int(dist.argmax())
            rec[key + "_argmax"] = j
            rec[key + "_weight"] = float(dist[j])
            # Resolve to a source word only for caption-position
            # distributions ("alpha"/"beta" by the key convention above);
            # "vis_alpha" indexes regions, never words — even when the
            # region count happens to equal the padded caption length.
            if key != "vis_alpha" and j < len(existing_words):
                rec[key + "_word"] = existing_words[j]
        out.append(rec)
    return out
