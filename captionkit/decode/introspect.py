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

from captionkit.decode.beam import BeamResult, _reconstruct
from captionkit.decode.greedy import Rollout
from captionkit.models.base import ModelDef
from captionkit.nn.masking import NEG_INF


class AttentionTrace(NamedTuple):
    rollout: Rollout
    # dict of [B, L, N] fp32 arrays, keys model-specific ("alpha",
    # "beta", "vis_alpha").
    attention: dict[str, jax.Array]


class BeamAttentionTrace(NamedTuple):
    # The WINNING hypothesis per image, greedy-trace-shaped so
    # `attention_report` consumes it unchanged: rollout.tokens [B, L]
    # (== beam_search(...).tokens, pinned by test), attention [B, L, N]
    # gathered along the winner's backpointer path.
    rollout: Rollout
    attention: dict[str, jax.Array]
    # The full n-best result — identical to what `beam_search` returns
    # for the same inputs (impl-independent semantics).
    result: BeamResult


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


def beam_decode_with_attention(
    model: ModelDef,
    params: Any,
    ctx: Any,
    *,
    beam_size: int,
    start_id: int,
    end_id: int,
    pad_id: int = 0,
    max_len: int = 22,
    length_penalty: float = 0.0,
) -> BeamAttentionTrace:
    """Beam search with the winning hypothesis's attention trace.

    Token/score semantics are IDENTICAL to ``beam_search`` (same live-slot
    expansion, finished-beam freezing, completed-pool register, final
    n-best selection — pinned against both ``impl=`` layouts by test).
    Mechanically this is the ``backptr`` layout run as a fixed-length
    ``lax.scan`` instead of the early-exit ``while_loop``, because the
    trace must STACK per-step attention — and the extra post-all-done
    steps are no-ops by construction (finished beams continue only as
    <pad> at logprob 0, so scores, lengths, and the register are fixed
    points once everything is done).

    Per step the scan records every live slot's attention ([B, K, N]) and
    the [B, K] token/parent updates; afterwards the winner's backpointer
    chain is walked once (`beam._reconstruct(return_path=True)`) and its
    PARENT slot at each step — the slot the attention was computed under,
    since ``step_attn`` runs before the reorder — gathers the [B, L, N]
    winner-path distributions. Ensembles trace their mean attention
    (models/ensemble.py step_attn).

    Analysis surface: uses ``step_attn`` (no fused-head top-k), so run it
    on analysis batches, not the serving path.
    """
    if model.step_attn is None:
        raise ValueError(f"model {model.name!r} has no step_attn hook")
    K = beam_size
    B = jax.tree.leaves(ctx)[0].shape[0]
    if model.beam_expand is not None:
        ctx_k = model.beam_expand(ctx, K)
    else:
        ctx_k = jax.tree.map(lambda x: jnp.repeat(x, K, axis=0), ctx)
    model_state = model.init_state(params, ctx_k)

    def rank(scores, lengths):
        lengths_f = jnp.maximum(lengths.astype(jnp.float32), 1.0)
        if length_penalty > 0.0:
            return scores / (lengths_f ** length_penalty)
        return scores

    def gather_bk(x, parent):
        return jnp.take_along_axis(x, parent, axis=1)

    carry0 = dict(
        scores=jnp.tile(
            jnp.asarray([0.0] + [NEG_INF] * (K - 1), jnp.float32), (B, 1)
        ),
        done=jnp.zeros((B, K), bool),
        lengths=jnp.zeros((B, K), jnp.int32),
        tok=jnp.full((B * K,), start_id, jnp.int32),
        model_state=model_state,
        fin_scores=jnp.full((B, K), NEG_INF, jnp.float32),
        fin_t=jnp.zeros((B, K), jnp.int32),
        fin_slot=jnp.zeros((B, K), jnp.int32),
        fin_len=jnp.zeros((B, K), jnp.int32),
        t=jnp.asarray(0, jnp.int32),
    )

    def body(s, _):
        new_state, logits, attn = model.step_attn(
            params, ctx_k, s["model_state"], s["tok"]
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        V = logp.shape[-1]
        logp = logp.reshape(B, K, V)
        pad_row = jnp.full((V,), NEG_INF, jnp.float32).at[pad_id].set(0.0)
        logp = jnp.where(s["done"][:, :, None], pad_row[None, None, :],
                         logp)
        total = s["scores"][:, :, None] + logp  # [B, K, V]
        top_scores, top_idx = jax.lax.top_k(total.reshape(B, K * V), K)
        parent = top_idx // V  # [B, K]
        new_tok = (top_idx % V).astype(jnp.int32)

        was_done = gather_bk(s["done"], parent)
        lengths = gather_bk(s["lengths"], parent) + jnp.logical_not(
            was_done
        )
        done = was_done | (new_tok == end_id)

        flat_parent = (
            jnp.arange(B, dtype=jnp.int32)[:, None] * K + parent
        ).reshape(B * K)
        model_state2 = jax.tree.map(
            lambda x: jnp.take(x, flat_parent, axis=0), new_state
        )

        newly = jnp.logical_and(done, jnp.logical_not(was_done))
        cand_rank = jnp.where(newly, rank(top_scores, lengths), NEG_INF)
        merged = jnp.concatenate([s["fin_scores"], cand_rank], axis=1)
        fin_scores, sel = jax.lax.top_k(merged, K)

        def pick(old, new):
            return jnp.take_along_axis(
                jnp.concatenate([old, new], axis=1), sel, axis=1
            )

        slot_ids = jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[None, :], (B, K)
        )
        carry = dict(
            scores=top_scores,
            done=done,
            lengths=lengths,
            tok=new_tok.reshape(B * K),
            model_state=model_state2,
            fin_scores=fin_scores,
            fin_t=pick(s["fin_t"], jnp.broadcast_to(s["t"], (B, K))),
            fin_slot=pick(s["fin_slot"], slot_ids),
            fin_len=pick(s["fin_len"], lengths),
            t=s["t"] + 1,
        )
        attn_k = {
            k: v.astype(jnp.float32).reshape(B, K, *v.shape[1:])
            for k, v in attn.items()
        }
        return carry, (new_tok, parent, top_scores, attn_k)

    final, (tok_hist, par_hist, score_hist, attn_hist) = jax.lax.scan(
        body, carry0, None, length=max_len
    )  # histories: [L, B, K(, N)]

    # Final n-best selection — the _run_backptr epilogue verbatim.
    slot_rank = rank(final["scores"], final["lengths"])
    any_fin = final["fin_scores"][:, 0] > NEG_INF / 2
    live_rank = jnp.where(any_fin[:, None], NEG_INF, slot_rank)
    merged_scores = jnp.concatenate([final["fin_scores"], live_rank],
                                    axis=1)
    all_scores, sel = jax.lax.top_k(merged_scores, K)

    def pick(old, new):
        return jnp.take_along_axis(
            jnp.concatenate([old, new], axis=1), sel, axis=1
        )

    slot_ids = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[None, :], (B, K)
    )
    live_t = jnp.broadcast_to(
        jnp.maximum(final["t"] - 1, 0), (B, K)
    ).astype(jnp.int32)
    t_sel = pick(final["fin_t"], live_t)
    slot_sel = pick(final["fin_slot"], slot_ids)
    all_lengths = pick(final["fin_len"], final["lengths"])
    active = all_scores > NEG_INF / 2
    all_tokens, slot_at, src_at = _reconstruct(
        tok_hist, par_hist, t_sel, slot_sel, active, pad_id,
        return_path=True,
    )  # each [B, K, L]

    result = BeamResult(
        tokens=all_tokens[:, 0, :],
        scores=all_scores[:, 0],
        lengths=all_lengths[:, 0],
        all_tokens=all_tokens,
        all_scores=all_scores,
        all_lengths=all_lengths,
    )

    # Winner-path gathers. Attention at step t was computed under the
    # ENTERING slot layout (step_attn runs before the reorder), so the
    # gather index is src_at; cumulative scores were recorded AFTER the
    # step's top-k, so theirs is slot_at.
    L = max_len
    src0 = src_at[:, 0, :]  # [B, L]
    slot0 = slot_at[:, 0, :]  # [B, L]
    mask = jnp.arange(L)[None, :] < result.lengths[:, None]  # [B, L]

    def winner_attn(hist):  # [L, B, K, N] -> [B, L, N]
        h = hist.transpose(1, 0, 2, 3)  # [B, L, K, N]
        idx = src0[:, :, None, None]
        out = jnp.take_along_axis(h, idx, axis=2)[:, :, 0, :]
        return jnp.where(mask[:, :, None], out, 0.0)

    attention = {k: winner_attn(v) for k, v in attn_hist.items()}

    # Per-step token log-probs: successive differences of the winner's
    # cumulative score along its slot path (frozen <pad> steps diff to 0,
    # and are masked anyway).
    cum = jnp.take_along_axis(
        score_hist.transpose(1, 0, 2), slot0[:, :, None], axis=2
    )[:, :, 0]  # [B, L]
    prev = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.float32), cum[:, :-1]], axis=1
    )
    logprobs = jnp.where(mask, cum - prev, 0.0)

    roll = Rollout(
        tokens=result.tokens,
        logprobs=logprobs,
        mask=mask,
        lengths=result.lengths,
    )
    return BeamAttentionTrace(rollout=roll, attention=attention,
                              result=result)


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
