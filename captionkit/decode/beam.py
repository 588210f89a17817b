"""Batched static-shape beam search in one lax.while_loop.

The reference beam-searches one image at a time with Python-level
expand/prune (SURVEY.md §4.3, sgrvinod-tutorial style, ⟦cite⟧). This is the
TPU-native replacement (SURVEY.md §8.3 hard-part #2; PAPERS.md vectorized
beam literature):

* All B images × K beams step together as one flattened [B*K] batch, so the
  per-step matmuls stay MXU-sized.
* Beam state is a fixed pytree; the per-step reorder is a single gather per
  leaf with the [B, K] parent index from top-k over K·V candidates.
* Finished beams are frozen: their only continuation is <pad> at log-prob 0,
  so they keep competing with their final score — this reproduces the
  reference's "completed hypotheses pulled out on <end>" semantics without
  dynamic shapes.
* The while_loop exits early once every beam of every image is finished
  (short captions don't pay for max_len).

Per-image context (features, SCMA memory pool, masks) is repeated across the
beam axis once at entry; model recurrent state is reordered every step.

Two interchangeable sequence-history layouts (``impl=``), identical
semantics (both pass the slow-oracle and n-best tests):

* ``"backptr"``: the loop body records only this step's [B, K] tokens and
  parent slots into stacked [L, B, K] histories, and the
  completed-hypotheses register holds scalars (rank score, finish step,
  finish slot, length). Sequences are reconstructed AFTER the loop by one
  reverse scan over the backpointers. Nothing [*, L]-shaped is gathered
  inside the while loop.
* ``"register"`` (default pending an on-chip A/B): the loop body carries
  materialized [B, K, L] sequences (gather-by-parent + in-place token
  append per step) and the register snapshots full sequences the step
  they finish — 3-D take_along_axis gathers of [B, 2K, L] payloads per
  step, which the round-3 profile attributes real layout-copy cost to at
  paper scale.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from captionkit.models.base import ModelDef
from captionkit.nn.masking import NEG_INF


class BeamResult(NamedTuple):
    tokens: jax.Array  # [B, L] best hypothesis per image (pad-filled)
    scores: jax.Array  # [B] its (length-normalized) log-prob score
    lengths: jax.Array  # [B] emitted length (incl. <end> if produced)
    # The n-best list, reference-completed-hypotheses semantics: for an
    # image where any hypothesis finished (<end> within max_len), rows are
    # the top-K FINISHED hypotheses ever seen — including ones later
    # evicted from live slots — score-descending, NEG_INF/pad-filled when
    # fewer than K finished. For an image where nothing finished, rows
    # fall back to the live (unfinished) slots at exit, score-descending.
    # Row 0 always equals (tokens, scores, lengths).
    all_tokens: jax.Array  # [B, K, L]
    all_scores: jax.Array  # [B, K] rank scores (length-normalized)
    all_lengths: jax.Array  # [B, K]


class _BeamState(NamedTuple):
    """Loop carry for impl="register" (materialized sequences)."""

    t: jax.Array  # [] int32 step counter
    seq: jax.Array  # [B, K, L] int32
    scores: jax.Array  # [B, K] cumulative log-prob
    done: jax.Array  # [B, K] bool
    lengths: jax.Array  # [B, K] int32 emitted tokens
    tok: jax.Array  # [B*K] int32 last token fed next step
    model_state: Any  # pytree, leaves [B*K, ...]
    # "Completed pool" register — the reference pulls finished hypotheses
    # out of the beam (SURVEY.md §4.3); here they are registered the step
    # they finish so later slot eviction can never lose them. A top-K
    # (not top-1) register, so the returned n-best list matches the
    # reference's completed-hypotheses list, not just its argmax.
    fin_scores: jax.Array  # [B, K] rank scores, desc (NEG_INF = empty slot)
    fin_seq: jax.Array  # [B, K, L]
    fin_len: jax.Array  # [B, K]


class _BeamStateBP(NamedTuple):
    """Loop carry for impl="backptr" (stacked token/parent histories)."""

    t: jax.Array  # [] int32 step counter
    scores: jax.Array  # [B, K] cumulative log-prob
    done: jax.Array  # [B, K] bool
    lengths: jax.Array  # [B, K] int32 emitted tokens
    tok: jax.Array  # [B*K] int32 last token fed next step
    model_state: Any  # pytree, leaves [B*K, ...]
    tok_hist: jax.Array  # [L, B, K] int32: token appended at step t
    par_hist: jax.Array  # [L, B, K] int32: parent slot at step t
    # Completed pool register, scalar payloads only: the sequence of a
    # finished hypothesis is recoverable from (finish step, finish slot)
    # via the backpointers, so nothing [*, L]-shaped rides the merge.
    fin_scores: jax.Array  # [B, K] rank scores, desc (NEG_INF = empty slot)
    fin_t: jax.Array  # [B, K] int32 step the hypothesis finished at
    fin_slot: jax.Array  # [B, K] int32 live slot it occupied that step
    fin_len: jax.Array  # [B, K]


def _repeat_ctx(ctx: Any, k: int) -> Any:
    """[B, ...] -> [B*K, ...] with each image's context repeated K times."""
    return jax.tree.map(
        lambda x: jnp.repeat(x, k, axis=0), ctx
    )


def _reconstruct(
    tok_hist: jax.Array,  # [L, B, K]
    par_hist: jax.Array,  # [L, B, K]
    t_sel: jax.Array,  # [B, J] finish step per selected hypothesis
    slot_sel: jax.Array,  # [B, J] slot it occupied at that step
    active: jax.Array,  # [B, J] bool — False rows come out all-pad
    pad_id: int,
    *,
    return_path: bool = False,
):
    """Walk the backpointer chains once, newest step first: position t of a
    selected hypothesis is tok_hist[t] at its ancestor slot, found by
    following par_hist backwards from (t_sel, slot_sel). Returns
    [B, J, L] pad-filled beyond t_sel.

    With ``return_path=True`` additionally returns the slot chain:
    ``slot_at`` [B, J, L] — the live slot hypothesis j occupied AFTER
    step t (where its step-t token landed), and ``src_at`` [B, J, L] —
    the slot it occupied ENTERING step t (the parent slot, which indexes
    anything recorded per-step BEFORE the reorder, e.g. attention
    distributions from ``step_attn``). Both are only meaningful for
    t <= t_sel; beam-mode introspection (decode/introspect.py) is the
    consumer."""
    L = tok_hist.shape[0]

    def step(cur, xs):
        tok_t, par_t, t = xs  # [B, K], [B, K], []
        on = jnp.logical_and(t <= t_sel, active)  # [B, J]
        tok = jnp.take_along_axis(tok_t, cur, axis=1)
        par = jnp.take_along_axis(par_t, cur, axis=1)
        out = jnp.where(on, tok, pad_id)
        new_cur = jnp.where(on, par, cur)
        ys = (out, cur, par) if return_path else out
        return new_cur, ys

    ts = jnp.arange(L - 1, -1, -1)
    _, ys = jax.lax.scan(
        step, slot_sel, (tok_hist[::-1], par_hist[::-1], ts)
    )  # [L, B, J] leaves, index i holds step L-1-i

    def unrev(x):  # [L, B, J] reversed-step stack -> [B, J, L]
        return jnp.flip(x, axis=0).transpose(1, 2, 0)

    if return_path:
        toks_rev, slot_rev, src_rev = ys
        return unrev(toks_rev), unrev(slot_rev), unrev(src_rev)
    return unrev(ys)


def beam_search(
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
    impl: str = "register",
) -> BeamResult:
    """Beam search over a whole batch. ctx leaves are [B, ...].

    length_penalty alpha: final score = logprob_sum / length**alpha
    (alpha=0 reproduces the reference's raw-sum ranking [R]).

    impl: "backptr" (default) or "register" — identical results, different
    sequence-history layout inside the while loop (module docstring)."""
    if impl not in ("backptr", "register"):
        raise ValueError(
            f"beam_search impl must be 'backptr' or 'register', got {impl!r}"
        )
    K = beam_size
    B = jax.tree.leaves(ctx)[0].shape[0]
    # Beam-aware models expand only the leaves that need per-beam copies
    # (heavy attention context stays per-image; grouped queries handle the
    # rest) — the generic fallback repeats everything.
    if model.beam_expand is not None:
        ctx_k = model.beam_expand(ctx, K)
    else:
        ctx_k = _repeat_ctx(ctx, K)
    if model.prepare_topk is not None and model.step_topk is not None:
        # Decode-loop-invariant fused-head precomputation (e.g. padding
        # the head weight to the kernel tile grid) — once per batch here,
        # because XLA's while-loop LICM declines to hoist it per step.
        ctx_k = model.prepare_topk(params, ctx_k, K)
    model_state = model.init_state(params, ctx_k)  # leaves [B*K, ...]

    def rank(scores: jax.Array, lengths: jax.Array) -> jax.Array:
        lengths_f = jnp.maximum(lengths.astype(jnp.float32), 1.0)
        if length_penalty > 0.0:
            return scores / (lengths_f ** length_penalty)
        return scores

    def select_candidates(s):
        """One model step + top-K over the K*V (or K*K) candidates.
        Returns (new_model_state, top_scores [B,K], parent [B,K],
        new_tok [B,K]) — shared by both history layouts."""
        if model.step_topk is not None:
            # Fused head (captionkit.ops.head): the kernel returns each
            # row's top-K logits + log-sum-exp, so the [B*K, V] logits,
            # the log_softmax passes, the +scores broadcast, and the
            # K*V-wide sort never exist. Per-row top-K is exact for the
            # global top-K: every global winner is in its own row's top-K.
            new_state, vals, idx, lse = model.step_topk(
                params, ctx_k, s.model_state, s.tok, K
            )
            logp_top = (vals - lse[:, None]).reshape(B, K, K)
            idx_top = idx.reshape(B, K, K)
            # Finished beams: single <pad> candidate at zero cost.
            done3 = s.done[:, :, None]
            slot0 = jnp.arange(K)[None, None, :] == 0
            cand_logp = jnp.where(
                done3, jnp.where(slot0, 0.0, NEG_INF), logp_top
            )
            cand_tok = jnp.where(done3, pad_id, idx_top)
            total = s.scores[:, :, None] + cand_logp  # [B, K, K]
            top_scores, flat = jax.lax.top_k(total.reshape(B, K * K), K)
            parent = flat // K  # [B, K]
            new_tok = jnp.take_along_axis(
                cand_tok.reshape(B, K * K), flat, axis=1
            ).astype(jnp.int32)
        else:
            new_state, logits = model.step(
                params, ctx_k, s.model_state, s.tok, None, False
            )
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            V = logp.shape[-1]
            logp = logp.reshape(B, K, V)

            # Finished beams: only continuation is <pad> at zero cost, so
            # their cumulative score is frozen and they stay in the
            # candidate pool.
            pad_row = jnp.full(
                (V,), NEG_INF, jnp.float32
            ).at[pad_id].set(0.0)
            logp = jnp.where(s.done[:, :, None], pad_row[None, None, :],
                             logp)

            total = s.scores[:, :, None] + logp  # [B, K, V]
            # Single-stage top-k over the flattened K*V candidates. (An
            # exact two-stage variant — per-beam top-K via lax.top_k then
            # a [B, K*K] reduction — was measured 5x SLOWER on v5e: the
            # 3-D lax.top_k lowers far worse than one wide 2-D reduction.
            # The fused-head branch above gets the per-row top-K from the
            # Pallas kernel instead, where it is nearly free.)
            top_scores, top_idx = jax.lax.top_k(total.reshape(B, K * V), K)
            parent = top_idx // V  # [B, K]
            new_tok = (top_idx % V).astype(jnp.int32)  # [B, K]
        return new_state, top_scores, parent, new_tok

    def gather_bk(x, parent):  # [B, K, ...] -> select parents
        return jnp.take_along_axis(
            x,
            parent.reshape(B, K, *([1] * (x.ndim - 2))),
            axis=1,
        )

    def reorder_model_state(new_state, parent):
        # Flat global row indices for the state reorder: gathering rows of
        # the [B*K, ...] leaves directly (instead of reshape -> 3-D
        # take_along_axis -> reshape) lets XLA keep the leaf's {1,0}
        # layout — the 3-D form forced a {2,0,1} layout copy of every
        # state leaf before each gather (copy.204-208 in the round-3
        # profile, ~19us x 4 leaves per step at paper scale).
        flat_parent = (
            jnp.arange(B, dtype=jnp.int32)[:, None] * K + parent
        ).reshape(B * K)
        return jax.tree.map(
            lambda x: jnp.take(x, flat_parent, axis=0), new_state
        )

    def cond(s):
        return jnp.logical_and(s.t < max_len, jnp.logical_not(jnp.all(s.done)))

    if impl == "backptr":
        return _run_backptr(
            model_state, B, K, max_len, start_id, end_id, pad_id,
            rank, select_candidates, gather_bk, reorder_model_state, cond,
        )
    return _run_register(
        model_state, B, K, max_len, start_id, end_id, pad_id,
        rank, select_candidates, gather_bk, reorder_model_state, cond,
    )


def _run_backptr(
    model_state, B, K, max_len, start_id, end_id, pad_id,
    rank, select_candidates, gather_bk, reorder_model_state, cond,
) -> BeamResult:
    """Backpointer history: the loop records [B, K] tokens/parents per step;
    sequences materialize once, after the loop. The completed-pool register
    merge touches only scalars — no [B, 2K, L] payload gathers per step."""
    init = _BeamStateBP(
        t=jnp.asarray(0, jnp.int32),
        # Only beam 0 is live at t=0 so the first top-k yields K distinct
        # continuations of the single start hypothesis.
        scores=jnp.tile(
            jnp.asarray([0.0] + [NEG_INF] * (K - 1), jnp.float32), (B, 1)
        ),
        done=jnp.zeros((B, K), bool),
        lengths=jnp.zeros((B, K), jnp.int32),
        tok=jnp.full((B * K,), start_id, jnp.int32),
        model_state=model_state,
        tok_hist=jnp.full((max_len, B, K), pad_id, jnp.int32),
        par_hist=jnp.zeros((max_len, B, K), jnp.int32),
        fin_scores=jnp.full((B, K), NEG_INF, jnp.float32),
        fin_t=jnp.zeros((B, K), jnp.int32),
        fin_slot=jnp.zeros((B, K), jnp.int32),
        fin_len=jnp.zeros((B, K), jnp.int32),
    )

    def body(s: _BeamStateBP) -> _BeamStateBP:
        new_state, top_scores, parent, new_tok = select_candidates(s)

        tok_hist = jax.lax.dynamic_update_index_in_dim(
            s.tok_hist, new_tok, s.t, axis=0
        )
        par_hist = jax.lax.dynamic_update_index_in_dim(
            s.par_hist, parent, s.t, axis=0
        )
        was_done = gather_bk(s.done, parent)
        lengths = gather_bk(s.lengths, parent) + jnp.logical_not(was_done)
        done = was_done | (new_tok == end_id)

        model_state2 = reorder_model_state(new_state, parent)

        # Register hypotheses that finished THIS step into the completed
        # pool (per image, top-K ever finished, by rank score): merge the
        # running register with this step's newly-finished candidates.
        # A hypothesis finishes exactly once (done & ~was_done), so the
        # register never holds duplicates; top_k's lowest-index tie-break
        # keeps earlier-registered hypotheses ahead on equal scores.
        newly = jnp.logical_and(done, jnp.logical_not(was_done))  # [B, K]
        cand_rank = jnp.where(newly, rank(top_scores, lengths), NEG_INF)
        merged_scores = jnp.concatenate(
            [s.fin_scores, cand_rank], axis=1
        )  # [B, 2K]
        fin_scores, sel = jax.lax.top_k(merged_scores, K)

        def pick(old, new):  # [B, K] x [B, K] scalars -> merged top-K
            return jnp.take_along_axis(
                jnp.concatenate([old, new], axis=1), sel, axis=1
            )

        slot_ids = jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[None, :], (B, K)
        )
        fin_t = pick(s.fin_t, jnp.broadcast_to(s.t, (B, K)))
        fin_slot = pick(s.fin_slot, slot_ids)
        fin_len = pick(s.fin_len, lengths)

        return _BeamStateBP(
            t=s.t + 1,
            scores=top_scores,
            done=done,
            lengths=lengths,
            tok=new_tok.reshape(B * K),
            model_state=model_state2,
            tok_hist=tok_hist,
            par_hist=par_hist,
            fin_scores=fin_scores,
            fin_t=fin_t,
            fin_slot=fin_slot,
            fin_len=fin_len,
        )

    final = jax.lax.while_loop(cond, body, init)

    # Reference semantics: if ANY hypothesis finished, the result set is
    # the completed pool (finished-only, even if fewer than K); otherwise
    # fall back to the live (unfinished) slots at exit. A finished live
    # slot is always already in the register (it was merged the step it
    # finished, and eviction requires K better finished hypotheses), so
    # masking live slots out for finished images loses nothing and avoids
    # duplicating register entries.
    slot_rank = rank(final.scores, final.lengths)
    any_fin = final.fin_scores[:, 0] > NEG_INF / 2  # [B]
    live_rank = jnp.where(any_fin[:, None], NEG_INF, slot_rank)  # [B, K]
    merged_scores = jnp.concatenate(
        [final.fin_scores, live_rank], axis=1
    )  # [B, 2K]
    all_scores, sel = jax.lax.top_k(merged_scores, K)

    def pick(old, new):
        return jnp.take_along_axis(
            jnp.concatenate([old, new], axis=1), sel, axis=1
        )

    slot_ids = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[None, :], (B, K)
    )
    # Live rows backtrack from the last executed step (t-1, their slot).
    live_t = jnp.broadcast_to(
        jnp.maximum(final.t - 1, 0), (B, K)
    ).astype(jnp.int32)
    t_sel = pick(final.fin_t, live_t)
    slot_sel = pick(final.fin_slot, slot_ids)
    all_lengths = pick(final.fin_len, final.lengths)
    active = all_scores > NEG_INF / 2
    all_tokens = _reconstruct(
        final.tok_hist, final.par_hist, t_sel, slot_sel, active, pad_id
    )

    return BeamResult(
        tokens=all_tokens[:, 0, :],
        scores=all_scores[:, 0],
        lengths=all_lengths[:, 0],
        all_tokens=all_tokens,
        all_scores=all_scores,
        all_lengths=all_lengths,
    )


def _run_register(
    model_state, B, K, max_len, start_id, end_id, pad_id,
    rank, select_candidates, gather_bk, reorder_model_state, cond,
) -> BeamResult:
    """Materialized-sequence history (the round-2/3 production layout):
    the loop carries [B, K, L] sequences and the register snapshots full
    sequences at finish time."""
    init = _BeamState(
        t=jnp.asarray(0, jnp.int32),
        seq=jnp.full((B, K, max_len), pad_id, jnp.int32),
        scores=jnp.tile(
            jnp.asarray([0.0] + [NEG_INF] * (K - 1), jnp.float32), (B, 1)
        ),
        done=jnp.zeros((B, K), bool),
        lengths=jnp.zeros((B, K), jnp.int32),
        tok=jnp.full((B * K,), start_id, jnp.int32),
        model_state=model_state,
        fin_scores=jnp.full((B, K), NEG_INF, jnp.float32),
        fin_seq=jnp.full((B, K, max_len), pad_id, jnp.int32),
        fin_len=jnp.zeros((B, K), jnp.int32),
    )

    def body(s: _BeamState) -> _BeamState:
        new_state, top_scores, parent, new_tok = select_candidates(s)

        seq = gather_bk(s.seq, parent)
        seq = jax.lax.dynamic_update_index_in_dim(
            seq, new_tok, s.t, axis=2
        )
        was_done = gather_bk(s.done, parent)
        lengths = gather_bk(s.lengths, parent) + jnp.logical_not(was_done)
        done = was_done | (new_tok == end_id)

        model_state2 = reorder_model_state(new_state, parent)

        # Register hypotheses that finished THIS step into the completed
        # pool — see _run_backptr for the shared invariants.
        newly = jnp.logical_and(done, jnp.logical_not(was_done))  # [B, K]
        cand_rank = jnp.where(newly, rank(top_scores, lengths), NEG_INF)
        merged_scores = jnp.concatenate(
            [s.fin_scores, cand_rank], axis=1
        )  # [B, 2K]
        fin_scores, sel = jax.lax.top_k(merged_scores, K)
        merged_seq = jnp.concatenate([s.fin_seq, seq], axis=1)  # [B, 2K, L]
        fin_seq = jnp.take_along_axis(merged_seq, sel[:, :, None], axis=1)
        merged_len = jnp.concatenate([s.fin_len, lengths], axis=1)
        fin_len = jnp.take_along_axis(merged_len, sel, axis=1)
        # (A lax.cond skip on steps where nothing finished measured SLOWER
        # — 6,916 vs 7,077 c/s — the cond's carry copies cost more than
        # the ~450KB/step merge it avoids.)

        return _BeamState(
            t=s.t + 1,
            seq=seq,
            scores=top_scores,
            done=done,
            lengths=lengths,
            tok=new_tok.reshape(B * K),
            model_state=model_state2,
            fin_scores=fin_scores,
            fin_seq=fin_seq,
            fin_len=fin_len,
        )

    final = jax.lax.while_loop(cond, body, init)

    slot_rank = rank(final.scores, final.lengths)
    any_fin = final.fin_scores[:, 0] > NEG_INF / 2  # [B]
    live_rank = jnp.where(any_fin[:, None], NEG_INF, slot_rank)  # [B, K]
    merged_scores = jnp.concatenate(
        [final.fin_scores, live_rank], axis=1
    )  # [B, 2K]
    all_scores, sel = jax.lax.top_k(merged_scores, K)
    merged_seq = jnp.concatenate([final.fin_seq, final.seq], axis=1)
    all_tokens = jnp.take_along_axis(merged_seq, sel[:, :, None], axis=1)
    merged_len = jnp.concatenate([final.fin_len, final.lengths], axis=1)
    all_lengths = jnp.take_along_axis(merged_len, sel, axis=1)

    return BeamResult(
        tokens=all_tokens[:, 0, :],
        scores=all_scores[:, 0],
        lengths=all_lengths[:, 0],
        all_tokens=all_tokens,
        all_scores=all_scores,
        all_lengths=all_lengths,
    )
