"""Decode tests: greedy/sample rollout semantics and batched beam search vs
a slow Python beam oracle on the same weights (SURVEY.md §5 item 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from captionkit.decode import beam_search, greedy_decode, sample_decode
from captionkit.models import get_model
from captionkit.utils.config import ModelConfig

CFG = dict(
    vocab_size=30, emb_dim=12, hidden_dim=16, att_dim=8,
    feat_dim=10, num_regions=4, dropout=0.0, compute_dtype="float32",
)
START, END, PAD = 2, 3, 0


def _setup(arch="editnet", batch=4, t_in=6, seed=0, **over):
    cfg = ModelConfig(arch=arch, **{**CFG, **over})
    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(
        rng.standard_normal((batch, cfg.num_regions, cfg.feat_dim)),
        jnp.float32,
    )
    existing = jnp.asarray(
        rng.integers(4, cfg.vocab_size, (batch, t_in)), jnp.int32
    )
    existing_len = jnp.asarray(
        rng.integers(2, t_in + 1, (batch,)), jnp.int32
    )
    ctx = model.encode(params, feats, existing, existing_len)
    return cfg, model, params, ctx


@pytest.mark.parametrize("arch", ["dcnet", "editnet"])
def test_greedy_rollout_semantics(arch):
    cfg, model, params, ctx = _setup(arch)
    out = greedy_decode(model, params, ctx, start_id=START, end_id=END,
                        pad_id=PAD, max_len=10)
    assert out.tokens.shape == (4, 10)
    toks = np.asarray(out.tokens)
    mask = np.asarray(out.mask)
    lens = np.asarray(out.lengths)
    for b in range(4):
        # After <end> (if emitted) everything is pad with mask False.
        if END in toks[b]:
            e = int(np.argmax(toks[b] == END))
            assert np.all(toks[b, e + 1:] == PAD)
            assert not mask[b, e + 1:].any()
            assert lens[b] == e + 1
        # log-probs are zero exactly where mask is False.
        np.testing.assert_array_equal(
            np.asarray(out.logprobs)[b] == 0.0, ~mask[b]
        )


def test_greedy_matches_manual_argmax_loop():
    cfg, model, params, ctx = _setup("editnet", batch=2)
    out = greedy_decode(model, params, ctx, start_id=START, end_id=END,
                        pad_id=PAD, max_len=8)
    state = model.init_state(params, ctx)
    tok = jnp.full((2,), START, jnp.int32)
    done = np.zeros((2,), bool)
    rows = []
    for _ in range(8):
        state, logits = model.step(params, ctx, state, tok)
        nxt = np.asarray(jnp.argmax(logits, -1)).astype(np.int32)
        nxt = np.where(done, PAD, nxt)
        rows.append(nxt.copy())
        done |= nxt == END
        tok = jnp.asarray(nxt)
    np.testing.assert_array_equal(np.asarray(out.tokens), np.stack(rows, 1))


def test_sample_decode_reproducible_and_diverse():
    cfg, model, params, ctx = _setup("editnet")
    r = jax.random.PRNGKey(5)
    a = sample_decode(model, params, ctx, r, start_id=START, end_id=END,
                      max_len=10)
    b = sample_decode(model, params, ctx, r, start_id=START, end_id=END,
                      max_len=10)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    c = sample_decode(model, params, ctx, jax.random.PRNGKey(6),
                      start_id=START, end_id=END, max_len=10)
    assert not np.array_equal(np.asarray(a.tokens), np.asarray(c.tokens))
    # Sampled token log-probs must be the model's own log-probs (spot check
    # they are negative where emitted).
    lp = np.asarray(a.logprobs)
    m = np.asarray(a.mask)
    assert (lp[m] < 0).all()


# ---------------------------------------------------------------------------
# Slow Python beam oracle with identical semantics (frozen finished slots +
# completed-pool register), run per image.
# ---------------------------------------------------------------------------

def _slow_beam(model, params, ctx_1, K, max_len, length_penalty=0.0):
    """ctx_1: context pytree with leading batch dim == 1."""
    NEG = -1e9

    def rank(score, length):
        if length_penalty > 0:
            return score / max(float(length), 1.0) ** length_penalty
        return score

    ctx_k = jax.tree.map(lambda x: jnp.repeat(x, K, axis=0), ctx_1)
    state = model.init_state(params, ctx_k)
    seqs = [[] for _ in range(K)]
    scores = [0.0] + [NEG] * (K - 1)
    done = [False] * K
    lengths = [0] * K
    toks = np.full((K,), START, np.int32)
    best = (NEG, None, 0)
    for t in range(max_len):
        if all(done):
            break
        state, logits = model.step(params, ctx_k, state, jnp.asarray(toks))
        logp = np.asarray(jax.nn.log_softmax(logits, axis=-1), np.float64)
        V = logp.shape[-1]
        cands = []  # (total, beam, tok)
        for k in range(K):
            if done[k]:
                row = np.full((V,), NEG)
                row[PAD] = 0.0
            else:
                row = logp[k]
            for v in range(V):
                cands.append((scores[k] + row[v], k, v))
        cands.sort(key=lambda x: -x[0])
        top = cands[:K]
        new_seqs, new_scores, new_done, new_lens, new_toks, order = (
            [], [], [], [], [], []
        )
        for total, k, v in top:
            new_seqs.append(seqs[k] + [v])
            new_scores.append(total)
            nl = lengths[k] + (0 if done[k] else 1)
            nd = done[k] or (v == END)
            if nd and not done[k]:
                r = rank(total, nl)
                if r > best[0]:
                    best = (r, new_seqs[-1], nl)
            new_done.append(nd)
            new_lens.append(nl)
            new_toks.append(v)
            order.append(k)
        idx = jnp.asarray(order, jnp.int32)
        state = jax.tree.map(lambda x: x[idx], state)
        seqs, scores, done, lengths = new_seqs, new_scores, new_done, new_lens
        toks = np.asarray(new_toks, np.int32)
    if best[1] is not None:
        return best[1], best[0]
    k = int(np.argmax([rank(s, l) for s, l in zip(scores, lengths)]))
    return seqs[k], rank(scores[k], lengths[k])


@pytest.mark.parametrize("impl", ["register", "backptr"])
@pytest.mark.parametrize("arch", ["dcnet", "editnet"])
@pytest.mark.parametrize("lp", [0.0, 1.0])
def test_beam_matches_slow_oracle(arch, lp, impl):
    cfg, model, params, ctx = _setup(arch, batch=4, seed=2)
    K, L = 3, 8
    res = beam_search(model, params, ctx, beam_size=K, start_id=START,
                      end_id=END, pad_id=PAD, max_len=L, length_penalty=lp,
                      impl=impl)
    for b in range(4):
        ctx_1 = jax.tree.map(lambda x: x[b: b + 1], ctx)
        seq_ref, score_ref = _slow_beam(model, params, ctx_1, K, L,
                                        length_penalty=lp)
        got = np.asarray(res.tokens[b])
        got = got[: len(seq_ref)].tolist()
        assert got == seq_ref, f"image {b}: {got} != {seq_ref}"
        np.testing.assert_allclose(
            float(res.scores[b]), score_ref, rtol=2e-4, atol=2e-4
        )


@pytest.mark.parametrize("impl", ["register", "backptr"])
def test_beam_size_one_equals_greedy(impl):
    cfg, model, params, ctx = _setup("editnet", batch=3, seed=4)
    g = greedy_decode(model, params, ctx, start_id=START, end_id=END,
                      max_len=10)
    bm = beam_search(model, params, ctx, beam_size=1, start_id=START,
                     end_id=END, max_len=10, impl=impl)
    np.testing.assert_array_equal(np.asarray(g.tokens), np.asarray(bm.tokens))


def test_beam_is_jittable_once():
    cfg, model, params, ctx = _setup("editnet", batch=2, seed=1)
    calls = {"n": 0}

    @jax.jit
    def run(p, c):
        calls["n"] += 1
        return beam_search(model, p, c, beam_size=4, start_id=START,
                           end_id=END, max_len=8).tokens

    a = run(params, ctx)
    b = run(params, ctx)
    assert calls["n"] == 1  # traced exactly once
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _slow_beam_nbest(model, params, ctx_1, K, max_len, length_penalty=0.0):
    """Reference completed-hypotheses list: every hypothesis registered the
    step it emits <end> (even if later evicted from live slots), ranked
    score-descending; live unfinished slots only as the fallback when
    nothing finished. Mirrors the semantics BeamResult.all_* documents."""
    NEG = -1e9

    def rank(score, length):
        if length_penalty > 0:
            return score / max(float(length), 1.0) ** length_penalty
        return score

    ctx_k = jax.tree.map(lambda x: jnp.repeat(x, K, axis=0), ctx_1)
    state = model.init_state(params, ctx_k)
    seqs = [[] for _ in range(K)]
    scores = [0.0] + [NEG] * (K - 1)
    done = [False] * K
    lengths = [0] * K
    toks = np.full((K,), START, np.int32)
    completed = []  # (rank, seq, len)
    for t in range(max_len):
        if all(done):
            break
        state, logits = model.step(params, ctx_k, state, jnp.asarray(toks))
        logp = np.asarray(jax.nn.log_softmax(logits, axis=-1), np.float64)
        V = logp.shape[-1]
        cands = []
        for k in range(K):
            if done[k]:
                row = np.full((V,), NEG)
                row[PAD] = 0.0
            else:
                row = logp[k]
            for v in range(V):
                cands.append((scores[k] + row[v], k, v))
        cands.sort(key=lambda x: -x[0])
        top = cands[:K]
        new_seqs, new_scores, new_done, new_lens, new_toks, order = (
            [], [], [], [], [], []
        )
        for total, k, v in top:
            new_seqs.append(seqs[k] + [v])
            new_scores.append(total)
            nl = lengths[k] + (0 if done[k] else 1)
            nd = done[k] or (v == END)
            if nd and not done[k]:
                completed.append((rank(total, nl), new_seqs[-1], nl))
            new_done.append(nd)
            new_lens.append(nl)
            new_toks.append(v)
            order.append(k)
        idx = jnp.asarray(order, jnp.int32)
        state = jax.tree.map(lambda x: x[idx], state)
        seqs, scores, done, lengths = new_seqs, new_scores, new_done, new_lens
        toks = np.asarray(new_toks, np.int32)
    if completed:
        completed.sort(key=lambda x: -x[0])
        return completed[:K]
    live = [
        (rank(s, l), q, l)
        for s, q, l, d in zip(scores, seqs, lengths, done)
        if not d
    ]
    live.sort(key=lambda x: -x[0])
    return live[:K]


@pytest.mark.parametrize("impl", ["register", "backptr"])
@pytest.mark.parametrize("arch", ["dcnet", "editnet"])
@pytest.mark.parametrize("lp", [0.0, 1.0])
def test_beam_nbest_matches_slow_oracle(arch, lp, impl):
    cfg, model, params, ctx = _setup(arch, batch=4, seed=2)
    K, L = 3, 8
    res = beam_search(model, params, ctx, beam_size=K, start_id=START,
                      end_id=END, pad_id=PAD, max_len=L, length_penalty=lp,
                      impl=impl)
    # Row 0 of the n-best list IS the top-1 result.
    np.testing.assert_array_equal(
        np.asarray(res.all_tokens[:, 0]), np.asarray(res.tokens))
    np.testing.assert_array_equal(
        np.asarray(res.all_scores[:, 0]), np.asarray(res.scores))
    np.testing.assert_array_equal(
        np.asarray(res.all_lengths[:, 0]), np.asarray(res.lengths))
    for b in range(4):
        ctx_1 = jax.tree.map(lambda x: x[b: b + 1], ctx)
        ref = _slow_beam_nbest(model, params, ctx_1, K, L,
                               length_penalty=lp)
        got_scores = np.asarray(res.all_scores[b])
        got_tokens = np.asarray(res.all_tokens[b])
        got_lens = np.asarray(res.all_lengths[b])
        for i, (score_ref, seq_ref, len_ref) in enumerate(ref):
            np.testing.assert_allclose(
                float(got_scores[i]), score_ref, rtol=2e-4, atol=2e-4)
            assert got_tokens[i, : len(seq_ref)].tolist() == seq_ref, (
                f"image {b} rank {i}")
            assert int(got_lens[i]) == len_ref
            # Pad-filled beyond the emitted sequence.
            assert np.all(got_tokens[i, len(seq_ref):] == PAD)
        # Slots past the reference list are empty (NEG_INF score).
        for i in range(len(ref), K):
            assert got_scores[i] < -1e8


@pytest.mark.parametrize("impl", ["register", "backptr"])
def test_beam_nbest_short_supply(impl):
    """An image whose completed pool has fewer than K entries must report
    NEG_INF/pad rows, not unfinished live hypotheses (reference completed-
    list semantics)."""
    cfg, model, params, ctx = _setup("editnet", batch=6, seed=7)
    K, L = 4, 6
    res = beam_search(model, params, ctx, beam_size=K, start_id=START,
                      end_id=END, pad_id=PAD, max_len=L, impl=impl)
    fin = np.asarray(res.all_scores) > -1e8
    toks = np.asarray(res.all_tokens)
    for b in range(6):
        has_end = (toks[b] == END).any(axis=-1)
        if not has_end.any():
            continue  # fallback image (nothing finished): live slots
        n = int(fin[b].sum())
        # Every reported row is a finished hypothesis...
        assert has_end[:n].all()
        # ...and empty rows are all-pad.
        assert np.all(toks[b, n:] == PAD)


# -- hard-SCMA end-to-end (SURVEY.md §8.3 #1: the checkpoint-fit knob must
# survive greedy scan and beam while_loop tracing, not just unit tests) ----

def test_hard_scma_greedy_end_to_end():
    cfg, model, params, ctx = _setup("editnet", seed=5, scma_select="hard")
    out = greedy_decode(model, params, ctx, start_id=START, end_id=END,
                        pad_id=PAD, max_len=10)
    # Manual per-step argmax loop with the same hard-mode model.
    state = model.init_state(params, ctx)
    tok = jnp.full((4,), START, jnp.int32)
    for t in range(10):
        state, logits = model.step(params, ctx, state, tok)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        live = np.asarray(out.mask[:, t]) | (
            np.asarray(out.tokens[:, t]) == END)
        np.testing.assert_array_equal(
            np.asarray(tok)[live], np.asarray(out.tokens[:, t])[live])
    # Hard selection must actually change behavior vs soft on these
    # random weights (otherwise this test proves nothing).
    _, model_s, params_s, ctx_s = _setup("editnet", seed=5)
    soft = greedy_decode(model_s, params_s, ctx_s, start_id=START,
                         end_id=END, pad_id=PAD, max_len=10)
    assert not np.array_equal(np.asarray(out.tokens), np.asarray(soft.tokens))


@pytest.mark.parametrize("lp", [0.0, 1.0])
def test_hard_scma_beam_matches_slow_oracle(lp):
    cfg, model, params, ctx = _setup("editnet", batch=4, seed=2,
                                     scma_select="hard")
    K, L = 3, 8
    res = beam_search(model, params, ctx, beam_size=K, start_id=START,
                      end_id=END, pad_id=PAD, max_len=L, length_penalty=lp)
    for b in range(4):
        ctx_1 = jax.tree.map(lambda x: x[b: b + 1], ctx)
        seq_ref, score_ref = _slow_beam(model, params, ctx_1, K, L,
                                        length_penalty=lp)
        got = np.asarray(res.tokens[b])[: len(seq_ref)].tolist()
        assert got == seq_ref, f"image {b}: {got} != {seq_ref}"
        np.testing.assert_allclose(
            float(res.scores[b]), score_ref, rtol=2e-4, atol=2e-4)


def test_beam_impls_agree_when_nothing_finishes():
    """end_id unreachable (bench.py's forced full-length convention): the
    n-best falls back to live slots; both history layouts must agree on
    every surface, including the backptr live-slot reconstruction."""
    cfg, model, params, ctx = _setup("editnet", batch=4, seed=9)
    r = {}
    for impl in ("register", "backptr"):
        r[impl] = beam_search(model, params, ctx, beam_size=3,
                              start_id=START, end_id=-1, pad_id=PAD,
                              max_len=7, impl=impl)
    for field in ("tokens", "scores", "lengths", "all_tokens",
                  "all_scores", "all_lengths"):
        np.testing.assert_array_equal(
            np.asarray(getattr(r["register"], field)),
            np.asarray(getattr(r["backptr"], field)), err_msg=field)
    # Full-length, nothing finished: every row emitted max_len tokens.
    assert (np.asarray(r["backptr"].lengths) == 7).all()


@pytest.mark.parametrize("impl", ["register", "backptr"])
def test_beam_max_len_one(impl):
    cfg, model, params, ctx = _setup("editnet", batch=3, seed=8)
    res = beam_search(model, params, ctx, beam_size=2, start_id=START,
                      end_id=END, pad_id=PAD, max_len=1, impl=impl)
    assert res.tokens.shape == (3, 1)
    assert (np.asarray(res.lengths) <= 1).all()


def test_beam_impls_equivalence_fuzz():
    """Randomized equivalence sweep: the two history layouts must agree
    on every BeamResult surface across model/beam/length-penalty draws
    (bounded: 5 draws, tiny models)."""
    rng = np.random.default_rng(123)
    for trial in range(5):
        arch = ["dcnet", "editnet"][int(rng.integers(2))]
        K = int(rng.integers(1, 5))
        L = int(rng.integers(2, 9))
        lp = float(rng.choice([0.0, 0.7, 1.0]))
        seed = int(rng.integers(1000))
        cfg, model, params, ctx = _setup(arch, batch=3, seed=seed)
        res = {}
        for impl in ("register", "backptr"):
            res[impl] = beam_search(
                model, params, ctx, beam_size=K, start_id=START,
                end_id=END, pad_id=PAD, max_len=L, length_penalty=lp,
                impl=impl)
        for field in ("tokens", "scores", "lengths", "all_tokens",
                      "all_scores", "all_lengths"):
            np.testing.assert_array_equal(
                np.asarray(getattr(res["register"], field)),
                np.asarray(getattr(res["backptr"], field)),
                err_msg=f"trial {trial} ({arch} K={K} L={L} lp={lp} "
                        f"seed={seed}): {field}")


# ------------------------------------------------- top-k / nucleus sampling


def _const_logit_model(logit_row):
    """Stub ModelDef emitting the same fixed logits every step — makes the
    sampled-token SUPPORT exactly checkable."""
    import jax.numpy as jnp

    from captionkit.models.base import ModelDef

    row = jnp.asarray(logit_row, jnp.float32)

    def encode(params, features, existing, existing_len):
        return existing  # [B, T] — only the batch size matters

    def init_state(params, ctx):
        return jnp.zeros((ctx.shape[0], 1), jnp.float32)

    def step(params, ctx, state, token, rng=None, train=False):
        B = token.shape[0]
        return state, jnp.broadcast_to(row, (B, row.shape[0]))

    return ModelDef(name="stub", init=lambda rng: {}, encode=encode,
                    init_state=init_state, step=step,
                    beam_expand=lambda ctx, k: ctx)


def test_sampling_truncation_support():
    """top_k / top_p restrict the sampled-token support exactly; top_k=1
    and a dominant-token nucleus are deterministic (== argmax)."""
    import jax

    from captionkit.decode import sample_decode

    # softmax probs ~ [0.6, 0.2, 0.1, 0.06, 0.04] after normalization
    logits = np.log(np.asarray([0.6, 0.2, 0.1, 0.06, 0.04]))
    model = _const_logit_model(logits)
    ctx = jnp.zeros((64, 3), jnp.int32)
    kw = dict(start_id=0, end_id=-1, pad_id=0, max_len=6)

    toks_k1 = np.asarray(sample_decode(
        model, {}, ctx, jax.random.PRNGKey(0), top_k=1, **kw).tokens)
    assert (toks_k1 == 0).all()  # argmax everywhere

    toks_p = np.asarray(sample_decode(
        model, {}, ctx, jax.random.PRNGKey(1), top_p=0.5, **kw).tokens)
    assert (toks_p == 0).all()  # nucleus = {0} (0.6 >= 0.5, crossing kept)

    toks_k3 = np.asarray(sample_decode(
        model, {}, ctx, jax.random.PRNGKey(2), top_k=3, **kw).tokens)
    assert set(np.unique(toks_k3)) <= {0, 1, 2}
    assert len(set(np.unique(toks_k3))) > 1  # genuinely sampling

    # nucleus 0.85: 0.6 + 0.2 = 0.8 < 0.85 -> token 2 crosses and is kept
    toks_p85 = np.asarray(sample_decode(
        model, {}, ctx, jax.random.PRNGKey(3), top_p=0.85, **kw).tokens)
    assert set(np.unique(toks_p85)) <= {0, 1, 2}

    # untruncated sampling still reaches the tail
    toks_all = np.asarray(sample_decode(
        model, {}, ctx, jax.random.PRNGKey(4), **kw).tokens)
    assert set(np.unique(toks_all)) - {0, 1, 2} != set()


def test_sampling_truncation_logprobs_renormalized():
    """Returned log-probs are of the truncated, renormalized distribution
    (REINFORCE-correct for what was actually sampled)."""
    import jax

    from captionkit.decode import sample_decode

    logits = np.log(np.asarray([0.5, 0.3, 0.2]))
    model = _const_logit_model(logits)
    ctx = jnp.zeros((8, 3), jnp.int32)
    roll = sample_decode(model, {}, ctx, jax.random.PRNGKey(0),
                         start_id=0, end_id=-1, pad_id=0, max_len=4,
                         top_k=2)
    toks = np.asarray(roll.tokens)
    lps = np.asarray(roll.logprobs)
    # renormalized over {0, 1}: p = [0.625, 0.375]
    want = {0: np.log(0.5 / 0.8), 1: np.log(0.3 / 0.8)}
    for b in range(toks.shape[0]):
        for t in range(toks.shape[1]):
            np.testing.assert_allclose(lps[b, t], want[int(toks[b, t])],
                                       atol=1e-5)
