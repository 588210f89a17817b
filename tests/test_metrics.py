"""Metric tests (SURVEY.md §5 item 4): fixtures + independent cross-checks.

The vendored cococaption toolkit is not on this machine (reference mount
empty), so parity is established against (a) nltk's independent corpus-BLEU
implementation, (b) hand-computed CIDEr values on tiny fixtures, and
(c) algebraic invariants (perfect match scores, monotonicity).
"""

import math

import numpy as np
import pytest

from captionkit.metrics import (
    CaptionEvaluator,
    Cider,
    CiderD,
    NgramDocFreq,
    bleu_scores,
    evaluate_captions,
    rouge_l,
)

HYPS = [
    "a man riding a horse on the beach".split(),
    "two dogs playing in the park".split(),
    "a plate of food on a table".split(),
]
REFS = [
    ["a man riding a horse on the beach".split(),
     "a person rides a horse near the ocean".split()],
    ["two dogs play at a grassy park".split(),
     "dogs playing in a park".split()],
    ["a table holding a plate of food".split(),
     "food on a plate sits on a wooden table".split()],
]


def test_bleu_perfect_match_is_one():
    b = bleu_scores([HYPS[0]], [[HYPS[0]]])
    for v in b:
        assert abs(v - 1.0) < 1e-6


def test_bleu_matches_nltk_corpus_bleu():
    from nltk.translate.bleu_score import corpus_bleu

    ours = bleu_scores(HYPS, REFS)
    for n in range(1, 5):
        weights = tuple([1.0 / n] * n + [0.0] * (4 - n))
        ref = corpus_bleu(REFS, HYPS, weights=weights)
        assert abs(ours[n - 1] - ref) < 2e-3, (n, ours[n - 1], ref)


def test_bleu_brevity_penalty():
    # One-word hypothesis against a long ref: heavy brevity penalty.
    short = bleu_scores([["a"]], [[REFS[0][0]]])
    assert short[0] < math.exp(1 - len(REFS[0][0])) + 1e-6


def test_rouge_l_basics():
    assert abs(rouge_l([HYPS[0]], [[HYPS[0]]]) - 1.0) < 1e-9
    assert rouge_l([["x"]], [[["y"]]]) == 0.0
    # hand-check: hyp = a b c, ref = a c -> lcs 2, P=2/3, R=1
    beta = 1.2
    p, r = 2 / 3, 1.0
    expected = (1 + beta**2) * p * r / (r + beta**2 * p)
    assert abs(rouge_l([["a", "b", "c"]], [[["a", "c"]]]) - expected) < 1e-9


def test_cider_perfect_match_scores_ten():
    """With a single ref == hyp and a df corpus where every ngram is unique,
    cosine similarity is 1 for every n -> CIDEr = 10."""
    refs = [[h] for h in HYPS]
    score, per = Cider().compute(HYPS, refs)
    assert abs(score - 10.0) < 1e-6
    np.testing.assert_allclose(per, 10.0, atol=1e-6)


def test_cider_d_length_penalty_and_clipping():
    # identical -> 10 (delta=0, clipping inert); df over a multi-image
    # corpus (a 1-image corpus has idf == log(1) == 0 everywhere, matching
    # the toolkit's degenerate behaviour).
    score, _ = CiderD().compute(HYPS, [[h] for h in HYPS])
    assert abs(score - 10.0) < 1e-6
    # Repeated-word hypothesis is clipped in CIDEr-D, not in CIDEr; use the
    # shared REFS corpus for df so idf is nonzero.
    df = NgramDocFreq.build(REFS + [[["b"], ["c"]]])
    hyp = "a a a a a".split()
    ref = "a man riding a horse".split()
    d_score, _ = CiderD(df).compute([hyp], [[ref]])
    c_score, _ = Cider(df).compute([hyp], [[ref]])
    assert c_score > 0
    assert d_score < c_score


def test_cider_hand_computed_idf():
    """Two images; unigram 'dog' appears in both images' refs, 'cat' in one.
    Check a single tf-idf weight by hand through the public API."""
    refs = [[["dog", "runs"]], [["dog", "cat"]]]
    df = NgramDocFreq.build(refs)
    assert df.corpus_size == 2
    assert df.df[("dog",)] == 2.0
    assert df.df[("cat",)] == 1.0
    # idf(dog) = log(2) - log(2) = 0 -> a hyp of just 'dog' has zero vector
    # against ref 'dog cat': similarity 0.
    scorer = Cider(df)
    score, _ = scorer.compute([["dog"]], [[["dog", "cat"]]])
    assert score == 0.0
    # 'cat' has idf log(2) > 0 -> nonzero similarity.
    score2, _ = scorer.compute([["cat"]], [[["dog", "cat"]]])
    assert score2 > 0.0


def test_precomputed_df_roundtrip(tmp_path):
    df = NgramDocFreq.build(REFS)
    p = str(tmp_path / "df.npz")
    df.save(p)
    df2 = NgramDocFreq.load(p)
    assert df2.corpus_size == df.corpus_size
    assert df2.df == df.df
    s1, _ = CiderD(df).compute(HYPS, REFS)
    s2, _ = CiderD(df2).compute(HYPS, REFS)
    assert abs(s1 - s2) < 1e-12


def test_evaluator_end_to_end():
    refs = {
        1: ["a man riding a horse on the beach",
            "a person rides a horse near the ocean"],
        2: ["two dogs play at a grassy park", "dogs playing in a park"],
    }
    hyps = {1: "a man riding a horse on the beach",
            2: "two dogs playing in the park"}
    out = evaluate_captions(refs, hyps, with_unclipped_cider=True)
    for k in ["BLEU-1", "BLEU-4", "ROUGE-L", "CIDEr", "CIDEr-unclipped"]:
        assert k in out, out
        assert 0.0 <= out[k] <= 10.0 + 1e-9
    assert out["BLEU-1"] > 0.5  # image 1 is a perfect match
    # The 'CIDEr' key must carry CIDEr-D semantics (cococaption reports
    # clipped+length-penalized under that name — ADVICE r1 high).
    from captionkit.metrics.cider import CiderD
    from captionkit.data.tokenize import ptb_tokenize

    ids = sorted(hyps)
    want, _ = CiderD().compute(
        [ptb_tokenize(hyps[i]) for i in ids],
        [[ptb_tokenize(r) for r in refs[i]] for i in ids],
    )
    assert abs(out["CIDEr"] - want) < 1e-12


def test_evaluator_missing_refs():
    with pytest.raises(KeyError):
        evaluate_captions({1: ["a"]}, {1: "a", 2: "b"})


def test_external_scorers_absent_cleanly():
    from captionkit.metrics import external

    # No jars on this machine: the adapters must report unavailable and the
    # evaluator must omit them rather than fail.
    assert isinstance(external.available_scorers(), dict)
    out = evaluate_captions({1: ["a dog"]}, {1: "a dog"})
    assert "CIDEr" in out


def test_rouge_l_independent_prec_rec_maxima():
    """pycocoevalcap semantics: prec and rec are maximized independently
    across refs. hyp=[a,b], refs=[[a],[a,b,c,d]] -> prec_max=1 (vs [a]... )"""
    hyp = ["a", "b"]
    refs = [["a"], ["a", "b", "c", "d"]]
    # prec_max = max(1/2 vs [a], 2/2 vs long) = 1.0
    # rec_max  = max(1/1 vs [a], 2/4 vs long) = 1.0  -> F = 1.0
    assert abs(rouge_l([hyp], [refs]) - 1.0) < 1e-9


# ---------------------------------------------------------------- METEOR-lite


class _StubWordnet:
    """Empty wordnet: restricts nltk's METEOR to its exact+stem stages,
    which is exactly the METEOR-lite surface (metrics/meteor.py)."""

    @staticmethod
    def synsets(word):
        return []


def _nltk_segment(hyp, refs):
    from nltk.stem.porter import PorterStemmer
    from nltk.translate.meteor_score import meteor_score

    return meteor_score(
        refs, hyp, stemmer=PorterStemmer(), wordnet=_StubWordnet()
    )


def test_meteor_lite_matches_nltk_exact_stem():
    """Segment scores are bit-identical to nltk's meteor_score restricted
    to exact+stem matching (the module's documented oracle)."""
    from captionkit.metrics.meteor import meteor_lite_segment

    cases = [
        ("the cat sat on the mat".split(),
         ["the cat was sat on the mat".split()]),
        ("running dogs jumped over fences".split(),
         ["run dog jump over a fence".split()]),
        ("a b c".split(), ["x y z".split()]),  # zero matches
        ("a man riding a horse".split(),
         ["a person rides a horse".split(),
          "a man riding a horse on the beach".split()]),
        ("the the the".split(), ["the cat the".split()]),  # duplicates
    ]
    for hyp, refs in cases:
        ours, _ = meteor_lite_segment(hyp, refs)
        theirs = _nltk_segment(hyp, refs)
        assert abs(ours - theirs) < 1e-12, (hyp, refs, ours, theirs)


def test_meteor_lite_matches_nltk_randomized():
    """Randomized sweep over small vocabularies (forcing duplicate words
    and stem-only matches) against the nltk oracle."""
    import random

    from captionkit.metrics.meteor import meteor_lite_segment

    rng = random.Random(0)
    vocab = ["dog", "dogs", "run", "running", "cat", "sat", "a", "the",
             "park", "parks", "jump", "jumped"]
    for _ in range(60):
        hyp = [rng.choice(vocab) for _ in range(rng.randint(1, 12))]
        refs = [
            [rng.choice(vocab) for _ in range(rng.randint(1, 14))]
            for _ in range(rng.randint(1, 3))
        ]
        ours, _ = meteor_lite_segment(hyp, refs)
        theirs = _nltk_segment(hyp, refs)
        assert abs(ours - theirs) < 1e-12, (hyp, refs, ours, theirs)


def test_meteor_lite_perfect_and_fragmented():
    from captionkit.metrics.meteor import meteor_lite_segment, segment_stats

    hyp = "a man rides a horse".split()
    score, st = meteor_lite_segment(hyp, [hyp])
    # Perfect match: P=R=1, Fmean=1, one chunk, penalty=0.5*(1/5)^3
    assert abs(score - (1 - 0.5 * (1 / 5) ** 3)) < 1e-12
    assert st.chunks == 1
    # Fully fragmented alignment: same unigrams, reversed order.
    st2 = segment_stats("a b c d".split(), "d c b a".split())
    assert st2.matches == 4 and st2.chunks == 4


def test_meteor_lite_corpus_aggregation():
    """Corpus score applies the formula to summed best-ref stats (not the
    mean of segment scores) — hand-checked here."""
    from captionkit.metrics.meteor import (
        _formula,
        meteor_lite,
        meteor_lite_segment,
    )

    hyps = ["a cat on a mat".split(), "dogs running fast".split()]
    refs = [
        ["a cat sat on a mat".split()],
        ["a dog runs very fast".split(), "dogs run fast".split()],
    ]
    corpus, per = meteor_lite(hyps, refs)
    assert len(per) == 2
    m = h = r = c = 0
    for hyp, rr in zip(hyps, refs):
        _, st = meteor_lite_segment(hyp, rr)
        m += st.matches
        h += st.hyp_len
        r += st.ref_len
        c += st.chunks
    assert abs(corpus - _formula(m, h, r, c)) < 1e-12


def test_evaluator_reports_meteor_lite_without_jar(monkeypatch):
    """With no jar/JVM the evaluator reports METEOR-lite; the real METEOR
    key stays reserved for the jar adapter."""
    monkeypatch.delenv("CAPTIONKIT_METEOR_JAR", raising=False)
    out = evaluate_captions(
        {1: ["a dog runs in the park"]}, {1: "a dog running in the park"}
    )
    if "METEOR" not in out:  # no jar on this host (the normal case here)
        assert "METEOR-lite" in out
        assert 0.0 < out["METEOR-lite"] <= 1.0
