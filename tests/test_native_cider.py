"""Native C++ CIDEr-D scorer parity vs the Python implementation."""

import numpy as np
import pytest

from captionkit.metrics.cider import CiderD, NgramDocFreq

fast = pytest.importorskip("captionkit.metrics.fast")

if not fast.native_available():
    pytest.skip("libcider.so not built (make -C captionkit/native)",
                allow_module_level=True)

HYPS = [
    "a man riding a horse on the beach".split(),
    "two dogs playing in the park".split(),
    "a a a repeated words words".split(),
    [],
]
REFS = [
    ["a man riding a horse on the beach".split(),
     "a person rides a horse near the ocean".split()],
    ["two dogs play at a grassy park".split(),
     "dogs playing in a park".split()],
    ["a sentence with words".split()],
    ["something else entirely".split()],
]


def test_native_matches_python_scorer():
    df = NgramDocFreq.build(REFS)
    py_scorer = CiderD(df)
    _, py_scores = py_scorer.compute(HYPS, REFS)
    nat = fast.NativeCiderD(df)
    nat_scores = nat.score(HYPS, REFS)
    np.testing.assert_allclose(nat_scores, py_scores, rtol=1e-12, atol=1e-12)


def test_native_oov_tokens():
    """Hypothesis tokens absent from the df corpus must not crash and must
    match Python semantics (idf = log_corpus - log(1))."""
    df = NgramDocFreq.build(REFS)
    hyp = ["zebra", "unicorn", "a"]
    _, py = CiderD(df).compute([hyp], [REFS[0]])
    nat = fast.NativeCiderD(df).score([hyp], [REFS[0]])
    np.testing.assert_allclose(nat, py, rtol=1e-12)


def test_native_is_faster_than_python():
    import time

    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(500)]
    refs = [
        [[vocab[j] for j in rng.integers(0, 500, 12)] for _ in range(5)]
        for _ in range(64)
    ]
    hyps = [[vocab[j] for j in rng.integers(0, 500, 12)] for _ in range(64)]
    df = NgramDocFreq.build(refs)
    py_scorer = CiderD(df)
    nat = fast.NativeCiderD(df)
    nat.score(hyps, refs)  # warm-up / interning
    t0 = time.perf_counter()
    _, py = py_scorer.compute(hyps, refs)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    ns = nat.score(hyps, refs)
    t_nat = time.perf_counter() - t0
    np.testing.assert_allclose(ns, py, rtol=1e-12)
    assert t_nat < t_py, (t_nat, t_py)


def test_rewarder_uses_native_when_available():
    from captionkit.data import Vocab
    from captionkit.train.scst import ScstRewarder

    v = Vocab.build([["a", "dog", "runs"]], min_freq=1)
    df = NgramDocFreq.build([[["a", "dog", "runs"]]])
    r = ScstRewarder(v, df)
    assert r._native is not None
