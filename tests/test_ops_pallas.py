"""Pallas kernel parity vs the pure-jnp reference cells (SURVEY.md §5
item 2). On CPU these run in interpret mode; setting CAPTIONKIT_TEST_TPU=1
runs the same assertions compiled on the real chip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from captionkit.nn.attention import (
    additive_attention,
    init_additive_attention,
    project_keys,
)
from captionkit.nn.cells import (
    copy_lstm_cell,
    init_copy_lstm,
    init_lstm,
    lstm_cell,
)
from captionkit.ops.attention import fused_additive_attention
from captionkit.ops.lstm import fused_copy_lstm_cell, fused_lstm_cell

INTERPRET = os.environ.get("CAPTIONKIT_TEST_TPU", "0") != "1"

SHAPES = [
    # (B, D, H): aligned, unaligned batch, unaligned dims
    (8, 128, 128),
    (5, 48, 72),
    (130, 256, 128),
    (64, 3072, 1024),  # EditNet lang-lstm shape class
]


@pytest.mark.parametrize("B,D,H", SHAPES)
def test_fused_lstm_cell_matches_jnp(B, D, H):
    key = jax.random.PRNGKey(0)
    p = init_lstm(key, D, H)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (B, D))
    h = jax.random.normal(ks[1], (B, H))
    c = jax.random.normal(ks[2], (B, H))
    h_ref, c_ref = lstm_cell(p, x, h, c)
    h_f, c_f = fused_lstm_cell(p, x, h, c, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_ref), atol=2e-5)


@pytest.mark.parametrize("B,D,H", SHAPES[:3])
def test_fused_copy_lstm_matches_jnp(B, D, H):
    key = jax.random.PRNGKey(2)
    p = init_copy_lstm(key, D, H)
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    x = jax.random.normal(ks[0], (B, D))
    h = jax.random.normal(ks[1], (B, H))
    c = jax.random.normal(ks[2], (B, H))
    cs = jax.random.normal(ks[3], (B, H))
    h_ref, c_ref = copy_lstm_cell(p, x, h, c, cs)
    h_f, c_f = fused_copy_lstm_cell(p, x, h, c, cs, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_ref), atol=2e-5)


@pytest.mark.parametrize("B,N,A,V,Q", [
    (8, 36, 512, 2048, 1024),  # visual attention shape class
    (6, 22, 64, 96, 96),       # SCMA shape class (unaligned)
])
def test_fused_attention_matches_jnp(B, N, A, V, Q):
    key = jax.random.PRNGKey(4)
    p = init_additive_attention(key, V, Q, A)
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    values = jax.random.normal(ks[0], (B, N, V))
    query = jax.random.normal(ks[1], (B, Q))
    keys = project_keys(p, values)
    lengths = jax.random.randint(ks[2], (B,), 1, N + 1)
    mask = jnp.arange(N)[None, :] < lengths[:, None]
    ctx_ref, w_ref = additive_attention(p, keys, values, query, mask)
    ctx_f, w_f = fused_additive_attention(p, keys, values, query, mask,
                                          interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(w_f), np.asarray(w_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ctx_f), np.asarray(ctx_ref),
                               atol=3e-4, rtol=1e-4)


def test_fused_attention_no_mask():
    p = init_additive_attention(jax.random.PRNGKey(6), 32, 16, 8)
    values = jax.random.normal(jax.random.PRNGKey(7), (4, 10, 32))
    query = jax.random.normal(jax.random.PRNGKey(8), (4, 16))
    keys = project_keys(p, values)
    ctx_ref, w_ref = additive_attention(p, keys, values, query, None)
    ctx_f, w_f = fused_additive_attention(p, keys, values, query, None,
                                          interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(w_f), np.asarray(w_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ctx_f), np.asarray(ctx_ref),
                               atol=2e-4)


def test_dispatch_layer_switches():
    from captionkit.nn.dispatch import get_lstm_cell_fn

    assert get_lstm_cell_fn(False) is lstm_cell
    # use_pallas=True falls back to jnp on CPU (pallas_supported() False).
    fn = get_lstm_cell_fn(True)
    assert fn in (lstm_cell, fused_lstm_cell)


class TestFusedHeadTopK:
    """Fused vocab head (ops/head.py): matmul + online LSE + per-row top-k
    vs the jnp full-logits reference (VERDICT r1 #3 megakernel work)."""

    @pytest.mark.parametrize("extract", ["mask", "thresh"])
    @pytest.mark.parametrize("N,H,V,k", [
        (16, 32, 300, 5), (24, 64, 130, 3), (8, 16, 128, 1),
        (40, 48, 1000, 5),
    ])
    def test_parity_interpret(self, N, H, V, k, extract):
        from captionkit.ops.head import fused_head_topk, reference_head_topk

        rng = np.random.default_rng(N + V)
        h = jnp.asarray(rng.standard_normal((N, H)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((H, V)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((V,)).astype(np.float32))
        v1, i1, l1 = fused_head_topk(h, w, b, k=k, interpret=True,
                                     extract=extract)
        v2, i2, l2 = reference_head_topk(h, w, b, k=k)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   atol=1e-5)

    @pytest.mark.parametrize("extract", ["mask", "thresh"])
    def test_tie_break_lowest_index(self, extract):
        from captionkit.ops.head import fused_head_topk

        # Identical logits everywhere: top-k must be ids 0..k-1 in order
        # (lax.top_k semantics).
        h = jnp.ones((8, 16), jnp.float32)
        w = jnp.ones((16, 200), jnp.float32)
        b = jnp.zeros((200,), jnp.float32)
        _, idx, _ = fused_head_topk(h, w, b, k=4, interpret=True,
                                    extract=extract)
        np.testing.assert_array_equal(
            np.asarray(idx), np.tile(np.arange(4), (8, 1))
        )

    @pytest.mark.parametrize("extract", ["mask", "thresh"])
    def test_adversarial_duplicates(self, extract):
        """Duplicate values spanning extraction steps AND tile boundaries
        — the cases that stress the thresh algorithm's (v_prev, i_prev)
        characterization of the consumed prefix. h = eye(N) with
        w = patterns makes logits row i exactly patterns[i]; tiles=(8,128)
        forces V=384 into 3 vocab tiles so the cross-tile merge sees the
        duplicates too."""
        from captionkit.ops.head import fused_head_topk, reference_head_topk

        N, V, k = 8, 384, 5
        pat = np.zeros((N, V), np.float32)
        # row 0: top value appears 3x (steps 1-3 share v), then a pair
        pat[0, [7, 130, 300]] = 4.0
        pat[0, [12, 260]] = 3.0
        # row 1: strictly descending distinct, scattered across tiles
        pat[1, [300, 5, 129, 383, 0]] = [9, 8, 7, 6, 5]
        # row 2: all equal (full-row tie)
        pat[2, :] = 1.0
        # row 3: k duplicates exactly at a tile boundary (127, 128)
        pat[3, [126, 127, 128, 129, 255]] = 2.0
        # row 4: duplicate max where the LATER tile also holds the same
        # value before the earlier tile's second copy
        pat[4, [200, 10, 210]] = [5.0, 5.0, 5.0]
        # row 5: negative plateau below zeros (top-k must be the zeros)
        pat[5, :] = -1.0
        pat[5, [50, 150, 250]] = 0.0
        # rows 6-7: random with forced duplicates
        rng = np.random.default_rng(0)
        for r in (6, 7):
            pat[r] = rng.integers(-3, 3, V).astype(np.float32)
        h = jnp.asarray(np.eye(N, dtype=np.float32))
        w = jnp.asarray(pat)
        b = jnp.zeros((V,), jnp.float32)
        v1, i1, l1 = fused_head_topk(h, w, b, k=k, interpret=True,
                                     tiles=(8, 128), extract=extract)
        v2, i2, l2 = reference_head_topk(h, w, b, k=k)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   atol=1e-5)

    @pytest.mark.skipif(INTERPRET, reason="needs the real chip")
    @pytest.mark.parametrize("extract", ["mask", "thresh"])
    def test_parity_on_chip_paper_scale(self, extract):
        from captionkit.ops.head import fused_head_topk, reference_head_topk

        rng = np.random.default_rng(7)
        N, H, V, k = 2560, 1024, 9490, 5
        h = jnp.asarray(rng.standard_normal((N, H)).astype(np.float32))
        w = jnp.asarray(
            (rng.standard_normal((H, V)) * 0.03).astype(np.float32))
        b = jnp.asarray(
            (rng.standard_normal((V,)) * 0.01).astype(np.float32))
        v1, i1, l1 = fused_head_topk(h, w, b, k=k,
                                     compute_dtype=jnp.bfloat16,
                                     extract=extract)
        v2, i2, l2 = reference_head_topk(
            h.astype(jnp.bfloat16), w.astype(jnp.bfloat16), b, k=k)
        assert float(np.mean(np.asarray(i1) == np.asarray(i2))) > 0.999
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   atol=1e-4)


def test_beam_search_fused_head_matches_reference_path():
    """Beam search with the fused head must produce the same captions and
    scores as the full-logits path (both archs)."""
    import dataclasses

    from captionkit.decode import beam_search
    from captionkit.models import get_model
    from captionkit.utils.config import ModelConfig

    rng = np.random.default_rng(3)
    for arch in ("editnet", "dcnet"):
        mcfg = ModelConfig(
            arch=arch, vocab_size=50, emb_dim=12, hidden_dim=16, att_dim=8,
            feat_dim=10, num_regions=4, dropout=0.0,
            compute_dtype="float32", use_fused_head=True,
        )
        model_f = get_model(mcfg)
        model_t = get_model(dataclasses.replace(mcfg, head_extract="thresh"))
        model_r = get_model(dataclasses.replace(mcfg, use_fused_head=False))
        params = model_f.init(jax.random.PRNGKey(0))
        feats = jnp.asarray(rng.standard_normal((4, 4, 10)).astype(np.float32))
        ex = jnp.asarray(rng.integers(4, 50, (4, 8)).astype(np.int32))
        exl = jnp.asarray(rng.integers(3, 9, (4,)).astype(np.int32))
        ctx = model_f.encode(params, feats, ex, exl)
        rf = beam_search(model_f, params, ctx, beam_size=5, start_id=2,
                         end_id=3, max_len=10)
        rt = beam_search(model_t, params, ctx, beam_size=5, start_id=2,
                         end_id=3, max_len=10)
        rr = beam_search(model_r, params, ctx, beam_size=5, start_id=2,
                         end_id=3, max_len=10)
        np.testing.assert_array_equal(np.asarray(rf.tokens),
                                      np.asarray(rr.tokens))
        np.testing.assert_allclose(np.asarray(rf.scores),
                                   np.asarray(rr.scores), atol=1e-5)
        # head_extract="thresh" is the same head, different in-kernel
        # extraction — end-to-end identical captions and scores
        np.testing.assert_array_equal(np.asarray(rt.tokens),
                                      np.asarray(rr.tokens))
        np.testing.assert_allclose(np.asarray(rt.scores),
                                   np.asarray(rr.scores), atol=1e-5)


class TestSweepHeadVariant:
    """Single-sweep head variant (_sweep_head_topk): whole vocab as one
    tile, W resident via a raised per-kernel VMEM limit. Measured SLOWER
    than the tiled kernel at paper scale (docs/DESIGN.md) so it is not
    the default, but it must stay exact while it exists."""

    @pytest.mark.parametrize("N,H,V,k", [(16, 32, 300, 5), (40, 48, 1000, 3)])
    def test_parity_interpret(self, N, H, V, k):
        from captionkit.ops.head import _sweep_head_topk, reference_head_topk

        rng = np.random.default_rng(N * V)
        h = jnp.asarray(rng.standard_normal((N, H)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((H, V)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((V,)).astype(np.float32))
        v1, i1, l1 = _sweep_head_topk(h, w, b, k=k,
                                      compute_dtype=jnp.float32,
                                      interpret=True)
        v2, i2, l2 = reference_head_topk(h, w, b, k=k)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)
