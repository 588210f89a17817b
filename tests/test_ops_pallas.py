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
