"""Numerics-core tests: cells vs independent NumPy math, masking semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from captionkit.nn import (
    AdditiveAttentionParams,
    additive_attention,
    copy_lstm_cell,
    init_additive_attention,
    init_copy_lstm,
    init_lstm,
    length_mask,
    lstm_cell,
    scma_select,
)
from captionkit.nn.attention import project_keys
from captionkit.nn.cells import lstm_encode
from captionkit.nn.masking import masked_cross_entropy, top5_accuracy


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_lstm_cell_matches_numpy():
    key = jax.random.PRNGKey(0)
    B, I, H = 3, 5, 7
    p = init_lstm(key, I, H)
    x = np.random.default_rng(0).standard_normal((B, I)).astype(np.float32)
    h = np.random.default_rng(1).standard_normal((B, H)).astype(np.float32)
    c = np.random.default_rng(2).standard_normal((B, H)).astype(np.float32)
    h2, c2 = lstm_cell(p, jnp.asarray(x), jnp.asarray(h), jnp.asarray(c))

    z = x @ np.asarray(p.wx) + h @ np.asarray(p.wh) + np.asarray(p.b)
    i, f, g, o = np.split(z, 4, axis=-1)
    c_ref = _sigmoid(f) * c + _sigmoid(i) * np.tanh(g)
    h_ref = _sigmoid(o) * np.tanh(c_ref)
    np.testing.assert_allclose(np.asarray(c2), c_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h2), h_ref, atol=1e-5)


def test_copy_lstm_gate_extremes():
    """Copy gate saturated on -> cell state == c_star; off -> standard LSTM."""
    key = jax.random.PRNGKey(1)
    B, I, H = 2, 4, 6
    p = init_copy_lstm(key, I, H)
    x = jnp.ones((B, I)) * 0.1
    h = jnp.zeros((B, H))
    c = jnp.ones((B, H)) * 0.3
    c_star = jnp.ones((B, H)) * 2.0

    p_on = p.replace(br=jnp.full((H,), 50.0))
    _, c_on = copy_lstm_cell(p_on, x, h, c, c_star)
    np.testing.assert_allclose(np.asarray(c_on), 2.0, atol=1e-5)

    p_off = p.replace(br=jnp.full((H,), -50.0))
    _, c_off = copy_lstm_cell(p_off, x, h, c, c_star)
    h_std, c_std = lstm_cell(p.base, x, h, c)
    np.testing.assert_allclose(np.asarray(c_off), np.asarray(c_std), atol=1e-5)


def test_additive_attention_mask_and_weights():
    key = jax.random.PRNGKey(2)
    B, N, E, Q, A = 2, 5, 8, 6, 4
    p = init_additive_attention(key, E, Q, A)
    enc = jax.random.normal(jax.random.PRNGKey(3), (B, N, E))
    q = jax.random.normal(jax.random.PRNGKey(4), (B, Q))
    keys = project_keys(p, enc)
    mask = jnp.asarray([[True] * 5, [True, True, False, False, False]])
    ctx, w = additive_attention(p, keys, enc, q, mask)
    assert ctx.shape == (B, E) and w.shape == (B, N)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-6)
    assert np.all(np.asarray(w[1, 2:]) < 1e-6)  # masked positions get ~0


def test_scma_soft_vs_hard():
    key = jax.random.PRNGKey(5)
    B, T, H, Q, A = 2, 4, 6, 6, 3
    p = init_additive_attention(key, H, Q, A)
    hs = jax.random.normal(jax.random.PRNGKey(6), (B, T, H))
    cs = jax.random.normal(jax.random.PRNGKey(7), (B, T, H))
    q = jax.random.normal(jax.random.PRNGKey(8), (B, Q))
    keys = project_keys(p, hs)
    c_soft, w = scma_select(p, keys, cs, q, mode="soft")
    c_hard, _ = scma_select(p, keys, cs, q, mode="hard")
    ref_soft = np.einsum("bt,bth->bh", np.asarray(w), np.asarray(cs))
    np.testing.assert_allclose(np.asarray(c_soft), ref_soft, atol=1e-5)
    idx = np.argmax(np.asarray(w), axis=-1)
    ref_hard = np.asarray(cs)[np.arange(B), idx]
    np.testing.assert_allclose(np.asarray(c_hard), ref_hard, atol=1e-5)


def test_scma_hard_has_gradient():
    key = jax.random.PRNGKey(9)
    B, T, H, A = 1, 3, 4, 2
    p = init_additive_attention(key, H, H, A)
    hs = jax.random.normal(jax.random.PRNGKey(10), (B, T, H))
    cs = jax.random.normal(jax.random.PRNGKey(11), (B, T, H))

    def loss(q):
        c_star, _ = scma_select(p, project_keys(p, hs), cs, q, mode="hard")
        return jnp.sum(c_star ** 2)

    g = jax.grad(loss)(jnp.ones((B, H)))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_lstm_encode_freezes_at_length():
    key = jax.random.PRNGKey(12)
    B, T, E, H = 2, 6, 3, 5
    p = init_lstm(key, E, H)
    emb = jax.random.normal(jax.random.PRNGKey(13), (B, T, E))
    lengths = jnp.asarray([6, 3])
    hs, cs = lstm_encode(p, emb, lengths)
    assert hs.shape == (B, T, H)
    # Row 1: states at t>=3 are frozen copies of the t=2 state.
    np.testing.assert_allclose(np.asarray(hs[1, 3]), np.asarray(hs[1, 2]))
    np.testing.assert_allclose(np.asarray(cs[1, 5]), np.asarray(cs[1, 2]))
    # Row 0 keeps evolving.
    assert not np.allclose(np.asarray(hs[0, 5]), np.asarray(hs[0, 2]))


def test_masked_cross_entropy_ignores_pad():
    B, T, V = 2, 4, 10
    logits = jax.random.normal(jax.random.PRNGKey(14), (B, T, V))
    targets = jnp.zeros((B, T), jnp.int32)
    full = masked_cross_entropy(logits, targets, jnp.ones((B, T), bool))
    # Corrupt masked-out region; loss must not change.
    logits2 = logits.at[:, 2:].set(100.0)
    mask = jnp.asarray([[1, 1, 0, 0], [1, 1, 0, 0]], bool)
    a = masked_cross_entropy(logits, targets, mask)
    b = masked_cross_entropy(logits2, targets, mask)
    np.testing.assert_allclose(float(a), float(b), atol=1e-6)
    assert not np.allclose(float(full), float(a))


def test_top5_accuracy():
    logits = jnp.zeros((1, 2, 10)).at[0, 0, 3].set(5.0).at[0, 1, 7].set(5.0)
    targets = jnp.asarray([[3, 0]], jnp.int32)
    mask = jnp.ones((1, 2), bool)
    acc = top5_accuracy(logits, targets, mask)
    # step0 hit (argmax=3), step1: target 0 has logit 0, is it in top5? 9 zeros
    # tie -> implementation-defined; use masked version for determinism.
    acc0 = top5_accuracy(logits, targets, jnp.asarray([[1, 0]], bool))
    np.testing.assert_allclose(float(acc0), 1.0)
    assert 0.0 <= float(acc) <= 1.0


def test_length_mask():
    m = length_mask(jnp.asarray([0, 2, 5]), 4)
    np.testing.assert_array_equal(
        np.asarray(m),
        [[False] * 4, [True, True, False, False], [True] * 4],
    )


def test_grouped_attention_matches_repeated():
    """Grouped [B*G] queries over [B] keys/values must equal attention over
    fully repeated keys/values (the beam-search memory optimization)."""
    key = jax.random.PRNGKey(20)
    B, G, N, E, Q, A = 3, 4, 6, 8, 5, 7
    p = init_additive_attention(key, E, Q, A)
    enc = jax.random.normal(jax.random.PRNGKey(21), (B, N, E))
    keys = project_keys(p, enc)
    q = jax.random.normal(jax.random.PRNGKey(22), (B * G, Q))
    lengths = jnp.asarray([6, 3, 1])
    mask = jnp.arange(N)[None, :] < lengths[:, None]

    ctx_g, w_g = additive_attention(p, keys, enc, q, mask)
    enc_r = jnp.repeat(enc, G, axis=0)
    keys_r = jnp.repeat(keys, G, axis=0)
    mask_r = jnp.repeat(mask, G, axis=0)
    ctx_r, w_r = additive_attention(p, keys_r, enc_r, q, mask_r)
    np.testing.assert_allclose(np.asarray(ctx_g), np.asarray(ctx_r),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_g), np.asarray(w_r), atol=1e-6)


def test_grouped_scma_hard_matches_repeated():
    key = jax.random.PRNGKey(23)
    B, G, T, H, A = 2, 3, 5, 4, 6
    p = init_additive_attention(key, H, H, A)
    hs = jax.random.normal(jax.random.PRNGKey(24), (B, T, H))
    cs = jax.random.normal(jax.random.PRNGKey(25), (B, T, H))
    q = jax.random.normal(jax.random.PRNGKey(26), (B * G, H))
    keys = project_keys(p, hs)
    c_g, _ = scma_select(p, keys, cs, q, mode="hard")
    c_r, _ = scma_select(
        p, jnp.repeat(keys, G, axis=0), jnp.repeat(cs, G, axis=0), q,
        mode="hard",
    )
    np.testing.assert_allclose(np.asarray(c_g), np.asarray(c_r), atol=1e-5)


def test_grouped_attention_rejects_non_multiple():
    p = init_additive_attention(jax.random.PRNGKey(27), 4, 4, 4)
    enc = jnp.zeros((3, 2, 4))
    keys = project_keys(p, enc)
    with np.testing.assert_raises(ValueError):
        additive_attention(p, keys, enc, jnp.zeros((7, 4)), None)
