"""Model-layer tests: shapes, determinism, gradients, step/TF equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from captionkit.models import get_model, teacher_forcing_logits
from captionkit.utils.config import ModelConfig

CFG = dict(
    vocab_size=50, emb_dim=16, hidden_dim=24, att_dim=8,
    feat_dim=12, num_regions=5, dropout=0.5, compute_dtype="float32",
)


def _setup(arch: str, batch=3, t_in=7):
    cfg = ModelConfig(arch=arch, **CFG)
    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal((batch, cfg.num_regions, cfg.feat_dim)),
        jnp.float32,
    )
    existing = jnp.asarray(
        rng.integers(4, cfg.vocab_size, (batch, t_in)), jnp.int32
    )
    existing_len = jnp.asarray([t_in, 4, 2], jnp.int32)
    ctx = model.encode(params, feats, existing, existing_len)
    return cfg, model, params, ctx


@pytest.mark.parametrize("arch", ["dcnet", "editnet"])
def test_step_shapes_and_determinism(arch):
    cfg, model, params, ctx = _setup(arch)
    state = model.init_state(params, ctx)
    tok = jnp.asarray([2, 3, 4], jnp.int32)
    s1, logits1 = model.step(params, ctx, state, tok)
    s2, logits2 = model.step(params, ctx, state, tok)
    assert logits1.shape == (3, cfg.vocab_size)
    assert logits1.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(logits1), np.asarray(logits2))


@pytest.mark.parametrize("arch", ["dcnet", "editnet"])
def test_teacher_forcing_matches_manual_steps(arch):
    cfg, model, params, ctx = _setup(arch)
    tokens_in = jnp.asarray(
        np.random.default_rng(1).integers(1, cfg.vocab_size, (3, 5)),
        jnp.int32,
    )
    tf_logits = teacher_forcing_logits(model, params, ctx,
                                       model.init_state(params, ctx),
                                       tokens_in)
    # Manual python loop over the same step fn.
    state = model.init_state(params, ctx)
    outs = []
    for t in range(5):
        state, logits = model.step(params, ctx, state, tokens_in[:, t])
        outs.append(np.asarray(logits))
    manual = np.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(tf_logits), manual, atol=1e-5)


@pytest.mark.parametrize("arch", ["dcnet", "editnet"])
def test_gradients_flow_everywhere(arch):
    cfg, model, params, ctx_unused = _setup(arch)
    # Regions must DIFFER: with identical region features the attention
    # weights cannot change the context, so the visual-attention scoring
    # params receive an exactly-zero gradient (a property of the math, not
    # a bug — a constant-features test passes or fails on rounding noise).
    feats = jnp.asarray(
        np.random.default_rng(3).standard_normal(
            (2, cfg.num_regions, cfg.feat_dim)
        ),
        jnp.float32,
    )
    existing = jnp.asarray([[2, 5, 6, 3, 0], [2, 7, 3, 0, 0]], jnp.int32)
    existing_len = jnp.asarray([4, 3], jnp.int32)
    target_in = jnp.asarray([[2, 8, 9], [2, 10, 11]], jnp.int32)
    target_out = jnp.asarray([[8, 9, 3], [10, 11, 3]], jnp.int32)

    def loss_fn(p):
        ctx = model.encode(p, feats, existing, existing_len)
        logits = teacher_forcing_logits(
            model, p, ctx, model.init_state(p, ctx), target_in
        )
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(
            jnp.take_along_axis(logp, target_out[..., None], axis=-1)
        )

    grads = jax.grad(loss_fn)(
        model.init(jax.random.PRNGKey(1))
    )
    flat, _ = jax.tree.flatten(grads)
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in flat if g is not None)
    total = len([g for g in flat if g is not None])
    # Every parameter tensor should receive gradient (embedding rows for
    # unused tokens are zero, but the tensor itself is touched).
    assert nonzero == total, f"only {nonzero}/{total} grad tensors nonzero"


def test_editnet_scma_uses_memory_pool():
    """Changing the encoder cell states (copy pool) must change logits."""
    cfg, model, params, ctx = _setup("editnet")
    state = model.init_state(params, ctx)
    tok = jnp.asarray([2, 3, 4], jnp.int32)
    _, logits_a = model.step(params, ctx, state, tok)
    ctx_b = ctx.replace(enc_cs=ctx.enc_cs + 1.0)
    _, logits_b = model.step(params, ctx_b, state, tok)
    assert not np.allclose(np.asarray(logits_a), np.asarray(logits_b))


def test_dcnet_attends_only_within_length():
    """Tokens beyond existing_len must not affect DCNet's decoder output."""
    cfg, model, params, _ = _setup("dcnet")
    feats = jnp.zeros((1, cfg.num_regions, cfg.feat_dim))
    existing_a = jnp.asarray([[2, 5, 6, 3, 0, 0]], jnp.int32)
    existing_b = jnp.asarray([[2, 5, 6, 3, 40, 41]], jnp.int32)  # junk tail
    length = jnp.asarray([4], jnp.int32)
    ctx_a = model.encode(params, feats, existing_a, length)
    ctx_b = model.encode(params, feats, existing_b, length)
    state_a = model.init_state(params, ctx_a)
    state_b = model.init_state(params, ctx_b)
    tok = jnp.asarray([2], jnp.int32)
    _, la = model.step(params, ctx_a, state_a, tok)
    _, lb = model.step(params, ctx_b, state_b, tok)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-5)


def test_dropout_only_in_train_mode():
    cfg, model, params, ctx = _setup("editnet")
    state = model.init_state(params, ctx)
    tok = jnp.asarray([2, 3, 4], jnp.int32)
    rng = jax.random.PRNGKey(7)
    _, l_eval = model.step(params, ctx, state, tok, rng, False)
    _, l_eval2 = model.step(params, ctx, state, tok, None, False)
    np.testing.assert_array_equal(np.asarray(l_eval), np.asarray(l_eval2))
    _, l_train = model.step(params, ctx, state, tok, rng, True)
    assert not np.allclose(np.asarray(l_eval), np.asarray(l_train))


def test_registry_unknown_arch():
    # ModelConfig validates arch at construction now, so the bad value
    # never reaches the registry.
    with pytest.raises(ValueError, match="arch"):
        get_model(ModelConfig(arch="transformer", **CFG))


def test_dcnet_visual_flag():
    """dcnet_use_visual=True adds a visual attention head that changes
    logits when features change (SURVEY.md §8.4 open item)."""
    cfg = ModelConfig(arch="dcnet", dcnet_use_visual=True, **CFG)
    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    assert params.vis_attention is not None
    rng = np.random.default_rng(0)
    feats_a = jnp.asarray(
        rng.standard_normal((2, cfg.num_regions, cfg.feat_dim)), jnp.float32
    )
    feats_b = feats_a + 1.0
    existing = jnp.asarray([[2, 5, 6, 3], [2, 7, 3, 0]], jnp.int32)
    lens = jnp.asarray([4, 3], jnp.int32)
    tok = jnp.asarray([2, 2], jnp.int32)

    def logits_for(feats):
        ctx = model.encode(params, feats, existing, lens)
        state = model.init_state(params, ctx)
        _, logits = model.step(params, ctx, state, tok)
        return np.asarray(logits)

    assert not np.allclose(logits_for(feats_a), logits_for(feats_b))
    # Text-only DCNet must ignore features entirely.
    cfg0 = ModelConfig(arch="dcnet", dcnet_use_visual=False, **CFG)
    model0 = get_model(cfg0)
    params0 = model0.init(jax.random.PRNGKey(0))

    def logits0(feats):
        ctx = model0.encode(params0, feats, existing, lens)
        state = model0.init_state(params0, ctx)
        _, logits = model0.step(params0, ctx, state, tok)
        return np.asarray(logits)

    np.testing.assert_array_equal(logits0(feats_a), logits0(feats_b))


@pytest.mark.parametrize("arch", ["dcnet", "editnet"])
def test_forward_seq_matches_generic_scan_in_train_mode(arch):
    """ModelDef.forward_seq (training-optimized teacher forcing) must be
    row-wise identical to scanning `step` — including the per-step
    dropout rng folding."""
    import dataclasses

    cfg, model, params, ctx = _setup(arch)
    assert model.forward_seq is not None
    tokens_in = jnp.asarray(
        np.random.default_rng(2).integers(1, cfg.vocab_size, (3, 6)),
        jnp.int32,
    )
    state0 = model.init_state(params, ctx)
    rng = jax.random.PRNGKey(11)
    fast = teacher_forcing_logits(
        model, params, ctx, state0, tokens_in, rng=rng, train=True
    )
    generic = teacher_forcing_logits(
        dataclasses.replace(model, forward_seq=None),
        params, ctx, state0, tokens_in, rng=rng, train=True,
    )
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(generic), atol=1e-5
    )
