"""Grad parity of the hand-written deferred-dW backward
(models/editnet_backward.py) vs autodiff through the lax.scan path.

The loss closes over encode(params, ...) so cotangents flow through the
context constants (features, keys, encoder states) as well as every
in-scan weight — the full training gradient path, not just the block."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from captionkit.models import get_model
from captionkit.utils.config import ModelConfig

CFG = dict(
    vocab_size=40, emb_dim=12, hidden_dim=16, att_dim=8,
    feat_dim=10, num_regions=4, compute_dtype="float32",
)


def _setup(deferred, dropout=0.0, batch=3, t_in=7, t_out=6, seed=0):
    cfg = ModelConfig(arch="editnet", dropout=dropout,
                      deferred_backward=deferred, **CFG)
    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(
        rng.standard_normal((batch, cfg.num_regions, cfg.feat_dim)),
        jnp.float32)
    existing = jnp.asarray(
        rng.integers(4, cfg.vocab_size, (batch, t_in)), jnp.int32)
    existing_len = jnp.asarray(rng.integers(2, t_in + 1, (batch,)),
                               jnp.int32)
    tokens_in = jnp.asarray(
        rng.integers(4, cfg.vocab_size, (batch, t_out)), jnp.int32)
    wsum = jnp.asarray(
        rng.standard_normal((batch, t_out, cfg.vocab_size)) * 0.1,
        jnp.float32)
    return cfg, model, params, feats, existing, existing_len, tokens_in, wsum


def _loss_fn(model, feats, existing, existing_len, tokens_in, wsum,
             rng=None, train=False):
    def loss(params):
        ctx = model.encode(params, feats, existing, existing_len)
        state0 = model.init_state(params, ctx)
        logits = model.forward_seq(params, ctx, state0, tokens_in,
                                   rng, train)
        # nonlinear reduction so every logit's cotangent is distinct
        return jnp.sum(jnp.tanh(logits) * wsum)

    return loss


@pytest.mark.parametrize("train,dropout", [(False, 0.0), (True, 0.5)])
def test_deferred_backward_grad_parity(train, dropout):
    args = _setup(False, dropout=dropout)
    cfg, model, params = args[0], args[1], args[2]
    rest = args[3:]
    args_d = _setup(True, dropout=dropout)
    model_d = args_d[1]

    rng = jax.random.PRNGKey(3) if train else None
    loss_ref = _loss_fn(model, *rest, rng=rng, train=train)
    loss_def = _loss_fn(model_d, *rest, rng=rng, train=train)

    # values identical (same forward math, same dropout mask stream)
    np.testing.assert_allclose(
        float(loss_ref(params)), float(loss_def(params)),
        rtol=1e-6, atol=1e-6)

    g_ref = jax.grad(loss_ref)(params)
    g_def = jax.grad(loss_def)(params)
    flat_ref, tree_ref = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_def, _ = jax.tree_util.tree_flatten_with_path(g_def)
    assert len(flat_ref) == len(flat_def)
    # fp32: the two paths sum identical per-step terms in different
    # orders (per-step accumulate vs one batched einsum), so agreement is
    # relative to each leaf's magnitude. Exactness is pinned at 2e-15 by
    # the float64 test below.
    for (path, a), (_, b) in zip(flat_ref, flat_def):
        name = jax.tree_util.keystr(path)
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        assert np.abs(b - a).max() <= 1e-3 * scale, (
            f"grad mismatch at {name}: "
            f"{np.abs(b - a).max()} vs scale {scale}")


def test_deferred_backward_bf16_spotcheck():
    """bf16 compute: values track closely; grads agree loosely (the
    deferred path accumulates context cotangents in fp32, strictly more
    precisely than autodiff's bf16 accumulates)."""
    args = _setup(False)
    model, params, rest = args[1], args[2], args[3:]
    cfg_b = dataclasses.replace(args[0], compute_dtype="bfloat16")
    model_b_ref = get_model(cfg_b)
    model_b_def = get_model(
        dataclasses.replace(cfg_b, deferred_backward=True))

    loss_ref = _loss_fn(model_b_ref, *rest)
    loss_def = _loss_fn(model_b_def, *rest)
    np.testing.assert_allclose(
        float(loss_ref(params)), float(loss_def(params)),
        rtol=1e-5, atol=1e-5)
    g_ref = jax.grad(loss_ref)(params)
    g_def = jax.grad(loss_def)(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_def)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = max(float(np.abs(a).max()), 1e-4)
        assert float(np.abs(a - b).max()) / denom < 0.05


def test_deferred_backward_hard_scma_falls_back():
    """hard SCMA must route to the autodiff scan (and still train)."""
    cfg = ModelConfig(arch="editnet", dropout=0.0,
                      deferred_backward=True, scma_select="hard", **CFG)
    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, 4, 10)), jnp.float32)
    existing = jnp.asarray(rng.integers(4, 40, (2, 5)), jnp.int32)
    lens = jnp.asarray([5, 3], jnp.int32)
    tokens = jnp.asarray(rng.integers(4, 40, (2, 4)), jnp.int32)

    def loss(p):
        ctx = model.encode(p, feats, existing, lens)
        s0 = model.init_state(p, ctx)
        return jnp.sum(model.forward_seq(p, ctx, s0, tokens) ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(g))


def test_deferred_backward_exact_at_float64():
    """The decisive correctness pin: under x64 the hand-written backward
    must match autodiff to ~1e-15 relative — any real math error (a
    wrong derivative term, a missing path) shows up at ~1e-2, not 1e-15.
    Run in a subprocess: jax_enable_x64 is process-global."""
    import subprocess
    import sys

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
from captionkit.models.editnet_backward import (
    _recurrent_seq, _recurrent_seq_fwd)

rng = np.random.default_rng(0)
B, T, Tm, H, A, R, F = 3, 6, 7, 16, 8, 4, 10
def arr(*shape, s=0.4):
    return jnp.asarray(rng.standard_normal(shape) * s, jnp.float64)
diff_ins = {
    "w_rec_lang": arr(H, 4 * H), "w_rec_att": arr(H, 4 * H),
    "lang_wx": arr(F + H, 4 * H), "lang_wh": arr(H, 4 * H),
    "lang_b": arr(4 * H), "lang_wrx": arr(F + H, H),
    "lang_wrh": arr(H, H), "lang_wrc": arr(H, H), "lang_br": arr(H),
    "vis_wq": arr(H, A), "vis_v": arr(A), "vis_b": arr(A),
    "gate_w": arr(H, F), "gate_b": arr(F),
    "scma_wq": arr(H, A), "scma_v": arr(A), "scma_b": arr(A),
    "vis_keys": arr(B, R, A), "features": arr(B, R, F),
    "scma_keys": arr(B, Tm, A), "enc_cs": arr(B, Tm, H),
    "state0": (arr(B, H), arr(B, H), arr(B, H), arr(B, H)),
    "zx": arr(T, B, 4 * H),
}
mask = jnp.asarray(rng.integers(0, 2, (B, Tm)), bool).at[:, 0].set(True)
key = jax.random.PRNGKey(7)
w = arr(T, B, H)
for train, drop in [(False, 0.0), (True, 0.5)]:
    static = ("float64", drop, train, T)
    def mk(fn):
        def loss(di):
            ins = dict(di, mask=mask, rng=key)
            return jnp.sum(jnp.tanh(fn(ins)) * w)
        return loss
    loss_c = mk(lambda i: _recurrent_seq(static, i))
    loss_a = mk(lambda i: _recurrent_seq_fwd(static, i)[0])
    assert float(loss_c(diff_ins)) == float(loss_a(diff_ins))
    gc = jax.grad(loss_c)(diff_ins)
    ga = jax.grad(loss_a)(diff_ins)
    for k in ga:
        for la, lc in zip(jax.tree.leaves(ga[k]), jax.tree.leaves(gc[k])):
            la, lc = np.asarray(la), np.asarray(lc)
            d = np.abs(la - lc).max() / max(np.abs(la).max(), 1e-12)
            assert d < 1e-12, (k, d)
print("X64-EXACT-OK")
"""
    import os
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=300,
                          cwd=__import__("os").path.dirname(
                              __import__("os").path.dirname(
                                  __import__("os").path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "X64-EXACT-OK" in proc.stdout


# -- DCNet sibling (models/dcnet_backward.py) ------------------------------

def _setup_dcnet(deferred, dropout=0.0, batch=3, t_in=7, t_out=6, seed=1):
    cfg = ModelConfig(arch="dcnet", dropout=dropout,
                      dcnet_deferred_backward=deferred, **CFG)
    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    existing = jnp.asarray(
        rng.integers(4, cfg.vocab_size, (batch, t_in)), jnp.int32)
    existing_len = jnp.asarray(rng.integers(2, t_in + 1, (batch,)),
                               jnp.int32)
    tokens_in = jnp.asarray(
        rng.integers(4, cfg.vocab_size, (batch, t_out)), jnp.int32)
    wsum = jnp.asarray(
        rng.standard_normal((batch, t_out, cfg.vocab_size)) * 0.1,
        jnp.float32)
    return cfg, model, params, existing, existing_len, tokens_in, wsum


def _dcnet_loss_fn(model, existing, existing_len, tokens_in, wsum,
                   rng=None, train=False):
    def loss(params):
        ctx = model.encode(params, None, existing, existing_len)
        state0 = model.init_state(params, ctx)
        logits = model.forward_seq(params, ctx, state0, tokens_in,
                                   rng, train)
        return jnp.sum(jnp.tanh(logits) * wsum)

    return loss


@pytest.mark.parametrize("train,dropout", [(False, 0.0), (True, 0.5)])
def test_dcnet_deferred_backward_grad_parity(train, dropout):
    args = _setup_dcnet(False, dropout=dropout)
    model, params, rest = args[1], args[2], args[3:]
    model_d = _setup_dcnet(True, dropout=dropout)[1]

    rng = jax.random.PRNGKey(5) if train else None
    loss_ref = _dcnet_loss_fn(model, *rest, rng=rng, train=train)
    loss_def = _dcnet_loss_fn(model_d, *rest, rng=rng, train=train)
    np.testing.assert_allclose(
        float(loss_ref(params)), float(loss_def(params)),
        rtol=1e-6, atol=1e-6)
    g_ref = jax.grad(loss_ref)(params)
    g_def = jax.grad(loss_def)(params)
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_def, _ = jax.tree_util.tree_flatten_with_path(g_def)
    for (path, a), (_, b) in zip(flat_ref, flat_def):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        assert np.abs(b - a).max() <= 1e-3 * scale, (
            f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_dcnet_deferred_visual_falls_back():
    """dcnet_use_visual routes to the autodiff scan (and still trains)."""
    cfg = ModelConfig(arch="dcnet", dropout=0.0,
                      dcnet_deferred_backward=True,
                      dcnet_use_visual=True, **CFG)
    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, 4, 10)), jnp.float32)
    existing = jnp.asarray(rng.integers(4, 40, (2, 5)), jnp.int32)
    lens = jnp.asarray([5, 3], jnp.int32)
    tokens = jnp.asarray(rng.integers(4, 40, (2, 4)), jnp.int32)

    def loss(p):
        ctx = model.encode(p, feats, existing, lens)
        s0 = model.init_state(p, ctx)
        return jnp.sum(model.forward_seq(p, ctx, s0, tokens) ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(g))


def test_dcnet_deferred_backward_exact_at_float64():
    import os
    import subprocess
    import sys

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp
from captionkit.models.dcnet_backward import dcnet_recurrent_seq, _fwd

rng = np.random.default_rng(0)
B, T, Tm, H, A = 3, 6, 7, 16, 8
def arr(*shape, s=0.4):
    return jnp.asarray(rng.standard_normal(shape) * s, jnp.float64)
diff_ins = {
    "w_rec_ctx": arr(H, 4 * H), "w_rec_h": arr(H, 4 * H),
    "att_wq": arr(H, A), "att_v": arr(A), "att_b": arr(A),
    "gate_w": arr(H, H), "gate_b": arr(H),
    "att_keys": arr(B, Tm, A), "enc_hs": arr(B, Tm, H),
    "state0": (arr(B, H), arr(B, H)),
    "zx": arr(T, B, 4 * H),
}
mask = jnp.asarray(rng.integers(0, 2, (B, Tm)), bool).at[:, 0].set(True)
key = jax.random.PRNGKey(7)
w = arr(T, B, H)
for train, drop in [(False, 0.0), (True, 0.5)]:
    static = ("float64", drop, train, T)
    def mk(fn):
        def loss(di):
            ins = dict(di, mask=mask, rng=key)
            return jnp.sum(jnp.tanh(fn(ins)) * w)
        return loss
    loss_c = mk(lambda i: dcnet_recurrent_seq(static, i))
    loss_a = mk(lambda i: _fwd(static, i)[0])
    assert float(loss_c(diff_ins)) == float(loss_a(diff_ins))
    gc = jax.grad(loss_c)(diff_ins)
    ga = jax.grad(loss_a)(diff_ins)
    for k in ga:
        for la, lc in zip(jax.tree.leaves(ga[k]), jax.tree.leaves(gc[k])):
            la, lc = np.asarray(la), np.asarray(lc)
            d = np.abs(la - lc).max() / max(np.abs(la).max(), 1e-12)
            assert d < 1e-12, (k, d)
print("DCNET-X64-EXACT-OK")
"""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=300,
                          cwd=repo)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "DCNET-X64-EXACT-OK" in proc.stdout
