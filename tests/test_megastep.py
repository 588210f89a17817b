"""Exactness of the fused decode-step cell kernels (ops/megastep.py) vs
the jnp EditNet step (models/editnet._step_hidden) — interpret mode on
CPU, unaligned dims so every padding path is exercised. Setting
CAPTIONKIT_TEST_TPU=1 runs the same assertions compiled on the real
chip (the test_ops_pallas on-chip gate convention).

The fused path sums the same matmul contributions in a different fp32
order (split matmuls vs packed contractions), so agreement is to ~1e-5
relative at fp32, not bitwise."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from captionkit.models import editnet
from captionkit.models.editnet import beam_expand, encode, init, init_state
from captionkit.ops.megastep import fused_step_hidden, prepare_cell_pack
from captionkit.utils.config import ModelConfig

INTERPRET = os.environ.get("CAPTIONKIT_TEST_TPU", "0") != "1"

CFG = dict(
    arch="editnet", vocab_size=30, emb_dim=12, hidden_dim=16, att_dim=8,
    feat_dim=10, num_regions=4, dropout=0.0, compute_dtype="float32",
)


def _setup(batch=3, t_in=6, k=1, seed=0, **over):
    cfg = ModelConfig(**{**CFG, **over})
    params = init(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(
        rng.standard_normal((batch, cfg.num_regions, cfg.feat_dim)),
        jnp.float32)
    existing = jnp.asarray(
        rng.integers(4, cfg.vocab_size, (batch, t_in)), jnp.int32)
    existing_len = jnp.asarray(
        rng.integers(2, t_in + 1, (batch,)), jnp.int32)
    ctx = encode(params, cfg, feats, existing, existing_len)
    if k > 1:
        ctx = beam_expand(ctx, k)
    return cfg, params, ctx


@pytest.mark.parametrize("k", [1, 3])
def test_fused_step_matches_jnp_step_chained(k):
    cfg, params, ctx = _setup(batch=3, k=k)
    B = 3 * k
    pack = prepare_cell_pack(params, cfg, ctx)
    state = init_state(params, ctx)
    rng = np.random.default_rng(1)

    # Chain several steps feeding each path its OWN state so drift would
    # compound and be caught.
    s_ref, s_fused = state, state
    for step_i in range(4):
        tok = jnp.asarray(rng.integers(4, cfg.vocab_size, (B,)), jnp.int32)
        s_ref, out_ref = editnet._step_hidden(
            params, cfg, ctx, s_ref, tok)
        emb = params.embedding[tok]
        h_att, c_att, h_lang, c_lang = fused_step_hidden(
            pack, s_fused.h_att, s_fused.c_att, s_fused.h_lang,
            s_fused.c_lang, emb, num_regions=cfg.num_regions, compute_dtype=jnp.float32,
            interpret=INTERPRET)
        s_fused = s_fused.replace(
            h_att=h_att, c_att=c_att, h_lang=h_lang, c_lang=c_lang)
        for name in ("h_att", "c_att", "h_lang", "c_lang"):
            a = np.asarray(getattr(s_ref, name))
            b = np.asarray(getattr(s_fused, name))
            np.testing.assert_allclose(
                b, a, rtol=2e-5, atol=2e-5,
                err_msg=f"step {step_i} leaf {name} (k={k})")
        np.testing.assert_allclose(
            np.asarray(s_fused.h_lang), np.asarray(out_ref),
            rtol=2e-5, atol=2e-5)


def test_fused_step_respects_scma_mask():
    """Short existing captions: the SCMA mask must zero padded memory —
    checked implicitly by state parity when lengths vary (covered above)
    and explicitly here by perturbing a masked-out encoder cell."""
    cfg, params, ctx = _setup(batch=2, t_in=6, k=1, seed=3)
    pack = prepare_cell_pack(params, cfg, ctx)
    state = init_state(params, ctx)
    tok = jnp.asarray([5, 6], jnp.int32)
    emb = params.embedding[tok]
    base = fused_step_hidden(
        pack, state.h_att, state.c_att, state.h_lang, state.c_lang, emb,
        num_regions=cfg.num_regions, compute_dtype=jnp.float32,
        interpret=INTERPRET)
    # Poison a masked (padded-length) memory slot; outputs must not move.
    mask = np.asarray(ctx.mask)
    b, t = None, None
    for bb in range(mask.shape[0]):
        off = np.where(~mask[bb])[0]
        if off.size:
            b, t = bb, int(off[0])
            break
    assert b is not None, "fixture needs one padded position"
    poisoned = pack._replace(
        enc_cs=pack.enc_cs.at[b, t].set(1e4),
        scma_keys=pack.scma_keys.at[b, t].set(1e4))
    out2 = fused_step_hidden(
        poisoned, state.h_att, state.c_att, state.h_lang, state.c_lang,
        emb, num_regions=cfg.num_regions, compute_dtype=jnp.float32,
        interpret=INTERPRET)
    for a, c in zip(base, out2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-6, atol=1e-6)


def test_fused_step_bf16_tracks_jnp_bf16():
    cfg, params, ctx = _setup(batch=2, k=3, seed=5,
                              compute_dtype="bfloat16")
    pack = prepare_cell_pack(params, cfg, ctx)
    state = init_state(params, ctx)
    tok = jnp.asarray(np.arange(6) % 20 + 4, jnp.int32)
    s_ref, out_ref = editnet._step_hidden(params, cfg, ctx, state, tok)
    emb = params.embedding[tok]
    h_att, c_att, h_lang, c_lang = fused_step_hidden(
        pack, state.h_att, state.c_att, state.h_lang, state.c_lang, emb,
        num_regions=cfg.num_regions, compute_dtype=jnp.bfloat16,
        interpret=INTERPRET)
    for a, b in zip((s_ref.h_att, s_ref.c_att, s_ref.h_lang,
                     s_ref.c_lang), (h_att, c_att, h_lang, c_lang)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = max(float(np.abs(a).max()), 1e-3)
        assert float(np.abs(a - b).max()) / denom < 0.03


def test_beam_search_fused_cells_matches_xla_path():
    """End-to-end beam decode with cell_impl='pallas' (interpret mode) —
    identical hypotheses to the XLA cell path at fp32 (accumulation-order
    differences are far below ranking resolution on random weights)."""
    from captionkit.decode import beam_search
    from captionkit.models import get_model

    cfg_x = ModelConfig(**CFG)
    cfg_p = ModelConfig(**{**CFG, "cell_impl": "pallas"})
    model_x, model_p = get_model(cfg_x), get_model(cfg_p)
    params = model_x.init(jax.random.PRNGKey(2))
    rng = np.random.default_rng(2)
    B = 4
    feats = jnp.asarray(
        rng.standard_normal((B, cfg_x.num_regions, cfg_x.feat_dim)),
        jnp.float32)
    existing = jnp.asarray(rng.integers(4, 30, (B, 6)), jnp.int32)
    elen = jnp.asarray(rng.integers(2, 7, (B,)), jnp.int32)
    ctx_x = model_x.encode(params, feats, existing, elen)
    ctx_p = model_p.encode(params, feats, existing, elen)
    rx = beam_search(model_x, params, ctx_x, beam_size=3, start_id=2,
                     end_id=3, max_len=8)
    rp = beam_search(model_p, params, ctx_p, beam_size=3, start_id=2,
                     end_id=3, max_len=8)
    np.testing.assert_array_equal(np.asarray(rx.tokens),
                                  np.asarray(rp.tokens))
    np.testing.assert_allclose(np.asarray(rx.scores),
                               np.asarray(rp.scores), rtol=2e-4, atol=2e-4)


# -- DCNet sibling ----------------------------------------------------------


def _setup_dcnet(batch=3, t_in=6, k=1, seed=0, **over):
    from captionkit.models import dcnet

    cfg = ModelConfig(**{**CFG, **over, "arch": "dcnet"})
    params = dcnet.init(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    existing = jnp.asarray(
        rng.integers(4, cfg.vocab_size, (batch, t_in)), jnp.int32)
    existing_len = jnp.asarray(
        rng.integers(2, t_in + 1, (batch,)), jnp.int32)
    ctx = dcnet.encode(params, cfg, None, existing, existing_len)
    if k > 1:
        ctx = dcnet.beam_expand(ctx, k)
    return cfg, params, ctx


@pytest.mark.parametrize("k", [1, 3])
def test_dcnet_fused_step_matches_jnp_step_chained(k):
    from captionkit.models import dcnet
    from captionkit.ops.megastep import (
        dcnet_fused_step_hidden, prepare_dcnet_cell_pack)

    cfg, params, ctx = _setup_dcnet(batch=3, k=k)
    B = 3 * k
    pack = prepare_dcnet_cell_pack(params, cfg, ctx)
    state = dcnet.init_state(params, ctx)
    rng = np.random.default_rng(1)
    s_ref, s_fused = state, state
    for step_i in range(4):
        tok = jnp.asarray(rng.integers(4, cfg.vocab_size, (B,)), jnp.int32)
        s_ref, out_ref = dcnet._step_hidden(params, cfg, ctx, s_ref, tok)
        emb = params.embedding[tok]
        h, c = dcnet_fused_step_hidden(
            pack, s_fused.h, s_fused.c, emb,
            compute_dtype=jnp.float32, interpret=INTERPRET)
        s_fused = s_fused.replace(h=h, c=c)
        np.testing.assert_allclose(
            np.asarray(s_fused.h), np.asarray(s_ref.h),
            rtol=2e-5, atol=2e-5, err_msg=f"step {step_i} h (k={k})")
        np.testing.assert_allclose(
            np.asarray(s_fused.c), np.asarray(s_ref.c),
            rtol=2e-5, atol=2e-5, err_msg=f"step {step_i} c (k={k})")
        np.testing.assert_allclose(
            np.asarray(s_fused.h), np.asarray(out_ref),
            rtol=2e-5, atol=2e-5)


def test_dcnet_beam_search_fused_cells_matches_xla_path():
    from captionkit.decode import beam_search
    from captionkit.models import get_model

    cfg_x = ModelConfig(**{**CFG, "arch": "dcnet"})
    cfg_p = ModelConfig(**{**CFG, "arch": "dcnet", "cell_impl": "pallas"})
    model_x, model_p = get_model(cfg_x), get_model(cfg_p)
    params = model_x.init(jax.random.PRNGKey(2))
    rng = np.random.default_rng(2)
    B = 4
    existing = jnp.asarray(rng.integers(4, 30, (B, 6)), jnp.int32)
    elen = jnp.asarray(rng.integers(2, 7, (B,)), jnp.int32)
    ctx_x = model_x.encode(params, None, existing, elen)
    ctx_p = model_p.encode(params, None, existing, elen)
    rx = beam_search(model_x, params, ctx_x, beam_size=3, start_id=2,
                     end_id=3, max_len=8)
    rp = beam_search(model_p, params, ctx_p, beam_size=3, start_id=2,
                     end_id=3, max_len=8)
    np.testing.assert_array_equal(np.asarray(rx.tokens),
                                  np.asarray(rp.tokens))
    np.testing.assert_allclose(np.asarray(rx.scores),
                               np.asarray(rp.scores), rtol=2e-4, atol=2e-4)
