"""Exactness of the whole-step kernel (ops/wholestep.py: lang cell +
vocab head in ONE pallas_call) vs its two-program composition
(megastep.fused_step_hidden + head.fused_head_topk) and the full beam
decode — interpret mode on CPU, unaligned dims so every padding path is
exercised. CAPTIONKIT_TEST_TPU=1 runs the same assertions compiled on
the real chip (the test_ops_pallas gate convention)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from captionkit.models import editnet, get_model
from captionkit.models.editnet import beam_expand, encode, init, init_state
from captionkit.ops.head import fused_head_topk
from captionkit.ops.megastep import fused_step_hidden, prepare_cell_pack
from captionkit.ops.wholestep import fused_step_topk
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
def test_wholestep_matches_two_program_composition_chained(k):
    """fused_step_topk == (fused_step_hidden -> fused_head_topk), each
    path chained on its own state so drift would compound. The att and
    lang bodies are the same code; the head body shares
    _lse_topk_update — so agreement is fp32-tight, and top-k ids are
    exactly equal."""
    topk = 4
    cfg, params, ctx = _setup(batch=3, k=k)
    B = 3 * k
    pack = prepare_cell_pack(params, cfg, ctx)
    state = init_state(params, ctx)
    rng = np.random.default_rng(1)

    s_ref, s_ws = state, state
    for step_i in range(4):
        tok = jnp.asarray(rng.integers(4, cfg.vocab_size, (B,)), jnp.int32)
        emb = params.embedding[tok]
        h_att_r, c_att_r, h_lang_r, c_lang_r = fused_step_hidden(
            pack, s_ref.h_att, s_ref.c_att, s_ref.h_lang, s_ref.c_lang,
            emb, num_regions=cfg.num_regions, compute_dtype=jnp.float32,
            interpret=INTERPRET)
        vals_r, idx_r, lse_r = fused_head_topk(
            h_lang_r, params.fc_w, params.fc_b, k=topk,
            compute_dtype=jnp.float32, interpret=INTERPRET)
        s_ref = s_ref.replace(h_att=h_att_r, c_att=c_att_r,
                              h_lang=h_lang_r, c_lang=c_lang_r)

        h_att, c_att, h_lang, c_lang, vals, idx, lse = fused_step_topk(
            pack, s_ws.h_att, s_ws.c_att, s_ws.h_lang, s_ws.c_lang,
            emb, params.fc_w, params.fc_b, k=topk,
            num_regions=cfg.num_regions, compute_dtype=jnp.float32,
            interpret=INTERPRET)
        s_ws = s_ws.replace(h_att=h_att, c_att=c_att, h_lang=h_lang,
                            c_lang=c_lang)

        for name in ("h_att", "c_att", "h_lang", "c_lang"):
            np.testing.assert_allclose(
                np.asarray(getattr(s_ws, name)),
                np.asarray(getattr(s_ref, name)),
                rtol=1e-5, atol=1e-5,
                err_msg=f"step {step_i} leaf {name} (k={k})")
        np.testing.assert_array_equal(
            np.asarray(idx), np.asarray(idx_r),
            err_msg=f"step {step_i} top-k ids (k={k})")
        np.testing.assert_allclose(
            np.asarray(vals), np.asarray(vals_r), rtol=1e-5, atol=1e-5,
            err_msg=f"step {step_i} top-k vals")
        np.testing.assert_allclose(
            np.asarray(lse), np.asarray(lse_r), rtol=1e-5, atol=1e-5,
            err_msg=f"step {step_i} lse")


def test_wholestep_accepts_prepadded_head():
    """The step consumes prepad_head output (padded V columns, -1e30
    bias) without re-deriving anything: ids stay < vocab_size."""
    from captionkit.ops.head import prepad_head

    cfg, params, ctx = _setup(batch=2, k=3)
    pack = prepare_cell_pack(params, cfg, ctx)
    state = init_state(params, ctx)
    w_p, b_p = prepad_head(params.fc_w, params.fc_b, n_rows=6, k=5)
    tok = jnp.asarray([4, 5, 6, 7, 8, 9], jnp.int32)
    emb = params.embedding[tok]
    out_raw = fused_step_topk(
        pack, state.h_att, state.c_att, state.h_lang, state.c_lang,
        emb, params.fc_w, params.fc_b, k=5,
        num_regions=cfg.num_regions, interpret=INTERPRET)
    out_pre = fused_step_topk(
        pack, state.h_att, state.c_att, state.h_lang, state.c_lang,
        emb, w_p, b_p, k=5,
        num_regions=cfg.num_regions, interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(out_pre[5]),
                                  np.asarray(out_raw[5]))
    assert int(np.max(np.asarray(out_pre[5]))) < cfg.vocab_size
    np.testing.assert_allclose(np.asarray(out_pre[4]),
                               np.asarray(out_raw[4]), rtol=1e-6)


def test_beam_search_wholestep_matches_pallas_cells_path():
    """End-to-end beam decode with cell_impl='wholestep' vs
    cell_impl='pallas' (same megastep cell numerics, head fused vs
    separate): identical tokens, matching scores."""
    from captionkit.decode import beam_search

    mcfg = dict(CFG, vocab_size=40)
    rng = np.random.default_rng(7)
    feats = rng.standard_normal((4, mcfg["num_regions"],
                                 mcfg["feat_dim"])).astype(np.float32)
    existing = rng.integers(4, 40, (4, 6)).astype(np.int32)
    lens = rng.integers(2, 7, (4,)).astype(np.int32)

    results = {}
    for impl in ("pallas", "wholestep"):
        cfg = ModelConfig(**{**mcfg, "cell_impl": impl})
        model = get_model(cfg)
        params = model.init(jax.random.PRNGKey(3))
        ctx = model.encode(params, jnp.asarray(feats),
                           jnp.asarray(existing), jnp.asarray(lens))
        results[impl] = beam_search(
            model, params, ctx, beam_size=3, start_id=2, end_id=3,
            max_len=7)
    np.testing.assert_array_equal(
        np.asarray(results["pallas"].tokens),
        np.asarray(results["wholestep"].tokens))
    np.testing.assert_allclose(
        np.asarray(results["pallas"].scores),
        np.asarray(results["wholestep"].scores), rtol=2e-4, atol=2e-4)


def test_wholestep_step_falls_back_for_int8_head():
    """cell_impl='wholestep' + head_quant='int8' must not take the
    whole-step path (float head only): step_topk still answers via the
    int8 two-program path, ids in range."""
    cfg, params, ctx = _setup(batch=2, k=3, cell_impl="wholestep",
                              head_quant="int8")
    ctx2 = editnet.prepare_topk(params, cfg, ctx, 3)
    state = init_state(params, ctx2)
    tok = jnp.asarray([4, 5, 6, 7, 8, 9], jnp.int32)
    new_state, vals, idx, lse = editnet.step_topk(
        params, cfg, ctx2, state, tok, 3)
    assert idx.shape == (6, 3)
    assert int(np.max(np.asarray(idx))) < cfg.vocab_size
    assert np.all(np.isfinite(np.asarray(vals)))
