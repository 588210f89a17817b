"""Parity harness (SURVEY.md §5 item 1, adapted to the empty mount):

torch twin models (captionkit.convert.torch_ref, torch parameter layout)
-> state_dict conversion -> captionkit params. Assert:
(a) teacher-forced per-step logits match (atol ~1e-4 fp32),
(b) greedy decode produces IDENTICAL token sequences [B],
(c) slow torch beam search and captionkit's batched device beam agree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from captionkit.convert.torch_import import (
    dcnet_params_from_state_dict,
    editnet_params_from_state_dict,
)
from captionkit.convert.torch_ref import (
    TorchDCNet,
    TorchEditNet,
    beam_search_slow,
)
from captionkit.decode import beam_search, greedy_decode
from captionkit.models import get_model
from captionkit.utils.config import ModelConfig

V, E, H, A, F, R = 40, 12, 16, 8, 10, 4
START, END = 2, 3


def _data(batch=3, t_in=6, seed=0):
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal((batch, R, F)).astype(np.float32)
    existing = rng.integers(4, V, (batch, t_in)).astype(np.int64)
    lengths = rng.integers(2, t_in + 1, (batch,)).astype(np.int64)
    return feats, existing, lengths


@pytest.fixture(scope="module")
def editnet_pair():
    torch.manual_seed(0)
    tmodel = TorchEditNet(V, E, H, A, F).eval()
    params = editnet_params_from_state_dict(tmodel.state_dict())
    cfg = ModelConfig(arch="editnet", vocab_size=V, emb_dim=E, hidden_dim=H,
                      att_dim=A, feat_dim=F, num_regions=R, dropout=0.0,
                      compute_dtype="float32")
    return tmodel, get_model(cfg), params


@pytest.fixture(scope="module")
def dcnet_pair():
    torch.manual_seed(1)
    tmodel = TorchDCNet(V, E, H, A).eval()
    params = dcnet_params_from_state_dict(tmodel.state_dict())
    cfg = ModelConfig(arch="dcnet", vocab_size=V, emb_dim=E, hidden_dim=H,
                      att_dim=A, feat_dim=F, num_regions=R, dropout=0.0,
                      compute_dtype="float32")
    return tmodel, get_model(cfg), params


def test_editnet_stepwise_logit_parity(editnet_pair):
    tmodel, model, params = editnet_pair
    feats, existing, lengths = _data()
    with torch.no_grad():
        tctx = tmodel.encode(torch.from_numpy(feats),
                             torch.from_numpy(existing),
                             torch.from_numpy(lengths))
        tstate = list(tmodel.init_state(tctx))
    ctx = model.encode(params, jnp.asarray(feats),
                       jnp.asarray(existing.astype(np.int32)),
                       jnp.asarray(lengths.astype(np.int32)))
    state = model.init_state(params, ctx)
    tok_np = np.full((3,), START, np.int32)
    for t in range(5):
        with torch.no_grad():
            out = tmodel.step(tctx, *tstate,
                              torch.from_numpy(tok_np.astype(np.int64)))
            tstate, tlogits = list(out[:-1]), out[-1].numpy()
        state, logits = model.step(params, ctx, state, jnp.asarray(tok_np))
        np.testing.assert_allclose(np.asarray(logits), tlogits, atol=2e-4)
        tok_np = np.argmax(tlogits, -1).astype(np.int32)


def test_dcnet_stepwise_logit_parity(dcnet_pair):
    tmodel, model, params = dcnet_pair
    _, existing, lengths = _data(seed=3)
    with torch.no_grad():
        tctx = tmodel.encode(torch.from_numpy(existing),
                             torch.from_numpy(lengths))
        h, c = tmodel.init_state(tctx)
    ctx = model.encode(params, None,
                       jnp.asarray(existing.astype(np.int32)),
                       jnp.asarray(lengths.astype(np.int32)))
    state = model.init_state(params, ctx)
    np.testing.assert_allclose(np.asarray(state.h), h.numpy(), atol=1e-5)
    tok_np = np.full((3,), START, np.int32)
    for t in range(5):
        with torch.no_grad():
            h, c, tlogits = tmodel.step(
                tctx, h, c, torch.from_numpy(tok_np.astype(np.int64))
            )
        state, logits = model.step(params, ctx, state, jnp.asarray(tok_np))
        np.testing.assert_allclose(np.asarray(logits), tlogits.numpy(),
                                   atol=2e-4)
        tok_np = np.argmax(tlogits.numpy(), -1).astype(np.int32)


def test_editnet_greedy_decode_identical(editnet_pair):
    """The fidelity bar: identical edited captions under greedy decode [B]."""
    tmodel, model, params = editnet_pair
    feats, existing, lengths = _data(batch=6, seed=5)
    ctx = model.encode(params, jnp.asarray(feats),
                       jnp.asarray(existing.astype(np.int32)),
                       jnp.asarray(lengths.astype(np.int32)))
    ours = np.asarray(
        greedy_decode(model, params, ctx, start_id=START, end_id=END,
                      max_len=12).tokens
    )
    # torch greedy, batch=1 per image (reference style).
    for b in range(6):
        with torch.no_grad():
            tctx = tmodel.encode(
                torch.from_numpy(feats[b: b + 1]),
                torch.from_numpy(existing[b: b + 1]),
                torch.from_numpy(lengths[b: b + 1]),
            )
            tstate = list(tmodel.init_state(tctx))
            tok = torch.full((1,), START, dtype=torch.long)
            ref_seq = []
            for _ in range(12):
                out = tmodel.step(tctx, *tstate, tok)
                tstate, logits = list(out[:-1]), out[-1]
                tok = logits.argmax(-1)
                ref_seq.append(int(tok))
                if int(tok) == END:
                    break
        got = ours[b][: len(ref_seq)].tolist()
        assert got == ref_seq, f"image {b}: {got} != {ref_seq}"


def test_editnet_beam_decode_matches_torch_slow_beam(editnet_pair):
    tmodel, model, params = editnet_pair
    feats, existing, lengths = _data(batch=4, seed=7)
    ctx = model.encode(params, jnp.asarray(feats),
                       jnp.asarray(existing.astype(np.int32)),
                       jnp.asarray(lengths.astype(np.int32)))
    res = beam_search(model, params, ctx, beam_size=5, start_id=START,
                      end_id=END, max_len=12)
    ours = np.asarray(res.tokens)
    for b in range(4):
        ref_seq = beam_search_slow(
            tmodel,
            torch.from_numpy(feats[b: b + 1]),
            torch.from_numpy(existing[b: b + 1]),
            torch.from_numpy(lengths[b: b + 1]),
            beam_size=5, start_id=START, end_id=END, max_len=12,
        )
        got = ours[b][: len(ref_seq)].tolist()
        assert got == ref_seq, f"image {b}: {got} != {ref_seq}"


def test_convert_rejects_missing_and_extra_keys(editnet_pair):
    tmodel, _, _ = editnet_pair
    sd = dict(tmodel.state_dict())
    sd.pop("fc.bias")
    with pytest.raises(KeyError):
        editnet_params_from_state_dict(sd)
    sd2 = dict(tmodel.state_dict())
    sd2["rogue.weight"] = torch.zeros(3)
    with pytest.raises(ValueError, match="unconverted"):
        editnet_params_from_state_dict(sd2)


def test_convert_cli_roundtrip(tmp_path, dcnet_pair):
    """convert CLI: torch training-dict checkpoint -> npz -> load -> use."""
    tmodel, model, params = dcnet_pair
    ckpt = {"epoch": 7, "state_dict": tmodel.state_dict(), "cider": 1.0}
    pth = str(tmp_path / "ck.pth.tar")
    torch.save(ckpt, pth)
    out = str(tmp_path / "params.npz")
    from captionkit.cli import main

    assert main(["convert", "--torch", pth, "--arch", "dcnet",
                 "--out", out]) == 0
    from captionkit.train.checkpoint import load_params_npz

    loaded = load_params_npz(params, out)
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dcnet_beam_decode_matches_torch_slow_beam(dcnet_pair):
    """DCNet: converted-checkpoint batched device beam == reference-style
    torch batch=1 Python-loop beam."""
    tmodel, model, params = dcnet_pair
    _, existing, lengths = _data(batch=4, seed=11)
    ctx = model.encode(params, None,
                       jnp.asarray(existing.astype(np.int32)),
                       jnp.asarray(lengths.astype(np.int32)))
    res = beam_search(model, params, ctx, beam_size=5, start_id=START,
                      end_id=END, max_len=12)
    ours = np.asarray(res.tokens)
    for b in range(4):
        ref_seq = beam_search_slow(
            tmodel, None,
            torch.from_numpy(existing[b: b + 1]),
            torch.from_numpy(lengths[b: b + 1]),
            beam_size=5, start_id=START, end_id=END, max_len=12,
        )
        got = ours[b][: len(ref_seq)].tolist()
        assert got == ref_seq, f"image {b}: {got} != {ref_seq}"


def test_dcnet_visual_variant_converts_and_matches():
    """cfg.dcnet_use_visual: the converter picks up the checkpoint's
    vis_attention module (previously hardcoded to None) and the stepwise
    logits match the visual torch twin."""
    torch.manual_seed(4)
    tmodel = TorchDCNet(V, E, H, A, use_visual=True, feat=F).eval()
    params = dcnet_params_from_state_dict(tmodel.state_dict())
    assert params.vis_attention is not None
    cfg = ModelConfig(arch="dcnet", vocab_size=V, emb_dim=E, hidden_dim=H,
                      att_dim=A, feat_dim=F, num_regions=R, dropout=0.0,
                      compute_dtype="float32", dcnet_use_visual=True)
    model = get_model(cfg)
    feats, existing, lengths = _data(seed=9)
    with torch.no_grad():
        tctx = tmodel.encode(torch.from_numpy(existing),
                             torch.from_numpy(lengths),
                             torch.from_numpy(feats))
        h, c = tmodel.init_state(tctx)
    ctx = model.encode(params, jnp.asarray(feats),
                       jnp.asarray(existing.astype(np.int32)),
                       jnp.asarray(lengths.astype(np.int32)))
    state = model.init_state(params, ctx)
    tok = np.full((3,), START, np.int32)
    for _ in range(5):
        with torch.no_grad():
            h, c, tlogits = tmodel.step(
                tctx, h, c, torch.from_numpy(tok.astype(np.int64)))
        state, logits = model.step(params, ctx, state, jnp.asarray(tok))
        np.testing.assert_allclose(np.asarray(logits), tlogits.numpy(),
                                   atol=2e-4)
        tok = np.argmax(tlogits.numpy(), -1).astype(np.int32)
    # A text-only checkpoint still converts with vis_attention=None.
    torch.manual_seed(5)
    text = TorchDCNet(V, E, H, A).eval()
    p2 = dcnet_params_from_state_dict(text.state_dict())
    assert p2.vis_attention is None
