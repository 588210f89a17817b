"""Shape-driven name-map fitting (convert/fit_names.py).

The run-book for real released checkpoints (SURVEY.md §8.3 #1): unknown
module names are fitted from parameter shapes, conventional-name hints
break shape ties, and genuinely ambiguous assignments come back as ranked
alternates for the parity gate to decide. These tests rehearse that whole
story against the torch twins with deliberately scrambled layouts.
"""

import numpy as np
import pytest
import torch

from captionkit.convert.fit_names import (
    FitError,
    fit_params_from_state_dict,
    fit_translation,
    state_dict_shapes,
    translate_state_dict,
)
from captionkit.convert.torch_import import params_from_state_dict
from captionkit.convert.torch_ref import TorchDCNet, TorchEditNet
from captionkit.models import get_model
from captionkit.utils.config import ModelConfig

V, E, H, A, F, R = 40, 12, 16, 8, 10, 4
START = 2


def _mcfg(arch, emb=E):
    return ModelConfig(arch=arch, vocab_size=V, emb_dim=emb, hidden_dim=H,
                       att_dim=A, feat_dim=F, num_regions=R, dropout=0.0,
                       compute_dtype="float32")


def _rename(sd, module_map):
    """Rename module path segments via longest-prefix match."""
    out = {}
    for k, v in sd.items():
        nk = k
        for old, new in sorted(module_map.items(), key=lambda x: -len(x[0])):
            if nk == old or nk.startswith(old + "."):
                nk = new + nk[len(old):]
                break
        out[nk] = v
    return out


def _editnet_logits_parity(tmodel, params, mcfg, atol=2e-4, steps=5,
                           batch=3):
    import jax.numpy as jnp

    model = get_model(mcfg)
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((batch, R, F)).astype(np.float32)
    existing = rng.integers(4, V, (batch, 6)).astype(np.int64)
    lengths = rng.integers(2, 7, (batch,)).astype(np.int64)
    with torch.no_grad():
        tctx = tmodel.encode(torch.from_numpy(feats),
                             torch.from_numpy(existing),
                             torch.from_numpy(lengths))
        tstate = list(tmodel.init_state(tctx))
    ctx = model.encode(params, jnp.asarray(feats),
                       jnp.asarray(existing.astype(np.int32)),
                       jnp.asarray(lengths.astype(np.int32)))
    state = model.init_state(params, ctx)
    tok = np.full((batch,), START, np.int32)
    for _ in range(steps):
        with torch.no_grad():
            out = tmodel.step(tctx, *tstate,
                              torch.from_numpy(tok.astype(np.int64)))
            tstate, tlogits = list(out[:-1]), out[-1].numpy()
        state, logits = model.step(params, ctx, state, jnp.asarray(tok))
        if not np.allclose(np.asarray(logits), tlogits, atol=atol):
            return False
        tok = np.argmax(tlogits, -1).astype(np.int32)
    return True


def _dcnet_logits_parity(tmodel, params, mcfg, atol=2e-4, steps=5, batch=3):
    import jax.numpy as jnp

    model = get_model(mcfg)
    rng = np.random.default_rng(1)
    existing = rng.integers(4, V, (batch, 6)).astype(np.int64)
    lengths = rng.integers(2, 7, (batch,)).astype(np.int64)
    with torch.no_grad():
        tctx = tmodel.encode(torch.from_numpy(existing),
                             torch.from_numpy(lengths))
        h, c = tmodel.init_state(tctx)
    ctx = model.encode(params, None, jnp.asarray(existing.astype(np.int32)),
                       jnp.asarray(lengths.astype(np.int32)))
    state = model.init_state(params, ctx)
    tok = np.full((batch,), START, np.int32)
    for _ in range(steps):
        with torch.no_grad():
            h, c, tlogits = tmodel.step(
                tctx, h, c, torch.from_numpy(tok.astype(np.int64)))
        state, logits = model.step(params, ctx, state, jnp.asarray(tok))
        if not np.allclose(np.asarray(logits), tlogits.numpy(), atol=atol):
            return False
        tok = np.argmax(tlogits.numpy(), -1).astype(np.int32)
    return True


SCRAMBLE_EDITNET = {
    "embedding": "blk0", "encoder": "blk1", "att_lstm": "blk2",
    "vis_attention": "blk3", "f_beta": "blk4", "scma": "blk5",
    "lang_lstm": "blk6", "fc": "blk7",
}


def test_editnet_scrambled_modules_fits_uniquely_enough():
    """Top-level module names scrambled; torch leaf conventions kept.
    Hints resolve the scma enc/dec and weight_rh/rc shape ties, and the
    best fit reproduces the twin's logits exactly."""
    torch.manual_seed(0)
    tmodel = TorchEditNet(V, E, H, A, F).eval()
    raw = _rename(tmodel.state_dict(), SCRAMBLE_EDITNET)
    mcfg = _mcfg("editnet")
    params, fit = fit_params_from_state_dict(raw, "editnet", mcfg)
    assert _editnet_logits_parity(tmodel, params, mcfg)
    assert fit.unmatched_raw == []
    # the scma enc/dec tie is structural (both [A,H]) — must be recorded
    assert any("scma" in n and "tied" in n for n in fit.notes), fit.notes


def test_editnet_fully_scrambled_alternates_cover_truth():
    """Every name destroyed (modules AND leaves) — shape ties can then
    only be enumerated. The correct assignment must be among the ranked
    candidates; the parity gate is the designed decider."""
    torch.manual_seed(0)
    tmodel = TorchEditNet(V, E, H, A, F).eval()
    sd = tmodel.state_dict()
    leaf_junk = {
        "vis_attention.encoder_att": "blk3.u0",
        "vis_attention.decoder_att": "blk3.u1",
        "vis_attention.full_att": "blk3.u2",
        "scma.encoder_att": "blk5.u0",
        "scma.decoder_att": "blk5.u1",
        "scma.full_att": "blk5.u2",
        "lang_lstm.weight_rx": "blk6.p0",
        "lang_lstm.weight_rh": "blk6.p1",
        "lang_lstm.weight_rc": "blk6.p2",
        "lang_lstm.bias_r": "blk6.p3",
        "lang_lstm.base": "blk6.cell",
        **SCRAMBLE_EDITNET,
    }
    raw = _rename(sd, leaf_junk)
    mcfg = _mcfg("editnet")
    fit = fit_translation(state_dict_shapes(raw), "editnet", mcfg)
    # scma enc/dec x rh/rc = 4 consistent assignments (other components
    # are shape-unique at these dims)
    assert len(fit.candidates) == 4, fit.notes
    hits = []
    for trans in fit.candidates:
        params = params_from_state_dict(
            translate_state_dict(raw, trans), "editnet")
        hits.append(_editnet_logits_parity(tmodel, params, mcfg))
    assert sum(hits) == 1, hits  # exactly one candidate is the real layout


def test_editnet_emb_eq_hidden_ih_hh_tie_resolved_by_hints():
    """E == H makes encoder weight_ih/weight_hh shape-identical; the
    conventional leaf names must break the tie."""
    torch.manual_seed(2)
    tmodel = TorchEditNet(V, H, H, A, F).eval()  # emb = hidden
    raw = _rename(tmodel.state_dict(), SCRAMBLE_EDITNET)
    mcfg = _mcfg("editnet", emb=H)
    params, fit = fit_params_from_state_dict(raw, "editnet", mcfg)
    assert _editnet_logits_parity(tmodel, params, mcfg)
    assert any("weight_ih" in n and "tied" in n for n in fit.notes)


def test_dcnet_fully_scrambled_alternates_cover_truth():
    """DCNet's f_beta/init_h/init_c are all [H,H]+[H]: a 3-way component
    tie (6 permutations) on top of the attention enc/dec tie. With all
    names destroyed, the truth must be among the candidates."""
    torch.manual_seed(1)
    tmodel = TorchDCNet(V, E, H, A).eval()
    junk = {
        "embedding": "m0", "encoder": "m1",
        "attention.encoder_att": "m2.u0", "attention.decoder_att": "m2.u1",
        "attention.full_att": "m2.u2", "attention": "m2",
        "f_beta": "m3", "decode_step": "m4", "init_h": "m5",
        "init_c": "m6", "fc": "m7",
    }
    raw = _rename(tmodel.state_dict(), junk)
    mcfg = _mcfg("dcnet")
    fit = fit_translation(state_dict_shapes(raw), "dcnet", mcfg)
    assert len(fit.candidates) == 12, fit.notes  # 6 linear perms x 2 att
    hits = []
    for trans in fit.candidates:
        params = params_from_state_dict(
            translate_state_dict(raw, trans), "dcnet")
        hits.append(_dcnet_logits_parity(tmodel, params, mcfg))
    assert sum(hits) == 1, hits
    assert any("f_beta" in n and "tied" in n for n in fit.notes)


def test_dcnet_hints_pick_the_right_linears():
    """With conventional names present, the best fit is the true layout
    even for the 3-way linear tie."""
    torch.manual_seed(1)
    tmodel = TorchDCNet(V, E, H, A).eval()
    raw = _rename(tmodel.state_dict(),
                  {"embedding": "word_emb", "encoder": "cap_encoder",
                   "decode_step": "decoder_cell", "fc": "logits_out"})
    mcfg = _mcfg("dcnet")
    params, fit = fit_params_from_state_dict(raw, "dcnet", mcfg)
    assert _dcnet_logits_parity(tmodel, params, mcfg)


def test_nn_lstm_leaf_convention_fits():
    """nn.LSTM-style weight_ih_l0 leaves still fit (substring hints)."""
    torch.manual_seed(3)
    tmodel = TorchEditNet(V, H, H, A, F).eval()  # E==H forces the tie
    sd = tmodel.state_dict()
    raw = {}
    for k, v in sd.items():
        if k.startswith("encoder."):
            raw[k.replace("encoder.", "rnn.") + "_l0"] = v
        else:
            raw[k] = v
    mcfg = _mcfg("editnet", emb=H)
    params, fit = fit_params_from_state_dict(raw, "editnet", mcfg)
    assert _editnet_logits_parity(tmodel, params, mcfg)


def test_extra_keys_ignored_and_reported():
    """Optimizer-ish float keys outside any component are not consumed and
    are reported, not fatal."""
    torch.manual_seed(4)
    tmodel = TorchDCNet(V, E, H, A).eval()
    raw = dict(tmodel.state_dict())
    raw["opt.step_buf"] = torch.zeros(7, 3)
    mcfg = _mcfg("dcnet")
    fit = fit_translation(state_dict_shapes(raw), "dcnet", mcfg)
    assert "opt.step_buf" in fit.unmatched_raw


def test_wrong_dims_raise_fit_error():
    torch.manual_seed(5)
    tmodel = TorchDCNet(V, E, H, A).eval()
    bad = ModelConfig(arch="dcnet", vocab_size=V + 5, emb_dim=E,
                      hidden_dim=H, att_dim=A, feat_dim=F, num_regions=R,
                      dropout=0.0, compute_dtype="float32")
    with pytest.raises(FitError):
        fit_translation(state_dict_shapes(tmodel.state_dict()),
                        "dcnet", bad)


def test_infer_dims_editnet_distinct():
    from captionkit.convert.fit_names import infer_dims

    torch.manual_seed(6)
    tmodel = TorchEditNet(V, E, H, A, F).eval()
    dims = infer_dims(state_dict_shapes(tmodel.state_dict()), "editnet")
    assert dims == dict(vocab_size=V, emb_dim=E, hidden_dim=H, att_dim=A,
                        feat_dim=F)


def test_infer_dims_editnet_emb_eq_hidden():
    """Paper scale has E == H: the embedding and fc are both [V, H] and E
    falls back to H correctly."""
    from captionkit.convert.fit_names import infer_dims

    torch.manual_seed(6)
    tmodel = TorchEditNet(V, H, H, A, F).eval()
    dims = infer_dims(state_dict_shapes(tmodel.state_dict()), "editnet")
    assert dims == dict(vocab_size=V, emb_dim=H, hidden_dim=H, att_dim=A,
                        feat_dim=F)


def test_infer_dims_dcnet():
    from captionkit.convert.fit_names import infer_dims

    torch.manual_seed(6)
    tmodel = TorchDCNet(V, E, H, A).eval()
    dims = infer_dims(state_dict_shapes(tmodel.state_dict()), "dcnet")
    assert dims == dict(vocab_size=V, emb_dim=E, hidden_dim=H, att_dim=A)


def test_zero_config_fit_end_to_end():
    """Fit + convert with NOTHING but the checkpoint: dims inferred, names
    fitted, logits identical."""
    from captionkit.convert.fit_names import infer_dims

    torch.manual_seed(8)
    tmodel = TorchEditNet(V, E, H, A, F).eval()
    raw = _rename(tmodel.state_dict(), SCRAMBLE_EDITNET)
    dims = infer_dims(state_dict_shapes(raw), "editnet")
    mcfg = ModelConfig(arch="editnet", num_regions=R, dropout=0.0,
                       compute_dtype="float32", **dims)
    params, fit = fit_params_from_state_dict(raw, "editnet", mcfg)
    assert _editnet_logits_parity(tmodel, params, mcfg)


def test_fit_names_randomized_layout_fuzz():
    """Random dims x random module renames: the fit must recover a layout
    whose converted params reproduce the twin's step logits. Dims are
    drawn so some draws hit the E==H and F==H tie regimes."""
    import random

    import jax.numpy as jnp

    rng = random.Random(42)
    for trial in range(6):
        e = rng.choice([8, 12, 16])
        hdim = rng.choice([8, 16])
        a = rng.choice([4, 8])
        f = rng.choice([hdim, 10, 20])  # sometimes F == H (vis/scma tie)
        v = rng.randint(30, 60)
        torch.manual_seed(100 + trial)
        tmodel = TorchEditNet(v, e, hdim, a, f).eval()
        names = {m: f"sub{rng.randint(0, 9)}_{i}" for i, m in
                 enumerate(SCRAMBLE_EDITNET)}
        raw = _rename(tmodel.state_dict(), names)
        mcfg = ModelConfig(arch="editnet", vocab_size=v, emb_dim=e,
                           hidden_dim=hdim, att_dim=a, feat_dim=f,
                           num_regions=3, dropout=0.0,
                           compute_dtype="float32")
        fit = fit_translation(state_dict_shapes(raw), "editnet", mcfg)
        model = get_model(mcfg)
        drng = np.random.default_rng(trial)
        feats = drng.standard_normal((2, 3, f)).astype(np.float32)
        existing = drng.integers(4, v, (2, 5)).astype(np.int64)
        lengths = np.asarray([3, 5], np.int64)
        with torch.no_grad():
            tctx = tmodel.encode(torch.from_numpy(feats),
                                 torch.from_numpy(existing),
                                 torch.from_numpy(lengths))
            tstate = list(tmodel.init_state(tctx))
            out = tmodel.step(tctx, *tstate,
                              torch.zeros(2, dtype=torch.long) + START)
            tlogits = out[-1].numpy()

        def logits_for(trans):
            params = params_from_state_dict(
                translate_state_dict(raw, trans), "editnet")
            ctx = model.encode(params, jnp.asarray(feats),
                               jnp.asarray(existing.astype(np.int32)),
                               jnp.asarray(lengths.astype(np.int32)))
            state = model.init_state(params, ctx)
            _, logits = model.step(params, ctx, state,
                                   jnp.full((2,), START, jnp.int32))
            return np.asarray(logits)

        # leaf conventions were kept, so hints must put the truth FIRST
        assert np.allclose(logits_for(fit.translation), tlogits,
                           atol=2e-4), (trial, e, hdim, a, f, fit.notes)


def test_dcnet_visual_variant_fits():
    """The fitter handles the visual DCNet: an extra [A,F] attention
    component and the widened decoder input."""
    torch.manual_seed(9)
    tmodel = TorchDCNet(V, E, H, A, use_visual=True, feat=F).eval()
    raw = _rename(tmodel.state_dict(),
                  {"embedding": "w0", "encoder": "w1", "attention": "w2",
                   "f_beta": "w3", "decode_step": "w4", "init_h": "w5",
                   "init_c": "w6", "fc": "w7", "vis_attention": "w8"})
    mcfg = ModelConfig(arch="dcnet", vocab_size=V, emb_dim=E, hidden_dim=H,
                       att_dim=A, feat_dim=F, num_regions=R, dropout=0.0,
                       compute_dtype="float32", dcnet_use_visual=True)
    fit = fit_translation(state_dict_shapes(raw), "dcnet", mcfg)
    assert any(k.startswith("vis_attention.") for k in fit.translation)
    assert fit.unmatched_raw == []


def test_infer_dims_detects_visual_dcnet():
    from captionkit.convert.fit_names import infer_dims

    torch.manual_seed(9)
    tmodel = TorchDCNet(V, E, H, A, use_visual=True, feat=F).eval()
    dims = infer_dims(state_dict_shapes(tmodel.state_dict()), "dcnet")
    assert dims["dcnet_use_visual"] is True and dims["feat_dim"] == F
    text = TorchDCNet(V, E, H, A).eval()
    dims2 = infer_dims(state_dict_shapes(text.state_dict()), "dcnet")
    assert "dcnet_use_visual" not in dims2
