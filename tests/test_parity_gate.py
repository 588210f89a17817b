"""One-command parity gate + name-map indirection (VERDICT r1 #5).

The gate is the script that runs the day real released checkpoints
appear: convert -> greedy-identical-vs-twin -> beam CIDEr tolerance.
Here it is rehearsed end-to-end against a torch-twin checkpoint, and the
name-map table is proven to fit an alternate checkpoint layout as a pure
data edit (renamed modules + a global key prefix), no code change.
"""

import json

import jax
import numpy as np
import pytest
import torch

from captionkit.convert.torch_import import (
    editnet_params_from_state_dict,
    resolve_name_map,
)
from captionkit.convert.torch_ref import TorchEditNet

E, H, A, F, R = 12, 16, 8, 10, 4


@pytest.fixture(scope="module")
def synth():
    from captionkit.data.sources import SyntheticCaptionSource

    return SyntheticCaptionSource(
        num_images=6, captions_per_image=2, num_regions=R, feat_dim=F,
        max_len=12, seed=3,
    )


@pytest.fixture(scope="module")
def twin(synth):
    torch.manual_seed(0)
    return TorchEditNet(len(synth.vocab), E, H, A, F).eval()


def _rename(sd, mapping, prefix=""):
    out = {}
    for k, v in sd.items():
        for old, new in mapping.items():
            if k.startswith(old + "."):
                k = new + k[len(old):]
                break
        out[prefix + k] = v
    return out


def test_alternate_name_map_is_a_data_edit(twin):
    sd = twin.state_dict()
    want = editnet_params_from_state_dict(sd)
    # A "real checkpoint" layout: everything under 'decoder.', f_beta
    # renamed, scma renamed, lang_lstm leaf names changed.
    alt = _rename(
        sd,
        {"f_beta": "beta_gate", "scma": "select_att",
         "lang_lstm": "copy_lstm"},
        prefix="decoder.",
    )
    override = {
        "__strip_prefix__": "decoder.",
        "vis_gate": "beta_gate",
        "scma": "select_att",
        "lang_lstm": "copy_lstm",
    }
    got = editnet_params_from_state_dict(alt, override)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_name_map_rejects_unknown_entries():
    with pytest.raises(KeyError, match="unknown entries"):
        resolve_name_map("editnet", {"not_a_component": "x"})


def test_default_map_fails_loudly_on_alternate_layout(twin):
    alt = _rename(twin.state_dict(), {}, prefix="decoder.")
    with pytest.raises(KeyError, match="missing"):
        editnet_params_from_state_dict(alt)


def _gate_cfg(vocab_size):
    import dataclasses

    from captionkit.utils.config import get_named_config

    cfg = get_named_config("editnet_beam5")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, vocab_size=vocab_size, emb_dim=E, hidden_dim=H,
            att_dim=A, feat_dim=F, num_regions=R, dropout=0.0,
            compute_dtype="float32",
        ),
        decode=dataclasses.replace(cfg.decode, max_decode_len=12,
                                   batch_size=8),
    )


def test_parity_gate_end_to_end(tmp_path, synth, twin):
    from captionkit.convert.gate import run_parity_gate

    ckpt = tmp_path / "BEST_checkpoint.pth.tar"
    torch.save({"state_dict": twin.state_dict()}, ckpt)
    cfg = _gate_cfg(len(synth.vocab))
    report = run_parity_gate(
        str(ckpt), cfg, synth.dataset,
        out_params_path=str(tmp_path / "params.npz"),
    )
    assert report["checks"]["convert"]["status"] == "pass"
    assert report["checks"]["greedy_identical"]["status"] == "pass", report
    assert report["checks"]["greedy_identical"]["images"] == 6
    assert report["checks"]["beam_cider"]["status"] == "pass"
    assert np.isfinite(report["checks"]["beam_cider"]["cider"])
    assert report["ok"] is True
    assert (tmp_path / "params.npz").exists()


def test_parity_gate_expected_cider_tolerance(tmp_path, synth, twin):
    from captionkit.convert.gate import run_parity_gate

    ckpt = tmp_path / "ckpt.pth"
    torch.save(twin.state_dict(), ckpt)
    cfg = _gate_cfg(len(synth.vocab))
    base = run_parity_gate(str(ckpt), cfg, synth.dataset)
    cider = base["checks"]["beam_cider"]["cider"]
    ok = run_parity_gate(str(ckpt), cfg, synth.dataset,
                         expected_cider=cider + 0.1, cider_tol=0.2)
    assert ok["ok"] is True
    bad = run_parity_gate(str(ckpt), cfg, synth.dataset,
                          expected_cider=cider + 5.0, cider_tol=0.2)
    assert bad["checks"]["beam_cider"]["status"] == "fail"
    assert bad["ok"] is False


def test_parity_gate_alternate_layout_skips_greedy(tmp_path, synth, twin):
    """A fitted real-checkpoint layout converts via --name-map; the twin
    can't load it, so greedy-identical reports skipped, not fail."""
    from captionkit.convert.gate import run_parity_gate

    alt = _rename(twin.state_dict(), {"f_beta": "beta_gate"},
                  prefix="decoder.")
    ckpt = tmp_path / "alt.pth"
    torch.save(alt, ckpt)
    cfg = _gate_cfg(len(synth.vocab))
    report = run_parity_gate(
        str(ckpt), cfg, synth.dataset,
        name_map={"__strip_prefix__": "decoder.", "vis_gate": "beta_gate"},
    )
    assert report["checks"]["convert"]["status"] == "pass"
    assert report["checks"]["greedy_identical"]["status"] == "skipped"
    assert report["ok"] is True


def test_parity_gate_cli(tmp_path, capsys):
    """The CLI gate must run the greedy-identical check for real, so the
    twin checkpoint is sized for the dataset the CLI itself will build
    (--synthetic --images 6 --seed 0)."""
    from captionkit.cli import main
    from captionkit.data.sources import SyntheticCaptionSource

    cli_src = SyntheticCaptionSource(
        num_images=6, captions_per_image=5, num_regions=R, feat_dim=F,
        max_len=12, seed=0,
    )
    torch.manual_seed(0)
    cli_twin = TorchEditNet(len(cli_src.vocab), E, H, A, F).eval()
    ckpt = tmp_path / "ckpt.pth"
    torch.save(cli_twin.state_dict(), ckpt)
    nm = tmp_path / "names.json"
    nm.write_text(json.dumps({}))
    rc = main([
        "parity-gate", "--config", "editnet_beam5", "--synthetic",
        "--images", "6", "--seed", "0", "--ckpt", str(ckpt),
        "--name-map", str(nm), "--max-images", "4",
        "--set", f"model.emb_dim={E}", "--set", f"model.hidden_dim={H}",
        "--set", f"model.att_dim={A}", "--set", f"model.feat_dim={F}",
        "--set", f"model.num_regions={R}", "--set", "model.dropout=0.0",
        "--set", "model.compute_dtype=float32",
        "--set", "decode.max_decode_len=12", "--set", "decode.batch_size=8",
        "--set", "data.max_len=12",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["checks"]["greedy_identical"]["status"] == "pass", report
    assert report["checks"]["beam_cider"]["status"] == "pass"


def test_parity_gate_fits_hard_scma_checkpoint(tmp_path, synth):
    """SURVEY.md §8.3 #1 rehearsal: a checkpoint whose original code used
    HARD selection carries no trace of that in its weights — twin-vs-model
    greedy (both built from our config) passes either way and cannot catch
    it. The published-captions check can: gate the converted model against
    the ORIGINAL code's greedy strings; the soft default must FAIL, and
    flipping the one config knob (scma_select=hard) must make the same
    checkpoint + captions pass."""
    import dataclasses

    from captionkit.convert.gate import _twin_greedy, run_parity_gate

    torch.manual_seed(3)
    hard_twin = TorchEditNet(len(synth.vocab), E, H, A, F,
                             scma_mode="hard").eval()
    ckpt = tmp_path / "hard_ckpt.pth"
    torch.save(hard_twin.state_dict(), ckpt)

    # "Published captions": what the original (hard-selection) code emits.
    ds = synth.dataset.eval_view()
    vocab = synth.vocab
    seqs = _twin_greedy(
        hard_twin, "editnet",
        np.asarray(ds.features, np.float32), np.asarray(ds.existing),
        np.asarray(ds.existing_len),
        start_id=vocab.start, end_id=vocab.end, max_len=12,
    )
    published = {
        int(ds.image_index[b]): vocab.decode_to_string(seq)
        for b, seq in enumerate(seqs)
    }

    cfg_soft = _gate_cfg(len(synth.vocab))
    assert cfg_soft.model.scma_select == "soft"
    report = run_parity_gate(str(ckpt), cfg_soft, synth.dataset,
                             expected_captions=published)
    # The twin check is blind to the knob (soft model vs soft twin)...
    assert report["checks"]["greedy_identical"]["status"] == "pass"
    # ...but the published captions are not.
    assert report["checks"]["greedy_expected"]["status"] == "fail", (
        "soft decode of a hard-mode checkpoint should diverge from the "
        "hard-mode captions; if this starts passing, the fixture weights "
        "no longer discriminate the modes - reseed them")
    assert report["ok"] is False

    cfg_hard = dataclasses.replace(
        cfg_soft,
        model=dataclasses.replace(cfg_soft.model, scma_select="hard"),
    )
    report = run_parity_gate(str(ckpt), cfg_hard, synth.dataset,
                             expected_captions=published)
    assert report["checks"]["greedy_identical"]["status"] == "pass", report
    assert report["checks"]["greedy_expected"]["status"] == "pass", report
    assert report["checks"]["greedy_expected"]["compared"] == 6
    assert report["ok"] is True


def test_parity_gate_expected_captions_key_by_real_image_ids(
        tmp_path, synth, twin):
    """Published caption files are keyed by ORIGINAL image ids (e.g. COCO
    ids) — prepared datasets carry that map in ds.image_ids and the gate
    must use it, not the dense per-split index (round-3 review: with real
    prepared data the dense keying never matched and the check always
    failed on its primary intended input)."""
    import dataclasses as dc

    from captionkit.convert.gate import _twin_greedy, run_parity_gate

    ckpt = tmp_path / "ckpt.pth"
    torch.save(twin.state_dict(), ckpt)
    cfg = _gate_cfg(len(synth.vocab))

    base = synth.dataset
    n_img = int(np.asarray(base.eval_view().image_index).shape[0])
    coco_ids = np.asarray([100000 + 7 * b for b in range(n_img)], np.int64)
    ds = dc.replace(base, image_ids=coco_ids)

    ev = ds.eval_view()
    vocab = synth.vocab
    seqs = _twin_greedy(
        twin, "editnet",
        np.asarray(ev.features, np.float32), np.asarray(ev.existing),
        np.asarray(ev.existing_len),
        start_id=vocab.start, end_id=vocab.end, max_len=12,
    )
    published = {int(coco_ids[b]): vocab.decode_to_string(seq)
                 for b, seq in enumerate(seqs)}

    report = run_parity_gate(str(ckpt), cfg, ds,
                             expected_captions=published)
    chk = report["checks"]["greedy_expected"]
    assert chk["status"] == "pass", chk
    assert chk["compared"] == n_img

    # Without the id map the same real-id-keyed file matches nothing, and
    # zero comparisons must read as failure, not vacuous success.
    report = run_parity_gate(str(ckpt), cfg, base,
                             expected_captions=published)
    chk = report["checks"]["greedy_expected"]
    assert chk["status"] == "fail"
    assert chk["compared"] == 0


# --------------------------------------------------- fit-names gate sweep


def _scramble_editnet(sd):
    """Destroy every module AND leaf name (the worst-case real layout)."""
    mapping = {
        "vis_attention.encoder_att": "blk3.u0",
        "vis_attention.decoder_att": "blk3.u1",
        "vis_attention.full_att": "blk3.u2",
        "scma.encoder_att": "blk5.u0",
        "scma.decoder_att": "blk5.u1",
        "scma.full_att": "blk5.u2",
        "lang_lstm.base": "blk6.cell",
        "lang_lstm": "blk6",
        "embedding": "blk0", "encoder": "blk1", "att_lstm": "blk2",
        "f_beta": "blk4", "fc": "blk7",
    }
    out = {}
    for k, v in sd.items():
        nk = k
        for old, new in sorted(mapping.items(), key=lambda x: -len(x[0])):
            if nk == old or nk.startswith(old + "."):
                nk = new + nk[len(old):]
                break
        out[nk] = v
    return out


def test_parity_gate_fit_names_sweep_decided_by_published(tmp_path, synth,
                                                          twin):
    """The full run-book: a checkpoint with unknown names is shape-fitted,
    ambiguous assignments are swept, and the published-captions check
    picks the true layout (the twin check alone cannot — it runs the same
    fitted translation on both sides)."""
    from captionkit.convert.gate import _twin_greedy, run_parity_gate

    scrambled = _scramble_editnet(twin.state_dict())
    ckpt = tmp_path / "scrambled.pth"
    torch.save(scrambled, ckpt)
    cfg = _gate_cfg(len(synth.vocab))

    ds = synth.dataset.eval_view()
    vocab = synth.vocab
    seqs = _twin_greedy(
        twin, "editnet",
        np.asarray(ds.features, np.float32), np.asarray(ds.existing),
        np.asarray(ds.existing_len),
        start_id=vocab.start, end_id=vocab.end, max_len=12,
    )
    published = {
        int(np.asarray(ds.image_index[b])): vocab.decode_to_string(seqs[b])
        for b in range(len(seqs))
    }

    report = run_parity_gate(
        str(ckpt), cfg, synth.dataset, fit_names=True,
        expected_captions=published,
    )
    assert report["ok"] is True, report
    assert report["checks"]["greedy_expected"]["status"] == "pass"
    assert report["fit"]["of"] == 4  # scma enc/dec x weight_rh/rc ties
    assert "warning" not in report["fit"]

    # Without external evidence the sweep must WARN that shape-tied
    # alternates are indistinguishable.
    blind = run_parity_gate(str(ckpt), cfg, synth.dataset, fit_names=True)
    assert blind["ok"] is True
    assert "warning" in blind["fit"]


def test_convert_cli_fit_names(tmp_path, capsys, twin, synth):
    from captionkit.cli import main

    scrambled = _scramble_editnet(twin.state_dict())
    ckpt = tmp_path / "scrambled.pth"
    torch.save(scrambled, ckpt)
    out = tmp_path / "params.npz"
    rep = tmp_path / "fit.json"
    rc = main([
        "convert", "--torch", str(ckpt), "--arch", "editnet",
        "--out", str(out), "--fit-names", "--fit-report", str(rep),
        "--set", f"model.vocab_size={len(synth.vocab)}",
        "--set", f"model.emb_dim={E}", "--set", f"model.hidden_dim={H}",
        "--set", f"model.att_dim={A}", "--set", f"model.feat_dim={F}",
        "--set", f"model.num_regions={R}",
    ])
    assert rc == 0
    assert out.exists()
    blob = json.loads(rep.read_text())
    assert len(blob["alternates"]) == 3
    assert blob["unmatched_raw"] == []


def test_parity_gate_fit_names_fails_on_unmatched_tensors(tmp_path, synth,
                                                          twin):
    """Tensors the fit cannot place must FAIL the convert check loudly
    (parity with the name-map path's strict key exhaustion), not be
    silently dropped from the converted params."""
    from captionkit.convert.gate import run_parity_gate

    sd = dict(_scramble_editnet(twin.state_dict()))
    sd["mystery.extra_weight"] = torch.zeros(7, 9)
    ckpt = tmp_path / "extra.pth"
    torch.save(sd, ckpt)
    cfg = _gate_cfg(len(synth.vocab))
    report = run_parity_gate(str(ckpt), cfg, synth.dataset, fit_names=True,
                             out_params_path=str(tmp_path / "p.npz"))
    assert report["ok"] is False
    assert report["checks"]["convert"]["status"] == "fail"
    assert "mystery.extra_weight" in str(report["checks"]["convert"])
    assert not (tmp_path / "p.npz").exists()  # no params for a failed gate
