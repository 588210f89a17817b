"""Offline data-prep round trip: Karpathy JSON + features + AoANet captions
-> artifacts -> CaptionDataset -> decode-ready batches."""

import json

import numpy as np
import pytest

from captionkit.data.prepare import load_prepared_split, prepare_from_karpathy


def _karpathy_fixture(tmp_path, n_train=4, n_val=2):
    rng = np.random.default_rng(0)
    images = []
    existing = {"train": [], "val": []}
    img_id = 100
    sents = [
        "a man rides a horse", "a dog runs in the park",
        "two people sit on a bench", "a cat sleeps on the couch",
        "a bird flies over the water", "a child eats a slice of pizza",
    ]
    for split, n in (("train", n_train), ("restval", 1), ("val", n_val)):
        for _ in range(n):
            caps = [sents[rng.integers(len(sents))].split() for _ in range(3)]
            images.append({
                "split": split,
                "cocoid": img_id,
                "filename": f"{img_id}.jpg",
                "sentences": [{"tokens": c} for c in caps],
            })
            key = "train" if split in ("train", "restval") else "val"
            existing[key].append(
                {"image_id": img_id, "caption": " ".join(caps[0][:-1])}
            )
            img_id += 1
    kpath = str(tmp_path / "karpathy.json")
    with open(kpath, "w") as f:
        json.dump({"images": images, "dataset": "coco"}, f)
    epaths = {}
    for split, rows in existing.items():
        p = str(tmp_path / f"aoanet_{split}.json")
        with open(p, "w") as f:
            json.dump(rows, f)
        epaths[split] = p
    feats = {}
    for split, n in (("train", n_train + 1), ("val", n_val)):
        arr = rng.standard_normal((n, 4, 8)).astype(np.float32)
        p = str(tmp_path / f"feats_{split}.npy")
        np.save(p, arr)
        feats[split] = p
    return kpath, epaths, feats


def test_prepare_and_load_roundtrip(tmp_path):
    kpath, epaths, feats = _karpathy_fixture(tmp_path)
    out = prepare_from_karpathy(
        karpathy_json=kpath,
        output_dir=str(tmp_path / "prep"),
        existing_captions=epaths,
        features=feats,
        min_word_freq=1,
        max_len=12,
        captions_per_image=2,
    )
    assert set(out) == {"train", "val"}
    # restval folds into train: 5 train images x 2 captions = 10 rows.
    with open(out["train"].captions_path) as f:
        rows = json.load(f)
    assert len(rows) == 10
    ds = load_prepared_split(str(tmp_path / "prep"), "train")
    assert ds.size == 10
    assert ds.features.shape == (5, 4, 8)
    assert ds.references is not None and len(ds.references) == 5
    # image_index maps caption rows to feature rows (image-major, 2 per).
    np.testing.assert_array_equal(
        ds.image_index, np.repeat(np.arange(5), 2)
    )
    # The original cocoids survive prepare->load (fixture assigns 100..):
    # results JSONs and the parity gate key external artifacts by these.
    np.testing.assert_array_equal(ds.image_ids, np.arange(100, 105))
    assert ds.eval_view().image_ids is ds.image_ids
    b = next(ds.batches(4))
    assert b.features.shape == (4, 4, 8)
    assert b.target is not None
    # Decode an encoded existing caption back to words: must be the AoANet
    # caption with <unk> for sub-threshold words.
    words = ds.vocab.decode(ds.existing[0])
    assert len(words) >= 2


def test_prepare_missing_existing_caption_is_loud(tmp_path):
    kpath, epaths, feats = _karpathy_fixture(tmp_path)
    with open(epaths["val"]) as f:
        rows = json.load(f)
    with open(epaths["val"], "w") as f:
        json.dump(rows[:-1], f)  # drop one image's existing caption
    with pytest.raises(KeyError, match="no existing"):
        prepare_from_karpathy(
            karpathy_json=kpath,
            output_dir=str(tmp_path / "prep2"),
            existing_captions=epaths,
            min_word_freq=1, max_len=12, captions_per_image=2,
        )


def test_prepare_feature_count_mismatch_is_loud(tmp_path):
    kpath, epaths, feats = _karpathy_fixture(tmp_path)
    np.save(feats["val"], np.zeros((1, 4, 8), np.float32))
    with pytest.raises(ValueError, match="expected"):
        prepare_from_karpathy(
            karpathy_json=kpath,
            output_dir=str(tmp_path / "prep3"),
            existing_captions=epaths,
            features=feats,
            min_word_freq=1, max_len=12, captions_per_image=2,
        )


def test_prepare_wordmap_from_train_only(tmp_path):
    kpath, epaths, feats = _karpathy_fixture(tmp_path)
    prepare_from_karpathy(
        karpathy_json=kpath,
        output_dir=str(tmp_path / "prep4"),
        existing_captions=epaths,
        min_word_freq=1, max_len=12, captions_per_image=2, seed=1,
    )
    with open(str(tmp_path / "prep4" / "PREP_MANIFEST.json")) as f:
        manifest = json.load(f)
    assert manifest["vocab_size"] > 4
    from captionkit.data.vocab import Vocab

    v = Vocab.load(manifest["wordmap"])
    assert v.pad == 0


def test_prepare_cli_end_to_end(tmp_path, capsys):
    """L1 prep through the CLI, then decode straight off the artifacts —
    the two commands a reference user runs first."""
    from captionkit.cli import main

    kpath, epaths, feats = _karpathy_fixture(tmp_path)
    prep = str(tmp_path / "prep_cli")
    rc = main([
        "prepare", "--karpathy", kpath, "--out", prep,
        "--existing", f"train={epaths['train']}",
        "--existing", f"val={epaths['val']}",
        "--features", f"train={feats['train']}",
        "--features", f"val={feats['val']}",
        "--min-word-freq", "1", "--max-len", "12",
        "--captions-per-image", "2",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert set(out) == {"train", "val"}
    assert out["val"]["captions_path"]

    rc = main([
        "decode", "--config", "editnet_greedy", "--prepared", prep,
        "--split", "val",
        "--set", "model.emb_dim=12", "--set", "model.hidden_dim=16",
        "--set", "model.att_dim=8", "--set", "model.feat_dim=8",
        "--set", "model.num_regions=4", "--set", "model.dropout=0.0",
        "--set", "decode.max_decode_len=12", "--set", "decode.batch_size=4",
        "--set", "data.max_len=12",
    ])
    assert rc == 0
    metrics = json.loads(capsys.readouterr().out)
    assert "CIDEr" in metrics and metrics["captions"] == 2
