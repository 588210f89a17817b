"""Measure the quality side of the int8-head serving trade.

head_quant="int8" (ops/head.py) buys decode speed by quantizing the vocab
head; this script puts a number on what it costs: train a model on
synthetic data, beam-decode the eval split with the float head and with
the int8 head FROM THE SAME PARAMS, and report the caption-change rate
plus both CIDEr scores. Run with --platform cpu anywhere (tiny scale) or
on the chip (add --hidden 1024 etc. for paper-scale timing alongside
bench.py --head-quant int8).

One JSON line at the end, e.g.:
  {"changed_captions_pct": 3.1, "cider_float": 3.41, "cider_int8": 3.39}
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", choices=["tpu", "cpu"], default=None)
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--images", type=int, default=96)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--beam", type=int, default=5)
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from captionkit.data import SyntheticCaptionSource
    from captionkit.decode.driver import decode_split
    from captionkit.models import get_model
    from captionkit.train import create_train_state
    from captionkit.train.loop import run_xe_training
    from captionkit.utils.config import CaptionKitConfig

    src = SyntheticCaptionSource(
        num_images=args.images, captions_per_image=3, num_regions=8,
        feat_dim=64, max_len=14, seed=0,
    )
    cfg = CaptionKitConfig().override({
        "model.arch": "editnet",
        "model.vocab_size": len(src.vocab),
        "model.emb_dim": args.hidden,
        "model.hidden_dim": args.hidden,
        "model.att_dim": args.hidden // 2,
        "model.feat_dim": 64,
        "model.num_regions": 8,
        "model.dropout": 0.0,
        "data.batch_size": 48,
        "data.max_len": 14,
        "train.learning_rate": 3e-3,
        "train.epochs": 10_000,
        "train.log_every": 100,
        "train.donate_state": False,
        "decode.method": "beam",
        "decode.beam_size": args.beam,
        "decode.max_decode_len": 14,
        "decode.batch_size": 96,
    })
    model = get_model(cfg.model)
    state = create_train_state(model.init, cfg.train)
    state, _ = run_xe_training(
        model, state, cfg, src.dataset, None, max_steps=args.steps,
    )
    eval_ds = src.eval_view()

    from captionkit.metrics import evaluate_captions

    # References keyed the way decode_split keys its hypotheses (real
    # image ids when the split carries them, dense index otherwise).
    refs = {}
    for row, dense in enumerate(np.asarray(eval_ds.image_index)):
        img = (int(eval_ds.image_ids[int(dense)])
               if eval_ds.image_ids is not None else int(dense))
        refs[img] = [" ".join(r) for r in eval_ds.references[int(dense)]]

    results = {}
    captions: dict[str, dict] = {}
    for quant in ("none", "int8"):
        mcfg = dataclasses.replace(cfg.model, head_quant=quant)
        qmodel = get_model(mcfg)
        # ONE decode per setting: score the captions we already have
        # (evaluate_split would re-decode the identical split).
        hyps, _ = decode_split(qmodel, state.params, eval_ds, cfg.decode)
        captions[quant] = hyps  # {image_id: caption}
        results[quant] = evaluate_captions(
            {i: refs[i] for i in hyps}, hyps
        )["CIDEr"]
        print(f"head_quant={quant}: CIDEr {results[quant]:.3f}")

    keys = sorted(captions["none"])
    changed = sum(
        1 for i in keys if captions["none"][i] != captions["int8"][i]
    )
    pct = 100.0 * changed / max(len(keys), 1)
    print(json.dumps({
        "changed_captions_pct": round(pct, 2),
        "cider_float": round(results["none"], 4),
        "cider_int8": round(results["int8"], 4),
        "images": len(keys),
        "beam": args.beam,
        "train_steps": args.steps,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
