"""Measure the quality side of the int8 serving trades.

Two independent int8 knobs, selected by --knob:
  --knob head  (default): head_quant="int8" (ops/head.py) buys decode
    speed by quantizing the vocab head.
  --knob feed: decode.feed_dtype="int8" (data/featquant.py) buys H2D
    transfer bytes by quantizing the region FEATURES per region on host
    and dequantizing on device.

Either way the protocol is the same: train a model on synthetic data,
beam-decode the eval split with the exact path and with the int8 path
FROM THE SAME PARAMS, and report the caption-change rate plus both
CIDEr scores. Run with --platform cpu anywhere (tiny scale) or on the
chip (add --hidden 1024 etc. for paper-scale churn alongside
bench.py --head-quant int8 / bench_serve.py --feed-dtype int8).

One JSON line at the end, e.g.:
  {"changed_captions_pct": 3.1, "cider_exact": 3.41, "cider_int8": 3.39}
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
    ap.add_argument("--knob", choices=["head", "feed"], default="head",
                    help="which int8 trade to measure: the vocab-head "
                         "kernel (head_quant) or the feature feed "
                         "(decode.feed_dtype)")
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
    if args.knob == "head":
        settings = [("none", {}), ("int8", {})]
        exact_key, quant_key = "none", "int8"
        for quant, _ in settings:
            mcfg = dataclasses.replace(cfg.model, head_quant=quant)
            qmodel = get_model(mcfg)
            # ONE decode per setting: score the captions we already have
            # (evaluate_split would re-decode the identical split).
            hyps, _ = decode_split(qmodel, state.params, eval_ds,
                                   cfg.decode)
            captions[quant] = hyps  # {image_id: caption}
            results[quant] = evaluate_captions(
                {i: refs[i] for i in hyps}, hyps
            )["CIDEr"]
            print(f"head_quant={quant}: CIDEr {results[quant]:.3f}")
    else:
        # Feed knob: same model, three transfer grids. bfloat16 is the
        # intermediate rung (the recommended non-approximate serving
        # setting); int8 is the knob under test.
        exact_key, quant_key = "float32", "int8"
        for feed in ("float32", "bfloat16", "int8"):
            dcfg = dataclasses.replace(cfg.decode, feed_dtype=feed)
            hyps, _ = decode_split(model, state.params, eval_ds, dcfg)
            captions[feed] = hyps
            results[feed] = evaluate_captions(
                {i: refs[i] for i in hyps}, hyps
            )["CIDEr"]
            print(f"feed_dtype={feed}: CIDEr {results[feed]:.3f}")

    keys = sorted(captions[exact_key])
    changed = sum(
        1 for i in keys if captions[exact_key][i] != captions[quant_key][i]
    )
    pct = 100.0 * changed / max(len(keys), 1)
    out = {
        "knob": args.knob,
        "changed_captions_pct": round(pct, 2),
        "cider_exact": round(results[exact_key], 4),
        "cider_int8": round(results[quant_key], 4),
        "images": len(keys),
        "beam": args.beam,
        "train_steps": args.steps,
    }
    if "bfloat16" in captions:
        out["changed_captions_pct_bf16"] = round(
            100.0 * sum(1 for i in keys
                        if captions[exact_key][i] != captions["bfloat16"][i])
            / max(len(keys), 1), 2)
        out["cider_bf16"] = round(results["bfloat16"], 4)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
