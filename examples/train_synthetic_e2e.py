"""End-to-end quality proof on synthetic data.

Trains EditNet with XE on the toy-grammar dataset until val CIDEr climbs,
then runs SCST fine-tuning, and prints the CIDEr trajectory:

    python examples/train_synthetic_e2e.py [--platform cpu] [--steps 300]

This is the framework's integration demo (the reference's only correctness
signal was exactly this loop on COCO — SURVEY.md §5). Expected outcome:
untrained CIDEr ~0 -> XE CIDEr >> 0 on the toy grammar -> SCST holds or
improves it.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", choices=["tpu", "cpu"], default=None)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--scst-steps", type=int, default=60)
    ap.add_argument("--scst-eval-every", type=int, default=0,
                    help="evaluate CIDEr every N SCST steps (curve mode)")
    ap.add_argument("--scst-lr", type=float, default=2e-4)
    ap.add_argument("--scst-samples", type=int, default=1,
                    help=">1 switches SCST to the multi-sample "
                         "leave-one-out baseline (train.scst_num_samples)")
    ap.add_argument("--images", type=int, default=96)
    ap.add_argument("--hidden", type=int, default=128)
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from captionkit.data import SyntheticCaptionSource
    from captionkit.decode.driver import evaluate_split
    from captionkit.models import get_model
    from captionkit.train import create_train_state
    from captionkit.train.loop import run_scst_training, run_xe_training
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
        "train.scst_learning_rate": args.scst_lr,
        "train.scst_num_samples": args.scst_samples,
        "train.epochs": 10_000,  # bounded by max_steps
        "train.scst_epochs": 10_000,
        "train.log_every": 50,
        "train.donate_state": False,
        "decode.method": "greedy",
        "decode.beam_size": 1,
        "decode.max_decode_len": 14,
        "decode.batch_size": 96,
    })
    model = get_model(cfg.model)
    state = create_train_state(model.init, cfg.train)
    eval_ds = src.eval_view()

    before = evaluate_split(model, state.params, eval_ds, cfg.decode)
    print("CIDEr before training:", round(before["CIDEr"], 3))

    state, report = run_xe_training(
        model, state, cfg, src.dataset, None, max_steps=args.steps,
    )
    after_xe = evaluate_split(model, state.params, eval_ds, cfg.decode)
    print("CIDEr after XE:", round(after_xe["CIDEr"], 3))

    beam_cfg = cfg.decode.__class__(
        method="beam", beam_size=5, max_decode_len=14, batch_size=96
    )
    beam_xe = evaluate_split(model, state.params, eval_ds, beam_cfg)
    print("CIDEr after XE (beam=5):", round(beam_xe["CIDEr"], 3))

    scst_curve = []
    if args.scst_eval_every:
        # VERDICT r1 #8: a CIDEr trajectory across SCST, not just
        # before/after. Chunked fine-tuning with an eval between chunks.
        # Curve points carry cumulative TRAINING wall-clock (eval time
        # excluded) so runs with different per-step cost — n=1 vs n=4
        # multi-sample — compare at matched wall-clock, not step count.
        import time as _time

        done = 0
        train_wall = 0.0
        while done < args.scst_steps:
            k = min(args.scst_eval_every, args.scst_steps - done)
            t0 = _time.perf_counter()
            state, _ = run_scst_training(
                model, state, cfg, src.dataset, None, max_steps=k,
            )
            train_wall += _time.perf_counter() - t0
            done += k
            m = evaluate_split(model, state.params, eval_ds, cfg.decode)
            scst_curve.append({"step": done, "cider": round(m["CIDEr"], 3),
                               "train_wall_s": round(train_wall, 1)})
            print(f"SCST step {done}: greedy CIDEr {m['CIDEr']:.3f} "
                  f"(train wall {train_wall:.1f}s)")
        after_scst = m
    else:
        state, scst_report = run_scst_training(
            model, state, cfg, src.dataset, None, max_steps=args.scst_steps,
        )
        after_scst = evaluate_split(model, state.params, eval_ds, cfg.decode)
    print("CIDEr after SCST:", round(after_scst["CIDEr"], 3))

    # Stacked editing: train a DCNet too, chain DCNet -> EditNet
    # (SURVEY.md §1: the editors are combinable by running one after the
    # other) and score the stacked output.
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from captionkit.decode.stacked import make_stacked_decode_fn
    from captionkit.metrics.eval import CaptionEvaluator

    dcfg_model = dataclasses.replace(cfg.model, arch="dcnet")
    dcnet = get_model(dcfg_model)
    dstate = create_train_state(dcnet.init, cfg.train)
    dcnet_cfg = cfg.replace(model=dcfg_model)
    dstate, _ = run_xe_training(
        dcnet, dstate, dcnet_cfg, src.dataset, None, max_steps=args.steps,
    )
    fn = make_stacked_decode_fn(
        dcnet, model,
        first_stage=dataclasses.replace(cfg.decode, method="greedy"),
        second_stage=dataclasses.replace(cfg.decode, method="beam",
                                         beam_size=5),
        start_id=src.vocab.start, end_id=src.vocab.end,
        pad_id=src.vocab.pad,
    )
    hyps = {}
    for batch in eval_ds.batches(cfg.decode.batch_size):
        toks = np.asarray(jax.device_get(fn(
            dstate.params, state.params, jnp.asarray(batch.features),
            jnp.asarray(batch.existing), jnp.asarray(batch.existing_len),
        )))
        for row, valid, img in zip(toks, batch.valid, batch.image_id):
            if valid:
                hyps[int(img)] = src.vocab.decode_to_string(row)
    refs = {i: [" ".join(t) for t in eval_ds.references[i]] for i in hyps}
    stacked = CaptionEvaluator().evaluate(refs, hyps)
    print("CIDEr stacked DCNet->EditNet (beam=5):",
          round(stacked["CIDEr"], 3))

    summary = {
        "cider_before": before["CIDEr"],
        "cider_after_xe": after_xe["CIDEr"],
        "cider_after_xe_beam5": beam_xe["CIDEr"],
        "cider_after_scst": after_scst["CIDEr"],
        "cider_stacked_beam5": stacked["CIDEr"],
        "xe_steps": args.steps,
        "scst_steps": args.scst_steps,
        "scst_curve": scst_curve,
    }
    print(json.dumps(summary))
    ok = after_xe["CIDEr"] > before["CIDEr"] + 0.1
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
