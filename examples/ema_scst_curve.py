"""EMA's win-condition test: a long NOISY run with an EMA-vs-raw curve.

Round-4 verdict weak #4: EMA shipped with zero positive measurement —
both short-horizon XE A/Bs read neutral-to-negative, while the config
guidance claims its home turf is "long noisy training". This script runs
that home turf instead of asserting it:

  * XE warm-start on the 600-image toy grammar (the session-8 SCST
    protocol scale),
  * then a LONG SCST phase (default 2,500 steps) — REINFORCE on a small
    set is the noisiest trajectory in the repo,
  * train.ema_decay chosen so the averaging window 1/(1-d) (default
    d=0.995 → 200 steps) is ≪ the horizon,
  * at every eval point, greedy CIDEr for BOTH the raw weights and the
    EMA weights (same states, same eval view), plus a final beam=5 pair.

    python examples/ema_scst_curve.py [--platform cpu] [--images 600]
        [--xe-steps 200] [--scst-steps 2500] [--eval-every 250]
        [--ema-decay 0.995] [--scst-lr 2e-4]

Whatever it prints is the verdict docs/DESIGN.md records: a win keeps
EMA with measured guidance; a loss/neutral demotes the config docstring
to "measured no benefit on this protocol".
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", choices=["tpu", "cpu"], default=None)
    ap.add_argument("--images", type=int, default=600)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--xe-steps", type=int, default=200)
    ap.add_argument("--scst-steps", type=int, default=2500)
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--ema-decay", type=float, default=0.995)
    ap.add_argument("--scst-lr", type=float, default=2e-4)
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from captionkit.data import SyntheticCaptionSource
    from captionkit.decode.driver import evaluate_split
    from captionkit.models import get_model
    from captionkit.train import create_train_state
    from captionkit.train.loop import run_scst_training, run_xe_training
    from captionkit.train.state import ema_params
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
        "train.ema_decay": args.ema_decay,
        "train.epochs": 10_000,
        "train.scst_epochs": 10_000,
        "train.log_every": 250,
        "train.donate_state": False,
        "decode.method": "greedy",
        "decode.beam_size": 1,
        "decode.max_decode_len": 14,
        "decode.batch_size": 120,
    })
    model = get_model(cfg.model)
    state = create_train_state(model.init, cfg.train)
    eval_ds = src.eval_view()

    state, _ = run_xe_training(
        model, state, cfg, src.dataset, None, max_steps=args.xe_steps,
    )
    start = evaluate_split(model, state.params, eval_ds,
                           cfg.decode)["CIDEr"]
    print(f"XE warm-start greedy CIDEr: {start:.3f} "
          f"(ema window {1.0 / (1.0 - args.ema_decay):.0f} steps, "
          f"horizon {args.scst_steps})")

    curve = []
    done = 0
    train_wall = 0.0
    while done < args.scst_steps:
        k = min(args.eval_every, args.scst_steps - done)
        t0 = time.perf_counter()
        state, _ = run_scst_training(
            model, state, cfg, src.dataset, None, max_steps=k,
        )
        train_wall += time.perf_counter() - t0
        done += k
        raw_c = evaluate_split(model, state.params, eval_ds,
                               cfg.decode)["CIDEr"]
        ema_c = evaluate_split(model, ema_params(state), eval_ds,
                               cfg.decode)["CIDEr"]
        curve.append({"step": done, "raw": round(raw_c, 3),
                      "ema": round(ema_c, 3),
                      "train_wall_s": round(train_wall, 1)})
        print(f"SCST step {done:5d}: raw {raw_c:.3f}  ema {ema_c:.3f}  "
              f"(train wall {train_wall:.1f}s)")

    beam_cfg = cfg.decode.__class__(
        method="beam", beam_size=5, max_decode_len=14, batch_size=120
    )
    raw_b = evaluate_split(model, state.params, eval_ds,
                           beam_cfg)["CIDEr"]
    ema_b = evaluate_split(model, ema_params(state), eval_ds,
                           beam_cfg)["CIDEr"]
    print(f"final beam=5: raw {raw_b:.3f}  ema {ema_b:.3f}")

    import numpy as np

    deltas = [p["ema"] - p["raw"] for p in curve]
    print(json.dumps({
        "protocol": {
            "images": args.images, "xe_steps": args.xe_steps,
            "scst_steps": args.scst_steps, "ema_decay": args.ema_decay,
            "scst_lr": args.scst_lr, "eval_every": args.eval_every,
        },
        "xe_start": round(start, 3),
        "curve": curve,
        "final_beam5": {"raw": round(raw_b, 3), "ema": round(ema_b, 3)},
        "ema_minus_raw_median": round(float(np.median(deltas)), 3),
        "ema_minus_raw_range": [round(min(deltas), 3),
                                round(max(deltas), 3)],
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
