"""Quality A/B for the round-4 levers: checkpoint ensembling + EMA weights.

Trains M EditNet members on the toy grammar from different init seeds
(EMA tracking on), then scores every deployment variant on the same
eval view:

  * each member's raw and EMA weights (greedy + beam=5),
  * the M-member ensemble of raw weights (logprob and prob modes),
  * the M-member ensemble of EMA weights.

    python examples/ensemble_ema_quality.py [--platform cpu]
        [--members 2] [--steps 150] [--ema-decay 0.98]

The point is the measured verdict, not the feature existing: ensembling
and EMA are classic eval-time CIDEr squeezers (AoANet-family practice) —
this prints whether they pay on this protocol, in the same spirit as the
multi-sample-SCST A/B (docs/DESIGN.md session 8 item 7). Deliberately
undertrained by default (--steps 150 leaves the toy task unsaturated) so
there is headroom for the averaging to show.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", choices=["tpu", "cpu"], default=None)
    ap.add_argument("--members", type=int, default=2)
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--ema-decay", type=float, default=0.98)
    ap.add_argument("--images", type=int, default=96)
    ap.add_argument("--hidden", type=int, default=128)
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from captionkit.data import SyntheticCaptionSource
    from captionkit.decode.driver import evaluate_split
    from captionkit.models import ensemble_model, get_model, stack_params
    from captionkit.train import create_train_state
    from captionkit.train.loop import run_xe_training
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
        "train.ema_decay": args.ema_decay,
        "train.epochs": 10_000,
        "train.log_every": 100,
        "train.donate_state": False,
        "decode.method": "greedy",
        "decode.beam_size": 1,
        "decode.max_decode_len": 14,
        "decode.batch_size": 96,
    })
    model = get_model(cfg.model)
    eval_ds = src.eval_view()
    beam_cfg = cfg.decode.__class__(
        method="beam", beam_size=5, max_decode_len=14, batch_size=96
    )

    raw, ema = [], []
    for m in range(args.members):
        state = create_train_state(model.init, cfg.train, seed=m)
        state, _ = run_xe_training(
            model, state, cfg, src.dataset, None, max_steps=args.steps,
        )
        raw.append(state.params)
        ema.append(ema_params(state))

    def score(mdl, params, label):
        g = evaluate_split(mdl, params, eval_ds, cfg.decode)["CIDEr"]
        b = evaluate_split(mdl, params, eval_ds, beam_cfg)["CIDEr"]
        print(f"{label:34s} greedy {g:.3f}  beam5 {b:.3f}")
        return {"label": label, "greedy": round(g, 3), "beam5": round(b, 3)}

    rows = []
    for m in range(args.members):
        rows.append(score(model, raw[m], f"member {m} raw"))
        rows.append(score(model, ema[m], f"member {m} ema"))
    for mode in ("logprob", "prob"):
        ens = ensemble_model(model, args.members, mode=mode)
        rows.append(score(ens, stack_params(raw),
                          f"ensemble x{args.members} raw ({mode})"))
    ens = ensemble_model(model, args.members, mode="logprob")
    rows.append(score(ens, stack_params(ema),
                      f"ensemble x{args.members} ema (logprob)"))
    print(json.dumps({"steps": args.steps, "members": args.members,
                      "ema_decay": args.ema_decay, "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
