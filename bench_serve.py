"""Serving latency/throughput bench: drive the in-process CaptionServer
across request-batch sizes and report per-load latency percentiles.

    python bench_serve.py [--batch 256] [--ladder 1,16,64] [--loads 1,3,16,64,256]
        [--rounds 30] [--arch editnet] [--paper]

For each load b (requests per flush) it times `run_batch` end-to-end —
tokenize, pad to the smallest ladder rung, compiled beam decode,
detokenize — and prints one JSON line per load with p50/p95 latency and
captions/sec, plus a summary line. The ladder is the lever being
measured: without it every load pays the full-batch program.

Works on CPU (functional check) and the chip (the real numbers).
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
    ap.add_argument("--arch", choices=["editnet", "dcnet"],
                    default="editnet")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--ladder", default="1,8",
                    help="comma-separated rungs below --batch ('' = none)")
    ap.add_argument("--loads", default="1,3,8,32,64")
    ap.add_argument("--rounds", type=int, default=20)
    ap.add_argument("--paper", action="store_true",
                    help="paper-scale model (vocab 9490, hidden 1024, "
                         "36x2048 features)")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from captionkit.data import SyntheticCaptionSource
    from captionkit.models import get_model
    from captionkit.serve import CaptionServer
    from captionkit.utils.config import CaptionKitConfig

    dims = (dict(emb_dim=1024, hidden_dim=1024, att_dim=512,
                 feat_dim=2048, num_regions=36) if args.paper else
            dict(emb_dim=64, hidden_dim=64, att_dim=32, feat_dim=64,
                 num_regions=8))
    cfg = CaptionKitConfig().override({
        "model.arch": args.arch, "model.dropout": 0.0,
        **{f"model.{k}": v for k, v in dims.items()},
        "decode.method": "beam", "decode.beam_size": 5,
        "decode.max_decode_len": 22, "decode.batch_size": args.batch,
        "data.max_existing_len": 22,
    })
    src = SyntheticCaptionSource(
        num_images=2, captions_per_image=1, num_regions=dims["num_regions"],
        feat_dim=dims["feat_dim"], max_len=22, seed=0,
    )
    cfg = cfg.override({"model.vocab_size": len(src.vocab)})
    model = get_model(cfg.model)
    params = model.init(jax.random.PRNGKey(0))
    ladder = ([int(s) for s in args.ladder.split(",")]
              if args.ladder else ())
    server = CaptionServer(cfg, params, model, src.vocab, ladder=ladder)
    print(json.dumps({"ready": True, "ladder": list(server.ladder)}),
          file=sys.stderr)

    rng = np.random.default_rng(0)
    results = []
    for b in [int(x) for x in args.loads.split(",")]:
        if b > args.batch:
            continue
        feats = rng.standard_normal(
            (b, dims["num_regions"], dims["feat_dim"])).astype(np.float32)
        caps = ["a dog runs in the park"] * b
        server.run_batch(feats, caps)  # compile this rung, excluded
        lats = []
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            server.run_batch(feats, caps)
            lats.append(time.perf_counter() - t0)
        lats = np.sort(np.asarray(lats))
        rec = {
            "load": b,
            "rung": server._rung(b),
            "p50_ms": round(float(lats[len(lats) // 2]) * 1e3, 2),
            "p95_ms": round(float(lats[int(len(lats) * 0.95)]) * 1e3, 2),
            "captions_per_sec": round(b / float(lats[len(lats) // 2]), 1),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    print(json.dumps({
        "metric": f"serve latency sweep ({args.arch}, beam=5, "
                  f"batch={args.batch}, ladder={list(server.ladder)})",
        "results": results,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
