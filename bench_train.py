"""Training-throughput benchmark (BASELINE.json config #4 evidence).

Measures XE train steps/sec and captions/sec for EditNet at paper scale on
the available device(s) — the data-parallel train path (SURVEY.md §3.5).
Not the driver's headline bench (that is bench.py's decode metric); prints
its own one-line JSON.

Usage: python bench_train.py [--batch 256] [--steps 20] [--smoke]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

PAPER = dict(vocab_size=9490, emb_dim=1024, hidden_dim=1024, att_dim=512,
             feat_dim=2048, num_regions=36)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--max-len", type=int, default=22)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        args.batch, args.steps = 64, 5

    import jax
    import jax.numpy as jnp

    from captionkit.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from captionkit.models import get_model
    from captionkit.parallel import make_mesh, shard_batch_arrays
    from captionkit.train import create_train_state
    from captionkit.train.xe import make_xe_train_step
    from captionkit.utils.config import ModelConfig, TrainConfig

    mcfg = ModelConfig(arch="editnet", dropout=0.5, **PAPER)
    model = get_model(mcfg)
    tcfg = TrainConfig(learning_rate=4e-4, donate_state=False)
    state = create_train_state(model.init, tcfg)
    mesh = make_mesh((-1,), ("data",))
    step = make_xe_train_step(model, tcfg, mesh)

    r = np.random.default_rng(0)
    B, L = args.batch, args.max_len

    def make_batch(seed):
        rr = np.random.default_rng(seed)
        return shard_batch_arrays(mesh, {
            "features": rr.standard_normal(
                (B, mcfg.num_regions, mcfg.feat_dim)).astype(np.float32),
            "existing": rr.integers(4, mcfg.vocab_size - 2,
                                    (B, L)).astype(np.int32),
            "existing_len": rr.integers(8, L + 1, (B,)).astype(np.int32),
            "target": rr.integers(4, mcfg.vocab_size - 2,
                                  (B, L)).astype(np.int32),
            "target_len": rr.integers(8, L + 1, (B,)).astype(np.int32),
            "valid": np.ones((B,), bool),
        })

    batches = [make_batch(i) for i in range(max(2, min(args.steps, 8)))]
    state, m = step(state, batches[0])  # compile
    _ = jax.device_get(m["loss"])

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, m = step(state, batches[i % len(batches)])
    loss = float(jax.device_get(m["loss"]))  # sync
    wall = time.perf_counter() - t0
    sps = args.steps / wall
    print(json.dumps({
        "metric": (
            f"XE train steps/sec (EditNet paper-scale, global batch={B}, "
            f"L={L}, DP mesh over {len(jax.devices())} device(s))"
        ),
        "value": round(sps, 3),
        "unit": "steps/sec",
        "captions_per_sec": round(sps * B, 1),
        "final_loss": round(loss, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
