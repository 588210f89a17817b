"""Training-throughput benchmark (BASELINE.json config #4 evidence).

Measures XE train steps/sec and captions/sec for EditNet at paper scale on
the available device(s) — the data-parallel train path (SURVEY.md §3.5).
Not the driver's headline bench (that is bench.py's decode metric); prints
one JSON line per mode.

Two modes:
* step-per-dispatch (the reference's loop granularity)
* k steps scanned per dispatch (captionkit's production path,
  train.xe.make_xe_train_multistep) — same math, one launch per k steps.

Usage: python bench_train.py [--batch 256] [--steps 32] [--scan-k 8]
                             [--single-dispatch] [--smoke]
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


def flops_per_step(mcfg, B: int, L: int) -> float:
    """Analytic fwd+bwd FLOPs for one EditNet XE step (matmul terms only,
    backward counted as 2x forward)."""
    E, H, A = mcfg.emb_dim, mcfg.hidden_dim, mcfg.att_dim
    F, R, V = mcfg.feat_dim, mcfg.num_regions, mcfg.vocab_size
    T = L - 1
    att_in = E + F + H  # embed + mean visual + lang h
    lstm = lambda i, h: 2 * (i + h) * 4 * h  # noqa: E731
    per_tok = (
        lstm(att_in, H)                     # att-LSTM
        + lstm(H + F + H, H)                # copy-LSTM base (x: h_att+v̂+c*)
        + 2 * (H + F + H + H) * H           # copy gate r
        + 2 * (H * A + R * A + R * F)       # visual attention
        + 2 * (H * A + L * A + L * H)       # SCMA over encoder states
        + 2 * H * V                         # fc head
    )
    enc = L * lstm(E, H)                    # existing-caption encoder
    return 3.0 * B * (T * per_tok + enc)    # fwd + 2x bwd


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--arch", choices=["editnet", "dcnet"], default="editnet")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--max-len", type=int, default=22)
    ap.add_argument("--scan-k", type=int, default=8)
    ap.add_argument("--single-dispatch", action="store_true",
                    help="also measure the step-per-dispatch floor")
    ap.add_argument("--deferred-bwd", dest="deferred_bwd",
                    choices=["on", "off"], default=None,
                    help="force the hand-written deferred-dW backward on/off "
                         "(models/editnet_backward.py, dcnet_backward.py); "
                         "default: the production ModelConfig default for "
                         "the chosen arch")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--platform", choices=["tpu", "cpu"], default=None,
                    help="cpu = functional smoke off-chip (numbers are "
                         "chip-only)")
    args = ap.parse_args()
    if args.smoke:
        args.batch, args.steps, args.scan_k = 64, 8, 4

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from captionkit.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from captionkit.models import get_model
    from captionkit.parallel import make_mesh, shard_batch_arrays
    from captionkit.train import create_train_state
    from captionkit.train.xe import make_xe_train_multistep, make_xe_train_step
    from captionkit.utils.config import ModelConfig, TrainConfig

    # Default: benchmark the shipped ModelConfig defaults. --deferred-bwd
    # on/off forces the A/B for the chosen arch (each arch reads its own
    # flag: editnet -> deferred_backward, dcnet -> dcnet_deferred_backward).
    bwd_kw = {}
    if args.deferred_bwd is not None:
        key = ("deferred_backward" if args.arch == "editnet"
               else "dcnet_deferred_backward")
        bwd_kw[key] = args.deferred_bwd == "on"
    mcfg = ModelConfig(arch=args.arch, dropout=0.5, **bwd_kw, **PAPER)
    model = get_model(mcfg)
    tcfg = TrainConfig(learning_rate=4e-4, donate_state=True)
    mesh = make_mesh((-1,), ("data",))

    B, L, K = args.batch, args.max_len, args.scan_k
    rr = np.random.default_rng(0)
    batch_np = {
        "features": rr.standard_normal(
            (B, mcfg.num_regions, mcfg.feat_dim)).astype(np.float32),
        "existing": rr.integers(4, mcfg.vocab_size - 2,
                                (B, L)).astype(np.int32),
        "existing_len": rr.integers(8, L + 1, (B,)).astype(np.int32),
        "target": rr.integers(4, mcfg.vocab_size - 2,
                              (B, L)).astype(np.int32),
        "target_len": rr.integers(8, L + 1, (B,)).astype(np.int32),
        "valid": np.ones((B,), bool),
    }
    if args.arch == "editnet":
        # the analytic FLOP model is EditNet-specific; skip it otherwise
        fps = flops_per_step(mcfg, B, L)
        peak = 197e12  # v5e bf16

    def report(name, steps, wall, extra=None):
        sps = steps / wall
        out = {
            "metric": (
                f"XE train steps/sec ({args.arch} paper-scale, global batch={B},"
                f" L={L}, {name}, DP mesh over {len(jax.devices())} "
                f"device(s))"
            ),
            "value": round(sps, 3),
            "unit": "steps/sec",
            "captions_per_sec": round(sps * B, 1),
        }
        if args.arch == "editnet":
            # the analytic FLOP model below is EditNet-specific
            out["est_mfu_pct"] = round(fps * sps / peak * 100, 1)
        out.update(extra or {})
        print(json.dumps(out))

    # -- production path: K steps per dispatch ------------------------------
    multi = make_xe_train_multistep(model, tcfg, mesh)
    stacked = shard_batch_arrays(
        mesh, {k: np.stack([v] * K) for k, v in batch_np.items()},
        stacked=True,
    )
    state = create_train_state(model.init, tcfg)
    # Two warmup dispatches: the first carries compile, and this host's
    # remote-dispatch tunnel runs the first timed window ~2x slow.
    for _ in range(2):
        state, m = multi(state, stacked)
        _ = jax.device_get(m["loss"])
    n_disp = max(1, args.steps // K)
    t0 = time.perf_counter()
    for _ in range(n_disp):
        state, m = multi(state, stacked)
    loss = float(jax.device_get(m["loss"])[-1])
    wall = time.perf_counter() - t0
    report(f"scan_k={K}", n_disp * K, wall, {"final_loss": round(loss, 4)})

    # -- reference-style loop granularity ------------------------------------
    if args.single_dispatch:
        tcfg1 = TrainConfig(learning_rate=4e-4, donate_state=False)
        step = make_xe_train_step(model, tcfg1, mesh)
        state1 = create_train_state(model.init, tcfg1)
        dev_batch = shard_batch_arrays(mesh, batch_np)
        for _ in range(2):
            state1, m = step(state1, dev_batch)
            _ = jax.device_get(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state1, m = step(state1, dev_batch)
        loss = float(jax.device_get(m["loss"]))
        wall = time.perf_counter() - t0
        report("step-per-dispatch", args.steps, wall,
               {"final_loss": round(loss, 4)})
    return 0


if __name__ == "__main__":
    sys.exit(main())
