"""Diagnose XE train-step throughput (VERDICT r1 weak #2).

Measures, per batch size: compiled FLOPs / bytes-accessed estimates,
single-step synced latency, async-loop throughput, donated-state variant,
and a k-step scanned program (dispatch amortization).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PAPER = dict(vocab_size=9490, emb_dim=1024, hidden_dim=1024, att_dim=512,
             feat_dim=2048, num_regions=36)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[256, 512])
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--scan-k", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from captionkit.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from captionkit.models import get_model
    from captionkit.train import create_train_state
    from captionkit.train.xe import make_xe_train_step
    from captionkit.utils.config import ModelConfig, TrainConfig

    mcfg = ModelConfig(arch="editnet", dropout=0.5, **PAPER)
    model = get_model(mcfg)

    for B in args.batches:
        L = 22
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
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        jax.device_get(batch["valid"])  # stage

        tcfg = TrainConfig(learning_rate=4e-4, donate_state=False)
        state = create_train_state(model.init, tcfg)
        step = make_xe_train_step(model, tcfg, None)

        lowered = step.lower(state, batch)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        flops = ca.get("flops", float("nan"))
        bytes_acc = ca.get("bytes accessed", float("nan"))
        mem = compiled.memory_analysis()

        state, m = step(state, batch)
        _ = jax.device_get(m["loss"])

        # synced single steps
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            state, m = step(state, batch)
            _ = jax.device_get(m["loss"])
            ts.append(time.perf_counter() - t0)
        synced = min(ts)

        # async loop
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = step(state, batch)
        _ = jax.device_get(m["loss"])
        async_t = (time.perf_counter() - t0) / args.steps

        peak = getattr(mem, "temp_size_in_bytes", None)
        print(json.dumps({
            "B": B,
            "flops_per_step_G": round(flops / 1e9, 1),
            "bytes_per_step_MB": round(bytes_acc / 1e6, 1),
            "temp_bytes_MB": round((peak or 0) / 1e6, 1),
            "synced_s": round(synced, 4),
            "async_s": round(async_t, 4),
            "async_captions_per_s": round(B / async_t, 1),
            "mfu_pct_at_async": round(
                flops / async_t / 197e12 * 100, 2
            ),
        }))

        # donated variant
        tcfg_d = TrainConfig(learning_rate=4e-4, donate_state=True)
        state_d = create_train_state(model.init, tcfg_d)
        step_d = make_xe_train_step(model, tcfg_d, None)
        state_d, m = step_d(state_d, batch)
        _ = jax.device_get(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state_d, m = step_d(state_d, batch)
        _ = jax.device_get(m["loss"])
        don_t = (time.perf_counter() - t0) / args.steps
        print(json.dumps({"B": B, "donated_async_s": round(don_t, 4),
                          "captions_per_s": round(B / don_t, 1)}))

        # k-step scan program (one dispatch per k steps)
        k = args.scan_k
        stacked = {k2: jnp.stack([v] * k) for k2, v in batch.items()}

        from captionkit.train.state import TrainState as TS

        def scan_steps(state, batches):
            def body(s, b):
                s2, mm = _inner(s, b)
                return s2, mm["loss"]

            return jax.lax.scan(body, state, batches)

        _inner = make_xe_train_step(model, tcfg, None)._fun \
            if hasattr(make_xe_train_step(model, tcfg, None), "_fun") else None
        if _inner is None:
            # rebuild the raw (unjitted) step body
            import optax

            from captionkit.train.state import make_optimizer
            from captionkit.train.xe import xe_loss
            tx = make_optimizer(tcfg)

            def _inner(s, b):
                rng = s.next_rng()

                def loss_fn(p):
                    return xe_loss(model, p, b["features"], b["existing"],
                                   b["existing_len"], b["target"],
                                   b["target_len"], b["valid"], rng=rng,
                                   train=True)

                (loss, mm), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(s.params)
                updates, opt = tx.update(grads, s.opt_state, s.params)
                return TS(params=optax.apply_updates(s.params, updates),
                          opt_state=opt, step=s.step + 1, rng=s.rng), mm

        scan_jit = jax.jit(scan_steps, donate_argnums=(0,))
        state_s = create_train_state(model.init, tcfg)
        state_s, losses = scan_jit(state_s, stacked)
        _ = jax.device_get(losses)
        n_disp = max(2, args.steps // k)
        t0 = time.perf_counter()
        for _ in range(n_disp):
            state_s, losses = scan_jit(state_s, stacked)
        _ = jax.device_get(losses)
        scan_t = (time.perf_counter() - t0) / (n_disp * k)
        print(json.dumps({"B": B, "scan_k": k,
                          "scan_async_s_per_step": round(scan_t, 4),
                          "captions_per_s": round(B / scan_t, 1)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
