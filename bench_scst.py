"""SCST step benchmark at paper scale (VERDICT r1 #8; BASELINE config #5).

Times the three SCST phases on the real chip — device rollout (sample +
greedy sharing one encode), host CIDEr-D advantage, device REINFORCE
update — and the end-to-end step rate serial vs pipelined (the pipelined
loop dispatches batch k+1's rollout before batch k's host reward, so the
chip never idles on CIDEr-D; train/loop.py uses the same pattern).

Prints one JSON line per measurement.

Usage: python bench_scst.py [--batch 256] [--steps 12] [--smoke]
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


def _paper_vocab(V: int):
    from captionkit.data.vocab import Vocab

    word2id = {"<pad>": 0}
    for i in range(1, V - 3):
        word2id[f"w{i:05d}"] = i
    word2id["<unk>"] = V - 3
    word2id["<start>"] = V - 2
    word2id["<end>"] = V - 1
    return Vocab(word2id)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--max-len", type=int, default=22)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--platform", choices=["tpu", "cpu"], default=None,
                    help="cpu = functional smoke off-chip (tiny scale "
                         "only; the numbers are chip-only)")
    ap.add_argument("--num-samples", dest="num_samples", type=int,
                    default=1,
                    help=">1 benches multi-sample SCST (leave-one-out "
                         "baseline; no greedy leg)")
    args = ap.parse_args()
    if args.smoke:
        args.batch, args.steps = 32, 3

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from captionkit.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from captionkit.metrics.cider import NgramDocFreq
    from captionkit.models import get_model
    from captionkit.train import create_train_state
    from captionkit.train.scst import (
        ScstRewarder,
        apply_rollout,
        make_scst_rollout,
        make_scst_update,
    )
    from captionkit.utils.config import ModelConfig, TrainConfig

    mcfg = ModelConfig(arch="editnet", dropout=0.0, **PAPER)
    model = get_model(mcfg)
    tcfg = TrainConfig(learning_rate=5e-5, donate_state=False)
    state = create_train_state(model.init, tcfg)
    vocab = _paper_vocab(mcfg.vocab_size)

    B, L = args.batch, args.max_len
    rng = np.random.default_rng(0)
    # COCO-like references: 5 per image, ~10 words from the full vocab.
    words = [f"w{i:05d}" for i in range(1, mcfg.vocab_size - 3)]
    refs = [
        [[words[w] for w in rng.integers(0, len(words), 10)]
         for _ in range(5)]
        for _ in range(B)
    ]
    df = NgramDocFreq.build(refs)
    rewarder = ScstRewarder(vocab, df)

    batch = {
        "features": jnp.asarray(rng.standard_normal(
            (B, mcfg.num_regions, mcfg.feat_dim)).astype(np.float32)),
        "existing": jnp.asarray(rng.integers(
            4, mcfg.vocab_size - 3, (B, L)).astype(np.int32)),
        "existing_len": jnp.asarray(rng.integers(
            8, L + 1, (B,)).astype(np.int32)),
        "valid": jnp.asarray(np.ones((B,), bool)),
    }

    n_s = args.num_samples
    rollout_fn = make_scst_rollout(
        model, start_id=vocab.start, end_id=vocab.end, pad_id=vocab.pad,
        max_len=L, num_samples=n_s,
    )
    update_fn = make_scst_update(model, tcfg, start_id=vocab.start,
                                 num_samples=n_s)

    def emit(name, seconds, n=1, extra=None):
        out = {"metric": f"SCST {name} (EditNet paper-scale, B={B}, L={L})",
               "value": round(seconds / n * 1000, 2), "unit": "ms"}
        out.update(extra or {})
        print(json.dumps(out))

    # -- phase timings -------------------------------------------------------
    key = jax.random.PRNGKey(0)
    roll = rollout_fn(state.params, batch, key)
    roll_host = {k: np.asarray(jax.device_get(v)) for k, v in roll.items()}
    t0 = time.perf_counter()
    rolls = [rollout_fn(state.params, batch, jax.random.fold_in(key, i))
             for i in range(args.steps)]
    _ = jax.device_get(rolls[-1]["sample_tokens"][0, 0])  # one sync
    emit("rollout (device)", time.perf_counter() - t0,
         args.steps)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        if n_s == 1:
            adv = rewarder.advantage(
                roll_host["sample_tokens"], roll_host["greedy_tokens"],
                refs,
            )
        else:
            adv, _rw = rewarder.advantage_loo(
                roll_host["sample_tokens"], refs
            )
    emit("reward (host CIDEr-D advantage)", time.perf_counter() - t0,
         args.steps,
         {"native_scorer": rewarder._native is not None,
          "num_samples": n_s})

    adv_dev = jnp.asarray(adv)
    state, m = update_fn(state, batch, roll["sample_tokens"],
                         roll["sample_mask"], adv_dev)
    _ = jax.device_get(m["scst_loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, m = update_fn(state, batch, roll["sample_tokens"],
                             roll["sample_mask"], adv_dev)
    _ = jax.device_get(m["scst_loss"])
    emit("update (REINFORCE, device)", time.perf_counter() - t0, args.steps)

    # -- end-to-end: serial vs pipelined -------------------------------------
    from captionkit.train.scst import scst_train_step

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, m = scst_train_step(
            rollout_fn=rollout_fn, update_fn=update_fn, rewarder=rewarder,
            state=state, batch=batch, references=refs,
            rng=jax.random.fold_in(key, 100 + i),
        )
    serial = time.perf_counter() - t0
    emit("full step SERIAL", serial, args.steps,
         {"captions_per_sec": round(args.steps * B / serial, 1)})

    pending = None
    t0 = time.perf_counter()
    for i in range(args.steps):
        roll = rollout_fn(state.params, batch,
                          jax.random.fold_in(key, 200 + i))
        if pending is not None:
            state, m = apply_rollout(
                update_fn=update_fn, rewarder=rewarder, state=state,
                batch=batch, references=refs, roll=pending,
            )
        pending = roll
    state, m = apply_rollout(
        update_fn=update_fn, rewarder=rewarder, state=state, batch=batch,
        references=refs, roll=pending,
    )
    piped = time.perf_counter() - t0
    emit("full step PIPELINED", piped, args.steps,
         {"captions_per_sec": round(args.steps * B / piped, 1),
          "speedup_vs_serial": round(serial / piped, 2)})
    return 0


if __name__ == "__main__":
    sys.exit(main())
