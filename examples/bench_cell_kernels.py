"""Scan-chained A/B of the fused Pallas cell/attention kernels vs the
pure-jnp cells XLA fuses itself (VERDICT r2 #2 resolution).

Round-1/2 measurements found the cell kernels LOSE to XLA's own fusion at
paper scale in the full model (2,507 vs 2,855 captions/s), and enabling
them through the old `ModelConfig.use_pallas` flag also forfeited the
grouped-query beam layout (+69%) and forward_seq (+24% train) — a
strictly dominated configuration. Round 3 therefore retired the flag from
the config surface; the kernels stay in captionkit.ops as parity-tested
alternates (tests/test_ops_pallas.py), and THIS script is the reproducible
home of the comparison so the negative result stays measured, not lore.

Usage: python examples/bench_cell_kernels.py [--iters 100] [--rows 2560]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--rows", type=int, default=2560,
                    help="batch rows (beam-5 batch=512 paper scale)")
    ap.add_argument("--hidden", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from captionkit.nn.attention import (
        additive_attention,
        init_additive_attention,
        project_keys,
    )
    from captionkit.nn.cells import (
        copy_lstm_cell,
        init_copy_lstm,
        init_lstm,
        lstm_cell,
    )
    from captionkit.ops import pallas_supported
    from captionkit.ops.attention import fused_additive_attention
    from captionkit.ops.lstm import fused_copy_lstm_cell, fused_lstm_cell
    from captionkit.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if not pallas_supported():
        print("no TPU: pallas kernels unavailable, nothing to compare")
        return 0

    N, H = args.rows, args.hidden
    E, F, A, R = 1024, 2048, 512, 36
    rng = np.random.default_rng(0)

    def arr(*shape, scale=0.05):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    lstm_p = init_lstm(jax.random.PRNGKey(0), E + F + H, H)
    copy_p = init_copy_lstm(jax.random.PRNGKey(1), F + H, H)
    att_p = init_additive_attention(jax.random.PRNGKey(2), F, H, A)

    x_att = arr(N, E + F + H)
    x_lang = arr(N, F + H)
    h0, c0, cstar = arr(N, H), arr(N, H), arr(N, H)
    values = arr(N, R, F)
    keys = project_keys(att_p, values)
    query = arr(N, H)

    cases = {
        "lstm_jnp": lambda s: lstm_cell(lstm_p, x_att, s, c0,
                                        compute_dtype=jnp.bfloat16),
        "lstm_pallas": lambda s: fused_lstm_cell(
            lstm_p, x_att, s, c0, compute_dtype=jnp.bfloat16),
        "copy_jnp": lambda s: copy_lstm_cell(
            copy_p, x_lang, s, c0, cstar, compute_dtype=jnp.bfloat16),
        "copy_pallas": lambda s: fused_copy_lstm_cell(
            copy_p, x_lang, s, c0, cstar, compute_dtype=jnp.bfloat16),
        "att_jnp": lambda s: additive_attention(
            att_p, keys, values, s, None, compute_dtype=jnp.bfloat16),
        "att_pallas": lambda s: fused_additive_attention(
            att_p, keys, values, s, None, compute_dtype=jnp.bfloat16),
    }

    results = {}
    for name, fn in cases.items():
        @jax.jit
        def prog(carry, fn=fn):
            def body(c, _):
                out = fn(c)
                first = out[0] if isinstance(out, tuple) else out
                dep = jnp.sum(first[:1, :1]) * 1e-12
                return c + dep.astype(c.dtype), ()

            out, _ = jax.lax.scan(body, carry, None, length=args.iters)
            return jnp.sum(out[:1, :8])

        seed = h0 if "att" not in name else query
        jax.device_get(prog(seed))
        t0 = time.perf_counter()
        jax.device_get(prog(seed))
        us = (time.perf_counter() - t0) / args.iters * 1e6
        results[name] = round(us, 1)
        print(f"{name:12s} {us:9.1f} us/iter")
    print(results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
