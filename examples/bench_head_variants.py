"""A/B harness for the fused vocab-head top-k kernel (VERDICT r2 #1).

Measures, scan-chained on device at paper shapes (dispatch overhead on
this host's tunnel makes standalone timings lie — docs/DESIGN.md):

- fused:      the production kernel (ops/head.fused_head_topk)
- floor:      same kernel minus ALL top-k extraction (matmul + online LSE
              only) — the honest lower bound for this tiling
- packed:     the VERDICT-suggested packed int32 sort key (22-bit value +
              10-bit inverted column index, 3 VPU passes per k instead of
              6) — LOSSY in the low 10 mantissa bits, measured here to
              price what exactness costs
- defer:      exact per-tile top-k, but the cross-tile merge deferred to
              one final pass over the collected [TN, nj*k] candidates
              (the per-tile merge is ~30 ops on [TN,128] vregs = ~25% of
              extraction at TV=512)
- xla_topk:   bf16 matmul -> fp32 logits in HBM -> lax.top_k + logsumexp
- xla_approx: same but jax.lax.approx_max_k(recall_target=1.0)

Usage: python examples/bench_head_variants.py [--iters 60] [--which a,b,c]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N, H, V, K = 2560, 1024, 9490, 5


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--which", default="fused,floor,k1,packed,noidx,"
                                       "xla_topk,xla_approx")
    ap.add_argument("--tiles", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from captionkit.ops.head import (
        _NEG,
        _make_head_kernel,
        _pad_axis,
        _pick_tiles,
        _round_up,
        fused_head_topk,
    )
    from captionkit.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    rng = np.random.default_rng(0)
    h0 = jnp.asarray(rng.standard_normal((N, H)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((H, V)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((V,)) * 0.05, jnp.float32)

    dt = jnp.bfloat16
    TN, TV = _pick_tiles(N, H, V, K, 2)
    if args.tiles:
        TN, TV = (int(t) for t in args.tiles.split(","))
    Np, Vp = _round_up(N, TN), _round_up(V, TV)
    nj = Vp // TV
    print(f"tiles TN={TN} TV={TV} grid=({Np // TN},{nj})")

    w_p = _pad_axis(w.astype(dt), 1, Vp)
    b_p = _pad_axis(b.astype(jnp.float32), 0, Vp, value=_NEG).reshape(1, Vp)

    # -- floor: matmul + online LSE, no extraction --------------------------
    def floor_kernel(h_ref, w_ref, b_ref, lse_out, run_m, run_s):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            run_m[...] = jnp.full_like(run_m, _NEG)
            run_s[...] = jnp.zeros_like(run_s)

        logits = (
            jnp.dot(h_ref[...], w_ref[...],
                    preferred_element_type=jnp.float32) + b_ref[...]
        )
        tm = jnp.max(logits, axis=1, keepdims=True)
        m_old = run_m[...][:, :1]
        m_new = jnp.maximum(m_old, tm)
        s_new = run_s[...][:, :1] * jnp.exp(m_old - m_new) + jnp.sum(
            jnp.exp(logits - m_new), axis=1, keepdims=True)
        run_m[...] = jnp.broadcast_to(m_new, run_m.shape)
        run_s[...] = jnp.broadcast_to(s_new, run_s.shape)

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            lse_out[...] = jnp.broadcast_to(
                run_m[...][:, :1] + jnp.log(run_s[...][:, :1]),
                lse_out.shape)

    def run_floor(hh):
        return pl.pallas_call(
            floor_kernel,
            grid=(Np // TN, nj),
            in_specs=[
                pl.BlockSpec((TN, H), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, TV), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TV), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[pl.BlockSpec((TN, 1), lambda i, j: (i, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[jax.ShapeDtypeStruct((Np, 1), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((TN, 128), jnp.float32),
                            pltpu.VMEM((TN, 128), jnp.float32)],
        )(_pad_axis(hh.astype(dt), 0, Np), w_p, b_p)[0]

    # -- packed: lossy int32 (22-bit value | 10-bit inv index) key ----------
    # 3 VPU passes per k (max + cmp + sel) instead of the exact loop's 6:
    # the index rides in the key's low bits, so ties are impossible and
    # index recovery is free. Lossy in the low 10 mantissa bits.
    def packed_kernel(h_ref, w_ref, b_ref, vals_out, idx_out, lse_out,
                      run_key, run_m, run_s):
        j = pl.program_id(1)
        nj_ = pl.num_programs(1)
        kmin = jnp.iinfo(jnp.int32).min

        @pl.when(j == 0)
        def _():
            run_key[...] = jnp.full_like(run_key, kmin)
            run_m[...] = jnp.full_like(run_m, _NEG)
            run_s[...] = jnp.zeros_like(run_s)

        logits = (
            jnp.dot(h_ref[...], w_ref[...],
                    preferred_element_type=jnp.float32) + b_ref[...]
        )
        tm = jnp.max(logits, axis=1, keepdims=True)
        m_old = run_m[...][:, :1]
        m_new = jnp.maximum(m_old, tm)
        s_new = run_s[...][:, :1] * jnp.exp(m_old - m_new) + jnp.sum(
            jnp.exp(logits - m_new), axis=1, keepdims=True)
        run_m[...] = jnp.broadcast_to(m_new, run_m.shape)
        run_s[...] = jnp.broadcast_to(s_new, run_s.shape)

        tn = logits.shape[0]
        raw = jax.lax.bitcast_convert_type(logits, jnp.int32)
        mono = jnp.where(raw < 0, raw ^ jnp.int32(0x7FFFFFFF), raw)
        col = jax.lax.broadcasted_iota(jnp.int32, (tn, TV), 1)
        inv = jnp.int32(TV - 1) - col
        key = (mono & jnp.int32(~(TV - 1))) | inv  # lossy low bits
        tile_top = []
        for _ in range(K):
            m = jnp.max(key, axis=1)
            tile_top.append(m)
            key = jnp.where(key == m[:, None], kmin, key)
        # cross-tile merge on int keys ([TN, 2K] lanes)
        cand = jnp.concatenate(
            [run_key[...][:, :K]] + [m[:, None] for m in tile_top], axis=1)
        merged = []
        for _ in range(K):
            m = jnp.max(cand, axis=1)
            merged.append(m)
            cand = jnp.where(cand == m[:, None], kmin, cand)
        run_key[...] = jnp.pad(
            jnp.stack(merged, axis=1),
            ((0, 0), (0, run_key.shape[1] - K)), constant_values=kmin)

        @pl.when(j == nj_ - 1)
        def _():
            kk = run_key[...][:, :K]
            inv_idx = kk & jnp.int32(TV - 1)
            idx_out[...] = jnp.int32(TV - 1) - inv_idx  # tile-local probe
            vals_out[...] = kk.astype(jnp.float32)
            lse_out[...] = jnp.broadcast_to(
                run_m[...][:, :1] + jnp.log(run_s[...][:, :1]),
                lse_out.shape)

    kcols = _round_up(K, 128)

    def run_packed(hh):
        return pl.pallas_call(
            packed_kernel,
            grid=(Np // TN, nj),
            in_specs=[
                pl.BlockSpec((TN, H), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, TV), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TV), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((TN, K), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TN, K), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TN, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Np, K), jnp.float32),
                jax.ShapeDtypeStruct((Np, K), jnp.int32),
                jax.ShapeDtypeStruct((Np, 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((TN, kcols), jnp.int32),
                pltpu.VMEM((TN, 128), jnp.float32),
                pltpu.VMEM((TN, 128), jnp.float32),
            ],
        )(_pad_axis(hh.astype(dt), 0, Np), w_p, b_p)

    # -- noidx: exact VALUE selection, no index recovery (3 passes/k) -------
    # isolates what index recovery costs vs pure value selection
    def noidx_kernel(h_ref, w_ref, b_ref, vals_out, lse_out,
                     run_vals, run_m, run_s):
        j = pl.program_id(1)
        nj_ = pl.num_programs(1)

        @pl.when(j == 0)
        def _():
            run_vals[...] = jnp.full_like(run_vals, _NEG)
            run_m[...] = jnp.full_like(run_m, _NEG)
            run_s[...] = jnp.zeros_like(run_s)

        logits = (
            jnp.dot(h_ref[...], w_ref[...],
                    preferred_element_type=jnp.float32) + b_ref[...]
        )
        tm = jnp.max(logits, axis=1, keepdims=True)
        m_old = run_m[...][:, :1]
        m_new = jnp.maximum(m_old, tm)
        s_new = run_s[...][:, :1] * jnp.exp(m_old - m_new) + jnp.sum(
            jnp.exp(logits - m_new), axis=1, keepdims=True)
        run_m[...] = jnp.broadcast_to(m_new, run_m.shape)
        run_s[...] = jnp.broadcast_to(s_new, run_s.shape)

        tile = logits
        tops = []
        for _ in range(K):
            m = jnp.max(tile, axis=1)
            tops.append(m)
            tile = jnp.where(tile == m[:, None], _NEG, tile)
        cand = jnp.concatenate(
            [run_vals[...][:, :K]] + [m[:, None] for m in tops], axis=1)
        merged = []
        for _ in range(K):
            m = jnp.max(cand, axis=1)
            merged.append(m)
            cand = jnp.where(cand == m[:, None], _NEG, cand)
        run_vals[...] = jnp.pad(
            jnp.stack(merged, axis=1),
            ((0, 0), (0, run_vals.shape[1] - K)), constant_values=_NEG)

        @pl.when(j == nj_ - 1)
        def _():
            vals_out[...] = run_vals[...][:, :K]
            lse_out[...] = jnp.broadcast_to(
                run_m[...][:, :1] + jnp.log(run_s[...][:, :1]),
                lse_out.shape)

    def run_noidx(hh):
        return pl.pallas_call(
            noidx_kernel,
            grid=(Np // TN, nj),
            in_specs=[
                pl.BlockSpec((TN, H), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, TV), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TV), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((TN, K), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TN, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Np, K), jnp.float32),
                jax.ShapeDtypeStruct((Np, 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((TN, kcols), jnp.float32),
                pltpu.VMEM((TN, 128), jnp.float32),
                pltpu.VMEM((TN, 128), jnp.float32),
            ],
        )(_pad_axis(hh.astype(dt), 0, Np), w_p, b_p)

    # -- fpidx: exact kernel, index arithmetic entirely in fp32 -------------
    # (probe: are int32 iota/select/min-reduce passes the cost center?)
    BIGF = 1e9  # python float: jnp scalars would be captured consts

    def fpidx_kernel(h_ref, w_ref, b_ref, vals_out, idx_out, lse_out,
                     run_vals, run_idx, run_m, run_s):
        j = pl.program_id(1)
        nj_ = pl.num_programs(1)

        @pl.when(j == 0)
        def _():
            run_vals[...] = jnp.full_like(run_vals, _NEG)
            run_idx[...] = jnp.zeros_like(run_idx)
            run_m[...] = jnp.full_like(run_m, _NEG)
            run_s[...] = jnp.zeros_like(run_s)

        logits = (
            jnp.dot(h_ref[...], w_ref[...],
                    preferred_element_type=jnp.float32) + b_ref[...]
        )
        tm = jnp.max(logits, axis=1, keepdims=True)
        m_old = run_m[...][:, :1]
        m_new = jnp.maximum(m_old, tm)
        s_new = run_s[...][:, :1] * jnp.exp(m_old - m_new) + jnp.sum(
            jnp.exp(logits - m_new), axis=1, keepdims=True)
        run_m[...] = jnp.broadcast_to(m_new, run_m.shape)
        run_s[...] = jnp.broadcast_to(s_new, run_s.shape)

        tn = logits.shape[0]
        colf = jax.lax.broadcasted_iota(jnp.int32, (tn, TV), 1)
        colf = colf.astype(jnp.float32)
        tile = logits
        t_vals, t_idxf = [], []
        for _ in range(K):
            m = jnp.max(tile, axis=1)
            idxf = jnp.where(tile == m[:, None], colf, BIGF)
            amf = jnp.min(idxf, axis=1)
            t_vals.append(m)
            t_idxf.append(amf + jnp.float32(j * TV))
            tile = jnp.where(idxf == amf[:, None], _NEG, tile)

        cand_vals = jnp.concatenate(
            [run_vals[...][:, :K]] + [v[:, None] for v in t_vals], axis=1)
        cand_idx = jnp.concatenate(
            [run_idx[...][:, :K]] + [i[:, None] for i in t_idxf], axis=1)
        posf = jax.lax.broadcasted_iota(jnp.int32, cand_vals.shape, 1)
        posf = posf.astype(jnp.float32)
        new_vals, new_idx = [], []
        for _ in range(K):
            m = jnp.max(cand_vals, axis=1)
            pf = jnp.where(cand_vals == m[:, None], posf, BIGF)
            am = jnp.min(pf, axis=1)
            sel = pf == am[:, None]
            new_vals.append(m)
            new_idx.append(jnp.sum(jnp.where(sel, cand_idx, 0.0), axis=1))
            cand_vals = jnp.where(sel, _NEG, cand_vals)
        run_vals[...] = jnp.pad(
            jnp.stack(new_vals, axis=1),
            ((0, 0), (0, run_vals.shape[1] - K)), constant_values=_NEG)
        run_idx[...] = jnp.pad(
            jnp.stack(new_idx, axis=1),
            ((0, 0), (0, run_idx.shape[1] - K)))

        @pl.when(j == nj_ - 1)
        def _():
            vals_out[...] = run_vals[...][:, :K]
            idx_out[...] = run_idx[...][:, :K].astype(jnp.int32)
            lse_out[...] = jnp.broadcast_to(
                run_m[...][:, :1] + jnp.log(run_s[...][:, :1]),
                lse_out.shape)

    def run_fpidx(hh):
        return pl.pallas_call(
            fpidx_kernel,
            grid=(Np // TN, nj),
            in_specs=[
                pl.BlockSpec((TN, H), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H, TV), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TV), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((TN, K), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TN, K), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TN, 1), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Np, K), jnp.float32),
                jax.ShapeDtypeStruct((Np, K), jnp.int32),
                jax.ShapeDtypeStruct((Np, 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((TN, kcols), jnp.float32),
                pltpu.VMEM((TN, kcols), jnp.float32),
                pltpu.VMEM((TN, 128), jnp.float32),
                pltpu.VMEM((TN, 128), jnp.float32),
            ],
        )(_pad_axis(hh.astype(dt), 0, Np), w_p, b_p)

    # -- XLA variants -------------------------------------------------------
    def run_xla_topk(hh):
        logits = (hh.astype(dt) @ w.astype(dt)).astype(jnp.float32) + b
        vals, idx = jax.lax.top_k(logits, K)
        lse = jax.scipy.special.logsumexp(logits, axis=1)
        return vals, idx, lse

    def run_xla_approx(hh):
        logits = (hh.astype(dt) @ w.astype(dt)).astype(jnp.float32) + b
        vals, idx = jax.lax.approx_max_k(logits, K, recall_target=1.0)
        lse = jax.scipy.special.logsumexp(logits, axis=1)
        return vals, idx, lse

    def run_fused(hh):
        return fused_head_topk(hh, w, b, k=K, compute_dtype=dt,
                               tiles=(TN, TV))

    def run_k1(hh):
        return fused_head_topk(hh, w, b, k=1, compute_dtype=dt,
                               tiles=(TN, TV))

    variants = {
        "fused": lambda hh: run_fused(hh),
        "floor": lambda hh: (run_floor(hh),),
        "k1": run_k1,
        "packed": run_packed,
        "noidx": run_noidx,
        "fpidx": run_fpidx,
        "xla_topk": run_xla_topk,
        "xla_approx": run_xla_approx,
    }

    def chain(fn, iters):
        @jax.jit
        def prog(hh):
            def body(carry, _):
                outs = fn(carry)
                lse = outs[-1]
                dep = jnp.sum(lse.reshape(-1)[:1]) * 1e-12
                return carry + dep.astype(carry.dtype), ()

            out, _ = jax.lax.scan(body, hh, None, length=iters)
            # scalar result: a device_get of the full [N, H] carry costs
            # ~300ms on this host's relay and would swamp the timing
            return jnp.sum(out[:1, :8])

        return prog

    results = {}
    for name in args.which.split(","):
        fn = variants[name]
        prog = chain(fn, args.iters)
        out = jax.device_get(prog(h0))  # compile + warmup
        t0 = time.perf_counter()
        out = jax.device_get(prog(h0))
        dt_run = time.perf_counter() - t0
        us = dt_run / args.iters * 1e6
        results[name] = us
        print(f"{name:12s} {us:9.1f} us/iter")

    print({k: round(v, 1) for k, v in results.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
