"""captionkit headline benchmark (BASELINE.json metric).

Measures captions/sec/chip for batched beam=5 decode of a Karpathy-test-
sized synthetic split (5000 images) with EditNet at paper scale (vocab 9490,
emb/hidden 1024, att 512, 36x2048 features) on the real TPU chip —
BASELINE.json config #3, the throughput-metric path (SURVEY.md §4.3).

vs_baseline divides by the reference-style CPU denominator measured by
bench_reference_cpu.py (cached in BASELINE_CPU.json; measured on first run).
Target: >= 50x (BASELINE.md).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "captions/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

PAPER = dict(vocab_size=9490, emb_dim=1024, hidden_dim=1024, att_dim=512,
             feat_dim=2048, num_regions=36)


def _cpu_denominator(beam: int, max_len: int, smoke: bool) -> float:
    path = os.path.join(REPO, "BASELINE_CPU.json")
    if os.path.exists(path):
        with open(path) as f:
            blob = json.load(f)
        if blob.get("beam") == beam and blob.get("max_len") == max_len:
            return float(blob["captions_per_sec"])
    images = 2 if smoke else 8
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench_reference_cpu.py"),
         "--images", str(images), "--beam", str(beam),
         "--max-len", str(max_len), "--out", path],
        check=True, cwd=REPO,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    with open(path) as f:
        return float(json.load(f)["captions_per_sec"])


def _probe_backend(timeout_s: float) -> str | None:
    """Initialize the JAX backend in a THROWAWAY subprocess first.

    On this host the device is reached through a tunnel whose outages make
    PJRT client creation block forever (not error). Importing jax in-process
    would then hang this benchmark indefinitely with no diagnostic; a probe
    child can be killed by timeout. Returns None when the backend comes up,
    else a one-line diagnosis. Skip with CAPTIONKIT_BENCH_NO_PROBE=1.
    """
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True, capture_output=True, cwd=REPO,
        )
        return None
    except subprocess.TimeoutExpired:
        return (f"device backend init still blocked after {timeout_s:.0f}s "
                "— device tunnel down? (set CAPTIONKIT_BENCH_NO_PROBE=1 "
                "to bypass this check)")
    except subprocess.CalledProcessError as e:
        tail = (e.stderr or b"").decode(errors="replace")[-400:]
        return f"device backend init failed: {tail}"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny run (CI sanity): 2 batches of 64")
    ap.add_argument("--images", type=int, default=5000,
                    help="split size (Karpathy test = 5000)")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--arch", choices=["editnet", "dcnet"], default="editnet")
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--max-len", type=int, default=22)
    ap.add_argument("--no-baseline", action="store_true",
                    help="skip the CPU denominator (vs_baseline = 0)")
    ap.add_argument("--head-impl", choices=["xla", "pallas"],
                    default=None, help="override ModelConfig.head_impl")
    ap.add_argument("--beam-impl", choices=["register", "backptr"],
                    default="register",
                    help="beam-search history layout (decode.beam docstring)")
    ap.add_argument("--cell-impl", choices=["xla", "pallas", "wholestep"],
                    default=None, help="override ModelConfig.cell_impl "
                    "(fused decode-step cell kernels, ops/megastep.py; "
                    "'wholestep' = cells + vocab head in one kernel, "
                    "ops/wholestep.py)")
    ap.add_argument("--head-extract", choices=["mask", "thresh"],
                    default=None, help="override ModelConfig.head_extract "
                    "(fused-head in-kernel top-k algorithm; identical "
                    "results, different VPU cost — ops/head.py)")
    ap.add_argument("--head-quant", choices=["none", "int8"],
                    default=None, help="override ModelConfig.head_quant "
                    "(int8-quantized fused head — serving knob; decode "
                    "output is approximate, so never the headline number)")
    ap.add_argument("--method", choices=["beam", "greedy", "stacked"],
                    default="beam",
                    help="decode program to bench: beam (headline), "
                         "greedy, or the stacked DCNet->EditNet pipeline "
                         "(one jitted program, both stages at --beam). "
                         "vs_baseline is only defined for beam (the CPU "
                         "denominator is a beam decode); other methods "
                         "report 0.0")
    ap.add_argument("--ensemble", type=int, default=1,
                    help="decode an M-member checkpoint ensemble "
                         "(models/ensemble.py; M random same-config "
                         "members — the cost model, not the quality). "
                         "beam/greedy only; vs_baseline reports 0 (the "
                         "CPU denominator is a single-model decode)")
    ap.add_argument("--ab", default="",
                    help="paired interleaved A/B over one knob: "
                         "'beam-impl=register,backptr' (also head-impl, "
                         "cell-impl, head-quant). Builds BOTH decode "
                         "programs over the SAME params and pre-staged "
                         "batches, warms both, then alternates timed "
                         "passes A,B,A,B,... --runs times and reports "
                         "PER-PAIR percentage deltas with their spread — "
                         "the protocol sub-5%% claims need (round-4 "
                         "verdict weak #3: independent medians of 3 carry "
                         "13-16%% spreads; paired same-session deltas "
                         "cancel the slow drift those spreads are made "
                         "of). A delta is a finding only if |median "
                         "delta| > delta spread; otherwise report "
                         "'indistinguishable'.")
    ap.add_argument("--runs", type=int, default=3,
                    help="timed passes over the pre-staged split; the "
                         "headline value is the MEDIAN and the JSON tail "
                         "records every run + the total spread (round-4 "
                         "band protocol: one number per run cannot "
                         "distinguish a lucky draw from the true rate)")
    ap.add_argument("--profile", default="",
                    help="dump a jax.profiler trace of the timed region")
    ap.add_argument("--streaming", action="store_true",
                    help="ALSO time the full streaming path "
                         "(decode_split: H2D feed + pipelined fetch + host "
                         "detokenize) and print a second JSON line")
    args = ap.parse_args()
    if args.smoke:
        args.images, args.batch = 128, 64

    if os.environ.get("CAPTIONKIT_BENCH_NO_PROBE", "0") != "1":
        diag = _probe_backend(timeout_s=float(
            os.environ.get("CAPTIONKIT_BENCH_PROBE_TIMEOUT", "240")))
        if diag is not None:
            print(f"bench.py: {diag}", file=sys.stderr)
            return 2

    import jax
    import jax.numpy as jnp

    from captionkit.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from captionkit.decode import beam_search
    from captionkit.models import get_model
    from captionkit.utils.config import ModelConfig

    over = {} if args.head_impl is None else {"head_impl": args.head_impl}
    if args.cell_impl is not None:
        over["cell_impl"] = args.cell_impl
    if args.head_quant is not None:
        over["head_quant"] = args.head_quant
    if args.head_extract is not None:
        over["head_extract"] = args.head_extract
    mcfg = ModelConfig(arch=args.arch, dropout=0.0, **over, **PAPER)
    model = get_model(mcfg)
    params = model.init(jax.random.PRNGKey(0))
    if args.ensemble > 1:
        if args.method == "stacked":
            print("bench.py: --ensemble composes with beam/greedy only",
                  file=sys.stderr)
            return 2
        from captionkit.models import ensemble_model, stack_params

        member = model
        model = ensemble_model(member, args.ensemble)
        params = stack_params([
            member.init(jax.random.PRNGKey(i))
            for i in range(args.ensemble)
        ])

    rng = np.random.default_rng(0)
    B = args.batch

    def make_batch(seed: int):
        r = np.random.default_rng(seed)
        return (
            jnp.asarray(r.standard_normal(
                (B, mcfg.num_regions, mcfg.feat_dim)).astype(np.float32)),
            jnp.asarray(r.integers(4, mcfg.vocab_size - 2, (B, args.max_len))
                        .astype(np.int32)),
            jnp.asarray(r.integers(8, args.max_len + 1, (B,))
                        .astype(np.int32)),
        )

    # end_id=-1 is unreachable: untrained weights would otherwise emit
    # <end> at step 1 and the while_loop's early exit would make the run
    # measure almost nothing. Forcing all max_len steps measures the
    # conservative full-length decode cost (trained models with real
    # early exit are strictly faster). The CPU denominator uses the same
    # convention.
    from captionkit.utils.tpuopts import decode_compiler_options

    start_id = mcfg.vocab_size - 2

    if args.ab:
        if args.method != "beam" or args.ensemble > 1:
            print("bench.py: --ab supports --method beam, single model",
                  file=sys.stderr)
            return 2
        key, _, vals = args.ab.partition("=")
        parts = vals.split(",")
        knobs = ("beam-impl", "head-impl", "cell-impl", "head-quant",
                 "head-extract")
        if key not in knobs or len(parts) != 2:
            print(f"bench.py: --ab wants KEY=A,B with KEY in {knobs}",
                  file=sys.stderr)
            return 2
        va, vb = parts

        def build(v: str):
            beam_impl = args.beam_impl
            o = dict(over)
            if key == "beam-impl":
                beam_impl = v
            else:
                o[key.replace("-", "_")] = v
            m = ModelConfig(arch=args.arch, dropout=0.0, **o, **PAPER)
            mod = get_model(m)

            @functools.partial(
                jax.jit, compiler_options=decode_compiler_options())
            def dec(params, feats, existing, existing_len):
                ctx = mod.encode(params, feats, existing, existing_len)
                return beam_search(
                    mod, params, ctx, beam_size=args.beam,
                    start_id=start_id, end_id=-1,
                    max_len=args.max_len, impl=beam_impl,
                ).tokens

            return dec

        # Params are shared (these knobs change dispatch, not shapes), so
        # every pair times the SAME numerical program family on the SAME
        # pre-staged batches back-to-back — drift that plagued the
        # independent-medians protocol cancels inside each pair.
        dec_a, dec_b = build(va), build(vb)
        warm = make_batch(999)
        jax.device_get(dec_a(params, *warm))  # compile A, excluded
        jax.device_get(dec_b(params, *warm))  # compile B, excluded
        n_batches = max(1, args.images // B)
        batches = [jax.device_put(make_batch(i)) for i in range(n_batches)]
        jax.device_get([jnp.sum(fb[2]) for fb in batches])
        n_caps = n_batches * B
        runs_a: list[float] = []
        runs_b: list[float] = []
        for _ in range(max(2, args.runs)):
            for dec, dest in ((dec_a, runs_a), (dec_b, runs_b)):
                t0 = time.perf_counter()
                outs = [dec(params, *fb) for fb in batches]
                jax.device_get(outs)
                dest.append(n_caps / (time.perf_counter() - t0))
        deltas = [100.0 * (b - a) / a for a, b in zip(runs_a, runs_b)]
        med = float(np.median(deltas))
        spread = max(deltas) - min(deltas)
        distinguishable = abs(med) > spread
        print(json.dumps({
            "metric": (
                f"paired A/B {key}: A={va} vs B={vb} ({args.arch}, "
                f"beam={args.beam}, max_len={args.max_len}, batch={B}, "
                f"{n_caps} images, interleaved A,B x {len(deltas)} pairs)"
            ),
            "a": va,
            "b": vb,
            "a_cps": round(float(np.median(runs_a)), 2),
            "b_cps": round(float(np.median(runs_b)), 2),
            "delta_pct_median": round(med, 2),
            "delta_pct_pairs": [round(d, 2) for d in deltas],
            "delta_spread_pct": round(spread, 2),
            "distinguishable": bool(distinguishable),
            "verdict": (
                f"B {'faster' if med > 0 else 'slower'} by "
                f"{abs(med):.2f}% (|median delta| > pair spread)"
                if distinguishable else
                "indistinguishable at this protocol's resolution"
            ),
            "a_runs": [round(r, 2) for r in runs_a],
            "b_runs": [round(r, 2) for r in runs_b],
        }))
        return 0

    if args.method == "beam":

        @functools.partial(
            jax.jit, compiler_options=decode_compiler_options())
        def decode(params, feats, existing, existing_len):
            ctx = model.encode(params, feats, existing, existing_len)
            return beam_search(
                model, params, ctx, beam_size=args.beam,
                start_id=start_id, end_id=-1,
                max_len=args.max_len, impl=args.beam_impl,
            ).tokens

    elif args.method == "greedy":
        from captionkit.decode.greedy import greedy_decode

        @functools.partial(
            jax.jit, compiler_options=decode_compiler_options())
        def decode(params, feats, existing, existing_len):
            ctx = model.encode(params, feats, existing, existing_len)
            return greedy_decode(
                model, params, ctx, start_id=start_id, end_id=-1,
                max_len=args.max_len,
            ).tokens

    else:  # stacked DCNet -> EditNet, one jitted program
        from captionkit.decode.stacked import make_stacked_decode_fn
        from captionkit.utils.config import DecodeConfig

        dc_cfg = ModelConfig(arch="dcnet", dropout=0.0, **PAPER)
        dcnet = get_model(dc_cfg)
        dc_params = dcnet.init(jax.random.PRNGKey(1))
        stage = DecodeConfig(method="beam", beam_size=args.beam,
                             max_decode_len=args.max_len)
        stacked_fn = make_stacked_decode_fn(
            dcnet, model, first_stage=stage, second_stage=stage,
            start_id=start_id, end_id=-1,
        )

        def decode(params, feats, existing, existing_len):
            return stacked_fn(dc_params, params, feats, existing,
                              existing_len)

    # Pre-stage every batch on device (input pipelines prefetch/overlap in
    # production; the metric is chip decode throughput, not PCIe/tunnel
    # latency). Synchronize via a tiny device_get checksum: on this host
    # block_until_ready does not reliably block through the axon tunnel.
    warm = make_batch(999)
    jax.device_get(decode(params, *warm))  # compile, excluded
    n_batches = max(1, args.images // B)
    batches = [jax.device_put(make_batch(i)) for i in range(n_batches)]
    jax.device_get([jnp.sum(fb[2]) for fb in batches])  # staging barrier

    from captionkit.utils.profiling import trace

    n_caps = n_batches * B
    runs: list[float] = []
    with trace(args.profile or None):
        for _ in range(max(1, args.runs)):
            t0 = time.perf_counter()
            outs = [decode(params, *fb) for fb in batches]
            tokens = jax.device_get(outs)  # materialize all token batches
            wall = time.perf_counter() - t0
            runs.append(n_caps / wall)
            del tokens
    cps = float(np.median(runs))
    spread_pct = (100.0 * (max(runs) - min(runs)) / cps) if cps else 0.0

    vs = 0.0
    if not args.no_baseline and args.method == "beam" and args.ensemble == 1:
        denom = _cpu_denominator(args.beam, args.max_len, args.smoke)
        vs = cps / denom if denom > 0 else 0.0

    method_desc = {
        "beam": f"beam={args.beam}",
        "greedy": "greedy",
        "stacked": f"stacked dcnet->editnet, beam={args.beam} both stages",
    }[args.method]
    if args.ensemble > 1:
        method_desc += f", {args.ensemble}-member ensemble"
    print(json.dumps({
        "metric": (
            f"captions/sec/chip ({args.arch} paper-scale, {method_desc}, "
            f"batch={B}, {n_caps} synthetic Karpathy-test images, "
            f"forced full {args.max_len}-step decode [end disabled on both "
            f"sides: untrained weights would finish at step 1], "
            f"1x TPU v5e chip; median of {len(runs)} runs, "
            f"total spread {spread_pct:.1f}%)"
        ),
        "value": round(cps, 2),
        "unit": "captions/sec/chip",
        "vs_baseline": round(vs, 2),
        "runs": [round(r, 2) for r in runs],
        "spread_pct": round(spread_pct, 2),
    }))

    if args.streaming:
        # Full split through the production path: CaptionDataset batches
        # (host numpy) -> H2D -> pipelined beam decode -> D2H -> vocab
        # detokenize (decode_split; VERDICT r1 #9's "what BASELINE's
        # metric sentence describes").
        from captionkit.data.sources import SyntheticCaptionSource
        from captionkit.decode.driver import decode_split, make_decode_fn
        from captionkit.utils.config import DecodeConfig

        src = SyntheticCaptionSource(
            num_images=n_caps, captions_per_image=1,
            num_regions=mcfg.num_regions, feat_dim=mcfg.feat_dim,
            max_len=args.max_len, seed=1,
        )
        ds = src.eval_view()
        dcfg = DecodeConfig(method="beam", beam_size=args.beam,
                            max_decode_len=args.max_len, batch_size=B,
                            feed_dtype="bfloat16")
        # Same forced-full-decode convention as the headline number
        # (end_id=-1 unreachable), same start id; the vocab differs
        # (synthetic grammar) but the decode cost is shape-driven.
        decode_fn = make_decode_fn(
            model, dcfg, start_id=min(len(src.vocab) - 1, 2), end_id=-1,
            pad_id=0,
        )
        hyps, stats = decode_split(model, params, ds, dcfg,
                                   decode_fn=decode_fn)
        print(json.dumps({
            "metric": (
                f"captions/sec streaming (same decode through "
                f"decode_split: host batches + H2D + pipelined fetch + "
                f"detokenize, {len(hyps)} images)"
            ),
            "value": round(stats["captions_per_sec"], 2),
            "unit": "captions/sec",
            "pre_staged_value": round(cps, 2),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
