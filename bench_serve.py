"""Serving latency/throughput bench: drive the in-process CaptionServer
under (a) per-flush loads and (b) sustained open-loop arrivals.

    python bench_serve.py [--batch 256] [--ladder 1,16,64] [--loads 1,3,16,64,256]
        [--rounds 30] [--arch editnet] [--paper]
    python bench_serve.py --rates 50,100,200,400 [--num-requests 1500]
        [--flush-ms 10] [--max-in-flight 2] [--paper]

Mode (a) — the round-3 sweep: for each load b (requests per flush) it
times `run_batch` end-to-end — tokenize, pad to the smallest ladder rung,
compiled beam decode, detokenize — one JSON line per load with p50/p95
latency and captions/sec. This is a CLOSED-loop number: requests-per-
flush, no queueing.

Mode (b) — `--rates` (round-5, VERDICT r4 weak #1): an open-loop load
generator offers Poisson arrivals at each rate; the server micro-batches
them under the production policy (flush when the max rung fills or the
oldest request has waited --flush-ms) with up to --max-in-flight batches
DISPATCHED concurrently (submit_batch/collect — batch i+1 tokenizes and
stages while batch i decodes). Reported latency is queueing-INCLUSIVE
(completion minus scheduled arrival), so p95 under real load and the
saturation throughput (achieved < offered) are finally measured rather
than inferred.

Works on CPU (functional check) and the chip (the real numbers).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def _open_loop(server, feats_pool, rate: float, n: int, flush_ms: float,
               max_in_flight: int):
    """Offer n Poisson arrivals at `rate` req/s; return queueing-inclusive
    latency stats. Latency clocks start at the SCHEDULED arrival time, so
    when the server can't keep up the backlog shows up in the tail."""
    import queue as qmod
    import threading

    import numpy as np

    batch = server.batch
    rng = np.random.default_rng(1234)
    arrivals = np.cumsum(rng.exponential(1.0 / rate, n))
    caption = "a dog runs in the park"

    inflight_q: qmod.Queue = qmod.Queue()
    comp_q: qmod.Queue = qmod.Queue()

    def collector() -> None:
        while True:
            item = inflight_q.get()
            if item is None:
                return
            handle, rids = item
            server.collect(handle)
            comp_q.put((rids, time.perf_counter()))

    th = threading.Thread(target=collector, daemon=True)
    th.start()

    lat = np.zeros(n)
    batch_sizes: list[int] = []
    queued: list[tuple[int, float]] = []  # (rid, scheduled arrival wall)
    next_i = completed = inflight = 0
    t0 = time.perf_counter()
    last_done = t0
    while completed < n:
        now = time.perf_counter()
        while next_i < n and t0 + arrivals[next_i] <= now:
            queued.append((next_i, t0 + arrivals[next_i]))
            next_i += 1
        try:
            while True:
                rids, t_done = comp_q.get_nowait()
                for rid, t_arr in rids:
                    lat[rid] = t_done - t_arr
                completed += len(rids)
                inflight -= 1
                last_done = t_done
        except qmod.Empty:
            pass
        can_submit = queued and inflight < max_in_flight
        stale = queued and (now - queued[0][1]) * 1e3 >= flush_ms
        if can_submit and (len(queued) >= batch or stale or next_i >= n):
            take = queued[:batch]
            del queued[:batch]
            feats = np.stack(
                [feats_pool[rid % len(feats_pool)] for rid, _ in take]
            )
            handle = server.submit_batch(feats, [caption] * len(take))
            inflight_q.put((handle, take))
            inflight += 1
            batch_sizes.append(len(take))
        else:
            time.sleep(0.0005)  # wait for arrivals/completions/staleness
    inflight_q.put(None)
    th.join(timeout=5)
    lat_ms = np.sort(lat) * 1e3
    span = max(last_done - t0, 1e-9)
    return {
        "offered_rps": rate,
        "achieved_rps": round(n / span, 1),
        "p50_ms": round(float(lat_ms[n // 2]), 2),
        "p95_ms": round(float(lat_ms[min(n - 1, int(n * 0.95))]), 2),
        "p99_ms": round(float(lat_ms[min(n - 1, int(n * 0.99))]), 2),
        "mean_batch": round(float(np.mean(batch_sizes)), 1),
        "saturated": bool(n / span < 0.95 * rate),
    }


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
    ap.add_argument("--rates", default="",
                    help="comma-separated offered request rates (req/s) "
                         "for the open-loop sustained-load mode; replaces "
                         "the per-flush --loads sweep")
    ap.add_argument("--num-requests", type=int, default=1500,
                    help="requests per offered rate (open-loop mode)")
    ap.add_argument("--flush-ms", type=float, default=10.0,
                    help="micro-batching latency bound: a partial batch "
                         "is dispatched once its oldest request has "
                         "waited this long (open-loop mode)")
    ap.add_argument("--max-in-flight", type=int, default=2,
                    help="dispatched-but-uncollected batch budget "
                         "(open-loop mode; 1 = no overlap)")
    ap.add_argument("--feed-dtype",
                    choices=["float32", "bfloat16", "int8"],
                    default="float32",
                    help="H2D dtype for region features "
                         "(decode.feed_dtype); bfloat16 halves the "
                         "dominant transfer on a tunnel-attached chip, "
                         "int8 (host quantize + device dequant, "
                         "data/featquant.py) halves it again")
    ap.add_argument("--ab-feed", default="",
                    help="paired interleaved feed-dtype A/B for the "
                         "open-loop mode, e.g. 'bfloat16,int8': both "
                         "servers share params in one process and runs "
                         "alternate A,B,A,B per rate — the only honest "
                         "protocol on a tunnel whose bandwidth moves "
                         "more day-to-day than the knob does "
                         "(docs/DESIGN.md round-5 item 3)")
    ap.add_argument("--pairs", type=int, default=3,
                    help="A/B pairs per offered rate (--ab-feed)")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from captionkit.utils.cache import enable_compilation_cache

    enable_compilation_cache()

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
        "decode.feed_dtype": args.feed_dtype,
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

    if args.ab_feed:
        if not args.rates:
            raise SystemExit("--ab-feed requires --rates")
        feeds = [s.strip() for s in args.ab_feed.split(",")]
        if len(feeds) != 2:
            raise SystemExit("--ab-feed expects exactly two dtypes")
        servers = {}
        for feed in feeds:
            s = CaptionServer(
                cfg.override({"decode.feed_dtype": feed}), params, model,
                src.vocab, ladder=ladder,
            )
            s.warmup()
            servers[feed] = s
        pool = [
            rng.standard_normal(
                (dims["num_regions"], dims["feat_dim"])).astype(np.float32)
            for _ in range(64)
        ]
        out = []
        for rate in [float(x) for x in args.rates.split(",")]:
            pairs = []
            for _ in range(args.pairs):
                rec = {}
                for feed in feeds:
                    rec[feed] = _open_loop(
                        servers[feed], pool, rate, args.num_requests,
                        args.flush_ms, args.max_in_flight,
                    )["achieved_rps"]
                rec["delta_pct"] = round(
                    100.0 * (rec[feeds[1]] / rec[feeds[0]] - 1.0), 1)
                pairs.append(rec)
                print(json.dumps({"offered_rps": rate, **rec}), flush=True)
            deltas = sorted(p["delta_pct"] for p in pairs)
            out.append({
                "offered_rps": rate,
                "pairs": pairs,
                "median_delta_pct": deltas[len(deltas) // 2],
                "delta_spread_pct": round(deltas[-1] - deltas[0], 1),
            })
        print(json.dumps({
            "metric": (
                f"serve sustained A/B {feeds[1]} vs {feeds[0]} "
                f"({args.arch}, beam=5, batch={args.batch}, "
                f"ladder={list(servers[feeds[0]].ladder)}, "
                f"flush_ms={args.flush_ms}, "
                f"max_in_flight={args.max_in_flight}, interleaved "
                f"{args.pairs} pairs/rate, {args.num_requests} "
                f"requests/run)"
            ),
            "results": out,
        }))
        return 0

    if args.rates:
        # Sustained-load mode: warm every rung first (no first-use
        # compiles inside the timed window), then sweep offered rates.
        server.warmup()
        pool = [
            rng.standard_normal(
                (dims["num_regions"], dims["feat_dim"])).astype(np.float32)
            for _ in range(64)
        ]
        results = []
        for rate in [float(x) for x in args.rates.split(",")]:
            rec = _open_loop(server, pool, rate, args.num_requests,
                             args.flush_ms, args.max_in_flight)
            results.append(rec)
            print(json.dumps(rec), flush=True)
        print(json.dumps({
            "metric": (
                f"serve sustained load ({args.arch}, beam=5, "
                f"batch={args.batch}, ladder={list(server.ladder)}, "
                f"flush_ms={args.flush_ms}, "
                f"max_in_flight={args.max_in_flight}, Poisson arrivals, "
                f"{args.num_requests} requests/rate; latency is "
                f"queueing-inclusive from scheduled arrival)"
            ),
            "results": results,
        }))
        return 0

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
