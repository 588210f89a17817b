"""Run the decode-bench A/B matrix for the session's candidate perf levers
and append one JSON line per run to a results file.

Levers measured (each vs the same-session baseline, because tunnel-day
variance swamps cross-day comparisons — docs/DESIGN.md):
  * beam history layout: register (production) vs backptr
  * decode-step cell kernels: xla (production) vs pallas (ops/megastep)
  * the two combined
  * DCNet with the winning combination
  * int8-quantized head (serving knob: measures the speed side of the
    trade; quality deltas measured separately by caption-change rate)

Usage:  python examples/bench_decode_matrix.py [--out FILE] [--quick]
Each bench.py child gets its own timeout so one hung tunnel window can't
eat the matrix; failures are recorded, not fatal.

``--lsweep`` (round 4, VERDICT r3 weak #6) replaces the matrix with the
register-vs-backptr max_len sweep (22/40/64): the backptr impl's claimed
niche is long decodes — its per-step state is L-free while the register
impl carries [B·K, L] token registers through every step — and the sweep
measures where (whether) the crossover actually is.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MATRIX = [
    ("editnet baseline", []),
    ("editnet backptr", ["--beam-impl", "backptr"]),
    ("editnet pallas-cells", ["--cell-impl", "pallas"]),
    ("editnet backptr+pallas-cells",
     ["--beam-impl", "backptr", "--cell-impl", "pallas"]),
    ("editnet baseline (repeat)", []),
    ("editnet int8-head", ["--head-quant", "int8"]),
    ("dcnet baseline", ["--arch", "dcnet"]),
    ("dcnet pallas-cells", ["--arch", "dcnet", "--cell-impl", "pallas"]),
    ("dcnet int8-head", ["--arch", "dcnet", "--head-quant", "int8"]),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "bench_matrix.jsonl"))
    ap.add_argument("--quick", action="store_true",
                    help="2048 images instead of 5000 per point")
    ap.add_argument("--timeout", type=int, default=1200)
    ap.add_argument("--lsweep", action="store_true",
                    help="register-vs-backptr beam-history max_len sweep "
                         "(22/40/64) instead of the lever matrix")
    args = ap.parse_args()

    base = [sys.executable, os.path.join(REPO, "bench.py"),
            "--no-baseline"]
    if args.quick:
        base += ["--images", "2048"]

    matrix = MATRIX
    if args.lsweep:
        matrix = [
            (f"lsweep editnet {impl} L={L}",
             ["--max-len", str(L), "--beam-impl", impl])
            for L in (22, 40, 64)
            for impl in ("register", "backptr")
        ]

    for name, extra in matrix:
        t0 = time.time()
        rec = {"name": name, "argv": extra}
        try:
            proc = subprocess.run(
                base + extra, cwd=REPO, capture_output=True, text=True,
                timeout=args.timeout,
            )
            line = (proc.stdout.strip().splitlines() or [""])[-1]
            rec["rc"] = proc.returncode
            try:
                rec["result"] = json.loads(line)
            except json.JSONDecodeError:
                rec["stdout_tail"] = proc.stdout[-300:]
                rec["stderr_tail"] = proc.stderr[-500:]
        except subprocess.TimeoutExpired:
            rec["rc"] = -1
            rec["error"] = f"timeout after {args.timeout}s"
        rec["wall_s"] = round(time.time() - t0, 1)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        value = (rec.get("result") or {}).get("value")
        print(f"{name}: value={value} rc={rec.get('rc')} "
              f"wall={rec['wall_s']}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
