"""Reference CPU decode-throughput denominator (BASELINE.md protocol).

The reference repo decodes batch=1 per image with a Python-loop beam search
on CPU/GPU and publishes no speed numbers (SURVEY.md §7). The reference
code itself is unavailable (empty mount, SURVEY.md §0), so the denominator
is self-measured on a faithful torch CPU twin: same architecture, same
paper-scale dims, batch=1 sgrvinod-style beam search per image
(captionkit.convert.torch_ref.beam_search_slow == SURVEY.md §4.3 call
stack).

Writes the measured captions/sec to BASELINE_CPU.json, which bench.py uses
as vs_baseline's denominator.

Usage: python bench_reference_cpu.py [--images 8] [--beam 5]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import torch

from captionkit.convert.torch_ref import TorchEditNet, beam_search_slow

PAPER_DIMS = dict(vocab=9490, emb=1024, hidden=1024, att=512, feat=2048)
REGIONS = 36
# END = -1 is unreachable: forces the full max_len-step decode, matching
# bench.py's convention (untrained weights would otherwise emit <end>
# immediately and measure nothing).
START, END = 9488, -1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--max-len", type=int, default=22)
    ap.add_argument("--out", default="BASELINE_CPU.json")
    args = ap.parse_args()

    torch.manual_seed(0)
    torch.set_num_threads(torch.get_num_threads())  # default threading
    model = TorchEditNet(PAPER_DIMS["vocab"], PAPER_DIMS["emb"],
                         PAPER_DIMS["hidden"], PAPER_DIMS["att"],
                         PAPER_DIMS["feat"]).eval()
    rng = np.random.default_rng(0)
    feats = torch.from_numpy(
        rng.standard_normal((args.images, REGIONS, PAPER_DIMS["feat"]))
        .astype(np.float32)
    )
    existing = torch.from_numpy(
        rng.integers(4, PAPER_DIMS["vocab"] - 2, (args.images, 22))
        .astype(np.int64)
    )
    lengths = torch.from_numpy(
        rng.integers(8, 23, (args.images,)).astype(np.int64)
    )

    # Warm-up one image (allocator, thread pools).
    beam_search_slow(model, feats[:1], existing[:1], lengths[:1],
                     beam_size=args.beam, start_id=START, end_id=END,
                     max_len=args.max_len)
    t0 = time.perf_counter()
    for i in range(args.images):
        beam_search_slow(
            model, feats[i: i + 1], existing[i: i + 1], lengths[i: i + 1],
            beam_size=args.beam, start_id=START, end_id=END,
            max_len=args.max_len,
        )
    wall = time.perf_counter() - t0
    cps = args.images / wall
    payload = {
        "metric": "captions/sec (reference-style torch CPU, batch=1 "
                  f"python-loop beam={args.beam})",
        "captions_per_sec": cps,
        "images": args.images,
        "wall_s": wall,
        "beam": args.beam,
        "max_len": args.max_len,
        "dims": PAPER_DIMS,
        "torch_threads": torch.get_num_threads(),
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
