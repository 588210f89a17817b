"""The serving example (examples/serve_captions.py) answers a JSON-lines
request stream: micro-batching, tail-batch padding, flush control."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SMALL = [
    "--set", "model.emb_dim=16", "--set", "model.hidden_dim=24",
    "--set", "model.att_dim=8", "--set", "model.feat_dim=12",
    "--set", "model.num_regions=4", "--set", "decode.beam_size=3",
    "--set", "decode.max_decode_len=8",
]


def test_serve_round_trip():
    rng = np.random.default_rng(0)
    reqs = []
    for i in range(5):  # 5 requests, batch 4 -> one full + one tail batch
        reqs.append(json.dumps({
            "id": i,
            "features_inline": rng.standard_normal((4, 12)).round(3)
            .tolist(),
            "caption": "a dog runs",
        }))
    reqs.append(json.dumps({"flush": True}))
    # A malformed-shape request must produce an error line, not a crash.
    reqs.append(json.dumps({"id": 99, "features_inline": [[0.0]],
                            "caption": "x"}))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples/serve_captions.py"),
         "--synthetic", "--cpu", "--batch", "4", *SMALL],
        input="\n".join(reqs) + "\n",
        capture_output=True, text=True, timeout=560, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    lines = [json.loads(x) for x in proc.stdout.strip().splitlines()]
    assert lines[0]["ready"] is True
    resp = {r["id"]: r for r in lines[1:] if "caption" in r}
    assert sorted(resp) == [0, 1, 2, 3, 4]
    assert all(isinstance(r["caption"], str) for r in resp.values())
    # Identical feature+caption requests across batches agree (the tail
    # batch pads by repetition; padding must not leak into answers).
    errors = [r for r in lines[1:] if "error" in r]
    assert len(errors) == 1 and errors[0]["id"] == 99
