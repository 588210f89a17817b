"""The caption-edit server (captionkit.serve, CLI `serve`) answers a
JSON-lines request stream: micro-batching, tail-batch padding, flush
control, per-request error answers."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SMALL = [
    "--set", "model.emb_dim=16", "--set", "model.hidden_dim=24",
    "--set", "model.att_dim=8", "--set", "model.feat_dim=12",
    "--set", "model.num_regions=4", "--set", "decode.beam_size=3",
    "--set", "decode.max_decode_len=8",
]


def _requests():
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
    reqs.append("this is not json")
    return reqs


def _check(stdout: str):
    lines = [json.loads(x) for x in stdout.strip().splitlines()]
    assert lines[0]["ready"] is True
    resp = {r["id"]: r for r in lines[1:] if "caption" in r}
    assert sorted(resp) == [0, 1, 2, 3, 4]
    assert all(isinstance(r["caption"], str) for r in resp.values())
    errors = [r for r in lines[1:] if "error" in r]
    assert len(errors) == 2  # bad shape + bad JSON
    assert errors[0]["id"] == 99


@pytest.mark.parametrize("entry", ["cli", "example_shim"])
def test_serve_round_trip(entry):
    if entry == "cli":
        cmd = [sys.executable, "-m", "captionkit.cli", "--platform", "cpu",
               "serve", "--synthetic", "--batch", "4", *SMALL]
    else:
        cmd = [sys.executable,
               os.path.join(REPO, "examples/serve_captions.py"),
               "--synthetic", "--cpu", "--batch", "4", *SMALL]
    proc = subprocess.run(
        cmd, input="\n".join(_requests()) + "\n",
        capture_output=True, text=True, timeout=560, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    _check(proc.stdout)
