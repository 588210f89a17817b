"""Profiling + logging subsystem tests (SURVEY.md §6 rows)."""

import json
import os

import numpy as np

from captionkit.utils.logging import MetricsLogger
from captionkit.utils.profiling import ThroughputCounter, annotate, trace


def test_metrics_logger_jsonl(tmp_path):
    run = str(tmp_path / "run1")
    lg = MetricsLogger(run, tensorboard=False)
    lg.log(1, {"loss": 2.5})
    lg.log(2, {"loss": 2.0, "acc": 0.5})
    lg.close()
    with open(os.path.join(run, "metrics.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert [r["step"] for r in recs] == [1, 2]
    assert recs[1]["acc"] == 0.5
    assert all("time" in r for r in recs)


def test_metrics_logger_append_across_sessions(tmp_path):
    run = str(tmp_path / "run2")
    MetricsLogger(run, tensorboard=False).log(1, {"x": 1.0})
    lg = MetricsLogger(run, tensorboard=False)
    lg.log(2, {"x": 2.0})
    lg.close()
    with open(os.path.join(run, "metrics.jsonl")) as f:
        assert len(f.readlines()) == 2


def test_throughput_counter_warmup():
    import time

    tc = ThroughputCounter(warmup=1)
    tc.update(100)  # excluded
    assert tc.items == 0
    tc.update(50)
    tc.update(50)
    assert tc.items == 100
    time.sleep(0.01)
    assert tc.items_per_sec > 0


def test_trace_noop_and_annotation():
    with trace(None):
        x = np.arange(4).sum()
    with annotate("host-phase"):
        x += 1
    assert x == 7


def test_trace_writes_profile(tmp_path):
    import jax
    import jax.numpy as jnp

    d = str(tmp_path / "prof")
    with trace(d):
        jax.device_get(jnp.arange(8) * 2)
    # jax.profiler writes a plugins/profile tree under the log dir.
    found = []
    for root, _, files in os.walk(d):
        found.extend(files)
    assert found, "no trace files written"
