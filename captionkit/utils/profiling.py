"""Tracing & throughput counters (SURVEY.md §6 'Tracing / profiling' row).

The reference only prints AverageMeter wall-clock times; the rebuild gets
real tooling:

* ``trace(dir)`` — context manager around any region, dumps a Perfetto/
  TensorBoard-compatible trace via jax.profiler (view with
  tensorboard --logdir or ui.perfetto.dev).
* ``annotate(name)`` — TraceAnnotation for host-side phases so device and
  host activity line up in the trace.
* ``ThroughputCounter`` — captions/sec / tokens/sec, the project's
  north-star counters (BASELINE.json metric).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Profile the enclosed region to log_dir (no-op when None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host annotation visible in the device trace."""
    return jax.profiler.TraceAnnotation(name)


@dataclass
class ThroughputCounter:
    """Steady-state items/sec with a warm-up exclusion window."""

    warmup: int = 1  # number of initial update() calls excluded
    _items: int = 0
    _calls: int = 0
    _t0: float = field(default_factory=time.perf_counter)

    def update(self, n_items: int) -> None:
        self._calls += 1
        if self._calls <= self.warmup:
            self._t0 = time.perf_counter()
            return
        self._items += n_items

    @property
    def items_per_sec(self) -> float:
        if self._items == 0:
            return 0.0
        dt = time.perf_counter() - self._t0
        return self._items / dt if dt > 0 else 0.0

    @property
    def items(self) -> int:
        return self._items
