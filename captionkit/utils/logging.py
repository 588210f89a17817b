"""Structured run logging (SURVEY.md §6 'Metrics / logging / observability').

The reference prints AverageMeter lines; the rebuild writes structured
scalar records: every run gets a JSONL artifact (one record per call), and
when TensorFlow is importable the same scalars also go to a TensorBoard
summary writer. Nothing here is required by the training loops — they call
it when given a logger.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsLogger:
    """Append-only JSONL scalar log with optional TensorBoard mirroring."""

    def __init__(self, run_dir: str, *, tensorboard: bool = True):
        os.makedirs(run_dir, exist_ok=True)
        self.run_dir = run_dir
        self.path = os.path.join(run_dir, "metrics.jsonl")
        self._fh = open(self.path, "a")
        self._tb = None
        if tensorboard:
            try:  # TF is an optional host-side dependency
                import tensorflow as tf  # type: ignore

                self._tb = tf.summary.create_file_writer(
                    os.path.join(run_dir, "tb")
                )
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: dict[str, float],
            *, wall: Optional[float] = None) -> None:
        rec = {"step": int(step), "time": wall or time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._tb is not None:
            import tensorflow as tf  # type: ignore

            with self._tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(k, float(v), step=int(step))

    def close(self) -> None:
        self._fh.close()
        if self._tb is not None:
            self._tb.close()


def enable_nan_debugging() -> None:
    """Numeric sanitization (SURVEY.md §6 'Race detection / sanitizers'
    row): make any NaN produced under jit raise immediately."""
    import jax

    jax.config.update("jax_debug_nans", True)
