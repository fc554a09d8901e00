"""Tracing / profiling / debug utilities (SURVEY.md §5).

The reference's only instrumentation is infer_time.py's CUDA-event timing and
ad-hoc FLOP counters; the TPU-native equivalents are ``jax.profiler`` traces
(viewable in TensorBoard/XProf/Perfetto), XLA cost analysis
(analysis/counts.py), and a NaN-debug mode.
"""

import contextlib
import json
import os
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mhada_trace") -> Iterator[None]:
    """jax.profiler trace context; open the dir with TensorBoard/XProf."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """Raise on NaN production inside jitted code (debug runs only — disables
    some fusions)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class MetricsLogger:
    """Structured per-step metrics -> JSONL (replaces tqdm postfix dicts,
    reference train_image.py:147-158)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._fh = open(path, "a") if path else None
        self._t0 = time.time()

    def log(self, step: int, metrics: dict, **extra) -> dict:
        row = {
            "step": step,
            "time": round(time.time() - self._t0, 3),
            **{k: float(v) for k, v in metrics.items()},
            **extra,
        }
        if self._fh:
            self._fh.write(json.dumps(row) + "\n")
            self._fh.flush()
        return row

    def close(self):
        if self._fh:
            self._fh.close()
