"""Profiling & counters.

TPU-native analog of the reference's SIGPROF sampling profiler + phase
scopes + ad-hoc atomic counters (src/libcore/profiler.cpp, SURVEY §5.1):

  * ``trace(path)`` — context manager around ``jax.profiler`` producing an
    xprof/TensorBoard trace of device kernels (the real per-op timeline,
    replacing the bitmask sampling profiler).
  * ``Timer`` — wall timer matching the reference Timer usage
    (vrl.cpp:88,440).
  * ``Counters`` — named render statistics (query counts, map sizes, NLI
    min/max) accumulated as device scalars and reported at the end, the
    analog of the postprocess dump (vrl.cpp:734-749).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mnt_trace"):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall timer (reference include/mitsuba/core/timer.h)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.time()

    def value(self) -> float:
        return time.time() - self._t0

    def time_string(self) -> str:
        v = self.value()
        if v < 1:
            return f"{v * 1e3:.1f}ms"
        if v < 60:
            return f"{v:.2f}s"
        return f"{v / 60:.1f}m"


class Counters:
    """Named statistic accumulators (device-friendly: values may be jnp
    scalars; conversion happens only at report())."""

    def __init__(self):
        self._acc: Dict[str, list] = {}

    def add(self, name: str, value):
        self._acc.setdefault(name, []).append(value)

    def report(self) -> Dict[str, float]:
        out = {}
        for k, vs in self._acc.items():
            out[k] = float(sum(float(jnp.asarray(v)) for v in vs))
        return out

    def log(self, printer=print):
        for k, v in sorted(self.report().items()):
            printer(f"  [counter] {k}: {v:g}")
