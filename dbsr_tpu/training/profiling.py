"""Profiling / tracing hooks.

The reference's only instrumentation is FPS counters in the train loop
(`trainers/simple_trainer.py:100-127`). TPU-native equivalent: the same
lightweight step-time meters plus optional ``jax.profiler`` device traces
(viewable in TensorBoard / Perfetto), toggled by ``DBSR_TPU_TRACE_DIR`` so
production runs pay zero overhead.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

import jax


@contextlib.contextmanager
def maybe_trace(step: int, start_step: int = 5, num_steps: int = 5):
    """Trace steps [start_step, start_step+num_steps) of a training run to
    ``$DBSR_TPU_TRACE_DIR`` when set; no-op otherwise."""
    trace_dir = os.environ.get("DBSR_TPU_TRACE_DIR")
    if not trace_dir:
        yield
        return
    if step == start_step:
        jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        if step == start_step + num_steps - 1:
            jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall-time and throughput meter (reference
    ``_init_timing``/``_print_stats``)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.perf_counter()
        self.last = self.t0
        self.samples = 0

    def step(self, n_samples: int):
        now = time.perf_counter()
        dt = now - self.last
        self.last = now
        self.samples += n_samples
        return {
            "step_time_s": dt,
            "fps": n_samples / dt if dt > 0 else 0.0,
            "avg_fps": self.samples / (now - self.t0),
        }


def annotate(name: str):
    """Named profiler span for device traces:
    ``with annotate("synthesis"): ...``"""
    return jax.profiler.TraceAnnotation(name)
