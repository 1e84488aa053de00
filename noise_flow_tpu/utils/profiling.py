"""Profiling & tracing.

The reference only had wall-clock phase timers in the console line
(ref:train_noise_flow.py:389,426,470,501-535 — `tr/ts/tsm/tv/T`) and dead
`tf.summary` calls with no FileWriter (SURVEY.md §5). Here: the same phase
timers as a reusable object, plus real device profiling via jax.profiler
(TensorBoard-loadable traces).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class PhaseTimers:
    """Accumulating named wall-clock timers; renders the reference's compact
    status line (`tr=12.3s ts=1.2s ...`)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def line(self) -> str:
        total = sum(self.totals.values())
        parts = [f"{k}={v:.1f}s" for k, v in self.totals.items()]
        return " ".join(parts + [f"T={total:.1f}s"])

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def device_trace(logdir: Optional[str]):
    """jax.profiler trace context; no-op when logdir is falsy.

    View with: tensorboard --logdir <logdir> (trace_viewer tab), or
    xprof. Captures XLA/Pallas kernel timelines on TPU.
    """
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up in the profiler timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
