"""Tracing / profiling utilities.

The reference's only runtime observability is per-chunk RTF logging
(reference: cli/cosyvoice.py:88-137) and eval-side wall clocks.  Here the
orchestrator gets first-class per-stage timers plus optional jax.profiler
trace capture (SURVEY §5.1 calls this out as a day-one requirement).
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict


class StageTimer:
    """Accumulates wall-clock per named stage; thread-unsafe by design (one
    per session)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {
            k: {"total_s": round(v, 4), "count": self.counts[k],
                "mean_ms": round(1e3 * v / max(self.counts[k], 1), 2)}
            for k, v in self.totals.items()
        }

    def log(self, prefix: str = "stages"):
        logging.info("%s: %s", prefix, self.summary())

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard/XProf-compatible)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_rtf(start_time: float, audio_seconds: float, tag: str = "synthesis"):
    """Reference-style per-yield RTF logging (cli/cosyvoice.py:88)."""
    elapsed = time.time() - start_time
    rtf = elapsed / max(audio_seconds, 1e-9)
    logging.info("%s: yield speech len %.2fs, rtf %.4f", tag, audio_seconds, rtf)
    return rtf
