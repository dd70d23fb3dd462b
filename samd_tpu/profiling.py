"""Step-level profiling for the decode loop.

The reference instruments with global wall-time decorators and draft-source
counters (/root/reference/profile_utils.py); here the engine reports
per-phase timings directly (host draft lookup, device step, host update) plus
the draft-source/accept-length histograms already kept by
``engine.StepStats``, and a context manager wraps ``jax.profiler`` for XLA
traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional


class PhaseTimer:
    """Accumulates wall time per phase; attach as ``engine.profiler``."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def record(self, name: str, seconds: float) -> None:
        self.totals[name] += seconds
        self.counts[name] += 1

    def report(self, normalize_by: Optional[str] = None) -> List[dict]:
        """Rows of {phase, total_s, calls, mean_ms, frac}; ``frac`` is
        relative to ``normalize_by`` (reference export_result normalizes by a
        root tag, profile_utils.py:54-69)."""
        base = self.totals.get(normalize_by, None) if normalize_by else None
        rows = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            total = self.totals[name]
            rows.append({
                "phase": name,
                "total_s": round(total, 4),
                "calls": self.counts[name],
                "mean_ms": round(1e3 * total / max(self.counts[name], 1), 3),
                "frac": round(total / base, 4) if base else None,
            })
        return rows

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def xla_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (TensorBoard/xprof format)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
