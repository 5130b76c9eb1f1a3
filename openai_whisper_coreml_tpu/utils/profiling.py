"""Tracing / profiling utilities.

The reference's entire observability story is one wall-clock print around
encode+decode (/root/reference/Whisper/Whisper/ContentView.swift:56,63).
Here: named stage timers aggregated into reports (RTFx per stage), and a
context manager around `jax.profiler` for device-level traces viewable in
TensorBoard/Perfetto (SURVEY.md §5 tracing row).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional


@dataclass
class StageTimer:
    """Accumulates wall time + work units per named stage."""

    totals: Dict[str, float] = field(default_factory=lambda: defaultdict(float))
    counts: Dict[str, int] = field(default_factory=lambda: defaultdict(int))
    units: Dict[str, float] = field(default_factory=lambda: defaultdict(float))

    @contextlib.contextmanager
    def stage(self, name: str, work_units: float = 0.0) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            self.units[name] += work_units

    def report(self) -> Dict[str, Dict[str, float]]:
        out: Dict[str, Dict[str, float]] = {}
        for name, total in self.totals.items():
            entry = {
                "seconds": round(total, 4),
                "calls": self.counts[name],
                "mean_ms": round(1e3 * total / max(self.counts[name], 1), 3),
            }
            if self.units[name]:
                entry["units_per_sec"] = round(self.units[name] / total, 2)
            out[name] = entry
        return out

    def dump(self) -> str:
        return json.dumps(self.report(), sort_keys=True)


@contextlib.contextmanager
def device_trace(logdir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace (TensorBoard/Perfetto) when logdir is set; no-op
    otherwise."""
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
    """Named region inside a device trace (jax.profiler.TraceAnnotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
