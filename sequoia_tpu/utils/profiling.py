"""Tracing and throughput accounting.

The reference has no profiling beyond tqdm bars (SURVEY.md section 5).
Here every pipeline stage can report items/sec and slides/hour — the
north-star metric — and wrap itself in a ``jax.profiler`` trace for TPU
timeline inspection.
"""

from __future__ import annotations

import contextlib
import json
import time


class StageTimer:
    """Accumulates per-stage wall time + item counts; reports slides/hour."""

    def __init__(self):
        self.stages: dict[str, dict] = {}

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 1):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            s = self.stages.setdefault(name, {"seconds": 0.0, "items": 0})
            s["seconds"] += dt
            s["items"] += items

    def rate(self, name: str) -> float:
        s = self.stages.get(name)
        return s["items"] / s["seconds"] if s and s["seconds"] > 0 else 0.0

    def slides_per_hour(self, name: str = None) -> float:
        if name is not None:
            return self.rate(name) * 3600.0
        total = sum(s["seconds"] for s in self.stages.values())
        items = min((s["items"] for s in self.stages.values()), default=0)
        return items / total * 3600.0 if total > 0 else 0.0

    def report(self) -> str:
        lines = []
        for name, s in self.stages.items():
            lines.append(f"{name:24s} {s['items']:8d} items  "
                         f"{s['seconds']:8.2f}s  {self.rate(name):10.2f}/s")
        return "\n".join(lines)

    def to_json(self) -> str:
        return json.dumps(self.stages)


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """jax.profiler trace wrapper; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
