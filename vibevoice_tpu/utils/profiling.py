"""Tracing / profiling utilities (SURVEY.md §5.1).

The reference's observability is a tqdm bar and ad-hoc time deltas
(reference: modeling_vibevoice_inference.py:424-428,
demo/inference_from_file.py:383-405).  Here: a ``jax.profiler`` trace context
for TensorBoard-grade device profiles, plus a lightweight structured stage
timer that generation and serving code report into.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class StageTimer:
    """Accumulates wall-time per named stage; thread-compatible usage is one
    timer per generation call."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def record(self, name: str, seconds: float) -> None:
        self.totals[name] += seconds
        self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {k: {"total_s": round(v, 4), "count": self.counts[k],
                    "mean_ms": round(1000 * v / max(self.counts[k], 1), 3)}
                for k, v in self.totals.items()}

    def json(self) -> str:
        return json.dumps(self.summary())


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Wrap a region in a jax.profiler trace (TensorBoard viewable).
    No-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
