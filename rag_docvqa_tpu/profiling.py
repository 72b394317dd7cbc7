"""Profiling / tracing (SURVEY.md §5: the reference only has wall-clock
segment timers; the TPU equivalent is jax.profiler traces + device timers).

  * `trace(logdir)`     — context manager around jax.profiler.trace; view in
    TensorBoard or xprof.
  * `StageTimer`        — named wall-clock stages with device sync, giving the
    reference's load/layout/retrieval/generation split (eval.py:104-112) with
    honest device timing (blocks on a representative output per stage).
  * `annotate(name)`    — TraceAnnotation for kernel-level attribution.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace when a logdir is given, no-op otherwise."""
    if logdir:
        with jax.profiler.trace(logdir):
            yield
    else:
        yield


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync: Any = None):
        """Time a stage; pass a jax array as `sync` to block on device work.

        NOTE: on remote/tunneled platforms block_until_ready may be async —
        prefer passing a small output and we fetch a scalar."""
        t0 = time.perf_counter()
        yield
        if sync is not None:
            try:
                jax.device_get(jax.tree.leaves(sync)[0].ravel()[0])
            except Exception:
                pass
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        total = sum(self.totals.values()) or 1.0
        return {
            name: {
                "total_s": round(t, 4),
                "mean_s": round(t / max(self.counts[name], 1), 4),
                "pct": round(100 * t / total, 1),
            }
            for name, t in self.totals.items()
        }
