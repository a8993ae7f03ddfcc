"""Tracing / profiling hooks (SURVEY.md §5: the reference has none beyond
tqdm; the TPU build makes profiler traces and per-step timing first-class)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof).

    Usage:
        with profiling.trace("/tmp/trace"):
            engine.sample(...)
    """
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock section timing.

    Device synchronization happens ONLY when the caller passes ``sync_on``
    (the section's result) — without it a section around an async jax
    dispatch measures dispatch latency, not device completion.  Note the
    tunneled-TPU caveat: block_until_ready can return early there; for
    trustworthy numbers materialize one element to host (see bench.py's
    sync helper) or use jax.profiler traces.
    """

    def __init__(self):
        self.records: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def section(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                import jax
                jax.block_until_ready(sync_on)
            self.records.setdefault(name, []).append(time.perf_counter() - t0)

    def time_fn(self, name: str, fn, *args, **kwargs):
        import jax
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        self.records.setdefault(name, []).append(time.perf_counter() - t0)
        return out

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, ts in self.records.items():
            out[name] = {
                "count": len(ts),
                "total_s": sum(ts),
                "mean_ms": 1000.0 * sum(ts) / len(ts),
                "min_ms": 1000.0 * min(ts),
                "max_ms": 1000.0 * max(ts),
            }
        return out

    def report(self) -> str:
        lines = []
        for name, s in self.summary().items():
            lines.append(f"{name:30s} n={s['count']:<4d} mean={s['mean_ms']:9.2f}ms "
                         f"min={s['min_ms']:9.2f}ms max={s['max_ms']:9.2f}ms")
        return "\n".join(lines)
