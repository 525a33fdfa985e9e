"""Profiling: jax.profiler traces + per-stage wall timers.

The reference has no tracing at all (SURVEY §5: thop FLOP counting in a
test file is the closest thing). Here: Perfetto-compatible device traces
via jax.profiler and a lightweight stage timer for the request router.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace (open in Perfetto / TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up on the TraceViewer timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Wall-clock stage timing with device-completion barriers."""

    def __init__(self):
        self.stages: List[Dict] = []

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                import numpy as np

                np.asarray(block_on() if callable(block_on) else block_on)
            self.stages.append({"stage": name,
                                "seconds": time.perf_counter() - t0})

    def summary(self) -> str:
        total = sum(s["seconds"] for s in self.stages)
        lines = [f"{s['stage']:<24} {s['seconds']*1e3:9.1f} ms" for s in self.stages]
        lines.append(f"{'total':<24} {total*1e3:9.1f} ms")
        return "\n".join(lines)


def count_flops(fn, *args, **kwargs) -> Dict[str, float]:
    """Static cost analysis of a jittable function (the reference counts
    FLOPs with thop/ptflops in i2vgen's test_func/test_models.py:10-11;
    here XLA's own compiler estimate replaces instrumentation).

    Returns {'flops', 'bytes_accessed', 'arithmetic_intensity'} for the
    compiled HLO. Counts are per-invocation; fn is compiled but not run.
    """
    import jax

    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns one dict per device
        costs = costs[0]
    flops = float(costs.get("flops", 0.0))
    mem = float(costs.get("bytes accessed", 0.0))
    return {
        "flops": flops,
        "bytes_accessed": mem,
        "arithmetic_intensity": flops / mem if mem else 0.0,
    }
