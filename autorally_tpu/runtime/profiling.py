"""Profiling hooks: device traces and per-solve timing telemetry.

The reference's profiling story is NVIDIA Nsight launched around a
ROS-decoupled controller run (``autorally_control/profiler.md``,
``profiler_max_iter``).  TPU-natively that maps to ``jax.profiler`` device
traces (viewable in TensorBoard/XProf) plus in-band timing percentiles —
this module wraps both.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import numpy as np


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/autorally_tpu_trace"):
    """Capture a jax.profiler device trace around a code block
    (the Nsight-run equivalent; open with TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class SolveTimer:
    """Latency percentiles for named stages (solve, slide, gains, ...)."""

    def __init__(self):
        self.samples: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def time(self, name: str, block_on=None):
        """Time a stage; pass the stage's output pytree as ``block_on`` to
        include device execution (block_until_ready) in the measurement."""
        t0 = time.perf_counter()
        out = {}
        yield out
        if block_on is not None or "result" in out:
            import jax

            jax.block_until_ready(out.get("result", block_on))
        self.samples.setdefault(name, []).append(
            (time.perf_counter() - t0) * 1000.0)

    def record(self, name: str, ms: float) -> None:
        self.samples.setdefault(name, []).append(ms)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.samples.items():
            a = np.asarray(xs)
            out[name] = {
                "count": int(a.size),
                "mean_ms": float(a.mean()),
                "p50_ms": float(np.percentile(a, 50)),
                "p99_ms": float(np.percentile(a, 99)),
                "max_ms": float(a.max()),
            }
        return out

    def report(self) -> str:
        lines = [f"{'stage':<16} {'n':>5} {'mean':>8} {'p50':>8} "
                 f"{'p99':>8} {'max':>8}  (ms)"]
        for name, s in self.summary().items():
            lines.append(f"{name:<16} {s['count']:>5} {s['mean_ms']:>8.2f} "
                         f"{s['p50_ms']:>8.2f} {s['p99_ms']:>8.2f} "
                         f"{s['max_ms']:>8.2f}")
        return "\n".join(lines)


def count_solve_traces(solver) -> dict:
    """Instrument a solver's jitted solve with a trace counter.

    Rewraps ``solver._solve_jit`` so every retrace increments the
    returned ``{"n": int}`` — the zero-recompile contracts (live
    CostParams updates, gamma tuning) are asserted against this by
    ``tests/test_ess_tuner.py`` and measured by ``tools/ess_demo.py``.
    Must mirror how ``MPPISolver.__init__`` builds the jit (plain
    ``jax.jit``, no static/donated args) — that is why this lives in ONE
    place."""
    import jax

    traces = {"n": 0}
    orig = solver._solve

    def counting(*args, **kw):
        traces["n"] += 1
        return orig(*args, **kw)

    solver._solve_jit = jax.jit(counting)
    return traces
