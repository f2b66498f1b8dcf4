"""Diagnostics, checkpointing, profiling-hook tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from autorally_tpu.io import load_controller_state, save_controller_state
from autorally_tpu.runtime.diagnostics import (Diagnostics,
                                               DiagnosticsAggregator, ERROR,
                                               OK, WARN)
from autorally_tpu.runtime.profiling import SolveTimer
from autorally_tpu.solver.mppi import ControllerState


def test_diagnostics_worst_level_rollup():
    agg = DiagnosticsAggregator(publish_hz=1000.0)
    chassis = agg.component("chassis")
    gps = agg.component("gps")
    chassis.diag_ok("serial", "connected")
    chassis.tick("wheelSpeeds data")
    chassis.tick("wheelSpeeds data")
    gps.diag_warn("fix", "float RTK")
    report = agg.maybe_publish(now=1.0)
    assert report["level"] == "warn"
    assert report["components"]["chassis"]["ticks"]["wheelSpeeds data"] == 2
    gps.diag_error("fix", "no fix")
    report = agg.maybe_publish(now=3.0)
    assert report["level"] == "error"
    # ticks reset per publish interval
    assert report["components"]["chassis"]["ticks"] == {}


def test_diagnostics_publish_rate_limited():
    agg = DiagnosticsAggregator(publish_hz=1.0)
    agg.component("x").diag_ok("k")
    assert agg.maybe_publish(now=10.0) is not None
    assert agg.maybe_publish(now=10.5) is None
    assert agg.maybe_publish(now=11.1) is not None


def test_controller_state_checkpoint_roundtrip(tmp_path):
    import jax

    cs = ControllerState(
        U=jnp.arange(20, dtype=jnp.float32).reshape(10, 2),
        control_hist=jnp.ones((2, 2)),
        state_solution=jnp.zeros((10, 7)),
        control_solution=jnp.full((10, 2), 0.5),
        key=jax.random.PRNGKey(42))
    path = str(tmp_path / "cs.npz")
    save_controller_state(cs, path)
    cs2 = load_controller_state(path)
    for a, b in zip(cs, cs2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_solve_timer_percentiles():
    t = SolveTimer()
    for v in [1.0, 2.0, 3.0, 10.0]:
        t.record("solve", v)
    s = t.summary()["solve"]
    assert s["count"] == 4
    assert s["mean_ms"] == pytest.approx(4.0)
    assert s["max_ms"] == 10.0
    assert "solve" in t.report()
