"""Neural costmap (track field) tests — fit quality and solver integration.

The fused Pallas kernel path is TPU-only; these tests cover the field
itself and the XLA evaluation path on CPU.  TPU parity of the fused kernel
is exercised by ``tests_tpu/test_tpu_kernels.py`` (run on hardware) and by
``bench.py``.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from autorally_tpu.config import CostParams, MPPIConfig
from autorally_tpu.costs import MPPICost
from autorally_tpu.costs.costmap import make_costmap
from autorally_tpu.costs.neural_costmap import fit_neural_costmap
from autorally_tpu.models import NeuralNetDynamics
from autorally_tpu.solver.mppi import MPPISolver
from autorally_tpu.tools.track_generator import oval_track

NN_NPZ = "/root/reference/autorally_control/src/path_integral/params/models/autorally_nnet_09_12_2018.npz"


@pytest.fixture(scope="module")
def fitted():
    data, xb, yb = oval_track(ppm=4.0)
    cm = make_costmap(data, xb, yb)
    nc, metrics = fit_neural_costmap(cm, epochs=1200, batch=8192,
                                     num_freqs=6, hidden=(48, 48))
    return cm, nc, metrics


def test_fit_quality(fitted):
    cm, nc, metrics = fitted
    assert metrics["mae"] < 0.05, metrics
    assert metrics["boundary_flip_rate"] < 0.05, metrics


def test_field_matches_costmap_on_track(fitted):
    cm, nc, _ = fitted
    # sample points on the track surface
    rng = np.random.RandomState(0)
    th = rng.uniform(0, 2 * np.pi, 500)
    xs = (25.0 * np.cos(th)).astype(np.float32)
    ys = (15.0 * np.sin(th)).astype(np.float32)
    exact = np.asarray(cm.lookup_ch0(jnp.asarray(xs), jnp.asarray(ys)))
    approx = np.asarray(nc.lookup_ch0(jnp.asarray(xs), jnp.asarray(ys)))
    assert np.abs(exact - approx).mean() < 0.15


def test_solver_accepts_neural_costmap(fitted):
    cm, nc, _ = fitted
    cfg = MPPIConfig(num_rollouts=128, num_timesteps=24)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    solver = MPPISolver(model, MPPICost(), cfg)
    start = np.array([0.0, -15.0, 0.0, 0.0, 2.0, 0.0, 0.0], dtype=np.float32)
    cs = solver.init_state()
    cs_n, stats_n = solver.solve(params, CostParams(), nc, start, cs)
    cs_e, stats_e = solver.solve(params, CostParams(), cm, start, cs)
    assert np.isfinite(np.asarray(cs_n.U)).all()
    # the approximate field must produce a control plan close to exact
    assert np.abs(np.asarray(cs_n.U) - np.asarray(cs_e.U)).max() < 0.25


def test_lookup_full_channels(fitted):
    _, nc, _ = fitted
    out = nc.lookup(jnp.asarray([0.0]), jnp.asarray([15.0]))
    assert out.shape == (1, 4)
    np.testing.assert_allclose(np.asarray(out[0, 1:]), 0.0)
