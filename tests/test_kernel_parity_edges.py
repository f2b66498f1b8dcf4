"""Edge-case parity pins for the fused Pallas kernels (interpret mode).

Regression tests for two review findings: (1) the roll-over crash latch
must check only s_1..s_{T-1}, like the scan path and the reference — not
the final integrated state s_T; (2) the neural-field kernel must route
NaN world coordinates to map (0, 0) exactly like
``NeuralCostmap.lookup_ch0``'s nan_to_num, so a NaN state produces the
same cost on every backend path.
"""

import numpy as np

import jax
import jax.numpy as jnp

from autorally_tpu.config import CostParams, MPPIConfig
from autorally_tpu.costs import MPPICost
from autorally_tpu.costs.costmap import make_costmap
from autorally_tpu.costs.neural_costmap import fit_neural_costmap
from autorally_tpu.models import NeuralNetDynamics
from autorally_tpu.ops import rollout_kernel as rk
from autorally_tpu.solver.mppi import MPPISolver
from autorally_tpu.tools.track_generator import oval_track

K, T = 128, 10


def _constant_deriv_model(cfg, roll_deriv: float):
    """Single-linear-layer MLP with W=0: the dynamics derivative is the
    bias — a controllable constant [roll', ux', uy', yaw''] per step."""
    model = NeuralNetDynamics(cfg.dt, layers=(6, 4),
                              control_ranges=cfg.control_ranges)
    params = model.init_params(jax.random.PRNGKey(0))
    params["weights"] = [jnp.zeros_like(params["weights"][0])]
    params["biases"] = [jnp.asarray([roll_deriv, 0.0, 0.0, 0.0],
                                    jnp.float32)]
    return model, params


def test_roll_crash_ignores_final_state():
    """|roll| crosses 1.57 exactly at s_T: the scan path (roll over
    states[:-1]) reports no crash, and the fused kernel must agree."""
    cfg = MPPIConfig(num_rollouts=K, num_timesteps=T)
    # roll(s_t) = c * dt * t; pick c so s_{T-1} is under and s_T over
    c = 1.57 / ((T - 0.5) * cfg.dt)
    assert (T - 1) * c * cfg.dt < 1.57 < T * c * cfg.dt
    model, params = _constant_deriv_model(cfg, c)
    data, xb, yb = oval_track(ppm=2.0)
    cm = make_costmap(data, xb, yb)
    solver = MPPISolver(model, MPPICost(), cfg)
    # on-track, at rest: no boundary, slip, or speed-driven crash terms
    state = jnp.asarray([25.0, 0.0, np.pi / 2, 0.0, 0.0, 0.0, 0.0],
                        jnp.float32)
    U = jnp.zeros((T, 2), jnp.float32)
    eps = jnp.zeros((T, K, 2), jnp.float32)

    _, _, ref_crash = solver.rollout_costs(params, CostParams(), cm,
                                           state, U, eps)
    _, _, crash = rk.fused_exact_rollout_cost_pallas(
        model, params, cfg, CostParams(), cm, state, U, eps,
        interpret=True)
    assert not np.asarray(ref_crash).any()
    np.testing.assert_array_equal(np.asarray(crash), np.asarray(ref_crash))

    # one step later the crash IS visible to both paths (sanity: the
    # gate suppresses exactly one state, not the whole latch)
    cfg2 = MPPIConfig(num_rollouts=K, num_timesteps=T + 1)
    solver2 = MPPISolver(model, MPPICost(), cfg2)
    U2 = jnp.zeros((T + 1, 2), jnp.float32)
    eps2 = jnp.zeros((T + 1, K, 2), jnp.float32)
    _, _, ref_crash2 = solver2.rollout_costs(params, CostParams(), cm,
                                             state, U2, eps2)
    _, _, crash2 = rk.fused_exact_rollout_cost_pallas(
        model, params, cfg2, CostParams(), cm, state, U2, eps2,
        interpret=True)
    assert np.asarray(ref_crash2).all()
    np.testing.assert_array_equal(np.asarray(crash2),
                                  np.asarray(ref_crash2))


def test_nan_state_matches_scan_on_neural_field():
    """A NaN position must produce the same (finite) track cost in the
    fused neural-field kernel as on the XLA path (both sample (0, 0))."""
    cfg = MPPIConfig(num_rollouts=K, num_timesteps=T)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.init_params(jax.random.PRNGKey(1))
    data, xb, yb = oval_track(ppm=2.0)
    nc, _ = fit_neural_costmap(make_costmap(data, xb, yb), epochs=50)
    solver = MPPISolver(model, MPPICost(), cfg)
    state = jnp.asarray([np.nan, 0.0, np.pi / 2, 0.0, 2.0, 0.0, 0.0],
                        jnp.float32)
    U = jnp.tile(jnp.asarray([0.0, 0.3], jnp.float32), (T, 1))
    eps = jax.random.normal(jax.random.PRNGKey(7), (T, K, 2), jnp.float32)

    ref_total, _, ref_crash = solver.rollout_costs(
        params, CostParams(), nc, state, U, eps)
    total, _, crash = rk.fused_rollout_cost_pallas(
        model, params, cfg, CostParams(), nc, state, U, eps,
        interpret=True)
    assert np.isfinite(np.asarray(ref_total)).all()
    np.testing.assert_allclose(np.asarray(total), np.asarray(ref_total),
                               rtol=2e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(crash), np.asarray(ref_crash))
