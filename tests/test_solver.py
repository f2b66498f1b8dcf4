"""Golden parity tests: the jitted MPPI solver vs the literal NumPy port.

Same injected noise -> the control sequences must agree to float32
tolerance (the reference's determinism hook is its fixed cuRAND seed,
``mppi_controller.cu:330-331``; here noise injection plays that role).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from autorally_tpu.config import CostParams, MPPIConfig
from autorally_tpu.costs import MPPICost
from autorally_tpu.costs.costmap import make_costmap
from autorally_tpu.models import NeuralNetDynamics, BasisFunctionDynamics
from autorally_tpu.solver.mppi import MPPISolver, savitzky_golay
from autorally_tpu.tools.track_generator import oval_track
from tests import reference_mppi as ref

NN_NPZ = "/root/reference/autorally_control/src/path_integral/params/models/autorally_nnet_09_12_2018.npz"
BF_NPZ = "/root/reference/autorally_control/src/path_integral/params/models/basis_function_09_12_2018.npz"
CTRL_RNGS = [[-0.99, 0.99], [-0.99, 0.65]]
COST_DICT = dict(desired_speed=6.0, speed_coeff=4.25, track_coeff=200.0,
                 max_slip_ang=1.25, slip_penalty=10.0, track_slop=0.0,
                 crash_coeff=10000.0, steering_coeff=0.3, throttle_coeff=0.2,
                 boundary_threshold=0.65, discount=0.1)

K, T = 128, 24
START = np.array([0.0, -15.0, 0.0, 0.0, 2.0, 0.0, 0.0], dtype=np.float32)


def build(model_kind="nn"):
    cfg = MPPIConfig(num_rollouts=K, num_timesteps=T, hz=50, gamma=0.15,
                     optimization_stride=1)
    data, xb, yb = oval_track(ppm=4.0)
    cm = make_costmap(data, xb, yb)
    cost = MPPICost()
    p = CostParams(**COST_DICT)
    if model_kind == "nn":
        model = NeuralNetDynamics(cfg.dt, control_ranges=CTRL_RNGS)
        params = model.load_params(NN_NPZ)
        ref_model = ref.RefNNModel.from_npz(NN_NPZ, CTRL_RNGS, cfg.dt)
    else:
        model = BasisFunctionDynamics(cfg.dt, control_ranges=CTRL_RNGS)
        params = model.load_params(BF_NPZ)
        ref_model = ref.RefBFModel.from_npz(BF_NPZ, CTRL_RNGS, cfg.dt)
    ref_costs = ref.RefCosts(data, np.asarray(cm.r_c1), np.asarray(cm.r_c2),
                             np.asarray(cm.trs), COST_DICT)
    solver = MPPISolver(model, cost, cfg)
    return solver, params, p, cm, ref_model, ref_costs, cfg


@pytest.mark.parametrize("model_kind", ["nn", "bf"])
def test_iterate_matches_reference(model_kind, rng):
    solver, params, p, cm, ref_model, ref_costs, cfg = build(model_kind)
    nu = np.array(cfg.exploration_std, dtype=np.float32)
    U0 = rng.uniform(-0.2, 0.2, (T, 2)).astype(np.float32)
    noise = rng.randn(K, T, 2).astype(np.float32)

    U_jax, stats = solver.iterate(
        params, p, cm, jnp.asarray(START), jnp.asarray(U0),
        jnp.asarray(noise.transpose(1, 0, 2)))

    golden = ref.compute_control(START, U0, noise, nu, ref_model, ref_costs,
                                 cfg.gamma, cfg.optimization_stride,
                                 np.zeros((2, 2), dtype=np.float32))

    # Pre-smoothing control update parity: compare against the reference's
    # weighted average (golden['U'] is post-SG; recompute the raw average).
    w = golden["weights"] / golden["normalizer"]
    U_ref_raw = np.einsum("k,ktc->tc", w, golden["du_d"])
    np.testing.assert_allclose(np.asarray(U_jax), U_ref_raw,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(stats.baseline),
                               golden["traj_costs"].min(), rtol=1e-5)
    np.testing.assert_allclose(float(stats.normalizer),
                               golden["normalizer"], rtol=1e-4)
    np.testing.assert_allclose(float(stats.trajectory_cost),
                               golden["trajectory_cost"], rtol=1e-4)


def test_full_solve_matches_reference(rng):
    """End-to-end: iterate + SG smoothing + nominal trajectory."""
    solver, params, p, cm, ref_model, ref_costs, cfg = build("nn")
    nu = np.array(cfg.exploration_std, dtype=np.float32)
    U0 = rng.uniform(-0.2, 0.2, (T, 2)).astype(np.float32)
    noise = rng.randn(K, T, 2).astype(np.float32)
    hist = rng.uniform(-0.1, 0.1, (2, 2)).astype(np.float32)

    golden = ref.compute_control(START, U0, noise, nu, ref_model, ref_costs,
                                 cfg.gamma, cfg.optimization_stride, hist)

    U_jax, _ = solver.iterate(params, p, cm, jnp.asarray(START),
                              jnp.asarray(U0),
                              jnp.asarray(noise.transpose(1, 0, 2)))
    U_smooth = savitzky_golay(U_jax, jnp.asarray(hist))
    np.testing.assert_allclose(np.asarray(U_smooth), golden["U"],
                               rtol=2e-4, atol=2e-4)

    states_sol, controls_sol = solver.nominal_trajectory(
        params, jnp.asarray(START), U_smooth)
    np.testing.assert_allclose(np.asarray(states_sol),
                               golden["state_solution"], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(controls_sol),
                               golden["control_solution"], rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("stride", [1, 2, 3, 5])
def test_slide_matches_reference(stride, rng):
    solver, *_ , cfg = build("nn")
    U = rng.uniform(-0.5, 0.5, (T, 2)).astype(np.float32)
    hist = rng.uniform(-0.5, 0.5, (2, 2)).astype(np.float32)
    init_u = np.array(cfg.init_u, dtype=np.float32)

    cs = solver.init_state()._replace(U=jnp.asarray(U),
                                      control_hist=jnp.asarray(hist))
    out = solver.slide(cs, stride)

    U_ref, hist_ref = ref.slide_control_seq(U, hist, stride, init_u)
    np.testing.assert_allclose(np.asarray(out.U), U_ref, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.control_hist), hist_ref,
                               rtol=1e-6)


def test_noise_free_rollout_unchanged():
    """With zero noise (and no pure-noise band) every rollout executes the
    nominal plan, so the weighted update must return U unchanged."""
    solver, params, p, cm, *_ , cfg = build("nn")
    solver2 = MPPISolver(solver.model, solver.cost,
                         cfg.replace(pure_noise_frac=1.0))
    U0 = jnp.asarray(np.tile([0.1, 0.2], (T, 1)).astype(np.float32))
    eps = jnp.zeros((T, K, 2))
    U_new, stats = solver2.iterate(params, p, cm, jnp.asarray(START), U0, eps)
    np.testing.assert_allclose(np.asarray(U_new), np.asarray(U0),
                               rtol=1e-5, atol=1e-6)
    # all rollouts identical -> ESS equals K
    np.testing.assert_allclose(float(stats.ess), K, rtol=1e-5)


def test_solve_runs_jitted():
    solver, params, p, cm, *_ = build("nn")
    cs = solver.init_state()
    cs2, stats = solver.solve(params, p, cm, START, cs)
    assert cs2.U.shape == (T, 2)
    assert np.isfinite(float(stats.baseline))
    assert float(stats.ess) > 1.0
    # second call hits the jit cache and changes the key
    cs3, _ = solver.solve(params, p, cm, START, cs2)
    assert not np.allclose(np.asarray(cs2.key), np.asarray(cs3.key))
