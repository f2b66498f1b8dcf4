"""Dynamic obstacle cost tests (the reference's unimplemented TODO,
costs.cu:296-299, made real)."""

import numpy as np
import pytest

import jax.numpy as jnp

from autorally_tpu.config import CostParams, MPPIConfig
from autorally_tpu.costs.costmap import make_costmap
from autorally_tpu.costs.obstacles import ObstacleCost, make_obstacles
from autorally_tpu.models import NeuralNetDynamics
from autorally_tpu.solver.mppi import MPPISolver
from autorally_tpu.tools.track_generator import oval_track

NN_NPZ = "/root/reference/autorally_control/src/path_integral/params/models/autorally_nnet_09_12_2018.npz"


def test_make_obstacles_padding():
    obs = make_obstacles([[1.0, 2.0, 0.5]], capacity=4)
    assert obs.shape == (4, 3)
    assert float(obs[0, 2]) == 0.5
    assert (np.asarray(obs[1:, 2]) == -1.0).all()
    with pytest.raises(ValueError):
        make_obstacles(np.zeros((5, 3)), capacity=4)


def test_obstacle_cost_geometry():
    cost = ObstacleCost(make_obstacles([[0.0, 0.0, 1.0]]),
                        obstacle_coeff=100.0, inflation=1.0)
    p = CostParams()
    xs = jnp.asarray([0.0, 1.5, 2.5, 0.5])
    ys = jnp.zeros(4)
    crash = jnp.zeros(4, dtype=jnp.int32)
    c, crash = cost.obstacle_cost_c(p, xs, ys, crash)
    c = np.asarray(c)
    assert c[0] == 100.0               # at center: full penalty
    assert 0 < c[1] < 100.0            # in the inflation band
    assert c[2] == 0.0                 # outside the band
    np.testing.assert_array_equal(np.asarray(crash), [1, 0, 0, 1])


def test_solver_avoids_obstacle():
    """Place an obstacle dead ahead: the plan must steer around it."""
    cfg = MPPIConfig(num_rollouts=512, num_timesteps=40)
    data, xb, yb = oval_track(half_length=30.0, half_width=18.0,
                              track_width=8.0, ppm=4.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)

    # moving at 5 m/s along +y from the right apex; obstacle 4 m ahead
    start = np.array([30.0, 0.0, np.pi / 2, 0, 5.0, 0, 0], dtype=np.float32)
    obstacle = [[29.7, 4.0, 0.6]]

    def min_clearance(cost):
        solver = MPPISolver(model, cost, cfg)
        cs = solver.init_state()
        for _ in range(4):
            cs, _ = solver.solve(params, CostParams(desired_speed=5.0), cm,
                                 start, cs)
        traj = np.asarray(cs.state_solution)
        return np.min(np.hypot(traj[:, 0] - 29.7, traj[:, 1] - 4.0))

    from autorally_tpu.costs import MPPICost

    clear_plain = min_clearance(MPPICost())
    clear_obst = min_clearance(ObstacleCost(make_obstacles(obstacle),
                                            obstacle_coeff=300.0,
                                            inflation=1.5))
    # without the obstacle term the plan drives straight through it
    assert clear_plain < 0.6
    assert clear_obst > clear_plain + 0.2
    assert clear_obst > 0.6


def test_obstacle_hot_swap_shapes():
    cost = ObstacleCost(make_obstacles([], capacity=8))
    cost2 = cost.with_obstacles([[1, 1, 0.3], [2, 2, 0.4]])
    assert cost2.obstacles.shape == (8, 3)


def _fused_setup(K=256, T=24):
    import jax

    cfg = MPPIConfig(num_rollouts=K, num_timesteps=T)
    data, xb, yb = oval_track(ppm=2.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    # directly in the 1.4 m the swarm covers in T steps at ~3 m/s
    cost = ObstacleCost(make_obstacles([[25.0, 1.0, 0.4], [24.6, 0.6, 0.25]],
                                       capacity=8),
                        obstacle_coeff=250.0, inflation=1.5)
    solver = MPPISolver(model, cost, cfg)
    state = jnp.asarray([25.0, 0.0, np.pi / 2, 0.0, 3.0, 0.0, 0.0],
                        dtype=jnp.float32)
    U = jnp.tile(jnp.asarray([0.0, 0.3], jnp.float32), (T, 1))
    eps = jax.random.normal(jax.random.PRNGKey(9), (T, K, 2),
                            dtype=jnp.float32)
    return cfg, cm, model, params, cost, solver, state, U, eps


def test_obstacles_fuse_into_exact_kernel():
    """Round-2: ObstacleCost fuses into the exact-costmap Pallas kernel
    (circle terms on the SMEM scalar vector) — costs AND the crash latch
    must match the scan path, which routes through
    ObstacleCost.track_cost_c."""
    from autorally_tpu.ops import rollout_kernel as rk

    cfg, cm, model, params, cost, solver, state, U, eps = _fused_setup()
    ref_total, ref_useq, ref_crash = solver.rollout_costs(
        params, CostParams(), cm, state, U, eps)
    total, useq, crash = rk.fused_exact_rollout_cost_pallas(
        model, params, cfg, CostParams(), cm, state, U, eps,
        l1_cost=cost.l1_cost, interpret=True,
        obstacles=cost.obstacles, obstacle_coeff=cost.obstacle_coeff,
        inflation=cost.inflation)
    assert int(np.asarray(ref_crash).sum()) > 0, "test needs hits to mean something"
    np.testing.assert_array_equal(np.asarray(crash), np.asarray(ref_crash))
    np.testing.assert_allclose(np.asarray(total), np.asarray(ref_total),
                               rtol=2e-5, atol=1e-4)


def test_obstacles_fuse_into_neural_kernel():
    """Same, through the neural-field fused kernel: obstacle terms are
    identical (the circles don't involve the costmap); compare the
    obstacle-term delta between fused and scan paths."""
    from autorally_tpu.costs.neural_costmap import fit_neural_costmap
    from autorally_tpu.ops import rollout_kernel as rk

    cfg, cm, model, params, cost, solver, state, U, eps = _fused_setup()
    nc, _ = fit_neural_costmap(cm, epochs=200)

    # scan path with the neural costmap (lookup dispatches through nc)
    ref_total, _, ref_crash = solver.rollout_costs(
        params, CostParams(), nc, state, U, eps)
    total, _, crash = rk.fused_rollout_cost_pallas(
        model, params, cfg, CostParams(), nc, state, U, eps,
        l1_cost=cost.l1_cost, interpret=True,
        obstacles=cost.obstacles, obstacle_coeff=cost.obstacle_coeff,
        inflation=cost.inflation)
    np.testing.assert_array_equal(np.asarray(crash), np.asarray(ref_crash))
    np.testing.assert_allclose(np.asarray(total), np.asarray(ref_total),
                               rtol=2e-4, atol=1e-3)


def test_obstacle_solver_dispatch_fused_matches_scan():
    """Full solve through the solver's own dispatch: forced-on Pallas
    (interpret) with ObstacleCost must take the fused path and agree with
    the scan solve."""
    cfg, cm, model, params, cost, _, state, U, eps = _fused_setup()
    cfg_p = cfg.replace(use_pallas_rollout=True)
    sp = MPPISolver(model, cost, cfg_p)
    sp._pallas_interpret = True
    assert sp._fusable_cost() and sp.use_pallas_rollout
    ss = MPPISolver(model, cost, cfg)
    assert not ss.use_pallas_rollout

    csp, stp = sp.solve(params, CostParams(), cm, state, sp.init_state())
    css, sts = ss.solve(params, CostParams(), cm, state, ss.init_state())
    np.testing.assert_allclose(np.asarray(csp.U), np.asarray(css.U),
                               rtol=2e-4, atol=2e-4)
    assert float(stp.crash_frac) == pytest.approx(float(sts.crash_frac))


def test_live_obstacle_update_via_cost_params():
    """CostParams.obstacles overrides the baked array on every path —
    the zero-recompile moving-obstacle update.  The same solver instance
    (same jitted program) must react to a moved circle."""
    cfg, cm, model, params, cost, solver, state, U, eps = _fused_setup()
    p_baked = CostParams()
    # move both circles far away through the traced argument
    moved = make_obstacles([[100.0, 100.0, 0.4]], capacity=8)
    p_moved = p_baked.replace(obstacles=moved)

    t_baked, _, c_baked = solver.rollout_costs(params, p_baked, cm,
                                               state, U, eps)
    t_moved, _, c_moved = solver.rollout_costs(params, p_moved, cm,
                                               state, U, eps)
    assert int(np.asarray(c_baked).sum()) > 0
    assert int(np.asarray(c_moved).sum()) < int(np.asarray(c_baked).sum())
    assert float(np.asarray(t_baked).mean()) > float(
        np.asarray(t_moved).mean())

    # fused kernel path honors it identically (interpret mode)
    from autorally_tpu.ops import rollout_kernel as rk

    tot_f, _, crash_f = rk.fused_exact_rollout_cost_pallas(
        model, params, cfg, p_moved, cm, state, U, eps,
        l1_cost=cost.l1_cost, interpret=True,
        obstacles=moved, obstacle_coeff=cost.obstacle_coeff,
        inflation=cost.inflation)
    np.testing.assert_array_equal(np.asarray(crash_f), np.asarray(c_moved))
    np.testing.assert_allclose(np.asarray(tot_f), np.asarray(t_moved),
                               rtol=2e-5, atol=1e-4)


def test_full_solve_live_obstacle_no_retrace():
    """The jitted solve must accept a new obstacle array (same capacity)
    without retracing: trace count stays at 1 across the update."""
    import jax

    cfg, cm, model, params, cost, _, state, U, eps = _fused_setup()
    solver = MPPISolver(model, cost, cfg)
    traces = {"n": 0}
    orig = solver._solve

    def counting_solve(*a, **k):
        traces["n"] += 1
        return orig(*a, **k)

    solver._solve_jit = jax.jit(counting_solve)
    cs = solver.init_state()
    p0 = CostParams(obstacles=cost.obstacles)
    cs, s0 = solver.solve(params, p0, cm, state, cs)
    p1 = CostParams(obstacles=make_obstacles([[100.0, 100.0, 0.4]],
                                             capacity=8))
    cs, s1 = solver.solve(params, p1, cm, state, cs)
    assert traces["n"] == 1, "obstacle move retraced the solve"
    assert float(s1.crash_frac) <= float(s0.crash_frac)


def test_pallas_refused_for_model_subclass_overrides():
    """A subclass overriding dynamics() must NOT auto-take the Pallas
    path (the kernels would evaluate the base model's math)."""
    from autorally_tpu.solver.mppi import _kernel_form_consistent

    class Custom(NeuralNetDynamics):
        def dynamics(self, params, states, controls):
            return super().dynamics(params, states, controls) * 2.0

    assert not _kernel_form_consistent(Custom(0.02))
    assert _kernel_form_consistent(NeuralNetDynamics(0.02))

    class Redeclared(NeuralNetDynamics):
        KERNEL_KIND = "mlp"   # explicit opt-in after overriding

        def dynamics(self, params, states, controls):
            return super().dynamics(params, states, controls)

        def kernel_weights(self, params):
            return super().kernel_weights(params)

    assert _kernel_form_consistent(Redeclared(0.02))
