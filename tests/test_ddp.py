"""DDP/iLQR solver tests.

The reference has zero DDP tests (SURVEY.md §4).  Strategy here:
1. analytic check — on linear dynamics with quadratic cost, one iLQR
   backward pass IS the finite-horizon LQR recursion, so gains must match a
   NumPy Riccati recursion exactly;
2. behavioral check — gains computed around an MPPI solution for the real
   car model must pull a perturbed state back toward the nominal
   trajectory (the tube-MPPI tracking role, autorally_plant.cpp:229-250).
"""

import numpy as np

import jax
import jax.numpy as jnp

from autorally_tpu.models.base import Dynamics, control_ranges_array
from autorally_tpu.models import NeuralNetDynamics
from autorally_tpu.solver.ddp import DDPConfig, DDPSolver

NN_NPZ = "/root/reference/autorally_control/src/path_integral/params/models/autorally_nnet_09_12_2018.npz"


class LinearDynamics(Dynamics):
    """ds/dt = A_c s + B_c u with 7 states / 2 controls (test-only)."""

    def __init__(self, dt, A_c, B_c):
        super().__init__(dt)
        self.A_c = jnp.asarray(A_c, dtype=jnp.float32)
        self.B_c = jnp.asarray(B_c, dtype=jnp.float32)

    def state_deriv(self, params, states, controls):
        return states @ self.A_c.T + controls @ self.B_c.T

    def enforce_constraints(self, params, controls):
        return controls  # unconstrained for the LQR check


def lqr_gains_numpy(A, B, Q, R, Qf, T, dt):
    """Finite-horizon discrete LQR mirroring the reference backward pass
    (ddp.h:88-117) with tracking targets == nominal (dx formulation)."""
    S = A.shape[0]
    Vxx = Qf.copy()
    Ks = np.zeros((T, B.shape[1], S), dtype=np.float64)
    for k in range(T - 2, -1, -1):
        qux = B.T @ Vxx @ A
        qxx = Q * dt + A.T @ Vxx @ A
        quu = R * dt + B.T @ Vxx @ B
        K = -np.linalg.solve(quu, qux)
        Vxx = qxx + qux.T @ K
        Vxx = 0.5 * (Vxx + Vxx.T)
        Ks[k] = K
    return Ks


def test_ilqr_equals_lqr_on_linear_system(rng):
    T, dt = 30, 0.02
    S, C = 7, 2
    A_c = rng.randn(S, S).astype(np.float32) * 0.3
    B_c = rng.randn(S, C).astype(np.float32) * 0.5
    model = LinearDynamics(dt, A_c, B_c)
    solver = DDPSolver(model, dt, T)

    A = np.eye(S) + np.asarray(A_c, dtype=np.float64) * dt
    B = np.asarray(B_c, dtype=np.float64) * dt
    Q = np.diag(solver.cfg.Q_diag)
    R = np.diag(solver.cfg.R_diag)
    Qf = np.diag(solver.cfg.Qf_diag)

    x0 = np.zeros(S, dtype=np.float32)
    U = np.zeros((T, C), dtype=np.float32)
    targets_x = np.zeros((T, S), dtype=np.float32)
    targets_u = np.zeros((T, C), dtype=np.float32)
    big = np.full(C, 1e9, dtype=np.float32)

    res = solver.run({}, x0, U, targets_x, targets_u, -big, big)
    Ks_ref = lqr_gains_numpy(A, B, Q, R, Qf, T, dt)
    np.testing.assert_allclose(np.asarray(res.feedback_gain), Ks_ref,
                               rtol=5e-4, atol=5e-5)
    # last-timestep gain is zero by construction (ddp.h backward runs H-2..0)
    assert np.abs(np.asarray(res.feedback_gain[-1])).max() == 0


def test_gains_stabilize_car_tracking():
    dt, T = 0.02, 100
    model = NeuralNetDynamics(dt)
    params = model.load_params(NN_NPZ)
    solver = DDPSolver(model, dt, T)

    # Nominal: drive straight at 5 m/s.
    x0 = np.array([0, 0, 0, 0, 5.0, 0, 0], dtype=np.float32)
    U = np.tile(np.array([0.0, 0.3], dtype=np.float32), (T, 1))
    s = jnp.asarray(x0)
    xs = []
    for t in range(T):
        xs.append(np.asarray(s))
        s, _ = model.update_state(params, s, jnp.asarray(U[t]))
    targets_x = np.stack(xs)
    rngs = np.asarray(params["control_rngs"])

    res = ddp_res = solver.run(params, x0, U, targets_x, U,
                               rngs[:, 0], rngs[:, 1])
    K0 = np.asarray(res.feedback_gain)

    def track(use_gains):
        # Start displaced 0.5 m laterally with 10 deg heading error.
        st = jnp.asarray(x0 + np.array([0, 0.5, 0.17, 0, 0, 0, 0],
                                       dtype=np.float32))
        errs = []
        for t in range(T):
            du = K0[t] @ (np.asarray(st) - targets_x[t]) if use_gains else 0.0
            u = jnp.asarray(U[t] + du, dtype=jnp.float32)
            st, _ = model.update_state(params, st, u)
            errs.append(np.linalg.norm(np.asarray(st)[:2] - targets_x[t][:2]))
        return np.array(errs)

    err_fb = track(True)
    err_ff = track(False)
    # Feedback must strongly reduce final tracking error vs open loop
    # (measured: 0.13 m vs 2.29 m over the 2 s horizon).
    assert err_fb[-1] < 0.2 * err_ff[-1], (err_fb[-1], err_ff[-1])
    assert np.isfinite(K0).all()


def test_line_search_multi_iteration():
    """num_iterations > 1 exercises the alpha line search; cost must not
    increase across accepted iterations."""
    dt, T = 0.02, 30
    model = NeuralNetDynamics(dt)
    params = model.load_params(NN_NPZ)

    x0 = np.array([0, 0, 0, 0, 3.0, 0, 0], dtype=np.float32)
    U = np.tile(np.array([0.2, 0.4], dtype=np.float32), (T, 1))
    # Target: stay at x0 with zero controls (decelerate smoothly).
    targets_x = np.tile(x0, (T, 1))
    targets_u = np.zeros((T, 2), dtype=np.float32)
    rngs = np.asarray(params["control_rngs"])

    s1 = DDPSolver(model, dt, T, DDPConfig(num_iterations=1))
    s3 = DDPSolver(model, dt, T, DDPConfig(num_iterations=3))
    r1 = s1.run(params, x0, U, targets_x, targets_u, rngs[:, 0], rngs[:, 1])
    r3 = s3.run(params, x0, U, targets_x, targets_u, rngs[:, 0], rngs[:, 1])
    assert float(r3.cost) <= float(r1.cost) + 1e-3
    assert np.isfinite(np.asarray(r3.control_traj)).all()


def test_multi_iteration_cost_monotone():
    """Accepted cost is non-increasing in num_iterations: a failed line
    search keeps the previous trajectory (the reference's alpha->0 accept,
    ddp.h:136-143, made exact), so more iterations can never end worse."""
    dt, T = 0.02, 40
    model = NeuralNetDynamics(dt)
    params = model.load_params(NN_NPZ)

    x0 = np.array([0, 0, 0.3, 0, 4.0, 0.5, 0], dtype=np.float32)
    U = np.tile(np.array([-0.3, 0.6], dtype=np.float32), (T, 1))
    targets_x = np.tile(x0, (T, 1))
    targets_u = np.zeros((T, 2), dtype=np.float32)
    rngs = np.asarray(params["control_rngs"])

    costs = []
    for n in (1, 2, 4, 6):
        s = DDPSolver(model, dt, T, DDPConfig(num_iterations=n))
        r = s.run(params, x0, U, targets_x, targets_u,
                  rngs[:, 0], rngs[:, 1])
        assert np.isfinite(float(r.cost))
        costs.append(float(r.cost))
    for a, b in zip(costs, costs[1:]):
        assert b <= a + 1e-3, costs


def test_boxqp_ddp_respects_control_limits():
    """use_boxqp solves the feedforward step against the box and zeroes
    feedback rows of clamped controls (control-limited DDP; the reference
    ships boxqp.h but never wires it in — here it is an opt-in)."""
    dt, T = 0.02, 30
    model = NeuralNetDynamics(dt)
    params = model.load_params(NN_NPZ)

    x0 = np.array([0, 0, 0, 0, 2.0, 0, 0], dtype=np.float32)
    U = np.tile(np.array([0.0, 0.9], dtype=np.float32), (T, 1))
    # Aggressive target far away => large feedforward that must clamp.
    tgt = x0 + np.array([5, 5, 0, 0, 3, 0, 0], dtype=np.float32)
    targets_x = np.tile(tgt, (T, 1))
    targets_u = np.zeros((T, 2), dtype=np.float32)
    lo = np.array([-0.2, -0.2], dtype=np.float32)
    hi = np.array([0.2, 0.95], dtype=np.float32)

    s = DDPSolver(model, dt, T, DDPConfig(num_iterations=2, use_boxqp=True))
    r = s.run(params, x0, U, targets_x, targets_u, lo, hi)
    ff = np.asarray(r.feedforward)
    K = np.asarray(r.feedback_gain)
    un = np.asarray(r.control_traj)
    assert np.isfinite(ff).all() and np.isfinite(K).all()
    # Feedforward step stays inside the delta-u box around the nominal.
    assert (un >= lo - 1e-5).all() and (un <= hi + 1e-5).all()
    # Wherever the QP clamped a control hard against the box, the
    # corresponding feedback row must be (near-)zero.
    clamped = (np.abs(un[:-1] - hi) < 1e-6) | (np.abs(un[:-1] - lo) < 1e-6)
    if clamped.any():
        rows = K[:-1][clamped]
        assert np.abs(rows).max() < 1e-4
