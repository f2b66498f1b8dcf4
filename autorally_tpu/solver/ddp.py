"""Scan-based iLQR/DDP feedback-gain solver in pure JAX.

Replaces the reference's Eigen DDP stack
(``autorally_control/include/autorally_control/ddp/ddp.h:50-157``,
``ddp_model_wrapper.h``, ``ddp_tracking_costs.h``) with ``lax.scan``
forward/backward passes.  Jacobians come from ``jax.jacfwd`` of the actual
dynamics (replacing both the hand-derived backprop ``computeGrad``
(``neural_net_model.cu:233-264``) and the numeric central-difference
fallback (``ddp_dynamics.h:41-85``)), so any differentiable model gets
analytic-quality gains for free.

Algorithm parity with ``DDP::run``:

- discrete Jacobians ``A = I + df*dt``, ``B = dfu*dt`` (ddp.h:72-73)
- quadratic tracking running cost around the MPPI solution with
  Q = diag(0.5, 0.5, 0.25, 0, 0.05, 0.01, 0.01), R = diag(10, 10),
  Qf = 0 (``mppi_controller.cu:410-417``)
- backward Riccati recursion with symmetrized Vxx (ddp.h:88-117); the 2x2
  ``quu`` solve is a closed-form inverse instead of LDLT
- forward pass with control clamping and alpha line search; iteration 0
  always accepts (ddp.h:119-151) — matching the launch default
  ``num_iters = 1`` exactly.  When the line search exhausts its alphas
  (``alpha < min_alpha``) without improving on the previous iteration, the
  previous trajectory is kept explicitly: the reference "accepts" the
  alpha≈0 forward pass in that branch (ddp.h:136-143), and with dx(0)=0 a
  zero-alpha rollout reproduces the previous trajectory exactly, so
  keeping it is the same fixed point without the float noise of a
  near-zero step.  Accepted cost is therefore non-increasing across
  iterations.
- optional box-constrained feedforward step (``use_boxqp``): the
  reference ships BoxQP (boxqp.h) but never calls it from DDP; here it
  can be enabled to solve ``min 0.5 l'Quu l + Qu'l`` subject to
  ``u_min <= u+l <= u_max`` per timestep, zeroing feedback rows of
  clamped controls (Tassa-style control-limited DDP).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from autorally_tpu.models.base import Dynamics
from autorally_tpu.solver.boxqp import boxqp


class DDPResult(NamedTuple):
    """Per-timestep gains, mirroring ``OptimizerResult`` (result.h:10-68)."""

    feedback_gain: jnp.ndarray     # (T, C, S)
    feedforward: jnp.ndarray       # (T, C)
    state_traj: jnp.ndarray        # (T, S)
    control_traj: jnp.ndarray      # (T, C)
    cost: jnp.ndarray              # scalar total cost


@dataclasses.dataclass(frozen=True)
class DDPConfig:
    num_iterations: int = 1
    # Reference weights (mppi_controller.cu:410-417).
    Q_diag: Tuple[float, ...] = (0.5, 0.5, 0.25, 0.0, 0.05, 0.01, 0.01)
    R_diag: Tuple[float, ...] = (10.0, 10.0)
    Qf_diag: Tuple[float, ...] = (0.0,) * 7
    min_alpha: float = 1e-4
    # Solve the feedforward step as a box QP against the control limits
    # and zero clamped feedback rows (control-limited DDP).  Off by
    # default: the reference instantiates BoxQP but never invokes it.
    use_boxqp: bool = False


class DDPSolver:
    """Feedback-gain solver for tube-MPPI tracking
    (``computeFeedbackGains``, mppi_controller.cu:427-439)."""

    def __init__(self, model: Dynamics, dt: float, num_timesteps: int,
                 cfg: DDPConfig = DDPConfig()):
        self.model = model
        self.dt = float(dt)
        self.T = int(num_timesteps)
        self.cfg = cfg
        self.Q = jnp.diag(jnp.asarray(cfg.Q_diag, dtype=jnp.float32))
        self.R = jnp.diag(jnp.asarray(cfg.R_diag, dtype=jnp.float32))
        self.Qf = jnp.diag(jnp.asarray(cfg.Qf_diag, dtype=jnp.float32))
        self._run_jit = jax.jit(self._run)

    # -- cost pieces (TrackingCostDDP, ddp_tracking_costs.h:38-52) ----------

    def _running_cost(self, x, u, x_tgt, u_tgt):
        dx = x - x_tgt
        du = u - u_tgt
        return dx @ self.Q @ dx + du @ self.R @ du

    # -- core ----------------------------------------------------------------

    def _run(self, model_params, x0: jnp.ndarray, U: jnp.ndarray,
             x_targets: jnp.ndarray, u_targets: jnp.ndarray,
             u_min: jnp.ndarray, u_max: jnp.ndarray) -> DDPResult:
        model, dt, T = self.model, self.dt, self.T
        S, C = model.STATE_DIM, model.CONTROL_DIM

        def f(x, u):
            return model.state_deriv(model_params, x, u)

        def rollout(x0, U, clamp_tail: bool):
            # Initial rollout clamps controls 0..H-3 only (ddp.h:57-64);
            # the line-search forward pass clamps all (ddp.h:127-134).
            def step(x, inp):
                t, u = inp
                if clamp_tail:
                    u = jnp.clip(u, u_min, u_max)
                else:
                    u = jnp.where(t < T - 2, jnp.clip(u, u_min, u_max), u)
                x_next = x + f(x, u) * dt
                return x_next, (x, u)

            _, (xs, us) = lax.scan(step, x0, (jnp.arange(T), U))
            return xs, us

        xs, us = rollout(x0, U, clamp_tail=False)

        jac = jax.vmap(jax.jacfwd(lambda x, u: f(x, u), argnums=(0, 1)))

        def iteration(carry, it):
            xs, us, prev_cost = carry

            dfx, dfu = jac(xs, us)                       # (T,S,S), (T,S,C)
            A = jnp.eye(S) + dfx * dt                    # Phi (ddp.h:72-73)
            B = dfu * dt

            dx_t = xs - x_targets
            du_t = us - u_targets
            # dL (ddp_tracking_costs.h:45-48)
            Lx = dx_t @ self.Q                           # (T, S)
            Lu = du_t @ self.R                           # (T, C)

            # terminal boundary (ddp.h:81-85); xf = last target column
            # (mppi_controller.cu:437)
            Vxx_T = self.Qf
            Vx_T = self.Qf @ (xs[-1] - x_targets[-1])

            def backward(carry, inp):
                Vxx, Vx = carry
                A_k, B_k, Lx_k, Lu_k, u_k = inp
                qx = Lx_k * dt + A_k.T @ Vx
                qu = Lu_k * dt + B_k.T @ Vx
                qux = B_k.T @ Vxx @ A_k                  # d2L_ux == 0
                qxx = self.Q * dt + A_k.T @ Vxx @ A_k
                quu = self.R * dt + B_k.T @ Vxx @ B_k
                if self.cfg.use_boxqp:
                    # Control-limited step: feedforward from the box QP in
                    # delta-u coordinates, feedback only on the free set
                    # (boxqp.h role; the reference never wires this in).
                    res = boxqp(quu, qu, u_min - u_k, u_max - u_k)
                    fmask = res.free.astype(quu.dtype)
                    quu_f = (quu * fmask[:, None] * fmask[None, :]
                             + jnp.diag(1.0 - fmask))
                    K_k = -jnp.linalg.solve(quu_f, qux * fmask[:, None])
                    l_k = res.x
                else:
                    quu_inv = _inv2x2(quu) if C == 2 else jnp.linalg.inv(quu)
                    K_k = -quu_inv @ qux                 # (C, S)
                    l_k = -quu_inv @ qu                  # (C,)
                Vxx_new = qxx + qux.T @ K_k
                Vxx_new = 0.5 * (Vxx_new + Vxx_new.T)
                Vx_new = qx + qux.T @ l_k
                return (Vxx_new, Vx_new), (K_k, l_k)

            # k = T-2 .. 0 (ddp.h:88); gains at T-1 stay zero.
            inputs = (A[:-1], B[:-1], Lx[:-1], Lu[:-1], us[:-1])
            _, (Ks, ls) = lax.scan(backward, (Vxx_T, Vx_T), inputs,
                                   reverse=True)
            Ks = jnp.concatenate([Ks, jnp.zeros((1, C, S))], axis=0)
            ls = jnp.concatenate([ls, jnp.zeros((1, C))], axis=0)

            def forward(alpha):
                def step(x, inp):
                    t, u_ref, x_ref, K_k, l_k = inp
                    du = alpha * l_k + K_k @ (x - x_ref)
                    u = jnp.clip(u_ref + du, u_min, u_max)
                    x_next = x + f(x, u) * dt
                    c = self._running_cost(x, u, x_targets[t], u_targets[t]) * dt
                    c = jnp.where(t < T - 1, c, 0.0)
                    return x_next, (x, u, c)

                _, (xn, un, cn) = lax.scan(
                    step, xs[0], (jnp.arange(T), us, xs, Ks, ls))
                # cost_(it, H-1) = V_(H-1) terminal (ddp.h:135)
                term = (xn[-1] - x_targets[-1]) @ self.Qf @ (xn[-1] - x_targets[-1])
                return xn, un, jnp.sum(cn) + term

            def cond(loop):
                alpha, _, _, cost, accepted = loop
                return jnp.logical_not(accepted)

            def body(loop):
                alpha, _, _, _, _ = loop
                xn, un, cost = forward(alpha)
                improved = (it == 0) | (cost <= prev_cost)
                exhausted = alpha < self.cfg.min_alpha
                # Exhausted without improvement: keep the previous
                # trajectory (== the reference's alpha->0 accept,
                # ddp.h:136-143, made exact).
                keep_prev = exhausted & jnp.logical_not(improved)
                xn = jnp.where(keep_prev, xs, xn)
                un = jnp.where(keep_prev, us, un)
                cost = jnp.where(keep_prev, prev_cost, cost)
                return (alpha * 0.5, xn, un, cost, improved | exhausted)

            _, xn, un, cost, _ = lax.while_loop(
                cond, body, (jnp.float32(1.0), xs, us,
                             jnp.float32(jnp.inf), jnp.bool_(False)))
            return (xn, un, cost), (Ks, ls)

        carry = (xs, us, jnp.float32(jnp.inf))
        for it in range(self.cfg.num_iterations):        # static unroll
            carry, (Ks, ls) = iteration(carry, it)
        xs, us, cost = carry
        return DDPResult(feedback_gain=Ks, feedforward=ls,
                         state_traj=xs, control_traj=us, cost=cost)

    def run(self, model_params, x0, U, x_targets, u_targets,
            u_min, u_max) -> DDPResult:
        """Compute tracking feedback gains around the MPPI solution.

        Args mirror ``computeFeedbackGains`` (mppi_controller.cu:427-439):
        targets are the nominal state/control solutions.
        """
        return self._run_jit(
            model_params,
            jnp.asarray(x0, dtype=jnp.float32),
            jnp.asarray(U, dtype=jnp.float32),
            jnp.asarray(x_targets, dtype=jnp.float32),
            jnp.asarray(u_targets, dtype=jnp.float32),
            jnp.asarray(u_min, dtype=jnp.float32),
            jnp.asarray(u_max, dtype=jnp.float32))


def _inv2x2(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 2x2 inverse (replaces the reference's LDLT for C=2)."""
    det = m[0, 0] * m[1, 1] - m[0, 1] * m[1, 0]
    return jnp.array([[m[1, 1], -m[0, 1]], [-m[1, 0], m[0, 0]]]) / det
