"""Fully-jitted closed-loop episode runner — simulation at device speed.

The reference evaluates its controller by closing the loop through Gazebo
over ROS at wall-clock rates; its ``debug_mode`` self-propagates the state
inside the controller binary instead (``run_control_loop.cuh:296-302``).
This module is the TPU-native version of that idea taken to its limit: the
*entire episode* — receding-horizon slide, both tube-MPPI solves, the
trajectory-cost arbitration with predicted-controller resync, DDP feedback
gains, and the plant integration under a (possibly different) true model —
is one ``lax.scan`` inside one jitted program.  No host round-trips per
tick, so thousands of control ticks evaluate in seconds; per-tick telemetry
comes back as arrays at the end.

With ``use_feedback_gains=True`` the executed control follows the full
reference pipeline (``autorally_plant.cpp:215-250``): the solution is
alpha-interpolated at the plant's pose rate, the DDP gain matrix is
interpolated the same way, and the clamped ``u_ff + K (x - x_des)`` is
applied — with the NaN-``deltaU`` fallback to pure feedforward.
``pose_substeps`` sets plant integration steps per control tick (the
pose-rate : control-rate ratio; the true model's ``dt`` must equal
``cfg.dt / pose_substeps``).

Use for: lap-time benchmarking, controller regression evaluation,
hyperparameter sweeps, and model-mismatch studies (``params_true`` need
not equal ``params_ctrl``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from autorally_tpu.config import CostParams
from autorally_tpu.models.base import Dynamics
from autorally_tpu.solver.mppi import ControllerState, MPPISolver


class EpisodeResult(NamedTuple):
    states: jnp.ndarray           # (n_ticks, S) true plant states
    controls: jnp.ndarray         # (n_ticks, C) executed controls (substep 0)
    used_actual: jnp.ndarray      # (n_ticks,) bool: actual-state ctrl won
    trajectory_cost: jnp.ndarray  # (n_ticks,)
    ess: jnp.ndarray              # (n_ticks,)
    crash_frac: jnp.ndarray       # (n_ticks,)
    gamma: jnp.ndarray            # (n_ticks,) softmax temperature used


class EpisodeRunner:
    """Tube-MPPI closed loop against a simulated plant, fully on-device."""

    def __init__(self, solver: MPPISolver, true_model: Optional[Dynamics]
                 = None, n_ticks: int = 1000,
                 use_feedback_gains: bool = False, pose_substeps: int = 1,
                 throttle_max: float = 0.65,
                 ess_target_frac: Optional[float] = None,
                 ess_alpha: float = 0.25, ess_headroom: float = 8.0,
                 solver_predicted: Optional[MPPISolver] = None):
        """``ess_target_frac``: enable ON-DEVICE adaptive softmax
        temperature — the :class:`~autorally_tpu.runtime.ess_tuner.EssTuner`
        law (multiplicative step on measured ESS, clamped to
        ``gamma/headroom .. gamma*headroom``) carried through the episode
        scan, so the whole adapt-solve-adapt loop runs at device speed
        with zero host involvement (beyond-reference: the reference pins
        gamma at launch).

        ``solver_predicted``: ASYMMETRIC tube budgets (see
        ``runtime/async_loop.py::AsyncTubeController``) — the
        predicted-state half of the tube runs this (smaller) solver.
        Must share the model and horizon.  The ESS-tuner target (if
        enabled) is sized from the ACTUAL solver's K; the winning
        solve's measured ESS drives the shared gamma either way."""
        from autorally_tpu.solver.mppi import validate_tube_pair

        validate_tube_pair(solver, solver_predicted)
        self.solver = solver
        self.solver_predicted = solver_predicted or solver
        self.true_model = true_model or solver.model
        self.n_ticks = int(n_ticks)
        self.use_feedback_gains = bool(use_feedback_gains)
        self.pose_substeps = int(pose_substeps)
        self.throttle_max = float(throttle_max)
        self._ess_target = None
        if ess_target_frac is not None:
            if not (0.0 < ess_target_frac <= 1.0):
                raise ValueError(
                    f"ess_target_frac in (0, 1]: {ess_target_frac}")
            self._ess_target = float(ess_target_frac) * solver.cfg.num_rollouts
            if self._ess_target > self.solver_predicted.cfg.num_rollouts:
                # an asymmetric tube whose predicted half cannot ever
                # reach the target would drag the shared gamma toward
                # the lower clamp on every predicted-won tick
                raise ValueError(
                    f"ess target {self._ess_target:.0f} (frac of the "
                    f"actual solver's K={solver.cfg.num_rollouts}) "
                    f"exceeds the predicted solver's "
                    f"K={self.solver_predicted.cfg.num_rollouts} — "
                    f"unreachable whenever the predicted controller "
                    f"wins; lower the frac or raise K_pred")
            self._ess_alpha = float(ess_alpha)
            # the clamp band is centered on the EFFECTIVE starting gamma
            # (cfg.gamma or a CostParams.gamma override) inside _episode —
            # centering on cfg.gamma would silently clip a user override
            # outside the cfg-based band back on the first tick (round-4
            # advisor finding)
            self._ess_headroom = float(ess_headroom)
        expected_dt = solver.cfg.dt / self.pose_substeps
        if abs(self.true_model.dt - expected_dt) > 1e-9:
            raise ValueError(
                f"true_model.dt={self.true_model.dt} must equal "
                f"cfg.dt/pose_substeps={expected_dt}")
        if self.use_feedback_gains:
            from autorally_tpu.solver.ddp import DDPSolver
            self.ddp = DDPSolver(solver.model, solver.cfg.dt,
                                 solver.cfg.num_timesteps)
        self._run = jax.jit(self._episode)

    def _executed_control(self, tau, state, chosen_ctrl, chosen_states,
                          gains):
        """Reference control publication at pose time ``tau`` seconds after
        the solve (``autorally_plant.cpp:215-250``): alpha-interpolated
        feedforward, optionally + interpolated-gain feedback, clamped;
        NaN feedback falls back to feedforward."""
        cfg = self.solver.cfg
        T = cfg.num_timesteps
        lo = jnp.clip(jnp.floor(tau / cfg.dt).astype(jnp.int32), 0, T - 1)
        hi = jnp.clip(lo + 1, 0, T - 1)
        alpha = tau / cfg.dt - lo.astype(jnp.float32)
        u_ff = ((1 - alpha) * chosen_ctrl[lo] + alpha * chosen_ctrl[hi])
        if not self.use_feedback_gains:
            return u_ff
        x_des = ((1 - alpha) * chosen_states[lo] + alpha * chosen_states[hi])
        K = (1 - alpha) * gains[lo] + alpha * gains[hi]      # (C, S)
        dU = K @ (state - x_des)
        u_fb = jnp.stack([
            jnp.clip(u_ff[0] + dU[0], -0.99, 0.99),
            jnp.clip(u_ff[1] + dU[1], -0.99, self.throttle_max),
        ])
        return jnp.where(jnp.any(jnp.isnan(dU)), u_ff, u_fb)

    def _episode(self, params_ctrl, params_true, cost_params: CostParams,
                 costmap, state0, cs_a: ControllerState,
                 cs_p: ControllerState,
                 obstacle_traj=None) -> EpisodeResult:
        solver = self.solver
        solver_p = self.solver_predicted
        cfg = solver.cfg
        stride = cfg.optimization_stride
        M = self.pose_substeps

        def tick(carry, i):
            cs_a, cs_p, state, gamma = carry
            # moving obstacles: this tick's circle positions ride the
            # traced CostParams (costs/obstacles.py live-update path)
            cp = (cost_params if obstacle_traj is None
                  else cost_params.replace(obstacles=obstacle_traj[i]))
            if self._ess_target is not None:
                # adaptive temperature: both tube halves solve at the
                # carried gamma (same law as runtime/ess_tuner.py)
                cp = cp.replace(gamma=gamma)
            # receding-horizon slide (run_control_loop.cuh:206-215)
            cs_a = solver._slide(cs_a, jnp.int32(stride))
            cs_p = solver_p._slide(cs_p, jnp.int32(stride))
            # actual-state and predicted-state solves (:218-219)
            cs_a, st_a = solver._solve(params_ctrl, cp, costmap,
                                       state, cs_a)
            cs_p, st_p = solver_p._solve(params_ctrl, cp, costmap,
                                         cs_p.state_solution[0], cs_p)
            # arbitration by computed trajectory cost (:246-286)
            use_actual = st_a.trajectory_cost < st_p.trajectory_cost
            pick = lambda a, p: jnp.where(use_actual, a, p)
            chosen_ctrl = pick(cs_a.control_solution, cs_p.control_solution)
            chosen_states = pick(cs_a.state_solution, cs_p.state_solution)
            # resync predicted controller when actual wins (:263-266)
            cs_p = cs_p._replace(
                state_solution=chosen_states,
                control_solution=chosen_ctrl,
                U=pick(cs_a.U, cs_p.U))

            # DDP feedback gains around the chosen solution
            # (computeFeedbackGains, mppi_controller.cu:427-439)
            if self.use_feedback_gains:
                rngs = jnp.reshape(params_ctrl["control_rngs"], (-1, 2))[-2:]
                gains = self.ddp.run(
                    params_ctrl, state, pick(cs_a.U, cs_p.U), chosen_states,
                    chosen_ctrl, rngs[:, 0], rngs[:, 1]).feedback_gain
            else:
                gains = None

            # plant propagation under the TRUE model at pose rate
            # (debug-mode self-propagation, run_control_loop.cuh:296-302,
            # through the plant's interp+feedback pipeline)
            def sim_step(s, j):
                tau = j.astype(jnp.float32) * (cfg.dt / M)
                u = self._executed_control(tau, s, chosen_ctrl,
                                           chosen_states, gains)
                s_next, _ = self.true_model.update_state(params_true, s, u)
                return s_next, u

            state, u_exec = lax.scan(sim_step, state,
                                     jnp.arange(stride * M))

            gamma_used = gamma
            if self._ess_target is not None:
                # next tick's temperature from the winning solve's ESS
                # (the EssTuner law, traced; parity-tested against the
                # host tuner)
                from autorally_tpu.runtime.ess_tuner import gamma_step_traced

                gamma = gamma_step_traced(
                    gamma, pick(st_a.ess, st_p.ess), self._ess_target,
                    self._ess_alpha, g_lo, g_hi)

            out = (state, u_exec[0], use_actual,
                   pick(st_a.trajectory_cost, st_p.trajectory_cost),
                   pick(st_a.ess, st_p.ess),
                   pick(st_a.crash_frac, st_p.crash_frac),
                   gamma_used)
            return (cs_a, cs_p, state, gamma), out

        from autorally_tpu.config import effective_gamma

        gamma0 = jnp.float32(effective_gamma(cfg, cost_params))
        if self._ess_target is not None:
            # multiplicative headroom band around the effective start
            g_lo = gamma0 / self._ess_headroom
            g_hi = gamma0 * self._ess_headroom
        (_, _, _, _), outs = lax.scan(
            tick, (cs_a, cs_p, state0.astype(jnp.float32), gamma0),
            jnp.arange(self.n_ticks))
        return EpisodeResult(*outs)

    def run(self, params_ctrl, cost_params, costmap, state0,
            params_true=None, seed_a: int = 0, seed_p: int = 1,
            obstacle_traj=None) -> EpisodeResult:
        """Run the episode; returns per-tick telemetry arrays.

        ``obstacle_traj``: optional (n_ticks, capacity, 3) array of
        per-tick obstacle circles (requires the solver's cost to be an
        :class:`~autorally_tpu.costs.obstacles.ObstacleCost`) — MOVING
        obstacles evaluated fully on device inside the episode scan.
        """
        cs_a = self.solver.init_state(seed_a)
        cs_p = self.solver_predicted.init_state(seed_p)
        cs_a = cs_a._replace(state_solution=cs_a.state_solution.at[0].set(
            jnp.asarray(state0, dtype=jnp.float32)))
        cs_p = cs_p._replace(state_solution=cs_p.state_solution.at[0].set(
            jnp.asarray(state0, dtype=jnp.float32)))
        if obstacle_traj is not None:
            from autorally_tpu.costs.obstacles import ObstacleCost

            if not isinstance(self.solver.cost, ObstacleCost):
                raise TypeError(
                    "obstacle_traj requires the solver's cost to be an "
                    "ObstacleCost — nothing else reads CostParams."
                    f"obstacles (got {type(self.solver.cost).__name__})")
            obstacle_traj = jnp.asarray(obstacle_traj, dtype=jnp.float32)
            if obstacle_traj.shape[0] != self.n_ticks:
                raise ValueError(
                    f"obstacle_traj has {obstacle_traj.shape[0]} ticks, "
                    f"episode has {self.n_ticks}")
        return self._run(params_ctrl,
                         params_true if params_true is not None
                         else params_ctrl,
                         cost_params, costmap,
                         jnp.asarray(state0, dtype=jnp.float32), cs_a, cs_p,
                         obstacle_traj)
