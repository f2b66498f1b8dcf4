"""Single-device MPPI solver — one jitted program per replan.

TPU-native re-design of the reference solve pipeline
(``MPPIController::computeControl``, ``mppi_controller.cu:600-675``).  The
reference runs three CUDA kernels with a device->host round-trip between
each (rollout -> host min -> normExp -> host sum -> weightedReduction ->
host copy).  Here the entire optimization iteration — noise sampling, K
batched rollouts (``lax.scan`` over the horizon), the cost baseline (min),
softmax weights, normalizer, and the weighted control update — is ONE
jitted XLA program with zero host synchronization; only the initial state
crosses host->device and only the smoothed control sequence crosses back.

Semantics are kept bit-faithful to the reference (verified by golden tests
against an independent NumPy port):

- rollout 0 is noise-free; the last 1% of rollouts are pure noise; the
  first ``opt_delay`` timesteps are frozen (``mppi_controller.cu:130-155``)
- the weighted average uses the *unclamped* perturbed controls (the kernel
  stores ``u`` into ``du_d`` before ``enforceConstraints`` runs,
  ``mppi_controller.cu:153-158``)
- per-timestep running-average cost accumulation starting at t=1
  (``mppi_controller.cu:162-165``)
- crash latch propagates across timesteps, checked after each state update
  (``mppi_controller.cu:176-178``)
- softmax weighting ``exp(-gamma (c - min c))`` and the Σw²/η trajectory
  cost (``mppi_controller.cu:626-652``)
- Savitzky-Golay smoothing with the 2-step control history
  (``mppi_controller.cu:469-499``) and the receding-horizon slide
  (``mppi_controller.cu:521-568``)
- nominal-trajectory re-rollout (``mppi_controller.cu:501-519``) — on
  device here, instead of the reference's CPU re-rollout
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from autorally_tpu.config import CostParams, MPPIConfig, effective_gamma
from autorally_tpu.costs.costmap import Costmap
from autorally_tpu.costs.mppi_cost import MPPICost
from autorally_tpu.models.base import Dynamics

# 5-tap Savitzky-Golay coefficients (mppi_controller.cu:475-476).
# numpy on purpose: a module-scope jnp.array would initialize the JAX
# backend at import time, breaking CLI tools that flip jax_platforms
# after importing the package; einsum converts it where it's used.
SAVGOL_FILTER = np.array([-3.0, 12.0, 17.0, 12.0, -3.0],
                         dtype=np.float32) / 35.0


class SolveStats(NamedTuple):
    """Per-solve telemetry (all scalars, on device until read)."""

    baseline: jnp.ndarray          # min sampled cost
    normalizer: jnp.ndarray        # eta = sum of weights
    trajectory_cost: jnp.ndarray   # sum w^2 / eta  (mppi_controller.cu:646-652)
    ess: jnp.ndarray               # effective sample size (sum w)^2 / sum w^2
    mean_cost: jnp.ndarray         # mean sampled rollout cost
    crash_frac: jnp.ndarray        # fraction of rollouts that crashed


class ControllerState(NamedTuple):
    """Everything the controller carries between replans (a pytree)."""

    U: jnp.ndarray                 # (T, C) current control plan
    control_hist: jnp.ndarray      # (2, C) executed-control history for SG
    state_solution: jnp.ndarray    # (T, S) nominal trajectory
    control_solution: jnp.ndarray  # (T, C) clamped executed plan
    key: jax.Array                 # PRNG key


def _kernel_form_consistent(model) -> bool:
    """True when the class that declared ``KERNEL_KIND`` also owns every
    method the in-kernel evaluator replaces.  A subclass that overrides
    ``dynamics``/``state_deriv``/etc. below the declaring class would have
    the fused kernels silently evaluate the BASE model's math — refuse the
    Pallas auto-path for it (the subclass can re-declare KERNEL_KIND +
    kernel_weights to opt back in, or force via cfg.use_pallas_rollout)."""
    mro = type(model).__mro__
    kind_idx = next(i for i, c in enumerate(mro) if "KERNEL_KIND" in vars(c))
    for meth in ("dynamics", "state_deriv", "kinematics",
                 "enforce_constraints", "step", "kernel_weights",
                 "kernel_spec"):
        idx = next((i for i, c in enumerate(mro) if meth in vars(c)),
                   kind_idx)
        if idx < kind_idx:
            return False
    return True


def validate_tube_pair(solver, solver_predicted) -> None:
    """The asymmetric-tube contract (shared by ``AsyncTubeController``
    and ``EpisodeRunner``): the predicted-state solver may differ ONLY
    in rollout budget.  Any other config divergence — gamma,
    exploration std, iteration count, stride, horizon — makes the
    trajectory-cost arbitration apples-to-oranges (both tube halves
    must solve the same problem at the same temperature), so the whole
    config modulo ``num_rollouts`` is compared, not just the horizon.
    Raises ``ValueError`` (not assert: the contract must hold under
    -O)."""
    if solver_predicted is None or solver_predicted is solver:
        return
    if solver_predicted.model is not solver.model:
        raise ValueError(
            "asymmetric tube: both solvers must share the model")
    if type(solver_predicted.cost) is not type(solver.cost):
        raise ValueError(
            "asymmetric tube: both solvers must share the cost type "
            f"({type(solver.cost).__name__} vs "
            f"{type(solver_predicted.cost).__name__})")
    if solver_predicted.cfg.num_timesteps != solver.cfg.num_timesteps:
        raise ValueError(
            "asymmetric tube: both solvers must share the horizon "
            f"(actual T={solver.cfg.num_timesteps}, predicted "
            f"T={solver_predicted.cfg.num_timesteps})")
    aligned = solver_predicted.cfg.replace(
        num_rollouts=solver.cfg.num_rollouts)
    if aligned != solver.cfg:
        diffs = [f.name for f in dataclasses.fields(solver.cfg)
                 if getattr(aligned, f.name) != getattr(solver.cfg, f.name)]
        raise ValueError(
            "asymmetric tube: solvers may differ only in num_rollouts; "
            f"these configs also differ in {diffs}")


class MPPISolver:
    """Builds the jitted solve/slide programs for a (model, cost, config)."""

    def __init__(self, model: Dynamics, cost: MPPICost, cfg: MPPIConfig):
        self.model = model
        self.cost = cost
        self.cfg = cfg
        self.nu = jnp.asarray(cfg.exploration_std, dtype=jnp.float32)
        self.init_u = jnp.asarray(cfg.init_u, dtype=jnp.float32)
        self.use_pallas_rollout = self._decide_pallas()
        self._pallas_interpret = False
        from autorally_tpu.ops.sampling import make_sampler
        self._sample_noise = make_sampler(cfg.noise_sampler, cfg.noise_param)
        self._solve_jit = jax.jit(self._solve)
        self._slide_jit = jax.jit(self._slide)

    def _decide_pallas(self) -> bool:
        """Use the fused Pallas dynamics kernel when it applies: a model
        with an in-kernel form (``Dynamics.KERNEL_KIND`` — MLP or basis
        functions), TPU backend, lane-aligned rollout count (config
        override via ``cfg.use_pallas_rollout``)."""
        from autorally_tpu.ops.rollout_kernel import pallas_supported

        if self.cfg.use_pallas_rollout is not None:
            return self.cfg.use_pallas_rollout
        return (self.model.KERNEL_KIND is not None
                and _kernel_form_consistent(self.model)
                and pallas_supported(self._local_rollouts()))

    def _local_rollouts(self) -> int:
        return self.cfg.num_rollouts

    def _fusable_cost(self) -> bool:
        """Cost objects the fused kernels implement natively: the base
        MPPICost and ObstacleCost (whose circle terms fuse in-kernel).
        Other subclasses take the chain + batched-epilogue path, which
        dispatches dynamically through the subclass."""
        from autorally_tpu.costs.obstacles import ObstacleCost

        return type(self.cost) in (MPPICost, ObstacleCost)

    def _obstacle_kwargs(self, cost_params: CostParams) -> dict:
        from autorally_tpu.costs.obstacles import ObstacleCost

        if type(self.cost) is ObstacleCost:
            # prefer the traced CostParams.obstacles (live updates at pose
            # rate, zero recompiles) over the construction-time array
            obs = (cost_params.obstacles
                   if cost_params.obstacles is not None
                   else self.cost.obstacles)
            return {"obstacles": obs,
                    "obstacle_coeff": self.cost.obstacle_coeff,
                    "inflation": self.cost.inflation}
        return {}

    # ------------------------------------------------------------------
    # construction helpers
    # ------------------------------------------------------------------

    def init_state(self, seed: Optional[int] = None) -> ControllerState:
        cfg = self.cfg
        T, C, S = cfg.num_timesteps, self.model.CONTROL_DIM, self.model.STATE_DIM
        U = jnp.tile(self.init_u, (T, 1))
        return ControllerState(
            U=U,
            control_hist=jnp.zeros((2, C), dtype=jnp.float32),
            state_solution=jnp.zeros((T, S), dtype=jnp.float32),
            control_solution=jnp.zeros((T, C), dtype=jnp.float32),
            key=jax.random.PRNGKey(cfg.seed if seed is None else seed),
        )

    def reset_controls(self, cs: ControllerState) -> ControllerState:
        """``resetControls`` (mppi_controller.cu:447-457)."""
        return cs._replace(U=jnp.tile(self.init_u, (self.cfg.num_timesteps, 1)))

    def with_rollouts(self, num_rollouts: int) -> "MPPISolver":
        """A sibling solver sharing this model and cost with a different
        rollout budget — the asymmetric-tube construction helper
        (``AsyncTubeController``/``EpisodeRunner`` ``solver_predicted``).
        Returns ``self`` when the budget already matches.

        Refuses subclass solvers rather than silently downgrading them
        to a plain ``MPPISolver`` (a ``ShardedMPPISolver`` would lose
        its shard_map decomposition, an ``EnsembleMPPISolver`` its
        per-member kernels); those construct their sibling explicitly."""
        if num_rollouts == self.cfg.num_rollouts:
            return self
        if type(self) is not MPPISolver:
            raise NotImplementedError(
                f"with_rollouts would downgrade {type(self).__name__} to "
                f"a plain MPPISolver — construct the resized "
                f"{type(self).__name__} explicitly")
        return MPPISolver(self.model, self.cost,
                          self.cfg.replace(num_rollouts=num_rollouts))

    # ------------------------------------------------------------------
    # one optimization iteration given explicit noise (the testable core)
    # ------------------------------------------------------------------

    def rollout_costs(self, model_params, cost_params: CostParams,
                      costmap: Costmap, state: jnp.ndarray, U: jnp.ndarray,
                      eps: jnp.ndarray, k_offset=0
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """The rollout kernel: simulate one noise-perturbed trajectory per
        sample and accumulate its running cost (``rolloutKernel``,
        ``mppi_controller.cu:72-184``).

        ``eps``: (T, K_local, C) standard-normal draws.  ``k_offset`` is the
        global index of this batch's first rollout, so a sharded caller
        computes the noise-free-rollout and pure-noise masks against the
        *global* rollout numbering.  Returns (total_costs (K_local,),
        u_seq (T, K_local, C) pre-clamp perturbed controls, crash (K_local,)).
        """
        cfg = self.cfg
        model, cost = self.model, self.cost
        K_total = cfg.num_rollouts
        K = eps.shape[1]
        nu = self.nu
        opt_delay = cfg.optimization_stride

        k_idx = k_offset + lax.broadcasted_iota(jnp.int32, (K, 1), 0).squeeze(-1)
        zero_rollout = k_idx == 0                              # noise-free
        pure_noise = k_idx >= cfg.pure_noise_frac * K_total    # last 1%

        # ---- phase 1: the sequential dynamics chain ------------------------
        # Only the state-dependency chain runs sequentially; everything else
        # (costs, crash latch, reductions) is deferred to a single batched
        # pass over (T, K) below.  The reference fuses cost into the rollout
        # kernel because on a GPU each thread owns a rollout; on TPU the
        # sequential loop is latency-bound, so the less per step the better.
        # On TPU with an MLP model the chain runs as a fused Pallas kernel
        # (ops/rollout_kernel.py) with state/weights resident in VMEM.
        from autorally_tpu.costs.neural_costmap import NeuralCostmap

        if (self.use_pallas_rollout and cfg.exact_fused
                and type(costmap) is Costmap and self._fusable_cost()):
            from autorally_tpu.ops.rollout_kernel import (
                exact_pallas_supported, fused_exact_rollout_cost_pallas)

            # Exact reference costmap: if the map fits the VMEM budget the
            # whole rolloutKernel (dynamics AND the texture-semantics
            # point-sampled track cost, costs.cu:128-154) fuses into one
            # Pallas program with an in-kernel windowed gather — the exact
            # path no longer pays XLA's ~5 ns/lookup gather at large K.
            if exact_pallas_supported(costmap, K):
                return fused_exact_rollout_cost_pallas(
                    model, model_params, cfg, cost_params, costmap, state,
                    U, eps, l1_cost=cost.l1_cost, k_offset=k_offset,
                    interpret=self._pallas_interpret,
                    precision=cfg.matmul_precision,
                    **self._obstacle_kwargs(cost_params))

        if (self.use_pallas_rollout and isinstance(costmap, NeuralCostmap)
                and self._fusable_cost()):
            # Neural-field costmap: the whole rolloutKernel (dynamics AND
            # cost) fuses into one Pallas program — no gather, no state
            # materialization (ops/rollout_kernel.py).  Assumes the default
            # zero terminal cost (costs.cu:411-414).  ObstacleCost fuses
            # too (the circle terms ride the SMEM scalar vector); any
            # OTHER cost subclass falls through to the dynamics-chain
            # kernel + batched cost epilogue below, which dispatches
            # through the subclass.
            from autorally_tpu.ops.rollout_kernel import (
                fused_rollout_cost_pallas)

            return fused_rollout_cost_pallas(
                model, model_params, cfg, cost_params, costmap, state, U,
                eps, l1_cost=cost.l1_cost, k_offset=k_offset,
                interpret=self._pallas_interpret,
                precision=cfg.matmul_precision,
                **self._obstacle_kwargs(cost_params))

        if self.use_pallas_rollout:
            from autorally_tpu.ops.rollout_kernel import dynamics_chain_pallas

            # Component-major layout: states (SPAD, T, K), u_seq (C, T, K).
            # Phase 2 consumes contiguous (T-1, K) planes — no relayouts.
            states, u_seq = dynamics_chain_pallas(
                model, model_params, cfg, state, U, eps, k_offset=k_offset,
                interpret=self._pallas_interpret,
                precision=cfg.matmul_precision)
            s_c = lambda i: states[i, :-1, :]                  # (T-1, K)
            u_c = lambda j: u_seq[j, 1:, :]
            eps_c = lambda j: eps[1:, :, j]
            s_last = states[:model.STATE_DIM, -1, :].T         # (K, S)
        else:
            s0 = jnp.broadcast_to(
                state, (K, model.STATE_DIM)).astype(jnp.float32)

            def step(s, inp):
                t, eps_t, U_t = inp
                du_t = eps_t * nu                              # (K, C)
                frozen = zero_rollout | (t < opt_delay)
                u = jnp.where(frozen[:, None], U_t,
                              jnp.where(pure_noise[:, None], du_t,
                                        U_t + du_t))
                u_cl = model.enforce_constraints(model_params, u)
                s_next = (s + model.state_deriv(model_params, s, u_cl)
                          * model.dt)
                # u is stored pre-clamp (mppi_controller.cu:153); s_next is
                # the state the *next* timestep's cost sees.
                return s_next, (u, s_next)

            ts = jnp.arange(cfg.num_timesteps)
            _, (u_seq, states) = lax.scan(
                step, s0, (ts, eps, U), unroll=cfg.scan_unroll)
            s_c = lambda i: states[:-1, :, i]                  # (T-1, K)
            u_c = lambda j: u_seq[1:, :, j]
            eps_c = lambda j: eps[1:, :, j]
            s_last = states[-1]                                # (K, S)

        # ---- phase 2: batched cost evaluation over (T-1, K) ----------------
        # Cost step t (t = 1..T-1) uses state s_t (after t updates) and the
        # controls of step t (rolloutKernel, mppi_controller.cu:157-178).
        rngs = jnp.reshape(model_params["control_rngs"], (-1, 2))[-2:]
        frozen_cost = (zero_rollout[None, :]
                       | (jnp.arange(1, cfg.num_timesteps)[:, None]
                          < opt_delay))
        du0 = jnp.where(frozen_cost, 0.0, eps_c(0) * nu[0])
        du1 = jnp.where(frozen_cost, 0.0, eps_c(1) * nu[1])
        u0 = jnp.clip(u_c(0), rngs[0, 0], rngs[0, 1])
        u1 = jnp.clip(u_c(1), rngs[1, 0], rngs[1, 1])

        control_c = cost.control_cost_c(cost_params, u0, u1, du0, du1, nu)
        speed_c = cost.speed_cost_c(cost_params, s_c(4))
        stab_c = cost.stabilizing_cost_c(cost_params, s_c(4), s_c(5))
        zeros = jnp.zeros(control_c.shape, dtype=jnp.int32)
        track_c, boundary = cost.track_cost_c(
            cost_params, costmap, s_c(0), s_c(1), s_c(2), zeros)
        # Crash latch: boundary(s_j) is checked inside cost step j and
        # roll(s_j) at the end of step j-1 — both first affect cost step j,
        # and the latch persists (getCrash/getTrackCost + the per-step OR in
        # the kernel).  Batched, that is a running max over cost steps.
        roll_flag = (jnp.abs(s_c(3)) > 1.57).astype(jnp.int32)
        crash = lax.cummax(jnp.maximum(boundary, roll_flag), axis=0)
        crash_c = (1.0 - cost_params.discount) * cost.crash_cost(
            cost_params, crash)

        c = control_c + speed_c + crash_c + track_c + stab_c   # (T-1, K)
        c = jnp.where((c > 1e12) | jnp.isnan(c), 1e12, c)
        # The reference's running-average accumulation
        # (mppi_controller.cu:162-165) telescopes to the arithmetic mean of
        # cost steps 1..T-1.
        total = jnp.mean(c, axis=0) + cost.terminal_cost(s_last)
        return total, u_seq, crash[-1]

    def iterate(self, model_params, cost_params: CostParams, costmap: Costmap,
                state: jnp.ndarray, U: jnp.ndarray, eps: jnp.ndarray
                ) -> Tuple[jnp.ndarray, SolveStats]:
        """One MPPI iteration: (state (S,), U (T, C), eps (T, K, C) ~ N(0,1))
        -> (U_new (T, C), stats).

        Mirrors one pass of the loop at ``mppi_controller.cu:609-667`` with
        the rollout kernel inlined as a ``lax.scan`` over the horizon whose
        batch dimension is the K rollouts.
        """
        cfg = self.cfg
        total, u_seq, crash = self.rollout_costs(
            model_params, cost_params, costmap, state, U, eps)

        # On-device reductions (the reference's host syncs #1-#3,
        # mppi_controller.cu:624-652).
        baseline = jnp.min(total)
        w = jnp.exp(-effective_gamma(cfg, cost_params)
                    * (total - baseline))                   # (K,)
        eta = jnp.sum(w)
        traj_cost = jnp.sum(w * w) / eta
        # u_seq layout differs by rollout backend: (C, T, K) component-major
        # from the Pallas kernel, (T, K, C) from the scan.
        spec = "k,ctk->tc" if self.use_pallas_rollout else "k,tkc->tc"
        U_new = jnp.einsum(spec, w, u_seq) / eta

        stats = SolveStats(
            baseline=baseline,
            normalizer=eta,
            trajectory_cost=traj_cost,
            ess=(eta * eta) / jnp.sum(w * w),
            mean_cost=jnp.mean(total),
            crash_frac=jnp.mean(crash.astype(jnp.float32)),
        )
        return U_new, stats

    # ------------------------------------------------------------------
    # full solve: iterations + smoothing + nominal trajectory
    # ------------------------------------------------------------------

    def _use_kernel_rng(self, costmap) -> bool:
        from autorally_tpu.costs.neural_costmap import NeuralCostmap
        from autorally_tpu.ops.rollout_kernel import exact_map_fits

        # gaussian draws stream one step at a time; OU's AR(1) recursion
        # streams too (one extra (2,K) carry in-kernel) for theta in
        # (0, 2), i.e. AR coefficient a = 1-theta in (-1, 1) — outside
        # that the recursion is non-stationary and the host path keeps
        # its (undefined) behavior.  DFT-shaped colored noise needs the
        # whole horizon axis live at once, so it stays host-path.
        sampler_ok = (self.cfg.noise_sampler == "gaussian"
                      or (self.cfg.noise_sampler == "ou"
                          and 0.0 < self.cfg.noise_param < 2.0))
        if not (self.cfg.kernel_rng and self.use_pallas_rollout
                and self.model.KERNEL_KIND is not None
                and sampler_ok
                and self._fusable_cost()):
            return False
        if isinstance(costmap, NeuralCostmap):
            return True
        # exact reference costmap: nothing-in-HBM mode composes with the
        # in-kernel windowed gather when the map fits the VMEM budget
        # (use_pallas_rollout already vouches for backend + lane alignment)
        return (type(costmap) is Costmap and self.cfg.exact_fused
                and exact_map_fits(costmap))

    def _solve(self, model_params, cost_params: CostParams, costmap: Costmap,
               state: jnp.ndarray, cs: ControllerState
               ) -> Tuple[ControllerState, SolveStats]:
        cfg = self.cfg
        T, K, C = cfg.num_timesteps, cfg.num_rollouts, self.model.CONTROL_DIM

        U = cs.U
        key = cs.key
        stats = None
        if self._use_kernel_rng(costmap):
            # nothing-in-HBM mode: in-kernel noise + two-pass update (the
            # sharded solver composes the same kernels with per-shard
            # seeds and global softmax reductions)
            from autorally_tpu.ops.rollout_kernel import (
                fused_rng_solve_iteration)

            for _ in range(cfg.num_iters):
                key, sub = jax.random.split(key)
                U, total, crash = fused_rng_solve_iteration(
                    self.model, model_params, cfg, cost_params, costmap,
                    state.astype(jnp.float32), U, sub,
                    l1_cost=self.cost.l1_cost,
                    interpret=self._pallas_interpret,
                    precision=cfg.matmul_precision,
                    **self._obstacle_kwargs(cost_params))
                baseline = jnp.min(total)
                w = jnp.exp(-effective_gamma(cfg, cost_params)
                            * (total - baseline))
                eta = jnp.sum(w)
                stats = SolveStats(
                    baseline=baseline, normalizer=eta,
                    trajectory_cost=jnp.sum(w * w) / eta,
                    ess=(eta * eta) / jnp.sum(w * w),
                    mean_cost=jnp.mean(total),
                    crash_frac=jnp.mean(crash.astype(jnp.float32)))
            U = savitzky_golay(U, cs.control_hist)
            states_sol, controls_sol = self.nominal_trajectory(
                model_params, state, U)
            return cs._replace(U=U, state_solution=states_sol,
                               control_solution=controls_sol, key=key), stats

        for _ in range(cfg.num_iters):                         # static, usually 1
            key, sub = jax.random.split(key)
            eps = self._sample_noise(sub, (T, K, C))
            U, stats = self.iterate(model_params, cost_params, costmap,
                                    state, U, eps)

        U = savitzky_golay(U, cs.control_hist)
        states_sol, controls_sol = self.nominal_trajectory(model_params, state, U)
        new_cs = cs._replace(U=U, state_solution=states_sol,
                             control_solution=controls_sol, key=key)
        return new_cs, stats

    def solve(self, model_params, cost_params, costmap, state,
              cs: ControllerState) -> Tuple[ControllerState, SolveStats]:
        """Jitted replan.  ``state``: (S,) current state."""
        return self._solve_jit(model_params, cost_params, costmap,
                               jnp.asarray(state, dtype=jnp.float32), cs)

    def nominal_trajectory(self, model_params, state: jnp.ndarray,
                           U: jnp.ndarray):
        """Re-rollout of the solution (``computeNominalTraj``,
        ``mppi_controller.cu:501-519``): records state *before* each update
        and the clamped controls."""
        model = self.model
        if self.use_pallas_rollout:
            from autorally_tpu.ops.rollout_kernel import (
                nominal_trajectory_pallas)

            return nominal_trajectory_pallas(
                model, model_params, self.cfg, state.astype(jnp.float32), U,
                interpret=self._pallas_interpret)

        def nstep(s, u_t):
            u_cl = model.enforce_constraints(model_params, u_t)
            s_next = s + model.state_deriv(model_params, s, u_cl) * model.dt
            return s_next, (s, u_cl)

        _, (states_sol, controls_sol) = lax.scan(
            nstep, state.astype(jnp.float32), U,
            unroll=self.cfg.scan_unroll)
        return states_sol, controls_sol

    # ------------------------------------------------------------------
    # receding-horizon slide
    # ------------------------------------------------------------------

    def _slide(self, cs: ControllerState, stride: jnp.ndarray) -> ControllerState:
        """``slideControlAndStateSeq`` (mppi_controller.cu:521-568) with a
        *dynamic* stride (no recompile per stride value).

        Control-history update quirk preserved: for stride >= 2 the history
        is read from the flattened control array at float offset
        ``stride - 2`` (mppi_controller.cu:536-541), which for odd strides
        straddles timesteps exactly as the reference does.
        """
        cfg = self.cfg
        T, C = cfg.num_timesteps, self.model.CONTROL_DIM
        stride = jnp.asarray(stride, dtype=jnp.int32)

        U_flat = cs.U.reshape(-1)
        hist_flat = cs.control_hist.reshape(-1)
        ext = jnp.concatenate([hist_flat, U_flat])
        # stride==1 -> ext[2:6] = [hist[1], U[0]]; stride>=2 -> U_flat[s-2:s+2]
        start = jnp.where(stride == 1, stride + 1, stride + 2)
        new_hist = lax.dynamic_slice(ext, (start,), (2 * C,)).reshape(2, C)
        new_hist = jnp.where(stride == 0, cs.control_hist, new_hist)

        idx = jnp.arange(T) + stride
        valid = idx < T
        gather = jnp.clip(idx, 0, T - 1)
        new_U = jnp.where(valid[:, None], cs.U[gather], self.init_u)
        # slideStateSeq (mppi_controller.cu:560-568): shifts, tail keeps old
        # values (it is overwritten by the next nominal-trajectory pass).
        new_ss = jnp.where(valid[:, None], cs.state_solution[gather],
                           cs.state_solution)
        return cs._replace(U=new_U, control_hist=new_hist, state_solution=new_ss)

    def slide(self, cs: ControllerState, stride) -> ControllerState:
        return self._slide_jit(cs, stride)


def savitzky_golay(U: jnp.ndarray, control_hist: jnp.ndarray) -> jnp.ndarray:
    """5-tap SG smoothing with 2-step executed-control history
    (``savitskyGolay``, mppi_controller.cu:469-499).

    Window layout: [hist0, hist1, U0..U(T-1), U(T-1), U(T-1)]; output
    U'[i] = filter . window[i:i+5].
    """
    T = U.shape[0]
    tail = jnp.tile(U[-1:], (2, 1))
    padded = jnp.concatenate([control_hist, U, tail], axis=0)   # (T+4, C)
    windows = jnp.stack([padded[j:j + T] for j in range(5)])    # (5, T, C)
    return jnp.einsum("j,jtc->tc", SAVGOL_FILTER, windows)
