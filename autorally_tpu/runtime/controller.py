"""Stateful controller facade over the jitted solvers.

Mirrors the host-side API of ``MPPIController``
(``mppi_controller.cuh:52-217``) — the object the control loop drives —
while keeping all math inside the jitted pure functions.  Hot updates
(cost params, costmap, model weights, throttle cut) are pytree swaps, never
recompiles.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from autorally_tpu.config import CostParams
from autorally_tpu.costs.costmap import Costmap
from autorally_tpu.solver.ddp import DDPResult, DDPSolver
from autorally_tpu.solver.mppi import ControllerState, MPPISolver, SolveStats


def stats_degenerate(ess: float, crash_frac: float, num_rollouts: int,
                     crash_thresh: float = 0.9,
                     ess_mult: float = 5.0,
                     position_track_cost: Optional[float] = None,
                     boundary_threshold: Optional[float] = None,
                     speed: Optional[float] = None,
                     speed_gate: Optional[float] = None) -> bool:
    """The degeneracy test on raw telemetry scalars — shared by
    :meth:`Controller.plan_degenerate` and the async loop's harvest
    guard.  See :meth:`Controller.plan_degenerate` for the rationale.

    ``position_track_cost``/``boundary_threshold`` gate the trigger on
    the vehicle's OWN position being on/over the track boundary (the
    max of the front/back channel-0 samples the crash latch uses).
    The flat-softmax statistics alone cannot discriminate: a small-K /
    short-horizon solve lapping an oval shows the same (crash≈1,
    ESS≈0.6K) signature as the genuinely-degenerate off-track seeds in
    the round-5 ensemble A/B — all rollouts eventually latch over a
    short noisy horizon even though the latched costs still rank the
    futures and the car drives fine.  What separated the failing seeds
    was the car itself being off-track while the weights were flat, so
    that is the condition the brake requires.  Callers that cannot
    evaluate their position pass ``None`` and get the stats-only rule.

    ``speed``/``speed_gate`` additionally release the brake below a
    longitudinal-speed floor: the hazard the guard exists for is driving
    AT SPEED on a no-preference plan (the failing A/B seeds plowed at
    9.3 m/s); a slow or stationary car off the boundary must be allowed
    to act on its plan or the brake deadlocks recovery — once braked to
    a stop it would hold a crashed car there forever.
    """
    if crash_frac <= crash_thresh:
        return False
    if not ess > ess_mult * (1.0 - crash_frac) * num_rollouts:
        return False
    if speed is not None and speed_gate is not None \
            and abs(speed) <= speed_gate:
        return False
    if position_track_cost is None or boundary_threshold is None:
        return True
    return position_track_cost >= boundary_threshold


class Controller:
    """One MPPI controller instance (the loop runs two for tube-MPPI)."""

    def __init__(self, solver: MPPISolver, model_params,
                 cost_params: CostParams, costmap: Costmap,
                 ddp: Optional[DDPSolver] = None, seed: Optional[int] = None):
        self.solver = solver
        self.model = solver.model
        self.cfg = solver.cfg
        self.model_params = model_params
        self.cost_params = cost_params
        self.costmap = costmap
        self.ddp = ddp
        self.cs: ControllerState = solver.init_state(seed)
        self.stats: Optional[SolveStats] = None
        self.ddp_result: Optional[DDPResult] = None
        self._traj_cost = float("inf")
        self._last_solve_state: Optional[np.ndarray] = None

    # -- the loop's verbs (run_control_loop.cuh:206-225) --------------------

    def slide_control_and_state_seq(self, stride: int) -> None:
        self.cs = self.solver.slide(self.cs, int(stride))

    def compute_control(self, state: np.ndarray) -> None:
        """Replan from the given (actual) state."""
        self.cs, self.stats = self.solver.solve(
            self.model_params, self.cost_params, self.costmap, state, self.cs)
        self._traj_cost = float(self.stats.trajectory_cost)
        self._last_solve_state = np.asarray(state)

    def compute_control_predicted(self) -> None:
        """Replan from the controller's own predicted state — the first
        entry of its state solution (``computeControl()``,
        mppi_controller.cu:588-598)."""
        self.compute_control(np.asarray(self.cs.state_solution[0]))

    def compute_feedback_gains(self, state: np.ndarray) -> None:
        """Tube-tracking gains around the current solution
        (``computeFeedbackGains``, mppi_controller.cu:427-439)."""
        if self.ddp is None:
            return
        rngs = np.asarray(self.model_params["control_rngs"])
        self.ddp_result = self.ddp.run(
            self.model_params, state, self.cs.U, self.cs.state_solution,
            self.cs.control_solution, rngs[:, 0], rngs[:, 1])

    # -- accessors (mppi_controller.cu:677-693) ------------------------------

    def get_control_seq(self) -> np.ndarray:
        return np.asarray(self.cs.control_solution)

    def get_state_seq(self) -> np.ndarray:
        return np.asarray(self.cs.state_solution)

    def get_feedback_gains(self) -> Optional[np.ndarray]:
        if self.ddp_result is None:
            return None
        return np.asarray(self.ddp_result.feedback_gain)

    def get_computed_trajectory_cost(self) -> float:
        return self._traj_cost

    def plan_degenerate(self, crash_thresh: float = 0.9,
                        ess_mult: float = 5.0,
                        speed_gate: float = 2.0,
                        state: Optional[np.ndarray] = None) -> bool:
        """True when the latest solve carries no preference: nearly all
        rollouts crash-latched AND the importance-weight mass is NOT on
        the few survivors.

        When every sampled trajectory hits the crash penalty, the costs
        equalize, the weights go uniform, and the weighted update is a
        plain average of noise — a plan that barely steers (measured in
        the round-5 ensemble A/B, EVAL.md: ESS 2400-2600 of K=4096 at
        74% off-track).  The discriminator is relative to the surviving
        fraction: with S = (1-crash)*K non-crashed rollouts, a healthy
        near-wall recovery concentrates its weights on those S (ESS of
        order S), while a degenerate flat softmax has ESS >> S.  The
        loop's guard brakes on it — the NaN-control zero-command
        philosophy (``autorally_plant.cpp:353-375``) applied to
        flat-softmax plans.

        The flat-softmax statistics are gated on the vehicle's OWN
        position being on/over the track boundary AND on it actually
        moving faster than ``speed_gate`` (see :func:`stats_degenerate`
        for why stats alone misfire and why a slow car must stay free
        to act); the position lookup only runs once the cheap scalar
        tests pass.

        ``state`` is the MEASURED vehicle state the gates evaluate at;
        it defaults to the state this controller last solved from,
        which is only right for the actual-state controller — the
        predicted-state controller solves from where it BELIEVES the
        car is, so a loop arbitrating between the two must pass the
        measured state explicitly (both loops do)."""
        if self.stats is None:
            return False
        if state is None:
            state = self._last_solve_state
        speed = None if state is None else float(state[4])
        if not stats_degenerate(float(self.stats.ess),
                                float(self.stats.crash_frac),
                                self.cfg.num_rollouts,
                                crash_thresh, ess_mult,
                                speed=speed, speed_gate=speed_gate):
            return False
        pos_cost = self.position_track_cost(state)
        if pos_cost is None:
            return True
        return pos_cost >= float(self.cost_params.boundary_threshold)

    def position_track_cost(self, state: Optional[np.ndarray] = None
                            ) -> Optional[float]:
        """Channel-0 track cost at the vehicle footprint of ``state``
        (default: the last solved state) — the max of the same
        front/back samples the crash latch uses (``getTrackCost``,
        costs.cu:359-393).  None before any solve."""
        if state is None:
            state = self._last_solve_state
        if state is None:
            return None
        from autorally_tpu.costs.mppi_cost import MPPICost

        return float(MPPICost.footprint_track_cost(
            self.costmap, jnp.float32(state[0]), jnp.float32(state[1]),
            jnp.float32(state[2])))

    # -- state injection (tube resync, run_control_loop.cuh:263-266) ---------

    def set_state(self, state: np.ndarray) -> None:
        ss = self.cs.state_solution.at[0].set(jnp.asarray(state))
        self.cs = self.cs._replace(state_solution=ss)

    def set_state_sequence(self, seq: np.ndarray) -> None:
        self.cs = self.cs._replace(state_solution=jnp.asarray(seq))

    def set_control_sequence(self, seq: np.ndarray) -> None:
        self.cs = self.cs._replace(control_solution=jnp.asarray(seq),
                                   U=jnp.asarray(seq))

    def reset_controls(self) -> None:
        self.cs = self.solver.reset_controls(self.cs)

    # -- hot updates (run_control_loop.cuh:182-204) ---------------------------

    def update_cost_params(self, cost_params: CostParams) -> None:
        self.cost_params = cost_params

    def update_costmap(self, costmap: Costmap) -> None:
        self.costmap = costmap

    def update_model_params(self, model_params) -> None:
        self.model_params = model_params

    def cut_throttle(self) -> None:
        """Emergency stop (``cutThrottle``, mppi_controller.cu:459-466):
        desired speed -> 0 and max throttle -> 0, as parameter updates."""
        self.cost_params = self.cost_params.replace(desired_speed=0.0)
        rngs = np.asarray(self.model_params["control_rngs"]).copy()
        rngs[1, 1] = 0.0
        self.model_params = {**self.model_params,
                             "control_rngs": jnp.asarray(rngs)}
