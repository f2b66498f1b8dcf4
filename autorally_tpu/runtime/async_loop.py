"""Async-dispatch control loop: hide device/tunnel latency behind the period.

The reference's loop is strictly sequential — solve, publish, sleep
(``run_control_loop.cuh:218-312``) — which works because its GPU sits on
the host's PCIe bus and ``computeControl`` returns in-budget.  A TPU (or
any accelerator behind an RPC hop) adds *dispatch latency* that a
sequential loop pays on every tick, even when the device computes the
solve in ~1.5 ms.  JAX's async dispatch makes the fix natural:

- the whole tube-MPPI tick — receding-horizon slide, both solves, the
  trajectory-cost arbitration with predicted-controller resync, and the
  DDP feedback gains — is ONE jitted device program (the same per-tick
  body ``runtime/episode.py`` fuses, minus the simulated plant);
- the host *dispatches* tick N and immediately starts an async
  device-to-host copy of its outputs, then *harvests* tick N-depth —
  whose copy has had ``depth`` control periods to land — publishes that
  solution to the plant, and sleeps to the absolute deadline.

The published solution is ``depth`` periods older than the freshest
state, exactly like the reference during a 20 ms solve: the plant
interpolates the 100-step solution at ``t_pose - t_solution``
(``autorally_plant.cpp:215-223``), so an anchor a period or two old
costs interpolation offset, not correctness.  The receding-horizon slide
uses the measured pose stride per dispatch, so the plan stays aligned
with wall time (``run_control_loop.cuh:206-215``).

With ``depth=1`` the loop overlaps one solve with one publish+sleep; on
a host-attached TPU that is already enough.  ``depth=2`` covers this
rig's ~25 ms tunnel round-trip at a 20 ms period.
"""

from __future__ import annotations

import collections
import dataclasses
import time
from typing import Callable, NamedTuple, Optional

import numpy as np

from autorally_tpu.config import CostParams
from autorally_tpu.runtime.controller import stats_degenerate
from autorally_tpu.runtime.plant import BasePlant
from autorally_tpu.runtime.telemetry import StatusMonitor, TimingStats


class TubeTickOutput(NamedTuple):
    """Everything the host needs from one tube tick (device arrays until
    harvested)."""

    control_solution: np.ndarray   # (T, C) chosen clamped plan
    state_solution: np.ndarray     # (T, S) chosen nominal trajectory
    feedback_gains: Optional[np.ndarray]  # (T, C, S) or None
    use_actual: np.ndarray         # () bool — actual-state controller won
    trajectory_cost: np.ndarray    # () chosen controller's Σw²/η
    ess: np.ndarray                # ()
    crash_frac: np.ndarray         # ()
    # () max front/back ch-0 track cost at the dispatched state (the
    # degeneracy guard's position gate); None for duck-typed tubes
    position_track_cost: Optional[np.ndarray] = None


class AsyncTubeController:
    """Both tube-MPPI controllers fused into one dispatchable program.

    Owns the device-resident :class:`ControllerState` pair; the host only
    ever touches the small :class:`TubeTickOutput`.  Hot updates (cost
    params / costmap / model weights) are pytree swaps on the next
    dispatch — traced arguments, zero recompiles."""

    def __init__(self, solver, model_params, cost_params: CostParams,
                 costmap, use_feedback_gains: bool = True,
                 seed_actual: int = 0, seed_predicted: int = 1,
                 solver_predicted=None):
        import jax
        import jax.numpy as jnp

        # Asymmetric tube budgets (round 5, beyond-reference): the
        # predicted-state controller may run a SMALLER solver.  The
        # actual-state solve explores from the measured state and earns
        # the sample budget; the predicted solve re-optimizes its own
        # already-good plan from its own predicted state, where a
        # fraction of the samples suffices — and every ControllerState
        # leaf the arbitration/resync touches is (T,C)/(T,S), so
        # different-K solvers compose without reshaping.  This is what
        # lets a 65K-class tube hold 50 Hz on ONE chip: K_a=65,536 +
        # K_p=16,384 is ~16+4 ms of device work vs 2x16 ms symmetric
        # (GATE_r05 boundary row).  The solvers must share the model,
        # horizon, and control dims (asserted).
        from autorally_tpu.solver.mppi import validate_tube_pair

        validate_tube_pair(solver, solver_predicted)
        self.solver = solver
        self.solver_predicted = solver_predicted or solver
        self.model_params = model_params
        self.cost_params = cost_params
        self.costmap = costmap
        self.use_feedback_gains = bool(use_feedback_gains)
        self._seeds = (seed_actual, seed_predicted)
        self.cs_a = solver.init_state(seed_actual)
        self.cs_p = self.solver_predicted.init_state(seed_predicted)
        if self.use_feedback_gains:
            from autorally_tpu.solver.ddp import DDPSolver

            self.ddp = DDPSolver(solver.model, solver.cfg.dt,
                                 solver.cfg.num_timesteps)

        solver_p = self.solver_predicted

        def tick(params, cost_params, costmap, state, stride, cs_a, cs_p):
            # slide (run_control_loop.cuh:206-215)
            cs_a = solver._slide(cs_a, stride)
            cs_p = solver_p._slide(cs_p, stride)
            # actual-state and predicted-state solves (:218-219)
            cs_a, st_a = solver._solve(params, cost_params, costmap,
                                       state, cs_a)
            cs_p, st_p = solver_p._solve(params, cost_params, costmap,
                                         cs_p.state_solution[0], cs_p)
            # arbitration by computed trajectory cost (:246-286)
            use_actual = st_a.trajectory_cost < st_p.trajectory_cost
            pick = lambda a, p: jnp.where(use_actual, a, p)
            chosen_ctrl = pick(cs_a.control_solution, cs_p.control_solution)
            chosen_states = pick(cs_a.state_solution, cs_p.state_solution)
            # resync predicted controller when actual wins (:263-266)
            cs_p = cs_p._replace(state_solution=chosen_states,
                                 control_solution=chosen_ctrl,
                                 U=pick(cs_a.U, cs_p.U))
            if self.use_feedback_gains:
                rngs = jnp.reshape(params["control_rngs"], (-1, 2))[-2:]
                gains = self.ddp.run(
                    params, state, pick(cs_a.U, cs_p.U), chosen_states,
                    chosen_ctrl, rngs[:, 0], rngs[:, 1]).feedback_gain
            else:
                gains = None
            # vehicle-footprint track cost (the crash latch's own
            # sample points, via the shared helper).  Computed
            # unconditionally: two point gathers against two full
            # solves is noise, and the scalar doubles as off-track
            # telemetry even when the (opt-in) guard is disabled.
            from autorally_tpu.costs.mppi_cost import MPPICost

            pos_cost = MPPICost.footprint_track_cost(
                costmap, state[0], state[1], state[2])
            out = TubeTickOutput(
                control_solution=chosen_ctrl,
                state_solution=chosen_states,
                feedback_gains=gains,
                use_actual=use_actual,
                trajectory_cost=pick(st_a.trajectory_cost,
                                     st_p.trajectory_cost),
                ess=pick(st_a.ess, st_p.ess),
                crash_frac=pick(st_a.crash_frac, st_p.crash_frac),
                position_track_cost=pos_cost)
            return cs_a, cs_p, out

        self._tick = jax.jit(tick)
        self._jnp = jnp
        self._jax = jax

    def reset(self, state: np.ndarray) -> None:
        """Re-seed both controllers at ``state`` (loop init,
        run_control_loop.cuh:146-155)."""
        jnp = self._jnp
        s = jnp.asarray(state, dtype=jnp.float32)
        self.cs_a = self.solver.init_state(self._seeds[0])
        self.cs_p = self.solver_predicted.init_state(self._seeds[1])
        self.cs_a = self.cs_a._replace(
            state_solution=self.cs_a.state_solution.at[0].set(s))
        self.cs_p = self.cs_p._replace(
            state_solution=self.cs_p.state_solution.at[0].set(s))

    def dispatch(self, state: np.ndarray, stride: int) -> TubeTickOutput:
        """Launch one tube tick; returns the output pytree of device
        arrays immediately (JAX async dispatch) with its host copy already
        in flight."""
        jnp = self._jnp
        self.cs_a, self.cs_p, out = self._tick(
            self.model_params, self.cost_params, self.costmap,
            jnp.asarray(state, dtype=jnp.float32), jnp.int32(stride),
            self.cs_a, self.cs_p)
        for leaf in self._jax.tree.leaves(out):
            try:
                leaf.copy_to_host_async()
            except AttributeError:      # non-Array leaf (None pruned)
                pass
        return out

    # -- hot updates (run_control_loop.cuh:182-204) ---------------------------

    def update_cost_params(self, cost_params: CostParams) -> None:
        self.cost_params = cost_params

    def update_costmap(self, costmap) -> None:
        self.costmap = costmap

    def update_model_params(self, model_params) -> None:
        self.model_params = model_params


@dataclasses.dataclass
class AsyncLoopConfig:
    hz: int = 50
    num_timesteps: int = 100
    optimization_stride: int = 1
    depth: int = 1                 # (initial) in-flight solves before harvest
    max_iter: Optional[int] = None
    realtime: bool = True          # False: lockstep vs a step_sim plant
    # Adaptive pipeline depth (realtime loops only).  A fixed depth must be
    # hand-sized to the device's dispatch->ready latency: too shallow and
    # harvest waits leak into tick latency when the latency spikes (this
    # rig's tunnel sync RTT varies 23-35 ms minute to minute); too deep and
    # the published solution is needlessly stale.  With adaptive_depth the
    # loop grows ``depth`` (up to ``max_depth``) after ``grow_after``
    # consecutive ticks whose harvest blocked for more than a quarter
    # period, and shrinks it after ``shrink_after_s`` seconds of
    # back-to-back non-blocking harvests — but never below the highest
    # depth it ever had to grow *to* (one oscillation per level at most:
    # stability beats freshness for a control loop).  With
    # ``carry_learned`` the learned depth AND the pinned floor are
    # written back to ``cfg.depth`` / ``cfg.shrink_floor`` at loop exit,
    # so a warmup pass teaches the measured passes and the
    # one-oscillation-per-level guarantee survives across invocations
    # sharing a config.  It is OPT-IN (round-4 advisor finding): a config
    # reused across unrelated tubes/devices must not silently inherit
    # another loop's learned depth — without it the learned values are
    # still reported via ``timing.async_depth_final`` /
    # ``timing.async_depth_max``.
    adaptive_depth: bool = False
    max_depth: int = 4
    grow_after: int = 3
    shrink_after_s: float = 5.0
    shrink_floor: int = 1
    carry_learned: bool = False
    # Degeneracy guard — same semantics as ControlLoopConfig: a
    # harvested solution whose rollouts nearly all crash-latched with a
    # flat softmax (ESS >> survivors), while the MEASURED car is off
    # the track boundary and moving faster than the speed gate,
    # publishes with the throttle braked and gains dropped.  OPT-IN
    # (default off) — see ControlLoopConfig.degeneracy_guard and
    # runtime/controller.py::stats_degenerate for why the statistics
    # cannot be trusted as a default across operating scales.
    degeneracy_guard: bool = False
    degenerate_crash_thresh: float = 0.9
    degenerate_ess_mult: float = 5.0
    degenerate_speed_gate: float = 2.0


def run_control_loop_async(tube: AsyncTubeController, plant: BasePlant,
                           cfg: AsyncLoopConfig,
                           is_alive: Optional[Callable[[], bool]] = None,
                           monitor: Optional[StatusMonitor] = None,
                           on_tick: Optional[Callable] = None,
                           on_loop_tick: Optional[Callable[[int], None]]
                           = None,
                           timing: Optional[TimingStats] = None
                           ) -> TimingStats:
    """Pipelined tube-MPPI loop: dispatch tick N, harvest and publish tick
    N-depth, pace to the deadline.

    ``on_tick(num_iter, used, state, out, harvest_ms, age_s)`` fires once
    per *harvested* solution (``used`` is "actual"/"predicted", ``out``
    the host-side :class:`TubeTickOutput`, ``age_s`` the solution's
    pose-anchor age at publish).  ``on_loop_tick(num_iter)`` fires once
    per loop iteration at the end of the tick's work, before pacing (the
    real-time gate's CPU-bracketing hook).  Returns timing stats whose
    ``tick_samples_ms`` cover dispatch + harvest + publish (sleep
    excluded) and whose ``harvest_samples_ms`` isolate the device wait.
    """
    alive = is_alive or (lambda: True)
    timing = TimingStats() if timing is None else timing
    stride_default = cfg.optimization_stride
    period = stride_default / cfg.hz
    depth = max(1, int(cfg.depth))
    # adaptive-depth state (see AsyncLoopConfig): realtime loops only —
    # lockstep harvests never block, so there is nothing to adapt to
    adapt = bool(cfg.adaptive_depth) and cfg.realtime
    max_depth = max(depth, int(cfg.max_depth))
    blocked_thresh_ms = period * 1000.0 / 4.0
    shrink_after = max(1, int(round(cfg.shrink_after_s * cfg.hz)))
    blocked_run = 0
    early_run = 0
    # highest depth a grow was ever forced to — carried across
    # invocations sharing this cfg (warmup pass -> measured passes)
    shrink_floor = max(1, int(cfg.shrink_floor))
    depth_max_seen = depth
    depth_changes: list = []

    state = plant.get_state().to_vector()
    tube.reset(state)

    last_pose_time = plant.get_last_pose_time()
    loop_time = period
    status = 1
    num_iter = 0
    degenerate_ticks = 0
    max_iter = cfg.max_iter if cfg.max_iter is not None else 2 ** 31

    pacer = None
    if cfg.realtime:
        try:
            from autorally_tpu.runtime.native import Pacer, native_available

            if native_available():
                pacer = Pacer(period)
        except Exception:
            pacer = None

    inflight: collections.deque = collections.deque()

    def harvest() -> float:
        """Publish the oldest in-flight solution; returns the blocked
        device-wait in ms."""
        t_disp, state_disp, out_dev = inflight.popleft()
        t0 = time.perf_counter()
        out = TubeTickOutput(*[None if leaf is None else np.asarray(leaf)
                               for leaf in out_dev])
        wait_ms = (time.perf_counter() - t0) * 1000.0
        used = "actual" if bool(out.use_actual) else "predicted"
        gains = out.feedback_gains if tube.use_feedback_gains else None
        ctrl_seq = out.control_solution
        crash = float(out.crash_frac)
        # crash short-circuits first, and a duck-typed tube without a
        # .solver skips the guard entirely (the ESS-vs-survivors bound
        # needs the winning controller's K, and braking on unknown K
        # would be guesswork); the ESS came from the WINNING
        # controller, so an asymmetric tube tests against that
        # controller's own K
        solver_a = getattr(tube, "solver", None)
        solver_w = (solver_a if bool(out.use_actual)
                    else getattr(tube, "solver_predicted", None) or solver_a)
        if (cfg.degeneracy_guard and crash > cfg.degenerate_crash_thresh
                and solver_w is not None
                and stats_degenerate(
                    float(out.ess), crash,
                    solver_w.cfg.num_rollouts,
                    cfg.degenerate_crash_thresh,
                    cfg.degenerate_ess_mult,
                    position_track_cost=(
                        None if out.position_track_cost is None
                        else float(out.position_track_cost)),
                    # duck-typed tubes without cost params fall back to
                    # the stats-only rule (boundary gate disabled)
                    boundary_threshold=(
                        None if getattr(tube, "cost_params", None) is None
                        else float(tube.cost_params.boundary_threshold)),
                    # MEASURED vx at this tick's dispatch (the winning
                    # controller may have solved from where it merely
                    # BELIEVED the car was); index 4 is vx
                    speed=float(state_disp[4]),
                    speed_gate=cfg.degenerate_speed_gate)):
            # no-preference plan: brake, drop gains (see config doc)
            ctrl_seq = ctrl_seq.copy()
            ctrl_seq[:, 1] = min(0.0, float(ctrl_seq[:, 1].min()))
            gains = None
            nonlocal degenerate_ticks
            degenerate_ticks += 1
        plant.set_solution(out.state_solution, ctrl_seq,
                           gains, t_disp, used)
        age = plant.get_last_pose_time() - t_disp
        timing.age_samples_s.append(age)
        if on_tick is not None:
            on_tick(num_iter, used, state, out, wait_ms, age)
        return wait_ms

    while alive() and num_iter < max_iter and not plant.shutdown:
        tick_start = time.perf_counter()
        num_iter += 1

        # state update (run_control_loop.cuh:176-181)
        t_pose = plant.get_last_pose_time()
        if t_pose != last_pose_time:
            loop_time = t_pose - last_pose_time
            last_pose_time = t_pose
            state = plant.get_state().to_vector()

        # hot updates ride the next dispatch (run_control_loop.cuh:182-204)
        new_cost, new_map, new_model = plant.take_updates()
        if new_cost is not None:
            tube.update_cost_params(new_cost)
        if new_map is not None:
            tube.update_costmap(new_map)
        if new_model is not None:
            tube.update_model_params(new_model)

        stride = int(round(loop_time * cfg.hz))
        if status != 0:
            stride = stride_default
        if not (0 <= stride < cfg.num_timesteps):
            # out-of-range pose jump: skip the slide entirely, matching
            # the sequential loop (control_loop.py stride guard);
            # _slide(cs, 0) is the identity
            stride = 0

        out_dev = tube.dispatch(state, stride)
        inflight.append((t_pose, state, out_dev))

        harvest_ms = 0.0
        harvested = len(inflight) > depth
        while len(inflight) > depth:
            harvest_ms += harvest()

        if adapt and harvested:
            if harvest_ms > blocked_thresh_ms:
                blocked_run += 1
                early_run = 0
            else:
                early_run += 1
                blocked_run = 0
            if blocked_run >= cfg.grow_after and depth < max_depth:
                # the device/tunnel is consistently slower than the
                # pipeline covers: deepen it (the next tick simply skips
                # its harvest, letting the queue grow by one)
                depth += 1
                shrink_floor = max(shrink_floor, depth)
                depth_max_seen = max(depth_max_seen, depth)
                depth_changes.append((num_iter, depth))
                blocked_run = 0
            elif early_run >= shrink_after and depth > shrink_floor:
                # sustained non-blocking harvests: trade pipeline slack
                # for a fresher published solution (next tick harvests
                # twice; if that was premature, the grow path recovers
                # and shrink_floor pins this level)
                depth -= 1
                depth_changes.append((num_iter, depth))
                early_run = 0

        status = (plant.check_status_wall() if cfg.realtime
                  else plant.check_status(plant.get_last_pose_time()))
        if monitor is not None:
            monitor.heartbeat(plant.get_last_pose_time(), status,
                              f"inflight={len(inflight)}")
        if on_loop_tick is not None:
            on_loop_tick(num_iter)

        tick_s = time.perf_counter() - tick_start

        missed = 0
        if not cfg.realtime and hasattr(plant, "step_sim"):
            plant.step_sim(stride_default)       # lockstep sim advance
            last_sleep = 0.0
        elif pacer is not None:
            t_sleep = time.perf_counter()
            missed = pacer.wait()
            last_sleep = time.perf_counter() - t_sleep
        else:
            remaining = period - tick_s
            last_sleep = max(0.0, remaining)
            if remaining > 0:
                time.sleep(remaining)
            else:
                missed = int(tick_s / period)

        timing.update(loop_time * 1000.0, tick_s * 1000.0,
                      last_sleep * 1000.0, missed=missed,
                      harvest_ms=harvest_ms)
        plant.set_timing_info(timing.avg_loop_ms, timing.avg_tick_ms,
                              timing.avg_sleep_ms)

    while inflight:                  # drain: leave the freshest solution
        harvest()
    # depth telemetry (ad-hoc attributes: only the async loop has them)
    timing.degenerate_ticks = degenerate_ticks    # guard telemetry
    timing.async_depth_initial = max(1, int(cfg.depth))
    timing.async_depth_final = depth
    timing.async_depth_max = depth_max_seen
    timing.async_depth_changes = depth_changes
    if adapt and cfg.carry_learned:
        # teach the next pass (see config doc): learned depth AND floor
        cfg.depth = depth
        cfg.shrink_floor = shrink_floor
    return timing
