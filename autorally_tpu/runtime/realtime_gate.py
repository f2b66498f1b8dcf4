"""Real-time gate: prove the deployed control stack holds its budget.

The reference's real-time claim lives in ``runControlLoop``'s paced sleep
(``run_control_loop.cuh:304-318``) but is never *asserted* anywhere — a
slow tick silently eats into the next period.  This harness runs the full
deployment stack — simulator node in a separate OS process, native UDP
pose/command transport, ring buffers, dual-controller tube-MPPI
arbitration, DDP feedback gains, absolute-deadline pacer — for N seconds
and reports tick-latency percentiles plus missed deadlines, so tests and
``bench.py`` can gate on ``p99 < budget`` and ``missed == 0``.

A warmup pass (separate ``run_control_loop`` invocation) absorbs XLA
compilation before the measured pass; the reference has the same warmup
behavior implicitly (first GPU launches amortize before the vehicle is
armed).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from typing import Optional


def _measured_passes(run_pass, hz: float, seconds: float, attempts: int
                     ) -> dict:
    """Shared measurement harness for both gates: up to ``attempts``
    passes with the Python cyclic GC parked (a collection pause is 10+ ms
    of stop-the-world; refcounting still reclaims) and best-effort
    SCHED_FIFO, pooling validity-discriminated per-tick samples until
    ``seconds * hz * 1.5`` valid ticks accumulate.

    ``run_pass(hook)`` runs one pass of ``seconds * hz`` loop ticks,
    calling ``hook()`` once per tick AFTER the tick's work (so
    consecutive (monotonic, process_time) marks bracket the previous
    pace-sleep + this tick), and returns the pass's
    :class:`~autorally_tpu.runtime.telemetry.TimingStats`.

    The CPU-backing discriminator: the tick's work is CPU-bound and
    never blocks — except time blocked on a device harvest, which the
    loop records in ``harvest_samples_ms`` (always 0 for the sequential
    loop) and which is subtracted from the wall side first.  A tick whose
    remaining wall latency exceeds the CPU the whole process burned in
    the bracketing window by more than half the budget was stalled by
    the host — hypervisor steal, runqueue wait, page faults, and
    whole-VM pauses all show up as wall-without-CPU, because a preempted
    or blocked vCPU accrues no cputime.  Such ticks are *void*: the
    stall would have hit any code.  A loop that systematically overruns
    burns real CPU in its slow ticks, so those stay valid.  Paced misses
    count only when the tick's own work overran the period (a late wake
    from the absolute-deadline sleep is not the sleeping thread's
    fault).

    Returns {valid: [(tick_ms, missed)], all_ticks, harvests, net_ticks,
    tainted, used, timing, attempts, missed_raw} — ``net_ticks`` are tick
    latencies minus the device-blocked harvest wait (the host stack's own
    work — what a host-attached accelerator without this rig's tunnel
    would see), ``attempts`` per-pass summaries (tunnel/host weather
    varies by the minute; the best attempt is the existence proof, the
    pool the typical picture).  ``missed_raw`` is the UNCENSORED
    wall-clock deadline-miss count over every tick — tainted ticks
    included, paced late-wakes included — while the per-tick ``missed``
    values are censored to misses *attributable to the stack* (a tick
    whose own work fit the budget cannot have caused the pacer's late
    wake).  Gate consumers should check both: ``missed == 0`` grades the
    stack; ``missed_raw`` tells the truth about the wall clock.
    """
    import gc

    gc.collect()
    gc.disable()
    fifo = _try_sched_fifo()
    budget_ms = 1000.0 / hz
    target_valid = int(seconds * hz * 1.5)
    valid = []
    all_ticks = []
    harvests = []
    net_ticks = []
    ages = []                       # published-solution ages, pooled
    per_attempt = []
    tainted = 0
    used = 0
    missed_raw = 0
    timing = None
    try:
        for _ in range(max(1, attempts)):
            used += 1
            marks = []

            def hook(*_args):
                marks.append((time.monotonic(), time.process_time()))

            t_pre = (time.monotonic(), time.process_time())
            timing = run_pass(hook)
            prev = t_pre
            a_valid = []
            a_missed_raw = 0
            for i, mark in enumerate(marks):
                tick_ms = timing.tick_samples_ms[i]
                harvest_ms = (timing.harvest_samples_ms[i]
                              if i < len(timing.harvest_samples_ms)
                              else 0.0)
                all_ticks.append(tick_ms)
                harvests.append(harvest_ms)
                net_ticks.append(max(0.0, tick_ms - harvest_ms))
                a_missed_raw += int(timing.missed_samples[i])
                cpu_ms = (mark[1] - prev[1]) * 1000.0
                prev = mark
                if tick_ms - harvest_ms - cpu_ms > budget_ms / 2.0:
                    tainted += 1
                    continue
                missed = timing.missed_samples[i]
                if missed and tick_ms <= budget_ms:
                    missed = 0
                valid.append((tick_ms, missed))
                a_valid.append((tick_ms, missed))
            missed_raw += a_missed_raw
            ages.extend(getattr(timing, "age_samples_s", []) or [])
            per_attempt.append({
                "p99_ms": _pct([v[0] for v in a_valid], 99.0),
                "missed": sum(v[1] for v in a_valid),
                "missed_raw": a_missed_raw,
                "valid_ticks": len(a_valid),
            })
            if len(valid) >= target_valid:
                break
    finally:
        gc.enable()
        if fifo:
            _drop_sched_fifo()
    return {"valid": valid, "all_ticks": all_ticks, "harvests": harvests,
            "net_ticks": net_ticks, "ages": ages, "tainted": tainted,
            "used": used, "timing": timing, "attempts": per_attempt,
            "missed_raw": missed_raw}


def _pct(samples, p: float):
    from autorally_tpu.runtime.telemetry import _nearest_rank

    if not samples:
        return None
    return round(_nearest_rank(sorted(samples), p), 3)


def run_realtime_gate(pose_port: int = 47960, control_port: int = 47961,
                      hz: int = 50, seconds: float = 3.0,
                      num_rollouts: int = 64, num_timesteps: int = 16,
                      use_feedback_gains: bool = True,
                      physics: bool = False,
                      warmup_iters: int = 8,
                      attempts: int = 6) -> dict:
    """Run the two-process realtime loop and return timing stats.

    This rig is a VM where hypervisor steal can freeze a vCPU for tens to
    hundreds of ms — measured spikes of 40-135 ms land *inside* the jitted
    solves, sometimes with zero steal jiffies, zero runqueue wait, and no
    whole-VM stall visible to a concurrent sentinel process — so raw
    wall-time percentiles cannot distinguish the control stack's latency
    from the host's.  The discriminator that does work is **CPU backing**:
    the tick's work (jitted solves + host glue) is CPU-bound and never
    blocks, so a tick whose wall latency exceeds the CPU time the whole
    process burned in the bracketing window (``time.process_time``, all
    threads) by more than half the budget was stalled by the host —
    hypervisor steal, runqueue wait, page fault, and whole-VM pauses all
    show up as wall-without-CPU, because a preempted or blocked vCPU
    accrues no cputime.  Such ticks are *void*: the stall would have hit
    any code.

    Percentiles and the missed-deadline count are computed over the
    remaining *valid* ticks, pooled across up to ``attempts`` passes until
    ``target_valid`` valid ticks accumulate.  A loop that systematically
    overruns its budget burns real CPU in its slow ticks, so they stay
    valid — nothing systematic can hide in the voiding.  Paced misses are
    counted only when the tick's own work overran the period: a late wake
    from the absolute-deadline sleep cannot be the sleeping thread's
    fault.

    Returns a dict with ``p50_ms``/``p99_ms``/``missed`` (over valid
    ticks), ``ticks`` (total measured), ``valid_ticks``,
    ``tainted_ticks``, ``budget_ms``, ``attempts_used``, ``p99_all_ms``
    and ``missed_raw`` (both UNCENSORED, over every tick) plus the last
    pass's raw :class:`TimingStats` dict under ``raw``.  ``missed``
    means *misses attributable to the stack*: host-stalled ticks are
    voided and a paced late-wake is not charged to a tick whose own work
    fit the budget; ``missed_raw`` counts every wall-clock deadline
    overrun regardless of cause.  Gate consumers should require BOTH —
    ``missed == 0`` (the stack holds its budget) and a ``missed_raw``
    bound whenever the host was quiet (``tainted_ticks == 0`` implies
    the two can only differ by paced late wakes).  Callers should gate
    only when ``valid_ticks`` is large enough to carry a p99 (the test
    uses >= 100).  Raises ``RuntimeError`` if the simulator process
    produces no poses.
    """
    from autorally_tpu.config import CostParams, MPPIConfig
    from autorally_tpu.costs import MPPICost
    from autorally_tpu.costs.costmap import make_costmap
    from autorally_tpu.models import NeuralNetDynamics
    from autorally_tpu.runtime.control_loop import (ControlLoopConfig,
                                                    run_control_loop)
    from autorally_tpu.runtime.controller import Controller
    from autorally_tpu.runtime.udp_plant import UdpPlant
    from autorally_tpu.solver.mppi import MPPISolver
    from autorally_tpu.tools.sim_node import DEFAULT_MODEL
    from autorally_tpu.tools.track_generator import oval_track

    duration = seconds * attempts + warmup_iters / hz + 30.0
    sim = subprocess.Popen(
        [sys.executable, "-m", "autorally_tpu.tools.sim_node",
         "--cpu", "--hz", str(hz), "--duration", str(duration),
         "--pose-port", str(pose_port), "--control-port", str(control_port)]
        + (["--physics"] if physics else []),
        env=dict(os.environ), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)

    plant: Optional[UdpPlant] = None
    try:
        cfg = MPPIConfig(num_rollouts=num_rollouts,
                         num_timesteps=num_timesteps, hz=hz)
        data, xb, yb = oval_track(ppm=2.0)
        cm = make_costmap(data, xb, yb)
        model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
        params = model.load_params(DEFAULT_MODEL)
        solver = MPPISolver(model, MPPICost(), cfg)
        cp = CostParams(desired_speed=4.0)
        actual = Controller(solver, params, cp, cm)
        predicted = Controller(solver, params, cp, cm, seed=9)

        plant = UdpPlant(dt=cfg.dt, num_timesteps=cfg.num_timesteps,
                         pose_port=pose_port, control_port=control_port,
                         fmt="state",
                         use_feedback_gains=use_feedback_gains)
        plant.start()
        deadline = time.time() + 15
        while plant.pose_count == 0 and time.time() < deadline:
            time.sleep(0.05)
        if plant.pose_count == 0:
            raise RuntimeError("no poses from the simulator process")

        lcfg = ControlLoopConfig(hz=cfg.hz,
                                 num_timesteps=cfg.num_timesteps,
                                 use_feedback_gains=use_feedback_gains,
                                 realtime=True)
        # warmup: absorb jit compilation outside the measured window
        lcfg.max_iter = warmup_iters
        run_control_loop(predicted, actual, plant, lcfg)

        lcfg.max_iter = int(seconds * hz)
        res = _measured_passes(
            lambda hook: run_control_loop(predicted, actual, plant, lcfg,
                                          on_tick=hook),
            hz, seconds, attempts)

        vt = [v[0] for v in res["valid"]]
        timing = res["timing"]
        return {
            "p50_ms": _pct(vt, 50.0),
            "p99_ms": _pct(vt, 99.0),
            "missed": sum(v[1] for v in res["valid"]),
            "missed_raw": res["missed_raw"],
            "ticks": len(res["all_ticks"]),
            "valid_ticks": len(res["valid"]),
            "tainted_ticks": res["tainted"],
            "budget_ms": 1000.0 / hz,
            "attempts_used": res["used"],
            "p99_all_ms": _pct(res["all_ticks"], 99.0),
            "raw": timing.as_dict() if timing is not None else {},
        }
    finally:
        if plant is not None:
            try:
                plant.stop()
            except Exception:
                pass
        try:
            sim.terminate()
            sim.communicate(timeout=10)
        except subprocess.TimeoutExpired:
            sim.kill()
            sim.communicate()


def run_realtime_gate_async(pose_port: int = 47980,
                            control_port: int = 47981,
                            hz: int = 50, seconds: float = 3.0,
                            num_rollouts: int = 1920,
                            num_timesteps: int = 100,
                            use_feedback_gains: bool = True,
                            depth: int = 2,
                            adaptive_depth: bool = True,
                            max_depth: Optional[int] = None,
                            warmup_iters: int = 12,
                            attempts: int = 6,
                            noise_sampler: str = "gaussian",
                            noise_param: float = 1.0,
                            num_rollouts_predicted: Optional[int] = None
                            ) -> dict:
    """Realtime gate over the ASYNC-dispatch loop at the reference
    operating point (K=1920, T=100) on the default backend (TPU when
    present).

    The sequential gate above measures the host control stack with a
    small CPU solve; this one proves the 50 Hz claim end-to-end against
    the real device.  The async loop (``runtime/async_loop.py``) keeps
    ``depth`` tube ticks in flight, so the device solve plus this rig's
    ~25 ms tunnel round-trip hide behind ``depth`` control periods; the
    per-tick host work is dispatch + harvest(publish) + pacing.  The
    published solution is ``depth`` periods old, which the plant's
    interpolation absorbs exactly as the reference's does during a 20 ms
    solve (``autorally_plant.cpp:215-223``).

    With ``adaptive_depth`` (default) the loop auto-sizes the pipeline to
    the *measured* dispatch->ready latency: the warmup pass learns the
    depth (written back into the shared loop config) and the measured
    passes keep adapting if the tunnel's RTT drifts mid-run — a fixed
    ``depth`` sized for a quiet tunnel leaks harvest waits into tick
    latency the minute the RTT spikes past ``depth`` periods.

    Validity discriminator: as in :func:`run_realtime_gate`, a tick whose
    wall latency exceeds its CPU backing by more than half the budget was
    stalled by the host (hypervisor steal / runqueue / page fault) — but
    here the harvest wait is *device*-bound blocked time that legitimately
    accrues no CPU, so it is first subtracted from the wall side.  Harvest
    time still counts against the budget (it is honest stack latency); it
    is only excluded from the steal test.

    ``num_rollouts_predicted`` sizes an ASYMMETRIC tube (round 5): the
    predicted-state controller runs its own smaller solver, so a
    65K-class actual-state solve can hold 50 Hz on one chip where the
    symmetric tube's 2x16 ms device work cannot (see
    ``AsyncTubeController``).  Default None = symmetric (shared solver).

    Returns the same dict shape as :func:`run_realtime_gate` plus
    ``depth``, ``harvest_p50_ms``, ``harvest_p99_ms``.
    """
    from autorally_tpu.config import CostParams, MPPIConfig
    from autorally_tpu.costs import MPPICost
    from autorally_tpu.costs.costmap import make_costmap
    from autorally_tpu.models import NeuralNetDynamics
    from autorally_tpu.runtime.async_loop import (AsyncLoopConfig,
                                                  AsyncTubeController,
                                                  run_control_loop_async)
    from autorally_tpu.runtime.udp_plant import UdpPlant
    from autorally_tpu.solver.mppi import MPPISolver
    from autorally_tpu.tools.sim_node import DEFAULT_MODEL
    from autorally_tpu.tools.track_generator import oval_track

    # build the full stack BEFORE spawning the simulator: device-backend
    # init rides a tunnel on this rig and the first tube-tick compile is
    # minutes-scale uncached, so the sim's lifetime budgets for the
    # warmup compile, not for framework construction
    cfg = MPPIConfig(num_rollouts=num_rollouts,
                     num_timesteps=num_timesteps, hz=hz,
                     noise_sampler=noise_sampler, noise_param=noise_param)
    data, xb, yb = oval_track(ppm=2.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(DEFAULT_MODEL)
    solver = MPPISolver(model, MPPICost(), cfg)
    solver_pred = (solver.with_rollouts(num_rollouts_predicted)
                   if num_rollouts_predicted is not None else None)
    cp = CostParams(desired_speed=4.0)
    tube = AsyncTubeController(solver, params, cp, cm,
                               use_feedback_gains=use_feedback_gains,
                               solver_predicted=solver_pred)

    duration = seconds * attempts + (warmup_iters + 20) / hz + 420.0
    sim = subprocess.Popen(
        [sys.executable, "-m", "autorally_tpu.tools.sim_node",
         "--cpu", "--hz", str(hz), "--duration", str(duration),
         "--pose-port", str(pose_port), "--control-port",
         str(control_port)],
        env=dict(os.environ), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)

    plant: Optional[UdpPlant] = None
    try:
        plant = UdpPlant(dt=cfg.dt, num_timesteps=cfg.num_timesteps,
                         pose_port=pose_port, control_port=control_port,
                         fmt="state",
                         use_feedback_gains=use_feedback_gains)
        plant.start()
        deadline = time.time() + 15
        while plant.pose_count == 0 and time.time() < deadline:
            time.sleep(0.05)
        if plant.pose_count == 0:
            raise RuntimeError("no poses from the simulator process")

        # adaptive depth needs grow headroom above the STARTING depth —
        # a gate launched at depth=4 with the config default max_depth=4
        # could never deepen when the tunnel RTT drifts mid-run.  The
        # default headroom is +2 (not unbounded): every extra level is a
        # control period of published-solution staleness, and the gate's
        # age_p50/p99 telemetry reports whatever is actually incurred.
        if max_depth is None:
            max_depth = depth + 2 if adaptive_depth else depth
        lcfg = AsyncLoopConfig(hz=cfg.hz,
                               num_timesteps=cfg.num_timesteps,
                               depth=depth, realtime=True,
                               adaptive_depth=adaptive_depth,
                               max_depth=max_depth,
                               carry_learned=True)
        # warmup: absorb jit compilation + device-tunnel warm paths
        lcfg.max_iter = warmup_iters
        run_control_loop_async(tube, plant, lcfg)

        lcfg.max_iter = int(seconds * hz)
        res = _measured_passes(
            lambda hook: run_control_loop_async(tube, plant, lcfg,
                                                on_loop_tick=hook),
            hz, seconds, attempts)

        vt = [v[0] for v in res["valid"]]
        timing = res["timing"]
        return {
            "p50_ms": _pct(vt, 50.0),
            "p99_ms": _pct(vt, 99.0),
            "missed": sum(v[1] for v in res["valid"]),
            "missed_raw": res["missed_raw"],
            "ticks": len(res["all_ticks"]),
            "valid_ticks": len(res["valid"]),
            "tainted_ticks": res["tainted"],
            "budget_ms": 1000.0 / hz,
            "attempts_used": res["used"],
            "depth": depth,
            "adaptive_depth": adaptive_depth,
            "depth_final": getattr(timing, "async_depth_final", depth),
            "depth_max": getattr(timing, "async_depth_max", depth),
            "num_rollouts": num_rollouts,
            "num_rollouts_predicted": (num_rollouts
                                       if num_rollouts_predicted is None
                                       else num_rollouts_predicted),
            "num_timesteps": num_timesteps,
            "harvest_p50_ms": _pct(res["harvests"], 50.0),
            "harvest_p99_ms": _pct(res["harvests"], 99.0),
            # published-solution age (pose seconds): ~depth control
            # periods when the device keeps up; growth past that exposes
            # a device that cannot sustain the tick rate even when
            # censored percentiles look healthy (pooled over every
            # attempt, like the sibling percentiles)
            "age_p50_s": _pct(res["ages"], 50.0),
            "age_p99_s": _pct(res["ages"], 99.0),
            # the host stack's own per-tick work, net of the device/
            # tunnel wait — what a host-attached accelerator would see
            "p99_net_ms": _pct(res["net_ticks"], 99.0),
            # per-pass summaries: the tunnel's RTT jitter varies minute
            # to minute; the best attempt is the existence proof
            "attempts": res["attempts"],
            "best_attempt_p99_ms": min(
                (a["p99_ms"] for a in res["attempts"]
                 if a["p99_ms"] is not None), default=None),
            "p99_all_ms": _pct(res["all_ticks"], 99.0),
            "raw": timing.as_dict() if timing is not None else {},
        }
    finally:
        if plant is not None:
            try:
                plant.stop()
            except Exception:
                pass
        try:
            sim.terminate()
            sim.communicate(timeout=10)
        except subprocess.TimeoutExpired:
            sim.kill()
            sim.communicate()


def _try_sched_fifo(prio: int = 10) -> bool:
    """Best-effort SCHED_FIFO for the control thread (Linux applies
    ``sched_setscheduler(0, ...)`` per-thread).  A real deployment runs
    the control thread at RT priority; without the capability this is a
    silent no-op and the gate just rides the normal scheduler."""
    try:
        os.sched_setscheduler(0, os.SCHED_FIFO, os.sched_param(prio))
        return True
    except (AttributeError, PermissionError, OSError):
        return False


def _drop_sched_fifo() -> None:
    try:
        os.sched_setscheduler(0, os.SCHED_OTHER, os.sched_param(0))
    except (AttributeError, PermissionError, OSError):
        pass


def main(argv=None) -> int:
    """CLI: run the gate and print one JSON line (used by ``bench.py`` in
    a CPU subprocess — the axon TPU tunnel adds ~25 ms per host-synced
    dispatch, which would measure the tunnel, not the control stack; the
    on-device solve rate is the headline benchmark instead)."""
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--hz", type=int, default=50)
    ap.add_argument("--pose-port", type=int, default=47960)
    ap.add_argument("--control-port", type=int, default=47961)
    ap.add_argument("--async", dest="use_async", action="store_true",
                    help="async-dispatch loop at K=1920/T=100 on the "
                         "default backend (the on-TPU 50 Hz proof)")
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--fixed-depth", action="store_true",
                    help="disable adaptive pipeline depth")
    ap.add_argument("--rollouts", type=int, default=1920)
    ap.add_argument("--timesteps", type=int, default=100)
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.use_async:
        res = run_realtime_gate_async(pose_port=args.pose_port,
                                      control_port=args.control_port,
                                      hz=args.hz, seconds=args.seconds,
                                      num_rollouts=args.rollouts,
                                      num_timesteps=args.timesteps,
                                      depth=args.depth,
                                      adaptive_depth=not args.fixed_depth)
    else:
        res = run_realtime_gate(pose_port=args.pose_port,
                                control_port=args.control_port,
                                hz=args.hz, seconds=args.seconds)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
