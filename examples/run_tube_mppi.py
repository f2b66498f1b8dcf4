"""Full-stack tube-MPPI run — the ``path_integral_nn`` process equivalent.

Brings up the complete runtime (SURVEY.md §3.1): dual MPPI controllers
(actual-state + predicted-state) with DDP feedback gains, the plant
pipeline with solution interpolation and feedback application, the
tube-MPPI arbitration loop, the status-monitor watchdog, and lap-stats
benchmarking — driving a synthetic plant around an oval track.

Optionally loads its entire configuration from a reference roslaunch XML
file (standalone-mode parity with ``param_getter.cpp:75-151``)::

    python examples/run_tube_mppi.py --launch /root/reference/autorally_control/launch/path_integral_nn.launch
"""

import os
import sys

# Runnable as a plain script: put the repo root on sys.path (Python 3.11+
# adds only the script's own directory, not the cwd).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import math
import time

import numpy as np

from autorally_tpu.config import REFERENCE_BF_NPZ as BF_NPZ
from autorally_tpu.config import REFERENCE_NN_NPZ as MODEL_NPZ


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=400)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--launch", default=None,
                    help="roslaunch XML to load config from")
    ap.add_argument("--rollouts", type=int, default=1920)
    ap.add_argument("--timesteps", type=int, default=100)
    ap.add_argument("--bf", action="store_true",
                    help="basis-function dynamics (the path_integral_bf "
                         "binary role; reference default K=2560)")
    ap.add_argument("--model", default=None,
                    help="model .npz (defaults to the reference NN or BF "
                         "weights per --bf)")
    ap.add_argument("--desired-speed", type=float, default=6.0)
    ap.add_argument("--ess-target", type=float, default=None,
                    metavar="FRAC",
                    help="hold the effective sample size at FRAC*K by "
                         "live-tuning the softmax temperature (EssTuner; "
                         "beyond-reference: the reference pins gamma at "
                         "launch)")
    ap.add_argument("--telemetry-port", type=int, default=None,
                    help="UDP port to feed the operator console "
                         "(tools/console.py) on")
    ap.add_argument("--runstop-port", type=int, default=None,
                    help="UDP port to accept runstop commands on")
    ap.add_argument("--log", default=None,
                    help="append telemetry records to this JSONL run log")
    ap.add_argument("--camera", action="store_true",
                    help="attach the synthetic scene camera: rendered "
                         "frames from the car's pose drive the MSV "
                         "exposure loop and the republished ASCII view "
                         "on the console's image panel")
    ap.add_argument("--async-loop", action="store_true", dest="async_loop",
                    help="pipelined async-dispatch loop (the whole tube "
                         "tick as one device program, `--depth` solves in "
                         "flight — hides device/tunnel latency behind the "
                         "control period; runtime/async_loop.py)")
    ap.add_argument("--depth", type=int, default=1,
                    help="in-flight solves for --async-loop (2 covers a "
                         "~25 ms tunnel sync at 50 Hz)")
    ap.add_argument("--pred-rollouts", type=int, default=None,
                    help="asymmetric tube: rollout count for the "
                         "predicted-state controller (default: same as "
                         "--rollouts).  The predicted solve re-optimizes "
                         "its own already-good plan, so a fraction of "
                         "the budget suffices — this is what lets a "
                         "65K-class tube hold 50 Hz on one chip")
    ap.add_argument("--degeneracy-guard", action="store_true",
                    dest="degeneracy_guard",
                    help="brake flat-softmax plans when the measured car "
                         "is off the track boundary at speed (opt-in: "
                         "meant for deployment-scale configs — see "
                         "ControlLoopConfig.degeneracy_guard)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from autorally_tpu.config import (CostParams, MPPIConfig,
                                      config_from_params, load_launch_params)
    from autorally_tpu.costs import MPPICost
    from autorally_tpu.costs.costmap import make_costmap
    from autorally_tpu.models import NeuralNetDynamics
    from autorally_tpu.runtime import (ControlLoopConfig, Controller,
                                       LapStats, StatusMonitor,
                                       SyntheticPlant, run_control_loop)
    from autorally_tpu.solver.ddp import DDPSolver
    from autorally_tpu.solver.mppi import MPPISolver
    from autorally_tpu.tools.track_generator import oval_track

    if args.launch:
        params = load_launch_params(args.launch, env={"AR_MPPI_PARAMS_PATH": ""})
        cfg, cost_params = config_from_params(params)
        cfg = cfg.replace(num_rollouts=args.rollouts)
        print(f"config from {args.launch}: hz={cfg.hz} T={cfg.num_timesteps} "
              f"gamma={cfg.gamma} desired_speed={float(cost_params.desired_speed)}")
    else:
        cfg = MPPIConfig(num_rollouts=args.rollouts,
                         num_timesteps=args.timesteps)
        cost_params = CostParams(desired_speed=args.desired_speed)

    tuner = None
    if args.ess_target is not None:
        from autorally_tpu.runtime.ess_tuner import EssTuner

        tuner = EssTuner(cfg, target_frac=args.ess_target)
        # seed gamma as a traced scalar BEFORE the first solve compiles:
        # the None->scalar flip changes the CostParams pytree structure,
        # so an unseeded first tuner update would recompile mid-drive
        cost_params = tuner.seed(cost_params)

    data, xb, yb = oval_track(half_length=30.0, half_width=18.0,
                              track_width=6.0, ppm=10.0)
    cm = make_costmap(data, xb, yb)
    if args.bf:
        from autorally_tpu.models import BasisFunctionDynamics
        model = BasisFunctionDynamics(cfg.dt,
                                      control_ranges=cfg.control_ranges)
        params_m = model.load_params(args.model or BF_NPZ)
    else:
        model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
        params_m = model.load_params(args.model or MODEL_NPZ)

    solver = MPPISolver(model, MPPICost(cfg.l1_cost), cfg)
    solver_pred = (solver.with_rollouts(args.pred_rollouts)
                   if args.pred_rollouts is not None else solver)
    ddp = DDPSolver(model, cfg.dt, cfg.num_timesteps)
    actual = Controller(solver, params_m, cost_params, cm, ddp=ddp)
    predicted = Controller(solver_pred, params_m, cost_params, cm, ddp=ddp,
                           seed=77)

    start = np.array([30.0, 0.0, math.pi / 2, 0, 0, 0, 0], dtype=np.float32)
    plant = SyntheticPlant(model, params_m, start, cfg.dt, cfg.num_timesteps,
                           use_feedback_gains=cfg.use_feedback_gains,
                           throttle_max=cfg.max_throttle)
    plant.receive_state_vector(0.0, start)

    monitor = StatusMonitor()
    # Start line: the segment x in [25, 35] on the +x side (y sign flip).
    laps = LapStats(line=(0.0, 0.0, 25.0, 35.0))

    # observability: telemetry bus (console feed + JSONL run log), host
    # telemetry, runstop backchannel — the OCS-facing side of the run
    bus = sysmon = runstop_rx = None
    diag_agg = None
    if args.telemetry_port or args.log:
        from autorally_tpu.runtime.diagnostics import DiagnosticsAggregator
        from autorally_tpu.runtime.system_status import SystemStatusMonitor
        from autorally_tpu.runtime.telemetry_bus import TelemetryBus

        udp = ("127.0.0.1", args.telemetry_port) if args.telemetry_port \
            else None
        bus = TelemetryBus(jsonl_path=args.log, udp_addr=udp)
        diag_agg = DiagnosticsAggregator(
            on_publish=lambda report: bus.publish("diag", report))
        sysmon = SystemStatusMonitor(diag_agg, period=5.0)
        bus.publish("run", {"num_rollouts": cfg.num_rollouts,
                            "num_timesteps": cfg.num_timesteps,
                            "hz": cfg.hz, "plant": "synthetic_oval",
                            "desired_speed": float(args.desired_speed)})
    if args.runstop_port:
        from autorally_tpu.runtime.telemetry_bus import RunstopReceiver

        runstop_rx = RunstopReceiver(
            args.runstop_port,
            on_change=lambda en: plant.set_runstop(not en))

    # scene camera: render -> exposure control -> rate-limited republish
    # (CameraAutoBalance + ImageRepublisher consumers fed by a real
    # producer, vision/scene_camera.py)
    camera = balance = republisher = None
    if args.camera:
        from autorally_tpu.vision.auto_balance import (AutoBalanceConfig,
                                                       CameraAutoBalance)
        from autorally_tpu.vision.image_republisher import ImageRepublisher
        from autorally_tpu.vision.scene_camera import (SceneCamera,
                                                       SceneConfig,
                                                       SceneRenderer,
                                                       ascii_frame)

        camera = SceneCamera(SceneRenderer(cm, SceneConfig(
            width=160, height=120,
            shadows=((0.0, 18.0, 10.0, 0.25),))))   # shaded north bend
        balance = CameraAutoBalance(camera, AutoBalanceConfig(
            roi=(0, 60, 160, 120), k_shutter=2e-3, k_gain=2e-3,
            max_shutter=30000.0))

        def _forward(small, ts):
            if bus is not None:
                bus.publish("image", {
                    "ascii": ascii_frame(small),
                    "msv": round(balance.cfg.msv_reference
                                 - balance.msv_error, 1),
                    "shutter": round(balance.shutter, 1),
                    "gain": round(balance.gain, 3)})

        republisher = ImageRepublisher(_forward, max_hz=5.0, scale=2)

    from autorally_tpu.runtime.telemetry import TimingStats
    timing = TimingStats()

    budget_ms = 1000.0 * cfg.optimization_stride / cfg.hz

    used_counts = {"actual": 0, "predicted": 0}
    t_wall = time.time()
    last_slow = [0.0]                       # last 1 Hz publish wall time

    def on_tick(i, chosen, used, state):
        used_counts[used] += 1
        if camera is not None:
            from autorally_tpu.vision.scene_camera import draw_path

            pose = (state[0], state[1], state[2])
            frame = camera.capture(pose)
            balance.process_frame(frame)          # exposure sees raw frame
            # republished view carries the chosen plan overlay (the OCS
            # image-mask role); only annotate frames the rate cap will
            # actually forward — ~90% are dropped at 5 Hz over 50 Hz
            if republisher.ready():
                sol = getattr(getattr(chosen, "cs", None),
                              "state_solution", None)
                if sol is None:                    # async shim: TubeTickOutput
                    sol = getattr(chosen.stats, "state_solution", None)
                if sol is not None:
                    frame = draw_path(frame, camera.renderer, pose,
                                      np.asarray(sol))
            republisher.process(frame)
        rec = laps.process_pose(plant.sim_time, state[0], state[1],
                                state[4], state[5])
        if rec:
            print(f"  LAP {rec.lap_number}: {rec.lap_time:.2f}s "
                  f"max_speed={rec.max_speed:.2f} max_slip={rec.max_slip:.3f}")
            if bus is not None:
                bus.publish("lap", {"lap_number": rec.lap_number,
                                    "lap_time": rec.lap_time,
                                    "max_speed": rec.max_speed,
                                    "max_slip": rec.max_slip})
        if bus is not None:
            s = chosen.stats
            bus.publish("solve", {
                "tick": i, "x": float(state[0]), "y": float(state[1]),
                "speed": float(state[4]), "used": used,
                "ess": float(s.ess) if s else 0.0,
                "gamma": tuner.gamma if tuner else cfg.gamma,
                "crash_pct": 100.0 * float(s.crash_frac) if s else 0.0,
                "traj_cost": chosen.get_computed_trajectory_cost()})
            now = time.time()
            if now - last_slow[0] >= 1.0:
                last_slow[0] = now
                d = timing.as_dict()
                d["budget_ms"] = budget_ms
                bus.publish("timing", d)
                diag = monitor.diagnostic(plant.get_last_pose_time())
                mppi = diag_agg.component("mppi")
                push = {"ok": mppi.diag_ok, "warn": mppi.diag_warn,
                        "error": mppi.diag_error}[diag["level"]]
                push("status", diag["message"] or "ok")
                snap = sysmon.maybe_sample(now)
                if snap is not None:
                    bus.publish("system", snap)
                diag_agg.maybe_publish(now)
        if i % 100 == 0:
            diag = monitor.diagnostic(plant.get_last_pose_time())
            print(f"tick {i:4d} pos=({state[0]:+7.2f},{state[1]:+7.2f}) "
                  f"speed={state[4]:5.2f} using={used:9s} "
                  f"monitor={diag['level']}")

    if args.async_loop:
        from autorally_tpu.runtime.async_loop import (
            AsyncLoopConfig, AsyncTubeController, run_control_loop_async)

        tube = AsyncTubeController(
            solver, params_m, cost_params, cm,
            use_feedback_gains=cfg.use_feedback_gains,
            solver_predicted=(None if solver_pred is solver
                              else solver_pred))

        class _Shim:
            """Adapt the async hook to the sync on_tick consumers (the
            bus publishes ess/crash from the harvested TubeTickOutput)."""
            def __init__(self, out):
                self.stats = out

            def get_computed_trajectory_cost(self):
                return float(self.stats.trajectory_cost)

        ess_cb_async = tuner.attach_async(tube) if tuner else None

        def on_tick_async(num_iter, used, state, out, harvest_ms, age_s):
            if ess_cb_async is not None:
                ess_cb_async(num_iter, used, state, out, harvest_ms, age_s)
            on_tick(num_iter, _Shim(out), used, state)

        alcfg = AsyncLoopConfig(hz=cfg.hz,
                                num_timesteps=cfg.num_timesteps,
                                optimization_stride=cfg.optimization_stride,
                                depth=args.depth, realtime=False,
                                max_iter=args.ticks,
                                degeneracy_guard=args.degeneracy_guard)
        timing = run_control_loop_async(tube, plant, alcfg,
                                        monitor=monitor,
                                        on_tick=on_tick_async,
                                        timing=timing)
    else:
        lcfg = ControlLoopConfig(hz=cfg.hz, num_timesteps=cfg.num_timesteps,
                                 optimization_stride=cfg.optimization_stride,
                                 use_feedback_gains=cfg.use_feedback_gains,
                                 max_iter=args.ticks,
                                 degeneracy_guard=args.degeneracy_guard)
        tick_cb = on_tick
        if tuner is not None:
            ess_cb = tuner.attach(actual, predicted)

            def tick_cb(i, chosen, used, state):
                ess_cb(i, chosen, used, state)
                on_tick(i, chosen, used, state)

        timing = run_control_loop(predicted, actual, plant, lcfg,
                                  monitor=monitor, on_tick=tick_cb,
                                  timing=timing)
    if bus is not None:
        bus.publish("timing", {**timing.as_dict(), "budget_ms": budget_ms})
        bus.close()
    if runstop_rx is not None:
        runstop_rx.close()

    print(f"\n{args.ticks} ticks in {time.time()-t_wall:.1f}s wall")
    print(f"controller usage: {used_counts}")
    print(f"timing: avg tick {timing.avg_tick_ms:.2f} ms "
          f"(budget {1000.0*cfg.optimization_stride/cfg.hz:.0f} ms)")
    print(f"laps: {len(laps.laps)}  controls published: {len(plant.published)}")
    print(f"final state: pos=({plant.true_state[0]:.2f},{plant.true_state[1]:.2f}) "
          f"speed={plant.true_state[4]:.2f}")


if __name__ == "__main__":
    main()
