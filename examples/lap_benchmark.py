"""Lap-time benchmark: device-speed closed-loop laps around the oval.

The reference's quantitative evaluation is ``lap_stats.py`` — lap time,
max speed, max slip per lap of the real/Gazebo car.  Here the whole
tube-MPPI closed loop (dual controllers, arbitration, plant propagation)
runs on-device via the fused :class:`EpisodeRunner`, so multi-lap
episodes evaluate in seconds, then the same start-line-crossing lap
detector scores the trajectory.

    python examples/lap_benchmark.py [--ticks 4000] [--rollouts 1920] [--cpu]
"""

import os
import sys

# Runnable as a plain script: put the repo root on sys.path (Python 3.11+
# adds only the script's own directory, not the cwd).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np

from autorally_tpu.config import REFERENCE_BF_NPZ as BF_NPZ
from autorally_tpu.config import REFERENCE_NN_NPZ as MODEL_NPZ


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=4000)
    ap.add_argument("--rollouts", type=int, default=1920)
    ap.add_argument("--pred-rollouts", type=int, default=None,
                    help="asymmetric tube: rollout count for the "
                         "predicted-state controller (default: same as "
                         "--rollouts; see AsyncTubeController)")
    ap.add_argument("--timesteps", type=int, default=100)
    ap.add_argument("--desired-speed", type=float, default=6.0)
    ap.add_argument("--seed", type=int, default=0,
                    help="episode PRNG seed pair = (2*seed, 2*seed+1); a "
                         "traced argument, so re-seeding reuses the "
                         "compiled episode")
    ap.add_argument("--ess-target", type=float, default=None,
                    metavar="FRAC",
                    help="on-device adaptive softmax temperature holding "
                         "ESS at FRAC*K inside the episode scan "
                         "(EssTuner law; beyond-reference)")
    ap.add_argument("--feedback", action="store_true",
                    help="apply DDP feedback gains K(x - x_des) through the "
                         "interpolated publication pipeline "
                         "(autorally_plant.cpp:215-250)")
    ap.add_argument("--pose-substeps", type=int, default=1,
                    help="plant integration substeps per control tick "
                         "(pose rate / control rate)")
    ap.add_argument("--mismatch", type=float, default=0.0,
                    help="scale the true-plant model weights by (1+x) to "
                         "study tube feedback under model error")
    ap.add_argument("--bf", action="store_true",
                    help="basis-function dynamics (path_integral_bf role; "
                         "reference default K=2560)")
    ap.add_argument("--noise", choices=("gaussian", "colored", "ou"),
                    default="gaussian",
                    help="exploration-noise sampler (ops/sampling.py): "
                         "the reference protocol is white gaussian; "
                         "colored (1/f^beta) and OU explore smoother "
                         "perturbations (BASELINE config #4)")
    ap.add_argument("--noise-param", type=float, default=1.0,
                    help="beta for colored noise / theta for OU")
    ap.add_argument("--track",
                    choices=("oval", "winding", "ccrf", "marietta"),
                    default="oval",
                    help="'winding' = synthetic spline circuit; 'ccrf' / "
                         "'marietta' = the REAL circuit geometries "
                         "reconstructed from the reference's Gazebo "
                         "worlds (blended ground textures + barrier "
                         "mesh) — the path_integral_nn.launch and "
                         "path_integral_bf.launch operating points")
    ap.add_argument("--plot", default=None,
                    help="save a costmap + colored-by-speed trajectory "
                         "PNG here")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    from autorally_tpu.config import CostParams, MPPIConfig
    from autorally_tpu.costs import MPPICost
    from autorally_tpu.io.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from autorally_tpu.models import NeuralNetDynamics
    from autorally_tpu.runtime.episode import EpisodeRunner
    from autorally_tpu.runtime.telemetry import LapStats
    from autorally_tpu.solver.mppi import MPPISolver
    from autorally_tpu.tools.lap_eval import load_track

    cfg = MPPIConfig(num_rollouts=args.rollouts,
                     num_timesteps=args.timesteps,
                     noise_sampler=args.noise,
                     noise_param=args.noise_param)
    # shared track setup (tools/lap_eval.py) — the same geometry and lap
    # segmentation the LAPS_r*.json artifact suite uses
    cm, start_pose, lap_line, crossings_per_lap = load_track(args.track)
    if args.bf:
        from autorally_tpu.models import BasisFunctionDynamics
        model = BasisFunctionDynamics(cfg.dt,
                                      control_ranges=cfg.control_ranges)
        params = model.load_params(BF_NPZ)
        true_model = BasisFunctionDynamics(
            cfg.dt / args.pose_substeps, control_ranges=cfg.control_ranges)
    else:
        model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
        params = model.load_params(MODEL_NPZ)
        true_model = NeuralNetDynamics(cfg.dt / args.pose_substeps,
                                       control_ranges=cfg.control_ranges)
    solver = MPPISolver(model, MPPICost(), cfg)
    solver_pred = (solver.with_rollouts(args.pred_rollouts)
                   if args.pred_rollouts is not None else None)
    runner = EpisodeRunner(solver, true_model=true_model,
                           n_ticks=args.ticks,
                           use_feedback_gains=args.feedback,
                           pose_substeps=args.pose_substeps,
                           ess_target_frac=args.ess_target,
                           solver_predicted=solver_pred)
    params_true = params
    if args.mismatch:
        if args.bf:
            params_true = {**params,
                           "theta": params["theta"] * (1 + args.mismatch)}
        else:
            params_true = {**params,
                           "weights": [W * (1 + args.mismatch)
                                       for W in params["weights"]]}
    print(f"feedback_gains={args.feedback} pose_substeps="
          f"{args.pose_substeps} mismatch={args.mismatch} "
          f"noise={args.noise}"
          + (f"({args.noise_param})" if args.noise != "gaussian" else ""))

    start = np.array([start_pose[0], start_pose[1], start_pose[2],
                      0, 0, 0, 0], dtype=np.float32)
    cost_params = CostParams(desired_speed=args.desired_speed)

    t0 = time.time()
    res = runner.run(params, cost_params, cm, start, params_true=params_true,
                     seed_a=2 * args.seed, seed_p=2 * args.seed + 1)
    jax.block_until_ready(res)
    wall = time.time() - t0
    sim_s = args.ticks * cfg.dt
    print(f"{args.ticks} control ticks ({sim_s:.0f} sim-seconds) in "
          f"{wall:.1f}s wall — {args.ticks/wall:.0f} closed-loop ticks/s "
          f"({sim_s/wall:.1f}x realtime)")

    states = np.asarray(res.states)
    laps = LapStats(line=lap_line)
    for i, s in enumerate(states):
        rec = laps.process_pose(i * cfg.dt, s[0], s[1], s[4], s[5])
        if rec:
            print(f"  crossing {rec.lap_number}: segment {rec.lap_time:.2f}s "
                  f"max_speed={rec.max_speed:.2f} m/s "
                  f"max_slip={rec.max_slip:.3f} rad")
    # oval/winding: the line is crossed twice per circuit (out and back);
    # ccrf: the perpendicular start line is crossed once per circuit
    segs = [r.lap_time for r in laps.laps]
    if crossings_per_lap == 1:
        full_laps = segs
    else:
        full_laps = [segs[i] + segs[i + 1]
                     for i in range(0, len(segs) - 1, 2)]
    if full_laps:
        print(f"LAPS: {len(full_laps)}  times: "
              f"{['%.2fs' % t for t in full_laps]}")
    settle = min(200, len(states) // 2)       # skip the standing start
    print(f"speed: mean {states[settle:, 4].mean():.2f} "
          f"max {states[:, 4].max():.2f} m/s (desired {args.desired_speed})")
    print(f"controller usage: actual {int(np.asarray(res.used_actual).sum())}"
          f" / predicted {args.ticks - int(np.asarray(res.used_actual).sum())}")
    print(f"mean ESS {float(np.asarray(res.ess).mean()):.0f}  "
          f"mean crash% {100*float(np.asarray(res.crash_frac).mean()):.1f}")
    if args.ess_target is not None:
        g = np.asarray(res.gamma)
        print(f"adaptive gamma: {g[0]:.3f} -> {g[-1]:.3f} "
              f"(range {g.min():.3f}-{g.max():.3f}, "
              f"target ESS {args.ess_target * cfg.num_rollouts:.0f})")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        xb, yb = cm.bounds
        fig, ax = plt.subplots(figsize=(8, 7))
        ax.imshow(np.asarray(cm.data[..., 0]), origin="lower",
                  extent=[xb[0], xb[1], yb[0], yb[1]], cmap="Greys",
                  vmin=0.0, vmax=2.0, interpolation="nearest")
        pts = ax.scatter(states[:, 0], states[:, 1], c=states[:, 4], s=2.5,
                         cmap="viridis")
        fig.colorbar(pts, ax=ax, label="speed (m/s)")
        ax.plot(states[0, 0], states[0, 1], "r^", markersize=9,
                label="start")
        ax.set_xlabel("x (m)")
        ax.set_ylabel("y (m)")
        ax.set_title(f"{args.track} track, {args.ticks} ticks, "
                     f"mean {states[settle:, 4].mean():.1f} m/s")
        ax.legend(loc="upper right")
        fig.tight_layout()
        fig.savefig(args.plot, dpi=130)
        print(f"trajectory plot: {args.plot}")


if __name__ == "__main__":
    main()
