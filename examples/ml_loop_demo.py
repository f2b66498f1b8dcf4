"""The closed ML loop: drive -> log -> train -> hot-swap -> drive better.

The reference's workflow splits this across rosbag record, the ml_pipeline
scripts, and a controller restart with the new ``.npz``.  Here the whole
cycle runs in one process against the *independent* four-wheel physics
simulator (``autorally_tpu.sim``), so the data is honest — the dynamics
model never sees its own rollouts as ground truth:

1. **Drive** the oval with the stock reference NN (trained on Gazebo —
   genuinely mismatched against this plant), writing the sim-node-format
   multi-topic JSONL log (ground truth pose/velocities with quaternion
   orientation, chassis commands at half rate, wheel speeds at a fifth).
2. **Ingest + train**: the multi-topic pipeline (``ml/ingest.py``) merges
   the log; the dynamics MLP is fine-tuned on it (``ml/train.py``)
   starting from the stock weights.
3. **Hot-swap** the trained parameters into the *running* control loop
   through the plant's update queue (zero recompiles — the params are a
   traced pytree), and keep driving.
4. **Compare**: speed-tracking error and one-step prediction RMSE,
   before vs after.

Run (CPU, ~2 min)::

    python examples/ml_loop_demo.py --cpu --ticks 1500 --epochs 60
"""

import os
import sys

# Runnable as a plain script: put the repo root on sys.path (Python 3.11+
# adds only the script's own directory, not the cwd).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import math
import time

import numpy as np

from autorally_tpu.config import REFERENCE_NN_NPZ as MODEL_NPZ


def write_log_record(f, t, s7, u, wheels, i):
    """One sim-node-format multi-topic tick (tools/sim_node.py --log)."""
    secs = int(t)
    nsecs = int(round((t - secs) * 1e9))
    hy, hr = 0.5 * float(s7[2]), 0.5 * float(s7[3])
    cy, sy, cr, sr = math.cos(hy), math.sin(hy), math.cos(hr), math.sin(hr)
    f.write(json.dumps({
        "topic": "ground_truth/state", "secs": secs, "nsecs": nsecs,
        "x": float(s7[0]), "y": float(s7[1]), "z": 0.0,
        "qx": cy * sr, "qy": sy * sr, "qz": sy * cr, "qw": cy * cr,
        "u_x": float(s7[4]), "u_y": float(s7[5]),
        "yaw_mder": float(s7[6])}) + "\n")
    if i % 2 == 0:
        f.write(json.dumps({
            "topic": "chassisState", "secs": secs, "nsecs": nsecs,
            "steering": float(u[0]), "throttle": float(u[1]),
            "frontBrake": 0.0}) + "\n")
    if i % 5 == 0:
        f.write(json.dumps({
            "topic": "wheelSpeeds", "secs": secs, "nsecs": nsecs,
            "lfSpeed": float(wheels[0]), "rfSpeed": float(wheels[1]),
            "lbSpeed": float(wheels[2]), "rbSpeed": float(wheels[3])})
            + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ticks", type=int, default=1500,
                    help="control ticks per driving phase")
    ap.add_argument("--rollouts", type=int, default=768)
    ap.add_argument("--timesteps", type=int, default=60)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--desired-speed", type=float, default=6.0)
    ap.add_argument("--log", default="/tmp/ml_loop_drive.jsonl")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from autorally_tpu.config import CostParams, MPPIConfig
    from autorally_tpu.costs import MPPICost
    from autorally_tpu.costs.costmap import make_costmap
    from autorally_tpu.ml import (DynamicsDataset, TrainConfig, ingest_log,
                                  instantaneous_errors, train_dynamics)
    from autorally_tpu.models import NeuralNetDynamics
    from autorally_tpu.runtime import (ControlLoopConfig, Controller,
                                       run_control_loop)
    from autorally_tpu.sim import SimVehiclePlant
    from autorally_tpu.solver.mppi import MPPISolver
    from autorally_tpu.tools.track_generator import oval_track

    cfg = MPPIConfig(num_rollouts=args.rollouts,
                     num_timesteps=args.timesteps)
    data, xb, yb = oval_track(half_length=30.0, half_width=18.0,
                              track_width=6.0, ppm=10.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params0 = model.load_params(MODEL_NPZ)

    solver = MPPISolver(model, MPPICost(cfg.l1_cost), cfg)
    cost_params = CostParams(desired_speed=args.desired_speed)
    actual = Controller(solver, params0, cost_params, cm)
    predicted = Controller(solver, params0, cost_params, cm, seed=7)

    start = np.array([30.0, 0.0, math.pi / 2, 0, 0, 0, 0],
                     dtype=np.float32)
    plant = SimVehiclePlant(start, cfg.dt, cfg.num_timesteps,
                            use_feedback_gains=False,
                            throttle_max=cfg.max_throttle)
    plant.receive_state_vector(0.0, start)

    metrics = {}

    def drive(name, ticks, logf=None):
        speeds, errs = [], []
        t0 = time.time()

        def on_tick(i, chosen, used, state):
            speeds.append(float(state[4]))
            errs.append(abs(float(state[4]) - args.desired_speed))
            if logf is not None and plant.published:
                u = plant.published[-1][1:3]
                write_log_record(logf, plant.sim_time, plant.true_state,
                                 u, plant.wheel_speeds(), i)

        lcfg = ControlLoopConfig(hz=cfg.hz,
                                 num_timesteps=cfg.num_timesteps,
                                 use_feedback_gains=False, max_iter=ticks)
        run_control_loop(predicted, actual, plant, lcfg, on_tick=on_tick)
        warm = len(speeds) // 5          # skip the launch transient
        m = {"mean_speed": float(np.mean(speeds[warm:])),
             "mean_speed_err": float(np.mean(errs[warm:])),
             "wall_s": round(time.time() - t0, 1)}
        metrics[name] = m
        print(f"{name}: mean speed {m['mean_speed']:.2f} m/s  "
              f"|err| {m['mean_speed_err']:.3f}  ({m['wall_s']}s wall)")
        return m

    # -- phase 1: drive the mismatched stock model, recording the log ------
    with open(args.log, "w") as f:
        drive("before", args.ticks, logf=f)

    # -- phase 2: ingest + fine-tune -----------------------------------------
    df = ingest_log(args.log)
    print(f"ingested {len(df)} merged rows from {args.log}")
    feats = df[["roll", "u_x", "u_y", "yaw_mder", "steering",
                "throttle"]].to_numpy(np.float32)
    labels = df[["roll_der", "u_x_der", "u_y_der",
                 "yaw_mder_der"]].to_numpy(np.float32)
    train, val = DynamicsDataset(feats, labels).split(0.2, 0)

    rmse0 = instantaneous_errors(model, params0, feats, labels)["rmse"]
    tcfg = TrainConfig(epochs=args.epochs, batch_size=128, lr=1e-3)
    params1, history = train_dynamics(model, params0, train, val, tcfg,
                                      verbose=False)
    rmse1 = instantaneous_errors(model, params1, feats, labels)["rmse"]
    metrics["model_rmse_before"] = rmse0.tolist()
    metrics["model_rmse_after"] = rmse1.tolist()
    print(f"one-step RMSE  stock: {rmse0.mean():.4f}  "
          f"fine-tuned: {rmse1.mean():.4f}")

    # -- phase 3: hot-swap into the RUNNING loop and keep driving ------------
    plant.push_model_params(params1)
    drive("after", args.ticks)

    better_fit = float(rmse1.mean()) < float(rmse0.mean())
    better_track = (metrics["after"]["mean_speed_err"]
                    < metrics["before"]["mean_speed_err"])
    metrics["model_fit_improved"] = better_fit
    metrics["speed_tracking_improved"] = better_track
    print(json.dumps({k: v for k, v in metrics.items()
                      if not k.startswith("model_rmse")}, indent=2))
    return 0 if better_fit else 1


if __name__ == "__main__":
    raise SystemExit(main())
