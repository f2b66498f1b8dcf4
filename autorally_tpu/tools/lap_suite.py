"""Lap-benchmark suite -> the versioned ``LAPS_r*.json`` artifact.

Round-4 verdict item 5: the hardware session's lap evidence lived in
EVAL prose; this tool runs a pinned matrix of closed-loop lap configs
(fully on-device episodes) and emits ONE machine-diffable JSON whose
schema is validated by ``tests/test_artifacts.py``, so round-over-round
lap regressions are a ``diff LAPS_r0{n}.json`` away.

Default matrix (each x ``--seeds`` seeds):

- CCRF  @ 8 m/s, K=1920/T=100 — the ``path_integral_nn.launch`` point —
  under gaussian / colored(beta=1) / OU(theta=0.15) exploration (the
  BASELINE config-#4 sampling A/B),
- Marietta @ 6 m/s, K=2560 basis-function — ``path_integral_bf.launch``,
- CCRF  @ 8 m/s with tube feedback gains under 10% model mismatch.

Usage: ``python -m autorally_tpu.tools.lap_suite [--out LAPS_r05.json]``
"""

from __future__ import annotations

import argparse
import json
import time


def run_config(row: dict, ticks: int, seeds: int) -> list:
    import jax
    import numpy as np

    from autorally_tpu.config import CostParams, MPPIConfig
    from autorally_tpu.costs import MPPICost
    from autorally_tpu.models import (BasisFunctionDynamics,
                                      NeuralNetDynamics)
    from autorally_tpu.runtime.episode import EpisodeRunner
    from autorally_tpu.solver.mppi import MPPISolver
    from autorally_tpu.tools.lap_eval import episode_metrics, load_track

    from autorally_tpu.config import REFERENCE_BF_NPZ as BF
    from autorally_tpu.config import REFERENCE_NN_NPZ as NN

    cfg = MPPIConfig(num_rollouts=row["K"], num_timesteps=row["T"],
                     noise_sampler=row.get("noise", "gaussian"),
                     noise_param=row.get("noise_param", 1.0))
    cm, start_pose, lap_line, xings = load_track(row["track"])
    if row.get("model", "nn") == "bf":
        model = BasisFunctionDynamics(cfg.dt,
                                      control_ranges=cfg.control_ranges)
        params = model.load_params(BF)
        true_model = BasisFunctionDynamics(
            cfg.dt, control_ranges=cfg.control_ranges)
    else:
        model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
        params = model.load_params(NN)
        true_model = NeuralNetDynamics(cfg.dt,
                                       control_ranges=cfg.control_ranges)
    params_true = params
    if row.get("mismatch"):
        key = "theta" if row.get("model") == "bf" else "weights"
        scale = 1.0 + row["mismatch"]
        params_true = {**params,
                       key: [W * scale for W in params[key]]
                       if key == "weights" else params[key] * scale}
    solver = MPPISolver(model, MPPICost(), cfg)
    solver_pred = (solver.with_rollouts(row["K_pred"])
                   if row.get("K_pred") else None)
    runner = EpisodeRunner(solver, true_model=true_model, n_ticks=ticks,
                           use_feedback_gains=bool(row.get("feedback")),
                           solver_predicted=solver_pred)
    cp = CostParams(desired_speed=row["desired_speed"])
    start = np.array([start_pose[0], start_pose[1], start_pose[2],
                      0, 0, 0, 0], dtype=np.float32)
    out = []
    for seed in range(seeds):
        t0 = time.time()
        res = runner.run(params, cp, cm, start, params_true=params_true,
                         seed_a=2 * seed, seed_p=2 * seed + 1)
        jax.block_until_ready(res)
        m = episode_metrics(res, cm, lap_line, xings, cfg.dt,
                            float(cp.boundary_threshold))
        m["seed"] = seed
        m["wall_s"] = round(time.time() - t0, 1)
        out.append(m)
    return out


DEFAULT_MATRIX = [
    {"name": "ccrf_nn_gaussian", "track": "ccrf", "K": 1920, "T": 100,
     "desired_speed": 8.0, "noise": "gaussian"},
    {"name": "ccrf_nn_colored", "track": "ccrf", "K": 1920, "T": 100,
     "desired_speed": 8.0, "noise": "colored", "noise_param": 1.0},
    {"name": "ccrf_nn_ou", "track": "ccrf", "K": 1920, "T": 100,
     "desired_speed": 8.0, "noise": "ou", "noise_param": 0.15},
    {"name": "marietta_bf_gaussian", "track": "marietta", "K": 2560,
     "T": 100, "desired_speed": 6.0, "model": "bf"},
    {"name": "ccrf_nn_tube_mismatch10", "track": "ccrf", "K": 1920,
     "T": 100, "desired_speed": 8.0, "feedback": True, "mismatch": 0.1},
    # asymmetric tube budgets (round 5): lap quality must survive the
    # predicted half running K/4 (the deployment design that holds
    # 50 Hz at K=65,536 on one chip — GATE_r05 tube_k65536_asym16384)
    {"name": "ccrf_nn_asym_kpred4x", "track": "ccrf", "K": 1920,
     "K_pred": 480, "T": 100, "desired_speed": 8.0},
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="also write the artifact here (stdout always)")
    ap.add_argument("--ticks", type=int, default=3000)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--only", default=None,
                    help="comma-separated config names to run")
    ap.add_argument("--smoke", action="store_true",
                    help="shrink K/T so the suite runs in seconds on CPU "
                         "(schema/plumbing checks, not perf evidence)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from autorally_tpu.io.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    matrix = DEFAULT_MATRIX
    if args.only:
        names = set(args.only.split(","))
        matrix = [r for r in matrix if r["name"] in names]
    if args.smoke:
        matrix = [{**r, "K": 256, "T": 32,
                   **({"K_pred": 64} if r.get("K_pred") else {})}
                  for r in matrix]

    artifact = {"artifact": "laps", "round": args.round,
                "ticks": args.ticks, "seeds": args.seeds,
                "smoke": bool(args.smoke), "rows": []}
    for row in matrix:
        runs = run_config(row, args.ticks, args.seeds)
        artifact["rows"].append({**row, "runs": runs})
    text = json.dumps(artifact)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
