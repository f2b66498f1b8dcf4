"""Ensemble-vs-single closed-loop A/B under structured model error.

BASELINE config #5 pairs the 8-model ensemble with closed-loop eval; the
robust-MPPI lineage (RSS'18, ``params/models/README.md`` in the
reference) motivates ensembles as insurance against *structured* model
error — uniform-gain error is already compensated by 50 Hz replanning
(EVAL.md round-3 negative result), so this A/B injects the structured
kind: the true plant's steering-input column (``dynamics_W1[:, 4]`` of
the reference MLP — input order [roll, u_x, u_y, yaw_der, steer,
throttle], ``neural_net_model.cu:202-230``) is scaled by an unknown
gain, i.e. the real car responds to steering differently than the
nominal model believes.

Both controllers get the SAME total rollout budget K:

- **single**: all K rollouts under the nominal model,
- **ensemble**: K split over M members whose steering-gain hypotheses
  span ``gain_lo..gain_hi`` (member 0 = nominal, per
  :class:`~autorally_tpu.solver.ensemble.EnsembleMPPISolver` block
  semantics) — the importance-weighted update then favors controls that
  are cheap under EVERY plausible steering response.

Prints ONE JSON line per arm with lap times, speed tracking, rollout
crash fraction, and off-track excursion fraction (the plant-level crash
proxy: fraction of ticks whose pose reads costmap channel0 >= the
boundary threshold).
"""

from __future__ import annotations

import argparse
import json
import time


COLUMNS = {"steer": 4, "throttle": 5}    # MLP input order, nn model


def steer_gain_params(params, gain: float, column: str = "steer"):
    """Nominal params with one first-layer INPUT row scaled — a
    structured actuation-gain error (the real car responds to that
    control channel more/less than the nominal model believes).

    The loaded weights are input-major: ``weights[0]`` is (in=6, out)
    (``NeuralNetDynamics.load_params`` transposes the reference's
    ``dynamics_W1`` (out, in)), so the steering input is ROW 4 —
    round-5 review caught the transposed first version of this."""
    W = [w for w in params["weights"]]
    W0 = W[0].at[COLUMNS[column], :].multiply(gain)
    return {**params, "weights": [W0] + W[1:]}


def run_arm(runner, params_ctrl, cost_params, cm, start, params_true,
            seed, lap_line, crossings_per_lap, dt, boundary_threshold):
    import jax

    from autorally_tpu.tools.lap_eval import episode_metrics

    t0 = time.time()
    res = runner.run(params_ctrl, cost_params, cm, start,
                     params_true=params_true,
                     seed_a=2 * seed, seed_p=2 * seed + 1)
    jax.block_until_ready(res)
    m = episode_metrics(res, cm, lap_line, crossings_per_lap, dt,
                        boundary_threshold)
    m["wall_s"] = round(time.time() - t0, 1)
    return m


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=3000)
    ap.add_argument("--rollouts", type=int, default=4096,
                    help="TOTAL rollout budget (shared by both arms)")
    ap.add_argument("--timesteps", type=int, default=100)
    ap.add_argument("--members", type=int, default=8)
    ap.add_argument("--desired-speed", type=float, default=8.0)
    ap.add_argument("--true-gain", type=float, default=0.55,
                    help="true plant's actuation gain vs the nominal model")
    ap.add_argument("--column", choices=("steer", "throttle"),
                    default="steer",
                    help="which control channel the gain error hits")
    ap.add_argument("--gain-lo", type=float, default=0.5)
    ap.add_argument("--gain-hi", type=float, default=1.2)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--track", choices=("oval", "ccrf", "marietta"),
                    default="ccrf")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from autorally_tpu.io.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import numpy as np

    from autorally_tpu.config import CostParams, MPPIConfig
    from autorally_tpu.costs import MPPICost
    from autorally_tpu.models import NeuralNetDynamics
    from autorally_tpu.models.ensemble import stack_params
    from autorally_tpu.runtime.episode import EpisodeRunner
    from autorally_tpu.solver import EnsembleMPPISolver, MPPISolver

    from autorally_tpu.config import REFERENCE_NN_NPZ as NN_NPZ

    cfg = MPPIConfig(num_rollouts=args.rollouts,
                     num_timesteps=args.timesteps)
    from autorally_tpu.tools.lap_eval import load_track

    cm, start_pose, lap_line, xings = load_track(args.track)

    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    true_model = NeuralNetDynamics(cfg.dt,
                                   control_ranges=cfg.control_ranges)
    params_true = steer_gain_params(params, args.true_gain, args.column)

    # member 0 = the canonical model; the REMAINING members span the
    # full gain_lo..gain_hi range (a review found the earlier
    # gains[0]=1.0 overwrite silently deleted the gain_lo hypothesis —
    # the one closest to the injected error in the shipped A/B)
    gains = [1.0] + list(np.linspace(args.gain_lo, args.gain_hi,
                                     args.members - 1))
    stacked = stack_params([steer_gain_params(params, g, args.column)
                            for g in gains])

    single = MPPISolver(model, MPPICost(), cfg)
    ens = EnsembleMPPISolver(model, MPPICost(), cfg,
                             num_members=args.members)
    cost_params = CostParams(desired_speed=args.desired_speed)
    start = np.array([start_pose[0], start_pose[1], start_pose[2],
                      0, 0, 0, 0], dtype=np.float32)
    bt = float(cost_params.boundary_threshold)

    out = {"config": {
        "track": args.track, "K": args.rollouts, "T": args.timesteps,
        "members": args.members, "true_gain": args.true_gain,
        "column": args.column,
        "member_gains": [round(g, 3) for g in gains],
        "desired_speed": args.desired_speed, "ticks": args.ticks,
        "seeds": args.seeds,
    }, "single": [], "ensemble": []}
    for arm, solver, p_ctrl in (("single", single, params),
                                ("ensemble", ens, stacked)):
        runner = EpisodeRunner(solver, true_model=true_model,
                               n_ticks=args.ticks)
        for seed in range(args.seeds):
            out[arm].append(run_arm(
                runner, p_ctrl, cost_params, cm, start, params_true,
                seed, lap_line, xings, cfg.dt, bt))
    for arm in ("single", "ensemble"):
        rows = out[arm]
        out[f"{arm}_summary"] = {
            "mean_offtrack_frac": round(
                float(np.mean([r["offtrack_frac"] for r in rows])), 4),
            "mean_speed": round(
                float(np.mean([r["mean_speed"] for r in rows])), 3),
            "total_laps": int(sum(r["laps"] for r in rows)),
            "best_lap_s": min([r["best_lap_s"] for r in rows
                               if r["best_lap_s"] is not None],
                              default=None),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
