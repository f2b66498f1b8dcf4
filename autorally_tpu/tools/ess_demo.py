"""ESS-tuner measurement harness (the EVAL.md "ESS-targeted live
temperature" numbers come from this tool).

Two modes, both on the reconstructed CCRF circuit at the reference
operating point (K=1920, T=100) unless overridden:

- ``--mode host``: the deployed shape — a host loop calling the jitted
  solve, reading ``SolveStats.ess`` back each tick and feeding
  :class:`~autorally_tpu.runtime.ess_tuner.EssTuner` through the traced
  ``CostParams.gamma``.  Reports band occupancy, gamma path, solve wall
  time, and the jit trace count (must be 1 — the tuner is seeded).
- ``--mode episode``: the same law carried ON-DEVICE inside the fused
  episode scan (``EpisodeRunner(ess_target_frac=...)``) — adaptation
  with zero host involvement, at device speed.

Each mode also runs the fixed-gamma control case and prints one JSON
line with both.

Usage::

    python -m autorally_tpu.tools.ess_demo --mode host [--cpu]
    python -m autorally_tpu.tools.ess_demo --mode episode
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _build(args):
    import jax.numpy as jnp  # noqa: F401  (backend touch after config)

    from autorally_tpu.config import MPPIConfig
    from autorally_tpu.costs import MPPICost
    from autorally_tpu.costs.costmap import make_costmap
    from autorally_tpu.models import NeuralNetDynamics
    from autorally_tpu.solver.mppi import MPPISolver
    from autorally_tpu.tools.track_generator import CCRF_START, ccrf_track

    cfg = MPPIConfig(num_rollouts=args.rollouts,
                     num_timesteps=args.timesteps)
    data, xb, yb = ccrf_track()
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(args.model)
    solver = MPPISolver(model, MPPICost(), cfg)
    sx, sy, heading = CCRF_START
    start = np.array([sx, sy, heading, 0.0, 2.0, 0.0, 0.0],
                     dtype=np.float32)
    return cfg, cm, model, params, solver, start


def run_host(args):
    import jax.numpy as jnp

    from autorally_tpu.config import CostParams
    from autorally_tpu.runtime.ess_tuner import EssTuner
    from autorally_tpu.runtime.plant import SyntheticPlant
    from autorally_tpu.runtime.profiling import count_solve_traces

    cfg, cm, model, params, solver, start = _build(args)
    traces = count_solve_traces(solver)

    def loop(tuner):
        plant = SyntheticPlant(model, params, start, cfg.dt,
                               cfg.num_timesteps, use_feedback_gains=False)
        plant.receive_state_vector(0.0, start)
        cp = CostParams(desired_speed=args.desired_speed)
        if tuner is not None:
            cp = tuner.seed(cp)
        cs = solver.init_state()
        state = start
        ess_h, gamma_h, dt_h = [], [], []
        for _ in range(args.ticks):
            t0 = time.perf_counter()
            cs, stats = solver.solve(params, cp, cm, jnp.asarray(state), cs)
            ess = float(stats.ess)
            dt_h.append(time.perf_counter() - t0)
            ess_h.append(ess)
            if tuner is not None:
                cp = cp.replace(gamma=jnp.float32(tuner.update(ess)))
                gamma_h.append(tuner.gamma)
            plant.set_solution(np.asarray(cs.state_solution),
                               np.asarray(cs.control_solution), None,
                               plant.get_last_pose_time(), "actual")
            plant.step_sim(1)
            state = plant.get_state().to_vector()
            cs = solver.slide(cs, 1)
        return ess_h, gamma_h, dt_h

    warm = max(args.ticks // 8, 1)
    tuner = EssTuner(cfg, target_frac=args.target_frac)
    target = tuner.target

    def summary(ess_h, dt_h):
        e = np.asarray(ess_h[warm:])
        return {"ess_p50": float(np.median(e)),
                "ess_min": float(e.min()), "ess_max": float(e.max()),
                "band_frac": float(np.mean((e >= target / 2)
                                           & (e <= target * 2))),
                "solve_ms_p50": float(np.median(dt_h[warm:]) * 1e3)}

    ess_t, gam_t, dt_t = loop(tuner)
    traces_tuned = traces["n"]          # must be 1: seeded, no retrace
    ess_f, _, dt_f = loop(None)
    res = {"mode": "host", "K": cfg.num_rollouts, "T": cfg.num_timesteps,
           "ticks": args.ticks, "target_ess": target,
           "tuned": {**summary(ess_t, dt_t),
                     "gamma_final": gam_t[-1],
                     "gamma_range": [float(np.min(gam_t)),
                                     float(np.max(gam_t))]},
           "fixed": summary(ess_f, dt_f),
           "traces_tuned": traces_tuned,
           "traces_total": traces["n"]}
    print(json.dumps(res))


def run_episode(args):
    import jax

    from autorally_tpu.config import CostParams
    from autorally_tpu.runtime.episode import EpisodeRunner

    cfg, cm, model, params, solver, start = _build(args)
    cp = CostParams(desired_speed=args.desired_speed)
    warm = max(args.ticks // 8, 1)
    target = args.target_frac * cfg.num_rollouts
    out = {"mode": "episode", "K": cfg.num_rollouts,
           "T": cfg.num_timesteps, "ticks": args.ticks,
           "target_ess": target}
    for name, kw in (("tuned", dict(ess_target_frac=args.target_frac)),
                     ("fixed", {})):
        runner = EpisodeRunner(solver, n_ticks=args.ticks, **kw)
        res = runner.run(params, cp, cm, start)       # compile + run
        jax.block_until_ready(res.states)
        t0 = time.perf_counter()
        res = runner.run(params, cp, cm, start)
        jax.block_until_ready(res.states)
        dt = time.perf_counter() - t0
        ess = np.asarray(res.ess)[warm:]
        out[name] = {
            "ticks_per_sec": round(args.ticks / dt, 1),
            "ess_p50": float(np.median(ess)),
            "ess_band_frac": float(np.mean((ess >= target / 2)
                                           & (ess <= target * 2))),
            "gamma_final": float(np.asarray(res.gamma)[-1]),
            "speed_p50": float(np.median(np.asarray(res.states)[warm:, 4])),
        }
    print(json.dumps(out))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--mode", choices=("host", "episode"), default="host")
    ap.add_argument("--ticks", type=int, default=150)
    ap.add_argument("--rollouts", type=int, default=1920)
    ap.add_argument("--timesteps", type=int, default=100)
    ap.add_argument("--target-frac", type=float, default=0.25)
    ap.add_argument("--desired-speed", type=float, default=8.0)
    from autorally_tpu.config import REFERENCE_NN_NPZ

    ap.add_argument("--model", default=REFERENCE_NN_NPZ)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from autorally_tpu.io.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    (run_host if args.mode == "host" else run_episode)(args)


if __name__ == "__main__":
    main()
