"""Vectorized cost-parameter sweep: N closed-loop episodes, ONE program.

The reference tunes cost parameters one dynamic_reconfigure slider at a
time (``costs.cu:75-87``), re-driving the car (or Gazebo) per setting.
Here the sweep is a functional transform: ``CostParams`` is a traced
pytree (``config.py``) and the whole tube-MPPI episode is one jitted
``lax.scan`` (``runtime/episode.py``), so ``jax.vmap`` over the
parameter axis evaluates EVERY setting's full closed-loop episode in
parallel on one chip — the grid rides the same batched MXU matmuls the
rollouts do.  A 12-point grid costs roughly one episode's wall time,
not twelve.

Usage::

    python -m autorally_tpu.tools.param_sweep \
        --sweep desired_speed=5,6,7 --sweep speed_coeff=2.5,4.25 \
        --ticks 800 --rollouts 512 [--track winding] [--cpu]

Each ``--sweep field=v1,v2,...`` names a :class:`CostParams` field; the
grid is the cartesian product.  Because the softmax temperature rides
the traced ``CostParams.gamma``, ``--sweep gamma=0.05,0.15,0.6`` tunes
the temperature itself across lanes — a knob the reference fixes at
compile/launch time.  Prints one JSON line per grid point
(mean/max speed, distance, crash %, mean ESS, score) plus a ``BEST``
line; ``--out`` also writes the full result list as JSON.

The sweep uses the XLA scan rollout path by default (vmap-safe on every
backend); pass ``--pallas`` to batch the Pallas kernels instead where
the backend supports vmapped ``pallas_call``.
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
import time


def build_grid(sweeps: dict) -> list:
    """Cartesian product of {field: [values]} as a list of dicts."""
    names = sorted(sweeps)
    return [dict(zip(names, combo))
            for combo in itertools.product(*(sweeps[n] for n in names))]


def stack_cost_params(base, grid: list):
    """Stack per-point CostParams into one pytree with a leading lane axis."""
    import jax
    import jax.numpy as jnp

    lanes = [base.replace(**pt) for pt in grid]
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x, jnp.float32) for x in xs]),
        *lanes)


def run_sweep(runner, params, stacked_cp, costmap, state0,
              params_true=None) -> "EpisodeResult":
    """vmap the episode over the CostParams lane axis; returns stacked
    per-lane :class:`EpisodeResult` telemetry."""
    import jax
    import jax.numpy as jnp

    solver = runner.solver
    cs_a = solver.init_state(0)
    cs_p = solver.init_state(1)
    s0 = jnp.asarray(state0, dtype=jnp.float32)
    cs_a = cs_a._replace(state_solution=cs_a.state_solution.at[0].set(s0))
    cs_p = cs_p._replace(state_solution=cs_p.state_solution.at[0].set(s0))

    fn = jax.jit(jax.vmap(
        runner._episode,
        in_axes=(None, None, 0, None, None, None, None, None)))
    return fn(params, params_true if params_true is not None else params,
              stacked_cp, costmap, s0, cs_a, cs_p, None)


def lane_metrics(res, grid, settle: int = 200) -> list:
    """Host-side per-lane summary of the stacked episode telemetry."""
    import numpy as np

    states = np.asarray(res.states)            # (L, n_ticks, S)
    crash = np.asarray(res.crash_frac)
    ess = np.asarray(res.ess)
    rows = []
    for i, pt in enumerate(grid):
        xy = states[i, :, :2]
        dist = float(np.linalg.norm(np.diff(xy, axis=0), axis=1).sum())
        mean_speed = float(states[i, settle:, 4].mean())
        crash_pct = float(100.0 * crash[i].mean())
        # score: progress made while staying on the track — distance
        # scaled down by the fraction of sampled rollouts crashing
        score = dist * max(0.0, 1.0 - crash_pct / 100.0)
        rows.append({
            **pt,
            "mean_speed": round(mean_speed, 3),
            "max_speed": round(float(states[i, :, 4].max()), 3),
            "distance_m": round(dist, 1),
            "crash_pct": round(crash_pct, 2),
            "mean_ess": round(float(ess[i].mean()), 1),
            "score": round(score, 1),
        })
    return rows


def _parse_sweeps(items) -> dict:
    sweeps = {}
    for it in items:
        name, _, vals = it.partition("=")
        if not vals:
            raise SystemExit(f"--sweep {it!r}: expected field=v1,v2,...")
        sweeps[name.strip()] = [float(v) for v in vals.split(",")]
    return sweeps


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--sweep", action="append", default=[],
                    metavar="FIELD=V1,V2,...", required=False,
                    help="CostParams field values (repeatable; grid = "
                         "cartesian product)")
    ap.add_argument("--ticks", type=int, default=800)
    ap.add_argument("--rollouts", type=int, default=512)
    ap.add_argument("--timesteps", type=int, default=100)
    ap.add_argument("--track", choices=("oval", "winding"), default="oval")
    ap.add_argument("--pallas", action="store_true",
                    help="keep the Pallas rollout kernels under vmap "
                         "(backend support required); default is the "
                         "XLA scan path")
    ap.add_argument("--out", default=None, help="also write JSON here")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import math

    import jax
    import numpy as np

    from autorally_tpu.config import CostParams, MPPIConfig
    from autorally_tpu.costs import MPPICost
    from autorally_tpu.costs.costmap import make_costmap
    from autorally_tpu.io.compile_cache import enable_persistent_cache
    from autorally_tpu.models import NeuralNetDynamics
    from autorally_tpu.runtime.episode import EpisodeRunner
    from autorally_tpu.solver.mppi import MPPISolver
    from autorally_tpu.tools.track_generator import oval_track

    enable_persistent_cache()

    sweeps = _parse_sweeps(args.sweep) or {"desired_speed": [5.0, 6.0, 7.0]}
    bad = [f for f in sweeps if f not in CostParams.__dataclass_fields__]
    if bad:
        raise SystemExit(f"unknown CostParams field(s): {bad}; have "
                         f"{sorted(CostParams.__dataclass_fields__)}")
    grid = build_grid(sweeps)

    cfg = MPPIConfig(num_rollouts=args.rollouts,
                     num_timesteps=args.timesteps,
                     use_pallas_rollout=True if args.pallas else False)
    if args.track == "winding":
        from autorally_tpu.tools.track_generator import spline_track

        data, xb, yb = spline_track(track_width=6.0, ppm=10.0)
        start_pose = (0.0, 0.0, math.atan2(-2.0, 12.0))
    else:
        data, xb, yb = oval_track(half_length=30.0, half_width=18.0,
                                  track_width=6.0, ppm=10.0)
        start_pose = (30.0, 0.0, math.pi / 2)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    from autorally_tpu.config import REFERENCE_NN_NPZ

    params = model.load_params(REFERENCE_NN_NPZ)
    solver = MPPISolver(model, MPPICost(), cfg)
    runner = EpisodeRunner(solver, n_ticks=args.ticks)
    start = np.array([*start_pose, 0, 0, 0, 0], dtype=np.float32)

    stacked = stack_cost_params(CostParams(), grid)
    print(f"sweep: {len(grid)} grid points x {args.ticks} ticks x "
          f"K={args.rollouts} — one compiled program", file=sys.stderr)
    t0 = time.time()
    res = run_sweep(runner, params, stacked, cm, start)
    jax.block_until_ready(res)
    wall = time.time() - t0
    print(f"{len(grid)} episodes in {wall:.1f}s wall "
          f"({len(grid) * args.ticks / wall:.0f} total ticks/s)",
          file=sys.stderr)

    rows = lane_metrics(res, grid, settle=min(200, args.ticks // 4))
    for r in sorted(rows, key=lambda r: -r["score"]):
        print(json.dumps(r))
    best = max(rows, key=lambda r: r["score"])
    print("BEST " + json.dumps(best))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"wall_s": wall, "grid": rows, "best": best}, f,
                      indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
