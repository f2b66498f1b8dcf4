"""Closed-loop MPPI demo: drive the car around a synthetic oval track.

The minimum end-to-end slice (SURVEY.md §7 step 2): a standalone
``path_integral_nn``-equivalent loop — MPPI replanning at 50 Hz against the
trained reference neural-net dynamics, executing the first control of each
plan on a synthetic plant integrated with the same model (the reference's
``debug_mode`` self-propagation, ``run_control_loop.cuh:296-302``).

Usage::

    python examples/drive_oval.py [--steps 300] [--cpu] [--model PATH]
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

from autorally_tpu.config import REFERENCE_NN_NPZ as MODEL_NPZ


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--model", default=MODEL_NPZ)
    ap.add_argument("--rollouts", type=int, default=1920)
    ap.add_argument("--desired-speed", type=float, default=6.0)
    ap.add_argument("--neural-costmap", action="store_true",
                    help="distill the track into a neural field and use "
                         "the fully-fused rollout+cost kernel")
    ap.add_argument("--bf", action="store_true",
                    help="use the 25-basis-function dynamics model "
                         "(path_integral_bf equivalent)")
    ap.add_argument("--obstacles", default=None,
                    help="semicolon-separated circles 'x,y,r;x,y,r' — "
                         "dynamic obstacle avoidance (fused in-kernel)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from autorally_tpu.config import CostParams, MPPIConfig
    from autorally_tpu.costs import MPPICost
    from autorally_tpu.costs.costmap import make_costmap
    from autorally_tpu.models import NeuralNetDynamics
    from autorally_tpu.solver.mppi import MPPISolver
    from autorally_tpu.tools.track_generator import oval_track

    cfg = MPPIConfig(num_rollouts=args.rollouts, num_timesteps=100, hz=50)
    cost_params = CostParams(desired_speed=args.desired_speed)

    data, xb, yb = oval_track(half_length=30.0, half_width=18.0,
                              track_width=6.0, ppm=10.0)
    costmap = make_costmap(data, xb, yb)
    if args.neural_costmap:
        from autorally_tpu.costs.neural_costmap import fit_neural_costmap

        costmap, metrics = fit_neural_costmap(costmap)
        print(f"neural costmap fit: mae={metrics['mae']:.3f} "
              f"boundary_flip_rate={metrics['boundary_flip_rate']:.3%}")

    if args.bf:
        from autorally_tpu.models import BasisFunctionDynamics

        model = BasisFunctionDynamics(cfg.dt,
                                      control_ranges=cfg.control_ranges)
        params = model.load_params(
            args.model.replace("autorally_nnet_09_12_2018",
                               "basis_function_09_12_2018"))
    else:
        model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
        params = model.load_params(args.model)

    if args.obstacles:
        from autorally_tpu.costs.obstacles import ObstacleCost, make_obstacles

        try:
            circles = [[float(v) for v in c.split(",")]
                       for c in args.obstacles.split(";") if c.strip()]
            if not circles or any(len(c) != 3 for c in circles):
                raise ValueError("each circle needs exactly x,y,r")
        except ValueError as e:
            ap.error(f"--obstacles expects 'x,y,r;x,y,r': {e}")
        # band tuned for the 6 m demo lane: hard wall at the circle, but
        # the ramp stays narrow enough that passing beats stopping
        cost = ObstacleCost(make_obstacles(circles), obstacle_coeff=150.0,
                            inflation=0.75, l1_cost=cfg.l1_cost)
        print(f"obstacles: {circles}")
    else:
        cost = MPPICost(cfg.l1_cost)
    solver = MPPISolver(model, cost, cfg)
    cs = solver.init_state()

    # Start on the right side of the oval, pointing up (+y), at rest.
    state = np.array([30.0, 0.0, math.pi / 2, 0.0, 0.0, 0.0, 0.0],
                     dtype=np.float32)

    t_compile = time.time()
    cs, _ = solver.solve(params, cost_params, costmap, state, cs)
    print(f"first solve (compile): {time.time() - t_compile:.1f}s")

    laps = 0
    prev_angle = math.atan2(state[1], state[0])
    total_angle = 0.0
    solve_times = []
    for step in range(args.steps):
        t0 = time.time()
        cs = solver.slide(cs, cfg.optimization_stride)
        cs, stats = solver.solve(params, cost_params, costmap, state, cs)
        u = np.asarray(cs.control_solution[0])
        solve_times.append(time.time() - t0)

        # Synthetic plant: integrate the model (debug-mode self-propagation).
        s_jnp, _ = model.update_state(params, jnp.asarray(state),
                                      jnp.asarray(u))
        state = np.asarray(s_jnp)

        angle = math.atan2(state[1], state[0])
        d = angle - prev_angle
        if d > math.pi:
            d -= 2 * math.pi
        elif d < -math.pi:
            d += 2 * math.pi
        total_angle += d
        prev_angle = angle
        laps = abs(total_angle) / (2 * math.pi)

        if step % 50 == 0 or step == args.steps - 1:
            print(f"step {step:4d}  pos=({state[0]:+7.2f},{state[1]:+7.2f}) "
                  f"speed={state[4]:5.2f} m/s  steer={u[0]:+.3f} "
                  f"throttle={u[1]:+.3f}  traj_cost={float(stats.trajectory_cost):9.1f} "
                  f"ess={float(stats.ess):7.1f} crash%={float(stats.crash_frac)*100:4.1f}")

    st = np.array(solve_times[1:]) * 1000
    print(f"\nlaps completed: {laps:.2f}")
    print(f"solve latency: mean {st.mean():.2f} ms  p50 {np.percentile(st, 50):.2f} "
          f"p99 {np.percentile(st, 99):.2f} ms  ({1000.0/st.mean():.0f} solves/s; "
          f"20 ms budget @ 50 Hz)")
    print(f"final speed: {state[4]:.2f} m/s (desired {args.desired_speed})")


if __name__ == "__main__":
    main()
