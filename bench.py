"""Benchmark: MPPI replans per second at the reference operating point.

Reference baseline: the CUDA controller replans at 50 Hz (20 ms budget) with
K=1920 rollouts, T=100 steps, the 6-32-32-4 NN dynamics model on a single
GPU (BASELINE.md).  This measures the same solve — slide + full replan
(noise, rollouts, weighting, smoothing, nominal trajectory) — as one jitted
program on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = solves_per_sec / 50 (the reference's replan rate).
"""

import json
import sys
import time

import numpy as np

BASELINE_HZ = 50.0


def main():
    import jax
    import jax.numpy as jnp

    from autorally_tpu.config import CostParams, MPPIConfig
    from __graft_entry__ import _build

    cfg = MPPIConfig(num_rollouts=1920, num_timesteps=100)
    solver, params, cost_params, costmap, state = _build(cfg)
    cs = solver.init_state()

    @jax.jit
    def control_step(params, cost_params, costmap, state, cs):
        cs = solver._slide(cs, jnp.int32(cfg.optimization_stride))
        return solver._solve(params, cost_params, costmap, state, cs)

    # Warm up / compile.
    cs_out, stats = control_step(params, cost_params, costmap, state, cs)
    jax.block_until_ready(cs_out)

    # Timed: sequential dependent replans (each consumes the previous
    # ControllerState), matching the real-time loop's data flow.  Best of
    # several batches — the hardware tunnel adds multi-ms jitter spikes.
    n, batches = 25, 6
    best = float("inf")
    cur = cs_out
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(n):
            cur, stats = control_step(params, cost_params, costmap, state,
                                      cur)
        jax.block_until_ready(cur)
        best = min(best, (time.perf_counter() - t0) / n)

    solves_per_sec = 1.0 / best
    print(json.dumps({
        "metric": "mppi_solves_per_sec_K1920_T100",
        "value": round(solves_per_sec, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_sec / BASELINE_HZ, 3),
    }))


if __name__ == "__main__":
    main()
