"""Multi-device scaling benchmark: weak/strong rollout-sharding efficiency.

BASELINE.md's north star is K=100K+ rollouts at 50 Hz with >=85 %
multi-host scaling efficiency.  This harness measures that efficiency
curve for the sharded solver (``parallel/sharded.py``) over any device
set:

- **weak scaling**: K_local rollouts *per device* (the fleet solves an
  n x larger sampling problem in the same wall time; ideal efficiency =
  flat solves/s as devices grow)
- **strong scaling**: K_total rollouts *split across* devices (the fleet
  solves the same problem faster; ideal = solves/s growing linearly)

On a real TPU slice the numbers are the product metric.  Without one,
``--virtual N`` forces N XLA host-platform devices so the *shape* of the
sharded program is validated — the collectives, per-shard RNG, and the
absence of hidden serialization (a shard_map body that secretly
serializes shows up immediately as collapsing virtual-mesh efficiency).
Virtual-device timings oversubscribe host cores, so they are a floor,
not a forecast; the JSON labels which kind of run produced them.

The 1-device row uses the solver's inline fast path (no shard_map), so
efficiency is measured against the best single-chip implementation —
the honest denominator for "what does adding chips buy" — rather than
against a 1-device shard_map program nobody would deploy.

Prints one JSON line; ``--out`` also writes it to a file.

Usage::

    python -m autorally_tpu.tools.scaling_bench --virtual 4 --mode weak
    python -m autorally_tpu.tools.scaling_bench --devices 1,2,4 --mode both
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _timed_solves(solver, params, cost_params, costmap, state, n=8,
                  batches=4):
    """Best-of-batches seconds per chained dependent replan."""
    import jax

    cs = solver.init_state()
    solve = jax.jit(lambda s, c: solver._solve(params, cost_params,
                                               costmap, s, c)[0])
    cur = solve(state, cs)
    jax.block_until_ready(cur)
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(n):
            cur = solve(state, cur)
        jax.block_until_ready(cur)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def run_scaling(device_counts, mode: str = "weak", k_local: int = 1920,
                k_total: int = 15360, num_timesteps: int = 100,
                n: int = 8, batches: int = 4,
                one_dev: str = "inline") -> dict:
    """Measure solves/s across mesh sizes.  Returns the result dict."""
    import jax

    from __graft_entry__ import _build
    from autorally_tpu.config import MPPIConfig
    from autorally_tpu.parallel.mesh import rollout_mesh

    devices = jax.devices()
    counts = [c for c in device_counts if c <= len(devices)]
    if not counts:
        raise ValueError(f"no usable device counts from {device_counts}; "
                         f"{len(devices)} devices present")

    modes = ("weak", "strong") if mode == "both" else (mode,)
    out = {
        "platform": devices[0].platform,
        "devices_present": len(devices),
        "num_timesteps": num_timesteps,
        "virtual": devices[0].platform == "cpu",
        "one_dev": one_dev,
    }
    for m in modes:
        rows = []
        for c in counts:
            K = k_local * c if m == "weak" else k_total
            if K % c:
                continue
            cfg = MPPIConfig(num_rollouts=K, num_timesteps=num_timesteps)
            mesh = rollout_mesh(devices[:c])
            # one_dev picks the efficiency denominator: "inline" (default)
            # grades against the best single-chip implementation — the
            # product question; "shard_map" keeps the wrapper at c=1 too —
            # the structural does-shard_map-parallelize diagnostic
            # (tests/test_scaling_bench.py)
            solver, params, cp, cm, state = _build(
                cfg, sharded=True, mesh=mesh,
                force_shard_map=(one_dev == "shard_map"))
            sec = _timed_solves(solver, params, cp, cm, state, n=n,
                                batches=batches)
            rows.append({"devices": c, "K": K,
                         "solves_per_sec": round(1.0 / sec, 2),
                         "rollouts_per_sec": round(K / sec)})
        base = rows[0]
        for r in rows:
            if m == "weak":
                # ideal: flat solves/s while K grows with the mesh
                r["efficiency"] = round(
                    r["solves_per_sec"] / base["solves_per_sec"], 3)
            else:
                # ideal: solves/s grows linearly with the mesh
                r["efficiency"] = round(
                    r["solves_per_sec"]
                    / (base["solves_per_sec"] * r["devices"]
                       / base["devices"]), 3)
        out[m] = rows
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", default="1,2,4,8",
                    help="comma-separated mesh sizes to measure")
    ap.add_argument("--mode", choices=("weak", "strong", "both"),
                    default="weak")
    ap.add_argument("--k-local", type=int, default=1920,
                    help="rollouts per device (weak scaling)")
    ap.add_argument("--k-total", type=int, default=15360,
                    help="total rollouts (strong scaling)")
    ap.add_argument("--timesteps", type=int, default=100)
    ap.add_argument("--n", type=int, default=8, help="solves per batch")
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (shape validation "
                         "without a slice)")
    ap.add_argument("--one-dev", choices=("inline", "shard_map"),
                    default="inline",
                    help="1-device row implementation: 'inline' = best "
                         "single-chip path (product efficiency), "
                         "'shard_map' = keep the wrapper (structural "
                         "parallelization diagnostic)")
    ap.add_argument("--out", default=None, help="also write JSON here")
    args = ap.parse_args(argv)

    if args.virtual:
        # must run before the first backend touch; jax may already be
        # *imported* (sitecustomize) but the backend initializes lazily
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{args.virtual}").strip()
        import jax

        jax.config.update("jax_platforms", "cpu")

    from autorally_tpu.io.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    counts = sorted({int(c) for c in args.devices.split(",")})
    res = run_scaling(counts, mode=args.mode, k_local=args.k_local,
                      k_total=args.k_total, num_timesteps=args.timesteps,
                      n=args.n, batches=args.batches, one_dev=args.one_dev)
    line = json.dumps(res)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
