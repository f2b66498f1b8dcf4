"""Per-stage device-time breakdown of one MPPI replan.

The full solve is ONE jitted program in production; this tool times each
stage as its own jitted function (so stage boundaries force device sync)
to show where the per-solve time actually goes — noise sampling, the
rollout+cost kernel, the softmax/weighted update, Savitzky-Golay, the
nominal-trajectory re-rollout, and the slide.  The stage sum exceeds the
fused full solve (XLA overlaps and fuses across stages there); the value
is the *ratio* between stages.

On a tunneled accelerator every dispatch pays a host-side enqueue floor
(~1.3 ms on this rig) that swamps sub-millisecond stages, so the tool
also measures that floor with a trivial jitted program under the exact
same timing protocol and reports floor-corrected stage times
(``stages_corrected_ms`` / the ``-floor`` column) — those are the
numbers to compare between stages.

Usage::

    python -m autorally_tpu.tools.solve_breakdown [--rollouts 1920]
        [--timesteps 100] [--bf] [--kernel-rng] [--neural-costmap] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _timeit(f, *args, n=20, batches=5):
    import jax

    out = f(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rollouts", type=int, default=1920)
    ap.add_argument("--timesteps", type=int, default=100)
    ap.add_argument("--bf", action="store_true")
    ap.add_argument("--neural-costmap", action="store_true")
    ap.add_argument("--kernel-rng", action="store_true")
    ap.add_argument("--obstacles", type=int, default=0, metavar="N",
                    help="compose ObstacleCost with N live circles (the "
                         "in-kernel obstacle-term A/B: compare FULL_SOLVE "
                         "against a run without this flag)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--batches", type=int, default=5)
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build
    from autorally_tpu.config import MPPIConfig
    from autorally_tpu.io.compile_cache import enable_persistent_cache
    from autorally_tpu.solver.mppi import savitzky_golay

    enable_persistent_cache()

    cfg = MPPIConfig(num_rollouts=args.rollouts,
                     num_timesteps=args.timesteps,
                     kernel_rng=args.kernel_rng)
    solver, params, cp, cm, state = _build(
        cfg, model_kind="bf" if args.bf else "nn")
    if args.obstacles:
        # live circles down the track edge — in the inflation band of many
        # rollouts (so the term does real work) without crashing the swarm
        from autorally_tpu.costs.obstacles import ObstacleCost, make_obstacles

        circles = [(25.0 + 2.5, 5.0 + 6.0 * i, 0.5)
                   for i in range(args.obstacles)]
        # preserve the built cost's l1_cost so the swap changes only the
        # obstacle terms, not the speed-cost semantics
        solver.cost = ObstacleCost(make_obstacles(circles),
                                   l1_cost=solver.cost.l1_cost)
        cp = cp.replace(obstacles=solver.cost.obstacles)
    if args.neural_costmap:
        from autorally_tpu.costs.neural_costmap import fit_neural_costmap

        cm, _ = fit_neural_costmap(cm, epochs=1500)
    cs = solver.init_state()
    T, K, C = cfg.num_timesteps, cfg.num_rollouts, solver.model.CONTROL_DIM
    key = jax.random.PRNGKey(0)

    rows = {}

    if solver._use_kernel_rng(cm):
        # the production _solve runs the two-pass kernel-RNG pipeline —
        # time ITS stages, not the eps-fed path it never executes
        from autorally_tpu.ops.rollout_kernel import (fused_rng_costs,
                                                      fused_rng_numer)

        # thread the solver's obstacle kwargs through so the staged rows
        # time the same program FULL_SOLVE runs when --obstacles is set
        obs_kw = solver._obstacle_kwargs(cp)
        p1 = jax.jit(lambda s, U, k: fused_rng_costs(
            solver.model, params, cfg, cp, cm, s, U, k,
            l1_cost=solver.cost.l1_cost,
            precision=cfg.matmul_precision, **obs_kw)[:2])
        rows["rng_pass1_costs"] = _timeit(p1, state, cs.U, key,
                                          n=args.n, batches=args.batches)
        total, crash, ctx = fused_rng_costs(
            solver.model, params, cfg, cp, cm, state, cs.U, key,
            l1_cost=solver.cost.l1_cost, precision=cfg.matmul_precision,
            **obs_kw)

        @jax.jit
        def softmax_w(total):
            return jnp.exp(-cfg.gamma * (total - jnp.min(total)))

        rows["rng_softmax"] = _timeit(softmax_w, total,
                                      n=args.n, batches=args.batches)
        w = softmax_w(total)
        p2 = jax.jit(lambda w: (fused_rng_numer(ctx, w) / jnp.sum(w)).T)
        rows["rng_pass2_update"] = _timeit(p2, w,
                                           n=args.n, batches=args.batches)
        U_new = p2(w)
    else:
        # stage: noise sampling
        noise = jax.jit(lambda k: solver._sample_noise(k, (T, K, C)))
        rows["noise_sample"] = _timeit(noise, key,
                                       n=args.n, batches=args.batches)
        eps = noise(key)

        # stage: rollout + cost (the kernel / scan chain + epilogue)
        rc = jax.jit(lambda s, U, e: solver.rollout_costs(params, cp, cm, s,
                                                          U, e))
        rows["rollout_costs"] = _timeit(rc, state, cs.U, eps,
                                        n=args.n, batches=args.batches)
        total, u_seq, crash = rc(state, cs.U, eps)

        # stage: softmax weights + weighted control update
        spec = "k,ctk->tc" if solver.use_pallas_rollout else "k,tkc->tc"

        @jax.jit
        def update(total, u_seq):
            baseline = jnp.min(total)
            w = jnp.exp(-cfg.gamma * (total - baseline))
            return jnp.einsum(spec, w, u_seq) / jnp.sum(w)

        rows["weight_update"] = _timeit(update, total, u_seq,
                                        n=args.n, batches=args.batches)
        U_new = update(total, u_seq)

    # stage: Savitzky-Golay smoothing
    sg = jax.jit(savitzky_golay)
    rows["savitzky_golay"] = _timeit(sg, U_new, cs.control_hist,
                                     n=args.n, batches=args.batches)

    # stage: nominal-trajectory re-rollout
    nom = jax.jit(lambda s, U: solver.nominal_trajectory(params, s, U))
    rows["nominal_traj"] = _timeit(nom, state, U_new,
                                   n=args.n, batches=args.batches)

    # stage: receding-horizon slide
    rows["slide"] = _timeit(solver._slide_jit, cs, jnp.int32(1),
                            n=args.n, batches=args.batches)

    # the production program: everything above in one jit
    full = jax.jit(lambda s, c: solver._solve(params, cp, cm, s, c))
    rows["FULL_SOLVE"] = _timeit(full, state, cs,
                                 n=args.n, batches=args.batches)

    # per-dispatch floor: a trivial device program under the identical
    # protocol — host enqueue + tunnel overhead, no real device work
    tiny = jnp.zeros((8, 128), jnp.float32)
    floor = _timeit(jax.jit(lambda x: x + 1.0), tiny,
                    n=args.n, batches=args.batches)

    corrected = {k: max(v - floor, 0.0) for k, v in rows.items()}
    stage_sum = sum(v for k, v in rows.items() if k != "FULL_SOLVE")
    csum = sum(v for k, v in corrected.items() if k != "FULL_SOLVE")
    out = {
        "backend": jax.default_backend(),
        "K": K, "T": T,
        "model": "bf" if args.bf else "nn",
        "pallas": bool(solver.use_pallas_rollout),
        "kernel_rng": bool(solver._use_kernel_rng(cm)),
        "dispatch_floor_ms": round(floor, 4),
        "stages_ms": {k: round(v, 4) for k, v in rows.items()},
        "stages_corrected_ms": {k: round(v, 4)
                                for k, v in corrected.items()},
        "stage_sum_ms": round(stage_sum, 4),
        "corrected_sum_ms": round(csum, 4),
        "fusion_gain": round(stage_sum / rows["FULL_SOLVE"], 2),
    }
    print(json.dumps(out))
    width = max(len(k) for k in rows)
    print(f"{'(dispatch floor)':<{width}}  {floor:9.3f} ms",
          file=sys.stderr)
    for k, v in sorted(rows.items(), key=lambda kv: -corrected[kv[0]]):
        c = corrected[k]
        frac = c / csum * 100 if (k != "FULL_SOLVE" and csum > 0) else 0
        bar = "#" * int(frac / 2)
        tag = (f"-floor {c:7.3f} ms  {frac:5.1f}% {bar}"
               if k != "FULL_SOLVE" else f"-floor {c:7.3f} ms  (one program)")
        print(f"{k:<{width}}  {v:9.3f} ms  {tag}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
