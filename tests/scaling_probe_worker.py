"""Collective-cost probe worker for the multi-host scaling forecast.

Launched as N coordinated ``jax.distributed`` processes over gloo (the
same rig as ``multihost_worker.py``).  Measures, on a REAL multi-process
transport, the per-iteration cost of exactly the MPPI collective pattern
(one ``pmin`` scalar + ``psum`` of a (T, C) tensor + scalar ``psum``\\ s,
``parallel/sharded.py:110-118``) as a function of an injected extra
allreduce payload — the "artificial DCN delay" knob: inflating the
payload sweeps the bytes term of the comm model, and the zero-pad point
measures the transport's latency floor.

Writes ``probe_<pid>.json`` with {payload_bytes: seconds_per_iteration}.
Run: ``python scaling_probe_worker.py <pid> <nproc> <coordinator>
<outdir> [iters=300]``
"""

import json
import os
import sys
import time


def main() -> int:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coordinator = sys.argv[3]
    outdir = sys.argv[4]
    iters = int(sys.argv[5]) if len(sys.argv) > 5 else 300

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=1").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    import jax.numpy as jnp
    import numpy as np
    from jax import lax, shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from autorally_tpu.parallel.multihost import initialize

    initialize(coordinator=coordinator, num_processes=nproc, process_id=pid)
    mesh = Mesh(np.array(jax.devices()), ("rollouts",))

    T, C = 100, 2

    def make_chain(pad_elems: int):
        # the pad psum is ALWAYS present (1 element at the baseline
        # point) so the sweep varies only BYTES, never the number of
        # collective ops — mixing the two would fold per-message launch
        # overhead into the bandwidth slope
        def body(carry, _):
            c, p = carry
            # the MPPI iteration's exact collective set
            b = lax.pmin(jnp.min(c), "rollouts")               # baseline
            s = lax.psum(c, "rollouts")                        # numerator
            e = lax.psum(jnp.sum(c), "rollouts")               # eta
            w2 = lax.psum(jnp.sum(c * c), "rollouts")          # sum w^2
            p = lax.psum(p, "rollouts") * 0.5                  # injected payload
            c = s * 0.5 + (b + e + w2) * 1e-9 + p.reshape(-1)[0] * 1e-9
            return (c, p), ()

        def chain(c, p):
            (c, p), _ = lax.scan(body, (c, p), None, length=iters)
            return c

        return shard_map(chain, mesh=mesh, in_specs=(P(), P()),
                         out_specs=P(), check_vma=False)

    results = {}
    for pad_elems in (1, 2048, 16384, 131072, 1048576):
        fn = jax.jit(make_chain(pad_elems))
        c0 = jnp.ones((T, C), jnp.float32)
        p0 = jnp.ones((pad_elems,), jnp.float32)
        jax.block_until_ready(fn(c0, p0))                      # compile+warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(c0, p0))
            best = min(best, (time.perf_counter() - t0) / iters)
        results[str(pad_elems * 4)] = best                     # bytes -> s/iter

    with open(os.path.join(outdir, f"probe_{pid}.json"), "w") as f:
        json.dump({"pid": pid, "nproc": nproc,
                   "iters": iters, "per_iter_s": results}, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
