"""Worker process for the true multi-process ``jax.distributed`` test.

Launched by ``tests/test_multihost.py`` as N coordinated processes, each
exposing ``devices_per_process`` virtual CPU devices — the multi-host deployment topology
(SURVEY.md §5 "distributed communication backend") without real DCN.
Each process:

1. bootstraps the distributed runtime against a real coordinator
   (``parallel/multihost.py::initialize`` — a bad address must raise),
2. builds the process-spanning rollout mesh and runs the sharded solve,
3. builds the 2-D hosts x local-devices ensemble mesh and runs the
   ensemble-sharded solve,
4. routes result I/O through ``is_primary()`` — only process 0 writes,
   mirroring the primary-host pose-in/control-out routing.

Run: ``python multihost_worker.py <pid> <nproc> <coordinator> <outdir>
[devices_per_process=4]``
"""

import os
import sys


def main() -> int:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coordinator = sys.argv[3]
    outdir = sys.argv[4]
    dpp = int(sys.argv[5]) if len(sys.argv) > 5 else 4

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={dpp}").strip()

    import numpy as np

    import jax

    # the platform must be forced via jax.config, not JAX_PLATFORMS: the
    # rig's accelerator plugin overrides the env var (same reason as
    # tests/conftest.py), and CPU multi-process needs a cross-process
    # collectives backend (the default CPU client is single-process)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    import jax.numpy as jnp

    from autorally_tpu.parallel.multihost import (initialize, is_primary,
                                                  multihost_ensemble_mesh,
                                                  multihost_rollout_mesh)

    initialize(coordinator=coordinator, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == dpp
    assert jax.device_count() == dpp * nproc
    assert is_primary() == (pid == 0)
    # idempotent re-init must not raise (the double-init guard)
    initialize(coordinator=coordinator, num_processes=nproc, process_id=pid)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from autorally_tpu.config import CostParams, MPPIConfig
    from autorally_tpu.costs import MPPICost
    from autorally_tpu.costs.costmap import make_costmap
    from autorally_tpu.models import NeuralNetDynamics
    from autorally_tpu.parallel import ShardedMPPISolver
    from autorally_tpu.parallel.ensemble_sharded import \
        EnsembleShardedMPPISolver
    from autorally_tpu.tools.track_generator import oval_track

    NN_NPZ = ("/root/reference/autorally_control/src/path_integral/params/"
              "models/autorally_nnet_09_12_2018.npz")
    K, T = 256, 16
    start = np.array([0.0, -15.0, 0.0, 0.0, 2.0, 0.0, 0.0],
                     dtype=np.float32)

    cfg = MPPIConfig(num_rollouts=K, num_timesteps=T)
    data, xb, yb = oval_track(ppm=2.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    cp = CostParams()

    # ---- process-spanning rollout mesh -------------------------------
    mesh = multihost_rollout_mesh()
    assert mesh.shape["rollouts"] == dpp * nproc
    # every input is replicated (same bytes on every process): make them
    # global replicated arrays so shard_map may address the full mesh
    rep = NamedSharding(mesh, P())
    put = lambda tree: jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), rep), tree)
    solver = ShardedMPPISolver(model, MPPICost(), cfg, mesh=mesh)
    g_params, g_cp, g_cm = put(params), put(cp), put(cm)
    cs = put(solver.init_state())
    cs2, stats = solver.solve(g_params, g_cp, g_cm,
                              jax.device_put(jnp.asarray(start), rep), cs)
    U = np.asarray(jax.device_get(cs2.U))
    rollout_stats = {k: float(jax.device_get(getattr(stats, k)))
                     for k in ("baseline", "normalizer", "ess",
                               "trajectory_cost", "crash_frac")}

    # ---- 2-D hosts x local-devices ensemble mesh ---------------------
    emesh = multihost_ensemble_mesh()
    assert emesh.shape["ensemble"] == nproc
    assert emesh.shape["rollouts"] == dpp
    erep = NamedSharding(emesh, P())
    eput = lambda tree: jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), erep), tree)
    esolver = EnsembleShardedMPPISolver(model, MPPICost(), cfg, mesh=emesh)
    stacked = jax.tree.map(
        lambda x: jnp.stack([jnp.asarray(x)] * nproc), params)
    ecs = eput(esolver.init_state())
    ecs2, estats = esolver.solve(eput(stacked), eput(cp), eput(cm),
                                 jax.device_put(jnp.asarray(start), erep),
                                 ecs)
    eU = np.asarray(jax.device_get(ecs2.U))
    assert np.isfinite(eU).all()

    # ---- primary-host I/O routing ------------------------------------
    if is_primary():
        np.savez(os.path.join(outdir, "primary_result.npz"),
                 U=U, eU=eU, **rollout_stats)
    else:
        # non-primary processes hold the same replicated result but do
        # not own I/O; stash it elsewhere so the test can check both the
        # routing and the cross-process agreement
        np.savez(os.path.join(outdir, f"replica_{pid}.npz"),
                 U=U, eU=eU, **rollout_stats)
    print(f"worker {pid}: ok", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
