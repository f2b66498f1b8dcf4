"""2-D (ensemble x rollouts) mesh sharding tests on the virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autorally_tpu.config import CostParams, MPPIConfig
from autorally_tpu.costs import MPPICost
from autorally_tpu.costs.costmap import make_costmap
from autorally_tpu.models import EnsembleDynamics, NeuralNetDynamics
from autorally_tpu.parallel import EnsembleShardedMPPISolver, make_mesh
from autorally_tpu.solver.mppi import MPPISolver
from autorally_tpu.tools.track_generator import oval_track
from tests.test_ensemble import make_ensemble

START = np.array([0.0, -15.0, 0.0, 0.0, 2.0, 0.0, 0.0], dtype=np.float32)
K, T = 256, 16


def build(ens=4, roll=2):
    base_model, stacked, p0, base = make_ensemble(num_members=ens, noise=0.1)
    cfg = MPPIConfig(num_rollouts=K, num_timesteps=T)
    data, xb, yb = oval_track(ppm=2.0)
    cm = make_costmap(data, xb, yb)
    mesh = make_mesh((ens, roll), ("ensemble", "rollouts"),
                     jax.devices()[:ens * roll])
    solver = EnsembleShardedMPPISolver(base, MPPICost(), cfg, mesh)
    return solver, stacked, p0, base, cm, cfg


def test_ensemble_sharded_solve_runs():
    solver, stacked, *_ , cm, cfg = build()
    cs = solver.init_state()
    cs2, stats = solver.solve(stacked, CostParams(), cm, START, cs)
    assert np.isfinite(np.asarray(cs2.U)).all()
    assert float(stats.ess) > 1.0
    assert float(stats.normalizer) > 0


def test_ensemble_sharded_matches_singlechip_ensemble():
    """The 2-D sharded solve must equal a single-chip EnsembleDynamics
    solve given identically-constructed per-shard noise."""
    ens, roll = 4, 2
    solver, stacked, p0, base, cm, cfg = build(ens, roll)
    key = jax.random.PRNGKey(11)
    K_local = K // (ens * roll)

    # reconstruct the global (T, K, C) noise in member-block order
    blocks = []
    for e in range(ens):
        for r in range(roll):
            k2 = jax.random.fold_in(jax.random.fold_in(key, e), r)
            blocks.append(jax.random.normal(k2, (T, K_local, 2),
                                            dtype=jnp.float32))
    eps = jnp.concatenate(blocks, axis=1)

    single_model = EnsembleDynamics(base, ens)
    single = MPPISolver(single_model, MPPICost(), cfg)
    U0 = single.init_state().U
    U_single, st_single = single.iterate(
        stacked, CostParams(), cm, jnp.asarray(START), U0, eps)
    U_sharded, st_sharded = solver._sharded_iterate(
        stacked, CostParams(), cm, jnp.asarray(START), U0, key)

    np.testing.assert_allclose(np.asarray(U_sharded), np.asarray(U_single),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(st_sharded.baseline),
                               float(st_single.baseline), rtol=1e-5)
    np.testing.assert_allclose(float(st_sharded.ess),
                               float(st_single.ess), rtol=1e-4)


def test_indivisible_configs_rejected():
    base = NeuralNetDynamics(0.02)
    mesh = make_mesh((4, 2), ("ensemble", "rollouts"), jax.devices()[:8])
    with pytest.raises(ValueError, match="not divisible"):
        EnsembleShardedMPPISolver(base, MPPICost(),
                                  MPPIConfig(num_rollouts=100,
                                             num_timesteps=T), mesh)
