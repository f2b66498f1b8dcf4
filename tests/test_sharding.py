"""Sharded-solver tests on the virtual 8-device CPU mesh.

Validates that sharding K over chips preserves solver semantics: with the
same per-shard noise protocol, the sharded solve must agree with a
single-chip solve that uses the identically-constructed noise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autorally_tpu.config import CostParams, MPPIConfig
from autorally_tpu.costs import MPPICost
from autorally_tpu.costs.costmap import make_costmap
from autorally_tpu.models import NeuralNetDynamics
from autorally_tpu.parallel import ShardedMPPISolver, rollout_mesh
from autorally_tpu.solver.mppi import MPPISolver
from autorally_tpu.tools.track_generator import oval_track

NN_NPZ = "/root/reference/autorally_control/src/path_integral/params/models/autorally_nnet_09_12_2018.npz"

K, T = 256, 16
START = np.array([0.0, -15.0, 0.0, 0.0, 2.0, 0.0, 0.0], dtype=np.float32)


def build(n_devices=8):
    cfg = MPPIConfig(num_rollouts=K, num_timesteps=T)
    data, xb, yb = oval_track(ppm=2.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    mesh = rollout_mesh(jax.devices()[:n_devices])
    solver = ShardedMPPISolver(model, MPPICost(), cfg, mesh=mesh)
    return solver, params, CostParams(), cm, cfg


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_solve_runs():
    solver, params, p, cm, _ = build()
    cs = solver.init_state()
    cs2, stats = solver.solve(params, p, cm, START, cs)
    assert cs2.U.shape == (T, 2)
    assert np.isfinite(np.asarray(cs2.U)).all()
    assert float(stats.ess) > 1.0
    assert float(stats.normalizer) > 0


def test_sharded_matches_singlechip_with_same_noise():
    """Reconstruct the sharded per-chip noise on one device; updates must
    match to float32 reduction tolerance."""
    solver, params, p, cm, cfg = build()
    key = jax.random.PRNGKey(7)
    n = solver.n_shards
    K_local = K // n
    T_, C = cfg.num_timesteps, 2

    # Build the global (T, K, C) noise exactly as the shards do.
    eps_shards = [
        jax.random.normal(jax.random.fold_in(key, i), (T_, K_local, C),
                          dtype=jnp.float32)
        for i in range(n)
    ]
    eps = jnp.concatenate(eps_shards, axis=1)

    single = MPPISolver(solver.model, solver.cost, cfg)
    U0 = single.init_state().U
    U_single, stats_single = single.iterate(params, p, cm,
                                            jnp.asarray(START), U0, eps)
    U_sharded, stats_sharded = solver._sharded_iterate(
        params, p, cm, jnp.asarray(START), U0, key)

    np.testing.assert_allclose(np.asarray(U_sharded), np.asarray(U_single),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(stats_sharded.baseline),
                               float(stats_single.baseline), rtol=1e-5)
    np.testing.assert_allclose(float(stats_sharded.normalizer),
                               float(stats_single.normalizer), rtol=1e-4)
    np.testing.assert_allclose(float(stats_sharded.ess),
                               float(stats_single.ess), rtol=1e-4)


@pytest.mark.parametrize("n_devices", [1, 2, 4])
def test_shard_counts(n_devices):
    solver, params, p, cm, _ = build(n_devices)
    cs = solver.init_state()
    cs2, stats = solver.solve(params, p, cm, START, cs)
    assert np.isfinite(np.asarray(cs2.U)).all()


def test_indivisible_rollouts_rejected():
    cfg = MPPIConfig(num_rollouts=100, num_timesteps=T)
    model = NeuralNetDynamics(cfg.dt)
    mesh = rollout_mesh(jax.devices()[:8])
    with pytest.raises(ValueError, match="not divisible"):
        ShardedMPPISolver(model, MPPICost(), cfg, mesh=mesh)


def test_multihost_helpers_single_process():
    """Single-process behavior of the multi-host utilities."""
    from autorally_tpu.parallel.multihost import (initialize, is_primary,
                                                  multihost_rollout_mesh)

    initialize()                       # no-op single process
    assert is_primary()
    mesh = multihost_rollout_mesh()
    assert mesh.shape["rollouts"] == len(jax.devices())


def test_one_device_inline_fast_path_bit_matches_shard_map():
    """On a 1-device mesh the solver bypasses shard_map (identity
    reductions, idx=0) — the output must be bit-identical to the wrapped
    path, which ``force_shard_map=True`` keeps reachable."""
    cfg = MPPIConfig(num_rollouts=K, num_timesteps=T)
    data, xb, yb = oval_track(ppm=2.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    mesh = rollout_mesh(jax.devices()[:1])

    fast = ShardedMPPISolver(model, MPPICost(), cfg, mesh=mesh)
    slow = ShardedMPPISolver(model, MPPICost(), cfg, mesh=mesh,
                             force_shard_map=True)
    assert fast._inline_body and not slow._inline_body

    cs = fast.init_state()
    cs_f, st_f = fast.solve(params, CostParams(), cm, START, cs)
    cs_s, st_s = slow.solve(params, CostParams(), cm, START, cs)
    np.testing.assert_array_equal(np.asarray(cs_f.U), np.asarray(cs_s.U))
    assert float(st_f.ess) == float(st_s.ess)
    assert float(st_f.baseline) == float(st_s.baseline)
