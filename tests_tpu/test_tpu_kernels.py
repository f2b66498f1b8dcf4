"""TPU-hardware kernel parity tests (not part of the default CPU suite).

Run on a real TPU: ``python -m pytest tests_tpu/ -q``.  These validate the
Pallas kernels against the scan/XLA reference paths at operating scale.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

if jax.default_backend() != "tpu":
    pytest.skip("TPU-only tests", allow_module_level=True)

from autorally_tpu.config import CostParams, MPPIConfig
from autorally_tpu.costs import MPPICost
from autorally_tpu.costs.costmap import make_costmap
from autorally_tpu.costs.neural_costmap import fit_neural_costmap
from autorally_tpu.models import NeuralNetDynamics
from autorally_tpu.solver.mppi import MPPISolver
from autorally_tpu.tools.track_generator import oval_track

NN_NPZ = "/root/reference/autorally_control/src/path_integral/params/models/autorally_nnet_09_12_2018.npz"
# ON the default oval (half_length 25): right apex, heading +y.  A start
# off the track (e.g. x=30, channel0≈2.05 ≥ boundary 0.65) would crash-
# latch every rollout and make the cost/crash parity assertions vacuous.
START = np.array([25.0, 0.0, 1.57, 0.0, 2.0, 0.0, 0.0], dtype=np.float32)


def build(K=1920, T=100, pallas=None, exact_fused=False):
    cfg = MPPIConfig(num_rollouts=K, num_timesteps=T,
                     use_pallas_rollout=pallas, exact_fused=exact_fused)
    data, xb, yb = oval_track(ppm=4.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    solver = MPPISolver(model, MPPICost(), cfg)
    return solver, params, CostParams(), cm, cfg


def test_pallas_chain_matches_scan():
    sp, params, cp, cm, cfg = build(pallas=True)
    ss, *_ = build(pallas=False)
    assert sp.use_pallas_rollout and not ss.use_pallas_rollout
    eps = jax.random.normal(jax.random.PRNGKey(0), (100, 1920, 2),
                            dtype=jnp.float32)
    U = sp.init_state().U
    Up, _ = jax.jit(lambda e: sp.iterate(params, cp, cm, START, U, e))(eps)
    Us, _ = jax.jit(lambda e: ss.iterate(params, cp, cm, START, U, e))(eps)
    np.testing.assert_allclose(np.asarray(Up), np.asarray(Us),
                               rtol=2e-4, atol=1e-4)


def test_gridded_kernel_large_K():
    """K above the single-tile limit exercises the lane-axis grid."""
    sp, params, cp, cm, cfg = build(K=8192, T=32, pallas=True)
    ss, *_ = build(K=8192, T=32, pallas=False)
    eps = jax.random.normal(jax.random.PRNGKey(1), (32, 8192, 2),
                            dtype=jnp.float32)
    U = sp.init_state().U
    Up, stp = jax.jit(lambda e: sp.iterate(params, cp, cm, START, U, e))(eps)
    Us, sts = jax.jit(lambda e: ss.iterate(params, cp, cm, START, U, e))(eps)
    np.testing.assert_allclose(np.asarray(Up), np.asarray(Us),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(float(stp.baseline), float(sts.baseline),
                               rtol=1e-4)


def test_exact_fused_kernel_matches_scan():
    """The fused exact-costmap kernel (windowed in-kernel gather) vs the
    scan path — texture semantics must be bit-faithful, so the update
    tolerance is the dynamics-matmul one, same as the chain test."""
    sp, params, cp, cm, cfg = build(pallas=True, exact_fused=True)
    ss, *_ = build(pallas=False)
    eps = jax.random.normal(jax.random.PRNGKey(3), (100, 1920, 2),
                            dtype=jnp.float32)
    U = sp.init_state().U
    tot_p, useq_p, crash_p = jax.jit(
        lambda e: sp.rollout_costs(params, cp, cm, START, U, e))(eps)
    tot_s, useq_s, crash_s = jax.jit(
        lambda e: ss.rollout_costs(params, cp, cm, START, U, e))(eps)
    assert (np.asarray(crash_p) == np.asarray(crash_s)).mean() > 0.999
    np.testing.assert_allclose(np.asarray(tot_p), np.asarray(tot_s),
                               rtol=2e-4, atol=1e-3)
    Up, _ = jax.jit(lambda e: sp.iterate(params, cp, cm, START, U, e))(eps)
    Us, _ = jax.jit(lambda e: ss.iterate(params, cp, cm, START, U, e))(eps)
    np.testing.assert_allclose(np.asarray(Up), np.asarray(Us),
                               rtol=2e-4, atol=1e-4)


def test_exact_fused_large_K_beats_epilogue_gather():
    """K=65536: the in-kernel windowed gather must clearly beat the
    chain + XLA-gather epilogue (the round-1 scale bottleneck)."""
    import time

    K, T = 65536, 100
    sf, params, cp, cm, _ = build(K=K, T=T, pallas=True, exact_fused=True)
    sg, *_ = build(K=K, T=T, pallas=True, exact_fused=False)
    eps = jax.random.normal(jax.random.PRNGKey(4), (T, K, 2),
                            dtype=jnp.float32)
    U = sf.init_state().U

    def timed(sv):
        f = jax.jit(lambda e: sv.iterate(params, cp, cm, START, U, e))
        r = f(eps)
        jax.block_until_ready(r)
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(eps)[0])           # force device completion
            best = min(best, time.perf_counter() - t0)
        return best, r[0]

    t_fused, U_f = timed(sf)
    t_epilogue, U_g = timed(sg)
    np.testing.assert_allclose(np.asarray(U_f), np.asarray(U_g),
                               rtol=2e-4, atol=1e-3)
    print(f"\nK={K} exact: fused {t_fused*1e3:.1f} ms vs "
          f"epilogue {t_epilogue*1e3:.1f} ms")
    assert t_fused < t_epilogue


def test_fused_neural_kernel_matches_twophase():
    """Fused rollout+cost kernel vs two-phase evaluation of the same field."""
    sp, params, cp, cm, cfg = build(pallas=True)
    nc, metrics = fit_neural_costmap(cm, epochs=1500)
    assert metrics["boundary_flip_rate"] < 0.05

    class Proxy:  # duck-typed field that avoids the fused dispatch
        def __init__(self, nc):
            self.nc = nc

        def lookup_ch0(self, x, y):
            return self.nc.lookup_ch0(x, y)

        def world_to_norm(self, x, y):
            return self.nc.world_to_norm(x, y)

    jax.tree_util.register_pytree_node(
        Proxy, lambda p: ((p.nc,), None), lambda aux, c: Proxy(c[0]))

    eps = jax.random.normal(jax.random.PRNGKey(2), (100, 1920, 2),
                            dtype=jnp.float32)
    U = sp.init_state().U
    tot_f, useq_f, crash_f = jax.jit(
        lambda e: sp.rollout_costs(params, cp, nc, START, U, e))(eps)
    tot_2, useq_2, crash_2 = jax.jit(
        lambda e: sp.rollout_costs(params, cp, Proxy(nc), START, U, e))(eps)
    # Identical field, but Mosaic and XLA use different fast-matmul
    # decompositions, so per-rollout costs drift ~1e-2 relative (plus
    # rare threshold flips).  What must agree is the *decision level*:
    # the softmax-weighted control update.
    assert (crash_f == crash_2).mean() > 0.99
    np.testing.assert_allclose(np.asarray(useq_f), np.asarray(useq_2),
                               rtol=1e-5, atol=1e-6)

    def update(total, useq):
        w = jnp.exp(-0.15 * (total - jnp.min(total)))
        return jnp.einsum("k,ctk->tc", w, useq) / jnp.sum(w)

    U_f = np.asarray(update(tot_f, useq_f))
    U_2 = np.asarray(update(tot_2, useq_2))
    np.testing.assert_allclose(U_f, U_2, rtol=5e-3, atol=2e-2)


def test_kernel_rng_mode_matches_host_noise_statistically():
    """In-kernel Box-Muller + two-pass update: different (equally valid)
    noise stream, so compare at the decision level vs the host-noise
    fused path, plus determinism for a fixed key."""
    cfg = MPPIConfig(num_rollouts=1920, num_timesteps=100, kernel_rng=True)
    sp, params, cp, cm, _ = build(pallas=True)
    sp_rng = MPPISolver(sp.model, sp.cost, cfg)
    nc, _ = fit_neural_costmap(cm, epochs=1500)
    cs = sp_rng.init_state()

    a, sa = sp_rng.solve(params, cp, nc, START, cs)
    b, sb = sp.solve(params, cp, nc, START, cs)
    assert np.isfinite(np.asarray(a.U)).all()
    # same scenario, different streams: plans agree loosely, stats same scale
    assert np.abs(np.asarray(a.U) - np.asarray(b.U)).max() < 0.15
    assert 0.2 < float(sa.ess) / float(sb.ess) < 5.0
    assert abs(float(sa.crash_frac) - float(sb.crash_frac)) < 0.05

    # deterministic given the key
    a2, _ = sp_rng.solve(params, cp, nc, START, cs)
    np.testing.assert_array_equal(np.asarray(a.U), np.asarray(a2.U))


def test_sharded_kernel_rng_composes():
    """Kernel-RNG mode through ShardedMPPISolver: per-shard Mosaic seeds +
    global softmax reductions.  On the single-chip mesh available here the
    composition must be deterministic and land at the same decision level
    as the single-chip kernel-RNG solver (different key-derivation, hence
    a different — equally valid — noise stream)."""
    from jax.sharding import Mesh
    from autorally_tpu.parallel.sharded import ShardedMPPISolver

    cfg = MPPIConfig(num_rollouts=1920, num_timesteps=100, kernel_rng=True,
                     use_pallas_rollout=True)
    _, params, cp, cm, _ = build(pallas=True)
    nc, _ = fit_neural_costmap(cm, epochs=1500)
    mesh = Mesh(np.array(jax.devices()[:1]), ("rollouts",))
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    sh = ShardedMPPISolver(model, MPPICost(), cfg, mesh=mesh)
    single = MPPISolver(model, MPPICost(), cfg)
    cs = sh.init_state()

    a, sa = sh.solve(params, cp, nc, START, cs)
    b, sb = single.solve(params, cp, nc, START, cs)
    assert np.isfinite(np.asarray(a.U)).all()
    assert np.abs(np.asarray(a.U) - np.asarray(b.U)).max() < 0.15
    assert 0.2 < float(sa.ess) / float(sb.ess) < 5.0

    a2, _ = sh.solve(params, cp, nc, START, cs)
    np.testing.assert_array_equal(np.asarray(a.U), np.asarray(a2.U))


def test_fused_solve_runs_and_matches_exact_closely():
    sp, params, cp, cm, cfg = build(pallas=True)
    nc, _ = fit_neural_costmap(cm, epochs=2000)
    cs = sp.init_state()
    cs_n, _ = sp.solve(params, cp, nc, START, cs)
    cs_e, _ = sp.solve(params, cp, cm, START, cs)
    assert np.isfinite(np.asarray(cs_n.U)).all()
    assert np.abs(np.asarray(cs_n.U) - np.asarray(cs_e.U)).max() < 0.3


def test_bf_exact_fused_matches_scan_on_tpu():
    """The basis-function family (path_integral_bf, K=2560) through the
    fused exact-costmap kernel vs the scan path.  Tolerance is wider than
    the MLP tests: the kernel computes atan by minimax polynomial and tan
    as sin/cos (no Mosaic primitives), which the slip-angle basis terms
    integrate over the horizon."""
    from autorally_tpu.models import BasisFunctionDynamics

    BF_NPZ = ("/root/reference/autorally_control/src/path_integral/params/"
              "models/basis_function_09_12_2018.npz")
    cfg = MPPIConfig(num_rollouts=2560, num_timesteps=100,
                     use_pallas_rollout=True, exact_fused=True)
    data, xb, yb = oval_track(ppm=4.0)
    cm = make_costmap(data, xb, yb)
    model = BasisFunctionDynamics(cfg.dt)
    params = model.load_params(BF_NPZ)
    sp = MPPISolver(model, MPPICost(), cfg)
    ss = MPPISolver(model, MPPICost(), cfg.replace(use_pallas_rollout=False))
    assert sp.use_pallas_rollout and not ss.use_pallas_rollout
    cp = CostParams()
    eps = jax.random.normal(jax.random.PRNGKey(5), (100, 2560, 2),
                            dtype=jnp.float32)
    U = sp.init_state().U
    tot_p, _, crash_p = jax.jit(
        lambda e: sp.rollout_costs(params, cp, cm, START, U, e))(eps)
    tot_s, _, crash_s = jax.jit(
        lambda e: ss.rollout_costs(params, cp, cm, START, U, e))(eps)
    assert (np.asarray(crash_p) == np.asarray(crash_s)).mean() > 0.995
    ok = np.isclose(np.asarray(tot_p), np.asarray(tot_s),
                    rtol=5e-3, atol=1e-2)
    assert ok.mean() > 0.995, f"cost mismatch frac {1 - ok.mean():.4f}"
    Up, _ = jax.jit(lambda e: sp.iterate(params, cp, cm, START, U, e))(eps)
    Us, _ = jax.jit(lambda e: ss.iterate(params, cp, cm, START, U, e))(eps)
    np.testing.assert_allclose(np.asarray(Up), np.asarray(Us),
                               rtol=5e-3, atol=5e-3)


def test_kernel_rng_exact_costmap_mode():
    """Round-2 exact capacity mode: in-kernel RNG + the windowed exact
    gather — reference-exact track semantics with nothing per-(t,k) in
    HBM.  Decision-level agreement vs the host-noise exact-fused path,
    determinism for a fixed key, and the VMEM-budget fallback."""
    cfg = MPPIConfig(num_rollouts=1920, num_timesteps=100, kernel_rng=True)
    sp, params, cp, cm, _ = build(pallas=True, exact_fused=True)
    sp_rng = MPPISolver(sp.model, sp.cost, cfg)
    assert sp_rng._use_kernel_rng(cm)
    cs = sp_rng.init_state()

    a, sa = sp_rng.solve(params, cp, cm, START, cs)
    b, sb = sp.solve(params, cp, cm, START, cs)
    assert np.isfinite(np.asarray(a.U)).all()
    # same scenario, different (equally valid) noise streams
    assert np.abs(np.asarray(a.U) - np.asarray(b.U)).max() < 0.15
    assert 0.2 < float(sa.ess) / float(sb.ess) < 5.0
    assert abs(float(sa.crash_frac) - float(sb.crash_frac)) < 0.05

    a2, _ = sp_rng.solve(params, cp, cm, START, cs)
    np.testing.assert_array_equal(np.asarray(a.U), np.asarray(a2.U))


def test_kernel_rng_exact_bf_model():
    """Both round-2 extensions composed: the basis-function family in
    kernel-RNG mode over the exact costmap."""
    from autorally_tpu.models import BasisFunctionDynamics

    BF_NPZ = ("/root/reference/autorally_control/src/path_integral/params/"
              "models/basis_function_09_12_2018.npz")
    cfg = MPPIConfig(num_rollouts=2560, num_timesteps=100, kernel_rng=True)
    data, xb, yb = oval_track(ppm=4.0)
    cm = make_costmap(data, xb, yb)
    model = BasisFunctionDynamics(cfg.dt)
    params = model.load_params(BF_NPZ)
    sp_rng = MPPISolver(model, MPPICost(), cfg)
    assert sp_rng._use_kernel_rng(cm)
    sp = MPPISolver(model, MPPICost(),
                    cfg.replace(kernel_rng=False, exact_fused=True))
    cs = sp_rng.init_state()

    a, sa = sp_rng.solve(params, cp_ := CostParams(), cm, START, cs)
    b, sb = sp.solve(params, cp_, cm, START, cs)
    assert np.isfinite(np.asarray(a.U)).all()
    assert np.abs(np.asarray(a.U) - np.asarray(b.U)).max() < 0.15
    assert 0.2 < float(sa.ess) / float(sb.ess) < 5.0


def test_kernel_rng_ou_stream_statistics():
    """In-kernel OU exploration (round 5): extract one rollout's raw
    stream through pass 2 — with U=0, pure_noise_frac=0 (every rollout
    pure-noise) and a one-hot weight vector, the weighted numerator IS
    the pre-clamp control, i.e. nu * x_t — and pin the AR(1) signature:
    lag-1 autocorrelation ≈ 1-theta for OU, ≈ 0 for gaussian, unit
    stationary variance for both.  Validates the recursion AND that
    pass 2 replays pass 1's draw order."""
    from autorally_tpu.ops.rollout_kernel import (fused_rng_costs,
                                                  fused_rng_numer)

    theta = 0.3
    T, K = 256, 128
    data, xb, yb = oval_track(ppm=4.0)
    cm = make_costmap(data, xb, yb)

    def stream(sampler, param):
        cfg = MPPIConfig(num_rollouts=K, num_timesteps=T, kernel_rng=True,
                         use_pallas_rollout=True, pure_noise_frac=0.0,
                         noise_sampler=sampler, noise_param=param)
        model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
        params = model.load_params(NN_NPZ)
        U = jnp.zeros((T, 2), jnp.float32)
        _, _, ctx = fused_rng_costs(
            model, params, cfg, CostParams(), cm,
            jnp.asarray(START), U, jax.random.PRNGKey(7))
        w = jnp.zeros((K,), jnp.float32).at[5].set(1.0)
        numer = np.asarray(fused_rng_numer(ctx, w))          # (2, T)
        nu = np.asarray(cfg.exploration_std)
        # t=0 is frozen by optimization_stride (du=0, U=0): skip it
        return numer[0, 1:] / nu[0]

    def rho1(x):
        x = x - x.mean()
        return float((x[1:] * x[:-1]).mean() / (x * x).mean())

    x_ou = stream("ou", theta)
    x_g = stream("gaussian", 1.0)
    assert abs(rho1(x_ou) - (1.0 - theta)) < 0.2, rho1(x_ou)
    assert abs(rho1(x_g)) < 0.25, rho1(x_g)
    assert 0.5 < float((x_ou ** 2).mean()) < 1.8
    assert 0.5 < float((x_g ** 2).mean()) < 1.8


def test_kernel_rng_ou_solve_on_tpu():
    """OU exploration through the nothing-in-HBM mode: full solve at the
    reference K on the exact costmap — deterministic for a fixed key,
    decision-level agreement with the host-noise OU path (different,
    equally valid streams)."""
    cfg = MPPIConfig(num_rollouts=1920, num_timesteps=100, kernel_rng=True,
                     noise_sampler="ou", noise_param=0.15)
    data, xb, yb = oval_track(ppm=4.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    sp_rng = MPPISolver(model, MPPICost(), cfg)
    assert sp_rng._use_kernel_rng(cm)
    sp_host = MPPISolver(model, MPPICost(), cfg.replace(kernel_rng=False))
    cp = CostParams()
    cs = sp_rng.init_state()

    a, sa = sp_rng.solve(params, cp, cm, START, cs)
    b, sb = sp_host.solve(params, cp, cm, START, cs)
    assert np.isfinite(np.asarray(a.U)).all()
    # looser decision-level band than the gaussian twin above: OU at
    # this config concentrates the softmax to ESS ~7-12 of 1920
    # (measured), so two equally-valid streams pick different near-best
    # rollouts; the precise stream check is
    # test_kernel_rng_ou_stream_statistics
    assert np.abs(np.asarray(a.U) - np.asarray(b.U)).max() < 0.4
    assert 0.2 < float(sa.ess) / float(sb.ess) < 5.0
    assert abs(float(sa.crash_frac) - float(sb.crash_frac)) < 0.05

    a2, _ = sp_rng.solve(params, cp, cm, START, cs)
    np.testing.assert_array_equal(np.asarray(a.U), np.asarray(a2.U))


def test_obstacles_fused_on_tpu():
    """ObstacleCost through the real exact-costmap kernel: crash sets and
    decision-level controls must match the scan path, and a live
    CostParams.obstacles move must take effect without retracing."""
    from autorally_tpu.costs.obstacles import ObstacleCost, make_obstacles

    cfg = MPPIConfig(num_rollouts=1920, num_timesteps=100,
                     use_pallas_rollout=True, exact_fused=True)
    data, xb, yb = oval_track(ppm=4.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    # circles inside the first 2 s of travel from START (25, 0) heading +y
    cost = ObstacleCost(make_obstacles([[25.0, 2.0, 0.4], [24.6, 1.0, 0.3]],
                                       capacity=8),
                        obstacle_coeff=250.0, inflation=1.5)
    sp = MPPISolver(model, cost, cfg)
    ss = MPPISolver(model, cost, cfg.replace(use_pallas_rollout=False))
    cp = CostParams()
    eps = jax.random.normal(jax.random.PRNGKey(12), (100, 1920, 2),
                            dtype=jnp.float32)
    U = sp.init_state().U
    tot_p, _, crash_p = jax.jit(
        lambda e: sp.rollout_costs(params, cp, cm, START, U, e))(eps)
    tot_s, _, crash_s = jax.jit(
        lambda e: ss.rollout_costs(params, cp, cm, START, U, e))(eps)
    assert int(np.asarray(crash_s).sum()) > 0
    assert (np.asarray(crash_p) == np.asarray(crash_s)).mean() > 0.999
    ok = np.isclose(np.asarray(tot_p), np.asarray(tot_s),
                    rtol=2e-4, atol=1e-3)
    assert ok.mean() > 0.999

    # live move through the traced CostParams: same jitted solve object
    cs = sp.init_state()
    _, s_near = sp.solve(params, cp, cm, START, cs)
    moved = cp.replace(obstacles=make_obstacles([[100.0, 100.0, 0.4]],
                                                capacity=8))
    _, s_far = sp.solve(params, moved, cm, START, cs)
    assert float(s_far.crash_frac) <= float(s_near.crash_frac)


def test_gamma_override_on_tpu_paths():
    """The traced CostParams.gamma override must reproduce a statically
    configured gamma bit-exactly on both hardware hot paths at operating
    scale: the exact-fused (host-noise) kernel and the kernel-RNG
    nothing-in-HBM mode."""
    g = 0.45
    # exact-fused iterate with injected noise: same total costs, so the
    # override and the static config must agree exactly
    sp, params, cp, cm, cfg = build(pallas=True, exact_fused=True)
    sp_static = MPPISolver(sp.model, sp.cost, cfg.replace(gamma=g))
    eps = jax.random.normal(jax.random.PRNGKey(5), (100, 1920, 2),
                            dtype=jnp.float32)
    U = sp.init_state().U
    U_hot, st_hot = jax.jit(
        lambda e: sp.iterate(params, cp.replace(gamma=g), cm, START, U, e)
    )(eps)
    U_sta, st_sta = jax.jit(
        lambda e: sp_static.iterate(params, cp, cm, START, U, e))(eps)
    np.testing.assert_array_equal(np.asarray(U_hot), np.asarray(U_sta))
    np.testing.assert_array_equal(np.asarray(st_hot.ess),
                                  np.asarray(st_sta.ess))
    # and it changed the answer vs the default temperature
    U_def, st_def = jax.jit(
        lambda e: sp.iterate(params, cp, cm, START, U, e))(eps)
    assert float(st_hot.ess) < float(st_def.ess)

    # kernel-RNG mode: same key -> same in-kernel noise, so override vs
    # static must again match exactly
    cfg_rng = MPPIConfig(num_rollouts=1920, num_timesteps=100,
                         kernel_rng=True)
    sp_rng = MPPISolver(sp.model, sp.cost, cfg_rng)
    sp_rng_sta = MPPISolver(sp.model, sp.cost, cfg_rng.replace(gamma=g))
    assert sp_rng._use_kernel_rng(cm) and sp_rng_sta._use_kernel_rng(cm)
    cs = sp_rng.init_state()
    a, sa = sp_rng.solve(params, cp.replace(gamma=g), cm, START, cs)
    b, sb = sp_rng_sta.solve(params, cp, cm, START, cs)
    np.testing.assert_array_equal(np.asarray(a.U), np.asarray(b.U))
    np.testing.assert_array_equal(np.asarray(sa.ess), np.asarray(sb.ess))


def test_ensemble_fused_solver_on_tpu():
    """EnsembleMPPISolver (per-member fused exact-costmap kernels) vs the
    EnsembleDynamics vmap/scan path, 8 members at operating scale: the
    launcher-level member split must preserve the block semantics on the
    real kernels (BASELINE config #5's single-chip row)."""
    from autorally_tpu.models import EnsembleDynamics
    from autorally_tpu.models.ensemble import stack_params
    from autorally_tpu.solver import EnsembleMPPISolver

    M, K, T = 8, 2048, 32
    cfg = MPPIConfig(num_rollouts=K, num_timesteps=T, exact_fused=True)
    data, xb, yb = oval_track(ppm=4.0)
    cm = make_costmap(data, xb, yb)
    base = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    p0 = base.load_params(NN_NPZ)
    rng = np.random.RandomState(11)
    members = [{
        "weights": [W + (0.0 if m == 0 else 0.1) * jnp.asarray(
            rng.randn(*W.shape).astype(np.float32)) for W in p0["weights"]],
        "biases": [b + (0.0 if m == 0 else 0.1) * jnp.asarray(
            rng.randn(*b.shape).astype(np.float32)) for b in p0["biases"]],
        "control_rngs": p0["control_rngs"],
    } for m in range(M)]
    stacked = stack_params(members)

    fused = EnsembleMPPISolver(base, MPPICost(), cfg, num_members=M)
    assert fused.use_pallas_rollout, "fused member path not engaged on TPU"
    scan_cfg = cfg.replace(use_pallas_rollout=False)
    ref = MPPISolver(EnsembleDynamics(base, M), MPPICost(), scan_cfg)

    eps = jax.random.normal(jax.random.PRNGKey(9), (T, K, 2),
                            dtype=jnp.float32)
    U = fused.init_state().U
    t_f, _, c_f = jax.jit(
        lambda e: fused.rollout_costs(stacked, CostParams(), cm, START,
                                      U, e))(eps)
    t_r, _, c_r = jax.jit(
        lambda e: ref.rollout_costs(stacked, CostParams(), cm, START,
                                    U, e))(eps)
    assert (np.asarray(c_f) == np.asarray(c_r)).mean() > 0.999
    np.testing.assert_allclose(np.asarray(t_f), np.asarray(t_r),
                               rtol=2e-4, atol=1e-3)
    U_f, st_f = jax.jit(
        lambda e: fused.iterate(stacked, CostParams(), cm, START, U, e))(eps)
    U_r, st_r = jax.jit(
        lambda e: ref.iterate(stacked, CostParams(), cm, START, U, e))(eps)
    np.testing.assert_allclose(np.asarray(U_f), np.asarray(U_r),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(float(st_f.ess), float(st_r.ess), rtol=1e-3)


def test_colored_noise_solve_on_tpu():
    """Colored/OU noise through the HARDWARE hot path (BASELINE config
    #4's sampling half): the host-sampled correlated noise feeds the
    fused exact-costmap chain kernel — rollout_costs takes eps
    explicitly, so the kernel is sampler-agnostic — and the fused path
    must match the scan path under the same draws.  The kernel-RNG
    (nothing-in-HBM) mode stays gaussian-only by design: the in-kernel
    Mosaic PRNG generates white draws; a horizon-correlated spectrum
    needs the whole (T,) axis at once, which is exactly the host-noise
    path (the fallback's cost is quantified in EVAL.md)."""
    from autorally_tpu.ops.sampling import colored_noise, ou_noise

    sp, params, cp, cm, cfg = build(pallas=True, exact_fused=True)
    ss, *_ = build(pallas=False)
    for sampler, kwargs in ((colored_noise, {"beta": 1.0}),
                            (ou_noise, {"theta": 0.15})):
        eps = sampler(jax.random.PRNGKey(21), (100, 1920, 2), **kwargs)
        U = sp.init_state().U
        Up, stp = jax.jit(
            lambda e: sp.iterate(params, cp, cm, START, U, e))(eps)
        Us, sts = jax.jit(
            lambda e: ss.iterate(params, cp, cm, START, U, e))(eps)
        np.testing.assert_allclose(np.asarray(Up), np.asarray(Us),
                                   rtol=2e-4, atol=1e-4)
        np.testing.assert_allclose(float(stp.ess), float(sts.ess),
                                   rtol=1e-3)

    # full jitted solve with the sampler wired through the config: the
    # fused kernels stay engaged and the solve is finite + reproducible
    cfg_c = MPPIConfig(num_rollouts=1920, num_timesteps=100,
                       exact_fused=True, noise_sampler="colored",
                       noise_param=1.0)
    sc = MPPISolver(sp.model, sp.cost, cfg_c)
    assert sc.use_pallas_rollout
    assert not sc._use_kernel_rng(cm)        # gaussian-only gate holds
    cs = sc.init_state()
    cs_a, st_a = sc.solve(params, cp, cm, START, cs)
    cs_b, st_b = sc.solve(params, cp, cm, START, cs)
    assert np.isfinite(np.asarray(cs_a.U)).all()
    np.testing.assert_array_equal(np.asarray(cs_a.U), np.asarray(cs_b.U))
    assert float(st_a.ess) > 1.0
