"""Live softmax-temperature (gamma) override + ESS-targeted tuner.

The reference fixes the MPPI temperature at launch time
(``launch/path_integral_nn.launch``: gamma) and its dynamic_reconfigure
surface (``cfg/PathIntegralParams.cfg:12-21``) cannot touch it.  Here
gamma rides the traced ``CostParams`` pytree (``config.effective_gamma``)
so live temperature tuning is zero-recompile, and
:class:`~autorally_tpu.runtime.ess_tuner.EssTuner` closes the loop on the
measured effective sample size.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autorally_tpu.config import CostParams, MPPIConfig, effective_gamma
from autorally_tpu.costs import MPPICost
from autorally_tpu.costs.costmap import make_costmap
from autorally_tpu.models import NeuralNetDynamics
from autorally_tpu.parallel import ShardedMPPISolver, rollout_mesh
from autorally_tpu.runtime.ess_tuner import EssTuner
from autorally_tpu.solver.mppi import MPPISolver
from autorally_tpu.tools.track_generator import oval_track

NN_NPZ = ("/root/reference/autorally_control/src/path_integral/params/"
          "models/autorally_nnet_09_12_2018.npz")

K, T = 128, 16
START = np.array([0.0, -15.0, 0.0, 0.0, 2.0, 0.0, 0.0], dtype=np.float32)


def build(gamma=0.15):
    cfg = MPPIConfig(num_rollouts=K, num_timesteps=T, gamma=gamma)
    data, xb, yb = oval_track(ppm=2.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    solver = MPPISolver(model, MPPICost(), cfg)
    return solver, params, cm, cfg


# ----------------------------------------------------------------------
# traced gamma override
# ----------------------------------------------------------------------

def test_effective_gamma_helper():
    cfg = MPPIConfig(gamma=0.15)
    assert effective_gamma(cfg, CostParams()) == 0.15
    assert float(effective_gamma(cfg, CostParams(gamma=0.4))) == 0.4


def test_gamma_override_matches_static(rng):
    """CostParams.gamma=g must reproduce a solver statically configured
    with cfg.gamma=g exactly (same injected noise)."""
    s_base, params, cm, _ = build(gamma=0.15)
    s_hot, *_ = build(gamma=0.15)
    s_static, *_ = build(gamma=0.4)

    U0 = jnp.asarray(rng.uniform(-0.2, 0.2, (T, 2)).astype(np.float32))
    eps = jnp.asarray(rng.randn(T, K, 2).astype(np.float32))
    st = jnp.asarray(START)

    U_hot, stats_hot = s_hot.iterate(params, CostParams(gamma=0.4), cm,
                                     st, U0, eps)
    U_static, stats_static = s_static.iterate(params, CostParams(), cm,
                                              st, U0, eps)
    U_base, stats_base = s_base.iterate(params, CostParams(), cm,
                                        st, U0, eps)

    np.testing.assert_array_equal(np.asarray(U_hot), np.asarray(U_static))
    np.testing.assert_array_equal(np.asarray(stats_hot.ess),
                                  np.asarray(stats_static.ess))
    # and the override genuinely changed the answer vs gamma=0.15
    assert not np.array_equal(np.asarray(U_hot), np.asarray(U_base))
    # higher temperature coefficient -> peakier weights -> lower ESS
    assert float(stats_hot.ess) < float(stats_base.ess)


def test_gamma_override_no_retrace():
    """Updating the gamma scalar through CostParams must not retrace the
    jitted solve (the zero-recompile live-tuning contract)."""
    from autorally_tpu.runtime.profiling import count_solve_traces

    solver, params, cm, _ = build()
    traces = count_solve_traces(solver)
    cs = solver.init_state()
    st = jnp.asarray(START)
    cs, s0 = solver.solve(params, CostParams(gamma=jnp.float32(0.15)),
                          cm, st, cs)
    cs, s1 = solver.solve(params, CostParams(gamma=jnp.float32(0.60)),
                          cm, st, cs)
    assert traces["n"] == 1, "gamma update retraced the solve"
    assert np.isfinite(float(s1.ess))


def test_sharded_gamma_override_matches_static():
    """The sharded solve's global softmax honors the traced override:
    identical to a shard-solver statically configured at that gamma
    (same init key -> same per-shard noise)."""
    cfg = MPPIConfig(num_rollouts=256, num_timesteps=T)
    data, xb, yb = oval_track(ppm=2.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    mesh = rollout_mesh(jax.devices())

    hot = ShardedMPPISolver(model, MPPICost(), cfg, mesh=mesh)
    static = ShardedMPPISolver(model, MPPICost(),
                               cfg.replace(gamma=0.45), mesh=mesh)
    st = jnp.asarray(START)
    cs_h, st_h = hot.solve(params, CostParams(gamma=0.45), cm, st,
                           hot.init_state())
    cs_s, st_s = static.solve(params, CostParams(), cm, st,
                              static.init_state())
    np.testing.assert_array_equal(np.asarray(cs_h.U), np.asarray(cs_s.U))
    np.testing.assert_array_equal(np.asarray(st_h.ess),
                                  np.asarray(st_s.ess))


# ----------------------------------------------------------------------
# EssTuner unit behavior
# ----------------------------------------------------------------------

def test_tuner_validates_target_frac():
    cfg = MPPIConfig(num_rollouts=K)
    with pytest.raises(ValueError):
        EssTuner(cfg, target_frac=0.0)
    with pytest.raises(ValueError):
        EssTuner(cfg, target_frac=1.5)


def test_tuner_direction_and_reset():
    cfg = MPPIConfig(num_rollouts=K, gamma=0.15)
    tuner = EssTuner(cfg, target_frac=0.25)     # target ESS = 32
    g_low = tuner.update(4.0)                   # ESS far below target
    assert g_low < cfg.gamma                    # flatten the weights
    tuner.reset()
    assert tuner.gamma == cfg.gamma
    g_high = tuner.update(120.0)                # ESS far above target
    assert g_high > cfg.gamma                   # sharpen the weights


def test_tuner_clamps_at_headroom():
    cfg = MPPIConfig(num_rollouts=K, gamma=0.15)
    tuner = EssTuner(cfg, target_frac=0.25, headroom=4.0)
    for _ in range(200):
        g = tuner.update(1.0)                   # ESS pinned at the floor
    assert g == pytest.approx(0.15 / 4.0)
    tuner.reset()
    for _ in range(200):
        g = tuner.update(float(K))              # ESS pinned at K
    assert g == pytest.approx(0.15 * 4.0)


def test_tuner_nan_ess_does_not_latch():
    """A transient NaN solve (NaN ESS) must leave gamma unchanged —
    not poison every subsequent solve."""
    cfg = MPPIConfig(num_rollouts=K, gamma=0.15)
    tuner = EssTuner(cfg, target_frac=0.25)
    g0 = tuner.update(40.0)
    assert tuner.update(float("nan")) == g0
    assert tuner.update(float("inf")) == g0
    g1 = tuner.update(40.0)              # recovers normally afterwards
    assert np.isfinite(g1) and g1 != g0


def test_traced_law_matches_host_tuner():
    """gamma_step_traced (the episode runner's on-device law) must match
    EssTuner.update step-for-step — the two implementations are kept in
    lockstep by this test (the host side stays pure-Python floats so a
    control tick never dispatches a device program)."""
    from autorally_tpu.runtime.ess_tuner import gamma_step_traced

    cfg = MPPIConfig(num_rollouts=K, gamma=0.15)
    for ess in (0.0, 1.0, 4.0, 31.9, 32.0, 120.0, float(K), 1e9,
                float("nan"), float("inf")):
        for g_start in (0.15, 0.02, 1.19):
            host = EssTuner(cfg, target_frac=0.25)
            host.gamma = g_start
            g_host = host.update(ess)
            g_dev = float(gamma_step_traced(
                jnp.float32(g_start), jnp.float32(ess), host.target,
                host.alpha, host.lo, host.hi))
            assert g_dev == pytest.approx(g_host, rel=1e-5), (
                f"law divergence at ess={ess}, gamma={g_start}")


def test_seed_avoids_structure_retrace():
    """tuner.seed() pre-sets gamma as a scalar leaf so the first live
    update does NOT flip the CostParams pytree structure: exactly one
    trace across warmup + tuned updates."""
    from autorally_tpu.runtime.profiling import count_solve_traces

    solver, params, cm, cfg = build()
    tuner = EssTuner(cfg, target_frac=0.25)
    traces = count_solve_traces(solver)
    cp = tuner.seed(CostParams())
    cs = solver.init_state()
    st = jnp.asarray(START)
    cs, s0 = solver.solve(params, cp, cm, st, cs)          # warmup
    for _ in range(3):
        cp = cp.replace(gamma=jnp.float32(tuner.update(float(s0.ess))))
        cs, s0 = solver.solve(params, cp, cm, st, cs)
    assert traces["n"] == 1, "seeded tuner still retraced the solve"


def test_attach_drives_control_loop():
    """tuner.attach() wired into run_control_loop: gamma lands on BOTH
    controllers' cost params each tick and the car still drives."""
    import math

    from autorally_tpu.runtime.control_loop import (ControlLoopConfig,
                                                    run_control_loop)
    from autorally_tpu.runtime.controller import Controller
    from autorally_tpu.runtime.plant import SyntheticPlant

    cfg = MPPIConfig(num_rollouts=128, num_timesteps=24, hz=50)
    data, xb, yb = oval_track(half_length=30.0, half_width=18.0,
                              track_width=6.0, ppm=4.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    solver = MPPISolver(model, MPPICost(), cfg)
    cp = CostParams(desired_speed=5.0)
    actual = Controller(solver, params, cp, cm)
    predicted = Controller(solver, params, cp, cm, seed=99)

    start = np.array([30.0, 0.0, math.pi / 2, 0, 0, 0, 0], dtype=np.float32)
    plant = SyntheticPlant(model, params, start, cfg.dt, cfg.num_timesteps,
                           use_feedback_gains=False)
    plant.receive_state_vector(0.0, start)

    tuner = EssTuner(cfg, target_frac=0.25)
    lcfg = ControlLoopConfig(hz=cfg.hz, num_timesteps=cfg.num_timesteps,
                             use_feedback_gains=False, max_iter=25)
    run_control_loop(predicted, actual, plant, lcfg,
                     on_tick=tuner.attach(actual, predicted))

    assert actual.cost_params.gamma is not None
    assert float(actual.cost_params.gamma) == pytest.approx(tuner.gamma)
    assert float(predicted.cost_params.gamma) == pytest.approx(tuner.gamma)
    assert tuner.lo <= tuner.gamma <= tuner.hi
    assert plant.true_state[4] > 0.5, "car did not accelerate under tuning"


def test_attach_async_updates_tube():
    """tuner.attach_async() pushes the adapted gamma into the tube's
    traced cost params from the harvested TubeTickOutput.ess."""
    import types

    cfg = MPPIConfig(num_rollouts=K, gamma=0.15)
    tuner = EssTuner(cfg, target_frac=0.25)      # target = 32

    class FakeTube:
        def __init__(self):
            self.cost_params = CostParams()

        def update_cost_params(self, cp):
            self.cost_params = cp

    tube = FakeTube()
    hook = tuner.attach_async(tube)
    out = types.SimpleNamespace(ess=4.0)         # far below target
    hook(1, "actual", None, out, 0.0, 0.0)
    g1 = float(tube.cost_params.gamma)
    assert g1 < cfg.gamma
    hook(2, "actual", None, out, 0.0, 0.0)
    g2 = float(tube.cost_params.gamma)
    assert g2 < g1                               # keeps flattening
    assert g2 == pytest.approx(tuner.gamma)


def test_attach_seeds_unseeded_cost_params():
    """attach()/attach_async() must seed gamma into an unseeded
    CostParams AT ATTACH TIME: the first on-tick update would otherwise
    flip the pytree structure None->scalar and force a recompile of the
    jitted solve mid-drive (round-4 advisor finding)."""
    import types

    cfg = MPPIConfig(num_rollouts=K, gamma=0.15)

    class FakeCtrl:
        def __init__(self):
            self.cost_params = CostParams()          # gamma=None

        def update_cost_params(self, cp):
            self.cost_params = cp

    a, p = FakeCtrl(), FakeCtrl()
    EssTuner(cfg, target_frac=0.25).attach(a, p)     # no tick yet
    assert a.cost_params.gamma is not None
    assert p.cost_params.gamma is not None
    assert float(a.cost_params.gamma) == pytest.approx(cfg.gamma)

    tube = FakeCtrl()
    EssTuner(cfg, target_frac=0.25).attach_async(tube)
    assert tube.cost_params.gamma is not None
    # an already-seeded params object is left alone (same pytree leaf)
    tube2 = FakeCtrl()
    tube2.cost_params = CostParams(gamma=jnp.float32(0.4))
    EssTuner(cfg, target_frac=0.25).attach_async(tube2)
    assert float(tube2.cost_params.gamma) == pytest.approx(0.4)


def test_episode_adaptive_gamma_clamp_centers_on_override():
    """A CostParams.gamma starting override outside the cfg-based band
    must NOT be clipped back into it: the headroom clamp centers on the
    effective starting gamma (round-4 advisor finding)."""
    from autorally_tpu.runtime.episode import EpisodeRunner

    solver, params, cm, cfg = build(gamma=0.15)
    headroom = 2.0
    override = cfg.gamma * 20.0                      # far outside band
    runner = EpisodeRunner(solver, n_ticks=12, ess_target_frac=0.25,
                           ess_headroom=headroom)
    res = runner.run(params, CostParams(gamma=jnp.float32(override)),
                     cm, START)
    g = np.asarray(res.gamma)
    assert g[0] == pytest.approx(override), "first tick ignored override"
    assert (g >= override / headroom - 1e-6).all(), (
        "override was clipped into the cfg-centered band")
    assert (g <= override * headroom + 1e-6).all()


def test_episode_runner_on_device_adaptive_gamma():
    """EpisodeRunner(ess_target_frac=...) carries the EssTuner law inside
    the episode scan: the whole adapt-solve loop runs on-device.  The
    tuned run's ESS must end nearer the target than the fixed-gamma run,
    and gamma telemetry must move and stay clamped."""
    import math

    from autorally_tpu.runtime.episode import EpisodeRunner

    cfg = MPPIConfig(num_rollouts=K, num_timesteps=24)
    data, xb, yb = oval_track(half_length=30.0, half_width=18.0,
                              track_width=6.0, ppm=4.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    solver = MPPISolver(model, MPPICost(), cfg)
    start = np.array([30.0, 0.0, math.pi / 2, 0, 0, 0, 0], dtype=np.float32)
    cp = CostParams(desired_speed=5.0)
    frac, headroom = 0.25, 8.0
    target = frac * K

    tuned = EpisodeRunner(solver, n_ticks=80, ess_target_frac=frac,
                          ess_headroom=headroom)
    fixed = EpisodeRunner(solver, n_ticks=80)
    rt = tuned.run(params, cp, cm, start)
    rf = fixed.run(params, cp, cm, start)

    g = np.asarray(rt.gamma)
    assert g.shape == (80,)
    assert (g >= cfg.gamma / headroom - 1e-6).all()
    assert (g <= cfg.gamma * headroom + 1e-6).all()
    assert not np.allclose(g, cfg.gamma), "gamma never adapted"
    # fixed-run telemetry: constant at the configured temperature
    np.testing.assert_allclose(np.asarray(rf.gamma), cfg.gamma)

    err = lambda e: abs(np.log(max(float(e), 1.0) / target))
    ess_t = float(np.median(np.asarray(rt.ess)[40:]))
    ess_f = float(np.median(np.asarray(rf.ess)[40:]))
    at_clamp = (np.isclose(g[-1], cfg.gamma / headroom)
                or np.isclose(g[-1], cfg.gamma * headroom))
    assert err(ess_t) < max(err(ess_f), 0.3) or at_clamp, (
        f"tuned ESS {ess_t:.1f} no closer to {target} than fixed {ess_f:.1f}")


def test_tuner_closed_loop_converges_on_real_solver(rng):
    """Drive the actual solver's measured ESS into the target band by
    feeding SolveStats.ess back through CostParams.gamma (fixed noise so
    ESS is a deterministic, monotone function of gamma)."""
    solver, params, cm, cfg = build(gamma=0.15)
    tuner = EssTuner(cfg, target_frac=0.25, alpha=0.5)
    U0 = jnp.asarray(rng.uniform(-0.2, 0.2, (T, 2)).astype(np.float32))
    eps = jnp.asarray(rng.randn(T, K, 2).astype(np.float32))
    st = jnp.asarray(START)

    def ess_at(gamma):
        _, stats = solver.iterate(params, CostParams(gamma=jnp.float32(gamma)),
                                  cm, st, U0, eps)
        return float(stats.ess)

    ess0 = ess_at(tuner.gamma)
    gamma = tuner.gamma
    for _ in range(25):
        gamma = tuner.update(ess_at(gamma))
    ess_f = ess_at(gamma)

    err0 = abs(np.log(max(ess0, 1.0) / tuner.target))
    err_f = abs(np.log(max(ess_f, 1.0) / tuner.target))
    at_clamp = gamma in (tuner.lo, tuner.hi)
    assert err_f < 0.25 or (at_clamp and err_f < err0), (
        f"ESS {ess0:.1f} -> {ess_f:.1f} (target {tuner.target:.1f}, "
        f"gamma {gamma:.4f})")
