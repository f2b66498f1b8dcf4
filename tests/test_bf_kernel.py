"""Parity tests for the basis-function (GeneralizedLinear) Pallas path.

The reference ships TWO model families behind the same rollout kernel:
the tanh MLP (``path_integral_nn``) and the 25-basis-function
generalized-linear model (``path_integral_bf``, K=2560 —
``path_integral_main.cu:71-74``).  Round 2 extends the fused Pallas
kernels to the BF family through the ``Dynamics.KERNEL_KIND`` hook; these
tests pin the in-kernel evaluation (``_bf_deriv``: lane-batched
``car_bfs.cuh:44-121`` with polynomial atan and sin/cos tan) against the
scan path's ``car_basis_functions`` (exact XLA transcendentals).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autorally_tpu.config import CostParams, MPPIConfig
from autorally_tpu.costs import MPPICost
from autorally_tpu.costs.costmap import make_costmap
from autorally_tpu.models import BasisFunctionDynamics
from autorally_tpu.ops import rollout_kernel as rk
from autorally_tpu.solver.mppi import MPPISolver
from autorally_tpu.tools.track_generator import oval_track

BF_NPZ = ("/root/reference/autorally_control/src/path_integral/params/"
          "models/basis_function_09_12_2018.npz")

K, T = 256, 24


def _setup():
    cfg = MPPIConfig(num_rollouts=K, num_timesteps=T, hz=50)
    data, xb, yb = oval_track(ppm=2.0)
    cm = make_costmap(data, xb, yb)
    model = BasisFunctionDynamics(cfg.dt)
    params = model.load_params(BF_NPZ)
    cost = MPPICost()
    solver = MPPISolver(model, cost, cfg)
    cp = CostParams()
    state = jnp.asarray([25.0, 0.0, np.pi / 2, 0.0, 3.0, 0.1, 0.05],
                        dtype=jnp.float32)
    U = jnp.tile(jnp.asarray([0.05, 0.3], jnp.float32), (T, 1))
    eps = jax.random.normal(jax.random.PRNGKey(11), (T, K, 2),
                            dtype=jnp.float32)
    return cfg, cm, model, params, cost, solver, cp, state, U, eps


def test_bf_kernel_hooks():
    model = BasisFunctionDynamics(0.02)
    params = model.load_params(BF_NPZ)
    assert model.KERNEL_KIND == "bf"
    assert model.kernel_spec() == (25, 4)
    (theta_t,) = model.kernel_weights(params)
    assert theta_t.shape == (4, 25)


def test_bf_chain_kernel_matches_scan():
    """dynamics_chain_pallas (interpret) vs the lax.scan dynamics chain:
    same trajectories, same pre-clamp perturbed controls."""
    cfg, cm, model, params, cost, solver, cp, state, U, eps = _setup()
    states, useq = rk.dynamics_chain_pallas(
        model, params, cfg, state, U, eps, interpret=True)

    # scan-path reference trajectories (the rollout_costs phase-1 loop)
    ref_total, ref_useq, _ = solver.rollout_costs(
        params, cp, cm, state, U, eps)
    np.testing.assert_allclose(
        np.asarray(useq).transpose(1, 2, 0), np.asarray(ref_useq),
        rtol=1e-6, atol=1e-6)

    # full-state check: re-run the scan chain explicitly
    s = jnp.broadcast_to(state, (K, model.STATE_DIM)).astype(jnp.float32)
    traj = []
    zero_rollout = jnp.arange(K) == 0
    pure_noise = jnp.arange(K) >= cfg.pure_noise_frac * cfg.num_rollouts
    nu = jnp.asarray(cfg.exploration_std, jnp.float32)
    for t in range(T):
        du_t = eps[t] * nu
        frozen = zero_rollout | (t < cfg.optimization_stride)
        u = jnp.where(frozen[:, None], U[t],
                      jnp.where(pure_noise[:, None], du_t, U[t] + du_t))
        u_cl = model.enforce_constraints(params, u)
        s = s + model.state_deriv(params, s, u_cl) * model.dt
        traj.append(s)
    ref_states = jnp.stack(traj)                      # (T, K, S)
    got = np.asarray(states)[:model.STATE_DIM].transpose(1, 2, 0)
    # atan/tan approximations bound the drift (~1e-7 per step in the
    # slip-angle basis terms, integrated over T steps)
    np.testing.assert_allclose(got, np.asarray(ref_states),
                               rtol=5e-4, atol=5e-4)


def test_bf_exact_fused_matches_scan():
    """The fused exact-costmap kernel with the BF model vs the scan path:
    costs within transcendental tolerance, identical crash sets."""
    cfg, cm, model, params, cost, solver, cp, state, U, eps = _setup()
    ref_total, ref_useq, ref_crash = solver.rollout_costs(
        params, cp, cm, state, U, eps)
    total, useq, crash = rk.fused_exact_rollout_cost_pallas(
        model, params, cfg, cp, cm, state, U, eps,
        l1_cost=cost.l1_cost, interpret=True)
    np.testing.assert_allclose(np.asarray(total), np.asarray(ref_total),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_array_equal(np.asarray(crash), np.asarray(ref_crash))
    np.testing.assert_allclose(
        np.asarray(useq).transpose(1, 2, 0), np.asarray(ref_useq),
        rtol=1e-6, atol=1e-6)


def test_bf_solver_dispatch_pallas_on():
    """With use_pallas_rollout forced on (interpret), the BF solver's full
    solve runs the fused path and stays close to the scan-path solve."""
    cfg, cm, model, params, cost, _, cp, state, U, eps = _setup()
    cfg_p = cfg.replace(use_pallas_rollout=True)
    solver_p = MPPISolver(model, MPPICost(), cfg_p)
    solver_p._pallas_interpret = True
    assert solver_p.use_pallas_rollout

    solver_s = MPPISolver(model, MPPICost(), cfg)
    assert not solver_s.use_pallas_rollout   # cpu backend

    cs_p, stats_p = solver_p.solve(params, cp, cm, state,
                                   solver_p.init_state())
    cs_s, stats_s = solver_s.solve(params, cp, cm, state,
                                   solver_s.init_state())
    np.testing.assert_allclose(np.asarray(cs_p.U), np.asarray(cs_s.U),
                               rtol=5e-4, atol=5e-4)
    assert float(stats_p.ess) == pytest.approx(float(stats_s.ess),
                                               rel=1e-3)


def test_kernel_rng_dispatch_gates():
    """kernel-RNG dispatch: any model with an in-kernel form qualifies
    (BF included); a model without one never does; the exact costmap
    qualifies when it fits the VMEM budget (round-2 exact capacity mode)."""
    from autorally_tpu.costs.neural_costmap import NeuralCostmap
    from autorally_tpu.models.base import Dynamics

    cfg, cm, model, params, cost, _, cp, state, U, eps = _setup()
    cfg_r = cfg.replace(kernel_rng=True, use_pallas_rollout=True)
    solver = MPPISolver(model, MPPICost(), cfg_r)

    class _FakeField(NeuralCostmap):
        def __init__(self):
            pass

    assert solver._use_kernel_rng(_FakeField())       # BF + neural field
    assert solver._use_kernel_rng(cm)                 # BF + exact costmap

    class _NoKernelModel(Dynamics):
        pass

    bare = MPPISolver(_NoKernelModel(cfg.dt), MPPICost(), cfg_r)
    assert not bare._use_kernel_rng(_FakeField())

    # oversized map: exact mode must refuse and fall back
    import autorally_tpu.ops.rollout_kernel as rk_mod
    budget = rk_mod.EXACT_VMEM_BUDGET
    try:
        rk_mod.EXACT_VMEM_BUDGET = 16
        assert not solver._use_kernel_rng(cm)
    finally:
        rk_mod.EXACT_VMEM_BUDGET = budget

    # noise samplers: OU streams in-kernel (AR(1) carry, round 5) for
    # theta in (0, 2) — incl. theta=1, which degenerates to white —
    # while out-of-domain thetas and the DFT-shaped colored sampler
    # (cannot stream) stay on the host-noise path
    ou = MPPISolver(model, MPPICost(),
                    cfg_r.replace(noise_sampler="ou", noise_param=0.15))
    assert ou._use_kernel_rng(cm)
    ou_white = MPPISolver(model, MPPICost(),
                          cfg_r.replace(noise_sampler="ou",
                                        noise_param=1.0))
    assert ou_white._use_kernel_rng(cm)
    ou_bad = MPPISolver(model, MPPICost(),
                        cfg_r.replace(noise_sampler="ou",
                                      noise_param=2.5))
    assert not ou_bad._use_kernel_rng(cm)
    colored = MPPISolver(model, MPPICost(),
                         cfg_r.replace(noise_sampler="colored"))
    assert not colored._use_kernel_rng(cm)
