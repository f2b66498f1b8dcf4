"""Oversized-costmap story (VERDICT round-2 item 8).

When the (padded) costmap exceeds the in-kernel VMEM budget
(``exact_map_fits`` false — e.g. a survey-resolution map of a full-size
track), the solver falls back to the dynamics-chain Pallas kernel plus a
batched XLA-gather cost epilogue.  These tests pin that path's
correctness: a 4x nearest-neighbor-upsampled map has IDENTICAL
point-sample semantics (``costs.cu:128-154`` texture point filtering),
so the oversized fallback must reproduce the fused in-kernel gather's
output on the same queries.
"""

import numpy as np
import pytest

import jax

from autorally_tpu.config import CostParams, MPPIConfig
from autorally_tpu.costs import MPPICost
from autorally_tpu.costs.costmap import make_costmap
from autorally_tpu.models import NeuralNetDynamics
from autorally_tpu.solver.mppi import MPPISolver
from autorally_tpu.tools.track_generator import oval_track

NN_NPZ = ("/root/reference/autorally_control/src/path_integral/params/"
          "models/autorally_nnet_09_12_2018.npz")
START = np.array([0.0, -15.0, 0.0, 0.0, 3.0, 0.0, 0.0], dtype=np.float32)


def _build(upsample: int = 1):
    cfg = MPPIConfig(num_rollouts=256, num_timesteps=24)
    data, xb, yb = oval_track(ppm=4.0)
    if upsample > 1:
        # nearest-neighbor upsample: each pixel becomes an n x n block —
        # identical lookup values at identical world coordinates, but a
        # map n^2 times larger
        data = np.repeat(np.repeat(data, upsample, axis=0),
                         upsample, axis=1)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    solver = MPPISolver(model, MPPICost(), cfg)
    return solver, params, CostParams(desired_speed=4.0), cm, cfg


def test_upsampled_map_exceeds_vmem_budget():
    from autorally_tpu.ops.rollout_kernel import exact_map_fits

    _, _, _, cm_small, _ = _build(1)
    _, _, _, cm_big, _ = _build(8)
    assert exact_map_fits(cm_small)
    assert not exact_map_fits(cm_big)


def test_oversized_fallback_matches_fused_semantics():
    """Same world, same noise: the oversized map's epilogue-gather path
    must produce the fused kernel's result (nearest-neighbor upsampling
    preserves every point-sample)."""
    solver_s, params, cp, cm_s, cfg = _build(1)
    solver_b, _, _, cm_b, _ = _build(8)
    from autorally_tpu.ops.rollout_kernel import exact_map_fits

    if exact_map_fits(cm_b):          # pragma: no cover - budget change
        pytest.skip("upsampled map unexpectedly fits VMEM")

    cs_s = solver_s.init_state()
    cs_b = solver_b.init_state()
    cs1, st1 = solver_s.solve(params, cp, cm_s, START, cs_s)
    cs2, st2 = solver_b.solve(params, cp, cm_b, START, cs_b)
    np.testing.assert_allclose(np.asarray(cs1.U), np.asarray(cs2.U),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(st1.baseline), float(st2.baseline),
                               rtol=1e-4)
    np.testing.assert_allclose(float(st1.crash_frac),
                               float(st2.crash_frac), atol=1e-6)


def test_oversized_map_composes_with_kernel_rng_fallback():
    """kernel_rng mode requires the in-kernel map; on an oversized exact
    map the solver must fall back gracefully (not crash, not silently
    mis-sample)."""
    cfg = MPPIConfig(num_rollouts=256, num_timesteps=24, kernel_rng=True)
    data, xb, yb = oval_track(ppm=4.0)
    data = np.repeat(np.repeat(data, 8, axis=0), 8, axis=1)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    solver = MPPISolver(model, MPPICost(), cfg)
    assert not solver._use_kernel_rng(cm)
    cs, stats = solver.solve(params, CostParams(desired_speed=4.0), cm,
                             START, solver.init_state())
    assert np.isfinite(np.asarray(cs.U)).all()
    assert float(stats.ess) > 1.0
