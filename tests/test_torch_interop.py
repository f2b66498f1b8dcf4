"""Torch interchange tests, including the reference's shipped .pt model."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from autorally_tpu.ml.torch_interop import (load_torch_checkpoint,
                                            params_to_torch,
                                            setup_torch_model,
                                            torch_to_params)
from autorally_tpu.models import NeuralNetDynamics

PT = ("/root/reference/autorally_control/src/path_integral/params/models/"
      "torch_model_autorally_nnet.pt")
NPZ = ("/root/reference/autorally_control/src/path_integral/params/models/"
       "autorally_nnet_09_12_2018.npz")


def test_roundtrip_torch_jax_torch(rng):
    model = NeuralNetDynamics(0.02)
    module = setup_torch_model(model.layers)
    params = torch_to_params(module, model)
    module2 = params_to_torch(params, model)

    x = rng.randn(16, 6)
    with torch.no_grad():
        y1 = module(torch.from_numpy(x).double()).numpy()
        y2 = module2(torch.from_numpy(x).double()).numpy()
    np.testing.assert_allclose(y1, y2, rtol=1e-6, atol=1e-7)

    # jax forward agrees with torch forward
    states = np.zeros((16, 7), dtype=np.float32)
    states[:, 3:7] = x[:, :4]
    controls = x[:, 4:6].astype(np.float32)
    yj = np.asarray(model.dynamics(params, jnp.asarray(states),
                                   jnp.asarray(controls)))
    np.testing.assert_allclose(yj, y1, rtol=1e-4, atol=1e-5)


def test_load_reference_pt_checkpoint_matches_npz():
    """The reference ships the same weights as .pt and .npz
    (params/models/README.md) — both loads must agree."""
    model = NeuralNetDynamics(0.02)
    try:
        p_pt = load_torch_checkpoint(PT, model)
    except Exception as e:  # pragma: no cover - format drift in ref asset
        pytest.skip(f"reference .pt unloadable: {e}")
    p_npz = model.load_params(NPZ)
    for W1, W2 in zip(p_pt["weights"], p_npz["weights"]):
        np.testing.assert_allclose(np.asarray(W1), np.asarray(W2),
                                   rtol=1e-5, atol=1e-6)


def test_reference_pt_drives_solver_identically_to_npz():
    """End-to-end migration proof: the reference's torch checkpoint,
    loaded through torch_interop, must produce the SAME solver output as
    its npz twin (same key, bit-comparable float32 path)."""
    from autorally_tpu.config import CostParams, MPPIConfig
    from autorally_tpu.costs import MPPICost
    from autorally_tpu.costs.costmap import make_costmap
    from autorally_tpu.solver.mppi import MPPISolver
    from autorally_tpu.tools.track_generator import oval_track

    cfg = MPPIConfig(num_rollouts=256, num_timesteps=16)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    try:
        p_pt = load_torch_checkpoint(PT, model)
    except Exception as e:  # pragma: no cover - format drift in ref asset
        pytest.skip(f"reference .pt unloadable: {e}")
    p_npz = model.load_params(NPZ)
    # carry the npz params' control_rngs (configuration, not weights)
    p_pt = {**p_pt, "control_rngs": p_npz["control_rngs"]}

    data, xb, yb = oval_track(ppm=2.0)
    cm = make_costmap(data, xb, yb)
    solver = MPPISolver(model, MPPICost(), cfg)
    start = np.array([0.0, -15.0, 0.0, 0.0, 2.0, 0.0, 0.0], np.float32)
    cp = CostParams(desired_speed=4.0)
    cs1, st1 = solver.solve(p_pt, cp, cm, start, solver.init_state())
    cs2, st2 = solver.solve(p_npz, cp, cm, start, solver.init_state())
    np.testing.assert_allclose(np.asarray(cs1.U), np.asarray(cs2.U),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(st1.baseline), float(st2.baseline),
                               rtol=1e-5)
