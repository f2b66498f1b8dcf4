"""Golden-trace regression tests.

The reference's determinism hook is its fixed cuRAND seed
(``mppi_controller.cu:330-331``) — same seed, same pose stream, same
controls.  Here a frozen scenario (fixed PRNG key, fixed start state,
synthetic oval) pins the solver's control output; the golden file
detects any silent semantic drift in future changes.  Regenerate with
``python tests/test_regression.py`` after an *intentional* semantic
change.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autorally_tpu.config import CostParams, MPPIConfig
from autorally_tpu.costs import MPPICost
from autorally_tpu.costs.costmap import make_costmap
from autorally_tpu.models import NeuralNetDynamics, BasisFunctionDynamics
from autorally_tpu.solver.mppi import MPPISolver
from autorally_tpu.tools.track_generator import oval_track

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_solve.npz")
NN_NPZ = "/root/reference/autorally_control/src/path_integral/params/models/autorally_nnet_09_12_2018.npz"
MODELS_DIR = "/root/reference/autorally_control/src/path_integral/params/models"
START = np.array([0.0, -15.0, 0.0, 0.0, 2.0, 0.0, 0.0], dtype=np.float32)


def run_scenario():
    cfg = MPPIConfig(num_rollouts=256, num_timesteps=32, seed=1234)
    data, xb, yb = oval_track(ppm=4.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    solver = MPPISolver(model, MPPICost(), cfg)
    cs = solver.init_state()
    for _ in range(3):
        cs = solver.slide(cs, 1)
        cs, stats = solver.solve(params, CostParams(desired_speed=5.0), cm,
                                 START, cs)
    return np.asarray(cs.U), np.asarray(cs.control_solution), stats


def test_golden_trace():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden file not generated yet")
    U, ctrl, _ = run_scenario()
    g = np.load(GOLDEN)
    np.testing.assert_allclose(U, g["U"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ctrl, g["control_solution"],
                               rtol=1e-5, atol=1e-6)


# -- alternate reference model assets ---------------------------------------

def test_wider_deeper_network_loads_and_solves():
    """6-64-64-64-64-4 model (wider_deeper_network_08_20_2020.npz),
    negate_yaw_der=False per params/models/README.md."""
    cfg = MPPIConfig(num_rollouts=64, num_timesteps=16)
    model = NeuralNetDynamics(cfg.dt, layers=(6, 64, 64, 64, 64, 4),
                              control_ranges=cfg.control_ranges,
                              negate_yaw_der=False)
    params = model.load_params(
        os.path.join(MODELS_DIR, "wider_deeper_network_08_20_2020.npz"))
    assert model.num_params > 13000
    data, xb, yb = oval_track(ppm=2.0)
    solver = MPPISolver(model, MPPICost(), cfg)
    cs, stats = solver.solve(params, CostParams(), make_costmap(data, xb, yb),
                             START, solver.init_state())
    assert np.isfinite(np.asarray(cs.U)).all()


@pytest.mark.parametrize("name,negate", [
    ("shallow_network_08_20_2020.npz", False),
    ("gazebo_nnet_09_12_2018.npz", True),
])
def test_other_reference_models_load(name, negate):
    model = NeuralNetDynamics(0.02, negate_yaw_der=negate)
    params = model.load_params(os.path.join(MODELS_DIR, name))
    out = model.state_deriv(params, jnp.zeros(7).at[4].set(3.0),
                            jnp.zeros(2))
    assert np.isfinite(np.asarray(out)).all()


def test_multi_iteration_solve():
    cfg = MPPIConfig(num_rollouts=64, num_timesteps=16, num_iters=3)
    data, xb, yb = oval_track(ppm=2.0)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    solver = MPPISolver(model, MPPICost(), cfg)
    cs, stats = solver.solve(params, CostParams(), make_costmap(data, xb, yb),
                             START, solver.init_state())
    assert np.isfinite(np.asarray(cs.U)).all()
    assert float(stats.normalizer) > 0


if __name__ == "__main__":
    U, ctrl, stats = run_scenario()
    np.savez(GOLDEN, U=U, control_solution=ctrl)
    print(f"wrote {GOLDEN}: U {U.shape}, ess={float(stats.ess):.1f}")
