"""Runtime hot paths on the real device (round-4 verdict item 7).

``tests_tpu/test_tpu_kernels.py`` pins kernel parity; until round 5 the
async loop, the fused episode, and the ESS tuner touched real hardware
only through staged demos, so a regression would surface as a drifted
EVAL number instead of a failing test.  These are short (seconds of
device time; compiles ride the persistent cache) behavioral floors:

- the adaptive-depth async loop must deepen past 1 against the real
  dispatch->ready latency (this rig's tunnel RTT > one 20 ms period)
  and end with non-blocking harvests,
- the fused tube episode must exceed a closed-loop tick-rate floor,
- the on-device ESS tuner must move gamma in the closing direction and
  keep it clamped.
"""

import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autorally_tpu.config import CostParams, MPPIConfig
from autorally_tpu.costs import MPPICost
from autorally_tpu.costs.costmap import make_costmap
from autorally_tpu.models import NeuralNetDynamics
from autorally_tpu.solver.mppi import MPPISolver
from autorally_tpu.tools.track_generator import oval_track

NN_NPZ = ("/root/reference/autorally_control/src/path_integral/params/"
          "models/autorally_nnet_09_12_2018.npz")
START = np.array([25.0, 0.0, 1.57, 0.0, 2.0, 0.0, 0.0], dtype=np.float32)


def _stack(K=1920, T=100):
    cfg = MPPIConfig(num_rollouts=K, num_timesteps=T)
    data, xb, yb = oval_track(ppm=4.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    solver = MPPISolver(model, MPPICost(), cfg)
    return solver, params, CostParams(desired_speed=4.0), cm, cfg


def test_async_adaptive_depth_covers_real_device_latency():
    """Realtime async loop at the reference point against the actual
    chip: with the tunnel's dispatch->ready latency above one control
    period, depth must grow past 1 and the tail harvests must stop
    blocking (run_control_loop.cuh:304-318's pacing role, pipelined)."""
    from autorally_tpu.runtime.async_loop import (AsyncLoopConfig,
                                                  AsyncTubeController,
                                                  run_control_loop_async)
    from autorally_tpu.runtime.plant import BasePlant

    solver, params, cp, cm, cfg = _stack()
    tube = AsyncTubeController(solver, params, cp, cm,
                               use_feedback_gains=False)
    plant = BasePlant(dt=cfg.dt, num_timesteps=cfg.num_timesteps,
                      use_feedback_gains=False)
    plant.receive_state_vector(0.0, START)

    # warmup pass absorbs compile; carry the learned depth forward
    lcfg = AsyncLoopConfig(hz=50, num_timesteps=cfg.num_timesteps,
                           depth=1, realtime=True, adaptive_depth=True,
                           max_depth=6, max_iter=15, carry_learned=True)
    run_control_loop_async(tube, plant, lcfg)
    lcfg.max_iter = 100
    timing = run_control_loop_async(tube, plant, lcfg)

    assert timing.async_depth_final >= 2, (
        f"depth stayed {timing.async_depth_final} against a "
        f">20 ms-latency device")
    tail = list(timing.harvest_samples_ms)[-40:]
    assert np.median(tail) < 10.0, f"harvests still blocking: {tail[:8]}"
    # published solutions stayed fresh enough to drive at 50 Hz
    assert timing.async_depth_final <= 6


def test_asymmetric_tube_on_device():
    """Asymmetric tube budgets on the real chip (round 5): a
    K_a=1920 / K_p=480 tube tick must run as one program and drive a
    lockstep plant with finite solutions.  The timing comparison is a
    coarse sanity bound only (best-of-3 windows, asym <= sym x 1.3):
    each lockstep harvest rides this rig's ~25 ms tunnel RTT, which
    swamps the device-time delta and jitters minute to minute — the
    REAL perf claim (50 Hz at K=65,536 via K_p=16,384) is measured by
    the deployment gate in GATE_r05.json, not here."""
    from autorally_tpu.runtime.async_loop import (AsyncLoopConfig,
                                                  AsyncTubeController,
                                                  run_control_loop_async)
    from autorally_tpu.runtime.plant import SyntheticPlant

    solver, params, cp, cm, cfg = _stack()
    solver_pred = MPPISolver(solver.model, MPPICost(),
                             cfg.replace(num_rollouts=480))

    def run_tube(sp):
        tube = AsyncTubeController(solver, params, cp, cm,
                                   use_feedback_gains=False,
                                   solver_predicted=sp)
        plant = SyntheticPlant(solver.model, params, START, cfg.dt,
                               cfg.num_timesteps,
                               use_feedback_gains=False)
        plant.receive_state_vector(0.0, START)
        lcfg = AsyncLoopConfig(hz=50, num_timesteps=cfg.num_timesteps,
                               depth=1, realtime=False, max_iter=10)
        run_control_loop_async(tube, plant, lcfg)      # warm compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            lcfg.max_iter = 30
            run_control_loop_async(tube, plant, lcfg)
            best = min(best, (time.perf_counter() - t0) / 30)
        assert not plant.shutdown
        assert np.isfinite(plant.control_sequence).all()
        return best

    t_asym = run_tube(solver_pred)
    t_sym = run_tube(None)
    assert t_asym <= t_sym * 1.3, (
        f"asym tick {t_asym*1e3:.2f} ms vs sym {t_sym*1e3:.2f} ms "
        f"(tunnel-jitter guard bound; see GATE_r05 for the perf claim)")


def test_fused_episode_tick_rate_floor():
    """The whole-tube-tick episode (two solves + arbitration + plant
    step per tick in ONE program) must exceed a closed-loop rate floor:
    round-4 measured 623-694 ticks/s at this config; 250/s is the
    regression alarm (5x the 50 Hz realtime requirement)."""
    from autorally_tpu.runtime.episode import EpisodeRunner

    solver, params, cp, cm, cfg = _stack()
    runner = EpisodeRunner(solver, n_ticks=500)
    res = runner.run(params, cp, cm, START)         # compile + run
    jax.block_until_ready(res)
    t0 = time.perf_counter()
    res = runner.run(params, cp, cm, START)
    jax.block_until_ready(res)
    rate = 500 / (time.perf_counter() - t0)
    assert np.isfinite(np.asarray(res.states)).all()
    assert rate > 250.0, f"episode rate {rate:.0f} ticks/s below floor"


def test_ess_tuner_holds_band_on_device():
    """On-device adaptive temperature inside the episode scan: gamma
    telemetry must move from gamma0, stay inside the clamp band, and
    either bring ESS nearer the target than the fixed-gamma run or sit
    at the clamp (the CPU test's contract, now on hardware)."""
    from autorally_tpu.runtime.episode import EpisodeRunner

    solver, params, cp, cm, cfg = _stack()
    frac, headroom = 0.25, 8.0
    target = frac * cfg.num_rollouts
    tuned = EpisodeRunner(solver, n_ticks=300, ess_target_frac=frac,
                          ess_headroom=headroom)
    fixed = EpisodeRunner(solver, n_ticks=300)
    rt = tuned.run(params, cp, cm, START)
    rf = fixed.run(params, cp, cm, START)
    g = np.asarray(rt.gamma)
    assert (g >= cfg.gamma / headroom - 1e-6).all()
    assert (g <= cfg.gamma * headroom + 1e-6).all()
    assert not np.allclose(g, cfg.gamma), "gamma never adapted"

    err = lambda e: abs(np.log(max(float(e), 1.0) / target))
    ess_t = float(np.median(np.asarray(rt.ess)[150:]))
    ess_f = float(np.median(np.asarray(rf.ess)[150:]))
    at_clamp = (np.isclose(g[-1], cfg.gamma / headroom, rtol=1e-3)
                or np.isclose(g[-1], cfg.gamma * headroom, rtol=1e-3))
    assert err(ess_t) < max(err(ess_f), 0.35) or at_clamp, (
        f"tuned ESS {ess_t:.1f} no closer to {target:.0f} "
        f"than fixed {ess_f:.1f}")
