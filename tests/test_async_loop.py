"""Async-dispatch control loop tests (``runtime/async_loop.py``).

The pipelined loop keeps ``depth`` tube ticks in flight and publishes
tick N-depth while tick N computes.  These tests run it lockstep against
a synthetic plant on CPU: the car must drive like the sequential loop's,
the published solution must lag by exactly ``depth`` dispatches, hot
updates must ride the next dispatch, and the drain must leave the
freshest solution published.
"""

import time

import numpy as np
import pytest

from autorally_tpu.config import CostParams, MPPIConfig
from autorally_tpu.costs import MPPICost
from autorally_tpu.costs.costmap import make_costmap
from autorally_tpu.models import NeuralNetDynamics
from autorally_tpu.runtime.async_loop import (AsyncLoopConfig,
                                              AsyncTubeController,
                                              TubeTickOutput,
                                              run_control_loop_async)
from autorally_tpu.runtime.plant import BasePlant, SyntheticPlant
from autorally_tpu.solver.mppi import MPPISolver
from autorally_tpu.tools.track_generator import oval_track

NN_NPZ = ("/root/reference/autorally_control/src/path_integral/params/"
          "models/autorally_nnet_09_12_2018.npz")
START = np.array([30.0, 0.0, np.pi / 2, 0.0, 2.0, 0.0, 0.0],
                 dtype=np.float32)


def _build(use_feedback_gains=False, K=64, T=16, K_pred=None):
    cfg = MPPIConfig(num_rollouts=K, num_timesteps=T, hz=50)
    data, xb, yb = oval_track(half_length=30.0, half_width=18.0,
                              track_width=8.0, ppm=2.0)
    cm = make_costmap(data, xb, yb)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    solver = MPPISolver(model, MPPICost(), cfg)
    solver_pred = (None if K_pred is None else
                   MPPISolver(model, MPPICost(),
                              cfg.replace(num_rollouts=K_pred)))
    cp = CostParams(desired_speed=4.0)
    tube = AsyncTubeController(solver, params, cp, cm,
                               use_feedback_gains=use_feedback_gains,
                               solver_predicted=solver_pred)
    plant = SyntheticPlant(model, params, START, cfg.dt,
                           cfg.num_timesteps,
                           use_feedback_gains=use_feedback_gains)
    plant.receive_state_vector(0.0, START)
    return tube, plant, cfg


@pytest.mark.parametrize("depth", [1, 2])
def test_lockstep_drives_the_plant(depth):
    tube, plant, cfg = _build()
    lcfg = AsyncLoopConfig(hz=cfg.hz, num_timesteps=cfg.num_timesteps,
                           depth=depth, realtime=False, max_iter=150)
    timing = run_control_loop_async(tube, plant, lcfg)
    assert timing.num_iter == 150
    assert not plant.shutdown
    # driving like the sequential loop at this config (sync baseline:
    # ~2.2 m/s, ~6.5 m progress in 150 lockstep ticks)
    assert 1.5 < float(plant.true_state[4]) < 5.0
    progress = np.hypot(float(plant.true_state[0]) - START[0],
                        float(plant.true_state[1]) - START[1])
    assert progress > 4.0
    # pipelined publication: solutions were delivered
    assert plant.solution_received
    assert np.isfinite(plant.control_sequence).all()


def test_asymmetric_tube_drives_and_resyncs():
    """Asymmetric tube budgets (round 5): the predicted-state controller
    runs its own smaller solver (K_pred < K_actual).  The loop must
    drive like the symmetric tube at this config, and the cross-solver
    resync must still hand the actual controller's (T,C)/(T,S) solution
    to the smaller predicted controller bit-for-bit."""
    tube, plant, cfg = _build(K=64, K_pred=32)
    assert tube.solver_predicted is not tube.solver
    assert tube.solver_predicted.cfg.num_rollouts == 32
    used = []

    def on_tick(num_iter, who, state, out, harvest_ms, age_s):
        used.append(who)

    lcfg = AsyncLoopConfig(hz=cfg.hz, num_timesteps=cfg.num_timesteps,
                           depth=1, realtime=False, max_iter=150)
    timing = run_control_loop_async(tube, plant, lcfg, on_tick=on_tick)
    assert timing.num_iter == 150
    assert not plant.shutdown
    assert 1.5 < float(plant.true_state[4]) < 5.0
    progress = np.hypot(float(plant.true_state[0]) - START[0],
                        float(plant.true_state[1]) - START[1])
    assert progress > 4.0
    assert np.isfinite(plant.control_sequence).all()
    # both controllers actually won ticks at some point (arbitration is
    # live across the asymmetric pair, not degenerate to one side)
    assert set(used) == {"actual", "predicted"}
    # resync semantics: after a tick, the predicted controller's carried
    # solution equals the published chosen one (resync on actual wins,
    # its own on predicted wins) — shapes are K-independent
    assert np.asarray(tube.cs_p.control_solution).shape == \
        (cfg.num_timesteps, 2)


def test_asymmetric_tube_rejects_mismatched_configs():
    cfg = MPPIConfig(num_rollouts=64, num_timesteps=16, hz=50)
    model = NeuralNetDynamics(cfg.dt, control_ranges=cfg.control_ranges)
    params = model.load_params(NN_NPZ)
    data, xb, yb = oval_track(half_length=30.0, half_width=18.0,
                              track_width=8.0, ppm=2.0)
    cm = make_costmap(data, xb, yb)
    solver = MPPISolver(model, MPPICost(), cfg)
    bad = MPPISolver(model, MPPICost(),
                     cfg.replace(num_rollouts=32, num_timesteps=8))
    with pytest.raises(ValueError, match="horizon"):
        AsyncTubeController(solver, params, CostParams(), cm,
                            solver_predicted=bad)
    # ANY config divergence beyond num_rollouts breaks the arbitration
    # (both halves must solve the same problem at the same temperature)
    hot = MPPISolver(model, MPPICost(),
                     cfg.replace(num_rollouts=32, gamma=0.5))
    with pytest.raises(ValueError, match="gamma"):
        AsyncTubeController(solver, params, CostParams(), cm,
                            solver_predicted=hot)
    # with_rollouts must not silently downgrade subclass solvers
    from autorally_tpu.solver import EnsembleMPPISolver

    ens = EnsembleMPPISolver(model, MPPICost(), cfg, num_members=4)
    with pytest.raises(NotImplementedError, match="downgrade"):
        ens.with_rollouts(32)


def test_async_guard_skips_duck_tube_without_solver():
    """A duck-typed tube with no .solver must not crash the loop when
    the guard is enabled and telemetry looks degenerate — the
    ESS-vs-survivors bound needs the winning controller's K, so the
    guard skips instead (review finding: it used to AttributeError
    mid-drive, exactly when telemetry was worst)."""
    class _DuckTube(_FakeTube):                # no .solver at all
        def dispatch(self, state, stride):
            out = super().dispatch(state, stride)
            return out._replace(
                control_solution=np.full((self.T, 2), 0.5, np.float32),
                ess=np.float32(60.0), crash_frac=np.float32(1.0))

    tube = _DuckTube(16, latency_s=0.0005)
    plant = BasePlant(dt=0.01, num_timesteps=16, use_feedback_gains=False)
    moving = np.zeros(7, np.float32)
    moving[4] = 5.0
    plant.receive_state_vector(0.0, moving)
    lcfg = AsyncLoopConfig(hz=100, num_timesteps=16, depth=1,
                           realtime=True, max_iter=15,
                           degeneracy_guard=True)
    timing = run_control_loop_async(tube, plant, lcfg)
    assert timing.degenerate_ticks == 0        # skipped, not crashed
    assert plant.solution_received


def test_publication_lags_by_depth():
    tube, plant, cfg = _build()
    ages = []

    def on_tick(num_iter, used, state, out, harvest_ms, age_s):
        ages.append((num_iter, age_s))

    lcfg = AsyncLoopConfig(hz=cfg.hz, num_timesteps=cfg.num_timesteps,
                           depth=2, realtime=False, max_iter=40)
    run_control_loop_async(tube, plant, lcfg, on_tick=on_tick)
    # with depth=2 the first harvest happens on loop iteration 3
    assert ages[0][0] == 3
    # the published anchor is ~depth control periods older than the
    # freshest pose (lockstep: exactly depth periods once flowing)
    steady = [a for _, a in ages[5:]]
    assert np.median(steady) == pytest.approx(2 * cfg.dt, abs=cfg.dt / 2)


def test_hot_updates_ride_next_dispatch():
    tube, plant, cfg = _build()
    new_cp = CostParams(desired_speed=1.0)
    hit = []

    def on_tick(num_iter, used, state, out, harvest_ms, age_s):
        if len(hit) == 0 and num_iter == 10:
            plant.push_cost_params(new_cp)
            hit.append(num_iter)

    lcfg = AsyncLoopConfig(hz=cfg.hz, num_timesteps=cfg.num_timesteps,
                           depth=1, realtime=False, max_iter=120)
    run_control_loop_async(tube, plant, lcfg, on_tick=on_tick)
    # the queued cost params were consumed into the tube controller
    assert float(tube.cost_params.desired_speed) == 1.0
    # and the plant slowed toward the new target
    assert float(plant.true_state[4]) < 2.5


def test_feedback_gains_published():
    tube, plant, cfg = _build(use_feedback_gains=True)
    lcfg = AsyncLoopConfig(hz=cfg.hz, num_timesteps=cfg.num_timesteps,
                           depth=1, realtime=False, max_iter=30)
    run_control_loop_async(tube, plant, lcfg)
    assert plant.feedback_gains is not None
    assert plant.feedback_gains.shape == (cfg.num_timesteps, 2, 7)
    assert np.isfinite(plant.feedback_gains).all()


def test_tube_checkpoint_resume_identical_next_tick(tmp_path):
    # run a tube 20 ticks, checkpoint both controller states, restore
    # into a FRESH tube: the next dispatch must reproduce the original's
    # bit-for-bit (plan, noise keys, solutions all round-trip)
    from autorally_tpu.io.checkpoint import (load_tube_state,
                                             save_tube_state)

    tube, plant, cfg = _build()
    lcfg = AsyncLoopConfig(hz=cfg.hz, num_timesteps=cfg.num_timesteps,
                           depth=1, realtime=False, max_iter=20)
    run_control_loop_async(tube, plant, lcfg)

    path = str(tmp_path / "tube.npz")
    save_tube_state(tube, path)
    state = plant.get_state().to_vector()
    out1 = tube.dispatch(state, 1)

    tube2, _, _ = _build()
    tube2.cs_a, tube2.cs_p = load_tube_state(path)
    out2 = tube2.dispatch(state, 1)

    for leaf1, leaf2 in zip(out1, out2):
        if leaf1 is None:
            assert leaf2 is None
        else:
            np.testing.assert_array_equal(np.asarray(leaf1),
                                          np.asarray(leaf2))


class _SlowLeaf:
    """Device-array stand-in whose host copy 'lands' at a fixed wall time
    — emulates a dispatch->ready latency without a device."""

    def __init__(self, value, ready_t):
        self._v = np.asarray(value)
        self._ready = ready_t

    def copy_to_host_async(self):
        pass

    def __array__(self, dtype=None, copy=None):
        now = time.perf_counter()
        if now < self._ready:
            time.sleep(self._ready - now)
        v = self._v if dtype is None else self._v.astype(dtype)
        return np.array(v) if copy else v


class _FakeTube:
    """AsyncTubeController duck type with a configurable solve latency."""

    use_feedback_gains = False

    def __init__(self, T, latency_s):
        self.T = T
        self.latency_s = latency_s

    def reset(self, state):
        pass

    def update_cost_params(self, cp):
        pass

    def update_costmap(self, cm):
        pass

    def update_model_params(self, mp):
        pass

    def dispatch(self, state, stride):
        ready = time.perf_counter() + self.latency_s
        leaf = lambda v: _SlowLeaf(v, ready)
        return TubeTickOutput(
            control_solution=leaf(np.zeros((self.T, 2), np.float32)),
            state_solution=leaf(np.zeros((self.T, 7), np.float32)),
            feedback_gains=None,
            use_actual=leaf(np.bool_(True)),
            trajectory_cost=leaf(np.float32(1.0)),
            ess=leaf(np.float32(32.0)),
            crash_frac=leaf(np.float32(0.0)))


def _fake_rig(latency_s, T=16):
    tube = _FakeTube(T, latency_s)
    plant = BasePlant(dt=0.005, num_timesteps=T, use_feedback_gains=False)
    plant.receive_state_vector(0.0, np.zeros(7, np.float32))
    return tube, plant


def test_adaptive_depth_grows_to_cover_latency():
    # 35 ms dispatch->ready latency at a 10 ms period: a depth-1 pipeline
    # blocks ~25 ms per harvest; the loop must deepen until harvests stop
    # blocking (4 at an exact 10 ms cadence; 3 if host load stretches the
    # tick spacing — both prove the mechanism without pinning the test to
    # this machine's scheduler)
    tube, plant = _fake_rig(latency_s=0.035)
    lcfg = AsyncLoopConfig(hz=100, num_timesteps=16, depth=1,
                           realtime=True, adaptive_depth=True,
                           max_depth=6, max_iter=200, carry_learned=True)
    timing = run_control_loop_async(tube, plant, lcfg)
    assert 3 <= timing.async_depth_final <= 4
    assert timing.async_depth_max == timing.async_depth_final
    # once adapted, harvests are non-blocking (tail of the run)
    tail = list(timing.harvest_samples_ms)[-50:]
    assert np.median(tail) < 2.5
    # with carry_learned the depth (and floor) are written back for the
    # next pass sharing this config
    assert lcfg.depth == timing.async_depth_final
    assert lcfg.shrink_floor == timing.async_depth_final


def test_adaptive_depth_default_does_not_mutate_config():
    # carry-over is OPT-IN (round-4 advisor finding): by default the
    # caller's config comes back untouched — learned values ride the
    # timing telemetry only
    tube, plant = _fake_rig(latency_s=0.035)
    lcfg = AsyncLoopConfig(hz=100, num_timesteps=16, depth=1,
                           realtime=True, adaptive_depth=True,
                           max_depth=6, max_iter=200)
    timing = run_control_loop_async(tube, plant, lcfg)
    assert timing.async_depth_final > 1       # it did adapt...
    assert lcfg.depth == 1                    # ...but cfg is untouched
    assert lcfg.shrink_floor == 1


def test_adaptive_depth_respects_max_depth():
    # latency needs depth 5, cap at 2: growth stops at the cap
    tube, plant = _fake_rig(latency_s=0.045)
    lcfg = AsyncLoopConfig(hz=100, num_timesteps=16, depth=1,
                           realtime=True, adaptive_depth=True,
                           max_depth=2, max_iter=60)
    timing = run_control_loop_async(tube, plant, lcfg)
    assert timing.async_depth_final == 2


def test_adaptive_depth_shrinks_when_device_is_early():
    # 0.5 ms latency at a 10 ms period: an initial depth of 3 publishes
    # needlessly stale solutions; the loop shrinks to 1
    tube, plant = _fake_rig(latency_s=0.0005)
    lcfg = AsyncLoopConfig(hz=100, num_timesteps=16, depth=3,
                           realtime=True, adaptive_depth=True,
                           shrink_after_s=0.05, max_iter=100)
    timing = run_control_loop_async(tube, plant, lcfg)
    assert timing.async_depth_final == 1
    assert [d for _, d in timing.async_depth_changes] == [2, 1]


class _OscillatingTube(_FakeTube):
    """Latency alternates quiet/spiky every 20 dispatches — tunnel
    weather.  The loop must settle at the depth that covers the spikes
    (shrink_floor pins it; no grow/shrink oscillation)."""

    def __init__(self, T, quiet_s, spike_s):
        super().__init__(T, quiet_s)
        self.quiet_s, self.spike_s = quiet_s, spike_s
        self.n = 0

    def dispatch(self, state, stride):
        self.n += 1
        self.latency_s = (self.spike_s if (self.n // 20) % 2 else
                          self.quiet_s)
        return super().dispatch(state, stride)


def test_adaptive_depth_stable_under_oscillating_latency():
    tube = _OscillatingTube(16, quiet_s=0.002, spike_s=0.026)
    plant = BasePlant(dt=0.01, num_timesteps=16, use_feedback_gains=False)
    plant.receive_state_vector(0.0, np.zeros(7, np.float32))
    lcfg = AsyncLoopConfig(hz=100, num_timesteps=16, depth=1,
                           realtime=True, adaptive_depth=True,
                           shrink_after_s=0.15, max_iter=400,
                           carry_learned=True)
    timing = run_control_loop_async(tube, plant, lcfg)
    # grew to cover the 26 ms spikes (3 at exact cadence, 2 if host load
    # stretched the ticks); once there, the floor pins it — at most one
    # shrink/grow oscillation per level, then stable
    assert 2 <= timing.async_depth_final <= 3
    changes = [d for _, d in timing.async_depth_changes]
    assert changes.count(2) <= 3 and changes.count(3) <= 2, changes
    # the floor survives the write-back for the next invocation
    assert lcfg.shrink_floor == timing.async_depth_final


def test_adaptive_depth_off_by_default_and_in_lockstep():
    # fixed-depth behavior is unchanged unless opted in; lockstep loops
    # never adapt (harvests cannot block)
    tube, plant, cfg = _build()
    lcfg = AsyncLoopConfig(hz=cfg.hz, num_timesteps=cfg.num_timesteps,
                           depth=2, realtime=False, adaptive_depth=True,
                           max_iter=30)
    timing = run_control_loop_async(tube, plant, lcfg)
    assert timing.async_depth_final == 2
    assert timing.async_depth_changes == []
    assert lcfg.depth == 2


def test_drain_leaves_freshest_solution():
    tube, plant, cfg = _build()
    seen = []

    def on_tick(num_iter, used, state, out, harvest_ms, age_s):
        seen.append(num_iter)

    lcfg = AsyncLoopConfig(hz=cfg.hz, num_timesteps=cfg.num_timesteps,
                           depth=3, realtime=False, max_iter=20)
    run_control_loop_async(tube, plant, lcfg, on_tick=on_tick)
    # every dispatched tick was eventually harvested (20 dispatches)
    assert len(seen) == 20


def test_async_degeneracy_guard_brakes_published_solution():
    """A harvested solution with all-crashed flat-softmax telemetry must
    publish braked (the sync loop's guard, in the pipelined loop)."""
    class _DegenerateTube(_FakeTube):
        class solver:                      # duck-typed: .solver.cfg.num_rollouts
            class cfg:
                num_rollouts = 64

        def dispatch(self, state, stride):
            out = super().dispatch(state, stride)
            return out._replace(
                control_solution=np.full((self.T, 2), 0.5, np.float32),
                ess=np.float32(60.0), crash_frac=np.float32(1.0))

    tube = _DegenerateTube(16, latency_s=0.0005)
    plant = BasePlant(dt=0.01, num_timesteps=16, use_feedback_gains=False)
    # measured car MOVING (vx=5 > the speed gate): a stationary car must
    # never be brake-deadlocked, so the gate would hold the guard silent
    moving = np.zeros(7, np.float32)
    moving[4] = 5.0
    plant.receive_state_vector(0.0, moving)
    pubs = []
    orig = plant.set_solution

    def capture(ss, cs, gains, t, used):
        pubs.append(np.array(cs))
        orig(ss, cs, gains, t, used)

    plant.set_solution = capture
    # guard is OPT-IN (default off — see AsyncLoopConfig)
    lcfg = AsyncLoopConfig(hz=100, num_timesteps=16, depth=1,
                           realtime=True, max_iter=20,
                           degeneracy_guard=True)
    timing = run_control_loop_async(tube, plant, lcfg)
    assert timing.degenerate_ticks > 0
    assert all((p[:, 1] <= 0.0).all() for p in pubs)
    # steering is preserved (only the throttle channel braked)
    assert all((p[:, 0] == 0.5).all() for p in pubs)

    # guard off: the raw solution passes through
    pubs.clear()
    lcfg2 = AsyncLoopConfig(hz=100, num_timesteps=16, depth=1,
                            realtime=True, max_iter=20,
                            degeneracy_guard=False)
    timing2 = run_control_loop_async(tube, plant, lcfg2)
    assert timing2.degenerate_ticks == 0
    assert all((p[:, 1] == 0.5).all() for p in pubs)
