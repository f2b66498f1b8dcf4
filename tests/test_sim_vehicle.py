"""Independent physics simulator tests.

The vehicle model is a first-principles oracle (tire slip, wheel spin,
servo lag) — these tests check physical sanity, the actuation semantics
ported from ``autorally_gazebo/nodes/autorally_controller.py``
(arbitration, staleness, runstop, timeout, Ackermann geometry), and that
the MPPI controller closes the loop against it (genuine model mismatch).
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from autorally_tpu.sim import (ActuationLimits, SimCommand,
                               SimCommandArbiter, SimVehiclePlant,
                               VehicleParams, ackermann_angles,
                               controller_state, init_sim_state,
                               vehicle_step, wheel_speeds)

P = VehicleParams()


def drive(s, cmd, n, dt=0.02):
    step = jax.jit(lambda s, c: vehicle_step(P, s, c, dt, 20))
    c = jnp.asarray(cmd, dtype=jnp.float32)
    for _ in range(n):
        s = step(s, c)
    return s


class TestVehiclePhysics:
    def test_accelerates_under_throttle(self):
        s = drive(init_sim_state(), [0.0, 0.5, 0.0], 100)
        assert float(s.vx) > 4.0
        assert float(s.x) > 4.0
        assert abs(float(s.y)) < 0.2

    def test_wheels_spin_consistently(self):
        s = drive(init_sim_state(), [0.0, 0.5, 0.0], 100)
        ws = wheel_speeds(P, s)
        # rear (driven) wheels spin at or above body speed; fronts roll
        assert ws[2] == pytest.approx(ws[3], rel=1e-3)
        assert ws[0] == pytest.approx(float(s.vx), rel=0.05)
        assert ws[2] >= ws[0] - 1e-3

    def test_steering_sign_matches_reference_models(self):
        # positive steering command -> negative yaw drift (the learned
        # reference models share this convention; verified in round-2
        # calibration against autorally_nnet_09_12_2018.npz)
        s = drive(init_sim_state(vx=5.0), [0.5, 0.3, 0.0], 50)
        assert float(s.yaw) < -0.3
        c = controller_state(s)
        assert float(c[6]) > 0.0       # negated yaw-rate convention

    def test_roll_bounded_in_hard_turn(self):
        s = drive(init_sim_state(vx=7.0), [0.9, 0.4, 0.0], 100)
        assert abs(float(s.roll)) < 0.6

    def test_braking_and_front_brake(self):
        s = drive(init_sim_state(vx=6.0), [0.0, -0.5, 0.0], 100)
        assert float(s.vx) < 2.0   # ~1.8 m/s^2 from the 4 Nm brake effort
        s2 = drive(init_sim_state(vx=6.0), [0.0, 0.0, 1.0], 100)
        s3 = drive(init_sim_state(vx=6.0), [0.0, 0.0, 0.0], 100)
        assert float(s2.vx) < float(s3.vx)   # front brake slows the car

    def test_friction_limits_lateral_accel(self):
        s = drive(init_sim_state(vx=8.0), [1.0, 0.5, 0.0], 50)
        # |a_y| = |yaw_rate * vx| can't exceed mu*g by much
        ay = abs(float(s.yaw_rate) * float(s.vx))
        assert ay < 1.5 * P.mu * 9.81

    def test_servo_lag(self):
        s = drive(init_sim_state(vx=3.0), [1.0, 0.0, 0.0], 1)
        assert abs(float(s.steer)) < P.max_steer * 0.8   # not instant
        s = drive(s, [1.0, 0.0, 0.0], 50)
        assert float(s.steer) == pytest.approx(
            P.steer_sign * P.max_steer, abs=0.02)

    def test_standstill_stays_put(self):
        s = drive(init_sim_state(), [0.0, 0.0, 0.0], 50)
        assert abs(float(s.x)) < 1e-2 and abs(float(s.vx)) < 1e-2


class TestAckermann:
    def test_inner_wheel_steers_more(self):
        left, right = ackermann_angles(P, -0.8)   # steer_sign<0 -> theta>0
        # theta > 0: turning left-ish; inner wheel (larger |angle|)
        assert left != right
        assert max(abs(left), abs(right)) <= math.radians(45)

    def test_zero_and_sign(self):
        l0, r0 = ackermann_angles(P, 0.0)
        assert l0 == 0.0 and r0 == 0.0
        l1, r1 = ackermann_angles(P, 1.0)
        l2, r2 = ackermann_angles(P, -1.0)
        assert l1 == pytest.approx(-r2, abs=1e-6)
        assert r1 == pytest.approx(-l2, abs=1e-6)


class TestArbitration:
    def test_priority_order(self):
        arb = SimCommandArbiter(["joystick", "mppi"])
        arb.put_command(SimCommand("mppi", steering=0.5, throttle=0.5,
                                   stamp=10.0))
        arb.put_command(SimCommand("joystick", steering=-0.2, throttle=0.1,
                                   stamp=10.0))
        s, t, b, info = arb.arbitrate(10.05)
        assert (s, t) == (-0.2, 0.1)
        assert info["steeringCommander"] == "joystick"

    def test_stale_commander_falls_through(self):
        arb = SimCommandArbiter(["joystick", "mppi"])
        arb.put_command(SimCommand("joystick", steering=-0.2, stamp=1.0))
        arb.put_command(SimCommand("mppi", steering=0.5, throttle=0.4,
                                   stamp=10.0))
        s, t, b, info = arb.arbitrate(10.05)
        assert s == 0.5 and info["steeringCommander"] == "mppi"

    def test_out_of_range_rejected(self):
        arb = SimCommandArbiter(["mppi"])
        arb.put_command(SimCommand("mppi", steering=1.5, throttle=0.4,
                                   stamp=10.0))
        s, t, b, _ = arb.arbitrate(10.05)
        assert s == 0.0 and t == 0.4

    def test_runstop_zeroes_throttle_only(self):
        arb = SimCommandArbiter(["mppi"])
        arb.put_command(SimCommand("mppi", steering=0.3, throttle=0.8,
                                   stamp=10.0))
        arb.put_runstop("box", False)
        s, t, b, info = arb.arbitrate(10.05)
        assert t == 0.0 and s == 0.3
        assert info["throttleCommander"] == "runstop"
        arb.put_runstop("box", True)
        s, t, b, _ = arb.arbitrate(10.05)
        assert t == 0.8

    def test_runstop_is_and_over_publishers(self):
        arb = SimCommandArbiter(["mppi"])
        arb.put_runstop("a", True)
        arb.put_runstop("b", False)
        assert not arb.motion_enabled()

    def test_command_timeout_stops_vehicle(self):
        arb = SimCommandArbiter(["mppi"], ActuationLimits(cmd_timeout=0.5))
        arb.put_command(SimCommand("mppi", steering=0.3, throttle=0.8,
                                   stamp=10.0))
        s, t, b, _ = arb.arbitrate(11.0)
        assert s == 0.0 and t == 0.0


class TestSimVehiclePlant:
    def test_closed_loop_mppi_drives_it(self):
        """MPPI (NN model) drives the independent-physics plant — the
        model-mismatch closed loop (Gazebo's integration-test role,
        SURVEY.md §4)."""
        from autorally_tpu.config import CostParams, MPPIConfig
        from autorally_tpu.costs.mppi_cost import MPPICost
        from autorally_tpu.models import NeuralNetDynamics
        from autorally_tpu.solver.mppi import MPPISolver
        from autorally_tpu.tools.track_generator import make_oval_costmap

        cfg = MPPIConfig(num_rollouts=256, num_timesteps=48, hz=50,
                         use_pallas_rollout=False)
        cost_params = CostParams(desired_speed=4.0, max_slip_ang=0.9)
        costmap = make_oval_costmap(half_length=30.0, half_width=18.0,
                                    track_width=8.0)
        model = NeuralNetDynamics(cfg.dt)
        params = model.load_params(
            "/root/reference/autorally_control/src/path_integral/params/"
            "models/autorally_nnet_09_12_2018.npz")
        solver = MPPISolver(model, MPPICost(cfg), cfg)
        cs = solver.init_state()

        plant = SimVehiclePlant(
            np.array([30.0, 0.0, np.pi / 2, 0.0, 0.0, 0.0, 0.0],
                     dtype=np.float32),
            cfg.dt, cfg.num_timesteps, use_feedback_gains=False)
        plant.receive_state_vector(0.0, plant.true_state)

        speeds = []
        for i in range(240):
            state = plant.true_state
            cs, stats = solver.solve(params, cost_params, costmap,
                                     state, cs)
            plant.set_solution(np.asarray(cs.state_solution),
                               np.asarray(cs.control_solution), None,
                               ts=plant.sim_time)
            cs = solver.slide(cs, 1)
            plant.step_sim(1)
            speeds.append(float(plant.true_state[4]))

        # reaches a meaningful fraction of desired speed and stays on track
        assert max(speeds) > 2.0
        final = plant.true_state
        track_val = float(costmap.lookup_ch0(
            jnp.asarray(final[0]), jnp.asarray(final[1])))
        assert track_val < 1.0      # inside the track edge (crash at 0.65+)
        assert not plant.shutdown

    @pytest.mark.parametrize("izz_scale", [0.5, 2.0])
    def test_inertia_sensitivity(self, izz_scale):
        """The yaw/roll inertias are documented estimates
        (sim/vehicle.py: the URDF's token value is non-physical).  The
        independent-oracle conclusion — MPPI closes the loop against
        this plant — must not hinge on the guess: at izz x0.5 and x2
        (with ixx scaled alongside) the closed loop still reaches speed
        and stays on track."""
        from autorally_tpu.config import CostParams, MPPIConfig
        from autorally_tpu.costs.mppi_cost import MPPICost
        from autorally_tpu.models import NeuralNetDynamics
        from autorally_tpu.solver.mppi import MPPISolver
        from autorally_tpu.tools.track_generator import make_oval_costmap

        cfg = MPPIConfig(num_rollouts=256, num_timesteps=48, hz=50,
                         use_pallas_rollout=False)
        cost_params = CostParams(desired_speed=4.0, max_slip_ang=0.9)
        costmap = make_oval_costmap(half_length=30.0, half_width=18.0,
                                    track_width=8.0)
        model = NeuralNetDynamics(cfg.dt)
        params = model.load_params(
            "/root/reference/autorally_control/src/path_integral/params/"
            "models/autorally_nnet_09_12_2018.npz")
        solver = MPPISolver(model, MPPICost(cfg), cfg)
        cs = solver.init_state()

        vp = VehicleParams().replace(izz=1.2 * izz_scale,
                                     ixx=0.35 * izz_scale)
        plant = SimVehiclePlant(
            np.array([30.0, 0.0, np.pi / 2, 0.0, 0.0, 0.0, 0.0],
                     dtype=np.float32),
            cfg.dt, cfg.num_timesteps, params=vp,
            use_feedback_gains=False)
        plant.receive_state_vector(0.0, plant.true_state)

        speeds = []
        for _ in range(240):
            state = plant.true_state
            cs, stats = solver.solve(params, cost_params, costmap,
                                     state, cs)
            plant.set_solution(np.asarray(cs.state_solution),
                               np.asarray(cs.control_solution), None,
                               ts=plant.sim_time)
            cs = solver.slide(cs, 1)
            plant.step_sim(1)
            speeds.append(float(plant.true_state[4]))

        assert max(speeds) > 2.0
        final = plant.true_state
        track_val = float(costmap.lookup_ch0(
            jnp.asarray(final[0]), jnp.asarray(final[1])))
        assert track_val < 1.0
        assert not plant.shutdown

    def test_wheel_speeds_exposed(self):
        plant = SimVehiclePlant(np.zeros(7, dtype=np.float32), 0.02, 10)
        plant.receive_state_vector(0.0, plant.true_state)
        ws = plant.wheel_speeds()
        assert ws.shape == (4,) and np.all(ws >= 0)
