"""Wire-type tests (autorally_msgs role): every message type must
round-trip through the binary codec and the dict form, corrupt buffers
must raise, and the neuralNetModel bridge must carry real solver params
losslessly (the live model-push path)."""

import dataclasses

import numpy as np
import pytest

from autorally_tpu import msgs


def _sample_messages():
    return [
        msgs.Point2D(x=3, y=7),
        msgs.Line2D(start=msgs.Point2D(1, 2), end=msgs.Point2D(3, 4)),
        msgs.RegionOfInterest(x_offset=2, y_offset=4, height=8, width=16),
        msgs.ImageMask(stamp=1.5, sender="vision",
                       points=[msgs.Point2D(9, 9)],
                       lines=[msgs.Line2D(msgs.Point2D(0, 0),
                                          msgs.Point2D(5, 5))],
                       rois=[msgs.RegionOfInterest(1, 2, 3, 4)]),
        msgs.ChassisCommand(sender="mppi_controller", steering=-0.25,
                            throttle=0.6, front_brake=-5.0, stamp=12.25),
        msgs.ChassisState(steering=0.1, throttle=0.2, front_brake=0.0,
                          steering_commander="mppi_controller",
                          throttle_commander="RC",
                          front_brake_commander="",
                          runstop_motion_enabled=True,
                          throttle_relay_enabled=True,
                          autonomous_enabled=False, stamp=13.0),
        msgs.WheelSpeeds(lf=1.0, rf=1.5, lb=2.0, rb=2.5, stamp=0.5),
        msgs.Runstop(sender="OCS", motion_enabled=True, stamp=3.0),
        msgs.LapStats(lap_number=4, lap_time=58.68, max_speed=5.78,
                      max_slip=0.093, stamp=99.0),
        msgs.NeuralNetLayer(name="dense_1", weight=[0.5, -0.5],
                            bias=[0.25]),
        msgs.NeuralNetModel(
            network=[msgs.NeuralNetLayer("dense_1", [1.0, 2.0], [3.0])],
            num_layers=1, structure=[2, 1], stamp=7.0),
        msgs.PathIntegralParams(hz=50, num_timesteps=100, num_iters=1,
                                gamma=0.15, steering_var=0.3,
                                throttle_var=0.25, max_throttle=0.65,
                                map_path="maps/ccrf.npz",
                                desired_speed=6.0),
        msgs.PathIntegralStats(tag="r2", stamp=1.0,
                               params=msgs.PathIntegralParams(hz=40),
                               stats=msgs.LapStats(lap_number=1)),
        msgs.PathIntegralStatus(info="nominal", status=0, stamp=2.0),
        msgs.PathIntegralTiming(average_time_between_poses=0.02,
                                average_optimization_cycle_time=0.011,
                                average_sleep_time=0.008, stamp=4.0),
        msgs.StateEstimatorStatus(status=msgs.StateEstimatorStatus.WARN,
                                  stamp=5.0),
    ]


@pytest.mark.parametrize("msg", _sample_messages(),
                         ids=lambda m: type(m).__name__)
def test_binary_roundtrip(msg):
    buf = msgs.encode(msg)
    assert msgs.decode(buf) == msg


@pytest.mark.parametrize("msg", _sample_messages(),
                         ids=lambda m: type(m).__name__)
def test_dict_roundtrip(msg):
    import json

    d = msgs.to_dict(msg)
    # must be JSON-serializable (the telemetry bus writes JSONL)
    d2 = json.loads(json.dumps(d))
    assert msgs.from_dict(d2) == msg


def test_all_fifteen_reference_types_covered():
    # the reference's autorally_msgs/msg/ directory, snake_cased
    reference = {"ChassisCommand", "ChassisState", "ImageMask", "LapStats",
                 "Line2D", "NeuralNetLayer", "NeuralNetModel",
                 "PathIntegralParams", "PathIntegralStats",
                 "PathIntegralStatus", "PathIntegralTiming", "Point2D",
                 "Runstop", "StateEstimatorStatus", "WheelSpeeds"}
    have = {cls.__name__ for cls in msgs._TYPE_IDS}
    assert reference <= have


def test_decode_rejects_garbage():
    with pytest.raises(msgs.MsgDecodeError):
        msgs.decode(b"")
    with pytest.raises(msgs.MsgDecodeError):
        msgs.decode(b"\x00\x01\x05" + b"junk")          # bad magic
    good = msgs.encode(msgs.WheelSpeeds(lf=1.0))
    with pytest.raises(msgs.MsgDecodeError):
        msgs.decode(good[:-3])                          # truncated
    with pytest.raises(msgs.MsgDecodeError):
        msgs.decode(good + b"\x00")                     # trailing bytes
    with pytest.raises(msgs.MsgDecodeError):
        msgs.decode(bytes([good[0], 99]) + good[2:])    # bad version
    with pytest.raises(msgs.MsgDecodeError):
        msgs.decode(bytes([good[0], good[1], 250]) + good[3:])  # bad type


def test_encode_rejects_non_message():
    with pytest.raises(TypeError):
        msgs.encode({"not": "a message"})


def test_chassis_types_are_the_runtime_types():
    # single source of truth: the arbiter's records ARE the wire types
    from autorally_tpu.runtime import chassis

    assert chassis.ChassisCommand is msgs.ChassisCommand
    assert chassis.ChassisState is msgs.ChassisState


def test_neural_net_model_bridge_roundtrips_solver_params():
    from autorally_tpu.models import NeuralNetDynamics

    model = NeuralNetDynamics(0.02)
    rng = np.random.default_rng(0)
    params = {
        "weights": [rng.normal(size=(6, 32)).astype(np.float32),
                    rng.normal(size=(32, 32)).astype(np.float32),
                    rng.normal(size=(32, 4)).astype(np.float32)],
        "biases": [rng.normal(size=(32,)).astype(np.float32),
                   rng.normal(size=(32,)).astype(np.float32),
                   rng.normal(size=(4,)).astype(np.float32)],
    }
    msg = msgs.model_msg_from_params(params, stamp=1.0)
    assert msg.num_layers == 3
    assert msg.structure == [6, 32, 32, 4]

    wire = msgs.encode(msg)
    back = msgs.params_from_model_msg(
        msgs.decode(wire), control_ranges=((-0.99, 0.99), (-0.99, 0.65)))
    for W0, W1 in zip(params["weights"], back["weights"]):
        np.testing.assert_array_equal(W0, W1)
    for b0, b1 in zip(params["biases"], back["biases"]):
        np.testing.assert_array_equal(b0, b1)
    assert "control_rngs" in back

    # and the rebuilt params drive the actual dynamics identically
    x = np.zeros((7,), np.float32)
    u = np.array([0.1, 0.3], np.float32)
    params["control_rngs"] = back["control_rngs"]
    a = model.state_deriv(params, x[None, :], u[None, :])
    b = model.state_deriv(back, x[None, :], u[None, :])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


def test_model_msg_structure_validation():
    msg = msgs.NeuralNetModel(
        network=[msgs.NeuralNetLayer("d", [1.0, 2.0], [3.0])],
        num_layers=1, structure=[2, 1, 1])
    with pytest.raises(msgs.MsgDecodeError):
        msgs.params_from_model_msg(msg)
    msg.structure = [3, 1]                    # wrong weight count
    with pytest.raises(msgs.MsgDecodeError):
        msgs.params_from_model_msg(msg)


def test_wire_ids_are_stable():
    # appending new types is fine; renumbering breaks deployments
    assert msgs._TYPE_IDS[msgs.Point2D] == 1
    assert msgs._TYPE_IDS[msgs.ChassisCommand] == 5
    assert msgs._TYPE_IDS[msgs.StateEstimatorStatus] == 16


def test_messages_are_dataclasses_with_defaults():
    for cls in msgs._TYPE_IDS:
        msg = cls()                           # default-constructible
        assert dataclasses.is_dataclass(msg)
        assert msgs.decode(msgs.encode(msg)) == msg
