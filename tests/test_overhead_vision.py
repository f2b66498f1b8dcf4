"""Overhead-vision ground-truth rig tests (the ssl_vision role).

The reference validates its overhead rig by collecting stationary
measurements and quantifying the noise (``ssl_vision/sensor_noise.py``);
here the whole path runs synthetically: camera -> UDP detections ->
client -> noise stats, and detections -> pose bridge -> plant / JSONL ->
ML ingest.
"""

import math
import os

import numpy as np
import pytest

from autorally_tpu.vision.overhead import (OverheadClient,
                                           OverheadDetection,
                                           OverheadPoseBridge,
                                           SyntheticOverheadCamera)

PORT = 47955


def test_detection_codec_roundtrip():
    d = OverheadDetection(camera_id=1, t_capture=12.5, robot_id=3,
                          x_mm=1234.5, y_mm=-678.0, orientation=0.75,
                          confidence=0.9)
    d2 = OverheadDetection.decode(d.encode())
    assert d2.robot_id == 3 and d2.camera_id == 1
    assert d2.x_mm == pytest.approx(1234.5)
    assert d2.orientation == pytest.approx(0.75)
    with pytest.raises(ValueError):
        OverheadDetection.decode(d.encode()[:-1])
    with pytest.raises(ValueError):
        OverheadDetection.decode(b"\x00" + d.encode()[1:])


def test_stationary_noise_quantification():
    """The reference's validation workflow: vehicle stationary, collect
    N detections, the measured std must match the rig's configured
    noise."""
    client = OverheadClient(PORT)
    cam = SyntheticOverheadCamera(PORT, noise_mm=3.0, noise_rad=0.005,
                                  seed=7)
    try:
        for i in range(200):
            cam.observe(i * 0.02, x_m=1.0, y_m=-2.0, yaw=0.3)
        stats = client.stationary_noise(200)
        assert stats["x_mm"]["std"] == pytest.approx(3.0, rel=0.3)
        assert stats["y_mm"]["std"] == pytest.approx(3.0, rel=0.3)
        assert stats["orientation"]["std"] == pytest.approx(0.005,
                                                            rel=0.3)
    finally:
        cam.close()
        client.close()


def test_pose_bridge_velocities_and_ingest(tmp_path):
    """A moving vehicle seen from overhead: the bridge's
    finite-difference body velocities converge to the true motion, and
    the JSONL rows flow through the ML ingest pipeline."""
    bridge = OverheadPoseBridge(smooth=0.0)
    # straight-line motion at 2 m/s along yaw=0.5
    yaw, v = 0.5, 2.0
    last = None
    for i in range(50):
        t = i * 0.02
        det = OverheadDetection(0, t, 0,
                                x_mm=v * math.cos(yaw) * t * 1000.0,
                                y_mm=v * math.sin(yaw) * t * 1000.0,
                                orientation=yaw)
        last = bridge.push(det)
    assert last is not None
    assert last[4] == pytest.approx(v, abs=0.05)      # u_x = speed
    assert last[5] == pytest.approx(0.0, abs=0.05)    # u_y ~ 0
    # reordered frame dropped
    stale = OverheadDetection(0, 0.5, 0, 0.0, 0.0, yaw)
    assert bridge.push(stale) is None

    log = str(tmp_path / "overhead.jsonl")
    n = bridge.log_jsonl(log)
    assert n == 50

    from autorally_tpu.ml.ingest import read_jsonl_topics

    frames = read_jsonl_topics(log)
    assert "/overhead/state" in frames
    df = frames["/overhead/state"]
    assert len(df) == 50
    assert {"x_pos", "y_pos", "yaw", "u_x"} <= set(df.columns)


def test_yaw_mder_convention_log_matches_live_state(tmp_path):
    """Round-3 advisor finding: the bridge's JSONL log and its live state
    vector must agree on the heading-rate sign.  A turning vehicle's
    logged ``yaw_mder`` (the ML feature column, ingest's default spec)
    must equal the live ``state[6]`` the plant deploys the model against
    — same column name and sign as ``tools/sim_node.py`` logs."""
    live_states = []
    bridge = OverheadPoseBridge(
        smooth=0.0, on_state=lambda t, s: live_states.append((t, s.copy())))
    omega = 1.5                                   # rad/s, constant turn
    for i in range(40):
        t = i * 0.02
        bridge.push(OverheadDetection(0, t, 0, x_mm=0.0, y_mm=0.0,
                                      orientation=omega * t))
    log = str(tmp_path / "turn.jsonl")
    bridge.log_jsonl(log)

    from autorally_tpu.ml.ingest import read_jsonl_topics

    df = read_jsonl_topics(log)["/overhead/state"]
    assert "yaw_mder" in df.columns               # the ingest feature name
    logged = df["yaw_mder"].to_numpy()
    live = np.array([s[6] for _, s in live_states])
    # one row per pushed detection, identical values (plant convention:
    # yaw_mder = -yaw_rate, so a positive turn logs/live as ~-1.5)
    assert len(logged) == len(live)
    np.testing.assert_allclose(logged, live, rtol=0, atol=1e-6)
    assert logged[-1] == pytest.approx(-omega, abs=0.05)


def test_bridge_feeds_plant_as_pose_source():
    """Detections drive the plant pipeline directly — the rig as a live
    ground-truth pose source."""
    from autorally_tpu.runtime.plant import BasePlant

    plant = BasePlant(dt=0.02, num_timesteps=16)
    T = 16
    plant.set_solution(np.zeros((T, 7), np.float32),
                       np.tile([0.1, 0.2], (T, 1)).astype(np.float32),
                       None, ts=0.0)
    bridge = OverheadPoseBridge(on_state=plant.receive_state_vector)
    for i in range(10):
        t = 0.02 * (i + 1)
        bridge.push(OverheadDetection(0, t, 0, x_mm=t * 1000.0,
                                      y_mm=0.0, orientation=0.0))
    assert plant.pose_count == 10
    assert len(plant.published) > 0


def test_dropout_and_multi_robot_filtering():
    client = OverheadClient(PORT + 1)
    cam_a = SyntheticOverheadCamera(PORT + 1, robot_id=0, dropout=0.0)
    cam_b = SyntheticOverheadCamera(PORT + 1, robot_id=1, dropout=0.0)
    try:
        for i in range(30):
            cam_a.observe(i * 0.02, 0.0, 0.0, 0.0)
            cam_b.observe(i * 0.02, 5.0, 5.0, 1.0)
        dets = client.collect(20, robot_id=1)
        assert all(d.robot_id == 1 for d in dets)
        assert np.median([d.x_mm for d in dets]) == pytest.approx(
            5000.0, abs=50.0)
    finally:
        cam_a.close()
        cam_b.close()
        client.close()
    # dropout camera emits fewer frames
    cam = SyntheticOverheadCamera(PORT + 2, dropout=0.5, seed=3)
    sent = sum(cam.observe(i * 0.02, 0, 0, 0) for i in range(200))
    cam.close()
    assert 60 < sent < 140
