"""Camera subsystem tests: MSV histogram semantics, the exposure
control law's branch structure (shutter-first up, gain-first down,
saturation handoffs), closed-loop convergence on the simulated camera,
trigger-box protocol over a pty, and the republisher's rate/size caps."""

import os
import pty
import time

import numpy as np
import pytest

from autorally_tpu.vision import (AutoBalanceConfig, CameraAutoBalance,
                                  CameraTrigger, ImageRepublisher,
                                  SimulatedCamera, luminance_histogram, msv)


def test_histogram_weights_and_roi():
    img = np.zeros((20, 20, 3), np.uint8)
    img[:, :, 1] = 100                         # green plane
    h = luminance_histogram(img, roi=(0, 0, 20, 20), decimation=1)
    assert h.sum() == 400
    assert h[58] == 400                        # int(0.587 * 100)
    # ROI excludes a bright corner
    img[:5, :5] = 255
    h = luminance_histogram(img, roi=(10, 10, 20, 20), decimation=1)
    assert h[58] == 100 and h[255] == 0


def test_msv_statistic():
    h = np.zeros(256, np.int64)
    h[99] = 10
    assert msv(h) == 100.0                     # (i+1) weighting
    assert msv(np.zeros(256)) == 0.0


class RecordingAdjuster:
    def __init__(self):
        self.shutter = None
        self.gain = None

    def set_shutter(self, v):
        self.shutter = v

    def set_gain(self, v):
        self.gain = v


def _flat(level: int) -> np.ndarray:
    return np.full((16, 16, 3), level, np.uint8)


def _cfg(**kw):
    kw.setdefault("roi", (0, 0, 16, 16))
    kw.setdefault("calibration_step", 1)
    return AutoBalanceConfig(**kw)


def test_underexposed_raises_shutter_first():
    adj = RecordingAdjuster()
    bal = CameraAutoBalance(adj, _cfg())
    s0 = bal.shutter
    bal.process_frame(_flat(10))               # far below 120 reference
    assert bal.shutter > s0
    assert bal.gain == bal.cfg.min_gain        # gain untouched


def test_underexposed_at_max_shutter_raises_gain():
    adj = RecordingAdjuster()
    bal = CameraAutoBalance(adj, _cfg())
    bal.shutter = bal.cfg.max_shutter
    g0 = bal.gain
    bal.process_frame(_flat(10))
    assert bal.gain > g0
    assert bal.shutter == bal.cfg.max_shutter


def test_overexposed_lowers_gain_first_then_shutter():
    adj = RecordingAdjuster()
    bal = CameraAutoBalance(adj, _cfg())
    bal.shutter = 5000.0
    bal.gain = 2.0
    bal.process_frame(_flat(250))
    assert bal.gain < 2.0
    assert bal.shutter == 5000.0
    # at min gain the shutter comes down (epsilon_gain handoff)
    bal.gain = bal.cfg.min_gain
    bal.process_frame(_flat(250))
    assert bal.shutter < 5000.0


def test_within_tolerance_no_adjustment():
    adj = RecordingAdjuster()
    bal = CameraAutoBalance(adj, _cfg())
    n0 = bal.adjustments
    bal.process_frame(_flat(119))              # |error| < 3
    assert bal.adjustments == n0


def test_calibration_step_skips_frames():
    adj = RecordingAdjuster()
    bal = CameraAutoBalance(adj, _cfg(calibration_step=3))
    assert bal.process_frame(_flat(10)) is not None
    assert bal.process_frame(_flat(10)) is None
    assert bal.process_frame(_flat(10)) is None
    assert bal.process_frame(_flat(10)) is not None


def test_closed_loop_converges_on_simulated_camera():
    cam = SimulatedCamera(scene_radiance=0.05, shape=(32, 48))
    bal = CameraAutoBalance(
        cam, _cfg(roi=(0, 0, 48, 32), k_shutter=5e-3, k_gain=5e-3))
    value = 0.0
    for _ in range(400):
        value = bal.process_frame(cam.capture())
    assert abs(bal.cfg.msv_reference - value) <= 10.0
    # and it tracks a scene change (sun goes behind a cloud)
    cam.scene_radiance = 0.015
    for _ in range(400):
        value = bal.process_frame(cam.capture())
    assert abs(bal.cfg.msv_reference - value) <= 10.0


def test_camera_trigger_protocol_over_pty():
    from autorally_tpu.runtime.diagnostics import Diagnostics
    from autorally_tpu.runtime.serial_device import (SerialSettings,
                                                     configure_port)

    master, slave = pty.openpty()
    configure_port(slave, SerialSettings())
    diag = Diagnostics("trigger")
    trig = CameraTrigger(slave, diagnostics=diag, trigger_fps=40)
    trig.start()
    try:
        # start() pushes the configured rate to the firmware
        assert os.read(master, 64) == b"#fps:40\r\n"
        os.write(master, b"#pps:17,fps:39.8\r\n#junk:1\r\n")
        deadline = time.time() + 5.0
        while time.time() < deadline and trig.bad_tokens == 0:
            time.sleep(0.01)
        assert trig.pps_count == 17
        assert trig.actual_fps == pytest.approx(39.8)
        assert trig.bad_tokens == 1
        assert diag.entries["PPS count"].message == "17"
        trig.set_fps(60)
        assert os.read(master, 64) == b"#fps:60\r\n"
    finally:
        trig.stop()
        os.close(master)
        os.close(slave)


def test_image_republisher_rate_and_scale():
    out = []
    t = [0.0]
    rep = ImageRepublisher(lambda f, ts: out.append(f), max_hz=5.0,
                           scale=4, clock=lambda: t[0])
    frame = np.zeros((64, 96, 3), np.uint8)
    assert rep.process(frame)
    assert not rep.process(frame)              # too soon
    t[0] += 0.25
    assert rep.process(frame)
    assert rep.forwarded == 2 and rep.dropped == 1
    assert out[0].shape == (16, 24, 3)
    with pytest.raises(ValueError):
        ImageRepublisher(lambda f, ts: None, scale=0)
