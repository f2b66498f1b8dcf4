"""Fault injection across the deployed stack (VERDICT round-2 item 6).

The reference's resilience is layered but untested: NaN -> safe command +
shutdown (``autorally_plant.cpp:353-375``), pose staleness
(``autorally_plant.cpp:443-459``), the 0.5 s status watchdog
(``status_monitor.cpp:55-69``), and serial framers that must survive
line noise.  This suite actively attacks each layer: codec fuzzing
(truncation / corruption / version skew), UDP drop / duplicate /
reorder, pose dropout, and garbage bytes into every serial framer.
"""

import math
import random
import struct
import time

import numpy as np
import pytest

from autorally_tpu import msgs
from tests.test_msgs import _sample_messages


# ---------------------------------------------------------------------------
# Wire codec: nothing but MsgDecodeError may escape, ever
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("msg", _sample_messages(),
                         ids=lambda m: type(m).__name__)
def test_codec_truncation_always_raises(msg):
    """Every proper prefix of a valid frame must raise MsgDecodeError —
    never misparse, never raise anything else."""
    buf = msgs.encode(msg)
    step = max(1, len(buf) // 64)          # bounded work on big frames
    for n in range(0, len(buf), step):
        with pytest.raises(msgs.MsgDecodeError):
            msgs.decode(buf[:n])


@pytest.mark.parametrize("msg", _sample_messages(),
                         ids=lambda m: type(m).__name__)
def test_codec_corruption_never_escapes(msg):
    """Random single/multi-byte corruption: decode either returns a
    message object (payload-value corruption is legal) or raises
    MsgDecodeError.  struct.error / UnicodeDecodeError / MemoryError
    must never escape (a hostile length prefix must not allocate)."""
    rng = random.Random(1234)
    buf = bytearray(msgs.encode(msg))
    for _ in range(300):
        attack = bytearray(buf)
        for _ in range(rng.randint(1, 4)):
            attack[rng.randrange(len(attack))] = rng.randrange(256)
        try:
            out = msgs.decode(bytes(attack))
        except msgs.MsgDecodeError:
            continue
        assert type(out) in msgs._TYPE_IDS


def test_codec_random_garbage():
    rng = random.Random(99)
    for _ in range(300):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 200)))
        try:
            msgs.decode(blob)
        except msgs.MsgDecodeError:
            pass


def test_codec_version_and_frame_attacks():
    buf = bytearray(msgs.encode(msgs.WheelSpeeds(1, 2, 3, 4, stamp=0.5)))
    wrong_version = bytes(buf[:1]) + bytes([msgs.WIRE_VERSION + 1]) \
        + bytes(buf[2:])
    with pytest.raises(msgs.MsgDecodeError, match="version"):
        msgs.decode(wrong_version)
    with pytest.raises(msgs.MsgDecodeError, match="magic"):
        msgs.decode(b"\x00" + bytes(buf[1:]))
    with pytest.raises(msgs.MsgDecodeError, match="type id"):
        msgs.decode(bytes(buf[:2]) + b"\xfe" + bytes(buf[3:]))
    with pytest.raises(msgs.MsgDecodeError, match="[Tt]railing"):
        msgs.decode(bytes(buf) + b"\x00")


def test_codec_hostile_length_prefixes():
    """Corrupted length prefixes must raise quickly, never silently
    clamp (the string reader used to truncate via Python slicing) and
    never misparse past the buffer."""
    buf = bytearray(msgs.encode(msgs.ImageMask(
        stamp=1.0, sender="v", points=[msgs.Point2D(1, 2)],
        lines=[], rois=[])))
    # layout: header(3) + stamp f64(8) -> sender u16 length at 11,
    # points u16 count at 14 (after the 1-byte "v")
    for off, val in ((11, 0xFFFF), (14, 0xFFFF)):
        attack = bytearray(buf)
        attack[off:off + 2] = struct.pack("<H", val)
        t0 = time.monotonic()
        with pytest.raises(msgs.MsgDecodeError):
            msgs.decode(bytes(attack))
        assert time.monotonic() - t0 < 1.0
    # float-array count (u32): WheelSpeeds has none; use the layer
    # weights of a NeuralNetModel frame
    nn = bytearray(msgs.encode(msgs.NeuralNetModel(
        network=[msgs.NeuralNetLayer("l", [1.0, 2.0], [3.0])],
        num_layers=1, structure=[2, 1], stamp=0.0)))
    idx = bytes(nn).find(struct.pack("<I", 2))   # weight count
    assert idx > 0
    nn[idx:idx + 4] = struct.pack("<I", 2 ** 31 - 1)
    t0 = time.monotonic()
    with pytest.raises(msgs.MsgDecodeError):
        msgs.decode(bytes(nn))
    assert time.monotonic() - t0 < 1.0


# ---------------------------------------------------------------------------
# UDP transport faults: drop / duplicate / reorder
# ---------------------------------------------------------------------------

def test_plant_survives_drop_duplicate_reorder():
    """The pose pipeline under a lossy, reordering transport: time never
    regresses, duplicates are dropped, fresh poses still publish."""
    from autorally_tpu.runtime.plant import BasePlant

    plant = BasePlant(dt=0.02, num_timesteps=16)
    T = 16
    plant.set_solution(np.zeros((T, 7), np.float32),
                       np.tile([0.1, 0.3], (T, 1)).astype(np.float32),
                       None, ts=0.0)

    rng = random.Random(7)
    times = [0.02 * (i + 1) for i in range(100)]
    sent = []
    for t in times:
        r = rng.random()
        if r < 0.2:
            continue                      # dropped
        sent.append(t)
        if r < 0.4:
            sent.append(t)                # duplicated
        if r < 0.5 and len(sent) > 2:
            sent[-1], sent[-2] = sent[-2], sent[-1]   # reordered

    published = 0
    seen = -1.0
    fresh = 0                              # strictly-increasing arrivals
    hi = -1.0
    for t in sent:
        if t > hi:
            fresh += 1
            hi = t
        # the optimizer keeps re-arming the solution as time advances
        # (the loop's set_solution each tick)
        plant.set_solution(np.zeros((T, 7), np.float32),
                           np.tile([0.1, 0.3], (T, 1)).astype(np.float32),
                           None, ts=max(0.0, t - 0.01))
        s = np.array([t, 0, 0, 0, 2.0, 0, 0], np.float32)
        out = plant.receive_state_vector(t, s)
        assert plant.get_last_pose_time() >= seen     # never regresses
        seen = plant.get_last_pose_time()
        if out is not None:
            published += 1
    assert plant.pose_count == fresh       # dups/reorders dropped
    assert published == fresh              # every fresh pose published
    assert not plant.shutdown
    # the drops are observable, not silent (round-3 advisor finding)
    assert plant.dropped_poses == len(sent) - fresh
    diag = plant.pose_stream_diagnostic()
    assert diag["dropped"] == len(sent) - fresh
    assert diag["level"] in ("ok", "warn")


def test_reset_pose_clock_recovers_restarted_source():
    """A pose source that restarts with a reset clock (looped replay,
    sim restart) would be silently muted by the monotonic-pose guard;
    the diagnostic surfaces it and reset_pose_clock() recovers
    (round-3 advisor finding)."""
    from autorally_tpu.runtime.plant import BasePlant

    plant = BasePlant(dt=0.02, num_timesteps=16)
    for i in range(20):
        plant.receive_state_vector(10.0 + 0.02 * i,
                                   np.zeros(7, np.float32))
    assert plant.pose_count == 20 and plant.dropped_poses == 0

    # the source restarts at t=0: every pose is time-regressed
    for i in range(30):
        assert plant.receive_state_vector(0.02 * i,
                                          np.zeros(7, np.float32)) is None
    assert plant.pose_count == 20
    assert plant.dropped_poses == 30
    assert plant.pose_stream_diagnostic()["level"] == "error"

    # recovery: clear the pose clock, the stream flows again AND the
    # diagnostic stops re-raising the error the reset just addressed
    plant.reset_pose_clock()
    assert plant.dropped_poses == 0
    for i in range(10):
        plant.receive_state_vector(0.02 * i, np.zeros(7, np.float32))
    assert plant.pose_count == 30
    assert plant.get_last_pose_time() == pytest.approx(0.18)
    assert plant.pose_stream_diagnostic()["level"] == "ok"

    # a STILL-broken source after recovery: the diagnostic counts since
    # the reset, so the error signature is reachable again immediately —
    # the healthy pre-reset history must not mask it
    plant.reset_pose_clock()
    for _ in range(4):                       # stuck timestamp: 1 accept,
        plant.receive_state_vector(5.0, np.zeros(7, np.float32))
    d = plant.pose_stream_diagnostic()       # then every pose dropped
    assert d["level"] == "error", d
    assert d["received"] == 1 and d["dropped"] == 3


def test_udp_plant_reorder_over_real_sockets():
    """Same attack through the real UDP link + native ring."""
    from autorally_tpu.runtime.native import UdpLink, native_available
    from autorally_tpu.runtime.udp_plant import UdpPlant

    if not native_available():
        pytest.skip("native lib unavailable")

    plant = UdpPlant(dt=0.02, num_timesteps=16, pose_port=47945,
                     control_port=47946, fmt="state")
    try:
        T = 16
        plant.set_solution(np.zeros((T, 7), np.float32),
                           np.tile([0.05, 0.2], (T, 1)).astype(np.float32),
                           None, ts=0.0)
        seq = [0.02, 0.04, 0.06, 0.04, 0.06, 0.08, 0.02, 0.10]
        for t in seq:
            UdpLink.send(47945, np.array(
                [t, 0, 0, 0, 2.0, 0, 0, 0], dtype=np.float32))
            time.sleep(0.01)
            plant.poll_once()
        assert plant.get_last_pose_time() == pytest.approx(0.10)
        assert not plant.shutdown
    finally:
        plant.stop()


# ---------------------------------------------------------------------------
# Pose dropout: staleness status + watchdog + interpolation refusal
# ---------------------------------------------------------------------------

def test_pose_dropout_degrades_status_and_watchdog():
    from autorally_tpu.runtime.plant import BasePlant, TIMEOUT
    from autorally_tpu.runtime.telemetry import StatusMonitor

    plant = BasePlant(dt=0.02, num_timesteps=100)
    monitor = StatusMonitor()
    assert plant.check_status(0.0) == 1           # not activated
    assert monitor.diagnostic(0.0)["level"] == "error"

    plant.receive_state_vector(1.0, np.zeros(7, np.float32))
    assert plant.check_status(1.1) == 0           # fresh
    monitor.heartbeat(1.1, 0, "ok")
    assert monitor.diagnostic(1.2)["level"] == "ok"

    # the pose stream dies
    stale_t = 1.0 + TIMEOUT + 0.01
    assert plant.check_status(stale_t) == 2       # stale pose
    assert monitor.diagnostic(
        1.1 + StatusMonitor.TIMEOUT + 0.01)["level"] == "error"


def test_wall_clock_staleness_for_realtime_loops():
    """Realtime loops must detect a dead pose stream by RECEIVE-side
    wall time: pose stamps ride the producer's clock (the sim node's
    sim-time over UDP), so comparing them to themselves
    (check_status(get_last_pose_time())) can never go stale — the bug
    the round-3 review caught in both deployment loops."""
    from autorally_tpu.runtime.plant import TIMEOUT, BasePlant

    plant = BasePlant(dt=0.02, num_timesteps=16)
    assert plant.check_status_wall() == 1          # not activated
    # producer clock is unrelated to this host's wall clock
    plant.receive_state_vector(5000.0, np.zeros(7, np.float32))
    assert plant.check_status_wall() == 0          # just arrived
    # the self-comparison that the loops used to do never degrades:
    assert plant.check_status(plant.get_last_pose_time()) == 0
    # the stream dies: rewind the receive stamp past the timeout
    plant.last_pose_mono -= TIMEOUT + 0.01
    assert plant.check_status_wall() == 2          # stale detected


def test_interpolation_refuses_outside_horizon():
    """A solution older than the horizon must publish nothing (the
    interpolation window check, autorally_plant.cpp:215-223) rather than
    extrapolate."""
    from autorally_tpu.runtime.plant import BasePlant

    plant = BasePlant(dt=0.02, num_timesteps=10)
    T = 10
    plant.set_solution(np.zeros((T, 7), np.float32),
                       np.ones((T, 2), np.float32) * 0.3, None, ts=0.0)
    beyond = (T - 1) * 0.02 + 0.01
    assert plant.receive_state_vector(
        beyond, np.zeros(7, np.float32)) is None


def test_nan_solution_brakes_and_shuts_down():
    """NaN reaching publication = zero steering + active brake +
    shutdown (autorally_plant.cpp:353-375)."""
    from autorally_tpu.runtime.plant import BasePlant

    plant = BasePlant(dt=0.02, num_timesteps=8)
    plant.set_solution(np.zeros((8, 7), np.float32),
                       np.full((8, 2), np.nan, np.float32), None, ts=0.0)
    out = plant.receive_state_vector(0.05, np.zeros(7, np.float32))
    assert out == (0.0, -0.99)
    assert plant.shutdown


# ---------------------------------------------------------------------------
# Serial line noise into every framer
# ---------------------------------------------------------------------------

def _garbage(rng, n):
    return bytes(rng.randrange(256) for _ in range(n))


def test_nmea_framer_survives_noise_and_recovers():
    from autorally_tpu.runtime.gps import NmeaFramer, nmea_checksum

    rng = random.Random(3)
    body = ("GPGGA,170000.00,3346.8161,N,08424.0387,W,4,15,0.8,"
            "291.6,M,-30.8,M,1.0,0000")
    sentence = f"${body}*{nmea_checksum(body)}\r\n".encode()
    f = NmeaFramer()
    recovered = 0
    stream = b""
    for _ in range(50):
        stream += _garbage(rng, rng.randrange(0, 120)) + sentence
    # feed in adversarial chunk sizes (split mid-sentence)
    i = 0
    while i < len(stream):
        n = rng.randrange(1, 97)
        recovered += sum(1 for s in f.feed(stream[i:i + n])
                         if s.startswith("GPGGA"))
        i += n
    # a garbage block containing '$' swallows the following sentence
    # (the framer starts there, the real CRLF closes it, the checksum
    # kills it) — so with ~37% of 120-byte random blocks containing
    # '$', most sentences still recover and the framer never wedges
    assert recovered >= 25
    assert f.bad_checksums > 0
    # and it recovers cleanly afterward
    assert sum(1 for s in f.feed(sentence) if s.startswith("GPGGA")) == 1


def test_rtcm3_framer_survives_noise():
    from autorally_tpu.runtime.gps import Rtcm3Framer

    rng = random.Random(4)
    f = Rtcm3Framer()
    for _ in range(200):
        f.feed(_garbage(rng, rng.randrange(0, 64)))   # must not raise


def test_gps_receiver_eats_garbage():
    from autorally_tpu.runtime.gps import GpsReceiver

    rng = random.Random(5)
    rx = GpsReceiver()
    for _ in range(100):
        rx.feed(_garbage(rng, rng.randrange(0, 128)))  # must not raise


def test_chassis_link_noise_and_recovery():
    from autorally_tpu.runtime.chassis import (ActuatorCalibration,
                                               ChassisLink)

    rng = random.Random(6)
    got = []
    link = ChassisLink(fd=-1, calibration=ActuatorCalibration(),
                       on_wheel_speeds=lambda *a: got.append(a))
    frame = b"#w1.0,1.0,2.0,2.0\n"
    stream = b""
    for _ in range(40):
        g = _garbage(rng, rng.randrange(0, 60)).replace(b"#", b"*")
        stream += g + frame
    i = 0
    while i < len(stream):
        n = rng.randrange(1, 33)
        link.process_bytes(stream[i:i + n])
        i += n
    assert len(got) >= 38                 # valid frames recovered
    for lf, rf, lb, rb in got:
        assert lf == pytest.approx(0.19 * math.pi)


def test_runstop_box_garbage_means_stop():
    from autorally_tpu.runtime.runstop_box import RunStopBox

    rng = random.Random(8)
    box = RunStopBox(fd=-1)
    assert not box.motion_enabled
    box.process_bytes(b"#RunStop:GREEN\r\n")
    assert box.motion_enabled
    # line noise replaces the state -> must fail safe (stop)
    box.process_bytes(b"#RunStop:GRE" + _garbage(rng, 8).replace(
        b"\r", b"x") + b"\r\n")
    assert not box.motion_enabled
    # recovery
    box.process_bytes(b"#RunStop:GREEN\r\n")
    assert box.motion_enabled
