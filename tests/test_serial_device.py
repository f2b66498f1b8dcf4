"""Serial transport layer tests (SerialInterfaceThreaded/SerialCommon
role), driven through a pty — the reference's own serial-test technique
(``serialSensorInterfaceTest.cpp:36``)."""

import os
import pty
import threading
import time

import pytest

from autorally_tpu.runtime.diagnostics import Diagnostics
from autorally_tpu.runtime.serial_device import (SerialDeviceThreaded,
                                                 SerialSettings,
                                                 configure_port)


def _raw_pty():
    """A pty pair with the slave in raw mode (fresh ptys are canonical +
    echo, which line-buffers reads and echoes writes back at the
    master — real serial ports opened by open_serial_port are raw)."""
    master, slave = pty.openpty()
    configure_port(slave, SerialSettings())
    return master, slave


def _wait_for(pred, timeout=5.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(0.01)
    return False


def test_reader_buffers_and_fires_callback():
    master, slave = _raw_pty()
    dev = SerialDeviceThreaded(slave, name="test")
    fired = threading.Event()
    dev.register_data_callback(fired.set)
    dev.start()
    try:
        os.write(master, b"hello ")
        os.write(master, b"world")
        assert _wait_for(lambda: len(dev.data) == 11)
        assert fired.is_set()
        assert dev.take(5) == b"hello"
        assert dev.take() == b" world"
        assert dev.data == b""
    finally:
        dev.close()
        os.close(master)


def test_quiet_second_raises_diag_warning():
    master, slave = pty.openpty()
    diag = Diagnostics("serial")
    dev = SerialDeviceThreaded(slave, diagnostics=diag, name="gps_a")
    dev.start()
    try:
        assert _wait_for(lambda: "gps_a" in diag.entries, timeout=3.0)
        entry = diag.entries["gps_a"]
        assert "No data" in entry.message
    finally:
        dev.close()
        os.close(master)


def test_write_port_and_write_try():
    master, slave = pty.openpty()
    dev = SerialDeviceThreaded(slave, name="test")
    assert dev.write_port(b"x") == -1          # not started yet
    dev.start()
    try:
        assert dev.write_port(b"ping") == 4
        assert os.read(master, 16) == b"ping"
        # write_try skips when the lock is held
        dev._write_lock.acquire()
        try:
            assert dev.write_try(b"nope") == -1
        finally:
            dev._write_lock.release()
        assert dev.write_try(b"yes") == 3
        assert os.read(master, 16) == b"yes"
    finally:
        dev.close()
        os.close(master)


def test_clean_shutdown_on_peer_close():
    master, slave = _raw_pty()
    dev = SerialDeviceThreaded(slave, name="test")
    dev.start()
    os.write(master, b"last")
    assert _wait_for(lambda: dev.data == b"last")
    os.close(master)                           # EOF
    assert _wait_for(lambda: not dev._thread.is_alive(), timeout=3.0)
    dev.close()


def test_status_tick_levels():
    master, slave = pty.openpty()
    diag = Diagnostics("serial")
    dev = SerialDeviceThreaded(slave, diagnostics=diag, name="chassis")
    dev.status_tick()
    assert diag.entries["chassis"].message == "Not connected"
    dev.start()
    try:
        dev.status_tick()
        assert diag.entries["chassis"].message == "Connected"
    finally:
        dev.close()
        os.close(master)


def test_configure_port_applies_termios_settings():
    import termios

    master, slave = pty.openpty()
    try:
        configure_port(slave, SerialSettings(baud=57600, parity="even",
                                             stop_bits=2, data_bits=7))
        attrs = termios.tcgetattr(slave)
        # the pty driver ignores parity/char-size/stop bits (meaningless
        # off a real UART) but honors speed and the raw-mode flags
        assert attrs[4] == termios.B57600
        assert not (attrs[3] & termios.ICANON)
        assert not (attrs[3] & termios.ECHO)
    finally:
        os.close(master)
        os.close(slave)


def test_configure_port_rejects_bad_settings():
    master, slave = pty.openpty()
    try:
        with pytest.raises(ValueError):
            configure_port(slave, SerialSettings(baud=12345))
        with pytest.raises(ValueError):
            configure_port(slave, SerialSettings(parity="marsian"))
        with pytest.raises(ValueError):
            configure_port(slave, SerialSettings(data_bits=5))
        with pytest.raises(ValueError):
            configure_port(slave, SerialSettings(stop_bits=3))
    finally:
        os.close(master)
        os.close(slave)


def test_chassis_link_rides_the_shared_transport():
    from autorally_tpu.runtime.chassis import ActuatorCalibration, ChassisLink

    master, slave = _raw_pty()
    speeds = []
    link = ChassisLink(slave, ActuatorCalibration(),
                       on_wheel_speeds=lambda *s: speeds.append(s))
    link.start()
    try:
        assert isinstance(link._device, SerialDeviceThreaded)
        os.write(master, b"#w1.0,1.0,2.0,2.0\n")
        assert _wait_for(lambda: len(speeds) == 1)
        link.send_command(0.0, 0.5)
        frame = os.read(master, 16)
        assert frame.startswith(b"#s") and frame.endswith(b"\n")
    finally:
        link.stop()
        os.close(master)
        os.close(slave)


def test_scan_hash_frames_framing_and_garbage_bounds():
    from autorally_tpu.runtime.serial_device import scan_hash_frames

    # normal framing: garbage prefix dropped, partial tail carried over
    frames, rest = scan_hash_frames("junk#a:1\r\n#b:2\r\n#c")
    assert frames == ["a:1", "b:2"]
    assert rest == "#c"
    # no '#' anywhere: wrong-baud noise must not accumulate
    frames, rest = scan_hash_frames("x" * 10000)
    assert frames == [] and rest == ""
    # '#' followed by unbounded garbage without CRLF: trimmed, and a
    # later '#' resumes the partial frame
    frames, rest = scan_hash_frames("#" + "y" * 9000 + "#ok:GREEN")
    assert frames == [] and rest == "#ok:GREEN"
    frames, rest = scan_hash_frames(rest + "\r\n")
    assert frames == ["ok:GREEN"] and rest == ""


def test_runstop_box_buffer_bounded_on_noise():
    """Regression: a noisy line with no '#' framing must not grow the
    runstop driver's buffer without bound."""
    from autorally_tpu.runtime.runstop_box import RunStopBox

    box = RunStopBox(fd=-1)
    for _ in range(50):
        box.process_bytes(b"\xff\xfe garbage without framing " * 40)
    assert len(box._buf) <= 8192
    assert box.motion_enabled is False
    box.process_bytes(b"#RunStop:GREEN\r\n")
    assert box.state == "GREEN"
