"""Operator-console / telemetry-bus / system-status tests (the OCS +
systemStatus + chronyStatus roles, VERDICT round-1 item 9)."""

import json
import os
import socket
import subprocess
import sys
import time

import pytest

from autorally_tpu.runtime.diagnostics import DiagnosticsAggregator
from autorally_tpu.runtime.system_status import (SystemStatusMonitor,
                                                 accelerator_status,
                                                 time_sync_status)
from autorally_tpu.runtime.telemetry_bus import (RunstopReceiver,
                                                 TelemetryBus, send_runstop)
from autorally_tpu.tools.console import ConsoleState


def test_system_status_samples_host():
    agg = DiagnosticsAggregator(publish_hz=1000.0)
    mon = SystemStatusMonitor(agg, period=0.0)
    snap = mon.sample()
    # /proc-backed probes must work on any Linux host
    assert snap["loadavg"] is not None and len(snap["loadavg"]) == 3
    assert snap["memory"]["total_mb"] > 0
    assert 0 <= snap["memory"]["used_pct"] <= 100
    assert snap["disk"]["total_gb"] > 0
    assert snap["network"]["rx_bytes"] >= 0
    # second sample yields a cpu utilization delta
    time.sleep(0.05)
    snap2 = mon.sample()
    assert snap2["cpu_pct"] is not None and 0 <= snap2["cpu_pct"] <= 100
    # diagnostics got populated
    report = agg.maybe_publish(now=time.time() + 10)
    assert "memory" in report["components"]["system"]["entries"]
    assert "disk" in report["components"]["system"]["entries"]


def test_time_sync_status_shape():
    ts = time_sync_status()
    assert "available" in ts
    if ts["available"]:
        assert isinstance(ts["synchronized"], bool)
        assert isinstance(ts["offset_us"], int)


def test_accelerator_status_lists_devices():
    acc = accelerator_status()
    # conftest forces an 8-device virtual CPU platform
    assert acc["device_count"] >= 1
    assert acc["platform"] in ("cpu", "tpu")
    assert len(acc["devices"]) == acc["device_count"]


def test_telemetry_bus_jsonl_and_udp(tmp_path):
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2.0)
    port = rx.getsockname()[1]

    path = str(tmp_path / "run.jsonl")
    bus = TelemetryBus(jsonl_path=path, udp_addr=("127.0.0.1", port))
    bus.publish("solve", {"tick": 3, "ess": 123.4})
    bus.publish("lap", {"lap_number": 1, "lap_time": 58.7})
    bus.close()

    lines = [json.loads(l) for l in open(path)]
    assert [l["kind"] for l in lines] == ["solve", "lap"]
    assert lines[0]["ess"] == 123.4 and "t" in lines[0]

    datagrams = [json.loads(rx.recv(65536).decode()) for _ in range(2)]
    assert {d["kind"] for d in datagrams} == {"solve", "lap"}
    rx.close()


def test_runstop_receiver_conjunction_and_staleness():
    changes = []
    rx = RunstopReceiver(0, on_change=changes.append, stale_s=0.4)
    try:
        assert rx.motion_enabled          # no senders -> default enabled
        send_runstop(rx.port, "ocs", True)
        time.sleep(0.3)
        assert rx.motion_enabled
        # second sender disables -> conjunction goes false
        send_runstop(rx.port, "safety_box", False)
        deadline = time.time() + 2
        while rx.motion_enabled and time.time() < deadline:
            time.sleep(0.02)
        assert not rx.motion_enabled
        assert changes and changes[-1] is False
        # both senders go stale -> back to default
        deadline = time.time() + 2
        while not rx.motion_enabled and time.time() < deadline:
            time.sleep(0.05)
        assert rx.motion_enabled
    finally:
        rx.close()


def test_console_state_render():
    st = ConsoleState(stale_s=100.0)
    st.ingest({"kind": "run", "num_rollouts": 1920, "num_timesteps": 100,
               "hz": 50, "plant": "synthetic_oval"})
    st.ingest({"kind": "solve", "tick": 42, "x": 1.0, "y": -2.0,
               "speed": 5.3, "used": "actual", "ess": 250.0,
               "crash_pct": 2.0, "traj_cost": 0.5})
    st.ingest({"kind": "timing", "avg_tick_ms": 4.2, "tickP50Ms": 4.0,
               "tickP99Ms": 6.0, "budget_ms": 20.0, "missedTicks": 0})
    st.ingest({"kind": "lap", "lap_number": 1, "lap_time": 58.7,
               "max_speed": 7.9, "max_slip": 0.26})
    st.ingest({"kind": "diag", "level": "warn", "components": {
        "chassis": {"level": "warn",
                    "entries": {"serial": {"level": "warn",
                                           "message": "late frames"}}}}})
    st.ingest({"kind": "system", "cpu_pct": 12.0,
               "memory": {"used_pct": 40.0}, "disk": {"used_pct": 60.0},
               "time_sync": {"available": True, "synchronized": True},
               "accelerator": {"device_count": 8, "platform": "cpu"}})
    text = st.render(color=False)
    for needle in ("K=1920", "tick", "speed= 5.30", "ess=  250.0",
                   "p99   6.00", "lap  1", "chassis", "late frames",
                   "clock sync", "8xcpu", "MOTION ENABLED"):
        assert needle in text, (needle, text)
    # staleness marking
    st2 = ConsoleState(stale_s=0.0)
    st2.ingest({"kind": "solve", "tick": 1}, now=time.time() - 10)
    assert "[STALE]" in st2.render(color=False)


def test_console_attaches_to_live_run(tmp_path):
    """End-to-end OCS: a live tube-MPPI run publishes telemetry; the
    console process ingests it, renders a dashboard, and writes the JSONL
    run log."""
    port = 48131
    log = str(tmp_path / "console.jsonl")
    run = subprocess.Popen(
        [sys.executable, "examples/run_tube_mppi.py", "--cpu",
         "--ticks", "120", "--rollouts", "128", "--timesteps", "24",
         "--telemetry-port", str(port)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        console = subprocess.run(
            [sys.executable, "-m", "autorally_tpu.tools.console",
             "--port", str(port), "--duration", "15", "--wait-data", "90",
             "--log", log, "--no-color"],
            capture_output=True, text=True, timeout=150)
        assert console.returncode == 0, console.stdout + console.stderr
        # the dashboard rendered live solver data
        assert "speed=" in console.stdout
        assert "diagnostics" in console.stdout
        recs = [json.loads(l) for l in open(log)]
        kinds = {r["kind"] for r in recs}
        assert {"run", "solve"} <= kinds, kinds
        assert "timing" in kinds or "diag" in kinds, kinds
    finally:
        try:
            run.terminate()
            run.communicate(timeout=15)
        except subprocess.TimeoutExpired:
            run.kill()
            run.communicate()
