"""Native runtime tests: ring buffer, pacer, UDP link."""

import threading
import time

import numpy as np
import pytest

from autorally_tpu.runtime.native import (Pacer, Ring, UdpLink,
                                          native_available)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native lib unavailable")


def test_ring_fifo_order():
    r = Ring(capacity=8, record_len=3)
    for i in range(5):
        r.push(np.array([i, i + 0.5, i + 0.25], dtype=np.float32))
    for i in range(5):
        rec = r.pop()
        np.testing.assert_allclose(rec, [i, i + 0.5, i + 0.25])
    assert r.pop() is None


def test_ring_overwrite_oldest():
    r = Ring(capacity=4, record_len=1)
    for i in range(10):
        r.push(np.array([float(i)], dtype=np.float32))
    assert r.dropped == 6
    latest = r.pop_latest()
    np.testing.assert_allclose(latest, [9.0])
    assert r.pop() is None


def test_ring_latest_wins():
    r = Ring(capacity=64, record_len=2)
    assert r.pop_latest() is None
    for i in range(20):
        r.push(np.array([i, -i], dtype=np.float32))
    np.testing.assert_allclose(r.pop_latest(), [19, -19])


def test_ring_threaded_producer():
    r = Ring(capacity=1024, record_len=2)
    n = 5000

    def produce():
        for i in range(n):
            r.push(np.array([i, 2 * i], dtype=np.float32))

    t = threading.Thread(target=produce)
    t.start()
    seen = 0
    last = -1
    deadline = time.time() + 10
    while seen < 100 and time.time() < deadline:
        rec = r.pop()
        if rec is not None:
            assert rec[1] == 2 * rec[0]
            assert rec[0] > last     # monotone even with drops
            last = rec[0]
            seen += 1
    t.join()
    assert seen >= 100


def test_ring_pop_full_idle_producer_terminates():
    """Regression: pop from an exactly-full ring with an idle producer.

    The pre-seqlock torn-read check treated head - tail == capacity as
    "possibly torn" and retried forever — a full, quiescent ring (every
    overwrite push leaves one behind) livelocked the consumer once the
    producer went idle."""
    r = Ring(capacity=4, record_len=1)
    for i in range(9):                       # leaves head - tail == capacity
        r.push(np.array([float(i)], dtype=np.float32))
    got = []

    def drain():
        while True:
            rec = r.pop()
            if rec is None:
                return
            got.append(float(rec[0]))

    t = threading.Thread(target=drain, daemon=True)
    t.start()
    t.join(timeout=5.0)
    assert not t.is_alive(), "pop livelocked on a full idle ring"
    assert got == [5.0, 6.0, 7.0, 8.0]


def test_ring_push_reports_drops_consistently():
    """push() returns True exactly when the dropped counter increments."""
    r = Ring(capacity=2, record_len=1)
    flags = [r.push(np.array([float(i)], dtype=np.float32))
             for i in range(6)]
    assert sum(flags) == r.dropped == 4


def test_ring_no_torn_records_under_heavy_overwrite():
    """Tiny ring + fast producer: every popped record must be internally
    consistent (the seqlock must reject torn copies)."""
    r = Ring(capacity=2, record_len=2)
    stop = threading.Event()

    def produce():
        i = 0
        while not stop.is_set():
            r.push(np.array([i, 3.0 * i], dtype=np.float32))
            i += 1

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    try:
        checked = 0
        deadline = time.time() + 3
        last = -1.0
        while checked < 2000 and time.time() < deadline:
            rec = r.pop()
            if rec is not None:
                assert rec[1] == 3.0 * rec[0], rec
                assert rec[0] > last
                last = rec[0]
                checked += 1
        assert checked >= 500
    finally:
        stop.set()
        t.join()


def test_pacer_period_accuracy():
    p = Pacer(0.005)  # 200 Hz
    t0 = time.perf_counter()
    missed = 0
    for _ in range(40):
        missed += p.wait()
    elapsed = time.perf_counter() - t0
    # 40 periods of 5 ms = 200 ms; generous bounds for a shared VM
    assert 0.18 < elapsed < 0.4, elapsed
    assert p.ticks == 40


def test_pacer_reports_missed_ticks():
    p = Pacer(0.002)
    p.wait()
    time.sleep(0.02)  # overrun by ~10 periods
    missed = p.wait()
    assert missed >= 5


def test_udp_roundtrip():
    ring = Ring(capacity=128, record_len=4)
    link = UdpLink(47654, ring)
    try:
        for i in range(10):
            UdpLink.send(47654, np.array([i, 1, 2, 3], dtype=np.float32))
        deadline = time.time() + 5
        while link.received < 10 and time.time() < deadline:
            time.sleep(0.01)
        assert link.received == 10
        latest = ring.pop_latest()
        np.testing.assert_allclose(latest, [9, 1, 2, 3])
    finally:
        link.close()
