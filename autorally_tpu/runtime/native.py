"""ctypes bindings for the native real-time runtime (``native/artpu_rt.cpp``).

Provides :class:`Ring` (lock-free SPSC float-record buffer),
:class:`Pacer` (absolute-deadline loop pacing), and :class:`UdpLink`
(binary float-record transport — the role ROS pub/sub plays for the
reference).  The shared library builds on demand with ``make`` on first
use; ``native_available()`` reports whether it loaded.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libartpu_rt.so")


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.artpu_ring_create.restype = ctypes.c_void_p
    lib.artpu_ring_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
    lib.artpu_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.artpu_ring_push.restype = ctypes.c_int
    lib.artpu_ring_push.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_float)]
    lib.artpu_ring_pop.restype = ctypes.c_int
    lib.artpu_ring_pop.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_float)]
    lib.artpu_ring_pop_latest.restype = ctypes.c_int
    lib.artpu_ring_pop_latest.argtypes = [ctypes.c_void_p,
                                          ctypes.POINTER(ctypes.c_float)]
    lib.artpu_ring_dropped.restype = ctypes.c_uint64
    lib.artpu_ring_dropped.argtypes = [ctypes.c_void_p]
    lib.artpu_pace_create.restype = ctypes.c_void_p
    lib.artpu_pace_create.argtypes = [ctypes.c_int64]
    lib.artpu_pace_destroy.argtypes = [ctypes.c_void_p]
    lib.artpu_pace_wait.restype = ctypes.c_int
    lib.artpu_pace_wait.argtypes = [ctypes.c_void_p]
    lib.artpu_pace_ticks.restype = ctypes.c_uint64
    lib.artpu_pace_ticks.argtypes = [ctypes.c_void_p]
    lib.artpu_pace_missed.restype = ctypes.c_uint64
    lib.artpu_pace_missed.argtypes = [ctypes.c_void_p]
    lib.artpu_udp_rx_start.restype = ctypes.c_void_p
    lib.artpu_udp_rx_start.argtypes = [ctypes.c_uint16, ctypes.c_void_p,
                                       ctypes.c_size_t]
    lib.artpu_udp_rx_stop.argtypes = [ctypes.c_void_p]
    lib.artpu_udp_rx_received.restype = ctypes.c_uint64
    lib.artpu_udp_rx_received.argtypes = [ctypes.c_void_p]
    lib.artpu_udp_send.restype = ctypes.c_int
    lib.artpu_udp_send.argtypes = [ctypes.c_uint16,
                                   ctypes.POINTER(ctypes.c_float),
                                   ctypes.c_size_t]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


class Ring:
    """Lock-free SPSC ring of fixed-size float records (latest-wins)."""

    def __init__(self, capacity: int, record_len: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable (build failed)")
        self._lib = lib
        self.record_len = record_len
        self._h = lib.artpu_ring_create(capacity, record_len)
        self._buf = (ctypes.c_float * record_len)()

    def push(self, rec: np.ndarray) -> bool:
        """Returns True if an old record was dropped to make room."""
        rec = np.ascontiguousarray(rec, dtype=np.float32)
        ptr = rec.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        return bool(self._lib.artpu_ring_push(self._h, ptr))

    def pop(self) -> Optional[np.ndarray]:
        if self._lib.artpu_ring_pop(self._h, self._buf):
            return np.ctypeslib.as_array(self._buf).copy()
        return None

    def pop_latest(self) -> Optional[np.ndarray]:
        """Drain; return the newest record (None if empty)."""
        n = self._lib.artpu_ring_pop_latest(self._h, self._buf)
        if n:
            return np.ctypeslib.as_array(self._buf).copy()
        return None

    @property
    def dropped(self) -> int:
        return int(self._lib.artpu_ring_dropped(self._h))

    def close(self):
        if self._h:
            self._lib.artpu_ring_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class Pacer:
    """Absolute-deadline loop pacing (clock_nanosleep TIMER_ABSTIME)."""

    def __init__(self, period_s: float):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = lib.artpu_pace_create(int(period_s * 1e9))

    def wait(self) -> int:
        """Sleep to the next deadline; returns missed whole periods."""
        return int(self._lib.artpu_pace_wait(self._h))

    @property
    def ticks(self) -> int:
        return int(self._lib.artpu_pace_ticks(self._h))

    @property
    def missed(self) -> int:
        return int(self._lib.artpu_pace_missed(self._h))

    def close(self):
        if self._h:
            self._lib.artpu_pace_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class UdpLink:
    """Loopback UDP float-record transport into a :class:`Ring`."""

    def __init__(self, port: int, ring: Ring):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self.port = port
        self._h = lib.artpu_udp_rx_start(port, ring._h, ring.record_len)
        if not self._h:
            raise OSError(f"failed to bind UDP port {port}")

    @staticmethod
    def send(port: int, rec: np.ndarray) -> None:
        lib = _load()
        rec = np.ascontiguousarray(rec, dtype=np.float32)
        ptr = rec.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        if lib.artpu_udp_send(port, ptr, rec.size) != 0:
            raise OSError("udp send failed")

    @property
    def received(self) -> int:
        return int(self._lib.artpu_udp_rx_received(self._h))

    def close(self):
        if self._h:
            self._lib.artpu_udp_rx_stop(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
