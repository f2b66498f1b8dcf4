"""Shared closed-loop lap-evaluation helpers.

One place for the track setup and the episode-metrics extraction used by
``examples/lap_benchmark.py``, ``tools/lap_suite.py`` (the versioned
``LAPS_r*.json`` artifact) and ``tools/ensemble_ab.py`` — the metric set
mirrors the reference's ``lap_stats.py:104-108`` (lap time, max speed,
max slip) plus the plant-level off-track fraction (the costmap's own
crash criterion, ``costs.cu:389-391``, applied to the executed
trajectory).
"""

from __future__ import annotations

import math


def load_track(name: str, ppm: float = 10.0):
    """-> (costmap, start_pose(x, y, yaw), lap_line, crossings_per_lap)."""
    from autorally_tpu.costs.costmap import make_costmap

    if name == "ccrf":
        from autorally_tpu.tools.track_generator import (CCRF_LAP_LINE,
                                                         CCRF_START,
                                                         ccrf_track)
        data, xb, yb = ccrf_track(ppm=ppm)
        start, line, xings = CCRF_START, CCRF_LAP_LINE, 1
    elif name == "marietta":
        from autorally_tpu.tools.track_generator import (MARIETTA_LAP_LINE,
                                                         MARIETTA_START,
                                                         marietta_track)
        data, xb, yb = marietta_track(ppm=ppm)
        start, line, xings = MARIETTA_START, MARIETTA_LAP_LINE, 1
    elif name == "winding":
        from autorally_tpu.tools.track_generator import spline_track
        data, xb, yb = spline_track(track_width=6.0, ppm=ppm)
        # start at the first waypoint, heading along the first segment;
        # lap line = the y=0 crossing near the start
        start, line, xings = ((0.0, 0.0, math.atan2(-2.0, 12.0)),
                              (0.0, 0.0, -3.0, 3.0), 2)
    elif name == "oval":
        from autorally_tpu.tools.track_generator import oval_track
        data, xb, yb = oval_track(half_length=30.0, half_width=18.0,
                                  track_width=6.0, ppm=ppm)
        start, line, xings = ((30.0, 0.0, math.pi / 2),
                              (0.0, 0.0, 25.0, 35.0), 2)
    else:
        raise ValueError(f"unknown track {name!r}")
    return make_costmap(data, xb, yb), start, line, xings


def episode_metrics(res, cm, lap_line, crossings_per_lap: int, dt: float,
                    boundary_threshold: float) -> dict:
    """Summarize an :class:`~autorally_tpu.runtime.episode.EpisodeResult`.

    Lap segmentation follows ``examples/lap_benchmark.py``: tracks whose
    lap line spans only the corridor cross once per circuit; the oval's
    full-width line crosses twice (out and back).
    """
    import jax.numpy as jnp
    import numpy as np

    from autorally_tpu.runtime.telemetry import LapStats

    states = np.asarray(res.states)
    laps = LapStats(line=lap_line)
    for i, s in enumerate(states):
        laps.process_pose(i * dt, s[0], s[1], s[4], s[5])
    segs = [r.lap_time for r in laps.laps]
    full = (segs if crossings_per_lap == 1
            else [segs[i] + segs[i + 1] for i in range(0, len(segs) - 1, 2)])
    max_slip = max((r.max_slip for r in laps.laps), default=0.0)

    vals = np.asarray(cm.lookup_ch0(jnp.asarray(states[:, 0]),
                                    jnp.asarray(states[:, 1])))
    off = vals >= boundary_threshold
    settle = min(200, len(states) // 2)
    return {
        "laps": len(full),
        "lap_times_s": [round(t, 2) for t in full],
        "best_lap_s": round(min(full), 2) if full else None,
        "mean_speed": round(float(states[settle:, 4].mean()), 3),
        "max_speed": round(float(states[:, 4].max()), 3),
        "max_slip": round(float(max_slip), 3),
        "offtrack_frac": round(float(off.mean()), 4),
        "offtrack_ticks": int(off.sum()),
        "rollout_crash_frac": round(
            float(np.asarray(res.crash_frac).mean()), 4),
        "mean_ess": round(float(np.asarray(res.ess).mean()), 1),
    }
