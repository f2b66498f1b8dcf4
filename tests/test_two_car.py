"""Multi-vehicle interaction (the XBee pose-sharing role closed through
the planner): mutual avoidance via live CostParams.obstacles."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))


def test_pass_disabled_vehicle():
    """The follower must plan around a car parked on its racing line —
    clearing it and continuing — and would hit it without the term."""
    from two_car_demo import CAR_RADIUS, run_two_cars

    sa, sb = run_two_cars(ticks=500, rollouts=192, timesteps=40,
                          desired_speed=4.5, parked=True)
    d = np.hypot(sa[:, 0] - sb[:, 0], sa[:, 1] - sb[:, 1])
    assert np.isfinite(sa).all()
    assert d.min() > 2 * CAR_RADIUS, f"collision: {d.min():.2f} m"
    ang = lambda s: np.unwrap(np.arctan2(s[:, 1] / 18.0, s[:, 0] / 30.0))
    assert ang(sa)[-1] > ang(sb)[-1], "never passed the parked car"

    sa0, sb0 = run_two_cars(ticks=500, rollouts=192, timesteps=40,
                            desired_speed=4.5, parked=True, avoid=False)
    d0 = np.hypot(sa0[:, 0] - sb0[:, 0], sa0[:, 1] - sb0[:, 1])
    assert d0.min() < d.min(), "baseline should cut it closer"


def test_follow_keeps_safe_gap():
    """Fast follower behind a slow leader: yields to a collision-free
    following gap (no lane-change prior => ACC-like emergent behavior)."""
    from two_car_demo import CAR_RADIUS, run_two_cars

    sa, sb = run_two_cars(ticks=300, rollouts=192, timesteps=40,
                          desired_speed=4.5, slow_speed=2.0)
    d = np.hypot(sa[:, 0] - sb[:, 0], sa[:, 1] - sb[:, 1])
    assert np.isfinite(sa).all() and np.isfinite(sb).all()
    assert d.min() > 2 * CAR_RADIUS, f"collision: {d.min():.2f} m"
