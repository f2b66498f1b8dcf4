"""Cost-function parity tests vs the literal NumPy reference port."""

import numpy as np

import jax.numpy as jnp

from autorally_tpu.config import CostParams
from autorally_tpu.costs import MPPICost
from autorally_tpu.costs.costmap import make_costmap, load_costmap, save_costmap
from autorally_tpu.tools.track_generator import oval_track
from tests.reference_mppi import RefCosts

COST_DICT = dict(desired_speed=8.0, speed_coeff=4.25, track_coeff=200.0,
                 max_slip_ang=1.25, slip_penalty=10.0, track_slop=0.0,
                 crash_coeff=10000.0, steering_coeff=0.5, throttle_coeff=0.25,
                 boundary_threshold=0.65, discount=0.1)


def build_pair():
    data, xb, yb = oval_track(ppm=4.0)
    cm = make_costmap(data, xb, yb)
    ref = RefCosts(data, np.asarray(cm.r_c1), np.asarray(cm.r_c2),
                   np.asarray(cm.trs), COST_DICT)
    cost = MPPICost(l1_cost=False)
    p = CostParams(**COST_DICT)
    return cm, ref, cost, p


def random_states(rng, n, spread=30.0):
    s = rng.randn(n, 7).astype(np.float32)
    s[:, 0] = rng.uniform(-spread, spread, n)
    s[:, 1] = rng.uniform(-spread, spread, n)
    s[:, 2] = rng.uniform(-np.pi, np.pi, n)
    s[:, 4] = rng.uniform(-1, 10, n)
    return s


def test_costmap_lookup_matches_texture(rng):
    cm, ref, _, _ = build_pair()
    xs = rng.uniform(-40, 40, 200).astype(np.float32)
    ys = rng.uniform(-30, 30, 200).astype(np.float32)
    ours = np.asarray(cm.lookup(jnp.asarray(xs), jnp.asarray(ys)))
    for i in range(200):
        u, v = ref._transform(xs[i], ys[i])
        np.testing.assert_allclose(ours[i], ref._tex2d(u, v), rtol=1e-6)


def test_compute_cost_matches_reference(rng):
    cm, ref, cost, p = build_pair()
    n = 256
    states = random_states(rng, n)
    u = rng.uniform(-0.99, 0.65, (n, 2)).astype(np.float32)
    du = (rng.randn(n, 2) * 0.3).astype(np.float32)
    nu = np.array([0.275, 0.3], dtype=np.float32)
    crash0 = rng.randint(0, 2, n).astype(np.int32)

    ours, crash_new = cost.compute_cost(
        p, cm, jnp.asarray(states), jnp.asarray(u), jnp.asarray(du),
        jnp.asarray(nu), jnp.asarray(crash0))
    ours = np.asarray(ours)
    crash_new = np.asarray(crash_new)

    for i in range(n):
        crash = [int(crash0[i])]
        expect = ref.compute_cost(states[i], u[i], du[i], nu, crash)
        np.testing.assert_allclose(ours[i], expect, rtol=2e-4, atol=1e-4,
                                   err_msg=f"state {i}")
        assert crash_new[i] == crash[0]


def test_roll_crash_latch():
    _, _, cost, _ = build_pair()
    s = jnp.array([[0, 0, 0, 1.6, 0, 0, 0], [0, 0, 0, 0.5, 0, 0, 0]],
                  dtype=jnp.float32)
    crash = jnp.array([0, 0], dtype=jnp.int32)
    out = np.asarray(cost.get_crash(s, crash))
    np.testing.assert_array_equal(out, [1, 0])
    # latched: stays 1 even if roll recovers
    out2 = np.asarray(cost.get_crash(
        jnp.zeros((2, 7)), jnp.asarray(out)))
    np.testing.assert_array_equal(out2, [1, 0])


def test_l1_speed_cost():
    cm, _, _, p = build_pair()
    cost_l1 = MPPICost(l1_cost=True)
    cost_l2 = MPPICost(l1_cost=False)
    s = jnp.array([[0.0, 0, 0, 0, 5.0, 0, 0]])
    np.testing.assert_allclose(np.asarray(cost_l1.speed_cost(p, s)),
                               4.25 * 3.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cost_l2.speed_cost(p, s)),
                               4.25 * 9.0, rtol=1e-6)


def test_costmap_npz_roundtrip(tmp_path):
    data, xb, yb = oval_track(ppm=4.0)
    path = str(tmp_path / "map.npz")
    save_costmap(data, xb, yb, 4.0, path)
    cm = load_costmap(path)
    assert cm.data.shape == data.shape
    np.testing.assert_allclose(np.asarray(cm.data), data)


def test_nan_cost_clamped():
    cm, _, cost, p = build_pair()
    s = jnp.array([[0.0, 0, 0, 0, np.nan, 0, 0]], dtype=jnp.float32)
    u = jnp.zeros((1, 2))
    du = jnp.zeros((1, 2))
    nu = jnp.array([0.275, 0.3])
    c, _ = cost.compute_cost(p, cm, s, u, du, nu,
                             jnp.zeros((1,), dtype=jnp.int32))
    assert float(c[0]) == np.float32(1e12)


def test_spline_track_geometry():
    """Winding spline circuit (the CCRF-track role): channel0 ~0 on the
    centerline at every waypoint, >1 far off-track, same npz convention."""
    import jax.numpy as jnp

    from autorally_tpu.costs.costmap import make_costmap
    from autorally_tpu.tools.track_generator import (WINDING_WAYPOINTS,
                                                     spline_track)

    data, xb, yb = spline_track(ppm=4.0)
    cm = make_costmap(data, xb, yb)
    for wx, wy in WINDING_WAYPOINTS:
        v = float(cm.lookup_ch0(jnp.asarray([float(wx)]),
                                jnp.asarray([float(wy)]))[0])
        assert v < 0.15, (wx, wy, v)
    far = float(cm.lookup_ch0(jnp.asarray([xb[0] + 1.0]),
                              jnp.asarray([yb[0] + 1.0]))[0])
    assert far > 1.0
