"""Costmap generation tools.

Covers the reference's offline map tooling
(``scripts/track_generator.py`` — image -> ``.npz`` costmap, and
``scripts/track_converter.py`` — legacy ``.txt`` -> ``.npz``), plus a
*synthetic track generator*: the reference repo ships its costmap blobs
stripped (``params/maps/.MISSING_LARGE_BLOBS``), so tests and benchmarks
here build procedural tracks in the exact same ``.npz`` format
(``params/maps/README.md``): channel0 is 0 at the track centerline, 1 at
the boundary, and >1 off-track.
"""

from __future__ import annotations

import argparse
from typing import Tuple

import numpy as np

from autorally_tpu.costs.costmap import make_costmap, save_costmap, Costmap


def oval_track(half_length: float = 25.0, half_width: float = 15.0,
               track_width: float = 5.0, ppm: float = 10.0,
               margin: float = 10.0) -> Tuple[np.ndarray, tuple, tuple]:
    """Procedural oval (ellipse) track costmap.

    Returns ``(data (H, W, 4), x_bounds, y_bounds)``.  channel0 encodes
    normalized distance from the track centerline: 0 on the centerline,
    1.0 at the track edge, growing beyond 1 off-track — the convention the
    cost function's ``boundary_threshold`` crash check expects
    (``costs.cu:389-391``, ``params/maps/README.md``).
    """
    x_min, x_max = -half_length - margin, half_length + margin
    y_min, y_max = -half_width - margin, half_width + margin
    W = int((x_max - x_min) * ppm)
    H = int((y_max - y_min) * ppm)
    xs = x_min + (np.arange(W) + 0.5) / ppm
    ys = y_min + (np.arange(H) + 0.5) / ppm
    X, Y = np.meshgrid(xs, ys)

    # Distance to the ellipse centerline, approximated via the radial
    # parameterization (exact enough for a cost surface).
    theta = np.arctan2(Y / half_width, X / half_length)
    cx = half_length * np.cos(theta)
    cy = half_width * np.sin(theta)
    dist = np.hypot(X - cx, Y - cy)

    channel0 = (2.0 * dist / track_width).astype(np.float32)
    data = np.zeros((H, W, 4), dtype=np.float32)
    data[..., 0] = channel0
    return data, (x_min, x_max), (y_min, y_max)


def straight_track(length: float = 200.0, track_width: float = 8.0,
                   ppm: float = 10.0, margin: float = 10.0
                   ) -> Tuple[np.ndarray, tuple, tuple]:
    """Infinite-straightaway costmap along +x (for speed/regression tests)."""
    x_min, x_max = -margin, length + margin
    y_min, y_max = -track_width / 2 - margin, track_width / 2 + margin
    W = int((x_max - x_min) * ppm)
    H = int((y_max - y_min) * ppm)
    ys = y_min + (np.arange(H) + 0.5) / ppm
    channel0 = (2.0 * np.abs(ys) / track_width).astype(np.float32)
    data = np.zeros((H, W, 4), dtype=np.float32)
    data[..., 0] = channel0[:, None]
    return data, (x_min, x_max), (y_min, y_max)


#: A winding closed circuit in the spirit of the reference's CCRF kart
#: track (the real costmap blobs are stripped upstream): alternating
#: left/right curves, a hairpin, and two straights, ~175 m lap length.
WINDING_WAYPOINTS = (
    (0.0, 0.0), (12.0, -2.0), (24.0, 0.0), (32.0, 6.0), (34.0, 14.0),
    (28.0, 20.0), (20.0, 18.0), (14.0, 22.0), (14.0, 30.0), (22.0, 34.0),
    (30.0, 32.0), (38.0, 34.0), (42.0, 40.0), (38.0, 46.0), (28.0, 46.0),
    (16.0, 44.0), (6.0, 46.0), (-2.0, 42.0), (-6.0, 34.0), (-4.0, 26.0),
    (-8.0, 18.0), (-10.0, 10.0), (-6.0, 2.0),
)


def spline_track(waypoints=WINDING_WAYPOINTS, track_width: float = 6.0,
                 ppm: float = 10.0, margin: float = 10.0,
                 samples_per_meter: float = 20.0
                 ) -> Tuple[np.ndarray, tuple, tuple]:
    """Closed circuit through waypoints via a periodic cubic spline.

    The synthetic stand-in for a real surveyed track (the reference's
    CCRF/Marietta maps are stripped from its repo): channel0 is the
    normalized distance to the spline centerline — 0 on the centerline,
    1 at the edge, >1 off-track — same convention as :func:`oval_track`.
    """
    from scipy.interpolate import CubicSpline
    from scipy.spatial import cKDTree

    wp = np.asarray(waypoints, dtype=np.float64)
    pts = np.vstack([wp, wp[:1]])                # close the loop
    seg = np.hypot(*np.diff(pts, axis=0).T)
    t = np.concatenate([[0.0], np.cumsum(seg)])
    cs_x = CubicSpline(t, pts[:, 0], bc_type="periodic")
    cs_y = CubicSpline(t, pts[:, 1], bc_type="periodic")
    s = np.linspace(0.0, t[-1], int(t[-1] * samples_per_meter),
                    endpoint=False)
    center = np.stack([cs_x(s), cs_y(s)], axis=1)

    x_min = center[:, 0].min() - margin
    x_max = center[:, 0].max() + margin
    y_min = center[:, 1].min() - margin
    y_max = center[:, 1].max() + margin
    W = int((x_max - x_min) * ppm)
    H = int((y_max - y_min) * ppm)
    xs = x_min + (np.arange(W) + 0.5) / ppm
    ys = y_min + (np.arange(H) + 0.5) / ppm
    X, Y = np.meshgrid(xs, ys)
    grid = np.stack([X.ravel(), Y.ravel()], axis=1)
    dist, _ = cKDTree(center).query(grid, k=1)
    channel0 = (2.0 * dist.reshape(H, W) / track_width).astype(np.float32)
    data = np.zeros((H, W, 4), dtype=np.float32)
    data[..., 0] = channel0
    return data, (x_min, x_max), (y_min, y_max)


def make_oval_costmap(**kw) -> Costmap:
    data, xb, yb = oval_track(**kw)
    return make_costmap(data, xb, yb)


def make_spline_costmap(**kw) -> Costmap:
    data, xb, yb = spline_track(**kw)
    return make_costmap(data, xb, yb)


def make_straight_costmap(**kw) -> Costmap:
    data, xb, yb = straight_track(**kw)
    return make_costmap(data, xb, yb)


def gen_costmap_from_image(input_img: str, config_file: str,
                           output_name: str) -> None:
    """Image -> ``.npz`` costmap (parity with ``scripts/track_generator.py``):
    per-channel offset/normalize, channel remap, optional vertical flip."""
    from PIL import Image

    with open(config_file, "r") as f:
        cfg = eval(f.read())  # the reference config files are Python dicts

    img = Image.open(input_img).rotate(cfg["imageRotation"])
    data = np.array(img, dtype=np.float32)
    for i, ch in enumerate("rgba"):
        data[:, :, i] = (data[:, :, i] + cfg[f"{ch}Offset"]) / cfg[f"{ch}Normalizer"]
    costmap = np.copy(data)
    for i in range(4):
        costmap[:, :, cfg["channelMap"][i]] = data[:, :, i]
    if cfg["flip"]:
        for i in range(4):
            costmap[:, :, i] = np.flipud(costmap[:, :, i])
    save_costmap(costmap, cfg["xBounds"], cfg["yBounds"],
                 cfg["pixelsPerMeter"], output_name)


def convert_legacy_txt(input_txt: str, output_name: str) -> None:
    """Legacy ``.txt`` costmap -> ``.npz`` (parity with
    ``scripts/track_converter.py``): whitespace-separated
    [x_min x_max y_min y_max ppm v0 v1 ...] with channel 0 data only."""
    with open(input_txt) as f:
        cmap = f.read().split(" ")
    x_bounds = np.array(cmap[0:2], dtype=np.float32)
    y_bounds = np.array(cmap[2:4], dtype=np.float32)
    ppm = float(cmap[4])
    channel0 = np.array([c for c in cmap[5:] if c.strip()], dtype=np.float32)
    H = int((y_bounds[1] - y_bounds[0]) * ppm)
    W = int((x_bounds[1] - x_bounds[0]) * ppm)
    data = np.zeros((H, W, 4), dtype=np.float32)
    data[..., 0] = channel0.reshape(H, W)
    save_costmap(data, x_bounds, y_bounds, ppm, output_name)


def main() -> None:
    p = argparse.ArgumentParser(description="Generate a costmap .npz")
    sub = p.add_subparsers(dest="cmd", required=True)

    po = sub.add_parser("oval", help="synthetic oval track")
    po.add_argument("-o", "--output", default="oval_costmap.npz")
    po.add_argument("--half-length", type=float, default=25.0)
    po.add_argument("--half-width", type=float, default=15.0)
    po.add_argument("--track-width", type=float, default=5.0)
    po.add_argument("--ppm", type=float, default=10.0)

    pi = sub.add_parser("image", help="image -> costmap (reference parity)")
    pi.add_argument("-i", "--input", required=True)
    pi.add_argument("-c", "--config", required=True)
    pi.add_argument("-o", "--output", default="map.npz")

    pc = sub.add_parser("convert", help="legacy .txt -> .npz")
    pc.add_argument("-i", "--input", required=True)
    pc.add_argument("-o", "--output", default="map.npz")

    ps = sub.add_parser("spline", help="closed spline circuit through "
                                       "waypoints (default: the winding "
                                       "CCRF-role circuit)")
    ps.add_argument("-o", "--output", default="spline_costmap.npz")
    ps.add_argument("--waypoints", default=None,
                    help="semicolon-separated 'x,y' pairs; default = the "
                         "built-in winding circuit")
    ps.add_argument("--track-width", type=float, default=6.0)
    ps.add_argument("--ppm", type=float, default=10.0)

    args = p.parse_args()
    if args.cmd == "convert":
        convert_legacy_txt(args.input, args.output)
        print(f"wrote {args.output}")
        return
    if args.cmd == "oval":
        data, xb, yb = oval_track(half_length=args.half_length,
                                  half_width=args.half_width,
                                  track_width=args.track_width, ppm=args.ppm)
        save_costmap(data, xb, yb, args.ppm, args.output)
        print(f"wrote {args.output}: {data.shape[1]}x{data.shape[0]} px")
    elif args.cmd == "spline":
        wps = WINDING_WAYPOINTS
        if args.waypoints:
            try:
                wps = [tuple(float(v) for v in c.split(","))
                       for c in args.waypoints.split(";") if c.strip()]
                if len(wps) < 3 or any(len(w) != 2 for w in wps):
                    raise ValueError("need >= 3 'x,y' pairs")
            except ValueError as e:
                p.error(f"--waypoints expects 'x,y;x,y;...' "
                        f"(>= 3 pairs): {e}")
        data, xb, yb = spline_track(waypoints=wps,
                                    track_width=args.track_width,
                                    ppm=args.ppm)
        save_costmap(data, xb, yb, args.ppm, args.output)
        print(f"wrote {args.output}: {data.shape[1]}x{data.shape[0]} px")
    else:
        gen_costmap_from_image(args.input, args.config, args.output)


if __name__ == "__main__":
    main()
