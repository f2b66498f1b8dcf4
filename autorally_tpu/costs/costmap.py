"""Costmap container, ``.npz`` interchange, and world->map transform.

Replaces the reference's CUDA-texture costmap path
(``costs.cu:68-154, 190-232``): the 4-channel float costmap lives as a
``(H, W, 4)`` device array, and the texture's point-sample-with-clamp
lookup (``cudaFilterModePoint`` + ``cudaAddressModeClamp`` + normalized
coords, ``costs.cu:143-149``) becomes an integer gather with clamped
indices — bit-matching the texture semantics without texture hardware.

``.npz`` format parity (``costs.cu:190-232``, documented in
``params/maps/README.md``): keys ``xBounds``, ``yBounds``,
``pixelsPerMeter``, ``channel0..channel3`` (row-major, W = (x_max-x_min)*ppm
columns).  The world->normalized-map transform is the same projective form
(``costs.cu:176-188, 351-357``): column-scaled rotation ``r_c1, r_c2`` plus
translation ``trs`` with homogeneous divide.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


LANE = 128  # TPU vector lane width; row size of the fast-gather layout


@dataclasses.dataclass(frozen=True)
class Costmap:
    """4-channel track costmap + projective world->map transform.

    ``data``: (H, W, 4) float32.  Channel 0 is the track cost surface
    (0 = centerline, 1 = boundary, >1 off-track); channels 1-3 free for
    derived costs (``params/maps/README.md``).

    ``ch0_rows``: channel 0 re-laid-out as (H * ceil(W/128), 128) rows.
    TPU has no texture unit and XLA's pointwise gather runs at ~15 ns per
    element; gathering aligned 128-lane *rows* instead is ~4x faster
    (latency-bound row fetches), with the final lane select done as a
    one-hot multiply on the VPU.  This layout serves the hot path
    (:meth:`lookup_ch0` — the track cost reads only channel 0,
    ``costs.cu:379-380``); :meth:`lookup` keeps the full 4-channel result
    for debug/extension paths.

    ``r_c1``, ``r_c2``, ``trs``: columns of the projective transform, as in
    ``CostParams`` (``costs.cuh:80-85``).  For an axis-aligned map these are
    ``r_c1=(1/(xmax-xmin),0,0)``, ``r_c2=(0,1/(ymax-ymin),0)``,
    ``trs=(-xmin/(xmax-xmin), -ymin/(ymax-ymin), 1)`` (``costs.cu:226-229``).
    """

    data: jnp.ndarray
    ch0_rows: jnp.ndarray
    r_c1: jnp.ndarray
    r_c2: jnp.ndarray
    trs: jnp.ndarray
    # (Wblk, Hp, 128) VMEM panel layout for the exact fused Pallas kernels
    # (ops/rollout_kernel.exact_map_tiles), or None when the padded map
    # exceeds the kernel's VMEM budget.  Precomputed here so the per-solve
    # jitted program takes it as an input instead of re-padding and
    # transposing the whole map every replan.
    ch0_tiles: jnp.ndarray = None

    @property
    def height(self) -> int:
        return self.data.shape[0]

    @property
    def width(self) -> int:
        return self.data.shape[1]

    @classmethod
    def build(cls, data: jnp.ndarray, r_c1, r_c2, trs,
              row_lanes: int = 32) -> "Costmap":
        """Construct from (H, W, 4) data, deriving the fast-gather layout.

        ``row_lanes`` trades gather-row DMA latency against materialized
        intermediate size (N x row_lanes floats per lookup batch).
        """
        data = jnp.asarray(data, dtype=jnp.float32)
        H, W = data.shape[:2]
        Wp = -(-W // row_lanes) * row_lanes
        ch0 = jnp.pad(data[..., 0], ((0, 0), (0, Wp - W)))
        from autorally_tpu.ops.rollout_kernel import exact_map_tiles
        return cls(data, ch0.reshape(H * (Wp // row_lanes), row_lanes),
                   r_c1, r_c2, trs, exact_map_tiles(data[..., 0]))

    @property
    def bounds(self) -> Tuple[Tuple[float, float], Tuple[float, float]]:
        """((xmin, xmax), (ymin, ymax)) world bounds — inverse of the
        axis-aligned transform built by :func:`make_costmap`."""
        import numpy as np

        r1 = float(np.asarray(self.r_c1)[0])
        r2 = float(np.asarray(self.r_c2)[1])
        t = np.asarray(self.trs)
        xmin, ymin = -float(t[0]) / r1, -float(t[1]) / r2
        return (xmin, xmin + 1.0 / r1), (ymin, ymin + 1.0 / r2)

    def world_to_norm(self, x: jnp.ndarray, y: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Projective transform of world (x, y) to normalized map coords
        (``coorTransform``, ``costs.cu:351-357``)."""
        u = self.r_c1[0] * x + self.r_c2[0] * y + self.trs[0]
        v = self.r_c1[1] * x + self.r_c2[1] * y + self.trs[1]
        w = self.r_c1[2] * x + self.r_c2[2] * y + self.trs[2]
        return u / w, v / w

    def lookup(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """Point-sample all 4 channels at world (x, y): (...,) -> (..., 4).

        Matches CUDA ``tex2D`` with normalized coords, point filtering and
        clamp addressing (``costs.cu:143-149``): texel = floor(coord * size),
        clamped to the valid range.  NaN coordinates are routed to texel 0
        (the result is garbage either way; the cost clamp at 1e12 catches it,
        ``costs.cu:405-407``).
        """
        u, v = self.world_to_norm(x, y)
        ix = jnp.clip(jnp.nan_to_num(jnp.floor(u * self.width)),
                      0, self.width - 1).astype(jnp.int32)
        iy = jnp.clip(jnp.nan_to_num(jnp.floor(v * self.height)),
                      0, self.height - 1).astype(jnp.int32)
        return self.data[iy, ix]

    def lookup_ch0(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """Point-sample channel 0 at world (x, y) via the fast row-gather
        layout: (...,) -> (...,).  Texture semantics identical to
        :meth:`lookup`."""
        u, v = self.world_to_norm(x, y)
        ix = jnp.clip(jnp.nan_to_num(jnp.floor(u * self.width)),
                      0, self.width - 1).astype(jnp.int32)
        iy = jnp.clip(jnp.nan_to_num(jnp.floor(v * self.height)),
                      0, self.height - 1).astype(jnp.int32)
        shape = ix.shape
        ix = ix.reshape(-1)
        iy = iy.reshape(-1)
        row_lanes = self.ch0_rows.shape[1]
        blocks_per_row = self.ch0_rows.shape[0] // self.height
        row_idx = iy * blocks_per_row + ix // row_lanes
        lane = ix % row_lanes
        rows = jnp.take(self.ch0_rows, row_idx, axis=0)        # (N, row_lanes)
        onehot = (lane[:, None] == jnp.arange(row_lanes)[None, :])
        vals = jnp.sum(rows * onehot.astype(jnp.float32), axis=1)
        return vals.reshape(shape)

    def tree_flatten(self):
        return (self.data, self.ch0_rows, self.r_c1, self.r_c2, self.trs,
                self.ch0_tiles), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    Costmap,
    lambda cm: cm.tree_flatten(),
    Costmap.tree_unflatten,
)


def _bounds_transform(x_min, x_max, y_min, y_max):
    r_c1 = jnp.array([1.0 / (x_max - x_min), 0.0, 0.0], dtype=jnp.float32)
    r_c2 = jnp.array([0.0, 1.0 / (y_max - y_min), 0.0], dtype=jnp.float32)
    trs = jnp.array([-x_min / (x_max - x_min), -y_min / (y_max - y_min), 1.0],
                    dtype=jnp.float32)
    return r_c1, r_c2, trs


def load_costmap(path: str) -> Costmap:
    """Load the reference ``.npz`` costmap format (``costs.cu:190-232``)."""
    d = np.load(path)
    x_min, x_max = (float(v) for v in np.ravel(d["xBounds"])[:2])
    y_min, y_max = (float(v) for v in np.ravel(d["yBounds"])[:2])
    ppm = float(np.ravel(d["pixelsPerMeter"])[0])
    width = int((x_max - x_min) * ppm)
    height = int((y_max - y_min) * ppm)
    channels = [np.asarray(d[f"channel{i}"], dtype=np.float32).reshape(height, width)
                for i in range(4)]
    data = jnp.asarray(np.stack(channels, axis=-1))
    r_c1, r_c2, trs = _bounds_transform(x_min, x_max, y_min, y_max)
    return Costmap.build(data, r_c1, r_c2, trs)


def save_costmap(cm_data: np.ndarray, x_bounds, y_bounds, ppm: float,
                 path: str) -> None:
    """Write a (H, W, 4) costmap in the reference ``.npz`` format."""
    H, W, _ = cm_data.shape
    np.savez(
        path,
        xBounds=np.asarray(x_bounds, dtype=np.float32),
        yBounds=np.asarray(y_bounds, dtype=np.float32),
        pixelsPerMeter=np.asarray([ppm], dtype=np.float32),
        **{f"channel{i}": np.ascontiguousarray(cm_data[..., i]).reshape(-1)
           for i in range(4)},
    )


def make_costmap(data: np.ndarray, x_bounds, y_bounds) -> Costmap:
    """Build a Costmap from a (H, W, 4) array and world bounds."""
    r_c1, r_c2, trs = _bounds_transform(
        float(x_bounds[0]), float(x_bounds[1]),
        float(y_bounds[0]), float(y_bounds[1]))
    return Costmap.build(jnp.asarray(data, dtype=jnp.float32), r_c1, r_c2, trs)
