"""Voxel-grid operations: downsampling (PCL VoxelGrid equivalent) and dense
occupancy grids.

The reference outsources cloud downsampling to a PCL C++ nodelet
(`launch/voxels_filtering.launch:8-21`: leaf 0.1–0.2 m with z-limits) and
ships an unused dense voxelizer (`src/pointcloud_utils.py:279-288`). Here:

  * :func:`voxel_downsample` — centroid-per-occupied-voxel, exact PCL
    VoxelGrid semantics, host-side NumPy (the bus's filter node is host I/O);
    a C++ implementation lives in ``native/`` with this as fallback.
  * :func:`voxel_downsample_jit` — fixed-shape on-device variant: scatter-
    mean into a bounded voxel table, returns padded centroids + valid mask.
  * :func:`occupancy_grid` — dense 0/1 grid, `pc_to_voxel` parity.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def voxel_downsample(
    points: np.ndarray,
    leaf_size: float = 0.15,
    *,
    z_limits: Optional[Tuple[float, float]] = None,
) -> np.ndarray:
    """Centroid voxel-grid downsample (PCL VoxelGrid semantics).

    Args:
      points: (N, 3+) — extra columns (intensity, ...) are averaged too.
      leaf_size: voxel edge length in meters.
      z_limits: optional (zmin, zmax) pass-through filter, as the reference's
        `voxels_filtering.launch` configures on PCL.
    """
    pts = np.asarray(points, dtype=np.float64)
    if z_limits is not None:
        keep = (pts[:, 2] >= z_limits[0]) & (pts[:, 2] <= z_limits[1])
        pts = pts[keep]
    if len(pts) == 0:
        return pts.astype(np.float32)

    ijk = np.floor(pts[:, :3] / leaf_size).astype(np.int64)
    ijk -= ijk.min(axis=0)
    dims = ijk.max(axis=0) + 1
    key = (ijk[:, 0] * dims[1] + ijk[:, 1]) * dims[2] + ijk[:, 2]
    order = np.argsort(key)
    key_s = key[order]
    pts_s = pts[order]
    boundaries = np.flatnonzero(np.diff(key_s)) + 1
    groups = np.split(np.arange(len(pts_s)), boundaries)
    out = np.stack([pts_s[g].mean(axis=0) for g in groups])
    return out.astype(np.float32)


@partial(jax.jit, static_argnames=("table_size",))
def voxel_downsample_jit(
    points: jnp.ndarray,
    leaf_size: float,
    *,
    valid: Optional[jnp.ndarray] = None,
    table_size: int = 65536,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-shape on-device voxel downsample.

    Hashes voxel ids into a bounded table and scatter-means the points; hash
    collisions merge distinct voxels (rare for table_size ≫ occupied voxels).
    Returns (centroids (table_size, 3), valid (table_size,)) — padded,
    jit-friendly, shardable.
    """
    pts = points[:, :3]
    ijk = jnp.floor(pts / leaf_size).astype(jnp.int32).astype(jnp.uint32)
    # murmur-style avalanche mix — plain prime-XOR hashing clusters badly for
    # the small coordinate ranges typical of metric voxel grids
    h = ijk[:, 0] * jnp.uint32(0x9E3779B1)
    h = h ^ (h >> 16)
    h = h + ijk[:, 1] * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h + ijk[:, 2] * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    h = (h % jnp.uint32(table_size)).astype(jnp.int32)
    w = jnp.ones((pts.shape[0],), jnp.float32) if valid is None else valid.astype(jnp.float32)

    sums = jnp.zeros((table_size, 3), jnp.float32).at[h].add(pts * w[:, None])
    cnts = jnp.zeros((table_size,), jnp.float32).at[h].add(w)
    occupied = cnts > 0
    centroids = sums / jnp.maximum(cnts, 1.0)[:, None]
    return centroids, occupied.astype(jnp.float32)


def occupancy_grid(
    points: np.ndarray,
    resolution: float = 0.15,
    x=(0.0, 90.0),
    y=(-50.0, 50.0),
    z=(-4.5, 5.5),
) -> np.ndarray:
    """Dense 0/1 occupancy grid — parity with the reference `pc_to_voxel`
    (`src/pointcloud_utils.py:279-288`): crop to the bounds, quantize at
    ``resolution``, mark occupied cells."""
    pc = np.asarray(points, dtype=np.float64)
    keep = (
        (pc[:, 0] >= x[0]) & (pc[:, 0] < x[1])
        & (pc[:, 1] >= y[0]) & (pc[:, 1] < y[1])
        & (pc[:, 2] >= z[0]) & (pc[:, 2] < z[1])
    )
    pc = pc[keep, :3]
    idx = ((pc - np.array([x[0], y[0], z[0]])) / resolution).astype(np.int32)
    grid = np.zeros(
        (
            int((x[1] - x[0]) / resolution),
            int((y[1] - y[0]) / resolution),
            int(round((z[1] - z[0]) / resolution)),
        )
    )
    # int()-truncated dims can be one cell short of the bounds filter (e.g.
    # y=49.95 → iy = dims[1] with the defaults): drop edge points like the
    # native twin does instead of raising IndexError
    inb = (idx[:, 0] < grid.shape[0]) & (idx[:, 1] < grid.shape[1]) & (idx[:, 2] < grid.shape[2])
    idx = idx[inb]
    grid[idx[:, 0], idx[:, 1], idx[:, 2]] = 1
    return grid


def occupancy_grid_jit(
    points: jnp.ndarray,
    resolution: float = 0.15,
    x=(0.0, 90.0),
    y=(-50.0, 50.0),
    z=(-4.5, 5.5),
) -> jnp.ndarray:
    """Jittable occupancy grid (fixed dims from the static bounds)."""
    dims = (
        int((x[1] - x[0]) / resolution),
        int((y[1] - y[0]) / resolution),
        int(round((z[1] - z[0]) / resolution)),
    )
    pc = points[:, :3]
    keep = (
        (pc[:, 0] >= x[0]) & (pc[:, 0] < x[1])
        & (pc[:, 1] >= y[0]) & (pc[:, 1] < y[1])
        & (pc[:, 2] >= z[0]) & (pc[:, 2] < z[1])
    )
    idx = ((pc - jnp.array([x[0], y[0], z[0]])) / resolution).astype(jnp.int32)
    # per-axis guard BEFORE flattening: an index == dims[k] (possible at the
    # upper bound with truncated dims) would otherwise alias into the next
    # row via the flat arithmetic and silently mark the wrong voxel
    keep = (
        keep
        & (idx[:, 0] < dims[0]) & (idx[:, 1] < dims[1]) & (idx[:, 2] < dims[2])
    )
    flat = (idx[:, 0] * dims[1] + idx[:, 1]) * dims[2] + idx[:, 2]
    flat = jnp.where(keep, flat, dims[0] * dims[1] * dims[2])  # dropped
    grid = jnp.zeros((dims[0] * dims[1] * dims[2],), jnp.float32)
    grid = grid.at[flat].set(1.0, mode="drop")
    return grid.reshape(dims)
