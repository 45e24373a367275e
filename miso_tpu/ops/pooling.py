"""Scatter pooling of point features onto regular grids.

Replaces the reference's ``grid_pool_2d_avg`` / ``grid_pool_3d_avg``
(`grid_opt/utils/utils.py:211-291`), which use ``scatter_add_``.  On TPU
this is a ``jax.ops.segment_sum`` over linearized cell indices --
deterministic (unlike CUDA atomics) and fully jittable.

Output layout is channel-last ``(g0, .., g_{d-1}, C)`` with axis k =
world axis k, consistent with the rest of the framework (the reference
returns (H, W, D, d) with H = x axis, identical ordering).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from miso_tpu.ops.interp import grid_shape_for_bound


def grid_pool_avg(coords, features, bound, cell_size, spatial=None):
    """Average point features per grid cell.

    Args:
      coords: (N, d) points.
      features: (N, C) per-point features.
      bound: (d, 2) grid bound.
      cell_size: nominal cell size (cell index = floor((x - lo)/cell_size),
        clamped -- reference utils.py:264-268).
      spatial: optional static grid shape tuple; computed from
        bound/cell_size if omitted (must be static under jit).

    Returns:
      (g0, ..., g_{d-1}, C) grid of per-cell means (zero where empty).
    """
    d = coords.shape[-1]
    if spatial is None:
        spatial = grid_shape_for_bound(bound, cell_size, d)
    sizes = jnp.asarray(spatial, dtype=jnp.int32)
    lo = bound[:, 0]
    idx = jnp.floor((coords - lo) / cell_size).astype(jnp.int32)
    idx = jnp.clip(idx, 0, sizes - 1)
    strides = [1] * d
    for k in range(d - 2, -1, -1):
        strides[k] = strides[k + 1] * spatial[k + 1]
    lin = jnp.sum(idx * jnp.asarray(strides, jnp.int32), axis=-1)
    num_cells = 1
    for s in spatial:
        num_cells *= s
    sums = jax.ops.segment_sum(features, lin, num_segments=num_cells)
    counts = jax.ops.segment_sum(jnp.ones((coords.shape[0],), features.dtype), lin,
                                 num_segments=num_cells)
    means = sums / jnp.maximum(counts, 1.0)[:, None]
    return means.reshape(*spatial, features.shape[-1])


def voxel_down_sample_indices(points, voxel_size):
    """Indices of the point closest to its voxel center, one per voxel.

    TPU-native rewrite of the reference's scatter_reduce-amin trick
    (`grid_opt/utils/utils_geometry.py:292-335`).  Host/ jit friendly but
    returns a dynamically sized index array, so call outside jit (it is
    a dataset-preprocessing op in the reference too).
    """
    import numpy as np

    pts = np.asarray(points)
    grid = np.floor(pts / voxel_size).astype(np.int64)
    grid -= grid.min(axis=0)
    dims = grid.max(axis=0) + 1
    lin = (grid[:, 0] * dims[1] + grid[:, 1]) * dims[2] + grid[:, 2]
    center = (np.floor(pts / voxel_size) + 0.5) * voxel_size
    dist = np.linalg.norm(pts - center, axis=1)
    order = np.lexsort((dist, lin))
    lin_sorted = lin[order]
    first = np.ones(len(lin_sorted), dtype=bool)
    first[1:] = lin_sorted[1:] != lin_sorted[:-1]
    return order[first]


def crop_points(points, ts=None, min_z=-3.0, max_z=100.0, min_range=2.75, max_range=100.0):
    """Range/z crop of a LiDAR scan (reference utils_geometry.py:337-358).

    Host-side numpy (dynamic output size).
    """
    import numpy as np

    pts = np.asarray(points)
    dist = np.linalg.norm(pts, axis=1)
    keep = (dist > min_range) & (dist < max_range) & (pts[:, 2] > min_z) & (pts[:, 2] < max_z)
    out_ts = ts[keep] if ts is not None else None
    return pts[keep], out_ts
