"""Feature-grid interpolation: the hot path of the framework.

TPU-native replacement for the reference's `F.grid_sample` /
`cuda_gridsample` stack (`grid_opt/models/grid_modules.py:72-95`,
`grid_opt/utils/utils.py:89-208`, `third_party/cuda_gridsample_grad2`).

Semantics exactly match
``F.grid_sample(..., align_corners=False, padding_mode='zeros')`` after
the reference's [-1, 1] normalization by the grid bound:

  * the grid spans the bound with ``size`` cells per axis; feature i is
    located at the *center* of cell i, i.e. at
    ``bound_min + (i + 0.5) * (bound_max - bound_min) / size``;
  * queries are linearly interpolated from the 2^d surrounding corners;
  * corners that fall outside the grid contribute zero (zeros padding).

Implementation: everything is computed in continuous *index space*
(``u = (x - lo) / extent * size - 0.5``) so no [-1, 1] round trip is
needed, and the whole op is a gather + lerp that JAX can differentiate
to any order.  This deletes the reference's 850-line CUDA
double-backward extension (see SURVEY.md section 2.9): eikonal /
smoothness losses that differentiate through interpolation gradients
Just Work under ``jax.grad`` composition.

Grid storage layout: ``(g0, g1, ..., F)`` channel-last, where axis k of
the array corresponds to world axis k (x first).  This differs from the
reference's reversed ``(1, F, Z, Y, X)`` torch layout but is equivalent;
channel-last keeps the feature dim on TPU lanes.
"""
from __future__ import annotations

import itertools
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def index_coords(x: jnp.ndarray, bound: jnp.ndarray, size: jnp.ndarray) -> jnp.ndarray:
    """World coords (N, d) -> continuous cell-index coords (N, d).

    ``u = (x - lo) / (hi - lo) * size - 0.5`` -- the align_corners=False
    convention: u == i exactly at the center of cell i.
    """
    lo = bound[:, 0]
    hi = bound[:, 1]
    return (x - lo) / (hi - lo) * size - 0.5


def normalize_coordinates(x: jnp.ndarray, bound: jnp.ndarray) -> jnp.ndarray:
    """Map coords to [-1, 1] over the bound (reference utils.py:22-51)."""
    lo = bound[:, 0]
    hi = bound[:, 1]
    return 2.0 * (x - lo) / (hi - lo) - 1.0


def denormalize_coordinates(xn: jnp.ndarray, bound: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`normalize_coordinates` (reference utils.py:53-82)."""
    lo = bound[:, 0]
    hi = bound[:, 1]
    return (xn + 1.0) * 0.5 * (hi - lo) + lo


def grid_interpolate(grid: jnp.ndarray, x: jnp.ndarray, bound: jnp.ndarray,
                     size: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Multilinear interpolation with zeros padding.

    Args:
      grid: (g0, ..., g_{d-1}, F) feature grid, axis k = world axis k.
      x: (N, d) world-frame query coordinates.
      bound: (d, 2) [min, max] per axis.
      size: optional (d,) runtime *logical* grid size when ``grid`` is
        padded to a larger static shape (stacked submaps of differing
        bounds, see models/grid_atlas.py).  Defaults to the static shape.

    Returns:
      (N, F) interpolated features.  Twice (indeed arbitrarily)
      differentiable wrt both ``grid`` and ``x``.
    """
    d = x.shape[-1]
    spatial = grid.shape[:-1]
    assert len(spatial) == d, f"grid rank {len(spatial)} != coord dim {d}"
    F = grid.shape[-1]
    if size is None:
        size = jnp.asarray(spatial, dtype=x.dtype)
        sizes_int = jnp.asarray(spatial, dtype=jnp.int32)
    else:
        sizes_int = size.astype(jnp.int32)
        size = size.astype(x.dtype)

    u = index_coords(x, bound, size)          # (N, d)
    i0 = jnp.floor(u)
    frac = u - i0                             # (N, d)
    i0 = i0.astype(jnp.int32)

    flat = grid.reshape(-1, F)
    # Row-major strides for the (static, possibly padded) storage.
    strides = [1] * d
    for k in range(d - 2, -1, -1):
        strides[k] = strides[k + 1] * spatial[k + 1]
    strides = jnp.asarray(strides, dtype=jnp.int32)

    out = jnp.zeros((x.shape[0], F), dtype=grid.dtype)
    for corner in itertools.product((0, 1), repeat=d):
        offs = jnp.asarray(corner, dtype=jnp.int32)
        idx = i0 + offs                                       # (N, d)
        w = jnp.prod(jnp.where(offs == 1, frac, 1.0 - frac), axis=-1)  # (N,)
        valid = jnp.all((idx >= 0) & (idx < sizes_int), axis=-1)
        w = w * valid.astype(w.dtype)
        idx_c = jnp.clip(idx, 0, sizes_int - 1)
        lin = jnp.sum(idx_c * strides, axis=-1)               # (N,)
        out = out + w[:, None] * jnp.take(flat, lin, axis=0)
    return out


def multi_level_interpolate(
    grids: Sequence[jnp.ndarray],
    x: jnp.ndarray,
    bound: jnp.ndarray,
    ignore_level: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Interpolate every level and concatenate (reference utils.py:143-164).

    ``ignore_level`` is an optional (L,) float/bool array; ignored levels
    contribute zeros (runtime flag -> no recompilation when toggling).
    """
    feats = []
    for level, g in enumerate(grids):
        f = grid_interpolate(g, x, bound)
        if ignore_level is not None:
            f = f * (1.0 - ignore_level[level].astype(f.dtype))
        feats.append(f)
    return jnp.concatenate(feats, axis=-1)


def grid_decode(feats, x, decoder_params=None, pos_invariant=True, mlp_apply=None):
    """Concat-levels features -> decoder MLP (reference utils.py:194-208).

    decoder_params is None -> identity (grid directly predicts).
    """
    if decoder_params is None:
        return feats
    from miso_tpu.ops.mlp import mlp_apply as _default_apply
    apply_fn = mlp_apply or _default_apply
    inputs = feats if pos_invariant else jnp.concatenate([feats, x], axis=-1)
    return apply_fn(decoder_params, inputs)


def vertex_positions(spatial: Sequence[int], bound: jnp.ndarray) -> jnp.ndarray:
    """World-frame centers of all grid cells, shape (prod(spatial), d).

    Reference `grid_modules.py:111-123` + `utils.py:294-307`.
    """
    d = len(spatial)
    axes = []
    for k in range(d):
        n = spatial[k]
        lo = bound[k, 0]
        hi = bound[k, 1]
        step = (hi - lo) / n
        axes.append(lo + (jnp.arange(n) + 0.5) * step)
    mesh = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([m.reshape(-1) for m in mesh], axis=-1)


def grid_shape_for_bound(bound, cell_size, d=3):
    """ceil((hi - lo) / cell_size) per axis (reference grid_modules.py:47-48).

    Host-side helper (returns Python ints for static shapes).
    """
    import numpy as np

    b = np.asarray(bound, dtype=np.float64)
    n = np.ceil((b[:, 1] - b[:, 0]) / float(cell_size) - 1e-9).astype(int)
    return tuple(int(v) for v in n[:d])


# ---------------------------------------------------------------------------
# VM (TensoRF-style) factorized grids -- reference grid_modules.py:125-251.
# ---------------------------------------------------------------------------

def vm_interpolate(planes, lines, x, bound):
    """Low-rank vector-matrix interpolation.

    planes: dict with 'xy', 'xz', 'yz' -> (gi, gj, R) plane factors.
    lines: dict with 'z', 'y', 'x' -> (gk, R) line factors.
    Returns dict of (N, R) coefficient products matching the reference's
    ``coeffs_dict`` ('xy_z', 'xz_y', 'yz_x').
    """
    def plane(p, cols, b):
        return grid_interpolate(p, x[:, cols], b)

    def line(l, col, b):
        return grid_interpolate(l, x[:, [col]], b)

    bxy = bound[jnp.array([0, 1])]
    bxz = bound[jnp.array([0, 2])]
    byz = bound[jnp.array([1, 2])]
    bx = bound[jnp.array([0])]
    by = bound[jnp.array([1])]
    bz = bound[jnp.array([2])]
    return {
        "xy_z": plane(planes["xy"], [0, 1], bxy) * line(lines["z"], 2, bz),
        "xz_y": plane(planes["xz"], [0, 2], bxz) * line(lines["y"], 1, by),
        "yz_x": plane(planes["yz"], [1, 2], byz) * line(lines["x"], 0, bx),
    }


def vm_basis_apply(basis, coeffs):
    """Combine VM coefficients through learned bases (grid_modules.py:237-242).

    basis: dict 'xy_z', 'xz_y', 'yz_x' -> (F, R) matrices.
    """
    out = 0.0
    for k in ("xy_z", "xz_y", "yz_x"):
        out = out + coeffs[k] @ basis[k].T
    return out
