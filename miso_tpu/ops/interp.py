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


def corner_indices_and_weights(x: jnp.ndarray, bound: jnp.ndarray,
                               spatial: Sequence[int],
                               size: Optional[jnp.ndarray] = None):
    """Per-corner flat indices and lerp weights, computed COLUMNAR.

    Returns (lin (2^d, N) int32 flat indices into the row-major grid,
    w (2^d, N) weights with zeros-padding validity folded in).

    Performance note (measured on v5e): every index/weight op here is an
    (N,)-shaped elementwise op on per-axis columns.  The naive (N, d)
    formulation (minor-dim reductions like ``prod(..., axis=-1)`` over
    d=3) forces pathological layouts/relayouts on TPU -- measured ~1800x
    slower (53 ms vs 0.03 ms for 1e6 points on the ScanNet fine level).
    Keep this columnar.
    """
    d = x.shape[-1]
    cols = []
    for k in range(d):
        if size is None:
            nk_f = float(spatial[k])
            nk_i = int(spatial[k])
        else:
            nk_f = size[k].astype(x.dtype)
            nk_i = size[k].astype(jnp.int32)
        lo = bound[k, 0]
        hi = bound[k, 1]
        u = (x[:, k] - lo) / (hi - lo) * nk_f - 0.5
        i0f = jnp.floor(u)
        cols.append((i0f.astype(jnp.int32), u - i0f, nk_i))
    strides = [1] * d
    for k in range(d - 2, -1, -1):
        strides[k] = strides[k + 1] * spatial[k + 1]
    lin_all, w_all = [], []
    one = jnp.ones(x.shape[0], x.dtype)
    for corner in itertools.product((0, 1), repeat=d):
        lin = jnp.zeros(x.shape[0], jnp.int32)
        w = one
        ok = jnp.ones(x.shape[0], jnp.bool_)
        for k in range(d):
            i0k, frk, nk_i = cols[k]
            ik = i0k + corner[k]
            ok = ok & (ik >= 0) & (ik < nk_i)
            lin = lin + jnp.clip(ik, 0, nk_i - 1) * strides[k]
            w = w * (frk if corner[k] == 1 else 1.0 - frk)
        lin_all.append(lin)
        w_all.append(w * ok.astype(w.dtype))
    return jnp.stack(lin_all), jnp.stack(w_all)


def grid_interpolate(grid: jnp.ndarray, x: jnp.ndarray, bound: jnp.ndarray,
                     size: Optional[jnp.ndarray] = None,
                     spatial: Optional[Sequence[int]] = None,
                     fdim: Optional[int] = None) -> jnp.ndarray:
    """Multilinear interpolation with zeros padding.

    Args:
      grid: (g0, ..., g_{d-1}, F) feature grid, axis k = world axis k.
        May also be FOLDED storage -- any shape with the same row-major
        element order (e.g. the atlas's (g0, g1*g2*F), which avoids the
        34x lane padding of a 4-wide minor dim on TPU; see
        models/grid_atlas.py) -- as long as ``spatial``/``fdim`` give
        the true geometry.  Only ``reshape(-1, F)`` is ever taken, so
        no relayout is introduced.
      x: (N, d) world-frame query coordinates.
      bound: (d, 2) [min, max] per axis.
      size: optional (d,) runtime *logical* grid size when ``grid`` is
        padded to a larger static shape (stacked submaps of differing
        bounds, see models/grid_atlas.py).  Defaults to the static shape.
      spatial / fdim: explicit geometry when ``grid`` is folded.

    Returns:
      (N, F) interpolated features.  Twice (indeed arbitrarily)
      differentiable wrt both ``grid`` and ``x``.

    One single batched gather (2^d * N indices) + einsum: XLA fuses the
    gather into the weighted reduction, so effective HBM traffic is
    x + out + grid (measured at roofline on v5e; see
    corner_indices_and_weights for why the index math is columnar).
    """
    d = x.shape[-1]
    if spatial is None:
        spatial = grid.shape[:-1]
        assert len(spatial) == d, f"grid rank {len(spatial)} != coord dim {d}"
    F = int(fdim) if fdim is not None else grid.shape[-1]
    N = x.shape[0]
    lin, w = corner_indices_and_weights(x, bound, spatial, size)
    return _gather_lerp_channels(grid, lin, w, F)


def _gather_lerp_channels(grid, lin, w, F):
    """Weighted corner gather, one 1-D gather PER CHANNEL.

    ``lin``: (2^d, N) int32 cell indices, ``w``: (2^d, N) weights.

    Never builds a (cells, F) 2-D view of the table: XLA materializes
    that reshape as an HLO temp tiled T(8, 128) -- a 32x lane-padding
    blowup (a 484 MB quad-scale atlas became a 15.1 GB temp, OOMing the
    compile outright at capacity 12 and silently costing ~0.5 s per
    chunk where it fit).  A 1-D table view has no padding to inflate,
    and per-channel (N,)-shaped gathers are the columnar fast path
    (CLAUDE.md rule 3).  The per-channel weighted sums replace the old
    einsum over a (2^d, N, F) corner intermediate.
    """
    flat = grid.reshape(-1)
    linF = lin * F
    outs = []
    for c in range(F):
        cf = jnp.take(flat, (linF + c).reshape(-1), axis=0)
        outs.append(jnp.sum(w * cf.reshape(lin.shape), axis=0))
    return jnp.stack(outs, axis=-1)


def grid_interpolate_per_point(stacked: jnp.ndarray, sub_ids: jnp.ndarray,
                               x: jnp.ndarray, bounds: jnp.ndarray,
                               sizes: jnp.ndarray,
                               spatial: Optional[Sequence[int]] = None,
                               fdim: Optional[int] = None,
                               via: str = "auto") -> jnp.ndarray:
    """Interpolate each point against ITS OWN submap's grid.

    The stacked-atlas analogue of :func:`grid_interpolate` for per-point
    submap assignment -- replaces per-submap loops that evaluate all N
    points against every submap (reference loss.py:415-514 nests Python
    loops over submaps/keyframes instead).

    Two executions, selected by ``via`` (identical values and grads):

    * ``"gather"`` (default): ONE gather over the flattened (S, g..., F)
      storage with per-point bounds / logical sizes folded into the
      columnar index math.  O(N) compute regardless of S.  HONEST cost
      (2026-08-21, value-read synced -- earlier "0.04 ms/1M" readings
      were unsynced dispatch-time artifacts, see CLAUDE.md rule 0):
      XLA lowers this to a latency-bound HBM gather at ~3e7
      element-gathers/s, ~0.5 s per 1M points x 8 corners x 2 levels.
      It is the framework's bottleneck; ops/pallas_interp.py is the
      MXU-matmul replacement path.
    * ``"slots"``: lax.scan over the S slots; each step is one
      single-grid sized interpolation of ALL N points accumulated under
      ``sub_ids == s``.  O(S*N) compute; kept as a parity/fallback
      execution shape.
    * ``"auto"``: "gather".

    Args:
      stacked: (S, g0..g_{d-1}, F) padded per-submap grids (one level),
        or FOLDED storage with the same element order (atlas layout,
        see grid_interpolate) plus explicit ``spatial``/``fdim``.
      sub_ids: (N,) int32 submap index per point.
      x: (N, d) submap-frame coords (each in its own submap's frame).
      bounds: (S, d, 2) per-submap local bounds.
      sizes: (S, d) int32 per-submap logical grid sizes for this level.

    Returns (N, F); differentiable to any order like grid_interpolate.
    """
    if via == "auto":
        via = "gather"
    if via == "slots":
        return _per_point_slotscan(stacked, sub_ids, x, bounds, sizes,
                                   spatial, fdim)
    d = x.shape[-1]
    if spatial is None:
        spatial = stacked.shape[1:-1]
        assert len(spatial) == d
    F = int(fdim) if fdim is not None else stacked.shape[-1]
    N = x.shape[0]
    # Columnar per-axis index math (CLAUDE.md rule 3): every op below is
    # an (N,)-shaped column; per-point bound/size columns are 1-axis
    # gathers.
    cols = []
    for k in range(d):
        lo = bounds[sub_ids, k, 0]
        hi = bounds[sub_ids, k, 1]
        nk_i = sizes[sub_ids, k]
        u = (x[:, k] - lo) / (hi - lo) * nk_i.astype(x.dtype) - 0.5
        i0f = jnp.floor(u)
        cols.append((i0f.astype(jnp.int32), u - i0f, nk_i))
    strides = [1] * d
    for k in range(d - 2, -1, -1):
        strides[k] = strides[k + 1] * spatial[k + 1]
    grid_stride = 1
    for n in spatial:
        grid_stride *= n
    base = sub_ids.astype(jnp.int32) * grid_stride
    lin_all, w_all = [], []
    one = jnp.ones(N, x.dtype)
    for corner in itertools.product((0, 1), repeat=d):
        lin = base
        w = one
        ok = jnp.ones(N, jnp.bool_)
        for k in range(d):
            i0k, frk, nk_i = cols[k]
            ik = i0k + corner[k]
            ok = ok & (ik >= 0) & (ik < nk_i)
            lin = lin + jnp.clip(ik, 0, nk_i - 1) * strides[k]
            w = w * (frk if corner[k] == 1 else 1.0 - frk)
        lin_all.append(lin)
        w_all.append(w * ok.astype(w.dtype))
    lin = jnp.stack(lin_all)
    w = jnp.stack(w_all)
    return _gather_lerp_channels(stacked, lin, w, F)


def _per_point_slotscan(stacked, sub_ids, x, bounds, sizes, spatial, fdim):
    """``grid_interpolate_per_point`` via a slot scan (see its docstring).

    Exactly one slot matches each point's sub_id, so the masked
    accumulation equals the own-submap gather bit-for-bit (each slot's
    interpolation already applies that slot's logical sizes and zeros
    padding)."""
    if spatial is None:
        spatial = stacked.shape[1:-1]
    F = int(fdim) if fdim is not None else stacked.shape[-1]
    N = x.shape[0]

    def body(acc, slot):
        sid, grid_s, bound_s, size_s = slot
        f = grid_interpolate(grid_s, x, bound_s, size=size_s,
                             spatial=spatial, fdim=F)
        sel = (sub_ids == sid).astype(f.dtype)
        return acc + sel[:, None] * f, None

    slots = (jnp.arange(stacked.shape[0], dtype=jnp.int32),
             stacked, bounds, sizes)
    out, _ = jax.lax.scan(body, jnp.zeros((N, F), x.dtype), slots)
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
