"""Spatially-sharded feature grids: scale ONE grid past a chip's HBM.

The reference's only answer to "scene bigger than device memory" is
submap decomposition (SURVEY.md section 2.10).  On TPU there is a second,
orthogonal axis: shard a single grid's leading spatial (world-x) axis
across the mesh and keep the trilinear query exact with a one-voxel halo
exchange -- the workload's analog of sequence/context parallelism.

Protocol per query batch (replicated):
  1. each device holds an x-slab ``(S, Y, Z, F)`` of the grid plus a
     one-row halo received from its right neighbor (``ppermute``; the
     last device's halo stays zero, which IS the zeros-padding rule);
  2. a point's base cell index i0x determines a unique owner slab; the
     owner evaluates the full 2^d-corner lerp locally (corner validity
     is still checked against the LOGICAL global size, so padding rows
     and out-of-bound corners contribute zero);
  3. ``psum`` over the grid axis assembles the replicated result --
     exactly one device contributed each point.

Gradients flow through ppermute/psum, so the same function trains:
the backward pass scatter-adds into each device's slab and streams
halo gradients back with the reverse permutation, all inserted by XLA.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import itertools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from miso_tpu.ops import interp


def pad_to_multiple(grid: jnp.ndarray, n: int) -> jnp.ndarray:
    """Pad axis 0 so it divides evenly into n slabs (zeros padding)."""
    pad = (-grid.shape[0]) % n
    if pad == 0:
        return grid
    widths = ((0, pad),) + ((0, 0),) * (grid.ndim - 1)
    return jnp.pad(grid, widths)


def shard_grid_spatial(grid: jnp.ndarray, mesh: Mesh, axis: str = "grid"
                       ) -> Tuple[jnp.ndarray, int]:
    """Place a (X, ..., F) grid sharded over its leading axis.

    Returns (sharded array padded to a multiple of the axis size,
    logical X before padding).
    """
    X = grid.shape[0]
    g = pad_to_multiple(grid, mesh.shape[axis])
    spec = P(axis, *([None] * (g.ndim - 1)))
    return jax.device_put(g, NamedSharding(mesh, spec)), X


def _interp_slab(f_ext: jnp.ndarray, u: jnp.ndarray, shift: jnp.ndarray,
                 sizes_logical: jnp.ndarray, mine: jnp.ndarray) -> jnp.ndarray:
    """Corner gather+lerp on a local slab (+1 halo row along axis 0).

    u: (N, d) global continuous index coords; shift: global row of the
    slab's first x-row; validity uses the LOGICAL global sizes
    (identical zeros-padding semantics to ops.interp.grid_interpolate).
    """
    # Columnar per-axis math + ONE batched corner gather -- same layout
    # rules as ops.interp.grid_interpolate (minor-dim (N, d) reductions
    # are pathologically slow on TPU; see its docstring).  This is a
    # deliberate sibling of corner_indices_and_weights specialized with
    # the slab shift / ownership mask / storage clipping; drift between
    # the two is locked out by test_spatial_sharding's exact parity
    # against the unsharded grid_interpolate.
    d = u.shape[-1]
    F = f_ext.shape[-1]
    N = u.shape[0]
    flat = f_ext.reshape(-1, F)
    spatial = f_ext.shape[:-1]
    strides = [1] * d
    for k in range(d - 2, -1, -1):
        strides[k] = strides[k + 1] * spatial[k + 1]
    cols = []
    for k in range(d):
        uk = u[:, k]
        i0k = jnp.floor(uk)
        cols.append((i0k.astype(jnp.int32), uk - i0k))
    mine_f = mine.astype(u.dtype)
    lin_all, w_all = [], []
    for corner in itertools.product((0, 1), repeat=d):
        lin = jnp.zeros(N, jnp.int32)
        w = mine_f
        ok = jnp.ones(N, jnp.bool_)
        for k in range(d):
            i0k, frk = cols[k]
            ik = i0k + corner[k]
            ok = ok & (ik >= 0) & (ik < sizes_logical[k])
            il = ik - shift if k == 0 else ik
            lin = lin + jnp.clip(il, 0, spatial[k] - 1) * strides[k]
            w = w * (frk if corner[k] == 1 else 1.0 - frk)
        lin_all.append(lin)
        w_all.append(w * ok.astype(w.dtype))
    cf = jnp.take(flat, jnp.concatenate(lin_all), axis=0).reshape(2 ** d, N, F)
    return jnp.einsum("cn,cnf->nf", jnp.stack(w_all), cf)


def sharded_grid_interpolate(grid_sharded: jnp.ndarray, x: jnp.ndarray,
                             bound, x_logical: int, mesh: Mesh,
                             axis: str = "grid") -> jnp.ndarray:
    """Exact trilinear interpolation on an x-sharded grid.

    Drop-in for ops.interp.grid_interpolate (zeros padding, same
    align_corners=False index-space convention); call under jit with
    the grid placed by :func:`shard_grid_spatial` and x replicated.
    """
    D = mesh.shape[axis]
    d = x.shape[-1]
    X_pad = grid_sharded.shape[0]
    S = X_pad // D
    sizes_logical = jnp.asarray((x_logical,) + grid_sharded.shape[1:-1],
                                jnp.int32)
    bound = jnp.asarray(bound)

    def local(f_slab, xq):
        didx = jax.lax.axis_index(axis)
        # One-row halo from the right neighbor; device D-1 receives
        # nothing -> zeros, which matches the zeros-padding rule.
        halo = jax.lax.ppermute(f_slab[:1], axis,
                                [(i + 1, i) for i in range(D - 1)])
        f_ext = jnp.concatenate([f_slab, halo], axis=0)
        size_f = sizes_logical.astype(xq.dtype)
        u = interp.index_coords(xq, bound, size_f)
        i0x = jnp.floor(u[:, 0]).astype(jnp.int32)
        owner = jnp.clip(i0x, 0, x_logical - 1) // S
        mine = owner == didx
        out = _interp_slab(f_ext, u, didx * S, sizes_logical, mine)
        return jax.lax.psum(out, axis)

    return jax.shard_map(local, mesh=mesh,
                         in_specs=(P(axis, *([None] * d)), P()),
                         out_specs=P())(grid_sharded, x)


def sharded_multi_level_interpolate(grids: Sequence[jnp.ndarray],
                                    x: jnp.ndarray, bound,
                                    x_logicals: Sequence[int], mesh: Mesh,
                                    axis: str = "grid") -> jnp.ndarray:
    """Per-level sharded interpolation, concatenated (the sharded
    equivalent of ops.interp.multi_level_interpolate)."""
    feats = [sharded_grid_interpolate(g, x, bound, xl, mesh, axis)
             for g, xl in zip(grids, x_logicals)]
    return jnp.concatenate(feats, axis=-1)


def sharded_sdf_train_step(decoder_apply, mesh: Mesh, axis: str = "grid",
                           lr: float = 1e-3):
    """A minimal masked-Adam mapping step over an x-sharded multi-level
    grid.

    Returns step(grids, opt_state, x_logicals, bound, x, y, valid) ->
    (new_grids, new_opt_state, loss); grids (and the Adam moments, which
    inherit their sharding) stay sharded in place -- the gradient of
    shard_map keeps the layout.  Demonstrates that one submap larger
    than a single chip's HBM trains with only halo + psum traffic on
    ICI, using the same masked optimizer as the rest of the framework.
    """
    from miso_tpu.models.base import tree_full_mask
    from miso_tpu.train.optim import masked_adam_update

    def step(grids, opt_state, x_logicals, bound, x, y, valid):
        def obj(grids):
            f = sharded_multi_level_interpolate(grids, x, bound,
                                                x_logicals, mesh, axis)
            pred = decoder_apply(f)
            se = (pred - y) ** 2 * valid
            return jnp.sum(se) / jnp.maximum(jnp.sum(valid), 1.0)

        loss, grads = jax.value_and_grad(obj)(grids)
        mask = tree_full_mask(grids)
        new, new_opt = masked_adam_update(grads, opt_state, grids, mask,
                                          lr=lr)
        return new, new_opt, loss

    return jax.jit(step, static_argnums=(2,))
