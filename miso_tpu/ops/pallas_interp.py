"""Tiled MXU interpolation: trilinear grid gather as one-hot matmuls.

Why this exists (honest roofline, 2026-08-21): XLA lowers the per-point
8-corner gather to a latency-bound HBM gather that measures ~2e6
points/s on the v5e for a 1M-point query (503 ms fwd; the scatter-add
backward adds ~440 ms) -- it is THE bottleneck of every hot path in
this framework (train step, alignment, meshing).  Earlier rounds
believed the gather ran at HBM speed; that reading came from timing
dispatch instead of execution (see bench.py).

The TPU-native fix is to stop gathering: bin points into spatial tiles
whose (tile+halo) feature block lives in VMEM, and evaluate the
interpolation as a dense one-hot-weight matmul against that block on
the MXU.  Per 128-point chunk and (8,16,16)-cell tile the weight
matrix is (128, 2688) with 8 nonzeros per row (the trilinear corner
weights); `chunk_weights @ tile_features` contracts it in one MXU op.
FLOP cost ~5.5 MFLOP/chunk -- the MXU does in microseconds what the
HBM gather does in milliseconds.

Binning is gather-free on the XLA side (sorting carries payload
columns; nothing is ever indexed by a data-dependent vector):
  1. per-point tile id + per-axis clipped local indices / masked
     weights, all columnar math (CLAUDE.md rule 3);
  2. a histogram pads every tile's run to a multiple of the chunk
     size by appending synthetic zero-weight rows (exactly
     ``-n_t mod K`` of them per tile, excess routed to a trash key
     that sorts last), so each sorted chunk lies entirely in ONE tile;
  3. one variadic `lax.sort` keyed on tile id orders the rows; the
     per-chunk tile id is then just every K-th sorted key, fed to the
     kernel through `PrefetchScalarGridSpec` so the tile's VMEM block
     is chosen per chunk (the MoE-dispatch pattern).

Outputs are returned in SORTED order together with the sorted payload
columns: pointwise losses reduce order-free, so training paths never
unsort; lattice/mesh queries carry the lattice index as a payload and
scatter once at the end.

Reference parity slot: the CUDA grid_sample extension
(`third_party/cuda_gridsample_grad2`); value parity with
`ops.interp.grid_interpolate` is tested in tests/test_pallas_interp.py.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile of base cells per VMEM block; the loaded halo block is
# (TILE+1) per axis.  (8, 16, 16) -> 9*17*17 = 2601 halo cells,
# padded to the lane multiple below.
TILE = (8, 16, 16)
CHUNK = 128                      # points per kernel invocation
_W = 9 * 17 * 17                 # halo cells per tile
_WPAD = ((_W + 127) // 128) * 128  # 2688, lane-aligned one-hot width


def _round_up(x, m):
    return (x + m - 1) // m * m


def halo_tiles(table: jnp.ndarray, fpad: int = 8) -> jnp.ndarray:
    """(X, Y, Z, F) feature grid -> (T, _WPAD, fpad) halo tile blocks.

    Tile t covers cells [o, o+TILE) with a +1 halo so every corner of a
    base cell inside the tile is present.  Built with one
    conv_general_dilated_patches (overlapping-window extraction) -- a
    structured copy, no gathers.  ~1.27x the table bytes; rebuilt per
    step when features train (sub-ms at the sizes used here).
    """
    X, Y, Z, F = table.shape
    tx, ty, tz = TILE
    nx, ny, nz = -(-X // tx), -(-Y // ty), -(-Z // tz)
    # pad so every tile has a full halo block
    t = jnp.pad(table, ((0, nx * tx + 1 - X), (0, ny * ty + 1 - Y),
                        (0, nz * tz + 1 - Z), (0, 0)))
    # extract overlapping (tx+1, ty+1, tz+1) windows at stride TILE:
    # conv_general_dilated_patches on (N=F, C=1, X, Y, Z)
    p = jax.lax.conv_general_dilated_patches(
        t.transpose(3, 0, 1, 2)[:, None],          # (F, 1, X', Y', Z')
        filter_shape=(tx + 1, ty + 1, tz + 1),
        window_strides=(tx, ty, tz), padding="VALID")
    # p: (F, W, nx, ny, nz) with W = halo cells (channel-major patches)
    p = p.reshape(F, _W, nx * ny * nz)
    p = p.transpose(2, 1, 0)                        # (T, W, F)
    p = jnp.pad(p, ((0, 0), (0, _WPAD - _W), (0, fpad - F)))
    return p


def point_cols(x: jnp.ndarray, bound: jnp.ndarray,
               size: Sequence[int]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Columnar per-point tile ids + kernel columns.

    Returns (tile_id (N,) int32, cols (N, 16) f32) where cols are
    [ix0, ix1, jy0, jy1, kz0, kz1, wx0, wx1, wy0, wy1, wz0, wz1, 0..]:
    per-axis tile-LOCAL clipped corner indices and mask-folded lerp
    weights (align_corners=False, zeros padding -- exactly
    ops.interp.grid_interpolate's convention).
    """
    N = x.shape[0]
    tdims = []
    tile_id = jnp.zeros((N,), jnp.int32)
    idx_cols, w_cols = [], []
    bound = jnp.asarray(bound, x.dtype)     # traced or concrete
    for k, tsz in enumerate(TILE):
        n = int(size[k])
        lo, hi = bound[k, 0], bound[k, 1]
        u = (x[:, k] - lo) / (hi - lo) * n - 0.5
        i0f = jnp.floor(u)
        fr = u - i0f
        i0 = i0f.astype(jnp.int32)
        ntiles = -(-n // tsz)
        tdims.append(ntiles)
        tk = jnp.clip(i0, 0, n - 1) // tsz
        origin = tk * tsz
        for d in (0, 1):
            ik = i0 + d
            ok = ((ik >= 0) & (ik < n)).astype(x.dtype)
            idx_cols.append((jnp.clip(ik, 0, n - 1) - origin)
                            .astype(x.dtype))
            w_cols.append((fr if d else 1.0 - fr) * ok)
        tile_id = tile_id * ntiles + tk
    cols = jnp.stack(idx_cols + w_cols, axis=1)           # (N, 12)
    cols = jnp.pad(cols, ((0, 0), (0, 16 - cols.shape[1])))
    return tile_id, cols


def bin_points(tile_id: jnp.ndarray, cols: jnp.ndarray, num_tiles: int,
               payload: Sequence[jnp.ndarray] = ()):
    """Sort rows by tile, padding each tile's run to a CHUNK multiple.

    Gather-free: a histogram computes each tile's pad count; a block of
    ``num_tiles * CHUNK`` synthetic zero-weight rows carries key
    ``tile`` for the first ``pad_t`` rows of tile t's block and a trash
    key (sorts last) for the rest; one variadic sort then yields runs
    whose chunks never straddle tiles.

    Returns (chunk_tiles (C,) int32, sorted_cols, sorted_payload,
    n_real_chunks) -- rows past the real data are zero-weight.
    """
    N = tile_id.shape[0]
    K = CHUNK
    counts = jax.ops.segment_sum(jnp.ones_like(tile_id), tile_id,
                                 num_segments=num_tiles)
    # Empty tiles get one full dummy chunk so EVERY tile is visited:
    # the gradient kernel accumulates per-tile output blocks and an
    # unvisited block would be left uninitialized.
    pad_t = jnp.where(counts == 0, K, (-counts) % K)
    # num_tiles*K dummy candidates pad each tile's run to a K multiple
    # (excess routed to the trash key, which sorts last); (-N) % K more
    # unconditional trash rows make the TOTAL row count a K multiple.
    n_cand = num_tiles * K + (-N) % K
    cand_i = jnp.arange(n_cand, dtype=jnp.int32)
    cand_tile = jnp.minimum(cand_i // K, num_tiles - 1)
    cand_pos = cand_i % K
    cand_key = jnp.where((cand_i < num_tiles * K)
                         & (cand_pos < pad_t[cand_tile]),
                         cand_tile, num_tiles)
    keys = jnp.concatenate([tile_id, cand_key])
    zcols = jnp.zeros((n_cand, cols.shape[1]), cols.dtype)
    ops = [keys] + [jnp.concatenate([cols[:, i], zcols[:, i]])
                    for i in range(cols.shape[1])]
    # lax.sort is variadic over EQUAL-SHAPED 1-D operands: decompose
    # multi-channel payloads into columns and restack after the sort.
    pay_shapes = []
    for p in payload:
        pz = jnp.concatenate([p, jnp.zeros((n_cand,) + p.shape[1:],
                                           p.dtype)])
        if pz.ndim == 1:
            pay_shapes.append(1)
            ops.append(pz)
        else:
            pay_shapes.append(pz.shape[1])
            ops.extend(pz[:, i] for i in range(pz.shape[1]))
    sorted_ops = jax.lax.sort(ops, num_keys=1)
    skeys = sorted_ops[0]
    scols = jnp.stack(sorted_ops[1:1 + cols.shape[1]], axis=1)
    flat_pay = list(sorted_ops[1 + cols.shape[1]:])
    spay = []
    for p, w in zip(payload, pay_shapes):
        if p.ndim == 1:
            spay.append(flat_pay.pop(0))
        else:
            spay.append(jnp.stack([flat_pay.pop(0) for _ in range(w)],
                                  axis=1))
    chunk_tiles = jnp.minimum(skeys[::K], num_tiles - 1).astype(jnp.int32)
    # number of chunks holding real (non-trash) rows
    n_real = (N + jnp.sum(pad_t)).astype(jnp.int32)
    return chunk_tiles, scols, spay, n_real


def _interp_kernel(ct_ref, cols_ref, tiles_ref, out_ref):
    cols = cols_ref[...]                     # (CHUNK, 16)
    tbl = tiles_ref[0]                       # (_WPAD, fpad)
    iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, _WPAD), 1)
    ix = cols[:, 0:2].astype(jnp.int32)
    jy = cols[:, 2:4].astype(jnp.int32)
    kz = cols[:, 4:6].astype(jnp.int32)
    wx, wy, wz = cols[:, 6:8], cols[:, 8:10], cols[:, 10:12]
    acc = jnp.zeros((CHUNK, _WPAD), jnp.float32)
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                lin = (ix[:, di] * 17 + jy[:, dj]) * 17 + kz[:, dk]
                w = wx[:, di] * wy[:, dj] * wz[:, dk]
                acc = acc + jnp.where(iota == lin[:, None],
                                      w[:, None], 0.0)
    out_ref[...] = jnp.dot(acc, tbl,
                           preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("fpad", "interpret"))
def _tiled_interp_call(chunk_tiles, sorted_cols, tiles, fpad=8,
                       interpret=False):
    C = sorted_cols.shape[0] // CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((CHUNK, 16), lambda c, ct: (c, 0)),
            pl.BlockSpec((1, _WPAD, fpad), lambda c, ct: (ct[c], 0, 0)),
        ],
        out_specs=pl.BlockSpec((CHUNK, fpad), lambda c, ct: (c, 0)),
    )
    return pl.pallas_call(
        _interp_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C * CHUNK, fpad), jnp.float32),
        interpret=interpret,
    )(chunk_tiles, sorted_cols, tiles)


def _onehot(cols, iota, deriv_axis=None):
    """(CHUNK, _WPAD) trilinear weight matrix for one chunk.

    ``deriv_axis``: None -> value weights; 0/1/2 -> d/d(fr_axis)
    weights (corner sign on that axis, other axes' lerp weights)."""
    ix = cols[:, 0:2].astype(jnp.int32)
    jy = cols[:, 2:4].astype(jnp.int32)
    kz = cols[:, 4:6].astype(jnp.int32)
    w = (cols[:, 6:8], cols[:, 8:10], cols[:, 10:12])
    acc = jnp.zeros(iota.shape, jnp.float32)
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                lin = (ix[:, di] * 17 + jy[:, dj]) * 17 + kz[:, dk]
                fs = (di, dj, dk)
                ws = []
                for ax in range(3):
                    if deriv_axis == ax:
                        # d/dfr of (d ? fr : 1-fr), with the axis's
                        # validity mask preserved: w0+w1 = mask when
                        # both corners valid.  |sign| folds the mask.
                        ws.append((1.0 if fs[ax] else -1.0)
                                  * (w[ax][:, 0] + w[ax][:, 1]))
                    else:
                        ws.append(w[ax][:, fs[ax]])
                wv = ws[0] * ws[1] * ws[2]
                acc = acc + jnp.where(iota == lin[:, None],
                                      wv[:, None], 0.0)
    return acc


def _interp_grad_kernel(ct_ref, cols_ref, g_ref, gtiles_ref):
    """Accumulate d(loss)/d(halo tile) = onehot^T @ g per tile.

    Chunks of one tile are consecutive (bin_points), so the output
    block stays VMEM-resident across them; it is zero-initialized on
    the first chunk of each tile."""
    c = pl.program_id(0)
    first = jnp.where(c == 0, True, ct_ref[c] != ct_ref[jnp.maximum(c - 1, 0)])

    @pl.when(first)
    def _():
        gtiles_ref[...] = jnp.zeros(gtiles_ref.shape, gtiles_ref.dtype)

    cols = cols_ref[...]
    g = g_ref[...]                            # (CHUNK, fpad)
    iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, _WPAD), 1)
    acc = _onehot(cols, iota)
    gtiles_ref[0] += jnp.dot(acc.T, g, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("num_tiles", "fpad",
                                             "interpret"))
def _tiled_interp_grad_call(chunk_tiles, sorted_cols, g, num_tiles,
                            fpad=8, interpret=False):
    C = sorted_cols.shape[0] // CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((CHUNK, 16), lambda c, ct: (c, 0)),
            pl.BlockSpec((CHUNK, fpad), lambda c, ct: (c, 0)),
        ],
        out_specs=pl.BlockSpec((1, _WPAD, fpad),
                               lambda c, ct: (ct[c], 0, 0)),
    )
    return pl.pallas_call(
        _interp_grad_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, _WPAD, fpad),
                                       jnp.float32),
        interpret=interpret,
    )(chunk_tiles, sorted_cols, g)


@jax.custom_vjp
def sorted_tiled_interp(tiles, scols, ct):
    """Differentiable (wrt ``tiles``) sorted-order tiled interpolation.

    The backward runs the transposed kernel (onehot^T @ g accumulated
    per tile); the halo-tile cotangent then flows through
    ``halo_tiles``'s own autodiff (a conv-patches transpose -- the
    structured overlap-sum back onto the grid), so
    ``jax.grad`` of a loss wrt the TABLE works end to end with no
    scatter anywhere.  Gradients wrt the point columns are NOT
    implemented (zeros) -- pose/coord training paths must keep the XLA
    gather for now."""
    return _tiled_interp_call(ct, scols, tiles)


def _sti_fwd(tiles, scols, ct):
    return _tiled_interp_call(ct, scols, tiles), (tiles.shape[0], scols, ct)


def _sti_bwd(res, g):
    num_tiles, scols, ct = res
    dtiles = _tiled_interp_grad_call(ct, scols, g, num_tiles)
    return dtiles, jnp.zeros_like(scols), None


sorted_tiled_interp.defvjp(_sti_fwd, _sti_bwd)


def tiled_grid_interpolate(table: jnp.ndarray, x: jnp.ndarray,
                           bound, payload: Sequence[jnp.ndarray] = (),
                           interpret: bool = False):
    """Trilinear interpolation of ``x`` against ``table`` via the
    tiled MXU kernel.

    Returns (values (Npad, F) in SORTED order, sorted payload list).
    Callers either reduce order-free (losses), carry an index payload
    to unsort, or generate points tile-ordered in the first place.
    Rows past the real points are zero (zero weights).
    """
    X, Y, Z, F = table.shape
    bound = np.asarray(bound, np.float32)
    tile_id, cols = point_cols(x, bound, (X, Y, Z))
    tdims = tuple(-(-s // t) for s, t in zip((X, Y, Z), TILE))
    T = int(np.prod(tdims))
    chunk_tiles, scols, spay, _ = bin_points(tile_id, cols, T,
                                             payload=payload)
    tiles = halo_tiles(table)
    out = _tiled_interp_call(chunk_tiles, scols, tiles,
                             interpret=interpret)
    return out[:, :F], spay
