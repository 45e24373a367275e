"""Parity of the tiled MXU interpolation kernel (ops/pallas_interp.py)
with the XLA gather path (ops/interp.py::grid_interpolate)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miso_tpu.ops import interp
from miso_tpu.ops.pallas_interp import (CHUNK, bin_points, halo_tiles,
                                        point_cols, tiled_grid_interpolate)


def _ref_values(table, x, bound):
    return np.asarray(interp.grid_interpolate(jnp.asarray(table),
                                              jnp.asarray(x),
                                              jnp.asarray(bound)))


@pytest.mark.fast
@pytest.mark.parametrize("shape", [(9, 17, 18, 4), (24, 32, 33, 2)])
def test_tiled_interp_matches_xla_gather(shape):
    rng = np.random.default_rng(0)
    table = rng.normal(size=shape).astype(np.float32)
    bound = np.array([[-1.0, 1.4], [0.0, 2.0], [-2.0, 0.5]], np.float32)
    N = 1000
    # interior + out-of-bound points (zeros-padding semantics)
    x = rng.uniform(bound[:, 0] - 0.3, bound[:, 1] + 0.3,
                    size=(N, 3)).astype(np.float32)
    ref = _ref_values(table, x, bound)
    idx = jnp.arange(N, dtype=jnp.int32)
    vals, (sidx,) = tiled_grid_interpolate(
        jnp.asarray(table), jnp.asarray(x), bound, payload=[idx],
        interpret=True)
    vals = np.asarray(vals)
    sidx = np.asarray(sidx)
    # padded rows carry zero weights; real rows are identified by the
    # index payload (sorted order).  Dummy rows share index 0 with the
    # real first point -- disambiguate by matching values per index.
    got = np.zeros_like(ref)
    seen = np.zeros(N, bool)
    nz = np.abs(vals).sum(1) > 0
    got[sidx[nz]] = vals[nz]
    seen[sidx[nz]] = True
    # rows whose true value is ~0 can't be distinguished from padding;
    # for them parity holds trivially (both zero).
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.fast
def test_bin_points_runs_are_tile_pure():
    """Every CHUNK-sized run of the sorted rows lies in one tile."""
    rng = np.random.default_rng(1)
    shape = (24, 32, 33)
    bound = np.array([[0, 1], [0, 1], [0, 1]], np.float32)
    x = rng.uniform(0, 1, size=(5000, 3)).astype(np.float32)
    tile_id, cols = point_cols(jnp.asarray(x), bound, shape)
    tdims = (3, 2, 3)
    T = int(np.prod(tdims))
    chunk_tiles, scols, _, _ = bin_points(tile_id, cols, T)
    w = np.asarray(scols[:, 6:12])
    live = (np.abs(w).sum(1) > 0)
    keys = np.repeat(np.asarray(chunk_tiles), CHUNK)
    tid = np.asarray(tile_id)
    # recompute each sorted live row's tile from nothing but its chunk
    # assignment: counts per tile must match the original histogram
    hist0 = np.bincount(tid, minlength=T)
    hist1 = np.bincount(keys[live], minlength=T)
    np.testing.assert_array_equal(hist0, hist1)


@pytest.mark.fast
def test_halo_tiles_layout():
    rng = np.random.default_rng(2)
    table = rng.normal(size=(9, 17, 18, 4)).astype(np.float32)
    tiles = np.asarray(halo_tiles(jnp.asarray(table)))
    # tile 0's halo block equals the table's leading (9, 17, 17) region
    X = np.zeros((9, 17, 17, 4), np.float32)
    lim = np.minimum([9, 17, 17], table.shape[:3])
    X[:lim[0], :lim[1], :lim[2]] = table[:lim[0], :lim[1], :lim[2]]
    got = tiles[0, :9 * 17 * 17, :4].reshape(9, 17, 17, 4)
    np.testing.assert_array_equal(got, X)


@pytest.mark.fast
def test_tiled_interp_table_grad_matches_xla():
    """d(loss)/d(table) through the tiled kernel (transposed-onehot
    accumulation kernel + conv-patches-transpose halo fold) matches the
    XLA gather path's autodiff."""
    rng = np.random.default_rng(3)
    shape = (9, 17, 18, 4)
    table = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    bound = np.array([[-1.0, 1.4], [0.0, 2.0], [-2.0, 0.5]], np.float32)
    N = 700
    x = jnp.asarray(rng.uniform(bound[:, 0] - 0.2, bound[:, 1] + 0.2,
                                size=(N, 3)).astype(np.float32))
    cot = rng.normal(size=(N, shape[-1])).astype(np.float32)

    def loss_ref(tb):
        v = interp.grid_interpolate(tb, x, jnp.asarray(bound))
        return jnp.sum(v * jnp.asarray(cot))

    g_ref = np.asarray(jax.grad(loss_ref)(table))

    from miso_tpu.ops.pallas_interp import TILE

    tdims = tuple(-(-s // t) for s, t in zip(shape[:3], TILE))
    T = int(np.prod(tdims))
    idx = jnp.arange(N, dtype=jnp.int32)
    tile_id, cols = point_cols(x, bound, shape[:3])
    ct, scols, (sidx,), _ = bin_points(tile_id, cols, T, payload=[idx])
    # sorted cotangent: dummy rows contribute zero via zero weights,
    # but they ALIAS index 0 -- zero their cotangent by masking on the
    # weight columns instead of the index.
    live = (np.abs(np.asarray(scols[:, 6:12])).sum(1) > 0)
    cot_sorted = np.asarray(jnp.asarray(cot)[sidx]) * live[:, None]
    cot_sorted = jnp.asarray(np.pad(cot_sorted, ((0, 0), (0, 4))))

    g_tiled = np.asarray(jax.grad(
        lambda tb: _loss_tiled_interpret(tb, scols, ct, cot_sorted))(table))
    np.testing.assert_allclose(g_tiled, g_ref, rtol=1e-4, atol=1e-4)


def _loss_tiled_interpret(tb, scols, ct, cot_sorted):
    from miso_tpu.ops.pallas_interp import (_tiled_interp_call,
                                            _tiled_interp_grad_call,
                                            halo_tiles)

    @jax.custom_vjp
    def sti(tiles, scols_, ct_):
        return _tiled_interp_call(ct_, scols_, tiles, interpret=True)

    def fwd(tiles, scols_, ct_):
        return sti(tiles, scols_, ct_), (tiles.shape[0], scols_, ct_)

    def bwd(res, g):
        nt, scols_, ct_ = res
        dt = _tiled_interp_grad_call(ct_, scols_, g, nt, interpret=True)
        return dt, jnp.zeros_like(scols_), None

    sti.defvjp(fwd, bwd)
    out = sti(halo_tiles(tb), scols, ct)
    return jnp.sum(out * cot_sorted)
