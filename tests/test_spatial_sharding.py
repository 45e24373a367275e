"""Spatially-sharded grid interpolation (parallel/spatial.py).

Exactness vs the unsharded reference implementation, gradient parity,
and a sharded train step -- all on the 8-virtual-device CPU mesh
(conftest.py), the same validation path the driver uses for multi-chip.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from miso_tpu.ops import interp
from miso_tpu.parallel.spatial import (shard_grid_spatial,
                                       sharded_grid_interpolate,
                                       sharded_multi_level_interpolate,
                                       sharded_sdf_train_step)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()[:8]), ("grid",))


BOUND = np.array([[-2.0, 2.0], [-1.0, 1.0], [-1.0, 1.5]], np.float32)


def _mk(key, shape, F=4):
    return jax.random.normal(key, (*shape, F), jnp.float32)


def test_sharded_interp_matches_unsharded(mesh):
    key = jax.random.PRNGKey(0)
    grid = _mk(key, (37, 12, 9))        # X=37: NOT divisible by 8 (padding)
    xs = jax.random.uniform(jax.random.PRNGKey(1), (4096, 3),
                            minval=-2.4, maxval=2.4)  # incl. out-of-bound
    ref = interp.grid_interpolate(grid, xs, jnp.asarray(BOUND))
    gs, xl = shard_grid_spatial(grid, mesh)
    with jax.sharding.set_mesh(mesh):
        out = jax.jit(lambda g, x: sharded_grid_interpolate(
            g, x, BOUND, xl, mesh))(gs, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sharded_interp_gradients_match(mesh):
    key = jax.random.PRNGKey(2)
    grid = _mk(key, (16, 8, 8))
    xs = jax.random.uniform(jax.random.PRNGKey(3), (512, 3),
                            minval=-1.9, maxval=1.9)
    tgt = jax.random.normal(jax.random.PRNGKey(4), (512, 4))

    def loss_ref(g):
        return jnp.mean((interp.grid_interpolate(g, xs, jnp.asarray(BOUND))
                         - tgt) ** 2)

    g_ref = jax.grad(loss_ref)(grid)

    gs, xl = shard_grid_spatial(grid, mesh)

    def loss_sh(g):
        return jnp.mean((sharded_grid_interpolate(g, xs, BOUND, xl, mesh)
                         - tgt) ** 2)

    with jax.sharding.set_mesh(mesh):
        g_sh = jax.jit(jax.grad(loss_sh))(gs)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_sharded_train_step_fits_field(mesh):
    """Two-level sharded grid + linear decoder fits a toy SDF."""
    k = jax.random.PRNGKey(5)
    g0 = jnp.zeros((16, 8, 8, 4))
    g1 = jnp.zeros((40, 20, 20, 4))
    gs0, xl0 = shard_grid_spatial(g0, mesh)
    gs1, xl1 = shard_grid_spatial(g1, mesh)
    W = jnp.ones((8, 1)) * 0.25

    def decoder_apply(f):
        return f @ W

    xs = jax.random.uniform(k, (8192, 3), minval=-1.8, maxval=1.8)
    xs = xs * jnp.asarray([1.0, 0.5, 0.6]) + jnp.asarray([0.0, 0.0, 0.25])
    y = (jnp.linalg.norm(xs, axis=-1, keepdims=True) - 0.8)
    valid = jnp.ones_like(y)

    from miso_tpu.train.optim import masked_adam_init

    step = sharded_sdf_train_step(decoder_apply, mesh, lr=2e-2)
    grids = [gs0, gs1]
    opt = masked_adam_init(grids)
    with jax.sharding.set_mesh(mesh):
        losses = []
        for _ in range(120):
            grids, opt, l = step(grids, opt, (xl0, xl1), BOUND, xs, y, valid)
            losses.append(float(l))
    assert losses[-1] < 0.05 * losses[0], (losses[0], losses[-1])
    # The grids remained sharded across the mesh the whole time.
    assert len(grids[1].sharding.device_set) == 8
