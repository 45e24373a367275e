"""Interpolation kernel tests.

Mirrors the reference's native-kernel test strategy
(`third_party/cuda_gridsample_grad2/test2d.py`, `test3d.py`): compare
values and first/second-order gradients against torch
``F.grid_sample(align_corners=False, padding_mode='zeros')`` (the exact
op the reference uses) and against finite differences.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from miso_tpu.ops.interp import (
    grid_interpolate,
    grid_shape_for_bound,
    multi_level_interpolate,
    normalize_coordinates,
    vertex_positions,
)

jax.config.update("jax_enable_x64", False)


pytestmark = pytest.mark.fast


def torch_grid_sample_3d(grid_xyzf, x, bound):
    """Oracle: reference-style grid_sample call (grid_modules.py:72-95).

    grid_xyzf: (gx, gy, gz, F) ours -> torch (1, F, gz, gy, gx).
    """
    g = torch.from_numpy(np.asarray(grid_xyzf)).permute(3, 2, 1, 0).unsqueeze(0)
    xn = normalize_coordinates(jnp.asarray(x), jnp.asarray(bound))
    coords = torch.from_numpy(np.asarray(xn)).reshape(1, -1, 1, 1, 3)
    out = F.grid_sample(g.double(), coords.double(), align_corners=False,
                        padding_mode="zeros")
    return out[0, :, :, 0, 0].T.numpy()  # (N, F)


def torch_grid_sample_2d(grid_xyf, x, bound):
    g = torch.from_numpy(np.asarray(grid_xyf)).permute(2, 1, 0).unsqueeze(0)
    xn = normalize_coordinates(jnp.asarray(x), jnp.asarray(bound))
    coords = torch.from_numpy(np.asarray(xn)).reshape(1, -1, 1, 2)
    out = F.grid_sample(g.double(), coords.double(), align_corners=False,
                        padding_mode="zeros")
    return out[0, :, :, 0].T.numpy()


@pytest.mark.parametrize("shape", [(5, 6, 7), (3, 3, 3)])
def test_trilinear_matches_torch(rng, shape):
    F_ = 4
    grid = rng.standard_normal((*shape, F_)).astype(np.float32)
    bound = np.array([[-1.0, 2.0], [0.0, 3.0], [-2.0, -0.5]], np.float32)
    # Include in-bound, boundary, and out-of-bound queries.
    x = np.concatenate([
        rng.uniform(bound[:, 0], bound[:, 1], size=(200, 3)),
        rng.uniform(bound[:, 0] - 1.0, bound[:, 1] + 1.0, size=(100, 3)),
        np.stack([bound[:, 0], bound[:, 1]], axis=0),
    ]).astype(np.float32)
    ours = grid_interpolate(jnp.asarray(grid), jnp.asarray(x), jnp.asarray(bound))
    ref = torch_grid_sample_3d(grid, x, bound)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_bilinear_matches_torch(rng):
    grid = rng.standard_normal((6, 4, 3)).astype(np.float32)
    bound = np.array([[-1.0, 1.0], [-2.0, 2.0]], np.float32)
    x = rng.uniform(-2.5, 2.5, size=(300, 2)).astype(np.float32)
    ours = grid_interpolate(jnp.asarray(grid), jnp.asarray(x), jnp.asarray(bound))
    ref = torch_grid_sample_2d(grid, x, bound)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_gradients_wrt_coords_and_grid(rng):
    """First-order grads vs torch autograd (test3d.py analog)."""
    shape, F_ = (4, 5, 6), 2
    grid = rng.standard_normal((*shape, F_)).astype(np.float64)
    bound = np.array([[0.0, 1.0], [0.0, 1.0], [0.0, 1.0]])
    x = rng.uniform(0.05, 0.95, size=(50, 3))

    def loss_jax(g, xx):
        return jnp.sum(jnp.sin(grid_interpolate(g, xx, jnp.asarray(bound))))

    with jax.enable_x64(True):
        gg, gx = jax.grad(loss_jax, argnums=(0, 1))(jnp.asarray(grid), jnp.asarray(x))

    tg = torch.from_numpy(grid).permute(3, 2, 1, 0).unsqueeze(0).requires_grad_(True)
    xn = 2.0 * (x - bound[:, 0]) / (bound[:, 1] - bound[:, 0]) - 1.0
    tx = torch.from_numpy(xn.copy()).reshape(1, -1, 1, 1, 3).requires_grad_(True)
    out = F.grid_sample(tg, tx, align_corners=False, padding_mode="zeros")
    torch.sin(out[0, :, :, 0, 0].T).sum().backward()
    ref_gg = tg.grad[0].permute(3, 2, 1, 0).numpy()
    np.testing.assert_allclose(np.asarray(gg), ref_gg, rtol=1e-6, atol=1e-8)
    # Coord grads: chain rule through normalization (xn = 2(x-lo)/(hi-lo)-1).
    scale = 2.0 / (bound[:, 1] - bound[:, 0])
    ref_gx = tx.grad.reshape(-1, 3).numpy() * scale
    np.testing.assert_allclose(np.asarray(gx), ref_gx, rtol=1e-6, atol=1e-8)


def test_second_order_gradients():
    """grad-of-grad flows (the raison d'etre of the reference CUDA ext).

    d/dgrid of ||d interp/dx||^2 must be nonzero and match finite
    differences -- the exact computation in eikonal training
    (SURVEY.md section 2.9).
    """
    with jax.enable_x64(True):
        rng = np.random.default_rng(1)
        shape, F_ = (4, 4, 4), 1
        grid = jnp.asarray(rng.standard_normal((*shape, F_)))
        bound = jnp.asarray(np.array([[0.0, 1.0]] * 3))
        x = jnp.asarray(rng.uniform(0.1, 0.9, size=(20, 3)))

        def eik(g):
            def f(xx):
                return grid_interpolate(g, xx, bound)
            grad_x = jax.grad(lambda xx: jnp.sum(f(xx)))(x)
            return jnp.sum((jnp.linalg.norm(grad_x, axis=-1) - 1.0) ** 2)

        analytic = jax.grad(eik)(grid)
        assert float(jnp.abs(analytic).max()) > 0.0
        # Finite-difference check on a few entries.
        eps = 1e-6
        flat = np.asarray(grid).ravel()
        for idx in [0, 13, 37, 63]:
            gp = flat.copy(); gp[idx] += eps
            gm = flat.copy(); gm[idx] -= eps
            fd = (eik(jnp.asarray(gp.reshape(grid.shape)))
                  - eik(jnp.asarray(gm.reshape(grid.shape)))) / (2 * eps)
            np.testing.assert_allclose(np.asarray(analytic).ravel()[idx], fd,
                                       rtol=1e-4, atol=1e-6)


def test_multi_level_and_ignore(rng):
    bound = jnp.asarray(np.array([[0.0, 1.0]] * 3, np.float32))
    g0 = jnp.asarray(rng.standard_normal((2, 2, 2, 3)).astype(np.float32))
    g1 = jnp.asarray(rng.standard_normal((4, 4, 4, 3)).astype(np.float32))
    x = jnp.asarray(rng.uniform(0, 1, size=(10, 3)).astype(np.float32))
    out = multi_level_interpolate([g0, g1], x, bound)
    assert out.shape == (10, 6)
    ig = multi_level_interpolate([g0, g1], x, bound, ignore_level=jnp.array([0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(ig[:, 3:]), 0.0)
    np.testing.assert_allclose(np.asarray(ig[:, :3]), np.asarray(out[:, :3]))


def test_vertex_positions_roundtrip():
    """Interpolating at a vertex position returns that vertex's feature."""
    rng = np.random.default_rng(2)
    shape = (3, 4, 5)
    grid = jnp.asarray(rng.standard_normal((*shape, 2)).astype(np.float32))
    bound = jnp.asarray(np.array([[-1.0, 1.0], [0.0, 2.0], [1.0, 3.0]], np.float32))
    vp = vertex_positions(shape, bound)
    out = grid_interpolate(grid, vp, bound)
    np.testing.assert_allclose(np.asarray(out), np.asarray(grid.reshape(-1, 2)),
                               rtol=1e-5, atol=1e-5)


def test_grid_shape_for_bound():
    assert grid_shape_for_bound(np.array([[0, 2.0], [0, 2.0], [0, 1.0]]), 0.5) == (4, 4, 2)
    assert grid_shape_for_bound(np.array([[0, 2.1], [0, 2.0], [0, 1.0]]), 0.5) == (5, 4, 2)
