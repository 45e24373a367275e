"""Spatial-gradient method parity (ops/diff.py).

``autograd`` (forward-mode, the default: gather-only, scan-safe on the
TPU transport) must agree with ``autograd_vjp`` (reverse mode, the
reference's torch-autograd orientation, grid_opt/diff.py:14-38) on a
real feature-grid field, to float32 roundoff, including when the
gradient itself is differentiated again (eikonal-style).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miso_tpu.models.grid_net import create_grid_net
from miso_tpu.ops.diff import gradient3d

pytestmark = pytest.mark.fast


def _small_grid(seed=0):
    cfg = {
        "spatial_dim": 3,
        "decoder": {"type": "mlp", "hidden_dim": 16, "hidden_layers": 1,
                    "out_dim": 1, "pos_invariant": True, "fix": False,
                    "pretrained_model": None},
        "grid": {"type": "regular", "feature_dim": 4, "init_stddev": 0.3,
                 "bound": [[-1.0, 1.0]] * 3, "base_cell_size": 0.5,
                 "per_level_scale": 2.0, "n_levels": 2},
        "pose": {"optimize": False, "num_poses": 1},
    }
    return create_grid_net(jax.random.PRNGKey(seed), cfg)


def test_forward_mode_matches_reverse_mode():
    grid = _small_grid()
    x = jnp.asarray(np.random.default_rng(0).uniform(-0.9, 0.9, (257, 3)),
                    jnp.float32)
    g_fwd = gradient3d(x, grid, "autograd")
    g_vjp = gradient3d(x, grid, "autograd_vjp")
    np.testing.assert_allclose(np.asarray(g_fwd), np.asarray(g_vjp),
                               rtol=1e-5, atol=1e-5)


def test_forward_mode_scan_safe_and_jit():
    grid = _small_grid()
    x = jnp.asarray(np.random.default_rng(1).uniform(-0.9, 0.9, (4, 65, 3)),
                    jnp.float32)

    @jax.jit
    def scanned(grid, xs):
        def body(acc, c):
            return acc + gradient3d(c, grid, "autograd").sum(), None
        return jax.lax.scan(body, jnp.float32(0), xs)[0]

    ref = sum(float(gradient3d(x[k], grid, "autograd_vjp").sum())
              for k in range(x.shape[0]))
    np.testing.assert_allclose(float(scanned(grid, x)), ref, rtol=1e-4)


def test_forward_mode_second_order():
    """Eikonal-style: d/dfeatures of ||grad f||^2 must match between the
    two orientations (the double-backward the reference built CUDA
    kernels for, gridsample_cuda.cu:214)."""
    grid = _small_grid(3)
    x = jnp.asarray(np.random.default_rng(2).uniform(-0.9, 0.9, (129, 3)),
                    jnp.float32)

    def eik(features, method):
        g2 = grid.replace(features=features)
        g = gradient3d(x, g2, method)
        return jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    d_fwd = jax.grad(eik)(grid.features, "autograd")
    d_vjp = jax.grad(eik)(grid.features, "autograd_vjp")
    for a, b in zip(jax.tree_util.tree_leaves(d_fwd),
                    jax.tree_util.tree_leaves(d_vjp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
