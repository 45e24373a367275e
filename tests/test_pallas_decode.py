"""Pallas kernels: value + grad + grad^2 parity with the jnp reference.

On the CPU test backend the kernels run in Pallas interpreter mode
(same kernel code path); on TPU they compile to Mosaic.  Mirrors the
reference's native-kernel test strategy (test3d.py: naive-formula
oracle + gradcheck + gradgradcheck).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miso_tpu.ops.interp import grid_decode, multi_level_interpolate
from miso_tpu.ops.mlp import mlp_apply, mlp_init
from miso_tpu.ops.pallas_decode import fused_interp_decode, pallas_decode




@pytest.mark.fast
def test_pallas_decode_matches_mlp(rng):
    params = mlp_init(jax.random.PRNGKey(0), 8, 1, 64, 1, bias=True)
    x = jnp.asarray(rng.standard_normal((1000, 8)).astype(np.float32))
    ref = mlp_apply(params, x)
    out = pallas_decode(params, x, force=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.fast
def test_pallas_decode_grads(rng):
    params = mlp_init(jax.random.PRNGKey(1), 8, 1, 32, 1, bias=True)
    x = jnp.asarray(rng.standard_normal((300, 8)).astype(np.float32))

    def loss_ref(p, xx):
        return jnp.sum(mlp_apply(p, xx) ** 2)

    def loss_pal(p, xx):
        return jnp.sum(pallas_decode(p, xx, force=True) ** 2)

    g1 = jax.grad(loss_ref)(params, x)
    g2 = jax.grad(loss_pal)(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-3)
    gx1 = jax.grad(lambda xx: loss_ref(params, xx))(x)
    gx2 = jax.grad(lambda xx: loss_pal(params, xx))(x)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                               rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# Fused interp + concat + decode.
# ---------------------------------------------------------------------------

def _setup(rng, n_levels=2, fdim=4, N=700):
    bound = jnp.asarray([[-1.0, 1.0], [-1.0, 1.2], [-0.8, 1.0]], jnp.float32)
    grids = tuple(
        jnp.asarray(rng.normal(0, 1, (5 * (l + 1), 4 * (l + 1), 3 * (l + 1),
                                      fdim)).astype(np.float32))
        for l in range(n_levels))
    decoder = mlp_init(jax.random.PRNGKey(2), n_levels * fdim, 1, 32, 1,
                       bias=True)
    # Include out-of-bound queries: zeros-padding must match.
    x = jnp.asarray(rng.uniform(-1.3, 1.4, (N, 3)).astype(np.float32))
    return grids, bound, decoder, x


def _ref(grids, x, bound, decoder, ignore_level=None):
    feats = multi_level_interpolate(grids, x, bound, ignore_level)
    return grid_decode(feats, x, decoder, True)


@pytest.mark.fast
def test_fused_interp_decode_value(rng):
    grids, bound, decoder, x = _setup(rng)
    ref = _ref(grids, x, bound, decoder)
    out = fused_interp_decode(grids, x, bound, decoder, force=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.fast
def test_fused_interp_decode_ignore_level(rng):
    grids, bound, decoder, x = _setup(rng)
    ig = jnp.asarray([0.0, 1.0], jnp.float32)
    ref = _ref(grids, x, bound, decoder, ig)
    out = fused_interp_decode(grids, x, bound, decoder, ignore_level=ig,
                              force=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_interp_decode_grads(rng):
    grids, bound, decoder, x = _setup(rng, N=300)

    def loss_ref(g, p, xx):
        return jnp.sum(_ref(g, xx, bound, p) ** 2)

    def loss_pal(g, p, xx):
        return jnp.sum(fused_interp_decode(g, xx, bound, p, force=True) ** 2)

    for argnum in (0, 1, 2):
        g1 = jax.grad(loss_ref, argnums=argnum)(grids, decoder, x)
        g2 = jax.grad(loss_pal, argnums=argnum)(grids, decoder, x)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-3, atol=2e-4)


def test_fused_interp_decode_second_order(rng):
    """grad^2: eikonal-style losses differentiate through d(out)/dx.

    This is the capability the reference needed its CUDA grad2 kernel
    for (gridsample_cuda.cu:214, gradgradcheck in test3d.py).
    """
    grids, bound, decoder, x = _setup(rng, N=48)

    def eik_ref(g, xx):
        grad_x = jax.vmap(jax.grad(
            lambda pt: _ref(g, pt[None], bound, decoder)[0, 0]))(xx)
        return jnp.mean((jnp.linalg.norm(grad_x, axis=-1) - 1.0) ** 2)

    def eik_pal(g, xx):
        grad_x = jax.vmap(jax.grad(
            lambda pt: fused_interp_decode(g, pt[None], bound, decoder,
                                           force=True)[0, 0]))(xx)
        return jnp.mean((jnp.linalg.norm(grad_x, axis=-1) - 1.0) ** 2)

    # Value of the first-order quantity...
    np.testing.assert_allclose(float(eik_pal(grids, x)),
                               float(eik_ref(grids, x)), rtol=1e-3)
    # ...and its gradient wrt grid features (second order overall).
    g1 = jax.grad(eik_ref)(grids, x)
    g2 = jax.grad(eik_pal)(grids, x)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-4)


@pytest.mark.fast
def test_fused_interp_decode_sized(rng):
    """Padded-storage path: logical sizes < static shapes."""
    grids, bound, decoder, x = _setup(rng)
    # Pad each grid with garbage rows; pass logical sizes.
    padded, sizes = [], []
    for g in grids:
        sp = g.shape[:-1]
        pg = jnp.asarray(rng.normal(0, 10, (sp[0] + 3, sp[1] + 2, sp[2] + 1,
                                            g.shape[-1])).astype(np.float32))
        pg = pg.at[: sp[0], : sp[1], : sp[2]].set(g)
        padded.append(pg)
        sizes.append(jnp.asarray(sp, jnp.int32))
    ref = _ref(grids, x, bound, decoder)
    out = fused_interp_decode(tuple(padded), x, bound, decoder,
                              sizes=tuple(sizes), force=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
