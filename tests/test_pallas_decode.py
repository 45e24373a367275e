"""Fused Pallas decode kernel: value + gradient parity with the jnp MLP.

On the CPU test backend the kernel runs in Pallas interpreter mode
(same kernel code path); on TPU it compiles to Mosaic.
"""
import jax
import jax.numpy as jnp
import numpy as np

from miso_tpu.ops.mlp import mlp_apply, mlp_init
from miso_tpu.ops.pallas_decode import pallas_decode


def test_pallas_decode_matches_mlp(rng):
    params = mlp_init(jax.random.PRNGKey(0), 8, 1, 64, 1, bias=True)
    x = jnp.asarray(rng.standard_normal((1000, 8)).astype(np.float32))
    ref = mlp_apply(params, x)
    out = pallas_decode(params, x, force=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


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
