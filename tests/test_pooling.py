"""Pooling / voxel ops tests vs torch scatter reference semantics."""
import pytest
import jax.numpy as jnp
import numpy as np

from miso_tpu.ops.pooling import grid_pool_avg, voxel_down_sample_indices


pytestmark = pytest.mark.fast


def test_grid_pool_avg_matches_manual(rng):
    bound = np.array([[0.0, 2.0], [0.0, 2.0], [0.0, 1.0]], np.float32)
    cell = 0.5
    N, C = 500, 3
    pts = rng.uniform([0, 0, 0], [2, 2, 1], size=(N, 3)).astype(np.float32)
    feats = rng.standard_normal((N, C)).astype(np.float32)
    out = np.asarray(grid_pool_avg(jnp.asarray(pts), jnp.asarray(feats),
                                   jnp.asarray(bound), cell))
    assert out.shape == (4, 4, 2, C)
    # Manual average (reference utils.py:239-291 semantics).
    idx = np.clip(np.floor((pts - bound[:, 0]) / cell).astype(int), 0, [3, 3, 1])
    ref = np.zeros((4, 4, 2, C))
    cnt = np.zeros((4, 4, 2))
    for n in range(N):
        i, j, k = idx[n]
        ref[i, j, k] += feats[n]
        cnt[i, j, k] += 1
    ref /= np.maximum(cnt, 1)[..., None]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_grid_pool_out_of_bound_clamped(rng):
    bound = np.array([[0.0, 1.0], [0.0, 1.0], [0.0, 1.0]], np.float32)
    pts = np.array([[-5.0, 0.5, 0.5], [5.0, 0.5, 0.5]], np.float32)
    feats = np.array([[1.0], [2.0]], np.float32)
    out = np.asarray(grid_pool_avg(jnp.asarray(pts), jnp.asarray(feats),
                                   jnp.asarray(bound), 0.5))
    assert out[0, 1, 1, 0] == 1.0
    assert out[1, 1, 1, 0] == 2.0


def test_voxel_down_sample(rng):
    pts = rng.uniform(0, 1, size=(1000, 3))
    idx = voxel_down_sample_indices(pts, 0.25)
    down = pts[idx]
    # One point per occupied voxel.
    vox = np.floor(down / 0.25).astype(int)
    uniq = np.unique(vox, axis=0)
    assert len(uniq) == len(down)
    all_vox = np.unique(np.floor(pts / 0.25).astype(int), axis=0)
    assert len(uniq) == len(all_vox)
