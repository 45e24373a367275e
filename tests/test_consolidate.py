"""Atlas -> single fused GridNet consolidation (fuse-then-mesh).

The atlas forward is decode(masked-average of per-submap trilinear
features); trilinear interpolation is linear in the tables, so
resampling the TRUE atlas feature field at a fused grid's own nodes
reproduces the field exactly when submap poses are identity, and to
O(cell * pose-delta) under small pose corrections
(models/grid_atlas.py::consolidated_grid; reference meshes the atlas
directly, grid_atlas.py:330-356 + utils_sdf.py:69-86).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miso_tpu.models.grid_atlas import GridAtlas
from miso_tpu.ops.mlp import mlp_init

BOUND = np.array([[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]], np.float32)

CFG = {
    "spatial_dim": 3,
    "grid": {"type": "regular", "feature_dim": 3, "init_stddev": 0.3,
             "bound": BOUND.tolist(), "base_cell_size": 0.5,
             "per_level_scale": 2.0, "n_levels": 2},
    "decoder": {"type": "mlp", "hidden_dim": 16, "hidden_layers": 1,
                "out_dim": 1, "pos_invariant": True, "fix": True,
                "pretrained_model": None},
    "pose": {"optimize": True, "num_poses": 2},
}


def _atlas(n_sub=3, seed=0, jitter=0.0):
    atlas = GridAtlas(CFG, max_kfs_per_submap=2, capacity=n_sub + 1)
    rng = np.random.default_rng(seed)
    for s in range(n_sub):
        # Overlapping but not identical world placements.
        tws = np.array([0.3 * s, -0.2 * s, 0.1 * s], np.float32) \
            if jitter else np.zeros(3, np.float32)
        atlas.add_submap(BOUND, tws=tws)
    key = jax.random.PRNGKey(seed)
    p = atlas.params
    feats = []
    for lv, f in enumerate(p.features):
        key, sub = jax.random.split(key)
        feats.append(0.3 * jax.random.normal(sub, f.shape, f.dtype))
    key, sub = jax.random.split(key)
    dec = mlp_init(sub, p.fdim * atlas.num_levels, 1, 16, 1, bias=True)
    p = p.replace(features=tuple(feats), decoder=dec)
    if jitter:
        key, k1, k2 = jax.random.split(key, 3)
        p = p.replace(
            sub_rot_corr=jitter * jax.random.normal(k1, p.sub_rot_corr.shape),
            sub_trans_corr=jitter
            * jax.random.normal(k2, p.sub_trans_corr.shape))
    atlas.params = p
    return atlas


def _sample_pts(atlas, n=4096, seed=1):
    rng = np.random.default_rng(seed)
    b = atlas.global_bound()
    return jnp.asarray(
        rng.uniform(b[:, 0], b[:, 1], size=(n, 3)).astype(np.float32))


@pytest.mark.fast
def test_consolidated_exact_at_identity_poses():
    atlas = _atlas(n_sub=3, jitter=0.0)
    fused = atlas.consolidated_grid(chunk=1 << 12)
    pts = _sample_pts(atlas)
    ref = np.asarray(atlas.params(pts))
    got = np.asarray(fused(pts))
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.fast
def test_consolidated_close_under_pose_corrections():
    atlas = _atlas(n_sub=3, jitter=0.01)
    fused = atlas.consolidated_grid(chunk=1 << 12)
    pts = _sample_pts(atlas)
    ref = np.asarray(atlas.params(pts))
    got = np.asarray(fused(pts))
    # O(cell * pose-delta) resampling error, small vs field range.
    scale = float(np.abs(ref).mean()) + 1e-6
    err = float(np.abs(got - ref).mean())
    assert err / scale < 0.05, (err, scale)


@pytest.mark.fast
def test_consolidated_preserves_zero_outside_coverage():
    atlas = _atlas(n_sub=2, jitter=0.0)
    fused = atlas.consolidated_grid(chunk=1 << 12)
    far = jnp.asarray(np.array([[50.0, 50.0, 50.0]], np.float32))
    # Both querers see zero features there -> identical decode.
    np.testing.assert_allclose(np.asarray(fused(far)),
                               np.asarray(atlas.params(far)), atol=1e-6)
