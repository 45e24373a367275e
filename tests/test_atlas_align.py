"""GridAtlas + hierarchical alignment tests.

Alignment test mirrors the reference's synthetic validation strategy
(SURVEY.md section 4: perturb -> align -> pose-RMSE threshold), but without
training: both submaps' grids are filled from one smooth analytic world
feature field, so the latent alignment optimum is the GT relative pose.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miso_tpu.align.miso import align_multiple_submaps_hierarchical
from miso_tpu.models.grid_atlas import (GridAtlas, fold_stacked,
                                         grid_atlas_mask, unfold_stacked)
from miso_tpu.ops import interp, se3

CFG_MODEL = {
    "spatial_dim": 3,
    "grid": {"type": "regular", "feature_dim": 2, "init_stddev": 0.0,
             "bound": [[-1, 1], [-1, 1], [-1, 1]],
             "base_cell_size": 0.5, "per_level_scale": 2.0, "n_levels": 2},
    "decoder": {"type": "mlp", "hidden_dim": 16, "hidden_layers": 1,
                "out_dim": 1, "pos_invariant": True, "fix": True,
                "pretrained_model": None},
    "pose": {"optimize": True, "num_poses": 4},
}


def world_feature(x):
    """Smooth, spatially-distinctive world feature field (N, 3) -> (N, 2)."""
    x = np.asarray(x)
    f0 = (np.sin(2.1 * x[:, 0] + 0.5) + 0.8 * np.cos(1.7 * x[:, 1])
          + 0.6 * np.sin(1.9 * x[:, 2] + 0.3) + 0.4 * np.sin(1.3 * (x[:, 0] + x[:, 1])))
    f1 = (0.7 * np.cos(2.3 * x[:, 1] + 1.0) + 0.5 * np.sin(1.6 * x[:, 0] - 0.4)
          + 0.6 * np.cos(1.8 * x[:, 2]) + 0.3 * np.cos(1.1 * (x[:, 1] + x[:, 2])))
    return np.stack([f0, f1], axis=-1).astype(np.float32)


def build_atlas(n_submaps=2, offset=0.5):
    # offset is an integer multiple of every level's cell size so the two
    # submaps' lattices coincide in world space: their trilinear
    # reconstructions agree exactly at the GT pose (sharp zero minimum).
    """Overlapping submaps along x, grids filled from the world field."""
    atlas = GridAtlas(CFG_MODEL, max_kfs_per_submap=4)
    bound = np.array([[-1, 1], [-1, 1], [-1, 1]], np.float32)
    for s in range(n_submaps):
        t = np.array([offset * s, 0, 0], np.float32)
        atlas.add_submap(bound, np.eye(3, dtype=np.float32), t)
        atlas.add_kf()  # anchor
    p = atlas.params
    feats = []
    for level in range(p.num_levels):
        shape = atlas.submap_shapes(0)[level]
        arrs = []
        for s in range(n_submaps):
            verts = np.asarray(interp.vertex_positions(shape, p.bounds[s]))
            world = verts + np.array([offset * s, 0, 0], np.float32)
            arrs.append(world_feature(world).reshape(*shape, 2))
        feats.append(jnp.asarray(fold_stacked(np.stack(arrs))))
    # Mark every cell observed: stability grids ship as zeros, which
    # would void any stability_thresh>0 loss (all-masked -> loss 0 and
    # parity tests comparing zeros).
    atlas.params = p.replace(
        features=tuple(feats),
        stability=tuple(jnp.ones_like(s) for s in p.stability))
    return atlas


def test_atlas_forward_and_poses():
    atlas = build_atlas()
    p = atlas.params
    # Submap poses compose correctly.
    R, t = p.updated_submap_poses()
    np.testing.assert_allclose(np.asarray(t), [[0, 0, 0], [0.5, 0, 0]], atol=1e-6)
    Rg, tg = p.updated_kf_poses_in_world()
    np.testing.assert_allclose(np.asarray(tg[1]), [0.5, 0, 0], atol=1e-6)
    # Forward: points in overlap take masked average of both submaps
    # (grid_atlas.py:374-391 semantics).
    x = jnp.asarray(np.array([[0.4, 0.0, 0.0]], np.float32))
    feats = p.query_feature(x)
    manual = []
    for s in range(2):
        g = atlas.get_submap(s)
        xs = x - jnp.asarray([[0.5 * s, 0.0, 0.0]])
        manual.append(np.asarray(g.query_feature(xs)))
    np.testing.assert_allclose(np.asarray(feats), 0.5 * (manual[0] + manual[1]),
                               rtol=1e-5, atol=1e-5)
    out = p(x)
    assert out.shape == (1, 1)
    # A point outside every submap -> zero features.
    far = jnp.asarray(np.array([[50.0, 0, 0]], np.float32))
    np.testing.assert_allclose(np.asarray(p.query_feature(far)), 0.0)


@pytest.mark.fast
def test_submap_view_roundtrip():
    atlas = build_atlas()
    g = atlas.get_submap(1)
    assert g.features[0].shape == (4, 4, 4, 2)
    # Mutate and write back.
    g2 = g.replace(features=tuple(f + 1.0 for f in g.features))
    atlas.set_submap(1, g2)
    np.testing.assert_allclose(
        np.asarray(atlas.get_submap(1).features[0]),
        np.asarray(g.features[0]) + 1.0, atol=1e-6)


@pytest.mark.fast
def test_intersection_check():
    atlas = build_atlas(offset=0.5)
    assert atlas.check_submap_intersection(0, 1)
    far_atlas = build_atlas(offset=10.0)
    assert not far_atlas.check_submap_intersection(0, 1)


@pytest.mark.slow
def test_hierarchical_alignment_recovers_pose():
    atlas = build_atlas()
    # Perturb submap 1 pose (align_submaps.py:265-273 analog, smaller noise).
    dr = np.array([0.0, 0.0, 0.06], np.float32)   # ~3.4 deg yaw
    dt = np.array([0.08, -0.05, 0.04], np.float32)
    atlas.set_submap_pose_correction(1, dr, dt)
    R, t = atlas.params.updated_submap_poses()
    err_t0 = float(jnp.linalg.norm(t[1] - jnp.asarray([0.5, 0, 0])))
    err_r0 = float(se3.rotation_rmse_deg(R[1:2], se3.identity_rotations(1)))
    assert err_t0 > 0.05

    align_multiple_submaps_hierarchical(
        atlas, level_iters=120, lr=5e-3, align_weight=3000.0,
        align_loss="L2", latent_levels=[0, 1], skip_finetune=True,
        verbose=False)

    R, t = atlas.params.updated_submap_poses()
    err_t = float(jnp.linalg.norm(t[1] - jnp.asarray([0.5, 0, 0])))
    err_r = float(se3.rotation_rmse_deg(R[1:2], se3.identity_rotations(1)))
    assert err_t < 0.4 * err_t0, (err_t0, err_t)
    assert err_r < 0.6 * err_r0, (err_r0, err_r)
    # Submap 0 stayed anchored.
    np.testing.assert_allclose(np.asarray(atlas.params.sub_trans_corr[0]), 0.0)


@pytest.mark.fast
def test_atlas_mask_shapes():
    atlas = build_atlas()
    mask = grid_atlas_mask(atlas.params, submap_pose=True)
    assert float(mask.sub_rot_corr[0, 0]) == 0.0  # anchored
    assert float(mask.sub_rot_corr[1, 0]) == 1.0
    assert float(jnp.asarray(mask.features[0])) == 0.0


@pytest.mark.slow
def test_trained_submap_alignment_end_to_end():
    """The full MISO pipeline on trained submaps: two overlapping grids
    trained to convergence on local GT-SDF samples with a shared frozen
    decoder, perturbed, then hierarchically aligned (latent + sdf).
    CPU-sized version of demo/align_submaps.py's verified recipe."""
    import jax
    import jax.numpy as jnp

    from miso_tpu.align.miso import align_multiple_submaps_hierarchical
    from miso_tpu.datasets.sdf_3d import Sdf3D
    from miso_tpu.datasets.shapes import box, icosphere, merge_meshes, room_scene
    from miso_tpu.losses.miso import make_loss
    from miso_tpu.losses.sdf import tsdf_loss_3d
    from miso_tpu.models.grid_atlas import GridAtlas
    from miso_tpu.models.grid_net import create_grid_net
    from miso_tpu.native import TriangleMesh
    from miso_tpu.ops import se3
    from miso_tpu.train.trainer import GridTrainer

    verts, tris = merge_meshes(
        room_scene(5.0, seed=0),
        box(size=(0.8, 0.6, 1.0), center=(0.0, 0.7, -0.4)),
        icosphere(2, 0.4, center=(0.2, -0.9, 0.0)))
    mesh = TriangleMesh(verts, tris)
    centers = [np.array([-1.2, 0, 0], np.float32), np.array([1.2, 0, 0], np.float32)]
    bound_local = np.array([[-2.4, 2.4], [-2.4, 2.4], [-1.6, 1.6]], np.float32)
    cfg_model = {
        "spatial_dim": 3,
        "grid": {"type": "regular", "feature_dim": 4, "init_stddev": 1e-4,
                 "bound": bound_local.tolist(), "base_cell_size": 0.8,
                 "per_level_scale": 4.0, "n_levels": 2},
        "decoder": {"type": "mlp", "hidden_dim": 32, "hidden_layers": 1,
                    "out_dim": 1, "pos_invariant": True, "fix": False,
                    "pretrained_model": None},
        "pose": {"optimize": True, "num_poses": 1},
    }
    loss_fn = make_loss(tsdf_loss_3d, sdf_weight=3e3, sign_weight=1e2,
                        eik_weight=0.0, trunc_dist=0.3)
    ds_all = Sdf3D(mesh, batch_size=2**12, total_samples=2**15, trunc_dist=0.3)
    pre = create_grid_net(jax.random.PRNGKey(11),
                          dict(cfg_model, grid=dict(cfg_model["grid"],
                                                    bound=ds_all.bound.tolist())))
    dec = GridTrainer({"optimizer": "adam", "learning_rate": 5e-3,
                       "epochs": 100, "max_epochs_in_level": 35,
                       "grid_training_mode": "coordinate+joint"},
                      pre, loss_fn, ds_all).train().decoder
    cfg_model["decoder"]["fix"] = True
    atlas = GridAtlas(cfg_model, max_kfs_per_submap=1)
    for c in centers:
        atlas.add_submap(bound_local, np.eye(3, dtype=np.float32), c)
        atlas.add_kf()
    atlas.params = atlas.params.replace(decoder=dec)

    class LocalSdf:
        def __init__(self, center):
            self.center = center

        def sample(self, rng):
            b = ds_all.sample(rng)
            c = b["coords"] - self.center
            inside = np.all((c >= bound_local[:, 0]) & (c <= bound_local[:, 1]),
                            axis=1, keepdims=True)
            return {"coords": c.astype(np.float32), "sdf": b["sdf"],
                    "sdf_valid": b["sdf_valid"] * inside,
                    "sdf_signs": b["sdf_signs"] * inside}

    for s, c in enumerate(centers):
        g = atlas.get_submap(s).replace(decoder=dec, decoder_fixed=True)
        tr = GridTrainer({"optimizer": "adam", "learning_rate": 5e-3,
                          "epochs": 100, "max_epochs_in_level": 35,
                          "grid_training_mode": "coordinate+joint"},
                         g, loss_fn, LocalSdf(c))
        atlas.set_submap(s, tr.train())

    # Perturb submap 1 and align.
    dr = np.array([0.0, 0.0, np.radians(3.0)], np.float32)
    dt = np.array([0.10, -0.06, 0.02], np.float32)
    atlas.set_submap_pose_correction(1, dr, dt)
    R_gt = np.eye(3, dtype=np.float32)

    def errors():
        R, t = atlas.params.updated_submap_poses()
        rot = float(se3.rotation_rmse_deg(jnp.asarray(R[1:]),
                                          jnp.asarray(R_gt)[None]))
        tr_ = float(np.linalg.norm(np.asarray(t[1]) - centers[1]))
        return rot, tr_

    rot0, tr0 = errors()
    align_multiple_submaps_hierarchical(
        atlas, level_iters=70, finetune_iters=70, lr=5e-3,
        align_loss="L2", latent_levels=[0, 1], skip_finetune=False,
        verbose=False, seed=0)
    rot1, tr1 = errors()
    assert rot1 < 0.5 * rot0, (rot0, rot1)
    assert tr1 < 0.5 * tr0, (tr0, tr1)


def test_vmapped_pair_loss_matches_unrolled():
    """The vmapped batched pair loss equals the sum of unrolled
    per-pair losses at identical params (no subsampling)."""
    from miso_tpu.align.miso import (make_vmapped_pair_loss,
                                     pairwise_loss_latent, pairwise_loss_sdf)

    atlas = build_atlas(3, offset=0.4)
    atlas.set_submap_pose_correction(
        1, np.array([0, 0, 0.05], np.float32), np.array([0.05, 0, 0], np.float32))
    atlas.precompute_coordinates_for_alignment()
    p = atlas.params
    pairs = [(0, 1), (0, 2), (1, 2)]
    key = jax.random.PRNGKey(0)
    for level in range(2):
        coords = {s: atlas.coordinates_for_alignment(s, level) for s in range(3)}
        ctx = (jnp.asarray([s for s, _ in pairs], jnp.int32),
               jnp.asarray([d for _, d in pairs], jnp.int32),
               jnp.stack([coords[s][0] for s, _ in pairs]),
               jnp.stack([coords[s][1] for s, _ in pairs]))
        batched = make_vmapped_pair_loss("latent", level=level,
                                         align_weight=1.0)
        got = float(sum(batched(p, key, ctx).values()))
        want = 0.0
        for s, d in pairs:
            cf, vf = coords[s]
            want += float(sum(pairwise_loss_latent(
                p, atlas, s, d, level, cf, vf, align_weight=1.0).values()))
        np.testing.assert_allclose(got, want, rtol=1e-4)
    # SDF variant.
    coords = {s: atlas.coordinates_for_alignment(s, 1) for s in range(3)}
    ctx = (jnp.asarray([s for s, _ in pairs], jnp.int32),
           jnp.asarray([d for _, d in pairs], jnp.int32),
           jnp.stack([coords[s][0] for s, _ in pairs]),
           jnp.stack([coords[s][1] for s, _ in pairs]))
    batched = make_vmapped_pair_loss("sdf", align_weight=1.0)
    got = float(sum(batched(p, key, ctx).values()))
    want = sum(float(sum(pairwise_loss_sdf(
        p, atlas, s, d, *coords[s], align_weight=1.0).values()))
        for s, d in pairs)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_flat_pair_loss_matches_vmapped():
    """make_flat_pair_loss (per-point batch + segment sums -- the fast
    execution shape) equals make_vmapped_pair_loss numerically for every
    loss kind, including with per-pair subsampling (identical pair-
    identity-derived keys -> identical draws)."""
    from miso_tpu.align.miso import (make_flat_pair_loss,
                                     make_vmapped_pair_loss)

    atlas = build_atlas(3, offset=0.4)
    atlas.set_submap_pose_correction(
        1, np.array([0, 0, 0.05], np.float32),
        np.array([0.05, 0, 0], np.float32))
    atlas.precompute_coordinates_for_alignment()
    p = atlas.params
    pairs = [(0, 1), (0, 2), (1, 2)]
    key = jax.random.PRNGKey(3)

    def ctx_at(level):
        coords = {s: atlas.coordinates_for_alignment(s, level)
                  for s in range(3)}
        return (jnp.asarray([s for s, _ in pairs], jnp.int32),
                jnp.asarray([d for _, d in pairs], jnp.int32),
                jnp.stack([coords[s][0] for s, _ in pairs]),
                jnp.stack([coords[s][1] for s, _ in pairs]))

    cases = [dict(kind="latent", level=0, align_loss="L2"),
             dict(kind="latent", level=1, align_loss="L1"),
             dict(kind="latent", level=1, align_loss="cos"),
             dict(kind="sdf", align_loss="L2"),
             dict(kind="sdf", align_loss="GM"),
             dict(kind="latent", level=1, align_loss="L2",
                  subsample_points=64),
             dict(kind="sdf", align_loss="L2", subsample_points=64)]
    for case in cases:
        kind = case.pop("kind")
        level = case.pop("level", None)
        ctx = ctx_at(level if level is not None else 1)
        kw = dict(align_weight=1.0, stability_thresh=0.1, **case)
        if kind == "latent":
            kw["level"] = level
        flat = make_flat_pair_loss(kind, **kw)(p, key, ctx)
        vm = make_vmapped_pair_loss(kind, **kw)(p, key, ctx)
        assert set(flat) == set(vm)
        for name in vm:
            np.testing.assert_allclose(np.asarray(flat[name]),
                                       np.asarray(vm[name]),
                                       rtol=2e-4, atol=1e-6), (kind, case)


def test_flat_pair_loss_chunked_matches_unchunked(monkeypatch):
    """The point-chunked execution of make_flat_pair_loss (lax.map over
    bounded chunks + partial segment sums, the path that keeps big-atlas
    alignment from killing the TPU worker) matches the single-pass body
    in value AND pose gradient.  Chunk size is env-driven and part of
    the loss cache key; a deliberately tiny chunk forces many map steps
    plus a padded tail."""
    from miso_tpu.align.miso import make_flat_pair_loss

    atlas = build_atlas(3, offset=0.4)
    atlas.set_submap_pose_correction(
        1, np.array([0, 0, 0.05], np.float32),
        np.array([0.05, 0, 0], np.float32))
    atlas.precompute_coordinates_for_alignment()
    p = atlas.params
    pairs = [(0, 1), (0, 2), (1, 2)]
    key = jax.random.PRNGKey(3)
    coords = {s: atlas.coordinates_for_alignment(s, 1) for s in range(3)}
    ctx = (jnp.asarray([s for s, _ in pairs], jnp.int32),
           jnp.asarray([d for _, d in pairs], jnp.int32),
           jnp.stack([coords[s][0] for s, _ in pairs]),
           jnp.stack([coords[s][1] for s, _ in pairs]))
    PN = ctx[2].shape[0] * ctx[2].shape[1]
    chunk = 100                       # odd size -> padded tail chunk
    assert PN > 2 * chunk

    cases = [dict(kind="latent", level=1, align_loss="L2"),
             dict(kind="latent", level=1, align_loss="cos"),
             dict(kind="sdf", align_loss="GM"),
             dict(kind="sdf", align_loss="L2", subsample_points=64)]
    for case in cases:
        kind = case.pop("kind")
        kw = dict(align_weight=1.0, stability_thresh=0.1, **case)

        monkeypatch.delenv("MISO_FLAT_ALIGN_CHUNK", raising=False)
        full_fn = make_flat_pair_loss(kind, **kw)
        monkeypatch.setenv("MISO_FLAT_ALIGN_CHUNK", str(chunk))
        chunk_fn = make_flat_pair_loss(kind, **kw)
        assert chunk_fn is not full_fn  # distinct cache entries

        def total(fn, rot, tr):
            p2 = p.replace(sub_rot_corr=rot, sub_trans_corr=tr)
            return sum(jax.tree_util.tree_leaves(fn(p2, key, ctx)))

        v_full, g_full = jax.value_and_grad(
            lambda r, t: total(full_fn, r, t), argnums=(0, 1))(
            p.sub_rot_corr, p.sub_trans_corr)
        v_chunk, g_chunk = jax.value_and_grad(
            lambda r, t: total(chunk_fn, r, t), argnums=(0, 1))(
            p.sub_rot_corr, p.sub_trans_corr)
        np.testing.assert_allclose(np.asarray(v_chunk), np.asarray(v_full),
                                   rtol=2e-5, atol=1e-7)
        for ga, gb in zip(g_chunk, g_full):
            np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                       rtol=2e-4, atol=1e-6)


def test_flat_pair_loss_precompute_src_matches_inline(monkeypatch):
    """The 6-tuple ctx from precompute_src (pose-independent src
    features/SDF + src-side mask hoisted out of the solve loop) gives
    the same value AND pose gradient as the 4-tuple inline path, for
    every kind, with subsampling, truncation, and tiny chunks."""
    from miso_tpu.align.miso import make_flat_pair_loss

    atlas = build_atlas(3, offset=0.4)
    atlas.set_submap_pose_correction(
        1, np.array([0, 0, 0.05], np.float32),
        np.array([0.05, 0, 0], np.float32))
    atlas.precompute_coordinates_for_alignment()
    p = atlas.params
    pairs = [(0, 1), (0, 2), (1, 2)]
    key = jax.random.PRNGKey(3)
    coords = {s: atlas.coordinates_for_alignment(s, 1) for s in range(3)}
    ctx4 = (jnp.asarray([s for s, _ in pairs], jnp.int32),
            jnp.asarray([d for _, d in pairs], jnp.int32),
            jnp.stack([coords[s][0] for s, _ in pairs]),
            jnp.stack([coords[s][1] for s, _ in pairs]))

    cases = [dict(kind="latent", level=1, align_loss="L2",
                  trunc_factor=3.0),
             dict(kind="latent", level=1, align_loss="cos",
                  subsample_points=64),
             dict(kind="sdf", align_loss="GM"),
             dict(kind="sdf", align_loss="L2", subsample_points=64)]
    for chunk_env in (None, "100"):
        if chunk_env is None:
            monkeypatch.delenv("MISO_FLAT_ALIGN_CHUNK", raising=False)
        else:
            monkeypatch.setenv("MISO_FLAT_ALIGN_CHUNK", chunk_env)
        for case in [dict(c) for c in cases]:
            kind = case.pop("kind")
            fn = make_flat_pair_loss(
                kind, align_weight=1.0, stability_thresh=0.1, **case)
            ctx6 = fn.precompute_src(p, ctx4)
            assert len(ctx6) == 6 and ctx6[4].shape[:2] == ctx4[2].shape[:2]

            def total(rot, tr, ctx):
                p2 = p.replace(sub_rot_corr=rot, sub_trans_corr=tr)
                return sum(jax.tree_util.tree_leaves(fn(p2, key, ctx)))

            v4, g4 = jax.value_and_grad(total, argnums=(0, 1))(
                p.sub_rot_corr, p.sub_trans_corr, ctx4)
            v6, g6 = jax.value_and_grad(total, argnums=(0, 1))(
                p.sub_rot_corr, p.sub_trans_corr, ctx6)
            np.testing.assert_allclose(np.asarray(v6), np.asarray(v4),
                                       rtol=2e-5, atol=1e-7)
            for ga, gb in zip(g6, g4):
                np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                           rtol=2e-4, atol=1e-6)


def test_scanned_alignment_segments_match_one_dispatch(monkeypatch):
    """The segmented solve (bounded dispatches, host early-exit between
    segments -- the watchdog guard) is bit-identical to one whole-run
    dispatch, across segment sizes that divide and don't divide the
    iteration count."""
    from miso_tpu.align.miso import (generic_align_multiple_submaps,
                                     make_flat_pair_loss)

    def run(seg):
        monkeypatch.setenv("MISO_ALIGN_SEG_ITERS", str(seg))
        atlas = build_atlas(3, offset=0.4)
        atlas.set_submap_pose_correction(
            1, np.array([0, 0, 0.04], np.float32),
            np.array([0.04, 0, 0], np.float32))
        atlas.precompute_coordinates_for_alignment()
        coords = {s: atlas.coordinates_for_alignment(s, 1) for s in range(3)}
        pairs = [(0, 1), (0, 2), (1, 2)]
        ctx = (jnp.asarray([s for s, _ in pairs], jnp.int32),
               jnp.asarray([d for _, d in pairs], jnp.int32),
               jnp.stack([coords[s][0] for s, _ in pairs]),
               jnp.stack([coords[s][1] for s, _ in pairs]))
        fn = make_flat_pair_loss("latent", level=1, align_weight=1.0)
        ctx = fn.precompute_src(atlas.params, ctx)
        info = generic_align_multiple_submaps(
            atlas, fn, num_iters=11, lr=5e-3, rel_change_thresh=1e-3,
            batched_loss=True, loss_ctx=ctx, seed=5)
        return (np.asarray(atlas.params.sub_rot_corr),
                np.asarray(atlas.params.sub_trans_corr), info)

    r_big, t_big, info_big = run(64)       # one segment covers all
    assert info_big["segments_run"] == 1
    for seg in (3, 5, 12):
        r_s, t_s, info_s = run(seg)
        np.testing.assert_array_equal(r_s, r_big)
        np.testing.assert_array_equal(t_s, t_big)
        assert 1 <= info_s["segments_run"] <= -(-12 // seg)


def test_scanned_alignment_matches_loop():
    """The scanned alignment driver (one dispatch, on-device rel-change
    freeze) equals the per-iteration host loop exactly -- same key
    sequence, same early exit (VERDICT r2 item 2; lm_solve pattern)."""
    from miso_tpu.align.miso import (generic_align_multiple_submaps,
                                     make_vmapped_pair_loss)

    def run(scan, thresh):
        atlas = build_atlas(3, offset=0.4)
        atlas.set_submap_pose_correction(
            1, np.array([0, 0, 0.05], np.float32),
            np.array([0.05, -0.03, 0.02], np.float32))
        atlas.set_submap_pose_correction(
            2, np.array([0.02, 0, -0.03], np.float32),
            np.array([-0.04, 0.05, 0.0], np.float32))
        atlas.precompute_coordinates_for_alignment()
        pairs = [(0, 1), (0, 2), (1, 2)]
        coords = {s: atlas.coordinates_for_alignment(s, 0) for s in range(3)}
        ctx = (jnp.asarray([s for s, _ in pairs], jnp.int32),
               jnp.asarray([d for _, d in pairs], jnp.int32),
               jnp.stack([coords[s][0] for s, _ in pairs]),
               jnp.stack([coords[s][1] for s, _ in pairs]))
        loss = make_vmapped_pair_loss("latent", level=0, align_weight=100.0)
        generic_align_multiple_submaps(
            atlas, loss, num_iters=25, lr=5e-3, rel_change_thresh=thresh,
            batched_loss=True, loss_ctx=ctx, seed=3, scan=scan)
        return (np.asarray(atlas.params.sub_rot_corr),
                np.asarray(atlas.params.sub_trans_corr))

    # No early exit: every iteration runs in both paths.
    r_loop, t_loop = run(scan=False, thresh=0.0)
    r_scan, t_scan = run(scan=True, thresh=0.0)
    np.testing.assert_allclose(r_scan, r_loop, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(t_scan, t_loop, rtol=1e-6, atol=1e-7)
    assert np.abs(t_scan).max() > 0  # poses actually moved
    # With a loose threshold the early exit must fire identically (the
    # rel-change trajectory of this setup dips to ~0.116 mid-run).
    r_loop2, t_loop2 = run(scan=False, thresh=0.13)
    r_scan2, t_scan2 = run(scan=True, thresh=0.13)
    np.testing.assert_allclose(r_scan2, r_loop2, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(t_scan2, t_loop2, rtol=1e-6, atol=1e-7)
    # The threshold actually cut iterations (pose differs from full run).
    assert np.abs(t_loop2 - t_loop).max() > 1e-6


@pytest.mark.slow
def test_many_submap_alignment_one_jit():
    """9 overlapping submaps aligned with the vmapped pair axis: one
    compile regardless of the 30+ intersecting pairs (VERDICT round-1
    item 5; reference unrolls pairs, align/base.py:127-146)."""
    n = 9
    atlas = build_atlas(n, offset=0.5)
    rng = np.random.default_rng(3)
    true_t = np.array([[0.5 * s, 0, 0] for s in range(n)], np.float32)
    for s in range(1, n):
        atlas.set_submap_pose_correction(
            s, rng.normal(0, 0.02, 3).astype(np.float32),
            rng.normal(0, 0.04, 3).astype(np.float32))
    R, t = atlas.params.updated_submap_poses()
    err0 = float(np.linalg.norm(np.asarray(t) - true_t, axis=1).mean())
    align_multiple_submaps_hierarchical(
        atlas, level_iters=80, lr=5e-3, align_weight=3000.0,
        latent_levels=[0], skip_finetune=True)
    R, t = atlas.params.updated_submap_poses()
    err1 = float(np.linalg.norm(np.asarray(t) - true_t, axis=1).mean())
    assert err1 < 0.5 * err0, (err0, err1)


@pytest.mark.fast
def test_alignment_noop_without_pairs():
    """Single submap (or no intersecting pairs): alignment is a no-op,
    not a crash (Fuser.align() runs on 1-submap SLAM sessions)."""
    atlas = build_atlas(1)
    info = align_multiple_submaps_hierarchical(atlas, level_iters=5,
                                               skip_finetune=False)
    assert info["cpu_time_sec"] == 0.0
    far = build_atlas(2, offset=10.0)  # no overlap
    info = align_multiple_submaps_hierarchical(far, level_iters=5)
    np.testing.assert_allclose(np.asarray(far.params.sub_trans_corr), 0.0)


def test_bundle_adjust_multiple_submaps():
    """Joint BA (deprecated reference miso.py:324-381): poses + features
    refine together, submap 0 anchored, loss decreases."""
    from miso_tpu.align.miso import bundle_adjust_multiple_submaps

    atlas = build_atlas(2)
    atlas.set_submap_pose_correction(
        1, np.array([0, 0, 0.03], np.float32),
        np.array([0.04, -0.02, 0.0], np.float32))

    class Ds:
        def sample(self, rng):
            N = 512
            x = rng.uniform(-0.8, 0.8, (N, 3)).astype(np.float32)
            sdf = (np.linalg.norm(x, axis=1, keepdims=True) - 0.5).astype(np.float32)
            return {"coords_frame": x,
                    "sample_frame_ids": rng.integers(0, 2, (N,)).astype(np.int32),
                    "weights": np.ones((N, 1), np.float32),
                    "sdf": sdf, "sdf_valid": np.ones_like(sdf),
                    "sdf_signs": np.zeros_like(sdf)}

    p0 = atlas.params
    info = bundle_adjust_multiple_submaps(atlas, Ds(), num_epochs=20,
                                          pose_lr=1e-3, map_lr=1e-3)
    assert np.isfinite(info["final_loss"])
    # Features moved, submap 0 pose stayed anchored.
    assert float(jnp.abs(atlas.params.features[0] - p0.features[0]).max()) > 0
    np.testing.assert_allclose(np.asarray(atlas.params.sub_trans_corr[0]), 0.0)
    assert float(jnp.abs(atlas.params.sub_trans_corr[1] -
                         p0.sub_trans_corr[1]).max()) > 0


@pytest.mark.fast
def test_aot_only_prewarm_compiles_without_executing():
    """aot_only=True compiles the align-coords / src-precompute / solve
    executables at the run's exact shapes and touches NEITHER the atlas
    params nor the device with real work (the Fuser prewarm path: an
    executed throwaway align at quad scale hard-faulted the worker)."""
    atlas = build_atlas(3, offset=0.5)
    before = jax.tree_util.tree_map(np.asarray, atlas.params)
    info = align_multiple_submaps_hierarchical(
        atlas, level_iters=4, finetune_iters=4, skip_finetune=False,
        max_align_points=64, subsample_points=32)
    # prewarm AFTER a real align: same loss/solve cache objects
    atlas2 = build_atlas(3, offset=0.5)
    info_pw = align_multiple_submaps_hierarchical(
        atlas2, level_iters=4, finetune_iters=4, skip_finetune=False,
        max_align_points=64, subsample_points=32, aot_only=True)
    for k, v in info_pw.items():
        if isinstance(v, dict):
            assert v.get("aot_only"), (k, v)
    # prewarm did not move the atlas
    after = jax.tree_util.tree_map(np.asarray, atlas2.params)
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(a, b)
    # and a real align still runs after an aot_only prewarm
    align_multiple_submaps_hierarchical(
        atlas2, level_iters=2, finetune_iters=2, skip_finetune=False,
        max_align_points=64, subsample_points=32)
