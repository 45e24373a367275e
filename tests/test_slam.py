"""SLAM runtime tests on the synthetic sequence backend.

Mirrors the reference's synthetic-world validation (SURVEY.md section 4).
Small scenes/short sequences so the CPU suite stays fast:
  * LM tracker converges a perturbed KF pose on a trained grid,
  * the full System runs tracking+mapping over a short orbit and the
    resulting trajectory stays close to GT.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miso_tpu.datasets.sequence import SdfSequence, orbit_trajectory
from miso_tpu.datasets.shapes import icosphere, room_scene
from miso_tpu.losses.miso import make_loss, mapping_loss
from miso_tpu.models.grid_atlas import GridAtlas
from miso_tpu.models.grid_net import create_grid_net, grid_net_mask
from miso_tpu.native import TriangleMesh
from miso_tpu.ops import se3
from miso_tpu.slam.system import System
from miso_tpu.slam.tracker import Tracker
from miso_tpu.train.trainer import GridTrainer


@pytest.fixture(scope="module")
def seq():
    verts, tris = room_scene(4.0, seed=0)
    mesh = TriangleMesh(verts, tris)
    R, t = orbit_trajectory(center=[0, 0, 0], radius=1.4, height=1.2,
                            num_frames=12, look_at=[0, 0, -0.5])
    return SdfSequence(mesh, R, t, frame_samples=2**11, frame_batchsize=2048,
                       trunc_dist=0.3, near_surface_std=0.1, seed=1)


@pytest.fixture(scope="module")
def pretrained_decoder_path(tmp_path_factory):
    """Pretrain the shared MLP decoder on the scene (the SLAM configs
    assume a pretrained fixed decoder, scannet.yaml:17)."""
    from miso_tpu.datasets.sdf_3d import Sdf3D
    from miso_tpu.losses.sdf import tsdf_loss_3d
    from miso_tpu.train.checkpoint import save_pytree

    verts, tris = room_scene(4.0, seed=0)
    mesh = TriangleMesh(verts, tris)
    ds = Sdf3D(mesh, batch_size=2**13, total_samples=2**16, trunc_dist=0.3)
    cfg = dict(MODEL_CFG)
    cfg["decoder"] = dict(MODEL_CFG["decoder"], fix=False, pretrained_model=None)
    model = create_grid_net(jax.random.PRNGKey(7), cfg)
    loss_fn = make_loss(tsdf_loss_3d, sdf_weight=3e3, sign_weight=1e2,
                        eik_weight=0.0, trunc_dist=0.3)
    tr = GridTrainer({"optimizer": "adam", "learning_rate": 5e-3, "epochs": 200,
                      "max_epochs_in_level": 60,
                      "grid_training_mode": "coordinate+joint"},
                     model, loss_fn, ds)
    model = tr.train()
    path = str(tmp_path_factory.mktemp("dec") / "decoder.npz")
    save_pytree(path, model.decoder)
    return path


CFG = {
    "device": "tpu",
    "model": None,
    "tracking": {"solver": "lm", "learning_rate": 1e-3, "loss_type": "GM",
                 "trunc_dist": None, "gm_scale_sdf": 0.1, "lm_lambda": 1e-4,
                 "lm_max_iter": 12, "lm_tol_deg": 0.01, "lm_tol_m": 0.001,
                 "verbose": False},
    "mapping": {"learning_rate": 3e-3, "loss_type": "L1", "weight_sdf": 1.0,
                "weight_eik": 0.0, "weight_fs": 0.2, "trunc_dist": 0.3,
                "finite_diff_eps": 0.05, "grad_method": "finitediff",
                "eik_trunc_dist": 0.3, "verbose": False,
                "max_replay_frames": 5, "max_replay_freq": 2},
    # The submap frame is the first camera frame, so the bound must be a
    # rotation-proof cube covering the scene from the first camera
    # (room(4.0) half-diagonal ~3.0 + orbit offset ~2.0).
    "system": {"init_odom": "external", "submap_size": 100,
               "submap_local_bound": [[-5.0, 5.0], [-5.0, 5.0], [-5.0, 5.0]],
               "submap_fov_thresh": 0.0, "save_submap_mesh": False,
               "log_dir": "/tmp/miso_slam_test"},
    "visualizer": {"enable": False},
    "train": {"grid_training_mode": "coordinate+joint", "relchange_tol": 0.0},
    "align": {"level_iters": 30, "finetune_iters": 0, "learning_rate": 1e-2,
              "loss_type": "L2", "stability_thresh": 0.0,
              "subsample_points": None, "latent_levels": [0, 1],
              "skip_finetune": True, "pose_reg_weight": 0.0},
}

MODEL_CFG = {
    "spatial_dim": 3,
    "grid": {"type": "regular", "feature_dim": 4, "init_stddev": 1e-4,
             "bound": [[-3.0, 3.0], [-3.0, 3.0], [-2.0, 2.0]],
             "base_cell_size": 1.0, "per_level_scale": 4.0, "n_levels": 2},
    "decoder": {"type": "mlp", "hidden_dim": 32, "hidden_layers": 1,
                "out_dim": 1, "pos_invariant": True, "fix": False,
                "pretrained_model": None},
    "pose": {"optimize": True, "num_poses": 100},
}


def train_grid_on_sequence(seq, kfs, epochs=120):
    model = create_grid_net(jax.random.PRNGKey(0), MODEL_CFG)
    for kf in kfs:
        R, t = seq.true_kf_pose_in_world(kf)
        model = model.set_initial_kf_pose(kf, jnp.asarray(R), jnp.asarray(t))
    seq.select_keyframes(kfs)
    loss_fn = make_loss(mapping_loss, loss_type="L1", weight_sdf=1.0,
                        weight_eik=0.0, weight_fs=0.2, trunc_dist=0.3)
    cfg = {"optimizer": "adam", "learning_rate": 5e-3, "epochs": epochs,
           "max_epochs_in_level": 40, "grid_training_mode": "coordinate+joint"}

    def mask_for_level(m, level):
        return grid_net_mask(m, level=level, pose=False)

    tr = GridTrainer(cfg, model, loss_fn, seq, mask_for_level=mask_for_level)
    return tr.train()


@pytest.mark.slow
def test_lm_tracker_converges(seq):
    kfs = list(range(8))
    model = train_grid_on_sequence(seq, kfs)
    # Perturb KF 5's pose and let LM recover it.
    kf = 5
    R_gt, t_gt = seq.true_kf_pose_in_world(kf)
    dR = np.asarray(se3.so3_exp(jnp.asarray([0.0, 0.0, 0.03])))
    model = model.set_initial_kf_pose(kf, jnp.asarray(R_gt @ dR),
                                      jnp.asarray(t_gt + np.array([0.05, -0.04, 0.02],
                                                                  np.float32)))
    tracker = Tracker(model, seq, CFG)
    R0, t0 = tracker.grid.updated_kf_pose(kf)
    err_t0 = float(jnp.linalg.norm(t0 - jnp.asarray(t_gt)))
    tracker.track_lm(kf)
    R1, t1 = tracker.grid.updated_kf_pose(kf)
    err_t1 = float(jnp.linalg.norm(t1 - jnp.asarray(t_gt)))
    err_r1 = float(se3.rotation_rmse_deg(R1[None], jnp.asarray(R_gt)[None]))
    assert err_t1 < 0.5 * err_t0, (err_t0, err_t1)
    assert err_r1 < np.degrees(0.03), err_r1
    assert 0.5 < tracker.latest_fov_overlap <= 1.0


@pytest.mark.slow
def test_system_runs_full_slam(seq, pretrained_decoder_path):
    model_cfg = dict(MODEL_CFG)
    model_cfg["decoder"] = dict(MODEL_CFG["decoder"], fix=True,
                                pretrained_model=pretrained_decoder_path)
    atlas = GridAtlas(model_cfg, max_kfs_per_submap=CFG["system"]["submap_size"])
    R0, t0 = seq.true_kf_pose_in_world(0)
    system = System(atlas, seq, seq, CFG, R_world_origin=R0, t_world_origin=t0)
    system.run()
    assert atlas.num_keyframes == seq.num_kfs
    # Trajectory error vs GT (odometry here is noise-free, so mostly a
    # pipeline smoke + consistency check).
    R, t = atlas.params.updated_kf_poses_in_world()
    t_est = np.asarray(t)[: seq.num_kfs]
    t_gt = np.stack([seq.true_kf_pose_in_world(k)[1] for k in range(seq.num_kfs)])
    ate = np.sqrt(((t_est - t_gt) ** 2).sum(-1).mean())
    assert ate < 0.2, f"ATE {ate:.3f} m"
    # The map decodes a sensible SDF at a frame's surface points.
    pts_frame = seq.sampled_points_at_kf(3)[:256]
    R3, t3 = seq.true_kf_pose_in_world(3)
    pts_world = pts_frame @ np.asarray(R3).T + np.asarray(t3)
    sdf = np.asarray(atlas.params(jnp.asarray(pts_world)))
    assert np.abs(sdf).mean() < 0.15, np.abs(sdf).mean()


@pytest.mark.slow
def test_system_checkpoint_resume(seq, pretrained_decoder_path, tmp_path):
    """Save a mid-stream SLAM checkpoint, resume in a fresh System, and
    finish the sequence (capability beyond the reference, which has no
    mid-run SLAM resume: reference run_slam.py:60-75 restarts from
    scratch)."""
    model_cfg = dict(MODEL_CFG)
    model_cfg["decoder"] = dict(MODEL_CFG["decoder"], fix=True,
                                pretrained_model=pretrained_decoder_path)
    R0, t0 = seq.true_kf_pose_in_world(0)

    atlas1 = GridAtlas(model_cfg, max_kfs_per_submap=CFG["system"]["submap_size"])
    sys1 = System(atlas1, seq, seq, CFG, R_world_origin=R0, t_world_origin=t0)
    sys1.run(max_frames=4)
    ckpt = str(tmp_path / "slam_ckpt.npz")
    sys1.save_checkpoint(ckpt)

    atlas2 = GridAtlas(model_cfg, max_kfs_per_submap=CFG["system"]["submap_size"])
    sys2 = System(atlas2, seq, seq, CFG, R_world_origin=R0, t_world_origin=t0)
    sys2.load_checkpoint(ckpt)
    # Restored state matches the saved run exactly.
    assert atlas2.num_keyframes == atlas1.num_keyframes == 4
    assert atlas2.curr_submap_id == atlas1.curr_submap_id
    for a, b in zip(jax.tree_util.tree_leaves(atlas1.params),
                    jax.tree_util.tree_leaves(atlas2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    sys2.run()
    assert atlas2.num_keyframes == seq.num_kfs
    R, t = atlas2.params.updated_kf_poses_in_world()
    t_est = np.asarray(t)[: seq.num_kfs]
    t_gt = np.stack([seq.true_kf_pose_in_world(k)[1] for k in range(seq.num_kfs)])
    ate = np.sqrt(((t_est - t_gt) ** 2).sum(-1).mean())
    assert ate < 0.2, f"resumed ATE {ate:.3f} m"


@pytest.mark.fast
def test_lm_solve_matches_sequential_lm_steps(seq):
    """lm_solve (one scanned dispatch) applies exactly the same updates
    as sequential lm_step calls on the same batches (tolerances off)."""
    from miso_tpu.slam.tracker import lm_solve, lm_step

    model_cfg = dict(MODEL_CFG)
    grid = create_grid_net(jax.random.PRNGKey(1), model_cfg, num_poses=4)
    rng = np.random.default_rng(0)
    k = 4
    batches = []
    seq.select_keyframes([1])
    for _ in range(k):
        b = seq.sample(rng)
        batches.append(b)
    stack = lambda key_: jnp.asarray(np.stack([b[key_] for b in batches]))
    args = (jnp.float32(1e-4), jnp.float32(0.1), np.float32(np.inf))
    g_seq = grid
    for b in batches:
        g_seq, _ = lm_step(g_seq, jnp.asarray(b["coords_frame"]),
                           jnp.asarray(b["sdf"]), jnp.asarray(b["sdf_valid"]),
                           1, *args, loss_type="GM")
    rot_row, trans_row, infos = lm_solve(
        grid, stack("coords_frame"), stack("sdf"),
        stack("sdf_valid"), 1, *args,
        jnp.float32(0.0), jnp.float32(0.0),
        loss_type="GM")
    np.testing.assert_allclose(np.asarray(rot_row),
                               np.asarray(g_seq.rot_corr[1]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(trans_row),
                               np.asarray(g_seq.trans_corr[1]), atol=1e-6)
    assert infos["fov_overlap"].shape == (k,)


@pytest.mark.slow
def test_system_multi_submap_profiled(seq, pretrained_decoder_path):
    """Multi-submap System run with a capacity-preallocated atlas and the
    per-frame stage profiler: spawns submaps past the initial capacity
    (geometric regrow), finishes the sequence, and the profile summary
    explains ms/frame by stage (VERDICT r2 item 1 harness)."""
    model_cfg = dict(MODEL_CFG)
    model_cfg["decoder"] = dict(MODEL_CFG["decoder"], fix=True,
                                pretrained_model=pretrained_decoder_path)
    cfg = {k: (dict(v) if isinstance(v, dict) else v) for k, v in CFG.items()}
    cfg["system"] = dict(CFG["system"], submap_size=3, profile=True)
    atlas = GridAtlas(model_cfg, max_kfs_per_submap=3, capacity=2)
    R0, t0 = seq.true_kf_pose_in_world(0)
    system = System(atlas, seq, seq, cfg, R_world_origin=R0, t_world_origin=t0)
    system.run()
    assert atlas.num_keyframes == seq.num_kfs
    assert atlas.num_submaps == 4          # 12 frames / submap_size 3
    assert atlas.params.Rws.shape[0] >= 4  # grew past capacity 2
    act = np.asarray(atlas.params.active)
    assert act[:4].all() and not act[4:].any()
    prof = system.profile_summary()
    assert prof["n_frames"] >= seq.num_kfs - 1
    for k in ("track_ms", "map_ms", "sync_ms", "frame_ms"):
        assert k in prof and np.isfinite(prof[k]["median"]), (k, prof)
    # Sampling sub-stages are recorded and bounded by their stages.
    assert prof["map_sample_ms"]["median"] <= prof["map_ms"]["median"]
    # Fuser align+fuse runs on the multi-submap atlas (scanned path).
    from miso_tpu.slam.fuser import Fuser

    fuser = Fuser(atlas, seq, cfg)
    fuser.align()
    fuser.fuse(feat_lr=1e-3, submap_pose_lr=1e-4, kf_pose_lr=1e-4,
               iterations=5)
    R, t = atlas.params.updated_kf_poses_in_world()
    t_est = np.asarray(t)[: seq.num_kfs]
    t_gt = np.stack([seq.true_kf_pose_in_world(k)[1]
                     for k in range(seq.num_kfs)])
    ate = np.sqrt(((t_est - t_gt) ** 2).sum(-1).mean())
    assert ate < 0.4, f"ATE {ate:.3f} m"


def test_system_axis_aligned_submap_anchors(seq, pretrained_decoder_path):
    """system.submap_axis_aligned: new submaps anchor with identity world
    rotation and the anchor KF carries its rotation in-submap -- composed
    world KF poses remain consistent."""
    model_cfg = dict(MODEL_CFG)
    model_cfg["decoder"] = dict(MODEL_CFG["decoder"], fix=True,
                                pretrained_model=pretrained_decoder_path)
    cfg = {k: (dict(v) if isinstance(v, dict) else v) for k, v in CFG.items()}
    cfg["system"] = dict(CFG["system"], submap_size=4,
                         submap_axis_aligned=True)
    atlas = GridAtlas(model_cfg, max_kfs_per_submap=4, capacity=3)
    R0, t0 = seq.true_kf_pose_in_world(0)
    system = System(atlas, seq, seq, cfg, R_world_origin=R0, t_world_origin=t0)
    system.run(max_frames=9)
    assert atlas.num_submaps == 3
    Rws = np.asarray(atlas.params.Rws)
    for s in (1, 2):  # spawned submaps are axis-aligned in world
        np.testing.assert_allclose(Rws[s], np.eye(3), atol=1e-5)
    # Composed anchor-KF world rotation is NOT identity (carried in-submap).
    Rk, tk = atlas.params.updated_kf_poses_in_world()
    a1 = atlas.anchor_kf_for_submap(1)
    assert np.abs(np.asarray(Rk)[a1] - np.eye(3)).max() > 0.05
    # World KF positions stay near GT (tracking unaffected by the choice).
    t_gt = np.stack([seq.true_kf_pose_in_world(k)[1].reshape(3)
                     for k in range(9)])
    err = np.linalg.norm(np.asarray(tk)[:9] - t_gt, axis=1)
    assert err.max() < 0.5, err


@pytest.mark.slow
def test_system_fuser_recovers_drift_at_many_submaps(tmp_path):
    """System -> Fuser wiring at S = 8 with accumulated inter-submap
    drift and capacity growth: a circuit LiDAR run around the quad
    courtyard spawns 8 submaps (starting capacity 4, so the atlas
    regrows mid-run) with odometry drift injected at submap boundaries
    -- within-submap maps stay sharp, the submap FRAMES drift apart,
    which is exactly the error mode rigid submap alignment corrects
    (reference system.py:118-163 feeding fuser.py:29-54, the paper's
    headline multi-submap consistency claim; VERDICT r3 item 7).

    Regime calibration (CPU, this exact setup): align at 200 iters
    recovers KF ATE 0.49 -> 0.26 m (1.9x); an orbit regime with
    per-frame noise and fully-overlapping submaps only reaches ~1.2x
    because tracking absorbs intra-submap noise into the maps
    themselves.  The bar is 1.6x for headroom across backends."""
    from scipy.spatial.transform import Rotation

    from miso_tpu.datasets.sdf_3d import Sdf3D
    from miso_tpu.datasets.sequence import circuit_trajectory
    from miso_tpu.datasets.shapes import quad_scene
    from miso_tpu.losses.sdf import tsdf_loss_3d
    from miso_tpu.slam.fuser import Fuser
    from miso_tpu.train.checkpoint import save_pytree

    bound = [[-7.0, 7.0], [-7.0, 7.0], [-2.0, 4.0]]
    model_cfg = {
        "spatial_dim": 3,
        "grid": {"type": "regular", "feature_dim": 4, "init_stddev": 1e-4,
                 "bound": bound, "base_cell_size": 1.0,
                 "per_level_scale": 8.0, "n_levels": 2},
        "decoder": dict(MODEL_CFG["decoder"]),
        "pose": {"optimize": True, "num_poses": 100},
    }
    verts, tris = quad_scene(12.0, wall_height=3.0, seed=0, n_objects=10,
                             path_half_extent=4.0)
    mesh = TriangleMesh(verts, tris)

    # Pretrain the shared decoder on the scene's GT SDF (scannet.yaml:17).
    ds = Sdf3D(mesh, batch_size=2**13, total_samples=2**16, trunc_dist=0.3)
    dec_cfg = dict(model_cfg)
    dec_cfg["decoder"] = dict(model_cfg["decoder"], fix=False,
                              pretrained_model=None)
    dec_model = create_grid_net(jax.random.PRNGKey(7), dec_cfg)
    dec_loss = make_loss(tsdf_loss_3d, sdf_weight=3e3, sign_weight=1e2,
                         eik_weight=0.0, trunc_dist=0.3)
    dec_model = GridTrainer(
        {"optimizer": "adam", "learning_rate": 5e-3, "epochs": 200,
         "max_epochs_in_level": 60,
         "grid_training_mode": "coordinate+joint"},
        dec_model, dec_loss, ds).train()
    decoder_path = str(tmp_path / "quad_decoder.npz")
    save_pytree(decoder_path, dec_model.decoder)
    model_cfg["decoder"] = dict(model_cfg["decoder"], fix=True,
                                pretrained_model=decoder_path)

    R, t = circuit_trajectory(4.0, 1.0, 24, wobble=0.2)
    drift_seq = SdfSequence(mesh, R, t, frame_samples=2**11,
                            frame_batchsize=1024, trunc_dist=0.3,
                            near_surface_std=0.15, seed=3,
                            scan_pattern="lidar", width=96, height=24)
    # Drift injected ONLY at submap boundaries (kf 3k+2 -> 3k+3).
    nrng = np.random.default_rng(11)
    for i in range(2, len(drift_seq.odometry), 3):
        Nz = np.eye(4, dtype=np.float32)
        Nz[:3, :3] = Rotation.from_rotvec(
            nrng.standard_normal(3) * 0.03).as_matrix()
        Nz[:3, 3] = nrng.standard_normal(3) * 0.08
        drift_seq.odometry[i] = (drift_seq.odometry[i] @ Nz).astype(np.float32)

    cfg = {k: (dict(v) if isinstance(v, dict) else v) for k, v in CFG.items()}
    cfg["tracking"] = dict(CFG["tracking"], trunc_dist=0.3,
                           gm_scale_sdf=0.15)
    cfg["mapping"] = dict(CFG["mapping"], loss_type="L2",
                          init_iterations=40, iters_per_frame=25,
                          mask_bound=1.0)
    cfg["system"] = dict(CFG["system"], submap_size=3,
                         submap_local_bound=bound, submap_world_bound=bound,
                         submap_axis_aligned=True)
    cfg["align"] = dict(CFG["align"], level_iters=200)
    atlas = GridAtlas(model_cfg, max_kfs_per_submap=3, capacity=4)
    R0, t0 = drift_seq.noisy_kf_pose_in_world(0)
    system = System(atlas, drift_seq, drift_seq, cfg,
                    R_world_origin=R0, t_world_origin=t0)
    system.run()
    assert atlas.num_submaps == 8          # 24 frames / submap_size 3
    assert atlas.params.Rws.shape[0] >= 8  # grew past capacity 4

    def _ate():
        _, tk = atlas.params.updated_kf_poses_in_world()
        t_est = np.asarray(tk)[: drift_seq.num_kfs]
        t_gt = np.stack([drift_seq.true_kf_pose_in_world(k)[1].reshape(3)
                         for k in range(drift_seq.num_kfs)])
        return float(np.sqrt(((t_est - t_gt) ** 2).sum(-1).mean()))

    ate_pre = _ate()
    fuser = Fuser(atlas, drift_seq, cfg)
    fuser.align()
    ate_post = _ate()
    # Drift must be visible pre-fusion and substantially reduced by the
    # submap alignment (calibrated 1.9x; bar 1.6x).
    assert ate_pre > 0.1, f"no drift accumulated (ATE {ate_pre:.4f} m)"
    assert ate_post < ate_pre / 1.6, (ate_pre, ate_post)
    # fuse() then refines jointly without degrading the trajectory.
    fuser.fuse(feat_lr=1e-3, submap_pose_lr=1e-4, kf_pose_lr=1e-4,
               iterations=5, max_points_per_iter=2 ** 14)
    assert _ate() < ate_pre / 1.3


@pytest.mark.fast
def test_trim_scatter_and_spare_capacity_fuse(seq, pretrained_decoder_path):
    """Capacity trimming used by Fuser.fuse: a trimmed params is
    query-identical to the full one (dead slots contribute exact
    zeros), scatter_trimmed(trim(S)) round-trips bit-exactly, and
    fuse() on a spare-capacity atlas updates only the live rows."""
    model_cfg = dict(MODEL_CFG)
    model_cfg["decoder"] = dict(MODEL_CFG["decoder"], fix=True,
                                pretrained_model=pretrained_decoder_path)
    atlas = GridAtlas(model_cfg, max_kfs_per_submap=6, capacity=4)
    for s in range(2):
        R0, t0 = seq.true_kf_pose_in_world(6 * s)
        atlas.add_submap(CFG["system"]["submap_local_bound"],
                         np.eye(3, dtype=np.float32), t0)
        for k in range(6):
            Rk, tk = seq.true_kf_pose_in_world(6 * s + k)
            atlas.add_kf(Rk, np.reshape(tk, 3) - np.reshape(t0, 3))
    # non-trivial features so query parity is meaningful
    key = jax.random.PRNGKey(0)
    p = atlas.params
    atlas.params = p.replace(features=tuple(
        f + 0.05 * jax.random.normal(key, f.shape) for f in p.features))
    full = atlas.params
    assert full.Rws.shape[0] == 4 and atlas.num_submaps == 2

    trimmed = full.trim(2)
    assert trimmed.Rws.shape[0] == 2
    x = jnp.asarray(np.random.default_rng(3).uniform(-4, 4, (257, 3)),
                    jnp.float32)
    np.testing.assert_array_equal(np.asarray(trimmed.query_feature(x)),
                                  np.asarray(full.query_feature(x)))
    np.testing.assert_array_equal(np.asarray(trimmed.query_stability(x)),
                                  np.asarray(full.query_stability(x)))
    rt = full.scatter_trimmed(trimmed)
    for a, b in zip(jax.tree_util.tree_leaves(rt),
                    jax.tree_util.tree_leaves(full)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    from miso_tpu.slam.fuser import Fuser

    cfg = {k: (dict(v) if isinstance(v, dict) else v) for k, v in CFG.items()}
    fuser = Fuser(atlas, seq, cfg)
    fuser.fuse(feat_lr=1e-3, submap_pose_lr=1e-4, kf_pose_lr=1e-4,
               iterations=2, max_points_per_iter=2 ** 12)
    after = atlas.params
    for lvl in range(after.num_levels):
        # live rows trained, dead rows bit-identical
        assert not np.array_equal(np.asarray(after.features[lvl][:2]),
                                  np.asarray(full.features[lvl][:2]))
        np.testing.assert_array_equal(np.asarray(after.features[lvl][2:]),
                                      np.asarray(full.features[lvl][2:]))
