#!/usr/bin/env python
"""Submap alignment benchmark (reference `demo/align_submaps.py`).

Loads (or builds) a grid atlas, perturbs submap poses with configurable
noise (align_submaps.py:265-273), runs the chosen alignment method
(MISO hierarchical latent via --feature_levels, --use_sdf finetune, or
the vfpp / mips / icp baselines), and reports submap-pose
rotation/translation RMSE before and after (align_submaps.py:124-145)
plus wall-clock, into results.json.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def build_synthetic_atlas(seed=0):
    """Two-submap atlas trained on a procedural scene (stand-in for a
    saved grid_atlas checkpoint)."""
    import jax
    import jax.numpy as jnp

    from miso_tpu.datasets.sdf_3d_submap import SubmapSdf3D
    from miso_tpu.datasets.shapes import room_scene
    from miso_tpu.losses.miso import make_loss, mapping_loss
    from miso_tpu.models.grid_atlas import GridAtlas
    from miso_tpu.models.grid_net import create_grid_net as create_grid_net_fn
    from miso_tpu.models.grid_net import grid_net_mask
    from miso_tpu.native import TriangleMesh
    from miso_tpu.train.trainer import GridTrainer

    verts, tris = room_scene(6.0, seed=seed)
    mesh_gt = TriangleMesh(verts, tris)
    ds = SubmapSdf3D(mesh_gt, nx=2, ny=1,
                     frames_per_submap=6, frame_samples=2**12,
                     frame_batchsize=2048, trunc_dist=0.3,
                     near_surface_std=0.1, overlap=1.0, seed=seed)
    cfg_model = {
        "spatial_dim": 3,
        "grid": {"type": "regular", "feature_dim": 4, "init_stddev": 1e-4,
                 "bound": None, "base_cell_size": 1.0, "per_level_scale": 4.0,
                 "n_levels": 2},
        "decoder": {"type": "mlp", "hidden_dim": 32, "hidden_layers": 1,
                    "out_dim": 1, "pos_invariant": True, "fix": False,
                    "pretrained_model": None},
        "pose": {"optimize": True, "num_poses": ds.frames_per_submap},
    }
    # All submaps share the local bound shape for stacking.
    bound = ds.submap_bound(0)
    cfg_model["grid"]["bound"] = bound.tolist()
    # Pretrain + FREEZE the shared decoder on the scene first: latent
    # alignment compares raw features across submaps, so the decoder
    # must be identical and fixed during per-submap training (the
    # reference ships decoder_indoor.pt for exactly this reason,
    # scannet.yaml:17).
    from miso_tpu.datasets.sdf_3d import Sdf3D
    from miso_tpu.losses.sdf import tsdf_loss_3d

    ds_pre = Sdf3D(mesh_gt, batch_size=2**13, total_samples=2**16,
                   trunc_dist=0.3)
    cfg_pre = {k: (dict(v) if isinstance(v, dict) else v)
               for k, v in cfg_model.items()}
    cfg_pre["grid"] = dict(cfg_model["grid"], bound=ds_pre.bound.tolist())
    cfg_pre["pose"] = {"optimize": False, "num_poses": 1}
    pre_model = create_grid_net_fn(jax.random.PRNGKey(11), cfg_pre)
    pre_loss = make_loss(tsdf_loss_3d, sdf_weight=3e3, sign_weight=1e2,
                         eik_weight=0.0, trunc_dist=0.3)
    pre_tr = GridTrainer({"optimizer": "adam", "learning_rate": 5e-3,
                          "epochs": 200, "max_epochs_in_level": 60,
                          "grid_training_mode": "coordinate+joint"},
                         pre_model, pre_loss, ds_pre)
    shared_decoder = pre_tr.train().decoder
    cfg_model["decoder"]["fix"] = True
    atlas = GridAtlas(cfg_model, max_kfs_per_submap=ds.frames_per_submap)
    for s in range(ds.num_submaps):
        R, t = ds.true_submap_pose(s)
        atlas.add_submap(bound, R, t, num_poses=ds.frames_per_submap)
        for k in range(ds.frames_per_submap):
            kf = s * ds.frames_per_submap + k
            Rk, tk = ds.true_kf_pose_in_world(kf)
            # KF pose in submap frame: T_sk = T_ws^-1 T_wk.
            Rs = R.T @ Rk
            tsk = R.T @ (tk - t)
            atlas.add_kf(Rs, tsk)
    # Train each submap with GT poses; stability grids ON so alignment
    # can mask unobserved regions (the reference's mu mechanism).
    loss_fn = make_loss(mapping_loss, loss_type="L1", weight_sdf=1.0,
                        weight_eik=0.0, weight_fs=0.2, trunc_dist=0.3,
                        use_stability=True)
    for s in range(ds.num_submaps):
        kfs = [s * ds.frames_per_submap + k for k in range(ds.frames_per_submap)]
        ds.select_keyframes(kfs)
        grid = atlas.get_submap(s).replace(decoder=shared_decoder,
                                           decoder_fixed=True)
        tr = GridTrainer({"optimizer": "adam", "learning_rate": 3e-3,
                          "epochs": 250, "max_epochs_in_level": 80,
                          "grid_training_mode": "coordinate+joint"},
                         grid, loss_fn,
                         ds, mask_for_level=lambda m, level:
                         grid_net_mask(m, level=level, pose=False))
        grid = tr.train()
        atlas.set_submap(s, grid)
    atlas.params = atlas.params.replace(decoder=shared_decoder)
    ds.unselect_keyframes()
    return atlas, ds


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--atlas", default=None, help="grid_atlas.npz from build_submaps")
    p.add_argument("--save_dir", default="./results/align_submaps")
    p.add_argument("--method", default="miso",
                   choices=["miso", "vfpp", "mips", "icp"])
    p.add_argument("--feature_levels", type=int, nargs="*", default=[0, 1])
    p.add_argument("--use_sdf", action="store_true")
    p.add_argument("--iters", type=int, default=150)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--noise_deg", type=float, default=3.0)
    p.add_argument("--noise_m", type=float, default=0.15)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax.numpy as jnp

    from miso_tpu.align.miso import (align_multiple_submaps_hierarchical,
                                     generic_align_multiple_submaps)
    from miso_tpu.ops import se3

    os.makedirs(args.save_dir, exist_ok=True)
    atlas, ds = build_synthetic_atlas(args.seed)
    S = atlas.num_submaps
    gt_R = np.stack([ds.true_submap_pose(s)[0] for s in range(S)])
    gt_t = np.stack([ds.true_submap_pose(s)[1] for s in range(S)])

    # Perturb all submaps except 0 (align_submaps.py:265-273).
    rng = np.random.default_rng(args.seed)
    for s in range(1, S):
        axis = rng.standard_normal(3)
        axis /= np.linalg.norm(axis)
        dr = axis * np.radians(args.noise_deg)
        dt = rng.standard_normal(3)
        dt = dt / np.linalg.norm(dt) * args.noise_m
        atlas.set_submap_pose_correction(s, dr.astype(np.float32),
                                         dt.astype(np.float32))

    def pose_errors():
        R, t = atlas.params.updated_submap_poses()
        rot = float(se3.rotation_rmse_deg(jnp.asarray(R[1:]), jnp.asarray(gt_R[1:])))
        tr = float(np.sqrt(((np.asarray(t[1:]) - gt_t[1:]) ** 2).sum(-1).mean()))
        return rot, tr

    rot0, tr0 = pose_errors()
    print(f"BEFORE: rot RMSE {rot0:.3f} deg, trans RMSE {tr0:.3f} m")

    t0 = time.time()
    if args.method == "miso":
        align_multiple_submaps_hierarchical(
            atlas, level_iters=args.iters, finetune_iters=args.iters,
            lr=args.lr, align_loss="L2", latent_levels=args.feature_levels,
            stability_thresh=0.2, skip_finetune=not args.use_sdf,
            verbose=False, seed=args.seed)
    elif args.method in ("vfpp", "mips"):
        from miso_tpu.align.baselines import pairwise_loss_mips, pairwise_loss_vfpp

        # Per-submap observation sets (coords in submap frame + labels).
        obs = {}
        rngb = np.random.default_rng(args.seed)
        batch = ds.sample(rngb)
        for s in range(S):
            sel = batch["sample_submap_ids"] == s
            ids = batch["sample_frame_ids"][sel]
            pts_f = batch["coords_frame"][sel]
            # frame -> submap coords using GT kf-in-submap poses.
            Rs, ts = ds.true_submap_pose(s)
            pts_s = []
            for kf in np.unique(ids):
                Rk, tk = ds.true_kf_pose_in_world(kf)
                m = ids == kf
                pw = pts_f[m] @ Rk.T + tk
                pts_s.append((pw - ts) @ Rs)
            obs[s] = (jnp.asarray(np.concatenate(pts_s)),
                      jnp.asarray(batch["sdf"][sel]),
                      jnp.asarray(batch["sdf_valid"][sel]))

        fn = pairwise_loss_vfpp if args.method == "vfpp" else pairwise_loss_mips
        def pair_loss(params, s, d, key):
            c, g, v = obs[s]
            return fn(params, atlas, s, d, c, g, v, key=key,
                      subsample_points=4096)

        generic_align_multiple_submaps(atlas, pair_loss, num_iters=args.iters,
                                       lr=args.lr, seed=args.seed)
    elif args.method == "icp":
        from miso_tpu.align.baselines import align_multiple_submaps_icp

        align_multiple_submaps_icp(atlas)
    elapsed = time.time() - t0

    rot1, tr1 = pose_errors()
    print(f"AFTER ({args.method}): rot RMSE {rot1:.3f} deg, "
          f"trans RMSE {tr1:.3f} m  [{elapsed:.1f}s]")
    with open(os.path.join(args.save_dir, "results.json"), "w") as f:
        json.dump({"method": args.method,
                   "feature_levels": args.feature_levels,
                   "use_sdf": args.use_sdf,
                   "rot_rmse_deg_before": rot0, "rot_rmse_deg_after": rot1,
                   "trans_rmse_m_before": tr0, "trans_rmse_m_after": tr1,
                   "align_time_sec": elapsed}, f, indent=2)


if __name__ == "__main__":
    main()
