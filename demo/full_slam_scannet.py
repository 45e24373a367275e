#!/usr/bin/env python
"""Full RGB-D SLAM + evaluation harness (reference `demo/full_slam_scannet.py`).

Runs the System on an RGB-D sequence (ScanNet when data is present,
otherwise --synthetic simulates a sensor on a procedural scene), then
evaluates: ATE via Umeyama-aligned APE (full_slam_scannet.py:120-159)
and Chamfer/F-score of the final mesh vs ground truth after ICP
alignment (full_slam_scannet.py:161-191).  Writes results.json.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np




def pretrain_decoder_synthetic(mesh_gt, cfg_model, trunc_dist, epochs=200):
    """Quick decoder pretrain on the scene (the SLAM configs assume a
    pretrained fixed decoder, scannet.yaml:17)."""
    import jax

    from miso_tpu.datasets.sdf_3d import Sdf3D
    from miso_tpu.losses.miso import make_loss
    from miso_tpu.losses.sdf import tsdf_loss_3d
    from miso_tpu.models.grid_net import create_grid_net
    from miso_tpu.train.trainer import GridTrainer

    ds = Sdf3D(mesh_gt, batch_size=2**13, total_samples=2**16,
               trunc_dist=trunc_dist)
    cfg = {k: (dict(v) if isinstance(v, dict) else v) for k, v in cfg_model.items()}
    cfg["decoder"] = dict(cfg_model["decoder"], fix=False, pretrained_model=None)
    cfg["pose"] = {"optimize": False, "num_poses": 1}
    model = create_grid_net(jax.random.PRNGKey(7), cfg)
    loss_fn = make_loss(tsdf_loss_3d, sdf_weight=3e3, sign_weight=1e2,
                        eik_weight=0.0, trunc_dist=trunc_dist)
    tr = GridTrainer({"optimizer": "adam", "learning_rate": 5e-3,
                      "epochs": epochs, "max_epochs_in_level": epochs // 3,
                      "grid_training_mode": "coordinate+joint"},
                     model, loss_fn, ds)
    return tr.train().decoder

def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/rgbd/scannet.yaml")
    p.add_argument("--save_dir", default="./results/full_slam_scannet")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--num_frames", type=int, default=24)
    p.add_argument("--mesh_resolution", type=int, default=256)
    p.add_argument("--gt_mesh", default=None)
    p.add_argument("--icp_align", action="store_true",
                   help="ICP-align the mesh to GT before metrics "
                        "(for real data whose GT mesh is in another frame)")
    p.add_argument("--stability_mesh_thresh", type=float, default=0.2)
    p.add_argument("--final_iters", type=int, default=200,
                   help="post-run global mapping refinement over ALL "
                        "keyframes (poses locked), like the reference's "
                        "300-iteration per-submap pass "
                        "(build_submaps.py:76-91); 0 disables")
    args = p.parse_args()

    import jax.numpy as jnp

    from miso_tpu.config import cfg_dataset, load_config
    from miso_tpu.models.grid_atlas import GridAtlas
    from miso_tpu.slam.system import System
    from miso_tpu.utils.eval import (icp_point_to_point,
                                     mesh_reconstruction_metrics,
                                     trajectory_error)
    from miso_tpu.utils.sdf import save_mesh
    from miso_tpu.datasets.lidar import write_kitti_format_poses

    os.makedirs(args.save_dir, exist_ok=True)
    cfg = load_config(args.config)
    cfg["system"]["log_dir"] = args.save_dir
    gt_mesh = None

    if args.synthetic:
        from miso_tpu.datasets.sequence import SdfSequence, orbit_trajectory
        from miso_tpu.datasets.shapes import room_scene
        from miso_tpu.native import TriangleMesh

        verts, tris = room_scene(5.0, seed=0)
        gt_mesh = TriangleMesh(verts, tris)
        R, t = orbit_trajectory([0, 0, 0], 1.8, 1.4, args.num_frames,
                                look_at=[0, 0, -0.5])
        dataset = SdfSequence(gt_mesh, R, t, frame_samples=2**13,
                              frame_batchsize=4096, trunc_dist=0.3,
                              near_surface_std=0.1,
                              odom_std_rad=0.002, odom_std_meter=0.005)
        # The submap frame is the first camera frame (anchor KF is
        # identity in the submap), so the bound must be rotation-proof:
        # a cube with half-side >= max distance from the first camera to
        # any scene point (~room half-diagonal 3.7 + camera offset 2.3).
        # A clipped bound silently starves tracking AND mapping (see
        # full_slam_newer_college.py, 70 cm -> 4 cm ATE from this fix).
        bound = [[-6.5, 6.5], [-6.5, 6.5], [-6.5, 6.5]]
        cfg["system"].update({"submap_size": 100,
                              "submap_local_bound": bound})
        # Reference-scale resolution: fine cell 0.1 m (scannet.yaml:23-25).
        cfg["model"]["grid"].update({"base_cell_size": 0.5,
                                     "per_level_scale": 5.0, "bound": bound})
        cfg["model"]["decoder"].update({"fix": False, "pretrained_model": None,
                                        "hidden_dim": 32})
        cfg["model"]["pose"]["num_poses"] = 100
        cfg["mapping"].update({"trunc_dist": 0.3, "finite_diff_eps": 0.05,
                               "eik_trunc_dist": 0.3, "weight_fs": 0.2,
                               "learning_rate": 3e-3, "use_stability": True})
        # The reference's ScanNet profile tracks with the gentle Adam
        # solver (scannet.yaml:30-33); LM is reserved for the dense
        # LiDAR profile where maps are strongly constrained.
        cfg["tracking"].update({"solver": "adam", "loss_type": "L1",
                                "learning_rate": 1e-3, "trunc_dist": None})
        cfg["visualizer"] = {"enable": False}
    else:
        dataset = cfg_dataset(cfg)
        if args.gt_mesh:
            from miso_tpu.datasets.sdf_3d import as_mesh
            gt_mesh = as_mesh(args.gt_mesh)

    if args.synthetic:
        # Pretrain + freeze the decoder on the scene so LM tracking sees
        # a usable map from the first frames.
        dec = pretrain_decoder_synthetic(gt_mesh, cfg["model"], 0.3)
        cfg["model"]["decoder"]["fix"] = True
    atlas = GridAtlas(cfg["model"],
                      max_kfs_per_submap=cfg["system"]["submap_size"],
                      capacity=cfg["system"].get("submap_capacity"))
    R0, t0 = dataset.noisy_kf_pose_in_world(0)
    if args.synthetic:
        atlas.set_decoder(dec, fixed=True)
    t_start = time.time()
    system = System(atlas, dataset, dataset, cfg,
                    R_world_origin=R0, t_world_origin=t0)
    system.run()
    slam_time = time.time() - t_start

    if args.final_iters > 0:
        # Global refinement: one mapping burst over the whole KF set
        # with the settled trajectory (features only).
        all_kfs = list(range(dataset.num_kfs))
        system.mapper.mapping(all_kfs, iterations=args.final_iters,
                              level_iterations=max(args.final_iters // 3, 1))
        system.tracker.grid = system.mapper.grid
        system._sync_submap_from_tracker_mapper()

    # Trajectory eval (full_slam_scannet.py:120-159).
    Rk, tk = atlas.params.updated_kf_poses_in_world()
    n = dataset.num_kfs
    T_est = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    T_est[:, :3, :3] = np.asarray(Rk)[:n]
    T_est[:, :3, 3] = np.asarray(tk)[:n]
    T_gt = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    for k in range(n):
        Rg, tg = dataset.true_kf_pose_in_world(k)
        T_gt[k, :3, :3] = Rg
        T_gt[k, :3, 3] = np.reshape(tg, 3)
    ate = trajectory_error(T_est, T_gt, align=True)
    write_kitti_format_poses(os.path.join(args.save_dir, "traj_est_kitti.txt"), T_est)
    write_kitti_format_poses(os.path.join(args.save_dir, "traj_gt_kitti.txt"), T_gt)

    # Mesh + reconstruction eval (full_slam_scannet.py:161-191).
    # Mask unobserved space via the stability field so spurious
    # zero-crossings in never-seen regions don't pollute the mesh.
    from miso_tpu.utils.sdf import observed_sdf_query

    query = observed_sdf_query(atlas.params, args.stability_mesh_thresh)
    mesh = save_mesh(query, atlas.global_bound(),
                     os.path.join(args.save_dir, "mesh_final.ply"),
                     resolution=args.mesh_resolution)
    results = {"ate": ate, "slam_time_sec": slam_time,
               "num_submaps": atlas.num_submaps, "num_keyframes": n}
    if gt_mesh is not None:
        eval_mesh = mesh
        if args.icp_align:
            # ICP-align predicted mesh to GT before metrics
            # (full_slam_scannet.py:168-176) -- for real data whose GT
            # mesh lives in a different frame.
            pred_pts = mesh.sample_surface(50000, seed=0)
            gt_pts = gt_mesh.sample_surface(50000, seed=1)
            T_icp, _, _ = icp_point_to_point(pred_pts, gt_pts, max_corr_dist=0.5)
            from miso_tpu.native import TriangleMesh as TM
            eval_mesh = TM(mesh.vertices @ T_icp[:3, :3].T.astype(np.float32)
                           + T_icp[:3, 3].astype(np.float32), mesh.triangles)
        recon = mesh_reconstruction_metrics(eval_mesh, gt_mesh, n_points=100000,
                                            threshold=0.05, truncation=0.5)
        results["reconstruction"] = recon
        print(json.dumps(recon, indent=2))
    print(f"ATE rmse: {ate['ate_rmse']*100:.2f} cm | slam {slam_time:.1f}s")
    with open(os.path.join(args.save_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
