"""Newer College dataset factory + mesh evaluation.

Equivalent of `grid_opt/utils/utils_ncd.py`: LiDAR dataset construction
with the evaluation sampling profile (utils_ncd.py:12-46) and mesh
evaluation with robust ICP pre-alignment against the GT cloud/mesh
(utils_ncd.py:92-131).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def create_ncd_dataset(cfg: Dict, voxel_size=0.03, near_surf_std=0.1,
                       n_near=4, n_free=2, n_behind=1, frame_samples=2**12,
                       frame_batchsize=2**10, num_frames=None):
    """utils_ncd.py:12-46 profile."""
    from miso_tpu.datasets.lidar import PosedSdf3DLidar

    d = cfg["dataset"]
    return PosedSdf3DLidar(
        lidar_folder=d["path"], pose_file_gt=d["pose_gt"],
        pose_file_init=d["pose_init"], trunc_dist=d.get("trunc_dist", 0.5),
        num_frames=num_frames, frame_samples=frame_samples,
        frame_batchsize=frame_batchsize, voxel_size=voxel_size,
        near_surface_std=near_surf_std, near_surface_n=n_near,
        free_space_n=n_free, behind_surface_n=n_behind, min_dist_ratio=0.5,
        min_z=-10.0, max_z=60.0, min_range=1.5, max_range=60.0,
        adaptive_range=False)


def evaluate_ncd_mesh(est_mesh, ref_points: np.ndarray, n_points=500000,
                      threshold=0.20, truncation=0.5, robust_k=1.0, seed=0):
    """Mesh vs GT point cloud with Tukey-style robust ICP pre-alignment
    (utils_ncd.py:92-131).  ref_points: (N, 3) GT survey cloud."""
    from miso_tpu.utils.eval import compute_chamfer_metrics, icp_point_to_point

    src = est_mesh.sample_surface(n_points, seed=seed)
    T1, _, _ = icp_point_to_point(src, ref_points, max_corr_dist=3.0,
                                  robust_k=robust_k * 15)
    src = src @ T1[:3, :3].T + T1[:3, 3]
    T2, _, _ = icp_point_to_point(src, ref_points, max_corr_dist=0.5,
                                  robust_k=robust_k)
    src = src @ T2[:3, :3].T + T2[:3, 3]
    sel = np.random.default_rng(seed).choice(
        len(ref_points), min(n_points, len(ref_points)), replace=False)
    return compute_chamfer_metrics(src, ref_points[sel], threshold,
                                   truncation, truncation)
