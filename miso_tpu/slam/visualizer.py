"""Visualizer: artifact dumps + optional live web view.

The reference's Visualizer (`grid_opt/slam/visualizer.py`) renders a
live open3d window (trajectory lineset, current frame point cloud,
throttled global mesh, submap boxes).  SLAM machines here are headless,
so the same information is (a) persisted to the log directory
(trajectory file, frame PLYs, periodic meshes) and (b), with
``visualizer.live: true``, served as a live browser view on
``visualizer.live_port`` (slam/live_viewer.py -- self-contained page,
no display or external assets needed).  The API mirrors the reference
so System code is interchangeable.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from miso_tpu.models.grid_atlas import GridAtlas
from miso_tpu.utils.sdf import save_mesh, write_ply


class Visualizer:
    def __init__(self, model: GridAtlas, cfg: Dict):
        self.atlas = model
        c = cfg.get("visualizer", {})
        self.enable = bool(c.get("enable", False))
        self.mesh_vis_freq = int(c.get("mesh_vis_freq", 10))
        self.mesh_resolution = int(c.get("mesh_resolution", 128))
        # Periodic live meshes default to bf16 feature storage at query
        # time (~2.5x faster extraction, f32 accumulate; parity tested
        # in tests/test_utils_misc.py).  Set to null/None for f32.
        self.mesh_dtype = c.get("mesh_feature_dtype", "bfloat16")
        self.show_mesh = bool(c.get("show_mesh", True))
        self.log_dir = cfg.get("system", {}).get("log_dir", "./results/default")
        self._frame_points: Optional[np.ndarray] = None
        self._count = 0
        self.live = None
        if self.enable:
            os.makedirs(self.log_dir, exist_ok=True)
            if c.get("live", False):
                from miso_tpu.slam.live_viewer import LiveViewer

                self.live = LiveViewer(port=int(c.get("live_port", 8800)))
                print(f"[visualizer] live view at "
                      f"http://127.0.0.1:{self.live.port}/")

    def set_current_frame_points(self, points: np.ndarray):
        self._frame_points = np.asarray(points)

    def update_geometries(self, stop_frame: int):
        if not self.enable:
            return
        self._count += 1
        # Trajectory so far (world KF positions).
        R, t = self.atlas.params.updated_kf_poses_in_world()
        traj = np.asarray(t)[:stop_frame]
        np.savetxt(os.path.join(self.log_dir, "trajectory_live.txt"), traj)
        if self._frame_points is not None and len(self._frame_points):
            write_ply(os.path.join(self.log_dir, "current_frame.ply"),
                      self._frame_points,
                      np.zeros((0, 3), np.int32))
        mesh = None
        if self.show_mesh and self._count % self.mesh_vis_freq == 0:
            try:
                mesh = save_mesh(
                    self.atlas.params, self.atlas.global_bound(),
                    os.path.join(self.log_dir, f"mesh_frame{stop_frame:05d}.ply"),
                    resolution=self.mesh_resolution,
                    feature_dtype=self.mesh_dtype)
            except Exception as e:  # meshing must never kill SLAM
                print(f"[visualizer] mesh export failed: {e}")
        if self.live is not None:
            from miso_tpu.slam.live_viewer import submap_box_corners

            p = self.atlas.params
            Rs, ts = p.updated_submap_poses()
            boxes = [submap_box_corners(np.asarray(p.bounds[s]),
                                        np.asarray(Rs[s]), np.asarray(ts[s]))
                     for s in range(self.atlas.num_submaps)]
            self.live.update(
                frame=stop_frame, traj_est=traj,
                frame_points=self._frame_points,
                submap_boxes=boxes, num_submaps=self.atlas.num_submaps,
                mesh=(None if mesh is None else
                      (mesh.vertices, mesh.triangles)))

    def quit(self):
        if self.live is not None:
            self.live.close()

    def update_view(self):
        pass
