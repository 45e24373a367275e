"""Atlas visualization artifacts (headless).

Replaces the reference's open3d atlas viewers
(`grid_opt/models/grid_atlas.py:422-539` visualize / visualize_submaps):
per-submap meshes in local + world frames, feature-norm and stability
heatmaps, submap OBB corner dumps, the global mesh and an SDF plane
image.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def visualize_atlas(atlas, save_dir: str, resolution: int = 256,
                    sdf_plane: bool = True, stability_thresh: float = 0.0):
    """Global mesh + SDF plane (grid_atlas.py:422-438)."""
    from miso_tpu.utils.sdf import observed_sdf_query, save_mesh
    from miso_tpu.utils.vis import visualize_sdf_plane

    os.makedirs(save_dir, exist_ok=True)
    query = atlas.params if stability_thresh <= 0 else \
        observed_sdf_query(atlas.params, stability_thresh)
    bound = atlas.global_bound()
    save_mesh(query, bound, os.path.join(save_dir, "mesh_final.ply"),
              resolution=resolution)
    if sdf_plane:
        visualize_sdf_plane(query, bound, min(resolution, 256), axis="z",
                            fig_path=os.path.join(save_dir, "sdf_plane_final.png"),
                            show_colorbar=False, show_title=False,
                            hide_axis=True)


def render_alignment_animation(atlas, pose_frames, save_dir: str,
                               resolution: int = 64, surf_thresh: float = 0.05,
                               max_points: int = 20000):
    """Per-iteration alignment animation, headless (replaces the
    reference's open3d offscreen render loop, align_submaps.py:186-237):
    each submap's near-surface cloud is drawn in a distinct color,
    transformed by that iteration's submap poses, as top-down PNG frames;
    the raw (iters, S, 4, 4) pose history is saved alongside.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from miso_tpu.align.baselines import extract_near_surface_points

    os.makedirs(save_dir, exist_ok=True)
    S = atlas.num_submaps
    clouds = []
    for s in range(S):
        pts = extract_near_surface_points(atlas, s, resolution, surf_thresh)
        if len(pts) > max_points:
            pts = pts[np.random.default_rng(s).choice(len(pts), max_points,
                                                      replace=False)]
        clouds.append(pts)
    history = np.stack([np.asarray(T) for T in pose_frames])  # (it, S, 4, 4)
    np.save(os.path.join(save_dir, "pose_history.npy"), history)
    colors = plt.get_cmap("tab10").colors
    # Common axis limits over all frames.
    allw = np.concatenate([clouds[s] @ history[0, s, :3, :3].T
                           + history[0, s, :3, 3] for s in range(S)])
    lo, hi = allw.min(0) - 0.3, allw.max(0) + 0.3
    for it in range(len(history)):
        fig, ax = plt.subplots(figsize=(5, 5))
        for s in range(S):
            w = clouds[s] @ history[it, s, :3, :3].T + history[it, s, :3, 3]
            ax.scatter(w[:, 0], w[:, 1], s=0.2, color=colors[s % len(colors)],
                       rasterized=True)
        ax.set_xlim(lo[0], hi[0])
        ax.set_ylim(lo[1], hi[1])
        ax.set_aspect("equal")
        ax.set_title(f"iteration {it}")
        fig.savefig(os.path.join(save_dir, f"frame_{it:03d}.png"), dpi=110)
        plt.close(fig)


def visualize_submaps(atlas, save_dir: str, resolution: int = 128,
                      use_pose: str = "updated"):
    """Per-submap meshes (local + world-transformed), feature-norm and
    stability slices, OBB corners (grid_atlas.py:461-539)."""
    import jax.numpy as jnp

    from miso_tpu.ops import se3
    from miso_tpu.utils.sdf import save_mesh, write_ply
    from miso_tpu.utils.vis import visualize_grid_magnitude

    p = atlas.params
    if use_pose == "updated":
        R_all, t_all = p.updated_submap_poses()
    else:
        R_all, t_all = p.Rws, p.tws
    obb_rows = []
    for s in range(atlas.num_submaps):
        sub_dir = os.path.join(save_dir, f"submap{s}")
        os.makedirs(sub_dir, exist_ok=True)
        grid = atlas.get_submap(s)
        mesh = save_mesh(grid, grid.bound,
                         os.path.join(sub_dir, "mesh_submap.ply"),
                         resolution=resolution)
        R = np.asarray(R_all[s])
        t = np.asarray(t_all[s])
        verts_w = mesh.vertices @ R.T + t
        write_ply(os.path.join(sub_dir, "mesh_submap_transformed.ply"),
                  verts_w, mesh.triangles)
        # Feature-norm slices per level (grid_atlas.py:516-525).
        for level in range(grid.num_levels):
            f = np.asarray(grid.features[level]) \
                if not isinstance(grid.features[level], dict) else None
            if f is None:
                continue
            z = f.shape[2] // 2
            visualize_grid_magnitude(
                f[:, :, z, :],
                os.path.join(sub_dir, f"featnorm_level{level}.png"))
            mu = np.asarray(grid.stability[level])
            visualize_grid_magnitude(
                mu[:, :, z, :],
                os.path.join(sub_dir, f"mu_level{level}.png"), log_scale=False)
        # OBB corners in world (grid_atlas.py:440-459).
        b = np.asarray(grid.bound)
        corners = np.array([[b[0, i], b[1, j], b[2, k]]
                            for i in range(2) for j in range(2)
                            for k in range(2)], np.float32)
        obb_rows.append(corners @ R.T + t)
    np.save(os.path.join(save_dir, "submap_obb_corners.npy"),
            np.stack(obb_rows))
