"""Synthetic mesh-based SDF datasets.

Rewrites of `grid_opt/datasets/sdf_3d.py` with the native BVH runtime
replacing pysdf (signed distance; positive OUTSIDE by convention here
and throughout miso_tpu) and open3d RaycastingScene (simulated pinhole
cameras).  All sampled batches are fixed-shape.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from miso_tpu.datasets.base import Dataset
from miso_tpu.native import TriangleMesh


MeshLike = Union[str, TriangleMesh, Tuple[np.ndarray, np.ndarray]]


def as_mesh(mesh: MeshLike) -> TriangleMesh:
    if isinstance(mesh, TriangleMesh):
        return mesh
    if isinstance(mesh, str):
        from miso_tpu.utils.sdf import read_ply
        verts, tris = read_ply(mesh)
        return TriangleMesh(verts, tris)
    verts, tris = mesh
    return TriangleMesh(verts, tris)


class Sdf3D(Dataset):
    """GT-SDF dataset from a watertight mesh (reference sdf_3d.py:17-154).

    Sampling: 7/8 surface points (the second half perturbed by
    ``surface_stddev``), 1/8 uniform in the (buffered) bound
    (sdf_3d.py:73-106).  Exact surface samples get sdf label 0.
    """

    def __init__(self, mesh: MeshLike, batch_size=2**16, total_samples=2**20,
                 surface_stddev=0.1, bound_buffer=0.5, trunc_dist=None, seed=0):
        self.mesh = as_mesh(mesh)
        v = self.mesh.vertices
        self.bound = np.stack([v.min(0) - bound_buffer, v.max(0) + bound_buffer], axis=1)
        self.surface_stddev = surface_stddev
        self.total_samples = int(total_samples)
        self.batch_size = int(batch_size)
        self.trunc_dist = trunc_dist
        assert self.total_samples % 8 == 0
        self._rng = np.random.default_rng(seed)
        self.resample()

    def resample(self):
        n = self.total_samples
        rng = self._rng
        pts_surf = self.mesh.sample_surface(n * 7 // 8, seed=int(rng.integers(2**31)))
        pts_surf = pts_surf.copy()
        # Perturb samples n/2 .. 7n/8 (sdf_3d.py:79: second half of total).
        perturb_lo = n // 2
        pts_surf[perturb_lo:] += (self.surface_stddev
                                  * rng.standard_normal((n * 7 // 8 - perturb_lo, 3))).astype(np.float32)
        u = rng.uniform(size=(n // 8, 3))
        pts_unif = (self.bound[:, 0] + u * (self.bound[:, 1] - self.bound[:, 0])).astype(np.float32)
        points = np.concatenate([pts_surf, pts_unif]).astype(np.float32)
        sdfs = np.zeros((n, 1), np.float32)
        sdfs[n // 2:] = self.mesh.signed_distance(points[n // 2:])[:, None]
        sdf_valid = (np.abs(sdfs) < 1e10).astype(np.float32)
        if self.trunc_dist is not None:
            sdf_valid = (np.abs(sdfs) < self.trunc_dist).astype(np.float32)
            sdf_signs = np.zeros_like(sdfs)
            sdf_signs[(sdfs > self.trunc_dist) & (np.abs(sdfs) < 1e10)] = 1
            sdf_signs[sdfs < -self.trunc_dist] = -1
        else:
            sdf_signs = np.zeros_like(sdfs)
        self.coords = points
        self.sdfs = sdfs
        self.sdf_valid = sdf_valid
        self.sdf_signs = sdf_signs

    def sample(self, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        idx = rng.choice(self.total_samples, size=self.batch_size)
        return {
            "coords": self.coords[idx],
            "sdf": self.sdfs[idx],
            "sdf_valid": self.sdf_valid[idx],
            "sdf_sign": self.sdf_signs[idx],
            "sdf_signs": self.sdf_signs[idx],
        }


class PosedSdf3D(Dataset):
    """Simulated pinhole camera views of a mesh (sdf_3d.py:157-414).

    Per frame: ray-cast a 90-degree-FOV pinhole image from a random
    free-space camera pose; keep up to frame_samples hits (surface,
    sdf=0, optionally distance-perturbed); augment with near-surface
    samples (label = -displacement along the ray) and free-space
    samples (sign=+1, label = distance-to-hit bound).
    """

    def __init__(self, mesh: MeshLike, frame_batchsize=2**14, frame_samples=2**14,
                 num_frames=64, near_surface_n=2, near_surface_std=0.05,
                 free_space_n=1, trunc_dist=0.15, frame_std_rad=0.0,
                 frame_std_meter=0.0, distance_std=0.0, seed=0,
                 width=160, height=120, camera_min_clearance=0.3):
        from miso_tpu.ops import se3
        import jax

        self.mesh = as_mesh(mesh)
        v = self.mesh.vertices
        self.bound = np.stack([v.min(0), v.max(0)], axis=1)
        self.near_surface_std = near_surface_std
        self.near_surface_n = near_surface_n
        self.free_space_n = free_space_n
        self.trunc_dist = trunc_dist
        self.frame_std_rad = frame_std_rad
        self.frame_std_meter = frame_std_meter
        self.distance_std = distance_std
        self.num_frames = num_frames
        self.frame_samples = frame_samples
        self.frame_batchsize = frame_batchsize
        self.width = width
        self.height = height
        self._rng = np.random.default_rng(seed)

        # GT camera poses: random orientations; positions rejected until
        # in free space (sdf_3d.py:188-199).
        key = jax.random.PRNGKey(seed)
        R = np.asarray(se3.wrapped_gaussian_rotations(key, num_frames, std_rad=1.0))
        self.R_world_frame_gt = R.astype(np.float32)
        t = np.zeros((num_frames, 3), np.float32)
        for f in range(num_frames):
            for _ in range(1000):
                u = self._rng.uniform(size=3)
                p = self.bound[:, 0] + u * (self.bound[:, 1] - self.bound[:, 0])
                if self.mesh.signed_distance(p[None].astype(np.float32))[0] > camera_min_clearance:
                    t[f] = p
                    break
            else:
                raise RuntimeError("Could not place camera in free space.")
        self.t_world_frame_gt = t
        self.sample_frames()
        self.resample_poses()

    # -- simulation --------------------------------------------------------
    def _pinhole_rays(self, Rwc, twc):
        """90-deg FOV pinhole looking along camera -z (sdf_3d.py:217-233)."""
        W, H = self.width, self.height
        fx = W / 2.0  # fov 90 deg -> f = W/2
        i = (np.arange(W) + 0.5 - W / 2) / fx
        j = (np.arange(H) + 0.5 - H / 2) / fx
        ii, jj = np.meshgrid(i, j, indexing="xy")
        dirs_cam = np.stack([ii, -jj, -np.ones_like(ii)], axis=-1).reshape(-1, 3)
        dirs_world = dirs_cam @ Rwc.T
        dirs_world /= np.linalg.norm(dirs_world, axis=1, keepdims=True)
        origins = np.broadcast_to(twc, dirs_world.shape)
        return origins.astype(np.float32), dirs_world.astype(np.float32)

    def sample_frames(self):
        from miso_tpu.ops import se3 as _se3  # noqa: F401  (parity marker)

        rng = self._rng
        self.frames: List[Dict[str, np.ndarray]] = []
        for f in range(self.num_frames):
            Rwc = self.R_world_frame_gt[f]
            twc = self.t_world_frame_gt[f]
            origins, dirs = self._pinhole_rays(Rwc, twc)
            t_hit, tri = self.mesh.raycast(origins, dirs)
            hit = t_hit > 0
            if not hit.any():
                # Open (non-enclosed) scenes: re-aim at the mesh centroid
                # (the reference assumes enclosed Replica rooms).
                center = self.mesh.vertices.mean(0)
                fwd = center - twc
                fwd = fwd / (np.linalg.norm(fwd) + 1e-9)
                upw = np.array([0, 0, 1.0], np.float32)
                right = np.cross(fwd, upw)
                if np.linalg.norm(right) < 1e-6:
                    right = np.array([1.0, 0, 0], np.float32)
                right = right / np.linalg.norm(right)
                up = np.cross(right, fwd)
                Rwc = np.stack([right, up, -fwd], axis=1).astype(np.float32)
                self.R_world_frame_gt[f] = Rwc
                origins, dirs = self._pinhole_rays(Rwc, twc)
                t_hit, tri = self.mesh.raycast(origins, dirs)
                hit = t_hit > 0
            pts_hit_gt = origins[hit] + dirs[hit] * t_hit[hit][:, None]
            n_hit = len(pts_hit_gt)
            assert n_hit > 0, f"Frame {f} has no hit point"
            n_keep = min(self.frame_samples, n_hit)
            sel = rng.permutation(n_hit)[:n_keep]
            pts_hit_gt = pts_hit_gt[sel]

            parts_p, parts_sdf, parts_valid, parts_sign = [], [], [], []
            # Part I: surface hits, optional distance noise (sdf_3d.py:242-263).
            dist_gt = np.maximum(np.linalg.norm(pts_hit_gt - twc, axis=1, keepdims=True), 1e-6)
            dirs_gt = (pts_hit_gt - twc) / dist_gt
            dist_pert = dist_gt + rng.standard_normal((n_keep, 1)) * self.distance_std
            pts_hit = (twc + dirs_gt * dist_pert).astype(np.float32)
            sdfs = self.mesh.signed_distance(pts_hit_gt)[:, None]
            parts_p.append(pts_hit)
            parts_sdf.append(sdfs)
            parts_valid.append(np.ones((n_keep, 1), np.float32))
            parts_sign.append(np.zeros((n_keep, 1), np.float32))
            # Part II: near-surface ray perturbations (sdf_3d.py:265-277).
            dist = np.maximum(np.linalg.norm(pts_hit - twc, axis=1, keepdims=True), 1e-6)
            dirs_n = (pts_hit - twc) / dist
            rep_dist = np.repeat(dist, self.near_surface_n, axis=0)
            rep_dir = np.repeat(dirs_n, self.near_surface_n, axis=0)
            disp = rng.standard_normal((n_keep * self.near_surface_n, 1)) * self.near_surface_std
            near_pts = (twc + rep_dir * (rep_dist + disp)).astype(np.float32)
            parts_p.append(near_pts)
            parts_sdf.append((-disp).astype(np.float32))
            parts_valid.append(np.ones_like(disp, dtype=np.float32))
            parts_sign.append(np.zeros_like(disp, dtype=np.float32))
            # Part III: free-space ratio samples (sdf_3d.py:279-291).
            rep_dist = np.repeat(dist, self.free_space_n, axis=0)
            rep_dir = np.repeat(dirs_n, self.free_space_n, axis=0)
            ratio = 0.01 + rng.uniform(size=(n_keep * self.free_space_n, 1)) * 0.98
            disp = np.minimum((ratio - 1.0) * rep_dist, -self.trunc_dist)
            free_pts = (twc + rep_dir * (rep_dist + disp)).astype(np.float32)
            parts_p.append(free_pts)
            parts_sdf.append((-disp).astype(np.float32))
            parts_valid.append(np.zeros_like(disp, dtype=np.float32))
            parts_sign.append(np.ones_like(disp, dtype=np.float32))

            pts_world = np.concatenate(parts_p)
            pts_frame = (pts_world - twc) @ Rwc  # R^T (x - t)
            self.frames.append({
                "points_frame": pts_frame.astype(np.float32),
                "sdfs": np.concatenate(parts_sdf).astype(np.float32),
                "sdfs_valid": np.concatenate(parts_valid),
                "signs": np.concatenate(parts_sign),
            })

    def resample_poses(self):
        """Simulated noisy pose estimates; first frame anchored
        (sdf_3d.py:314-326)."""
        import jax
        from miso_tpu.ops import se3

        key = jax.random.PRNGKey(int(self._rng.integers(2**31)))
        k1, k2 = jax.random.split(key)
        t_noise = np.array(se3.gaussian_translations(k1, self.num_frames, self.frame_std_meter))
        R_noise = np.array(se3.wrapped_gaussian_rotations(k2, self.num_frames, self.frame_std_rad))
        t_noise[0] = 0.0
        R_noise[0] = np.eye(3)
        self.t_world_frame = (self.t_world_frame_gt + t_noise).astype(np.float32)
        self.R_world_frame = np.einsum("nij,njk->nik", self.R_world_frame_gt, R_noise).astype(np.float32)

    # -- pose accessors (sdf_3d.py:328-336) --------------------------------
    def true_kf_pose_in_world(self, kf_id):
        return self.R_world_frame_gt[kf_id], self.t_world_frame_gt[kf_id]

    def noisy_kf_pose_in_world(self, kf_id):
        return self.R_world_frame[kf_id], self.t_world_frame[kf_id]

    def sample(self, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        """Fixed-size batch: frame_batchsize samples per frame with
        replacement (sdf_3d.py:338-378), flat frame ids."""
        B = self.frame_batchsize
        coords, sdfs, valid, signs, ids = [], [], [], [], []
        for f, fr in enumerate(self.frames):
            n = fr["points_frame"].shape[0]
            sel = rng.choice(n, size=B)
            coords.append(fr["points_frame"][sel])
            sdfs.append(fr["sdfs"][sel])
            valid.append(fr["sdfs_valid"][sel])
            signs.append(fr["signs"][sel])
            ids.append(np.full((B,), f, np.int32))
        N = B * self.num_frames
        return {
            "coords_frame": np.concatenate(coords),
            "sample_frame_ids": np.concatenate(ids),
            "weights": np.ones((N, 1), np.float32),
            "sdf": np.concatenate(sdfs),
            "sdf_valid": np.concatenate(valid),
            "sdf_signs": np.concatenate(signs),
            "R_world_frame": self.R_world_frame,
            "t_world_frame": self.t_world_frame,
        }

    def get_inflated_bound(self, buffer=0.5):
        return np.stack([self.bound[:, 0] - buffer, self.bound[:, 1] + buffer], axis=1)


class BatchedSdf3D(Dataset):
    """Multi-scene wrapper: random scene per sample (sdf_3d.py:417-463)."""

    def __init__(self, meshes: Sequence[MeshLike], **kwargs):
        self.datasets = [Sdf3D(m, **kwargs) for m in meshes]

    def __len__(self):
        return len(self.datasets)

    def sample(self, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        i = int(rng.integers(len(self.datasets)))
        batch = self.datasets[i].sample(rng)
        batch["dataset_index"] = np.asarray(i, np.int32)
        return batch


class BatchPosedSdf3D(Dataset):
    """Multi-scene posed wrapper with periodic pose-noise resampling
    (sdf_3d.py:465-495)."""

    def __init__(self, meshes: Sequence[MeshLike], resample_pose_every=0, **kwargs):
        self.datasets = [PosedSdf3D(m, seed=i, **kwargs) for i, m in enumerate(meshes)]
        self.resample_pose_every = resample_pose_every
        self._count = 0

    def __len__(self):
        return len(self.datasets)

    def sample(self, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        i = int(rng.integers(len(self.datasets)))
        if self.resample_pose_every and self._count % self.resample_pose_every == 0:
            self.datasets[i].resample_poses()
        self._count += 1
        batch = self.datasets[i].sample(rng)
        batch["dataset_index"] = np.asarray(i, np.int32)
        return batch
