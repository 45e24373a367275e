"""Real-format fixture tests for every dataset loader.

The reference's pipelines are defined by their file formats
(ScanNet frame_data.pt / cam_poses_icp.npy / submaps.pt,
reference scannet.py:64-93; NCD KITTI poses + per-frame PCD/PLY,
sdf_3d_lidar.py:59-133; raw RGB-D pose txt + 16-bit depth PNG,
sdf_rgbd.py:150-215).  These tests synthesize tiny on-disk fixtures in
each exact format and drive the loaders' real-file code paths:
load -> documented sample schema -> pose round-trip.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.fast

SCHEMA_KEYS = ("coords_frame", "sample_frame_ids", "weights", "sdf",
               "sdf_valid", "sdf_signs")


def _check_schema(batch, n_kfs):
    N = batch["coords_frame"].shape[0]
    assert batch["coords_frame"].shape == (N, 3)
    assert batch["sample_frame_ids"].shape[0] == N
    for k in ("weights", "sdf", "sdf_valid", "sdf_signs"):
        assert batch[k].shape == (N, 1), k
    ids = np.asarray(batch["sample_frame_ids"]).reshape(-1)
    assert ids.min() >= 0 and ids.max() < n_kfs
    assert np.isfinite(np.asarray(batch["coords_frame"])).all()
    assert set(np.unique(np.asarray(batch["sdf_signs"]))) <= {-1.0, 0.0, 1.0}


def _poses(n, step=0.1):
    """Simple forward-translating trajectory, slight yaw."""
    from scipy.spatial.transform import Rotation
    T = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    for i in range(n):
        T[i, :3, :3] = Rotation.from_euler("y", 0.02 * i).as_matrix()
        T[i, :3, 3] = [0.0, 0.0, step * i]
    return T


def _depth_stack(n, H=24, W=32, z=2.0):
    return np.full((n, H, W), z, np.float32)


# ---------------------------------------------------------------------------
# ScanNet preprocessed: frame_data.pt + cam_poses_icp.npy + submaps.pt
# ---------------------------------------------------------------------------

def test_scannet_preprocessed_format(tmp_path, rng):
    import torch

    from miso_tpu.datasets.scannet import ScanNet

    n = 4
    T_gt = _poses(n)
    depth = _depth_stack(n)
    torch.save({
        "depth_batch": torch.from_numpy(depth),
        "T_WC_batch": torch.from_numpy(T_gt),
        "norm_batch": torch.zeros((n, *depth.shape[1:], 3)),
    }, tmp_path / "frame_data.pt")
    T_icp = T_gt.copy()
    T_icp[:, :3, 3] += 0.01  # odometry differs from GT
    np.save(tmp_path / "cam_poses_icp.npy", T_icp)
    torch.save({
        "submaps": torch.tensor([[0.0, 0.0, 1.0, 4.0, 4.0, 2.0],
                                 [0.0, 0.0, 2.0, 4.0, 4.0, 2.0]]),
        "kframe_submap_assoc": torch.tensor([[0, 0], [0, 1], [1, 2], [1, 3]]),
    }, tmp_path / "submaps.pt")
    (tmp_path / "info.txt").write_text(
        "fx_depth = 300.0\nfy_depth = 300.0\nmx_depth = 15.5\n"
        "my_depth = 11.5\ndepthWidth = 32\ndepthHeight = 24\n")

    ds = ScanNet({"dataset": {"path": str(tmp_path),
                              "intrinsics_file": str(tmp_path / "info.txt"),
                              "trunc_dist": 0.15},
                  "sample": {"n_rays": 16, "depth_range": (0.07, 8.0),
                             "n_strat_samples": 5, "n_surf_samples": 3}})
    assert ds.num_kfs == n
    assert ds.fx == 300.0 and ds.cx == 15.5
    # GT poses round-trip; init estimates come from the ICP file.
    R, t = ds.true_kf_pose_in_world(2)
    np.testing.assert_allclose(R, T_gt[2, :3, :3], atol=1e-6)
    np.testing.assert_allclose(t, T_gt[2, :3, 3], atol=1e-6)
    _, t_init = ds.noisy_kf_pose_in_world(2)
    np.testing.assert_allclose(t_init, T_icp[2, :3, 3], atol=1e-6)
    # Precomputed submap structure.
    assert ds.keyframe_to_submap == [0, 0, 1, 1]
    b = ds.submap_bound(0, buffer=0.5)
    assert b.shape == (3, 2)
    np.testing.assert_allclose(b[:, 1], [2.5, 2.5, 1.5], atol=1e-6)
    # Odometry between consecutive KFs reproduces the ICP relative pose.
    T_rel = ds.get_odometry_at_pose(0)
    np.testing.assert_allclose(
        T_rel, np.linalg.inv(T_icp[0]) @ T_icp[1], atol=1e-5)
    _check_schema(ds.sample(rng), n)
    # Noisy-pose simulation anchors the chosen frame.
    ds.simulate_noisy_poses(rng, std_rad=0.01, std_meter=0.05, anchor=0)
    np.testing.assert_allclose(ds.T_WC[0], T_gt[0], atol=1e-6)
    assert np.abs(ds.T_WC[1] - T_gt[1]).max() > 1e-4


# ---------------------------------------------------------------------------
# ReplicaCAD / FastCaMo: frame_data.pt + camera intrinsics in cfg
# ---------------------------------------------------------------------------

def test_replicacad_format(tmp_path, rng):
    import torch

    from miso_tpu.datasets.replica import ReplicaCAD

    n = 3
    torch.save({
        "depth_batch": torch.from_numpy(_depth_stack(n)),
        "T_WC_batch": torch.from_numpy(_poses(n)),
    }, tmp_path / "frame_data.pt")
    ds = ReplicaCAD({"dataset": {"path": str(tmp_path),
                                 "camera": {"fx": 300, "fy": 300,
                                            "cx": 15.5, "cy": 11.5}},
                     "sample": {"n_rays": 16, "n_strat_samples": 5,
                                "n_surf_samples": 3}})
    assert ds.num_kfs == n
    _check_schema(ds.sample(rng), n)


def test_fastcamo_format_pose_noise(tmp_path, rng):
    import torch

    from miso_tpu.datasets.fastcamo import FastCaMo

    n = 4
    T_gt = _poses(n)
    torch.save({
        "depth_batch": torch.from_numpy(_depth_stack(n)),
        "T_WC_batch": torch.from_numpy(T_gt),
    }, tmp_path / "frame_data.pt")
    ds = FastCaMo({"dataset": {"path": str(tmp_path),
                               "camera": {"fx": 300, "fy": 300,
                                          "cx": 15.5, "cy": 11.5},
                               "pose_noise_rad": 0.02,
                               "pose_noise_meter": 0.05},
                   "sample": {"n_rays": 16, "n_strat_samples": 5,
                              "n_surf_samples": 3}})
    # First frame anchored, others perturbed (fastcamo noisy-pose options).
    np.testing.assert_allclose(ds.T_WC[0], T_gt[0], atol=1e-6)
    assert np.abs(ds.T_WC[1:] - T_gt[1:]).max() > 1e-4
    # GT retained alongside.
    R, t = ds.true_kf_pose_in_world(3)
    np.testing.assert_allclose(t, T_gt[3, :3, 3], atol=1e-6)
    _check_schema(ds.sample(rng), n)


# ---------------------------------------------------------------------------
# LiDAR: KITTI pose txt + per-frame .pcd (ascii + binary) and .ply
# ---------------------------------------------------------------------------

def _write_pcd_ascii(path, pts):
    with open(path, "w") as f:
        f.write("# .PCD v0.7\nVERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\n"
                "TYPE F F F\nCOUNT 1 1 1\n"
                f"WIDTH {len(pts)}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
                f"POINTS {len(pts)}\nDATA ascii\n")
        for p in pts:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")


def _write_pcd_binary(path, pts, extra_intensity=True):
    """Binary PCD with an extra intensity field (real NCD clouds carry
    more than xyz)."""
    fields = "x y z intensity" if extra_intensity else "x y z"
    k = 4 if extra_intensity else 3
    with open(path, "wb") as f:
        f.write((
            "# .PCD v0.7\nVERSION 0.7\n"
            f"FIELDS {fields}\nSIZE {' '.join(['4'] * k)}\n"
            f"TYPE {' '.join(['F'] * k)}\nCOUNT {' '.join(['1'] * k)}\n"
            f"WIDTH {len(pts)}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
            f"POINTS {len(pts)}\nDATA binary\n").encode("ascii"))
        arr = np.zeros((len(pts), k), np.float32)
        arr[:, :3] = pts
        if extra_intensity:
            arr[:, 3] = 0.5
        f.write(arr.astype("<f4").tobytes())


def _ring_cloud(rng, n=400, radius=3.0):
    """Points on a cylinder around the sensor (survives range/z crops)."""
    ang = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-0.5, 0.5, n)
    return np.stack([radius * np.cos(ang), radius * np.sin(ang), z],
                    axis=-1).astype(np.float32)


def test_lidar_kitti_pcd_ply_formats(tmp_path, rng):
    from miso_tpu.datasets.lidar import (PosedSdf3DLidar, read_kitti_format_poses,
                                         write_kitti_format_poses)
    from miso_tpu.utils.sdf import write_ply

    n = 3
    T_gt = _poses(n, step=0.5)
    T_init = T_gt.copy()
    T_init[:, :3, 3] += 0.02
    write_kitti_format_poses(tmp_path / "poses_gt.txt", T_gt)
    write_kitti_format_poses(tmp_path / "poses_init.txt", T_init)
    # KITTI round-trip.
    back = read_kitti_format_poses(str(tmp_path / "poses_gt.txt"))
    np.testing.assert_allclose(np.stack(back), T_gt, atol=1e-6)

    scans = tmp_path / "scans"
    scans.mkdir()
    _write_pcd_ascii(scans / "frame_000.pcd", _ring_cloud(rng))
    _write_pcd_binary(scans / "frame_001.pcd", _ring_cloud(rng))
    write_ply(str(scans / "frame_002.ply"), _ring_cloud(rng),
              np.zeros((0, 3), np.int32))

    ds = PosedSdf3DLidar(
        lidar_folder=str(scans), pose_file_gt=str(tmp_path / "poses_gt.txt"),
        pose_file_init=str(tmp_path / "poses_init.txt"),
        frame_samples=128, frame_batchsize=64, voxel_size=0.05,
        min_range=0.5, max_range=10.0, min_z=-2.0, adaptive_range=False)
    assert ds.num_kfs == n
    _check_schema(ds.sample(rng), n)
    # Init poses drive odometry; GT kept separately.
    T_rel = ds.get_odometry_at_pose(0)
    np.testing.assert_allclose(
        T_rel, np.linalg.inv(T_init[0]) @ T_init[1], atol=1e-5)
    R, t = ds.true_kf_pose_in_world(1)
    np.testing.assert_allclose(t, T_gt[1, :3, 3], atol=1e-6)
    # Surface samples have sdf == 0 / sign 0; free-space sign +1;
    # behind-surface sign -1 (PIN-SLAM recipe).
    batch = ds.sample(rng)
    signs = np.unique(np.asarray(batch["sdf_signs"]))
    assert set(signs) == {-1.0, 0.0, 1.0}
    # Points load in FRAME coordinates on the ring radius.
    pts = ds.sampled_points_at_kf(0)
    r = np.linalg.norm(pts[:, :2], axis=1)
    assert np.all(r > 2.0) and np.all(r < 4.0)


def test_pcd_reader_matches_written_values(tmp_path, rng):
    from miso_tpu.datasets.lidar import read_pcd

    pts = rng.normal(0, 1, (50, 3)).astype(np.float32)
    _write_pcd_ascii(tmp_path / "a.pcd", pts)
    _write_pcd_binary(tmp_path / "b.pcd", pts)
    np.testing.assert_allclose(read_pcd(str(tmp_path / "a.pcd")), pts,
                               atol=1e-4)
    np.testing.assert_allclose(read_pcd(str(tmp_path / "b.pcd")), pts,
                               atol=1e-7)


# ---------------------------------------------------------------------------
# Raw RGB-D: 16-bit depth PNGs + per-frame 4x4 pose txt
# ---------------------------------------------------------------------------

def test_posed_sdf_rgbd_raw_format(tmp_path, rng):
    from PIL import Image

    from miso_tpu.datasets.rgbd import PosedSdfRgbd

    n, H, W = 3, 24, 32
    (tmp_path / "depth").mkdir()
    (tmp_path / "pose").mkdir()
    T_gt = _poses(n)
    depth_m = _depth_stack(n, H, W, z=2.0)
    for i in range(n):
        mm = (depth_m[i] * 1000.0).astype(np.uint16)   # millimeter PNG
        Image.fromarray(mm).save(tmp_path / "depth" / f"{i:04d}.png")
        np.savetxt(tmp_path / "pose" / f"{i:04d}.txt", T_gt[i])
    ds = PosedSdfRgbd(str(tmp_path), depth_scale=1000.0,
                      intrinsics=(300.0, 300.0, 15.5, 11.5),
                      n_rays=16, n_strat_samples=5, n_surf_samples=3)
    assert ds.num_kfs == n
    # Depth decoded back to meters.
    np.testing.assert_allclose(ds.depth[0], depth_m[0], atol=1e-3)
    R, t = ds.true_kf_pose_in_world(2)
    np.testing.assert_allclose(t, T_gt[2, :3, 3], atol=1e-6)
    _check_schema(ds.sample(rng), n)
    # Normals from a flat wall face the camera (-z).
    normals = ds.estimate_normals(0)
    inner = np.abs(normals.reshape(-1, 3) @ np.array([0, 0, 1.0]))
    assert np.nanmean(inner) > 0.9


def test_posed_sdf_rgbd_frame_stride(tmp_path, rng):
    from PIL import Image

    from miso_tpu.datasets.rgbd import PosedSdfRgbd

    n = 6
    (tmp_path / "depth").mkdir()
    (tmp_path / "pose").mkdir()
    T_gt = _poses(n)
    for i in range(n):
        mm = np.full((24, 32), 2000, np.uint16)
        Image.fromarray(mm).save(tmp_path / "depth" / f"{i:04d}.png")
        np.savetxt(tmp_path / "pose" / f"{i:04d}.txt", T_gt[i])
    ds = PosedSdfRgbd(str(tmp_path), frame_stride=2, max_frames=2,
                      intrinsics=(300.0, 300.0, 15.5, 11.5),
                      n_rays=8, n_strat_samples=4, n_surf_samples=2)
    assert ds.num_kfs == 2
    _, t = ds.true_kf_pose_in_world(1)
    np.testing.assert_allclose(t, T_gt[2, :3, 3], atol=1e-6)  # stride 2
