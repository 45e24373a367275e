"""Reconstruction and trajectory evaluation.

Replaces `grid_opt/utils/utils_eval.py` (pytorch3d kNN + evo APE):
  * Chamfer / MAE accuracy & completeness / precision / recall / F-score
    via scipy cKDTree,
  * absolute trajectory error with Umeyama SE(3) alignment (the evo
    equivalent, reference utils_eval.py:110-149).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
from scipy.spatial import cKDTree


def nearest_distances(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """For each src point, distance to nearest dst point (utils_eval.py:14-36)."""
    tree = cKDTree(np.asarray(dst))
    d, _ = tree.query(np.asarray(src), k=1, workers=-1)
    return d


def compute_chamfer_metrics(points_pred: np.ndarray, points_gt: np.ndarray,
                            threshold: float = 0.05,
                            truncation_acc: float = 0.50,
                            truncation_com: float = 0.50) -> Dict[str, float]:
    """Chamfer / F-score metrics (reference utils_eval.py:74-108).

    Distances above the truncation are dropped from the MAE / Chamfer
    means (the reference filters with `dist < truncation`), and
    precision / recall use `threshold`.
    """
    d_p2g = nearest_distances(points_pred, points_gt)  # accuracy direction
    d_g2p = nearest_distances(points_gt, points_pred)  # completeness direction
    acc_kept = d_p2g[d_p2g < truncation_acc]
    com_kept = d_g2p[d_g2p < truncation_com]
    acc = float(acc_kept.mean()) if len(acc_kept) else float("inf")
    com = float(com_kept.mean()) if len(com_kept) else float("inf")
    chamfer_l1 = 0.5 * (acc + com)
    chamfer_l2 = float(np.sqrt(0.5 * ((acc_kept**2).mean() + (com_kept**2).mean()))) \
        if len(acc_kept) and len(com_kept) else float("inf")
    precision = float((d_p2g < threshold).mean() * 100.0)
    recall = float((d_g2p < threshold).mean() * 100.0)
    fscore = 2 * precision * recall / (precision + recall) if precision + recall > 0 else 0.0
    return {
        "MAE_accuracy (cm)": 100 * acc,
        "MAE_completeness (cm)": 100 * com,
        "Chamfer_L1 (cm)": 100 * chamfer_l1,
        "Chamfer_L2 (cm)": 100 * chamfer_l2,
        "Precision (%)": precision,
        "Recall (%)": recall,
        "F-score (%)": fscore,
    }


def umeyama_alignment(src: np.ndarray, dst: np.ndarray, with_scale: bool = False):
    """Least-squares SE(3)/Sim(3) alignment src -> dst (Umeyama 1991).

    This is what evo's APE alignment uses.  Returns (R, t, s).
    """
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = dc.T @ sc / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var = (sc**2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / var)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return R, t, s


def trajectory_error(traj_est: np.ndarray, traj_gt: np.ndarray,
                     align: bool = True) -> Dict[str, float]:
    """Absolute trajectory error with optional SE(3) alignment.

    traj_*: (N, 4, 4) pose arrays (or (N, 3) positions).  Equivalent of
    evo APE translation_part (reference utils_eval.py:110-149).
    Returns RMSE / mean / median / std in the input units.
    """
    est = np.asarray(traj_est)
    gt = np.asarray(traj_gt)
    p_est = est[:, :3, 3] if est.ndim == 3 else est
    p_gt = gt[:, :3, 3] if gt.ndim == 3 else gt
    R_align = np.eye(3)
    if align and len(p_est) >= 3:
        R_align, t, _ = umeyama_alignment(p_est, p_gt)
        p_est = p_est @ R_align.T + t
    err = np.linalg.norm(p_est - p_gt, axis=1)
    out = {
        "ate_rmse": float(np.sqrt((err**2).mean())),
        "ate_mean": float(err.mean()),
        "ate_median": float(np.median(err)),
        "ate_std": float(err.std()),
    }
    if est.ndim == 3 and gt.ndim == 3:
        # Rotation RMSE after the same alignment rotation (reference
        # utils_geometry.py:160-212 reports rotation error alongside).
        from miso_tpu.ops import se3
        import jax.numpy as jnp

        R_est = jnp.asarray(R_align[None] @ est[:, :3, :3])
        out["rot_rmse_deg"] = float(
            se3.rotation_rmse_deg(R_est, jnp.asarray(gt[:, :3, :3])))
    return out


def sample_mesh_points(mesh, n: int, seed: int = 0) -> np.ndarray:
    """Uniform surface samples from a native TriangleMesh."""
    return mesh.sample_surface(n, seed=seed)


def mesh_reconstruction_metrics(mesh_pred, mesh_gt, n_points: int = 200000,
                                threshold: float = 0.05,
                                truncation: float = 0.5,
                                seed: int = 0) -> Dict[str, float]:
    """Sample both meshes and compute chamfer metrics
    (mirrors demo/full_slam_scannet.py:161-191)."""
    p_pred = sample_mesh_points(mesh_pred, n_points, seed)
    p_gt = sample_mesh_points(mesh_gt, n_points, seed + 1)
    return compute_chamfer_metrics(p_pred, p_gt, threshold, truncation, truncation)


def icp_point_to_point(src: np.ndarray, dst: np.ndarray,
                       init_T: Optional[np.ndarray] = None,
                       max_iters: int = 50,
                       max_corr_dist: float = 0.5,
                       tol: float = 1e-6,
                       robust_k: Optional[float] = None):
    """Point-to-point ICP (replaces open3d registration_icp; reference
    grid_opt/align/icp.py:95-104, utils_scannet.py:115-156).

    robust_k enables a Tukey-style hard reweighting (utils_ncd.py usage).
    Returns (T (4, 4), rmse, fitness).
    """
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    T = np.eye(4) if init_T is None else np.asarray(init_T, np.float64).copy()
    tree = cKDTree(dst)
    prev_err = np.inf
    rmse, fitness = np.inf, 0.0
    for _ in range(max_iters):
        cur = src @ T[:3, :3].T + T[:3, 3]
        d, idx = tree.query(cur, k=1, workers=-1)
        mask = d < max_corr_dist
        if robust_k is not None:
            mask &= d < robust_k
        if mask.sum() < 3:
            break
        P = cur[mask]
        Q = dst[idx[mask]]
        R, t, _ = umeyama_alignment(P, Q)
        dT = np.eye(4)
        dT[:3, :3] = R
        dT[:3, 3] = t
        T = dT @ T
        err = float((d[mask] ** 2).mean())
        rmse = float(np.sqrt(err))
        fitness = float(mask.mean())
        if abs(prev_err - err) < tol:
            break
        prev_err = err
    return T, rmse, fitness


def icp_point_to_plane(src: np.ndarray, dst: np.ndarray,
                       dst_normals: np.ndarray,
                       init_T: Optional[np.ndarray] = None,
                       max_iters: int = 50,
                       max_corr_dist: float = 0.5,
                       tol: float = 1e-8):
    """Point-to-plane ICP (the reference's default constraint,
    grid_opt/align/icp.py:74-79 TransformationEstimationPointToPlane).

    Minimizes sum(((R p + t - q) . n_q)^2) with the small-angle
    linearization; far better conditioned than point-to-point on the
    planar structures that dominate indoor scenes.  Returns
    (T (4, 4), rmse, fitness)."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    n_all = np.asarray(dst_normals, np.float64)
    T = np.eye(4) if init_T is None else np.asarray(init_T, np.float64).copy()
    tree = cKDTree(dst)
    prev_err = np.inf
    rmse, fitness = np.inf, 0.0
    for _ in range(max_iters):
        cur = src @ T[:3, :3].T + T[:3, 3]
        d, idx = tree.query(cur, k=1, workers=-1)
        mask = d < max_corr_dist
        if mask.sum() < 6:
            break
        P = cur[mask]
        Q = dst[idx[mask]]
        N = n_all[idx[mask]]
        r = np.einsum("ij,ij->i", P - Q, N)
        # J = [p x n, n] for the residual d/d(omega, t).
        J = np.concatenate([np.cross(P, N), N], axis=1)
        H = J.T @ J + 1e-9 * np.eye(6)
        x = np.linalg.solve(H, -J.T @ r)
        from miso_tpu.ops import se3 as _se3
        import jax.numpy as _jnp
        dT = np.eye(4)
        dT[:3, :3] = np.asarray(_se3.so3_exp(_jnp.asarray(x[:3])))
        dT[:3, 3] = x[3:]
        T = dT @ T
        err = float((r**2).mean())
        rmse = float(np.sqrt((d[mask] ** 2).mean()))
        fitness = float(mask.mean())
        if abs(prev_err - err) < tol:
            break
        prev_err = err
    return T, rmse, fitness
