"""iSDF-paper loss, ported functionally (reference `grid_opt/loss_isdf.py`).

SDF supervision uses "ray bounds" as targets: samples beyond the
truncation distance see the iSDF eq-6 free-space loss
(max(relu(pred - bound), exp(-beta * pred) - 1)); samples inside the
truncation band see a direct (weighted) residual (loss_isdf.py:280-333).
Eikonal is masked to bounds >= eik_apply_dist (loss_isdf.py:335-365).

Boolean index writes become multiplicative masks; the submap variant's
nested per-submap / per-KF loops (loss_isdf.py:242-277) become gathers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from miso_tpu.losses import common
from miso_tpu.ops import se3
from miso_tpu.ops.diff import gradient3d


def isdf_sdf_loss_mat(pred, bounds, trunc_dist, loss_type="L1",
                      free_space_factor=5.0):
    """Per-sample iSDF sdf loss and the free-space mask
    (loss_isdf.py:280-333)."""
    free = (bounds > trunc_dist)
    fs_mat = jnp.maximum(jax.nn.relu(pred - bounds),
                         jnp.exp(-free_space_factor * pred) - 1.0)
    trunc_mat = pred - bounds
    mat = jnp.where(free, fs_mat, trunc_mat)
    if loss_type == "L1":
        mat = jnp.abs(mat)
    elif loss_type == "L2":
        mat = mat**2
    else:
        raise ValueError("loss_type must be L1 or L2")
    return mat, free


def isdf_loss(model, batch, key, trunc_dist=0.15, sdf_weight=1.0,
              grad_weight=0.0, eik_weight=0.0, eik_apply_dist=0.1,
              free_space_factor=5.0, loss_type="L1", trunc_weight=1.0,
              smooth_weight=0.0, smooth_std=0.05, pose_reg_weight=0.0,
              pose_thresh_rad=1.0, pose_thresh_m=1.0,
              pose_lock_rows=None):
    """iSDFLoss.compute_slam (loss_isdf.py:46-95): KF-frame coords are
    transformed with updated poses, then the iSDF sdf loss applies with
    trunc_weight on the truncation band and optional eikonal."""
    coords = batch["coords_frame"]
    ids = batch["sample_frame_ids"].reshape(-1).astype(jnp.int32) - model.anchor_kf
    R, t = model.updated_kf_poses(lock_mask=pose_lock_rows)
    pc = se3.transform_points_by_id(coords, ids, R, t)
    bounds = batch["sdf"]
    pred = model(pc)
    mat, free = isdf_sdf_loss_mat(pred, bounds, trunc_dist, loss_type,
                                  free_space_factor)
    mat = jnp.where(free, mat, mat * trunc_weight)
    total = mat
    if eik_weight > 0:
        g = gradient3d(pc, model, method="autograd")
        eik = jnp.abs(jnp.linalg.norm(g, axis=-1, keepdims=True) - 1.0)
        eik = jnp.where(bounds < eik_apply_dist, 0.0, eik)
        total = total + eik_weight * eik
    out = {"sdf": jnp.mean(total) * sdf_weight}
    if smooth_weight > 0:
        out["smooth"] = smooth_weight * common.smoothness_loss(
            model, pc, jnp.ones_like(bounds), key, smooth_std)
    if pose_reg_weight > 0:
        rot_norm = jnp.linalg.norm(model.rot_corr, axis=-1)
        tr_norm = jnp.linalg.norm(model.trans_corr, axis=-1)
        out["trust_region_R"] = pose_reg_weight * jnp.sum(
            jax.nn.relu(rot_norm - pose_thresh_rad))
        out["trust_region_t"] = pose_reg_weight * jnp.sum(
            jax.nn.relu(tr_norm - pose_thresh_m))
    return out


def isdf_loss_default(model, batch, key, trunc_dist=0.15, trunc_weight=1.0,
                      eik_weight=0.0, eik_apply_dist=0.1, grad_weight=0.0,
                      free_space_factor=5.0, loss_type="L1",
                      smooth_weight=0.0, smooth_std=0.05):
    """iSDFLoss.compute_default (loss_isdf.py:96-158): world-frame coords
    with optional surface-normal cosine supervision."""
    pc = batch["coords"]
    bounds = batch["sdf"]
    pred = model(pc)
    mat, free = isdf_sdf_loss_mat(pred, bounds, trunc_dist, loss_type,
                                  free_space_factor)
    mat = jnp.where(free, mat, mat * trunc_weight)
    total = mat
    g = None
    if eik_weight > 0 or grad_weight > 0:
        g = gradient3d(pc, model, method="autograd")
    if eik_weight > 0:
        eik = jnp.abs(jnp.linalg.norm(g, axis=-1, keepdims=True) - 1.0)
        eik = jnp.where(bounds < eik_apply_dist, 0.0, eik)
        total = total + eik_weight * eik
    out = {"sdf": jnp.mean(total)}
    if grad_weight > 0 and "normals" in batch:
        n = batch["normals"]
        cos = jnp.sum(g * n, axis=-1) / (
            jnp.linalg.norm(g, axis=-1) * jnp.linalg.norm(n, axis=-1) + 1e-6)
        # Only surface samples (bounds ~ 0) carry normals.
        surf = (jnp.abs(bounds[:, 0]) < 1e-6).astype(cos.dtype)
        out["grad"] = grad_weight * jnp.sum((1.0 - cos) * surf) / jnp.maximum(
            jnp.sum(surf), 1.0)
    if smooth_weight > 0:
        out["smooth"] = smooth_weight * common.smoothness_loss(
            model, pc, jnp.ones_like(bounds), key, smooth_std)
    return out


def isdf_loss_submap(params, batch, key, trunc_dist=0.15, sdf_weight=1.0,
                     trunc_weight=1.0, eik_weight=0.0, eik_apply_dist=0.1,
                     free_space_factor=5.0, loss_type="L1",
                     pose_reg_weight=0.0, pose_thresh_rad=1.0,
                     pose_thresh_m=1.0, stability_weight=0.0):
    """iSDFLossSubmap (loss_isdf.py:155-277) over GridAtlasParams:
    independent per-submap iSDF losses in submap frames, with the
    per-submap point selection as a gathered mask."""
    ids = batch["sample_frame_ids"].reshape(-1).astype(jnp.int32)
    bounds = batch["sdf"]
    sub_of_point = params.kf_to_submap[ids]
    R_sk, t_sk = params.updated_kf_poses_in_submap()
    loc = params.kf_to_local[ids]
    coords_submap = se3.transform_points_by_id2(
        batch["coords_frame"], sub_of_point, loc, R_sk, t_sk)
    out = {}
    # Per-point own-submap queries + segment sums (O(N) compute, flat in
    # the number of submaps; see losses/fusion.py submap mode).  The
    # size-aware per-point gather keeps padded storage rows from reading
    # as real features when submap bounds differ.
    S = params.num_submaps
    pred = params.forward_per_point(sub_of_point, coords_submap)

    def seg(v):  # (N,) per-point terms -> (S,) per-submap sums
        return jax.ops.segment_sum(v, sub_of_point, num_segments=S)

    counts = jnp.maximum(seg(jnp.ones_like(bounds[:, 0])), 1.0)
    mat, free = isdf_sdf_loss_mat(pred, bounds, trunc_dist, loss_type,
                                  free_space_factor)
    mat = jnp.where(free, mat, mat * trunc_weight)
    sdf_vec = sdf_weight * seg(mat[:, 0]) / counts
    if stability_weight > 0:
        mu = params.query_stability_per_point(sub_of_point, coords_submap)
        # mu is (N, L) (one stability channel per level); the unrolled
        # path summed the squared residual over levels too.
        stab_vec = stability_weight * seg(
            jnp.sum((mu - 1.0) ** 2, axis=1)) / counts
    if pose_reg_weight > 0:
        rot_norm = jnp.linalg.norm(params.kf_rot_corr, axis=-1)   # (S, K)
        tr_norm = jnp.linalg.norm(params.kf_trans_corr, axis=-1)
        tr_R = pose_reg_weight * jnp.sum(
            jax.nn.relu(rot_norm - pose_thresh_rad), axis=1)      # (S,)
        tr_t = pose_reg_weight * jnp.sum(
            jax.nn.relu(tr_norm - pose_thresh_m), axis=1)
    for s in range(S):
        out[f"submap{s}_sdf"] = sdf_vec[s]
        if stability_weight > 0:
            out[f"submap{s}_stability"] = stab_vec[s]
        if pose_reg_weight > 0:
            out[f"submap{s}_trust_region_R"] = tr_R[s]
            out[f"submap{s}_trust_region_t"] = tr_t[s]
    return out
