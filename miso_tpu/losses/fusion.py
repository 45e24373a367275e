"""Atlas-level losses: fusion mapping + posed-SDF submap BA.

References: MisoLossFusion (loss.py:856-861 over MisoLossMappingBase),
PosedSdfLoss3DSubmap (loss.py:299-514).

Keyframe ids in batches are global; pose composition and per-submap
selection are batched gathers over the atlas's kf_to_submap tables
(replacing the reference's nested per-submap/per-KF Python loops,
loss.py:415-514).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from miso_tpu.losses import common
from miso_tpu.ops import se3


def fusion_loss(params, batch, key, loss_type="L1", weight_sdf=1.0,
                weight_eik=0.0, weight_fs=0.1, trunc_dist=0.15,
                finite_diff_eps=1e-2, grad_method="autograd",
                eik_trunc_dist=0.1, gm_scale_sdf=0.1):
    """MisoLossFusion: mapping loss over the whole GridAtlas with poses
    composed submap-in-world o kf-in-submap (loss.py:856-861).

    grad_method defaults to 'autograd' like mapping_loss (the reference
    routes fusion through the same machinery, loss.py:856-861); pass
    'finitediff' to trade the S-way vmapped backward for 6 extra
    forwards on very large atlases."""
    ids = batch["sample_frame_ids"].reshape(-1).astype(jnp.int32)
    R, t = params.updated_kf_poses_in_world()
    coords_world = se3.transform_points_by_id(batch["coords_frame"], ids, R, t)
    pred = params(coords_world)
    gt_sdf = batch["sdf"]
    valid = batch["sdf_valid"]
    out = {}
    out[f"sdf_{loss_type}"] = common.regression_loss(
        pred, gt_sdf, valid, batch.get("weights"), loss_type) * weight_sdf
    if weight_eik > 0:
        sel = (jnp.abs(gt_sdf) < eik_trunc_dist).astype(gt_sdf.dtype) \
            if eik_trunc_dist is not None else None
        out["eik"] = common.eikonal_loss_at(
            params, coords_world, sel, grad_method, finite_diff_eps) * weight_eik
    if weight_fs > 0:
        out["free_space"] = common.free_space_loss(
            pred, gt_sdf, batch["sdf_signs"], trunc_dist) * weight_fs
    return out


def posed_sdf_loss_3d_submap(params, batch, key, mode="submap",
                             sdf_weight=3e3, sign_weight=1e2,
                             smooth_weight=0.0, smooth_std=0.1,
                             trunc_dist=0.15, grad_method="finitediff",
                             finite_diff_eps=1e-2, loss_type="L2",
                             pose_reg_weight=0.0):
    """PosedSdfLoss3DSubmap (loss.py:299-514).

    mode='world'  -> losses on the fused atlas field (compute_world).
    mode='submap' -> independent per-submap losses in submap frames
                     (compute_submap); per-submap means use the count of
                     points assigned to that submap as denominator,
                     matching the reference's downselect-then-mean.
    """
    ids = batch["sample_frame_ids"].reshape(-1).astype(jnp.int32)
    gt_sdf = batch["sdf"]
    valid = batch["sdf_valid"]
    signs = batch["sdf_signs"]
    out = {}
    if mode == "world":
        R, t = params.updated_kf_poses_in_world()
        coords_world = se3.transform_points_by_id(batch["coords_frame"], ids, R, t)
        pred = params(coords_world)
        c = jnp.where(valid == 1, pred - gt_sdf, 0.0)
        sdf_loss = jnp.mean(c**2) if loss_type == "L2" else jnp.mean(jnp.abs(c))
        out["sdf"] = sdf_loss * sdf_weight
        if sign_weight > 0:
            out["free_space"] = common.free_space_loss(
                pred, gt_sdf, signs, trunc_dist) * sign_weight
        if smooth_weight > 0:
            out["smooth"] = common.smoothness_loss(
                params, coords_world, valid, key, smooth_std,
                grad_method, finite_diff_eps) * smooth_weight
    else:
        # Per-point own-submap queries + segment sums: one gather over
        # the stacked storage + one scatter-add per term -- compile time
        # and FLOPs flat in the number of submaps (the reference loops
        # submaps in Python, loss.py:415-514; so did the previous
        # unrolled version here).
        S = params.num_submaps
        sub_of_point = params.kf_to_submap[ids]                   # (N,)
        R_sk, t_sk = params.updated_kf_poses_in_submap()
        loc = params.kf_to_local[ids]
        coords_submap = se3.transform_points_by_id2(
            batch["coords_frame"], sub_of_point, loc, R_sk, t_sk)
        pred = params.forward_per_point(sub_of_point, coords_submap)  # (N, 1)

        def seg(v):  # (N,) per-point terms -> (S,) per-submap sums
            return jax.ops.segment_sum(v, sub_of_point, num_segments=S)

        counts = jnp.maximum(seg(jnp.ones_like(gt_sdf[:, 0])), 1.0)
        c = jnp.where(valid == 1, pred - gt_sdf, 0.0)
        per = c**2 if loss_type == "L2" else jnp.abs(c)
        sdf_vec = seg(per[:, 0]) / counts * sdf_weight        # (S,)
        if sign_weight > 0:
            is_free = (signs == 1)
            upper = jnp.where(is_free, jax.nn.relu(pred - gt_sdf), 0.0)
            lower = jnp.where(is_free, jax.nn.relu(trunc_dist - pred), 0.0)
            fs_vec = seg(jnp.maximum(upper, lower)[:, 0]) / counts * sign_weight
        if pose_reg_weight > 0:
            reg_R = pose_reg_weight * jnp.mean(params.kf_rot_corr**2, axis=(1, 2))
            reg_t = pose_reg_weight * jnp.mean(params.kf_trans_corr**2, axis=(1, 2))
        for s in range(S):
            out[f"{s}_sdf"] = sdf_vec[s]
            if sign_weight > 0:
                out[f"{s}_free_space"] = fs_vec[s]
            if pose_reg_weight > 0:
                out[f"{s}_pose_l2_reg_R"] = reg_R[s]
                out[f"{s}_pose_l2_reg_t"] = reg_t[s]
    if pose_reg_weight > 0:
        out["submap_l2_reg_R"] = pose_reg_weight * jnp.sum(params.sub_rot_corr**2)
        out["submap_l2_reg_t"] = pose_reg_weight * jnp.sum(params.sub_trans_corr**2)
    return out
