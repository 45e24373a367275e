"""MISO tracking / mapping / posed-BA losses on GridNet.

References: MisoLossTracking (loss.py:517-586), MisoLossMappingBase /
MisoLossMapping (loss.py:703-853), PosedSdfLoss3D (loss.py:186-296).

All per-keyframe Python loops are replaced by one gather + einsum over
``sample_frame_ids`` (see ops.se3.transform_points_by_id); keyframe ids
in batches are *global* and converted to local pose indices via the
model's anchor.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from miso_tpu.losses import common
from miso_tpu.ops import se3


def _coords_to_world(model, batch, pose_lock_rows=None):
    """Transform frame coords to world using updated KF poses (batched)."""
    ids = batch["sample_frame_ids"].reshape(-1).astype(jnp.int32) - model.anchor_kf
    R, t = model.updated_kf_poses(lock_mask=pose_lock_rows)
    return se3.transform_points_by_id(batch["coords_frame"], ids, R, t)


def tracking_loss(model, batch, key, weight_sdf=1.0, loss_type="L2",
                  trunc_dist=None, gm_scale_sdf=1.0, pose_lock_rows=None):
    """MisoLossTracking (loss.py:517-586): masked SDF residual with
    optional |gt|<trunc prefilter; L2 / L1 / Geman-McClure."""
    gt_sdf = batch["sdf"]
    valid = batch["sdf_valid"]
    if trunc_dist is not None:
        valid = valid * (jnp.abs(gt_sdf) < trunc_dist).astype(valid.dtype)
    coords_world = _coords_to_world(model, batch, pose_lock_rows)
    pred = model(coords_world)
    loss = common.sdf_residual_loss(pred, gt_sdf, valid, loss_type, gm_scale_sdf)
    return {f"sdf_{loss_type}": weight_sdf * loss}


def mapping_loss(model, batch, key, loss_type="L1", weight_sdf=1.0,
                 weight_eik=0.5, weight_fs=0.0, trunc_dist=0.0,
                 finite_diff_eps=1e-2, grad_method="autograd",
                 eik_trunc_dist=0.1, use_stability=False, weight_clip=0.0,
                 mask_bound=None, pose_lock_rows=None):
    """MisoLossMapping (loss.py:703-853): weighted SDF regression +
    eikonal (|gt| < eik_trunc filtered) + free-space bound + optional
    CLIP-feature regression head (loss.py:815-844: decoder output
    channel 0 is SDF, channels 1.. regress CLIP embeddings at the
    batch's clip_* sample set).

    mask_bound: if set (meters), rows outside the model bound eroded by
    this margin are zero-weighted -- for bounded submaps over larger
    scenes, where out-of-bound rows would otherwise train the zero-pad
    boundary ramp to fit far geometry (no reference counterpart: its
    flagship bounds contain every scan)."""
    gt_sdf = batch["sdf"]
    valid = batch["sdf_valid"]
    sign = batch["sdf_signs"]
    weights = batch.get("weights")
    coords_world = _coords_to_world(model, batch, pose_lock_rows)
    if mask_bound is not None:
        m = jnp.asarray([mask_bound, -mask_bound], model.bound.dtype)
        valid = valid * se3.coords_in_bound(coords_world, model.bound + m)
        sign = sign * se3.coords_in_bound(coords_world, model.bound + m)
    model_out = model(coords_world)
    pred = model_out[:, :1]
    out = {}
    out[f"sdf_{loss_type}"] = common.regression_loss(
        pred, gt_sdf, valid, weights, loss_type) * weight_sdf
    if weight_eik > 0:
        sel = (jnp.abs(gt_sdf) < eik_trunc_dist).astype(gt_sdf.dtype) \
            if eik_trunc_dist is not None else None
        out["eik"] = common.eikonal_loss_at(
            lambda xx: model(xx)[:, :1], coords_world, sel, grad_method,
            finite_diff_eps) * weight_eik
    if weight_fs > 0:
        out["free_space"] = common.free_space_loss(
            pred, gt_sdf, sign, trunc_dist) * weight_fs
    if use_stability:
        out.update(common.feature_stability_loss(model, coords_world))
    if weight_clip > 0 and "clip_coords_frame" in batch:
        ids = batch["clip_sample_frame_ids"].reshape(-1).astype(jnp.int32) \
            - model.anchor_kf
        R, t = model.updated_kf_poses(lock_mask=pose_lock_rows)
        clip_world = se3.transform_points_by_id(batch["clip_coords_frame"],
                                                ids, R, t)
        pred_clip = model(clip_world)[:, 1:]
        out["clip_L1"] = common.regression_loss(
            pred_clip, batch["clip_embeddings"], None, None, "L1") * weight_clip
    return out


def posed_sdf_loss_3d(model, batch, key, sdf_weight=3e3, sign_weight=1e2,
                      eik_weight=0.0, smooth_weight=0.0, trunc_dist=0.15,
                      smooth_std=0.1, grad_method="autograd",
                      finite_diff_eps=1e-2, loss_type="L2",
                      with_stability=True, pose_lock_rows=None):
    """PosedSdfLoss3D (loss.py:186-296): bundle-adjustment loss for a
    single GridNet with free-space, eikonal, smoothness, stability."""
    gt_sdf = batch["sdf"]
    valid = batch["sdf_valid"]
    sign = batch["sdf_signs"]
    coords_world = _coords_to_world(model, batch, pose_lock_rows)
    pred = model(coords_world)
    c = jnp.where(valid == 1, pred - gt_sdf, 0.0)
    if loss_type == "L2":
        sdf_loss = jnp.mean(c**2)
    elif loss_type == "L1":
        sdf_loss = jnp.mean(jnp.abs(c))
    else:
        raise ValueError(f"Invalid loss type: {loss_type}")
    out = {"sdf": sdf_loss * sdf_weight}
    if sign_weight > 0:
        out["free_space"] = common.free_space_loss(pred, gt_sdf, sign, trunc_dist) * sign_weight
    key_eik, key_smooth = jax.random.split(key)
    if eik_weight > 0:
        out["eik"] = common.eikonal_loss_uniform(
            model, model.bound, gt_sdf.shape[0], key_eik,
            grad_method, finite_diff_eps) * eik_weight
    if smooth_weight > 0:
        out["smooth"] = common.smoothness_loss(
            model, coords_world, valid, key_smooth, smooth_std,
            grad_method, finite_diff_eps) * smooth_weight
    if with_stability:
        out.update(common.feature_stability_loss(model, coords_world, valid))
    return out


_MAKE_LOSS_CACHE = {}


def make_loss(fn, **fixed_kwargs):
    """Bind loss hyperparameters; returns (model, batch, key) -> dict.

    Cached by (fn, kwargs) so repeated construction with identical
    hyperparameters returns the SAME function object -- the train-step /
    train-scan caches key on loss-fn identity, so this makes compiled
    executables reusable across Trainer/Fuser instances.
    """
    try:
        cache_key = (fn, tuple(sorted(fixed_kwargs.items())))
        if cache_key in _MAKE_LOSS_CACHE:
            return _MAKE_LOSS_CACHE[cache_key]
    except TypeError:           # unhashable kwarg value
        cache_key = None

    def bound_loss(model, batch, key, **overrides):
        kw = dict(fixed_kwargs)
        kw.update(overrides)
        return fn(model, batch, key, **kw)
    bound_loss.__name__ = fn.__name__
    if cache_key is not None:
        _MAKE_LOSS_CACHE[cache_key] = bound_loss
    return bound_loss
