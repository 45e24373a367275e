"""Plain SDF supervision losses (reference `grid_opt/loss.py:33-146`)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from miso_tpu.losses.common import eikonal_loss_uniform


def sdf_loss_2d(model, batch, key, sdf_weight=3e3):
    """SdfLoss2D (loss.py:33-46): plain MSE."""
    pred = model(batch["coords"])
    return {"sdf": jnp.mean((pred - batch["sdf"]) ** 2) * sdf_weight}


def sdf_loss_3d(model, batch, key, sdf_weight=3e3):
    """SdfLoss3D (loss.py:49-70): masked MSE."""
    pred = model(batch["coords"])
    c = jnp.where(batch["sdf_valid"] == 1, pred - batch["sdf"], 0.0)
    return {"sdf": jnp.mean(c**2) * sdf_weight}


def tsdf_loss_3d(model, batch, key, sdf_weight=3e3, sign_weight=1e2,
                 eik_weight=5e1, trunc_dist=0.15, grad_method="autograd",
                 finite_diff_eps=1e-2):
    """TsdfLoss3D (loss.py:73-146): masked MSE + truncation sign hinges
    + eikonal at uniform random points."""
    coords = batch["coords"]
    gt_sdf = batch["sdf"]
    valid = batch["sdf_valid"]
    sign = batch["sdf_sign"] if "sdf_sign" in batch else batch["sdf_signs"]
    pred = model(coords)
    c = jnp.where(valid == 1, pred - gt_sdf, 0.0)
    out = {"sdf": jnp.mean(c**2) * sdf_weight}
    if sign_weight > 0:
        pos = jnp.where(sign == 1, trunc_dist - pred, 0.0)
        out["pos_space"] = jnp.mean(jax.nn.relu(pos)) * sign_weight
        neg = jnp.where(sign == -1, pred + trunc_dist, 0.0)
        out["neg_space"] = jnp.mean(jax.nn.relu(neg)) * sign_weight
    if eik_weight > 0:
        out["eik"] = eikonal_loss_uniform(
            model, model.bound, gt_sdf.shape[0], key,
            grad_method, finite_diff_eps) * eik_weight
    return out
