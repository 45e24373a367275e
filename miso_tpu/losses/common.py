"""Shared loss helpers (reference `grid_opt/loss.py:148-184,589-700`).

All losses are pure functions ``(model, batch, key) -> dict[str, scalar]``
over fixed-shape batches; validity is expressed by multiplicative masks
(never boolean indexing) so everything jits with static shapes.

Mean semantics match the reference exactly: ``torch.mean`` over the full
batch including masked-out (zeroed) entries, unless noted.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from miso_tpu.ops.diff import gradient3d


def masked_mean(values, mask=None):
    """Mean with explicit valid-count denominator (for subset means)."""
    if mask is None:
        return jnp.mean(values)
    s = jnp.sum(values * mask)
    return s / jnp.maximum(jnp.sum(mask) * (values.size / mask.size), 1.0)


def regression_loss(pred, targ, valid_mask=None, sample_weights=None,
                    loss_type="L1"):
    """miso_loss_regression (reference loss.py:594-635)."""
    assert pred.shape == targ.shape
    n = pred.shape[0]
    if valid_mask is None:
        valid_mask = jnp.ones((n, 1), pred.dtype)
    if sample_weights is None:
        sample_weights = jnp.ones((n, 1), pred.dtype)
    if loss_type == "L2":
        vec = jnp.sum((pred - targ) ** 2, axis=1, keepdims=True)
    elif loss_type == "L1":
        vec = jnp.sum(jnp.abs(pred - targ), axis=1, keepdims=True)
    elif loss_type == "Cosine":
        num = jnp.sum(pred * targ, axis=1, keepdims=True)
        den = (jnp.linalg.norm(pred, axis=1, keepdims=True)
               * jnp.linalg.norm(targ, axis=1, keepdims=True))
        vec = 1.0 - num / jnp.maximum(den, 1e-8)
    else:
        raise ValueError(f"Invalid loss type: {loss_type}")
    vec = jnp.where(valid_mask == 1, vec, 0.0)
    return jnp.mean(sample_weights * vec)


def gm_weighted_sq(residual, gm_scale):
    """Geman-McClure IRLS: w = c / (c + e^2)^2 with detached e
    (reference loss.py:570-573, tracker.py:139-146)."""
    e = jax.lax.stop_gradient(residual)
    w = gm_scale / (gm_scale + e**2) ** 2
    return w * residual**2


def sdf_residual_loss(pred_sdf, gt_sdf, valid_mask, loss_type="L2", gm_scale=1.0):
    """Masked SDF residual under L2 / L1 / GM (loss.py:560-585)."""
    c = jnp.where(valid_mask == 1, pred_sdf - gt_sdf, 0.0)
    if loss_type == "L2":
        return jnp.mean(c**2)
    if loss_type == "L1":
        return jnp.mean(jnp.abs(c))
    if loss_type == "GM":
        return jnp.mean(gm_weighted_sq(c, gm_scale))
    raise ValueError(f"Invalid loss type: {loss_type}")


def free_space_loss(pred_sdf, gt_sdf, gt_sdf_sign, trunc_dist):
    """iSDF-eq-6-style bound loss (reference loss.py:668-700):
    max(relu(pred - upper_bound), relu(trunc - pred)) in declared free
    space, mean over the full batch."""
    is_free = (gt_sdf_sign == 1)
    upper = jnp.where(is_free, jax.nn.relu(pred_sdf - gt_sdf), 0.0)
    lower = jnp.where(is_free, jax.nn.relu(trunc_dist - pred_sdf), 0.0)
    return jnp.mean(jnp.maximum(upper, lower))


def eikonal_loss_at(model_fn, coords, select_mask=None,
                    grad_method="autograd", finite_diff_eps=1e-2):
    """||grad|| -> 1 penalty (reference loss.py:638-665).

    select_mask: optional (N, 1); the reference gathers the subset and
    means over it, so we use a masked mean with the subset count.
    """
    g = gradient3d(coords, model_fn, method=grad_method,
                   finite_diff_eps=finite_diff_eps)
    c = (jnp.linalg.norm(g, axis=-1, keepdims=True) - 1.0) ** 2
    if select_mask is None:
        return jnp.mean(c)
    return jnp.sum(c * select_mask) / jnp.maximum(jnp.sum(select_mask), 1.0)


def eikonal_loss_uniform(model_fn, bound, n, key, grad_method="autograd",
                         finite_diff_eps=1e-2):
    """Eikonal at uniform random points in the bound (loss.py:130-145)."""
    u = jax.random.uniform(key, (n, 3))
    coords = bound[:, 0] + u * (bound[:, 1] - bound[:, 0])
    return eikonal_loss_at(model_fn, coords, None, grad_method, finite_diff_eps)


def smoothness_loss(model_fn, coords, valid_mask, key, smooth_std=0.1,
                    grad_method="autograd", finite_diff_eps=1e-2):
    """GO-SURF eq (10) gradient smoothness (reference loss.py:271-287)."""
    noise = jax.random.normal(key, coords.shape) * smooth_std
    g1 = gradient3d(coords, model_fn, method=grad_method, finite_diff_eps=finite_diff_eps)
    g2 = gradient3d(coords + noise, model_fn, method=grad_method,
                    finite_diff_eps=finite_diff_eps)
    c = jnp.where(valid_mask == 1, g1 - g2, 0.0)
    return jnp.mean(c**2)


def feature_stability_loss(model, coords, mask_valid=None):
    """Drive interpolated stability mu -> 1 at observed points + L2 reg
    on mu grids (reference loss.py:170-184)."""
    if mask_valid is None:
        mask_valid = jnp.ones((coords.shape[0], 1), coords.dtype)
    mu = model.query_stability(coords)
    c = jnp.where(mask_valid == 1, mu - 1.0, 0.0)
    out = {"stability": jnp.mean(c**2)}
    for level in range(model.num_levels):
        out[f"stability_reg_level{level}"] = 1e-2 * jnp.mean(model.stability[level] ** 2)
    return out


def pose_regularization_loss(rot_corr, trans_corr, weight=1.0):
    """L2 on pose corrections (reference loss.py:154-159)."""
    return {
        "pose_l2_reg_R": weight * jnp.mean(rot_corr**2),
        "pose_l2_reg_t": weight * jnp.mean(trans_corr**2),
    }


def pose_trust_region_loss(rot_corr, trans_corr, thresh_rad, thresh_m, weight=1e3):
    """Trust-region hinge on pose-correction norms (loss.py:161-168)."""
    rot_norm = jnp.linalg.norm(rot_corr, axis=-1)
    tr_norm = jnp.linalg.norm(trans_corr, axis=-1)
    return {
        "trust_region_R": weight * jnp.sum(jax.nn.relu(rot_norm - thresh_rad)),
        "trust_region_t": weight * jnp.sum(jax.nn.relu(tr_norm - thresh_m)),
    }


def info_nce_loss(query, positive, mask=None, temperature=0.1):
    """InfoNCE between per-point feature pairs (reference utils.InfoNCE,
    used by pairwise_loss_latent's 'InfoNCE' option, miso.py:207-208):
    each query's positive is its own pair; all other rows are negatives.
    Masked rows are excluded from both anchors and negatives."""
    q = query / (jnp.linalg.norm(query, axis=1, keepdims=True) + 1e-8)
    p = positive / (jnp.linalg.norm(positive, axis=1, keepdims=True) + 1e-8)
    logits = q @ p.T / temperature                      # (N, N)
    if mask is not None:
        col_ok = (mask.reshape(1, -1) > 0)
        logits = jnp.where(col_ok, logits, -1e9)
    labels = jnp.arange(q.shape[0])
    logp = jax.nn.log_softmax(logits, axis=1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)
    if mask is None:
        return jnp.mean(nll)
    m = mask.reshape(-1, 1)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def total_loss(loss_dict):
    """Sum of loss-dict means (reference trainer.py:208-212)."""
    return sum(jnp.mean(v) for v in loss_dict.values())
