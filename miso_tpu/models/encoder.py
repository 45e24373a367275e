"""Hierarchical encoder: learned initialization of grid features.

Re-design of `grid_opt/models/encoder.py` + the conv modules in
`grid_opt/models/modules.py` (ConvInterp, FeaturePrediction).

Flow (encoder.py:134-164 ``predict_corrections_until_level``):
for each level coarse->fine,
  1. compute SDF + free-space residuals at the observed points under
     the corrections predicted so far (encoder.py:176-247),
  2. scatter-average them into a (gx, gy, gz, 3) residual volume at the
     level's resolution (grid_pool_3d_avg, encoder.py:249-281),
  3. run the level's FeaturePrediction (conv stack -> resize -> per-cell
     MLP) to predict that level's feature-grid correction
     (modules.py:235-319).

Everything is channel-last (NDHWC convs) and jit-compatible; the
second-order differentiability the reference needed its CUDA extension
for (encoder.py:166-174 query_sdf) is native here.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from miso_tpu.models.grid_net import GridNet
from miso_tpu.ops import interp
from miso_tpu.ops.mlp import mlp_apply, mlp_init
from miso_tpu.ops.pooling import grid_pool_avg


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EncoderObservation:
    """Raw SDF observations for encoding (encoder.py:15-22)."""
    coords_world: jnp.ndarray   # (N, 3)
    gt_sdf: jnp.ndarray         # (N, 1)
    gt_sdf_sign: jnp.ndarray    # (N, 1)
    gt_sdf_valid: jnp.ndarray   # (N, 1)


# ---------------------------------------------------------------------------
# ConvInterp + FeaturePrediction (modules.py:107-181, 235-319)
# ---------------------------------------------------------------------------

def conv_interp_init(key, in_channels, base_channels=4, hidden_layers=2,
                     kernel_size=3, dtype=jnp.float32):
    params = []
    for i in range(hidden_layers):
        in_ch = in_channels if i == 0 else base_channels * (2 ** (i - 1))
        out_ch = base_channels * (2**i)
        key, k1, k2 = jax.random.split(key, 3)
        fan_in = in_ch * kernel_size**3
        lim = 1.0 / math.sqrt(fan_in)
        W = jax.random.uniform(k1, (kernel_size,) * 3 + (in_ch, out_ch),
                               dtype, -lim, lim)
        b = jax.random.uniform(k2, (out_ch,), dtype, -lim, lim)
        params.append((W, b))
    return tuple(params)


def conv_interp_apply(params, x, output_spatial_size):
    """Conv3d+ReLU stack, then resize to the target spatial size
    (modules.py:148-181).  x: (1, gx, gy, gz, C) channel-last."""
    for W, b in params:
        x = jax.lax.conv_general_dilated(
            x, W, window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            precision=jax.lax.Precision.HIGHEST) + b
        x = jax.nn.relu(x)
    target = (1, *output_spatial_size, x.shape[-1])
    # Up: trilinear (align_corners=False half-pixel); down: antialiased
    # linear (the area-mode stand-in, modules.py:164-173).
    return jax.image.resize(x, target, method="linear",
                            antialias=not all(
                                o >= i for o, i in zip(output_spatial_size,
                                                       x.shape[1:4])))


def feature_prediction_init(key, fdim, rdim=3, base_channels=4,
                            hidden_layers=2, mlp_hidden=16, mlp_layers=2,
                            dtype=jnp.float32):
    """FeaturePrediction with residual processor only (encoder.py:52-63
    constructs feature_processor=False, residual_processor=True)."""
    key, k1, k2 = jax.random.split(key, 3)
    conv = conv_interp_init(k1, rdim, base_channels, hidden_layers, dtype=dtype)
    out_ch = base_channels * (2 ** (hidden_layers - 1))
    mlp = mlp_init(k2, out_ch, fdim, mlp_hidden, mlp_layers, bias=True, dtype=dtype)
    return {"conv": conv, "mlp": mlp}


def feature_prediction_apply(params, residual_vol, output_spatial_size):
    """(1, gx, gy, gz, rdim) residual volume -> (gx, gy, gz, fdim)
    predicted features at the target resolution (modules.py:291-319)."""
    x = conv_interp_apply(params["conv"], residual_vol, output_spatial_size)
    C = x.shape[-1]
    flat = x.reshape(-1, C)
    emb = mlp_apply(params["mlp"], flat)
    return emb.reshape(*output_spatial_size, -1)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def query_sdf_with_corrections(grid: GridNet, corrections, x):
    """SDF of (features + corrections) at x (encoder.py:166-174).

    Differentiable wrt the corrections to any order -- the role of the
    reference's second_order_grid_sample path.
    """
    updated = tuple(f + c for f, c in zip(grid.features, corrections))
    feats = interp.multi_level_interpolate(updated, x, grid.bound, None)
    decoder = grid.decoder
    if decoder is not None:
        decoder = jax.lax.stop_gradient(decoder)  # pretrained, frozen
    return interp.grid_decode(feats, x, decoder, grid.pos_invariant)


def compute_residuals(grid: GridNet, corrections, obs: EncoderObservation,
                      trunc_dist=0.15):
    """SDF residual + free-space upper/lower constraints at observed
    points (encoder.py:176-247, skip_eik/skip_smooth defaults)."""
    pred = query_sdf_with_corrections(grid, corrections, obs.coords_world)
    sdf_res = jnp.where(obs.gt_sdf_valid == 1, obs.gt_sdf - pred, 0.0)
    is_free = obs.gt_sdf_sign == 1
    fs_upper = jnp.where(is_free, jax.nn.relu(pred - obs.gt_sdf), 0.0)
    fs_lower = jnp.where(is_free, jax.nn.relu(trunc_dist - pred), 0.0)
    return {
        "sdf_constraint": sdf_res,
        "fs_upper_constraint": fs_upper,
        "fs_lower_constraint": fs_lower,
        "fs_constraint": jnp.maximum(fs_upper, fs_lower),
        "sdf_coords": obs.coords_world,
    }


def encoder_inputs_from_residuals(residuals, grid: GridNet, level: int):
    """Pool [sdf_res, fs_upper, fs_lower] into the level's grid volume
    (encoder.py:249-281).  Returns (1, gx, gy, gz, 3)."""
    feats = jnp.concatenate([
        residuals["sdf_constraint"],
        residuals["fs_upper_constraint"],
        residuals["fs_lower_constraint"],
    ], axis=1)
    vol = grid_pool_avg(residuals["sdf_coords"], feats, grid.bound,
                        grid.cell_sizes[level],
                        spatial=grid.level_shape(level))
    return vol[None]


def predict_corrections_until_level(enc_params: Sequence, grid: GridNet,
                                    obs: EncoderObservation, stop_level: int,
                                    trunc_dist=0.15, pred_std=0.0,
                                    key=None):
    """The hierarchical amortized-optimization loop (encoder.py:134-164).

    enc_params: per-level FeaturePrediction params.  Returns the list of
    per-level correction grids (zeros above stop_level).
    """
    corrections = [jnp.zeros_like(f) for f in grid.features]
    for level in range(stop_level):
        residuals = compute_residuals(grid, corrections, obs, trunc_dist)
        vol = encoder_inputs_from_residuals(residuals, grid, level)
        pred = feature_prediction_apply(enc_params[level], vol,
                                        grid.level_shape(level))
        if pred_std > 0 and key is not None:
            key, sub = jax.random.split(key)
            pred = pred + jax.random.normal(sub, pred.shape, pred.dtype) * pred_std
        corrections[level] = pred
    return corrections


# Jitted entry for host-side one-shot initialization: eager per-op
# dispatch costs ~20 ms/op through remote-device transports, turning the
# millisecond-scale conv prediction into a minute-scale one.
_jit_predict_corrections = jax.jit(
    predict_corrections_until_level,
    static_argnames=("stop_level", "trunc_dist", "pred_std"))


class Encoder:
    """Host wrapper: per-level pretrained FeaturePrediction params +
    registered grids (encoder.py:24-109 API)."""

    def __init__(self, cfg: Dict, pretrained_dir: Optional[str] = None,
                 key=None, trunc_dist: float = 0.15):
        import os

        m = cfg["model"]["grid"]
        self.num_levels = int(m["n_levels"])
        self.fdim = int(m["feature_dim"])
        self.rdim = 3
        self.trunc_dist = trunc_dist
        key = key if key is not None else jax.random.PRNGKey(0)
        self.level_params: List = []
        for level in range(self.num_levels):
            key, sub = jax.random.split(key)
            params = feature_prediction_init(sub, self.fdim, self.rdim)
            if pretrained_dir is not None:
                from miso_tpu.train.checkpoint import load_pytree
                path = os.path.join(pretrained_dir,
                                    f"feature_encoder_level_{level}.npz")
                params = load_pytree(path, like=params)
            self.level_params.append(params)
        self.grids: List[GridNet] = []

    def register_grid_model(self, grid: GridNet) -> int:
        self.grids.append(grid)
        return len(self.grids) - 1

    def predict_corrections(self, model_id: int, obs: EncoderObservation,
                            stop_level: Optional[int] = None, pred_std=0.0,
                            key=None):
        grid = self.grids[model_id]
        stop = stop_level if stop_level is not None else grid.num_levels
        return _jit_predict_corrections(self.level_params, grid, obs,
                                        stop_level=stop,
                                        trunc_dist=self.trunc_dist,
                                        pred_std=pred_std, key=key)

    def save(self, out_dir: str):
        import os

        from miso_tpu.train.checkpoint import save_pytree

        os.makedirs(out_dir, exist_ok=True)
        for level, params in enumerate(self.level_params):
            save_pytree(os.path.join(out_dir, f"feature_encoder_level_{level}.npz"),
                        params)


def encoder_pretrain_loss(enc_params, grid: GridNet, batch, key,
                          target_level: int, trunc_dist=0.15,
                          sdf_weight=3e3, sign_weight=0.0, pred_std=0.1):
    """EncoderPretrainLoss (encoder.py:333-401): predict corrections up
    to target_level (inclusive) and penalize the remaining residuals.

    Differentiates wrt enc_params THROUGH the residual computation of
    earlier levels -- exactly the double-backward composition the
    reference forced 2nd-order grid_sample for.
    """
    from miso_tpu.ops import se3

    ids = batch["sample_frame_ids"].reshape(-1).astype(jnp.int32)
    R, t = grid.updated_kf_poses()
    coords_world = se3.transform_points_by_id(batch["coords_frame"], ids, R, t)
    obs = EncoderObservation(
        coords_world=coords_world,
        gt_sdf=batch["sdf"],
        gt_sdf_sign=batch["sdf_signs"],
        gt_sdf_valid=batch["sdf_valid"],
    )
    corrections = predict_corrections_until_level(
        enc_params, grid, obs, target_level + 1, trunc_dist, pred_std, key)
    residuals = compute_residuals(grid, corrections, obs, trunc_dist)
    out = {"sdf": jnp.mean(residuals["sdf_constraint"] ** 2) * sdf_weight}
    if sign_weight > 0:
        out["free_space"] = jnp.mean(residuals["fs_constraint"]) * sign_weight
    return out
