"""Functional local-optimization wrappers (reference `grid_opt/local_opt.py`).

initialize_grid_net: zero / randn / encoder-predicted feature init
(local_opt.py:17-54); optimize_grid_net: coarse-to-fine GridTrainer with
the iSDF loss (local_opt.py:57-97); atlas variants loop submaps
(local_opt.py:100-155).
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from miso_tpu.losses.isdf_loss import isdf_loss, isdf_loss_submap
from miso_tpu.losses.miso import make_loss
from miso_tpu.models.encoder import Encoder, EncoderObservation
from miso_tpu.models.grid_net import GridNet, grid_net_mask
from miso_tpu.train.trainer import GridTrainer


def initialize_grid_net(grid: GridNet, init_mode="encode",
                        encoder: Optional[Encoder] = None,
                        encoder_observation: Optional[EncoderObservation] = None,
                        encoder_stop_level: Optional[int] = None,
                        key=None):
    """Returns (grid, info) with info['total_encoder_time'] in seconds."""
    info = {"total_encoder_time": 0.0}
    if init_mode == "zero":
        return grid.zero_features(), info
    if init_mode == "randn":
        key = key if key is not None else jax.random.PRNGKey(0)
        return grid.randn_features(key, 1e-4), info
    assert init_mode == "encode"
    assert encoder is not None and encoder_observation is not None
    grid = grid.zero_features()
    model_id = encoder.register_grid_model(grid)
    t0 = time.perf_counter()
    corrections = encoder.predict_corrections(
        model_id, encoder_observation, stop_level=encoder_stop_level)
    jax.block_until_ready(corrections)
    info["total_encoder_time"] = time.perf_counter() - t0
    grid = grid.replace(features=tuple(
        c for c in corrections))  # copy predictions into features
    return grid, info


def optimize_grid_net(grid: GridNet, dataset, cfg: Dict, iterations=0,
                      learning_rate=1e-3, train_mode="joint",
                      iterations_per_level=50, eval_tuples=(), seed=0):
    """GridTrainer finetune with the iSDF loss (local_opt.py:57-97)."""
    c = cfg.get("loss", {})
    loss_fn = make_loss(isdf_loss,
                        trunc_dist=c.get("trunc_distance", c.get("trunc_dist", 0.15)),
                        trunc_weight=c.get("trunc_weight", 1.0),
                        eik_weight=c.get("eik_weight", 0.0),
                        eik_apply_dist=c.get("eik_apply_dist", 0.1))
    cfg_train = dict(cfg.get("train", {}))
    cfg_train.update({
        "max_epochs_in_level": iterations_per_level,
        "relchange_tol": 0.0,
        "grid_training_mode": train_mode,
        "epochs": iterations,
        "learning_rate": learning_rate,
        "eval_every": cfg_train.get("eval_every", -1),
    })
    trainer = GridTrainer(cfg_train, grid, loss_fn, dataset, seed=seed)
    for name, func in eval_tuples:
        trainer.register_eval_func(name, func)
    grid = trainer.train()
    info = {
        "trainer_epoch": trainer.train_dict["epochs"],
        "trainer_epoch_time": trainer.train_dict["epoch_time"],
        "trainer_total_loss": trainer.train_dict["total_loss"],
    }
    return grid, info


def initialize_grid_atlas(atlas, init_mode="encode",
                          encoder: Optional[Encoder] = None,
                          encoder_observations: Optional[List[EncoderObservation]] = None,
                          encoder_stop_level: Optional[int] = None, key=None):
    """Per-submap initialization (local_opt.py:100-125)."""
    info = {}
    for s in range(atlas.num_submaps):
        grid = atlas.get_submap(s)
        obs = encoder_observations[s] if init_mode == "encode" else None
        grid, sub_info = initialize_grid_net(grid, init_mode, encoder, obs,
                                             encoder_stop_level, key)
        atlas.set_submap(s, grid)
        info[f"submap{s}"] = sub_info
    return atlas, info


def optimize_grid_atlas(atlas, dataset, cfg: Dict, iterations=0,
                        learning_rate=1.3e-3, train_mode="coordinate", seed=0):
    """Joint atlas refinement with the per-submap iSDF loss
    (local_opt.py:128-155) through the masked trainer."""
    from miso_tpu.models.grid_atlas import grid_atlas_mask

    c = cfg.get("loss", {})
    loss_fn = make_loss(isdf_loss_submap,
                        trunc_dist=c.get("trunc_distance", c.get("trunc_dist", 0.15)),
                        trunc_weight=c.get("trunc_weight", 1.0),
                        pose_reg_weight=c.get("pose_reg_weight", 0.0),
                        stability_weight=c.get("stability_weight", 0.0))
    cfg_train = dict(cfg.get("train", {}))
    cfg_train.update({
        "max_epochs_in_level": 50,
        "relchange_tol": 0.0,
        "grid_training_mode": train_mode,
        "epochs": iterations,
        "learning_rate": learning_rate,
    })

    def mask_for_level(params, level):
        # Features (+ submap/kf poses) trainable; level scheduling acts
        # on the stacked grids.
        mask = grid_atlas_mask(params, features=True, stability=True,
                               submap_pose=True, kf_pose=True,
                               anchor_first_submap=True)
        if level < params.num_levels:
            feats = tuple(jnp.asarray(1.0 if l == level else 0.0, jnp.float32)
                          for l in range(params.num_levels))
            mask = mask.replace(features=feats, stability=feats)
        return mask

    trainer = GridTrainer(cfg_train, atlas.params, loss_fn, dataset,
                          mask_for_level=mask_for_level, seed=seed)
    trainer.num_levels = atlas.num_levels
    atlas.params = trainer.train()
    return atlas, {}
