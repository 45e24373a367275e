"""Exact training resume: interrupt-at-epoch-k + resume == uninterrupted.

The reference checkpoints optimizer state and resumes from it
(trainer.py:92-95,319-332); here the full train state round-trips
(model, Adam moments, JAX key, numpy sampler, level/convergence state)
and the deterministic per-epoch step chain makes resume BIT-exact.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miso_tpu.losses.miso import make_loss
from miso_tpu.losses.sdf import sdf_loss_3d
from miso_tpu.models.grid_net import create_grid_net
from miso_tpu.train.trainer import GridTrainer, Trainer

CFG_MODEL = {
    "spatial_dim": 3,
    "grid": {"type": "regular", "feature_dim": 2, "init_stddev": 1e-3,
             "bound": [[-1, 1], [-1, 1], [-1, 1]],
             "base_cell_size": 0.5, "per_level_scale": 2.0, "n_levels": 2},
    "decoder": {"type": "mlp", "hidden_dim": 16, "hidden_layers": 1,
                "out_dim": 1, "pos_invariant": True, "fix": False,
                "pretrained_model": None},
    "pose": {"optimize": False, "num_poses": 1},
}


class SphereSdf:
    def sample(self, rng):
        x = rng.uniform(-0.9, 0.9, (256, 3)).astype(np.float32)
        sdf = (np.linalg.norm(x, axis=1, keepdims=True) - 0.5).astype(np.float32)
        return {"coords": x, "sdf": sdf, "sdf_valid": np.ones_like(sdf),
                "sdf_signs": np.zeros_like(sdf)}


LOSS = make_loss(sdf_loss_3d, sdf_weight=1.0)


def _model():
    return create_grid_net(jax.random.PRNGKey(7), CFG_MODEL)


def _assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_grid_trainer_resume_bit_exact(tmp_path):
    cfg = {"optimizer": "adam", "learning_rate": 1e-2, "epochs": 24,
           "max_epochs_in_level": 7, "relchange_tol": 1e-4,
           "grid_training_mode": "coordinate+joint"}
    # Uninterrupted run.
    full = GridTrainer(dict(cfg), _model(), LOSS, SphereSdf(), seed=3)
    model_full = full.train()

    # Interrupted at epoch 10 (mid level-switch schedule) ...
    part = GridTrainer(dict(cfg, epochs=10), _model(), LOSS, SphereSdf(),
                       seed=3)
    part.train()
    path = os.path.join(tmp_path, "ckpt.npz")
    part.save_checkpoint(path, epoch=10)

    # ... resumed in a FRESH process-state trainer.
    res = GridTrainer(dict(cfg), _model(), LOSS, SphereSdf(), seed=999)
    assert res.load_checkpoint(path) == 10
    model_res = res.train()

    _assert_trees_equal(model_res, model_full)
    # Level bookkeeping advanced identically.
    assert res.active_level == full.active_level
    assert res.epochs_in_level == full.epochs_in_level


def test_trainer_resume_scanned_chunk_boundary(tmp_path):
    """Resume at a scan-chunk boundary reproduces the scanned run
    bit-exactly (chunk sizes depend only on epoch/epochs)."""
    cfg = {"optimizer": "adam", "learning_rate": 1e-2, "epochs": 24,
           "scan_steps": 8}
    full = Trainer(dict(cfg), _model(), LOSS, SphereSdf(), seed=5)
    model_full = full.train()

    part = Trainer(dict(cfg, epochs=8), _model(), LOSS, SphereSdf(), seed=5)
    part.train()
    path = os.path.join(tmp_path, "ckpt.npz")
    part.save_checkpoint(path, epoch=8)

    res = Trainer(dict(cfg), _model(), LOSS, SphereSdf(), seed=123)
    res.load_checkpoint(path)
    model_res = res.train()
    _assert_trees_equal(model_res, model_full)


def test_save_model_includes_optimizer_state(tmp_path):
    """save_model persists optimizer state (reference
    trainer.py:319-332), not just the model pytree."""
    cfg = {"optimizer": "adam", "learning_rate": 1e-2, "epochs": 3,
           "log_dir": str(tmp_path)}
    tr = Trainer(dict(cfg), _model(), LOSS, SphereSdf(), seed=0)
    tr.train()
    tr.save_model(3, "final")
    data = np.load(os.path.join(tmp_path, "ckpt", "final.npz"),
                   allow_pickle=False)
    keys = list(data.keys())
    assert any(k.startswith("arr::['opt_state']") for k in keys), keys[:5]
    assert any(k.startswith("arr::['model']") for k in keys)
