"""Scanned multi-step training bursts (cfg scan_steps).

One jitted lax.scan per burst must train equivalently to the per-epoch
loop (same per-step math; RNG draws differ) and must respect
GridTrainer's deterministic level-switch boundaries exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miso_tpu.losses.miso import make_loss
from miso_tpu.losses.sdf import sdf_loss_3d
from miso_tpu.models.grid_net import create_grid_net
from miso_tpu.train.trainer import GridTrainer, Trainer

pytestmark = pytest.mark.fast

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
    def __init__(self, n=1024, seed=0):
        self.n = n

    def sample(self, rng):
        x = rng.uniform(-0.9, 0.9, (self.n, 3)).astype(np.float32)
        sdf = (np.linalg.norm(x, axis=1, keepdims=True) - 0.5).astype(np.float32)
        return {"coords": x, "sdf": sdf, "sdf_valid": np.ones_like(sdf)}


def _final_mae(model):
    rng = np.random.default_rng(9)
    x = rng.uniform(-0.8, 0.8, (4096, 3)).astype(np.float32)
    gt = np.linalg.norm(x, axis=1, keepdims=True) - 0.5
    pred = np.asarray(model(jnp.asarray(x)))
    return float(np.abs(pred - gt).mean())


def test_scanned_trainer_matches_loop_quality():
    loss_fn = make_loss(sdf_loss_3d, sdf_weight=1.0)
    maes = {}
    for scan in (1, 64):
        model = create_grid_net(jax.random.PRNGKey(0), CFG_MODEL)
        tr = Trainer({"optimizer": "adam", "learning_rate": 1e-2,
                      "epochs": 120, "scan_steps": scan},
                     model, loss_fn, SphereSdf(), seed=0)
        maes[scan] = _final_mae(tr.train())
    assert maes[64] < 0.05, maes
    assert abs(maes[64] - maes[1]) < 0.02, maes


def test_scanned_gridtrainer_respects_level_boundaries():
    loss_fn = make_loss(sdf_loss_3d, sdf_weight=1.0)
    marks = {}
    for scan in (1, 256):
        model = create_grid_net(jax.random.PRNGKey(0), CFG_MODEL)
        tr = GridTrainer({"optimizer": "adam", "learning_rate": 1e-2,
                          "epochs": 30, "max_epochs_in_level": 10,
                          "grid_training_mode": "coordinate+joint",
                          "scan_steps": scan},
                         model, loss_fn, SphereSdf(), seed=0)
        m = tr.train()
        marks[scan] = {k: v for k, v in tr.train_dict.items()
                       if k.startswith("level")}
        assert _final_mae(m) < 0.2, scan
    # Level switch epochs identical between looped and scanned runs.
    assert marks[1] == marks[256], marks
    assert marks[1]["level0_last_epoch"] == 10
    assert marks[1]["level1_last_epoch"] == 20


def test_make_loss_caches_by_identity():
    """Same (fn, kwargs) -> same function object, so step/scan caches
    reuse compiled executables across Trainer/Fuser instances."""
    from miso_tpu.losses.miso import make_loss, mapping_loss

    a = make_loss(mapping_loss, loss_type="L1", weight_sdf=1.0)
    b = make_loss(mapping_loss, loss_type="L1", weight_sdf=1.0)
    c = make_loss(mapping_loss, loss_type="L2", weight_sdf=1.0)
    assert a is b
    assert a is not c
