"""End-to-end slice: synthetic mesh -> Sdf3D samples -> GridNet training
-> marching-cubes mesh -> Chamfer/F-score vs the GT mesh.

This mirrors the reference's metric-based integration checks
(SURVEY.md section 4: mesh -> samples -> train -> F-score threshold).
Small shapes to keep CPU CI fast.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miso_tpu.datasets.sdf_3d import Sdf3D
from miso_tpu.datasets.shapes import icosphere
from miso_tpu.losses.miso import make_loss
from miso_tpu.losses.sdf import tsdf_loss_3d
from miso_tpu.models.grid_net import create_grid_net, grid_net_mask
from miso_tpu.native import TriangleMesh
from miso_tpu.train.trainer import GridTrainer, Trainer
from miso_tpu.utils.eval import mesh_reconstruction_metrics
from miso_tpu.utils.sdf import save_mesh


MODEL_CFG = {
    "spatial_dim": 3,
    "grid": {
        "type": "regular",
        "feature_dim": 4,
        "init_stddev": 1e-4,
        "bound": [[-1.2, 1.2], [-1.2, 1.2], [-1.2, 1.2]],
        "base_cell_size": 0.4,
        "per_level_scale": 2.0,
        "n_levels": 2,
    },
    "decoder": {
        "type": "mlp",
        "hidden_dim": 32,
        "hidden_layers": 1,
        "out_dim": 1,
        "pos_invariant": True,
        "fix": False,
        "pretrained_model": None,
    },
    "pose": {"optimize": False, "num_poses": 1},
}

TRAIN_CFG = {
    "verbose": False,
    "optimizer": "adam",
    "learning_rate": 5e-3,
    "epochs": 150,
    "eval_every": -1,
    "ckpt_every": -1,
    "relchange_tol": 0.0,
    "max_epochs_in_level": 40,
    "grid_training_mode": "coordinate+joint",
}


@pytest.fixture(scope="module")
def sphere():
    verts, tris = icosphere(3, 0.7)
    return TriangleMesh(verts, tris)


@pytest.mark.slow
def test_gridnet_trains_sphere(sphere):
    dataset = Sdf3D(sphere, batch_size=2**13, total_samples=2**16,
                    surface_stddev=0.05, bound_buffer=0.5, trunc_dist=0.3)
    model = create_grid_net(jax.random.PRNGKey(0), MODEL_CFG)
    loss_fn = make_loss(tsdf_loss_3d, sdf_weight=3e3, sign_weight=1e2,
                        eik_weight=5e1, trunc_dist=0.3)
    trainer = GridTrainer(TRAIN_CFG, model, loss_fn, dataset)
    model = trainer.train()

    # SDF accuracy at random near-surface points.
    rng = np.random.default_rng(1)
    pts = rng.uniform(-0.9, 0.9, size=(2000, 3)).astype(np.float32)
    gt = np.linalg.norm(pts, axis=1) - 0.7
    keep = np.abs(gt) < 0.25
    pred = np.asarray(model(jnp.asarray(pts))).ravel()
    err = np.abs(pred[keep] - gt[keep])
    assert err.mean() < 0.03, f"mean SDF err {err.mean():.4f}"

    # Mesh extraction + chamfer F-score.
    mesh = save_mesh(model, model.bound, save_path=None, resolution=96)
    assert len(mesh.vertices) > 100
    metrics = mesh_reconstruction_metrics(mesh, sphere, n_points=20000,
                                          threshold=0.05, truncation=0.5)
    assert metrics["F-score (%)"] > 90, metrics
    assert metrics["Chamfer_L1 (cm)"] < 5, metrics


def test_trainer_masks_freeze_params(sphere):
    """Mask=0 leaves params bit-identical (the lock/unlock contract)."""
    dataset = Sdf3D(sphere, batch_size=2**10, total_samples=2**13, trunc_dist=0.3)
    model = create_grid_net(jax.random.PRNGKey(0), MODEL_CFG)
    loss_fn = make_loss(tsdf_loss_3d, eik_weight=0.0, trunc_dist=0.3)
    # Freeze level 1 + decoder; train only level 0.
    mask = grid_net_mask(model, level=0, decoder=False)
    cfg = dict(TRAIN_CFG, epochs=5)
    trainer = Trainer(cfg, model, loss_fn, dataset, mask=mask)
    before_l1 = np.asarray(model.features[1]).copy()
    before_dec = np.asarray(model.decoder[0][0]).copy()
    before_l0 = np.asarray(model.features[0]).copy()
    out = trainer.train()
    np.testing.assert_array_equal(np.asarray(out.features[1]), before_l1)
    np.testing.assert_array_equal(np.asarray(out.decoder[0][0]), before_dec)
    assert np.abs(np.asarray(out.features[0]) - before_l0).max() > 0


@pytest.mark.slow
def test_bf16_features():
    """bfloat16 feature storage (grid.feature_dtype) trains to the same
    quality as float32 -- the TPU bench relies on this equivalence."""
    import jax.numpy as jnp

    from miso_tpu.datasets.sdf_3d import Sdf3D
    from miso_tpu.datasets.shapes import icosphere
    from miso_tpu.losses.miso import make_loss
    from miso_tpu.losses.sdf import tsdf_loss_3d
    from miso_tpu.models.grid_net import create_grid_net
    from miso_tpu.native import TriangleMesh
    from miso_tpu.train.trainer import GridTrainer

    mesh = TriangleMesh(*icosphere(3, 0.6))
    ds = Sdf3D(mesh, batch_size=2**12, total_samples=2**15,
               surface_stddev=0.05, bound_buffer=0.4, trunc_dist=0.2)
    cfg = {
        "spatial_dim": 3,
        "grid": {"type": "regular", "feature_dim": 4, "init_stddev": 1e-4,
                 "feature_dtype": "bfloat16", "bound": ds.bound.tolist(),
                 "base_cell_size": 0.5, "per_level_scale": 2.0, "n_levels": 2},
        "decoder": {"type": "mlp", "hidden_dim": 32, "hidden_layers": 1,
                    "out_dim": 1, "pos_invariant": True, "fix": False,
                    "pretrained_model": None},
        "pose": {"optimize": False, "num_poses": 1},
    }
    model = create_grid_net(jax.random.PRNGKey(0), cfg)
    assert model.features[0].dtype == jnp.bfloat16
    loss_fn = make_loss(tsdf_loss_3d, sdf_weight=3e3, sign_weight=1e2,
                        eik_weight=0.0, trunc_dist=0.2)
    tr = GridTrainer({"optimizer": "adam", "learning_rate": 5e-3,
                      "epochs": 150, "max_epochs_in_level": 50,
                      "grid_training_mode": "coordinate+joint"},
                     model, loss_fn, ds)
    model = tr.train()
    b = ds.sample(np.random.default_rng(3))
    pred = np.asarray(model(jnp.asarray(b["coords"])).astype(jnp.float32)).reshape(-1)
    gt = np.asarray(b["sdf"]).reshape(-1)
    valid = np.asarray(b["sdf_valid"]).reshape(-1) > 0
    mae = np.abs(pred - gt)[valid].mean()
    assert mae < 0.03, mae
