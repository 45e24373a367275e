"""Encoder (learned initialization) tests.

End-to-end check of the amortized-optimization path: pretrain a level-0
FeaturePrediction on a scene with a frozen decoder, then verify the
encoder-predicted initialization fits the observations better than the
zero initialization (the reference validates this with synthetic worlds,
SURVEY.md section 4).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miso_tpu.datasets.sdf_3d import Sdf3D
from miso_tpu.datasets.shapes import icosphere
from miso_tpu.losses.miso import make_loss
from miso_tpu.losses.sdf import tsdf_loss_3d
from miso_tpu.models.encoder import (
    Encoder, EncoderObservation, compute_residuals, encoder_pretrain_loss,
    feature_prediction_apply, feature_prediction_init,
    predict_corrections_until_level)
from miso_tpu.models.grid_net import create_grid_net
from miso_tpu.native import TriangleMesh
from miso_tpu.train.optim import masked_adam_init, masked_adam_update
from miso_tpu.train.trainer import GridTrainer
from miso_tpu.models.base import tree_full_mask

MODEL_CFG = {
    "spatial_dim": 3,
    "grid": {"type": "regular", "feature_dim": 4, "init_stddev": 1e-4,
             "bound": [[-1.0, 1.0]] * 3, "base_cell_size": 0.5,
             "per_level_scale": 2.0, "n_levels": 2},
    "decoder": {"type": "mlp", "hidden_dim": 32, "hidden_layers": 1,
                "out_dim": 1, "pos_invariant": True, "fix": False,
                "pretrained_model": None},
    "pose": {"optimize": False, "num_poses": 1},
}


@pytest.fixture(scope="module")
def scene():
    verts, tris = icosphere(3, 0.6)
    mesh = TriangleMesh(verts, tris)
    ds = Sdf3D(mesh, batch_size=2**12, total_samples=2**15,
               surface_stddev=0.05, bound_buffer=0.4, trunc_dist=0.2)
    return mesh, ds


@pytest.fixture(scope="module")
def trained_grid(scene):
    _, ds = scene
    model = create_grid_net(jax.random.PRNGKey(0), MODEL_CFG)
    loss_fn = make_loss(tsdf_loss_3d, sdf_weight=3e3, sign_weight=1e2,
                        eik_weight=0.0, trunc_dist=0.2)
    tr = GridTrainer({"optimizer": "adam", "learning_rate": 5e-3,
                      "epochs": 150, "max_epochs_in_level": 50,
                      "grid_training_mode": "coordinate+joint"},
                     model, loss_fn, ds)
    return tr.train()


def _observation(ds, rng, n=4096):
    b = ds.sample(rng)
    return EncoderObservation(
        coords_world=jnp.asarray(b["coords"][:n]),
        gt_sdf=jnp.asarray(b["sdf"][:n]),
        gt_sdf_sign=jnp.asarray(b["sdf_signs"][:n]),
        gt_sdf_valid=jnp.asarray(b["sdf_valid"][:n]),
    )


def test_feature_prediction_shapes():
    params = feature_prediction_init(jax.random.PRNGKey(0), fdim=4, rdim=3)
    vol = jnp.zeros((1, 4, 4, 4, 3))
    out = feature_prediction_apply(params, vol, (4, 4, 4))
    assert out.shape == (4, 4, 4, 4)
    out2 = feature_prediction_apply(params, vol, (8, 8, 8))
    assert out2.shape == (8, 8, 8, 4)


@pytest.mark.slow
def test_encoder_pretrain_improves_init(scene, trained_grid):
    """Train the level-0 encoder to amortize optimization; its predicted
    init must beat zero-init on held-out observations."""
    _, ds = scene
    rng = np.random.default_rng(0)
    # Grid with trained (frozen) decoder but zero features.
    grid = trained_grid.zero_features().replace(decoder_fixed=True)

    enc_params = [feature_prediction_init(jax.random.PRNGKey(1), 4, 3)
                  for _ in range(2)]
    opt = masked_adam_init(enc_params)
    mask = tree_full_mask(enc_params)

    @jax.jit
    def step(enc_params, opt, batch_obs, key):
        def obj(p):
            obs = EncoderObservation(*batch_obs)
            corr = predict_corrections_until_level(p, grid, obs, 1,
                                                   trunc_dist=0.2)
            res = compute_residuals(grid, corr, obs, 0.2)
            return jnp.mean(res["sdf_constraint"] ** 2)

        loss, grads = jax.value_and_grad(obj)(enc_params)
        new_p, new_o = masked_adam_update(grads, opt, enc_params, mask, lr=3e-3)
        return new_p, new_o, loss

    losses = []
    for i in range(60):
        obs = _observation(ds, rng)
        batch_obs = (obs.coords_world, obs.gt_sdf, obs.gt_sdf_sign,
                     obs.gt_sdf_valid)
        enc_params, opt, loss = step(enc_params, opt, batch_obs,
                                     jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < 0.7 * losses[0], (losses[0], losses[-1])

    # Held-out comparison: encoder init vs zero init.
    obs = _observation(ds, np.random.default_rng(123))
    corr = predict_corrections_until_level(enc_params, grid, obs, 1,
                                           trunc_dist=0.2)
    res_enc = compute_residuals(grid, corr, obs, 0.2)
    zero_corr = [jnp.zeros_like(f) for f in grid.features]
    res_zero = compute_residuals(grid, zero_corr, obs, 0.2)
    mse_enc = float(jnp.mean(res_enc["sdf_constraint"] ** 2))
    mse_zero = float(jnp.mean(res_zero["sdf_constraint"] ** 2))
    assert mse_enc < 0.8 * mse_zero, (mse_zero, mse_enc)


def test_initialize_grid_net_modes(scene, trained_grid):
    from miso_tpu.train.local_opt import initialize_grid_net

    _, ds = scene
    g0, info = initialize_grid_net(trained_grid, "zero")
    assert float(jnp.abs(g0.features[0]).max()) == 0.0
    g1, _ = initialize_grid_net(trained_grid, "randn", key=jax.random.PRNGKey(0))
    assert float(jnp.abs(g1.features[0]).max()) > 0

    cfg = {"model": MODEL_CFG}
    enc = Encoder(cfg, pretrained_dir=None, trunc_dist=0.2)
    obs = _observation(ds, np.random.default_rng(5))
    g2, info = initialize_grid_net(trained_grid.replace(decoder_fixed=True),
                                   "encode", enc, obs)
    assert info["total_encoder_time"] > 0
    assert g2.features[0].shape == trained_grid.features[0].shape
