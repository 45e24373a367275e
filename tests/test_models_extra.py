"""Alternative model families: iSDF, PointSDF, hash grid, VM grids."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miso_tpu.datasets.sdf_3d import Sdf3D
from miso_tpu.datasets.shapes import icosphere
from miso_tpu.models.base import tree_full_mask
from miso_tpu.models.hashgrid import create_hash_grid_net
from miso_tpu.models.isdf import create_isdf, positional_encoding, pe_embedding_size
from miso_tpu.models.pointsdf import create_pointsdf
from miso_tpu.native import TriangleMesh
from miso_tpu.losses.isdf_loss import isdf_loss_default
from miso_tpu.losses.miso import make_loss
from miso_tpu.losses.sdf import sdf_loss_3d, tsdf_loss_3d
from miso_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def sphere():
    verts, tris = icosphere(3, 0.7)
    return TriangleMesh(verts, tris)


@pytest.fixture(scope="module")
def dataset(sphere):
    return Sdf3D(sphere, batch_size=2**11, total_samples=2**14,
                 surface_stddev=0.05, bound_buffer=0.3, trunc_dist=0.3)


def _fit_and_eval(model, dataset, loss_fn, epochs=120, lr=2e-3, tol=0.08):
    cfg = {"optimizer": "adam", "learning_rate": lr, "epochs": epochs}
    tr = Trainer(cfg, model, loss_fn, dataset)
    model = tr.train()
    rng = np.random.default_rng(3)
    pts = rng.uniform(-0.85, 0.85, (1500, 3)).astype(np.float32)
    gt = np.linalg.norm(pts, axis=1) - 0.7
    keep = np.abs(gt) < 0.2
    pred = np.asarray(model(jnp.asarray(pts))).ravel()
    err = np.abs(pred[keep] - gt[keep]).mean()
    assert err < tol, f"mean |dSDF| {err:.4f}"
    return model


def test_pe_shape():
    x = jnp.zeros((5, 3))
    emb = positional_encoding(x)
    assert emb.shape == (5, pe_embedding_size())


@pytest.mark.slow
def test_isdf_trains(dataset):
    cfg = {"pose": {"num_poses": 2, "optimize": False},
           "grid": {"bound": [[-1, 1]] * 3},
           "isdf": {"hidden_size": 128, "hidden_layers_block": 1}}
    model = create_isdf(jax.random.PRNGKey(0), cfg)
    loss_fn = make_loss(tsdf_loss_3d, sdf_weight=3e3, sign_weight=1e2,
                        eik_weight=0.0, trunc_dist=0.3)
    _fit_and_eval(model, dataset, loss_fn, epochs=250, lr=1e-3, tol=0.1)


def test_isdf_loss_default_runs(dataset):
    cfg = {"pose": {"num_poses": 1, "optimize": False},
           "grid": {"bound": [[-1, 1]] * 3}}
    model = create_isdf(jax.random.PRNGKey(0), cfg)
    batch = {k: jnp.asarray(v) for k, v in dataset.sample(np.random.default_rng(0)).items()}
    d = isdf_loss_default(model, batch, jax.random.PRNGKey(0),
                          trunc_dist=0.3, eik_weight=0.1)
    assert np.isfinite(float(d["sdf"]))


@pytest.mark.slow
def test_hashgrid_trains(dataset, sphere):
    cfg = {"grid": {"bound": [[-1, 1]] * 3},
           "hash": {"n_levels": 6, "feature_dim": 2, "base_resolution": 8,
                    "per_level_scale": 1.6, "log2_hashmap_size": 15},
           "decoder": {"hidden_dim": 32, "hidden_layers": 1, "out_dim": 1,
                       "pos_invariant": True},
           "pose": {"num_poses": 1, "optimize": False}}
    model = create_hash_grid_net(jax.random.PRNGKey(0), cfg)
    loss_fn = make_loss(tsdf_loss_3d, sdf_weight=3e3, sign_weight=1e2,
                        eik_weight=0.0, trunc_dist=0.3)
    _fit_and_eval(model, dataset, loss_fn, epochs=200, lr=5e-3, tol=0.08)


@pytest.mark.slow
def test_pointsdf_forward_and_grad(sphere):
    cfg = {"point": {"total_samples": 5000, "noise_threshold": 0.05,
                     "sample_ratio_surface": 0.4, "sample_ratio_random": 0.2,
                     "feature_dim": 8, "k_neighbors": 6, "resolution": 0.15,
                     "hash_table_size": 2**16, "num_nei_cells": 1,
                     "search_alpha": 1.0, "bound": [[-1, 1]] * 3},
           "decoder": {"sinusoidal_pe": True, "hidden_dim": 32,
                       "num_layers": 3, "output_dim": 1},
           "pose": {"num_frames": 1, "optimize": False}}
    model = create_pointsdf(jax.random.PRNGKey(0), cfg, mesh=sphere)
    x = jnp.asarray(np.random.default_rng(0).uniform(-0.8, 0.8, (64, 3)).astype(np.float32))
    out = jax.jit(lambda m, xx: m(xx))(model, x)
    assert out.shape == (64, 1)
    assert bool(jnp.all(jnp.isfinite(out)))
    # Gradients flow into the per-point features.
    g = jax.grad(lambda m: jnp.sum(m(x) ** 2), allow_int=True)(model)
    assert float(jnp.abs(g.features).max()) > 0


def test_vm_grid_ops(rng):
    """VM factorized interpolation + basis combine (ops.interp.vm_*)."""
    from miso_tpu.ops.interp import vm_basis_apply, vm_interpolate

    R = 4
    planes = {
        "xy": jnp.asarray(rng.standard_normal((6, 6, R)).astype(np.float32)),
        "xz": jnp.asarray(rng.standard_normal((6, 6, R)).astype(np.float32)),
        "yz": jnp.asarray(rng.standard_normal((6, 6, R)).astype(np.float32)),
    }
    lines = {
        "x": jnp.asarray(rng.standard_normal((6, R)).astype(np.float32)),
        "y": jnp.asarray(rng.standard_normal((6, R)).astype(np.float32)),
        "z": jnp.asarray(rng.standard_normal((6, R)).astype(np.float32)),
    }
    basis = {k: jnp.asarray(rng.standard_normal((3, R)).astype(np.float32))
             for k in ("xy_z", "xz_y", "yz_x")}
    bound = jnp.asarray(np.array([[-1, 1]] * 3, np.float32))
    x = jnp.asarray(rng.uniform(-1, 1, (32, 3)).astype(np.float32))
    coeffs = vm_interpolate(planes, lines, x, bound)
    out = vm_basis_apply(basis, coeffs)
    assert out.shape == (32, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.slow
def test_vm_gridnet_trains(dataset):
    """TensoRF-factorized GridNet (grid type 'VM') fits the sphere."""
    cfg = {"spatial_dim": 3,
           "grid": {"type": "VM", "feature_dim": 4, "init_stddev": 1e-2,
                    "bound": [[-1.0, 1.0]] * 3, "base_cell_size": 0.1,
                    "per_level_scale": 2.0, "n_levels": 1,
                    "VM": {"rank": 16, "fix_bases": False}},
           "decoder": {"type": "mlp", "hidden_dim": 32, "hidden_layers": 1,
                       "out_dim": 1, "pos_invariant": True, "fix": False,
                       "pretrained_model": None},
           "pose": {"optimize": False, "num_poses": 1}}
    from miso_tpu.models.grid_net import create_grid_net
    model = create_grid_net(jax.random.PRNGKey(0), cfg)
    loss_fn = make_loss(tsdf_loss_3d, sdf_weight=3e3, sign_weight=1e2,
                        eik_weight=0.0, trunc_dist=0.3)
    _fit_and_eval(model, dataset, loss_fn, epochs=300, lr=5e-3, tol=0.1)


def test_gridnet_2d_trains(rng):
    """2D GridNet on an Sdf2D dataset (disk occupancy image)."""
    from miso_tpu.datasets.sdf_2d import Sdf2D
    from miso_tpu.losses.sdf import sdf_loss_3d
    from miso_tpu.models.grid_net import create_grid_net
    from miso_tpu.train.trainer import Trainer

    H = W = 64
    ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    img = np.ones((H, W), np.float32)
    img[(ii - 32) ** 2 + (jj - 32) ** 2 < 12**2] = 0.0
    ds = Sdf2D(img, batch_size=2048, cell_size=0.1)
    cfg = {"spatial_dim": 2,
           "grid": {"type": "regular", "feature_dim": 4, "init_stddev": 1e-4,
                    "bound": ds.bound.tolist(), "base_cell_size": 0.8,
                    "per_level_scale": 4.0, "n_levels": 2},
           "decoder": {"type": "mlp", "hidden_dim": 32, "hidden_layers": 1,
                       "out_dim": 1, "pos_invariant": True, "fix": False,
                       "pretrained_model": None},
           "pose": {"optimize": False, "num_poses": 1}}
    model = create_grid_net(jax.random.PRNGKey(0), cfg)
    loss_fn = make_loss(sdf_loss_3d, sdf_weight=3e3)
    model = Trainer({"optimizer": "adam", "learning_rate": 5e-3, "epochs": 150},
                    model, loss_fn, ds).train()
    # Predicted SDF near the disk boundary within a cell of GT.
    pts = np.stack([32.5 + 12 * np.cos(np.linspace(0, 2 * np.pi, 64)),
                    32.5 + 12 * np.sin(np.linspace(0, 2 * np.pi, 64))],
                   -1).astype(np.float32) * 0.1
    pred = np.asarray(model(jnp.asarray(pts))).ravel()
    assert np.abs(pred).mean() < 0.1, np.abs(pred).mean()
