"""Coverage for meshing extras, profiling, vis, eval utilities."""
import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np

from miso_tpu.utils.eval import trajectory_error, umeyama_alignment
from miso_tpu.utils.profiling import PerfTimer, time_jitted
from miso_tpu.utils.sdf import observed_sdf_query, sphere_tracing


pytestmark = pytest.mark.fast


def test_sphere_tracing():
    def sdf(x):
        return (jnp.linalg.norm(x, axis=-1, keepdims=True) - 0.5)

    origins = jnp.asarray(np.array([[2.0, 0, 0], [0, 2.0, 0]], np.float32))
    dirs = -origins
    pts, hit = sphere_tracing(sdf, origins, dirs, max_iters=50)
    assert bool(hit.all())
    np.testing.assert_allclose(np.linalg.norm(np.asarray(pts), axis=1), 0.5,
                               atol=1e-3)


def test_umeyama_and_ate(rng):
    from scipy.spatial.transform import Rotation

    gt = rng.standard_normal((50, 3))
    R = Rotation.from_rotvec([0.2, -0.1, 0.3]).as_matrix()
    t = np.array([1.0, -2.0, 0.5])
    est = (gt - t) @ R  # = R^T (gt - t): inverse transform
    Rr, tr, _ = umeyama_alignment(est, gt)
    np.testing.assert_allclose(est @ Rr.T + tr, gt, atol=1e-6)
    ate = trajectory_error(est, gt, align=True)
    assert ate["ate_rmse"] < 1e-6
    ate_noisy = trajectory_error(est + rng.normal(0, 0.01, est.shape), gt)
    assert 0.005 < ate_noisy["ate_rmse"] < 0.03


def test_perf_timer_and_time_jitted():
    t = PerfTimer()
    x = jnp.ones((256, 256))
    f = jax.jit(lambda a: a @ a)
    out = f(x)
    cpu, wall = t.check(sync=out)
    assert wall > 0
    stats = time_jitted(f, x, iters=3, warmup=1)
    assert stats["best_ms"] > 0 and stats["mean_ms"] >= stats["best_ms"]


def test_observed_sdf_query(rng):
    from miso_tpu.models.grid_net import create_grid_net

    cfg = {"spatial_dim": 3,
           "grid": {"type": "regular", "feature_dim": 2, "init_stddev": 1e-2,
                    "bound": [[-1, 1]] * 3, "base_cell_size": 0.5,
                    "per_level_scale": 2.0, "n_levels": 1},
           "decoder": {"type": "none"},
           "pose": {"optimize": False, "num_poses": 1}}
    m = create_grid_net(jax.random.PRNGKey(0), cfg)
    # Mark half the stability grid observed.
    stab = np.zeros(m.stability[0].shape, np.float32)
    stab[:2] = 1.0
    m = m.replace(stability=(jnp.asarray(stab),),
                  decoder=None)
    q = observed_sdf_query(m, stability_thresh=0.5, fill_value=99.0)
    x_obs = jnp.asarray(np.array([[-0.7, 0, 0]], np.float32))
    x_unobs = jnp.asarray(np.array([[0.7, 0, 0]], np.float32))
    assert float(q(x_unobs)[0, 0]) == 99.0
    assert float(q(x_obs)[0, 0]) != 99.0


def test_vis_functions(tmp_path, rng):
    from miso_tpu.utils import vis

    vis.visualize_grid_scalar(rng.standard_normal((16, 16)),
                              str(tmp_path / "scalar.png"))
    vis.visualize_grid_magnitude(rng.standard_normal((16, 16, 3)),
                                 str(tmp_path / "mag.png"))
    vis.plot_trajectories([rng.standard_normal((10, 3))], ["est"],
                          str(tmp_path / "traj.png"))
    vis.plot_training_curves({"epochs": list(range(5)),
                              "total_loss": [5, 4, 3, 2, 1]},
                             fig_path=str(tmp_path / "curve.png"))
    assert (tmp_path / "scalar.png").exists()
    assert (tmp_path / "traj.png").exists()


def test_trajectory_error_rotation_rmse(rng):
    """(N,4,4) trajectories also report rotation RMSE (reference
    utils_geometry.py:160-212)."""
    from scipy.spatial.transform import Rotation

    n = 10
    gt = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    for i in range(n):
        gt[i, :3, :3] = Rotation.from_euler("y", 0.1 * i).as_matrix()
        gt[i, :3, 3] = [0.2 * i, 0, 0]
    est = gt.copy()
    # 2-degree yaw error on every frame.
    dR = Rotation.from_euler("z", np.radians(2.0)).as_matrix()
    est[:, :3, :3] = np.einsum("nij,jk->nik", est[:, :3, :3], dR)
    out = trajectory_error(est, gt, align=False)
    assert abs(out["rot_rmse_deg"] - 2.0) < 0.1, out
    assert out["ate_rmse"] < 1e-6
    exact = trajectory_error(gt, gt, align=True)
    assert exact["rot_rmse_deg"] < 1e-3


def test_extract_fields_plain_callable(rng):
    """extract_fields accepts a plain function query (documented API),
    not only pytree-callables."""
    from miso_tpu.utils.sdf import extract_fields

    bound = np.array([[-1, 1], [-1, 1], [-1, 1]], np.float32)
    u = extract_fields(
        lambda p: np.linalg.norm if False else
        (jnp.linalg.norm(p, axis=-1, keepdims=True) - 0.5), bound, 16,
        chunk=1024)
    assert u.shape == (16, 16, 16)
    c = -1 + 8 * (2 / 15)           # lattice node coordinate
    expect = np.sqrt(3 * c * c) - 0.5
    assert abs(float(u[8, 8, 8]) - expect) < 1e-5


def test_bf16_query_mesh_parity(rng):
    """feature_dtype=bfloat16 meshing (cast-at-query, f32 accumulate)
    reproduces the f32 mesh to within bf16 mantissa noise (VERDICT r2
    item 8; production meshing/eval path)."""
    import jax

    from miso_tpu.models.grid_net import create_grid_net
    from miso_tpu.utils.eval import mesh_reconstruction_metrics
    from miso_tpu.utils.sdf import (cast_feature_storage, extract_fields,
                                    save_mesh)

    cfg = {"spatial_dim": 3,
           "grid": {"type": "regular", "feature_dim": 4, "init_stddev": 0.3,
                    "bound": [[-1, 1], [-1, 1], [-1, 1]],
                    "base_cell_size": 0.25, "per_level_scale": 2.0,
                    "n_levels": 2},
           "decoder": {"type": "mlp", "hidden_dim": 16, "hidden_layers": 1,
                       "out_dim": 1, "pos_invariant": True, "fix": False,
                       "pretrained_model": None},
           "pose": {"optimize": False, "num_poses": 1}}
    model = create_grid_net(jax.random.PRNGKey(2), cfg)

    # Field parity: bf16 storage, f32 accumulate.
    m16 = cast_feature_storage(model)
    assert m16.features[0].dtype == jnp.bfloat16
    u32 = extract_fields(model, model.bound, 24, chunk=2048)
    u16 = extract_fields(m16, model.bound, 24, chunk=2048)
    assert u16.dtype == np.float32  # accumulation stays f32
    scale = np.abs(u32).max()
    assert np.abs(u16 - u32).max() < 0.02 * max(scale, 1e-3), (
        np.abs(u16 - u32).max(), scale)

    # Mesh-metric parity through save_mesh(feature_dtype=...).
    mesh32 = save_mesh(model, model.bound, resolution=48)
    mesh16 = save_mesh(model, model.bound, resolution=48,
                       feature_dtype="bfloat16")
    if len(mesh32.vertices) > 50:
        m = mesh_reconstruction_metrics(mesh16, mesh32, n_points=5000,
                                        threshold=0.05, truncation=0.5)
        assert m["F-score (%)"] > 95, m
