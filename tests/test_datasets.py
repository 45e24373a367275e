"""Dataset pipeline tests (2D SDF, synthetic RGB-D rays, submap partition,
config registry)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miso_tpu.datasets.rgbd import SyntheticRgbd
from miso_tpu.datasets.sdf_2d import Sdf2D
from miso_tpu.datasets.sdf_3d_submap import SubmapSdf3D
from miso_tpu.datasets.sequence import orbit_trajectory
from miso_tpu.datasets.shapes import icosphere, room_scene
from miso_tpu.native import TriangleMesh


def test_sdf_2d(rng):
    # Occupancy image: a dark disk on white background.
    H = W = 64
    ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    img = np.ones((H, W), np.float32)
    img[(ii - 32) ** 2 + (jj - 32) ** 2 < 12**2] = 0.0
    ds = Sdf2D(img, batch_size=1024, cell_size=0.1)
    batch = ds.sample(rng)
    assert batch["coords"].shape == (1024, 2)
    # SDF approximately distance to the disk boundary.
    c = batch["coords"]
    gt = np.linalg.norm(c / 0.1 - 32.5, axis=1) - 12
    err = np.abs(batch["sdf"][:, 0] - gt * 0.1)
    assert np.median(err) < 0.15


def test_synthetic_rgbd_bounds(rng):
    verts, tris = room_scene(4.0, seed=0)
    mesh = TriangleMesh(verts, tris)
    R, t = orbit_trajectory([0, 0, 0], 1.4, 1.2, 4, look_at=[0, 0, -0.5],
                            convention="opencv")
    ds = SyntheticRgbd(mesh, R, t, width=64, height=48, n_rays=64,
                       n_strat_samples=10, n_surf_samples=4, trunc_dist=0.2,
                       depth_range=(0.07, 10.0))
    batch = ds.sample(rng)
    N = 4 * 64 * 14
    assert batch["coords_frame"].shape == (N, 3)
    # Surface samples (bound ~ 0) should have small true distance to mesh.
    surf_mask = np.abs(batch["sdf"][:, 0]) < 1e-5
    assert surf_mask.sum() > 50
    ids = batch["sample_frame_ids"][surf_mask]
    pts_f = batch["coords_frame"][surf_mask]
    Ts = ds.T_WC_gt[ids]
    pts_w = np.einsum("nij,nj->ni", Ts[:, :3, :3], pts_f) + Ts[:, :3, 3]
    d = mesh.unsigned_distance(pts_w.astype(np.float32))
    assert np.median(d) < 0.05, np.median(d)
    # Bound labels are upper bounds on SDF for free-space samples.
    free = batch["sdf_signs"][:, 0] == 1
    assert free.sum() > 100
    # Odometry consistency.
    T01 = ds.get_odometry_at_pose(0)
    np.testing.assert_allclose(ds.T_WC[0] @ T01, ds.T_WC[1], atol=1e-5)


def test_submap_sdf3d(rng):
    verts, tris = room_scene(4.0, seed=0)
    ds = SubmapSdf3D(TriangleMesh(verts, tris), nx=2, ny=1,
                     frames_per_submap=3, frame_samples=512,
                     frame_batchsize=256, trunc_dist=0.2,
                     submap_std_rad=0.05, submap_std_meter=0.1, seed=0)
    assert ds.num_kfs == 6
    assert ds.submap_id_for_kf(0) == 0 and ds.submap_id_for_kf(5) == 1
    batch = ds.sample(rng)
    assert "sample_submap_ids" in batch
    np.testing.assert_array_equal(
        np.unique(batch["sample_submap_ids"]), [0, 1])
    # Submap 0 anchored; submap 1 perturbed.
    R1, t1 = ds.noisy_submap_pose(1)
    R1g, t1g = ds.true_submap_pose(1)
    assert np.linalg.norm(t1 - t1g) > 0.01


def test_config_load_and_factories(tmp_path):
    from miso_tpu.config import cfg_loss, cfg_model, load_config

    base = tmp_path / "base.yaml"
    base.write_text("""
model:
  name: grid_net
  spatial_dim: 3
  grid: {type: regular, feature_dim: 2, init_stddev: 0.0,
         bound: [[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]],
         base_cell_size: 0.5, per_level_scale: 2.0, n_levels: 2}
  decoder: {type: mlp, hidden_dim: 16, hidden_layers: 1, out_dim: 1,
            pos_invariant: true, fix: false, pretrained_model: null}
  pose: {optimize: false, num_poses: 1}
loss: {name: Tsdf3D, sdf_weight: 3000.0, sign_weight: 100.0,
       eik_weight: 0.0, trunc_dist: 0.15}
""")
    child = tmp_path / "child.yaml"
    child.write_text(f"""
inherit_from: {base}
loss: {{sdf_weight: 1000.0}}
""")
    cfg = load_config(str(child))
    assert cfg["loss"]["sdf_weight"] == 1000.0      # overridden
    assert cfg["loss"]["sign_weight"] == 100.0      # inherited
    model = cfg_model(cfg)
    assert model.num_levels == 2
    loss_fn = cfg_loss(cfg)
    x = jnp.zeros((16, 3))
    batch = {"coords": x, "sdf": jnp.zeros((16, 1)),
             "sdf_valid": jnp.ones((16, 1)), "sdf_sign": jnp.zeros((16, 1)),
             "sdf_signs": jnp.zeros((16, 1))}
    d = loss_fn(model, batch, jax.random.PRNGKey(0))
    assert "sdf" in d


@pytest.mark.slow
def test_clip_supervision_pipeline(rng):
    """CLIP head: dataset emits clip_* keys; mapping loss regresses the
    decoder's extra output channels against them."""
    import jax
    from miso_tpu.losses.miso import mapping_loss
    from miso_tpu.models.grid_net import create_grid_net

    verts, tris = room_scene(4.0, seed=0)
    mesh = TriangleMesh(verts, tris)
    R, t = orbit_trajectory([0, 0, 0], 1.4, 1.2, 2, look_at=[0, 0, -0.5],
                            convention="opencv")
    ds = SyntheticRgbd(mesh, R, t, width=64, height=48, n_rays=32,
                       n_strat_samples=6, n_surf_samples=2, trunc_dist=0.2)
    # Fake CLIP maps: 8-dim embeddings on a coarse pixel grid.
    ds.clip_features = rng.standard_normal((2, 12, 16, 8)).astype(np.float32)
    batch = ds.sample(rng)
    assert batch["clip_coords_frame"].shape[1] == 3
    assert batch["clip_embeddings"].shape[1] == 8

    cfg = {"spatial_dim": 3,
           "grid": {"type": "regular", "feature_dim": 4, "init_stddev": 1e-4,
                    "bound": [[-3.0, 3.0], [-3.0, 3.0], [-2.0, 2.0]],
                    "base_cell_size": 1.0, "per_level_scale": 2.0,
                    "n_levels": 2},
           "decoder": {"type": "mlp", "hidden_dim": 32, "hidden_layers": 1,
                       "out_dim": 9,  # SDF + 8 CLIP channels
                       "pos_invariant": True, "fix": False,
                       "pretrained_model": None},
           "pose": {"optimize": False, "num_poses": 2}}
    model = create_grid_net(jax.random.PRNGKey(0), cfg)
    for k in range(2):
        Rk, tk = ds.true_kf_pose_in_world(k)
        model = model.set_initial_kf_pose(k, jnp.asarray(Rk), jnp.asarray(tk))
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    d = mapping_loss(model, jb, jax.random.PRNGKey(0), weight_eik=0.0,
                     weight_fs=0.1, trunc_dist=0.2, weight_clip=0.1)
    assert "clip_L1" in d and np.isfinite(float(d["clip_L1"]))
    g = jax.grad(lambda m: sum(jnp.mean(v) for v in mapping_loss(
        m, jb, jax.random.PRNGKey(0), weight_eik=0.0, weight_fs=0.1,
        trunc_dist=0.2, weight_clip=0.1).values()), allow_int=True)(model)
    assert float(jnp.abs(g.features[0]).max()) > 0


@pytest.mark.fast
def test_lidar_scan_and_circuit_trajectory():
    """New quad-scale synthetic pipeline: circuit trajectory geometry,
    360-degree LiDAR scan labels, range crop (sdf_3d_lidar.py:126-133)."""
    from miso_tpu.datasets.sequence import SdfSequence, circuit_trajectory
    from miso_tpu.datasets.shapes import quad_scene

    R, t = circuit_trajectory(6.0, 1.2, 16, laps=1.0, wobble=0.1)
    assert R.shape == (16, 3, 3) and t.shape == (16, 3)
    # Proper rotations, heading along the path, z up.
    for k in (0, 5, 11):
        assert np.linalg.det(R[k]) == pytest.approx(1.0, abs=1e-5)
        np.testing.assert_allclose(R[k].T @ R[k], np.eye(3), atol=1e-5)
        assert R[k][2, 2] == pytest.approx(1.0, abs=1e-5)  # z axis up
    # Closed circuit: consecutive steps have near-constant arclength.
    d = np.linalg.norm(np.diff(t, axis=0), axis=1)
    assert d.max() / d.min() < 1.3

    verts, tris = quad_scene(16.0, seed=0, n_objects=4)
    mesh = TriangleMesh(verts, tris)
    ds = SdfSequence(mesh, R, t, frame_samples=256, frame_batchsize=64,
                     trunc_dist=0.3, surface_only=True,
                     scan_pattern="lidar", width=48, height=12,
                     max_range=12.0)
    rng = np.random.default_rng(0)
    ds.select_keyframes([0, 7])
    b = ds.sample(rng)
    assert b["coords_frame"].shape == (128, 3)
    # Surface-only: zero labels, all valid.
    np.testing.assert_allclose(b["sdf"], 0.0)
    np.testing.assert_allclose(b["sdf_valid"], 1.0)
    # Range crop: no sample farther than max_range from the sensor.
    assert np.linalg.norm(b["coords_frame"], axis=1).max() <= 12.0 + 1e-4
    # 360-degree azimuth coverage: frame-frame points on all sides.
    az = np.degrees(np.arctan2(b["coords_frame"][:, 1], b["coords_frame"][:, 0]))
    hist, _ = np.histogram(az, bins=8, range=(-180, 180))
    assert (hist > 0).all(), f"azimuth gaps: {hist}"
