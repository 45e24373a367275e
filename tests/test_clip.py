"""CLIP feature supervision end-to-end (reference sdf_rgbd.py:295-380 +
loss.py:815-844: decoder channel 0 = SDF, channels 1.. regress CLIP
embeddings at surface back-projections).

Synthetic embeddings are a smooth function of world position, so the
clip head must learn to reproduce them through the grid+decoder.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miso_tpu.datasets.rgbd import SyntheticRgbd
from miso_tpu.datasets.shapes import room_scene
from miso_tpu.losses.miso import make_loss, mapping_loss
from miso_tpu.models.grid_net import create_grid_net, grid_net_mask
from miso_tpu.native import TriangleMesh
from miso_tpu.train.trainer import Trainer
from miso_tpu.utils import sample as S



CLIP_D = 2


def world_embedding(x):
    """Smooth (N, 3) -> (N, 2) 'CLIP' field."""
    x = np.asarray(x)
    return np.stack([
        np.sin(1.3 * x[:, 0] + 0.4 * x[:, 2]),
        np.cos(1.1 * x[:, 1] - 0.3 * x[:, 0]),
    ], axis=-1).astype(np.float32)


def _clip_dataset():
    verts, tris = room_scene(3.0, seed=0)
    mesh = TriangleMesh(verts, tris)
    n = 6
    traj_R = [np.eye(3, dtype=np.float32)] * n
    traj_t = [np.array([0.0, 0.0, -0.5 + 0.15 * i], np.float32)
              for i in range(n)]
    ds = SyntheticRgbd(mesh, traj_R, traj_t, width=64, height=48,
                       n_rays=64, n_strat_samples=5, n_surf_samples=3,
                       trunc_dist=0.3)
    # Per-frame full-res CLIP grids: embedding of each pixel's surface
    # back-projection in world coordinates.
    H, W = ds.depth.shape[1:]
    clip = np.zeros((n, H, W, CLIP_D), np.float32)
    for i in range(n):
        pc_cam = ds.dirs_C * ds.depth[i][..., None]          # (H, W, 3)
        T = ds.T_WC_gt[i]
        pc_world = pc_cam.reshape(-1, 3) @ T[:3, :3].T + T[:3, 3]
        clip[i] = world_embedding(pc_world).reshape(H, W, CLIP_D)
    ds.clip_features = clip
    ds.n_clip_rays = 64
    return ds


@pytest.mark.fast
def test_clip_batch_schema(rng):
    ds = _clip_dataset()
    batch = ds.sample(rng)
    assert batch["clip_coords_frame"].shape[1] == 3
    assert batch["clip_embeddings"].shape[1] == CLIP_D
    assert batch["clip_sample_frame_ids"].shape[0] == \
        batch["clip_coords_frame"].shape[0]
    # Embeddings really are the world-position field at the surface
    # back-projections.
    ids = batch["clip_sample_frame_ids"]
    T = ds.T_WC_gt[ids]
    world = np.einsum("nij,nj->ni", T[:, :3, :3],
                      batch["clip_coords_frame"]) + T[:, :3, 3]
    np.testing.assert_allclose(batch["clip_embeddings"],
                               world_embedding(world), atol=2e-2)


@pytest.mark.slow
def test_clip_head_regresses_embeddings(rng):
    ds = _clip_dataset()
    cfg_model = {
        "spatial_dim": 3,
        "grid": {"type": "regular", "feature_dim": 4, "init_stddev": 1e-3,
                 "bound": [[-2.0, 2.0], [-2.0, 2.0], [-2.0, 2.0]],
                 "base_cell_size": 1.0, "per_level_scale": 2.0, "n_levels": 2},
        # out_dim = 1 SDF + CLIP_D embedding channels (loss.py:815-844).
        "decoder": {"type": "mlp", "hidden_dim": 32, "hidden_layers": 1,
                    "out_dim": 1 + CLIP_D, "pos_invariant": True,
                    "fix": False, "pretrained_model": None},
        "pose": {"optimize": False, "num_poses": ds.num_kfs},
    }
    model = create_grid_net(jax.random.PRNGKey(0), cfg_model,
                            num_poses=ds.num_kfs)
    for kf in range(ds.num_kfs):
        R, t = ds.noisy_kf_pose_in_world(kf)
        model = model.set_initial_kf_pose(kf, jnp.asarray(R), jnp.asarray(t))
    loss_fn = make_loss(mapping_loss, loss_type="L1", weight_sdf=1.0,
                        weight_eik=0.0, weight_fs=0.1, trunc_dist=0.3,
                        weight_clip=1.0)
    mask = grid_net_mask(model, level=model.num_levels, pose=False)

    batch0 = ds.sample(np.random.default_rng(1))
    d0 = loss_fn(model, {k: jnp.asarray(v) for k, v in batch0.items()},
                 jax.random.PRNGKey(0))
    assert "clip_L1" in d0

    trainer = Trainer({"optimizer": "adam", "learning_rate": 8e-3,
                       "epochs": 150}, model, loss_fn, ds, mask=mask)
    model = trainer.train()

    # The clip head reproduces the embedding field at surface points.
    batch = ds.sample(np.random.default_rng(2))
    ids = batch["clip_sample_frame_ids"]
    T = ds.T_WC_gt[ids]
    world = np.einsum("nij,nj->ni", T[:, :3, :3],
                      batch["clip_coords_frame"]) + T[:, :3, 3]
    pred = np.asarray(model(jnp.asarray(world.astype(np.float32)))[:, 1:])
    err = np.abs(pred - batch["clip_embeddings"]).mean()
    base = np.abs(batch["clip_embeddings"]).mean()
    assert err < 0.25 * base, (err, base)


@pytest.mark.fast
def test_clip_loader_formats(tmp_path, rng):
    """npz / pt / per-frame-directory CLIP grids load into
    clip_features and flow into sampled batches."""
    import torch

    ds = _clip_dataset()
    feats = ds.clip_features
    ds.clip_features = None

    np.savez(tmp_path / "clip.npz", clip_features=feats)
    got = ds.load_clip_features(str(tmp_path / "clip.npz"))
    np.testing.assert_allclose(got, feats)

    torch.save({"clip_features": torch.from_numpy(feats)},
               tmp_path / "clip.pt")
    ds.clip_features = None
    got = ds.load_clip_features(str(tmp_path / "clip.pt"))
    np.testing.assert_allclose(got, feats)

    per_frame = tmp_path / "frames"
    per_frame.mkdir()
    for i in range(len(feats)):
        np.save(per_frame / f"{i:04d}.npy", feats[i])
    ds.clip_features = None
    got = ds.load_clip_features(str(per_frame))
    np.testing.assert_allclose(got, feats)

    batch = ds.sample(rng)
    assert batch["clip_embeddings"].shape[1] == CLIP_D
