"""Worker process for tests/test_distributed.py.

Runs a 2-process jax.distributed cluster on CPU (2 virtual devices per
process -> 4-device global mesh) and trains a replicated GridNet with
the data-parallel step, each process feeding its own batch shard.
Prints per-step losses; the parent asserts both ranks agree.
"""
import os
import sys

# Force a virtual CPU backend BEFORE jax init; neutralize any TPU plugin
# registration the environment's sitecustomize would do.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
flags.append("--xla_force_host_platform_device_count=2")
os.environ["XLA_FLAGS"] = " ".join(flags)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from miso_tpu.parallel import distributed as dist


def main():
    dist.initialize()  # MISO_COORDINATOR / NUM_PROCESSES / PROCESS_ID env
    pid, nproc = dist.process_info()
    assert nproc == 2, f"expected 2 processes, got {nproc}"
    assert jax.device_count() == 4, jax.device_count()

    import jax.numpy as jnp

    from miso_tpu.losses.miso import make_loss, mapping_loss
    from miso_tpu.models.grid_net import create_grid_net, grid_net_mask
    from miso_tpu.parallel.sharding import data_parallel_train_step
    from miso_tpu.train.optim import masked_adam_init

    cfg = {
        "spatial_dim": 3,
        "grid": {"type": "regular", "feature_dim": 2, "init_stddev": 1e-3,
                 "bound": [[-1, 1], [-1, 1], [-1, 1]],
                 "base_cell_size": 0.5, "per_level_scale": 2.0, "n_levels": 2},
        "decoder": {"type": "mlp", "hidden_dim": 16, "hidden_layers": 1,
                    "out_dim": 1, "pos_invariant": True, "fix": False,
                    "pretrained_model": None},
        "pose": {"optimize": False, "num_poses": 4},
    }
    # Same seed everywhere -> identical replicated model.
    model = create_grid_net(jax.random.PRNGKey(0), cfg)
    mesh = dist.global_mesh(("data",))
    assert mesh.devices.size == 4

    # Each process contributes ITS half of the global batch (DIFFERENT
    # rows per rank; the psum'd gradient must still agree).
    rng = np.random.default_rng(100 + pid)
    N_local = 256  # global N = 1024 over 4 shards of 256
    local = {
        "coords_frame": rng.uniform(-0.9, 0.9, (N_local, 3)).astype(np.float32),
        "sample_frame_ids": rng.integers(0, 4, (N_local,)).astype(np.int32),
        "weights": np.ones((N_local, 1), np.float32),
        "sdf": rng.uniform(-0.2, 0.2, (N_local, 1)).astype(np.float32),
        "sdf_valid": np.ones((N_local, 1), np.float32),
        "sdf_signs": np.zeros((N_local, 1), np.float32),
    }
    batch = dist.make_global_batch(local, mesh, axis="data")
    assert batch["coords_frame"].shape[0] == 2 * N_local  # process-spanning

    model = dist.replicate_global(model, mesh)
    mask = dist.replicate_global(
        grid_net_mask(model, level=2, pose=False), mesh)
    opt_state = dist.replicate_global(masked_adam_init(model), mesh)

    loss_fn = make_loss(mapping_loss, loss_type="L2", weight_sdf=1.0,
                        weight_eik=0.0, weight_fs=0.0)
    step = data_parallel_train_step(loss_fn, mesh, axis="data")
    key = jax.random.PRNGKey(0)
    lr = jnp.float32(1e-2)
    with mesh:
        losses = []
        for it in range(3):
            model, opt_state, tl, _ = step(model, opt_state, batch, key,
                                           mask, lr)
            # Global scalar: identical on every process by construction.
            losses.append(float(tl))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], f"no progress: {losses}"
    print(f"RANK{pid} LOSSES " + " ".join(f"{l:.8f}" for l in losses),
          flush=True)

    # -- stage 2: submap-parallel fusion over a 2D (submap x data) mesh,
    # submap axis spanning PROCESSES (DCN), data axis within (ICI) -----
    from miso_tpu.losses.fusion import fusion_loss
    from miso_tpu.models.grid_atlas import GridAtlas, grid_atlas_mask
    from miso_tpu.parallel.sharding import submap_parallel_fusion_step

    mesh2 = dist.global_mesh(("submap", "data"))   # (2 proc, 2 dev)
    atlas = GridAtlas(cfg, max_kfs_per_submap=1)
    for s in range(2):  # one submap per process shard
        atlas.add_submap(np.array([[-1, 1], [-1, 1], [-1, 1]], np.float32),
                         tws=np.array([0.5 * s, 0, 0], np.float32))
        atlas.add_kf()
    params = dist.replicate_global(atlas.params, mesh2)
    # Shard the stacked submap axis over DCN.
    from jax.sharding import NamedSharding, PartitionSpec as P

    def place(x):
        arr = np.asarray(x)
        if arr.ndim >= 1 and arr.shape[0] == 2:
            half = arr[pid:pid + 1]
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh2, P("submap", *([None] * (arr.ndim - 1)))),
                half)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh2, P()), arr)

    params = jax.tree_util.tree_map(place, atlas.params)
    mask2 = dist.replicate_global(
        grid_atlas_mask(atlas.params, features=True, stability=True,
                        kf_pose=True, submap_pose=True), mesh2)
    from miso_tpu.train.optim import masked_adam_init as mai
    opt2 = mai(params)  # moments inherit the params' sharding
    rngf = np.random.default_rng(7 + pid)
    Nf = 256
    localf = {
        "coords_frame": rngf.uniform(-0.8, 0.8, (Nf, 3)).astype(np.float32),
        "sample_frame_ids": rngf.integers(0, 2, (Nf,)).astype(np.int32),
        "weights": np.ones((Nf, 1), np.float32),
        "sdf": rngf.uniform(-0.2, 0.2, (Nf, 1)).astype(np.float32),
        "sdf_valid": np.ones((Nf, 1), np.float32),
        "sdf_signs": np.zeros((Nf, 1), np.float32),
    }
    # Shard the point batch over BOTH axes (submap spans processes):
    # each rank's rows land in its own shard of the global batch.
    batchf = dist.make_global_batch(localf, mesh2, axis=("submap", "data"))

    def loss_fn(p, b, k):
        return fusion_loss(p, b, k, loss_type="L1", weight_sdf=1.0,
                           weight_eik=0.0, weight_fs=0.1, trunc_dist=0.15)

    stepf = submap_parallel_fusion_step(loss_fn, mesh2)
    with mesh2:
        p2, o2, tlf = stepf(params, opt2, batchf, jax.random.PRNGKey(0),
                            mask2, jnp.float32(1e-3))
        tlf.block_until_ready()
    assert np.isfinite(float(tlf)), float(tlf)
    d0 = float(jnp.abs(p2.features[0] - params.features[0]).max())
    assert d0 > 0, "fusion step did not update features"
    print(f"RANK{pid} FUSION {float(tlf):.8f} dfeat={d0:.3e}", flush=True)


if __name__ == "__main__":
    main()
