"""Multi-device sharding tests on the 8-device virtual CPU mesh."""
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
from miso_tpu.parallel.sharding import (
    data_parallel_train_step, make_mesh, replicate, shard_batch)
from miso_tpu.train.optim import masked_adam_init
from miso_tpu.train.trainer import make_train_step


pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

MODEL_CFG = {
    "spatial_dim": 3,
    "grid": {"type": "regular", "feature_dim": 4, "init_stddev": 1e-4,
             "bound": [[-1.2, 1.2]] * 3, "base_cell_size": 0.4,
             "per_level_scale": 2.0, "n_levels": 2},
    "decoder": {"type": "mlp", "hidden_dim": 32, "hidden_layers": 1,
                "out_dim": 1, "pos_invariant": True, "fix": False,
                "pretrained_model": None},
    "pose": {"optimize": False, "num_poses": 1},
}


@pytest.mark.slow
def test_data_parallel_matches_single_device(rng):
    verts, tris = icosphere(2, 0.7)
    ds = Sdf3D(TriangleMesh(verts, tris), batch_size=2**12,
               total_samples=2**14, trunc_dist=0.3)
    model = create_grid_net(jax.random.PRNGKey(0), MODEL_CFG)
    loss_fn = make_loss(tsdf_loss_3d, eik_weight=0.0, trunc_dist=0.3)
    mask = grid_net_mask(model, level=model.num_levels)
    batch_np = ds.sample(np.random.default_rng(0))
    key = jax.random.PRNGKey(1)
    lr = jnp.float32(1e-3)

    # Single-device reference.
    step1 = make_train_step(loss_fn)
    m1, o1, tl1, _ = step1(model, masked_adam_init(model),
                           {k: jnp.asarray(v) for k, v in batch_np.items()},
                           key, mask, lr)

    # 8-way data parallel.
    mesh = make_mesh(8, ("data",))
    stepN = data_parallel_train_step(loss_fn, mesh)
    with mesh:
        modelN = replicate(model, mesh)
        maskN = replicate(mask, mesh)
        batchN = shard_batch(batch_np, mesh)
        mN, oN, tlN, _ = stepN(modelN, masked_adam_init(modelN), batchN,
                               key, maskN, lr)
    np.testing.assert_allclose(float(tl1), float(tlN), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m1.features[0]),
                               np.asarray(mN.features[0]), rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    ge.dryrun_multichip(2)


def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[1].shape[0], 1)
    assert bool(jnp.all(jnp.isfinite(out)))
