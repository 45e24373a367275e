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


@pytest.mark.parametrize("subsample_points", [None, 64])
def test_pair_sharded_alignment_matches_single_device(subsample_points):
    """Alignment with the vmapped pair axis sharded over the 8-device
    mesh (pairs padded 3 -> 8 with inert rows, grads psum'd by XLA)
    produces the same pose updates as the unsharded path (SURVEY
    section 2.10 pairwise-parallelism row; VERDICT r2 item 3).

    With ``subsample_points`` set, the per-pair subsample keys are
    derived from the pair identity (fold_in(src), fold_in(dst)), so
    inert padding rows cannot shift real pairs' draws and the sharded
    path stays bit-compatible (VERDICT r3 weak #6)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_atlas_align import build_atlas

    from miso_tpu.align.miso import (generic_align_multiple_submaps,
                                     make_vmapped_pair_loss)
    from miso_tpu.parallel.sharding import pad_pair_ctx, shard_pair_ctx

    def run(shard):
        atlas = build_atlas(3, offset=0.4)
        atlas.set_submap_pose_correction(
            1, np.array([0, 0, 0.05], np.float32),
            np.array([0.05, -0.03, 0.02], np.float32))
        atlas.precompute_coordinates_for_alignment()
        pairs = [(0, 1), (0, 2), (1, 2)]
        coords = {s: atlas.coordinates_for_alignment(s, 0) for s in range(3)}
        ctx = (jnp.asarray([s for s, _ in pairs], jnp.int32),
               jnp.asarray([d for _, d in pairs], jnp.int32),
               jnp.stack([coords[s][0] for s, _ in pairs]),
               jnp.stack([coords[s][1] for s, _ in pairs]))
        if shard == "pad_only":
            # Padding alone must not change the result.
            ctx = pad_pair_ctx(ctx, 8)
        elif shard:
            mesh = make_mesh(8, axes=("data",))
            ctx = shard_pair_ctx(ctx, mesh, "data")
            assert ctx[2].sharding.is_fully_replicated is False
        loss = make_vmapped_pair_loss("latent", level=0, align_weight=100.0,
                                      subsample_points=subsample_points)
        generic_align_multiple_submaps(
            atlas, loss, num_iters=15, lr=5e-3, batched_loss=True,
            loss_ctx=ctx, seed=3, scan=True)
        return (np.asarray(atlas.params.sub_rot_corr),
                np.asarray(atlas.params.sub_trans_corr))

    r_one, t_one = run(False)
    r_pad, t_pad = run("pad_only")
    r_shard, t_shard = run(True)
    assert np.abs(t_one[1:]).max() > 0
    np.testing.assert_allclose(r_pad, r_one, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(t_pad, t_one, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(r_shard, r_one, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(t_shard, t_one, rtol=1e-5, atol=1e-6)


def test_hierarchical_alignment_with_mesh():
    """align_multiple_submaps_hierarchical(mesh=...) runs the full
    latent+sdf pipeline with the pair axis sharded."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_atlas_align import build_atlas

    from miso_tpu.align.miso import align_multiple_submaps_hierarchical
    from miso_tpu.ops import se3

    atlas = build_atlas(3, offset=0.5)
    rng = np.random.default_rng(3)
    true_t = np.array([[0.5 * s, 0, 0] for s in range(3)], np.float32)
    for s in range(1, 3):
        atlas.set_submap_pose_correction(
            s, rng.normal(0, 0.02, 3).astype(np.float32),
            rng.normal(0, 0.04, 3).astype(np.float32))
    R, t = atlas.params.updated_submap_poses()
    err0 = float(np.linalg.norm(np.asarray(t) - true_t, axis=1).mean())
    mesh = make_mesh(8, axes=("data",))
    align_multiple_submaps_hierarchical(
        atlas, level_iters=60, lr=5e-3, align_weight=3000.0,
        latent_levels=[0], skip_finetune=False, finetune_iters=20,
        mesh=mesh)
    R, t = atlas.params.updated_submap_poses()
    err1 = float(np.linalg.norm(np.asarray(t) - true_t, axis=1).mean())
    assert err1 < 0.6 * err0, (err0, err1)
