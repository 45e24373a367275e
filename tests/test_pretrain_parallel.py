"""Device-parallel multi-scene decoder pretraining (SURVEY 2.10 row 5).

Gradient parity: the scene-parallel vmapped objective's decoder
gradient must equal the average of per-scene decoder gradients computed
independently (the psum semantics the reference's sequential
round-robin approximates, training/train_decoder.py:194-204)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miso_tpu.datasets.sdf_3d import Sdf3D
from miso_tpu.datasets.shapes import room_scene
from miso_tpu.models.grid_atlas import grid_atlas_mask
from miso_tpu.native import TriangleMesh
from miso_tpu.parallel.pretrain import (build_scene_stack, scene_tsdf_loss,
                                        scene_parallel_decoder_step,
                                        shard_scene_stack,
                                        stack_scene_batches)
from miso_tpu.parallel.sharding import make_mesh
from miso_tpu.train.optim import masked_adam_init

pytestmark = pytest.mark.slow

CFG = {
    "spatial_dim": 3,
    "grid": {"type": "regular", "feature_dim": 2, "init_stddev": 1e-3,
             "bound": None, "base_cell_size": 1.0, "per_level_scale": 2.0,
             "n_levels": 2},
    "decoder": {"type": "mlp", "hidden_dim": 16, "hidden_layers": 1,
                "out_dim": 1, "pos_invariant": True, "fix": False,
                "pretrained_model": None},
    "pose": {"optimize": False, "num_poses": 1},
}


@pytest.fixture(scope="module")
def scenes():
    out = []
    for seed in range(4):
        verts, tris = room_scene(3.0 + 0.5 * seed, seed=seed)
        out.append(Sdf3D(TriangleMesh(verts, tris), batch_size=512,
                         total_samples=2**13, trunc_dist=0.3))
    return out


def test_scene_parallel_gradient_parity(scenes, rng):
    scenes = scenes[:2]  # parity is per-pair math; 2 scenes compile faster
    atlas = build_scene_stack(CFG, [ds.bound for ds in scenes],
                              jax.random.PRNGKey(0))
    params = atlas.params
    batches = stack_scene_batches([{k: v[:256] for k, v in ds.sample(rng).items()}
                                   for ds in scenes])
    key = jax.random.PRNGKey(5)
    S = len(scenes)
    keys = jax.random.split(key, S)

    def vmapped_obj(p):
        def one(s, k):
            b = {kk: v[s] for kk, v in batches.items()}
            return scene_tsdf_loss(p, s, b, k, trunc_dist=0.3)
        return jnp.mean(jax.vmap(one)(jnp.arange(S), keys))

    g_vm = jax.grad(vmapped_obj, allow_int=True)(params)

    # Sequential per-scene decoder grads, averaged.
    seq = None
    for s in range(S):
        def obj_s(p, s=s):
            b = {kk: v[s] for kk, v in batches.items()}
            return scene_tsdf_loss(p, s, b, keys[s], trunc_dist=0.3) / S
        g_s = jax.grad(obj_s, allow_int=True)(params)
        add = lambda a, b: a if a.dtype == jax.dtypes.float0 else a + b
        seq = g_s if seq is None else jax.tree_util.tree_map(add, g_s, seq)
    for a, b in zip(jax.tree_util.tree_leaves(g_vm.decoder),
                    jax.tree_util.tree_leaves(seq.decoder)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    # Grid grads are scene-local: scene s's grads from the vmapped
    # objective match its own sequential grads.
    for a, b in zip(jax.tree_util.tree_leaves(g_vm.features),
                    jax.tree_util.tree_leaves(seq.features)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_scene_parallel_training_converges_sharded(scenes, rng):
    """Full sharded step on a 4-device ('scene',) mesh: one scene per
    device, decoder grads psum'd; loss decreases."""
    atlas = build_scene_stack(CFG, [ds.bound for ds in scenes],
                              jax.random.PRNGKey(0))
    mesh = make_mesh(4, axes=("scene",))
    params = shard_scene_stack(atlas.params, mesh, "scene")
    mask = grid_atlas_mask(params, features=True, stability=True,
                           decoder=True, anchor_first_submap=False)
    opt_state = masked_adam_init(params)
    step = scene_parallel_decoder_step(trunc_dist=0.3)
    key = jax.random.PRNGKey(2)
    losses = []
    with mesh:
        for e in range(50):
            batches = stack_scene_batches([ds.sample(rng) for ds in scenes],
                                          mesh, "scene")
            key, sub = jax.random.split(key)
            params, opt_state, tl = step(params, opt_state, batches, sub,
                                         mask, jnp.float32(3e-3))
            losses.append(float(tl))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.4 * losses[0], losses[::10]
    # Scene axis really is sharded across 4 devices.
    assert len(params.features[0].sharding.device_set) == 4
    # level-scoped mask helper
    m0 = grid_atlas_mask(params, features=True, level=0,
                         anchor_first_submap=False)
    assert float(jnp.asarray(m0.features[0])) == 1.0
    assert float(jnp.asarray(m0.features[1])) == 0.0
