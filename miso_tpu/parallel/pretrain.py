"""Device-parallel multi-scene decoder pretraining.

SURVEY.md section 2.10 row 5: the reference round-robins 6 Replica
scenes through one GPU (`training/train_decoder.py:194-204`).  TPU-first
realization: stack per-scene grids on a leading axis (padded storage +
logical sizes, same machinery as GridAtlas), shard that axis across the
device mesh (one scene per device), vmap the per-scene TSDF loss, and
let XLA psum the SHARED decoder's gradients over ICI while the grid
gradients stay scene-local.

Every step trains ALL scenes simultaneously instead of one scene per
epoch -- the decoder sees the multi-scene gradient at every step.
"""
from __future__ import annotations

import copy
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from miso_tpu.losses.common import eikonal_loss_at
from miso_tpu.models.grid_atlas import GridAtlas, GridAtlasParams, grid_atlas_mask
from miso_tpu.train.optim import masked_adam_init, masked_adam_update


def build_scene_stack(cfg_model: Dict, bounds: Sequence[np.ndarray],
                      key) -> GridAtlas:
    """Stacked per-scene grids sharing one decoder.

    Scenes may have different bounds (Replica rooms do); storage is
    padded to the max grid shape per level with logical sizes, exactly
    like GridAtlas submaps -- scene s IS submap slot s.
    """
    from miso_tpu.models.grid_net import create_grid_net

    cfg = copy.deepcopy(cfg_model)
    cfg.setdefault("pose", {})
    cfg["pose"]["optimize"] = False
    cfg["pose"]["num_poses"] = 1
    atlas = GridAtlas(cfg, max_kfs_per_submap=1)
    for b in bounds:
        atlas.add_submap(np.asarray(b, np.float32))
        atlas.add_kf()
    # Random-init features per scene + one shared decoder.
    decoder = None
    for s, b in enumerate(bounds):
        key, sub = jax.random.split(key)
        g = create_grid_net(sub, cfg, bound=np.asarray(b, np.float32),
                            num_poses=1)
        if decoder is None:
            decoder = g.decoder
        atlas.set_submap(s, g.replace(decoder=decoder))
    return atlas


def scene_tsdf_loss(params: GridAtlasParams, s, batch: Dict, key,
                    sdf_weight=3e3, sign_weight=1e2, eik_weight=5e1,
                    trunc_dist=0.15) -> jnp.ndarray:
    """TsdfLoss3D for scene slot ``s`` (traced index; see losses/sdf.py).

    Eikonal points are sampled uniformly in the scene's own bound.
    """
    coords = batch["coords"]
    gt_sdf = batch["sdf"]
    pred = params.forward_submap(s, coords)
    c = jnp.where(batch["sdf_valid"] == 1, pred - gt_sdf, 0.0)
    total = jnp.mean(c**2) * sdf_weight
    if sign_weight > 0:
        sign = batch["sdf_signs"]
        pos = jnp.where(sign == 1, trunc_dist - pred, 0.0)
        neg = jnp.where(sign == -1, pred + trunc_dist, 0.0)
        total = total + (jnp.mean(jax.nn.relu(pos))
                         + jnp.mean(jax.nn.relu(neg))) * sign_weight
    if eik_weight > 0:
        bound = params.bounds[s]
        u = jax.random.uniform(key, (gt_sdf.shape[0], 3))
        pts = bound[:, 0] + u * (bound[:, 1] - bound[:, 0])
        total = total + eikonal_loss_at(
            lambda xx: params.forward_submap(s, xx), pts, None,
            "autograd") * eik_weight
    return total


def scene_parallel_decoder_step(scene_loss_fn: Callable = scene_tsdf_loss,
                                **loss_kwargs):
    """One jitted step training EVERY scene: vmapped per-scene losses,
    grid grads scene-local, shared-decoder grads reduced across scenes
    (a psum over the mesh when the scene axis is sharded).

    step(params, opt_state, batches, key, mask, lr); batches hold
    (S, N, ...) arrays (leading scene axis).
    """

    def step(params, opt_state, batches, key, mask, lr):
        def obj(p):
            S = p.Rws.shape[0]
            keys = jax.random.split(key, S)

            def one(s, k):
                b = {kk: v[s] for kk, v in batches.items()}
                return scene_loss_fn(p, s, b, k, **loss_kwargs)

            losses = jax.vmap(one)(jnp.arange(S), keys)
            return jnp.sum(losses * p.active) / jnp.maximum(
                jnp.sum(p.active), 1.0)

        tl, grads = jax.value_and_grad(obj, allow_int=True)(params)
        grads = jax.tree_util.tree_map(
            lambda g: g if g.dtype == jax.dtypes.float0 else jnp.nan_to_num(g),
            grads)
        new_p, new_o = masked_adam_update(grads, opt_state, params, mask, lr=lr)
        return new_p, new_o, tl

    return jax.jit(step, donate_argnums=(1,))


def stack_scene_batches(batches: Sequence[Dict], mesh: Optional[Mesh] = None,
                        axis: str = "scene") -> Dict:
    """Stack per-scene sample dicts on a leading axis; shard it over the
    mesh when given.  Key mapping: coords_frame -> coords (scene batches
    are world/scene-frame already)."""
    keys = batches[0].keys()
    out = {}
    for k in keys:
        arr = jnp.asarray(np.stack([np.asarray(b[k]) for b in batches]))
        name = "coords" if k in ("coords_frame", "coords") else k
        if mesh is not None:
            arr = jax.device_put(arr, NamedSharding(
                mesh, P(axis, *([None] * (arr.ndim - 1)))))
        out[name] = arr
    return out


def shard_scene_stack(params: GridAtlasParams, mesh: Mesh,
                      axis: str = "scene") -> GridAtlasParams:
    """Scene axis over devices; decoder + tables replicated."""
    from miso_tpu.parallel.sharding import shard_atlas

    return shard_atlas(params, mesh, axis)
