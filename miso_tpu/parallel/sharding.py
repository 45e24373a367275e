"""Multi-chip scaling via jax.sharding over a device Mesh.

The reference is strictly single-GPU (SURVEY.md section 2.10); the parallel
axes of this workload are:

  * **data** -- point batches (up to 1e6 queries/step, scannet.yaml:88):
    shard the batch across devices; XLA inserts the gradient psum.
  * **submap** -- submaps are independent models with independent losses
    (loss.py:415-514, build_submaps.py:133-139): shard the stacked
    leading submap axis of GridAtlasParams; cross-submap reductions
    (fused forward averaging, alignment pairs) become ICI collectives.

Everything goes through `jax.jit` with `NamedSharding` constraints --
collectives ride ICI automatically; multi-host extends the same mesh
over DCN via jax.distributed.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from miso_tpu.losses.common import total_loss
from miso_tpu.train.optim import masked_adam_init, masked_adam_update


def make_mesh(n_devices: Optional[int] = None, axes=("data",),
              shape: Optional[tuple] = None) -> Mesh:
    """Build a device mesh.  Default: 1D data-parallel mesh over all
    local devices; pass axes=('submap', 'data') with a shape for 2D."""
    devices = np.asarray(jax.devices()[: n_devices or len(jax.devices())])
    if shape is None:
        shape = (len(devices),) if len(axes) == 1 else None
    assert shape is not None, "2D mesh needs an explicit shape"
    return Mesh(devices.reshape(shape), axes)


def shard_batch(batch: Dict, mesh: Mesh, axis: str = "data") -> Dict:
    """Place each (N, ...) batch array sharded over its leading axis."""
    out = {}
    for k, v in batch.items():
        arr = jnp.asarray(v)
        if arr.ndim >= 1 and arr.shape[0] % mesh.shape[axis] == 0:
            spec = P(axis, *([None] * (arr.ndim - 1)))
        else:
            spec = P()
        out[k] = jax.device_put(arr, NamedSharding(mesh, spec))
    return out


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def data_parallel_train_step(loss_fn, mesh: Mesh, axis: str = "data"):
    """Data-parallel version of train.trainer.make_train_step.

    Model/optimizer replicated, batch sharded over ``axis``.  The
    gradient all-reduce is inserted by XLA (the torch-world DDP slot,
    here a psum over ICI).
    """

    def step(model, opt_state, batch, key, mask, lr):
        batch = {k: jax.lax.with_sharding_constraint(
            v, NamedSharding(mesh, P(axis, *([None] * (v.ndim - 1))))
            if v.ndim >= 1 and v.shape[0] % mesh.shape[axis] == 0
            else NamedSharding(mesh, P()))
            for k, v in batch.items()}

        def objective(m):
            d = loss_fn(m, batch, key)
            return total_loss(d), d

        (tl, loss_dict), grads = jax.value_and_grad(objective, has_aux=True,
                                                    allow_int=True)(model)
        bad = jnp.logical_not(jnp.isfinite(tl))
        grads = jax.tree_util.tree_map(
            lambda g: g if g.dtype == jax.dtypes.float0 else jnp.nan_to_num(g), grads)
        eff = jax.tree_util.tree_map(lambda m_: m_ * jnp.where(bad, 0.0, 1.0), mask)
        new_model, new_opt = masked_adam_update(grads, opt_state, model, eff, lr=lr)
        return new_model, new_opt, tl, loss_dict

    return jax.jit(step, donate_argnums=(1,))


def pad_pair_ctx(ctx, multiple: int):
    """Pad a vmapped-alignment pair context (src_ids, dst_ids, coords,
    valid) to a multiple of ``multiple`` rows with inert pairs
    (src=dst=0, valid=0 -> zero loss, zero grads), so the pair axis
    divides the mesh axis."""
    src, dst, coords, valid = (jnp.asarray(x) for x in ctx)
    np_pairs = src.shape[0]
    rem = (-np_pairs) % multiple
    if rem == 0:
        return src, dst, coords, valid
    z = jnp.zeros((rem,), src.dtype)
    pad_coords = jnp.broadcast_to(coords[:1], (rem,) + coords.shape[1:])
    pad_valid = jnp.zeros((rem,) + valid.shape[1:], valid.dtype)
    return (jnp.concatenate([src, z]), jnp.concatenate([dst, z]),
            jnp.concatenate([coords, pad_coords]),
            jnp.concatenate([valid, pad_valid]))


def shard_pair_ctx(ctx, mesh: Mesh, axis: str = "data"):
    """Shard the alignment pair axis over the mesh (SURVEY section 2.10
    pairwise-parallelism row: device-parallel pair evaluation + global
    grad psum; the reference loops pairs on one GPU,
    align/base.py:127-146).

    Pads to the mesh axis size first (see pad_pair_ctx); per-pair losses
    evaluate device-local, the scalar sum and the pose-gradient
    reduction become psums over ICI inserted by XLA.
    """
    ctx = pad_pair_ctx(ctx, mesh.shape[axis])

    def place(x):
        return jax.device_put(x, NamedSharding(
            mesh, P(axis, *([None] * (x.ndim - 1)))))

    return tuple(place(x) for x in ctx)


def shard_atlas(params, mesh: Mesh, axis: str = "submap"):
    """Shard GridAtlasParams over the submap axis.

    Stacked per-submap leaves (leading dim S) are split across devices;
    shared leaves (decoder, kf tables) are replicated.
    """
    S = params.num_submaps
    n = mesh.shape[axis]

    def place(x):
        arr = jnp.asarray(x)
        if arr.ndim >= 1 and arr.shape[0] == S and S % n == 0:
            return jax.device_put(arr, NamedSharding(
                mesh, P(axis, *([None] * (arr.ndim - 1)))))
        return jax.device_put(arr, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, params)


def submap_parallel_fusion_step(loss_fn, mesh: Mesh,
                                submap_axis: str = "submap",
                                data_axis: Optional[str] = "data"):
    """Fusion/joint-BA step with the atlas sharded over submaps and the
    point batch sharded over data (when the mesh has both axes).

    The atlas forward (vmap over S with masked averaging) reduces over
    the submap axis -- XLA lowers the sum over per-submap features to a
    psum over ICI.  Gradients wrt stacked grids stay submap-local; only
    the shared decoder / pose reductions cross devices.

    The trainability mask flows through the step as an ARGUMENT (device
    arrays embedded as closure constants hit the axon slow dispatch
    path; see ops/interp.py notes).
    """
    axes = [a for a in (submap_axis, data_axis) if a and a in mesh.axis_names]

    def step(params, opt_state, batch, key, mask, lr):
        def objective(p):
            d = loss_fn(p, batch, key)
            return total_loss(d), d

        (tl, d), grads = jax.value_and_grad(objective, has_aux=True,
                                            allow_int=True)(params)
        grads = jax.tree_util.tree_map(
            lambda g: g if g.dtype == jax.dtypes.float0 else jnp.nan_to_num(g), grads)
        new_p, new_o = masked_adam_update(grads, opt_state, params, mask, lr=lr)
        return new_p, new_o, tl

    return jax.jit(step, donate_argnums=(1,))
