#!/usr/bin/env python
"""Pretrain the shared MLP decoder over multiple scenes.

Equivalent of `training/train_decoder.py` in the reference: per-scene
feature grids + ONE shared decoder, staged coarse -> fine -> joint
training (train_decoder.py:219-266), then save the decoder weights
(`decoder_indoor.npz` / `decoder_quad.npz` analogs, loadable through
the model config's decoder.pretrained_model).

Without real Replica meshes, --synthetic generates procedural scenes so
the full pipeline runs self-contained.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def train_parallel(args, model_cfg, meshes, key):
    """One scene per device: stacked scene grids (padded storage) sharded
    over a ('scene',) mesh, per-scene TSDF losses vmapped, the shared
    decoder's gradient psum'd across devices every step.

    Returns the trained decoder params.
    """
    import jax
    import jax.numpy as jnp

    from miso_tpu.models.grid_atlas import grid_atlas_mask
    from miso_tpu.parallel.pretrain import (build_scene_stack,
                                            scene_parallel_decoder_step,
                                            shard_scene_stack,
                                            stack_scene_batches)
    from miso_tpu.parallel.sharding import make_mesh
    from miso_tpu.train.optim import masked_adam_init

    S = len(meshes)
    atlas = build_scene_stack(model_cfg, [ds.bound for ds in meshes], key)
    # Largest device count that tiles the scene count.
    n_dev = len(jax.devices())
    n = max(d for d in range(1, min(S, n_dev) + 1) if S % d == 0)
    mesh = make_mesh(n, axes=("scene",))
    print(f"parallel decoder pretraining: {S} scenes over {n} device(s)")
    params = shard_scene_stack(atlas.params, mesh, "scene")
    step = scene_parallel_decoder_step(trunc_dist=args.trunc_dist)
    rng = np.random.default_rng(0)
    k = jax.random.PRNGKey(1)

    def run_phase(params, name, epochs, lr, level, ignore_fine):
        print(f"=== {name}: {epochs} epochs, lr={lr} ===")
        ig = jnp.asarray([0.0, 1.0] if ignore_fine else [0.0, 0.0])[
            : params.num_levels]
        params = params.replace(ignore_level=ig)
        mask = grid_atlas_mask(params, features=True, stability=True,
                               decoder=True, anchor_first_submap=False,
                               level=level)
        opt_state = masked_adam_init(params)
        nonlocal k
        for e in range(epochs):
            batches = stack_scene_batches(
                [ds.sample(rng) for ds in meshes], mesh, "scene")
            k, sub = jax.random.split(k)
            params, opt_state, tl = step(params, opt_state, batches, sub,
                                         mask, jnp.float32(lr))
            if e % 50 == 0:
                print(f"  epoch {e}: loss={float(tl):.3e}")
        return params

    L = params.num_levels
    with mesh:
        params = run_phase(params, "coarse", args.epochs, 1e-3, level=0,
                           ignore_fine=True)
        params = run_phase(params, "fine", args.epochs, 1e-3, level=1,
                           ignore_fine=False)
        params = run_phase(params, "joint", args.epochs, 1e-4, level=L,
                           ignore_fine=False)
    return params.decoder


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/base.yaml")
    p.add_argument("--save_dir", default="./results/trained_decoders")
    p.add_argument("--name", default="decoder_indoor")
    p.add_argument("--meshes", nargs="*", default=None,
                   help="Watertight scene meshes (.ply); omit for --synthetic")
    p.add_argument("--synthetic", action="store_true",
                   help="Use procedural scenes instead of mesh files")
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--trunc_dist", type=float, default=0.15)
    p.add_argument("--parallel", action="store_true",
                   help="One scene per device: stacked scene grids "
                        "sharded over the mesh, decoder grads psum'd "
                        "(SURVEY 2.10 row 5)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from miso_tpu.config import load_config
    from miso_tpu.datasets.sdf_3d import Sdf3D
    from miso_tpu.datasets.shapes import room_scene
    from miso_tpu.losses.miso import make_loss
    from miso_tpu.losses.sdf import tsdf_loss_3d
    from miso_tpu.models.base import tree_full_mask
    from miso_tpu.models.grid_net import create_grid_net, grid_net_mask
    from miso_tpu.native import TriangleMesh
    from miso_tpu.train.checkpoint import save_pytree
    from miso_tpu.train.optim import masked_adam_init, masked_adam_update
    from miso_tpu.losses.common import total_loss

    cfg = load_config(args.config)
    os.makedirs(args.save_dir, exist_ok=True)

    # Scenes (reference uses 6 Replica scenes, train_decoder.py:191-199).
    if args.meshes:
        meshes = [Sdf3D(m, batch_size=2**14, total_samples=2**17,
                        trunc_dist=args.trunc_dist) for m in args.meshes]
    else:
        meshes = []
        for seed in range(4):
            verts, tris = room_scene(4.0 + seed, seed=seed)
            meshes.append(Sdf3D(TriangleMesh(verts, tris), batch_size=2**14,
                                total_samples=2**17, trunc_dist=args.trunc_dist))

    # Per-scene grids + shared decoder.
    model_cfg = {
        "spatial_dim": 3,
        "grid": {"type": "regular", "feature_dim": 4, "init_stddev": 1e-4,
                 "bound": None, "base_cell_size": 0.5, "per_level_scale": 5.0,
                 "n_levels": 2},
        "decoder": {"type": "mlp", "hidden_dim": 64, "hidden_layers": 1,
                    "out_dim": 1, "pos_invariant": True, "fix": False,
                    "pretrained_model": None},
        "pose": {"optimize": False, "num_poses": 1},
    }
    key = jax.random.PRNGKey(0)

    if args.parallel:
        decoder = train_parallel(args, model_cfg, meshes, key)
        out = os.path.join(args.save_dir, f"{args.name}.npz")
        save_pytree(out, decoder)
        print(f"Saved pretrained decoder to {out}")
        return

    grids = []
    for i, ds in enumerate(meshes):
        key, sub = jax.random.split(key)
        grids.append(create_grid_net(sub, model_cfg, bound=ds.bound))
    shared_decoder = grids[0].decoder
    grids = [g.replace(decoder=shared_decoder) for g in grids]

    loss_fn = make_loss(tsdf_loss_3d, sdf_weight=3e3, sign_weight=1e2,
                        eik_weight=5e1, trunc_dist=args.trunc_dist)

    # One jitted step shared by all scenes: (grid, opt, batch, mask) in,
    # grads all-touch the shared decoder which we carry explicitly.
    def step(grid, opt_state, batch, key, mask, lr):
        def obj(g):
            d = loss_fn(g, batch, key)
            return total_loss(d), d

        (tl, d), grads = jax.value_and_grad(obj, has_aux=True)(grid)
        new_g, new_o = masked_adam_update(grads, opt_state, grid, mask, lr=lr)
        return new_g, new_o, tl

    step = jax.jit(step)

    def run_phase(name, epochs, lr, level, ignore_fine):
        nonlocal grids
        print(f"=== {name}: {epochs} epochs, lr={lr} ===")
        opts = [masked_adam_init(g) for g in grids]
        rng = np.random.default_rng(0)
        k = jax.random.PRNGKey(1)
        for e in range(epochs):
            i = e % len(grids)
            g = grids[i]
            if ignore_fine:
                g = g.with_ignore_level([1])
            else:
                g = g.with_ignore_level([])
            mask = grid_net_mask(g, level=level, pose=False)
            batch = {kk: jnp.asarray(v) for kk, v in meshes[i].sample(rng).items()}
            k, sub = jax.random.split(k)
            g, opts[i], tl = step(g, opts[i], batch, sub, mask,
                                  jnp.float32(lr))
            # Propagate the shared decoder to every grid.
            grids = [gr.replace(decoder=g.decoder) if j != i else g
                     for j, gr in enumerate(grids)]
            if e % 50 == 0:
                print(f"  epoch {e} scene {i}: loss={float(tl):.3e}")

    # Staged schedule (train_decoder.py:219-266).
    run_phase("coarse", args.epochs, 1e-3, level=0, ignore_fine=True)
    run_phase("fine", args.epochs, 1e-3, level=1, ignore_fine=False)
    run_phase("joint", args.epochs, 1e-4, level=len(grids[0].features),
              ignore_fine=False)

    out = os.path.join(args.save_dir, f"{args.name}.npz")
    save_pytree(out, grids[0].decoder)
    print(f"Saved pretrained decoder to {out}")


if __name__ == "__main__":
    main()
