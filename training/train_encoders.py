#!/usr/bin/env python
"""Pretrain the per-level FeaturePrediction encoders.

Equivalent of `training/train_encoders.py`: with a frozen pretrained
decoder, train one encoder level at a time (coarse first) to predict
grid-feature corrections from pooled SDF residual volumes, under
simulated pose / distance noise (train_encoders.py:99-120).  Saves
`feature_encoder_level_{l}.npz` loadable by models.encoder.Encoder.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--save_dir", default="./results/trained_encoders")
    p.add_argument("--decoder_weights", default="./results/trained_decoders/decoder_indoor.npz")
    p.add_argument("--meshes", nargs="*", default=None)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--trunc_dist", type=float, default=0.15)
    p.add_argument("--pred_std", type=float, default=1e-3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from miso_tpu.datasets.sdf_3d import PosedSdf3D
    from miso_tpu.datasets.shapes import room_scene
    from miso_tpu.models.base import tree_full_mask, tree_zero_mask
    from miso_tpu.models.encoder import (EncoderObservation, compute_residuals,
                                         encoder_pretrain_loss,
                                         feature_prediction_init,
                                         predict_corrections_until_level)
    from miso_tpu.models.grid_net import create_grid_net
    from miso_tpu.native import TriangleMesh
    from miso_tpu.ops import se3
    from miso_tpu.train.checkpoint import load_pytree, save_pytree
    from miso_tpu.train.optim import masked_adam_init, masked_adam_update

    os.makedirs(args.save_dir, exist_ok=True)
    n_levels, fdim = 2, 4

    # Scenes with simulated pose + distance noise (train_encoders.py:99-107).
    scene_meshes = args.meshes or [None] * 4
    datasets, grids = [], []
    model_cfg = {
        "spatial_dim": 3,
        "grid": {"type": "regular", "feature_dim": fdim, "init_stddev": 0.0,
                 "bound": None, "base_cell_size": 0.5, "per_level_scale": 5.0,
                 "n_levels": n_levels},
        "decoder": {"type": "mlp", "hidden_dim": 64, "hidden_layers": 1,
                    "out_dim": 1, "pos_invariant": True, "fix": True,
                    "pretrained_model": None},
        "pose": {"optimize": False, "num_poses": 32},
    }
    key = jax.random.PRNGKey(0)
    for i, m in enumerate(scene_meshes):
        if m is None:
            verts, tris = room_scene(4.0 + i, seed=i)
            mesh = TriangleMesh(verts, tris)
        else:
            mesh = m
        ds = PosedSdf3D(mesh, frame_batchsize=2**10, frame_samples=2**11,
                        num_frames=32, trunc_dist=args.trunc_dist,
                        frame_std_rad=0.00872665, frame_std_meter=0.005,
                        distance_std=0.01, seed=i)
        datasets.append(ds)
        key, sub = jax.random.split(key)
        g = create_grid_net(sub, model_cfg, bound=ds.get_inflated_bound())
        grids.append(g)
    # Frozen pretrained decoder shared by all grids.
    if os.path.exists(args.decoder_weights):
        dec = load_pytree(args.decoder_weights, like=grids[0].decoder)
        grids = [g.replace(decoder=dec) for g in grids]
        print(f"Loaded pretrained decoder from {args.decoder_weights}")

    key, k0, k1 = jax.random.split(key, 3)
    enc_params = [feature_prediction_init(k0, fdim, 3),
                  feature_prediction_init(k1, fdim, 3)]

    def make_step(target_level):
        def step(enc, opt, grid, batch, key, lr):
            def obj(enc):
                d = encoder_pretrain_loss(enc, grid, batch, key, target_level,
                                          trunc_dist=args.trunc_dist,
                                          pred_std=args.pred_std)
                return sum(jnp.mean(v) for v in d.values())

            loss, grads = jax.value_and_grad(obj)(enc)
            # Only the target level trains (train_encoders.py:46-48).
            mask = [tree_full_mask(e) if l == target_level else tree_zero_mask(e)
                    for l, e in enumerate(enc)]
            new_e, new_o = masked_adam_update(grads, opt, enc, mask, lr=lr)
            return new_e, new_o, loss

        return jax.jit(step)

    rng = np.random.default_rng(0)
    for level in range(n_levels):
        print(f"=== training encoder level {level} ===")
        step = make_step(level)
        opt = masked_adam_init(enc_params)
        k = jax.random.PRNGKey(level)
        for e in range(args.epochs):
            i = int(rng.integers(len(datasets)))
            batch = {kk: jnp.asarray(v) for kk, v in datasets[i].sample(rng).items()}
            # Initialize grid KF poses from the (noisy) dataset poses.
            g = grids[i].replace(
                Rwk=jnp.asarray(datasets[i].R_world_frame),
                twk=jnp.asarray(datasets[i].t_world_frame))
            k, sub = jax.random.split(k)
            enc_params, opt, loss = step(enc_params, opt, g, batch, sub,
                                         jnp.float32(1e-3))
            if e % 50 == 0:
                print(f"  epoch {e} scene {i}: loss={float(loss):.3e}")
        out = os.path.join(args.save_dir, f"feature_encoder_level_{level}.npz")
        save_pytree(out, enc_params[level])
        print(f"Saved {out}")


if __name__ == "__main__":
    main()
