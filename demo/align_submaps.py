#!/usr/bin/env python
"""Submap alignment benchmark (reference `demo/align_submaps.py`).

Loads (or builds) a grid atlas, perturbs submap poses with configurable
noise (align_submaps.py:265-273), runs the chosen alignment method
(MISO hierarchical latent via --feature_levels, --use_sdf finetune, or
the vfpp / mips / icp baselines), and reports submap-pose
rotation/translation RMSE before and after (align_submaps.py:124-145)
plus wall-clock, into results.json.

Measured on the default synthetic atlas (3 deg / 0.15 m perturbation),
single TPU chip, 2026-08-16:
  miso --use_sdf : 0.39 deg / 0.013 m   (map-to-map, no raw observations)
  icp            : 0.51 deg / 0.048 m   (point-to-plane + pose graph)
  vfpp           : 0.03 deg / 0.002 m   (uses raw SDF observations)
  mips           : 0.04 deg / 0.001 m   (uses raw SDF observations)
Alignment quality requires well-converged submaps; under-trained maps
carry biased fields and per-submap latent gauges that no aligner can
undo (see build_synthetic_atlas docstring).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def build_synthetic_atlas(seed=0, n_submaps=2, overlap=3.0):
    """Overlapping submaps trained to convergence on local GT-SDF
    samples with a shared frozen pretrained decoder -- the quality
    build_submaps produces with GT poses (its output atlas is what the
    reference's align demo consumes, align_submaps.py:86-118).

    Zero-initialized features + one frozen decoder + consistent SDF
    supervision produce comparable latent codes across submaps, which
    is what makes latent-space alignment well-posed (the paper's
    encoder initialization strengthens this further).
    """
    import jax
    import jax.numpy as jnp

    from miso_tpu.datasets.sdf_3d import Sdf3D
    from miso_tpu.datasets.shapes import room_scene
    from miso_tpu.losses.miso import make_loss
    from miso_tpu.losses.sdf import tsdf_loss_3d
    from miso_tpu.models.grid_atlas import GridAtlas
    from miso_tpu.models.grid_net import create_grid_net
    from miso_tpu.native import TriangleMesh
    from miso_tpu.train.trainer import GridTrainer

    verts, tris = room_scene(6.0, seed=seed)
    # Extra central furniture: the submap overlap region must contain
    # geometry with normals along all axes, or surface-based alignment
    # (the icp baseline) is unobservable in x/y there.
    from miso_tpu.datasets.shapes import box, icosphere, merge_meshes
    verts, tris = merge_meshes(
        (verts, tris),
        box(size=(0.9, 0.7, 1.1), center=(0.0, 0.8, -0.4)),
        icosphere(2, 0.45, center=(0.2, -1.0, 0.0)))
    mesh = TriangleMesh(verts, tris)
    centers = [np.array([-1.5 + 3.0 * s_, 0, 0], np.float32)
               for s_ in range(n_submaps)]
    bound_local = np.array([[-3.0, 3.0], [-3.0, 3.0], [-1.8, 1.8]], np.float32)
    cfg_model = {
        "spatial_dim": 3,
        "grid": {"type": "regular", "feature_dim": 4, "init_stddev": 1e-4,
                 "bound": bound_local.tolist(), "base_cell_size": 0.75,
                 "per_level_scale": 5.0, "n_levels": 2},
        "decoder": {"type": "mlp", "hidden_dim": 32, "hidden_layers": 1,
                    "out_dim": 1, "pos_invariant": True, "fix": False,
                    "pretrained_model": None},
        "pose": {"optimize": True, "num_poses": 1},
    }
    loss_fn = make_loss(tsdf_loss_3d, sdf_weight=3e3, sign_weight=1e2,
                        eik_weight=0.0, trunc_dist=0.3)
    ds_all = Sdf3D(mesh, batch_size=2**13, total_samples=2**16, trunc_dist=0.3)
    pre = create_grid_net(jax.random.PRNGKey(11),
                          dict(cfg_model,
                               grid=dict(cfg_model["grid"],
                                         bound=ds_all.bound.tolist())))
    dec = GridTrainer({"optimizer": "adam", "learning_rate": 5e-3,
                       "epochs": 250, "max_epochs_in_level": 80,
                       "grid_training_mode": "coordinate+joint"},
                      pre, loss_fn, ds_all).train().decoder
    cfg_model["decoder"]["fix"] = True
    atlas = GridAtlas(cfg_model, max_kfs_per_submap=1)
    for c in centers:
        atlas.add_submap(bound_local, np.eye(3, dtype=np.float32), c)
        atlas.add_kf()
    atlas.params = atlas.params.replace(decoder=dec)

    class LocalSdf:
        def __init__(self, center):
            self.center = center

        def sample(self, rng):
            b = ds_all.sample(rng)
            c = b["coords"] - self.center
            inside = np.all((c >= bound_local[:, 0]) & (c <= bound_local[:, 1]),
                            axis=1, keepdims=True)
            return {"coords": c.astype(np.float32), "sdf": b["sdf"],
                    "sdf_valid": b["sdf_valid"] * inside,
                    "sdf_sign": b["sdf_sign"] * inside,
                    "sdf_signs": b["sdf_signs"] * inside}

    for s_, c in enumerate(centers):
        g = atlas.get_submap(s_).replace(decoder=dec, decoder_fixed=True)
        tr = GridTrainer({"optimizer": "adam", "learning_rate": 5e-3,
                          "epochs": 250, "max_epochs_in_level": 80,
                          "grid_training_mode": "coordinate+joint"},
                         g, loss_fn, LocalSdf(c))
        atlas.set_submap(s_, tr.train())

    class SyntheticSubmapObs:
        """Per-submap observation sets for the vfpp/mips baselines."""

        def __init__(self):
            self.centers = centers

        def observations(self, s_, rng, n=8192):
            b = ds_all.sample(rng)
            c = (b["coords"] - centers[s_]).astype(np.float32)
            inside = np.all((c >= bound_local[:, 0]) & (c <= bound_local[:, 1]),
                            axis=1)
            sel = np.flatnonzero(inside)[:n]
            return c[sel], b["sdf"][sel], b["sdf_valid"][sel]

        def true_submap_pose(self, s_):
            return np.eye(3, dtype=np.float32), centers[s_]

    return atlas, SyntheticSubmapObs()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--atlas", default=None, help="grid_atlas.npz from build_submaps")
    p.add_argument("--save_dir", default="./results/align_submaps")
    p.add_argument("--method", default="miso",
                   choices=["miso", "vfpp", "mips", "icp"])
    p.add_argument("--feature_levels", type=int, nargs="*", default=[0, 1])
    p.add_argument("--use_sdf", action="store_true")
    p.add_argument("--iters", type=int, default=150)
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--save_animation", action="store_true",
                   help="dump per-iteration submap poses + rendered PNG "
                        "frames (reference align_submaps.py:186-237)")
    p.add_argument("--noise_deg", type=float, default=3.0)
    p.add_argument("--noise_m", type=float, default=0.15)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    import jax.numpy as jnp

    from miso_tpu.align.miso import (align_multiple_submaps_hierarchical,
                                     generic_align_multiple_submaps)
    from miso_tpu.ops import se3

    os.makedirs(args.save_dir, exist_ok=True)
    atlas, ds = build_synthetic_atlas(args.seed)
    S = atlas.num_submaps
    gt_R = np.stack([ds.true_submap_pose(s)[0] for s in range(S)])
    gt_t = np.stack([ds.true_submap_pose(s)[1] for s in range(S)])

    # Perturb all submaps except 0 (align_submaps.py:265-273).
    rng = np.random.default_rng(args.seed)
    for s in range(1, S):
        axis = rng.standard_normal(3)
        axis /= np.linalg.norm(axis)
        dr = axis * np.radians(args.noise_deg)
        dt = rng.standard_normal(3)
        dt = dt / np.linalg.norm(dt) * args.noise_m
        atlas.set_submap_pose_correction(s, dr.astype(np.float32),
                                         dt.astype(np.float32))

    def pose_errors():
        R, t = atlas.params.updated_submap_poses()
        rot = float(se3.rotation_rmse_deg(jnp.asarray(R[1:]), jnp.asarray(gt_R[1:])))
        tr = float(np.sqrt(((np.asarray(t[1:]) - gt_t[1:]) ** 2).sum(-1).mean()))
        return rot, tr

    rot0, tr0 = pose_errors()
    print(f"BEFORE: rot RMSE {rot0:.3f} deg, trans RMSE {tr0:.3f} m")

    t0 = time.time()
    align_info = None
    if args.method == "miso":
        align_info = align_multiple_submaps_hierarchical(
            atlas, level_iters=args.iters, finetune_iters=args.iters,
            lr=args.lr, align_loss="L2", latent_levels=args.feature_levels,
            skip_finetune=not args.use_sdf, verbose=False, seed=args.seed,
            save_iterations=args.save_animation)
    elif args.method in ("vfpp", "mips"):
        from miso_tpu.align.baselines import pairwise_loss_mips, pairwise_loss_vfpp

        rngb = np.random.default_rng(args.seed)
        obs = {}
        for s in range(S):
            c, g, v = ds.observations(s, rngb)
            obs[s] = (jnp.asarray(c), jnp.asarray(g), jnp.asarray(v))

        fn = pairwise_loss_vfpp if args.method == "vfpp" else pairwise_loss_mips
        def pair_loss(params, s, d, key, ctx):
            c, g, v = ctx[s]
            kw = {"trunc_dist": 0.3} if args.method == "vfpp" else                 {"surf_tol": 0.02}
            return fn(params, atlas, s, d, c, g, v, key=key,
                      subsample_points=4096, **kw)

        align_info = generic_align_multiple_submaps(
            atlas, pair_loss, num_iters=args.iters, lr=args.lr,
            seed=args.seed, save_iterations=args.save_animation,
            loss_ctx=obs)
    elif args.method == "icp":
        from miso_tpu.align.baselines import align_multiple_submaps_icp

        align_multiple_submaps_icp(atlas)
    elapsed = time.time() - t0

    if args.save_animation and align_info is None:
        print("--save_animation: no iteration history for method "
              f"'{args.method}' (not an iterative pose optimizer); skipped.")
    if args.save_animation and align_info is not None:
        from miso_tpu.utils.atlas_vis import render_alignment_animation

        # Concatenate phase histories (hierarchical returns one dict per
        # latent level / sdf finetune phase).
        histories = []
        if "iteration_results" in align_info:
            histories.append(align_info["iteration_results"])
        else:
            for key in align_info:
                sub = align_info[key]
                if isinstance(sub, dict) and sub.get("iteration_results"):
                    histories.append(sub["iteration_results"])
        frames = [T for h in histories for _, T in sorted(h.items())]
        render_alignment_animation(atlas, frames,
                                   os.path.join(args.save_dir, "animation"))

    rot1, tr1 = pose_errors()
    print(f"AFTER ({args.method}): rot RMSE {rot1:.3f} deg, "
          f"trans RMSE {tr1:.3f} m  [{elapsed:.1f}s]")
    with open(os.path.join(args.save_dir, "results.json"), "w") as f:
        json.dump({"method": args.method,
                   "feature_levels": args.feature_levels,
                   "use_sdf": args.use_sdf,
                   "rot_rmse_deg_before": rot0, "rot_rmse_deg_after": rot1,
                   "trans_rmse_m_before": tr0, "trans_rmse_m_after": tr1,
                   "align_time_sec": elapsed}, f, indent=2)


if __name__ == "__main__":
    main()
