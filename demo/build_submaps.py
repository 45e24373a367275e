#!/usr/bin/env python
"""Multi-submap mapping with known poses (reference `demo/build_submaps.py`).

Dry-runs the SLAM System with tracking/mapping disabled to build the
submap/keyframe structure (build_submaps.py:46-73), then maps each
submap independently with a 300-iteration coarse-to-fine GridTrainer
(build_submaps.py:76-91), extracts per-submap + global meshes, and
saves the atlas checkpoint (grid_atlas.npz).

--synthetic runs on a procedural scene with a simulated sensor; with
real data, point --config at configs/rgbd/scannet.yaml.
"""
import argparse
import copy
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/rgbd/scannet.yaml")
    p.add_argument("--save_dir", default="./results/build_submaps")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--iters_per_level", type=int, default=50)
    p.add_argument("--mesh_resolution", type=int, default=256)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from miso_tpu.config import cfg_dataset, load_config
    from miso_tpu.models.grid_atlas import GridAtlas
    from miso_tpu.slam.mapper import Mapper
    from miso_tpu.slam.system import System
    from miso_tpu.train.checkpoint import save_pytree
    from miso_tpu.utils.sdf import save_mesh

    os.makedirs(args.save_dir, exist_ok=True)
    cfg = load_config(args.config)

    if args.synthetic:
        from miso_tpu.datasets.sequence import SdfSequence, orbit_trajectory
        from miso_tpu.datasets.shapes import room_scene
        from miso_tpu.native import TriangleMesh

        verts, tris = room_scene(5.0, seed=0)
        mesh_gt = TriangleMesh(verts, tris)
        R, t = orbit_trajectory([0, 0, 0], 1.8, 1.4, 24, look_at=[0, 0, -0.5])
        dataset = SdfSequence(mesh_gt, R, t, frame_samples=2**12,
                              frame_batchsize=2048, trunc_dist=0.3,
                              near_surface_std=0.1)
        cfg["system"].update({"submap_size": 8,
                              "submap_local_bound": [[-3.5, 3.5], [-3.5, 3.5],
                                                     [-2.0, 2.0]]})
        cfg["model"]["grid"].update({"base_cell_size": 1.0,
                                     "per_level_scale": 4.0,
                                     "bound": [[-3.5, 3.5], [-3.5, 3.5],
                                               [-2.0, 2.0]]})
        cfg["model"]["decoder"].update({"fix": False, "pretrained_model": None,
                                        "hidden_dim": 32})
        cfg["mapping"].update({"trunc_dist": 0.3, "finite_diff_eps": 0.05,
                               "eik_trunc_dist": 0.3, "weight_fs": 0.2,
                               "learning_rate": 3e-3})
        cfg["model"]["pose"]["num_poses"] = 8
    else:
        dataset = cfg_dataset(cfg)

    # Phase 1: structure-only dry run (tracking+mapping disabled,
    # build_submaps.py:46-73).
    cfg_dry = copy.deepcopy(cfg)
    cfg_dry["tracking"]["disable"] = True
    cfg_dry["mapping"]["disable"] = True
    cfg_dry["visualizer"] = {"enable": False}
    atlas = GridAtlas(cfg["model"],
                      max_kfs_per_submap=cfg["system"]["submap_size"],
                      capacity=cfg["system"].get("submap_capacity"))
    R0, t0 = dataset.noisy_kf_pose_in_world(0)
    system = System(atlas, dataset, dataset, cfg_dry,
                    R_world_origin=R0, t_world_origin=t0)
    system.run()
    print(f"Built structure: {atlas.num_submaps} submaps, "
          f"{atlas.num_keyframes} keyframes")

    # Phase 2: per-submap mapping with GT poses (build_submaps.py:76-91).
    t_start = time.time()
    for s in range(atlas.num_submaps):
        kfs = [k for k in range(atlas.num_keyframes)
               if atlas.submap_id_for_kf(k) == s]
        grid = atlas.get_submap(s)
        mapper = Mapper(grid, dataset, cfg)
        mapper.mapping(kfs, iterations=args.iters,
                       level_iterations=args.iters_per_level)
        atlas.set_submap(s, mapper.grid)
        sub = atlas.get_submap(s)
        save_mesh(sub, sub.bound,
                  os.path.join(args.save_dir, f"submap{s}", "mesh_submap.ply"),
                  resolution=128)
        print(f"submap {s}: mapped {len(kfs)} KFs")
    elapsed = time.time() - t_start

    # Global mesh + checkpoint (build_submaps.py:125-141).
    save_mesh(atlas.params, atlas.global_bound(),
              os.path.join(args.save_dir, "mesh_final.ply"),
              resolution=args.mesh_resolution)
    save_pytree(os.path.join(args.save_dir, "grid_atlas.npz"), atlas.params,
                meta={"num_submaps": atlas.num_submaps,
                      "num_keyframes": atlas.num_keyframes,
                      "anchor_kfs": [atlas.anchor_kf_for_submap(s)
                                     for s in range(atlas.num_submaps)],
                      "kf_to_submap": [atlas.submap_id_for_kf(k)
                                       for k in range(atlas.num_keyframes)]})
    with open(os.path.join(args.save_dir, "results.json"), "w") as f:
        json.dump({"num_submaps": atlas.num_submaps,
                   "num_keyframes": atlas.num_keyframes,
                   "mapping_time_sec": elapsed}, f, indent=2)
    print(f"Saved atlas + meshes to {args.save_dir} "
          f"(mapping {elapsed:.1f}s)")


if __name__ == "__main__":
    main()
