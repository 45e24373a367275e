"""SLAM orchestrator (reference `grid_opt/slam/system.py`).

Host-side per-frame control flow (submap spawning, odometry
propagation, replay-window selection) around jitted tracking / mapping
bursts.  The per-frame loop:

  while frames remain:
    spawn new submap if KF count or FOV-overlap triggers (system.py:118-123)
    propagate odometry to initialize the next KF       (system.py:98-116)
    tracker.track(head_kf)                             (LM or Adam)
    mapper.mapping(replay window + head)               (system.py:187-196)
    visualizer artifacts
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from miso_tpu.datasets.base import SubmapDataset
from miso_tpu.models.grid_atlas import GridAtlas
from miso_tpu.ops import se3
from miso_tpu.slam.mapper import Mapper
from miso_tpu.slam.tracker import Tracker
from miso_tpu.slam.visualizer import Visualizer
from miso_tpu.utils.sdf import save_mesh


def quantized_local_bound(world_bound, t_anchor) -> np.ndarray:
    """World box translated to a submap frame with dyadic quantization.

    (quantized center) +- (quantized half-extent), both exact multiples
    of 2^-10 m, so extents -- and hence grid_shape_for_bound results --
    are bit-identical for every anchor.  A raw float32 ``bound -
    t_anchor`` perturbs extents by ~1e-6 and can cross a ceil boundary,
    giving submaps DIFFERENT grid shapes: every shape-keyed executable
    (tracking, mapping, alignment precompute) then recompiles per
    submap at aged-process compile cost (measured (46,46,12) vs
    (46,47,12) on the quad run).  Demos prewarming with a throwaway
    atlas must build its bounds through this same function.
    """
    b = np.asarray(world_bound, np.float64)
    q = 1.0 / 1024.0
    e = np.round((b[:, 1] - b[:, 0]) / 2.0 / q) * q
    c = np.round((b.mean(axis=1)
                  - np.asarray(t_anchor, np.float64).reshape(3)) / q) * q
    return np.stack([c - e, c + e], axis=1).astype(np.float32)


class System:
    def __init__(self, model: GridAtlas, dataset_track: SubmapDataset,
                 dataset_map: SubmapDataset, cfg: Dict,
                 R_world_origin=None, t_world_origin=None, verbose=True,
                 encoder=None):
        assert model.num_submaps == 0, "Input grid atlas is not empty."
        self.model = model
        self.cfg = cfg
        self.verbose = verbose
        self.dataset_track = dataset_track
        self.dataset_map = dataset_map
        self.max_replay_frames = cfg["mapping"].get("max_replay_frames", 10)
        self.max_replay_freq = cfg["mapping"].get("max_replay_freq", 10)
        # Per-frame / init-burst mapping budgets (reference hardcodes
        # 15/5 and 50/20, system.py:92-96,187-196).
        self.map_iters = cfg["mapping"].get("iters_per_frame", 15)
        self.map_level_iters = cfg["mapping"].get("level_iters_per_frame", 5)
        self.init_iters = cfg["mapping"].get("init_iterations", 50)
        # Amortized submap initialization (the MISO encoder,
        # local_opt.py:17-54): when an Encoder is passed and
        # system.submap_init_mode == "encode", new submaps start from the
        # encoder's one-shot feature prediction on the anchor KF's
        # observations, and the init mapping burst shrinks to
        # mapping.init_iterations_encode (default init_iterations // 3).
        self.encoder = encoder
        self.init_mode = cfg["system"].get("submap_init_mode", "zero")
        self.init_iters_encode = cfg["mapping"].get(
            "init_iterations_encode", max(self.init_iters // 3, 1))
        self.encoder_info = []  # per-spawn {'encoder_time': s}
        self._enc_rng = np.random.default_rng(
            cfg["system"].get("encoder_seed", 17))
        self.init_odom = cfg["system"].get("init_odom", "external")
        self.log_dir = cfg["system"].get("log_dir", "./results/default")
        # Per-frame stage breakdown (cfg system.profile: true).  The
        # summary's medians are the compile-excluded steady state
        # (utils/profiling.StageProfiler).
        self.profiler = None
        if cfg["system"].get("profile", False):
            from miso_tpu.utils.profiling import StageProfiler

            self.profiler = StageProfiler()
        self.initialize_system(R_world_origin, t_world_origin)

    def profile_summary(self):
        return self.profiler.summary() if self.profiler else None

    # -- helpers -----------------------------------------------------------
    def current_kf_id(self) -> int:
        return self.model.curr_kf_id

    def _sync_submap_from_tracker_mapper(self):
        """Full write of the current submap (features + poses) back to
        the atlas.  Boundary-only: submap spawn, checkpoint, visualizer
        mesh frames, end of run.  Per frame, only poses move in the
        atlas's view (tracking + odometry); features live in the
        mapper's grid until the next boundary -- the full stacked-slot
        write costs a capacity-sized storage pass and was 0.9 s/frame
        at quad scale."""
        s = self.model.curr_submap_id
        self.model.set_submap(s, self.mapper.grid)
        self._features_synced = True

    def _sync_poses_from_tracker(self):
        """Per-frame pose-rows-only sync (cheap)."""
        s = self.model.curr_submap_id
        self.model.set_submap_poses(s, self.tracker.grid)
        self._features_synced = False

    def ensure_full_sync(self):
        """Make the atlas's stacked storage current before any reader
        of submap FEATURES (fusion, meshing, checkpoints)."""
        if not getattr(self, "_features_synced", True):
            self._sync_submap_from_tracker_mapper()

    def _fresh_tracker_mapper(self):
        s = self.model.curr_submap_id
        grid = self.model.get_submap(s)
        self.tracker = Tracker(grid, self.dataset_track, self.cfg)
        self.mapper = Mapper(grid, self.dataset_map, self.cfg)

    def _push_grid(self):
        """Keep tracker and mapper on the same grid object."""
        self.mapper.grid = self.tracker.grid

    def _encode_init_current_submap(self):
        """One-shot amortized init of the fresh submap's features from
        the anchor KF's observations (reference local_opt.py:17-54 via
        Encoder.predict_corrections, encoder.py:134-164).

        The observation batch comes from the mapping dataset's normal
        per-KF sampler (fixed shape for a 1-KF selection, so the jitted
        encoder predict compiles once for the whole run in world-bound
        mode where every submap's grid shapes are identical)."""
        from miso_tpu.models.encoder import EncoderObservation
        from miso_tpu.train.local_opt import initialize_grid_net

        kf = self.current_kf_id()
        ds = self.dataset_map
        ds.select_keyframes([kf])
        batch = ds.sample(self._enc_rng)
        ds.unselect_keyframes()
        grid = self.mapper.grid
        # Anchor KF pose in the submap frame (local id 0 of the fresh
        # submap; in axis-aligned mode it carries the world rotation).
        R, t = grid.updated_kf_pose(kf - int(grid.anchor_kf))
        coords = se3.transform_points_to(jnp.asarray(batch["coords_frame"]),
                                         R, t)
        obs = EncoderObservation(
            coords_world=coords,
            gt_sdf=jnp.asarray(batch["sdf"]),
            gt_sdf_sign=jnp.asarray(batch["sdf_signs"]),
            gt_sdf_valid=jnp.asarray(batch["sdf_valid"]))
        grid, info = initialize_grid_net(grid, init_mode="encode",
                                         encoder=self.encoder,
                                         encoder_observation=obs)
        # Drop the registration: Encoder.grids would otherwise pin every
        # spawned submap's zero-feature buffers in HBM for the whole run.
        self.encoder.grids.clear()
        self.encoder_info.append(
            {"submap": self.model.curr_submap_id,
             "encoder_time": info["total_encoder_time"]})
        self.mapper.grid = grid
        self.tracker.grid = grid

    def _submap_local_bound(self, t_anchor) -> np.ndarray:
        """Per-submap local bound.  Two modes (system.py:125-139):

        * ``submap_local_bound``: a fixed box in the submap frame
          (anchor-centered coverage).
        * ``submap_world_bound``: a fixed WORLD box; the local bound is
          that box translated by -t_anchor, so every submap covers the
          whole site -- the reference's heavy-overlap regime (its
          ncd_quad submaps use a 90x90x20 m bound over a 62x73 m site,
          ncd_quad.yaml:68, keeping tracking fov~1 everywhere).  All
          submaps share the box EXTENTS, so grid shapes stay identical
          and nothing recompiles.  Requires axis-aligned submap frames.
        """
        wb = self.cfg["system"].get("submap_world_bound")
        if wb is None:
            return np.asarray(self.cfg["system"]["submap_local_bound"],
                              np.float32)
        assert self.cfg["system"].get("submap_axis_aligned", False), \
            "submap_world_bound requires system.submap_axis_aligned"
        # Construct the translated box as (quantized center) +- (quantized
        # half-extent), both exact multiples of 2^-10 m: a raw float32
        # `bound - t_anchor` perturbs the extents by ~1e-6, which can
        # cross a grid_shape_for_bound ceil boundary and give submaps
        # DIFFERENT grid shapes -- every shape-keyed executable
        # (tracking, mapping, alignment precompute) then recompiles per
        # submap, at aged-process compile cost (measured (46,46,12) vs
        # (46,47,12) on the quad run).  Dyadic values are float32-exact,
        # so extents -- and shapes -- are bit-identical for every anchor.
        return quantized_local_bound(wb, t_anchor)

    # -- lifecycle (system.py:58-96) ---------------------------------------
    def initialize_system(self, Rws=None, tws=None):
        Rws = np.eye(3, dtype=np.float32) if Rws is None else np.asarray(Rws)
        tws = np.zeros(3, np.float32) if tws is None else np.asarray(tws).reshape(3)
        local_bound = self._submap_local_bound(tws)
        if self.cfg["system"].get("submap_axis_aligned", False):
            self.model.add_submap(local_bound, np.eye(3, dtype=np.float32),
                                  tws, num_poses=self.cfg["system"]["submap_size"])
            self.model.add_kf(Rws, np.zeros(3, dtype=np.float32))
            self._after_init()
            return
        self.model.add_submap(local_bound, Rws, tws,
                              num_poses=self.cfg["system"]["submap_size"])
        self.model.add_kf()  # anchor at identity in submap
        self._after_init()

    def _after_init(self):
        self._fresh_tracker_mapper()
        iters = self.init_iters
        if self.encoder is not None and self.init_mode == "encode":
            self._encode_init_current_submap()
            iters = self.init_iters_encode
        slots = self.max_replay_frames + 1
        self.mapper.mapping([self.current_kf_id()] * slots,
                            iterations=iters,
                            level_iterations=max(iters // 3, 1))
        self.tracker.grid = self.mapper.grid
        self._sync_submap_from_tracker_mapper()
        self.visualizer = Visualizer(self.model, cfg=self.cfg)
        self.first_frame_in_submap = 0

    def initialize_next_kf_in_submap(self):
        """Odometry propagation inside the current submap (system.py:98-116)."""
        dst = self.current_kf_id() + 1
        src = dst - 1
        s = self.model.curr_submap_id
        grid = self.tracker.grid
        R_src, t_src = grid.updated_kf_pose(src - int(grid.anchor_kf))
        T_ss = np.asarray(se3.pose_matrix(R_src, t_src))
        if self.init_odom == "external":
            T_sd = np.asarray(self.dataset_track.get_odometry_at_pose(src))
        elif self.init_odom == "static":
            T_sd = np.eye(4, dtype=np.float32)
        else:
            raise ValueError(f"Unknown odometry type: {self.init_odom}")
        T = T_ss @ T_sd
        self.model.add_kf(T[:3, :3], T[:3, 3])
        # Mirror into the live grid object.
        new_grid = self.tracker.grid.set_initial_kf_pose(
            dst - self.model.anchor_kf_for_submap(s),
            jnp.asarray(T[:3, :3]), jnp.asarray(T[:3, 3]))
        self.tracker.grid = new_grid
        self.mapper.grid = new_grid

    def should_create_new_submap(self) -> bool:
        s = self.model.curr_submap_id
        if self.model.num_keyframes_in_submap(s) >= self.cfg["system"]["submap_size"]:
            return True
        if self.tracker.latest_fov_overlap < self.cfg["system"]["submap_fov_thresh"]:
            return True
        return False

    def initialize_next_submap(self):
        """New submap anchored at the odometry-propagated world pose
        (system.py:125-163)."""
        import time as _time

        _marks = [("start", _time.perf_counter())]

        def _mark(name, sync=None):
            if sync is not None:
                jax.block_until_ready(sync)
            _marks.append((name, _time.perf_counter()))

        self._sync_submap_from_tracker_mapper()
        _mark("sync_before", self.model.params.features)
        dst = self.current_kf_id() + 1
        src = dst - 1
        R_src, t_src = self.model.params.updated_kf_pose_in_world(src)
        T_ws = np.asarray(se3.pose_matrix(R_src, t_src))
        T_sd = np.asarray(self.dataset_track.get_odometry_at_pose(src))
        T_wd = T_ws @ T_sd
        local_bound = self._submap_local_bound(T_wd[:3, 3])
        if self.cfg["system"].get("submap_axis_aligned", False):
            # Anchor the submap frame axis-aligned with the world (the
            # anchor KF then carries its rotation as an in-submap pose).
            # Keeps scene planes aligned with the grid axes when world
            # gravity-alignment is meaningful (LiDAR rigs, ncd_quad).
            self.model.add_submap(local_bound, np.eye(3, dtype=np.float32),
                                  T_wd[:3, 3],
                                  num_poses=self.cfg["system"]["submap_size"])
            kf_id = self.model.add_kf(T_wd[:3, :3],
                                      np.zeros(3, dtype=np.float32))
        else:
            self.model.add_submap(local_bound, T_wd[:3, :3], T_wd[:3, 3],
                                  num_poses=self.cfg["system"]["submap_size"])
            kf_id = self.model.add_kf()  # identity in new submap
        assert kf_id == dst
        _mark("add_submap", self.model.params.features)
        self._fresh_tracker_mapper()
        _mark("fresh_tm", self.tracker.grid.features)
        iters = self.init_iters
        if self.encoder is not None and self.init_mode == "encode":
            self._encode_init_current_submap()
            _mark("encode_init", self.mapper.grid.features)
            iters = self.init_iters_encode
        slots = self.max_replay_frames + 1
        self.mapper.mapping([self.current_kf_id()] * slots,
                            iterations=iters,
                            level_iterations=max(iters // 3, 1))
        _mark("init_mapping", self.mapper.grid.features)
        self.tracker.grid = self.mapper.grid
        self._sync_submap_from_tracker_mapper()
        _mark("sync_after", self.model.params.features)
        if self.profiler is not None:
            parts = " ".join(f"{n}={1e3 * (t1 - t0):.0f}ms" for (_, t0), (n, t1)
                             in zip(_marks, _marks[1:]))
            print(f"[spawn submap {self.model.curr_submap_id}] {parts}",
                  flush=True)

    # -- checkpoint / resume (beyond the reference, which cannot resume a
    # SLAM run mid-stream: SURVEY.md section 5) --------------------------------
    def save_checkpoint(self, path: str):
        from miso_tpu.train.checkpoint import save_pytree

        self._sync_submap_from_tracker_mapper()
        p = self.model.params
        save_pytree(path, p, meta={
            "curr_kf_id": self.model.curr_kf_id,
            "curr_submap_id": self.model.curr_submap_id,
            "kf_to_submap": list(self.model._kf_to_submap),
            "max_kfs": self.model.max_kfs,
            "bounds": np.asarray(p.bounds).tolist(),
            "first_frame_in_submap": self.first_frame_in_submap,
        })

    def load_checkpoint(self, path: str):
        """Resume from a save_checkpoint npz: replay the submap/KF
        structure so the atlas' padded stacked storage gets the exact
        checkpointed shapes, then load the arrays over it."""
        from miso_tpu.train.checkpoint import load_meta, load_pytree

        meta = load_meta(path)
        m = self.model
        bounds = np.asarray(meta["bounds"], np.float32)
        kf2sub = [int(v) for v in meta["kf_to_submap"]]
        m.params = None
        m._submap_shapes, m._anchor_kf, m._kf_to_submap = [], [], []
        m.curr_submap_id = m.curr_kf_id = -1
        m.max_kfs = 1
        for s in range(len(bounds)):
            m.add_submap(bounds[s], num_poses=int(meta["max_kfs"]))
            for _ in [k for k, ss in enumerate(kf2sub) if ss == s]:
                m.add_kf()
        m.params = load_pytree(path, like=m.params)
        m.curr_kf_id = int(meta["curr_kf_id"])
        m.curr_submap_id = int(meta["curr_submap_id"])
        self.first_frame_in_submap = int(meta["first_frame_in_submap"])
        self._fresh_tracker_mapper()

    # -- main loop (system.py:166-202) ---------------------------------------
    def run(self, max_frames: Optional[int] = None):
        assert self.current_kf_id() >= 0, "Call initialize_system() first."
        stop = self.dataset_map.num_kfs if max_frames is None else \
            min(self.dataset_map.num_kfs, max_frames)
        import contextlib

        prof = self.profiler

        def stage(name, sync=None):
            return prof.stage(name, sync) if prof else contextlib.nullcontext()

        while self.model.num_keyframes < stop:
            if self.should_create_new_submap():
                if self.cfg["system"].get("save_submap_mesh", False):
                    s = self.model.curr_submap_id
                    grid = self.tracker.grid
                    save_mesh(grid, grid.bound,
                              os.path.join(self.log_dir, f"submap_{s}.ply"),
                              resolution=256)
                if prof:
                    prof.start_frame(self.current_kf_id() + 1)
                    prof.mark("new_submap")
                    with prof.stage("submap_init",
                                    sync=lambda: self.mapper.grid.features):
                        self.initialize_next_submap()
                    prof.end_frame()
                else:
                    self.initialize_next_submap()
                self.first_frame_in_submap = self.current_kf_id()
                continue
            if prof:
                prof.start_frame(self.current_kf_id() + 1)
            with stage("odom"):
                self.initialize_next_kf_in_submap()
            head_kf = self.current_kf_id()
            with stage("track", sync=lambda: self.tracker.grid.rot_corr):
                self.tracker.track(optimize_kf=head_kf)
            if prof:
                prof.add("track_sample", self.tracker.last_sample_time)
            self._push_grid()
            # Replay window (system.py:190-196), padded to a FIXED slot
            # count: on TPU a varying keyframe count would recompile the
            # mapping step per window size; repeating keyframes into the
            # spare slots keeps one compiled shape for the whole run.
            replay_freq = max((head_kf - self.first_frame_in_submap) // self.max_replay_frames,
                              self.max_replay_freq)
            mapping_kfs = list(range(self.first_frame_in_submap, head_kf, replay_freq))
            mapping_kfs.append(head_kf)
            slots = self.max_replay_frames + 1
            if len(mapping_kfs) > slots:
                mapping_kfs = mapping_kfs[-slots:]
            base = list(mapping_kfs)
            while len(mapping_kfs) < slots:
                mapping_kfs.append(base[len(mapping_kfs) % len(base)])
            with stage("map", sync=lambda: self.mapper.grid.features):
                self.mapper.mapping(mapping_kfs, iterations=self.map_iters,
                                    level_iterations=self.map_level_iters)
            if prof:
                prof.add("map_sample", self.mapper.last_sample_time)
            self.tracker.grid = self.mapper.grid
            with stage("sync", sync=lambda: self.model.params.kf_rot_corr):
                self._sync_poses_from_tracker()
            # Visualization artifacts.
            with stage("vis"):
                if self.visualizer.enable:
                    self.ensure_full_sync()
                pts = self.dataset_track.sampled_points_at_kf(head_kf)
                self.visualizer.set_current_frame_points(np.asarray(pts))
                self.visualizer.update_geometries(stop_frame=head_kf + 1)
                self.visualizer.update_view()
            if prof:
                prof.end_frame()
            if self.verbose and head_kf % 25 == 0:
                import time as _time

                print(f"[slam] frame {head_kf}/{stop} "
                      f"submap {self.model.curr_submap_id} "
                      f"({_time.strftime('%H:%M:%S')})", flush=True)
        self.ensure_full_sync()
        self.visualizer.quit()
