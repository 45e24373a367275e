"""Global consistency: submap alignment + joint fusion refinement.

Reference `grid_opt/slam/fuser.py`: align() runs the hierarchical
latent alignment; fuse() jointly refines features / submap poses / KF
poses with separate learning rates.  Per-group LRs are mask multipliers
in one masked-Adam step (fuser.py:57-120's three param groups).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import math
import time

import numpy as np

from miso_tpu.align.miso import align_multiple_submaps_hierarchical
from miso_tpu.losses.fusion import fusion_loss
from miso_tpu.models.grid_atlas import GridAtlas, grid_atlas_mask
from miso_tpu.train.optim import masked_adam_init


class Fuser:
    def __init__(self, model: GridAtlas, dataset, cfg: Dict):
        self.atlas = model
        self.dataset = dataset
        self.cfg = cfg

    def align(self, aot_only=False):
        """``aot_only``: compile every alignment executable at the
        run's shapes without executing anything -- the prewarm path
        (an executed throwaway align at capacity scale is minutes of
        device work and faulted the worker at quad scale)."""
        c = self.cfg["align"]
        return align_multiple_submaps_hierarchical(
            self.atlas,
            aot_only=aot_only,
            level_iters=c.get("level_iters", 100),
            finetune_iters=c.get("finetune_iters", 100),
            level_thresh=0,
            lr=c.get("learning_rate", 1e-2),
            align_loss=c.get("loss_type", "L2"),
            stability_thresh=c.get("stability_thresh", 0.0),
            subsample_points=c.get("subsample_points", None),
            latent_levels=c.get("latent_levels", None),
            skip_finetune=c.get("skip_finetune", True),
            pose_reg_weight=c.get("pose_reg_weight", 0.0),
            pose_thresh_m=c.get("pose_thresh_m", 10.0),
            pose_thresh_rad=math.radians(c.get("pose_thresh_deg", 45.0)),
            verbose=c.get("verbose", False),
            save_iterations=c.get("save_iterations", False),
            max_align_points=c.get("max_points", 32768),
        )

    def _fuse_loss(self):
        from miso_tpu.losses.miso import make_loss

        c = self.cfg["mapping"]
        return make_loss(
            fusion_loss,
            loss_type=c.get("loss_type", "L1"),
            weight_sdf=c.get("weight_sdf", 1.0),
            weight_eik=c.get("weight_eik", 0.0),
            weight_fs=c.get("weight_fs", 0.1),
            trunc_dist=c.get("trunc_dist", 0.15),
            finite_diff_eps=c.get("finite_diff_eps", 1e-2),
            grad_method=c.get("grad_method", "autograd"),
            eik_trunc_dist=c.get("eik_trunc_dist", 0.1),
        )

    @staticmethod
    def _fuse_mask(params, feat_lr, submap_pose_lr, kf_pose_lr):
        return grid_atlas_mask(params, features=feat_lr > 0,
                               stability=feat_lr > 0,
                               submap_pose=submap_pose_lr > 0,
                               kf_pose=kf_pose_lr > 0,
                               anchor_first_submap=False,
                               feature_lr=feat_lr,
                               submap_pose_lr=submap_pose_lr,
                               kf_pose_lr=kf_pose_lr)

    def prewarm(self, expected_submaps: int = None,
                max_points_per_iter: int = 2 ** 19):
        """Compile the fuse-step executable NOW (fresh process).

        A cache-miss compile of the fusion step in an AGED process runs
        ~10x slower on this transport (CLAUDE.md rule 7; measured ~250 s
        inside the 90-frame demo vs tens of seconds at init).  Call
        right after the atlas reaches its final storage SHAPES (capacity
        preallocation makes that the first add_submap) with the submap
        count fuse() will see -- ``expected_submaps`` defaults to
        capacity, i.e. an untrimmed fuse.  AOT ``lower().compile()``:
        compile only, nothing executes (a speculative throwaway
        execution at full storage scale is real device work queued in
        front of everything after it -- see prewarm_extract_fields).
        """
        from miso_tpu.train.trainer import make_train_step_pool

        full = self.atlas.params
        S = expected_submaps or full.Rws.shape[0]
        # trim() never aliases the source (donation-safe) -- trim even
        # at S == capacity so the donated throwaway can't delete the
        # atlas's live buffers.
        params = full.trim(S)
        mask = self._fuse_mask(params, 1e-3, 1e-4, 1e-4)
        pool, _, n_rows, _ = self.dataset.device_pool()
        step = make_train_step_pool(self._fuse_loss(), "adam")
        step.lower(params, masked_adam_init(params), pool, n_rows,
                   jnp.int32(1), jax.random.PRNGKey(0), mask,
                   jnp.float32(0.0), int(max_points_per_iter)).compile()
        self._prewarmed_slots = S

    def fuse(self, feat_lr=1e-3, submap_pose_lr=1e-4, kf_pose_lr=1e-4,
             iterations=10, seed=0, max_points_per_iter=2 ** 19):
        """Joint refinement with per-group LRs (fuser.py:57-120).

        The base lr of the masked Adam is 1.0 and each group's rate is
        its mask multiplier, reproducing the reference's param groups.

        Dispatch shape: one jitted POOLED train step per iteration
        (trainer.make_train_step_pool): each step draws its
        ``max_points_per_iter`` rows uniformly over all keyframes' valid
        pool rows ON DEVICE -- no host sampling, no per-iteration H2D
        batch upload (the host path cost ~15 s/iter sampling at 300
        frames, and per-iter uploads add journal debt on this
        transport).  Not a scanned burst: compiling a scan whose carry
        is the multi-GB stacked atlas hard-crashed the TPU worker at
        capacity 16, and the step is compute-bound anyway.

        Storage is trimmed to the live submap slots for the refinement
        (capacity 16 / 10 live = 60% dead gather work) and scattered
        back afterwards -- unless prewarm() compiled an executable for a
        different slot count, in which case that count is reused to
        avoid an aged-process recompile (CLAUDE.md rule 7).
        """
        marks = {}
        t_all = time.perf_counter()
        self.dataset.unselect_keyframes()
        full = self.atlas.params
        S_live = self.atlas.num_submaps
        S_run = max(S_live, getattr(self, "_prewarmed_slots", 0))
        trimmed = S_run < full.Rws.shape[0]
        # ALWAYS trim (even at capacity): the pooled step donates params,
        # and trim() is the non-aliasing copy that protects the atlas's
        # own buffers from donation.
        t0 = time.perf_counter()
        params = full.trim(S_run)
        jax.block_until_ready(params.features)
        marks["trim_sec"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        mask = self._fuse_mask(params, feat_lr, submap_pose_lr, kf_pose_lr)
        opt_state = masked_adam_init(params)
        marks["mask_init_sec"] = time.perf_counter() - t0

        from miso_tpu.train.trainer import make_train_step_pool

        t0 = time.perf_counter()
        step = make_train_step_pool(self._fuse_loss(), "adam")
        pool, _, n_rows, _ = self.dataset.device_pool()
        k_live = jnp.int32(getattr(self.dataset, "num_kfs",
                                   n_rows.shape[0]))
        jax.block_until_ready(n_rows)
        marks["pool_sec"] = time.perf_counter() - t0

        key = jax.random.PRNGKey(seed)
        tl = None
        t0 = time.perf_counter()
        for i in range(iterations):
            key, sub = jax.random.split(key)
            params, opt_state, tl = step(params, opt_state, pool, n_rows,
                                         k_live, sub, mask,
                                         jnp.float32(1.0),
                                         int(max_points_per_iter))
            # Per-step VALUE read: on the axon backend only a D2H read
            # reliably waits for execution (block_until_ready can
            # return while work is still queued), so this bounds the
            # device queue to one fuse step (a >100 s pileup of queued
            # dispatches hard-faults the worker) at ~25 ms RTT/step.
            float(tl)
            if i == 0:
                # First-step wall time is the compile detector: a jit
                # cache hit costs ms, an (aged-process) cache-miss
                # compile costs tens of seconds.
                marks["step0_sec"] = time.perf_counter() - t0
                t0 = time.perf_counter()
        t_step = time.perf_counter() - t0
        t0 = time.perf_counter()
        self.atlas.params = full.scatter_trimmed(params) if trimmed else params
        jax.block_until_ready(self.atlas.params.features)
        marks["scatter_sec"] = time.perf_counter() - t0
        self.last_fuse_info = {"step_sec": t_step,
                               "iterations": iterations,
                               "points_per_iter": max_points_per_iter,
                               "trimmed_slots": int(params.Rws.shape[0]),
                               "total_sec": time.perf_counter() - t_all,
                               **marks}
        return float(tl)
