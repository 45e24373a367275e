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

    def align(self):
        c = self.cfg["align"]
        return align_multiple_submaps_hierarchical(
            self.atlas,
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

    def fuse(self, feat_lr=1e-3, submap_pose_lr=1e-4, kf_pose_lr=1e-4,
             iterations=10, seed=0, max_points_per_iter=2 ** 19):
        """Joint refinement with per-group LRs (fuser.py:57-120).

        The base lr of the masked Adam is 1.0 and each group's rate is
        its mask multiplier, reproducing the reference's param groups.

        Dispatch shape: one jitted train STEP per iteration, not a
        scanned burst.  The fusion step is compute-bound (S x N row
        gathers / scatter-adds over the stacked storage, seconds per
        step at production scale), so scan's dispatch amortization buys
        nothing here -- and compiling a scan whose carry is the
        multi-GB stacked atlas hard-crashed the TPU worker at
        capacity 16 (isolated in repro: the identical single step
        compiles and runs fine; the k=8 scan kills the worker).
        Mapping/tracking keep their scanned bursts: their grids are
        per-submap and their steps are dispatch-bound.

        Storage is trimmed to the live submap slots for the whole
        refinement (capacity 16 / 10 live = 60% dead gather work) and
        scattered back afterwards.

        ``max_points_per_iter``: random row cap per iteration batch (a
        full-sequence sample is frame_batchsize x num_kfs x augmentation
        rows, ~2.6M on a 300-frame run).  To keep the HOST sampling cost
        bounded too, each iteration first selects a random keyframe
        subset of ceil(max_points_per_iter / frame_batchsize) kfs and
        samples only those (full-sequence numpy sampling dominated fuse
        wall-clock at 300 frames: ~15 s/iter host vs ~3 s device).
        """
        self.dataset.unselect_keyframes()
        full = self.atlas.params
        S_live = self.atlas.num_submaps
        trimmed = S_live < full.Rws.shape[0]
        params = full.trim(S_live) if trimmed else full
        mask = grid_atlas_mask(params, features=feat_lr > 0, stability=feat_lr > 0,
                               submap_pose=submap_pose_lr > 0,
                               kf_pose=kf_pose_lr > 0,
                               anchor_first_submap=False,
                               feature_lr=feat_lr,
                               submap_pose_lr=submap_pose_lr,
                               kf_pose_lr=kf_pose_lr)
        c = self.cfg["mapping"]
        loss_kwargs = dict(
            loss_type=c.get("loss_type", "L1"),
            weight_sdf=c.get("weight_sdf", 1.0),
            weight_eik=c.get("weight_eik", 0.0),
            weight_fs=c.get("weight_fs", 0.1),
            trunc_dist=c.get("trunc_dist", 0.15),
            finite_diff_eps=c.get("finite_diff_eps", 1e-2),
            grad_method=c.get("grad_method", "autograd"),
            eik_trunc_dist=c.get("eik_trunc_dist", 0.1),
        )
        opt_state = masked_adam_init(params)

        from miso_tpu.losses.miso import make_loss
        from miso_tpu.train.trainer import make_train_step

        loss_fn = make_loss(fusion_loss, **loss_kwargs)
        step = make_train_step(loss_fn, "adam")
        rng = np.random.default_rng(seed)

        num_kfs = getattr(self.dataset, "num_kfs", None)
        B = getattr(self.dataset, "frame_batchsize", None)
        kf_cap = None
        if max_points_per_iter and num_kfs and B:
            kf_cap = max(1, -(-max_points_per_iter // int(B)))

        def capped_sample():
            if kf_cap and num_kfs > kf_cap:
                sel = rng.choice(num_kfs, kf_cap, replace=False)
                self.dataset.select_keyframes([int(x) for x in sel])
            b = self.dataset.sample(rng)
            n = len(next(iter(b.values())))
            if max_points_per_iter and n > max_points_per_iter:
                idx = rng.choice(n, max_points_per_iter, replace=False)
                b = {k: np.asarray(v)[idx] for k, v in b.items()}
            return {k: jnp.asarray(np.asarray(v)) for k, v in b.items()}

        key = jax.random.PRNGKey(seed)
        tl = None
        t_sample = 0.0
        t_step = 0.0
        for _ in range(iterations):
            t0 = time.perf_counter()
            batch = capped_sample()
            t_sample += time.perf_counter() - t0
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            params, opt_state, tl, _ = step(params, opt_state, batch, sub,
                                            mask, jnp.float32(1.0))
            tl.block_until_ready()
            t_step += time.perf_counter() - t0
        self.dataset.unselect_keyframes()
        self.atlas.params = full.scatter_trimmed(params) if trimmed else params
        self.last_fuse_info = {"sample_sec": t_sample, "step_sec": t_step,
                               "iterations": iterations,
                               "points_per_iter": max_points_per_iter,
                               "trimmed_slots": int(params.Rws.shape[0])}
        return float(tl)
