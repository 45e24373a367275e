"""Dataset protocol.

Host-side numpy sampling pipelines (exactly like the reference, where
sampling happens inside ``__getitem__`` on the host,
SURVEY.md section 2.7).  One "epoch" = one freshly sampled mega-batch.

Differences from the reference's torch DataLoader stack:
  * ``sample(rng) -> dict`` returns a single flat dict (input and gt
    merged) of FIXED-SHAPE numpy arrays -- batches never change shape,
    so the jitted train step compiles once;
  * ``sample_frame_ids`` is a flat (N,) int array consumed by a gather,
    not per-frame index ranges.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


class Dataset:
    def sample(self, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        raise NotImplementedError


class SubmapDataset(Dataset):
    """SLAM dataset API (reference `grid_opt/datasets/submap_dataset.py`).

    Batch schema (submap_dataset.py:57-75):
      coords_frame (N, 3) in keyframe frame, sample_frame_ids (N,),
      weights (N, 1); gt: sdf, sdf_valid, sdf_signs (N, 1) with signs
      -1 occupied / 0 near-surface / +1 free.
    """

    @property
    def num_kfs(self) -> int:
        raise NotImplementedError

    def get_odometry_at_pose(self, src_id: int) -> np.ndarray:
        """4x4 odometry transform T_src_dst from src_id to src_id+1."""
        raise NotImplementedError

    def sampled_points_at_kf(self, kf_id: int) -> np.ndarray:
        """(N, 3) sampled points in the keyframe's local frame."""
        raise NotImplementedError

    def select_keyframes(self, kf_ids: List[int]):
        raise NotImplementedError

    def unselect_keyframes(self):
        raise NotImplementedError

    def true_kf_pose_in_world(self, kf_id: int):
        raise NotImplementedError

    def noisy_kf_pose_in_world(self, kf_id: int):
        raise NotImplementedError
