"""miso_tpu: a TPU-native neural implicit SLAM and mapping framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
ExistentialRobotics/MISO (RSS 2025): multiresolution submap SDF mapping,
online SLAM (tracking + mapping), hierarchical latent-space submap
alignment, learned encoder initialization, meshing and evaluation.

Key architectural differences from the CUDA/torch reference:
  * Models are immutable pytrees; optimization state (lock/unlock,
    coarse-to-fine level schedules, per-pose freezing) is expressed as
    runtime mask pytrees consumed by a masked optimizer -- one compiled
    train step serves every training phase.
  * Trilinear interpolation is a gather+lerp in index space that is
    arbitrarily differentiable under jax.grad; the reference's 850-line
    CUDA double-backward grid_sample extension is unnecessary.
  * Per-keyframe / per-submap Python loops are replaced by batched
    gathers and einsums; submaps are stacked on a leading axis and
    vmapped / shard_mapped across TPU devices.
  * The native runtime (marching cubes, BVH signed distance + ray
    casting, voxel ops) is C++ exposed through ctypes, replacing
    mcubes / pysdf / open3d host dependencies.
"""

__version__ = "0.1.0"

from miso_tpu import ops  # noqa: F401
