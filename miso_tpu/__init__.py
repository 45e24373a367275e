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

import os as _os


def _enable_compile_cache():
    """Persistent XLA compilation cache, on by default.

    TPU compiles are expensive (minutes through remote-compile
    transports); caching them on disk makes every process after the
    first start instantly.  Opt out with MISO_TPU_COMPILE_CACHE=0 or
    point MISO_TPU_COMPILE_CACHE at a directory.
    """
    val = _os.environ.get("MISO_TPU_COMPILE_CACHE", "")
    if val == "0":
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return  # user already configured one
        cache_dir = val or _os.path.join(
            _os.path.expanduser("~"), ".cache", "miso_tpu_xla")
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # never block import on cache setup


_enable_compile_cache()

from miso_tpu import ops  # noqa: F401
