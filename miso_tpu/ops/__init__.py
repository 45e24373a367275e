from miso_tpu.ops import diff, interp, mlp, pooling, se3  # noqa: F401
from miso_tpu.ops.interp import (  # noqa: F401
    grid_decode,
    grid_interpolate,
    grid_shape_for_bound,
    multi_level_interpolate,
    normalize_coordinates,
    denormalize_coordinates,
    vertex_positions,
)
from miso_tpu.ops.mlp import mlp_apply, mlp_init  # noqa: F401
from miso_tpu.ops.pooling import grid_pool_avg  # noqa: F401
