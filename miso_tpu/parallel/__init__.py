from miso_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    data_parallel_train_step,
    submap_parallel_fusion_step,
)
