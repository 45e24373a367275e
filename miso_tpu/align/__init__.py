from miso_tpu.align import miso  # noqa: F401
from miso_tpu.align.miso import (  # noqa: F401
    align_multiple_submaps_hierarchical,
    generic_align_multiple_submaps,
    pairwise_loss_latent,
    pairwise_loss_sdf,
)
