from miso_tpu.losses import common, miso, sdf  # noqa: F401
from miso_tpu.losses.miso import make_loss, mapping_loss, tracking_loss, posed_sdf_loss_3d  # noqa: F401
from miso_tpu.losses.sdf import sdf_loss_2d, sdf_loss_3d, tsdf_loss_3d  # noqa: F401
