from miso_tpu.losses import common, fusion, isdf_loss, miso, sdf  # noqa: F401
from miso_tpu.losses.fusion import fusion_loss, posed_sdf_loss_3d_submap  # noqa: F401
from miso_tpu.losses.isdf_loss import isdf_loss, isdf_loss_default, isdf_loss_submap  # noqa: F401
from miso_tpu.losses.miso import make_loss, mapping_loss, posed_sdf_loss_3d, tracking_loss  # noqa: F401
from miso_tpu.losses.sdf import sdf_loss_2d, sdf_loss_3d, tsdf_loss_3d  # noqa: F401
