from miso_tpu.models import base  # noqa: F401
from miso_tpu.models.grid_net import GridNet, create_grid_net, grid_net_mask  # noqa: F401
from miso_tpu.models.grid_atlas import GridAtlas, GridAtlasParams, grid_atlas_mask  # noqa: F401
from miso_tpu.models.isdf import ISDF, create_isdf  # noqa: F401
from miso_tpu.models.pointsdf import PointSDF, create_pointsdf  # noqa: F401
from miso_tpu.models.hashgrid import HashGridNet, create_hash_grid_net  # noqa: F401
