from miso_tpu.models import base  # noqa: F401
from miso_tpu.models.grid_net import GridNet, create_grid_net, grid_net_mask  # noqa: F401
