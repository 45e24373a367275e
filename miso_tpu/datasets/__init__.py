from miso_tpu.datasets import base, shapes  # noqa: F401
from miso_tpu.datasets.base import Dataset, SubmapDataset  # noqa: F401
from miso_tpu.datasets.sdf_2d import Sdf2D  # noqa: F401
from miso_tpu.datasets.sdf_3d import BatchedSdf3D, BatchPosedSdf3D, PosedSdf3D, Sdf3D  # noqa: F401
from miso_tpu.datasets.sdf_3d_submap import SubmapSdf3D  # noqa: F401
from miso_tpu.datasets.sequence import SdfSequence, orbit_trajectory  # noqa: F401
from miso_tpu.datasets.rgbd import PosedRgbdBase, SyntheticRgbd  # noqa: F401
from miso_tpu.datasets.lidar import PosedSdf3DLidar  # noqa: F401
