from miso_tpu.datasets import base, shapes  # noqa: F401
from miso_tpu.datasets.base import Dataset, SubmapDataset  # noqa: F401
from miso_tpu.datasets.sdf_3d import BatchedSdf3D, BatchPosedSdf3D, PosedSdf3D, Sdf3D  # noqa: F401
