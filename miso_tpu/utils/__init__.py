from miso_tpu.utils import eval as eval_utils  # noqa: F401
from miso_tpu.utils import sdf as sdf_utils  # noqa: F401
