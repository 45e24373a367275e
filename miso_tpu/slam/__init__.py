from miso_tpu.slam.fuser import Fuser  # noqa: F401
from miso_tpu.slam.mapper import Mapper  # noqa: F401
from miso_tpu.slam.system import System  # noqa: F401
from miso_tpu.slam.tracker import Tracker, lm_step  # noqa: F401
from miso_tpu.slam.visualizer import Visualizer  # noqa: F401
