from dynfu_tpu.core import dualquat  # noqa: F401
from dynfu_tpu.core.camera import Intr  # noqa: F401
from dynfu_tpu.core import se3  # noqa: F401
