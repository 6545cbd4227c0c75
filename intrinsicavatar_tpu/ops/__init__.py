from intrinsicavatar_tpu.ops import math  # noqa: F401
from intrinsicavatar_tpu.ops import volrend  # noqa: F401
from intrinsicavatar_tpu.ops import resample  # noqa: F401
