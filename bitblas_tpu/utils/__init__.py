"""Utilities: timing, target detection."""

from ..tuner.arch import auto_detect_tpu_target, get_arch  # noqa: F401
from .timing import make_chained, measure_chained, measure_kernel  # noqa: F401
