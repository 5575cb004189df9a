"""Auto-tuner: tile space, roofline cost model, measured top-k search."""

from .arch import (  # noqa: F401
    CPU_INTERPRET,
    TPU_V4,
    TPU_V5E,
    TPU_V5P,
    TPU_V6E,
    TileDevice,
    auto_detect_tpu_target,
    get_arch,
)
from .hint import FlashHint, HINT_CLASSES, TileHint  # noqa: F401
from .space import (  # noqa: F401
    default_hint,
    enumerate_hints,
    roofline_seconds,
    vmem_usage,
)
from .tune import TuneResult, fast_tune, fast_tune_with_dynamic_range  # noqa: F401
