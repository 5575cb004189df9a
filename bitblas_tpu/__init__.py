"""bitblas_tpu: TPU-native mixed-precision GEMM/GEMV framework.

From-scratch JAX/Pallas re-imagination of microsoft/BitBLAS (design map in
SURVEY.md): fused dequantize-into-matmul kernels for
W{INT/UINT 1-8, NF4, FP4_E2M1, FP8} x A{FP16/BF16/FP32, INT8}, a measured
tile autotuner with a persistent hint database, a Flax QuantLinear consuming
GPTQ/BitNet checkpoints, and mesh-sharded multi-chip execution.

Public surface mirrors the reference exports
(/root/reference/bitblas/__init__.py:155-175).
"""

from .common import __version__, set_log_level  # noqa: F401
from .common import enable_jax_compilation_cache

enable_jax_compilation_cache()
from .ops.common import OptimizeStrategy, TransformKind  # noqa: F401
from .ops.matmul_config import MatmulConfig, OperatorConfig  # noqa: F401
from .ops.matmul import Matmul  # noqa: F401
from .ops.matmul_splitk import MatmulConfigWithSplitK, MatmulWithSplitK  # noqa: F401
from .ops.flashatten import FlashAtten, FlashAttenConfig  # noqa: F401
from .ops.ladder_permutate import LadderPermutate, LadderPermutateConfig  # noqa: F401
from .ops.lop3_permutate import LOP3Permutate, LOP3PermutateConfig  # noqa: F401
from .ops.quant_compress import QuantCompress, QuantCompressConfig  # noqa: F401
from .ops.conv2d import Conv2D, Conv2DConfig, QuantConv2D, \
    QuantConv2DConfig  # noqa: F401
from .ops.batch_matmul import BatchMatmul, BatchMatmulConfig  # noqa: F401
from .tuner import (  # noqa: F401
    TileDevice,
    TileHint,
    auto_detect_tpu_target,
    fast_tune,
    fast_tune_with_dynamic_range,
    get_arch,
)
from .cache import (  # noqa: F401
    OperatorCache,
    get_database_path,
    global_operator_cache,
    load_global_ops_cache,
)
from .module import Linear  # noqa: F401

# Reference-name alias (scripts that did `bitblas.auto_detect_nvidia_target`
# port by swapping the module import).
auto_detect_target = auto_detect_tpu_target

__all__ = [
    "Matmul", "MatmulConfig", "MatmulWithSplitK", "MatmulConfigWithSplitK",
    "FlashAtten", "FlashAttenConfig", "Linear",
    "LadderPermutate", "LadderPermutateConfig",
    "LOP3Permutate", "LOP3PermutateConfig",
    "QuantCompress", "QuantCompressConfig",
    "Conv2D", "Conv2DConfig", "QuantConv2D", "QuantConv2DConfig",
    "BatchMatmul", "BatchMatmulConfig",
    "TransformKind", "OptimizeStrategy",
    "TileDevice", "TileHint", "fast_tune", "fast_tune_with_dynamic_range",
    "auto_detect_tpu_target", "set_log_level",
    "OperatorCache", "global_operator_cache", "load_global_ops_cache",
    "get_database_path", "__version__",
]
