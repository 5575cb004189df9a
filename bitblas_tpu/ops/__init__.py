"""Operator layer: configs, operators, transforms, oracle."""

from .common import BackendKind, OptimizeStrategy, TransformKind  # noqa: F401
from .matmul_config import MatmulConfig, OperatorConfig  # noqa: F401
from .matmul import Matmul  # noqa: F401
from .matmul_splitk import MatmulConfigWithSplitK, MatmulWithSplitK  # noqa: F401
from .flashatten import FlashAtten, FlashAttenConfig  # noqa: F401
from .ladder_permutate import LadderPermutate, LadderPermutateConfig  # noqa: F401
from .lop3_permutate import LOP3Permutate, LOP3PermutateConfig  # noqa: F401
from .quant_compress import QuantCompress, QuantCompressConfig  # noqa: F401
from .conv2d import Conv2D, Conv2DConfig, QuantConv2D, \
    QuantConv2DConfig  # noqa: F401
from .batch_matmul import BatchMatmul, BatchMatmulConfig  # noqa: F401
from .operator import Operator  # noqa: F401
