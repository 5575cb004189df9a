"""Pallas TPU kernels: fused dequant matmul, dense matmul, flash attention."""

from .dense import make_dense_matmul, make_dense_matmul_pallas  # noqa: F401
from .dequant_matmul import make_dequant_matmul, make_dequant_matmul_jit  # noqa: F401
from .flash import make_flash_attention  # noqa: F401
from .spec import KernelSpec  # noqa: F401
