"""Framework integration layer (reference `integration/`, SURVEY §1 L7).

Torch-facing drop-in modules that route their matmuls through the TPU
operators: `integration.pytorch.QuantLinear` (AutoGPTQ-style weight-only
linear, reference integration/pytorch/bitblas_quant_linear.py:33-220) and
`integration.bitnet.BitLinearBitBLAS` (BitNet b1.58 W_INT2xA_INT8,
reference integration/BitNet/utils_quant.py:37-230).

torch is imported lazily inside the submodules so `import bitblas_tpu`
never requires it.
"""

__all__ = ["pytorch", "bitnet"]
