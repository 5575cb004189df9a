"""Quantization core: dtype registry, bit-exact decode math, packing."""

from .formats import (  # noqa: F401
    DTYPE_MAP,
    NATIVE_COMPUTE_PATTERNS,
    NF4_TABLE,
    WFormat,
    as_jax_dtype,
    is_native_compute,
    nf4_lut,
    source_format_and_bits,
    storage_bits,
    storage_jax_dtype,
    wformat,
)
from .numerics import (  # noqa: F401
    apply_scaling,
    decode_f8e4m3_byte,
    decode_f8e5m2_byte,
    decode_field,
    decode_fp4_field,
    decode_int_field,
    decode_nf4_field,
    decode_uint_field,
    decode_uint_field_with_zeros,
    fast_decode_uint_to_bf16,
    fast_decode_uint_to_f16,
    pack_fields,
    unpack_fields,
)
from .gptq import (  # noqa: F401
    HessianAccumulator,
    QuantizedWeight,
    gptq_quantize,
    rtn_quantize,
)
from .packing import (  # noqa: F401
    bias_signed_weight,
    general_compress,
    general_decompress,
    interleave_weight,
    pack_nslot,
    unpack_nslot,
    unpack_qweight,
    unpack_qzeros,
    unpack_qzeros_v2,
)
