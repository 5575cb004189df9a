"""Two-pass "materialize" execution plan: decode once, then a dense dot.

The fused kernel (dequant_matmul.py) re-decodes the packed weights for every
M tile because the decoded block lives only in VMEM. At large M that serial
VPU decode repeats m_tiles times and Mosaic will not overlap it with the MXU
dots (measured: scripts/tpu_i2_pipe_probe.py, tpu_pipe_probe.py) — the int2
m=4096 path pays ~25% over the pure-MXU floor. The TPU-native alternative at
large M is to *materialize* the decoded operand in HBM once (an XLA
elementwise pass at HBM bandwidth, free of Mosaic's gather/cast limits) and
feed it to the vendor-tuned dense dot, which sustains ~94% of the MXU
ceiling (docs/Benchmarks.md dense parity). Decode cost is paid once instead
of m_tiles times:

    fused        : m_tiles * (MXU + serial decode)
    materialize  : decode_pass (BW-bound) + dense dot (MXU-bound)

This is also the fast path for NF4 at large M: outside Mosaic the 16-entry
LUT is a real `jnp.take` gather (the in-kernel mux burns ~23 VPU ops/elem).

The reference has no analog — on GPU, shared-memory staging makes fusion
always win (/root/reference/bitblas/ops/general_matmul/tilelang/dequantize/
matmul_dequantize_mma.py:200-510); the split is a TPU-specific trade.

Numerics: the decode math mirrors dequant_matmul bit-for-bit (same field
extraction, same storage-XOR handling, same family formulas). Float paths
dequantize fully in f32 and round once to the MXU dtype (bf16) before the
dot — the same single-rounding the fused bf16 path performs on the decoded
fields. Int paths dot exact int8 codes with int32 accumulation.

Timing note: this plan is transparent XLA (no opaque pallas_call), so
honest measurement needs `full_output_dep=True` AND the carry injected into
the packed-weight arg (else XLA slices the dot / hoists the decode out of
the timing loop). `timing_controls()` returns the right knobs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..quantization import numerics
from ..quantization.formats import NF4_TABLE, as_jax_dtype
from ..quantization.packing import pack_tile_n
from ..tuner.hint import TileHint
from .spec import KernelSpec

_PRECISION = {
    "default": lax.Precision.DEFAULT,
    "high": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
}


def supports_materialize_spec(spec: KernelSpec) -> bool:
    """Hint-independent half of supports_materialize: can this spec's
    weight be decoded to a dense operand at all? (Shared with consumers
    that feed the decode to a different dense op, e.g. QuantConv2D's
    native-conv route.)

    Int-activation paths require no zeros and at most per-channel scaling
    (grouped scales cannot fold into an int8 operand; per-group partial
    dots would defeat the single-dense-dot point).
    """
    if spec.native:
        return False
    if spec.is_int_activation:
        g = spec.group_size if spec.group_size > 0 else spec.k
        per_channel = g >= spec.k
        return (not spec.with_zeros
                and (not spec.with_scaling or per_channel)
                and spec.family in ("uint", "int") and spec.bits < 8)
    if spec.bits < 8:
        return spec.family in ("uint", "int", "nf", "fp")
    return spec.family in ("int", "uint", "fp_e4m3", "fp_e5m2")


def supports_materialize(spec: KernelSpec, hint: TileHint) -> bool:
    """Whether the two-pass plan exists for this spec/hint."""
    if spec.is_int_activation and hint.mma_dtype != "int8":
        return False
    if not spec.is_int_activation and \
            hint.mma_dtype not in ("bfloat16", "float32"):
        return False
    return supports_materialize_spec(spec)


def timing_controls(hint: TileHint):
    """(inject, full_output_dep) for honest measurement of this hint."""
    if hint.decode_mode == "materialize":
        return 1, True  # carry rides the packed weights; reduce full output
    return None, False


def _decode_fields_f32(spec: KernelSpec, fields: jnp.ndarray) -> jnp.ndarray:
    """Sub-byte field values -> f32 (bit-exact vs _decode_field)."""
    family, bits = spec.family, spec.bits
    if family == "uint":
        return fields.astype(jnp.float32)
    if family == "int":
        return (fields - (1 << (bits - 1))).astype(jnp.float32)
    if family == "nf":
        return jnp.take(jnp.asarray(NF4_TABLE, jnp.float32), fields, axis=0)
    if family == "fp":
        return numerics.decode_fp4_field_f32(fields)
    raise ValueError(f"materialize: unsupported sub-byte family {family}")


def _unpack_slots(words2d: jnp.ndarray, bits: int, e: int, n: int,
                  xored: bool) -> jnp.ndarray:
    """Slot-strided packed rows [R, n/e] -> field values [R, n] (int32).
    `xored`: sub-byte int/uint weight storage is XOR 0x80 (qzeros are not)."""
    mask_v = (1 << bits) - 1
    tile = pack_tile_n(n, e)
    sub = tile // e
    T = n // tile
    R = words2d.shape[0]
    words = words2d.astype(jnp.int32)
    planes = []
    for s in range(e):
        f = (words >> (s * bits)) & mask_v
        if xored and s == e - 1:
            # storage XOR 0x80 flips only the top slot's top bit
            f = f ^ (1 << (bits - 1))
        planes.append(f.reshape(R, T, sub))
    # [R, T, e, sub] -> [R, n]: slot s of tile t covers columns
    # [t*tile + s*sub, t*tile + (s+1)*sub)  (packing.pack_nslot)
    return jnp.stack(planes, axis=2).reshape(R, n)


def _decode_subbyte_plane(spec: KernelSpec, Wp: jnp.ndarray) -> jnp.ndarray:
    """Packed [K, N/e] weight storage -> raw field values [K, n_padded]."""
    return _unpack_slots(Wp, spec.bits, spec.elems_per_word, spec.n_padded,
                         xored=spec.family in ("uint", "int"))


def _decode_bytes_f32(spec: KernelSpec, Wp: jnp.ndarray) -> jnp.ndarray:
    """>=8-bit storage [K, N] -> f32 values (mirrors _decode_byte)."""
    words = Wp.astype(jnp.int32)
    family = spec.family
    if spec.bits == 8 and family != "int":
        words = words & 0xFF
    elif spec.bits == 16 and family == "uint":
        words = words & 0xFFFF
    if family == "int":
        return words.astype(jnp.float32)
    if family == "uint":
        if spec.bits == 32:
            wf = words.astype(jnp.float32)
            return jnp.where(words < 0, wf + jnp.float32(2.0 ** 32), wf)
        return words.astype(jnp.float32)
    if family == "fp_e4m3":
        return numerics.decode_f8e4m3_to_f32(words)
    if family == "fp_e5m2":
        return numerics.decode_f8e5m2_to_f32(words)
    raise ValueError(f"materialize: unsupported 8-bit family {family}")


def _expand_groups(x_g1n: jnp.ndarray, k: int) -> jnp.ndarray:
    """[G, 1, N] per-group rows -> [K, N] per-element rows."""
    G = x_g1n.shape[0]
    N = x_g1n.shape[-1]
    g = k // G
    return jnp.broadcast_to(x_g1n.reshape(G, 1, N),
                            (G, g, N)).reshape(k, N)


def make_weight_dequant(spec: KernelSpec, mma_dtype: str = "float32"):
    """Packed float-activation weight operands -> dense [K, n_padded]
    dequantized weight in `mma_dtype` (the decode half of the two-pass
    plan, reusable by consumers that feed the result to a different dense
    op — e.g. QuantConv2D's native-conv route).

    fn(Wp, scales=None, zeros=None); scales/zeros arrive in the device
    layout ([G, 1, N_pad] rows, qzeros slot-packed)."""
    K = spec.k
    N = spec.n_padded
    e = spec.elems_per_word
    g = spec.group_size if spec.group_size > 0 else K
    quantized_zeros = spec.with_zeros and spec.zeros_mode == "quantized"
    mma = jnp.bfloat16 if mma_dtype == "bfloat16" else jnp.float32

    def fn(Wp, scales=None, zeros=None):
        if spec.bits < 8:
            w = _decode_fields_f32(spec, _decode_subbyte_plane(spec, Wp))
        else:
            w = _decode_bytes_f32(spec, Wp)
        s_full = z_full = None
        if spec.with_scaling:
            s_full = _expand_groups(scales.astype(jnp.float32), K)
        if spec.with_zeros:
            if quantized_zeros:
                zf = _unpack_slots(zeros.reshape(K // g, -1), spec.bits,
                                   e, N, xored=False)
                z_full = _expand_groups(
                    zf.astype(jnp.float32).reshape(K // g, 1, N), K)
            else:
                z_full = _expand_groups(zeros.astype(jnp.float32), K)
        if z_full is not None:
            if spec.zeros_mode in ("original", "quantized"):
                w = w - z_full
                if s_full is not None:
                    w = w * s_full
            else:  # rescale: w*s - z
                w = w * s_full - z_full
        elif s_full is not None:
            w = w * s_full
        return w.astype(mma)

    return fn


def make_weight_decode_int8(spec: KernelSpec):
    """Packed sub-byte int/uint weight -> int8 codes [K, n_padded]
    (zero-point-free; scaling is the caller's post-dot job — mirrors the
    int-activation materialize path's constraints)."""

    def fn(Wp):
        codes = _decode_subbyte_plane(spec, Wp)
        if spec.family == "int":
            codes = codes - (1 << (spec.bits - 1))
        return codes.astype(jnp.int8)

    return fn


def make_materialize_matmul(spec: KernelSpec, hint: TileHint, *,
                            interpret: bool = False):
    """Build the two-pass dequant matmul for one (spec, hint).

    Same call signature/layouts as make_dequant_matmul:
    fn(A, Wp, scales=None, zeros=None, bias=None) -> out [M, N].
    """
    del interpret  # pure XLA — identical on CPU and TPU
    if not supports_materialize(spec, hint):
        raise ValueError(f"materialize plan unsupported for {spec} "
                         f"(mma={hint.mma_dtype})")
    N_out = spec.n
    N = spec.n_padded
    precision = _PRECISION[hint.precision]
    out_dtype = as_jax_dtype(spec.out_dtype)
    int_dot = spec.is_int_activation
    mma = jnp.bfloat16 if hint.mma_dtype == "bfloat16" else jnp.float32

    def _finish(res, bias):
        if spec.with_bias and bias is not None:
            res = res.astype(jnp.float32) + bias.astype(jnp.float32)
        res = numerics.saturate_cast(res, out_dtype)
        return res[:, :N_out] if N != N_out else res

    if int_dot:
        decode_int8 = make_weight_decode_int8(spec)

        def fn(A, Wp, scales=None, zeros=None, bias=None):
            del zeros
            W = decode_int8(Wp)
            out = lax.dot_general(
                A, W, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32, precision=precision)
            if spec.with_scaling:
                # per-channel only (supports_materialize): scales [1, 1, N]
                out = out.astype(jnp.float32) * \
                    scales.reshape(1, N).astype(jnp.float32)
            return _finish(out, bias)
        return fn

    dequant = make_weight_dequant(spec, hint.mma_dtype)

    def fn(A, Wp, scales=None, zeros=None, bias=None):
        Wd = dequant(Wp, scales, zeros)
        Ad = A.astype(jnp.float32).astype(mma) if A.dtype != mma else A
        out = lax.dot_general(
            Ad, Wd, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        return _finish(out, bias)

    return fn
