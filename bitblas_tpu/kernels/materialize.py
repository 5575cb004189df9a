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

from typing import Optional

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


def _divisor_rows(total: int, target: int, step: int = 8) -> int:
    """Largest divisor of `total` that is <= target and a multiple of
    `step` (falls back to `total` itself when nothing smaller fits)."""
    best = None
    d = step
    while d <= min(total, target):
        if total % d == 0:
            best = d
        d += step
    return best if best is not None else total


def make_weight_decode_pallas(spec: KernelSpec,
                              mma_dtype: str = "bfloat16", *,
                              interpret: bool = False,
                              block_k: Optional[int] = None,
                              block_n: Optional[int] = None):
    """Pallas decode-to-HBM: packed weight operands -> dense [K, n_padded]
    in `mma_dtype` — same contract as make_weight_dequant
    (fn(Wp, scales=None, zeros=None)).

    Why a kernel: the XLA formulation's slot unpack ([R, T, e, sub]
    stack + reshape) lowers to lane relayouts costing 30-50us at conv
    filter sizes (tpu_conv_mat_probe 2026-08-20 — the IHWO/patches-GEMM
    reformulations measured the permute as free, leaving the decode as
    the whole materialize-vs-dense gap). The fused matmul kernel's
    segment decode touches each packed word in-register and never
    shuffles lanes; this kernel reuses it, minus the dots.
    """
    from jax.experimental import pallas as pl
    from .dequant_matmul import _decode_byte, _decode_field
    from ..quantization.packing import pack_tile_n

    K, N = spec.k, spec.n_padded
    e = spec.elems_per_word
    bits = spec.bits
    g = spec.group_size if spec.group_size > 0 else K
    mma = jnp.bfloat16 if mma_dtype == "bfloat16" else jnp.float32
    quantized_zeros = spec.with_zeros and spec.zeros_mode == "quantized"
    xored = bits < 8 and spec.family in ("uint", "int")
    mask_v = (1 << bits) - 1
    # f32 decode hint: exact scale math; mux4 LUT off-interpret (the 1D
    # take gather does not lower on hardware). fp_mode=fast: the r5
    # branchless fp8/fp4 decoders are value-identical to legacy
    # (tests/test_numerics.py) and strictly cheaper on the VPU.
    dec_hint = TileHint(block_m=8, block_n=128, block_k=128,
                        mma_dtype="float32", fp_mode="fast",
                        lut_mode="take" if interpret else "mux4")

    pack_n = pack_tile_n(N, e) if bits < 8 else 128
    if block_n is None:
        bn_tiles = _divisor_rows(N // pack_n, max(1, 2048 // pack_n),
                                 step=1)
        block_n = pack_n * bn_tiles
    BN = block_n
    if block_k is None:
        if g >= K:
            block_k = _divisor_rows(K, 512)
        else:
            gpt_pick = _divisor_rows(K // g, max(1, 512 // g), step=1)
            block_k = g * gpt_pick
    BK = block_k
    if K % BK or N % BN:
        raise ValueError(f"decode blocks ({BK},{BN}) must divide "
                         f"({K},{N})")
    if bits < 8 and BN % pack_n:
        # A block_n that divides N but not the pack tile would truncate
        # the slot-segment list below — silent unwritten output blocks.
        raise ValueError(f"block_n={BN} must be a multiple of the "
                         f"pack tile ({pack_n}) for {bits}-bit weights")
    if g < K and BK % g:
        # The grouped-scale BlockSpec maps k-block i to scale rows
        # [i*BK/g, (i+1)*BK/g): a block that straddles a group boundary
        # would read the wrong group's scales (or leave rows unwritten).
        raise ValueError(f"block_k={BK} must be a multiple of "
                         f"group_size={g}")
    gpt = max(BK // g, 1)
    glen = min(g, BK)
    grouped = g < K
    BNe = BN // e if bits < 8 else BN
    if bits < 8:
        sub = pack_n // e
        segments = [(t * pack_n + s * sub, sub, s, t * sub)
                    for t in range(BN // pack_n) for s in range(e)]
    else:
        segments = [(0, BN, 0, 0)]

    def kernel(*refs):
        idx = 0
        w_ref = refs[idx]; idx += 1
        s_ref = z_ref = None
        if spec.with_scaling:
            s_ref = refs[idx]; idx += 1
        if spec.with_zeros:
            z_ref = refs[idx]; idx += 1
        out_ref = refs[idx]

        words = w_ref[...].astype(jnp.int32)
        if bits == 8 and spec.family != "int":
            words = words & 0xFF
        elif bits == 16 and spec.family == "uint":
            words = words & 0xFFFF
        zwords = None
        if quantized_zeros:
            zwords = z_ref[...][:, 0, :].astype(jnp.int32)

        for (col0, width, slot, w0) in segments:
            cols = slice(col0, col0 + width)
            if bits < 8:
                field = (words[:, w0:w0 + width] >> (slot * bits)) & mask_v
                if xored and slot == e - 1:
                    field = field ^ (1 << (bits - 1))
                val = _decode_field(spec, dec_hint, field)
            else:
                val = _decode_byte(spec, dec_hint, words[:, cols])
            if not (spec.with_scaling or spec.with_zeros):
                out_ref[:, cols] = val.astype(mma)
                continue
            for gi in range(gpt):
                rows = slice(gi * glen, (gi + 1) * glen)
                v = val[rows] if gpt > 1 else val
                z = None
                if spec.with_zeros:
                    if quantized_zeros:
                        zf = (zwords[gi:gi + 1, w0:w0 + width]
                              >> (slot * bits)) & mask_v
                        z = zf.astype(jnp.float32)
                    else:
                        z = z_ref[...][gi, 0, cols].astype(
                            jnp.float32).reshape(1, width)
                s = None
                if spec.with_scaling:
                    s = s_ref[...][gi, 0, cols].astype(
                        jnp.float32).reshape(1, width)
                if z is not None:
                    if spec.zeros_mode in ("original", "quantized"):
                        v = v - z
                        if s is not None:
                            v = v * s
                    else:  # rescale: w*s - z
                        v = v * s - z
                elif s is not None:
                    v = v * s
                out_ref[rows, cols] = v.astype(mma)

    in_specs = [pl.BlockSpec(
        (BK, BNe), (lambda i, j: (i, j)))]
    if spec.with_scaling:
        if grouped:
            in_specs.append(pl.BlockSpec((gpt, 1, BN),
                                         (lambda i, j: (i, 0, j))))
        else:
            in_specs.append(pl.BlockSpec((1, 1, BN),
                                         (lambda i, j: (0, 0, j))))
    if spec.with_zeros:
        zlast = BN // e if quantized_zeros else BN
        if grouped:
            in_specs.append(pl.BlockSpec((gpt, 1, zlast),
                                         (lambda i, j: (i, 0, j))))
        else:
            in_specs.append(pl.BlockSpec((1, 1, zlast),
                                         (lambda i, j: (0, 0, j))))

    call = pl.pallas_call(
        kernel,
        grid=(K // BK, N // BN),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BK, BN), (lambda i, j: (i, j))),
        out_shape=jax.ShapeDtypeStruct((K, N), mma),
        interpret=interpret,
    )

    def fn(Wp, scales=None, zeros=None):
        args = [Wp]
        if spec.with_scaling:
            args.append(scales)
        if spec.with_zeros:
            args.append(zeros)
        return call(*args)

    return fn


def make_weight_decode_int8_pallas(spec: KernelSpec, *,
                                   interpret: bool = False,
                                   block_k: Optional[int] = None,
                                   block_n: Optional[int] = None):
    """Pallas twin of make_weight_decode_int8: packed sub-byte int/uint
    weight -> int8 codes [K, n_padded] via the in-register segment
    decode (same lane-relayout rationale as make_weight_decode_pallas)."""
    from jax.experimental import pallas as pl

    K, N = spec.k, spec.n_padded
    e = spec.elems_per_word
    bits = spec.bits
    if not (bits < 8 and spec.family in ("uint", "int")):
        raise ValueError("int8 decode covers sub-byte int/uint only")
    mask_v = (1 << bits) - 1
    bias = 1 << (bits - 1)

    pack_n = pack_tile_n(N, e)
    if block_n is None:
        bn_tiles = _divisor_rows(N // pack_n, max(1, 2048 // pack_n),
                                 step=1)
        block_n = pack_n * bn_tiles
    BN = block_n
    if block_k is None:
        block_k = _divisor_rows(K, 512)
    BK = block_k
    if K % BK or N % BN:
        raise ValueError(f"decode blocks ({BK},{BN}) must divide "
                         f"({K},{N})")
    if BN % pack_n:
        # see the float-decode twin: a non-pack-multiple block truncates
        # the segment list and leaves output blocks unwritten
        raise ValueError(f"block_n={BN} must be a multiple of the "
                         f"pack tile ({pack_n})")
    sub = pack_n // e
    segments = [(t * pack_n + s * sub, sub, s, t * sub)
                for t in range(BN // pack_n) for s in range(e)]

    def kernel(w_ref, out_ref):
        words = w_ref[...].astype(jnp.int32)
        for (col0, width, slot, w0) in segments:
            field = (words[:, w0:w0 + width] >> (slot * bits)) & mask_v
            if slot == e - 1:  # storage XOR flips the top slot's top bit
                field = field ^ (1 << (bits - 1))
            if spec.family == "int":
                field = field - bias
            out_ref[:, col0:col0 + width] = field.astype(jnp.int8)

    call = pl.pallas_call(
        kernel,
        grid=(K // BK, N // BN),
        in_specs=[pl.BlockSpec((BK, BN // e), (lambda i, j: (i, j)))],
        out_specs=pl.BlockSpec((BK, BN), (lambda i, j: (i, j))),
        out_shape=jax.ShapeDtypeStruct((K, N), jnp.int8),
        interpret=interpret,
    )

    def fn(Wp):
        return call(Wp)

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
                            interpret: bool = False,
                            pallas_decode: Optional[bool] = None):
    """Build the two-pass dequant matmul for one (spec, hint).

    Same call signature/layouts as make_dequant_matmul:
    fn(A, Wp, scales=None, zeros=None, bias=None) -> out [M, N].

    `pallas_decode` swaps the XLA decode for the in-register Pallas
    kernel (make_weight_decode_pallas). Default: ON on hardware —
    measured 2026-08-20 (tpu_mat_decode_probe): the XLA unpack cost
    ~375us of lane relayouts at W2A16 4096^3 (1047.8 -> 723.1us); OFF
    in interpret mode (keeps CPU tests on the lighter XLA path; both
    are bit-identical).
    """
    if pallas_decode is None:
        # Pallas for every family: even NF4 — the take-gather's unpack
        # relayouts outweigh the in-kernel mux's ~23 ops/elem (phase-Q
        # probe 2026-08-20: 1060.4us XLA vs 916.9us pallas at 4096^3).
        pallas_decode = not interpret
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
        decode_int8 = (make_weight_decode_int8_pallas(spec,
                                                      interpret=interpret)
                       if pallas_decode else
                       make_weight_decode_int8(spec))

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

    if pallas_decode:
        dequant = make_weight_decode_pallas(spec, hint.mma_dtype,
                                            interpret=interpret)
    else:
        dequant = make_weight_dequant(spec, hint.mma_dtype)

    def fn(A, Wp, scales=None, zeros=None, bias=None):
        Wd = dequant(Wp, scales, zeros)
        Ad = A.astype(jnp.float32).astype(mma) if A.dtype != mma else A
        out = lax.dot_general(
            Ad, Wd, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        return _finish(out, bias)

    return fn
