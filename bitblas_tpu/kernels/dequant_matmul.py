"""Fused dequantize-into-matmul Pallas TPU kernel.

This is the TPU-native replacement for the reference's TileLang dequant GEMM
schedulers (/root/reference/bitblas/ops/general_matmul/tilelang/dequantize/,
esp. matmul_dequantize_mma.py:200-510). Key design decisions, chosen for the
TPU memory/compute model rather than translated from CUDA:

* Weights arrive in the *slot-strided N-packed* device layout
  (quantization/packing.pack_nslot with pack_tile_n = 128*e): storage word
  [k, j] of a pack tile holds ``e`` weights for output columns
  ``slot*128 + j`` of that tile. Each slot is extracted with one shift+mask —
  pure VPU ops with zero cross-lane movement — and feeds its own MXU dot
  into a lane-aligned 128-column output slice. This replaces the reference's
  ladder layout propagation + LOP3 interleave, is tuning-independent, and
  never requires a runtime activation permute.
* Scales/zeros are uniform within a k-group, so they factor out of the
  contraction: sum_k a*(w-z)*s = s*(a @ w_raw - z*sum_k a). The kernel dots
  raw decoded weights and applies scale/zero in a tiny [BM, 128] f32 epilogue
  per (group, slot) — no per-element scale multiplies at all.
* The K-loop is the innermost grid dimension; Mosaic double-buffers the
  HBM->VMEM block DMAs automatically (the reference emits explicit software
  pipelines + cp.async).
* Accumulation always happens in f32/i32 VMEM scratch (MXU native).
* Mosaic has no f16 type: float16 operands are converted to the mma dtype at
  the XLA boundary; grouped tensors are stored f32 (exact upcast of f16).

Grid: (M/BM, N/BN, K/BK), K innermost. Blocks:
  A       [BM, BK]            activations (bf16/f32/int8 inside the kernel)
  Wp      [BK, BN/e]          packed weights (int8 storage)
  scales  [BK/g | 1, 1, BN]   f32   (3D: Mosaic constrains last two dims only)
  zeros   [BK/g | 1, 1, BN]   f32   (zeros_mode original/rescale)
  qzeros  [BK/g | 1, 1, BN/e] int8  (zeros_mode quantized; slot-packed)
  bias    [1, BN]             f32
  out     [BM, BN]
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quantization import numerics
from ..quantization.formats import NF4_TABLE, as_jax_dtype
from ..quantization.packing import pack_tile_n
from ..tuner.hint import TileHint
from .spec import KernelSpec

_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}


def _mma_jdtype(name: str):
    return {
        "bfloat16": jnp.bfloat16,
        "float16": jnp.float16,
        "float32": jnp.float32,
        "int8": jnp.int8,
    }[name]


def _cast(x: jnp.ndarray, dtype) -> jnp.ndarray:
    """astype that routes f16<->bf16 and int->f16/bf16 through f32 (Mosaic
    lacks those direct casts)."""
    if x.dtype == dtype:
        return x
    dt = jnp.dtype(dtype)
    pair = {x.dtype, dt}
    if pair == {jnp.dtype(jnp.float16), jnp.dtype(jnp.bfloat16)}:
        return x.astype(jnp.float32).astype(dtype)
    if (jnp.issubdtype(x.dtype, jnp.integer)
            and dt == jnp.dtype(jnp.float16)):
        return x.astype(jnp.float32).astype(dtype)
    return x.astype(dtype)


def _decode_field(spec: KernelSpec, hint: TileHint, field: jnp.ndarray,
                  lut_vals=None) -> jnp.ndarray:
    """Decode extracted sub-byte fields (int32 in [0, 2^bits)) -> mma dtype.
    Bit-exact vs the reference decode formulas (quantization/numerics.py)."""
    mma = _mma_jdtype(hint.mma_dtype)
    bits, family = spec.bits, spec.family
    if family == "uint":
        if spec.fast_decoding and hint.mma_dtype == "bfloat16":
            return numerics.fast_decode_uint_to_bf16(field.astype(jnp.uint16), bits)
        if spec.fast_decoding and hint.mma_dtype == "float16":
            return numerics.fast_decode_uint_to_f16(field.astype(jnp.uint16), bits)
        return _cast(field, mma)
    if family == "int":
        bias = 1 << (bits - 1)
        if spec.fast_decoding and hint.mma_dtype == "bfloat16":
            return numerics.fast_decode_uint_to_bf16(
                field.astype(jnp.uint16), bits) - jnp.bfloat16(bias)
        return _cast(field - bias, mma)
    if family == "fp":  # fp4_e2m1
        if hint.mma_dtype == "float16":
            return numerics.decode_fp4_field(field, jnp.float16)
        if hint.fp_mode == "fast16" and mma == jnp.bfloat16:
            return numerics.decode_fp4_field_bf16_fast(field)
        if hint.fp_mode in ("fast", "fast16"):
            return _cast(numerics.decode_fp4_field_f32_fast(field), mma)
        return _cast(numerics.decode_fp4_field_f32(field), mma)
    if family == "nf":
        if hint.lut_mode == "gather2d":
            # Per-lane sublane gather: out[i, j] = tbl[field[i, j], j].
            # This is the 2D gather Mosaic supports (the 1D table `take`
            # is not) — one gather op instead of 15 VPU blends. The table
            # arrives as a kernel input (Pallas rejects captured consts).
            src = lut_vals if lut_vals is not None else \
                jnp.asarray(NF4_TABLE, jnp.float32)
            tbl = jnp.broadcast_to(src.astype(jnp.float32).reshape(16, 1),
                                   (16, field.shape[-1]))
            return _cast(jnp.take_along_axis(tbl, field, axis=0), mma)
        if hint.lut_mode == "gatherlane":
            # Lane-axis variant: out[i, j] = tbl[i, field[i, j]] with the
            # 16-entry table replicated across sublanes — a dynamic lane
            # shuffle rather than a sublane gather (probe for which form
            # this libtpu's Mosaic actually lowers).
            src = lut_vals if lut_vals is not None else \
                jnp.asarray(NF4_TABLE, jnp.float32)
            tbl = jnp.broadcast_to(src.astype(jnp.float32).reshape(1, 16),
                                   (field.shape[0], 16))
            return _cast(jnp.take_along_axis(tbl, field, axis=1), mma)
        if lut_vals is not None:
            return _cast(jnp.take(lut_vals, field, axis=0), mma)
        lut = [float(v) for v in NF4_TABLE]
        if hint.lut_mode == "selectn":
            # lax.select_n: one multi-way select node — probe whether
            # Mosaic lowers it better than the explicit mux tree (it may
            # emit the same 15-blend ladder internally).
            cases = [jnp.full(field.shape, jnp.float32(v)) for v in lut]
            return _cast(jax.lax.select_n(jnp.clip(field, 0, 15), *cases),
                         mma)
        if hint.lut_mode == "mux4b":
            # mux4 running entirely in 16-bit lanes: compares on u16
            # fields, selects over the u16 BIT PATTERNS of bf16(T[j]),
            # one bitcast at the end. If Mosaic packs 16-bit lanes
            # 2-per-register the 15 blends run at twice the f32 rate.
            # No 16-bit shifts (banned — measured HTTP 500): the nibble
            # halves are extracted in i32 and cast down. Values are
            # bf16(T[j]) — identical to the f32 mux + bf16 MXU cast, so
            # only emitted when mma is bfloat16.
            import ml_dtypes
            bits = [int(b) for b in np.asarray(
                lut, ml_dtypes.bfloat16).view(np.uint16)]
            lo = (field & 3).astype(jnp.uint16)
            hi = (field >> 2).astype(jnp.uint16)
            e1, e2, e3 = (lo == jnp.uint16(1), lo == jnp.uint16(2),
                          lo == jnp.uint16(3))
            chunks = []
            for h in range(4):
                r = jnp.where(e1, jnp.uint16(bits[4 * h + 1]),
                              jnp.full(field.shape, bits[4 * h],
                                       jnp.uint16))
                r = jnp.where(e2, jnp.uint16(bits[4 * h + 2]), r)
                r = jnp.where(e3, jnp.uint16(bits[4 * h + 3]), r)
                chunks.append(r)
            out = jnp.where(hi == jnp.uint16(1), chunks[1], chunks[0])
            out = jnp.where(hi == jnp.uint16(2), chunks[2], out)
            out = jnp.where(hi == jnp.uint16(3), chunks[3], out)
            out = jax.lax.bitcast_convert_type(out, jnp.bfloat16)
            return _cast(out, mma)
        if hint.lut_mode == "mux4":
            # Nested 4-wide muxes on split nibble halves: the 6 equality
            # predicates (3 on each 2-bit half) are shared across all
            # selects — ~23 VPU ops/element vs the flat mux's ~30.
            # Bit-exact: pure where-selection of the same f32 constants.
            lo = field & 3
            hi = field >> 2
            e1, e2, e3 = lo == 1, lo == 2, lo == 3
            chunks = []
            for h in range(4):
                r = jnp.where(e1, jnp.float32(lut[4 * h + 1]),
                              jnp.float32(lut[4 * h]))
                r = jnp.where(e2, jnp.float32(lut[4 * h + 2]), r)
                r = jnp.where(e3, jnp.float32(lut[4 * h + 3]), r)
                chunks.append(r)
            out = jnp.where(hi == 1, chunks[1], chunks[0])
            out = jnp.where(hi == 2, chunks[2], out)
            out = jnp.where(hi == 3, chunks[3], out)
            return _cast(out, mma)
        out = jnp.full(field.shape, lut[0], dtype=jnp.float32)
        for v in range(1, 16):
            out = jnp.where(field == v, jnp.float32(lut[v]), out)
        return _cast(out, mma)
    raise ValueError(f"unsupported family {family}{bits}")


def _decode_byte(spec: KernelSpec, hint: TileHint, words: jnp.ndarray) -> jnp.ndarray:
    """Decode >=8-bit formats (words: int32; sign-extended only for int).
    Wide ints (16/32) store natural-width values — decode is a cast; uint32
    values above 2^31 re-bias from the wrapped signed container."""
    mma = _mma_jdtype(hint.mma_dtype)
    family = spec.family
    if family == "int":
        return _cast(words, mma)
    if family == "uint":
        if spec.bits == 32:
            wf = words.astype(jnp.float32)
            wf = jnp.where(words < 0, wf + jnp.float32(2.0 ** 32), wf)
            return _cast(wf, mma)
        return _cast(words, mma)
    if family == "fp_e4m3":
        if hint.mma_dtype == "float16":
            return numerics.decode_f8e4m3_byte(
                words.astype(jnp.uint16), jnp.float16)
        if hint.fp_mode == "fast16" and mma == jnp.bfloat16:
            return numerics.decode_f8e4m3_to_bf16_fast(words)
        if hint.fp_mode in ("fast", "fast16"):
            return _cast(numerics.decode_f8e4m3_to_f32_fast(words), mma)
        return _cast(numerics.decode_f8e4m3_to_f32(words), mma)
    if family == "fp_e5m2":
        if hint.mma_dtype == "float16":
            return numerics.decode_f8e5m2_byte(
                words.astype(jnp.uint16), jnp.float16)
        if hint.fp_mode == "fast16" and mma == jnp.bfloat16:
            return numerics.decode_f8e5m2_to_bf16_fast(words)
        if hint.fp_mode in ("fast", "fast16"):
            return _cast(numerics.decode_f8e5m2_to_f32_fast(words), mma)
        return _cast(numerics.decode_f8e5m2_to_f32(words), mma)
    raise ValueError(f"unsupported 8-bit family {family}")


def make_dequant_matmul(spec: KernelSpec, hint: TileHint, *,
                        interpret: bool = False):
    """Build the fused dequant-matmul for one (spec, hint).

    Returns fn(A, Wp, scales=None, zeros=None, bias=None) -> out [M, N].
    Device layouts are hint-independent (see module docstring).
    """
    if hint.decode_mode == "materialize":
        # Two-pass plan: decode to a dense HBM operand once, then the
        # vendor-tuned dense dot (kernels/materialize.py — wins at large M
        # where the fused kernel re-decodes per M tile).
        from .materialize import make_materialize_matmul
        return make_materialize_matmul(spec, hint, interpret=interpret)
    if hint.decode_mode == "asplit":
        # Activation-split plan: exact 2x int8 fixed-point split of float
        # activations feeding the int8-MXU telescope (kernels/asplit.py —
        # targets the ingestion-bound small-M float-activation GEMV).
        from .asplit import make_asplit_matmul
        return make_asplit_matmul(spec, hint, interpret=interpret)
    M, N_out, K = spec.m, spec.n, spec.k
    N = spec.n_padded   # device layout N (see KernelSpec.n_padded)
    e = spec.elems_per_word
    BM, BN, BK = min(hint.block_m, M), min(hint.block_n, N), hint.block_k
    BM = max(BM, 8)
    pack_n = pack_tile_n(N, e) if spec.bits < 8 else BN
    if spec.bits < 8 and BN % pack_n:
        # Legalize: the N tile must cover whole pack tiles.
        BN = pack_n * max(1, BN // pack_n)
    if spec.bits >= 8 and N % BN:
        # Legalize 8-bit tiles: largest 128-multiple dividing N (N is
        # always a 128 multiple via n_padded). BN < 128 (a hand-written
        # hint) would make the divisor search empty — clamp up first.
        BN = max(BN, 128)
        BN = 128 * max(d for d in range(1, N // 128 + 1)
                       if N % (128 * d) == 0 and 128 * d <= BN)
        pack_n = BN
    if N % BN or K % BK:
        raise ValueError(f"N={N} K={K} not divisible by tile ({BN},{BK})")
    g = spec.group_size if spec.group_size > 0 else K
    if not (BK % g == 0 or g % BK == 0):
        raise ValueError(f"block_k={BK} incompatible with group_size={g}")
    padded_m = pl.cdiv(M, BM) * BM
    grid = (padded_m // BM, N // BN, K // BK)
    nk = grid[2]

    mma = _mma_jdtype(hint.mma_dtype)
    int_path = spec.is_int_activation
    # int8-MXU telescope: xor the stored byte with 0x80 in-kernel, making
    # every shifted operand an int8-representable linear function of the
    # slots; the xor corrections cancel telescopically (c_j = 2^bits *
    # c_{j+1}), leaving only a rowsum term on the top slot. Arithmetic stays
    # int32-exact end to end.
    tele_i8 = (hint.decode_mode == "telescope" and spec.bits < 8
               and spec.family in ("uint", "int") and mma == jnp.int8
               and int_path and spec.storage_bits == 8)
    acc_dtype = jnp.int32 if (int_path and hint.mma_dtype == "int8"
                              and not (spec.with_scaling or spec.with_zeros))\
        else jnp.float32
    if (hint.decode_mode == "telescope" and spec.bits < 8
            and spec.family in ("uint", "int") and mma == jnp.int8
            and not tele_i8):
        # Telescope t_0 operands span [0, 255]: int8 can't hold them, but
        # bf16 represents both operands exactly and MXU products are full
        # precision, so the bf16 path stays integer-exact.
        mma = jnp.bfloat16
        acc_dtype = jnp.float32
    out_dtype = as_jax_dtype(spec.out_dtype)
    f16 = jnp.dtype(jnp.float16)
    if not interpret and hint.mma_dtype == "float16":
        raise ValueError("mma_dtype=float16 is only valid in interpret mode; "
                         "Mosaic kernels cannot use f16 (pick bfloat16/float32)")
    kernel_out_dtype = out_dtype
    if not interpret and jnp.dtype(out_dtype) == f16:
        kernel_out_dtype = mma if mma in (jnp.bfloat16, jnp.float32) else jnp.float32
    precision = _PRECISION[hint.precision]
    quantized_zeros = spec.with_zeros and spec.zeros_mode == "quantized"
    # NF4 LUT strategy: the dynamic gather ("take") only lowers in
    # interpret mode — Mosaic rejects the 1D-table gather ("Only 2D gather
    # is supported", 2026-08) — so real kernels always use the branchless
    # select mux.
    is_nf_take = (spec.family == "nf" and hint.lut_mode == "take"
                  and interpret)
    # gather2d also streams the table in as a kernel input (Pallas rejects
    # captured array constants).
    needs_lut = is_nf_take or (spec.family == "nf" and
                               hint.lut_mode in ("gather2d", "gatherlane"))

    # Output-column segments within one [BM, BN] block: (col_start, width,
    # slot, packed_word_start). For 8-bit formats there is a single segment.
    if spec.bits < 8:
        sub = pack_n // e
        segments = [(t * pack_n + s * sub, sub, s, t * sub)
                    for t in range(BN // pack_n) for s in range(e)]
        wp_width = BN // e
    else:
        segments = [(0, BN, 0, 0)]
        wp_width = BN

    srows = BK // g if BK >= g else 1
    gpt = max(BK // g, 1)   # groups per k-tile
    glen = min(g, BK)       # rows per group inside the tile

    def scale_index(i, j, k):
        del i
        if BK >= g:
            return (k, 0, j)
        return ((k * BK) // g, 0, j)

    in_specs = [
        pl.BlockSpec((BM, BK), lambda i, j, k: (i, k)),
        pl.BlockSpec((BK, wp_width), lambda i, j, k: (k, j)),
    ]
    if spec.with_scaling:
        in_specs.append(pl.BlockSpec((srows, 1, BN), scale_index))
    if spec.with_zeros:
        in_specs.append(pl.BlockSpec(
            (srows, 1, BN // e if quantized_zeros else BN), scale_index))
    if spec.with_bias:
        in_specs.append(pl.BlockSpec((1, BN), lambda i, j, k: (0, j)))
    if needs_lut:
        in_specs.append(pl.BlockSpec((1, 16), lambda i, j, k: (0, 0)))

    mask_v = (1 << spec.bits) - 1

    def kernel(*refs):
        idx = 0
        a_ref = refs[idx]; idx += 1
        w_ref = refs[idx]; idx += 1
        s_ref = z_ref = b_ref = lut_ref = None
        if spec.with_scaling:
            s_ref = refs[idx]; idx += 1
        if spec.with_zeros:
            z_ref = refs[idx]; idx += 1
        if spec.with_bias:
            b_ref = refs[idx]; idx += 1
        if needs_lut:
            lut_ref = refs[idx]; idx += 1
        out_ref = refs[idx]; idx += 1
        acc_ref = refs[idx]

        k = pl.program_id(2)

        @pl.when(k == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        a = _cast(a_ref[...], mma)
        raw = w_ref[...]
        words = raw.astype(jnp.int32)
        if spec.bits == 8 and spec.family != "int":
            words = words & 0xFF  # undo sign extension for unsigned bytes
        elif spec.bits == 16 and spec.family == "uint":
            words = words & 0xFFFF  # sign-extended int16 container
        # uint32 re-biases inside _decode_byte (no int32-domain mask exists)
        zwords = z_ref[...][:, 0, :].astype(jnp.int32) if quantized_zeros else None
        lut_vals = lut_ref[0, :] if needs_lut else None

        use_tele_pre = (hint.decode_mode == "telescope" and spec.bits < 8
                        and spec.family in ("uint", "int"))
        # Sub-byte int/uint packs arrive XOR 0x80 (weight_transform.
        # storage_is_xored): the sign-extended word IS u-128, so telescope
        # shifts are plain arithmetic shifts with corrections that cancel
        # between adjacent slots — only the top slot carries a rowsum term.
        xored = spec.bits < 8 and spec.family in ("uint", "int")
        need_epilogue = spec.with_scaling or spec.with_zeros
        need_rowsums = (spec.with_zeros or tele_i8
                        or (use_tele_pre and (spec.family == "int" or xored)))
        if need_rowsums:
            rs_dtype = jnp.int32 if tele_i8 else jnp.float32
            rowsums = [
                jnp.sum(a[:, gi * glen:(gi + 1) * glen].astype(rs_dtype),
                        axis=1, keepdims=True)
                for gi in range(gpt)
            ]

        dot_pref = jnp.int32 if tele_i8 else acc_dtype

        def dot(x, y):
            return jax.lax.dot_general(
                x, y, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=dot_pref, precision=precision)

        def epilogue(d, gi, cols, w0, width, slot, extra_sub=0.0):
            """Apply int-bias / scale / zeros to a raw-field dot result.
            `extra_sub` subtracts a constant-per-element (times rowsum) in
            the same pass (telescope int bias)."""
            s_row = None
            if spec.with_scaling:
                s_row = s_ref[...][gi, :, cols].astype(jnp.float32)
            if spec.with_zeros:
                if quantized_zeros:
                    z_row = ((zwords[gi:gi + 1, w0:w0 + width]
                              >> (slot * spec.bits)) & mask_v
                             ).astype(jnp.float32)
                else:
                    z_row = z_ref[...][gi, :, cols].astype(jnp.float32)
                ra = rowsums[gi]
                if quantized_zeros or spec.zeros_mode == "original":
                    d = d - ra * (z_row + extra_sub)
                    if s_row is not None:
                        d = d * s_row
                else:  # rescale: w*s - z
                    if extra_sub:
                        d = d - ra * extra_sub
                    d = d * s_row - ra * z_row
            else:
                if extra_sub:
                    d = d - rowsums[gi] * extra_sub
                if s_row is not None:
                    d = d * s_row
            return d

        use_telescope = (hint.decode_mode == "telescope" and spec.bits < 8
                         and spec.family in ("uint", "int") and not tele_i8)
        ibias = float(1 << (spec.bits - 1)) if spec.family == "int" else 0.0

        if tele_i8:
            # Integer-exact int8-MXU telescope (see header note). Storage is
            # pre-XORed: the raw int8 word IS u - 128; shifted operands
            # (u-128)>>bits*j = u>>bits*j - 128>>bits*j, all within int8.
            # Corrections cancel between adjacent levels; only the top slot
            # carries +2^(bits-1)*rowsum, and the signed-int bias contributes
            # -2^(bits-1)*rowsum per slot (so the top slot of the int family
            # needs none at all).
            base_i = 1 << spec.bits
            half = 1 << (spec.bits - 1)
            sub_w = wp_width // max(1, (BN // pack_n))
            for t in range(BN // pack_n):
                wx = raw[:, t * sub_w:(t + 1) * sub_w]
                wx32 = wx.astype(jnp.int32)
                shifted = [wx] + [
                    (wx32 >> (j * spec.bits)).astype(jnp.int8)
                    for j in range(1, e)]
                for gi in range(gpt):
                    rows = slice(gi * glen, (gi + 1) * glen)
                    tj = [dot(a[:, rows], sh[rows]) for sh in shifted]
                    ra = rowsums[gi]
                    for j in range(e):
                        d = tj[j] - base_i * tj[j + 1] if j < e - 1 else tj[j]
                        if spec.family == "int":
                            if j < e - 1:
                                d = d - half * ra
                        else:  # uint
                            if j == e - 1:
                                d = d + half * ra
                        col0 = t * pack_n + j * (pack_n // e)
                        width = pack_n // e
                        cols = slice(col0, col0 + width)
                        if need_epilogue:
                            d = epilogue(d.astype(jnp.float32), gi, cols,
                                         t * sub_w, width, j)
                        acc_ref[:, cols] += _cast(d, acc_dtype)
        elif use_telescope:
            # Per pack tile: dot the (pre-XORed, sign-extended) word shifted
            # arithmetically by j*bits for every j; recover slot j as
            # t_j - 2^bits * t_{j+1} in the epilogue (offset corrections
            # cancel; the top slot folds into the rowsum term). VPU cost:
            # (e-1) shifts + e casts per word — no mask op.
            base = float(1 << spec.bits)
            half_f = float(1 << (spec.bits - 1))
            sub_w = wp_width // max(1, (BN // pack_n))  # words per tile
            tele_batched = (hint.group_mode == "batched" and gpt > 1
                            and spec.with_scaling and not spec.with_zeros)

            def tele_extra_sub(j):
                """Per-slot constant-offset term (times rowsum) combining
                the xor-offset correction with the int-family bias."""
                if spec.family == "int":
                    return ibias if j < e - 1 else 0.0
                return 0.0 if j < e - 1 else -half_f

            for t in range(BN // pack_n):
                wt = words[:, t * sub_w:(t + 1) * sub_w]
                if mma == jnp.float32:
                    # f32-MXU GEMV decode shortcut: arithmetic >>(j*bits)
                    # equals floor division by 2^(j*bits), exact in f32 for
                    # |word| <= 128 — mul+floor (2 ops) replaces
                    # i32-cast+shift+f32-cast (3 ops) per operand, and the
                    # shared i32 word cast disappears. (bf16/int8 paths
                    # keep integer shifts: the extra f32->bf16 cast would
                    # eat the saving.)
                    wt_f = raw[:, t * sub_w:(t + 1) * sub_w].astype(
                        jnp.float32)
                    shifted = [wt_f] + [
                        jnp.floor(wt_f * (2.0 ** (-spec.bits * j)))
                        for j in range(1, e)]
                else:
                    shifted = [_cast(wt if j == 0
                                     else (wt >> (j * spec.bits)),
                                     mma) for j in range(e)]
                if tele_batched:
                    # One 3D dot per shifted operand covers every k-group
                    # (row-major reshapes are free); scale + int-bias fold
                    # into a [gpt, BM, width] epilogue summed over groups.
                    # Mosaic requires the batch dim at position 0 of BOTH
                    # operands ("batch dims must be equal"), so the lhs
                    # takes one small [BM, gpt, glen] -> [gpt, BM, glen]
                    # transpose.
                    a3 = a.reshape(a.shape[0], gpt, glen).swapaxes(0, 1)
                    t3 = [jax.lax.dot_general(
                        a3, sh.reshape(gpt, glen, sh.shape[1]),
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=acc_dtype,
                        precision=precision) for sh in shifted]
                    rs3 = jnp.stack(rowsums, axis=0)       # [gpt, BM, 1]
                    for j in range(e):
                        d3 = t3[j] - base * t3[j + 1] if j < e - 1 else t3[j]
                        col0 = t * pack_n + j * (pack_n // e)
                        width = pack_n // e
                        cols = slice(col0, col0 + width)
                        es = tele_extra_sub(j)
                        if es:
                            d3 = d3 - rs3 * es
                        s3 = s_ref[...][:, :, cols].astype(jnp.float32)
                        acc_ref[:, cols] += jnp.sum(d3 * s3, axis=0)
                    continue
                for gi in range(gpt):
                    rows = slice(gi * glen, (gi + 1) * glen)
                    tj = [dot(a[:, rows], sh[rows]) for sh in shifted]
                    for j in range(e):
                        d = tj[j] - base * tj[j + 1] if j < e - 1 else tj[j]
                        col0 = t * pack_n + j * (pack_n // e)
                        width = pack_n // e
                        cols = slice(col0, col0 + width)
                        d = epilogue(d, gi, cols, t * sub_w, width, j,
                                     extra_sub=tele_extra_sub(j))
                        acc_ref[:, cols] += d
        else:
            batched_groups = (hint.group_mode == "batched" and gpt > 1
                              and spec.with_scaling and not spec.with_zeros)
            for (col0, width, slot, w0) in segments:
                cols = slice(col0, col0 + width)
                wslice = words[:, w0:w0 + width]
                if spec.bits < 8:
                    field = (wslice >> (slot * spec.bits)) & mask_v
                    if xored and slot == e - 1:
                        # the storage xor flips only bit 7 = the top slot's
                        # top bit; lower slots decode unchanged
                        field = field ^ (1 << (spec.bits - 1))
                    w = _decode_field(spec, hint, field, lut_vals)
                else:
                    w = _decode_byte(spec, hint, wslice)

                if not need_epilogue:
                    acc_ref[:, cols] += dot(a, w)
                    continue

                if batched_groups:
                    # One 3D dot over all groups: the reshapes are row-major
                    # views (free); scales stay a [gpt, 1, width] tensor.
                    # Batch dim at position 0 of both operands (Mosaic
                    # rejects mismatched batch-dim positions).
                    a3 = a.reshape(a.shape[0], gpt, glen).swapaxes(0, 1)
                    w3 = w.reshape(gpt, glen, width)
                    d3 = jax.lax.dot_general(
                        a3, w3,
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=acc_dtype,
                        precision=precision)          # [gpt, BM, width]
                    s3 = s_ref[...][:, :, cols].astype(jnp.float32)
                    acc_ref[:, cols] += jnp.sum(d3 * s3, axis=0)
                    continue

                contrib = jnp.zeros((a.shape[0], width), dtype=acc_dtype)
                for gi in range(gpt):
                    rows = slice(gi * glen, (gi + 1) * glen)
                    d = dot(a[:, rows], w[rows])
                    contrib = contrib + epilogue(d, gi, cols, w0, width, slot)
                acc_ref[:, cols] += contrib

        @pl.when(k == nk - 1)
        def _finish():
            res = acc_ref[...]
            if spec.with_bias:
                # Bias adds in f32 even on int-accumulation paths: casting
                # a fractional bias to int32 would truncate it (reference
                # semantics add bias in the float out dtype).
                if acc_dtype == jnp.int32:
                    res = res.astype(jnp.float32) + b_ref[...].astype(
                        jnp.float32)
                else:
                    res = res + b_ref[...].astype(acc_dtype)
            # Narrow-int outputs (reference README.md:80-83 advertises
            # INT8-out int paths) use SATURATING semantics (numerics.
            # saturate — the shared epilogue home; the reference's C cast
            # wraps, but wrap-around on an overflowing dot is never the
            # intent; documented choice).
            res = numerics.saturate(res, kernel_out_dtype)
            out_ref[...] = _cast(res, kernel_out_dtype)

    # Inside a larger jit graph XLA caps a kernel's scoped VMEM at 16 MB by
    # default — far below what tuned tiles use standalone. Always raise the
    # limit to the arch working budget (the tile space is already
    # VMEM-constrained by tuner/space.vmem_usage).
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=hint.vmem_limit_bytes or 64 * 2**20)

    wbytes = K * N * spec.bits // 8
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((padded_m, N), kernel_out_dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), acc_dtype)],
        compiler_params=compiler_params,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + wbytes + M * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )

    def fn(A, Wp, scales=None, zeros=None, bias=None):
        if not interpret and A.dtype == f16:
            A = A.astype(mma if mma != jnp.int8 else jnp.float32)
        if A.dtype in (jnp.int4, jnp.uint4):
            # Sub-byte activations must arrive in int8 STORAGE: the axon
            # backend cannot device-put or operate on S4/U4 arrays at all,
            # and a failed transfer poisons the process's backend client
            # (2026-08-20 support-matrix sweep). A host numpy array can be
            # staged here losslessly; a device/traced S4 array is already
            # past the point of no return, so fail loudly instead of
            # wedging the backend.
            if isinstance(A, np.ndarray):
                A = A.astype(np.int8)
            elif interpret or jax.default_backend() == "cpu":
                # CPU (interpret or compiled) handles S4 fine — the
                # wedge is axon-transfer-specific.
                A = A.astype(jnp.int8)
            else:
                raise TypeError(
                    "int4/uint4 activations must be passed in int8 "
                    "storage on TPU (values in the 4-bit range): the "
                    "backend cannot transfer S4/U4 arrays. Cast with "
                    ".astype(np.int8) on host before device_put.")
        if A.shape[0] != padded_m:
            A = jnp.pad(A, ((0, padded_m - A.shape[0]), (0, 0)))
        args = [A, Wp]
        if spec.with_scaling:
            args.append(scales)
        if spec.with_zeros:
            args.append(zeros)
        if spec.with_bias:
            args.append(bias)
        if needs_lut:
            lut_dtype = jnp.float16 if (interpret and mma == jnp.float16) \
                else jnp.float32
            args.append(jnp.asarray(NF4_TABLE, dtype=lut_dtype).reshape(1, 16))
        out = call(*args)
        out = out[:M] if out.shape[0] != M else out
        if N != N_out:
            out = out[:, :N_out]
        if out.dtype != out_dtype:
            out = out.astype(out_dtype)
        return out

    return fn


def make_dequant_matmul_jit(spec: KernelSpec, hint: TileHint, *,
                            interpret: bool = False):
    return jax.jit(make_dequant_matmul(spec, hint, interpret=interpret))
