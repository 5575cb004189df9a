"""Tile-configuration space enumeration + analytic roofline cost model.

Replaces the reference's roller policy DFS
(/root/reference/bitblas/base/roller/policy/default.py:20-744 and
tensorcore.py:18-365): where the GPU policy searches smem tile shapes scored
by (traffic+1)*num_wave and assigns warps/rsteps/pipelines, the TPU space is
tiny — (block_m, block_n, block_k, mma dtype / decode path) constrained by
VMEM — so we enumerate it exhaustively, pre-rank with a roofline model, and
measure the top-k on device (same topk=20 contract as the reference tuner).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

from ..kernels.spec import KernelSpec
from .arch import TileDevice
from .hint import TileHint

# Decode cost in VPU ops per weight element (shift+mask+convert+epilogue
# amortization), by family. Calibrated coarse — only used for pre-ranking.
_DECODE_OPS = {"uint": 3.0, "int": 4.0, "fp": 6.0, "nf": 8.0,
               "fp_e4m3": 8.0, "fp_e5m2": 6.0}


def _divisors_multiple_of(n: int, base: int, lo: int, hi: int) -> List[int]:
    """Divisors d of n with base | d and lo <= d <= hi."""
    out = []
    d = base
    while d <= min(n, hi):
        if n % d == 0 and d >= lo:
            out.append(d)
        d += base
    return out


def _dtype_bytes(name: str) -> int:
    if name in ("float16", "bfloat16", "int16", "uint16"):
        return 2
    if name in ("float32", "int32", "uint32"):
        return 4
    return 1


def vmem_usage(spec: KernelSpec, hint: TileHint) -> int:
    """Rough VMEM working-set estimate (double-buffered inputs)."""
    if hint.decode_mode == "materialize":
        return 0  # XLA-managed two-pass plan; no Pallas VMEM budget
    if hint.decode_mode == "asplit":
        from ..kernels.asplit import _inner_spec_hint
        ispec, ihint = _inner_spec_hint(spec, hint)
        return vmem_usage(ispec, ihint)
    e = spec.elems_per_word
    BM, BN, BK = hint.block_m, hint.block_n, hint.block_k
    a_bytes = BM * BK * _dtype_bytes(spec.a_dtype)
    w_bytes = BK * (BN // e) * max(1, spec.storage_bits // 8)
    g = spec.group_size if spec.group_size > 0 else spec.k
    srows = max(BK // g, 1)
    s_bytes = srows * BN * 4 * (1 if spec.with_scaling else 0)
    z_bytes = srows * BN * 4 * (1 if spec.with_zeros else 0)
    acc_bytes = BM * BN * 4
    out_bytes = BM * BN * _dtype_bytes(spec.out_dtype)
    mma_b = 2 if hint.mma_dtype in ("bfloat16", "float16") else (
        1 if hint.mma_dtype == "int8" else 4)
    # Decoded-operand working set: the int32 word temp plus the decoded
    # slot operands (telescope materializes all e shifted copies at once).
    words32 = BK * (BN // e) * 4 if spec.bits < 8 else 0
    copies = e if hint.decode_mode == "telescope" else 2
    decoded = words32 + copies * BK * (BN // e) * mma_b
    return 2 * (a_bytes + w_bytes + s_bytes + z_bytes + out_bytes) \
        + acc_bytes + decoded


def roofline_seconds(spec: KernelSpec, hint: TileHint,
                     arch: TileDevice) -> float:
    """Analytic lower-bound time: max(memory, MXU, VPU decode)."""
    M, N, K = spec.m, spec.n_padded, spec.k
    e = spec.elems_per_word
    if hint.decode_mode == "materialize":
        # Two-pass: decode pass (HBM-stream the packed weights out as a
        # dense operand, VPU-decoding on the way) + vendor dense dot.
        w_packed = K * (N // e) * max(1, spec.storage_bits // 8)
        mma_b = 1 if hint.mma_dtype == "int8" else 2
        dense_b = K * N * mma_b
        dec_ops = 2.0 if spec.family in ("uint", "int") else 3.0
        t_dec = max((w_packed + dense_b) / arch.hbm_bandwidth,
                    K * N * dec_ops / arch.vpu_ops)
        mxu = arch.flops_int8 if hint.mma_dtype == "int8" else arch.flops_bf16
        a_b = M * K * _dtype_bytes(spec.a_dtype)
        o_b = M * N * _dtype_bytes(spec.out_dtype)
        ingest = (arch.mxu_ingest_int8 if hint.mma_dtype == "int8"
                  else arch.mxu_ingest_bf16)
        t_dot = max(2 * M * N * K / mxu,
                    (a_b + dense_b + o_b) / arch.hbm_bandwidth,
                    K * N / ingest)
        # the measured vendor dot sustains ~94% of peak — bake the derate
        # in so fused plans are not unfairly dominated at mid M
        return t_dec + t_dot / 0.94
    if hint.decode_mode == "asplit":
        # Activation-split: the inner int8-telescope kernel at 2M rows plus
        # a (negligible) XLA quantize prologue / combine epilogue.
        from ..kernels.asplit import _inner_spec_hint
        ispec, ihint = _inner_spec_hint(spec, hint)
        t_q = (3.0 * M * spec.k + 2.0 * M * N) / arch.vpu_ops
        return roofline_seconds(ispec, ihint, arch) + t_q
    BM = min(hint.block_m, max(M, 8))
    m_tiles = math.ceil(max(M, 8) / BM)
    n_tiles = N // hint.block_n

    w_total = K * (N // e) * max(1, spec.storage_bits // 8)
    g = spec.group_size if spec.group_size > 0 else K
    sz_total = (K // g) * N * 4 * (int(spec.with_scaling) + int(spec.with_zeros))
    a_total = M * K * _dtype_bytes(spec.a_dtype)
    o_total = M * N * _dtype_bytes(spec.out_dtype)
    bytes_moved = w_total * m_tiles + sz_total * m_tiles \
        + a_total * n_tiles + o_total
    t_mem = bytes_moved / arch.hbm_bandwidth

    flops = 2 * (m_tiles * BM) * N * K  # includes M-padding waste
    mxu = {"bfloat16": arch.flops_bf16, "float16": arch.flops_bf16,
           "float32": arch.flops_f32, "int8": arch.flops_int8}[hint.mma_dtype]
    t_mxu = flops / mxu

    # MXU weight-ingestion floor: every decoded operand element must stream
    # through the systolic array once per m-tile, at a rate independent of M
    # (see TileDevice.mxu_ingest_*). Binds in the GEMV/small-M regime.
    ingest_rate = (arch.mxu_ingest_int8 if hint.mma_dtype == "int8"
                   else arch.mxu_ingest_bf16)
    t_mxu = max(t_mxu, (K * N * m_tiles) / ingest_rate)

    dec_ops = _DECODE_OPS.get(spec.family, 4.0)
    if spec.bits >= 8 and spec.family in ("int", "uint"):
        dec_ops = 1.0
    if spec.fast_decoding:
        dec_ops = max(dec_ops - 1.0, 2.0)
    if (hint.decode_mode == "telescope" and spec.bits < 8
            and spec.family in ("uint", "int")):
        # 1 mask + (e-1) shifts + e casts per e-element word
        dec_ops = 2.0 + 1.0 / e
    t_vpu = (K * N * m_tiles * dec_ops) / arch.vpu_ops

    # Per-grid-step overhead (program re-entry + DMA descriptor setup):
    # ~0.2us/step measured on v5e. Additive — it is what separates
    # equal-roofline GEMV tilings (small tiles lose).
    steps = m_tiles * n_tiles * (K // hint.block_k)
    t_grid = 2e-7 * steps

    return max(t_mem, t_mxu, t_vpu) + t_grid


def enumerate_hints(spec: KernelSpec, arch: TileDevice,
                    max_candidates: int = 512) -> List[TileHint]:
    """All legal TileHints for this spec on this arch, roofline-ranked."""
    M, N, K = spec.m, spec.n_padded, spec.k
    e = spec.elems_per_word
    g = spec.group_size if spec.group_size > 0 else K

    m_pad = max(M, 8)
    # 2048 included: the i2 m=4096 winner is t2048x2048x1024_mask (int8
    # accumulators tolerate the VMEM pressure; 2026-08-19/20 head-to-heads).
    bm_opts = sorted({min(b, 1 << (m_pad - 1).bit_length())
                      for b in (8, 16, 32, 64, 128, 256, 512, 1024, 2048)
                      if b <= 2 * m_pad})

    # N here is spec.n_padded: always a whole number of 128*e pack tiles
    # (128 lanes for 8-bit dequant formats), so lane-aligned BN always
    # exist; [N] is the single-tile fallback for native dense specs whose
    # N has no aligned divisor (the dense kernel is one XLA dot anyway).
    lane_base = 128 * e if spec.bits < 8 else 128
    bn_opts = _divisors_multiple_of(N, lane_base, lane_base,
                                    min(N, 4096)) or [N]

    # BK: divisor of K, aligned to 128 sublanes, and group-compatible.
    bk_opts = []
    for bk in _divisors_multiple_of(K, 128, 128, min(K, 8192)):
        if bk % g == 0 or g % bk == 0:
            bk_opts.append(bk)
    if not bk_opts:
        bk_opts = [g] if K % g == 0 else [K]

    if spec.is_int_activation:
        mma_opts = ("int8", "bfloat16")
    elif spec.family in ("fp_e4m3", "fp_e5m2"):
        # fp8 weights span +-448/57344: bf16's 8-bit mantissa loses ~0.2%
        # per product, amplified by cancellation (the reference computes on
        # 10-bit-mantissa fp16 tensor cores). f32 MXU operands by default;
        # the tuner may still measure bf16 in.
        mma_opts = ("float32", "bfloat16")
    else:
        mma_opts = ("bfloat16", "float32")

    decode_opts = ("mask",)
    if spec.family in ("uint", "int") and spec.bits < 8:
        decode_opts = ("telescope", "mask")

    # Batched-group (3D dot over k-groups) pays off once a k-tile spans
    # several groups; emit it alongside the loop mode there. Interpret-only
    # for now: every batched tpu.matmul variant crashes this libtpu's Mosaic
    # compiler (tpu_compile_helper exit 1, 2026-08; scripts/ probe logs).
    batched_ok = (spec.with_scaling and not spec.with_zeros and arch.is_cpu)

    hints = []
    for bm in bm_opts:
        for bn in bn_opts:
            for bk in bk_opts:
                for mma in mma_opts:
                    for dm in decode_opts:
                        # uint4 mask decode on the int8 MXU crashes this
                        # libtpu's Mosaic (remote_compile HTTP 500,
                        # 2026-08) — hard-gate like batched below so the
                        # tuner never wastes candidates on it. int2 mask
                        # is fine UNSCALED; WITH grouped scales the 2-bit
                        # int8-MXU mask tiles also HTTP-500
                        # (tpu_w2a8_scaled_probe 2026-08-20: both mask
                        # candidates failed while every telescope tile
                        # compiled) — gate that combo too.
                        # conservative: ANY scaled 2-bit mask is gated —
                        # only grouped scaling was probed; per-channel
                        # may share the crash and telescope measures
                        # ~equal anyway
                        if (dm == "mask" and mma == "int8"
                                and not arch.is_cpu
                                and (spec.bits == 4 or
                                     (spec.bits == 2
                                      and spec.with_scaling))):
                            continue
                        gms = ("loop",)
                        if batched_ok and bk >= 4 * g:
                            gms = ("loop", "batched")
                        for gm in gms:
                            h = TileHint(block_m=bm, block_n=bn, block_k=bk,
                                         mma_dtype=mma, decode_mode=dm,
                                         group_mode=gm)
                            if vmem_usage(spec, h) > arch.vmem_bytes:
                                continue
                            hints.append(h)
                            if spec.family == "nf":
                                # The nested mux4 LUT saves ~25% of the NF4
                                # decode ops vs the flat select; let the
                                # measured tuner choose between them.
                                hints.append(TileHint(
                                    block_m=bm, block_n=bn, block_k=bk,
                                    mma_dtype=mma, decode_mode=dm,
                                    group_mode=gm, lut_mode="mux4"))

    # Two-pass materialize plan (kernels/materialize.py): decode the packed
    # weights to a dense HBM operand once, then the vendor dense dot. Wins
    # once M is large enough that the fused kernel's per-M-tile re-decode
    # exceeds the one-time decode pass; emitted from M>=512 and the tuner
    # measures it against the fused plans. Tile fields are inert for this
    # plan (XLA owns tiling) but keep legal values for vmem/display.
    if M >= 512:
        from ..kernels.materialize import supports_materialize
        mat_mmas = ("int8",) if spec.is_int_activation else ("bfloat16",)
        for mm in mat_mmas:
            h = TileHint(block_m=min(512, M), block_n=bn_opts[0],
                         block_k=bk_opts[0], mma_dtype=mm,
                         decode_mode="materialize")
            if supports_materialize(spec, h):
                hints.append(h)

    # Activation-split plan (kernels/asplit.py): float activations exactly
    # split into 2 int8 planes feeding the int8-MXU telescope. Wins in the
    # ingestion-bound small-M regime (int8 ingests ~1.23x faster than
    # bf16/f32 and the telescope decode drops to byte shifts); at M>~256
    # the doubled row count cancels the int8 MXU-rate advantage. Emit the
    # measured int-act small-M tile families and let the tuner decide.
    if M <= 256:
        from ..kernels.asplit import supports_asplit
        probe = TileHint(mma_dtype="int8", decode_mode="asplit")
        if supports_asplit(spec, probe):
            # wide-N mid-K (the measured int-act small-m family) and
            # narrow-N whole-K (the measured float small-m family), scaled
            # down when the shape is smaller than the headline sizes
            bns = sorted({bn for bn in bn_opts if bn >= min(1024, bn_opts[-1])})
            bks = sorted({bk for bk in bk_opts if bk <= 1024} |
                         ({min(K, 4096)} if min(K, 4096) in bk_opts else set()))
            for bn in bns:
                for bk in (bks[-1], bks[0]) if bks else ():
                    h = TileHint(block_m=256, block_n=bn, block_k=bk,
                                 mma_dtype="int8", decode_mode="asplit")
                    if h not in hints and \
                            vmem_usage(spec, h) <= arch.vmem_bytes:
                        hints.append(h)

    if spec.family in ("fp", "fp_e4m3", "fp_e5m2"):
        # r5 decode-floor campaign: the branchless fast decoders are
        # value-identical to legacy (tests/test_numerics.py) and measured
        # strictly faster (e4m3 m=1 56.6 -> 32.3us, tpu_decode_probe
        # 2026-08-20) — the space carries only the fast forms ("fast16"
        # emits the bf16 pattern directly when the MXU eats bf16).
        from dataclasses import replace
        hints = [replace(h, fp_mode="fast16"
                         if h.mma_dtype == "bfloat16" else "fast")
                 for h in hints]

    hints.sort(key=lambda h: roofline_seconds(spec, h, arch))
    return hints[:max_candidates]


def default_hint(spec: KernelSpec, arch: TileDevice) -> TileHint:
    """Best analytic hint without measuring (the 'default schedule').

    The roofline model ties across many GEMV tilings (ingest-bound), so the
    small-M sub-byte cases apply *measured* v5e preferences on top of the
    analytic ranking (scripts/tpu_gemv_sweep2.py, tpu_gemm256_sweep.py —
    2.3x over the raw analytic pick at llama GEMV shapes):
      * W_u{1,2,4} x float act, m<=16: f32 MXU operands (int->f32 casts are
        the cheap ones; f32 ingests at the bf16 elem rate), whole-K blocks,
        narrow bn, telescope decode.
      * int act sub-byte (tele_i8), m<=16: int8 MXU, bn~2048, bk~1024.
    """
    hints = enumerate_hints(spec, arch)
    if not hints:
        raise ValueError(f"no legal tile config for {spec}")
    if spec.native and spec.a_dtype == "float32":
        # True f32 accumulation (multi-pass "highest" precision). Without
        # this the XLA dot runs at bf16 OPERAND precision, and a recorded
        # f32 support-matrix cell beats its own f32 roofline by 3.6x —
        # a precision bug wearing a perf halo (r4 VERDICT item: no >100%
        # cells). The tuner may still measure a faster precision in when
        # the user asks for it explicitly.
        from dataclasses import replace
        return replace(hints[0], precision="highest")
    if spec.family in ("fp_e4m3", "fp_e5m2") or (spec.family == "fp"
                                                 and spec.bits == 4):
        # fp8/fp4 weight VALUES are bf16-exact (1-3 mantissa bits); only
        # the f16 activations round when fed to a bf16 MXU. Small m is
        # ingest-bound where f32 operands cost nothing extra (f32 ingests
        # at the bf16 elem rate) — keep the extra activation precision
        # free. Large m is MXU-bound: bf16 runs 2x the f32 rate
        # (measured m=256 e4m3: bf16/fast 51.4us vs f32/fast 58.1,
        # tpu_decode_probe 2026-08-20; fp4 r5e window 2026-08-21: m=1
        # f32 33.1us vs bf16/fast 38.3, m=16 f32/fast 32.2 vs 39.7,
        # m=256 bf16/fast 52.3 vs f32 54.3).
        want = "float32" if spec.m <= 16 else "bfloat16"
        for h in hints:
            if h.mma_dtype == want:
                return h
    if spec.family in ("int", "uint") and spec.bits > 8:
        # Wide-int weights: f32 MXU operands (f32 holds int16 exactly;
        # bf16's 8-bit mantissa rounds values above 256).
        for h in hints:
            if h.mma_dtype == "float32":
                return h

    def prefer(pred, pool):
        cand = [h for h in pool if pred(h)]
        return cand or pool

    # The measured preferences below come from v5e sweeps; apply them only
    # on that generation (and on cpu_interpret so tests exercise the same
    # hint paths the chip runs). Other generations keep the pure analytic
    # ranking until they have their own measurements.
    if arch.name not in ("tpu_v5e", "cpu_interpret"):
        return hints[0]

    if spec.family == "nf":
        # NF4 decode is a VPU LUT; mux4 (nested 4-wide muxes, shared
        # predicates, ~23 ops/elem) is the measured default — on-chip
        # 2026-08-19 (tpu_nf4_gather_probe): m=4096 771.6us mux4 vs 820.7
        # select (u4 = 745us → within 3.6%, round-1 done-bar met); m=1
        # 85.1 vs 100.5; m=256 97.6 vs 118.7. gather2d/gatherlane still do
        # not lower on this libtpu. Tile choice minimizes decode passes.
        pool = prefer(lambda h: h.lut_mode == "mux4", hints)
        pool = prefer(lambda h: h.mma_dtype == "bfloat16", pool)
        if spec.m <= 256:
            pool = prefer(lambda h: h.block_k >= min(spec.k, 4096), pool)
            pool = prefer(lambda h: h.block_n <= 512, pool)
        else:
            pool = prefer(lambda h: h.block_m >= 1024, pool)
            pool = prefer(lambda h: h.block_n <= 1024, pool)
            pool = prefer(lambda h: h.block_k == 1024, pool)
        return pool[0]
    if spec.bits < 8 and spec.family in ("uint", "int") and spec.m <= 16:
        pool = hints
        pool = prefer(lambda h: h.decode_mode == "telescope", pool)
        # exact-m blocks beat padded bm=256 at BOTH swept shapes (8192
        # sweep 2026-08-19; 4096 probe 2026-08-20: i2 m=16 10.0us vs 11.7,
        # u4 m=16 15.8 vs 16.6) — the padded grid re-reads A for rows that
        # contribute nothing.
        m_exact = max(8, -(-spec.m // 8) * 8)
        pool = prefer(lambda h: h.block_m == m_exact, pool)
        if spec.is_int_activation:
            pool = prefer(lambda h: h.mma_dtype == "int8", pool)
            # bn=2048 at both swept nk; wider bn degrades (4096-probe
            # whole-K m=1: bn 1024/2048/4096 -> 11.7/12.8/14.9us)
            pool = prefer(lambda h: h.block_n == 2048, pool)
            if spec.k >= 8192:
                # whole-K up to 8192: t16x2048x8192 measured 100.8% of
                # roof at nk=8192 (2026-08-19 llama-shape sweep)
                pool = prefer(lambda h: h.block_k >= min(spec.k, 8192),
                              pool)
            else:
                # at k<=4096 the half-K block wins: t16x2048x2048 10.0us
                # vs whole-K t16x2048x4096 11.7 (2026-08-20 probe)
                pool = prefer(lambda h: h.block_k == 2048, pool)
        else:
            pool = prefer(lambda h: h.mma_dtype == "float32", pool)
            # whole-K up to 8192: t16x512x8192 84.3% vs 77.1% for bk=4096
            pool = prefer(lambda h: h.block_k >= min(spec.k, 8192), pool)
            # m=1 wants narrow bn (t8x128x4096 17.0us), m=16 bn=512 (15.8)
            bn_cap = 256 if spec.m <= 8 else 512
            pool = prefer(lambda h: h.block_n <= bn_cap, pool)
        return pool[0]   # prefer() preserves the roofline-sorted order
    if (spec.bits < 8 and spec.family in ("uint", "int")
            and spec.is_int_activation):
        # int8-MXU sub-byte GEMM (tpu_gemv_sweep2 / tpu_gemm256_sweep):
        # m<=256 wide-N telescope; m>256 tall mask tiles (fewer W streams)
        if spec.m <= 256:
            pool = prefer(lambda h: h.decode_mode == "telescope", hints)
            pool = prefer(lambda h: h.mma_dtype == "int8", pool)
            pool = prefer(lambda h: h.block_n >= 4096, pool)
            pool = prefer(lambda h: h.block_k <= 512, pool)
        else:
            # int2 mask measured best (83%); int4 mask CRASHES this
            # libtpu's Mosaic at large-M int8 tiles (HTTP 500 compile
            # helper, 2026-08) — telescope is both safe and fast there
            # (542us vs the bf16 path's 798us at 4096^3). Grouped-scaled
            # 2-bit mask tiles also crash (tpu_w2a8_scaled_probe
            # 2026-08-20) — measured winner there is
            # t1024x2048x1024_int8_telescope (561.7us at 4096^3).
            scaled = spec.with_scaling
            dm = "mask" if (spec.bits == 2 and not scaled) \
                else "telescope"
            pool = prefer(lambda h: h.decode_mode == dm, hints)
            pool = prefer(lambda h: h.mma_dtype == "int8", pool)
            pool = prefer(lambda h: h.block_m >= 1024, pool)
            if spec.bits == 2 and scaled:
                # pin the probe-measured tile exactly — taller bm is
                # unprobed for this combo and the mask twins crash
                pool = prefer(lambda h: h.block_m == 1024, pool)
                pool = prefer(lambda h: h.block_n <= 2048, pool)
                pool = prefer(lambda h: h.block_k == 1024, pool)
            elif spec.bits == 2:
                # in-window head-to-heads (2026-08-19/20): t2048x2048x1024
                # 89.1% vs t1024^3 83.5% at 8192^2 (re-confirmed 87.3 vs
                # 83.7 in a 3rd window), 80.2 vs 79.3 at 4096^2.
                pool = prefer(lambda h: h.block_m >= 2048, pool)
                pool = prefer(lambda h: h.block_n <= 2048, pool)
                pool = prefer(lambda h: h.block_k == 1024, pool)
            else:                # u4 tele: 1024x2048x512 family (542us)
                pool = prefer(lambda h: h.block_n <= 2048, pool)
                pool = prefer(lambda h: h.block_k <= 512, pool)
        return pool[0]   # prefer() preserves the roofline-sorted order
    if (spec.bits < 8 and spec.family in ("uint", "int")
            and not spec.is_int_activation):
        pool = prefer(lambda h: h.decode_mode == "telescope", hints)
        pool = prefer(lambda h: h.mma_dtype == "bfloat16", pool)
        if spec.m <= 256:
            # compute-bound but decode-sensitive: whole-K narrow tiles
            # measured ~97% vs ~80% for the analytic pick (tpu_gemm256_sweep)
            pool = prefer(lambda h: h.block_k >= min(spec.k, 4096), pool)
            pool = prefer(lambda h: h.block_n <= 1024, pool)
        else:
            # large-M: tall blocks amortize W re-streams; small bk keeps the
            # decoded working set in VMEM; a single-N-tile block streams A
            # once (1024x4096x512: 717us vs 741 for bn=2048, largem sweep)
            pool = prefer(lambda h: h.block_m >= 512, pool)
            pool = prefer(lambda h: h.block_k <= 512, pool)
            pool = prefer(lambda h: h.block_n >= min(spec.n, 4096), pool)
        return pool[0]   # prefer() preserves the roofline-sorted order
    return hints[0]
