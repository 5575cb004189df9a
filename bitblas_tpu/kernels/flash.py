"""Pallas TPU flash-attention kernels (prefill + decode).

TPU-native counterpart of the reference's TileLang flash attention
(/root/reference/bitblas/ops/general_flashatten/tilelang/flashatten.py):
same operator semantics — Q [B, S, H, D] x K/V (K optionally pre-transposed,
layout "ntn") with online-softmax streaming over KV blocks and optional
causal masking — but blocked for VMEM/MXU instead of smem/MMA: the grid is
(batch*heads, q_blocks, kv_blocks) with the kv loop innermost, running
max/sum state in VMEM scratch, exactly the memory-saving recurrence of
FlashAttention-2.

Layout note (the r1 -> r2 2x win): the kernels index heads *in place* on the
free row-major views [B, S, H*D] / [B, D, Hkv*S] via BlockSpec index maps —
no [B,S,H,D] -> [B*H,S,D] transposes. The old XLA-level transposes of
Q/K/V/out round-tripped ~4 tensor copies through HBM, which at s=2048
rivaled the attention FLOPs themselves.

`make_flash_decode` is the length-masked decode kernel for serving KV
caches: per-sequence lengths are scalar-prefetched, KV blocks past a
sequence's length are never even DMA'd (the index map clamps to the last
active block, so trailing grid steps re-reference the same block and Mosaic
skips the copy).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attend_block(q, k, v, m_prev, l_prev, acc_prev, *, scale, causal,
                  q_start, kv_start, block_q, block_kv, kv_len=None,
                  k_transposed=False, kv_lo=None, q_window=None):
    """One online-softmax step. q [BQ, D], k [BKV, D] (or [D, BKV] when
    k_transposed — dotted in place, no relayout), v [BKV, D].
    QK/PV dots run on bf16 operands (f32 accumulate) — the MXU-native rate;
    softmax statistics stay f32. `kv_len` masks KV positions at and beyond
    the valid length: their scores go to -inf AND their V rows to zero
    (Pallas pads out-of-range block reads with unspecified values — a NaN
    there would otherwise poison the p@V dot even at weight zero).
    `kv_lo` (sliding window) masks KV positions BELOW it the same way."""
    if kv_len is not None or kv_lo is not None:
        vrow = kv_start + jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        if kv_len is not None and kv_lo is not None:
            vkeep = (vrow < kv_len) & (vrow >= kv_lo)
        elif kv_len is not None:
            vkeep = vrow < kv_len
        else:
            vkeep = vrow >= kv_lo
        v = jnp.where(vkeep, v, jnp.zeros_like(v))
    # Work in base 2: exp2 is the cheap VPU op (exp costs ~4x); the scale
    # folds log2(e) in, and the running max m is kept in the base-2 domain.
    # scale=None means the caller pre-folded scale*log2(e) into q (the
    # prefill kernel does it during the Q bf16 cast — one fused XLA pass
    # instead of one VPU multiply per SCORE element per kv step).
    contract = (((1,), (0,)), ((), ())) if k_transposed \
        else (((1,), (1,)), ((), ()))
    s = jax.lax.dot_general(q, k, contract,
                            preferred_element_type=jnp.float32)
    if scale is not None:
        s = s * (scale * 1.4426950408889634)
    kj = None
    if causal or kv_len is not None or kv_lo is not None \
            or q_window is not None:
        kj = kv_start + jax.lax.broadcasted_iota(jnp.int32,
                                                 (block_q, block_kv), 1)
    if kv_len is not None:
        s = jnp.where(kj < kv_len, s, NEG_INF)
    if kv_lo is not None:
        s = jnp.where(kj >= kv_lo, s, NEG_INF)
    if causal or q_window is not None:
        qi = q_start + jax.lax.broadcasted_iota(jnp.int32,
                                                (block_q, block_kv), 0)
        if causal:
            s = jnp.where(qi >= kj, s, NEG_INF)
        if q_window is not None:
            # per-ROW sliding-window lower bound: row qi attends keys in
            # (qi - window, qi]
            s = jnp.where(kj > qi - q_window, s, NEG_INF)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(s - m_new)
    alpha = jnp.exp2(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_new = acc_prev * alpha + pv
    return m_new, l_new, acc_new


def _legal_block(block: int, seq_len: int, *, lane: bool = False) -> int:
    """Clamp a block size to the sequence and round down to a Mosaic-legal
    size (sublane blocks: multiples of 8; lane blocks: multiples of 128)."""
    block = min(block, seq_len)
    q = 128 if lane else 8
    return max(q, block - block % q)


def make_flash_attention(*, batch: int, heads: int, seq_len: int, dim: int,
                         kv_heads: int = None, causal: bool = False,
                         trans_k: bool = False, block_q: int = 512,
                         block_kv: int = 1024, out_dtype=jnp.float16,
                         diag_sub: int = None, window: int = None,
                         interpret: bool = False, _scale: float = None):
    """Build attention over Q [B, S, H, D], K/V [B, S, Hkv, D]
    (K [B, D, Hkv, S] when trans_k). Returns fn(Q, K, V) -> [B, S, H, D].

    Heads are addressed through BlockSpec index maps on the free row-major
    views (see module docstring) — the returned fn performs no transposes.
    """
    kv_heads = kv_heads or heads
    assert heads % kv_heads == 0
    group = heads // kv_heads
    scale = _scale if _scale is not None else 1.0 / math.sqrt(dim)
    if dim % 128 and (heads > 1 or kv_heads > 1):
        # The fused-head views put a dim-wide block on a heads*dim-wide
        # lane axis; Mosaic needs lane blocks to be 128-multiples or the
        # full dim. Small heads (d=64: GPT-2/small-llama class) get a
        # ZERO-PAD shim to the next lane multiple instead of the 7.5-15
        # TF/s XLA fallback (r5e window): padded K columns add 0 to every
        # q.k dot and padded V columns emit zeros that the slice drops,
        # so the math is exact; the true-1/sqrt(dim) scale rides the
        # _scale override. 2x the d-bytes, but the kernel then runs at
        # the d=128 rate (~60 TF/s dense) — a 4-8x win over the fallback.
        dim_p = -(-dim // 128) * 128
        inner = make_flash_attention(
            batch=batch, heads=heads, seq_len=seq_len, dim=dim_p,
            kv_heads=kv_heads, causal=causal, trans_k=trans_k,
            block_q=block_q, block_kv=block_kv, out_dtype=out_dtype,
            diag_sub=diag_sub, window=window, interpret=interpret,
            _scale=scale)
        pad_d = dim_p - dim

        def padded(q, k, v):
            qp = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, pad_d)))
            if trans_k:                      # K [B, D, Hkv, S]
                kp = jnp.pad(k, ((0, 0), (0, pad_d), (0, 0), (0, 0)))
            else:
                kp = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, pad_d)))
            vp = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, pad_d)))
            return inner(qp, kp, vp)[..., :dim]

        return padded
    block_q = _legal_block(block_q, seq_len)
    if trans_k:
        # K^T blocks take S on the lane axis, head-interleaved: the block
        # width must divide S so a block never straddles two heads.
        block_kv = _legal_block(block_kv, seq_len, lane=True)
        while seq_len % block_kv:
            block_kv -= 128
            if block_kv <= 128:
                block_kv = 128
                break
        if seq_len % block_kv:
            # Head-interleaved K^T lane layout: no legal 128-multiple block
            # divides S, so this shape cannot tile on TPU. The FlashAtten
            # op catches this and falls back to its XLA oracle.
            raise ValueError(
                f"ntn layout needs seq_len % 128 == 0 on TPU (got "
                f"S={seq_len}); pad S, use nnn, or use the XLA fallback")
    else:
        block_kv = _legal_block(block_kv, seq_len)
    nq = pl.cdiv(seq_len, block_q)
    nkv = pl.cdiv(seq_len, block_kv)
    f16 = jnp.dtype(jnp.float16)
    kernel_out = jnp.float32 if (jnp.dtype(out_dtype) == f16 and
                                 not interpret) else out_dtype

    # Causal: FLATTENED TRIANGULAR grid — only live (qi, ki) pairs get a
    # grid step at all. The previous shape, a dense (nq, nkv) grid with
    # dead steps predicated off and their DMAs clamped away, still paid
    # nearly full step time per dead step (measured 2026-08-19: causal
    # 2103us vs non-causal 2201us at s=2048 bq=bkv=1024 — the skip saved
    # ~nothing). The live (qi, ki) walk is static, so it is enumerated
    # host-side and scalar-prefetched (the decode kernel's convention).
    if window is not None and not causal:
        raise NotImplementedError("sliding window requires causal=True")
    if causal:
        # Sliding window additionally prunes kv blocks wholly BELOW each
        # q block's band, and reverses each q block's kv order to
        # DIAGONAL-FIRST: with a window, a row's earliest visited block
        # can be entirely outside its band, and an all-masked FIRST block
        # breaks the online softmax (exp2(NEG_INF - NEG_INF) == 1 weights
        # every masked key). Diagonal-first guarantees every row's first
        # visit contains its own position. init/emit predicates become
        # in-kernel scalar arithmetic on qi (no extra prefetch tables).
        def _ki_lo(qi):
            if window is None:
                return 0
            return max(0, (qi * block_q - window + 1) // block_kv)

        def _ki_hi(qi):
            return min(nkv - 1,
                       (qi * block_q + block_q - 1) // block_kv)

        if window is None:
            walk = [(qi, ki) for qi in range(nq)
                    for ki in range(_ki_hi(qi) + 1)]
        else:
            walk = [(qi, ki) for qi in range(nq)
                    for ki in range(_ki_hi(qi), _ki_lo(qi) - 1, -1)]
        qi_tab = jnp.asarray([w[0] for w in walk], jnp.int32)
        ki_tab = jnp.asarray([w[1] for w in walk], jnp.int32)
        grid = (batch * heads, len(walk))
        live_frac = len(walk) / (nq * nkv)
    else:
        grid = (batch * heads, nq, nkv)
        live_frac = 1.0

    # Diagonal-step Q sub-chunking: a diagonal block (q_start == kv_start,
    # only possible when block_q == block_kv) is half dead — row i attends
    # just columns [0, i]. Q sub-chunk r (rows [r*sub, (r+1)*sub)) needs kv
    # columns [0, (r+1)*sub) ONLY, and that width is STATIC, so the diag
    # branch runs nsub narrow dots instead of one full-block dot: MXU+VPU
    # work drops from 1.0 to (1 + 1/nsub)/2 of a full step (0.5625 at
    # nsub=8). Sub-chunks touch disjoint m/l/acc row slices, so they carry
    # no serial dependency. Requires S % block_kv == 0 (no kv_len masking
    # folded into the narrow dots) and 128-multiple widths for trans_k's
    # lane-axis slices.
    # diag_sub: None = auto, 0 = disable (full-block masked diag step).
    # One-window sweep (tpu_flash_diag_probe, 2026-08-19, bq=bkv=1024):
    # HALF-block sub-chunking wins — s2048 causal 82.4 TF/s vs 71.8 off /
    # 76.7 @256 / 69.0 @128; s4096 109.3 vs 99.0. Two sub-chunks cut the
    # diagonal step to 0.75x work; finer splits drown the saving in
    # per-sub-chunk serialization (the Mosaic intra-step behavior every
    # pipelining probe hits). 82.4 sits AT the triangular-geometry
    # ceiling (2/3 of the 122.7 dense rate).
    if diag_sub is None:
        diag_sub = max(128, block_q // 2)
    use_tri_sub = (causal and diag_sub > 0 and block_q == block_kv
                   and seq_len % block_kv == 0
                   and block_q % diag_sub == 0 and block_q // diag_sub > 1
                   and (window is None or window >= block_q))
    n_sub = block_q // diag_sub if use_tri_sub else 1

    # Index maps address heads inside the fused last dim: Q/out on
    # [B, S, H*D] (column block h), K/V on [B, S, Hkv*D]; trans_k K on
    # [B, D, Hkv*S] (column block kvh*nkv + ki). Causal maps decode
    # (qi, ki) from the prefetched walk tables (refs arrive LAST).
    if causal:
        def q_map(bh, t, qt, kt):
            del kt
            return (bh // heads, qt[t], bh % heads)

        def kv_map(bh, t, qt, kt):
            del qt
            return (bh // heads, kt[t], (bh % heads) // group)

        def kt_map(bh, t, qt, kt):
            del qt
            return (bh // heads, 0,
                    ((bh % heads) // group) * nkv + kt[t])
    else:
        def q_map(bh, qi, ki):
            return (bh // heads, qi, bh % heads)

        def kv_map(bh, qi, ki):
            return (bh // heads, ki, (bh % heads) // group)

        def kt_map(bh, qi, ki):
            return (bh // heads, 0, ((bh % heads) // group) * nkv + ki)

    def body(qi, ki, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
        """Shared step body; qi/ki are dynamic scalars (grid indices for
        the dense grid, walk-table entries for the triangular one)."""
        q_start = qi * block_q
        kv_start = ki * block_kv
        if window is None:
            first = ki == 0
        else:
            # diagonal-first walk: the first step for a q block is its
            # highest kv block (see the walk construction note)
            first = ki == jnp.minimum(
                (q_start + block_q - 1) // block_kv, nkv - 1)

        @pl.when(first)
        def _():
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        def step(masked, win=False):
            def _run():
                m_new, l_new, acc_new = _attend_block(
                    q_ref[0], k_ref[0], v_ref[0], m_ref[...], l_ref[...],
                    acc_ref[...],
                    scale=None, causal=masked, q_start=q_start,
                    kv_start=kv_start, block_q=block_q, block_kv=block_kv,
                    kv_len=seq_len if seq_len % block_kv else None,
                    k_transposed=trans_k,
                    q_window=window if win else None)
                m_ref[...] = m_new
                l_ref[...] = l_new
                acc_ref[...] = acc_new
            return _run

        def diag_tri_step():
            # q_start == kv_start here (bq == bkv diagonal step). Static
            # r-loop: sub-chunks update disjoint m/l/acc row slices, so
            # Mosaic is free to overlap their dots.
            for r in range(n_sub):
                lo, hi = r * diag_sub, (r + 1) * diag_sub
                q_r = q_ref[0, lo:hi, :]
                k_r = k_ref[0, :, :hi] if trans_k else k_ref[0, :hi, :]
                m_new, l_new, acc_new = _attend_block(
                    q_r, k_r, v_ref[0, :hi, :], m_ref[lo:hi, :],
                    l_ref[lo:hi, :], acc_ref[lo:hi, :],
                    scale=None, causal=True, q_start=q_start + lo,
                    kv_start=kv_start, block_q=diag_sub, block_kv=hi,
                    kv_len=None, k_transposed=trans_k)
                m_ref[lo:hi, :] = m_new
                l_ref[lo:hi, :] = l_new
                acc_ref[lo:hi, :] = acc_new

        if causal:
            # Every step in the triangular walk is live; the only dynamic
            # split is diagonal-intersecting vs fully allowed (no mask ops
            # — the VPU softmax chain is the serial bottleneck, so the ~4
            # mask ops/element matter). Diagonal steps take the sub-chunked
            # triangular path when legal (see use_tri_sub above).
            diag = kv_start + block_kv - 1 > q_start
            if window is None:
                pl.when(diag)(diag_tri_step if use_tri_sub else step(True))
                pl.when(jnp.logical_not(diag))(step(False))
            else:
                # Band-EDGE blocks (some row's window starts inside them)
                # need the per-row window mask; interior blocks skip it —
                # the same static-split rationale as `diag` (per-element
                # mask ops ride the serial VPU softmax chain).
                edge = kv_start < q_start + block_q - window
                ndiag = jnp.logical_not(diag)
                nedge = jnp.logical_not(edge)
                if use_tri_sub:
                    # tri_sub is gated to window >= block_q, where the
                    # diagonal block never intersects the band edge
                    pl.when(diag)(diag_tri_step)
                else:
                    pl.when(diag & edge)(step(True, True))
                    pl.when(diag & nedge)(step(True, False))
                pl.when(ndiag & edge)(step(False, True))
                pl.when(ndiag & nedge)(step(False, False))
            if window is None:
                last = (q_start + block_q - 1) // block_kv
                emit = ki == jnp.minimum(last, nkv - 1)
            else:
                # diagonal-first: the final step is the lowest kv block
                # of the band ((q_start - window + 1) floor-divides
                # toward -inf for q_start < window; clamp at 0)
                emit = ki == jnp.maximum(
                    (q_start - window + 1) // block_kv, 0)
        else:
            step(False)()
            emit = ki == nkv - 1

        @pl.when(emit)
        def _():
            denom = jnp.maximum(l_ref[...], 1e-30)
            o_ref[0] = (acc_ref[...] / denom).astype(kernel_out)

    in_specs = [
        pl.BlockSpec((1, block_q, dim), q_map),
        (pl.BlockSpec((1, dim, block_kv), kt_map) if trans_k else
         pl.BlockSpec((1, block_kv, dim), kv_map)),
        pl.BlockSpec((1, block_kv, dim), kv_map),
    ]
    out_spec = pl.BlockSpec((1, block_q, dim), q_map)
    scratch = [
        pltpu.VMEM((block_q, 1), jnp.float32),
        pltpu.VMEM((block_q, 1), jnp.float32),
        pltpu.VMEM((block_q, dim), jnp.float32),
    ]
    cost = pl.CostEstimate(
        flops=int(4 * batch * heads * seq_len * seq_len * dim * live_frac),
        bytes_accessed=batch * seq_len * dim * (heads * 2 + kv_heads * 2)
        * 2,
        transcendentals=int(batch * heads * seq_len * seq_len * live_frac),
    )

    if causal:
        def kernel(qt_ref, kt_ref, q_ref, k_ref, v_ref, o_ref,
                   m_ref, l_ref, acc_ref):
            t = pl.program_id(1)
            body(qt_ref[t], kt_ref[t], q_ref, k_ref, v_ref, o_ref,
                 m_ref, l_ref, acc_ref)

        tri_call = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_spec,
                scratch_shapes=scratch,
            ),
            out_shape=jax.ShapeDtypeStruct((batch, seq_len, heads * dim),
                                           kernel_out),
            cost_estimate=cost,
            interpret=interpret,
        )

        def call(q, k, v):
            return tri_call(qi_tab, ki_tab, q, k, v)
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
            body(pl.program_id(1), pl.program_id(2), q_ref, k_ref, v_ref,
                 o_ref, m_ref, l_ref, acc_ref)

        call = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((batch, seq_len, heads * dim),
                                           kernel_out),
            scratch_shapes=scratch,
            cost_estimate=cost,
            interpret=interpret,
        )

    def fn(Q, K, V):
        B, S, H, D = Q.shape
        assert (B, S, H, D) == (batch, seq_len, heads, dim), (Q.shape,)
        q = Q.reshape(B, S, H * D)                  # free row-major view
        if trans_k:
            # K [B, D, Hkv, S] -> [B, D, Hkv*S] (free)
            k = K.reshape(B, D, kv_heads * S)
        else:
            k = K.reshape(B, S, kv_heads * D)
        v = V.reshape(B, S, kv_heads * D)
        # Pre-fold scale*log2(e) into Q (see _attend_block scale=None): the
        # multiply fuses into the bf16 cast / kernel prologue, replacing a
        # per-score-element VPU op on every kv step. f32 multiply first so
        # the fold costs no precision beyond the operand cast itself.
        q = q.astype(jnp.float32) * (scale * 1.4426950408889634)
        if Q.dtype == jnp.float32:
            pass                       # explicit-f32 configs stay f32
        elif interpret:
            q = q.astype(Q.dtype)      # CPU tests keep device-like operands
        else:
            q = q.astype(jnp.bfloat16)  # f16/bf16: MXU-native rate (no f16
            if k.dtype == f16:          # in Mosaic kernels)
                k, v = (t.astype(jnp.bfloat16) for t in (k, v))
        out = call(q, k, v)
        return out.reshape(B, S, H, D).astype(out_dtype)

    return fn


def make_flash_decode(*, batch: int, heads: int, max_seq_len: int, dim: int,
                      kv_heads: int = None, block_kv: int = 1024,
                      out_dtype=jnp.float16, partial_stats: bool = False,
                      window: int = None, interpret: bool = False):
    """Length-masked decode attention for serving KV caches.

    fn(q, k_cache, v_cache, lengths[, slots]) with q [B, H, D] (one new
    token per sequence), caches [rows, Smax, Hkv, D] (rows defaults to
    B — pass the slot-cache row count and a `slots` [B] map to attend
    straight out of the slot cache without materializing a gather),
    lengths [B] int32 (tokens valid, INCLUDING the newest at position
    lengths-1). Returns [B, H, D].

    KV blocks at or past a sequence's length are skipped: the kv index map
    clamps to the last active block, so trailing grid steps re-reference
    the same block (no DMA) and the attend body is predicated off. Reads
    are therefore length-proportional — the flash-decode analog for the
    slot cache engine (reference has no decode-attention kernel; its
    serving is delegated to vLLM).

    partial_stats=True returns the online-softmax state instead of the
    normalized output — fn(...) -> (acc [B,H,D] f32 unnormalized,
    m [B,H] f32 natural-log-domain max, l [B,H] f32) — for the
    context-parallel cross-shard log-sum-exp merge
    (serving.kv_cache.decode_attention_partial): same length-proportional
    reads over a sequence SHARD of the cache, where `lengths` is the
    shard-local valid count (0 = nothing valid here; m comes back at
    -1e30*ln2 so the merge weight underflows to zero).
    """
    kv_heads = kv_heads or heads
    assert heads % kv_heads == 0
    assert dim % 128 == 0, "flash decode needs lane-aligned head dim"
    group = heads // kv_heads
    scale = 1.0 / math.sqrt(dim)
    block_kv = _legal_block(block_kv, max_seq_len)
    nkv = pl.cdiv(max_seq_len, block_kv)
    # One grid step per (sequence, KV HEAD): the whole GQA group's q rows
    # attend the kv block together, so each block crosses HBM once per kv
    # head instead of once per q head (group-fold fewer reads AND steps —
    # the per-q-head grid measured 8x off the bandwidth roof at group=8).
    grid = (batch * kv_heads, nkv)
    qrows = max(8, -(-group // 8) * 8)   # group rows, sublane-padded
    f16 = jnp.dtype(jnp.float16)
    kernel_out = jnp.float32 if (jnp.dtype(out_dtype) == f16 and
                                 not interpret) else out_dtype

    # (Scalar-prefetch refs arrive LAST in index maps.)
    def q_map(bh, ki, lens, slots):
        del lens, slots, ki
        return (bh, 0, 0)

    def kv_map(bh, ki, lens, slots):
        b = bh // kv_heads
        last = jnp.maximum(lens[b] - 1, 0) // block_kv
        ki2 = jnp.minimum(ki, last)
        if window is not None:
            # sliding window: blocks wholly below len-window are dead —
            # clamp up so the leading grid steps re-reference the first
            # live block (no DMA) and the body predicates them off.
            first = jnp.maximum(lens[b] - window, 0) // block_kv
            ki2 = jnp.maximum(ki2, jnp.minimum(first, last))
        return (slots[b], ki2, bh % kv_heads)

    def body(len_ref, q_ref, k_ref, v_ref, m_ref, l_ref, acc_ref):
        bh = pl.program_id(0)
        ki = pl.program_id(1)
        b = bh // kv_heads
        length = len_ref[b]

        @pl.when(ki == 0)
        def _():
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        kv_start = ki * block_kv
        if window is None:
            live = kv_start < length
            win_lo = None
        else:
            win_lo = jnp.maximum(length - window, 0)
            live = (kv_start < length) & (kv_start + block_kv > win_lo)

        @pl.when(live)
        def _attend():
            m_new, l_new, acc_new = _attend_block(
                q_ref[0], k_ref[0], v_ref[0], m_ref[...], l_ref[...],
                acc_ref[...], scale=scale, causal=False,
                q_start=0, kv_start=kv_start, block_q=qrows,
                block_kv=block_kv, kv_len=length, kv_lo=win_lo)
            m_ref[...] = m_new
            l_ref[...] = l_new
            acc_ref[...] = acc_new

        return ki == nkv - 1

    if partial_stats:
        def kernel(len_ref, slot_ref, q_ref, k_ref, v_ref, oa_ref, om_ref,
                   ol_ref, m_ref, l_ref, acc_ref):
            del slot_ref  # consumed by the index maps
            emit = body(len_ref, q_ref, k_ref, v_ref, m_ref, l_ref,
                        acc_ref)

            @pl.when(emit)
            def _():
                oa_ref[0] = acc_ref[...]
                om_ref[0] = m_ref[...]
                ol_ref[0] = l_ref[...]

        out_specs = (pl.BlockSpec((1, qrows, dim), q_map),
                     pl.BlockSpec((1, qrows, 1), q_map),
                     pl.BlockSpec((1, qrows, 1), q_map))
        out_shape = (
            jax.ShapeDtypeStruct((batch * kv_heads, qrows, dim),
                                 jnp.float32),
            jax.ShapeDtypeStruct((batch * kv_heads, qrows, 1), jnp.float32),
            jax.ShapeDtypeStruct((batch * kv_heads, qrows, 1),
                                 jnp.float32))
    else:
        def kernel(len_ref, slot_ref, q_ref, k_ref, v_ref, o_ref, m_ref,
                   l_ref, acc_ref):
            del slot_ref  # consumed by the index maps
            emit = body(len_ref, q_ref, k_ref, v_ref, m_ref, l_ref,
                        acc_ref)

            @pl.when(emit)
            def _():
                denom = jnp.maximum(l_ref[...], 1e-30)
                o_ref[0] = (acc_ref[...] / denom).astype(kernel_out)

        out_specs = pl.BlockSpec((1, qrows, dim), q_map)
        out_shape = jax.ShapeDtypeStruct((batch * kv_heads, qrows, dim),
                                         kernel_out)

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, qrows, dim), q_map),
                pl.BlockSpec((1, block_kv, dim), kv_map),
                pl.BlockSpec((1, block_kv, dim), kv_map),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((qrows, 1), jnp.float32),
                pltpu.VMEM((qrows, 1), jnp.float32),
                pltpu.VMEM((qrows, dim), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * heads * max_seq_len * dim,
            bytes_accessed=batch * max_seq_len * kv_heads * dim * 4,
            transcendentals=batch * heads * max_seq_len,
        ),
        interpret=interpret,
    )

    def fn(q, k_cache, v_cache, lengths, slots=None):
        B, H, D = q.shape
        assert (B, H, D) == (batch, heads, dim), (q.shape,)
        rows, Smax = k_cache.shape[0], k_cache.shape[1]
        assert Smax == max_seq_len, (k_cache.shape,)
        if slots is None:
            slots = jnp.arange(B, dtype=jnp.int32)
            assert rows == B, (k_cache.shape, B)
        # rows = GQA group members (+ sublane pad), one block per kv head
        qg = q.reshape(B * kv_heads, group, D)
        q8 = jnp.zeros((B * kv_heads, qrows, D), q.dtype
                       ).at[:, :group, :].set(qg)
        k2 = k_cache.reshape(rows, Smax, kv_heads * D)
        v2 = v_cache.reshape(rows, Smax, kv_heads * D)
        if not interpret and q8.dtype == f16:
            q8, k2, v2 = (t.astype(jnp.bfloat16) for t in (q8, k2, v2))
        out = call(jnp.asarray(lengths, jnp.int32),
                   jnp.asarray(slots, jnp.int32), q8, k2, v2)
        if partial_stats:
            acc, m, l = out
            # kernel softmax state lives in the base-2 domain (exp2);
            # convert m to the natural-log domain the XLA partial and the
            # cross-shard merge use: exp2(m2 - x2) == exp(m2*ln2 - x_e).
            ln2 = 0.6931471805599453
            return (acc[:, :group, :].reshape(B, H, D),
                    (m[:, :group, 0] * ln2).reshape(B, H),
                    l[:, :group, 0].reshape(B, H))
        return out[:, :group, :].reshape(B, H, D).astype(out_dtype)

    return fn


def make_flash_decode_quant(*, batch: int, heads: int, max_seq_len: int,
                            dim: int, kv_heads: int = None,
                            block_kv: int = 1024, out_dtype=jnp.float16,
                            partial_stats: bool = False,
                            window: int = None, interpret: bool = False):
    """Length-masked decode attention over the int8-quantized KV cache.

    fn(q, k_cache, v_cache, k_scale, v_scale, lengths[, slots]) with
    q [B, H, D] float, caches [rows, Smax, Hkv, D] int8, scales
    [rows, Smax, Hkv] f32 (serving/kv_cache.py quantized layout),
    lengths [B]. Returns [B, H, D].

    Same length-proportional block skipping as make_flash_decode, with
    HALF the KV bytes crossing HBM (int8 codes; decode attention is
    KV-bandwidth-bound). Scales apply to dot results inside the online
    softmax: K scales multiply the logit columns before the running max,
    V scales fold into the softmax weights before the PV dot — the same
    factorization as serving.kv_cache.decode_attention_quant.

    partial_stats=True returns (acc, m, l) in the natural-log domain for
    the context-parallel cross-shard merge (see make_flash_decode) — same
    length-proportional int8 shard reads.
    """
    kv_heads = kv_heads or heads
    assert heads % kv_heads == 0
    assert dim % 128 == 0, "flash decode needs lane-aligned head dim"
    group = heads // kv_heads
    scale = 1.0 / math.sqrt(dim)
    block_kv = _legal_block(block_kv, max_seq_len)
    nkv = pl.cdiv(max_seq_len, block_kv)
    # GQA-grouped grid (see make_flash_decode): one step per (sequence,
    # kv head) — each int8 block crosses HBM once per kv head.
    grid = (batch * kv_heads, nkv)
    qrows = max(8, -(-group // 8) * 8)
    f16 = jnp.dtype(jnp.float16)
    kernel_out = jnp.float32 if (jnp.dtype(out_dtype) == f16 and
                                 not interpret) else out_dtype
    log2e = 1.4426950408889634

    def q_map(bh, ki, lens, slots):
        del lens, slots, ki
        return (bh, 0, 0)

    def kv_map(bh, ki, lens, slots):
        b = bh // kv_heads
        last = jnp.maximum(lens[b] - 1, 0) // block_kv
        ki2 = jnp.minimum(ki, last)
        if window is not None:
            first = jnp.maximum(lens[b] - window, 0) // block_kv
            ki2 = jnp.maximum(ki2, jnp.minimum(first, last))
        return (slots[b], ki2, bh % kv_heads)

    def sc_map(bh, ki, lens, slots):
        # scales arrive pre-transposed [rows, Hkv, 1, Smax]: lane dim is
        # the (128-aligned) kv-position axis; the size-1 dim -2 keeps the
        # sublane block full-dim (Mosaic: sublane blocks must be 8-multiples
        # or the full dim — a (1,1,BKV) block over [rows,Hkv,Smax] is not)
        b = bh // kv_heads
        last = jnp.maximum(lens[b] - 1, 0) // block_kv
        ki2 = jnp.minimum(ki, last)
        if window is not None:
            first = jnp.maximum(lens[b] - window, 0) // block_kv
            ki2 = jnp.maximum(ki2, jnp.minimum(first, last))
        return (slots[b], bh % kv_heads, 0, ki2)

    def body(len_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, m_ref, l_ref,
             acc_ref):
        bh = pl.program_id(0)
        ki = pl.program_id(1)
        b = bh // kv_heads
        length = len_ref[b]

        @pl.when(ki == 0)
        def _():
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        kv_start = ki * block_kv
        if window is None:
            live = kv_start < length
        else:
            win_lo = jnp.maximum(length - window, 0)
            live = (kv_start < length) & (kv_start + block_kv > win_lo)

        @pl.when(live)
        def _attend():
            q = q_ref[0].astype(jnp.float32)              # [qrows, D]
            k = k_ref[0].astype(jnp.float32)              # [BKV, D]
            v = v_ref[0].astype(jnp.float32)
            ksc = ks_ref[0, 0, 0].astype(jnp.float32)     # [BKV]
            vsc = vs_ref[0, 0, 0].astype(jnp.float32)
            vrow = kv_start + jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
            vkeep = vrow < length
            if window is not None:
                vkeep = vkeep & (vrow >= win_lo)
            v = jnp.where(vkeep, v, jnp.zeros_like(v))
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * ksc[None, :] * (scale * log2e)
            kj = kv_start + jax.lax.broadcasted_iota(jnp.int32,
                                                     (qrows, block_kv), 1)
            s = jnp.where(kj < length, s, NEG_INF)
            if window is not None:
                s = jnp.where(kj >= win_lo, s, NEG_INF)
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_ref[...], m_cur)
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m_ref[...] - m_new)
            l_ref[...] = alpha * l_ref[...] + jnp.sum(p, axis=1,
                                                      keepdims=True)
            # Pad lanes of a partial tail scale block are unspecified — a
            # NaN there survives `p * vsc` even at p == 0 (0 * NaN = NaN).
            # K scales are covered by the NEG_INF logit mask above; the V
            # scale product must be masked explicitly (kj is 2D — 1D iota
            # does not lower in Mosaic).
            pw = jnp.where(kj < length, p * vsc[None, :], 0.0)
            pv = jax.lax.dot_general(
                pw, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[...] = acc_ref[...] * alpha + pv
            m_ref[...] = m_new

        return ki == nkv - 1

    if partial_stats:
        def kernel(len_ref, slot_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                   oa_ref, om_ref, ol_ref, m_ref, l_ref, acc_ref):
            del slot_ref
            emit = body(len_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                        m_ref, l_ref, acc_ref)

            @pl.when(emit)
            def _():
                oa_ref[0] = acc_ref[...]
                om_ref[0] = m_ref[...]
                ol_ref[0] = l_ref[...]

        out_specs = (pl.BlockSpec((1, qrows, dim), q_map),
                     pl.BlockSpec((1, qrows, 1), q_map),
                     pl.BlockSpec((1, qrows, 1), q_map))
        out_shape = (
            jax.ShapeDtypeStruct((batch * kv_heads, qrows, dim),
                                 jnp.float32),
            jax.ShapeDtypeStruct((batch * kv_heads, qrows, 1),
                                 jnp.float32),
            jax.ShapeDtypeStruct((batch * kv_heads, qrows, 1),
                                 jnp.float32))
    else:
        def kernel(len_ref, slot_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                   o_ref, m_ref, l_ref, acc_ref):
            del slot_ref
            emit = body(len_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                        m_ref, l_ref, acc_ref)

            @pl.when(emit)
            def _():
                denom = jnp.maximum(l_ref[...], 1e-30)
                o_ref[0] = (acc_ref[...] / denom).astype(kernel_out)

        out_specs = pl.BlockSpec((1, qrows, dim), q_map)
        out_shape = jax.ShapeDtypeStruct((batch * kv_heads, qrows, dim),
                                         kernel_out)

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, qrows, dim), q_map),
                pl.BlockSpec((1, block_kv, dim), kv_map),
                pl.BlockSpec((1, block_kv, dim), kv_map),
                pl.BlockSpec((1, 1, 1, block_kv), sc_map),
                pl.BlockSpec((1, 1, 1, block_kv), sc_map),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((qrows, 1), jnp.float32),
                pltpu.VMEM((qrows, 1), jnp.float32),
                pltpu.VMEM((qrows, dim), jnp.float32),
            ],
        ),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * heads * max_seq_len * dim,
            bytes_accessed=batch * max_seq_len * kv_heads * dim * 2,
            transcendentals=batch * heads * max_seq_len,
        ),
        interpret=interpret,
    )

    def fn(q, k_cache, v_cache, k_scale, v_scale, lengths, slots=None):
        B, H, D = q.shape
        assert (B, H, D) == (batch, heads, dim), (q.shape,)
        rows, Smax = k_cache.shape[0], k_cache.shape[1]
        assert Smax == max_seq_len, (k_cache.shape,)
        if slots is None:
            slots = jnp.arange(B, dtype=jnp.int32)
            assert rows == B, (k_cache.shape, B)
        qg = q.astype(jnp.float32).reshape(B * kv_heads, group, D)
        q8 = jnp.zeros((B * kv_heads, qrows, D), jnp.float32
                       ).at[:, :group, :].set(qg)
        k2 = k_cache.reshape(rows, Smax, kv_heads * D)
        v2 = v_cache.reshape(rows, Smax, kv_heads * D)
        # [rows, Smax, Hkv] -> [rows, Hkv, 1, Smax]: the scale blocks' lane
        # dim must be the kv axis, and the size-1 dim -2 keeps sublane
        # blocks full-dim (O(rows*Smax*Hkv*4B) XLA transpose per step —
        # negligible next to the KV stream itself)
        ks2 = k_scale.transpose(0, 2, 1)[:, :, None, :]
        vs2 = v_scale.transpose(0, 2, 1)[:, :, None, :]
        out = call(jnp.asarray(lengths, jnp.int32),
                   jnp.asarray(slots, jnp.int32), q8, k2, v2, ks2, vs2)
        if partial_stats:
            acc, m, l = out
            # base-2 kernel domain -> natural log (see make_flash_decode)
            ln2 = 0.6931471805599453
            return (acc[:, :group, :].reshape(B, H, D),
                    (m[:, :group, 0] * ln2).reshape(B, H),
                    l[:, :group, 0].reshape(B, H))
        return out[:, :group, :].reshape(B, H, D).astype(out_dtype)

    return fn


def make_flash_decode_paged(*, batch: int, heads: int, block_size: int,
                            max_blocks: int, dim: int, kv_heads: int = None,
                            out_dtype=jnp.float16, interpret: bool = False):
    """Paged decode attention: the TPU PagedAttention kernel.

    fn(q, k_cache, v_cache, tables, lengths) with q [B, H, D], caches
    [num_blocks, block_size, Hkv, D] (the vLLM-style block pool —
    serving/kv_cache.py PagedKVConfig), tables [B, max_blocks] int32
    physical block ids (page j of request b holds global positions
    [j*block_size, (j+1)*block_size); unused entries may be any valid
    id), lengths [B]. Returns [B, H, D].

    One grid step per (sequence, KV HEAD) — the whole GQA q-head group
    rides along — and inside each step a dynamic fori_loop walks that
    sequence's LIVE pages with manual double-buffered HBM->VMEM copies
    (pltpu.make_async_copy): page j+1 streams while page j computes. The
    earlier BlockSpec-per-page grid paid the ~0.25us grid-step overhead
    per page (measured 121 GB/s at bs=128 — 4096 steps of [128, 128]);
    the caches stay in ANY/HBM space and only live pages ever cross,
    pipelined. The reference delegates paged attention to vLLM's CUDA
    kernel — this is the Pallas equivalent.
    """
    kv_heads = kv_heads or heads
    assert heads % kv_heads == 0
    assert dim % 128 == 0, "flash decode needs lane-aligned head dim"
    assert block_size % 8 == 0, "paged blocks must be sublane-aligned"
    group = heads // kv_heads
    scale = 1.0 / math.sqrt(dim)
    grid = (batch * kv_heads,)
    qrows = max(8, -(-group // 8) * 8)
    f16 = jnp.dtype(jnp.float16)
    kernel_out = jnp.float32 if (jnp.dtype(out_dtype) == f16 and
                                 not interpret) else out_dtype

    def q_map(bh, lens, tabs):
        del lens, tabs
        return (bh, 0, 0)

    def kernel(len_ref, tab_ref, q_ref, k_any, v_any, o_ref,
               kbuf, vbuf, sem, m_ref, l_ref, acc_ref):
        bh = pl.program_id(0)
        b = bh // kv_heads
        head = bh % kv_heads
        length = len_ref[b]
        npages = pl.cdiv(length, block_size)

        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

        def page_copy(j, slot):
            # pools arrive as the fused [blocks, bs, Hkv*D] view: a
            # singleton slice on a middle Hkv axis violates Mosaic's
            # (sublane, lane) tiling for DMAs, a 128-aligned dynamic lane
            # slice does not
            tab = tab_ref[b, j]
            lane = pl.ds(head * dim, dim)
            return (pltpu.make_async_copy(k_any.at[tab, :, lane],
                                          kbuf.at[slot], sem.at[slot, 0]),
                    pltpu.make_async_copy(v_any.at[tab, :, lane],
                                          vbuf.at[slot], sem.at[slot, 1]))

        @pl.when(npages > 0)
        def _():
            for dma in page_copy(0, 0):
                dma.start()

        def body(j, carry):
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < npages)
            def _():
                for dma in page_copy(j + 1, jax.lax.rem(j + 1, 2)):
                    dma.start()

            for dma in page_copy(j, slot):
                dma.wait()
            m_new, l_new, acc_new = _attend_block(
                q_ref[0], kbuf[slot], vbuf[slot], m_ref[...], l_ref[...],
                acc_ref[...], scale=scale, causal=False,
                q_start=0, kv_start=j * block_size, block_q=qrows,
                block_kv=block_size, kv_len=length)
            m_ref[...] = m_new
            l_ref[...] = l_new
            acc_ref[...] = acc_new
            return carry

        jax.lax.fori_loop(0, npages, body, 0)
        denom = jnp.maximum(l_ref[...], 1e-30)
        o_ref[0] = (acc_ref[...] / denom).astype(kernel_out)

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, qrows, dim), q_map),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, qrows, dim), q_map),
            scratch_shapes=[
                pltpu.VMEM((2, block_size, dim), jnp.bfloat16),
                pltpu.VMEM((2, block_size, dim), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.VMEM((qrows, 1), jnp.float32),
                pltpu.VMEM((qrows, 1), jnp.float32),
                pltpu.VMEM((qrows, dim), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((batch * kv_heads, qrows, dim),
                                       kernel_out),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * heads * max_blocks * block_size * dim,
            bytes_accessed=batch * max_blocks * block_size * kv_heads
            * dim * 4,
            transcendentals=batch * heads * max_blocks * block_size,
        ),
        interpret=interpret,
    )

    def fn(q, k_cache, v_cache, tables, lengths):
        B, H, D = q.shape
        assert (B, H, D) == (batch, heads, dim), (q.shape,)
        blocks, bs = k_cache.shape[0], k_cache.shape[1]
        assert bs == block_size, (k_cache.shape,)
        assert tables.shape == (batch, max_blocks), (tables.shape,)
        qg = q.reshape(B * kv_heads, group, D)
        q8 = jnp.zeros((B * kv_heads, qrows, D), q.dtype
                       ).at[:, :group, :].set(qg)
        # copies land in bf16 VMEM buffers — cast the pool once here
        # (free when the pool is already bf16) and fuse heads into lanes
        k2 = k_cache.astype(jnp.bfloat16).reshape(blocks, bs,
                                                  kv_heads * D)
        v2 = v_cache.astype(jnp.bfloat16).reshape(blocks, bs,
                                                  kv_heads * D)
        if not interpret and q8.dtype == f16:
            q8 = q8.astype(jnp.bfloat16)
        out = call(jnp.asarray(lengths, jnp.int32),
                   jnp.asarray(tables, jnp.int32), q8, k2, v2)
        return out[:, :group, :].reshape(B, H, D).astype(out_dtype)

    return fn


def make_flash_decode_paged_quant(*, batch: int, heads: int,
                                  block_size: int, max_blocks: int,
                                  dim: int, kv_heads: int = None,
                                  out_dtype=jnp.float16,
                                  interpret: bool = False):
    """Paged decode attention over the int8-quantized block pool.

    fn(q, k_cache, v_cache, k_scale, v_scale, tables, lengths) with codes
    [num_blocks, block_size, Hkv, D] int8 + scale planes
    [num_blocks, block_size, Hkv] f32. Same manual double-buffered page
    pipeline as make_flash_decode_paged (int8 codes + the tiny scale rows
    stream per live page), same scale factorization as the slot quant
    kernel (K scales on logit columns pre-max, V scales folded into the
    weights)."""
    kv_heads = kv_heads or heads
    assert heads % kv_heads == 0
    assert dim % 128 == 0, "flash decode needs lane-aligned head dim"
    assert block_size % 128 == 0, \
        "quant paged flash needs 128-multiple pages (scale rows ride the" \
        " lane axis; Mosaic DMA lane slices must be 128-aligned)"
    group = heads // kv_heads
    scale = 1.0 / math.sqrt(dim)
    grid = (batch * kv_heads,)
    qrows = max(8, -(-group // 8) * 8)
    f16 = jnp.dtype(jnp.float16)
    kernel_out = jnp.float32 if (jnp.dtype(out_dtype) == f16 and
                                 not interpret) else out_dtype
    log2e = 1.4426950408889634

    def q_map(bh, lens, tabs):
        del lens, tabs
        return (bh, 0, 0)

    def kernel(len_ref, tab_ref, q_ref, k_any, v_any, ks_any, vs_any,
               o_ref, kbuf, vbuf, ksbuf, vsbuf, sem, m_ref, l_ref,
               acc_ref):
        bh = pl.program_id(0)
        b = bh // kv_heads
        head = bh % kv_heads
        length = len_ref[b]
        npages = pl.cdiv(length, block_size)

        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

        def page_copy(j, slot):
            # codes use the fused [blocks, bs, Hkv*D] lane-slice form (see
            # the float kernel); scale planes are [blocks, Hkv, 1, bs] so
            # indexing (tab, head) leaves a tiling-legal [1, bs] row
            tab = tab_ref[b, j]
            lane = pl.ds(head * dim, dim)
            return (pltpu.make_async_copy(k_any.at[tab, :, lane],
                                          kbuf.at[slot], sem.at[slot, 0]),
                    pltpu.make_async_copy(v_any.at[tab, :, lane],
                                          vbuf.at[slot], sem.at[slot, 1]),
                    pltpu.make_async_copy(ks_any.at[tab, head],
                                          ksbuf.at[slot],
                                          sem.at[slot, 2]),
                    pltpu.make_async_copy(vs_any.at[tab, head],
                                          vsbuf.at[slot],
                                          sem.at[slot, 3]))

        @pl.when(npages > 0)
        def _():
            for dma in page_copy(0, 0):
                dma.start()

        def body(j, carry):
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < npages)
            def _():
                for dma in page_copy(j + 1, jax.lax.rem(j + 1, 2)):
                    dma.start()

            for dma in page_copy(j, slot):
                dma.wait()
            kv_start = j * block_size
            q = q_ref[0].astype(jnp.float32)
            k = kbuf[slot].astype(jnp.float32)
            v = vbuf[slot].astype(jnp.float32)
            ksc = ksbuf[slot, 0].astype(jnp.float32)
            vsc = vsbuf[slot, 0].astype(jnp.float32)
            vrow = kv_start + jax.lax.broadcasted_iota(jnp.int32,
                                                       v.shape, 0)
            v = jnp.where(vrow < length, v, jnp.zeros_like(v))
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * ksc[None, :] * (scale * log2e)
            kj = kv_start + jax.lax.broadcasted_iota(
                jnp.int32, (qrows, block_size), 1)
            s = jnp.where(kj < length, s, NEG_INF)
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_ref[...], m_cur)
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m_ref[...] - m_new)
            l_ref[...] = alpha * l_ref[...] + jnp.sum(p, axis=1,
                                                      keepdims=True)
            pw = jnp.where(kj < length, p * vsc[None, :], 0.0)
            pv = jax.lax.dot_general(
                pw, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[...] = acc_ref[...] * alpha + pv
            m_ref[...] = m_new
            return carry

        jax.lax.fori_loop(0, npages, body, 0)
        denom = jnp.maximum(l_ref[...], 1e-30)
        o_ref[0] = (acc_ref[...] / denom).astype(kernel_out)

    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, qrows, dim), q_map),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, qrows, dim), q_map),
            scratch_shapes=[
                pltpu.VMEM((2, block_size, dim), jnp.int8),
                pltpu.VMEM((2, block_size, dim), jnp.int8),
                pltpu.VMEM((2, 1, block_size), jnp.float32),
                pltpu.VMEM((2, 1, block_size), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 4)),
                pltpu.VMEM((qrows, 1), jnp.float32),
                pltpu.VMEM((qrows, 1), jnp.float32),
                pltpu.VMEM((qrows, dim), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((batch * kv_heads, qrows, dim),
                                       kernel_out),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * heads * max_blocks * block_size * dim,
            bytes_accessed=batch * max_blocks * block_size * kv_heads
            * dim * 2,
            transcendentals=batch * heads * max_blocks * block_size,
        ),
        interpret=interpret,
    )

    def fn(q, k_cache, v_cache, k_scale, v_scale, tables, lengths):
        B, H, D = q.shape
        assert (B, H, D) == (batch, heads, dim), (q.shape,)
        blocks, bs = k_cache.shape[0], k_cache.shape[1]
        assert bs == block_size, (k_cache.shape,)
        assert tables.shape == (batch, max_blocks), (tables.shape,)
        qg = q.astype(jnp.float32).reshape(B * kv_heads, group, D)
        q8 = jnp.zeros((B * kv_heads, qrows, D), jnp.float32
                       ).at[:, :group, :].set(qg)
        # scale planes pre-transposed [blocks, Hkv, 1, bs]: the page DMA
        # grabs one [1, bs] row per (page, head)
        ks2 = k_scale.transpose(0, 2, 1)[:, :, None, :]
        vs2 = v_scale.transpose(0, 2, 1)[:, :, None, :]
        k2 = k_cache.reshape(blocks, bs, kv_heads * D)
        v2 = v_cache.reshape(blocks, bs, kv_heads * D)
        out = call(jnp.asarray(lengths, jnp.int32),
                   jnp.asarray(tables, jnp.int32), q8, k2, v2,
                   ks2, vs2)
        return out[:, :group, :].reshape(B, H, D).astype(out_dtype)

    return fn
