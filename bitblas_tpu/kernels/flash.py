"""Pallas TPU flash-attention kernel.

TPU-native counterpart of the reference's TileLang flash attention
(/root/reference/bitblas/ops/general_flashatten/tilelang/flashatten.py):
same operator semantics — Q [B, S, H, D] x K/V (K optionally pre-transposed,
layout "ntn") with online-softmax streaming over KV blocks and optional
causal masking — but blocked for VMEM/MXU instead of smem/MMA: the grid is
(batch*heads, q_blocks, kv_blocks) with the kv loop innermost, running
max/sum state in VMEM scratch, exactly the memory-saving recurrence of
FlashAttention-2.
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
                  q_start, kv_start, block_q, block_kv, kv_len=None):
    """One online-softmax step. q [BQ, D], k [BKV, D], v [BKV, D].
    QK/PV dots run on bf16 operands (f32 accumulate) — the MXU-native rate;
    softmax statistics stay f32. `kv_len` (set when seq_len is not a
    multiple of block_kv) masks the padded tail KV positions: their scores
    go to -inf AND their V rows to zero (Pallas pads out-of-range block
    reads with unspecified values — a NaN there would otherwise poison the
    p@V dot even at weight zero)."""
    if kv_len is not None:
        vrow = kv_start + jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
        v = jnp.where(vrow < kv_len, v, jnp.zeros_like(v))
    # Work in base 2: exp2 is the cheap VPU op (exp costs ~4x); the scale
    # folds log2(e) in, and the running max m is kept in the base-2 domain.
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * (
                                scale * 1.4426950408889634)
    kj = None
    if causal or kv_len is not None:
        kj = kv_start + jax.lax.broadcasted_iota(jnp.int32,
                                                 (block_q, block_kv), 1)
    if kv_len is not None:
        s = jnp.where(kj < kv_len, s, NEG_INF)
    if causal:
        qi = q_start + jax.lax.broadcasted_iota(jnp.int32,
                                                (block_q, block_kv), 0)
        s = jnp.where(qi >= kj, s, NEG_INF)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(s - m_new)
    alpha = jnp.exp2(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_new = acc_prev * alpha + pv
    return m_new, l_new, acc_new


def make_flash_attention(*, batch: int, heads: int, seq_len: int, dim: int,
                         kv_heads: int = None, causal: bool = False,
                         trans_k: bool = False, block_q: int = 1024,
                         block_kv: int = 1024, out_dtype=jnp.float16,
                         interpret: bool = False):
    """Build attention over Q [B, S, H, D], K/V [B, S, Hkv, D]
    (K [B, D, Hkv, S] when trans_k). Returns fn(Q, K, V) -> [B, S, H, D]."""
    kv_heads = kv_heads or heads
    assert heads % kv_heads == 0
    group = heads // kv_heads
    scale = 1.0 / math.sqrt(dim)
    block_q = min(block_q, seq_len)
    block_kv = min(block_kv, seq_len)
    # Mosaic requires sublane (dim -2) block sizes to be multiples of 8 and
    # lane (dim -1) blocks multiples of 128; a clamp to an odd seq_len (e.g.
    # 300) would otherwise emit a block Mosaic rejects on hardware only
    # (interpret mode cannot catch it — ADVICE.md r1). Round down; the tail
    # is handled by the kv_len mask (KV dir) / clipped stores (Q dir).
    block_q = max(8, block_q - block_q % 8)
    if trans_k:
        block_kv = max(128, block_kv - block_kv % 128)
    else:
        block_kv = max(8, block_kv - block_kv % 8)
    nq = pl.cdiv(seq_len, block_q)
    nkv = pl.cdiv(seq_len, block_kv)
    grid = (batch * heads, nq, nkv)
    f16 = jnp.dtype(jnp.float16)
    kernel_out = jnp.float32 if (jnp.dtype(out_dtype) == f16 and
                                 not interpret) else out_dtype

    # Index maps operate on flattened (B*H, S, D) tensors.
    def q_map(bh, qi, ki):
        return (bh, qi, 0)

    def kv_map(bh, qi, ki):
        return ((bh // heads) * kv_heads + (bh % heads) // group, ki, 0)

    def kt_map(bh, qi, ki):
        return ((bh // heads) * kv_heads + (bh % heads) // group, 0, ki)

    def kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        qi = pl.program_id(1)
        q_start = qi * block_q
        kv_start = ki * block_kv

        def step():
            q = q_ref[0]
            k = k_ref[0]
            if trans_k:
                k = k.T
            v = v_ref[0]
            m_new, l_new, acc_new = _attend_block(
                q, k, v, m_ref[...], l_ref[...], acc_ref[...],
                scale=scale, causal=causal, q_start=q_start,
                kv_start=kv_start, block_q=block_q, block_kv=block_kv,
                kv_len=seq_len if seq_len % block_kv else None)
            m_ref[...] = m_new
            l_ref[...] = l_new
            acc_ref[...] = acc_new

        if causal:
            # Skip fully-masked KV blocks (static python branch on `causal`,
            # dynamic predicate on block indices).
            pl.when(kv_start <= q_start + block_q - 1)(step)
        else:
            step()

        @pl.when(ki == nkv - 1)
        def _():
            denom = jnp.maximum(l_ref[...], 1e-30)
            o_ref[0] = (acc_ref[...] / denom).astype(kernel_out)

    in_specs = [
        pl.BlockSpec((1, block_q, dim), q_map),
        (pl.BlockSpec((1, dim, block_kv), kt_map) if trans_k else
         pl.BlockSpec((1, block_kv, dim), kv_map)),
        pl.BlockSpec((1, block_kv, dim), kv_map),
    ]

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, dim), q_map),
        out_shape=jax.ShapeDtypeStruct((batch * heads, seq_len, dim),
                                       kernel_out),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, dim), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * heads * seq_len * seq_len * dim,
            bytes_accessed=batch * seq_len * dim * (heads * 2 + kv_heads * 2) * 2,
            transcendentals=batch * heads * seq_len * seq_len,
        ),
        interpret=interpret,
    )

    def fn(Q, K, V):
        B, S, H, D = Q.shape
        assert (B, S, H, D) == (batch, seq_len, heads, dim), (Q.shape,)
        q = Q.transpose(0, 2, 1, 3).reshape(B * H, S, D)
        if trans_k:
            # K [B, D, Hkv, S] -> (B*Hkv, D, S)
            k = K.transpose(0, 2, 1, 3).reshape(B * kv_heads, D, S)
        else:
            k = K.transpose(0, 2, 1, 3).reshape(B * kv_heads, S, D)
        v = V.transpose(0, 2, 1, 3).reshape(B * kv_heads, S, D)
        if not interpret and q.dtype == f16:
            q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
        out = call(q, k, v)
        out = out.reshape(B, H, S, D).transpose(0, 2, 1, 3)
        return out.astype(out_dtype)

    return fn
