"""KV cache for decode serving.

The reference has no serving layer (it delegates to vLLM); the north star
(BASELINE.json) asks for KV-cache tensor sharding + continuous batching.
This is a slot-based (static-shape, jit-friendly) cache:

  k/v : [num_slots, max_seq_len, kv_heads, head_dim]

sharded over the mesh on the kv_heads axis for TP (same axis the attention
heads shard on). All updates are functional `.at[]` scatters with static
shapes — no retracing as requests come and go.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class KVCacheConfig:
    num_slots: int
    max_seq_len: int
    num_kv_heads: int
    head_dim: int
    num_layers: int
    dtype: str = "bfloat16"


def init_kv_cache(cfg: KVCacheConfig) -> Dict[str, jnp.ndarray]:
    dt = jnp.dtype(cfg.dtype)
    shape = (cfg.num_layers, cfg.num_slots, cfg.max_seq_len,
             cfg.num_kv_heads, cfg.head_dim)
    return {
        "k": jnp.zeros(shape, dt),
        "v": jnp.zeros(shape, dt),
        "lengths": jnp.zeros((cfg.num_slots,), jnp.int32),
    }


def shard_kv_cache(cache: Dict[str, jnp.ndarray], mesh, axis: str = "tp"):
    """Shard k/v on the kv_heads dim; lengths replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    kv_spec = NamedSharding(mesh, P(None, None, None, axis, None))
    return {
        "k": jax.device_put(cache["k"], kv_spec),
        "v": jax.device_put(cache["v"], kv_spec),
        "lengths": jax.device_put(cache["lengths"],
                                  NamedSharding(mesh, P(None))),
    }


def write_prompt(cache: Dict[str, jnp.ndarray], layer: int, slot: jnp.ndarray,
                 k: jnp.ndarray, v: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Write a full prompt's K/V for one slot: k/v [S, H, D] (static S)."""
    S = k.shape[0]
    cache = dict(cache)
    cache["k"] = jax.lax.dynamic_update_slice(
        cache["k"], k[None, None], (layer, slot, 0, 0, 0))
    cache["v"] = jax.lax.dynamic_update_slice(
        cache["v"], v[None, None], (layer, slot, 0, 0, 0))
    return cache


def append_token(cache_k: jnp.ndarray, cache_v: jnp.ndarray,
                 slots: jnp.ndarray, positions: jnp.ndarray,
                 k_new: jnp.ndarray, v_new: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-layer decode append: cache_k/v [slots, L, H, D]; slots [B];
    positions [B]; k/v_new [B, H, D]."""
    cache_k = cache_k.at[slots, positions].set(k_new.astype(cache_k.dtype))
    cache_v = cache_v.at[slots, positions].set(v_new.astype(cache_v.dtype))
    return cache_k, cache_v


def append_chunk(cache_k: jnp.ndarray, cache_v: jnp.ndarray,
                 slots: jnp.ndarray, starts: jnp.ndarray,
                 k_new: jnp.ndarray, v_new: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-layer multi-token append: cache_k/v [slots, L, H, D]; slots [B];
    starts [B]; k/v_new [B, T, H, D] landing at positions starts[b]+0..T-1
    (caller guarantees starts[b] + T <= L)."""
    B, T = k_new.shape[:2]
    pos = starts[:, None] + jnp.arange(T, dtype=starts.dtype)[None]
    cache_k = cache_k.at[slots[:, None], pos].set(
        k_new.astype(cache_k.dtype))
    cache_v = cache_v.at[slots[:, None], pos].set(
        v_new.astype(cache_v.dtype))
    return cache_k, cache_v


def chunk_attention(q: jnp.ndarray, cache_k: jnp.ndarray,
                    cache_v: jnp.ndarray, slots: jnp.ndarray,
                    starts: jnp.ndarray, *, num_heads: int,
                    window: Optional[int] = None) -> jnp.ndarray:
    """T-token causal attention against the cache (chunk already appended).

    q [B, T, H, D]; cache_k/v [slots, L, Hkv, D]; query i of request b
    attends cache positions < starts[b] + i + 1 (its prefix plus the chunk
    tokens at or before it), and within the trailing `window` keys when a
    sliding window is set. Returns [B, T, H, D].

    One batched contraction per chunk instead of T single-token steps —
    the weight-stream batching that makes chunked prefill and KV-cached
    speculative verification pay off on TPU.
    """
    B, T, H, D = q.shape
    k = cache_k[slots]  # [B, L, Hkv, D]
    v = cache_v[slots]
    L, Hkv = k.shape[1], k.shape[2]
    group = H // Hkv
    qf = q.astype(jnp.float32).reshape(B, T, Hkv, group, D)
    s = jnp.einsum("bthgd,blhd->bhgtl", qf, k.astype(jnp.float32)) \
        / jnp.sqrt(jnp.float32(D))
    limit = starts[:, None] + jnp.arange(T)[None] + 1          # [B, T]
    pos = jnp.arange(L)[None, None, :]
    mask = pos < limit[:, :, None]                             # [B, T, L]
    if window is not None:
        # HF sliding-window: query at absolute position p attends keys in
        # (p - window, p]; p = limit - 1.
        mask = mask & (pos > (limit[:, :, None] - 1 - window))
    s = jnp.where(mask[:, None, None, :, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhgtl,blhd->bthgd", p, v.astype(jnp.float32))
    return out.reshape(B, T, H, D).astype(q.dtype)


# -- paged cache (vLLM-style block paging) ------------------------------------
#
# The slot cache above reserves max_seq_len per slot; the paged cache pools
# fixed-size blocks so memory scales with live tokens, not worst case:
#
#   k/v          [num_layers, num_blocks, block_size, kv_heads, head_dim]
#   block_table  [num_slots, max_blocks_per_slot] int32 (host-managed)
#
# All device shapes stay static (jit-friendly); the engine's host-side
# allocator hands blocks to slots as their sequences grow and reclaims them
# on completion.


@dataclass(frozen=True)
class PagedKVConfig:
    num_blocks: int
    block_size: int
    num_kv_heads: int
    head_dim: int
    num_layers: int
    max_blocks_per_slot: int
    dtype: str = "bfloat16"


def init_paged_kv_cache(cfg: PagedKVConfig) -> Dict[str, jnp.ndarray]:
    dt = jnp.dtype(cfg.dtype)
    shape = (cfg.num_layers, cfg.num_blocks, cfg.block_size,
             cfg.num_kv_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, dt), "v": jnp.zeros(shape, dt)}


def append_token_paged(cache_k: jnp.ndarray, cache_v: jnp.ndarray,
                       block_rows: jnp.ndarray, offsets: jnp.ndarray,
                       k_new: jnp.ndarray, v_new: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-layer decode append into the block pool.

    cache_k/v [blocks, bs, H, D]; block_rows [B] = physical block per
    request's current position; offsets [B] = position within the block.
    """
    cache_k = cache_k.at[block_rows, offsets].set(k_new.astype(cache_k.dtype))
    cache_v = cache_v.at[block_rows, offsets].set(v_new.astype(cache_v.dtype))
    return cache_k, cache_v


def decode_attention_paged(q: jnp.ndarray, cache_k: jnp.ndarray,
                           cache_v: jnp.ndarray, tables: jnp.ndarray,
                           lengths: jnp.ndarray, *, num_heads: int,
                           use_flash: bool = False,
                           window: Optional[int] = None) -> jnp.ndarray:
    """Single-token attention against the paged cache.

    q [B, H, D]; cache_k/v [blocks, bs, Hkv, D]; tables [B, MB] physical
    block ids per request (unused entries may be any valid id — masked);
    lengths [B] = valid tokens. Returns [B, H, D].

    The XLA gather path is the measured default: on v5e it fuses the
    table gather into the attention at ~620 GB/s effective (2026-08-19,
    llama-70B decode shapes), while the Pallas table-walk kernel's
    per-page DMAs reach only ~140 GB/s — opt in via use_flash=True for
    the length-proportional read pattern if a future Mosaic improves
    small strided HBM copies (scripts/tpu_flash_paged_probe.py re-checks).
    """
    B, H, D = q.shape
    bs = cache_k.shape[1]
    if window is not None:
        use_flash = False  # paged flash kernel has no window lower bound
    if use_flash and (D % 128 or bs % 8):
        use_flash = False            # kernel constraints: fall back
    if use_flash:
        from ..kernels.flash import make_flash_decode_paged
        from ..tuner import get_arch
        fn = make_flash_decode_paged(
            batch=B, heads=H, block_size=bs, max_blocks=tables.shape[1],
            dim=D, kv_heads=cache_k.shape[2], out_dtype=q.dtype,
            interpret=get_arch().is_cpu)
        return fn(q, cache_k, cache_v, tables, lengths)
    k = cache_k[tables]            # [B, MB, bs, Hkv, D]
    v = cache_v[tables]
    MB = tables.shape[1]
    Hkv = k.shape[3]
    k = k.reshape(B, MB * bs, Hkv, D)
    v = v.reshape(B, MB * bs, Hkv, D)
    group = H // Hkv
    qf = q.astype(jnp.float32).reshape(B, Hkv, group, D)
    s = jnp.einsum("bhgd,blhd->bhgl", qf, k.astype(jnp.float32)) \
        / jnp.sqrt(jnp.float32(D))
    pos = jnp.arange(MB * bs)[None, :]
    mask = pos < lengths[:, None]
    if window is not None:
        # query at position lengths-1 attends (len-1-window, len-1]
        mask = mask & (pos > (lengths[:, None] - 1 - window))
    s = jnp.where(mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhgl,blhd->bhgd", p, v.astype(jnp.float32))
    return out.reshape(B, H, D).astype(q.dtype)


# -- quantized (int8) KV cache ------------------------------------------------
#
# Decode attention is KV-bandwidth-bound (every live token's K and V stream
# from HBM per step); int8 storage halves that traffic and the cache
# footprint vs bf16. Per-(token, head) symmetric scales keep the math
# factorable OUTSIDE the dots:
#
#   logits[l]  = (q . k_int[l]) * k_scale[l]        (scale after the QK dot)
#   out        = sum_l (p[l] * v_scale[l]) * v_int[l]  (scale folds into p)
#
# so the attention still runs two dense contractions — no per-element
# dequant pass materializes. The reference has no KV cache at all (vLLM
# delegation, SURVEY.md §2.11); this extends the serving layer the same way
# the int8-quantized collectives do (parallel/serving.py).


def init_kv_scales(kv_shape: Tuple[int, ...],
                   cache_sharding=None) -> jnp.ndarray:
    """Zero-init int8-KV scales for a cache of `kv_shape` ([..., D] —
    scales drop the trailing head_dim axis), sharded like the cache minus
    that axis when a NamedSharding is given. Shared by the slot and paged
    engines (serving/engine.py)."""
    scales = jnp.zeros(kv_shape[:-1], jnp.float32)
    if cache_sharding is not None:
        try:
            from jax.sharding import NamedSharding, PartitionSpec
            spec = cache_sharding.spec
            scales = jax.device_put(
                scales, NamedSharding(cache_sharding.mesh,
                                      PartitionSpec(*spec[:-1])))
        except AttributeError:
            from ..common import get_logger
            get_logger().warning(
                "kv_quant: cache_sharding has no mesh/spec attributes — "
                "KV scales stay unsharded (replicated)")
    return scales


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-(…, head) int8 quantization over the last (D) axis.

    x [..., D] float -> (codes int8 [..., D], scale f32 [...]) with
    x ~= codes * scale. Zero rows get scale 0 (codes 0) — exact.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = amax / 127.0
    codes = jnp.where(scale[..., None] > 0, xf / jnp.where(
        scale[..., None] > 0, scale[..., None], 1.0), 0.0)
    return jnp.round(codes).astype(jnp.int8), scale


def init_quant_kv_cache(cfg: KVCacheConfig) -> Dict[str, jnp.ndarray]:
    """Slot cache with int8 k/v + f32 per-(token, head) scales."""
    shape = (cfg.num_layers, cfg.num_slots, cfg.max_seq_len,
             cfg.num_kv_heads, cfg.head_dim)
    return {
        "k": jnp.zeros(shape, jnp.int8),
        "v": jnp.zeros(shape, jnp.int8),
        "k_scale": jnp.zeros(shape[:-1], jnp.float32),
        "v_scale": jnp.zeros(shape[:-1], jnp.float32),
        "lengths": jnp.zeros((cfg.num_slots,), jnp.int32),
    }


def append_token_quant(cache_k, cache_v, scale_k, scale_v,
                       slots: jnp.ndarray, positions: jnp.ndarray,
                       k_new: jnp.ndarray, v_new: jnp.ndarray):
    """Per-layer decode append with on-the-fly quantization.

    cache_k/v [slots, L, H, D] int8; scale_k/v [slots, L, H] f32;
    k/v_new [B, H, D] float.
    """
    kq, ks = quantize_kv(k_new)
    vq, vs = quantize_kv(v_new)
    cache_k = cache_k.at[slots, positions].set(kq)
    cache_v = cache_v.at[slots, positions].set(vq)
    scale_k = scale_k.at[slots, positions].set(ks)
    scale_v = scale_v.at[slots, positions].set(vs)
    return cache_k, cache_v, scale_k, scale_v


def append_chunk_quant(cache_k, cache_v, scale_k, scale_v,
                       slots: jnp.ndarray, starts: jnp.ndarray,
                       k_new: jnp.ndarray, v_new: jnp.ndarray):
    """Quantized twin of append_chunk: k/v_new [B, T, H, D] float are
    int8-quantized per (token, head) and scattered at starts[b]+0..T-1."""
    kq, ks = quantize_kv(k_new)
    vq, vs = quantize_kv(v_new)
    T = k_new.shape[1]
    pos = starts[:, None] + jnp.arange(T, dtype=starts.dtype)[None]
    b = slots[:, None]
    cache_k = cache_k.at[b, pos].set(kq)
    cache_v = cache_v.at[b, pos].set(vq)
    scale_k = scale_k.at[b, pos].set(ks)
    scale_v = scale_v.at[b, pos].set(vs)
    return cache_k, cache_v, scale_k, scale_v


def chunk_attention_quant(q: jnp.ndarray, cache_k: jnp.ndarray,
                          cache_v: jnp.ndarray, scale_k: jnp.ndarray,
                          scale_v: jnp.ndarray, slots: jnp.ndarray,
                          starts: jnp.ndarray, *, num_heads: int,
                          window: Optional[int] = None) -> jnp.ndarray:
    """Quantized twin of chunk_attention: same chunk-causal masking, with
    the per-(token, head) scales applied to the dot RESULTS (logits scaled
    after QK; value scales folded into the softmax weights) so both
    contractions run on the stored int8 codes."""
    B, T, H, D = q.shape
    k = cache_k[slots]            # [B, L, Hkv, D] int8
    v = cache_v[slots]
    ks = scale_k[slots]           # [B, L, Hkv]
    vs = scale_v[slots]
    L, Hkv = k.shape[1], k.shape[2]
    group = H // Hkv
    qf = q.astype(jnp.float32).reshape(B, T, Hkv, group, D)
    s = jnp.einsum("bthgd,blhd->bhgtl", qf,
                   k.astype(jnp.float32)) / jnp.sqrt(jnp.float32(D))
    s = s * ks.transpose(0, 2, 1)[:, :, None, None, :]     # [B,Hkv,1,1,L]
    limit = starts[:, None] + jnp.arange(T)[None] + 1
    pos = jnp.arange(L)[None, None, :]
    mask = pos < limit[:, :, None]
    if window is not None:
        mask = mask & (pos > (limit[:, :, None] - 1 - window))
    s = jnp.where(mask[:, None, None, :, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    p = p * vs.transpose(0, 2, 1)[:, :, None, None, :]
    out = jnp.einsum("bhgtl,blhd->bthgd", p, v.astype(jnp.float32))
    return out.reshape(B, T, H, D).astype(q.dtype)


def write_prompt_quant(cache: Dict[str, jnp.ndarray], layer: int,
                       slot: jnp.ndarray, k: jnp.ndarray,
                       v: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Quantized twin of write_prompt: k/v [S, H, D] float (static S)."""
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    cache = dict(cache)
    cache["k"] = jax.lax.dynamic_update_slice(
        cache["k"], kq[None, None], (layer, slot, 0, 0, 0))
    cache["v"] = jax.lax.dynamic_update_slice(
        cache["v"], vq[None, None], (layer, slot, 0, 0, 0))
    cache["k_scale"] = jax.lax.dynamic_update_slice(
        cache["k_scale"], ks[None, None], (layer, slot, 0, 0))
    cache["v_scale"] = jax.lax.dynamic_update_slice(
        cache["v_scale"], vs[None, None], (layer, slot, 0, 0))
    return cache


def init_quant_paged_kv_cache(cfg: PagedKVConfig) -> Dict[str, jnp.ndarray]:
    """Paged cache with int8 k/v + f32 per-(token, head) scales."""
    shape = (cfg.num_layers, cfg.num_blocks, cfg.block_size,
             cfg.num_kv_heads, cfg.head_dim)
    return {
        "k": jnp.zeros(shape, jnp.int8),
        "v": jnp.zeros(shape, jnp.int8),
        "k_scale": jnp.zeros(shape[:-1], jnp.float32),
        "v_scale": jnp.zeros(shape[:-1], jnp.float32),
    }


def append_token_paged_quant(cache_k, cache_v, scale_k, scale_v,
                             block_rows: jnp.ndarray, offsets: jnp.ndarray,
                             k_new: jnp.ndarray, v_new: jnp.ndarray):
    """Quantized twin of append_token_paged (block-pool layout)."""
    kq, ks = quantize_kv(k_new)
    vq, vs = quantize_kv(v_new)
    cache_k = cache_k.at[block_rows, offsets].set(kq)
    cache_v = cache_v.at[block_rows, offsets].set(vq)
    scale_k = scale_k.at[block_rows, offsets].set(ks)
    scale_v = scale_v.at[block_rows, offsets].set(vs)
    return cache_k, cache_v, scale_k, scale_v


def decode_attention_paged_quant(q: jnp.ndarray, cache_k: jnp.ndarray,
                                 cache_v: jnp.ndarray, scale_k: jnp.ndarray,
                                 scale_v: jnp.ndarray, tables: jnp.ndarray,
                                 lengths: jnp.ndarray, *, num_heads: int,
                                 use_flash: bool = False,
                                 window: Optional[int] = None
                                 ) -> jnp.ndarray:
    """Quantized twin of decode_attention_paged: same scale-on-results math
    as decode_attention_quant over the block pool. XLA gather is the
    measured default (see decode_attention_paged); the flash table-walk
    kernel additionally needs 128-multiple pages (scale rows ride the DMA
    lane axis)."""
    B, H, D = q.shape
    bs = cache_k.shape[1]
    if window is not None:
        use_flash = False  # paged flash kernel has no window lower bound
    if use_flash and (D % 128 or bs % 128):
        use_flash = False            # scale-row DMA needs 128-mult pages
    if use_flash:
        from ..kernels.flash import make_flash_decode_paged_quant
        from ..tuner import get_arch
        fn = make_flash_decode_paged_quant(
            batch=B, heads=H, block_size=bs, max_blocks=tables.shape[1],
            dim=D, kv_heads=cache_k.shape[2], out_dtype=q.dtype,
            interpret=get_arch().is_cpu)
        return fn(q, cache_k, cache_v, scale_k, scale_v, tables, lengths)
    k = cache_k[tables]            # [B, MB, bs, Hkv, D] int8
    v = cache_v[tables]
    ks = scale_k[tables]           # [B, MB, bs, Hkv]
    vs = scale_v[tables]
    MB = tables.shape[1]
    Hkv = k.shape[3]
    k = k.reshape(B, MB * bs, Hkv, D)
    v = v.reshape(B, MB * bs, Hkv, D)
    ks = ks.reshape(B, MB * bs, Hkv)
    vs = vs.reshape(B, MB * bs, Hkv)
    group = H // Hkv
    qf = q.astype(jnp.float32).reshape(B, Hkv, group, D)
    s = jnp.einsum("bhgd,blhd->bhgl", qf, k.astype(jnp.float32))
    s = s * ks.transpose(0, 2, 1)[:, :, None, :] / jnp.sqrt(jnp.float32(D))
    pos = jnp.arange(MB * bs)[None, :]
    mask = pos < lengths[:, None]
    if window is not None:
        # query at position lengths-1 attends (len-1-window, len-1]
        mask = mask & (pos > (lengths[:, None] - 1 - window))
    s = jnp.where(mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    pv = p * vs.transpose(0, 2, 1)[:, :, None, :]
    out = jnp.einsum("bhgl,blhd->bhgd", pv, v.astype(jnp.float32))
    return out.reshape(B, H, D).astype(q.dtype)


def decode_attention_quant(q: jnp.ndarray, cache_k: jnp.ndarray,
                           cache_v: jnp.ndarray, scale_k: jnp.ndarray,
                           scale_v: jnp.ndarray, slots: jnp.ndarray,
                           lengths: jnp.ndarray, *, num_heads: int,
                           use_flash: bool = None,
                           window: Optional[int] = None) -> jnp.ndarray:
    """Single-token attention against the int8 cache.

    q [B, H, D]; cache_k/v [slots, L, Hkv, D] int8; scale_k/v
    [slots, L, Hkv] f32; lengths [B]. Returns [B, H, D]. Scales apply to
    the dot RESULTS (per-token-head symmetric), so both contractions run
    on the stored codes directly.

    With a lane-aligned head dim the int8 flash-decode kernel attends
    straight out of the slot cache (length-proportional reads at HALF the
    bytes of the bf16 path); the XLA path remains for odd dims.
    """
    B, H, D = q.shape
    if use_flash is None:
        use_flash = D % 128 == 0
    if use_flash:
        from ..kernels.flash import make_flash_decode_quant
        from ..tuner import get_arch
        fn = make_flash_decode_quant(
            batch=B, heads=H, max_seq_len=cache_k.shape[1], dim=D,
            kv_heads=cache_k.shape[2], out_dtype=q.dtype, window=window,
            interpret=get_arch().is_cpu)
        return fn(q, cache_k, cache_v, scale_k, scale_v, lengths, slots)
    k = cache_k[slots]            # [B, L, Hkv, D] int8
    v = cache_v[slots]
    ks = scale_k[slots]           # [B, L, Hkv]
    vs = scale_v[slots]
    Hkv = k.shape[2]
    group = H // Hkv
    qf = q.astype(jnp.float32).reshape(B, Hkv, group, D)
    s = jnp.einsum("bhgd,blhd->bhgl", qf, k.astype(jnp.float32))
    s = s * ks.transpose(0, 2, 1)[:, :, None, :] / jnp.sqrt(jnp.float32(D))
    L = k.shape[1]
    pos = jnp.arange(L)[None, :]
    mask = pos < lengths[:, None]
    if window is not None:
        mask = mask & (pos > (lengths[:, None] - 1 - window))
    s = jnp.where(mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    pv = p * vs.transpose(0, 2, 1)[:, :, None, :]   # fold V scales into p
    out = jnp.einsum("bhgl,blhd->bhgd", pv, v.astype(jnp.float32))
    return out.reshape(B, H, D).astype(q.dtype)


class BlockAllocator:
    """Host-side free-list over the physical block pool."""

    def __init__(self, num_blocks: int):
        self.free = list(range(num_blocks))[::-1]

    def alloc(self) -> Optional[int]:
        return self.free.pop() if self.free else None

    def alloc_many(self, n: int) -> Optional[list]:
        if len(self.free) < n:
            return None
        return [self.free.pop() for _ in range(n)]

    def release(self, blocks) -> None:
        self.free.extend(int(b) for b in blocks)

    @property
    def available(self) -> int:
        return len(self.free)


def append_token_cp(cache_k: jnp.ndarray, cache_v: jnp.ndarray,
                    slots: jnp.ndarray, positions: jnp.ndarray,
                    k_new: jnp.ndarray, v_new: jnp.ndarray, *,
                    cp_index, local_len: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked decode append for a sequence-sharded (context-parallel) cache
    shard owning global positions [cp_index*local_len, (cp_index+1)*
    local_len). Non-owned writes are routed to an out-of-bounds index and
    scatter-dropped, so each global position is stored exactly once across
    the cp group (clip-and-write-back would collide clipped indices with
    real writes under duplicate-scatter's undefined ordering).
    cache_k/v [slots, local_len, Hkv, D]; positions [B] global."""
    p_loc = positions - cp_index * local_len
    own = (p_loc >= 0) & (p_loc < local_len)
    idx = jnp.where(own, p_loc, local_len)          # local_len = OOB
    return (cache_k.at[slots, idx].set(k_new.astype(cache_k.dtype),
                                       mode="drop"),
            cache_v.at[slots, idx].set(v_new.astype(cache_v.dtype),
                                       mode="drop"))


def append_chunk_cp(cache_k: jnp.ndarray, cache_v: jnp.ndarray,
                    slots: jnp.ndarray, starts: jnp.ndarray,
                    k_new: jnp.ndarray, v_new: jnp.ndarray, *,
                    cp_index, local_len: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """T-token append onto a sequence shard: token i of request b lands at
    global position starts[b]+i; only this shard's owned positions write
    (chunks may straddle the shard boundary). k/v_new [B, T, Hkv, D]."""
    B, T = k_new.shape[:2]
    pos = starts[:, None] + jnp.arange(T, dtype=starts.dtype)[None]
    p_loc = pos - cp_index * local_len
    own = (p_loc >= 0) & (p_loc < local_len)
    idx = jnp.where(own, p_loc, local_len)
    return (cache_k.at[slots[:, None], idx].set(
                k_new.astype(cache_k.dtype), mode="drop"),
            cache_v.at[slots[:, None], idx].set(
                v_new.astype(cache_v.dtype), mode="drop"))


def append_token_quant_cp(cache_k, cache_v, scale_k, scale_v,
                          slots: jnp.ndarray, positions: jnp.ndarray,
                          k_new: jnp.ndarray, v_new: jnp.ndarray, *,
                          cp_index, local_len: int):
    """Quantized twin of append_token_cp: codes AND scale planes write only
    on the owning sequence shard (scatter-dropped elsewhere)."""
    kq, ks = quantize_kv(k_new)
    vq, vs = quantize_kv(v_new)
    p_loc = positions - cp_index * local_len
    own = (p_loc >= 0) & (p_loc < local_len)
    idx = jnp.where(own, p_loc, local_len)
    return (cache_k.at[slots, idx].set(kq, mode="drop"),
            cache_v.at[slots, idx].set(vq, mode="drop"),
            scale_k.at[slots, idx].set(ks, mode="drop"),
            scale_v.at[slots, idx].set(vs, mode="drop"))


def append_chunk_quant_cp(cache_k, cache_v, scale_k, scale_v,
                          slots: jnp.ndarray, starts: jnp.ndarray,
                          k_new: jnp.ndarray, v_new: jnp.ndarray, *,
                          cp_index, local_len: int):
    """Quantized twin of append_chunk_cp: T tokens' codes + scales land on
    their owning sequence shard only (scatter-dropped elsewhere)."""
    kq, ks = quantize_kv(k_new)
    vq, vs = quantize_kv(v_new)
    T = k_new.shape[1]
    pos = starts[:, None] + jnp.arange(T, dtype=starts.dtype)[None]
    p_loc = pos - cp_index * local_len
    own = (p_loc >= 0) & (p_loc < local_len)
    idx = jnp.where(own, p_loc, local_len)
    b = slots[:, None]
    return (cache_k.at[b, idx].set(kq, mode="drop"),
            cache_v.at[b, idx].set(vq, mode="drop"),
            scale_k.at[b, idx].set(ks, mode="drop"),
            scale_v.at[b, idx].set(vs, mode="drop"))


def chunk_attention_quant_partial(q: jnp.ndarray, cache_k: jnp.ndarray,
                                  cache_v: jnp.ndarray,
                                  scale_k: jnp.ndarray,
                                  scale_v: jnp.ndarray,
                                  slots: jnp.ndarray,
                                  limits_local: jnp.ndarray, *,
                                  num_heads: int
                                  ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                             jnp.ndarray]:
    """int8-KV twin of chunk_attention_partial (same stats contract;
    scale factorization of chunk_attention_quant)."""
    B, T, H, D = q.shape
    k = cache_k[slots]            # [B, Lloc, Hkv, D] int8
    v = cache_v[slots]
    ks = scale_k[slots]           # [B, Lloc, Hkv]
    vs = scale_v[slots]
    L, Hkv = k.shape[1], k.shape[2]
    group = H // Hkv
    qf = q.astype(jnp.float32).reshape(B, T, Hkv, group, D)
    s = jnp.einsum("bthgd,blhd->bhgtl", qf,
                   k.astype(jnp.float32)) / jnp.sqrt(jnp.float32(D))
    s = s * ks.transpose(0, 2, 1)[:, :, None, None, :]
    mask = jnp.arange(L)[None, None, :] < limits_local[:, :, None]
    s = jnp.where(mask[:, None, None, :, :], s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pw = jnp.where(mask[:, None, None, :, :],
                   p * vs.transpose(0, 2, 1)[:, :, None, None, :], 0.0)
    acc = jnp.einsum("bhgtl,blhd->bthgd", pw, v.astype(jnp.float32))
    perm = (0, 3, 1, 2, 4)
    return (acc.reshape(B, T, H, D),
            m.transpose(*perm).reshape(B, T, H),
            l.transpose(*perm).reshape(B, T, H))


def decode_attention_quant_partial(q: jnp.ndarray, cache_k: jnp.ndarray,
                                   cache_v: jnp.ndarray,
                                   scale_k: jnp.ndarray,
                                   scale_v: jnp.ndarray,
                                   slots: jnp.ndarray,
                                   lengths_local: jnp.ndarray, *,
                                   num_heads: int, use_flash: bool = None
                                   ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                              jnp.ndarray]:
    """int8-KV twin of decode_attention_partial: logits scale by the K
    scales before the local max, V scales fold into the (unnormalized)
    softmax weights, l stays the raw exp-sum — the same factorization as
    decode_attention_quant, returned as cross-shard LSE merge stats.
    Lane-aligned dims take the quant flash kernel in partial_stats mode
    (length-proportional int8 shard reads — without it cp+int8 decode
    would stream the whole shard per step)."""
    B, H, D = q.shape
    if use_flash is None:
        use_flash = D % 128 == 0
    if use_flash:
        from ..kernels.flash import make_flash_decode_quant
        from ..tuner import get_arch
        fn = make_flash_decode_quant(
            batch=B, heads=H, max_seq_len=cache_k.shape[1], dim=D,
            kv_heads=cache_k.shape[2], out_dtype=q.dtype,
            partial_stats=True, interpret=get_arch().is_cpu)
        return fn(q, cache_k, cache_v, scale_k, scale_v, lengths_local,
                  slots)
    k = cache_k[slots]            # [B, Lloc, Hkv, D] int8
    v = cache_v[slots]
    ks = scale_k[slots]           # [B, Lloc, Hkv]
    vs = scale_v[slots]
    L, Hkv = k.shape[1], k.shape[2]
    group = H // Hkv
    qf = q.astype(jnp.float32).reshape(B, Hkv, group, D)
    s = jnp.einsum("bhgd,blhd->bhgl", qf, k.astype(jnp.float32))
    s = s * ks.transpose(0, 2, 1)[:, :, None, :] / jnp.sqrt(jnp.float32(D))
    mask = jnp.arange(L)[None, :] < lengths_local[:, None]
    s = jnp.where(mask[:, None, None, :], s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pw = jnp.where(mask[:, None, None, :],
                   p * vs.transpose(0, 2, 1)[:, :, None, :], 0.0)
    acc = jnp.einsum("bhgl,blhd->bhgd", pw, v.astype(jnp.float32))
    return (acc.reshape(B, H, D), m.reshape(B, H), l.reshape(B, H))


def chunk_attention_partial(q: jnp.ndarray, cache_k: jnp.ndarray,
                            cache_v: jnp.ndarray, slots: jnp.ndarray,
                            limits_local: jnp.ndarray, *, num_heads: int
                            ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                       jnp.ndarray]:
    """T-token causal attention stats over ONE sequence shard (the chunk
    twin of decode_attention_partial): limits_local [B, T] = per-query
    valid positions in THIS shard (global causal limit starts[b]+i+1
    clipped to the shard's range). Returns (acc [B,T,H,D] f32, m [B,T,H],
    l [B,T,H]) for the cross-shard log-sum-exp merge."""
    B, T, H, D = q.shape
    k = cache_k[slots]  # [B, Lloc, Hkv, D]
    v = cache_v[slots]
    L, Hkv = k.shape[1], k.shape[2]
    group = H // Hkv
    qf = q.astype(jnp.float32).reshape(B, T, Hkv, group, D)
    s = jnp.einsum("bthgd,blhd->bhgtl", qf, k.astype(jnp.float32)) \
        / jnp.sqrt(jnp.float32(D))
    mask = jnp.arange(L)[None, None, :] < limits_local[:, :, None]
    s = jnp.where(mask[:, None, None, :, :], s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)        # [B, Hkv, group, T, 1]
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bhgtl,blhd->bthgd", p, v.astype(jnp.float32))
    perm = (0, 3, 1, 2, 4)                        # -> [B, T, Hkv, group, .]
    return (acc.reshape(B, T, H, D),
            m.transpose(*perm).reshape(B, T, H),
            l.transpose(*perm).reshape(B, T, H))


def decode_attention_partial(q: jnp.ndarray, cache_k: jnp.ndarray,
                             cache_v: jnp.ndarray, slots: jnp.ndarray,
                             lengths_local: jnp.ndarray, *, num_heads: int,
                             use_flash: bool = None
                             ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                        jnp.ndarray]:
    """Single-token attention stats over ONE sequence shard of the cache,
    for a cross-shard log-sum-exp merge (context-parallel decode):

      acc [B, H, D] f32  — unnormalized sum_j softmax_num(j) * v_j
      m   [B, H]    f32  — local max logit (NEG_INF-ish when the shard
                           holds no valid positions for that sequence)
      l   [B, H]    f32  — local sum of exp(logit - m)

    Merge across shards c with global m* = max_c m_c, w_c = exp(m_c - m*):
    out = sum_c w_c*acc_c / sum_c w_c*l_c. An all-masked shard contributes
    w_c = exp(-1e30 - m*) = 0, zeroing its (well-defined, finite) garbage.
    lengths_local [B] = valid tokens in THIS shard (global valid length
    clipped to the shard's position range).

    Lane-aligned head dims take the flash-decode kernel (partial_stats
    mode): length-proportional shard reads, no [B, Lloc, Hkv, D] gather —
    without it, cp mode would stream the whole shard per step and erode
    the KV-read saving it exists for. The XLA path remains for odd dims."""
    B, H, D = q.shape
    if use_flash is None:
        use_flash = D % 128 == 0
    if use_flash:
        from ..kernels.flash import make_flash_decode
        from ..tuner import get_arch
        fn = make_flash_decode(
            batch=B, heads=H, max_seq_len=cache_k.shape[1], dim=D,
            kv_heads=cache_k.shape[2], out_dtype=q.dtype,
            partial_stats=True, interpret=get_arch().is_cpu)
        return fn(q, cache_k, cache_v, lengths_local, slots)
    k = cache_k[slots]  # [B, Lloc, Hkv, D]
    v = cache_v[slots]
    L, Hkv = k.shape[1], k.shape[2]
    group = H // Hkv
    qf = q.astype(jnp.float32).reshape(B, Hkv, group, D)
    s = jnp.einsum("bhgd,blhd->bhgl", qf, k.astype(jnp.float32)) \
        / jnp.sqrt(jnp.float32(D))
    mask = jnp.arange(L)[None, :] < lengths_local[:, None]
    s = jnp.where(mask[:, None, None, :], s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)            # [B, Hkv, group, 1]
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bhgl,blhd->bhgd", p, v.astype(jnp.float32))
    return (acc.reshape(B, H, D), m.reshape(B, H), l.reshape(B, H))


def decode_attention(q: jnp.ndarray, cache_k: jnp.ndarray,
                     cache_v: jnp.ndarray, slots: jnp.ndarray,
                     lengths: jnp.ndarray, *, num_heads: int,
                     use_flash: bool = None,
                     window: Optional[int] = None) -> jnp.ndarray:
    """Single-token attention against the cache.

    q [B, H, D]; cache_k/v [slots, L, Hkv, D]; lengths [B] = valid tokens
    (including the one just appended). Returns [B, H, D].

    With a lane-aligned head dim the flash-decode kernel attends straight
    out of the slot cache: no [B, L, Hkv, D] gather materializes and KV
    blocks past each sequence's length are never read (length-proportional
    IO at large max_seq_len). The XLA path remains for odd dims.
    """
    B, H, D = q.shape
    if use_flash is None:
        use_flash = D % 128 == 0
    if use_flash:
        from ..kernels.flash import make_flash_decode
        from ..tuner import get_arch
        fn = make_flash_decode(
            batch=B, heads=H, max_seq_len=cache_k.shape[1], dim=D,
            kv_heads=cache_k.shape[2], out_dtype=q.dtype, window=window,
            interpret=get_arch().is_cpu)
        return fn(q, cache_k, cache_v, lengths, slots)
    k = cache_k[slots]  # [B, L, Hkv, D]
    v = cache_v[slots]
    Hkv = k.shape[2]
    group = H // Hkv
    qf = q.astype(jnp.float32).reshape(B, Hkv, group, D)
    kf = k.astype(jnp.float32)
    s = jnp.einsum("bhgd,blhd->bhgl", qf, kf) / jnp.sqrt(jnp.float32(D))
    L = k.shape[1]
    pos = jnp.arange(L)[None, :]
    mask = pos < lengths[:, None]                             # [B, L]
    if window is not None:
        # query sits at position lengths-1; keep keys in (len-1-window,
        # len-1] (HF sliding-window convention)
        mask = mask & (pos > (lengths[:, None] - 1 - window))
    s = jnp.where(mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhgl,blhd->bhgd", p, v.astype(jnp.float32))
    return out.reshape(B, H, D).astype(q.dtype)


# -- ring (sliding-window rolling-buffer) cache --------------------------------
#
# With sliding-window attention only the trailing `window` keys are ever
# attended, yet the slot cache above still reserves max_seq_len rows per
# slot and masks the dead prefix. The ring cache stores capacity R ~= W
# rows per slot and writes token at absolute position p into ring row
# p % R — memory scales with the WINDOW, not the conversation length
# (Mistral W=4096 at max_seq 32768: 7.5x smaller KV).
#
# No per-row position array is stored: ring row r of a slot holding
# `length` tokens contains the newest absolute position p <= length-1 with
# p % R == r, i.e. p = (length-1) - ((length-1 - r) mod R) — derived
# in-graph from `lengths` (2 VPU ops per row). Attention masks on that
# derived absolute position, so the math is identical to the masked
# full-length path; only the storage layout changes.
#
# Eviction contract (checked at trace time): appending a chunk of T tokens
# overwrites ring rows of absolute positions < length-R. The OLDEST key a
# chunk query still needs is starts - window + 1 (HF convention: query p
# attends (p-window, p]), so correctness requires R >= window + T - 1.
# decode_step (T=1) needs only R >= window.
#
# There is no flash-decode ring kernel on purpose: the ring is already
# window-sized, so the plain XLA attend reads exactly the ~W keys a
# windowed flash kernel would — length-proportional IO comes free from
# the layout. (Reference: no counterpart — its serving is delegated to
# vLLM; rolling-buffer design follows the Mistral paper's cache.)


def ring_capacity(window: int, max_chunk: int = 1, align: int = 128) -> int:
    """Smallest aligned ring capacity correct for chunked appends of up
    to `max_chunk` tokens: R >= window + max_chunk - 1, rounded up."""
    need = window + max_chunk - 1
    return ((need + align - 1) // align) * align


def init_ring_kv_cache(cfg: KVCacheConfig, window: int,
                       max_chunk: int = 1) -> Dict[str, jnp.ndarray]:
    """Slot cache with ring rows: k/v [L, slots, R, H, D], R = window-sized
    capacity instead of cfg.max_seq_len."""
    R = min(ring_capacity(window, max_chunk), cfg.max_seq_len)
    dt = jnp.dtype(cfg.dtype)
    shape = (cfg.num_layers, cfg.num_slots, R, cfg.num_kv_heads,
             cfg.head_dim)
    return {
        "k": jnp.zeros(shape, dt),
        "v": jnp.zeros(shape, dt),
        "lengths": jnp.zeros((cfg.num_slots,), jnp.int32),
    }


def ring_abs_positions(lengths: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """[B] lengths -> [B, R] absolute position held by each ring row
    (-1 for rows never written). Row r holds the newest p <= length-1
    with p % R == r."""
    r = jnp.arange(capacity, dtype=lengths.dtype)[None, :]
    last = lengths[:, None] - 1
    abs_pos = last - ((last - r) % capacity)
    return jnp.where(abs_pos >= 0, abs_pos, -1)


def append_token_ring(cache_k: jnp.ndarray, cache_v: jnp.ndarray,
                      slots: jnp.ndarray, positions: jnp.ndarray,
                      k_new: jnp.ndarray, v_new: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """append_token into ring rows: cache_k/v [slots, R, H, D]; the token
    at absolute position positions[b] lands in ring row positions[b] % R."""
    R = cache_k.shape[1]
    rows = positions % R
    cache_k = cache_k.at[slots, rows].set(k_new.astype(cache_k.dtype))
    cache_v = cache_v.at[slots, rows].set(v_new.astype(cache_v.dtype))
    return cache_k, cache_v


def append_chunk_ring(cache_k: jnp.ndarray, cache_v: jnp.ndarray,
                      slots: jnp.ndarray, starts: jnp.ndarray,
                      k_new: jnp.ndarray, v_new: jnp.ndarray
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """append_chunk into ring rows (absolute starts[b]+i -> row % R).

    T <= R keeps the T scatter targets distinct (duplicate scatter order
    is undefined); checked at trace time since both are static.
    """
    B, T = k_new.shape[:2]
    R = cache_k.shape[1]
    if T > R:
        raise ValueError(f"append_chunk_ring: chunk T={T} exceeds ring "
                         f"capacity R={R} (duplicate scatter targets)")
    pos = (starts[:, None] + jnp.arange(T, dtype=starts.dtype)[None]) % R
    cache_k = cache_k.at[slots[:, None], pos].set(k_new.astype(cache_k.dtype))
    cache_v = cache_v.at[slots[:, None], pos].set(v_new.astype(cache_v.dtype))
    return cache_k, cache_v


def ring_decode_attention(q: jnp.ndarray, cache_k: jnp.ndarray,
                          cache_v: jnp.ndarray, slots: jnp.ndarray,
                          lengths: jnp.ndarray, *, num_heads: int,
                          window: int) -> jnp.ndarray:
    """Single-token windowed attention against the ring cache.

    q [B, H, D]; cache_k/v [slots, R, Hkv, D]; lengths [B] = valid tokens
    INCLUDING the one just appended. Requires R >= window. Returns
    [B, H, D]. Same attended SET as decode_attention(window=) on a full
    cache — only the key ordering inside the softmax differs.
    """
    B, H, D = q.shape
    R = cache_k.shape[1]
    if R < window:
        raise ValueError(f"ring capacity {R} < window {window}")
    k = cache_k[slots]            # [B, R, Hkv, D]
    v = cache_v[slots]
    Hkv = k.shape[2]
    group = H // Hkv
    qf = q.astype(jnp.float32).reshape(B, Hkv, group, D)
    s = jnp.einsum("bhgd,blhd->bhgl", qf, k.astype(jnp.float32)) \
        / jnp.sqrt(jnp.float32(D))
    abs_pos = ring_abs_positions(lengths, R)          # [B, R]
    p = (lengths - 1)[:, None]
    mask = (abs_pos >= 0) & (abs_pos > p - window)    # abs<=p by derivation
    s = jnp.where(mask[:, None, None, :], s, -1e30)
    pr = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhgl,blhd->bhgd", pr, v.astype(jnp.float32))
    return out.reshape(B, H, D).astype(q.dtype)


def ring_chunk_attention(q: jnp.ndarray, cache_k: jnp.ndarray,
                         cache_v: jnp.ndarray, slots: jnp.ndarray,
                         starts: jnp.ndarray, *, num_heads: int,
                         window: int) -> jnp.ndarray:
    """T-token windowed causal attention against the ring cache (chunk
    already appended). q [B, T, H, D]; starts [B] = tokens cached BEFORE
    the chunk. Requires R >= window + T - 1 (eviction contract above)."""
    B, T, H, D = q.shape
    R = cache_k.shape[1]
    if R < window + T - 1:
        raise ValueError(
            f"ring capacity {R} < window+T-1 = {window + T - 1}: chunk "
            f"appends would evict keys the first chunk queries still need")
    k = cache_k[slots]            # [B, R, Hkv, D]
    v = cache_v[slots]
    Hkv = k.shape[2]
    group = H // Hkv
    qf = q.astype(jnp.float32).reshape(B, T, Hkv, group, D)
    s = jnp.einsum("bthgd,blhd->bhgtl", qf, k.astype(jnp.float32)) \
        / jnp.sqrt(jnp.float32(D))
    abs_pos = ring_abs_positions(starts + T, R)       # [B, R] post-append
    p = starts[:, None] + jnp.arange(T, dtype=starts.dtype)[None]  # [B, T]
    a = abs_pos[:, None, :]                           # [B, 1, R]
    pq = p[:, :, None]                                # [B, T, 1]
    mask = (a >= 0) & (a <= pq) & (a > pq - window)   # [B, T, R]
    s = jnp.where(mask[:, None, None, :, :], s, -1e30)
    pr = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhgtl,blhd->bthgd", pr, v.astype(jnp.float32))
    return out.reshape(B, T, H, D).astype(q.dtype)


def init_ring_quant_kv_cache(cfg: KVCacheConfig, window: int,
                             max_chunk: int = 1) -> Dict[str, jnp.ndarray]:
    """int8 ring cache: codes + per-(row, head) scales at ring capacity."""
    R = min(ring_capacity(window, max_chunk), cfg.max_seq_len)
    shape = (cfg.num_layers, cfg.num_slots, R, cfg.num_kv_heads,
             cfg.head_dim)
    return {
        "k": jnp.zeros(shape, jnp.int8),
        "v": jnp.zeros(shape, jnp.int8),
        "k_scale": jnp.zeros(shape[:-1], jnp.float32),
        "v_scale": jnp.zeros(shape[:-1], jnp.float32),
        "lengths": jnp.zeros((cfg.num_slots,), jnp.int32),
    }


def append_token_ring_quant(cache_k, cache_v, scale_k, scale_v,
                            slots: jnp.ndarray, positions: jnp.ndarray,
                            k_new: jnp.ndarray, v_new: jnp.ndarray):
    """Quantized ring append: int8 codes + scales land in row pos % R."""
    R = cache_k.shape[1]
    rows = positions % R
    kq, ks = quantize_kv(k_new)
    vq, vs = quantize_kv(v_new)
    cache_k = cache_k.at[slots, rows].set(kq)
    cache_v = cache_v.at[slots, rows].set(vq)
    scale_k = scale_k.at[slots, rows].set(ks)
    scale_v = scale_v.at[slots, rows].set(vs)
    return cache_k, cache_v, scale_k, scale_v


def append_chunk_ring_quant(cache_k, cache_v, scale_k, scale_v,
                            slots: jnp.ndarray, starts: jnp.ndarray,
                            k_new: jnp.ndarray, v_new: jnp.ndarray):
    """Quantized ring chunk append: codes + scales land in rows
    (starts[b]+i) % R. T <= R keeps scatter targets distinct."""
    B, T = k_new.shape[:2]
    R = cache_k.shape[1]
    if T > R:
        raise ValueError(f"append_chunk_ring_quant: chunk T={T} exceeds "
                         f"ring capacity R={R}")
    pos = (starts[:, None] + jnp.arange(T, dtype=starts.dtype)[None]) % R
    b = slots[:, None]
    kq, ks = quantize_kv(k_new)
    vq, vs = quantize_kv(v_new)
    cache_k = cache_k.at[b, pos].set(kq)
    cache_v = cache_v.at[b, pos].set(vq)
    scale_k = scale_k.at[b, pos].set(ks)
    scale_v = scale_v.at[b, pos].set(vs)
    return cache_k, cache_v, scale_k, scale_v


def ring_chunk_attention_quant(q: jnp.ndarray, cache_k: jnp.ndarray,
                               cache_v: jnp.ndarray, scale_k: jnp.ndarray,
                               scale_v: jnp.ndarray, slots: jnp.ndarray,
                               starts: jnp.ndarray, *, num_heads: int,
                               window: int) -> jnp.ndarray:
    """Quantized twin of ring_chunk_attention (scales on dot results)."""
    B, T, H, D = q.shape
    R = cache_k.shape[1]
    if R < window + T - 1:
        raise ValueError(
            f"ring capacity {R} < window+T-1 = {window + T - 1}: chunk "
            f"appends would evict keys the first chunk queries still need")
    k = cache_k[slots]            # [B, R, Hkv, D] int8
    v = cache_v[slots]
    ks = scale_k[slots]           # [B, R, Hkv]
    vs = scale_v[slots]
    Hkv = k.shape[2]
    group = H // Hkv
    qf = q.astype(jnp.float32).reshape(B, T, Hkv, group, D)
    s = jnp.einsum("bthgd,blhd->bhgtl", qf,
                   k.astype(jnp.float32)) / jnp.sqrt(jnp.float32(D))
    s = s * ks.transpose(0, 2, 1)[:, :, None, None, :]     # [B,Hkv,1,1,R]
    abs_pos = ring_abs_positions(starts + T, R)
    p = starts[:, None] + jnp.arange(T, dtype=starts.dtype)[None]
    a = abs_pos[:, None, :]
    pq = p[:, :, None]
    mask = (a >= 0) & (a <= pq) & (a > pq - window)
    s = jnp.where(mask[:, None, None, :, :], s, -1e30)
    pr = jax.nn.softmax(s, axis=-1)
    pr = pr * vs.transpose(0, 2, 1)[:, :, None, None, :]
    out = jnp.einsum("bhgtl,blhd->bthgd", pr, v.astype(jnp.float32))
    return out.reshape(B, T, H, D).astype(q.dtype)


def ring_decode_attention_quant(q: jnp.ndarray, cache_k: jnp.ndarray,
                                cache_v: jnp.ndarray, scale_k: jnp.ndarray,
                                scale_v: jnp.ndarray, slots: jnp.ndarray,
                                lengths: jnp.ndarray, *, num_heads: int,
                                window: int) -> jnp.ndarray:
    """Single-token windowed attention against the int8 ring cache (scales
    applied to dot results, as decode_attention_quant)."""
    B, H, D = q.shape
    R = cache_k.shape[1]
    if R < window:
        raise ValueError(f"ring capacity {R} < window {window}")
    k = cache_k[slots]            # [B, R, Hkv, D] int8
    v = cache_v[slots]
    ks = scale_k[slots]           # [B, R, Hkv]
    vs = scale_v[slots]
    Hkv = k.shape[2]
    group = H // Hkv
    qf = q.astype(jnp.float32).reshape(B, Hkv, group, D)
    s = jnp.einsum("bhgd,blhd->bhgl", qf, k.astype(jnp.float32))
    s = s * ks.transpose(0, 2, 1)[:, :, None, :] / jnp.sqrt(jnp.float32(D))
    abs_pos = ring_abs_positions(lengths, R)
    p = (lengths - 1)[:, None]
    mask = (abs_pos >= 0) & (abs_pos > p - window)
    s = jnp.where(mask[:, None, None, :], s, -1e30)
    pr = jax.nn.softmax(s, axis=-1)
    pv = pr * vs.transpose(0, 2, 1)[:, :, None, :]
    out = jnp.einsum("bhgl,blhd->bhgd", pv, v.astype(jnp.float32))
    return out.reshape(B, H, D).astype(q.dtype)
