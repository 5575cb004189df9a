"""Mesh-sharded execution: tensor-parallel fused dequant matmuls.

The reference is single-GPU by design (SURVEY.md §2.11 — TP is delegated to
vLLM around BitBLAS layers). Here distribution is first-class: packed
quantized weights and their scales/zeros shard over a `jax.sharding.Mesh`,
and the fused kernel runs under `shard_map` with XLA collectives over ICI.

Two classic layouts (Megatron-style):
  * column-parallel: shard the output dim N. The packed weight [K, N*bits/8]
    shards on its last axis (the slot-strided pack tile is 128*e columns =
    128 packed words wide, so any N shard that is a multiple of the pack tile
    preserves slot alignment — shard counts dividing N/pack_n are legal).
    No collective needed; output stays N-sharded.
  * row-parallel: shard the reduction dim K (weight axis 0, activation last
    axis). Each device computes a partial matmul over its K shard; a psum
    (all-reduce over ICI) combines — exactly MatmulWithSplitK's sum, done
    across chips.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..kernels.dequant_matmul import make_dequant_matmul
from ..kernels.spec import KernelSpec
from ..ops.matmul_config import MatmulConfig
from ..ops.weight_transform import DeviceWeights
from ..quantization.packing import pack_tile_n
from ..tuner import TileHint, default_hint, get_arch


def _local(config: MatmulConfig, n: Optional[int] = None,
           k: Optional[int] = None) -> MatmulConfig:
    import dataclasses
    return dataclasses.replace(config, N=n or config.N, K=k or config.K)


def retile_packed_for_column_shards(qweight, config: MatmulConfig,
                                    tp: int) -> "np.ndarray":
    """Re-tile a slot-strided N-pack so each of `tp` column shards is a
    valid standalone pack for N/tp.

    The canonical pack interleaves output columns within a 128*e-wide tile
    (quantization/packing.pack_nslot), so slicing the packed array is only
    column-aligned when N/tp is a multiple of the pack tile. When it is not
    (e.g. small K/V projections), unpack to natural [K, N] fields, split,
    and repack per shard — a pure offline data transform.
    """
    from ..quantization.packing import pack_nslot, unpack_nslot
    from ..ops.weight_transform import padded_n, storage_is_xored
    import dataclasses as _dc
    if config.is_native_compute():
        return qweight   # [K, N] values, no padding — even slices are exact
    N = config.N
    assert N % tp == 0, f"tp={tp} must divide N={N}"
    npad = padded_n(config)
    if config.bit >= 8:
        # 8-bit dequant layout is [K, npad] int8 values (padded to a 128
        # multiple). An even slice of the padded array offsets every shard by
        # the cumulative pad — silently wrong numerics (ADVICE.md r1 high).
        # Mirror the sub-byte path: slice to true N, split, re-pad per shard.
        if N == npad and (N // tp) % 128 == 0:
            return qweight
        w = np.asarray(qweight)
        loc = N // tp
        loc_pad = padded_n(_dc.replace(config, N=loc))
        parts = []
        for i in range(tp):
            chunk = w[:, i * loc:(i + 1) * loc]
            if chunk.shape[1] < loc_pad:
                chunk = np.pad(chunk,
                               ((0, 0), (0, loc_pad - chunk.shape[1])))
            parts.append(chunk)
        return np.concatenate(parts, axis=1).astype(w.dtype)
    e = 8 // config.bit
    tile = 128 * e
    if N == npad and (N // tp) % tile == 0:
        return qweight  # shard boundaries align with whole pack tiles
    xored = storage_is_xored(config)
    w = np.asarray(qweight)
    raw = (w.view(np.uint8) ^ 0x80).view(w.dtype) if xored else w
    fields = unpack_nslot(raw, config.bit, pack_tile_n(npad, e))[:, :N]
    parts = []
    for i in range(tp):
        chunk = fields[:, i * (N // tp):(i + 1) * (N // tp)]
        loc_pad = padded_n(_dc.replace(config, N=N // tp))
        if chunk.shape[1] < loc_pad:
            chunk = np.pad(chunk, ((0, 0), (0, loc_pad - chunk.shape[1])))
        parts.append(pack_nslot(chunk, config.bit, pack_tile_n(loc_pad, e)))
    out = np.concatenate(parts, axis=1).astype(w.dtype)
    if xored:
        out = (out.view(np.uint8) ^ 0x80).view(out.dtype)
    return out


def _retile_rows_for_column_shards(rows, config: MatmulConfig, tp: int,
                                   fill: float):
    """Re-group a [G, 1, N_pad] (or [1, N_pad]) row tensor to match the
    per-shard-padded weight retiling: slice to true N, split per shard,
    re-pad each shard to its local padded width."""
    from ..ops.weight_transform import padded_n
    import dataclasses as _dc
    N = config.N
    loc = N // tp
    loc_pad = padded_n(_dc.replace(config, N=loc))
    t = np.asarray(rows)
    squeeze = t.ndim == 2
    if squeeze:
        t = t[None]
    t = t[..., :N]
    parts = []
    for i in range(tp):
        c = t[..., i * loc:(i + 1) * loc]
        if c.shape[-1] < loc_pad:
            c = np.pad(c, ((0, 0),) * (c.ndim - 1)
                       + ((0, loc_pad - c.shape[-1]),),
                       constant_values=fill)
        parts.append(c)
    out = np.concatenate(parts, axis=-1)
    return jnp.asarray(out[0] if squeeze else out)


def shard_weights_column(dw: DeviceWeights, mesh: Mesh, axis: str,
                         config: MatmulConfig) -> DeviceWeights:
    """Place device-layout weights column-parallel (N sharded) on the mesh.
    Re-tiles the pack (and scale/zero/bias rows) when N/tp does not align
    with whole pack tiles."""
    from ..ops.weight_transform import padded_n
    tp = mesh.shape[axis]
    if config.is_native_compute():
        aligned = True
    else:
        # pack-tile width: 128*e words sub-byte, 128 values for 8-bit dequant
        tile = 128 * (8 // config.bit) if config.bit < 8 else 128
        aligned = (config.N == padded_n(config)
                   and (config.N // tp) % tile == 0)
    qw = retile_packed_for_column_shards(dw.qweight, config, tp)
    out = DeviceWeights(
        qweight=jax.device_put(
            jnp.asarray(qw), NamedSharding(mesh, P(None, axis))))

    def rows(t, fill):
        if aligned:
            return t
        return _retile_rows_for_column_shards(t, config, tp, fill)

    if dw.scales is not None:
        out.scales = jax.device_put(
            rows(dw.scales, 1.0), NamedSharding(mesh, P(None, None, axis)))
    if dw.zeros is not None:
        assert config.zeros_mode != "quantized" or aligned,             "quantized-zeros retiling for unaligned shards not implemented"
        out.zeros = jax.device_put(
            rows(dw.zeros, 0.0), NamedSharding(mesh, P(None, None, axis)))
    if dw.bias is not None:
        out.bias = jax.device_put(
            rows(dw.bias, 0.0), NamedSharding(mesh, P(None, axis)))
    return out


def shard_weights_row(dw: DeviceWeights, mesh: Mesh, axis: str,
                      config: MatmulConfig) -> DeviceWeights:
    """Place device-layout weights row-parallel (K sharded) on the mesh."""
    g = config.effective_group_size
    tp = mesh.shape[axis]
    assert (config.K // tp) % g == 0, "K shard must stay group-aligned"
    out = DeviceWeights(
        qweight=jax.device_put(dw.qweight, NamedSharding(mesh, P(axis, None))))
    if dw.scales is not None:
        out.scales = jax.device_put(
            dw.scales, NamedSharding(mesh, P(axis, None, None)))
    if dw.zeros is not None:
        out.zeros = jax.device_put(
            dw.zeros, NamedSharding(mesh, P(axis, None, None)))
    if dw.bias is not None:
        out.bias = jax.device_put(dw.bias, NamedSharding(mesh, P(None, None)))
    return out


def make_column_parallel_matmul(config: MatmulConfig, m: int, mesh: Mesh,
                                axis: str = "tp",
                                hint: Optional[TileHint] = None,
                                interpret: Optional[bool] = None,
                                gather_output: bool = False) -> Callable:
    """fn(A_replicated, Wp, scales?, zeros?, bias?) -> out sharded on N
    (or gathered when gather_output)."""
    arch = get_arch()
    if interpret is None:
        interpret = arch.is_cpu
    tp = mesh.shape[axis]
    local_cfg = _local(config, n=config.N // tp)
    spec = KernelSpec.from_config(local_cfg, m)
    hint = hint or default_hint(spec, arch)
    local_fn = make_dequant_matmul(spec, hint, interpret=interpret)

    has_s, has_z, has_b = (config.with_scaling, config.with_zeros,
                           config.with_bias)

    def wrapped(A, Wp, scales, zeros, bias):
        out = local_fn(A, Wp, scales=scales if has_s else None,
                       zeros=zeros if has_z else None,
                       bias=bias if has_b else None)
        if gather_output:
            out = jax.lax.all_gather(out, axis, axis=1, tiled=True)
        return out

    in_specs = (P(None, None), P(None, axis),
                P(None, None, axis) if has_s else P(),
                P(None, None, axis) if has_z else P(),
                P(None, axis) if has_b else P())
    out_specs = P(None, None) if gather_output else P(None, axis)
    sm = shard_map(wrapped, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False)

    def fn(A, Wp, scales=None, zeros=None, bias=None):
        dummy = jnp.zeros((1,), jnp.float32)
        return sm(A, Wp,
                  scales if has_s else dummy,
                  zeros if has_z else dummy,
                  bias if has_b else dummy)

    return fn


def make_row_parallel_matmul(config: MatmulConfig, m: int, mesh: Mesh,
                             axis: str = "tp",
                             hint: Optional[TileHint] = None,
                             interpret: Optional[bool] = None,
                             reduce_scatter: bool = False,
                             overlap_chunks: int = 1) -> Callable:
    """fn(A_k_sharded, Wp, scales?, zeros?, bias?) -> out replicated via psum
    (or N-sharded via psum_scatter when reduce_scatter).

    overlap_chunks > 1 splits the output dim into that many column chunks,
    each its own kernel + collective: XLA schedules the collectives
    asynchronously, so chunk c's psum rides ICI while chunk c+1's matmul
    occupies the MXU — the comm/compute overlap lever of
    docs/Scaling70B.md. Chunk width must cover whole pack tiles.
    """
    arch = get_arch()
    if interpret is None:
        interpret = arch.is_cpu
    tp = mesh.shape[axis]
    has_s, has_z, has_b = (config.with_scaling, config.with_zeros,
                           config.with_bias)

    nc = overlap_chunks
    e = max(1, 8 // config.bit) if not config.is_native_compute() else 1
    if nc > 1:
        tile = 128 * e if config.bit < 8 else 128
        assert config.N % nc == 0 and (config.N // nc) % tile == 0, \
            f"chunk width N/{nc} must cover whole pack tiles ({tile})"
        assert not reduce_scatter, \
            "overlap_chunks composes with psum only (chunked psum_scatter " \
            "would permute the N shard layout)"
        assert config.zeros_mode != "quantized", \
            "overlap_chunks with packed qzeros not supported"
    cw = config.N // nc           # chunk width (output columns)
    local_cfg = _local(config, n=cw, k=config.K // tp)
    spec = KernelSpec.from_config(local_cfg, m)
    hint = hint or default_hint(spec, arch)
    local_fn = make_dequant_matmul(spec, hint, interpret=interpret)
    wcw = cw // e                 # packed words per chunk

    def _reduce(acc):
        if reduce_scatter:
            return jax.lax.psum_scatter(acc, axis, scatter_dimension=1,
                                        tiled=True)
        return jax.lax.psum(acc, axis)

    def wrapped(A, Wp, scales, zeros, bias):
        parts = []
        out_dtype = None
        for c in range(nc):
            s_c = scales[..., c * cw:(c + 1) * cw] if has_s else None
            z_c = zeros[..., c * cw:(c + 1) * cw] if has_z else None
            out_c = local_fn(A, Wp[:, c * wcw:(c + 1) * wcw],
                             scales=s_c, zeros=z_c, bias=None)
            out_dtype = out_c.dtype
            # reduce each chunk as soon as its kernel finishes; XLA turns
            # these into async collectives overlapped with the next chunk
            parts.append(_reduce(out_c.astype(jnp.float32)))
        acc = parts[0] if nc == 1 else jnp.concatenate(parts, axis=1)
        if has_b and bias is not None:
            acc = acc + bias.astype(acc.dtype)
        return acc.astype(out_dtype)

    in_specs = (P(None, axis), P(axis, None),
                P(axis, None, None) if has_s else P(),
                P(axis, None, None) if has_z else P(),
                (P(None, axis) if reduce_scatter else P(None, None))
                if has_b else P())
    out_specs = P(None, axis) if reduce_scatter else P(None, None)
    sm = shard_map(wrapped, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False)

    def fn(A, Wp, scales=None, zeros=None, bias=None):
        dummy = jnp.zeros((1,), jnp.float32)
        return sm(A, Wp,
                  scales if has_s else dummy,
                  zeros if has_z else dummy,
                  bias if has_b else dummy)

    return fn
