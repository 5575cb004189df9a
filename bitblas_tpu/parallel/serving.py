"""Tensor-parallel serving: head-local decode with a sharded KV cache.

BASELINE.json config #5 (the reference delegates multi-GPU serving to vLLM;
here it is first-class). Layout per decoder layer, Megatron-style but with
attention kept device-local between the projections:

  q/k/v   column-parallel (heads shard with N)      -> no collective
  attn    local heads against the kv_heads-sharded KV cache
  o       row-parallel over the local head dim      -> 1 psum
  gate/up column-parallel                           -> no collective
  down    row-parallel                              -> 1 psum

Exactly two psums per layer ride ICI; activations are replicated between
layers. The KV cache shards on its kv_heads axis (same axis the heads shard
on), so decode attention never moves cache data between chips.

`TPQuantLlama` implements the same protocol as models.quant_llama.QuantLlama
(`make_prefill`, `decode_step`, `cfg`) so serving.engine's
ContinuousBatchingEngine drives it unchanged — pass
`cache_sharding=model.kv_cache_sharding()` to keep the engine's cache
sharded.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..kernels.dequant_matmul import make_dequant_matmul
from ..kernels.spec import KernelSpec
from ..models.quant_llama import (LlamaConfig, QuantLlama,
                                  rmsnorm, rope)
from ..ops.matmul_config import MatmulConfig
from ..tuner import default_hint, get_arch

_FUSED = ("qkv", "o", "gateup", "down")
_COLUMN = {"qkv", "gateup"}
_ROW = {"o", "down"}


def _quantized_allreduce(part, axis):
    """All-reduce via int8-quantized all-gather: each device quantizes its
    f32 partial per-row (absmax int8 + f32 scale), all-gathers the shards,
    and sums the dequantized copies locally. Moves ~(n-1)/n * B bytes of
    int8 instead of 2(n-1)/n * B of f16/f32 — a ~4-8x ICI saving on the two
    per-layer collectives (docs/Scaling70B.md path to 85% scaling).

    Error: one int8 rounding per partial (~0.4% of each partial's absmax),
    uncorrelated across devices.
    """
    amax = jnp.max(jnp.abs(part), axis=-1, keepdims=True)
    scale = 127.0 / jnp.maximum(amax, 1e-20)
    q = jnp.clip(jnp.round(part * scale), -127, 127).astype(jnp.int8)
    qs = jax.lax.all_gather(q, axis)             # [tp, B, H] int8
    ss = jax.lax.all_gather(scale, axis)         # [tp, B, 1] f32
    return jnp.sum(qs.astype(jnp.float32) / ss, axis=0)


def _local_cfg(cfg_m: MatmulConfig, name: str, tp: int) -> MatmulConfig:
    import dataclasses
    if name in _COLUMN:
        return dataclasses.replace(cfg_m, N=cfg_m.N // tp)
    return dataclasses.replace(cfg_m, K=cfg_m.K // tp)


def _pad_tile(n, bits=4):
    t = 128 * (8 // bits)
    return -(-n // t) * t


def _unpack_natural(W, S, Z, n, bits=4):
    """Device-layout (xored, slot-packed, N-padded) -> natural-order fields
    + 3D scale/zero rows, sliced back to the true n."""
    from ..quantization.packing import pack_tile_n, unpack_nslot
    np_ = _pad_tile(n, bits)
    w = np.asarray(W)
    raw = (w.view(np.uint8) ^ 0x80).view(w.dtype)
    fields = unpack_nslot(raw, bits, pack_tile_n(np_, 8 // bits))[:, :n]
    return fields, np.asarray(S)[:, :, :n], np.asarray(Z)[:, :, :n]


def _pack_device_grouped(device_blocks, bits=4):
    """Per-device natural-field blocks [[K, n_local] ...] -> one packed
    (xored) array whose P(None, axis) shard boundaries land exactly between
    blocks. Each block pads to a whole pack tile and packs as ONE unit —
    the layout the local kernel expects."""
    from ..quantization.packing import pack_nslot, pack_tile_n
    packs = []
    for b in device_blocks:
        np_ = _pad_tile(b.shape[1], bits)
        if b.shape[1] < np_:
            b = np.pad(b, ((0, 0), (0, np_ - b.shape[1])))
        packs.append(pack_nslot(b, bits, pack_tile_n(np_, 8 // bits)))
    out = np.concatenate(packs, axis=1)
    return (out.view(np.uint8) ^ 0x80).view(out.dtype)


def _fuse_column_weights(parts, ns, tp):
    """Fuse column-parallel projections into one matmul.

    parts: [(W, S, Z)] device-layout tensors with full output sizes `ns`.
    The combined natural layout is device-grouped — [p0_d | p1_d | ...] for
    each device d — so sharding the packed result on its last axis hands
    every device its own slice of every fused projection.
    """
    fields, scs, zrs = [], [], []
    for (W, S, Z), n in zip(parts, ns):
        f, s, z = _unpack_natural(W, S, Z, n)
        fields.append(f)
        scs.append(s)
        zrs.append(z)
    blocks, s_chunks, z_chunks = [], [], []
    for d in range(tp):
        parts_f, parts_s, parts_z = [], [], []
        for f, s, z, n in zip(fields, scs, zrs, ns):
            loc = n // tp
            sl = slice(d * loc, (d + 1) * loc)
            parts_f.append(f[:, sl])
            parts_s.append(s[:, :, sl])
            parts_z.append(z[:, :, sl])
        blk = np.concatenate(parts_f, axis=1)
        sb = np.concatenate(parts_s, axis=2)
        zb = np.concatenate(parts_z, axis=2)
        np_ = _pad_tile(blk.shape[1])
        if sb.shape[2] < np_:
            pad = ((0, 0), (0, 0), (0, np_ - sb.shape[2]))
            sb = np.pad(sb, pad, constant_values=1.0)
            zb = np.pad(zb, pad)
        blocks.append(blk)
        s_chunks.append(sb)
        z_chunks.append(zb)
    W = jnp.asarray(_pack_device_grouped(blocks))
    S = jnp.asarray(np.concatenate(s_chunks, axis=2))
    Z = jnp.asarray(np.concatenate(z_chunks, axis=2))
    return W, S, Z


def _replicate_kv_heads(qweight, scales, zeros, src_cfg: LlamaConfig,
                        rep: int):
    """Duplicate each kv head's packed columns `rep` times (eff head j =
    source head j // rep) — offline data transform for GQA TP with
    tp > num_kv_heads."""
    from ..quantization.packing import pack_nslot, pack_tile_n, unpack_nslot
    D = src_cfg.head_dim
    n_src = src_cfg.num_kv_heads * D
    bits, e = 4, 2  # uint4 packing (stored XOR 0x80, N-padded)
    w = np.asarray(qweight)
    raw = (w.view(np.uint8) ^ 0x80).view(w.dtype)
    np_src = _pad_tile(n_src, bits)
    fields = unpack_nslot(raw, bits, pack_tile_n(np_src, e))[:, :n_src]
    fields = fields.reshape(fields.shape[0], src_cfg.num_kv_heads, D)
    fields = np.repeat(fields, rep, axis=1).reshape(fields.shape[0], -1)
    n_eff = n_src * rep
    np_eff = _pad_tile(n_eff, bits)
    if fields.shape[1] < np_eff:
        fields = np.pad(fields, ((0, 0), (0, np_eff - fields.shape[1])))
    wq = pack_nslot(fields, bits, pack_tile_n(np_eff, e)).astype(w.dtype)
    wq = (wq.view(np.uint8) ^ 0x80).view(wq.dtype)

    def _rep_rows(t, fill):
        t = np.asarray(t)[:, :, :n_src]                       # [G, 1, N_src]
        t = t.reshape(t.shape[0], 1, src_cfg.num_kv_heads, D)
        t = np.repeat(t, rep, axis=2).reshape(t.shape[0], 1, n_eff)
        if t.shape[2] < np_eff:
            t = np.pad(t, ((0, 0), (0, 0), (0, np_eff - t.shape[2])),
                       constant_values=fill)
        return jnp.asarray(t)

    return jnp.asarray(wq), _rep_rows(scales, 1.0), _rep_rows(zeros, 0.0)


class TPQuantLlama:
    """TP-sharded quantized Llama decoder (engine-compatible protocol).

    Built from a single-device QuantLlama's weights so numerics can be
    checked shard-for-shard against the unsharded model.
    """

    def __init__(self, src: QuantLlama, mesh: Mesh, axis: str = "tp",
                 interpret: Optional[bool] = None,
                 quantized_collectives: bool = False,
                 overlap_chunks: int = 1,
                 context_parallel: bool = False):
        import dataclasses as _dc
        cfg = src.cfg
        if cfg.attention_bias or any(getattr(l, "biases", None)
                                     for l in src.layers):
            raise NotImplementedError(
                "TPQuantLlama does not carry q/k/v projection biases yet "
                "(Qwen2-style attention_bias) — the fused qkv kernel "
                "would silently drop them")
        if cfg.sliding_window is not None and context_parallel:
            # cp shards the SEQUENCE axis: the window lower bound becomes
            # a per-shard local range and the partial-stats LSE merge
            # needs window-aware local limits — not wired yet. Non-cp TP
            # windows correctly (same helpers as the single-chip paths).
            raise NotImplementedError(
                "context_parallel + sliding_window is not implemented "
                f"(sliding_window={cfg.sliding_window})")
        self.mesh = mesh
        self.axis = axis
        tp = mesh.shape[axis]
        self.tp = tp
        assert cfg.num_heads % tp == 0, "heads must divide tp"
        assert axis != "cp", "'cp' is reserved for context parallelism"
        # GQA with fewer kv heads than tp: replicate each source kv head
        # tp/num_kv_heads times so cache and k/v projections still shard
        # evenly (eff kv head j = source head j // kv_rep; device d's q
        # heads [d*hl, (d+1)*hl) all map to eff head d). The cache grows
        # kv_rep-fold but stays fully sharded — the standard GQA-TP layout.
        if cfg.num_kv_heads % tp == 0:
            self.kv_rep = 1
        else:
            assert tp % cfg.num_kv_heads == 0, \
                "need num_kv_heads % tp == 0 or tp % num_kv_heads == 0"
            self.kv_rep = tp // cfg.num_kv_heads
        eff_kv = cfg.num_kv_heads * self.kv_rep
        self.kv_eff = eff_kv            # projection-level kv head count
        self.kvl = eff_kv // tp         # kv heads computed per device
        # Context parallelism (tp > num_kv_heads only): instead of
        # REPLICATING each source kv head kv_rep-fold in the cache, shard
        # the cache's SEQUENCE axis kv_rep-ways across each kv-head group
        # — per-chip KV reads (the decode-attention HBM term) and cache
        # footprint both drop kv_rep-fold; partial softmaxes merge with a
        # tiny log-sum-exp collective over the cp subgroup
        # (docs/Scaling70B.md). The k/v PROJECTIONS stay replicated
        # (each device still computes its source head's k/v — a few
        # columns); only storage and attention reads shard.
        self.context_parallel = bool(context_parallel) and self.kv_rep > 1
        if self.context_parallel:
            self.cp = self.kv_rep
            # Same devices, 2D view: axis-major ordering keeps shard d of
            # any 16-way (axis, cp) sharding on the same device as shard d
            # of the 1D mesh — weights placed via the 1D mesh feed the 2D
            # shard_map without resharding, and cp pairs are ICI neighbors.
            self.smesh = Mesh(mesh.devices.reshape(-1, self.cp),
                              (axis, "cp"))
            self.psum_axes = (axis, "cp")
            # engine cache shapes: SOURCE kv heads, no replication
            self.cfg = _dc.replace(cfg)
        else:
            self.cp = 1
            self.smesh = mesh
            self.psum_axes = axis
            # engine reads .cfg for cache shapes -> publish effective
            # (replicated) counts
            self.cfg = _dc.replace(cfg, num_kv_heads=eff_kv)
        cfg = self.cfg
        arch = get_arch()
        self.interpret = arch.is_cpu if interpret is None else interpret
        self.quantized_collectives = quantized_collectives
        # Chunked row-parallel reduces (async-collective comm/compute
        # overlap, docs/Scaling70B.md): split o/down outputs into this many
        # column chunks, each its own kernel + all-reduce.
        self.overlap_chunks = overlap_chunks

        # Shard the source model's device-layout weights. q/k/v fuse into
        # one column-parallel matmul and gate/up into another (fewer,
        # wider kernels — small local N is the tp=16 efficiency killer,
        # docs/Scaling70B.md): weights dict keys are qkv/o/gateup/down.
        self.weights = []          # [layer][name] -> (qweight, scales, zeros)
        self.norms = []            # [layer] -> (attn_norm, mlp_norm)
        H = cfg.hidden_size
        kv_size = self.kv_eff * cfg.head_dim
        self.fused_ns = {"qkv": (H, kv_size, kv_size),
                         "gateup": (cfg.intermediate_size,
                                    cfg.intermediate_size)}
        self.mcfg: Dict[str, MatmulConfig] = {}
        for name, K, N in (("qkv", H, H + 2 * kv_size),
                           ("o", H, H),
                           ("gateup", H, 2 * cfg.intermediate_size),
                           ("down", cfg.intermediate_size, H)):
            self.mcfg[name] = MatmulConfig(
                M=1, N=N, K=K, A_dtype=cfg.act_dtype, W_dtype="uint4",
                with_scaling=True, with_zeros=True, zeros_mode="original",
                group_size=cfg.group_size, out_dtype=cfg.act_dtype)
        # The repack/fuse/replicate helpers in this module assume the uint4
        # pack geometry (e = 2 slots/byte); fail loudly if that ever drifts.
        self._e = 8 // self.mcfg["o"].bit
        assert self._e == 2, "TPQuantLlama repack helpers assume uint4"
        if overlap_chunks > 1:
            tile = 128 * self._e
            assert cfg.hidden_size % overlap_chunks == 0 and \
                (cfg.hidden_size // overlap_chunks) % tile == 0, \
                "chunk width must cover whole pack tiles"
        col_sh = (NamedSharding(mesh, P(None, axis)),
                  NamedSharding(mesh, P(None, None, axis)))
        row_sh = (NamedSharding(mesh, P(axis, None)),
                  NamedSharding(mesh, P(axis, None, None)))

        def place(w, s, z, sh):
            return (jax.device_put(w, sh[0]), jax.device_put(s, sh[1]),
                    jax.device_put(z, sh[1]))

        for layer in src.layers:
            kparts = {}
            for name in ("k", "v"):
                kparts[name] = layer.weights[name]
                if self.kv_rep > 1:
                    kparts[name] = _replicate_kv_heads(*kparts[name],
                                                       src.cfg, self.kv_rep)
            qkv = _fuse_column_weights(
                [layer.weights["q"], kparts["k"], kparts["v"]],
                [H, kv_size, kv_size], tp)
            gateup = _fuse_column_weights(
                [layer.weights["gate"], layer.weights["up"]],
                [cfg.intermediate_size] * 2, tp)
            shards = {
                "qkv": place(*qkv, col_sh),
                "gateup": place(*gateup, col_sh),
                "o": place(*layer.weights["o"], row_sh),
                "down": place(*layer.weights["down"], row_sh),
            }
            self.weights.append(shards)
            self.norms.append((layer.attn_norm, layer.mlp_norm))

        self._decode_kernels: Dict[tuple, callable] = {}

    # -- sharding handles ------------------------------------------------------
    def kv_cache_sharding(self) -> NamedSharding:
        """[L, slots, S, Hkv, D]: kv_heads axis always shards; under
        context parallelism the sequence axis additionally shards over the
        cp subgroups (source heads, no replication)."""
        return NamedSharding(self.smesh, self._kv_spec)

    def _allreduce(self, part, axis):
        if self.quantized_collectives:
            return _quantized_allreduce(part, axis)
        return jax.lax.psum(part, axis)

    # -- local kernels ---------------------------------------------------------
    def _kernel(self, name: str, m: int):
        key = (name, m)
        if key not in self._decode_kernels:
            import dataclasses as _dc
            lcfg = _local_cfg(self.mcfg[name], name, self.tp)
            if name in _ROW and self.overlap_chunks > 1:
                lcfg = _dc.replace(lcfg, N=lcfg.N // self.overlap_chunks)
            spec = KernelSpec.from_config(lcfg, m)
            hint = None
            # Tuned hints first: the operator DB may hold measured winners
            # for these TP-local shapes (scripts/seed_curated_hints.py or
            # any prior hardware_aware_finetune).
            try:
                from ..cache import global_operator_cache
                cached = global_operator_cache.get(
                    _dc.replace(lcfg, M=m))
                if cached is not None:
                    hint = cached.hint_for(m)
            except Exception:  # noqa: BLE001 - cache is best-effort
                pass
            if hint is None and (lcfg.W_dtype == "uint4"
                                 and lcfg.A_dtype == "float16"
                                 and lcfg.group_size == 128):
                # committed measured winners for the 70B TP-local shapes
                # (survive operator-DB/cache wipes). Keyed on (N, K, m)
                # only, so gate on the exact config family the table was
                # tuned for — a coincident shape with another group_size
                # could get tiles the kernel legalizer rejects.
                from ..tuner.curated import tp_serving_hint
                hint = tp_serving_hint(lcfg.N, lcfg.K, m)
            if hint is None:
                hint = default_hint(spec, get_arch())
            self._decode_kernels[key] = make_dequant_matmul(
                spec, hint, interpret=self.interpret)
        return self._decode_kernels[key]

    def _flat_weights(self):
        """Flatten every layer's fused device tensors + matching shard
        specs for a shard_map call — the one marshalling convention all
        decode/prefill variants share (column: shard N/last axis; row:
        shard K/first axis)."""
        # Under cp the shard axis is the composite (axis, cp) — same
        # 16-way split in the same device order as the 1D placement.
        ax = self.psum_axes
        flat, w_specs = [], []
        for li in range(self.cfg.num_layers):
            for name in _FUSED:
                W, S, Z = self.weights[li][name]
                flat += [W, S, Z]
                if name in _COLUMN:
                    w_specs += [P(None, ax), P(None, None, ax),
                                P(None, None, ax)]
                else:
                    w_specs += [P(ax, None), P(ax, None, None),
                                P(ax, None, None)]
        return flat, w_specs

    def _row_proj(self, kern_fn, name: str, xin, W, S, Z, axis):
        """Row-parallel projection + all-reduce, optionally chunked over N
        so each chunk's collective overlaps the next chunk's matmul."""
        nc = self.overlap_chunks
        if nc == 1:
            part = kern_fn(xin, W, scales=S, zeros=Z)
            return self._allreduce(part.astype(jnp.float32), axis)
        cw = self.mcfg[name].N // nc
        wcw = cw // self._e   # packed words per chunk
        parts = []
        for c in range(nc):
            p = kern_fn(xin, W[:, c * wcw:(c + 1) * wcw],
                        scales=S[..., c * cw:(c + 1) * cw],
                        zeros=Z[..., c * cw:(c + 1) * cw])
            parts.append(self._allreduce(p.astype(jnp.float32), axis))
        return jnp.concatenate(parts, axis=1)

    # -- decode (the hot path) -------------------------------------------------
    # Every decode variant (slot/paged x float/int8-KV x step/chunk) is the
    # same transformer stack around a different cache-append + attention
    # primitive. The stack lives in _tp_decode_layers and the shard_map
    # marshalling in _sharded_decode; each public variant supplies only a
    # `make_attend` closure over its serving.kv_cache primitives. (The six
    # hand-expanded twins had already drifted once — the flash-decode-quant
    # NaN — hence the single body.)

    def _tp_decode_layers(self, x, flat, kern, positions, attend, B, T):
        """Shared per-layer body: rmsnorm -> fused qkv (column-parallel,
        local heads) -> rope -> attend(li, q, k, v) -> row-parallel o ->
        rmsnorm -> fused gate/up -> silu*up -> row-parallel down. q and the
        attention that `attend` returns are [B, T, heads_local, D]; k/v are
        [B, T, kv_local, D]."""
        cfg = self.cfg
        axis = self.psum_axes
        hl = cfg.num_heads // self.tp
        kvl = self.kvl
        D = cfg.head_dim
        it = iter(flat)
        weights = [{name: (next(it), next(it), next(it)) for name in _FUSED}
                   for _ in range(cfg.num_layers)]
        for li in range(cfg.num_layers):
            attn_norm, mlp_norm = self.norms[li]
            w = weights[li]
            h2 = rmsnorm(x, attn_norm,
                         cfg.rms_norm_eps).reshape(B * T, cfg.hidden_size)
            qkv = kern["qkv"](h2, w["qkv"][0], scales=w["qkv"][1],
                              zeros=w["qkv"][2])
            q = rope(qkv[:, :hl * D].reshape(B, T, hl, D), positions,
                     cfg.rope_arg)
            k = rope(qkv[:, hl * D:(hl + kvl) * D].reshape(B, T, kvl, D),
                     positions, cfg.rope_arg)
            v = qkv[:, (hl + kvl) * D:].reshape(B, T, kvl, D)
            attn = attend(li, q, k, v)
            o = self._row_proj(kern["o"], "o", attn.reshape(B * T, hl * D),
                               *w["o"], axis)
            x = x + o.astype(x.dtype).reshape(B, T, cfg.hidden_size)
            h2 = rmsnorm(x, mlp_norm,
                         cfg.rms_norm_eps).reshape(B * T, cfg.hidden_size)
            gu = kern["gateup"](h2, w["gateup"][0], scales=w["gateup"][1],
                                zeros=w["gateup"][2])
            il = cfg.intermediate_size // self.tp
            gate, up = gu[:, :il], gu[:, il:]
            act = (jax.nn.silu(gate.astype(jnp.float32))
                   * up.astype(jnp.float32)).astype(x.dtype)
            d = self._row_proj(kern["down"], "down", act, *w["down"], axis)
            x = x + d.astype(x.dtype).reshape(B, T, cfg.hidden_size)
        return x

    def _sharded_decode(self, x, caches, cache_specs, extras, make_attend,
                        T):
        """shard_map wrapper shared by every decode variant: x and the
        host-managed extras (slots/lengths/page tables) replicate, cache
        arrays shard per `cache_specs` (their kv_heads axis), weights shard
        per _flat_weights. `make_attend(cs, extras)` -> (attend, positions)
        closes over the mutable cache list `cs`; entries it replaces are
        returned as the new cache values, in order, after x."""
        B = x.shape[0]
        kern = {name: self._kernel(name, B * T) for name in _FUSED}
        nc, ne = len(caches), len(extras)

        def device_fn(x, *rest):
            cs = list(rest[:nc])
            attend, positions = make_attend(cs, rest[nc:nc + ne])
            x = self._tp_decode_layers(x, rest[nc + ne:], kern, positions,
                                       attend, B, T)
            return (x, *cs)

        flat, w_specs = self._flat_weights()
        sm = shard_map(
            device_fn, mesh=self.smesh,
            in_specs=(P(), *cache_specs, *([P()] * ne), *w_specs),
            out_specs=(P(), *cache_specs), check_vma=False)
        return sm(x, *caches, *extras, *flat)

    @property
    def _kv_spec(self):
        """codes [L, slots|blocks, S|bs, Hkv, D] -> shard on kv_heads
        (and, under cp, the sequence axis over the cp subgroups)."""
        if self.context_parallel:
            return P(None, None, "cp", self.axis, None)
        return P(None, None, None, self.axis, None)

    @property
    def _ks_spec(self):
        """scale planes [L, slots|blocks, S|bs, Hkv] -> shard on kv_heads."""
        if self.context_parallel:
            return P(None, None, "cp", self.axis)
        return P(None, None, None, self.axis)

    def _check_ring(self, ring):
        """Ring (rolling-buffer) caches shard on kv_heads exactly like the
        full-length cache — the ring row axis is head-independent — so the
        non-cp TP paths reuse the single-chip ring helpers unchanged.
        cp shards the SEQUENCE axis, which a ring re-indexes mod R;
        composing the two needs cp-local ring row derivations (not wired)."""
        if not ring:
            return
        if self.cfg.sliding_window is None:
            raise ValueError("ring cache requires cfg.sliding_window")
        if self.context_parallel:
            raise NotImplementedError(
                "ring + context_parallel is not implemented (the window "
                "already bounds per-chip KV; use kv_ring without cp)")

    def decode_step(self, x, caches_k, caches_v, slots, lengths, *,
                    ring: bool = False):
        """x [B, 1, H]; caches [L, slots, S, Hkv, D] kv_heads-sharded (and
        sequence-sharded under context parallelism). ring=True: caches are
        window-sized rolling buffers (kv_cache.py ring section)."""
        self._check_ring(ring)
        if self.context_parallel:
            def make_attend(cs, ex):
                from ..serving.kv_cache import (append_token_cp,
                                                decode_attention_partial)
                slots, lengths = ex

                def attend(li, q, k, v):
                    c = jax.lax.axis_index("cp")
                    s_loc = cs[0].shape[2]       # local sequence extent
                    ckl, cvl = append_token_cp(
                        cs[0][li], cs[1][li], slots, lengths,
                        k[:, 0], v[:, 0], cp_index=c, local_len=s_loc)
                    cs[0] = cs[0].at[li].set(ckl)
                    cs[1] = cs[1].at[li].set(cvl)
                    lloc = jnp.clip(lengths + 1 - c * s_loc, 0, s_loc)
                    # The cp subgroup's devices hold DISJOINT q-head sets
                    # but share one kv head; an elementwise merge is only
                    # meaningful over a COMMON head set. Gather the
                    # subgroup's q heads (tiny [B, hl, D] payload), compute
                    # partials for the union over the local shard (same
                    # total FLOPs: cp x heads over S/cp positions), merge,
                    # then keep this device's slice.
                    hl = q.shape[2]
                    qg = jax.lax.all_gather(q[:, 0], "cp", axis=1,
                                            tiled=True)   # [B, cp*hl, D]
                    acc, m, l = decode_attention_partial(
                        qg, ckl, cvl, slots, lloc,
                        num_heads=qg.shape[1])
                    # log-sum-exp merge across the cp subgroup: tiny
                    # [B, cp*hl(, D)] payloads over neighbor links
                    m_g = jax.lax.pmax(m, "cp")
                    w = jnp.exp(m - m_g)
                    l_g = jax.lax.psum(l * w, "cp")
                    acc_g = jax.lax.psum(acc * w[..., None], "cp")
                    out = acc_g / jnp.maximum(l_g, 1e-30)[..., None]
                    out = jax.lax.dynamic_slice_in_dim(out, c * hl, hl,
                                                       axis=1)
                    return out.astype(q.dtype)[:, None]

                return attend, lengths[:, None]
        else:
            def make_attend(cs, ex):
                from ..serving.kv_cache import (
                    append_token, append_token_ring, decode_attention,
                    ring_decode_attention)
                slots, lengths = ex
                append = append_token_ring if ring else append_token

                def attend(li, q, k, v):
                    ckl, cvl = append(cs[0][li], cs[1][li], slots,
                                      lengths, k[:, 0], v[:, 0])
                    cs[0] = cs[0].at[li].set(ckl)
                    cs[1] = cs[1].at[li].set(cvl)
                    if ring:
                        return ring_decode_attention(
                            q[:, 0], ckl, cvl, slots, lengths + 1,
                            num_heads=q.shape[2],
                            window=self.cfg.sliding_window)[:, None]
                    return decode_attention(
                        q[:, 0], ckl, cvl, slots, lengths + 1,
                        num_heads=q.shape[2],
                        window=self.cfg.sliding_window)[:, None]

                return attend, lengths[:, None]

        kv = self._kv_spec
        return self._sharded_decode(x, (caches_k, caches_v), (kv, kv),
                                    (slots, lengths), make_attend, T=1)

    def _no_swa(self, name):
        if self.cfg.sliding_window is not None:
            raise NotImplementedError(
                f"{name} does not implement sliding-window attention "
                f"(sliding_window={self.cfg.sliding_window})")

    def _no_cp(self, name):
        if self.context_parallel:
            raise NotImplementedError(
                f"{name} does not support context_parallel yet — cp mode "
                f"covers every slot-cache serving path (prefill, "
                f"decode_step/chunk, float + int8 KV); run with "
                f"context_parallel=False for the paged variants")

    def decode_chunk(self, x, caches_k, caches_v, slots, lengths, *,
                     ring: bool = False):
        """TP twin of QuantLlama.decode_chunk: append T tokens per slot in
        one sharded pass (chunked prefill / speculative verify under TP).
        x [B, T, H]; local projections run at M=B*T so each device streams
        its weight shard once per chunk."""
        self._check_ring(ring)
        T = x.shape[1]

        if self.context_parallel:
            def make_attend(cs, ex):
                from ..serving.kv_cache import (append_chunk_cp,
                                                chunk_attention_partial)
                slots, lengths = ex

                def attend(li, q, k, v):
                    c = jax.lax.axis_index("cp")
                    s_loc = cs[0].shape[2]
                    ckl, cvl = append_chunk_cp(
                        cs[0][li], cs[1][li], slots, lengths, k, v,
                        cp_index=c, local_len=s_loc)
                    cs[0] = cs[0].at[li].set(ckl)
                    cs[1] = cs[1].at[li].set(cvl)
                    # per-query causal limit, clipped to this shard
                    limit = (lengths[:, None]
                             + jnp.arange(T, dtype=lengths.dtype) + 1)
                    lloc = jnp.clip(limit - c * s_loc, 0, s_loc)
                    # merge partners need a COMMON q-head set (see
                    # decode_step): gather the subgroup's heads, merge,
                    # keep this device's slice.
                    hl = q.shape[2]
                    qg = jax.lax.all_gather(q, "cp", axis=2, tiled=True)
                    acc, m, l = chunk_attention_partial(
                        qg, ckl, cvl, slots, lloc,
                        num_heads=qg.shape[2])
                    m_g = jax.lax.pmax(m, "cp")
                    w = jnp.exp(m - m_g)
                    l_g = jax.lax.psum(l * w, "cp")
                    acc_g = jax.lax.psum(acc * w[..., None], "cp")
                    out = acc_g / jnp.maximum(l_g, 1e-30)[..., None]
                    out = jax.lax.dynamic_slice_in_dim(out, c * hl, hl,
                                                       axis=2)
                    return out.astype(q.dtype)

                positions = lengths[:, None] + jnp.arange(
                    T, dtype=lengths.dtype)
                return attend, positions
        else:
            def make_attend(cs, ex):
                from ..serving.kv_cache import (
                    append_chunk, append_chunk_ring, chunk_attention,
                    ring_chunk_attention)
                slots, lengths = ex
                append = append_chunk_ring if ring else append_chunk

                def attend(li, q, k, v):
                    ckl, cvl = append(cs[0][li], cs[1][li], slots,
                                      lengths, k, v)
                    cs[0] = cs[0].at[li].set(ckl)
                    cs[1] = cs[1].at[li].set(cvl)
                    if ring:
                        return ring_chunk_attention(
                            q, ckl, cvl, slots, lengths,
                            num_heads=q.shape[2],
                            window=self.cfg.sliding_window)
                    return chunk_attention(q, ckl, cvl, slots, lengths,
                                           num_heads=q.shape[2],
                                           window=self.cfg.sliding_window)

                positions = lengths[:, None] + jnp.arange(
                    T, dtype=lengths.dtype)
                return attend, positions

        kv = self._kv_spec
        return self._sharded_decode(x, (caches_k, caches_v), (kv, kv),
                                    (slots, lengths), make_attend, T=T)

    def decode_chunk_quant(self, x, caches_k, caches_v, scales_k, scales_v,
                           slots, lengths, *, ring: bool = False):
        """TP twin of QuantLlama.decode_chunk_quant: T-token append over
        the kv_heads-sharded int8 cache (codes + scales), chunk-causal
        attention, local projections at M=B*T."""
        self._check_ring(ring)
        T = x.shape[1]

        if self.context_parallel:
            def make_attend(cs, ex):
                from ..serving.kv_cache import (
                    append_chunk_quant_cp, chunk_attention_quant_partial)
                slots, lengths = ex

                def attend(li, q, k, v):
                    c = jax.lax.axis_index("cp")
                    s_loc = cs[0].shape[2]
                    ckl, cvl, skl, svl = append_chunk_quant_cp(
                        cs[0][li], cs[1][li], cs[2][li], cs[3][li], slots,
                        lengths, k, v, cp_index=c, local_len=s_loc)
                    for i, t in enumerate((ckl, cvl, skl, svl)):
                        cs[i] = cs[i].at[li].set(t)
                    limit = (lengths[:, None]
                             + jnp.arange(T, dtype=lengths.dtype) + 1)
                    lloc = jnp.clip(limit - c * s_loc, 0, s_loc)
                    hl = q.shape[2]
                    qg = jax.lax.all_gather(q, "cp", axis=2, tiled=True)
                    acc, m, l = chunk_attention_quant_partial(
                        qg, ckl, cvl, skl, svl, slots, lloc,
                        num_heads=qg.shape[2])
                    m_g = jax.lax.pmax(m, "cp")
                    w = jnp.exp(m - m_g)
                    l_g = jax.lax.psum(l * w, "cp")
                    acc_g = jax.lax.psum(acc * w[..., None], "cp")
                    out = acc_g / jnp.maximum(l_g, 1e-30)[..., None]
                    out = jax.lax.dynamic_slice_in_dim(out, c * hl, hl,
                                                       axis=2)
                    return out.astype(q.dtype)

                positions = lengths[:, None] + jnp.arange(
                    T, dtype=lengths.dtype)
                return attend, positions
        else:
            def make_attend(cs, ex):
                from ..serving.kv_cache import (
                    append_chunk_quant, append_chunk_ring_quant,
                    chunk_attention_quant, ring_chunk_attention_quant)
                slots, lengths = ex
                append = (append_chunk_ring_quant if ring
                          else append_chunk_quant)

                def attend(li, q, k, v):
                    ckl, cvl, skl, svl = append(
                        cs[0][li], cs[1][li], cs[2][li], cs[3][li], slots,
                        lengths, k, v)
                    for i, t in enumerate((ckl, cvl, skl, svl)):
                        cs[i] = cs[i].at[li].set(t)
                    if ring:
                        return ring_chunk_attention_quant(
                            q, ckl, cvl, skl, svl, slots, lengths,
                            num_heads=q.shape[2],
                            window=self.cfg.sliding_window)
                    return chunk_attention_quant(
                        q, ckl, cvl, skl, svl, slots, lengths,
                        num_heads=q.shape[2],
                        window=self.cfg.sliding_window)

                positions = lengths[:, None] + jnp.arange(
                    T, dtype=lengths.dtype)
                return attend, positions

        kv, ks = self._kv_spec, self._ks_spec
        return self._sharded_decode(
            x, (caches_k, caches_v, scales_k, scales_v), (kv, kv, ks, ks),
            (slots, lengths), make_attend, T=T)

    def decode_step_quant(self, x, caches_k, caches_v, scales_k, scales_v,
                          slots, lengths, *, ring: bool = False):
        """decode_step against the int8-quantized KV cache.

        caches [L, slots, S, Hkv, D] int8 + scales [L, slots, S, Hkv] f32,
        both kv_heads-sharded — halves the per-step KV HBM traffic (the
        decode bottleneck at long context) AND the cache footprint, on top
        of the TP sharding. Same two-psums-per-layer collective budget.
        Under context_parallel the int8 codes AND scale planes additionally
        shard their sequence axis (cp + int8 compound: kv_rep * 2x less KV
        HBM per chip than replicated bf16).
        """
        self._check_ring(ring)
        if self.context_parallel:
            def make_attend(cs, ex):
                from ..serving.kv_cache import (
                    append_token_quant_cp, decode_attention_quant_partial)
                slots, lengths = ex

                def attend(li, q, k, v):
                    c = jax.lax.axis_index("cp")
                    s_loc = cs[0].shape[2]
                    ckl, cvl, skl, svl = append_token_quant_cp(
                        cs[0][li], cs[1][li], cs[2][li], cs[3][li], slots,
                        lengths, k[:, 0], v[:, 0], cp_index=c,
                        local_len=s_loc)
                    for i, t in enumerate((ckl, cvl, skl, svl)):
                        cs[i] = cs[i].at[li].set(t)
                    lloc = jnp.clip(lengths + 1 - c * s_loc, 0, s_loc)
                    hl = q.shape[2]
                    qg = jax.lax.all_gather(q[:, 0], "cp", axis=1,
                                            tiled=True)
                    acc, m, l = decode_attention_quant_partial(
                        qg, ckl, cvl, skl, svl, slots, lloc,
                        num_heads=qg.shape[1])
                    m_g = jax.lax.pmax(m, "cp")
                    w = jnp.exp(m - m_g)
                    l_g = jax.lax.psum(l * w, "cp")
                    acc_g = jax.lax.psum(acc * w[..., None], "cp")
                    out = acc_g / jnp.maximum(l_g, 1e-30)[..., None]
                    out = jax.lax.dynamic_slice_in_dim(out, c * hl, hl,
                                                       axis=1)
                    return out.astype(q.dtype)[:, None]

                return attend, lengths[:, None]
        else:
            def make_attend(cs, ex):
                from ..serving.kv_cache import (
                    append_token_quant, append_token_ring_quant,
                    decode_attention_quant, ring_decode_attention_quant)
                slots, lengths = ex
                append = (append_token_ring_quant if ring
                          else append_token_quant)

                def attend(li, q, k, v):
                    ckl, cvl, skl, svl = append(
                        cs[0][li], cs[1][li], cs[2][li], cs[3][li], slots,
                        lengths, k[:, 0], v[:, 0])
                    for i, t in enumerate((ckl, cvl, skl, svl)):
                        cs[i] = cs[i].at[li].set(t)
                    if ring:
                        return ring_decode_attention_quant(
                            q[:, 0], ckl, cvl, skl, svl, slots,
                            lengths + 1, num_heads=q.shape[2],
                            window=self.cfg.sliding_window)[:, None]
                    return decode_attention_quant(
                        q[:, 0], ckl, cvl, skl, svl, slots, lengths + 1,
                        num_heads=q.shape[2],
                        window=self.cfg.sliding_window)[:, None]

                return attend, lengths[:, None]

        kv, ks = self._kv_spec, self._ks_spec
        return self._sharded_decode(
            x, (caches_k, caches_v, scales_k, scales_v), (kv, kv, ks, ks),
            (slots, lengths), make_attend, T=1)

    def decode_step_paged(self, x, caches_k, caches_v, tables, block_rows,
                          offsets, lengths):
        """Paged-cache variant: caches [L, blocks, bs, Hkv, D] sharded on
        kv_heads; tables/block_rows/offsets replicated (host-managed)."""
        self._no_cp("decode_step_paged")
        self._no_swa("decode_step_paged")
        def make_attend(cs, ex):
            from ..serving.kv_cache import (append_token_paged,
                                            decode_attention_paged)
            tables, block_rows, offsets, lengths = ex

            def attend(li, q, k, v):
                ckl, cvl = append_token_paged(cs[0][li], cs[1][li],
                                              block_rows, offsets,
                                              k[:, 0], v[:, 0])
                cs[0] = cs[0].at[li].set(ckl)
                cs[1] = cs[1].at[li].set(cvl)
                return decode_attention_paged(
                    q[:, 0], ckl, cvl, tables, lengths + 1,
                    num_heads=q.shape[2])[:, None]

            return attend, lengths[:, None]

        kv = self._kv_spec
        return self._sharded_decode(
            x, (caches_k, caches_v), (kv, kv),
            (tables, block_rows, offsets, lengths), make_attend, T=1)

    def decode_step_paged_quant(self, x, caches_k, caches_v, scales_k,
                                scales_v, tables, block_rows, offsets,
                                lengths):
        """Paged + int8-quantized cache: codes [L, blocks, bs, Hkv, D] and
        scale planes [L, blocks, bs, Hkv], both kv_heads-sharded."""
        self._no_cp("decode_step_paged_quant")
        self._no_swa("decode_step_paged_quant")
        def make_attend(cs, ex):
            from ..serving.kv_cache import (append_token_paged_quant,
                                            decode_attention_paged_quant)
            tables, block_rows, offsets, lengths = ex

            def attend(li, q, k, v):
                ckl, cvl, skl, svl = append_token_paged_quant(
                    cs[0][li], cs[1][li], cs[2][li], cs[3][li], block_rows,
                    offsets, k[:, 0], v[:, 0])
                for i, t in enumerate((ckl, cvl, skl, svl)):
                    cs[i] = cs[i].at[li].set(t)
                return decode_attention_paged_quant(
                    q[:, 0], ckl, cvl, skl, svl, tables, lengths + 1,
                    num_heads=q.shape[2])[:, None]

            return attend, lengths[:, None]

        kv, ks = self._kv_spec, self._ks_spec
        return self._sharded_decode(
            x, (caches_k, caches_v, scales_k, scales_v), (kv, kv, ks, ks),
            (tables, block_rows, offsets, lengths), make_attend, T=1)

    # -- prefill ----------------------------------------------------------------
    def make_prefill(self, seq_len: int):
        """Replicated-activation prefill through the TP projections; returns
        full (unsharded) per-layer K/V — the engine's sharded cache write
        re-shards them once. Same _tp_decode_layers body; the attend is
        in-context causal attention over the local heads, collecting each
        layer's K/V for the cache."""
        cfg = self.cfg

        def prefill(x, positions):
            B, S, _ = x.shape
            kern = {name: self._kernel(name, B * S)
                    for name in _FUSED}

            def device_prefill(x, positions, *flat):
                import math as _math
                ks, vs = [], []
                dtype = x.dtype

                def attend(li, q, k, v):
                    ks.append(k[0])
                    vs.append(v[0])
                    group = q.shape[2] // k.shape[2]
                    k_ = jnp.repeat(k, group, axis=2)
                    v_ = jnp.repeat(v, group, axis=2)
                    s = jnp.einsum("bqhd,bkhd->bhqk",
                                   q.astype(jnp.float32),
                                   k_.astype(jnp.float32)) \
                        / _math.sqrt(cfg.head_dim)
                    qi = jnp.arange(S)[:, None]
                    kj = jnp.arange(S)[None, :]
                    keep = qi >= kj
                    if cfg.sliding_window is not None:
                        keep = keep & (kj > qi - cfg.sliding_window)
                    s = jnp.where(keep, s, -1e30)
                    p = jax.nn.softmax(s, axis=-1)
                    return jnp.einsum("bhqk,bkhd->bqhd", p,
                                      v_.astype(jnp.float32)).astype(dtype)

                x = self._tp_decode_layers(x, flat, kern, positions,
                                           attend, B, S)
                # gather local-head K/V to full heads for the cache write;
                # under cp the gather runs over the composite axes (eff
                # heads arrive in device order) and every kv_rep-th eff
                # head is a distinct SOURCE head — the cache stores source
                # heads only (eff head j = source j // kv_rep).
                gax = self.psum_axes
                ks = [jax.lax.all_gather(k, gax, axis=1,
                                         tiled=True)[:, ::self.kv_rep]
                      if self.context_parallel else
                      jax.lax.all_gather(k, gax, axis=1, tiled=True)
                      for k in ks]
                vs = [jax.lax.all_gather(v, gax, axis=1,
                                         tiled=True)[:, ::self.kv_rep]
                      if self.context_parallel else
                      jax.lax.all_gather(v, gax, axis=1, tiled=True)
                      for v in vs]
                return x, ks, vs

            flat, w_specs = self._flat_weights()
            nl = cfg.num_layers
            sm = shard_map(
                device_prefill, mesh=self.smesh,
                in_specs=(P(), P(), *w_specs),
                out_specs=(P(), [P()] * nl, [P()] * nl), check_vma=False)
            return sm(x, positions, *flat)

        return prefill
