"""Quantized Llama-style decoder built on the fused dequant kernels.

The reference serves GPTQ llama checkpoints through integrations
(integration/pytorch, vLLM); here the model family is in-tree: RMSNorm +
RoPE + GQA attention (Pallas flash kernel for prefill) + SwiGLU MLP, with
every weight matrix a W_UINT4(A_FP16/BF16, grouped scales+zeros) fused
matmul. Used by the e2e benchmarks and the graft entrypoints.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.flash import make_flash_attention
from ..ops.matmul import Matmul
from ..ops.matmul_config import MatmulConfig
from ..quantization import packing
from ..testing import random_reference_operands


@dataclass
class LlamaConfig:
    hidden_size: int = 2048
    intermediate_size: int = 5632
    num_heads: int = 16
    num_kv_heads: int = 16
    num_layers: int = 2
    vocab_size: int = 32000
    group_size: int = 128
    act_dtype: str = "float16"
    rope_theta: float = 10000.0
    # HF llama3-style rope scaling dict ({"rope_type": "llama3", "factor",
    # "low_freq_factor", "high_freq_factor",
    # "original_max_position_embeddings"}) or None. Llama-3.1+ checkpoints
    # need this or long-context logits drift from the source model.
    rope_scaling: Optional[dict] = None
    # Sliding-window attention width (Mistral/Mixtral-v0.1 checkpoints set
    # 4096): each query attends only to the last `sliding_window` keys.
    # None = full causal. Covered paths: __call__/perplexity, prefill
    # (banded flash walk), decode_step/decode_chunk/decode_step_paged
    # (float AND int8-KV; slot flash kernels take a window lower bound,
    # paged attends via the masked XLA gather), non-cp TP. The TP paged
    # and context-parallel paths raise loudly rather than silently
    # attending beyond the window.
    sliding_window: Optional[int] = None
    # Qwen2-family checkpoints carry biases on the q/k/v projections
    # (HF config.attention_bias); o/gate/up/down stay bias-free.
    attention_bias: bool = False
    # RMSNorm epsilon. HF llama-family checkpoints carry rms_norm_eps
    # (usually 1e-6 or 1e-5); the importers set it — a mismatched eps is
    # a small but real convention drift vs the source model. The in-repo
    # random-fixture default stays 1e-5 (committed engine-equivalence
    # fixtures were tuned against it).
    rms_norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def rope_arg(self):
        """What `rope()` takes: plain theta, or the llama3-scaled
        inverse-frequency table when rope_scaling is set."""
        if not self.rope_scaling:
            return self.rope_theta
        return llama3_scaled_freqs(self.rope_theta, self.head_dim,
                                   self.rope_scaling)


def llama3_scaled_freqs(theta: float, head_dim: int,
                        scaling: dict) -> np.ndarray:
    """Llama-3.1 rope scaling (HF transformers
    `_compute_llama3_parameters`): inverse frequencies below the
    high-frequency wavelength keep their value, those above the
    low-frequency wavelength divide by `factor`, and the band between
    interpolates smoothly. Returns [head_dim // 2] float32."""
    rt = scaling.get("rope_type", scaling.get("type", "llama3"))
    if rt != "llama3":
        raise ValueError(f"unsupported rope_scaling type {rt!r} "
                         f"(only 'llama3' is implemented)")
    half = head_dim // 2
    inv = theta ** (-np.arange(half, dtype=np.float64) / half)
    factor = float(scaling["factor"])
    lo = float(scaling.get("low_freq_factor", 1.0))
    hi = float(scaling.get("high_freq_factor", 4.0))
    orig = float(scaling.get("original_max_position_embeddings", 8192))
    wavelen = 2.0 * np.pi / inv
    scaled = np.where(wavelen > orig / lo, inv / factor, inv)
    smooth = (orig / wavelen - lo) / (hi - lo)
    smoothed = (1.0 - smooth) / factor * inv + smooth * inv
    is_mid = (wavelen <= orig / lo) & (wavelen >= orig / hi)
    return np.where(is_mid, smoothed, scaled).astype(np.float32)


_PROJS = (("q", "hidden_size", "hidden_size"),
          ("k", "hidden_size", "kv_size"),
          ("v", "hidden_size", "kv_size"),
          ("o", "hidden_size", "hidden_size"),
          ("gate", "hidden_size", "intermediate_size"),
          ("up", "hidden_size", "intermediate_size"),
          ("down", "intermediate_size", "hidden_size"))


def _dim(cfg: LlamaConfig, name: str) -> int:
    if name == "kv_size":
        return cfg.num_kv_heads * cfg.head_dim
    return getattr(cfg, name)


class QuantLlamaLayer:
    """One decoder layer; all 7 projections are fused uint4 matmuls."""

    def __init__(self, cfg: LlamaConfig, opt_m=(1, 16, 256),
                 enable_tuning: bool = False, seed: int = 0):
        self.cfg = cfg
        self.ops: Dict[str, Matmul] = {}
        self.weights: Dict[str, tuple] = {}
        rng = np.random.default_rng(seed)
        # fp biases for the q/k/v projections (Qwen2-style); applied in
        # proj() so every serving path (prefill/decode/chunk/paged) gets
        # them through the one shared projection hook.
        self.biases: Dict[str, Optional[jnp.ndarray]] = {}
        for name, kin, kout in _PROJS:
            K, N = _dim(cfg, kin), _dim(cfg, kout)
            # Real GPTQ layout: uint4 codes with zero point 8 (uncentered
            # codes would bias every output and blow up the residual stream
            # within a few decode steps).
            mcfg = MatmulConfig(M=list(opt_m), N=N, K=K,
                                A_dtype=cfg.act_dtype, W_dtype="uint4",
                                with_scaling=True, with_zeros=True,
                                zeros_mode="original",
                                group_size=cfg.group_size,
                                out_dtype=cfg.act_dtype)
            op = Matmul(mcfg, enable_tuning=enable_tuning)
            codes = rng.integers(0, 16, (N, K)).astype(np.int8)
            # Scale chosen so the random-weight residual dynamics stay
            # CONTRACTIVE: XLA:CPU multithreaded reductions are not
            # bit-deterministic run-to-run, and with expanding dynamics a
            # 1-ulp difference amplifies ~30%/step through decode loops,
            # flaking any engine-equivalence test. (Real checkpoints are
            # trained to be stable; this fixture must be too.)
            scales = (rng.standard_normal((N, K // cfg.group_size)) * 0.0002
                      + 0.001).astype(np.float16)
            zeros = np.full((N, K // cfg.group_size), 8.0, np.float16)
            W, S, Z = op.transform_weight(codes, scale=scales, zeros=zeros)
            self.ops[name] = op
            self.weights[name] = (W, S, Z)
            if cfg.attention_bias and name in ("q", "k", "v"):
                self.biases[name] = jnp.zeros((N,), jnp.float32)
        self.attn_norm = jnp.ones((cfg.hidden_size,), jnp.float32)
        self.mlp_norm = jnp.ones((cfg.hidden_size,), jnp.float32)

    def proj(self, name: str, x: jnp.ndarray) -> jnp.ndarray:
        W, S, Z = self.weights[name]
        out = self.ops[name].forward(x, W, scale=S, zeros=Z)
        b = self.biases.get(name)
        if b is not None:
            out = (out.astype(jnp.float32) + b).astype(out.dtype)
        return out

    def state_dict(self) -> Dict[str, jnp.ndarray]:
        out = {}
        for name, (W, S, Z) in self.weights.items():
            out[f"{name}.qweight"] = W
            out[f"{name}.scales"] = S
            out[f"{name}.zeros"] = Z
        for name, b in self.biases.items():
            out[f"{name}.bias"] = b
        out["attn_norm"] = self.attn_norm
        out["mlp_norm"] = self.mlp_norm
        return out

    def load_state_dict(self, state: Dict[str, jnp.ndarray]) -> None:
        # reset FIRST: loading a bias-free state into a layer that held
        # biases must not keep applying the stale ones (r5 review)
        self.biases = {}
        for name in self.weights:
            self.weights[name] = (jnp.asarray(state[f"{name}.qweight"]),
                                  jnp.asarray(state[f"{name}.scales"]),
                                  jnp.asarray(state[f"{name}.zeros"]))
            if f"{name}.bias" in state:
                self.biases[name] = jnp.asarray(state[f"{name}.bias"])
        self.attn_norm = jnp.asarray(state["attn_norm"])
        self.mlp_norm = jnp.asarray(state["mlp_norm"])


def rmsnorm(x: jnp.ndarray, w: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * w).astype(x.dtype)


def rope(x: jnp.ndarray, positions: jnp.ndarray, theta) -> jnp.ndarray:
    """x [B, S, H, D]; rotate pairs (d, d + D/2). `theta` is a float base
    or a precomputed inverse-frequency table [D//2] (cfg.rope_arg —
    llama3 rope scaling)."""
    B, S, H, D = x.shape
    half = D // 2
    if np.ndim(theta) == 0:   # scalar base (python OR numpy scalar)
        freqs = jnp.float32(theta) ** (
            -jnp.arange(0, half, dtype=jnp.float32) / half)
    else:
        freqs = jnp.asarray(theta, jnp.float32)
    ang = positions.astype(jnp.float32)[:, :, None] * freqs  # [B, S, half]
    cos = jnp.cos(ang)[:, :, None, :]
    sin = jnp.sin(ang)[:, :, None, :]
    x1, x2 = x[..., :half].astype(jnp.float32), x[..., half:].astype(jnp.float32)
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.astype(x.dtype)



def _layer_mlp(layer, h: "jnp.ndarray") -> "jnp.ndarray":
    """The decoder's MLP block behind a duck-typed hook: layers exposing
    `mlp_forward` (e.g. a routed MoE FFN, models/quant_moe.QuantMixtralLayer)
    own the whole block; plain llama layers run the SwiGLU projections.
    h [..., hidden] -> [..., hidden] (MoE impls take 2D, so flatten)."""
    if hasattr(layer, "mlp_forward"):
        lead = h.shape[:-1]
        out = layer.mlp_forward(h.reshape(-1, h.shape[-1]))
        return out.reshape(*lead, -1)
    gate = layer.proj("gate", h)
    up = layer.proj("up", h)
    act = (jax.nn.silu(gate.astype(jnp.float32))
           * up.astype(jnp.float32)).astype(h.dtype)
    return layer.proj("down", act)


def layer_forward(layer: QuantLlamaLayer, x: jnp.ndarray,
                  positions: jnp.ndarray, *, causal: bool = True,
                  flash: Optional[callable] = None,
                  return_kv: bool = False,
                  window: Optional[int] = None):
    """x [B, S, hidden] -> [B, S, hidden] (optionally also rope-applied K/V
    [B, S, Hkv, D] for KV-cache prefill). `window`: sliding-window width
    (HF convention: query i attends keys (i - window, i])."""
    cfg = layer.cfg
    B, S, _ = x.shape
    h = rmsnorm(x, layer.attn_norm, layer.cfg.rms_norm_eps)
    q = layer.proj("q", h).reshape(B, S, cfg.num_heads, cfg.head_dim)
    k = layer.proj("k", h).reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
    v = layer.proj("v", h).reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
    q = rope(q, positions, cfg.rope_arg)
    k = rope(k, positions, cfg.rope_arg)
    kv_out = (k, v) if return_kv else None
    if flash is not None:
        if window is not None:
            # the prefill flash kernel has no window lower bound — a
            # silent full-causal run is the failure mode _swa_guard exists
            # to prevent (make_prefill routes SWA to the naive branch)
            raise NotImplementedError(
                "layer_forward: flash + sliding window is not supported; "
                "pass flash=None for windowed attention")
        attn = flash(q, k, v)
    else:
        group = cfg.num_heads // cfg.num_kv_heads
        k_ = jnp.repeat(k, group, axis=2)
        v_ = jnp.repeat(v, group, axis=2)
        s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                       k_.astype(jnp.float32)) / math.sqrt(cfg.head_dim)
        if causal:
            qi = jnp.arange(S)[:, None]
            kj = jnp.arange(S)[None, :]
            keep = qi >= kj
            if window is not None:
                keep = keep & (kj > qi - window)
            s = jnp.where(keep, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", p,
                          v_.astype(jnp.float32)).astype(x.dtype)
    attn = attn.reshape(B, S, cfg.hidden_size)
    x = x + layer.proj("o", attn)
    h = rmsnorm(x, layer.mlp_norm, layer.cfg.rms_norm_eps)
    x = x + _layer_mlp(layer, h)
    if return_kv:
        return x, kv_out[0], kv_out[1]
    return x


class DecoderServingMixin:
    """Serving hooks for any llama-topology decoder stack whose layers
    duck-type QuantLlamaLayer (`cfg`, `layers`, `layer.proj(name, x)`,
    `layer.attn_norm/mlp_norm`): forward, prefill, single-token decode,
    multi-token chunk append, paged decode, and their int8-KV twins.
    QuantLlama (uint4 GPTQ) and models.bitnet.BitNetLlama (W2A8) share
    these, so every engine, `generate`, and the speculative paths work for
    both — e.g. a BitNet draft speculating for a uint4 target."""

    def __call__(self, x: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
        for layer in self.layers:
            x = layer_forward(layer, x, positions,
                              window=self.cfg.sliding_window)
        return x

    def make_prefill(self, seq_len: int):
        """Returns fn(x [1, S, H], positions) -> (hidden, ks, vs) where
        ks/vs are per-layer rope-applied K/V [S, Hkv, D] for the KV cache.

        Long prompts attend through the Pallas flash kernel (O(S) memory,
        MXU-rate online softmax); short ones keep the naive path (flash
        block overheads dominate below ~256 tokens)."""
        cfg = self.cfg
        flash = None
        if seq_len >= 256 and seq_len % 128 == 0:
            from ..tuner import get_arch
            from ..tuner.curated import flash_block_hint
            bq, bkv = flash_block_hint(seq_len, cfg.head_dim, True)
            try:
                flash = make_flash_attention(
                    batch=1, heads=cfg.num_heads, seq_len=seq_len,
                    dim=cfg.head_dim, kv_heads=cfg.num_kv_heads,
                    causal=True, block_q=bq, block_kv=bkv,
                    out_dtype=jnp.dtype(cfg.act_dtype),
                    window=cfg.sliding_window,   # banded walk when set
                    interpret=get_arch().is_cpu)
            except ValueError:
                # untileable geometry (e.g. head_dim % 128 on the chip) —
                # the masked naive branch serves it (r5 review: the old
                # SWA early-return used to shield this; now explicit)
                flash = None

        # window=None below when flash is set: the window is baked into
        # the banded flash walk; the naive branch (short prompts / odd
        # dims) masks it explicitly.
        naive_window = cfg.sliding_window if flash is None else None

        def prefill(x, positions):
            ks, vs = [], []
            for layer in self.layers:
                x, k, v = layer_forward(layer, x, positions, flash=flash,
                                        return_kv=True,
                                        window=naive_window)
                ks.append(k[0])
                vs.append(v[0])
            return x, ks, vs

        return prefill

    def decode_step(self, x: jnp.ndarray, caches_k: jnp.ndarray,
                    caches_v: jnp.ndarray, slots: jnp.ndarray,
                    lengths: jnp.ndarray, *, ring: bool = False):
        """One-token decode across B slots.

        x [B, 1, H]; caches_k/v [L, slots, Lmax, Hkv, D]; lengths [B] =
        tokens already in each slot's cache. Returns (hidden [B, 1, H],
        caches_k, caches_v) with the new token appended at position
        lengths[b].

        ring=True: caches are window-sized rolling buffers
        ([L, slots, R, Hkv, D], kv_cache.init_ring_kv_cache) — the token
        lands in ring row lengths[b] % R and attention masks on derived
        absolute positions. Requires cfg.sliding_window.
        """
        from ..serving.kv_cache import (append_token, append_token_ring,
                                        decode_attention,
                                        ring_decode_attention)

        cfg = self.cfg
        if ring and cfg.sliding_window is None:
            raise ValueError("ring cache requires cfg.sliding_window")
        append = append_token_ring if ring else append_token
        attend = ring_decode_attention if ring else decode_attention
        B = x.shape[0]
        positions = lengths[:, None]  # [B, 1] — new token index
        for li, layer in enumerate(self.layers):
            h = rmsnorm(x, layer.attn_norm, layer.cfg.rms_norm_eps)
            h2 = h.reshape(B, cfg.hidden_size)
            q = layer.proj("q", h2).reshape(B, 1, cfg.num_heads, cfg.head_dim)
            k = layer.proj("k", h2).reshape(B, 1, cfg.num_kv_heads,
                                            cfg.head_dim)
            v = layer.proj("v", h2).reshape(B, 1, cfg.num_kv_heads,
                                            cfg.head_dim)
            q = rope(q, positions, cfg.rope_arg)[:, 0]      # [B, H, D]
            k = rope(k, positions, cfg.rope_arg)[:, 0]      # [B, Hkv, D]
            v = v[:, 0]
            ck, cv = append(caches_k[li], caches_v[li], slots, lengths,
                            k, v)
            caches_k = caches_k.at[li].set(ck)
            caches_v = caches_v.at[li].set(cv)
            attn = attend(q, ck, cv, slots, lengths + 1,
                          num_heads=cfg.num_heads,
                          window=cfg.sliding_window)
            attn = attn.reshape(B, cfg.hidden_size)
            x = x + layer.proj("o", attn)[:, None, :]
            h = rmsnorm(x, layer.mlp_norm, layer.cfg.rms_norm_eps)
            h2 = h.reshape(B, cfg.hidden_size)
            x = x + _layer_mlp(layer, h2)[:, None, :]
        return x, caches_k, caches_v

    def decode_chunk(self, x: jnp.ndarray, caches_k: jnp.ndarray,
                     caches_v: jnp.ndarray, slots: jnp.ndarray,
                     lengths: jnp.ndarray, *, ring: bool = False):
        """Append T tokens per slot in ONE pass (chunked prefill /
        speculative-verify building block).

        x [B, T, H]; caches as in decode_step; lengths [B] = tokens already
        cached per slot. Token i lands at position lengths[b]+i and attends
        its prefix plus chunk tokens <= i (causal within the chunk). Returns
        (hidden [B, T, H], caches_k, caches_v). T=1 degenerates to
        decode_step's math; the projections run at M=B*T so the quantized
        weights stream from HBM once per CHUNK, not once per token — the
        whole point of batching decode-side work on TPU.

        ring=True: window-sized rolling-buffer caches (see decode_step);
        requires R >= window + T - 1 (checked at trace time).
        """
        from ..serving.kv_cache import (append_chunk, append_chunk_ring,
                                        chunk_attention,
                                        ring_chunk_attention)

        cfg = self.cfg
        if ring and cfg.sliding_window is None:
            raise ValueError("ring cache requires cfg.sliding_window")
        append = append_chunk_ring if ring else append_chunk
        attend = ring_chunk_attention if ring else chunk_attention
        B, T, _ = x.shape
        positions = lengths[:, None] + jnp.arange(T, dtype=lengths.dtype)
        for li, layer in enumerate(self.layers):
            h = rmsnorm(x, layer.attn_norm, layer.cfg.rms_norm_eps)
            h2 = h.reshape(B * T, cfg.hidden_size)
            q = layer.proj("q", h2).reshape(B, T, cfg.num_heads,
                                            cfg.head_dim)
            k = layer.proj("k", h2).reshape(B, T, cfg.num_kv_heads,
                                            cfg.head_dim)
            v = layer.proj("v", h2).reshape(B, T, cfg.num_kv_heads,
                                            cfg.head_dim)
            q = rope(q, positions, cfg.rope_arg)
            k = rope(k, positions, cfg.rope_arg)
            ck, cv = append(caches_k[li], caches_v[li], slots, lengths,
                            k, v)
            caches_k = caches_k.at[li].set(ck)
            caches_v = caches_v.at[li].set(cv)
            attn = attend(q, ck, cv, slots, lengths,
                          num_heads=cfg.num_heads,
                          window=cfg.sliding_window)
            attn = attn.reshape(B * T, cfg.hidden_size)
            x = x + layer.proj("o", attn).reshape(B, T, cfg.hidden_size)
            h = rmsnorm(x, layer.mlp_norm, layer.cfg.rms_norm_eps)
            h2 = h.reshape(B * T, cfg.hidden_size)
            x = x + _layer_mlp(layer, h2).reshape(B, T, cfg.hidden_size)
        return x, caches_k, caches_v

    def decode_chunk_quant(self, x: jnp.ndarray, caches_k: jnp.ndarray,
                           caches_v: jnp.ndarray, scales_k: jnp.ndarray,
                           scales_v: jnp.ndarray, slots: jnp.ndarray,
                           lengths: jnp.ndarray, *, ring: bool = False):
        """decode_chunk against the int8-quantized KV cache (codes +
        per-(token, head) scales, kv_cache.py quantized section). Returns
        (hidden [B, T, H], caches_k, caches_v, scales_k, scales_v).
        ring=True: window-sized int8 rolling buffers (see decode_chunk)."""
        from ..serving.kv_cache import (append_chunk_quant,
                                        append_chunk_ring_quant,
                                        chunk_attention_quant,
                                        ring_chunk_attention_quant)

        cfg = self.cfg
        if ring and cfg.sliding_window is None:
            raise ValueError("ring cache requires cfg.sliding_window")
        append = append_chunk_ring_quant if ring else append_chunk_quant
        attend = ring_chunk_attention_quant if ring else chunk_attention_quant
        B, T, _ = x.shape
        positions = lengths[:, None] + jnp.arange(T, dtype=lengths.dtype)
        for li, layer in enumerate(self.layers):
            h = rmsnorm(x, layer.attn_norm, layer.cfg.rms_norm_eps)
            h2 = h.reshape(B * T, cfg.hidden_size)
            q = layer.proj("q", h2).reshape(B, T, cfg.num_heads,
                                            cfg.head_dim)
            k = layer.proj("k", h2).reshape(B, T, cfg.num_kv_heads,
                                            cfg.head_dim)
            v = layer.proj("v", h2).reshape(B, T, cfg.num_kv_heads,
                                            cfg.head_dim)
            q = rope(q, positions, cfg.rope_arg)
            k = rope(k, positions, cfg.rope_arg)
            ck, cv, sk, sv = append(
                caches_k[li], caches_v[li], scales_k[li], scales_v[li],
                slots, lengths, k, v)
            caches_k = caches_k.at[li].set(ck)
            caches_v = caches_v.at[li].set(cv)
            scales_k = scales_k.at[li].set(sk)
            scales_v = scales_v.at[li].set(sv)
            attn = attend(q, ck, cv, sk, sv, slots, lengths,
                          num_heads=cfg.num_heads,
                          window=cfg.sliding_window)
            attn = attn.reshape(B * T, cfg.hidden_size)
            x = x + layer.proj("o", attn).reshape(B, T, cfg.hidden_size)
            h = rmsnorm(x, layer.mlp_norm, layer.cfg.rms_norm_eps)
            h2 = h.reshape(B * T, cfg.hidden_size)
            x = x + _layer_mlp(layer, h2).reshape(B, T, cfg.hidden_size)
        return x, caches_k, caches_v, scales_k, scales_v

    def decode_step_quant(self, x: jnp.ndarray, caches_k: jnp.ndarray,
                          caches_v: jnp.ndarray, scales_k: jnp.ndarray,
                          scales_v: jnp.ndarray, slots: jnp.ndarray,
                          lengths: jnp.ndarray, *, ring: bool = False):
        """decode_step against the int8-quantized KV cache.

        caches_k/v [L, slots, Lmax, Hkv, D] int8; scales_k/v
        [L, slots, Lmax, Hkv] f32 (serving/kv_cache.py quantized cache —
        halves KV HBM traffic and footprint vs bf16; decode attention is
        KV-bandwidth-bound). Returns (hidden, ck, cv, sk, sv).

        ring=True: window-sized int8 rolling buffers
        (init_ring_quant_kv_cache); requires cfg.sliding_window.
        """
        from ..serving.kv_cache import (append_token_quant,
                                        append_token_ring_quant,
                                        decode_attention_quant,
                                        ring_decode_attention_quant)

        cfg = self.cfg
        if ring and cfg.sliding_window is None:
            raise ValueError("ring cache requires cfg.sliding_window")
        append = append_token_ring_quant if ring else append_token_quant
        attend = (ring_decode_attention_quant if ring
                  else decode_attention_quant)
        B = x.shape[0]
        positions = lengths[:, None]
        for li, layer in enumerate(self.layers):
            h = rmsnorm(x, layer.attn_norm, layer.cfg.rms_norm_eps)
            h2 = h.reshape(B, cfg.hidden_size)
            q = layer.proj("q", h2).reshape(B, 1, cfg.num_heads, cfg.head_dim)
            k = layer.proj("k", h2).reshape(B, 1, cfg.num_kv_heads,
                                            cfg.head_dim)
            v = layer.proj("v", h2).reshape(B, 1, cfg.num_kv_heads,
                                            cfg.head_dim)
            q = rope(q, positions, cfg.rope_arg)[:, 0]
            k = rope(k, positions, cfg.rope_arg)[:, 0]
            v = v[:, 0]
            ck, cv, sk, sv = append(
                caches_k[li], caches_v[li], scales_k[li], scales_v[li],
                slots, lengths, k, v)
            caches_k = caches_k.at[li].set(ck)
            caches_v = caches_v.at[li].set(cv)
            scales_k = scales_k.at[li].set(sk)
            scales_v = scales_v.at[li].set(sv)
            attn = attend(q, ck, cv, sk, sv, slots, lengths + 1,
                          num_heads=cfg.num_heads,
                          window=cfg.sliding_window)
            attn = attn.reshape(B, cfg.hidden_size)
            x = x + layer.proj("o", attn)[:, None, :]
            h = rmsnorm(x, layer.mlp_norm, layer.cfg.rms_norm_eps)
            h2 = h.reshape(B, cfg.hidden_size)
            x = x + _layer_mlp(layer, h2)[:, None, :]
        return x, caches_k, caches_v, scales_k, scales_v

    def decode_step_paged(self, x: jnp.ndarray, caches_k: jnp.ndarray,
                          caches_v: jnp.ndarray, tables: jnp.ndarray,
                          block_rows: jnp.ndarray, offsets: jnp.ndarray,
                          lengths: jnp.ndarray):
        """One-token decode against the paged KV cache.

        x [B, 1, H]; caches_k/v [L, blocks, bs, Hkv, D]; tables [B, MB]
        physical blocks per request; block_rows/offsets [B] = where the new
        token's K/V lands; lengths [B] = tokens already cached.
        """
        from ..serving.kv_cache import (append_token_paged,
                                        decode_attention_paged)

        cfg = self.cfg
        B = x.shape[0]
        positions = lengths[:, None]
        for li, layer in enumerate(self.layers):
            h = rmsnorm(x, layer.attn_norm, layer.cfg.rms_norm_eps)
            h2 = h.reshape(B, cfg.hidden_size)
            q = layer.proj("q", h2).reshape(B, 1, cfg.num_heads, cfg.head_dim)
            k = layer.proj("k", h2).reshape(B, 1, cfg.num_kv_heads,
                                            cfg.head_dim)
            v = layer.proj("v", h2).reshape(B, 1, cfg.num_kv_heads,
                                            cfg.head_dim)
            q = rope(q, positions, cfg.rope_arg)[:, 0]
            k = rope(k, positions, cfg.rope_arg)[:, 0]
            v = v[:, 0]
            ck, cv = append_token_paged(caches_k[li], caches_v[li],
                                        block_rows, offsets, k, v)
            caches_k = caches_k.at[li].set(ck)
            caches_v = caches_v.at[li].set(cv)
            attn = decode_attention_paged(q, ck, cv, tables, lengths + 1,
                                          num_heads=cfg.num_heads,
                                          window=cfg.sliding_window)
            attn = attn.reshape(B, cfg.hidden_size)
            x = x + layer.proj("o", attn)[:, None, :]
            h = rmsnorm(x, layer.mlp_norm, layer.cfg.rms_norm_eps)
            h2 = h.reshape(B, cfg.hidden_size)
            x = x + _layer_mlp(layer, h2)[:, None, :]
        return x, caches_k, caches_v

    def decode_step_paged_quant(self, x: jnp.ndarray, caches_k: jnp.ndarray,
                                caches_v: jnp.ndarray, scales_k: jnp.ndarray,
                                scales_v: jnp.ndarray, tables: jnp.ndarray,
                                block_rows: jnp.ndarray,
                                offsets: jnp.ndarray, lengths: jnp.ndarray):
        """decode_step_paged against the int8-quantized block pool.

        caches_k/v [L, blocks, bs, Hkv, D] int8; scales_k/v
        [L, blocks, bs, Hkv] f32. Returns (hidden, ck, cv, sk, sv).
        """
        from ..serving.kv_cache import (append_token_paged_quant,
                                        decode_attention_paged_quant)

        cfg = self.cfg
        B = x.shape[0]
        positions = lengths[:, None]
        for li, layer in enumerate(self.layers):
            h = rmsnorm(x, layer.attn_norm, layer.cfg.rms_norm_eps)
            h2 = h.reshape(B, cfg.hidden_size)
            q = layer.proj("q", h2).reshape(B, 1, cfg.num_heads, cfg.head_dim)
            k = layer.proj("k", h2).reshape(B, 1, cfg.num_kv_heads,
                                            cfg.head_dim)
            v = layer.proj("v", h2).reshape(B, 1, cfg.num_kv_heads,
                                            cfg.head_dim)
            q = rope(q, positions, cfg.rope_arg)[:, 0]
            k = rope(k, positions, cfg.rope_arg)[:, 0]
            v = v[:, 0]
            ck, cv, sk, sv = append_token_paged_quant(
                caches_k[li], caches_v[li], scales_k[li], scales_v[li],
                block_rows, offsets, k, v)
            caches_k = caches_k.at[li].set(ck)
            caches_v = caches_v.at[li].set(cv)
            scales_k = scales_k.at[li].set(sk)
            scales_v = scales_v.at[li].set(sv)
            attn = decode_attention_paged_quant(q, ck, cv, sk, sv, tables,
                                                lengths + 1,
                                                num_heads=cfg.num_heads,
                                                window=cfg.sliding_window)
            attn = attn.reshape(B, cfg.hidden_size)
            x = x + layer.proj("o", attn)[:, None, :]
            h = rmsnorm(x, layer.mlp_norm, layer.cfg.rms_norm_eps)
            h2 = h.reshape(B, cfg.hidden_size)
            x = x + _layer_mlp(layer, h2)[:, None, :]
        return x, caches_k, caches_v, scales_k, scales_v


class QuantLlama(DecoderServingMixin):
    """A stack of quantized decoder layers (no embeddings — the benchmark
    and graft entrypoints drive hidden states directly)."""

    def __init__(self, cfg: LlamaConfig, opt_m=(1, 16, 256),
                 enable_tuning: bool = False):
        self.cfg = cfg
        self.layers = [QuantLlamaLayer(cfg, opt_m, enable_tuning, seed=i)
                       for i in range(cfg.num_layers)]

    def state_dict(self) -> Dict[str, Dict[str, jnp.ndarray]]:
        """Checkpoint tree: {"layer_<i>": {tensor: array}} — feeds
        module.checkpoint.save_quant_state{,_orbax}."""
        return {f"layer_{i}": l.state_dict()
                for i, l in enumerate(self.layers)}

    def load_state_dict(self, state) -> None:
        for i, layer in enumerate(self.layers):
            layer.load_state_dict(state[f"layer_{i}"])
