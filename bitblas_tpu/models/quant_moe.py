"""Quantized Mixtral-style MoE FFN on the fused dequant kernels.

The reference (BitBLAS) stops at per-layer GEMMs; MoE models route their
expert FFNs through repeated quantized matmuls (its vLLM/GPTQ
integrations, e.g. integration/pytorch/bitblas_quant_linear.py). Here the
MoE block is in-tree and TPU-first:

* dense GShard-style top-k dispatch — one-hot einsums with a static
  capacity, no ragged control flow, so the whole block jits and shards;
* every expert projection is the fused W_UINT4 A_FP16 grouped matmul
  (kernels/dequant_matmul.py), same device layout as QuantLlama;
* expert parallelism lives in parallel/moe.py: experts shard over an
  "ep" mesh axis under shard_map and outputs join with one psum.

Routing follows the standard top-k-with-capacity formulation (GShard /
Switch): tokens pick their top_k experts by router probability, each
expert takes at most `capacity` tokens (slot-major priority), overflow
tokens fall through with zero contribution from the dropped slot.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.matmul import Matmul
from ..ops.matmul_config import MatmulConfig
from .quant_llama import (DecoderServingMixin as _DecoderServingMixin,
                          LlamaConfig as _LlamaConfig)


@dataclass
class MoEConfig:
    hidden_size: int = 512
    intermediate_size: int = 1024
    n_experts: int = 4
    top_k: int = 2
    capacity_factor: float = 1.5
    group_size: int = 128
    act_dtype: str = "float16"


def moe_capacity(cfg: MoEConfig, tokens: int) -> int:
    """Static per-expert buffer size: ceil(T*k/E * factor), sublane-aligned
    (multiples of 8 keep the expert matmul M Mosaic-legal)."""
    c = int(np.ceil(tokens * cfg.top_k / cfg.n_experts * cfg.capacity_factor))
    return max(8, (c + 7) // 8 * 8)


def dispatch_combine(logits: jnp.ndarray, top_k: int, capacity: int,
                     valid: jnp.ndarray = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Router logits [T, E] -> (dispatch [T, E, C] 0/1, combine [T, E, C]).

    Slot-major priority: all tokens' first choices claim buffer slots
    before any second choice, matching GShard's position_in_expert
    cumsum. Pure one-hot algebra — no scatters, static shapes.

    `valid` [T] bool masks rows out of routing entirely: they claim no
    capacity and contribute nothing. Serving paths batch zero rows
    (inactive engine slots, prefill bucket/chunk padding) alongside real
    tokens; without the mask those rows' first choices outrank real
    tokens' second choices in the cumsum and silently evict them.
    """
    T, E = logits.shape
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    gate_vals, expert_idx = jax.lax.top_k(probs, top_k)      # [T, k]
    gate_vals = gate_vals / jnp.sum(gate_vals, axis=-1, keepdims=True)

    onehot = jax.nn.one_hot(expert_idx, E, dtype=jnp.float32)  # [T, k, E]
    if valid is not None:
        onehot = onehot * valid.astype(jnp.float32)[:, None, None]
    flat = onehot.transpose(1, 0, 2).reshape(T * top_k, E)     # slot-major
    pos = jnp.cumsum(flat, axis=0) - flat                      # [T*k, E]
    pos_in_e = jnp.sum(pos * flat, axis=-1)                    # [T*k]
    fits = (pos_in_e < capacity).astype(jnp.float32)

    disp_flat = flat * fits[:, None]                           # [T*k, E]
    pos_oh = jax.nn.one_hot(pos_in_e.astype(jnp.int32), capacity,
                            dtype=jnp.float32)                 # [T*k, C]
    full = disp_flat[:, :, None] * pos_oh[:, None, :]          # [T*k, E, C]
    gates_flat = gate_vals.transpose(1, 0).reshape(T * top_k)
    dispatch = full.reshape(top_k, T, E, capacity).sum(0)
    combine = (gates_flat[:, None, None] * full).reshape(
        top_k, T, E, capacity).sum(0)
    return dispatch, combine


_EXPERT_PROJS = (("gate", "hidden_size", "intermediate_size"),
                 ("up", "hidden_size", "intermediate_size"),
                 ("down", "intermediate_size", "hidden_size"))


def make_expert_weights(cfg: MoEConfig, seed: int = 0
                        ) -> Dict[str, List[tuple]]:
    """Random per-expert GPTQ-layout operands (codes, scales, zeros) in
    reference layout — contractive scales, zero point 8 (the QuantLlama
    fixture conventions; see models/quant_llama.py)."""
    rng = np.random.default_rng(seed)
    out: Dict[str, List[tuple]] = {}
    for name, kin, kout in _EXPERT_PROJS:
        K, N = getattr(cfg, kin), getattr(cfg, kout)
        g = cfg.group_size
        per = []
        for _ in range(cfg.n_experts):
            codes = rng.integers(0, 16, (N, K)).astype(np.int8)
            scales = (np.abs(rng.standard_normal((N, K // g))) * 0.004
                      + 0.004).astype(np.float16)
            zeros = np.full((N, K // g), 8.0, np.float16)
            per.append((codes, scales, zeros))
        out[name] = per
    return out


class QuantMoELayer:
    """Single-device MoE FFN; `tokens` (T) is static at construction, like
    every shape in this library."""

    def __init__(self, cfg: MoEConfig, tokens: int, *, seed: int = 0,
                 enable_tuning: bool = False):
        self.cfg = cfg
        self.tokens = tokens
        self.capacity = moe_capacity(cfg, tokens)
        rng = np.random.default_rng(seed + 1)
        self.router = jnp.asarray(
            rng.standard_normal((cfg.hidden_size, cfg.n_experts)) * 0.05,
            jnp.float32)
        self.ops: Dict[str, Matmul] = {}
        self.weights: Dict[str, List[tuple]] = {}
        raw = make_expert_weights(cfg, seed)
        self._raw = raw          # reference layouts, kept for the oracle
        for name, kin, kout in _EXPERT_PROJS:
            K, N = getattr(cfg, kin), getattr(cfg, kout)
            mcfg = MatmulConfig(M=self.capacity, N=N, K=K,
                                A_dtype=cfg.act_dtype, W_dtype="uint4",
                                with_scaling=True, with_zeros=True,
                                zeros_mode="original",
                                group_size=cfg.group_size,
                                out_dtype=cfg.act_dtype)
            op = Matmul(mcfg, enable_tuning=enable_tuning)
            self.ops[name] = op
            self.weights[name] = [
                op.transform_weight(codes, scale=s, zeros=z)
                for codes, s, z in raw[name]]

    def _expert_ffn(self, e: int, x: jnp.ndarray) -> jnp.ndarray:
        def proj(name, inp):
            W, S, Z = self.weights[name][e]
            return self.ops[name].forward(inp, W, scale=S, zeros=Z)
        g = proj("gate", x)
        u = proj("up", x)
        h = (jax.nn.silu(g.astype(jnp.float32))
             * u.astype(jnp.float32)).astype(x.dtype)
        return proj("down", h)

    def forward(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [T, H] -> [T, H]. Any static T works: capacity re-derives
        from the call shape (T != self.tokens just hits a different
        Matmul bucket — `tokens` names the primary/tuned size).

        All-zero rows are masked out of routing. This is EXACT, not a
        heuristic: the block has no biases, so a zero input's true output
        is zero regardless of routing — but an unmasked zero row would
        still claim expert capacity and could evict a real token (the
        serving paths batch zero rows: inactive slots, bucket/chunk
        padding)."""
        capacity = (self.capacity if x.shape[0] == self.tokens
                    else moe_capacity(self.cfg, x.shape[0]))
        valid = jnp.any(x != 0, axis=-1)
        logits = x.astype(jnp.float32) @ self.router
        dispatch, combine = dispatch_combine(logits, self.cfg.top_k,
                                             capacity, valid=valid)
        xin = jnp.einsum("tec,th->ech", dispatch.astype(x.dtype), x)
        outs = jnp.stack([self._expert_ffn(e, xin[e])
                          for e in range(self.cfg.n_experts)])
        y = jnp.einsum("tec,ech->th", combine,
                       outs.astype(jnp.float32))
        return y.astype(x.dtype)


def moe_reference(layer: QuantMoELayer, x: jnp.ndarray) -> jnp.ndarray:
    """Oracle: same routing algebra, experts as decoded-weight einsums
    (ops/reference.py semantics) in f32."""
    from ..ops.reference import dequantize_weight
    from ..quantization import packing
    cfg = layer.cfg
    logits = x.astype(jnp.float32) @ layer.router
    dispatch, combine = dispatch_combine(logits, cfg.top_k, layer.capacity,
                                         valid=jnp.any(x != 0, axis=-1))
    xin = jnp.einsum("tec,th->ech", dispatch, x.astype(jnp.float32))
    outs = []
    for e in range(cfg.n_experts):
        ws = {}
        for name, _, _ in _EXPERT_PROJS:
            op = layer.ops[name]
            codes, s, z = layer._raw[name][e]
            ws[name] = dequantize_weight(
                op.config, jnp.asarray(packing.general_compress(codes, 4)),
                jnp.asarray(s), jnp.asarray(z)).astype(jnp.float32)
        g = xin[e] @ ws["gate"].T
        u = xin[e] @ ws["up"].T
        h = jax.nn.silu(g) * u
        outs.append(h @ ws["down"].T)
    y = jnp.einsum("tec,ech->th", combine, jnp.stack(outs))
    return y


# -- Mixtral-style decoder (llama attention + routed MoE FFN) ------------------

@dataclass
class MixtralConfig(_LlamaConfig):
    """LlamaConfig (attention fields, head_dim/rope_arg incl. llama3 rope
    scaling) + the MoE FFN fields, so the decoder serving paths
    (quant_llama.DecoderServingMixin) apply unchanged."""
    n_experts: int = 4
    top_k: int = 2
    capacity_factor: float = 1.5

    def moe_config(self) -> MoEConfig:
        return MoEConfig(hidden_size=self.hidden_size,
                         intermediate_size=self.intermediate_size,
                         n_experts=self.n_experts, top_k=self.top_k,
                         capacity_factor=self.capacity_factor,
                         group_size=self.group_size,
                         act_dtype=self.act_dtype)


class QuantMixtralLayer:
    """One Mixtral decoder layer: llama GQA attention (uint4 fused
    projections, QuantLlamaLayer conventions) + a routed QuantMoELayer FFN
    exposed through the `mlp_forward` duck-type hook
    (quant_llama._layer_mlp)."""

    _ATTN = (("q", "hidden_size", "attn_size"),
             ("k", "hidden_size", "kv_size"),
             ("v", "hidden_size", "kv_size"),
             ("o", "attn_size", "hidden_size"))

    def __init__(self, cfg: MixtralConfig, opt_m=(1, 16, 256), *,
                 seed: int = 0, enable_tuning: bool = False,
                 moe_tokens: int = 256):
        self.cfg = cfg
        rng = np.random.default_rng(seed)
        self.ops: Dict[str, Matmul] = {}
        self.weights: Dict[str, tuple] = {}

        def dim(name):
            if name == "kv_size":
                return cfg.num_kv_heads * cfg.head_dim
            if name == "attn_size":
                return cfg.num_heads * cfg.head_dim
            return getattr(cfg, name)

        for name, kin, kout in self._ATTN:
            K, N = dim(kin), dim(kout)
            mcfg = MatmulConfig(M=list(opt_m), N=N, K=K,
                                A_dtype=cfg.act_dtype, W_dtype="uint4",
                                with_scaling=True, with_zeros=True,
                                zeros_mode="original",
                                group_size=cfg.group_size,
                                out_dtype=cfg.act_dtype)
            op = Matmul(mcfg, enable_tuning=enable_tuning)
            codes = rng.integers(0, 16, (N, K)).astype(np.int8)
            scales = (rng.standard_normal((N, K // cfg.group_size)) * 0.0002
                      + 0.001).astype(np.float16)
            zeros = np.full((N, K // cfg.group_size), 8.0, np.float16)
            self.ops[name] = op
            self.weights[name] = op.transform_weight(codes, scale=scales,
                                                     zeros=zeros)
        self.moe = QuantMoELayer(cfg.moe_config(), moe_tokens, seed=seed,
                                 enable_tuning=enable_tuning)
        self.attn_norm = jnp.ones((cfg.hidden_size,), jnp.float32)
        self.mlp_norm = jnp.ones((cfg.hidden_size,), jnp.float32)

    def proj(self, name: str, x: jnp.ndarray) -> jnp.ndarray:
        W, S, Z = self.weights[name]
        return self.ops[name].forward(x, W, scale=S, zeros=Z)

    # parallel.moe.expert_parallel_mixtral installs an EP twin here; when
    # set, serving routes the FFN through it (weights sharded over "ep").
    moe_ep = None

    def mlp_forward(self, h: jnp.ndarray) -> jnp.ndarray:
        return (self.moe_ep or self.moe).forward(h)

    def state_dict(self) -> Dict[str, jnp.ndarray]:
        out = {}
        for name, (W, S, Z) in self.weights.items():
            out[f"{name}.qweight"] = W
            out[f"{name}.scales"] = S
            out[f"{name}.zeros"] = Z
        out["router"] = self.moe.router
        for name, per in self.moe.weights.items():
            for e, (W, S, Z) in enumerate(per):
                out[f"expert_{e}.{name}.qweight"] = W
                out[f"expert_{e}.{name}.scales"] = S
                out[f"expert_{e}.{name}.zeros"] = Z
        out["attn_norm"] = self.attn_norm
        out["mlp_norm"] = self.mlp_norm
        return out

    def load_state_dict(self, state: Dict[str, jnp.ndarray]) -> None:
        for name in self.weights:
            self.weights[name] = (jnp.asarray(state[f"{name}.qweight"]),
                                  jnp.asarray(state[f"{name}.scales"]),
                                  jnp.asarray(state[f"{name}.zeros"]))
        self.moe.router = jnp.asarray(state["router"])
        for name, per in self.moe.weights.items():
            self.moe.weights[name] = [
                (jnp.asarray(state[f"expert_{e}.{name}.qweight"]),
                 jnp.asarray(state[f"expert_{e}.{name}.scales"]),
                 jnp.asarray(state[f"expert_{e}.{name}.zeros"]))
                for e in range(len(per))]
        self.attn_norm = jnp.asarray(state["attn_norm"])
        self.mlp_norm = jnp.asarray(state["mlp_norm"])


class QuantMixtral(_DecoderServingMixin):
    """Mixtral-style decoder stack with the full serving surface
    (engines, generate, decode_chunk, speculation) via the shared mixin."""

    def __init__(self, cfg: MixtralConfig, opt_m=(1, 16, 256), *,
                 enable_tuning: bool = False, moe_tokens: int = 256):
        self.cfg = cfg
        self.layers = [QuantMixtralLayer(cfg, opt_m, seed=i,
                                         enable_tuning=enable_tuning,
                                         moe_tokens=moe_tokens)
                       for i in range(cfg.num_layers)]

    def state_dict(self) -> Dict[str, Dict[str, jnp.ndarray]]:
        return {f"layer_{i}": l.state_dict()
                for i, l in enumerate(self.layers)}

    def load_state_dict(self, state) -> None:
        for i, layer in enumerate(self.layers):
            layer.load_state_dict(state[f"layer_{i}"])
