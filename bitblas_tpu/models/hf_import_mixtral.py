"""Import a HuggingFace GPTQ Mixtral checkpoint into QuantMixtral.

Mirrors models.hf_import for the MoE family: per layer, llama-style
attention bundles (`self_attn.{q,k,v,o}_proj.{qweight,qzeros,scales}`)
plus `block_sparse_moe.gate.weight` (the float router) and per-expert
bundles `block_sparse_moe.experts.{e}.w{1,2,3}.*` (HF naming: w1=gate,
w3=up, w2=down). The reference has no MoE integration at all — its GPTQ
path stops at per-layer nn.Linear swaps.
"""

from __future__ import annotations

from typing import Mapping, Tuple

import jax.numpy as jnp
import numpy as np

from ..common import get_logger
from ..graph import repack_gptq_layer
from .hf_import import LMHead, _check_g_idx, _np, rope_scaling_from_hf
from .quant_moe import MixtralConfig, QuantMixtral

logger = get_logger()

_ATTN = (("self_attn.q_proj", "q"), ("self_attn.k_proj", "k"),
         ("self_attn.v_proj", "v"), ("self_attn.o_proj", "o"))
# HF expert projection name -> our expert projection name
_EXPERTS = (("w1", "gate"), ("w3", "up"), ("w2", "down"))


def mixtral_config_from_hf(hf_config, *, group_size: int = 128,
                           act_dtype: str = "float16",
                           capacity_factor: float = 2.0) -> MixtralConfig:
    def get(name, default=None):
        if isinstance(hf_config, Mapping):
            return hf_config.get(name, default)
        return getattr(hf_config, name, default)

    heads = get("num_attention_heads")
    return MixtralConfig(
        hidden_size=get("hidden_size"),
        intermediate_size=get("intermediate_size"),
        num_heads=heads,
        num_kv_heads=get("num_key_value_heads", heads) or heads,
        num_layers=get("num_hidden_layers"),
        vocab_size=get("vocab_size"),
        group_size=group_size,
        act_dtype=act_dtype,
        rope_theta=float(get("rope_theta", 1e6)),
        rope_scaling=rope_scaling_from_hf(get),
        rms_norm_eps=float(get("rms_norm_eps", 1e-5)),
        n_experts=get("num_local_experts"),
        top_k=get("num_experts_per_tok"),
        capacity_factor=capacity_factor,
        # Mixtral-v0.1 sets sliding_window=4096 (many finetunes null it);
        # carried through so attention matches the source checkpoint.
        sliding_window=(get("sliding_window", None)
                if get("use_sliding_window", True) else None),
    )


def load_quant_mixtral_from_hf_gptq(
    state: Mapping[str, object],
    hf_config,
    *,
    bits: int = 4,
    group_size: int = 128,
    gptq_v2: bool = False,
    opt_m=(1, 16, 256),
    moe_tokens: int = 256,
    capacity_factor: float = 2.0,
    act_dtype: str = "float16",
    enable_tuning: bool = False,
) -> Tuple[QuantMixtral, LMHead]:
    """HF GPTQ Mixtral state dict -> (QuantMixtral, LMHead).

    capacity_factor controls expert-buffer headroom (tokens routed past
    an expert's capacity are dropped from that expert — raise it when
    routing is skewed)."""
    if bits != 4:
        raise ValueError(f"Mixtral import supports 4-bit (got {bits})")
    cfg = mixtral_config_from_hf(hf_config, group_size=group_size,
                                 capacity_factor=capacity_factor,
                                 act_dtype=act_dtype)
    model = QuantMixtral(cfg, opt_m=opt_m, moe_tokens=moe_tokens,
                         enable_tuning=enable_tuning)

    def repack(key, mcfg):
        _check_g_idx(state, key, mcfg.K, group_size)
        packed = repack_gptq_layer(
            mcfg, _np(state[f"{key}.qweight"]), _np(state[f"{key}.scales"]),
            _np(state[f"{key}.qzeros"]), gptq_v2=gptq_v2)
        return (jnp.asarray(packed["qweight"]),
                jnp.asarray(packed["scales"]),
                jnp.asarray(packed["zeros"]))

    for i, layer in enumerate(model.layers):
        base = f"model.layers.{i}"
        for hf_name, ours in _ATTN:
            layer.weights[ours] = repack(f"{base}.{hf_name}",
                                         layer.ops[ours].config)
        moe = layer.moe
        moe.router = jnp.asarray(
            _np(state[f"{base}.block_sparse_moe.gate.weight"]).T,
            jnp.float32)  # HF stores [E, H]; ours multiplies [H, E]
        for hf_name, ours in _EXPERTS:
            mcfg = moe.ops[ours].config
            moe.weights[ours] = [
                repack(f"{base}.block_sparse_moe.experts.{e}.{hf_name}",
                       mcfg)
                for e in range(cfg.n_experts)]
        layer.attn_norm = jnp.asarray(
            _np(state[f"{base}.input_layernorm.weight"]), jnp.float32)
        layer.mlp_norm = jnp.asarray(
            _np(state[f"{base}.post_attention_layernorm.weight"]),
            jnp.float32)
        logger.info("imported mixtral layer %d/%d", i + 1, cfg.num_layers)

    head = LMHead(
        embed=jnp.asarray(_np(state["model.embed_tokens.weight"]),
                          jnp.dtype(cfg.act_dtype)),
        final_norm=jnp.asarray(_np(state["model.norm.weight"]), jnp.float32),
        lm_head=jnp.asarray(_np(state["lm_head.weight"]), jnp.float32),
    )
    return model, head
