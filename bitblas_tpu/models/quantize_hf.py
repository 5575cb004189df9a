"""Quantize a float HF llama checkpoint into QuantLlama (RTN or GPTQ).

Completes the checkpoint story end-to-end inside the framework: where
`models.hf_import` ingests checkpoints that AutoGPTQ already quantized
(the only route the reference supports —
/root/reference/integration/pytorch/bitblas_quant_linear.py:33-220), this
module *creates* the quantized model from the original fp16/bf16 weights:

    state = {k: v for k, v in hf_model.state_dict().items()}   # torch ok
    model, head = quantize_llama_from_hf_fp16(
        state, hf_model.config, method="gptq", calib_tokens=tok_batches)
    lm = QuantLlamaLM(model, head)

GPTQ calibration is sequential (Frantar et al.): layer i's Hessians are
collected from activations produced by the already-quantized layers 0..i-1,
so quantization error does not compound blindly. The calibration forward
below mirrors `quant_llama.layer_forward` (same rmsnorm/rope/GQA math) but
runs dense f32 matmuls on the *dequantized* codes — quantization is a
one-shot offline transform; no kernels are built until the final pack.
"""

from __future__ import annotations

from typing import Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import get_logger
from ..quantization.gptq import (HessianAccumulator, gptq_quantize,
                                 rtn_quantize)
from .hf_import import _HF_PROJS, _np, llama_config_from_hf, LMHead
from .quant_llama import QuantLlama, rmsnorm, rope

logger = get_logger()


def _attention(cfg, q, k, v):
    """Naive causal GQA attention in f32 — the calibration-path twin of
    quant_llama.layer_forward's fallback branch."""
    B, S, _, _ = q.shape
    group = cfg.num_heads // cfg.num_kv_heads
    k = jnp.repeat(k, group, axis=2)
    v = jnp.repeat(v, group, axis=2)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(cfg.head_dim)
    qi = jnp.arange(S)[:, None]
    kj = jnp.arange(S)[None, :]
    s = jnp.where(qi >= kj, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, S, -1)


def quantize_llama_from_hf_fp16(
    state: Mapping[str, object],
    hf_config,
    *,
    bits: int = 4,
    group_size: int = 128,
    method: str = "rtn",
    calib_tokens: Optional[np.ndarray] = None,
    symmetric: bool = False,
    percdamp: float = 0.01,
    opt_m=(1, 16, 256),
    enable_tuning: bool = False,
) -> Tuple[QuantLlama, LMHead]:
    """Quantize an fp16/bf16 HF llama `state` dict -> (QuantLlama, LMHead).

    method="rtn" needs no data; method="gptq" requires `calib_tokens`
    [B, S] int token ids (a few hundred rows of representative text). The
    embedding, final norm and lm_head stay float, exactly as GPTQ
    checkpoints leave them (hf_import.LMHead).
    """
    if method not in ("rtn", "gptq"):
        raise ValueError(f"method must be 'rtn' or 'gptq', got {method!r}")
    if bits != 4:
        raise ValueError("QuantLlama packs uint4 projections; for other "
                         "widths quantize per-tensor via quantization.gptq "
                         "and feed a matching MatmulConfig/Linear")
    cfg = llama_config_from_hf(hf_config, group_size=group_size)
    model = QuantLlama(cfg, opt_m=opt_m, enable_tuning=enable_tuning)
    head = LMHead(
        embed=jnp.asarray(_np(state["model.embed_tokens.weight"]),
                          jnp.dtype(cfg.act_dtype)),
        final_norm=jnp.asarray(_np(state["model.norm.weight"]), jnp.float32),
        lm_head=jnp.asarray(_np(state["lm_head.weight"]), jnp.float32),
    )

    x = positions = None
    if method == "gptq":
        if calib_tokens is None:
            raise ValueError("method='gptq' requires calib_tokens [B, S]")
        toks = jnp.asarray(np.asarray(calib_tokens))
        if toks.ndim == 1:
            toks = toks[None]
        B, S = toks.shape
        positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
        x = head.embed_tokens(toks).astype(jnp.float32)

    def quant(w_fp: np.ndarray, acc: Optional[HessianAccumulator]):
        if method == "gptq":
            return gptq_quantize(w_fp, acc.hessian, bits=bits,
                                 group_size=group_size, symmetric=symmetric,
                                 percdamp=percdamp)
        return rtn_quantize(w_fp, bits=bits, group_size=group_size,
                            symmetric=symmetric)

    for i, layer in enumerate(model.layers):
        base = f"model.layers.{i}"
        fpw = {}
        for hf_name, ours in _HF_PROJS:
            key = f"{base}.{hf_name}.weight"
            if f"{base}.{hf_name}.bias" in state:
                raise ValueError(f"{base}.{hf_name}: bias present — llama "
                                 f"projections are bias-free")
            fpw[ours] = _np(state[key]).astype(np.float32)
        attn_norm = jnp.asarray(
            _np(state[f"{base}.input_layernorm.weight"]), jnp.float32)
        mlp_norm = jnp.asarray(
            _np(state[f"{base}.post_attention_layernorm.weight"]),
            jnp.float32)

        qws = {}
        if method == "rtn":
            for name, w in fpw.items():
                qws[name] = quant(w, None)
        else:
            # Sequential GPTQ: Hessians from the quantized-prefix stream.
            B, S = positions.shape
            h = rmsnorm(x, attn_norm)
            acc = HessianAccumulator(cfg.hidden_size)
            acc.update(np.asarray(h))
            dq = {}
            for name in ("q", "k", "v"):
                qws[name] = quant(fpw[name], acc)
                dq[name] = jnp.asarray(qws[name].dequantize())
            q = (h @ dq["q"].T).reshape(B, S, cfg.num_heads, cfg.head_dim)
            k = (h @ dq["k"].T).reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
            v = (h @ dq["v"].T).reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
            q = rope(q, positions, cfg.rope_arg)
            k = rope(k, positions, cfg.rope_arg)
            attn = _attention(cfg, q, k, v)
            acc_o = HessianAccumulator(cfg.hidden_size)
            acc_o.update(np.asarray(attn))
            qws["o"] = quant(fpw["o"], acc_o)
            x = x + attn @ jnp.asarray(qws["o"].dequantize()).T
            h2 = rmsnorm(x, mlp_norm)
            acc_gu = HessianAccumulator(cfg.hidden_size)
            acc_gu.update(np.asarray(h2))
            for name in ("gate", "up"):
                qws[name] = quant(fpw[name], acc_gu)
            gate = h2 @ jnp.asarray(qws["gate"].dequantize()).T
            up = h2 @ jnp.asarray(qws["up"].dequantize()).T
            act = jax.nn.silu(gate) * up
            acc_d = HessianAccumulator(cfg.intermediate_size)
            acc_d.update(np.asarray(act))
            qws["down"] = quant(fpw["down"], acc_d)
            x = x + act @ jnp.asarray(qws["down"].dequantize()).T

        for name, qw in qws.items():
            op = layer.ops[name]
            W, Sc, Z = op.transform_weight(
                qw.codes.astype(np.int8),
                scale=qw.scales.astype(np.float16),
                zeros=qw.zeros.astype(np.float16))
            layer.weights[name] = (W, Sc, Z)
        layer.attn_norm = attn_norm
        layer.mlp_norm = mlp_norm
        logger.info("quantized layer %d/%d (%s)", i + 1, cfg.num_layers,
                    method)

    return model, head


def quantize_mixtral_from_hf_fp16(
    state: Mapping[str, object],
    hf_config,
    *,
    bits: int = 4,
    group_size: int = 128,
    method: str = "rtn",
    calib_tokens: Optional[np.ndarray] = None,
    symmetric: bool = False,
    percdamp: float = 0.01,
    opt_m=(1, 16, 256),
    moe_tokens: int = 256,
    capacity_factor: float = 2.0,
    enable_tuning: bool = False,
):
    """Quantize a float HF Mixtral state dict -> (QuantMixtral, LMHead).

    Attention quantizes like the llama driver. For method="gptq" the
    expert projections use PER-EXPERT Hessians collected from the tokens
    the (float) router actually dispatches to each expert during the
    sequential calibration pass — an expert that rarely fires calibrates
    on its own traffic, not the global stream. The router itself stays
    float (HF GPTQ Mixtral checkpoints do the same)."""
    from .hf_import_mixtral import mixtral_config_from_hf, _ATTN, _EXPERTS
    from .quant_moe import QuantMixtral, dispatch_combine, moe_capacity

    del _EXPERTS  # naming handled below; HF fp16 experts use w1/w2/w3 too
    if method not in ("rtn", "gptq"):
        raise ValueError(f"method must be 'rtn' or 'gptq', got {method!r}")
    if bits != 4:
        raise ValueError("QuantMixtral packs uint4 projections")
    cfg = mixtral_config_from_hf(hf_config, group_size=group_size,
                                 capacity_factor=capacity_factor)
    model = QuantMixtral(cfg, opt_m=opt_m, moe_tokens=moe_tokens,
                         enable_tuning=enable_tuning)
    head = LMHead(
        embed=jnp.asarray(_np(state["model.embed_tokens.weight"]),
                          jnp.dtype(cfg.act_dtype)),
        final_norm=jnp.asarray(_np(state["model.norm.weight"]), jnp.float32),
        lm_head=jnp.asarray(_np(state["lm_head.weight"]), jnp.float32),
    )

    x = positions = None
    if method == "gptq":
        if calib_tokens is None:
            raise ValueError("method='gptq' requires calib_tokens [B, S]")
        toks = jnp.asarray(np.asarray(calib_tokens))
        if toks.ndim == 1:
            toks = toks[None]
        B, S = toks.shape
        positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
        x = head.embed_tokens(toks).astype(jnp.float32)

    def quant(w_fp, hess):
        if method == "gptq":
            return gptq_quantize(w_fp, hess, bits=bits,
                                 group_size=group_size,
                                 symmetric=symmetric, percdamp=percdamp)
        return rtn_quantize(w_fp, bits=bits, group_size=group_size,
                            symmetric=symmetric)

    _HF_EXP = (("w1", "gate"), ("w3", "up"), ("w2", "down"))
    for i, layer in enumerate(model.layers):
        base = f"model.layers.{i}"
        attn_fp = {ours: _np(state[f"{base}.{hf}.weight"]).astype(
            np.float32) for hf, ours in _ATTN}
        router = _np(state[f"{base}.block_sparse_moe.gate.weight"]).astype(
            np.float32)  # HF [E, H]
        exp_fp = {ours: [_np(state[
            f"{base}.block_sparse_moe.experts.{e}.{hf}.weight"]).astype(
                np.float32) for e in range(cfg.n_experts)]
            for hf, ours in _HF_EXP}
        attn_norm = jnp.asarray(
            _np(state[f"{base}.input_layernorm.weight"]), jnp.float32)
        mlp_norm = jnp.asarray(
            _np(state[f"{base}.post_attention_layernorm.weight"]),
            jnp.float32)

        qatt, qexp = {}, {n: [None] * cfg.n_experts for n, _ in
                          (("gate", 0), ("up", 0), ("down", 0))}
        if method == "rtn":
            for name, w in attn_fp.items():
                qatt[name] = quant(w, None)
            for name, per in exp_fp.items():
                qexp[name] = [quant(w, None) for w in per]
        else:
            B, S = positions.shape
            h = rmsnorm(x, attn_norm)
            acc = HessianAccumulator(cfg.hidden_size)
            acc.update(np.asarray(h))
            dq = {}
            for name in ("q", "k", "v"):
                qatt_w = quant(attn_fp[name], acc.hessian)
                qatt_w_d = jnp.asarray(qatt_w.dequantize())
                qatt[name], dq[name] = qatt_w, qatt_w_d
            q = (h @ dq["q"].T).reshape(B, S, cfg.num_heads, cfg.head_dim)
            k = (h @ dq["k"].T).reshape(B, S, cfg.num_kv_heads,
                                        cfg.head_dim)
            v = (h @ dq["v"].T).reshape(B, S, cfg.num_kv_heads,
                                        cfg.head_dim)
            q = rope(q, positions, cfg.rope_arg)
            k = rope(k, positions, cfg.rope_arg)
            attn = _attention(cfg, q, k, v)
            acc_o = HessianAccumulator(cfg.hidden_size)
            acc_o.update(np.asarray(attn))
            qatt_o = quant(attn_fp["o"], acc_o.hessian)
            qatt["o"] = qatt_o
            x = x + attn @ jnp.asarray(qatt_o.dequantize()).T
            h2 = rmsnorm(x, mlp_norm)

            # Route the calibration stream with the FLOAT router to get
            # each expert's own traffic; per-expert Hessians come from the
            # dispatched buffers (zero capacity-padding rows contribute
            # zero outer products — harmless to H up to scale).
            h2f = np.asarray(h2, np.float32).reshape(-1, cfg.hidden_size)
            T = h2f.shape[0]
            cap = moe_capacity(cfg.moe_config(), T)
            disp, comb = dispatch_combine(
                jnp.asarray(h2f) @ jnp.asarray(router.T), cfg.top_k, cap,
                valid=jnp.any(jnp.asarray(h2f) != 0, axis=-1))
            xin = np.einsum("tec,th->ech", np.asarray(disp), h2f)
            y = np.zeros_like(h2f)
            for e in range(cfg.n_experts):
                he = HessianAccumulator(cfg.hidden_size)
                he.update(xin[e])
                qexp["gate"][e] = quant(exp_fp["gate"][e], he.hessian)
                qexp["up"][e] = quant(exp_fp["up"][e], he.hessian)
                g = xin[e] @ qexp["gate"][e].dequantize().T
                u = xin[e] @ qexp["up"][e].dequantize().T
                act = np.asarray(jax.nn.silu(jnp.asarray(g))) * u
                hd = HessianAccumulator(cfg.intermediate_size)
                hd.update(act)
                qexp["down"][e] = quant(exp_fp["down"][e], hd.hessian)
                out_e = act @ qexp["down"][e].dequantize().T
                y += np.einsum("tc,ch->th", np.asarray(comb)[:, e], out_e)
            x = x + jnp.asarray(y).reshape(x.shape).astype(x.dtype)

        for name, qw in qatt.items():
            op = layer.ops[name]
            layer.weights[name] = op.transform_weight(
                qw.codes.astype(np.int8),
                scale=qw.scales.astype(np.float16),
                zeros=qw.zeros.astype(np.float16))
        layer.moe.router = jnp.asarray(router.T, jnp.float32)
        for name, per in qexp.items():
            op = layer.moe.ops[name]
            layer.moe.weights[name] = [op.transform_weight(
                qw.codes.astype(np.int8),
                scale=qw.scales.astype(np.float16),
                zeros=qw.zeros.astype(np.float16)) for qw in per]
        layer.attn_norm = attn_norm
        layer.mlp_norm = mlp_norm
        logger.info("quantized mixtral layer %d/%d (%s)", i + 1,
                    cfg.num_layers, method)

    return model, head
