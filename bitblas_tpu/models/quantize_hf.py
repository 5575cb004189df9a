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
from .hf_import import (_HF_PROJS, _lm_head_weight, _np,
                        llama_config_from_hf, LMHead)
from .quant_llama import QuantLlama, rmsnorm, rope

logger = get_logger()


def _attention(cfg, q, k, v):
    """Naive causal GQA attention in f32 — the calibration-path twin of
    quant_llama.layer_forward's fallback branch, INCLUDING the sliding
    window: GPTQ Hessians must come from the activation distribution the
    served (windowed) model actually produces (r5 review finding —
    full-causal calibration of a windowed checkpoint deviates silently)."""
    B, S, _, _ = q.shape
    group = cfg.num_heads // cfg.num_kv_heads
    k = jnp.repeat(k, group, axis=2)
    v = jnp.repeat(v, group, axis=2)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(cfg.head_dim)
    qi = jnp.arange(S)[:, None]
    kj = jnp.arange(S)[None, :]
    keep = qi >= kj
    if getattr(cfg, "sliding_window", None) is not None:
        keep = keep & (kj > qi - cfg.sliding_window)
    s = jnp.where(keep, s, -1e30)
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
        lm_head=jnp.asarray(_lm_head_weight(state), jnp.float32),
        norm_eps=cfg.rms_norm_eps,
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

    quant = _make_quant(method, bits, group_size, symmetric, percdamp)

    for i, layer in enumerate(model.layers):
        base = f"model.layers.{i}"
        fpw = {}
        for hf_name, ours in _HF_PROJS:
            key = f"{base}.{hf_name}.weight"
            if f"{base}.{hf_name}.bias" in state:
                if cfg.attention_bias and ours in ("q", "k", "v"):
                    layer.biases[ours] = jnp.asarray(
                        _np(state[f"{base}.{hf_name}.bias"]), jnp.float32)
                else:
                    raise ValueError(
                        f"{base}.{hf_name}: unexpected bias "
                        f"(attention_bias covers q/k/v only)")
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
            qatt, x = _calibrate_attention(cfg, x, positions, fpw,
                                           attn_norm, quant,
                                           biases=layer.biases)
            qws.update(qatt)
            h2 = rmsnorm(x, mlp_norm, cfg.rms_norm_eps)
            acc_gu = HessianAccumulator(cfg.hidden_size)
            acc_gu.update(np.asarray(h2))
            for name in ("gate", "up"):
                qws[name] = quant(fpw[name], acc_gu.hessian)
            gate = h2 @ jnp.asarray(qws["gate"].dequantize()).T
            up = h2 @ jnp.asarray(qws["up"].dequantize()).T
            act = jax.nn.silu(gate) * up
            acc_d = HessianAccumulator(cfg.intermediate_size)
            acc_d.update(np.asarray(act))
            qws["down"] = quant(fpw["down"], acc_d.hessian)
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


def _make_quant(method, bits, group_size, symmetric, percdamp):
    """quant(w, hessian_or_None): GPTQ against the Hessian when given,
    RTN otherwise (also the zero-traffic fallback)."""
    def quant(w_fp, hess):
        if method == "gptq" and hess is not None:
            return gptq_quantize(w_fp, hess, bits=bits,
                                 group_size=group_size,
                                 symmetric=symmetric, percdamp=percdamp)
        return rtn_quantize(w_fp, bits=bits, group_size=group_size,
                            symmetric=symmetric)
    return quant


def _calibrate_attention(cfg, x, positions, attn_fp, attn_norm, quant,
                         biases=None):
    """Sequential-GPTQ attention block shared by the llama and mixtral
    drivers: quantize q/k/v against the rmsnorm'd-input Hessian, run
    attention with the dequantized projections (INCLUDING q/k/v biases —
    Qwen2-style checkpoints; the calibration stream must match the served
    forward), quantize o against the attention-output Hessian. Returns
    (qatt dict, x after the residual)."""
    B, S = positions.shape
    biases = biases or {}
    h = rmsnorm(x, attn_norm, cfg.rms_norm_eps)
    acc = HessianAccumulator(cfg.hidden_size)
    acc.update(np.asarray(h))
    qatt, dq = {}, {}
    for name in ("q", "k", "v"):
        qatt[name] = quant(attn_fp[name], acc.hessian)
        dq[name] = jnp.asarray(qatt[name].dequantize())

    def _proj(name, heads):
        y = h @ dq[name].T
        if biases.get(name) is not None:
            y = y + biases[name]
        return y.reshape(B, S, heads, cfg.head_dim)

    q = _proj("q", cfg.num_heads)
    k = _proj("k", cfg.num_kv_heads)
    v = _proj("v", cfg.num_kv_heads)
    q = rope(q, positions, cfg.rope_arg)
    k = rope(k, positions, cfg.rope_arg)
    attn = _attention(cfg, q, k, v)
    acc_o = HessianAccumulator(cfg.hidden_size)
    acc_o.update(np.asarray(attn))
    qatt["o"] = quant(attn_fp["o"], acc_o.hessian)
    return qatt, x + attn @ jnp.asarray(qatt["o"].dequantize()).T


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
    calib_chunk: int = 512,
    enable_tuning: bool = False,
):
    """Quantize a float HF Mixtral state dict -> (QuantMixtral, LMHead).

    Attention quantizes like the llama driver (shared
    `_calibrate_attention`). For method="gptq" the expert projections use
    PER-EXPERT Hessians collected from the tokens the (float) router
    actually dispatches to each expert. Routing runs in `calib_chunk`
    -token pieces — one dense dispatch over the whole calibration stream
    would be quadratic in its length. An expert that receives no
    calibration traffic falls back to RTN (a zero Hessian would otherwise
    zero its weights via GPTQ's dead-column path). The router itself
    stays float, as in real Mixtral GPTQ checkpoints."""
    from .hf_import_mixtral import mixtral_config_from_hf, _ATTN, _EXPERTS
    from .quant_moe import dispatch_combine, moe_capacity, QuantMixtral

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
        lm_head=jnp.asarray(_lm_head_weight(state), jnp.float32),
        norm_eps=cfg.rms_norm_eps,
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

    quant = _make_quant(method, bits, group_size, symmetric, percdamp)
    E = cfg.n_experts
    mcfg_moe = cfg.moe_config()

    for i, layer in enumerate(model.layers):
        base = f"model.layers.{i}"
        for hf, _ in _ATTN:
            if f"{base}.{hf}.bias" in state:
                raise ValueError(f"{base}.{hf}: bias present — mixtral "
                                 f"projections are bias-free")
        attn_fp = {ours: _np(state[f"{base}.{hf}.weight"]).astype(
            np.float32) for hf, ours in _ATTN}
        router = _np(state[f"{base}.block_sparse_moe.gate.weight"]).astype(
            np.float32)  # HF [E, H]
        exp_fp = {}
        for hf, ours in _EXPERTS:
            per = []
            for e in range(E):
                key = f"{base}.block_sparse_moe.experts.{e}.{hf}"
                if f"{key}.bias" in state:
                    raise ValueError(f"{key}: bias present — mixtral "
                                     f"experts are bias-free")
                per.append(_np(state[f"{key}.weight"]).astype(np.float32))
            exp_fp[ours] = per
        attn_norm = jnp.asarray(
            _np(state[f"{base}.input_layernorm.weight"]), jnp.float32)
        mlp_norm = jnp.asarray(
            _np(state[f"{base}.post_attention_layernorm.weight"]),
            jnp.float32)

        qatt = {}
        qexp = {name: [None] * E for name in ("gate", "up", "down")}
        if method == "rtn":
            for name, w in attn_fp.items():
                qatt[name] = quant(w, None)
            for name, per in exp_fp.items():
                qexp[name] = [quant(w, None) for w in per]
        else:
            qatt, x = _calibrate_attention(cfg, x, positions, attn_fp,
                                           attn_norm, quant)
            h2 = rmsnorm(x, mlp_norm, cfg.rms_norm_eps)
            h2f = np.asarray(h2, np.float32).reshape(-1, cfg.hidden_size)
            T = h2f.shape[0]
            CH = max(int(calib_chunk), 8)
            router_j = jnp.asarray(router.T)

            def routed_chunks():
                """(slice, hc, dispatch, combine) per calib_chunk piece —
                capacity derives per chunk, like serving batches."""
                for s in range(0, T, CH):
                    hc = h2f[s:s + CH]
                    hcj = jnp.asarray(hc)
                    cap = moe_capacity(mcfg_moe, hc.shape[0])
                    disp, comb = dispatch_combine(
                        hcj @ router_j, cfg.top_k, cap,
                        valid=jnp.any(hcj != 0, axis=-1))
                    yield (slice(s, s + hc.shape[0]), hc,
                           np.asarray(disp), np.asarray(comb))

            def expert_quant(w, hess):
                if not np.any(np.diag(hess)):
                    logger.warning(
                        "expert received no calibration traffic — RTN "
                        "fallback (raise calib set size/diversity)")
                    return quant(w, None)
                return quant(w, hess)

            # pass 1: gate/up Hessians from each expert's dispatched tokens
            accs = [HessianAccumulator(cfg.hidden_size) for _ in range(E)]
            for _, hc, disp, _ in routed_chunks():
                xin = np.einsum("tec,th->ech", disp, hc)
                for e in range(E):
                    accs[e].update(xin[e])
            for e in range(E):
                qexp["gate"][e] = expert_quant(exp_fp["gate"][e],
                                               accs[e].hessian)
                qexp["up"][e] = expert_quant(exp_fp["up"][e],
                                             accs[e].hessian)
            dq_g = [qexp["gate"][e].dequantize() for e in range(E)]
            dq_u = [qexp["up"][e].dequantize() for e in range(E)]

            # pass 2: down Hessians from the quantized gate/up activations
            daccs = [HessianAccumulator(cfg.intermediate_size)
                     for _ in range(E)]
            for _, hc, disp, _ in routed_chunks():
                xin = np.einsum("tec,th->ech", disp, hc)
                for e in range(E):
                    g = xin[e] @ dq_g[e].T
                    act = g / (1.0 + np.exp(-g)) * (xin[e] @ dq_u[e].T)
                    daccs[e].update(act)
            for e in range(E):
                qexp["down"][e] = expert_quant(exp_fp["down"][e],
                                               daccs[e].hessian)
            dq_d = [qexp["down"][e].dequantize() for e in range(E)]

            # pass 3: layer output with the fully-quantized experts
            y = np.zeros_like(h2f)
            for sl, hc, disp, comb in routed_chunks():
                xin = np.einsum("tec,th->ech", disp, hc)
                for e in range(E):
                    g = xin[e] @ dq_g[e].T
                    act = g / (1.0 + np.exp(-g)) * (xin[e] @ dq_u[e].T)
                    y[sl] += np.einsum("tc,ch->th", comb[:, e],
                                       act @ dq_d[e].T)
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
