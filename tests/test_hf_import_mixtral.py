"""HF GPTQ Mixtral checkpoint import (models/hf_import_mixtral.py).

Synthesizes an AutoGPTQ-convention Mixtral state dict under real HF names
(attention bundles + block_sparse_moe.gate router + per-expert w1/w2/w3
bundles), imports it, and checks attention and expert projections against
the numpy dequant ground truth plus a tokens->logits generation pass.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from bitblas_tpu.models import QuantLlamaLM
from bitblas_tpu.models.hf_import_mixtral import (
    load_quant_mixtral_from_hf_gptq, mixtral_config_from_hf)
from bitblas_tpu.quantization.packing import pack_autogptq
from bitblas_tpu.testing import assert_close

HF_CFG = {
    "hidden_size": 256,
    "intermediate_size": 512,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "num_hidden_layers": 1,
    "vocab_size": 64,
    "rope_theta": 1e6,
    "num_local_experts": 4,
    "num_experts_per_tok": 2,
}
G = 64
_ATTN_DIMS = {
    "self_attn.q_proj": (256, 256),
    "self_attn.k_proj": (256, 128),
    "self_attn.v_proj": (256, 128),
    "self_attn.o_proj": (256, 256),
}
_EXPERT_DIMS = {"w1": (256, 512), "w3": (256, 512), "w2": (512, 256)}


def _bundle(rng, K, N):
    codes = rng.integers(0, 16, (K, N)).astype(np.int64)
    zeros = rng.integers(0, 16, (K // G, N)).astype(np.int64)
    scales = (rng.standard_normal((K // G, N)) * 0.0002
              + 0.001).astype(np.float16)
    qw, qz, sc = pack_autogptq(codes, zeros, scales, 4)
    gidx = np.repeat(np.arange(K // G), G)
    truth = (scales.astype(np.float32)[gidx]
             * (codes - zeros[gidx])).astype(np.float32)
    return {"qweight": qw, "qzeros": qz, "scales": sc}, truth


def _make_state(rng):
    state, truth = {}, {}
    H, E = HF_CFG["hidden_size"], HF_CFG["num_local_experts"]
    for i in range(HF_CFG["num_hidden_layers"]):
        base = f"model.layers.{i}"
        for hf_name, (K, N) in _ATTN_DIMS.items():
            b, t = _bundle(rng, K, N)
            for k, v in b.items():
                state[f"{base}.{hf_name}.{k}"] = v
            truth[f"{base}.{hf_name}"] = t
        state[f"{base}.block_sparse_moe.gate.weight"] = \
            (rng.standard_normal((E, H)) * 0.05).astype(np.float16)
        for e in range(E):
            for w, (K, N) in _EXPERT_DIMS.items():
                key = f"{base}.block_sparse_moe.experts.{e}.{w}"
                b, t = _bundle(rng, K, N)
                for k, v in b.items():
                    state[f"{key}.{k}"] = v
                truth[key] = t
        state[f"{base}.input_layernorm.weight"] = np.ones(H, np.float32)
        state[f"{base}.post_attention_layernorm.weight"] = np.ones(
            H, np.float32)
    state["model.embed_tokens.weight"] = \
        (rng.standard_normal((64, H)) * 0.05).astype(np.float16)
    state["model.norm.weight"] = np.ones(H, np.float32)
    state["lm_head.weight"] = (rng.standard_normal((64, H)) * 0.05).astype(
        np.float32)
    return state, truth


def test_mixtral_import_matches_dequant_truth():
    rng = np.random.default_rng(0)
    state, truth = _make_state(rng)
    model, _ = load_quant_mixtral_from_hf_gptq(
        state, HF_CFG, group_size=G, opt_m=(16,), moe_tokens=16)
    layer = model.layers[0]
    for hf_name, ours in (("self_attn.q_proj", "q"),
                          ("self_attn.o_proj", "o")):
        W_true = truth[f"model.layers.0.{hf_name}"]
        x = rng.standard_normal((16, W_true.shape[0])).astype(np.float16)
        out = layer.proj(ours, jnp.asarray(x))
        assert_close(np.asarray(out, np.float32),
                     x.astype(np.float32) @ W_true, rtol=5e-2, atol=5e-3,
                     msg=hf_name)
    # router orientation: ours multiplies [H, E]
    hf_router = np.asarray(
        state["model.layers.0.block_sparse_moe.gate.weight"], np.float32)
    np.testing.assert_allclose(np.asarray(layer.moe.router), hf_router.T,
                               rtol=1e-3)
    # expert projections through the packed kernels
    for e in (0, 3):
        for w, ours in (("w1", "gate"), ("w2", "down")):
            W_true = truth[f"model.layers.0.block_sparse_moe.experts.{e}.{w}"]
            K = W_true.shape[0]
            x = rng.standard_normal((16, K)).astype(np.float16)
            Wd, S, Z = layer.moe.weights[ours][e]
            out = layer.moe.ops[ours].forward(jnp.asarray(x), Wd,
                                              scale=S, zeros=Z)
            assert_close(np.asarray(out, np.float32),
                         x.astype(np.float32) @ W_true, rtol=5e-2,
                         atol=5e-3, msg=f"expert {e} {w}")


def test_mixtral_import_generates():
    rng = np.random.default_rng(1)
    state, _ = _make_state(rng)
    model, head = load_quant_mixtral_from_hf_gptq(
        state, HF_CFG, group_size=G, opt_m=(1, 8, 16), moe_tokens=16)
    lm = QuantLlamaLM(model, head)
    out = lm.generate(np.arange(6), max_new_tokens=4, temperature=0.0)
    assert out.shape == (10,) and out.min() >= 0 and out.max() < 64
    logits = lm(jnp.asarray(out[None, :6]))
    assert np.isfinite(np.asarray(logits)).all()


def test_mixtral_config_mapping():
    cfg = mixtral_config_from_hf(HF_CFG, group_size=G)
    assert cfg.n_experts == 4 and cfg.top_k == 2
    assert cfg.num_kv_heads == 2 and cfg.rope_theta == 1e6
