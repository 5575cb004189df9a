"""HF-transformers GPTQ llama checkpoint import (models/hf_import.py).

Synthesizes a state dict in the AutoGPTQ CudaOldQuantLinear tensor
conventions under real HF llama names, imports it, and checks every
projection against the numpy dequant ground truth plus a tokens->logits
pass. Reference behavior studied from
/root/reference/integration/pytorch/bitblas_quant_linear.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitblas_tpu.models import (QuantLlamaLM, llama_config_from_hf,
                                load_quant_llama_from_hf_gptq)
from bitblas_tpu.quantization.packing import pack_autogptq
from bitblas_tpu.testing import assert_close

HF_CFG = {
    "hidden_size": 256,
    "intermediate_size": 512,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "num_hidden_layers": 2,
    "vocab_size": 64,
    "rope_theta": 10000.0,
}
G = 64
_PROJ_DIMS = {
    "self_attn.q_proj": (256, 256),
    "self_attn.k_proj": (256, 128),
    "self_attn.v_proj": (256, 128),
    "self_attn.o_proj": (256, 256),
    "mlp.gate_proj": (256, 512),
    "mlp.up_proj": (256, 512),
    "mlp.down_proj": (512, 256),
}


def _make_state(rng, *, v2=False, with_g_idx=False, act_order=False):
    """(state_dict, {proj_key: W_true [K, N]})"""
    state, truth = {}, {}
    for i in range(HF_CFG["num_hidden_layers"]):
        base = f"model.layers.{i}"
        for hf_name, (K, N) in _PROJ_DIMS.items():
            key = f"{base}.{hf_name}"
            codes = rng.integers(0, 16, (K, N)).astype(np.int64)
            zeros = rng.integers(0, 16, (K // G, N)).astype(np.int64)
            scales = (rng.standard_normal((K // G, N)) * 0.0002
                      + 0.001).astype(np.float16)
            qw, qz, sc = pack_autogptq(codes, zeros, scales, 4, v2=v2)
            state[f"{key}.qweight"] = qw
            state[f"{key}.qzeros"] = qz
            state[f"{key}.scales"] = sc
            if with_g_idx:
                g = np.arange(K, dtype=np.int64) // G
                if act_order:
                    g = g[rng.permutation(K)]
                state[f"{key}.g_idx"] = g
            gidx = np.repeat(np.arange(K // G), G)
            truth[key] = (scales.astype(np.float32)[gidx]
                          * (codes - zeros[gidx])).astype(np.float32)
        state[f"{base}.input_layernorm.weight"] = \
            np.ones(256, np.float32) + 0.1 * rng.standard_normal(256)
        state[f"{base}.post_attention_layernorm.weight"] = \
            np.ones(256, np.float32) + 0.1 * rng.standard_normal(256)
    state["model.embed_tokens.weight"] = \
        rng.standard_normal((64, 256)).astype(np.float16)
    state["model.norm.weight"] = np.ones(256, np.float32)
    state["lm_head.weight"] = rng.standard_normal((64, 256)).astype(
        np.float32)
    return state, truth


_HF2OURS = {"self_attn.q_proj": "q", "self_attn.k_proj": "k",
            "self_attn.v_proj": "v", "self_attn.o_proj": "o",
            "mlp.gate_proj": "gate", "mlp.up_proj": "up",
            "mlp.down_proj": "down"}


def _check_projections(model, truth, rng):
    for i, layer in enumerate(model.layers):
        for hf_name, ours in _HF2OURS.items():
            W_true = truth[f"model.layers.{i}.{hf_name}"]  # [K, N]
            K = W_true.shape[0]
            x = rng.standard_normal((16, K)).astype(np.float16)
            out = layer.proj(ours, jnp.asarray(x))
            exp = x.astype(np.float32) @ W_true
            assert_close(np.asarray(out, np.float32), exp,
                         rtol=5e-2, atol=5e-3,
                         msg=f"layer {i} {hf_name}")


def test_import_matches_dequant_truth():
    rng = np.random.default_rng(0)
    state, truth = _make_state(rng, with_g_idx=True)
    model, head = load_quant_llama_from_hf_gptq(state, HF_CFG,
                                                group_size=G,
                                                opt_m=(16,))
    _check_projections(model, truth, rng)


def test_import_v2_zeros():
    rng = np.random.default_rng(1)
    state, truth = _make_state(rng, v2=True)
    model, _ = load_quant_llama_from_hf_gptq(state, HF_CFG, group_size=G,
                                             gptq_v2=True, opt_m=(16,))
    _check_projections(model, truth, rng)


def test_tokens_to_logits():
    rng = np.random.default_rng(2)
    state, _ = _make_state(rng)
    model, head = load_quant_llama_from_hf_gptq(state, HF_CFG,
                                                group_size=G,
                                                opt_m=(1, 8, 16))
    lm = QuantLlamaLM(model, head)
    toks = jnp.asarray(rng.integers(0, 64, (2, 8)), jnp.int32)
    logits = lm(toks)
    assert logits.shape == (2, 8, 64)
    assert np.isfinite(np.asarray(logits)).all()
    # logits must actually depend on the tokens
    toks2 = jnp.asarray(rng.integers(0, 64, (2, 8)), jnp.int32)
    assert not np.allclose(np.asarray(lm(toks2)), np.asarray(logits))


def test_act_order_rejected():
    rng = np.random.default_rng(3)
    state, _ = _make_state(rng, with_g_idx=True, act_order=True)
    with pytest.raises(ValueError, match="act-order"):
        load_quant_llama_from_hf_gptq(state, HF_CFG, group_size=G,
                                      opt_m=(16,))


def test_config_mapping():
    cfg = llama_config_from_hf(HF_CFG, group_size=G)
    assert cfg.num_kv_heads == 2 and cfg.num_layers == 2
    assert cfg.head_dim == 64 and cfg.group_size == G


def test_perplexity_uniform_logits_equals_vocab():
    """A uniform-logits LM has perplexity exactly vocab_size; a peaked LM
    on the true next token approaches 1."""
    from bitblas_tpu.models import perplexity

    V = 32
    toks = np.arange(16, dtype=np.int32)[None] % V

    ppl_u = perplexity(lambda t: jnp.zeros((*t.shape, V)), toks)
    assert abs(ppl_u - V) < 1e-3

    def peaked(t):
        nxt = np.asarray(toks)[:, 1:t.shape[1] + 1]
        return 50.0 * jax.nn.one_hot(jnp.asarray(nxt), V)
    ppl_p = perplexity(peaked, toks)
    assert ppl_p < 1.01


def test_perplexity_on_imported_model_chunked():
    rng = np.random.default_rng(4)
    state, _ = _make_state(rng)
    model, head = load_quant_llama_from_hf_gptq(state, HF_CFG,
                                                group_size=G,
                                                opt_m=(1, 8, 16))
    from bitblas_tpu.models import perplexity
    # temper the random lm_head so logits (and hence ppl) stay in a sane
    # range — random-weight models otherwise produce astronomically
    # confident wrong predictions
    head.lm_head = head.lm_head * 0.02
    lm = QuantLlamaLM(model, head)
    toks = rng.integers(0, 64, (4, 9)).astype(np.int32)
    p1 = perplexity(lm, toks)
    p2 = perplexity(lm, toks, chunk=2)
    assert np.isfinite(p1) and p1 > 0
    # chunking changes the dispatched m-bucket (different kernel tiles),
    # so demand agreement only to bf16-kernel-grade noise in log space
    assert abs(np.log(p1) - np.log(p2)) < 5e-3, (p1, p2)


def test_imported_model_serves_under_tp():
    """The imported trunk must plug straight into TP serving: TP decode on
    a 2-device mesh matches the single-device imported model."""
    from jax.sharding import Mesh
    from bitblas_tpu.parallel.serving import TPQuantLlama

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs 2 devices")
    rng = np.random.default_rng(5)
    state, _ = _make_state(rng)
    model, _ = load_quant_llama_from_hf_gptq(state, HF_CFG, group_size=G,
                                             opt_m=(4,))
    mesh = Mesh(np.array(devs[:2]).reshape(2), ("tp",))
    tpm = TPQuantLlama(model, mesh)

    cfg = model.cfg
    B, S = 4, 8
    ck = jnp.asarray(rng.standard_normal(
        (cfg.num_layers, B, 16, cfg.num_kv_heads, cfg.head_dim)),
        jnp.bfloat16)
    cv = jnp.zeros_like(ck)
    x = jnp.asarray(rng.standard_normal((B, 1, cfg.hidden_size)),
                    jnp.float16)
    slots = jnp.arange(B, dtype=jnp.int32)
    lengths = jnp.full((B,), S, jnp.int32)
    out_ref, _, _ = model.decode_step(x, ck, cv, slots, lengths)
    ck_tp = jax.device_put(ck, tpm.kv_cache_sharding())
    cv_tp = jax.device_put(cv, tpm.kv_cache_sharding())
    out_tp, _, _ = tpm.decode_step(x, ck_tp, cv_tp, slots, lengths)
    assert_close(np.asarray(out_tp, np.float32),
                 np.asarray(out_ref, np.float32), rtol=5e-2, atol=0.05)
