"""Sliding-window attention (Mistral/Mixtral-v0.1 checkpoints).

Golden: a live-transformers Mistral with sliding_window=8 vs our imported
QuantLlama at the SAME effective (RTN-dequantized) weights — mask parity
is visible with random weights because windowing changes the attended
SET, not just the distribution. Plus internal consistency: prefill +
decode_step chains equal the one-shot forward under a window, and the
un-windowed paths raise loudly.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

_PROJS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj",
          "down_proj")
_CFG = dict(hidden_size=128, intermediate_size=256, num_attention_heads=4,
            num_key_value_heads=2, num_hidden_layers=2, vocab_size=64,
            max_position_embeddings=128, sliding_window=8)


def _fresh_hf():
    from transformers import MistralConfig, MistralForCausalLM
    torch.manual_seed(5)
    return MistralForCausalLM(MistralConfig(**_CFG,
                                            tie_word_embeddings=False))


@pytest.fixture(scope="module")
def state():
    m = _fresh_hf()
    return {k: v.detach().numpy().astype(np.float16)
            for k, v in m.state_dict().items()}


@pytest.fixture(scope="module")
def hf_dequant_twin(state):
    from bitblas_tpu.quantization.gptq import rtn_quantize
    sd = {k: torch.from_numpy(np.asarray(v, np.float32))
          for k, v in state.items()}
    for k in list(sd):
        if any(p in k for p in _PROJS):
            dq = rtn_quantize(state[k].astype(np.float32), bits=4,
                              group_size=64).dequantize()
            sd[k] = torch.from_numpy(np.asarray(dq, np.float32))
    model = _fresh_hf()
    model.load_state_dict(sd)
    model.eval()
    return model


@pytest.fixture(scope="module")
def quant_lm(state):
    from bitblas_tpu.models import QuantLlamaLM
    from bitblas_tpu.models.quantize_hf import quantize_llama_from_hf_fp16
    model, head = quantize_llama_from_hf_fp16(state, _CFG, method="rtn",
                                              group_size=64)
    assert model.cfg.sliding_window == 8, "importer must carry the window"
    return QuantLlamaLM(model, head)


def test_swa_matches_transformers(quant_lm, hf_dequant_twin):
    toks = np.random.default_rng(7).integers(0, 64, (1, 32))
    ours = np.asarray(quant_lm(jnp.asarray(toks)), np.float32)
    with torch.no_grad():
        golden = hf_dequant_twin(
            torch.from_numpy(toks)).logits.numpy()
    rel = np.linalg.norm(ours - golden) / np.linalg.norm(golden)
    assert rel < 0.03, f"sliding-window mask drift: rel {rel:.4f}"
    # near-tie logits can flip argmax under fp16-vs-fp32 arithmetic; a
    # MASK bug (attending outside the window) collapses agreement to
    # chance (~1/64), not to one flipped position
    agree = np.mean(np.argmax(ours, -1) == np.argmax(golden, -1))
    assert agree >= 0.95, f"argmax disagreement: {agree:.2f}"


def test_swa_actually_windows(quant_lm, state):
    """A window-8 model and a full-causal model with the SAME weights must
    diverge once the sequence exceeds the window (else the window is
    silently ignored — the exact bug class this feature closes)."""
    from bitblas_tpu.models import QuantLlamaLM
    from bitblas_tpu.models.quantize_hf import quantize_llama_from_hf_fp16
    cfg_full = dict(_CFG, sliding_window=None)
    model, head = quantize_llama_from_hf_fp16(state, cfg_full,
                                              method="rtn", group_size=64)
    full_lm = QuantLlamaLM(model, head)
    toks = np.random.default_rng(9).integers(0, 64, (1, 32))
    a = np.asarray(quant_lm(jnp.asarray(toks)), np.float32)
    b = np.asarray(full_lm(jnp.asarray(toks)), np.float32)
    # positions <= window see identical prefixes; later ones must differ
    assert np.allclose(a[0, :8], b[0, :8], atol=1e-2)
    assert np.abs(a[0, 16:] - b[0, 16:]).max() > 1e-2


def test_swa_prefill_decode_chain(quant_lm):
    """prefill(P) + decode_step x3 logits == one-shot forward at the same
    positions under the window."""
    model, head = quant_lm.model, quant_lm.head
    cfg = model.cfg
    rng = np.random.default_rng(11)
    toks = rng.integers(0, 64, (1, 20))
    full = np.asarray(quant_lm(jnp.asarray(toks)), np.float32)

    P = 17
    x = head.embed_tokens(jnp.asarray(toks[:, :P]))
    prefill = model.make_prefill(P)
    h, ks, vs = prefill(x, jnp.arange(P)[None])
    Lmax = 32
    L = cfg.num_layers
    ck = jnp.zeros((L, 1, Lmax, cfg.num_kv_heads, cfg.head_dim),
                   jnp.float16)
    cv = jnp.zeros_like(ck)
    for li in range(L):
        ck = ck.at[li, 0, :P].set(ks[li].astype(jnp.float16))
        cv = cv.at[li, 0, :P].set(vs[li].astype(jnp.float16))
    slots = jnp.zeros((1,), jnp.int32)
    outs = []
    for i in range(P, 20):
        xt = head.embed_tokens(jnp.asarray(toks[:, i:i + 1]))
        lengths = jnp.full((1,), i, jnp.int32)
        h1, ck, cv = model.decode_step(xt, ck, cv, slots, lengths)
        outs.append(np.asarray(head.logits(h1), np.float32)[:, 0])
    chain = np.stack(outs, axis=1)
    np.testing.assert_allclose(chain, full[:, P:20], rtol=0.05, atol=0.15)


def test_paged_window_matches_slot():
    """Paged decode under a window equals the slot-cache windowed decode
    for the same logical sequences (identity block table)."""
    from bitblas_tpu.serving.kv_cache import (decode_attention,
                                              decode_attention_paged)
    rng = np.random.default_rng(23)
    B, L, Hkv, H, D, bs = 2, 128, 2, 4, 128, 16
    ck = jnp.asarray(rng.standard_normal((B, L, Hkv, D)), jnp.float16)
    cv = jnp.asarray(rng.standard_normal((B, L, Hkv, D)), jnp.float16)
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float16)
    lengths = jnp.asarray([40, 128], jnp.int32)
    slots = jnp.arange(B, dtype=jnp.int32)
    MB = L // bs
    pk = ck.reshape(B * MB, bs, Hkv, D)
    pv = cv.reshape(B * MB, bs, Hkv, D)
    tables = jnp.arange(B * MB, dtype=jnp.int32).reshape(B, MB)
    for window in (32, 100):
        a = decode_attention(q, ck, cv, slots, lengths, num_heads=H,
                             use_flash=False, window=window)
        b = decode_attention_paged(q, pk, pv, tables, lengths,
                                   num_heads=H, window=window)
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_swa_quant_kv_matches_float():
    """int8-KV decode under a window tracks the float path (quantization
    noise only — a mask bug would diverge structurally)."""
    from bitblas_tpu.serving.kv_cache import (decode_attention,
                                              decode_attention_quant,
                                              quantize_kv)
    rng = np.random.default_rng(13)
    B, rows, L, Hkv, H, D = 3, 4, 256, 2, 4, 128
    ck = jnp.asarray(rng.standard_normal((rows, L, Hkv, D)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((rows, L, Hkv, D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float16)
    slots = jnp.asarray([0, 1, 3], jnp.int32)
    lengths = jnp.asarray([50, 130, 256], jnp.int32)
    kq, ks = quantize_kv(ck)
    vq, vs = quantize_kv(cv)
    for window in (64, 200):
        f = decode_attention(q, ck.astype(jnp.float16),
                             cv.astype(jnp.float16), slots, lengths,
                             num_heads=H, use_flash=False, window=window)
        qn = decode_attention_quant(q, kq, vq, ks, vs, slots, lengths,
                                    num_heads=H, use_flash=False,
                                    window=window)
        qf = decode_attention_quant(q, kq, vq, ks, vs, slots, lengths,
                                    num_heads=H, use_flash=True,
                                    window=window)
        np.testing.assert_allclose(np.asarray(qn, np.float32),
                                   np.asarray(f, np.float32),
                                   rtol=0.1, atol=0.1)
        np.testing.assert_allclose(np.asarray(qf, np.float32),
                                   np.asarray(qn, np.float32),
                                   rtol=2e-2, atol=2e-2)


def test_flash_decode_window_matches_xla():
    """Windowed flash-decode kernel (kv_lo masking + clamped index maps)
    vs the exact XLA windowed decode attention, across lengths that put
    the window boundary inside / between KV blocks and below the window."""
    from bitblas_tpu.serving.kv_cache import decode_attention
    rng = np.random.default_rng(3)
    B, rows, L, Hkv, H, D = 4, 6, 512, 2, 4, 128
    ck = jnp.asarray(rng.standard_normal((rows, L, Hkv, D)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((rows, L, Hkv, D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, H, D)), jnp.float16)
    slots = jnp.asarray([0, 2, 3, 5], jnp.int32)
    # window 100: boundary mid-block; lengths below window, at block edges
    lengths = jnp.asarray([37, 100, 257, 512], jnp.int32)
    for window in (100, 64, 512):
        a = decode_attention(q, ck, cv, slots, lengths, num_heads=H,
                             use_flash=True, window=window)
        b = decode_attention(q, ck, cv, slots, lengths, num_heads=H,
                             use_flash=False, window=window)
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-2, atol=2e-2)
    # window=None must equal full decode (regression on the plumbing)
    a = decode_attention(q, ck, cv, slots, lengths, num_heads=H,
                         use_flash=True, window=None)
    b = decode_attention(q, ck, cv, slots, lengths, num_heads=H,
                         use_flash=False, window=None)
    np.testing.assert_allclose(np.asarray(a, np.float32),
                               np.asarray(b, np.float32), rtol=2e-2,
                               atol=2e-2)


def _naive_windowed(Q, K, V, window):
    import math
    B, S, H, D = Q.shape
    group = H // K.shape[2]
    k_ = np.repeat(np.asarray(K, np.float32), group, axis=2)
    v_ = np.repeat(np.asarray(V, np.float32), group, axis=2)
    s = np.einsum("bqhd,bkhd->bhqk", np.asarray(Q, np.float32), k_)
    s = s / math.sqrt(D)
    qi = np.arange(S)[:, None]
    kj = np.arange(S)[None, :]
    keep = (qi >= kj) & (kj > qi - window)
    s = np.where(keep, s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", p, v_)


@pytest.mark.parametrize("window,bq,bkv", [
    (64, 128, 128),    # window < block_q: tri_sub disabled, full masks
    (300, 128, 256),   # mid-band boundary, bq != bkv
    (512, 256, 256),   # window == S: must equal plain causal
    (128, 256, 256),   # window == sub-block
])
def test_flash_prefill_window_matches_naive(window, bq, bkv):
    """Banded flash prefill (diagonal-first walk + per-row kv lower
    bound) vs the exact naive windowed attention."""
    from bitblas_tpu.kernels.flash import make_flash_attention
    rng = np.random.default_rng(17)
    B, S, H, Hkv, D = 1, 512, 4, 2, 128
    Q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.float32)
    K = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    V = jnp.asarray(rng.standard_normal((B, S, Hkv, D)), jnp.float32)
    fn = make_flash_attention(batch=B, heads=H, seq_len=S, dim=D,
                              kv_heads=Hkv, causal=True, block_q=bq,
                              block_kv=bkv, window=window,
                              out_dtype=jnp.float32, interpret=True)
    got = np.asarray(fn(Q, K, V), np.float32)
    want = _naive_windowed(Q, K, V, window)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_swa_prefill_uses_flash_and_matches_naive(quant_lm):
    """make_prefill at a flash-eligible seq_len must produce the same
    hidden states as the naive windowed path (the banded kernel is now
    the SWA prefill route)."""
    model, head = quant_lm.model, quant_lm.head
    toks = np.random.default_rng(19).integers(0, 64, (1, 256))
    x = head.embed_tokens(jnp.asarray(toks))
    pos = jnp.arange(256)[None]
    h_flash, ks_f, vs_f = model.make_prefill(256)(x, pos)
    # naive reference path
    from bitblas_tpu.models.quant_llama import layer_forward
    xr = x
    for layer in model.layers:
        xr, _, _ = layer_forward(layer, xr, pos, return_kv=True,
                                 window=model.cfg.sliding_window)
    np.testing.assert_allclose(np.asarray(h_flash, np.float32),
                               np.asarray(xr, np.float32),
                               rtol=5e-2, atol=5e-2)
