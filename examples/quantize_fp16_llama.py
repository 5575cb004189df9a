"""Quantize a float llama checkpoint and serve it token-in/token-out.

The full in-framework pipeline the reference needs external tooling for:

  fp16 HF-style state dict
    -> models.quantize_llama_from_hf_fp16 (RTN or GPTQ with calibration)
    -> QuantLlamaLM.generate (single stream)
    -> serving.TokenContinuousBatchingEngine (continuous batching + sampling)

Usage: PYTHONPATH=.:$PYTHONPATH python examples/quantize_fp16_llama.py [--cpu] [--gptq]
"""

# --cpu: run on the host CPU (8 virtual devices) instead of the TPU —
# the axon plugin ignores JAX_PLATFORMS, so this must be set in-process
# before the first jax use (CLAUDE.md environment note).
import sys as _sys
if "--cpu" in _sys.argv:
    _sys.argv.remove("--cpu")
    import os as _os
    _os.environ.setdefault("XLA_FLAGS",
                           "--xla_force_host_platform_device_count=8")
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

import time

import numpy as np

from bitblas_tpu.models import QuantLlamaLM, perplexity
from bitblas_tpu.models.quantize_hf import quantize_llama_from_hf_fp16
from bitblas_tpu.serving import TokenContinuousBatchingEngine


def synthetic_fp16_llama_state(cfg: dict, seed: int = 0) -> dict:
    """Random fp16 weights in HF llama state-dict layout (stands in for
    `{k: v for k, v in hf_model.state_dict().items()}` of a real model)."""
    rng = np.random.default_rng(seed)
    H, I = cfg["hidden_size"], cfg["intermediate_size"]
    hd = H // cfg["num_attention_heads"]
    kv, V = cfg["num_key_value_heads"], cfg["vocab_size"]

    def w(n, k, s=0.02):
        return (rng.standard_normal((n, k)) * s).astype(np.float16)

    state = {"model.embed_tokens.weight": w(V, H, 0.05),
             "model.norm.weight": np.ones(H, np.float16),
             "lm_head.weight": w(V, H, 0.05)}
    for i in range(cfg["num_hidden_layers"]):
        b = f"model.layers.{i}"
        for hf, n_, k_ in (("self_attn.q_proj", H, H),
                           ("self_attn.k_proj", kv * hd, H),
                           ("self_attn.v_proj", kv * hd, H),
                           ("self_attn.o_proj", H, H),
                           ("mlp.gate_proj", I, H),
                           ("mlp.up_proj", I, H),
                           ("mlp.down_proj", H, I)):
            state[f"{b}.{hf}.weight"] = w(n_, k_)
        state[f"{b}.input_layernorm.weight"] = np.ones(H, np.float16)
        state[f"{b}.post_attention_layernorm.weight"] = np.ones(
            H, np.float16)
    return state


def main():
    method = "gptq" if "--gptq" in _sys.argv else "rtn"
    cfg = dict(hidden_size=512, intermediate_size=1408,
               num_attention_heads=8, num_key_value_heads=4,
               num_hidden_layers=2, vocab_size=512)
    state = synthetic_fp16_llama_state(cfg)
    rng = np.random.default_rng(1)

    print(f"quantizing fp16 checkpoint -> uint4 grouped ({method})...")
    t0 = time.perf_counter()
    calib = rng.integers(0, cfg["vocab_size"], (4, 64))
    model, head = quantize_llama_from_hf_fp16(
        state, cfg, method=method,
        calib_tokens=calib if method == "gptq" else None)
    print(f"  quantized in {time.perf_counter() - t0:.1f}s")

    lm = QuantLlamaLM(model, head)
    toks = rng.integers(0, cfg["vocab_size"], (2, 64))
    print(f"  perplexity over random eval tokens: "
          f"{perplexity(lm, toks):.2f}")

    print("single-stream generate (greedy):")
    out = lm.generate(rng.integers(0, cfg["vocab_size"], 8),
                      max_new_tokens=8)
    print(f"  {out.tolist()}")

    if method == "gptq":
        # The same checkpoint quantized twice: RTN as the cheap draft,
        # GPTQ as the target — speculative decoding with provably
        # identical greedy output to the target alone.
        from bitblas_tpu.models import speculative_generate_cached
        draft_model, _ = quantize_llama_from_hf_fp16(state, cfg,
                                                     method="rtn")
        draft = QuantLlamaLM(draft_model, head)
        prompt = rng.integers(0, cfg["vocab_size"], 8)
        ref = lm.generate(prompt, max_new_tokens=12)
        out_spec, st = speculative_generate_cached(
            lm, draft, prompt, max_new_tokens=12, gamma=4,
            return_stats=True)
        print(f"speculative (RTN draft -> GPTQ target): greedy match="
              f"{np.array_equal(out_spec, ref)}, "
              f"{st.tokens} tokens in {st.target_calls} target passes "
              f"(accept={st.acceptance_rate:.2f})")

    print("continuous batching (token-in/token-out, mixed sampling):")
    eng = TokenContinuousBatchingEngine(model, head, num_slots=4,
                                        max_seq_len=64)
    reqs = [eng.submit_tokens(
        uid=i, tokens=rng.integers(0, cfg["vocab_size"], 4 + 2 * i),
        max_new=8, temperature=0.8 if i % 2 else 0.0, top_k=16, seed=i)
        for i in range(6)]
    t0 = time.perf_counter()
    eng.run_to_completion()
    dt = time.perf_counter() - t0
    toks_out = sum(len(r.out_tokens) for r in reqs)
    for r in reqs[:3]:
        print(f"  req {r.uid}: {r.out_tokens}")
    print(f"  served {len(reqs)} requests / {toks_out} tokens in {dt:.2f}s")


if __name__ == "__main__":
    main()
