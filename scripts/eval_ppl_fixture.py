"""Evaluate the real-weights perplexity fixture (VERDICT r4 item 2).

Loads the trained byte-llama fixture (scripts/make_ppl_fixture.py), runs:
  * fp16 reference perplexity (torch LlamaForCausalLM forward)
  * our 4-bit RTN QuantLlamaLM perplexity
  * our 4-bit GPTQ QuantLlamaLM perplexity (calibrated on train text)
on the held-out tokens, and prints the table recorded in
docs/QualityEval.md. tests/test_perplexity_real.py asserts the bounds.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

FIX = "/root/repo/tests/golden/ppl_llama_tiny.npz"
TOK = "/root/repo/tests/golden/ppl_eval_tokens.npz"

CFG = dict(hidden_size=256, intermediate_size=512, num_attention_heads=4,
           num_key_value_heads=2, num_hidden_layers=2, vocab_size=256,
           max_position_embeddings=512)


def load_state():
    z = np.load(FIX)
    return {k: z[k] for k in z.files}


def torch_ppl(state, tokens) -> float:
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    cfg = LlamaConfig(**CFG, tie_word_embeddings=False,
                      attention_bias=False, mlp_bias=False)
    model = LlamaForCausalLM(cfg)
    sd = {k: torch.from_numpy(v.astype(np.float32)) for k, v in
          state.items()}
    model.load_state_dict(sd, strict=False)
    model.eval()
    losses, count = 0.0, 0
    with torch.no_grad():
        for row in tokens:
            t = torch.from_numpy(row.astype(np.int64))[None]
            # labels == input_ids: HF shifts internally (standard
            # next-token NLL, the same contract as models.perplexity)
            out = model(input_ids=t, labels=t)
            n = row.shape[0] - 1
            losses += out.loss.item() * n
            count += n
    return float(np.exp(losses / count))


def ours_ppl(state, tokens, method, calib) -> float:
    from bitblas_tpu.models.hf_import import QuantLlamaLM, perplexity
    from bitblas_tpu.models.quantize_hf import quantize_llama_from_hf_fp16
    model, head = quantize_llama_from_hf_fp16(
        state, CFG, method=method, group_size=64,
        calib_tokens=calib if method == "gptq" else None)
    lm = QuantLlamaLM(model, head)
    return float(perplexity(lm, tokens, chunk=4))


def main():
    state = load_state()
    z = np.load(TOK)
    tokens, calib = z["tokens"], z["calib"]
    p_fp16 = torch_ppl(state, tokens)
    print(f"fp16 twin ppl      : {p_fp16:.4f}", flush=True)
    p_rtn = ours_ppl(state, tokens, "rtn", calib)
    print(f"uint4 RTN  ppl     : {p_rtn:.4f} "
          f"({100*(p_rtn/p_fp16-1):+.2f}%)", flush=True)
    p_gptq = ours_ppl(state, tokens, "gptq", calib)
    print(f"uint4 GPTQ ppl     : {p_gptq:.4f} "
          f"({100*(p_gptq/p_fp16-1):+.2f}%)", flush=True)


if __name__ == "__main__":
    main()
