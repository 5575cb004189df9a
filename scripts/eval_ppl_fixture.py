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

sys.path.insert(0, "/root/repo/tests")
from ppl_fixture_common import CFG, torch_fp16_ppl  # noqa: E402


def load_state():
    z = np.load(FIX)
    return {k: z[k] for k in z.files}


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
    p_fp16 = torch_fp16_ppl(state, tokens)
    print(f"fp16 twin ppl      : {p_fp16:.4f}", flush=True)
    p_rtn = ours_ppl(state, tokens, "rtn", calib)
    print(f"uint4 RTN  ppl     : {p_rtn:.4f} "
          f"({100*(p_rtn/p_fp16-1):+.2f}%)", flush=True)
    p_gptq = ours_ppl(state, tokens, "gptq", calib)
    print(f"uint4 GPTQ ppl     : {p_gptq:.4f} "
          f"({100*(p_gptq/p_fp16-1):+.2f}%)", flush=True)


if __name__ == "__main__":
    main()
