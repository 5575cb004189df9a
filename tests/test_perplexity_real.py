"""Quality bar on learned weights (VERDICT r4 item 2).

The fixture (tests/golden/ppl_llama_tiny.npz) is a byte-level HF llama
TRAINED on this repo's docs (scripts/make_ppl_fixture.py) — learned weight
statistics (outliers, anisotropic activations), not random init. Egress is
blocked, so this stands in for a published checkpoint; the recorded
numbers live in docs/QualityEval.md.

Asserts the BASELINE "perplexity match at same bit-width" contract:
4-bit GPTQ perplexity stays within a small factor of the fp16 twin, and
GPTQ (calibrated) does not lose to data-free RTN.
"""
import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "golden",
                   "ppl_llama_tiny.npz")
TOK = os.path.join(os.path.dirname(__file__), "golden",
                   "ppl_eval_tokens.npz")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(FIX) and os.path.exists(TOK)),
    reason="perplexity fixture not built (scripts/make_ppl_fixture.py)")

from ppl_fixture_common import CFG, torch_fp16_ppl  # noqa: E402


@pytest.fixture(scope="module")
def fixture():
    z = np.load(FIX)
    state = {k: z[k] for k in z.files}
    t = np.load(TOK)
    return state, t["tokens"], t["calib"]


def _ours_ppl(state, tokens, method, calib):
    from bitblas_tpu.models.hf_import import QuantLlamaLM, perplexity
    from bitblas_tpu.models.quantize_hf import quantize_llama_from_hf_fp16
    model, head = quantize_llama_from_hf_fp16(
        state, CFG, method=method, group_size=64,
        calib_tokens=calib if method == "gptq" else None)
    return perplexity(QuantLlamaLM(model, head), tokens, chunk=4)


def test_gptq_perplexity_matches_fp16(fixture):
    state, tokens, calib = fixture
    # subset for CI speed; eval_ppl_fixture.py records the full numbers
    toks = tokens[:6]
    p_fp16 = torch_fp16_ppl(state, toks)
    p_gptq = _ours_ppl(state, toks, "gptq", calib[:8])
    assert p_fp16 > 1.0
    # trained model must actually have learned (far below uniform=256)
    assert p_fp16 < 64.0, f"fixture did not learn: ppl {p_fp16}"
    # 4-bit GPTQ quality bar: within 10% relative perplexity
    assert p_gptq / p_fp16 < 1.10, (p_gptq, p_fp16)


def test_gptq_not_worse_than_rtn(fixture):
    state, tokens, calib = fixture
    toks = tokens[:6]
    p_rtn = _ours_ppl(state, toks, "rtn", calib)
    p_gptq = _ours_ppl(state, toks, "gptq", calib[:8])
    # calibrated GPTQ should not lose to data-free RTN (small slack for
    # noise at this scale)
    assert p_gptq <= p_rtn * 1.02, (p_gptq, p_rtn)
