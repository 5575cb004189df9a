"""Golden parity against a LIVE transformers LlamaForCausalLM.

BASELINE.md demands "perplexity match at same bit-width" against the source
framework (the reference proves its integration by evaluating real AutoGPTQ
checkpoints through torch, integration/pytorch/bitblas_quant_linear.py:33-220).
No published checkpoint is reachable in this environment (zero egress), so
the strongest offline equivalent runs here, in two halves:

  1. CONVENTION golden — load the SAME RTN-dequantized weights into the
     torch model, so both sides compute with identical effective weights:
     any residual gap is pure convention drift (rope pairing, GQA head
     mapping, norm placement, transposes). Measured 0.009 rel = fp16
     arithmetic noise; a convention bug is O(1).
  2. SAME-BIT-WIDTH perplexity match — our int4 model's perplexity vs the
     dequant-matched torch model's on fixed text (the literal BASELINE bar),
     plus the distance to the fp model documented as quantization error
     (0.34 rel on this deliberately grid-hostile random-weight fixture;
     trained checkpoints sit far closer to the grid).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

_CFG = dict(hidden_size=256, intermediate_size=512, num_attention_heads=4,
            num_key_value_heads=2, num_hidden_layers=2, vocab_size=128,
            max_position_embeddings=256, rope_theta=10000.0)
_PROJS = ("q_proj", "k_proj", "v_proj", "o_proj",
          "gate_proj", "up_proj", "down_proj")


def _fresh_hf():
    from transformers import LlamaConfig, LlamaForCausalLM
    cfg = LlamaConfig(**_CFG, tie_word_embeddings=False,
                      attention_bias=False, mlp_bias=False)
    return LlamaForCausalLM(cfg)


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(7)
    model = _fresh_hf()
    # Redraw at 1/sqrt(fan_in) (HF's default 0.02-std init yields
    # near-uniform logits, which would let convention bugs hide inside a
    # flat perplexity); norms stay at their identity ones-init.
    g = torch.Generator().manual_seed(7)
    sd = model.state_dict()
    for k, v in sd.items():
        if "norm" in k:
            continue
        sd[k] = torch.randn(v.shape, generator=g) / (v.shape[-1] ** 0.5)
    model.load_state_dict(sd)
    model.eval()
    return model


@pytest.fixture(scope="module")
def state(hf_model):
    return {k: v.detach().numpy().astype(np.float16)
            for k, v in hf_model.state_dict().items()}


@pytest.fixture(scope="module")
def hf_dequant_twin(state):
    """The torch model carrying OUR RTN grid's dequantized projections —
    the same-effective-weights reference for convention and same-bit-width
    perplexity checks."""
    from bitblas_tpu.quantization.gptq import rtn_quantize
    sd = {k: torch.from_numpy(np.asarray(v, np.float32))
          for k, v in state.items()}
    for k in list(sd):
        if any(p in k for p in _PROJS):
            dq = rtn_quantize(state[k].astype(np.float32), bits=4,
                              group_size=128).dequantize()
            sd[k] = torch.from_numpy(np.asarray(dq, np.float32))
    model = _fresh_hf()
    model.load_state_dict(sd)
    model.eval()
    return model


@pytest.fixture(scope="module")
def quant_lm(state):
    from bitblas_tpu.models import QuantLlamaLM
    from bitblas_tpu.models.quantize_hf import quantize_llama_from_hf_fp16
    model, head = quantize_llama_from_hf_fp16(state, _CFG, method="rtn")
    return QuantLlamaLM(model, head)


@pytest.fixture(scope="module")
def fixed_tokens():
    rng = np.random.default_rng(23)
    return rng.integers(0, _CFG["vocab_size"], (4, 64))


def _torch_logits(model, toks):
    with torch.no_grad():
        return model(torch.from_numpy(np.asarray(toks))).logits.numpy()


def _torch_ppl(model, toks):
    toks = np.asarray(toks)
    logits = _torch_logits(model, toks[:, :-1])
    logp = torch.log_softmax(torch.from_numpy(logits).float(), dim=-1)
    tgt = torch.from_numpy(toks[:, 1:]).long()
    nll = -torch.gather(logp, -1, tgt[..., None])
    return float(torch.exp(nll.mean()))


def test_conventions_match_transformers(quant_lm, hf_dequant_twin,
                                        fixed_tokens):
    # Identical effective weights on both sides: the only remaining
    # differences are arithmetic (our fp16 activations vs torch fp32).
    # Measured 0.009 rel; any rope/GQA/transpose bug is O(1).
    toks = fixed_tokens[:1, :32]
    ours = np.asarray(quant_lm(jnp.asarray(toks)), np.float32)
    golden = _torch_logits(hf_dequant_twin, toks)
    rel = np.linalg.norm(ours - golden) / np.linalg.norm(golden)
    assert rel < 0.03, f"convention drift: rel {rel:.4f}"
    agree = np.mean(np.argmax(ours, -1) == np.argmax(golden, -1))
    assert agree == 1.0, f"argmax disagreement at same weights: {agree:.2f}"


def test_same_bitwidth_perplexity_match(quant_lm, hf_model, hf_dequant_twin,
                                        fixed_tokens):
    """The BASELINE.md bar, literally: our int4 model's perplexity equals
    the source framework's at the same bit-width (same dequant grid)."""
    from bitblas_tpu.models.hf_import import perplexity
    ppl_ours = perplexity(quant_lm, fixed_tokens)
    ppl_torch_q = _torch_ppl(hf_dequant_twin, fixed_tokens)
    rel = abs(ppl_ours - ppl_torch_q) / ppl_torch_q
    assert rel < 0.02, (f"same-bit-width ppl mismatch: ours {ppl_ours:.4f} "
                        f"vs torch-int4 {ppl_torch_q:.4f} (rel {rel:.4f})")
    # Document the fp distance too: on grid-hostile random weights the
    # 4-bit quantization penalty is real but bounded — a wiring bug (wrong
    # scales, swapped zeros) blows this up by orders of magnitude.
    ppl_fp = _torch_ppl(hf_model, fixed_tokens)
    assert abs(np.log(ppl_ours) - np.log(ppl_fp)) < 1.0, (ppl_ours, ppl_fp)


def test_gptq_import_conventions(state, hf_dequant_twin, fixed_tokens):
    # The GPTQ driver path shares the wiring; pin that it also lands within
    # quantization error of the fp golden and produces finite perplexity.
    from bitblas_tpu.models import QuantLlamaLM
    from bitblas_tpu.models.hf_import import perplexity
    from bitblas_tpu.models.quantize_hf import quantize_llama_from_hf_fp16
    model, head = quantize_llama_from_hf_fp16(
        state, _CFG, method="gptq", calib_tokens=fixed_tokens)
    lm = QuantLlamaLM(model, head)
    ppl = perplexity(lm, fixed_tokens)
    ppl_rtn = _torch_ppl(hf_dequant_twin, fixed_tokens)
    # GPTQ minimizes calibration-set output error; on the calibration text
    # it must not be far WORSE than plain RTN.
    assert ppl < ppl_rtn * 1.10, (ppl, ppl_rtn)
