"""Shared constants + torch reference for the learned-weights perplexity
fixture (single source of truth — scripts/make_ppl_fixture.py,
scripts/eval_ppl_fixture.py and tests/test_perplexity_real.py all import
this; a drifted copy fails only at state-dict load time, far from the
cause)."""
import numpy as np

CFG = dict(hidden_size=256, intermediate_size=512, num_attention_heads=4,
           num_key_value_heads=2, num_hidden_layers=2, vocab_size=256,
           max_position_embeddings=512)


def torch_fp16_ppl(state, tokens) -> float:
    """Next-token perplexity of the fixture state dict through torch
    (labels == input_ids: HF CausalLM shifts internally — the same
    contract as models.perplexity; see docs/QualityEval.md lesson)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    cfg = LlamaConfig(**CFG, tie_word_embeddings=False,
                      attention_bias=False, mlp_bias=False)
    model = LlamaForCausalLM(cfg)
    model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v, np.float32))
         for k, v in state.items()}, strict=False)
    model.eval()
    tot, cnt = 0.0, 0
    with torch.no_grad():
        for row in tokens:
            t = torch.from_numpy(np.asarray(row, np.int64))[None]
            out = model(input_ids=t, labels=t)
            tot += out.loss.item() * (row.shape[0] - 1)
            cnt += row.shape[0] - 1
    return float(np.exp(tot / cnt))
