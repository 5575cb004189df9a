"""Build the real-weights perplexity fixture (VERDICT r4 item 2).

Egress is blocked, so no published checkpoint can be vendored. The next
best evidence for the BASELINE "perplexity match at same bit-width" bar is
a model with genuinely LEARNED weights (outlier structure, anisotropic
activations — what GPTQ calibration actually exercises), produced here by
training a tiny byte-level HF `LlamaForCausalLM` on this repo's own docs
(deterministic corpus, committed with the repo).

Outputs (committed):
  tests/golden/ppl_llama_tiny.npz   — fp16 HF-format state dict
  tests/golden/ppl_eval_tokens.npz  — held-out byte tokens for eval
Run `python scripts/eval_ppl_fixture.py` to (re)produce the numbers in
docs/QualityEval.md; tests/test_perplexity_real.py asserts the bound.
"""
import glob
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

sys.path.insert(0, "/root/repo/tests")
from ppl_fixture_common import CFG  # noqa: E402
SEQ = 256
STEPS = 1200
BATCH = 16


def corpus() -> bytes:
    parts = []
    for p in sorted(glob.glob("/root/repo/docs/*.md")) + [
            "/root/repo/README.md", "/root/repo/SURVEY.md"]:
        with open(p, "rb") as f:
            parts.append(f.read())
    return b"\n".join(parts)


def main():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    data = np.frombuffer(corpus(), dtype=np.uint8).astype(np.int64)
    n_val = 16 * SEQ
    train, val = data[:-n_val], data[-n_val:]
    print(f"corpus: {len(data)} bytes ({len(train)} train / {n_val} val)")

    cfg = LlamaConfig(**CFG, tie_word_embeddings=False,
                      attention_bias=False, mlp_bias=False)
    model = LlamaForCausalLM(cfg)
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=3e-4, weight_decay=0.01)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=STEPS)
    rng = np.random.default_rng(0)

    for step in range(STEPS):
        idx = rng.integers(0, len(train) - SEQ - 1, BATCH)
        x = np.stack([train[i:i + SEQ + 1] for i in idx])
        toks = torch.from_numpy(x)
        # labels == input_ids: HF CausalLM SHIFTS INTERNALLY. Passing
        # pre-shifted labels trains a predict-two-ahead model (r5 bug:
        # standard next-token perplexity then reads near-uniform ~180
        # while the double-shifted torch eval hides it at ~12).
        out = model(input_ids=toks[:, :-1], labels=toks[:, :-1])
        opt.zero_grad()
        out.loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        sched.step()
        if step % 100 == 0 or step == STEPS - 1:
            print(f"step {step}: loss {out.loss.item():.4f} "
                  f"(ppl {np.exp(out.loss.item()):.2f})", flush=True)

    model.eval()
    state = {k: v.detach().to(torch.float16).numpy()
             for k, v in model.state_dict().items()
             if "rotary_emb.inv_freq" not in k}
    np.savez_compressed("/root/repo/tests/golden/ppl_llama_tiny.npz",
                        **state)
    val_tok = val.reshape(16, SEQ).astype(np.int32)
    np.savez_compressed("/root/repo/tests/golden/ppl_eval_tokens.npz",
                        tokens=val_tok,
                        calib=np.stack([train[i:i + SEQ] for i in
                                        rng.integers(0, len(train) - SEQ,
                                                     16)]).astype(np.int32))
    import os
    for f in ("ppl_llama_tiny.npz", "ppl_eval_tokens.npz"):
        p = f"/root/repo/tests/golden/{f}"
        print(f"{f}: {os.path.getsize(p)/1e6:.2f} MB")


if __name__ == "__main__":
    main()
