"""Speculative decoding: a cheap draft model proposes, the target verifies.

Decode is HBM-bandwidth-bound — every generated token re-streams the
quantized weights for M=1. Speculation turns `gamma` draft tokens into ONE
target pass at M = prefix+gamma, which streams the target's weights once
per *burst* instead of once per token; on TPU the extra rows ride the MXU
at the same weight-ingest cost (CLAUDE.md: skinny extra rows are nearly
free). Typical drafts: the same checkpoint quantized harder (e.g. the
int2/BitNet path drafting for the uint4 target), or a smaller model.

Acceptance follows Leviathan et al. 2023:
  * temperature=0 (greedy): accept draft tokens while they equal the
    target argmax — the output is PROVABLY identical to target-only
    greedy decoding (the property the tests pin).
  * temperature>0: standard rejection sampling — accept with probability
    min(1, p_target/p_draft); on rejection, resample from the residual
    max(0, p_t - p_d) distribution. The output distribution equals
    target-only sampling.

`speculative_generate` verifies with a full forward over the current
sequence (simple, works for any tokens->logits callable);
`speculative_generate_cached` is the production variant — both models keep
slot KV caches and each verify round is one `QuantLlama.decode_chunk`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class SpecStats:
    """Acceptance telemetry: `accepted`/`proposed` is the expected speedup
    lever; `target_calls` vs tokens generated is the realized ratio."""
    proposed: int = 0
    accepted: int = 0
    target_calls: int = 0
    draft_calls: int = 0
    tokens: int = 0
    rounds: List[int] = field(default_factory=list)

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / max(self.proposed, 1)


def _softmax(z: np.ndarray, temperature: float) -> np.ndarray:
    z = z.astype(np.float64) / max(temperature, 1e-8)
    z = z - z.max()
    p = np.exp(z)
    return p / p.sum()


def speculative_generate(target_lm, draft_lm, prompt_tokens,
                         max_new_tokens: int = 32, *, gamma: int = 4,
                         temperature: float = 0.0,
                         eos_token_id: Optional[int] = None, seed: int = 0,
                         return_stats: bool = False):
    """Generate with draft/verify speculation.

    target_lm / draft_lm: tokens->logits callables over [B, S] int arrays
    (e.g. `QuantLlamaLM`). Returns the full token sequence [S + new] int32
    (and the `SpecStats` when return_stats=True).
    """
    if gamma < 1:
        raise ValueError("gamma must be >= 1")
    toks = list(np.asarray(prompt_tokens).reshape(-1).astype(np.int32))
    if not toks:
        raise ValueError("prompt_tokens must hold at least one token")
    budget = max_new_tokens
    rng = np.random.default_rng(seed)
    stats = SpecStats()

    def logits_tail(lm, seq: List[int], n: int) -> np.ndarray:
        """Last n rows of lm's next-token logits over seq ([n, V] f32)."""
        out = np.asarray(lm(jnp.asarray(np.asarray(seq, np.int32))[None]),
                         np.float32)
        return out[0, -n:]

    def pick(p_row: np.ndarray) -> int:
        if temperature <= 0.0:
            return int(np.argmax(p_row))
        return int(rng.choice(p_row.shape[0],
                              p=_softmax(p_row, temperature)))

    done = False
    while budget > 0 and not done:
        g = min(gamma, budget)
        # -- draft proposes g tokens autoregressively ----------------------
        draft_seq = list(toks)
        draft_probs = []
        for _ in range(g):
            row = logits_tail(draft_lm, draft_seq, 1)[0]
            stats.draft_calls += 1
            t = pick(row)
            draft_seq.append(t)
            draft_probs.append(
                None if temperature <= 0.0 else _softmax(row, temperature))
        proposal = draft_seq[len(toks):]
        stats.proposed += g

        # -- one target pass scores all g proposals (+ the bonus slot):
        # tgt[i] are the logits AFTER toks + proposal[:i]; tgt[g] is the
        # bonus position after all g proposals.
        tgt = logits_tail(target_lm, draft_seq, g + 1)
        stats.target_calls += 1

        n_accept, replacement = _accept(proposal, tgt, draft_probs,
                                        temperature, rng)
        stats.accepted += n_accept

        new = list(proposal[:n_accept])
        if n_accept < g:
            new.append(replacement)          # corrected token (free)
        elif budget - len(new) > 0:
            new.append(pick(tgt[g]))         # bonus token from the target
        new = new[:budget]
        appended = 0
        for t in new:
            toks.append(int(t))
            budget -= 1
            stats.tokens += 1
            appended += 1
            if eos_token_id is not None and t == eos_token_id:
                done = True
                break
        stats.rounds.append(appended)

    out = np.asarray(toks, np.int32)
    return (out, stats) if return_stats else out


def _accept(proposal, tgt, draft_probs, temperature, rng):
    """Leviathan acceptance sweep: returns (n_accept, replacement-or-None).
    tgt[i] = target logits after the prefix plus proposal[:i]."""
    n_accept = 0
    replacement = None
    for i, t in enumerate(proposal):
        if temperature <= 0.0:
            ok = int(np.argmax(tgt[i])) == t
            if not ok:
                replacement = int(np.argmax(tgt[i]))
        else:
            p_t = _softmax(tgt[i], temperature)
            p_d = draft_probs[i]
            ok = rng.random() < min(1.0, p_t[t] / max(p_d[t], 1e-12))
            if not ok:
                residual = np.maximum(p_t - p_d, 0.0)
                s = residual.sum()
                residual = residual / s if s > 0 else p_t
                replacement = int(rng.choice(residual.shape[0],
                                             p=residual))
        if not ok:
            break
        n_accept += 1
    return n_accept, replacement


class _CachedLM:
    """KV-cached single-slot wrapper over a QuantLlamaLM: logits after any
    prefix without recomputing it. Rollback after a rejected burst is free:
    rows past `lengths` are masked by the attention, and the next chunk
    overwrites them (the slot cache's length masking doubles as the
    speculative rollback)."""

    def __init__(self, lm, prompt_toks: List[int], capacity: int):
        cfg = lm.model.cfg
        self.lm = lm
        S = len(prompt_toks)
        prefill = lm.model.make_prefill(S)
        hidden, ks, vs = prefill(
            lm.head.embed_tokens(jnp.asarray(
                np.asarray(prompt_toks, np.int32))[None]),
            jnp.arange(S)[None])
        shape = (cfg.num_layers, 1, capacity, cfg.num_kv_heads,
                 cfg.head_dim)
        self.ck = jnp.zeros(shape, hidden.dtype).at[:, 0, :S].set(
            jnp.stack(list(ks)).astype(hidden.dtype))
        self.cv = jnp.zeros(shape, hidden.dtype).at[:, 0, :S].set(
            jnp.stack(list(vs)).astype(hidden.dtype))
        self.cached = S          # positions [0, cached) hold real tokens
        # jit with donated caches: eager decode_chunk would copy the whole
        # cache 2*num_layers times per call; shapes (chunk length T)
        # recompile once each and recur (T=1 drafting, T=gamma+1 verify).
        from ..utils.lift import jit_lifted
        self._decode = jit_lifted(lm.model.decode_chunk, lm.model,
                                  donate_argnums=(1, 2))

    def logits_after(self, seq: List[int], n: int) -> np.ndarray:
        """[n, V] logits rows: row i is the distribution after the prefix
        seq[:len(seq)-n+1+i] (i.e. the hidden rows of inputs seq[-n:]).

        One decode_chunk over seq[start:], where start covers both the
        first still-uncached position (no K/V gap) and the first hidden
        row requested; replayed tokens overwrite their own K/V rows
        idempotently."""
        lm = self.lm
        start = min(self.cached, len(seq) - n)
        chunk = seq[start:]
        x = lm.head.embed_tokens(jnp.asarray(
            np.asarray(chunk, np.int32))[None])
        hidden, self.ck, self.cv = self._decode(
            x, self.ck, self.cv, jnp.zeros((1,), jnp.int32),
            jnp.asarray([start], jnp.int32))
        self.cached = len(seq)
        out = np.asarray(lm.head.logits(hidden.astype(jnp.float32)),
                         np.float32)[0]
        return out[-n:]

    def rollback(self, n_valid: int) -> None:
        """Keep only the first n_valid tokens' K/V as authoritative."""
        self.cached = min(self.cached, n_valid)


def speculative_generate_cached(target_lm, draft_lm, prompt_tokens,
                                max_new_tokens: int = 32, *, gamma: int = 4,
                                temperature: float = 0.0,
                                eos_token_id: Optional[int] = None,
                                seed: int = 0,
                                return_stats: bool = False):
    """KV-cached speculative generation over two `QuantLlamaLM`s.

    Same acceptance semantics as `speculative_generate` (greedy output
    identical to target-only greedy), but both models keep slot KV caches:
    each verify round is ONE `decode_chunk` over the g proposals (+ the
    replayed last token) instead of a full-prefix forward, and each draft
    token is one cached `decode_chunk(T=1)`. Rejection rollback costs
    nothing — stale rows sit past the length mask and are overwritten next
    round.
    """
    if gamma < 1:
        raise ValueError("gamma must be >= 1")
    toks = list(np.asarray(prompt_tokens).reshape(-1).astype(np.int32))
    toks = [int(t) for t in toks]
    if not toks:
        raise ValueError("prompt_tokens must hold at least one token")
    budget = max_new_tokens
    rng = np.random.default_rng(seed)
    stats = SpecStats()
    capacity = len(toks) + max_new_tokens + gamma + 1
    tgt_c = _CachedLM(target_lm, toks, capacity)
    drf_c = _CachedLM(draft_lm, toks, capacity)

    def pick(row: np.ndarray) -> int:
        if temperature <= 0.0:
            return int(np.argmax(row))
        return int(rng.choice(row.shape[0], p=_softmax(row, temperature)))

    done = False
    while budget > 0 and not done:
        g = min(gamma, budget)
        draft_seq = list(toks)
        draft_probs = []
        for _ in range(g):
            row = drf_c.logits_after(draft_seq, 1)[0]
            stats.draft_calls += 1
            t = pick(row)
            draft_seq.append(t)
            draft_probs.append(
                None if temperature <= 0.0 else _softmax(row, temperature))
        proposal = draft_seq[len(toks):]
        stats.proposed += g

        tgt = tgt_c.logits_after(draft_seq, g + 1)
        stats.target_calls += 1

        n_accept, replacement = _accept(proposal, tgt, draft_probs,
                                        temperature, rng)
        stats.accepted += n_accept

        new = list(proposal[:n_accept])
        if n_accept < g:
            new.append(replacement)
        elif budget - len(new) > 0:
            new.append(pick(tgt[g]))
        new = new[:budget]
        appended = 0
        for t in new:
            toks.append(int(t))
            budget -= 1
            stats.tokens += 1
            appended += 1
            if eos_token_id is not None and t == eos_token_id:
                done = True
                break
        stats.rounds.append(appended)
        # accepted proposal tokens' K/V are already cached and valid; the
        # replacement/bonus token is not — its K/V lands on the next replay
        tgt_c.rollback(len(toks) - 1)
        drf_c.rollback(len(toks) - 1)

    out = np.asarray(toks, np.int32)
    return (out, stats) if return_stats else out
