"""Import a HuggingFace-transformers GPTQ llama checkpoint into QuantLlama.

The reference integrates with AutoGPTQ checkpoints through a torch module
swap (/root/reference/integration/pytorch/bitblas_quant_linear.py:33-220:
`BitBLASQuantLinear` consumes CudaOldQuantLinear tensors in place). The
TPU-native equivalent is a one-shot offline import: map the HF state-dict
names (`model.layers.{i}.self_attn.q_proj.qweight` ...) onto QuantLlama's
seven fused projections, repack every GPTQ tensor bundle into the device
slot layout (graph.repack_gptq_layer), and return a ready-to-serve model —
after import there is no torch anywhere on the hot path.

Accepts torch tensors, numpy arrays, or jax arrays as state-dict values.
Rejects act-order (`desc_act=True`) checkpoints loudly: their `g_idx` is a
K-permutation that the grouped-scale kernel layout does not represent.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import get_logger
from ..graph import repack_gptq_layer
from ..ops.matmul_config import MatmulConfig
from .quant_llama import LlamaConfig, QuantLlama, rmsnorm

logger = get_logger()

# HF projection name -> (our name, in-dim attr, out-dim attr)
_HF_PROJS = (
    ("self_attn.q_proj", "q"),
    ("self_attn.k_proj", "k"),
    ("self_attn.v_proj", "v"),
    ("self_attn.o_proj", "o"),
    ("mlp.gate_proj", "gate"),
    ("mlp.up_proj", "up"),
    ("mlp.down_proj", "down"),
)


def _lm_head_weight(state: Mapping) -> np.ndarray:
    """lm_head tensor, falling back to the tied embedding matrix
    (Qwen2-small / many chat finetunes ship no lm_head.weight)."""
    if "lm_head.weight" in state:
        return _np(state["lm_head.weight"])
    return _np(state["model.embed_tokens.weight"])


def _np(t) -> np.ndarray:
    """torch / jax / numpy -> numpy (torch tensors detach via .cpu())."""
    if hasattr(t, "detach"):  # torch
        t = t.detach().cpu()
        try:
            return t.numpy()
        except TypeError:  # numpy-incompatible dtype (torch.bfloat16)
            return t.float().numpy()
    return np.asarray(t)


def rope_scaling_from_hf(get) -> Optional[dict]:
    """Validate + normalize a HF config's rope_scaling (shared by the
    llama and mixtral importers): None/default pass through, llama3 is
    supported, anything else raises loudly — silently dropping scaling
    makes long-context logits drift from the source model."""
    scaling = get("rope_scaling", None)
    if scaling is None:
        return None
    if not isinstance(scaling, Mapping):
        scaling = dict(scaling.__dict__)
    rt = scaling.get("rope_type", scaling.get("type", "default"))
    if rt == "default":
        return None
    if rt != "llama3":
        raise ValueError(
            f"rope_scaling type {rt!r} unsupported (only 'llama3'; "
            f"linear/dynamic NTK checkpoints need that formula added "
            f"to quant_llama.llama3_scaled_freqs' family)")
    return dict(scaling)


def llama_config_from_hf(hf_config, *, group_size: int = 128,
                         act_dtype: str = "float16") -> LlamaConfig:
    """Map a transformers LlamaConfig (object or plain dict) onto ours."""
    def get(name, default=None):
        if isinstance(hf_config, Mapping):
            return hf_config.get(name, default)
        return getattr(hf_config, name, default)

    heads = get("num_attention_heads")
    scaling = rope_scaling_from_hf(get)
    sw = (get("sliding_window", None)
          if get("use_sliding_window", True) else None)
    mwl = get("max_window_layers", None)
    if sw is not None and mwl is not None \
            and mwl < get("num_hidden_layers"):
        # Qwen2 semantics: layers >= max_window_layers attend FULLY while
        # lower layers window. Per-layer windows aren't wired; refusing
        # beats silently windowing every layer (logits drift).
        raise NotImplementedError(
            f"max_window_layers={mwl} < num_hidden_layers="
            f"{get('num_hidden_layers')} with an active sliding window: "
            f"per-layer window gating is not implemented")
    return LlamaConfig(
        hidden_size=get("hidden_size"),
        intermediate_size=get("intermediate_size"),
        num_heads=heads,
        num_kv_heads=get("num_key_value_heads", heads) or heads,
        num_layers=get("num_hidden_layers"),
        vocab_size=get("vocab_size"),
        group_size=group_size,
        act_dtype=act_dtype,
        rope_theta=float(get("rope_theta", 10000.0)),
        rope_scaling=scaling,
        # Qwen2-family: biases on q/k/v only. Qwen2 configs do not carry
        # an attention_bias field (the biases are implicit in the arch),
        # so default it from model_type.
        attention_bias=bool(get("attention_bias",
                                get("model_type", "") == "qwen2")),
        rms_norm_eps=float(get("rms_norm_eps", 1e-5)),
        # Mistral-family checkpoints set sliding_window (e.g. 4096);
        # ignoring it would silently attend beyond the window the source
        # model was trained with. use_sliding_window=False (Qwen2-style
        # gate) disables it even when sliding_window is set — matching
        # transformers.
        sliding_window=sw,
    )


def _check_g_idx(state: Mapping, key: str, K: int, group_size: int) -> None:
    g_idx = state.get(f"{key}.g_idx")
    if g_idx is None:
        return
    expect = np.arange(K, dtype=np.int64) // group_size
    if not np.array_equal(_np(g_idx).astype(np.int64), expect):
        raise ValueError(
            f"{key}: non-sequential g_idx (act-order / desc_act checkpoint)."
            f" The TPU grouped-scale layout needs sequential groups; "
            f"re-quantize with desc_act=False or pre-permute K offline")


def load_quant_llama_from_hf_gptq(
    state: Mapping[str, object],
    hf_config,
    *,
    bits: int = 4,
    group_size: int = 128,
    gptq_v2: bool = False,
    opt_m=(1, 16, 256),
    enable_tuning: bool = False,
) -> Tuple[QuantLlama, "LMHead"]:
    """Build a QuantLlama trunk + LMHead from a HF GPTQ llama state dict.

    `state` maps HF names to tensors: per layer the GPTQ bundles
    (`...q_proj.qweight/qzeros/scales` [+ optional trivial g_idx]) and the
    two RMSNorm weights; globally `model.embed_tokens.weight`,
    `model.norm.weight`, `lm_head.weight`. Returns (trunk, lm_head) —
    `QuantLlamaLM` composes them into tokens->logits.
    """
    if bits != 4:
        raise ValueError(f"GPTQ llama import supports 4-bit (got {bits})")
    cfg = llama_config_from_hf(hf_config, group_size=group_size)
    model = QuantLlama(cfg, opt_m=opt_m, enable_tuning=enable_tuning)

    for i, layer in enumerate(model.layers):
        base = f"model.layers.{i}"
        for hf_name, ours in _HF_PROJS:
            key = f"{base}.{hf_name}"
            op = layer.ops[ours]
            mcfg: MatmulConfig = op.config
            if f"{key}.bias" in state:
                if cfg.attention_bias and ours in ("q", "k", "v"):
                    layer.biases[ours] = jnp.asarray(
                        _np(state[f"{key}.bias"]), jnp.float32)
                else:
                    raise ValueError(
                        f"{key}: unexpected bias (attention_bias covers "
                        f"q/k/v only); refusing to drop it")
            _check_g_idx(state, key, mcfg.K, group_size)
            packed = repack_gptq_layer(
                mcfg, _np(state[f"{key}.qweight"]),
                _np(state[f"{key}.scales"]),
                _np(state[f"{key}.qzeros"]), gptq_v2=gptq_v2)
            layer.weights[ours] = (jnp.asarray(packed["qweight"]),
                                   jnp.asarray(packed["scales"]),
                                   jnp.asarray(packed["zeros"]))
        layer.attn_norm = jnp.asarray(
            _np(state[f"{base}.input_layernorm.weight"]), jnp.float32)
        layer.mlp_norm = jnp.asarray(
            _np(state[f"{base}.post_attention_layernorm.weight"]),
            jnp.float32)
        logger.info("imported layer %d/%d", i + 1, cfg.num_layers)

    head = LMHead(
        embed=jnp.asarray(_np(state["model.embed_tokens.weight"]),
                          jnp.dtype(cfg.act_dtype)),
        final_norm=jnp.asarray(_np(state["model.norm.weight"]), jnp.float32),
        lm_head=jnp.asarray(_lm_head_weight(state), jnp.float32),
        norm_eps=cfg.rms_norm_eps,
    )
    return model, head


@dataclass
class LMHead:
    """The unquantized ends of the model: token embedding, final RMSNorm,
    and the lm_head projection (HF GPTQ checkpoints leave all three in
    float — reference integration keeps them as torch nn modules)."""
    embed: jnp.ndarray       # [V, H] act dtype
    final_norm: jnp.ndarray  # [H]
    lm_head: jnp.ndarray     # [V, H] f32
    norm_eps: float = 1e-5   # importer sets the HF rms_norm_eps

    def embed_tokens(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(self.embed, token_ids, axis=0)

    def logits(self, hidden: jnp.ndarray) -> jnp.ndarray:
        h = rmsnorm(hidden.astype(jnp.float32), self.final_norm,
                    self.norm_eps)
        return h @ self.lm_head.T


class QuantLlamaLM:
    """tokens -> logits: LMHead.embed -> QuantLlama trunk -> LMHead.logits.

    The hidden-state trunk stays the serving surface (engines stream
    hidden vectors); this wrapper is the end-to-end checkpoint-parity and
    evaluation entry (perplexity, logit-match tests)."""

    def __init__(self, model: QuantLlama, head: LMHead):
        self.model = model
        self.head = head

    def __call__(self, token_ids: jnp.ndarray,
                 positions: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if token_ids.ndim == 1:
            token_ids = token_ids[None]
        B, S = token_ids.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
        x = self.head.embed_tokens(token_ids)
        x = self.model(x, positions)
        return self.head.logits(x)

    def generate(self, prompt_tokens, max_new_tokens: int = 32, *,
                 temperature: float = 0.0, top_k: int = 0,
                 eos_token_id: Optional[int] = None, seed: int = 0,
                 max_seq_len: Optional[int] = None) -> np.ndarray:
        """Autoregressive token generation for one sequence.

        Prefill runs through `QuantLlama.make_prefill` (flash-attention
        when the prompt is long enough), then each new token goes through
        the KV-cache `decode_step` — the same single-token path the
        serving engines batch. temperature=0 is greedy; temperature>0
        samples the softmax (optionally truncated to the top_k logits).
        Returns the full token sequence [S + new] as int32 numpy.

        Batched/continuous serving belongs to `serving.engine`; this is
        the single-stream convenience loop (the reference delegates this
        entirely to HF `model.generate` around its torch integration).
        """
        toks = np.asarray(prompt_tokens).reshape(-1).astype(np.int32)
        S = toks.shape[0]
        if S < 1:
            raise ValueError("prompt_tokens must hold at least one token")
        cfg = self.model.cfg
        lmax = max_seq_len or (S + max_new_tokens)
        if lmax < S + max_new_tokens:
            raise ValueError(f"max_seq_len={lmax} < prompt {S} + "
                             f"max_new_tokens {max_new_tokens}")
        rng = np.random.default_rng(seed)

        prefill = self.model.make_prefill(S)
        positions = jnp.arange(S)[None]
        hidden, ks, vs = prefill(self.head.embed_tokens(jnp.asarray(
            toks)[None]), positions)
        L = cfg.num_layers
        # One stacked scatter (a per-layer .at[] loop would copy the whole
        # cache 2L times — the anti-pattern engine._prefill documents).
        caches_k = jnp.zeros((L, 1, lmax, cfg.num_kv_heads, cfg.head_dim),
                             hidden.dtype).at[:, 0, :S].set(
            jnp.stack(list(ks)).astype(hidden.dtype))
        caches_v = jnp.zeros((L, 1, lmax, cfg.num_kv_heads, cfg.head_dim),
                             hidden.dtype).at[:, 0, :S].set(
            jnp.stack(list(vs)).astype(hidden.dtype))
        # Jit the decode step with donated caches: eager decode_step copies
        # the full cache 2L times per token through its .at[li].set loop.
        from ..utils.lift import jit_lifted
        decode = jit_lifted(self.model.decode_step, self.model,
                            donate_argnums=(1, 2))

        def sample(logits_row: np.ndarray) -> int:
            return sample_token(logits_row, temperature=temperature,
                                top_k=top_k, rng=rng)

        slots = jnp.zeros((1,), jnp.int32)
        out = list(toks)
        last_hidden = hidden[:, -1:]
        for i in range(max_new_tokens):
            logits = np.asarray(self.head.logits(last_hidden))[0, -1]
            nxt = sample(logits)
            out.append(nxt)
            if eos_token_id is not None and nxt == eos_token_id:
                break
            if i == max_new_tokens - 1:
                break  # budget spent — the next hidden would go unused
            lengths = jnp.asarray([len(out) - 1], jnp.int32)
            x = self.head.embed_tokens(jnp.asarray([[nxt]]))
            last_hidden, caches_k, caches_v = decode(
                x, caches_k, caches_v, slots, lengths)
        return np.asarray(out, np.int32)


def sample_token(logits_row: np.ndarray, *, temperature: float = 0.0,
                 top_k: int = 0, rng=None) -> int:
    """Sample one token id from a [V] logits row. temperature<=0 is
    greedy; otherwise softmax sampling, optionally truncated to the
    top_k logits. Shared by `QuantLlamaLM.generate` and the token-level
    serving engine."""
    if temperature <= 0.0:
        return int(np.argmax(logits_row))
    z = np.asarray(logits_row, dtype=np.float64) / temperature
    if top_k > 0 and top_k < z.shape[0]:
        kth = np.partition(z, -top_k)[-top_k]
        z = np.where(z >= kth, z, -np.inf)
    z -= z.max()
    p = np.exp(z)
    p /= p.sum()
    rng = rng or np.random.default_rng()
    return int(rng.choice(z.shape[0], p=p))


def perplexity(lm, token_ids, *, chunk: int = 0) -> float:
    """Causal-LM perplexity of `lm` (any tokens->logits callable, e.g.
    QuantLlamaLM) over token_ids [B, S]: exp(mean next-token NLL).

    The BASELINE parity bar for checkpoint imports is "perplexity match"
    against the source framework (reference runs its e2e eval through the
    torch integration); this is the measurement half of that contract.
    `chunk` > 0 splits the batch to bound device memory on long evals.
    """
    token_ids = jnp.asarray(token_ids)
    if token_ids.ndim == 1:
        token_ids = token_ids[None]
    B = token_ids.shape[0]
    step = B if chunk <= 0 else chunk
    total, count = 0.0, 0
    for s in range(0, B, step):
        toks = token_ids[s:s + step]
        logits = lm(toks[:, :-1]).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tgt = toks[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)
        total += float(jnp.sum(nll))
        count += int(np.prod(tgt.shape))
    return float(np.exp(total / max(count, 1)))
