"""On-chip serving-feature benchmark: decode tok/s, chunked prefill, speculation.

Measures (wall clock; these are end-to-end host-driven loops, so numbers
include dispatch overhead — the per-kernel truth lives in bench.py):

  1. token-engine decode throughput (tok/s) at several batch sizes,
     float vs int8 KV cache;
  2. bucketed vs chunked prefill admission latency (compile + run);
  3. speculative decoding: tokens per target pass with a same-model draft
     (acceptance=1 upper bound) — the realized burst batching.

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/benchmark_serving.py [--cpu]
Writes one JSON line per measurement to stdout.
"""

import sys as _sys
if "--cpu" in _sys.argv:
    _sys.argv.remove("--cpu")
    import os as _os
    _os.environ.setdefault("XLA_FLAGS",
                           "--xla_force_host_platform_device_count=8")
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

import json
import time

import numpy as np
import jax.numpy as jnp

from bitblas_tpu.models import (LlamaConfig, QuantLlama, QuantLlamaLM,
                                speculative_generate_cached)
from bitblas_tpu.models.hf_import import LMHead
from bitblas_tpu.serving import TokenContinuousBatchingEngine


def log(*a):
    print(*a, file=_sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from bitblas_tpu.tuner import get_arch
    if get_arch().is_cpu:
        # CPU smoke: tiny shapes; the numbers are meaningless, the paths
        # are the same.
        cfg = LlamaConfig(hidden_size=256, intermediate_size=512,
                          num_heads=4, num_kv_heads=2, num_layers=2,
                          vocab_size=128, group_size=128)
    else:
        # llama-7B-ish layer shapes, 2 layers (per-layer costs scale
        # linearly; the trunk dominates, the head is small on purpose)
        cfg = LlamaConfig(hidden_size=4096, intermediate_size=11008,
                          num_heads=32, num_kv_heads=32, num_layers=2,
                          vocab_size=1024, group_size=128)
    log(f"building model ({cfg.hidden_size}/{cfg.intermediate_size} "
        f"x{cfg.num_layers} layers)...")
    model = QuantLlama(cfg, opt_m=(1, 4, 8, 16))
    rng = np.random.default_rng(0)
    head = LMHead(
        embed=jnp.asarray(rng.standard_normal(
            (cfg.vocab_size, cfg.hidden_size)) * 0.02, jnp.float16),
        final_norm=jnp.ones((cfg.hidden_size,), jnp.float32),
        lm_head=jnp.asarray(rng.standard_normal(
            (cfg.vocab_size, cfg.hidden_size)) * 0.02, jnp.float32),
    )
    lm = QuantLlamaLM(model, head)

    import os
    device_only = bool(os.environ.get("BITBLAS_TPU_SERVING_DEVICE_ONLY"))

    # -- 1. decode throughput ------------------------------------------------
    for kvq in (() if device_only else (False, True)):
        for bs in (1, 4, 8):
            eng = TokenContinuousBatchingEngine(
                model, head, num_slots=bs, max_seq_len=256, kv_quant=kvq)
            for i in range(bs):
                eng.submit_tokens(uid=i, tokens=rng.integers(
                    0, cfg.vocab_size, 16), max_new=40)
            eng.step()  # admit + compile
            t0 = time.perf_counter()
            steps = 0
            while eng.active and steps < 32:
                eng.step()
                steps += 1
            dt = time.perf_counter() - t0
            toks = steps * bs
            emit(metric="decode_tok_s", batch=bs, kv_quant=kvq,
                 value=round(toks / dt, 1), unit="tok/s")

    # -- 1b. device-side decode step (chained timer, dispatch excluded) -------
    # The host-driven engine loop above pays the remote tunnel's ~25 ms
    # per dispatch several times per step, which buries the model math on
    # this rig (CLAUDE.md). This measures the SAME decode_step executable
    # with the elision-proof chained timer — the number a local (untunneled)
    # host would approach per engine step.
    from bitblas_tpu.utils.timing import measure_kernel
    # Weights as jit args (utils.lift): the ~200 MB 2-layer closure sits
    # near the remote-compile transport's body limit (HTTP 413 at
    # ~350 MB — 2026-08-20 MoE bench). Lifted once for both batch sizes.
    from bitblas_tpu.utils.lift import lift_arrays
    vals, bind = lift_arrays(model)
    for bs in (1, 8):
        try:
            Lmax, L = 256, cfg.num_layers
            ck = jnp.zeros((L, bs, Lmax, cfg.num_kv_heads, cfg.head_dim),
                           jnp.float16)
            cv = jnp.zeros_like(ck)
            x = jnp.asarray(rng.standard_normal(
                (bs, 1, cfg.hidden_size)) * 0.02, jnp.float16)
            slots = jnp.arange(bs, dtype=jnp.int32)
            lengths = jnp.full((bs,), 16, jnp.int32)

            def step(vals, x, ck, cv, slots, lengths):
                bind(vals)
                h, ck2, cv2 = model.decode_step(x, ck, cv, slots, lengths)
                # One element per layer of the written caches rides the
                # output so XLA cannot dead-code the cache-update
                # scatters out of the measurement (review 2026-08-20).
                dep = (ck2[:, 0, 0, 0, 0].astype(jnp.float32).sum()
                       + cv2[:, 0, 0, 0, 0].astype(jnp.float32).sum())
                return h + (dep * 0).astype(h.dtype)

            try:
                sec = measure_kernel(step, (vals, x, ck, cv, slots,
                                            lengths), inject=1)
            finally:
                bind(vals)  # a failed trace must not leave tracers behind
            emit(metric="decode_step_device_s", batch=bs,
                 value=round(sec * 1e6, 1), unit="us",
                 device_tok_s=round(bs / sec, 1))
        except Exception as ex:  # noqa: BLE001
            emit(metric="decode_step_device_s", batch=bs,
                 error=str(ex)[:160])

    if device_only:
        return

    # -- 2. prefill admission: bucketed vs chunked -----------------------------
    for mode, kw in (("bucketed", {}), ("chunked", {"prefill_chunk": 64})):
        eng = TokenContinuousBatchingEngine(model, head, num_slots=2,
                                            max_seq_len=512, **kw)
        lens = (48, 96, 160, 320)   # buckets 64/128/256/512 vs 1 chunk jit
        t0 = time.perf_counter()
        for i, L in enumerate(lens):
            eng.submit_tokens(uid=i, tokens=rng.integers(
                0, cfg.vocab_size, L), max_new=1)
            eng.step()
        dt = time.perf_counter() - t0
        emit(metric="prefill_admission_s", mode=mode,
             value=round(dt, 2), unit="s", prompt_lens=list(lens))

    # -- 3. speculation: tokens per target pass --------------------------------
    prompt = rng.integers(0, cfg.vocab_size, 16)
    t0 = time.perf_counter()
    ref = lm.generate(prompt, max_new_tokens=24)
    dt_plain = time.perf_counter() - t0
    for gamma in (4, 8):
        t0 = time.perf_counter()
        out, st = speculative_generate_cached(
            lm, lm, prompt, max_new_tokens=24, gamma=gamma,
            return_stats=True)
        dt = time.perf_counter() - t0
        assert np.array_equal(out, ref), "speculation changed greedy output"
        emit(metric="speculative_tokens_per_target_pass", gamma=gamma,
             value=round(st.tokens / st.target_calls, 2),
             unit="tok/pass", wall_s=round(dt, 2),
             plain_wall_s=round(dt_plain, 2))


if __name__ == "__main__":
    main()
