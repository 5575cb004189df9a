"""End-to-end tensor-parallel serving walkthrough.

Covers the full production path on a virtual 8-device CPU mesh (runs
unchanged on a real TPU slice):

  1. build a GPTQ-style quantized Llama decoder (uint4 + grouped
     scales/zero-points),
  2. persist it with orbax and restore it,
  3. shard it head-local over a TP mesh (2 psums/layer, KV cache sharded
     on kv_heads),
  4. serve a continuous batch of requests through the engine.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/tp_serving_e2e.py
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

import os
import tempfile

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

if jax.default_backend() != "tpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.sharding import Mesh

from bitblas_tpu.models.quant_llama import LlamaConfig, QuantLlama
from bitblas_tpu.module.checkpoint import (load_quant_state_orbax,
                                           save_quant_state_orbax)
from bitblas_tpu.parallel.serving import TPQuantLlama
from bitblas_tpu.serving.engine import (PagedContinuousBatchingEngine,
                                        Request)


def main():
    tp = min(4, len(jax.devices()))
    cfg = LlamaConfig(hidden_size=512, intermediate_size=1024, num_heads=8,
                      num_kv_heads=4, num_layers=2, group_size=64)

    # 1. quantized model (stand-in for a repacked GPTQ checkpoint)
    model = QuantLlama(cfg, opt_m=(8,))

    # 2. checkpoint round-trip
    ckpt = tempfile.mkdtemp() + "/llama_uint4"
    save_quant_state_orbax(ckpt, model.state_dict())
    restored = QuantLlama(cfg, opt_m=(8,))
    restored.load_state_dict(load_quant_state_orbax(ckpt))
    print(f"checkpoint round-trip: {ckpt}")

    # 3. shard over the TP mesh (kv-head replication kicks in automatically
    #    when tp > num_kv_heads)
    mesh = Mesh(np.array(jax.devices()[:tp]).reshape(tp), ("tp",))
    tpm = TPQuantLlama(restored, mesh)
    print(f"tp={tp}, kv replication x{tpm.kv_rep}, "
          f"cache sharding {tpm.kv_cache_sharding().spec}")

    # 4. continuous batching over a paged KV cache with prefix caching
    eng = PagedContinuousBatchingEngine(
        tpm, num_slots=4, num_blocks=64, block_size=8,
        cache_sharding=tpm.kv_cache_sharding())
    rng = np.random.default_rng(0)
    system_prefix = rng.standard_normal((8, cfg.hidden_size)).astype(np.float16)
    for uid in range(6):
        tail = rng.standard_normal(
            (int(rng.integers(2, 6)), cfg.hidden_size)).astype(np.float16)
        prompt = np.concatenate([system_prefix, tail])
        eng.submit(Request(uid=uid, prompt=prompt, max_new=4))
    done = eng.run_to_completion()
    print(f"served {len(done)} requests; prefix-cache hits: "
          f"{eng.prefix_hits}; blocks free: {eng.block_alloc.available}")
    for r in sorted(done, key=lambda r: r.uid):
        print(f"  request {r.uid}: generated {r.generated} tokens, "
              f"|hidden|max {np.abs(r.final_hidden).max():.3f}")

    # 5. context parallelism: at tp > num_kv_heads, shard the slot cache's
    #    SEQUENCE axis per kv-head group instead of replicating heads —
    #    per-chip attention reads and cache footprint drop tp/kv_heads-fold
    #    (docs/Scaling70B.md). Same engine, different cache sharding.
    if len(jax.devices()) >= 8:
        from bitblas_tpu.serving.engine import ContinuousBatchingEngine
        mesh8 = Mesh(np.array(jax.devices()[:8]).reshape(8), ("tp",))
        cpm = TPQuantLlama(restored, mesh8, context_parallel=True)
        print(f"tp=8 context-parallel: cp={cpm.cp}, cache keeps "
              f"{cpm.cfg.num_kv_heads} SOURCE kv heads, sharding "
              f"{cpm.kv_cache_sharding().spec}")
        eng_cp = ContinuousBatchingEngine(
            cpm, num_slots=4, max_seq_len=32,
            cache_sharding=cpm.kv_cache_sharding())
        for uid in range(3):
            eng_cp.submit(Request(
                uid=uid,
                prompt=rng.standard_normal(
                    (int(rng.integers(3, 8)),
                     cfg.hidden_size)).astype(np.float16),
                max_new=3))
        done_cp = eng_cp.run_to_completion()
        print(f"cp engine served {len(done_cp)} requests")


if __name__ == "__main__":
    main()
