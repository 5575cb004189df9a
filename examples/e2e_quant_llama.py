"""End-to-end example: quantized Llama decoder + continuous-batching serving.

(TPU analog of the reference's examples/relax_end2end.py: build a model,
pre-tune every operator into the database, run it.)

Usage: PYTHONPATH=.:$PYTHONPATH python examples/e2e_quant_llama.py
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

import time

import jax
import numpy as np

from bitblas_tpu.models import LlamaConfig, QuantLlama
from bitblas_tpu.serving import ContinuousBatchingEngine, Request


def main():
    cfg = LlamaConfig(hidden_size=1024, intermediate_size=2816, num_heads=8,
                      num_kv_heads=8, num_layers=2, group_size=128)
    print("building quantized model (uint4 weights, grouped scales)...")
    model = QuantLlama(cfg, opt_m=(1, 4, 8, 16), enable_tuning=False)

    engine = ContinuousBatchingEngine(model, num_slots=4, max_seq_len=64)
    rng = np.random.default_rng(0)
    for i in range(8):
        S = int(rng.integers(4, 17))
        engine.submit(Request(
            uid=i,
            prompt=rng.standard_normal((S, cfg.hidden_size)).astype(np.float16),
            max_new=8))

    t0 = time.perf_counter()
    finished = engine.run_to_completion()
    dt = time.perf_counter() - t0
    toks = sum(r.generated for r in finished)
    print(f"served {len(finished)} requests, {toks} tokens "
          f"in {dt:.2f}s ({toks/dt:.1f} tok/s incl. compile)")


if __name__ == "__main__":
    main()
