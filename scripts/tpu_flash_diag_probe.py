"""Probe: causal-flash diagonal-step strategies, one measurement window.

The sub-chunked triangular diagonal (kernels/flash.py use_tri_sub) models
a 30-40%% win over the masked full-block step at s=2048 bq=bkv=1024, but
the first on-chip tune read neutral. Decide with all variants in ONE
window: diag_sub in {0 (masked full block), 512, 256, 128} at the tuned
(1024, 1024) blocks, s2048 b4h32 and s4096 b1h32.
"""
import sys

import jax.numpy as jnp
import numpy as np

from bitblas_tpu.kernels.flash import make_flash_attention
from bitblas_tpu.utils.timing import measure_kernel


def run(batch, heads, seq, dim, causal=True):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((batch, seq, heads, dim)),
                    jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((batch, seq, heads, dim)),
                    jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((batch, seq, heads, dim)),
                    jnp.bfloat16)
    flops = 4 * batch * heads * seq * seq * dim * (0.5 if causal else 1.0)
    for sub in (0, 512, 256, 128):
        fn = make_flash_attention(
            batch=batch, heads=heads, seq_len=seq, dim=dim, causal=causal,
            block_q=1024, block_kv=1024, out_dtype=jnp.bfloat16,
            diag_sub=sub)
        try:
            sec = measure_kernel(fn, (q, k, v))
            print(f"b{batch} h{heads} s{seq} diag_sub={sub:4d}: "
                  f"{sec*1e6:8.1f} us  {flops/sec/1e12:6.1f} TF/s",
                  flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"b{batch} h{heads} s{seq} diag_sub={sub:4d}: FAIL "
                  f"{str(ex)[:80]}", flush=True)


if __name__ == "__main__":
    run(4, 32, 2048, 128)
    run(1, 32, 4096, 128)
    sys.exit(0)
