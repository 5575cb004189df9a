"""Causal flash at s=8192 (b1 h16 d128): the triangular-geometry ceiling
rises with s (diag fraction 8/36 block-steps at bq=bkv=1024 -> 0.875x
dense ceiling vs 2/3 at s2048)."""
import numpy as np
import jax.numpy as jnp

from bitblas_tpu.kernels.flash import make_flash_attention
from bitblas_tpu.utils.timing import measure_kernel

B, H, S, D = 1, 16, 8192, 128
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, S, H, D)), jnp.bfloat16)
flops = 4 * B * H * S * S * D * 0.5
for bq, bkv in [(1024, 1024), (1024, 2048), (512, 1024)]:
    try:
        fn = make_flash_attention(batch=B, heads=H, seq_len=S, dim=D,
                                  causal=True, block_q=bq, block_kv=bkv,
                                  out_dtype=jnp.bfloat16)
        sec = measure_kernel(fn, (q, k, v))
        print(f"s8192 causal bq={bq} bkv={bkv}: {sec*1e6:8.1f}us "
              f"{flops/sec/1e12:6.1f} TF/s", flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"s8192 causal bq={bq} bkv={bkv}: FAIL {str(ex)[:80]}",
              flush=True)
