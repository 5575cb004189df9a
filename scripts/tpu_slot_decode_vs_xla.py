"""Slot flash-decode vs the XLA slot-gather oracle at short and long
lengths (the paged probe showed XLA's fused gather is formidable — check
the slot default too)."""
import numpy as np
import jax.numpy as jnp

from bitblas_tpu.serving.kv_cache import decode_attention
from bitblas_tpu.utils.timing import measure_kernel

rng = np.random.default_rng(0)
B, rows, L, Hkv, H, D = 16, 16, 4096, 8, 64, 128
ck = jnp.asarray(rng.standard_normal((rows, L, Hkv, D)), jnp.bfloat16)
cv = jnp.asarray(rng.standard_normal((rows, L, Hkv, D)), jnp.bfloat16)
q = jnp.asarray(rng.standard_normal((B, H, D)).astype(np.float16))
slots = jnp.asarray(rng.permutation(rows)[:B], jnp.int32)
for tag, lengths in [("long", rng.integers(L // 2, L + 1, B)),
                     ("short", rng.integers(64, 256, B))]:
    ln = jnp.asarray(lengths, jnp.int32)
    live = float(np.sum(lengths)) * Hkv * D * 2 * 2  # bytes, K+V bf16
    for fl in (True, False):
        sec = measure_kernel(
            lambda *a, _f=fl: decode_attention(*a, num_heads=H,
                                               use_flash=_f),
            [q, ck, cv, slots, ln], inject=0)
        print(f"slot {tag:5s} use_flash={fl}: {sec*1e6:7.1f}us "
              f"({live/sec/1e9:6.0f} GB/s live)", flush=True)
