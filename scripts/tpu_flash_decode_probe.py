"""Measure flash-decode bandwidth after the GQA-grouped grid rework.

The per-q-head grid re-read every kv block group(=8)x and measured
28-57 GB/s; the grouped grid reads each block once per kv head. Llama-70B
decode config: 16 sequences, 64 q / 8 kv heads, d=128, ctx ~2-4k.
"""
import numpy as np
import jax.numpy as jnp

from bitblas_tpu.kernels.flash import (make_flash_decode,
                                       make_flash_decode_quant)
from bitblas_tpu.serving.kv_cache import quantize_kv
from bitblas_tpu.utils.timing import measure_kernel

rng = np.random.default_rng(0)
B, rows, L, Hkv, H, D = 16, 16, 4096, 8, 64, 128
ck = rng.standard_normal((rows, L, Hkv, D)).astype(np.float32)
cv = rng.standard_normal((rows, L, Hkv, D)).astype(np.float32)
q = jnp.asarray(rng.standard_normal((B, H, D)).astype(np.float16))
slots = jnp.asarray(rng.permutation(rows)[:B], jnp.int32)
lengths = jnp.asarray(rng.integers(L // 2, L + 1, B), jnp.int32)
ck_b = jnp.asarray(ck, jnp.bfloat16)
cv_b = jnp.asarray(cv, jnp.bfloat16)
kq, ks = quantize_kv(jnp.asarray(ck))
vq, vs = quantize_kv(jnp.asarray(cv))
kv_elems = float(np.sum(np.asarray(lengths))) * Hkv * D * 2   # K+V elems
for bkv in (256, 512, 1024, 2048):
    try:
        f = make_flash_decode(batch=B, heads=H, max_seq_len=L, dim=D,
                              kv_heads=Hkv, block_kv=bkv)
        sec = measure_kernel(lambda *a: f(*a, slots=slots),
                             [q, ck_b, cv_b, lengths], inject=0)
        fq = make_flash_decode_quant(batch=B, heads=H, max_seq_len=L,
                                     dim=D, kv_heads=Hkv, block_kv=bkv)
        secq = measure_kernel(lambda *a: fq(*a, slots=slots),
                              [q, kq, vq, ks, vs, lengths], inject=0)
        print(f"flash-decode bkv={bkv}: bf16 {sec*1e6:7.1f}us "
              f"({kv_elems*2/sec/1e9:6.0f} GB/s) | int8 {secq*1e6:7.1f}us "
              f"({kv_elems/secq/1e9:6.0f} GB/s)", flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"flash-decode bkv={bkv}: FAIL {str(ex)[:90]}", flush=True)

# partial_stats lowering check on hardware (the cp merge path): flash
# shard stats merged across two halves must equal the full-cache oracle.
from bitblas_tpu.serving.kv_cache import (decode_attention,
                                          decode_attention_partial)
SL = L // 2
full = np.asarray(decode_attention(q, ck_b, cv_b, slots, lengths,
                                   num_heads=H, use_flash=False),
                  np.float32)
stats = []
for c in (0, 1):
    lloc = jnp.clip(lengths - c * SL, 0, SL)
    stats.append(tuple(np.asarray(t, np.float32)
                       for t in decode_attention_partial(
        q, ck_b[:, c * SL:(c + 1) * SL], cv_b[:, c * SL:(c + 1) * SL],
        slots, lloc, num_heads=H, use_flash=True)))
(a0, m0, l0), (a1, m1, l1) = stats
mg = np.maximum(m0, m1)
w0, w1 = np.exp(m0 - mg), np.exp(m1 - mg)
lg = l0 * w0 + l1 * w1
merged = (a0 * w0[..., None] + a1 * w1[..., None]) \
    / np.maximum(lg, 1e-30)[..., None]
err = np.abs(merged - full).max() / max(1e-6, np.abs(full).max())
print(f"partial-stats cp merge vs full oracle: rel {err:.2e} "
      f"{'PASS' if err < 0.02 else 'FAIL'}", flush=True)
