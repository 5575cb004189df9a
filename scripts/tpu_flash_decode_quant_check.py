"""Validate + time the int8-KV flash-decode kernel on the real chip
(Mosaic lowering check: int8 block loads + f32 casts + scale-on-results
in the online softmax; interpret mode cannot catch lowering gaps)."""
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bitblas_tpu.serving.kv_cache import decode_attention_quant, quantize_kv
from bitblas_tpu.utils.timing import measure_kernel

rng = np.random.default_rng(0)
for (B, rows, L, Hkv, H, D) in [(4, 8, 2048, 8, 32, 128),
                                (16, 16, 4096, 8, 64, 128)]:
    ck = rng.standard_normal((rows, L, Hkv, D)).astype(np.float32)
    cv = rng.standard_normal((rows, L, Hkv, D)).astype(np.float32)
    q = rng.standard_normal((B, H, D)).astype(np.float32)
    slots = jnp.asarray(rng.permutation(rows)[:B], jnp.int32)
    lengths = jnp.asarray(rng.integers(1, L + 1, B), jnp.int32)
    kq, ks = quantize_kv(jnp.asarray(ck))
    vq, vs = quantize_kv(jnp.asarray(cv))
    ref = np.asarray(decode_attention_quant(
        jnp.asarray(q), kq, vq, ks, vs, slots, lengths, num_heads=H,
        use_flash=False), np.float32)
    try:
        out = np.asarray(decode_attention_quant(
            jnp.asarray(q), kq, vq, ks, vs, slots, lengths, num_heads=H,
            use_flash=True), np.float32)
        err = np.abs(out - ref).max()
        gate = 0.01 * max(np.abs(ref).max(), 1e-6)
        fn = lambda q_, k_, v_, ks_, vs_: decode_attention_quant(
            q_, k_, v_, ks_, vs_, slots, lengths, num_heads=H,
            use_flash=True)
        sec = min(measure_kernel(fn, [jnp.asarray(q), kq, vq, ks, vs],
                                 inject=0) for _ in range(2))
        kv_bytes = float(np.sum(np.minimum(np.asarray(lengths), L))
                         ) * Hkv * D * 2  # K+V int8
        ok = "ok" if err <= gate else f"WRONG {err:.4f}>{gate:.4f}"
        print(f"B{B} L{L} Hkv{Hkv} H{H}: {sec*1e6:8.1f}us "
              f"({kv_bytes/sec/1e9:6.1f} GB/s eff KV) [{ok}]", flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"B{B} L{L}: FAIL {str(ex)[:200]}", flush=True)
