"""On-chip check + bandwidth for the paged flash-decode kernels
(table-walking Mosaic lowering cannot be validated in interpret mode).

Llama-70B-ish decode: 16 sequences, 64 q / 8 kv heads, d=128, pages of
64/128 tokens, ctx ~2-4k, shuffled block tables.
"""
import numpy as np
import jax.numpy as jnp

from bitblas_tpu.serving.kv_cache import (decode_attention_paged,
                                          decode_attention_paged_quant,
                                          quantize_kv)
from bitblas_tpu.utils.timing import measure_kernel

rng = np.random.default_rng(0)
B, Hkv, H, D = 16, 8, 64, 128
for bs in (64, 128):
    L = 4096
    MB = L // bs
    blocks = B * MB
    ck = jnp.asarray(rng.standard_normal((blocks, bs, Hkv, D)),
                     jnp.bfloat16)
    cv = jnp.asarray(rng.standard_normal((blocks, bs, Hkv, D)),
                     jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, H, D)).astype(np.float16))
    tables = jnp.asarray(rng.permutation(blocks).reshape(B, MB), jnp.int32)
    lengths = jnp.asarray(rng.integers(L // 2, L + 1, B), jnp.int32)
    kv_elems = float(np.sum(np.asarray(lengths))) * Hkv * D * 2

    # XLA fused-gather baseline IN THE SAME WINDOW (the flash-vs-XLA
    # dispatch decision this probe re-checks per Mosaic bump)
    sec_x = measure_kernel(
        lambda *a: decode_attention_paged(*a, num_heads=H,
                                          use_flash=False),
        [q, ck, cv, tables, lengths], inject=0)
    print(f"paged bs={bs}: XLA baseline {sec_x*1e6:7.1f}us "
          f"({kv_elems*2/sec_x/1e9:6.0f} GB/s live)", flush=True)
    # per-variant guards: one lowering failure must not kill the sweep
    try:
        out_f = decode_attention_paged(q, ck, cv, tables, lengths,
                                       num_heads=H, use_flash=True)
        out_x = decode_attention_paged(q, ck, cv, tables, lengths,
                                       num_heads=H, use_flash=False)
        err = float(jnp.max(jnp.abs(out_f.astype(jnp.float32)
                                    - out_x.astype(jnp.float32))))
        rel = err / max(1e-6, float(jnp.max(jnp.abs(out_x.astype(
            jnp.float32)))))
        ok = "PASS" if rel < 0.02 else f"FAIL rel={rel:.3f}"
        sec = measure_kernel(
            lambda *a: decode_attention_paged(*a, num_heads=H,
                                              use_flash=True),
            [q, ck, cv, tables, lengths], inject=0)
    except Exception as ex:  # noqa: BLE001
        ok, sec = f"FAIL {str(ex)[:60]}", float("inf")
    kq, ks = quantize_kv(jnp.asarray(ck))
    vq, vs = quantize_kv(jnp.asarray(cv))
    try:
        out_fq = decode_attention_paged_quant(q, kq, vq, ks, vs, tables,
                                              lengths, num_heads=H,
                                              use_flash=bs % 128 == 0)
        out_xq = decode_attention_paged_quant(q, kq, vq, ks, vs, tables,
                                              lengths, num_heads=H,
                                              use_flash=False)
        relq = float(jnp.max(jnp.abs(out_fq.astype(jnp.float32)
                                     - out_xq.astype(jnp.float32)))) \
            / max(1e-6,
                  float(jnp.max(jnp.abs(out_xq.astype(jnp.float32)))))
        okq = "PASS" if relq < 0.02 else f"FAIL rel={relq:.3f}"
        secq = measure_kernel(
            lambda *a: decode_attention_paged_quant(
                *a, num_heads=H, use_flash=bs % 128 == 0),
            [q, kq, vq, ks, vs, tables, lengths], inject=0)
        qmsg = (f"int8 {secq*1e6:7.1f}us ({kv_elems/secq/1e9:6.0f} GB/s) "
                f"[{okq}{'' if bs % 128 == 0 else ' xla'}]")
    except Exception as ex:  # noqa: BLE001
        qmsg = f"int8 FAIL {str(ex)[:60]}"
    print(f"paged bs={bs}: bf16 {sec*1e6:7.1f}us "
          f"({kv_elems*2/sec/1e9:6.0f} GB/s) [{ok}] | {qmsg}", flush=True)
