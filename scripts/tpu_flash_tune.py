"""Tune + time the flash attention kernel on the real chip.

VERDICT r1 #3 target: causal s=2048 d=128 >= 100 TF/s (counting causal
flops as half). Runs the widened finetune (logs per-candidate latencies)
and reports the winner.
"""
import logging
import numpy as np

from bitblas_tpu import set_log_level
from bitblas_tpu.ops.flashatten import FlashAtten, FlashAttenConfig
from bitblas_tpu.utils.timing import measure_kernel

set_log_level(logging.INFO)

for (b, h, s, d, causal) in [(4, 32, 2048, 128, True),
                             (4, 32, 2048, 128, False),
                             (1, 32, 4096, 128, True)]:
    cfg = FlashAttenConfig(batch=b, heads=h, seq_len=s, dim=d,
                           is_causal=causal)
    op = FlashAtten(cfg, enable_tuning=False)
    Q, K, V = op._example_args()
    out = op.forward(Q, K, V)
    exp = op.ref_program(Q, K, V)
    err = np.abs(np.asarray(out, np.float32)
                 - np.asarray(exp, np.float32)).max()
    best = op.hardware_aware_finetune()
    sec = measure_kernel(op._fn, (Q, K, V), inject=0)
    flops = 4 * b * h * s * s * d * (0.5 if causal else 1.0)
    print(f"b{b} h{h} s{s} d{d} causal={causal}: best={best[0]} "
          f"{sec*1e6:8.1f} us {flops/sec/1e12:6.1f} TF/s "
          f"maxerr={err:.3e}", flush=True)
    if best[0] is not None:
        # Persist the tuned blocks so serving processes load them from the
        # hint DB instead of re-tuning at boot (FlashHint round-trip).
        from bitblas_tpu.cache import global_operator_cache
        global_operator_cache.add(cfg, op)
        global_operator_cache.save_into_database()
        print(f"  persisted FA hint bq={op.block_q} bkv={op.block_kv}",
              flush=True)

# flash-decode block_kv sweep (float + int8-KV): bandwidth-bound — the
# knob trades grid overhead against DMA granularity at the tail block.
import jax.numpy as jnp
from bitblas_tpu.kernels.flash import make_flash_decode, make_flash_decode_quant
from bitblas_tpu.serving.kv_cache import quantize_kv

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
# sum over sequences of K+V elements actually read, times bytes/elem:
# bf16 reads kv_bytes2*2 bytes, int8 reads kv_bytes2 (codes; scales ~1%)
kv_bytes2 = float(np.sum(np.asarray(lengths))) * Hkv * D * 2
for bkv in (256, 512, 1024):
    try:
        f = make_flash_decode(batch=B, heads=H, max_seq_len=L, dim=D,
                              kv_heads=Hkv, block_kv=bkv)
        sec = measure_kernel(lambda *a: f(*a, slots=slots),
                             [q, ck_b, cv_b, lengths], inject=0)
        fq = make_flash_decode_quant(batch=B, heads=H, max_seq_len=L, dim=D,
                                     kv_heads=Hkv, block_kv=bkv)
        secq = measure_kernel(lambda *a: fq(*a, slots=slots),
                              [q, kq, vq, ks, vs, lengths], inject=0)
        print(f"flash-decode bkv={bkv}: bf16 {sec*1e6:7.1f}us "
              f"({kv_bytes2*2/sec/1e9:6.0f} GB/s) | int8 {secq*1e6:7.1f}us "
              f"({kv_bytes2/secq/1e9:6.0f} GB/s)", flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"flash-decode bkv={bkv}: FAIL {str(ex)[:120]}", flush=True)
