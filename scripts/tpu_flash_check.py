"""Validate + time the flash attention kernel on the real chip."""
import jax, jax.numpy as jnp, numpy as np
from bitblas_tpu.ops.flashatten import FlashAtten, FlashAttenConfig
from bitblas_tpu.utils.timing import measure_kernel

for (b, h, s, d, causal) in [(4, 32, 2048, 128, True), (1, 32, 4096, 128, True)]:
    cfg = FlashAttenConfig(batch=b, heads=h, seq_len=s, dim=d, is_causal=causal)
    op = FlashAtten(cfg, enable_tuning=False)
    Q, K, V = op._example_args()
    out = op.forward(Q, K, V)
    exp = op.ref_program(Q, K, V)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(exp, np.float32)).max()
    sec = measure_kernel(op._fn, (Q, K, V), inject=0)
    flops = 4 * b * h * s * s * d * (0.5 if causal else 1.0)
    print(f"b{b} h{h} s{s} d{d} causal={causal}: {sec*1e3:7.2f} ms "
          f"{flops/sec/1e12:6.1f} TFLOP/s maxerr={err:.3e}")
