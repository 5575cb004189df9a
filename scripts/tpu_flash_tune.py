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
