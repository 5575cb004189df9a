"""On-chip conv2d benchmark: dense f16 (XLA conv = the vendor MXU path)
vs the fused weight-quantized QuantConv2D (im2col patches -> dequant-GEMM
Pallas kernel), at ResNet-50-style shapes.

The reference ships conv2d compute exprs (ops/impl/convolution2d_impl.py)
but never benchmarks them; this records the TPU build's measured state
for both paths. Writes one line per (shape, path).
"""
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bitblas_tpu.ops.conv2d import (Conv2D, Conv2DConfig, QuantConv2D,
                                    QuantConv2DConfig)
from bitblas_tpu.tuner import get_arch
from bitblas_tpu.utils.timing import measure_kernel

# (C, H/W, F, K, S, P) — ResNet-50 residual-stage representatives, N=32
SHAPES = [
    (128, 28, 128, 3, 1, 1),
    (256, 14, 256, 3, 1, 1),
    (1024, 14, 256, 1, 1, 0),
    (512, 7, 512, 3, 1, 1),
]
BATCH = 32


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    log("devices:", jax.devices())
    arch = get_arch()
    rng = np.random.default_rng(0)
    for C, HW, F, K, S, P in SHAPES:
        ho = (HW + 2 * P - K) // S + 1
        flops = 2 * BATCH * ho * ho * F * C * K * K
        roof_dense = max(flops / arch.flops_bf16,
                         (BATCH * HW * HW * C * 2 + K * K * C * F * 2)
                         / arch.hbm_bandwidth)
        x = jnp.asarray(rng.standard_normal((BATCH, HW, HW, C)) * 0.1,
                        jnp.float16)

        # dense f16 (XLA conv)
        try:
            cfg = Conv2DConfig(N=BATCH, C=C, H=HW, W=HW, F=F, K=K, S=S, P=P)
            op = Conv2D(cfg)
            w = jnp.asarray(rng.standard_normal((K, K, C, F)) * 0.1,
                            jnp.float16)
            sec = min(measure_kernel(lambda x, w: op.forward(x, w), (x, w))
                      for _ in range(2))
            log(f"dense f16 {C}x{HW}^2 -> {F} k{K}: {sec*1e6:8.1f}us "
                f"{flops/sec/1e12:6.1f} TF/s ({100*roof_dense/sec:5.1f}%)")
        except Exception as ex:  # noqa: BLE001
            log(f"dense f16 {C}x{HW}^2 -> {F} k{K}: FAIL {str(ex)[:120]}")

        # quantized u4: materialize (decode + native conv, the default)
        # vs fused (im2col + dequant-GEMM kernel)
        for route in ("materialize", "fused"):
            try:
                qcfg = QuantConv2DConfig(N=BATCH, C=C, H=HW, W=HW, F=F, K=K,
                                         S=S, P=P, W_dtype="uint4",
                                         group_size=128, with_scaling=True,
                                         route=route)
                qop = QuantConv2D(qcfg)
                kdim = C * K * K
                codes = rng.integers(0, 16, (K, K, C, F)).astype(np.int8)
                scales = (rng.standard_normal((F, kdim // 128)) * 0.05 + 0.1
                          ).astype(np.float32)
                packed = qop.transform_weight(codes, scale=scales)
                args = (x,) + tuple(jnp.asarray(p) for p in packed)
                fn = lambda x, W, S_, _op=qop: _op.forward(x, W, scale=S_)  # noqa: E731,E501
                sec = min(measure_kernel(fn, args) for _ in range(2))
                wbytes = kdim * F // 2 + kdim * F // 128 * 4
                roof_q = max(flops / arch.flops_bf16,
                             (BATCH * HW * HW * C * 2 + wbytes)
                             / arch.hbm_bandwidth)
                log(f"quant u4 {route[:4]} {C}x{HW}^2 -> {F} k{K}: "
                    f"{sec*1e6:8.1f}us {flops/sec/1e12:6.1f} TF/s "
                    f"({100*roof_q/sec:5.1f}%)")
            except Exception as ex:  # noqa: BLE001
                log(f"quant u4 {route[:4]} {C}x{HW}^2 -> {F} k{K}: "
                    f"FAIL {str(ex)[:120]}")


if __name__ == "__main__":
    main()
