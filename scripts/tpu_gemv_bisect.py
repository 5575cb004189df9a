"""Bisect the main-kernel-vs-probe GEMV gap (14.6us vs 8.5us for int2).

Candidates: the jnp.pad of A (m=1 -> 8) outside pallas_call, the
CostEstimate, cast routing, epilogue structure.
"""
import jax
import jax.numpy as jnp
import numpy as np

import bitblas_tpu.kernels.dequant_matmul as dq
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import random_reference_operands
from bitblas_tpu.tuner.hint import TileHint
from bitblas_tpu.utils.timing import measure_kernel

N = K = 4096


def run(label, cfg, m, hint, a_rows=None):
    spec = KernelSpec.from_config(cfg, m)
    ops = random_reference_operands(cfg, max(m, a_rows or m), 0)
    dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
    kf = dq.make_dequant_matmul(spec, hint)
    A = jnp.asarray(ops.A)[:m]
    args = [A, jnp.asarray(dw.qweight)]
    if cfg.with_scaling:
        fn = lambda a, w, s: kf(a, w, scales=s)
        args.append(jnp.asarray(dw.scales))
    else:
        fn = lambda a, w: kf(a, w)
    sec = measure_kernel(fn, args)
    print(f"{label:42s}: {sec*1e6:6.1f}us")


def main():
    i2 = MatmulConfig(M=8, N=N, K=K, A_dtype="int8", W_dtype="int2",
                      accum_dtype="int32", out_dtype="float32")
    u4 = MatmulConfig(M=8, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                      with_scaling=True, group_size=128, fast_decoding=False,
                      out_dtype="float16")
    hint_i2 = TileHint(block_m=256, block_n=1024, block_k=1024,
                       mma_dtype="bfloat16", decode_mode="telescope")
    hint_u4 = TileHint(block_m=256, block_n=512, block_k=4096,
                       mma_dtype="bfloat16", decode_mode="telescope")

    import dataclasses
    run("i2 main m=8 (baseline)", i2, 8, hint_i2)
    run("i2 main m=1 (pad path)", dataclasses.replace(i2, M=1), 1, hint_i2)

    # disable cost estimate
    orig = dq.pl.CostEstimate
    dq.pl.CostEstimate = lambda **kw: None
    try:
        run("i2 main m=8 no-cost-estimate", i2, 8, hint_i2)
        run("u4 main m=8 no-cost-estimate", u4, 8, hint_u4)
    finally:
        dq.pl.CostEstimate = orig

    run("u4 main m=8 (baseline)", u4, 8, hint_u4)
    run("u4 main m=1 (pad path)", dataclasses.replace(u4, M=1), 1, hint_u4)
    # bigger tiles for i2
    run("i2 main m=8 bn2048", i2, 8, dataclasses.replace(hint_i2, block_n=2048))
    run("i2 main m=8 bk2048", i2, 8, dataclasses.replace(hint_i2, block_k=2048))
    run("i2 main m=8 bk4096", i2, 8, dataclasses.replace(hint_i2, block_k=4096))
    run("u4 main m=8 noscale", dataclasses.replace(u4, with_scaling=False,
                                                   group_size=-1), 8, hint_u4)


if __name__ == "__main__":
    main()
