"""Post-timing-fix GEMV tile sweep to recurate bench hints."""
import dataclasses

import jax.numpy as jnp

from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import random_reference_operands
from bitblas_tpu.tuner.hint import TileHint
from bitblas_tpu.utils.timing import measure_kernel

N = K = 4096


def run(label, cfg, m, hint):
    spec = KernelSpec.from_config(cfg, m)
    ops = random_reference_operands(cfg, m, 0)
    dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
    kf = make_dequant_matmul(spec, hint)
    args = [jnp.asarray(ops.A), jnp.asarray(dw.qweight)]
    if cfg.with_scaling:
        fn = lambda a, w, s: kf(a, w, scales=s)
        args.append(jnp.asarray(dw.scales))
    else:
        fn = lambda a, w: kf(a, w)
    try:
        sec = measure_kernel(fn, args)
        print(f"{label:52s}: {sec*1e6:6.1f}us")
    except Exception as ex:  # noqa: BLE001
        print(f"{label:52s}: FAIL {str(ex)[:70]}")


def main():
    i2 = MatmulConfig(M=1, N=N, K=K, A_dtype="int8", W_dtype="int2",
                      accum_dtype="int32", out_dtype="float32")
    u4 = MatmulConfig(M=1, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                      with_scaling=True, group_size=128, fast_decoding=False,
                      out_dtype="float16")
    T = lambda bn, bk, mma="bfloat16", dm="telescope": TileHint(
        block_m=256, block_n=bn, block_k=bk, mma_dtype=mma, decode_mode=dm)

    for m in (1, 16):
        cfg = dataclasses.replace(i2, M=m)
        for bn, bk in ((2048, 1024), (2048, 512), (4096, 512), (4096, 1024),
                       (2048, 2048)):
            run(f"i2 m={m} tele bf16 bn{bn} bk{bk}", cfg, m, T(bn, bk))
        run(f"i2 m={m} tele int8 bn2048 bk1024", cfg, m,
            T(2048, 1024, "int8"))
    for m in (1, 16):
        cfg = dataclasses.replace(u4, M=m)
        for bn, bk in ((1024, 2048), (2048, 1024), (1024, 4096),
                       (2048, 2048), (512, 4096)):
            run(f"u4 m={m} tele bf16 bn{bn} bk{bk}", cfg, m, T(bn, bk))
        run(f"u4 m={m} tele f32 bn512 bk4096", cfg, m,
            T(512, 4096, "float32"))
        run(f"u4 m={m} tele f32 bn1024 bk2048", cfg, m,
            T(1024, 2048, "float32"))
        run(f"u4 m={m} mask bf16 bn1024 bk2048", cfg, m,
            T(1024, 2048, dm="mask"))
    # GEMM regimes (m=256) — check current curated still best
    run("i2 m=256 mask int8 bn1024 bk1024 (curated)",
        dataclasses.replace(i2, M=256), 256,
        TileHint(block_m=512, block_n=1024, block_k=1024, mma_dtype="int8",
                 decode_mode="mask"))
    run("i2 m=256 tele int8 bn2048 bk1024",
        dataclasses.replace(i2, M=256), 256,
        TileHint(block_m=512, block_n=2048, block_k=1024, mma_dtype="int8",
                 decode_mode="telescope"))
    run("u4 m=256 tele bf16 bn2048 bk1024",
        dataclasses.replace(u4, M=256), 256,
        TileHint(block_m=256, block_n=2048, block_k=1024,
                 mma_dtype="bfloat16", decode_mode="telescope"))


if __name__ == "__main__":
    main()
