"""Sweep large-M tiles: cut W re-streams (decode repeats) with taller bm.

i2 m=4096 floor model: MXU 335us + (m/bm) x 10us mask decode. bm=1024
(curated) pays 4 decode passes; bm=2048/4096 pay 2/1. u4 m=4096 same story
at 7us/pass. VMEM at bm=4096 bn=1024: acc 16MB + blocks ~6MB — fits.
"""
import sys

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import random_reference_operands
from bitblas_tpu.tuner import TileHint
from bitblas_tpu.utils.timing import measure_kernel

N = K = int(sys.argv[1]) if len(sys.argv) > 1 else 4096


def log(*a):
    print(*a, flush=True)


def run(cfg, m, hints, roof_us):
    spec = KernelSpec.from_config(cfg, m)
    ops = random_reference_operands(cfg, m, 0)
    dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
    args = [jnp.asarray(ops.A), jnp.asarray(dw.qweight)]
    if cfg.with_scaling:
        args.append(jnp.asarray(dw.scales))
    for hint in hints:
        try:
            kf = make_dequant_matmul(spec, hint)
            if cfg.with_scaling:
                fn = lambda A, W, S, _kf=kf: _kf(A, W, scales=S)
            else:
                fn = lambda A, W, _kf=kf: _kf(A, W)
            sec = min(measure_kernel(fn, args) for _ in range(2))
            log(f"{cfg.W_dtype} m={m} {hint.short_name()}_"
                f"{hint.decode_mode}: {sec*1e6:7.1f}us "
                f"({100*roof_us/(sec*1e6):5.1f}%)")
        except Exception as ex:  # noqa: BLE001
            log(f"{cfg.W_dtype} m={m} {hint.short_name()}_"
                f"{hint.decode_mode}: FAIL {str(ex)[:110]}")


def main():
    # MXU-compute roofs at this shape (int8 410 TF/s, bf16 205 TF/s)
    i2_roof = 4096 * N * K * 2 / 410e12 * 1e6
    u4_roof = 4096 * N * K * 2 / 205e12 * 1e6
    i2s_roof = 256 * N * K * 2 / 410e12 * 1e6

    i2 = MatmulConfig(M=4096, N=N, K=K, A_dtype="int8", W_dtype="int2",
                      accum_dtype="int32", out_dtype="float32")
    hints = []
    for bm in (2048, 4096):
        for bn in (1024, 2048):
            for bk in (512, 1024):
                for dm in ("mask", "telescope"):
                    hints.append(TileHint(block_m=bm, block_n=bn,
                                          block_k=bk, mma_dtype="int8",
                                          decode_mode=dm))
    run(i2, 4096, hints, i2_roof)

    u4 = MatmulConfig(M=4096, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                      with_scaling=True, group_size=128,
                      fast_decoding=False, out_dtype="float16")
    hints = [TileHint(block_m=bm, block_n=bn, block_k=bk,
                      mma_dtype="bfloat16", decode_mode="telescope")
             for bm in (2048, 4096) for bn in (1024, 2048)
             for bk in (512, 1024)]
    run(u4, 4096, hints, u4_roof)

    # i2 m=256 wider-N / whole-K attempts
    i2s = MatmulConfig(M=256, N=N, K=K, A_dtype="int8", W_dtype="int2",
                       accum_dtype="int32", out_dtype="float32")
    hints = [TileHint(block_m=256, block_n=bn, block_k=bk,
                      mma_dtype="int8", decode_mode=dm)
             for bn in (2048, 4096) for bk in (512, 1024, 2048)
             for dm in ("telescope", "mask")]
    run(i2s, 256, hints, i2s_roof)


if __name__ == "__main__":
    main()
