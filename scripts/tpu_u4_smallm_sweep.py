"""Sweep u4 GEMV/small-M hints through the real kernel.

u4 m=1/16 sit at ~64/70% vs the serial ingest+decode model. i2 (int8
operands) measurably overlaps decode with ingest; u4's f32 telescope
operands are 4x larger — try bf16 operands (exact for the telescope's
integer values) and a spread of tile shapes, via make_dequant_matmul so
winners drop straight into tuner/curated.py.
"""
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import random_reference_operands
from bitblas_tpu.tuner import TileHint
from bitblas_tpu.utils.timing import measure_kernel

N = K = 4096


def log(*a):
    print(*a, flush=True)


def main():
    for m, roof_us in ((1, 11.0), (16, 11.2)):
        cfg = MatmulConfig(M=m, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                           with_scaling=True, group_size=128,
                           fast_decoding=False, out_dtype="float16")
        spec = KernelSpec.from_config(cfg, m)
        ops = random_reference_operands(cfg, m, 0)
        dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
        args = [jnp.asarray(ops.A), jnp.asarray(dw.qweight),
                jnp.asarray(dw.scales)]

        hints = []
        for mma in ("float32", "bfloat16"):
            for bn in (256, 512, 1024):
                for bk in (2048, 4096):
                    hints.append(TileHint(block_m=max(m, 8), block_n=bn,
                                          block_k=bk, mma_dtype=mma,
                                          decode_mode="telescope"))
            hints.append(TileHint(block_m=max(m, 8), block_n=512,
                                  block_k=1024, mma_dtype=mma,
                                  decode_mode="telescope"))
            hints.append(TileHint(block_m=max(m, 8), block_n=512,
                                  block_k=4096, mma_dtype=mma,
                                  decode_mode="mask"))
        for hint in hints:
            try:
                kf = make_dequant_matmul(spec, hint)
                sec = measure_kernel(lambda A, W, S: kf(A, W, scales=S),
                                     args)
                log(f"u4 m={m} {hint.short_name()}_{hint.decode_mode}: "
                    f"{sec*1e6:7.1f}us ({100*roof_us/(sec*1e6):5.1f}%)")
            except Exception as ex:  # noqa: BLE001
                log(f"u4 m={m} {hint.short_name()}_{hint.decode_mode}: "
                    f"FAIL {str(ex)[:100]}")


if __name__ == "__main__":
    main()
