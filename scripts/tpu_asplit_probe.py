"""Probe: activation-split plan (kernels/asplit.py) vs the fused curated
winners on-chip.

Target (VERDICT r1 #1): the two floored W4A16 bench rows — u4 m=1 (16.6us =
63-67%, bf16/f32 ingest-bound) and m=16 (15.8us = 71%). The int8 MXU ingests
~1.23x faster and the tele_i8 decode is byte shifts, so the 2M-row int8
telescope should land ~11-13us if the W4A8 small-m behavior (i2 m=1 =
11.2us) carries over. m=256 measured for the crossover point.

Numerics are cross-checked vs the interpret oracle at every shape (the
tele_i8 path is integer-exact; only the 15-bit activation quantization
differs — gate at 1% of max|out|, the format-smoke convention).
"""
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.ops.reference import matmul_reference
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import random_reference_operands
from bitblas_tpu.tuner import TileHint
from bitblas_tpu.tuner.curated import curated_hint
from bitblas_tpu.utils.timing import measure_kernel

N = K = 4096


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    log("devices:", jax.devices())

    for m in (1, 16, 256):
        cfg = MatmulConfig(M=m, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                           with_scaling=True, group_size=128,
                           fast_decoding=False, out_dtype="float16")
        spec = KernelSpec.from_config(cfg, m)
        ops = random_reference_operands(cfg, m, 0)
        dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
        A, Wp, S = (jnp.asarray(ops.A), jnp.asarray(dw.qweight),
                    jnp.asarray(dw.scales))
        exp = np.asarray(matmul_reference(
            cfg, A, jnp.asarray(ops.qweight), jnp.asarray(ops.scales)),
            np.float32)
        gate = 0.01 * max(np.abs(exp).max(), 1e-6)

        hints = [("curated", curated_hint("uint4", "float16", m))]
        for bn, bk in ((1024, 1024), (2048, 1024), (4096, 512),
                       (512, 4096), (256, 4096), (2048, 2048)):
            hints.append((f"asplit_bn{bn}_bk{bk}",
                          TileHint(block_m=256, block_n=bn, block_k=bk,
                                   mma_dtype="int8", decode_mode="asplit")))
        for tag, hint in hints:
            try:
                kf = make_dequant_matmul(spec, hint)
                fn = lambda A, W, S, _kf=kf: _kf(A, W, scales=S)
                out = np.asarray(fn(A, Wp, S), np.float32)
                aerr = np.abs(out - exp).max()
                ok = "ok" if aerr <= gate else f"WRONG {aerr:.3f}>{gate:.3f}"
                # carry rides A so the asplit quantize prologue stays
                # in-loop (at m=256 the default inject would pick scales)
                inj = 0 if hint.decode_mode == "asplit" else None
                sec = min(measure_kernel(fn, [A, Wp, S], inject=inj)
                          for _ in range(2))
                log(f"u4f16 m={m} {tag}: {sec*1e6:7.1f}us  [{ok}]")
            except Exception as ex:  # noqa: BLE001
                log(f"u4f16 m={m} {tag}: FAIL {str(ex)[:140]}")


if __name__ == "__main__":
    main()
