"""Probe: NF4 gather2d (per-lane sublane gather LUT) vs the select mux.

The select mux burns ~15 VPU blends/element (NF4 4096^2 m=4096 = 1132us vs
u4's 745us). take_along_axis on a [16, width] table is the 2D gather Mosaic
reportedly supports — if it lowers, decode drops to ~1 op/element.
Targets (VERDICT r1 #2): m=4096 <= ~860us (within 15% of u4), m=1 <= ~20us.
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
from bitblas_tpu.utils.timing import measure_kernel

N = K = 4096


def log(*a):
    print(*a, flush=True)


def main():
    for m in (1, 16, 256, 4096):
        cfg = MatmulConfig(M=m, N=N, K=K, A_dtype="float16", W_dtype="nf4",
                           with_scaling=True, group_size=128,
                           out_dtype="float16")
        spec = KernelSpec.from_config(cfg, m)
        ops = random_reference_operands(cfg, m, 0)
        dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
        args = [jnp.asarray(ops.A), jnp.asarray(dw.qweight),
                jnp.asarray(dw.scales)]
        # small-sample correctness vs oracle (first m<=16 only, cheap)
        exp = None
        if m <= 16:
            exp = np.asarray(matmul_reference(
                cfg, jnp.asarray(ops.A), jnp.asarray(ops.qweight),
                jnp.asarray(ops.scales)), np.float32)
        if m <= 16:
            tiles = [(max(m, 8), 512, 4096), (max(m, 8), 512, 2048),
                     (max(m, 8), 1024, 2048)]
        elif m == 256:
            tiles = [(256, 512, 4096), (256, 1024, 2048)]
        else:
            tiles = [(1024, 2048, 512), (1024, 1024, 1024)]
        for lm in ("gather2d", "gatherlane", "mux4", "select"):
            for (bm, bn, bk) in tiles:
                hint = TileHint(block_m=bm, block_n=bn, block_k=bk,
                                mma_dtype="bfloat16", decode_mode="mask",
                                lut_mode=lm)
                try:
                    kf = make_dequant_matmul(spec, hint)
                    if exp is not None:
                        out = np.asarray(
                            kf(*args[:2], scales=args[2]), np.float32)
                        err = np.max(np.abs(out - exp))
                        # Tolerance scales with output magnitude: bf16-MXU
                        # accumulation noise at K=4096 reaches ~0.5% of
                        # max|out| (an absolute 0.25 cut false-FAILed m=16,
                        # 2026-08-17 — interpret mode showed max_abs 0.156).
                        tol = 0.01 * max(float(np.max(np.abs(exp))), 1.0)
                        assert err < tol, f"wrong: {err} (tol {tol:.3f})"
                    sec = measure_kernel(
                        lambda A, W, S: kf(A, W, scales=S), args)
                    log(f"nf4 m={m} {lm:8s} {hint.short_name()}: "
                        f"{sec*1e6:8.1f}us")
                except Exception as ex:  # noqa: BLE001
                    log(f"nf4 m={m} {lm:8s} {hint.short_name()}: FAIL "
                        f"{str(ex)[:120]}")


if __name__ == "__main__":
    main()
