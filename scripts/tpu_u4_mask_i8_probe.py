"""Re-measure the u4 mask-decode-on-int8-MXU gate (tuner/space.py:208-215).

The gate exists for a measured remote_compile HTTP 500 on the 2026-08
libtpu; the 2026-08-19 gate recheck shows the case now COMPILES. If mask
beats the telescope default (542us at W4A8 4096^3 = 254 TF/s effective),
lift the gate in tuner/space.py and update default_hint's W4A8 large-M
routing. int2 mask (already ungated) is measured alongside as the control.
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
    import jax
    log("devices:", jax.devices())
    for m in (256, 4096):
        cfg = MatmulConfig(M=m, N=N, K=K, A_dtype="int8", W_dtype="uint4",
                           with_scaling=True, group_size=128,
                           accum_dtype="int32", out_dtype="float32")
        spec = KernelSpec.from_config(cfg, m)
        ops = random_reference_operands(cfg, m, 0)
        dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
        args = [jnp.asarray(ops.A), jnp.asarray(dw.qweight),
                jnp.asarray(dw.scales)]
        exp = None
        if m <= 256:
            exp = np.asarray(matmul_reference(
                cfg, jnp.asarray(ops.A), jnp.asarray(ops.qweight),
                jnp.asarray(ops.scales)), np.float32)
        tiles = ([(256, 1024, 1024), (256, 2048, 1024), (256, 512, 4096)]
                 if m == 256 else
                 [(512, 1024, 1024), (1024, 1024, 1024), (1024, 2048, 512)])
        cands = [("tele_i8", "telescope")] + [("mask_i8", "mask")]
        for label, dm in cands:
            for (bm, bn, bk) in tiles:
                hint = TileHint(block_m=bm, block_n=bn, block_k=bk,
                                mma_dtype="int8", decode_mode=dm)
                try:
                    kf = make_dequant_matmul(spec, hint)
                    if exp is not None:
                        out = np.asarray(
                            kf(*args[:2], scales=args[2]), np.float32)
                        err = np.max(np.abs(out - exp))
                        tol = 0.01 * max(float(np.max(np.abs(exp))), 1.0)
                        assert err < tol, f"wrong: {err} (tol {tol:.3f})"
                    sec = measure_kernel(
                        lambda A, W, S: kf(A, W, scales=S), args)
                    tf = 2 * m * N * K / sec / 1e12
                    log(f"u4a8 m={m} {label:8s} {hint.short_name()}: "
                        f"{sec*1e6:8.1f}us  {tf:6.1f} TF/s")
                except Exception as ex:  # noqa: BLE001
                    log(f"u4a8 m={m} {label:8s} {hint.short_name()}: FAIL "
                        f"{str(ex)[:140]}")


if __name__ == "__main__":
    main()
