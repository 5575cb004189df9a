"""Probe the W2A8 grouped-scaling m=4096 cell (support-matrix sweep
2026-08-20: the DB-pinned t2048x2048x512_int8_telescope HTTP-500s on this
cell while the SAME tile passes for W4A8-scaled — a bits=2 + grouped-scale
Mosaic corner). Tries candidate hints; prints which compile and their
times so the winner can be pinned into the DB and the crasher gated.
"""
import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import random_reference_operands
from bitblas_tpu.tuner import get_arch
from bitblas_tpu.tuner.hint import TileHint
from bitblas_tpu.utils.timing import measure_kernel

CANDS = [
    # (bm, bn, bk, mma, decode)
    (2048, 2048, 512, "int8", "telescope"),   # the crasher (repro check)
    (1024, 2048, 512, "int8", "telescope"),   # W4A8's refreshed winner
    (2048, 2048, 1024, "int8", "mask"),       # unscaled-u2 default
    (1024, 1024, 1024, "int8", "mask"),
    (1024, 2048, 1024, "int8", "telescope"),
    (1024, 4096, 512, "bfloat16", "telescope"),  # bf16 fallback
]


def main():
    from health_wait import wait as health_wait
    if health_wait(3600) != 0:
        print("tunnel dead — aborting", flush=True)
        sys.exit(2)
    import jax
    print("devices:", jax.devices(), flush=True)
    arch = get_arch()
    m = int(os.environ.get("BITBLAS_TPU_PROBE_M", 4096))
    nk = int(os.environ.get("BITBLAS_TPU_PROBE_NK", 4096))
    cfg = MatmulConfig(M=m, N=nk, K=nk, A_dtype="int8", W_dtype="uint2",
                       accum_dtype="int32", out_dtype="float32",
                       with_scaling=True, group_size=128)
    spec = KernelSpec.from_config(cfg, m)
    ops = random_reference_operands(cfg, m, 0)
    dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
    A = jnp.asarray(ops.A)
    W = jnp.asarray(dw.qweight)
    S = jnp.asarray(dw.scales)
    for bm, bn, bk, mma, dm in CANDS:
        name = f"t{bm}x{bn}x{bk}_{mma}_{dm}"
        try:
            hint = TileHint(block_m=bm, block_n=bn, block_k=bk,
                            mma_dtype=mma, decode_mode=dm)
            kf = make_dequant_matmul(spec, hint,
                                     interpret=arch.is_cpu)
            fn = lambda A, W, S, _kf=kf: _kf(A, W, scales=S)  # noqa: E731
            sec = min(measure_kernel(fn, (A, W, S)) for _ in range(2))
            flops = 2.0 * m * nk * nk
            print(f"{name}: {sec*1e6:8.1f}us {flops/sec/1e12:6.1f} TF/s",
                  flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: FAIL {str(ex)[:140]}", flush=True)


if __name__ == "__main__":
    main()
