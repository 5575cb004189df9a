"""Real-chip perf sweep for the fused dequant kernel with trusted timing."""
import itertools, sys
import jax, jax.numpy as jnp, numpy as np
from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import random_reference_operands
from bitblas_tpu.tuner.hint import TileHint
from bitblas_tpu.utils.timing import measure_kernel

HBM_BW = 819e9; MXU_BF16 = 197e12

def run(m, n, k, hint, fast=False):
    cfg = MatmulConfig(M=m, N=n, K=k, A_dtype="float16", W_dtype="uint4",
                       with_scaling=True, group_size=128, fast_decoding=fast)
    ops = random_reference_operands(cfg, m, 0)
    dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
    spec = KernelSpec.from_config(cfg, m)
    kf = make_dequant_matmul(spec, hint)
    fn = lambda A, W, S: kf(A, W, scales=S)
    args = (jnp.asarray(ops.A), jnp.asarray(dw.qweight), jnp.asarray(dw.scales))
    try:
        sec = measure_kernel(fn, args, inject=2)
    except Exception as ex:
        print(f"m={m:5d} {hint.short_name():26s} FAIL {str(ex)[:100]}")
        return None
    wbytes = n*k//2 + n*k//128*4
    tbytes = wbytes + m*k*2 + m*n*2
    roof = max(tbytes/HBM_BW, 2*m*n*k/MXU_BF16)
    print(f"m={m:5d} fast={int(fast)} {hint.short_name():26s} {sec*1e6:8.1f}us  "
          f"roof={roof*1e6:7.1f}us  pct={100*roof/sec:5.1f}%")
    return sec

if __name__ == "__main__":
    N = K = 4096
    hints = [
        TileHint(block_m=256, block_n=256, block_k=512, mma_dtype="bfloat16"),
        TileHint(block_m=256, block_n=512, block_k=512, mma_dtype="bfloat16"),
        TileHint(block_m=256, block_n=512, block_k=128, mma_dtype="bfloat16"),
        TileHint(block_m=512, block_n=1024, block_k=256, mma_dtype="bfloat16"),
    ]
    for m in (1, 16, 256, 4096):
        for h in hints:
            run(m, N, K, h)
        run(m, N, K, hints[1], fast=True)
