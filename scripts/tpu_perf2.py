"""Mask vs telescope decode on the real kernel, GEMV + GEMM regimes."""
import jax, jax.numpy as jnp, numpy as np
from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import random_reference_operands
from bitblas_tpu.tuner.hint import TileHint
from bitblas_tpu.utils.timing import measure_kernel

N = K = 4096
def run(m, w_dtype, a_dtype, hint, scaling=True):
    cfg = MatmulConfig(M=m, N=N, K=K, A_dtype=a_dtype, W_dtype=w_dtype,
                       with_scaling=scaling, group_size=128 if scaling else -1,
                       fast_decoding=False,
                       out_dtype="float16" if a_dtype == "float16" else "float32")
    ops = random_reference_operands(cfg, m, 0)
    dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
    spec = KernelSpec.from_config(cfg, m)
    kf = make_dequant_matmul(spec, hint)
    args = [jnp.asarray(ops.A), jnp.asarray(dw.qweight)]
    if scaling:
        fn = lambda A, W, S: kf(A, W, scales=S)
        args.append(jnp.asarray(dw.scales))
    else:
        fn = lambda A, W: kf(A, W)
    try:
        sec = measure_kernel(fn, args, inject=len(args)-1)
    except Exception as ex:
        print(f"{w_dtype}x{a_dtype} m={m} {hint.short_name()} {hint.decode_mode}: FAIL {str(ex)[:90]}")
        return
    bits = cfg.bit
    wb = N*K*bits//8 + (N*K//128*4 if scaling else 0)
    ab = 2 if a_dtype == "float16" else 1
    ob = 2 if cfg.out_dtype == "float16" else 4
    tb = wb + m*K*ab + m*N*ob
    mxu = 394e12 if (a_dtype == "int8" and hint.mma_dtype == "int8") else 197e12
    roof = max(tb/819e9, 2*m*N*K/mxu)
    print(f"{w_dtype}x{a_dtype} m={m:5d} {hint.decode_mode:9s} mma={hint.mma_dtype:8s} "
          f"t{hint.block_m}x{hint.block_n}x{hint.block_k}: {sec*1e6:8.1f}us pct={100*roof/sec:5.1f}%")

for dm in ("mask", "telescope"):
    for bk, bn in [(1024, 512), (2048, 512), (4096, 512)]:
        run(1, "uint4", "float16", TileHint(block_m=256, block_n=bn, block_k=bk,
                                            mma_dtype="bfloat16", decode_mode=dm))
for dm in ("mask", "telescope"):
    run(4096, "uint4", "float16", TileHint(block_m=512, block_n=1024, block_k=256,
                                           mma_dtype="bfloat16", decode_mode=dm))
# BitNet W2A8
for dm in ("mask", "telescope"):
    for mma in ("int8", "bfloat16"):
        run(1, "int2", "int8", TileHint(block_m=256, block_n=1024, block_k=2048,
                                        mma_dtype=mma, decode_mode=dm), scaling=False)
