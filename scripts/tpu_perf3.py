"""tele_i8 vs bf16-telescope for W2A8 on the real chip + BM sweep for GEMM."""
import jax, jax.numpy as jnp, numpy as np
from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import random_reference_operands
from bitblas_tpu.tuner.hint import TileHint
from bitblas_tpu.utils.timing import measure_kernel

N = K = 4096
def run(m, w_dtype, a_dtype, hint, scaling=False):
    cfg = MatmulConfig(M=m, N=N, K=K, A_dtype=a_dtype, W_dtype=w_dtype,
                       with_scaling=scaling, group_size=128 if scaling else -1,
                       accum_dtype="int32" if a_dtype=="int8" else "float32",
                       out_dtype="float32" if a_dtype=="int8" else "float16")
    ops = random_reference_operands(cfg, m, 0)
    dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
    spec = KernelSpec.from_config(cfg, m)
    kf = make_dequant_matmul(spec, hint)
    args = [jnp.asarray(ops.A), jnp.asarray(dw.qweight)]
    if scaling:
        fn = lambda A, W, S: kf(A, W, scales=S); args.append(jnp.asarray(dw.scales))
    else:
        fn = lambda A, W: kf(A, W)
    try:
        sec = measure_kernel(fn, args, inject=len(args)-1)
    except Exception as ex:
        print(f"{w_dtype}x{a_dtype} m={m} {hint.short_name()} {hint.decode_mode}: FAIL {str(ex)[:90]}"); return
    bits = cfg.bit
    wb = N*K*bits//8 + (N*K//128*4 if scaling else 0)
    ab = 1 if a_dtype=="int8" else 2
    ob = 4 if a_dtype=="int8" else 2
    tb = wb + m*K*ab + m*N*ob
    mxu = 394e12 if a_dtype=="int8" else 197e12
    roof = max(tb/819e9, 2*m*N*K/mxu)
    print(f"{w_dtype}x{a_dtype} m={m:5d} {hint.decode_mode:9s} mma={hint.mma_dtype:8s} "
          f"bm{hint.block_m}n{hint.block_n}k{hint.block_k}: {sec*1e6:8.1f}us pct={100*roof/sec:5.1f}%")

# W2A8 GEMV + GEMM: int8 telescope vs bf16 telescope vs mask-int8
for m in (1, 256, 4096):
    run(m, "int2", "int8", TileHint(block_m=1024, block_n=1024, block_k=1024,
                                    mma_dtype="int8", decode_mode="telescope"))
    run(m, "int2", "int8", TileHint(block_m=512, block_n=1024, block_k=1024,
                                    mma_dtype="bfloat16", decode_mode="telescope"))
    run(m, "int2", "int8", TileHint(block_m=512, block_n=1024, block_k=1024,
                                    mma_dtype="int8", decode_mode="mask"))
# uint4 GEMM with bigger BM
run(4096, "uint4", "float16", TileHint(block_m=1024, block_n=1024, block_k=256,
                                       mma_dtype="bfloat16", decode_mode="telescope"), scaling=True)
run(4096, "uint4", "float16", TileHint(block_m=1024, block_n=2048, block_k=128,
                                       mma_dtype="bfloat16", decode_mode="telescope"), scaling=True)
