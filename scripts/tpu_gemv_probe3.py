"""Locate GEMV overhead: scaling group-split cost vs decode cost."""
import jax, jax.numpy as jnp, numpy as np
from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import random_reference_operands
from bitblas_tpu.tuner.hint import TileHint
from bitblas_tpu.utils.timing import measure_kernel

N = K = 4096
def run(m, scaling, g, hint, label=""):
    cfg = MatmulConfig(M=m, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                       with_scaling=scaling, group_size=g if scaling else -1,
                       fast_decoding=False)
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
        print(f"{label}: FAIL {str(ex)[:90]}"); return
    wb = N*K//2 + (N*K//g*4 if scaling else 0)
    roof = max((wb + m*K*2 + m*N*2)/819e9, 2*m*N*K/197e12)
    print(f"{label:44s} {sec*1e6:7.1f}us pct={100*roof/sec:5.1f}%")

T = lambda bm,bn,bk,dm="telescope": TileHint(block_m=bm, block_n=bn, block_k=bk,
                                             mma_dtype="bfloat16", decode_mode=dm)
run(1, False, 128, T(256, 512, 4096),   "m1 noscale tele bk4096")
run(1, False, 128, T(256, 1024, 2048),  "m1 noscale tele bk2048 bn1024")
run(1, True, 128, T(256, 512, 4096),    "m1 scale g128 tele bk4096 (32 grp)")
run(1, True, 128, T(256, 512, 128),     "m1 scale g128 tele bk128 (1 grp/step)")
run(1, True, 512, T(256, 512, 4096),    "m1 scale g512 tele bk4096 (8 grp)")
run(1, True, 4096, T(256, 512, 4096),   "m1 scale g4096 tele (1 grp)")
run(1, True, 128, T(256, 512, 4096, "mask"), "m1 scale g128 mask bk4096")
