import jax, jax.numpy as jnp, numpy as np
from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import random_reference_operands
from bitblas_tpu.tuner.hint import TileHint
from bitblas_tpu.utils.timing import measure_kernel
from bitblas_tpu.quantization import packing

N = K = 4096
def run(m, hint, label):
    cfg = MatmulConfig(M=m, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                       with_scaling=True, group_size=128, fast_decoding=False)
    ops = random_reference_operands(cfg, m, 0)
    dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
    spec = KernelSpec.from_config(cfg, m)
    kf = make_dequant_matmul(spec, hint)
    fn = lambda A, W, S: kf(A, W, scales=S)
    args = (jnp.asarray(ops.A), jnp.asarray(dw.qweight), jnp.asarray(dw.scales))
    try:
        sec = measure_kernel(fn, args, inject=2)
        wb = N*K//2 + N*K//128*4
        roof = max((wb + m*K*2 + m*N*2)/819e9, 2*m*N*K/197e12)
        print(f"PACK_SUB={packing.PACK_SUB} {label:30s} {sec*1e6:7.1f}us pct={100*roof/sec:5.1f}%")
    except Exception as ex:
        print(f"PACK_SUB={packing.PACK_SUB} {label}: FAIL {str(ex)[:90]}")

run(1, TileHint(block_m=8, block_n=4096, block_k=256, mma_dtype="float32", decode_mode="mask"), "m1 tuned-best mask f32")
run(1, TileHint(block_m=8, block_n=4096, block_k=256, mma_dtype="bfloat16", decode_mode="telescope"), "m1 bn4096 bk256 tele")
run(1, TileHint(block_m=8, block_n=4096, block_k=512, mma_dtype="bfloat16", decode_mode="telescope"), "m1 bn4096 bk512 tele")
run(256, TileHint(block_m=128, block_n=1024, block_k=1024, mma_dtype="bfloat16", decode_mode="telescope"), "m256 tuned-best tele")
run(4096, TileHint(block_m=1024, block_n=1024, block_k=256, mma_dtype="bfloat16", decode_mode="telescope"), "m4096 bm1024 tele")
