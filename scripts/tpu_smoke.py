"""Real-chip smoke + early perf check for the fused dequant kernel.

Run directly on the attached TPU: `python scripts/tpu_smoke.py`.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import random_reference_operands
from bitblas_tpu.tuner.hint import TileHint

# v5e roofline constants
HBM_BW = 819e9          # bytes/s
MXU_BF16 = 197e12       # flop/s
MXU_INT8 = 394e12


def bench(fn, args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def run(m, n, k, hint, w_dtype="uint4", a_dtype="float16", check=True):
    cfg = MatmulConfig(M=m, N=n, K=k, A_dtype=a_dtype, W_dtype=w_dtype,
                       with_scaling=True, group_size=128, fast_decoding=False,
                       out_dtype="float16" if a_dtype == "float16" else "float32")
    ops = random_reference_operands(cfg, m, 0)
    dw = transform_reference_operands(cfg, ops.qweight,
                                      ops.scales, ops.zeros, ops.qzeros)
    spec = KernelSpec.from_config(cfg, m)
    fn = jax.jit(make_dequant_matmul(spec, hint))
    args = [jnp.asarray(ops.A), jnp.asarray(dw.qweight)]
    kw_scales = jnp.asarray(dw.scales)
    f = lambda A, W, S: fn(A, W, scales=S)
    f = jax.jit(f)
    sec = bench(f, (args[0], args[1], kw_scales))

    bits = cfg.bit
    wbytes = n * k * bits // 8 + n * k // 128 * 2
    abytes = m * k * 2
    obytes = m * n * 2
    total_bytes = wbytes + abytes + obytes
    flops = 2 * m * n * k
    t_mem = total_bytes / HBM_BW
    t_mxu = flops / MXU_BF16
    roofline = max(t_mem, t_mxu)
    pct = 100 * roofline / sec

    ok = ""
    if check:
        from bitblas_tpu.ops.reference import matmul_reference
        exp = matmul_reference(cfg, jnp.asarray(ops.A), jnp.asarray(ops.qweight),
                               jnp.asarray(ops.scales))
        got = f(args[0], args[1], kw_scales)
        err = np.abs(np.asarray(got, np.float32) - np.asarray(exp, np.float32))
        rel = err.max() / (np.abs(np.asarray(exp, np.float32)).max() + 1e-9)
        ok = f" relerr={rel:.2e}"

    print(f"{w_dtype}x{a_dtype} M={m:5d} N={n} K={k} {hint.short_name():28s} "
          f"{sec*1e6:9.1f} us  roofline={roofline*1e6:8.1f} us  "
          f"pct={pct:5.1f}%{ok}")
    return sec, pct


if __name__ == "__main__":
    print(jax.devices())
    N = K = 4096
    for m in (1, 16, 256, 4096):
        for hint in (
            TileHint(block_m=256, block_n=512, block_k=512, mma_dtype="bfloat16"),
            TileHint(block_m=256, block_n=1024, block_k=1024, mma_dtype="bfloat16"),
        ):
            try:
                run(m, N, K, hint)
            except Exception as ex:  # noqa: BLE001
                print(f"M={m} {hint.short_name()}: FAILED {type(ex).__name__}: {ex}"[:300])
