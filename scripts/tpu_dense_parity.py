"""Dense-path parity check: XLA dot (our FP16/INT8/FP8 native compute) vs
the chip roofline — the TPU equivalent of the reference's "matches
cuBLAS/CUTLASS" claim (benchmark/README.md:33)."""
import jax, jax.numpy as jnp, numpy as np
from bitblas_tpu.utils.timing import measure_kernel

PEAK = {"bf16": 197e12, "int8": 394e12}

def bench_dense(m, n, k, adt, wdt, acc, peak, label):
    rng = np.random.default_rng(0)
    if adt == jnp.int8:
        A = jnp.asarray(rng.integers(-127, 127, (m, k)).astype(np.int8))
        B = jnp.asarray(rng.integers(-127, 127, (n, k)).astype(np.int8))
    else:
        A = jnp.asarray(rng.standard_normal((m, k)), adt)
        B = jnp.asarray(rng.standard_normal((n, k)), adt)
    fn = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=acc)
    sec = measure_kernel(fn, (A, B), inject=0, full_output_dep=True)
    fl = 2 * m * n * k
    bytes_ = (m * k + n * k) * A.dtype.itemsize + m * n * 4
    roof = max(fl / peak, bytes_ / 819e9)
    print(f"{label:14s} m={m:5d} n={n} k={k}: {sec*1e6:8.1f}us "
          f"{fl/sec/1e12:6.1f} TFLOP/s pct_roofline={100*roof/sec:5.1f}%")

if __name__ == "__main__":
    for m in (16, 256, 4096):
        bench_dense(m, 4096, 4096, jnp.bfloat16, jnp.bfloat16, jnp.float32,
                    PEAK["bf16"], "bf16xbf16")
    for m in (16, 256, 4096):
        bench_dense(m, 4096, 4096, jnp.int8, jnp.int8, jnp.int32,
                    PEAK["int8"], "int8xint8")
    # fp8: XLA may emulate; record what we get
    try:
        for m in (256, 4096):
            bench_dense(m, 4096, 4096, jnp.float8_e4m3fn, jnp.float8_e4m3fn,
                        jnp.float32, PEAK["bf16"], "e4m3xe4m3")
    except Exception as ex:
        print("fp8 dense:", str(ex)[:120])
