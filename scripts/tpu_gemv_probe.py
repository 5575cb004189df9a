"""Isolate the GEMV bottleneck: streaming BW ceiling vs decode cost."""
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from bitblas_tpu.utils.timing import measure_kernel

N, K = 4096, 4096
Wp = jnp.asarray(np.random.randint(-128, 128, (K, N//2), np.int64).astype(np.int8))
A = jnp.asarray(np.random.randn(8, K).astype(np.float32), jnp.bfloat16)
S = jnp.asarray(np.random.randn(K//128, 1, N).astype(np.float32))

def streaming_sum(bk, bn):
    """Read all packed bytes, 1 add per word -> pure BW probe."""
    grid = (N//2//bn, K//bk)
    def kern(w_ref, o_ref, acc):
        k = pl.program_id(1)
        @pl.when(k == 0)
        def _(): acc[...] = jnp.zeros_like(acc)
        acc[...] += w_ref[...].astype(jnp.int32)[:8, :]
        @pl.when(k == pl.num_programs(1)-1)
        def _(): o_ref[...] = acc[...]
    return pl.pallas_call(kern, grid=grid,
        in_specs=[pl.BlockSpec((bk, bn), lambda j, k: (k, j))],
        out_specs=pl.BlockSpec((8, bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((8, N//2), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, bn), jnp.int32)])

def gemv_variant(bk, bn, mode):
    """Fused gemv with different decode strategies."""
    grid = (N//2//bn, K//bk)  # bn = packed cols
    def kern(a_ref, w_ref, o_ref, acc):
        k = pl.program_id(1)
        @pl.when(k == 0)
        def _(): acc[...] = jnp.zeros_like(acc)
        a = a_ref[...]
        w = w_ref[...]
        def dot(x, y):
            return jax.lax.dot_general(x, y, (((1,),(0,)),((),())),
                                       preferred_element_type=jnp.float32)
        if mode == "noconvert":  # just convert bytes, no field extract
            wb = w.astype(jnp.float32).astype(jnp.bfloat16)
            acc[:, :bn] += dot(a, wb)
        elif mode == "i32decode":
            w32 = w.astype(jnp.int32)
            for s in range(2):
                f = (w32 >> (4*s)) & 0xF
                wb = f.astype(jnp.float32).astype(jnp.bfloat16)
                acc[:, s*bn:(s+1)*bn] += dot(a, wb)
        elif mode == "i8decode":
            for s in range(2):
                f = ((w >> (4*s)) & 0xF)
                wb = f.astype(jnp.float32).astype(jnp.bfloat16)
                acc[:, s*bn:(s+1)*bn] += dot(a, wb)
        elif mode == "f32dot":
            w32 = w.astype(jnp.int32)
            for s in range(2):
                f = (w32 >> (4*s)) & 0xF
                acc[:, s*bn:(s+1)*bn] += dot(a, f.astype(jnp.float32))
        elif mode == "telescope":
            # dot(p) and dot(p>>4); lo recovered in epilogue (int-exactness
            # not needed for the perf probe)
            wu = (w.astype(jnp.int32) & 0xFF)
            d1 = dot(a, (wu >> 4).astype(jnp.float32).astype(jnp.bfloat16))
            d0 = dot(a, wu.astype(jnp.float32).astype(jnp.bfloat16))
            acc[:, 0*bn:1*bn] += d0 - 16.0*d1
            acc[:, 1*bn:2*bn] += d1
    out_w = 2*bn
    return pl.pallas_call(kern, grid=grid,
        in_specs=[pl.BlockSpec((8, bk), lambda j, k: (0, k)),
                  pl.BlockSpec((bk, bn), lambda j, k: (k, j))],
        out_specs=pl.BlockSpec((8, out_w), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, out_w), jnp.float32)])

roof = (N*K//2) / 819e9
print(f"pure-BW roofline for 8MB: {roof*1e6:.1f}us")
for bk, bn in [(512, 512), (1024, 512), (512, 1024), (2048, 256)]:
    try:
        sec = measure_kernel(lambda w: streaming_sum(bk, bn)(w), (Wp,), inject=0)
        print(f"stream bk={bk} bn={bn}: {sec*1e6:7.1f}us  {N*K/2/sec/1e9:6.0f} GB/s")
    except Exception as ex:
        print(f"stream bk={bk} bn={bn}: FAIL {str(ex)[:80]}")
for mode in ("noconvert", "i32decode", "i8decode", "f32dot", "telescope"):
    for bk, bn in [(512, 512), (1024, 256)]:
        try:
            sec = measure_kernel(lambda a, w: gemv_variant(bk, bn, mode)(a, w), (A, Wp), inject=0)
            print(f"gemv {mode:10s} bk={bk} bn={bn}: {sec*1e6:7.1f}us  pct={100*roof/sec:5.1f}%")
        except Exception as ex:
            print(f"gemv {mode:10s} bk={bk} bn={bn}: FAIL {str(ex)[:80]}")
