"""Probe optimized telescope decode variants for GEMV."""
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from bitblas_tpu.utils.timing import measure_kernel

N, K = 4096, 4096
Wp = jnp.asarray(np.random.randint(-128, 128, (K, N//2), np.int64).astype(np.int8))
A = jnp.asarray(np.random.randn(8, K).astype(np.float32), jnp.bfloat16)

def gemv(bk, bn, mode):
    grid = (N//2//bn, K//bk)
    def kern(a_ref, w_ref, o_ref, acc):
        k = pl.program_id(1)
        @pl.when(k == 0)
        def _(): acc[...] = jnp.zeros_like(acc)
        a = a_ref[...]
        w = w_ref[...]
        def dot(x, y):
            return jax.lax.dot_general(x, y, (((1,),(0,)),((),())),
                                       preferred_element_type=jnp.float32)
        if mode == "tele_direct":      # direct s32->bf16 casts
            wu = w.astype(jnp.int32) & 0xFF
            d1 = dot(a, (wu >> 4).astype(jnp.bfloat16))
            d0 = dot(a, wu.astype(jnp.bfloat16))
            acc[:, :bn] += d0 - 16.0*d1
            acc[:, bn:] += d1
        elif mode == "tele_combine_late":  # accumulate d0/d1 raw; combine at end
            wu = w.astype(jnp.int32) & 0xFF
            acc[:, :bn] += dot(a, wu.astype(jnp.bfloat16))
            acc[:, bn:] += dot(a, (wu >> 4).astype(jnp.bfloat16))
            @pl.when(k == pl.num_programs(1)-1)
            def _():
                d1 = acc[:, bn:]
                acc[:, :bn] -= 16.0*d1
        elif mode == "tele_i8shift":   # keep everything in int8 until cast
            d1 = dot(a, ((w.astype(jnp.int32) >> 4) & 0xF).astype(jnp.bfloat16))
            d0f = dot(a, (w.astype(jnp.int32) & 0xFF).astype(jnp.bfloat16))
            acc[:, :bn] += d0f - 16.0*d1
            acc[:, bn:] += d1
        elif mode == "mask_direct":    # current mask decode but direct casts
            w32 = w.astype(jnp.int32)
            for s in range(2):
                f = (w32 >> (4*s)) & 0xF
                acc[:, s*bn:(s+1)*bn] += dot(a, f.astype(jnp.bfloat16))
        @pl.when(k == pl.num_programs(1)-1)
        def _(): o_ref[...] = acc[...]
    return pl.pallas_call(kern, grid=grid,
        in_specs=[pl.BlockSpec((8, bk), lambda j, k: (0, k)),
                  pl.BlockSpec((bk, bn), lambda j, k: (k, j))],
        out_specs=pl.BlockSpec((8, 2*bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 2*bn), jnp.float32)])

roof = (N*K//2) / 819e9
for mode in ("tele_direct", "tele_combine_late", "tele_i8shift", "mask_direct"):
    for bk, bn in [(1024, 256), (2048, 128), (512, 512), (4096, 128)]:
        try:
            sec = measure_kernel(lambda a, w: gemv(bk, bn, mode)(a, w), (A, Wp), inject=0)
            print(f"{mode:17s} bk={bk:4d} bn={bn:4d}: {sec*1e6:7.1f}us  pct={100*roof/sec:5.1f}%")
        except Exception as ex:
            print(f"{mode:17s} bk={bk:4d} bn={bn:4d}: FAIL {str(ex)[:90]}")
