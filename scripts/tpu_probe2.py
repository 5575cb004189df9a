"""Probe: xor-offset telescope decode + VPU op microcosts."""
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from bitblas_tpu.utils.timing import measure_kernel

N, K = 4096, 4096
raw = np.random.randint(0, 256, (K, N//2), np.int64).astype(np.uint8)
Wx = jnp.asarray((raw ^ 0x80).view(np.int8))   # xor-offset storage
Wp = jnp.asarray(raw.view(np.int8))
A = jnp.asarray(np.random.randn(8, K).astype(np.float32), jnp.bfloat16)
roof = (N*K//2) / 819e9

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
        if mode == "xor_tele":
            # stored = u - 128 (int8). d0 = dot(a, stored); shifted = stored>>4
            # = hi - 8. slot values recovered post-dot (linear).
            d0 = dot(a, w.astype(jnp.bfloat16))
            d1 = dot(a, (w >> 4).astype(jnp.bfloat16))
            acc[:, :bn] += d0 - 16.0*d1      # = sum a*lo - 128ra + 128ra ...
            acc[:, bn:] += d1                 # = sum a*hi - 8*ra (corrected at end by caller-side ra; omitted in perf probe)
        elif mode == "xor_tele_f32":
            d0 = dot(a, w.astype(jnp.float32).astype(jnp.bfloat16))
            d1 = dot(a, (w >> 4).astype(jnp.float32).astype(jnp.bfloat16))
            acc[:, :bn] += d0 - 16.0*d1
            acc[:, bn:] += d1
        elif mode == "stream_cast1":   # cost of ONE direct s8->bf16 cast + dot
            acc[:, :bn] += dot(a, w.astype(jnp.bfloat16))
        elif mode == "stream_cast2":   # via f32
            acc[:, :bn] += dot(a, w.astype(jnp.float32).astype(jnp.bfloat16))
        elif mode == "stream_shift":   # cast + shift + cast
            acc[:, :bn] += dot(a, w.astype(jnp.bfloat16))
            acc[:, bn:] += dot(a, (w >> 4).astype(jnp.bfloat16))
        @pl.when(k == pl.num_programs(1)-1)
        def _(): o_ref[...] = acc[...]
    return pl.pallas_call(kern, grid=grid,
        in_specs=[pl.BlockSpec((8, bk), lambda j, k: (0, k)),
                  pl.BlockSpec((bk, bn), lambda j, k: (k, j))],
        out_specs=pl.BlockSpec((8, 2*bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 2*bn), jnp.float32)])

for mode in ("stream_cast1", "stream_cast2", "stream_shift", "xor_tele", "xor_tele_f32"):
    for bk, bn in [(4096, 128), (2048, 256)]:
        W = Wx if mode.startswith("xor") else Wp
        try:
            sec = measure_kernel(lambda a, w: gemv(bk, bn, mode)(a, w), (A, W), inject=0)
            print(f"{mode:14s} bk={bk:4d} bn={bn:4d}: {sec*1e6:7.1f}us  pct={100*roof/sec:5.1f}%")
        except Exception as ex:
            print(f"{mode:14s} bk={bk:4d} bn={bn:4d}: FAIL {str(ex)[:90]}")
