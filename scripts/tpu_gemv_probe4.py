"""GEMV decode-variant shootout informed by the ingestion probe.

Facts (tpu_ingest_probe on v5e): resident [1024,1024] dot at m<=32 costs
~0.69us bf16 / 0.68us f32 / 0.57us int8 — ingestion is element-count-bound
(~1024 elem/cycle). GEMV floors at N=K=4096: bf16/f32 ~11.1us, int8 ~9.2us.
Current kernels sit at 18-19us => VPU decode is serialized with MXU work.
Variants below cut VPU ops (xor-offset storage + arithmetic-shift telescope,
f32 operands, bitcast decode) to see what actually moves the needle.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bitblas_tpu.utils.timing import measure_kernel

N, K, M = 4096, 4096, 8


def mk_u4(bk, bn, mode):
    """uint4 GEMV variants. Storage [K, N/2] int8; slot s -> cols s*128.. of
    each 256-col pack tile. Scales ignored (isolate decode+dot cost)."""
    grid = (N // 2 // bn, K // bk)

    def kern(a_ref, w_ref, o_ref, acc):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        a = a_ref[...]
        w = w_ref[...]

        def dot(x, y, acc_dt=jnp.float32):
            return jax.lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                       preferred_element_type=acc_dt)

        if mode == "tele_mask_bf16":       # current kernel's path
            wu = w.astype(jnp.int32) & 0xFF
            t0 = dot(a.astype(jnp.bfloat16), wu.astype(jnp.bfloat16))
            t1 = dot(a.astype(jnp.bfloat16),
                     (wu >> 4).astype(jnp.bfloat16))
            acc[:, :bn] += t0 - 16.0 * t1
            acc[:, bn:] += t1
        elif mode == "tele_xor_bf16":      # storage pre-xored: arith shifts
            wx = w.astype(jnp.int32)       # sign-extended (u-128)
            t0 = dot(a.astype(jnp.bfloat16), wx.astype(jnp.bfloat16))
            t1 = dot(a.astype(jnp.bfloat16),
                     (wx >> 4).astype(jnp.bfloat16))
            # u-128 corrections cancel in t0-16*t1; top slot += 8*rowsum
            rs = jnp.sum(a.astype(jnp.float32), axis=1, keepdims=True)
            acc[:, :bn] += t0 - 16.0 * t1
            acc[:, bn:] += t1 + 8.0 * rs
        elif mode == "tele_xor_f32":       # f32 operands (same ingest rate)
            wx = w.astype(jnp.int32)
            t0 = dot(a.astype(jnp.float32), wx.astype(jnp.float32))
            t1 = dot(a.astype(jnp.float32), (wx >> 4).astype(jnp.float32))
            rs = jnp.sum(a.astype(jnp.float32), axis=1, keepdims=True)
            acc[:, :bn] += t0 - 16.0 * t1
            acc[:, bn:] += t1 + 8.0 * rs
        elif mode == "mask_bf16":          # classic per-slot mask decode
            w32 = w.astype(jnp.int32)
            for s in range(2):
                f = (w32 >> (4 * s)) & 0xF
                acc[:, s * bn:(s + 1) * bn] += dot(
                    a.astype(jnp.bfloat16), f.astype(jnp.bfloat16))
        elif mode == "bitcast_f32":        # exponent-bias decode to f32
            w32 = w.astype(jnp.int32)
            af = a.astype(jnp.float32)
            MAGIC = jnp.int32(0x4B000000)  # 2^23
            lo = jax.lax.bitcast_convert_type(
                (w32 & 0xF) | MAGIC, jnp.float32) - 8388608.0
            hi = jax.lax.bitcast_convert_type(
                ((w32 >> 4) & 0xF) | MAGIC, jnp.float32) - 8388608.0
            acc[:, :bn] += dot(af, lo)
            acc[:, bn:] += dot(af, hi)

        @pl.when(k == pl.num_programs(1) - 1)
        def _():
            o_ref[...] = acc[...]

    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[pl.BlockSpec((M, bk), lambda j, k: (0, k)),
                  pl.BlockSpec((bk, bn), lambda j, k: (k, j))],
        out_specs=pl.BlockSpec((M, 2 * bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, 2 * bn), jnp.float32)])


def mk_i2(bk, bn, mode):
    """int2 GEMV variants (BitNet). Storage [K, N/4] int8, A int8."""
    grid = (N // 4 // bn, K // bk)

    def kern(a_ref, w_ref, o_ref, acc):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        a = a_ref[...]
        w = w_ref[...]

        def dot(x, y, acc_dt):
            return jax.lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                       preferred_element_type=acc_dt)

        if mode == "tele_bf16":            # current curated hint's path
            wu = w.astype(jnp.int32) & 0xFF
            ab = a.astype(jnp.float32).astype(jnp.bfloat16)
            ts = [dot(ab, (wu >> (2 * j)).astype(jnp.bfloat16), jnp.float32)
                  for j in range(4)]
            rs = jnp.sum(a.astype(jnp.float32), axis=1, keepdims=True)
            for j in range(4):
                d = ts[j] - 4.0 * ts[j + 1] if j < 3 else ts[j]
                acc[:, j * bn:(j + 1) * bn] += d - 2.0 * rs  # int bias
        elif mode == "tele_i8":            # in-kernel xor, int8 MXU
            wx = w ^ jnp.int8(-128)
            wx32 = wx.astype(jnp.int32)
            sh = [wx] + [(wx32 >> (2 * j)).astype(jnp.int8)
                         for j in range(1, 4)]
            ts = [dot(a, s, jnp.int32) for s in sh]
            rs = jnp.sum(a.astype(jnp.int32), axis=1, keepdims=True)
            for j in range(4):
                d = ts[j] - 4 * ts[j + 1] if j < 3 else ts[j]
                # int2 bias: slots 0..2 need -2*rs after xor-cancel (-2=half)
                d = d - 2 * rs if j < 3 else d
                acc[:, j * bn:(j + 1) * bn] += d.astype(jnp.float32)
        elif mode == "tele_i8_xored":      # storage pre-xored offline
            wx32 = w.astype(jnp.int32)     # already u-128, sign-extended
            sh = [w] + [(wx32 >> (2 * j)).astype(jnp.int8)
                        for j in range(1, 4)]
            ts = [dot(a, s, jnp.int32) for s in sh]
            rs = jnp.sum(a.astype(jnp.int32), axis=1, keepdims=True)
            for j in range(4):
                d = ts[j] - 4 * ts[j + 1] if j < 3 else ts[j]
                d = d - 2 * rs if j < 3 else d
                acc[:, j * bn:(j + 1) * bn] += d.astype(jnp.float32)
        elif mode == "tele_i8_acc":        # xored + combine only at the end
            wx32 = w.astype(jnp.int32)
            sh = [w] + [(wx32 >> (2 * j)).astype(jnp.int8)
                        for j in range(1, 4)]
            for j in range(4):
                acc[:, j * bn:(j + 1) * bn] += dot(
                    a, sh[j], jnp.int32).astype(jnp.float32)
            rs = jnp.sum(a.astype(jnp.int32), axis=1, keepdims=True)
            @pl.when(k == pl.num_programs(1) - 1)
            def _():
                # post-hoc telescoping on the accumulated planes would go
                # here; cost model only — numerics not wired up.
                pass

        @pl.when(k == pl.num_programs(1) - 1)
        def _():
            o_ref[...] = acc[...]

    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[pl.BlockSpec((M, bk), lambda j, k: (0, k)),
                  pl.BlockSpec((bk, bn), lambda j, k: (k, j))],
        out_specs=pl.BlockSpec((M, 4 * bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, 4 * bn), jnp.float32)])


def main():
    rng = np.random.default_rng(0)
    Wp4 = jnp.asarray(rng.integers(-128, 128, (K, N // 2)).astype(np.int8))
    A4 = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32),
                     jnp.bfloat16)
    roof4 = (N * K // 2) / 819e9
    ing4 = (N * K) / 1.5e12
    print(f"uint4: hbm roof {roof4*1e6:.1f}us, bf16 ingest floor "
          f"{ing4*1e6:.1f}us")
    for mode in ("tele_mask_bf16", "tele_xor_bf16", "tele_xor_f32",
                 "mask_bf16", "bitcast_f32"):
        for bk, bn in [(4096, 256), (2048, 512), (1024, 512)]:
            try:
                sec = measure_kernel(lambda a, w: mk_u4(bk, bn, mode)(a, w),
                                     (A4, Wp4), inject=0)
                print(f"u4 {mode:15s} bk={bk:4d} bn={bn:4d}: "
                      f"{sec*1e6:6.1f}us pct={100*roof4/sec:5.1f}%")
            except Exception as ex:  # noqa: BLE001
                print(f"u4 {mode:15s} bk={bk:4d} bn={bn:4d}: "
                      f"FAIL {str(ex)[:80]}")

    Wp2 = jnp.asarray(rng.integers(-128, 128, (K, N // 4)).astype(np.int8))
    A2 = jnp.asarray(rng.integers(-128, 128, (M, K)).astype(np.int8))
    roof2 = (N * K // 4) / 819e9
    print(f"int2: hbm roof {roof2*1e6:.1f}us, int8 ingest floor "
          f"{(N*K)/1.85e12*1e6:.1f}us")
    for mode in ("tele_bf16", "tele_i8", "tele_i8_xored", "tele_i8_acc"):
        for bk, bn in [(1024, 256), (2048, 256), (1024, 512)]:
            try:
                sec = measure_kernel(lambda a, w: mk_i2(bk, bn, mode)(a, w),
                                     (A2, Wp2), inject=0)
                print(f"i2 {mode:14s} bk={bk:4d} bn={bn:4d}: "
                      f"{sec*1e6:6.1f}us pct={100*roof2/sec:5.1f}%")
            except Exception as ex:  # noqa: BLE001
                print(f"i2 {mode:14s} bk={bk:4d} bn={bn:4d}: "
                      f"FAIL {str(ex)[:80]}")


if __name__ == "__main__":
    main()
