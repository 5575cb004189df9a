"""Probe: software-pipelined decode (decode k+1 while dotting k).

Within one grid step the decode->dot chain is data-dependent, so VPU and MXU
serialize. Double-buffering the decoded tile in VMEM breaks the dependency:
step k dots the tile decoded at step k-1 and decodes tile k for step k+1 —
independent work the scheduler can overlap across units. The grid gets one
epilogue step (dot-only).
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bitblas_tpu.utils.timing import measure_kernel

N, K, M = 4096, 4096, 8


def mk_u4(bk, bn, pipelined, mma=jnp.float32):
    """uint4, no scales. W [K, N/2] int8; slot s of a [bk, bn]-word block
    feeds output cols [s*bn, (s+1)*bn) of the 2*bn-wide tile."""
    nk = K // bk
    nj = N // 2 // bn
    grid = (nj, nk + 1) if pipelined else (nj, nk)

    def decode(w):
        wu = w.astype(jnp.int32) & 0xFF
        lo = wu.astype(mma)
        hi = (wu >> 4).astype(mma)
        return lo, hi

    def dot(x, y):
        return jax.lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    if not pipelined:
        def kern(a_ref, w_ref, o_ref, acc):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                acc[...] = jnp.zeros_like(acc)
            a = a_ref[...].astype(mma)
            lo, hi = decode(w_ref[...])
            acc[:, :bn] += dot(a, lo) - 16.0 * dot(a, hi)
            acc[:, bn:] += dot(a, hi)

            @pl.when(k == nk - 1)
            def _():
                o_ref[...] = acc[...]

        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[pl.BlockSpec((M, bk), lambda j, k: (0, k)),
                      pl.BlockSpec((bk, bn), lambda j, k: (k, j))],
            out_specs=pl.BlockSpec((M, 2 * bn), lambda j, k: (0, j)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
            scratch_shapes=[pltpu.VMEM((M, 2 * bn), jnp.float32)])

    def kern(a_ref, w_ref, o_ref, acc, wd):
        # wd: [2 buffers, 2 slots, bk, bn] decoded double buffer.
        # Slot-split (no lane-dim concatenate: that forces a relayout).
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)

        @pl.when(k > 0)
        def _dot():
            a = a_ref[...].astype(mma)
            b0 = wd[(k + 1) % 2, 0]
            b1 = wd[(k + 1) % 2, 1]
            acc[:, :bn] += dot(a, b0) - 16.0 * dot(a, b1)
            acc[:, bn:] += dot(a, b1)

        @pl.when(k < nk)
        def _decode():
            lo, hi = decode(w_ref[...])
            wd[k % 2, 0] = lo
            wd[k % 2, 1] = hi

        @pl.when(k == nk)
        def _():
            o_ref[...] = acc[...]

    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            # step k dots the PREVIOUS k-tile of A
            pl.BlockSpec((M, bk), lambda j, k: (0, jnp.maximum(k - 1, 0))),
            pl.BlockSpec((bk, bn), lambda j, k: (jnp.minimum(k, nk - 1), j)),
        ],
        out_specs=pl.BlockSpec((M, 2 * bn), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, 2 * bn), jnp.float32),
                        pltpu.VMEM((2, 2, bk, bn), mma)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20))


def main():
    import sys
    rng = np.random.default_rng(0)
    Wp = jnp.asarray(rng.integers(-128, 128, (K, N // 2)).astype(np.int8))
    A = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    roof = (N * K // 2 + M * K * 4 + M * N * 4) / 819e9

    # configs selected by argv: "p<bk>x<bn>" pipelined, "b<bk>x<bn>" baseline
    sel = sys.argv[1:] or ["check", "b512x512", "p512x512"]
    for item in sel:
        if item == "check":
            ref = mk_u4(512, 256, False)(A, Wp)
            got = mk_u4(512, 256, True)(A, Wp)
            err = float(jnp.max(jnp.abs(ref - got)))
            rel = err / float(jnp.max(jnp.abs(ref)))
            print(f"pipelined correctness: rel err {rel:.2e}", flush=True)
            continue
        pipe = item[0] == "p"
        bk, bn = (int(v) for v in item[1:].split("x"))
        try:
            sec = measure_kernel(
                lambda a, w: mk_u4(bk, bn, pipe)(a, w), (A, Wp))
            print(f"u4 pipe={int(pipe)} bk={bk:4d} bn={bn:4d}: "
                  f"{sec*1e6:6.1f}us pct={100*roof/sec:5.1f}%", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"u4 pipe={int(pipe)} bk={bk:4d} bn={bn:4d}: "
                  f"FAIL {str(ex)[:90]}", flush=True)


if __name__ == "__main__":
    main()
