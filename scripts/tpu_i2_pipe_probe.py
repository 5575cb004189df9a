"""Probe: software-pipelined decode for the i2 m=256 GEMM (tele_i8).

i2 m=256 measures 27.3us vs a 21.0us MXU-compute roof: exactly
MXU(21) + serial VPU decode(6.5). The earlier GEMV pipelining probe
(tpu_pipe_probe) was SLOWER because it round-tripped decoded *f32* operands
through VMEM (67MB); here the telescope operands are *int8* (12.6MB total),
so the scratch write is one cheap pass. Step s decodes W block s into a
double-buffered int8 scratch while the MXU dots block s-1's operands.

Layout: W [K, N/4] int8 xored (sign-extended word = u - 128), slot-strided
per bn-word strip; A [M, K] int8 resident; out [M, N] int32.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from bitblas_tpu.utils.timing import measure_kernel  # noqa: E402

N, K, M = 4096, 4096, 256


def log(*a):
    print(*a, flush=True)


def mk(bk, pipelined):
    """Single N block (bn = N, words bnw = N//4)."""
    bnw = N // 4
    nk = K // bk
    grid = (nk + 1,) if pipelined else (nk,)

    def decode(w):   # [bk, bnw] i8 -> 3 shifted int8 operands
        w32 = w.astype(jnp.int32)
        return [(w32 >> (2 * j)).astype(jnp.int8) for j in range(1, 4)]

    def dot(x, y):
        return jax.lax.dot_general(
            x, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def accumulate(a_blk, w_raw, shifted, acc_ref):
        ra = jnp.sum(a_blk.astype(jnp.int32), axis=1, keepdims=True)
        t = [dot(a_blk, w_raw)] + [dot(a_blk, sh) for sh in shifted]
        for j in range(4):
            if j < 3:
                d = t[j] - 4 * t[j + 1] - 2 * ra
            else:
                d = t[3]
            acc_ref[:, j * bnw:(j + 1) * bnw] += d

    if not pipelined:
        def kern(a_ref, w_ref, o_ref, acc_ref):
            s = pl.program_id(0)

            @pl.when(s == 0)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            w = w_ref[...]
            accumulate(a_ref[...], w, decode(w), acc_ref)

            @pl.when(s == nk - 1)
            def _():
                o_ref[...] = acc_ref[...]

        a_spec = pl.BlockSpec((M, bk), lambda s: (0, s))
        w_spec = pl.BlockSpec((bk, bnw), lambda s: (s, 0))
        scratch = [pltpu.VMEM((M, N), jnp.int32)]
    else:
        def kern(a_ref, w_ref, o_ref, acc_ref, sh_ref, wr_ref):
            s = pl.program_id(0)

            @pl.when(s == 0)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            buf = jax.lax.rem(s, 2)

            @pl.when(s < nk)
            def _decode_stage():
                w = w_ref[...]
                sh = decode(w)
                for j in range(3):
                    sh_ref[buf, j * bk:(j + 1) * bk, :] = sh[j]
                wr_ref[buf] = w

            @pl.when(s > 0)
            def _dot_stage():
                pb = 1 - buf
                a_blk = a_ref[:, pl.ds((s - 1) * bk, bk)]
                shifted = [sh_ref[pb, j * bk:(j + 1) * bk, :]
                           for j in range(3)]
                accumulate(a_blk, wr_ref[pb], shifted, acc_ref)

            @pl.when(s == nk)
            def _():
                o_ref[...] = acc_ref[...]

        # A resident [M, K]; the dot stage slices the k columns it needs
        a_spec = pl.BlockSpec((M, K), lambda s: (0, 0))
        w_spec = pl.BlockSpec((bk, bnw), lambda s: (jnp.minimum(s, nk - 1), 0))
        scratch = [pltpu.VMEM((M, N), jnp.int32),
                   pltpu.VMEM((2, 3 * bk, bnw), jnp.int8),
                   pltpu.VMEM((2, bk, bnw), jnp.int8)]

    call = pl.pallas_call(
        kern, grid=grid,
        in_specs=[a_spec, w_spec],
        out_specs=pl.BlockSpec((M, N), lambda s: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 2**20),
    )

    return call


def main():
    rng = np.random.default_rng(0)
    a = rng.integers(-8, 8, (M, K)).astype(np.int8)
    w_u = rng.integers(0, 256, (K, N // 4)).astype(np.uint8)
    w_dev = (w_u ^ 0x80).view(np.int8)
    A = jnp.asarray(a)
    W = jnp.asarray(w_dev)

    # correctness
    u = w_u.astype(np.int32)
    exp = np.zeros((M, N), np.int32)
    bnw = N // 4
    for s in range(4):
        fld = ((u >> (2 * s)) & 3) - 2
        exp[:, s * bnw:(s + 1) * bnw] = a.astype(np.int32) @ fld

    for pipelined in (False, True):
        for bk in (256, 512, 1024):
            try:
                f = mk(bk, pipelined)
                out = np.asarray(jax.jit(f)(A, W))
                ok = np.array_equal(out, exp)
                sec = measure_kernel(f, [A, W])
                log(f"i2 m=256 pipe={int(pipelined)} bk={bk:5d}: "
                    f"{sec*1e6:7.1f}us exact={ok} "
                    f"({100*21.0/(sec*1e6):5.1f}% of 21us roof)")
            except Exception as ex:  # noqa: BLE001
                log(f"pipe={int(pipelined)} bk={bk}: FAIL {str(ex)[:140]}")


if __name__ == "__main__":
    main()
