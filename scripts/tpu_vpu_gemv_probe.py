"""Probe: pure-VPU GEMV (no MXU) vs the MXU-telescope GEMV floor.

The m=1 MXU path is serial ingest + decode: u4 = 11.2us ingest + ~5.5us VPU
decode = 16.7us measured (63% of the 11.2us roof). A VPU-only kernel never
touches the MXU, so the ingestion term vanishes; its cost model is pure
elementwise passes (decode + mul + reduce) fully overlapped with the HBM
stream. Model: u4 ~8 lane-ops/word = ~14us; i2 int32 ~12 ops/word = ~10.5us.

Variants:
  u4-mxu   : current telescope f32 MXU (baseline)
  u4-vpu   : VPU telescope — t_j = sum_k a_k * (w >> 4j), slots recovered in
             a [1, N] epilogue; grouped scales via per-group reduces
  i2-mxu   : current tele_i8 (baseline)
  i2-vpu   : VPU int32 telescope, rowsum corrections
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from bitblas_tpu.utils.timing import measure_kernel  # noqa: E402

N, K = 4096, 4096
G = 128  # group size for u4 scales


def log(*a):
    print(*a, flush=True)


def make_vpu_u4(bk, bnw, gsz=G):
    """W [K, N/2] int8 (xored storage: sign-extended word = u - 128).
    Slot-strided within a bnw-word block: slot s -> out cols [s::2] segments.
    A [K, 1] f32. Out [1, N]. Scales [K/g, 1, N] f32.

    Per j-strip the words cover output columns 2*bnw wide (two slots).
    t0 = sum_g s? -> per-group: r0[g] = sum_{k in g} a_k * w32
                     r1[g] = sum_{k in g} a_k * (w32 >> 4)
    slot1 (hi) field = (w32>>4) + 8   (xor flips bit7 -> hi field - 8)
    slot0 (lo) field = w32 - 16*(w32>>4)  (arith identity)
    out_hi[g] = s_hi[g] * (r1[g] + 8 * suma[g])
    out_lo[g] = s_lo[g] * (r0[g] - 16*r1[g])
    """
    nk = K // bk
    nj = (N // 2) // bnw
    gpt = bk // gsz
    grid = (nj, nk)

    def kern(a_ref, w_ref, s_ref, o_ref, acc_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        a = a_ref[...]                      # [bk, 1] f32
        w = w_ref[...]                      # [bk, bnw] i8
        wf = w.astype(jnp.float32)          # u - 128
        w32 = w.astype(jnp.int32)
        hf = (w32 >> 4).astype(jnp.float32)
        p0 = a * wf
        p1 = a * hf
        outs = []
        for gi in range(gpt):
            rows = slice(gi * gsz, (gi + 1) * gsz)
            r0 = jnp.sum(p0[rows], axis=0, keepdims=True)   # [1, bnw]
            r1 = jnp.sum(p1[rows], axis=0, keepdims=True)
            sa = jnp.sum(a[rows], axis=0, keepdims=True)    # [1, 1]
            s_lo = s_ref[gi, :, 0:bnw]
            s_hi = s_ref[gi, :, bnw:2 * bnw]
            lo = s_lo * (r0 - 16.0 * r1)
            hi = s_hi * (r1 + 8.0 * sa)
            outs.append((lo, hi))
        lo = functools.reduce(jnp.add, [o[0] for o in outs])
        hi = functools.reduce(jnp.add, [o[1] for o in outs])
        acc_ref[:, 0:bnw] += lo
        acc_ref[:, bnw:2 * bnw] += hi

        @pl.when(k == nk - 1)
        def _():
            o_ref[...] = acc_ref[...]

    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            pl.BlockSpec((bk, 1), lambda j, k: (k, 0)),
            pl.BlockSpec((bk, bnw), lambda j, k: (k, j)),
            pl.BlockSpec((bk // gsz, 1, 2 * bnw), lambda j, k: (k, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, 2 * bnw), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 2 * bnw), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )


def make_vpu_i2(bk, bnw):
    """BitNet-ish: W [K, N/4] i8 xored, A [K, 1] int32 (int8 values), out
    int32->f32 [1, N]. Pure int32 VPU telescope."""
    nk = K // bk
    nj = (N // 4) // bnw
    grid = (nj, nk)

    def kern(a_ref, w_ref, o_ref, acc_ref):
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        a = a_ref[...].astype(jnp.int32)   # [bk, 1]
        w32 = w_ref[...].astype(jnp.int32)  # u - 128 (sign-extended)
        sa = jnp.sum(a, axis=0, keepdims=True)
        t = []
        for j in range(4):
            sh = w32 if j == 0 else (w32 >> (2 * j))
            t.append(jnp.sum(a * sh, axis=0, keepdims=True))
        # t_j = r_j + 4 r_{j+1} + ... - (128>>2j)*sa, so t_j - 4 t_{j+1}
        # = r_j (offsets cancel); int2 value = field - 2 -> subtract 2*sa.
        # Top slot: t3 = r3 - 2*sa is already the value dot.
        outs = []
        for j in range(4):
            if j < 3:
                d = t[j] - 4 * t[j + 1] - 2 * sa
            else:
                d = t[3]
            outs.append(d)
        for j in range(4):
            acc_ref[:, j * bnw:(j + 1) * bnw] += outs[j]

        @pl.when(k == nk - 1)
        def _():
            o_ref[...] = acc_ref[...]

    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[
            pl.BlockSpec((bk, 1), lambda j, k: (k, 0)),
            pl.BlockSpec((bk, bnw), lambda j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((1, 4 * bnw), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, 4 * bnw), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )


def u4_numpy_ref(a, w_i8, scales, bnw, gsz=G):
    """Oracle for the probe layout: w int8 = (packed u) xor 0x80."""
    u = (w_i8.view(np.uint8)).astype(np.int32) ^ 0x80
    lo = (u & 0xF).astype(np.float32)
    hi = (u >> 4).astype(np.float32)
    nj = (N // 2) // bnw
    out = np.zeros((1, N), np.float32)
    for j in range(nj):
        wlo = lo[:, j * bnw:(j + 1) * bnw]
        whi = hi[:, j * bnw:(j + 1) * bnw]
        for gi in range(K // gsz):
            rows = slice(gi * gsz, (gi + 1) * gsz)
            s = scales[gi, 0, j * 2 * bnw:(j + 1) * 2 * bnw]
            out[0, j * 2 * bnw:j * 2 * bnw + bnw] += \
                s[:bnw] * (a[rows, 0] @ wlo[rows])
            out[0, j * 2 * bnw + bnw:(j + 1) * 2 * bnw] += \
                s[bnw:] * (a[rows, 0] @ whi[rows])
    return out


def main():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((K, 1)).astype(np.float32)
    w_u4 = rng.integers(0, 256, (K, N // 2)).astype(np.uint8)
    w_u4_dev = (w_u4 ^ 0x80).view(np.int8)
    scales = (rng.standard_normal((K // G, 1, N)) * 0.01 + 0.05).astype(
        np.float32)

    A = jnp.asarray(a)
    # correctness check (small bk for speed, one config)
    f = jax.jit(make_vpu_u4(1024, 256))
    out = np.asarray(f(A, jnp.asarray(w_u4_dev), jnp.asarray(scales)))
    # reconstruct expected with per-j-strip scale mapping
    exp = np.zeros((1, N), np.float32)
    bnw = 256
    u = w_u4.astype(np.int32)
    lo = (u & 0xF).astype(np.float32)
    hi = (u >> 4).astype(np.float32)
    nj = (N // 2) // bnw
    for j in range(nj):
        for gi in range(K // G):
            rows = slice(gi * G, (gi + 1) * G)
            scol = scales[:, 0, j * 2 * bnw:(j + 1) * 2 * bnw]
            exp[0, j * 2 * bnw:j * 2 * bnw + bnw] += scol[gi, :bnw] * (
                a[rows, 0] @ lo[rows, j * bnw:(j + 1) * bnw])
            exp[0, j * 2 * bnw + bnw:(j + 1) * 2 * bnw] += \
                scol[gi, bnw:] * (a[rows, 0] @ hi[rows, j * bnw:(j + 1) * bnw])
    err = np.max(np.abs(out - exp) / (np.abs(exp) + 1e-3))
    log(f"u4-vpu correctness rel err: {err:.2e}")
    assert err < 1e-2, "u4 vpu kernel wrong"

    for bk in (1024, 2048, 4096):
        for bnw in (256, 512, 1024, 2048):
            if (N // 2) % bnw:
                continue
            try:
                f = make_vpu_u4(bk, bnw)
                sec = measure_kernel(
                    lambda A, W, S: f(A, W, S),
                    [A, jnp.asarray(w_u4_dev), jnp.asarray(scales)])
                log(f"u4-vpu bk={bk:5d} bnw={bnw:5d}: {sec*1e6:7.1f}us "
                    f"({100*11.2/(sec*1e6):5.1f}% of 11.2us roof)")
            except Exception as ex:  # noqa: BLE001
                log(f"u4-vpu bk={bk} bnw={bnw}: FAIL {str(ex)[:100]}")

    # i2
    a8 = rng.integers(-127, 128, (K, 1)).astype(np.int8)
    w_i2 = rng.integers(0, 256, (K, N // 4)).astype(np.uint8)
    w_i2_dev = (w_i2 ^ 0x80).view(np.int8)
    A8 = jnp.asarray(a8.astype(np.int32))

    f = jax.jit(make_vpu_i2(1024, 256))
    out = np.asarray(f(A8, jnp.asarray(w_i2_dev)))
    u = w_i2.astype(np.int32)
    exp = np.zeros((1, N), np.int32)
    bnw = 256
    nj = (N // 4) // bnw
    for j in range(nj):
        for s in range(4):
            fld = ((u[:, j * bnw:(j + 1) * bnw] >> (2 * s)) & 3) - 2
            exp[0, j * 4 * bnw + s * bnw:j * 4 * bnw + (s + 1) * bnw] = \
                a8[:, 0].astype(np.int32) @ fld
    err = np.max(np.abs(out - exp))
    log(f"i2-vpu correctness max abs err: {err}")
    assert err == 0, "i2 vpu kernel wrong"

    for bk in (1024, 2048, 4096):
        for bnw in (256, 512, 1024):
            if (N // 4) % bnw:
                continue
            try:
                f = make_vpu_i2(bk, bnw)
                sec = measure_kernel(lambda A, W: f(A, W),
                                     [A8, jnp.asarray(w_i2_dev)])
                log(f"i2-vpu bk={bk:5d} bnw={bnw:5d}: {sec*1e6:7.1f}us "
                    f"({100*9.1/(sec*1e6):5.1f}% of 9.1us roof)")
            except Exception as ex:  # noqa: BLE001
                log(f"i2-vpu bk={bk} bnw={bnw}: FAIL {str(ex)[:100]}")


if __name__ == "__main__":
    main()
