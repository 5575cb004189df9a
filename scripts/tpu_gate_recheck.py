"""Recheck the Mosaic capability gates on the current libtpu (VERDICT r1 #10).

Each gate was added for a measured hardware-only failure; every libtpu bump
should re-run this and un-gate whatever now lowers (each gate costs perf):

  1. batched (3D) dot            — gated interpret-only in tuner/space.py
     (group_mode="batched"); tpu_compile_helper exit 1 on 2026-08 libtpu.
  2. u4 mask decode on int8 MXU  — gated in tuner/space.py (remote_compile
     HTTP 500 at large-M int8 tiles).
  3. NF4 1D LUT gather (take)    — kernels force the mux off-interpret
     ("Only 2D gather is supported").
  4. f16 operands in kernels     — Mosaic rejects f16 everywhere.
  5. 16-bit SHIFTS in kernels    — HTTP 500 (like int8 shifts); the r5
     fast16 decoders build patterns in i32 and only or/select at 16 bit.
  6. u16-lane SELECT mux (mux4b) — HTTP 500 even shift-free; would be
     the 2x NF4 decode if 16-bit lanes ever pack.
  7. lax.select_n > 2 cases      — "select_n only supported with <= 2
     arguments"; a native N-way select would replace the NF4 mux tree.

Prints PASS/FAIL per gate; a PASS means the gate in tuner/space.py /
kernels/dequant_matmul.py can be lifted (re-measure before flipping
defaults).
"""
import sys
import traceback

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import random_reference_operands
from bitblas_tpu.tuner import TileHint


def log(*a):
    print(*a, flush=True)


def try_case(tag, cfg, m, hint):
    try:
        spec = KernelSpec.from_config(cfg, m)
        ops = random_reference_operands(cfg, m, 0)
        dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
        args = [jnp.asarray(ops.A), jnp.asarray(dw.qweight)]
        if cfg.with_scaling:
            args.append(jnp.asarray(dw.scales))
        fn = make_dequant_matmul(spec, hint)
        out = fn(*args) if not cfg.with_scaling else \
            fn(args[0], args[1], scales=args[2])
        np.asarray(out)
        log(f"{tag}: PASS — gate can be re-measured for lifting")
    except Exception:
        tb = traceback.format_exc(limit=6)
        log(f"{tag}: FAIL (gate stays)\n  {tb.strip().splitlines()[-1]}")


def main():
    N = K = 1024

    # 1. batched 3D dot (group_mode="batched")
    cfg = MatmulConfig(M=64, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                      with_scaling=True, group_size=128, out_dtype="float16")
    try_case("batched-3d-dot", cfg, 64,
             TileHint(block_m=64, block_n=512, block_k=512,
                      mma_dtype="bfloat16", decode_mode="telescope",
                      group_mode="batched"))

    # 2. u4 mask decode on int8 MXU at a large-M tile
    cfg = MatmulConfig(M=1024, N=N, K=K, A_dtype="int8", W_dtype="uint4",
                       accum_dtype="int32", out_dtype="float32")
    try_case("u4-mask-int8-largeM", cfg, 1024,
             TileHint(block_m=1024, block_n=1024, block_k=512,
                      mma_dtype="int8", decode_mode="mask"))

    # 3. NF4 1D LUT gather (take) in a real kernel
    cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="float16", W_dtype="nf4",
                       with_scaling=True, group_size=128,
                       out_dtype="float16")
    spec = KernelSpec.from_config(cfg, 16)
    ops = random_reference_operands(cfg, 16, 0)
    dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
    try:
        # bypass the is_nf_take interpret-only guard by invoking the LUT
        # take directly inside a tiny pallas kernel
        import jax
        from jax.experimental import pallas as pl

        tbl = jnp.arange(16, dtype=jnp.float32)

        def k(x_ref, t_ref, o_ref):
            o_ref[...] = jnp.take(t_ref[0, :], x_ref[...] & 15, axis=0)

        x = jnp.asarray(np.random.randint(0, 16, (8, 128), np.int32))
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x, tbl.reshape(1, 16))
        np.asarray(out)
        log("nf4-take-gather: PASS — 1D LUT gather lowers now")
    except Exception:
        tb = traceback.format_exc(limit=6)
        log(f"nf4-take-gather: FAIL (gate stays)\n  "
            f"{tb.strip().splitlines()[-1]}")

    # 4. f16 operands in a kernel
    cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                       with_scaling=True, group_size=128,
                       out_dtype="float16")
    try:
        spec = KernelSpec.from_config(cfg, 16)
        hint = TileHint(block_m=16, block_n=512, block_k=512,
                        mma_dtype="float16")
        fn = make_dequant_matmul(spec, hint)  # raises ValueError by design
        log("f16-mma: kernel builder accepted f16 — update the guard")
    except ValueError:
        # expected guard; probe raw f16 in a pallas kernel instead
        try:
            import jax
            from jax.experimental import pallas as pl

            def k(a_ref, o_ref):
                o_ref[...] = a_ref[...] * jnp.float16(2.0)

            a = jnp.ones((8, 128), jnp.float16)
            np.asarray(pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float16))(a))
            log("f16-mma: PASS — f16 lowers now; revisit the f16 guard")
        except Exception:
            tb = traceback.format_exc(limit=6)
            log(f"f16-mma: FAIL (gate stays)\n  "
                f"{tb.strip().splitlines()[-1]}")

    # 5. 16-bit shift inside a kernel
    try:
        import jax
        from jax.experimental import pallas as pl

        def k16(x_ref, o_ref):
            v = x_ref[...].astype(jnp.uint16)
            o_ref[...] = (v << jnp.uint16(4)).astype(jnp.int32)

        x = jnp.asarray(np.random.randint(0, 7, (8, 128), np.int32))
        np.asarray(pl.pallas_call(
            k16, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))(x))
        log("u16-shift: PASS — 16-bit shifts lower now (fast16 decoders "
            "can shift natively)")
    except Exception:
        tb = traceback.format_exc(limit=6)
        log(f"u16-shift: FAIL (gate stays)\n  "
            f"{tb.strip().splitlines()[-1]}")

    # 6. u16-lane select mux (the NF4 mux4b 2x candidate)
    cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="float16", W_dtype="nf4",
                       with_scaling=True, group_size=128,
                       out_dtype="float16")
    try_case("nf4-mux4b-u16select", cfg, 16,
             TileHint(block_m=16, block_n=512, block_k=512,
                      mma_dtype="bfloat16", lut_mode="mux4b"))

    # 7. lax.select_n with 16 cases
    cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="float16", W_dtype="nf4",
                       with_scaling=True, group_size=128,
                       out_dtype="float16")
    try_case("nf4-selectn", cfg, 16,
             TileHint(block_m=16, block_n=512, block_k=512,
                      mma_dtype="bfloat16", lut_mode="selectn"))


if __name__ == "__main__":
    main()
