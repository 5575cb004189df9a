"""Measure the MXU weight-ingestion floor at small M.

Hypothesis: GEMV-regime dequant kernels are pinned ~18us at N=K=4096 because
the MXU must ingest all N*K decoded weight elements and ingestion (weight
load) costs ~1 row/cycle per MXU regardless of M. If so:
  * bf16 ingestion floor ~ N*K / (4 MXUs * 128 lanes * f) seconds
  * int8 should be ~2x faster, f32 ~2x slower
  * decode strategy barely matters for GEMV; operand dtype does.

Method: weights stay VMEM-resident (block index map constant), grid loops R
times over the same dot, so HBM traffic is negligible and timing isolates
MXU ingestion + VPU decode.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bitblas_tpu.utils.timing import measure_kernel

R = 64          # grid repeats over the same resident block
BK, BN = 1024, 1024


def resident_dot(m, dtype, acc_dtype, n_dots=1):
    """Dot a VMEM-resident [BK, BN] block R times; returns seconds/dot."""
    def kern(a_ref, w_ref, o_ref, acc):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc[...] = jnp.zeros_like(acc)
        a = a_ref[...]
        w = w_ref[...]
        width = BN // n_dots
        for i in range(n_dots):
            acc[:, i * width:(i + 1) * width] += jax.lax.dot_general(
                a, w[:, i * width:(i + 1) * width],
                (((1,), (0,)), ((), ())), preferred_element_type=acc_dtype)
        @pl.when(pl.program_id(0) == R - 1)
        def _():
            o_ref[...] = acc[...]

    call = pl.pallas_call(
        kern, grid=(R,),
        in_specs=[pl.BlockSpec((m, BK), lambda k: (0, 0)),
                  pl.BlockSpec((BK, BN), lambda k: (0, 0))],
        out_specs=pl.BlockSpec((m, BN), lambda k: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m, BN), acc_dtype),
        scratch_shapes=[pltpu.VMEM((m, BN), acc_dtype)])
    if dtype == jnp.int8:
        A = jnp.asarray(np.random.randint(-128, 128, (m, BK)), jnp.int8)
        W = jnp.asarray(np.random.randint(-128, 128, (BK, BN)), jnp.int8)
    else:
        A = jnp.asarray(np.random.randn(m, BK), dtype)
        W = jnp.asarray(np.random.randn(BK, BN), dtype)
    sec = measure_kernel(lambda a, w: call(a, w), (A, W), inject=0)
    return sec / R


def main():
    print(f"resident [{BK},{BN}] dot; per-dot time and implied "
          f"cycles/128x128-tile at 1.5GHz (64 tiles/dot)")
    for label, m, dt, acc in [
            ("bf16 m=8", 8, jnp.bfloat16, jnp.float32),
            ("bf16 m=16", 16, jnp.bfloat16, jnp.float32),
            ("bf16 m=32", 32, jnp.bfloat16, jnp.float32),
            ("bf16 m=128", 128, jnp.bfloat16, jnp.float32),
            ("bf16 m=256", 256, jnp.bfloat16, jnp.float32),
            ("int8 m=8", 8, jnp.int8, jnp.int32),
            ("int8 m=16", 16, jnp.int8, jnp.int32),
            ("int8 m=128", 128, jnp.int8, jnp.int32),
            ("int8 m=256", 256, jnp.int8, jnp.int32),
            ("f32 m=8", 8, jnp.float32, jnp.float32),
            ("f32 m=128", 128, jnp.float32, jnp.float32),
    ]:
        try:
            s = resident_dot(m, dt, acc)
            cyc = s * 1.5e9 / (BK * BN / 128 / 128)
            print(f"{label:12s}: {s*1e6:7.2f}us/dot  ~{cyc:6.1f} cyc/tile")
        except Exception as ex:  # noqa: BLE001
            print(f"{label:12s}: FAIL {str(ex)[:100]}")

    # does splitting one [BK,BN] dot into 4 narrower dots change ingestion?
    for nd in (1, 2, 4, 8):
        try:
            s = resident_dot(8, jnp.bfloat16, jnp.float32, n_dots=nd)
            print(f"bf16 m=8 split into {nd} dots: {s*1e6:7.2f}us")
        except Exception as ex:  # noqa: BLE001
            print(f"split {nd}: FAIL {str(ex)[:100]}")

    # int4 MXU support?
    try:
        s = resident_dot(8, jnp.int4, jnp.int32)
    except Exception as ex:  # noqa: BLE001
        print(f"int4 resident dot: FAIL {str(ex)[:120]}")
    else:
        print(f"int4 m=8: {s*1e6:7.2f}us/dot")


if __name__ == "__main__":
    main()
