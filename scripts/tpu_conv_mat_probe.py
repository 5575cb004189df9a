"""Probe transpose-free formulations of the materialize conv route.

Phase-J measured the materialize route at 52%/38% of the envelope at the
small-spatial ResNet stages (vs dense 86-89%) — the suspected cost is
the [K,N] -> HWIO permute between the decode and the conv. Candidates:

  a) current: decode -> reshape [C,KH,KW,F] -> transpose HWIO -> conv
  b) ihwo:    decode -> reshape [C,KH,KW,F] -> conv with IHWO
              dimension_numbers (XLA owns any layout fixup)
  c) gemm:    decode -> conv_general_dilated_patches + dense dot on the
              [K, Npad] operand directly (no filter permute at all)

plus the dense-f16 baseline. Winner becomes the materialize conv
implementation.
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bitblas_tpu.ops.conv2d import (Conv2D, Conv2DConfig, QuantConv2D,
                                    QuantConv2DConfig)
from bitblas_tpu.kernels.materialize import make_weight_dequant
from bitblas_tpu.tuner import get_arch
from bitblas_tpu.utils.timing import measure_kernel

SHAPES = [
    (256, 14, 256, 3, 1, 1),
    (512, 7, 512, 3, 1, 1),
    (128, 28, 128, 3, 1, 1),
]
BATCH = 32


def main():
    from health_wait import wait as health_wait
    if health_wait(3600) != 0:
        print("tunnel dead — aborting", flush=True)
        sys.exit(2)
    print("devices:", jax.devices(), flush=True)
    arch = get_arch()
    rng = np.random.default_rng(0)
    for C, HW, F, K, S, P in SHAPES:
        ho = (HW + 2 * P - K) // S + 1
        flops = 2 * BATCH * ho * ho * F * C * K * K
        x = jnp.asarray(rng.standard_normal((BATCH, HW, HW, C)) * 0.1,
                        jnp.float16)
        # decode_impl pinned to xla: this probe A/Bs the FILTER-LAYOUT
        # formulations; the decode implementation is tpu_mat_decode_probe's
        # variable (pallas became the op default after this probe first
        # ran — an unpinned rerun would confound the two).
        qcfg = QuantConv2DConfig(N=BATCH, C=C, H=HW, W=HW, F=F, K=K, S=S,
                                 P=P, W_dtype="uint4", group_size=128,
                                 with_scaling=True, route="materialize",
                                 decode_impl="xla")
        qop = QuantConv2D(qcfg, enable_tuning=False)
        kdim = C * K * K
        codes = rng.integers(0, 16, (K, K, C, F)).astype(np.int8)
        scales = (rng.standard_normal((F, kdim // 128)) * 0.05 + 0.1
                  ).astype(np.float32)
        packed = qop.transform_weight(codes, scale=scales)
        Wp, Sc = (jnp.asarray(p) for p in packed)
        spec = qop._matmul._make_spec(8)
        dequant = make_weight_dequant(spec, "bfloat16")
        n_pad = spec.n_padded

        conv_kw = dict(window_strides=(S, S), padding=[(P, P), (P, P)],
                       rhs_dilation=(1, 1))

        def run(name, fn, args):
            try:
                sec = min(measure_kernel(fn, args) for _ in range(2))
                print(f"{name:12s} {C}x{HW}^2->{F}: {sec*1e6:8.1f}us "
                      f"{flops/sec/1e12:6.1f} TF/s", flush=True)
            except Exception as ex:  # noqa: BLE001
                print(f"{name:12s} {C}x{HW}^2->{F}: FAIL {str(ex)[:100]}",
                      flush=True)

        # dense baseline
        dop = Conv2D(Conv2DConfig(N=BATCH, C=C, H=HW, W=HW, F=F, K=K,
                                  S=S, P=P))
        wdense = jnp.asarray(rng.standard_normal((K, K, C, F)) * 0.1,
                             jnp.float16)
        run("dense", lambda x, w: dop.forward(x, w), (x, wdense))

        # a) current op (transpose to HWIO)
        run("mat_hwio", lambda x, W, S_: qop.forward(x, W, scale=S_),
            (x, Wp, Sc))

        # b) IHWO dimension numbers, no transpose
        def fn_ihwo(x, Wp, Sc):
            w = dequant(Wp, Sc)[:, :F].reshape(C, K, K, F)
            out = jax.lax.conv_general_dilated(
                x.astype(jnp.bfloat16), w,
                dimension_numbers=("NHWC", "IHWO", "NHWC"),
                preferred_element_type=jnp.float32, **conv_kw)
            return out.astype(jnp.float16)
        run("mat_ihwo", jax.jit(fn_ihwo), (x, Wp, Sc))

        # c) patches-GEMM on the [K, Npad] operand
        def fn_gemm(x, Wp, Sc):
            w = dequant(Wp, Sc)
            patches = jax.lax.conv_general_dilated_patches(
                x, filter_shape=(K, K),
                dimension_numbers=("NHWC", "HWIO", "NHWC"), **conv_kw)
            n, h2, w2, kd = patches.shape
            out = jax.lax.dot_general(
                patches.reshape(n * h2 * w2, kd).astype(jnp.bfloat16), w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return out[:, :F].reshape(n, h2, w2, F).astype(jnp.float16)
        run("mat_gemm", jax.jit(fn_gemm), (x, Wp, Sc))


if __name__ == "__main__":
    main()
