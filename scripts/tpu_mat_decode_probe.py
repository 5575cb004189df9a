"""A/B the materialize decode implementations on-chip.

XLA decode (lane-relayout unpack) vs the Pallas segment-decode kernel
(make_weight_decode_pallas), in three settings:

  1. QuantConv2D materialize route at the two weak ResNet stages
     (phase-J: 52%/38% of envelope vs dense ~87% — the decode IS the gap);
  2. the materialize GEMM plan at the bench-winning i2 4096^3 m=4096 row
     (decode amortizes there; a faster decode still shaves ~20us);
  3. the decode pass alone at both filter sizes (isolates the win).

Results pick the decode_impl defaults.
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bitblas_tpu.ops.conv2d import QuantConv2D, QuantConv2DConfig
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.kernels.materialize import (make_materialize_matmul,
                                             make_weight_decode_pallas,
                                             make_weight_dequant)
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import random_reference_operands
from bitblas_tpu.tuner import get_arch
from bitblas_tpu.tuner.hint import TileHint
from bitblas_tpu.utils.timing import measure_kernel


def run(name, fn, args, flops=None, **kw):
    try:
        sec = min(measure_kernel(fn, args, **kw) for _ in range(2))
        extra = f" {flops/sec/1e12:6.1f} TF/s" if flops else ""
        print(f"{name:28s}: {sec*1e6:8.1f}us{extra}", flush=True)
        return sec
    except Exception as ex:  # noqa: BLE001
        print(f"{name:28s}: FAIL {str(ex)[:120]}", flush=True)
        return None


def main():
    from health_wait import wait as health_wait
    if health_wait(3600) != 0:
        print("tunnel dead — aborting", flush=True)
        sys.exit(2)
    print("devices:", jax.devices(), flush=True)
    arch = get_arch()
    interp = arch.is_cpu
    rng = np.random.default_rng(0)
    section = os.environ.get("BITBLAS_TPU_PROBE_SECTION", "all")

    if section in ("all", "int"):
        # -- 2b. INT materialize at the bench i2 rows (int2 x int8) -----
        for nk in (4096, 8192):
            m = 4096
            cfg = MatmulConfig(M=m, N=nk, K=nk, A_dtype="int8",
                               W_dtype="int2", accum_dtype="int32",
                               out_dtype="float32")
            spec = KernelSpec.from_config(cfg, m)
            hint = TileHint(block_m=512, block_n=1024, block_k=1024,
                            mma_dtype="int8", decode_mode="materialize")
            ops = random_reference_operands(cfg, m, 0)
            dw = transform_reference_operands(cfg, ops.qweight, None)
            a = jnp.asarray(ops.A)
            w = jnp.asarray(dw.qweight)
            flops = 2.0 * m * nk * nk
            for pd in (False, True):
                kf = make_materialize_matmul(spec, hint, interpret=interp,
                                             pallas_decode=pd)
                run(f"gemm_i2a8 nk={nk} pallas={pd}",
                    lambda a, w, _kf=kf: _kf(a, w), (a, w),
                    flops, inject=1, full_output_dep=True)
    if section in ("all", "nf"):
        # -- 2c. NF4 materialize: XLA take-gather vs in-kernel mux4 -----
        m = nk = 4096
        cfg = MatmulConfig(M=m, N=nk, K=nk, A_dtype="float16",
                           W_dtype="nf4", with_scaling=True,
                           group_size=128, out_dtype="float16")
        spec = KernelSpec.from_config(cfg, m)
        hint = TileHint(block_m=512, block_n=1024, block_k=1024,
                        mma_dtype="bfloat16", decode_mode="materialize")
        ops = random_reference_operands(cfg, m, 0)
        dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
        a = jnp.asarray(ops.A)
        w = jnp.asarray(dw.qweight)
        s = jnp.asarray(dw.scales)
        flops = 2.0 * m * nk * nk
        for pd in (False, True):
            kf = make_materialize_matmul(spec, hint, interpret=interp,
                                         pallas_decode=pd)
            run(f"gemm_nf4_m4096 pallas={pd}",
                lambda a, w, s, _kf=kf: _kf(a, w, scales=s), (a, w, s),
                flops, inject=1, full_output_dep=True)
    if section in ("int", "nf"):
        return

    # -- 1. conv route A/B ------------------------------------------------
    for C, HW, F, K in ((256, 14, 256, 3), (512, 7, 512, 3),
                        (128, 28, 128, 3)):
        ho = HW
        flops = 2 * 32 * ho * ho * F * C * K * K
        x = jnp.asarray(rng.standard_normal((32, HW, HW, C)) * 0.1,
                        jnp.float16)
        kdim = C * K * K
        codes = rng.integers(0, 16, (K, K, C, F)).astype(np.int8)
        scales = (rng.standard_normal((F, kdim // 128)) * 0.05 + 0.1
                  ).astype(np.float32)
        for impl in ("xla", "pallas"):
            qop = QuantConv2D(QuantConv2DConfig(
                N=32, C=C, H=HW, W=HW, F=F, K=K, S=1, P=1,
                W_dtype="uint4", group_size=128, with_scaling=True,
                route="materialize", decode_impl=impl),
                enable_tuning=False)
            packed = qop.transform_weight(codes, scale=scales)
            args = (x,) + tuple(jnp.asarray(p) for p in packed)
            run(f"conv_{impl} {C}x{HW}^2",
                lambda x, W, S_, _op=qop: _op.forward(x, W, scale=S_),
                args, flops)

    # -- 2. materialize GEMM A/B at the bench row -------------------------
    m = nk = 4096
    cfg = MatmulConfig(M=m, N=nk, K=nk, A_dtype="float16", W_dtype="int2",
                       with_scaling=True, group_size=128,
                       out_dtype="float16")
    spec = KernelSpec.from_config(cfg, m)
    hint = TileHint(block_m=512, block_n=1024, block_k=1024,
                    mma_dtype="bfloat16", decode_mode="materialize")
    ops = random_reference_operands(cfg, m, 0)
    dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
    a = jnp.asarray(ops.A)
    w = jnp.asarray(dw.qweight)
    s = jnp.asarray(dw.scales)
    flops = 2.0 * m * nk * nk
    for pd in (False, True):
        kf = make_materialize_matmul(spec, hint, interpret=interp,
                                     pallas_decode=pd)
        run(f"gemm_i2_m4096 pallas={pd}",
            lambda a, w, s, _kf=kf: _kf(a, w, scales=s), (a, w, s),
            flops, inject=1, full_output_dep=True)

    # -- 3. decode pass alone ---------------------------------------------
    for C, F, K in ((512, 512, 3), (256, 256, 3)):
        kdim = C * K * K
        ccfg = MatmulConfig(M=8, N=F, K=kdim, A_dtype="float16",
                            W_dtype="uint4", with_scaling=True,
                            group_size=128, out_dtype="float16")
        cspec = KernelSpec.from_config(ccfg, 8)
        cops = random_reference_operands(ccfg, 8, 0)
        cdw = transform_reference_operands(ccfg, cops.qweight, cops.scales)
        wp = jnp.asarray(cdw.qweight)
        sc = jnp.asarray(cdw.scales)
        dq_x = make_weight_dequant(cspec, "bfloat16")
        dq_p = make_weight_decode_pallas(cspec, "bfloat16",
                                         interpret=interp)
        run(f"decode_xla K={kdim} N={F}", jax.jit(dq_x), (wp, sc),
            inject=0, full_output_dep=True)
        # full_output_dep on BOTH sides: the reduction work must be
        # identical or the A/B times different computations (review
        # 2026-08-20)
        run(f"decode_pallas K={kdim} N={F}", jax.jit(dq_p), (wp, sc),
            inject=0, full_output_dep=True)


if __name__ == "__main__":
    main()
