"""u4 m=256 GEMM hint sweep with the robust min-slope timer.

m=256 N=K=4096 W_UINT4xA_FP16 g=128 is MXU-compute-bound (roof ~43.6us on
v5e); curated hint (1024x1024x256 bf16 tele) measures ~77%. Sweep tile
shapes + decode modes to close the serialization gap. Select configs by
index on argv so slices fit the 10-min window.
"""
import sys

import jax.numpy as jnp

from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import random_reference_operands
from bitblas_tpu.tuner.hint import TileHint
from bitblas_tpu.utils.timing import measure_kernel

import os

N = K = 4096
M = int(os.environ.get("SWEEP_M", "256"))
ROOF = 2 * M * N * K / 197e12


def main():
    w_dtype = os.environ.get("SWEEP_W", "uint4")
    if w_dtype == "int2":
        cfg = MatmulConfig(M=M, N=N, K=K, A_dtype="int8", W_dtype="int2",
                           accum_dtype="int32", out_dtype="float32")
    else:
        cfg = MatmulConfig(M=M, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                           with_scaling=True, group_size=128,
                           fast_decoding=False, out_dtype="float16")
    H = lambda bm, bn, bk, mma="bfloat16", dm="telescope": TileHint(
        block_m=bm, block_n=bn, block_k=bk, mma_dtype=mma, decode_mode=dm)
    if w_dtype == "int2":
        roof_i2 = 2 * M * N * K / 394e12
        cands_i2 = [
            ("cur 256x4096x512 i8tele", H(256, 4096, 512, "int8")),
            ("256x1024x4096 i8tele", H(256, 1024, 4096, "int8")),
            ("256x512x4096 i8tele", H(256, 512, 4096, "int8")),
            ("256x2048x2048 i8tele", H(256, 2048, 2048, "int8")),
            ("256x2048x4096 i8tele", H(256, 2048, 4096, "int8")),
            ("256x1024x2048 i8tele", H(256, 1024, 2048, "int8")),
            ("256x512x4096 i8mask", H(256, 512, 4096, "int8", "mask")),
            ("512x1024x1024 i8mask", H(512, 1024, 1024, "int8", "mask")),
            # m=4096 regime (bench curated: 512x1024x1024 i8 mask)
            ("512x2048x512 i8mask", H(512, 2048, 512, "int8", "mask")),
            ("1024x1024x1024 i8mask", H(1024, 1024, 1024, "int8", "mask")),
            ("512x1024x1024 i8tele", H(512, 1024, 1024, "int8")),
            ("1024x2048x512 i8mask", H(1024, 2048, 512, "int8", "mask")),
            ("512x1024x2048 i8mask", H(512, 1024, 2048, "int8", "mask")),
            ("1024x1024x512 i8tele", H(1024, 1024, 512, "int8")),
        ]
        run_set(cfg, cands_i2, roof_i2)
        return
    cands = [
        ("256x1024x256 tele", H(256, 1024, 256)),
        ("256x2048x512 tele", H(256, 2048, 512)),
        ("256x1024x1024 tele", H(256, 1024, 1024)),
        ("256x512x2048 tele", H(256, 512, 2048)),
        ("256x2048x1024 tele", H(256, 2048, 1024)),
        ("256x4096x512 tele", H(256, 4096, 512)),
        ("256x1024x512 tele", H(256, 1024, 512)),
        ("256x1024x1024 mask", H(256, 1024, 1024, dm="mask")),
        ("256x2048x512 mask", H(256, 2048, 512, dm="mask")),
        ("256x512x4096 tele", H(256, 512, 4096)),
        ("256x4096x1024 tele", H(256, 4096, 1024)),
        ("256x2048x2048 tele", H(256, 2048, 2048)),
        # bm variants for the m=4096 regime
        ("cur 1024x1024x256 tele", H(1024, 1024, 256)),
        ("512x4096x512 tele", H(512, 4096, 512)),
        ("512x2048x512 tele", H(512, 2048, 512)),
        ("1024x2048x512 tele", H(1024, 2048, 512)),
        ("1024x4096x512 tele", H(1024, 4096, 512)),
        ("512x2048x1024 tele", H(512, 2048, 1024)),
    ]
    run_set(cfg, cands, ROOF)


def run_set(cfg, cands, roof):
    sel = [int(v) for v in sys.argv[1:]] or list(range(len(cands)))
    check = bool(os.environ.get("SWEEP_CHECK"))

    spec = KernelSpec.from_config(cfg, M)
    ops = random_reference_operands(cfg, M, 0)
    dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
    args = [jnp.asarray(ops.A), jnp.asarray(dw.qweight)]
    if cfg.with_scaling:
        args.append(jnp.asarray(dw.scales))
    ref = None
    for i in sel:
        label, hint = cands[i]
        try:
            kf = make_dequant_matmul(spec, hint)
            fn = (lambda a, w, s, _k=kf: _k(a, w, scales=s)) \
                if cfg.with_scaling else (lambda a, w, _k=kf: _k(a, w))
            if check:
                out = jnp.asarray(fn(*args), jnp.float32)
                if ref is None:
                    ref = out
                    print(f"[{i:2d}] {label:28s}: reference", flush=True)
                else:
                    err = float(jnp.max(jnp.abs(out - ref)))
                    den = float(jnp.max(jnp.abs(ref)))
                    print(f"[{i:2d}] {label:28s}: rel err {err/den:.2e}",
                          flush=True)
                continue
            sec = measure_kernel(fn, args)
            print(f"[{i:2d}] {label:28s}: {sec*1e6:6.1f}us "
                  f"pct={100*roof/sec:5.1f}%", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"[{i:2d}] {label:28s}: FAIL {str(ex)[:80]}", flush=True)


if __name__ == "__main__":
    main()
