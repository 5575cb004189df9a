"""r5 decode-floor probe: NF4 / fp8 / fp4 GEMV decode variants on-chip.

VERDICT r4 item 1: NF4 m=1 is 85us vs 49us dense f16 (the one regime losing
to its own dense baseline); e4m3/e5m2/fp4 m=1 are 24-37% of envelope —
all serial-decode bound. Sweeps the new fp_mode (fast/fast16) and lut_mode
(mux4b/selectn, plus gather2d/gatherlane lowering retries) against the
curated defaults, at m in {1, 16, 256} on N=K=4096.

Every variant is bit-identical to its baseline through the kernel
(tests/test_dequant_matmul_kernel.py::TestR5DecodeVariants), so this probe
is purely a timing decision + a lowering gate check.
"""
import os
import sys
from dataclasses import replace

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
from bitblas_tpu.kernels.dense import make_dense_matmul
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import random_reference_operands
from bitblas_tpu.tuner import default_hint, get_arch, roofline_seconds
from bitblas_tpu.tuner.hint import TileHint
from bitblas_tpu.utils.timing import measure_kernel

NK = int(os.environ.get("BITBLAS_TPU_PROBE_NK", 4096))
MS = [int(x) for x in os.environ.get("BITBLAS_TPU_PROBE_MS",
                                     "1,16,256").split(",")]
FMTS = [s for s in os.environ.get(
    "BITBLAS_TPU_PROBE_FMTS",
    "nf4,fp4_e2m1,e4m3_float8,e5m2_float8").split(",") if s]
SKIP_DENSE = bool(os.environ.get("BITBLAS_TPU_PROBE_SKIP_DENSE"))


def bench_one(cfg, m, hint, label, ref=None):
    spec = KernelSpec.from_config(cfg, m)
    ops = random_reference_operands(cfg, m, 0)
    dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
    A = jnp.asarray(ops.A)
    W = jnp.asarray(dw.qweight)
    S = None if dw.scales is None else jnp.asarray(dw.scales)
    arch = get_arch()
    try:
        maker = make_dense_matmul if cfg.is_native_compute() \
            else make_dequant_matmul
        kf = maker(spec, hint, interpret=arch.is_cpu)
        if S is not None:
            fn = lambda A, W, S, _kf=kf: _kf(A, W, scales=S)  # noqa: E731
            args = (A, W, S)
        else:
            fn = lambda A, W, _kf=kf: _kf(A, W)  # noqa: E731
            args = (A, W)
        # correctness spot-check before timing (gather retries may lower
        # but produce garbage)
        got = np.asarray(fn(*args), np.float32)
        if ref is not None:
            # e5m2 random codes include NaN/inf bit patterns; compare only
            # finite reference positions (NaN err would silently pass the
            # `err > lim` gate — False for NaN). Also drop columns near the
            # f16 overflow boundary: random e5m2 spans +-57344, so borderline
            # sums overflow to inf in the kernel's f16 cast while the f32
            # reference stays finite (measured: every e5m2 row "WRONG
            # err=inf" in the r5e window — accumulation-order artifact, not
            # a decode bug; bit-exactness lives in TestR5DecodeVariants)
            fin = np.isfinite(ref) & (np.abs(ref) < 0.9 * 65504.0)
            err = float(np.max(np.abs(np.where(fin, got - ref, 0.0))))
            lim = 0.01 * float(np.max(np.abs(np.where(fin, ref, 0.0))))
            if err > max(lim, 1e-3):
                print(f"  {label:28s}: WRONG err={err:.3g}", flush=True)
                return None
        sec = min(measure_kernel(fn, args) for _ in range(2))
        roof = roofline_seconds(spec, hint, arch)
        print(f"  {label:28s}: {sec*1e6:8.1f}us  {roof/sec*100:5.1f}% roof",
              flush=True)
        return sec
    except Exception as ex:  # noqa: BLE001
        print(f"  {label:28s}: FAIL {str(ex)[:120]}", flush=True)
        return None


def reference_out(cfg, m):
    from bitblas_tpu.ops.reference import matmul_reference
    ops = random_reference_operands(cfg, m, 0)
    return np.asarray(matmul_reference(
        cfg, jnp.asarray(ops.A), jnp.asarray(ops.qweight),
        None if ops.scales is None else jnp.asarray(ops.scales)),
        np.float32)


def main():
    from health_wait import wait as health_wait
    if health_wait(3600) != 0:
        print("tunnel dead — aborting", flush=True)
        sys.exit(2)
    import jax
    print("devices:", jax.devices(), flush=True)
    arch = get_arch()

    # dense f16 baseline (the NF4 bar: reference claims NF4 >= dense f16)
    for m in MS if not SKIP_DENSE else []:
        dcfg = MatmulConfig(M=m, N=NK, K=NK, A_dtype="float16",
                            W_dtype="float16", out_dtype="float16")
        dspec = KernelSpec.from_config(dcfg, m)
        dh = default_hint(dspec, arch)
        print(f"dense f16 m={m}:", flush=True)
        bench_one(dcfg, m, dh, f"dense {dh.short_name()}")

    for wd in FMTS:
        for m in MS:
            cfg = MatmulConfig(M=m, N=NK, K=NK, A_dtype="float16",
                               W_dtype=wd, with_scaling=True,
                               group_size=128, out_dtype="float16")
            spec = KernelSpec.from_config(cfg, m)
            base = default_hint(spec, arch)
            print(f"{wd} m={m} (base {base.short_name()} "
                  f"lut={base.lut_mode} fp={base.fp_mode}):", flush=True)
            ref = reference_out(cfg, m)
            if wd == "nf4":
                variants = [("mux4", replace(base, lut_mode="mux4")),
                            ("mux4b", replace(base, lut_mode="mux4b")),
                            ("selectn", replace(base, lut_mode="selectn")),
                            ("gather2d", replace(base, lut_mode="gather2d")),
                            ("gatherlane",
                             replace(base, lut_mode="gatherlane"))]
            else:
                variants = []
                for mma in ("float32", "bfloat16"):
                    b = replace(base, mma_dtype=mma)
                    variants.append((f"{mma[:4]}/legacy",
                                     replace(b, fp_mode="legacy")))
                    variants.append((f"{mma[:4]}/fast",
                                     replace(b, fp_mode="fast")))
                    if mma == "bfloat16":
                        variants.append((f"{mma[:4]}/fast16",
                                         replace(b, fp_mode="fast16")))
            for lbl, h in variants:
                bench_one(cfg, m, h, lbl, ref=ref)


if __name__ == "__main__":
    main()
