"""r5 probe: W4A8 + grouped scales GEMM (VERDICT r4 item 3 — 58.8%).

Analysis (docs/Benchmarks.md gets the conclusion): with per-group scales on
an int-activation path, every k-group's int32 partial needs a [BM,BN] f32
epilogue (cast + telescope-FMA + scale-FMA ~= 2-3 VPU ops per output
element per group). At 4096^3 / g=128 that is 32 full-output VPU passes
~= 237-356us against a 335us int8 dot — and VPU and MXU do not overlap on
this chip (every pipelining probe), so the serialized floor is
dot/(dot+epi) ~= 50-60%. This probe sweeps every plausible variant to
either find a better tile or pin the measured floor:

  * tele_i8 / mask_i8 at several (bm, bn, bk)
  * bf16-mma fused (scale folded into the decode, per-element: N*K ops
    instead of (K/g)*M*N — wins the VPU side, loses the 2x int8 MXU rate)
  * per-channel scaling control (epilogue once — the no-group ceiling)
  * unscaled control (the pure-dot ceiling)
"""
import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import random_reference_operands
from bitblas_tpu.tuner import get_arch
from bitblas_tpu.tuner.hint import TileHint
from bitblas_tpu.utils.timing import measure_kernel

M = int(os.environ.get("BITBLAS_TPU_PROBE_M", 4096))
NK = int(os.environ.get("BITBLAS_TPU_PROBE_NK", 4096))

CANDS = [
    (1024, 2048, 512, "int8", "telescope"),
    (1024, 2048, 1024, "int8", "telescope"),
    (2048, 2048, 512, "int8", "telescope"),
    (1024, 1024, 1024, "int8", "telescope"),
    (512, 2048, 512, "int8", "telescope"),
    (1024, 2048, 128, "int8", "telescope"),   # bk == g: one group per step
    (1024, 2048, 512, "int8", "mask"),
    (1024, 1024, 1024, "int8", "mask"),
    (1024, 2048, 512, "bfloat16", "telescope"),  # scale folded at decode
    (1024, 1024, 1024, "bfloat16", "mask"),
    (512, 4096, 1024, "bfloat16", "telescope"),
]


def run(cfg, label_suffix=""):
    m = cfg.M if isinstance(cfg.M, int) else max(cfg.M)
    spec = KernelSpec.from_config(cfg, m)
    ops = random_reference_operands(cfg, m, 0)
    dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
    A = jnp.asarray(ops.A)
    W = jnp.asarray(dw.qweight)
    S = None if dw.scales is None else jnp.asarray(dw.scales)
    arch = get_arch()
    flops = 2.0 * m * NK * NK
    best = (None, 1e9)
    for bm, bn, bk, mma, dm in CANDS:
        name = f"t{bm}x{bn}x{bk}_{mma[:4]}_{dm[:4]}{label_suffix}"
        try:
            hint = TileHint(block_m=bm, block_n=bn, block_k=bk,
                            mma_dtype=mma, decode_mode=dm)
            kf = make_dequant_matmul(spec, hint, interpret=arch.is_cpu)
            if S is not None:
                fn = lambda A, W, S, _kf=kf: _kf(A, W, scales=S)  # noqa
                args = (A, W, S)
            else:
                fn = lambda A, W, _kf=kf: _kf(A, W)  # noqa: E731
                args = (A, W)
            sec = min(measure_kernel(fn, args) for _ in range(2))
            print(f"  {name}: {sec*1e6:8.1f}us {flops/sec/1e12:6.1f} TF/s",
                  flush=True)
            if sec < best[1]:
                best = (name, sec)
        except Exception as ex:  # noqa: BLE001
            print(f"  {name}: FAIL {str(ex)[:120]}", flush=True)
    return best


def main():
    from health_wait import wait as health_wait
    if health_wait(3600) != 0:
        print("tunnel dead — aborting", flush=True)
        sys.exit(2)
    import jax
    print("devices:", jax.devices(), flush=True)

    print(f"W4A8 grouped (g=128) m={M} nk={NK}:", flush=True)
    cfg = MatmulConfig(M=M, N=NK, K=NK, A_dtype="int8", W_dtype="uint4",
                       accum_dtype="int32", out_dtype="float32",
                       with_scaling=True, group_size=128)
    b = run(cfg)
    print(f"  BEST grouped: {b[0]} {b[1]*1e6:.1f}us", flush=True)

    print(f"W4A8 per-channel control m={M}:", flush=True)
    cfgc = MatmulConfig(M=M, N=NK, K=NK, A_dtype="int8", W_dtype="uint4",
                        accum_dtype="int32", out_dtype="float32",
                        with_scaling=True, group_size=-1)
    run(cfgc, "_pc")

    print(f"W4A8 unscaled control m={M}:", flush=True)
    cfgu = MatmulConfig(M=M, N=NK, K=NK, A_dtype="int8", W_dtype="uint4",
                        accum_dtype="int32", out_dtype="int32")
    run(cfgu, "_un")


if __name__ == "__main__":
    main()
