"""Close the last bench gaps: i2 GEMV whole-N tiles, u4 m=256 variants,
i2 m=4096 bm confirm, NF4 tile refresh + hardware gather probes.

Motivation (2026-08-17): bench mean projects ~79.4% vs the >=80 gate.
i2 m=256 gained 7 points from bn=4096 whole-N tiles (71.5 -> 79.2); the
same formulation is untried at m=1/16 (curated bn=2048 bk=1024 = 81%).
"""
import sys
import traceback

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.ops.reference import matmul_reference
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import random_reference_operands
from bitblas_tpu.tuner import TileHint
from bitblas_tpu.utils.timing import measure_kernel

N = K = 4096


def log(*a):
    print(*a, flush=True)


def run(cfg, m, hints, roof_us, reps=2, check=False):
    spec = KernelSpec.from_config(cfg, m)
    ops = random_reference_operands(cfg, m, 0)
    dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
    args = [jnp.asarray(ops.A), jnp.asarray(dw.qweight)]
    if cfg.with_scaling:
        args.append(jnp.asarray(dw.scales))
    exp = None
    if check:
        exp = np.asarray(matmul_reference(
            cfg, jnp.asarray(ops.A), jnp.asarray(ops.qweight),
            jnp.asarray(ops.scales)), np.float32)
    for hint in hints:
        tag = (f"{cfg.W_dtype} m={m} {hint.short_name()}_{hint.decode_mode}"
               f"{'_' + hint.lut_mode if cfg.W_dtype == 'nf4' else ''}")
        try:
            kf = make_dequant_matmul(spec, hint)
            if cfg.with_scaling:
                fn = lambda A, W, S, _kf=kf: _kf(A, W, scales=S)
            else:
                fn = lambda A, W, _kf=kf: _kf(A, W)
            if exp is not None:
                out = np.asarray(kf(*args[:2], scales=args[2]), np.float32)
                aerr = np.abs(out - exp).max()
                scale = max(np.abs(exp).max(), 1e-6)
                log(f"{tag}: maxabs={aerr:.4f} rel={aerr/scale:.2e} "
                    f"(|exp|max={scale:.2f})")
                # bf16 decode of the NF4 table costs ~2^-9 rel per element;
                # accumulated over K the honest gate is relative.
                assert aerr / scale < 0.05, f"wrong: rel {aerr/scale}"
            sec = min(measure_kernel(fn, args) for _ in range(reps))
            log(f"{tag}: {sec*1e6:8.1f}us ({100*roof_us/(sec*1e6):5.1f}%)")
        except Exception:
            tb = traceback.format_exc(limit=20)
            log(f"{tag}: FAIL\n{tb[-1200:]}")


def main():
    # --- i2 GEMV m=1/16: whole-N (and whole-K) int8-telescope tiles ---
    for m, roof in ((1, 9.1), (16, 9.1)):
        cfg = MatmulConfig(M=m, N=N, K=K, A_dtype="int8", W_dtype="int2",
                           accum_dtype="int32", out_dtype="float32")
        hints = [TileHint(block_m=max(m, 8), block_n=bn, block_k=bk,
                          mma_dtype="int8", decode_mode="telescope")
                 for bn in (2048, 4096) for bk in (512, 1024, 2048, 4096)]
        run(cfg, m, hints, roof)

    # --- u4 m=16: between the m=1 serial floor and the m=256 whole-K win
    # (bench row at 71%; VERDICT r1 #1 asks for an explicit sweep) ---
    u4s = MatmulConfig(M=16, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                       with_scaling=True, group_size=128,
                       fast_decoding=False, out_dtype="float16")
    hints = [TileHint(block_m=16, block_n=bn, block_k=bk,
                      mma_dtype="float32", decode_mode="telescope")
             for bn in (128, 256, 512, 1024) for bk in (2048, 4096)]
    hints += [TileHint(block_m=16, block_n=bn, block_k=4096,
                       mma_dtype="bfloat16", decode_mode="telescope")
              for bn in (256, 512)]
    hints += [TileHint(block_m=16, block_n=512, block_k=4096,
                       mma_dtype="float32", decode_mode="mask")]
    run(u4s, 16, hints, 11.2)

    # --- u4 m=256: whole-K narrow-N variants around the 51.4us curated ---
    u4 = MatmulConfig(M=256, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                      with_scaling=True, group_size=128,
                      fast_decoding=False, out_dtype="float16")
    hints = [TileHint(block_m=256, block_n=bn, block_k=4096,
                      mma_dtype="bfloat16", decode_mode="telescope")
             for bn in (256, 512, 1024, 2048)]
    hints += [TileHint(block_m=256, block_n=512, block_k=2048,
                       mma_dtype="bfloat16", decode_mode="telescope")]
    run(u4, 256, hints, 42.0)

    # --- u4 m=4096: bm=2048 single-N-tile (2 decode passes vs 4; acc 32MB
    # + operands ~43MB at bk=512 — VMEM-edge, may not compile) ---
    u4l = MatmulConfig(M=4096, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                       with_scaling=True, group_size=128,
                       fast_decoding=False, out_dtype="float16")
    hints = [TileHint(block_m=2048, block_n=4096, block_k=bk,
                      mma_dtype="bfloat16", decode_mode="telescope",
                      vmem_limit_bytes=100 * 2**20)
             for bk in (256, 512)]
    hints += [TileHint(block_m=1024, block_n=4096, block_k=512,
                       mma_dtype="bfloat16", decode_mode="telescope")]
    run(u4l, 4096, hints, 670.4, reps=3)

    # --- i2 m=4096: bm=2048 vs curated bm=1024 in one window ---
    i2l = MatmulConfig(M=4096, N=N, K=K, A_dtype="int8", W_dtype="int2",
                       accum_dtype="int32", out_dtype="float32")
    hints = [TileHint(block_m=bm, block_n=1024, block_k=1024,
                      mma_dtype="int8", decode_mode="mask")
             for bm in (1024, 2048, 4096)]
    run(i2l, 4096, hints, 335.2, reps=3)

    # --- NF4: correctness detail (relative gate) + gather probes ---
    for m in (1, 16):
        nf = MatmulConfig(M=m, N=N, K=K, A_dtype="float16", W_dtype="nf4",
                          with_scaling=True, group_size=128,
                          out_dtype="float16")
        hints = [TileHint(block_m=max(m, 8), block_n=512, block_k=4096,
                          mma_dtype="bfloat16", decode_mode="mask",
                          lut_mode=lm)
                 for lm in ("select", "mux4", "gather2d", "gatherlane")]
        run(nf, m, hints, 11.0, check=True)
    nf = MatmulConfig(M=4096, N=N, K=K, A_dtype="float16", W_dtype="nf4",
                      with_scaling=True, group_size=128, out_dtype="float16")
    hints = [TileHint(block_m=1024, block_n=1024, block_k=bk,
                      mma_dtype="bfloat16", decode_mode="mask", lut_mode=lm)
             for bk in (512, 1024) for lm in ("select", "mux4", "gatherlane")]
    hints += [TileHint(block_m=2048, block_n=2048, block_k=512,
                       mma_dtype="bfloat16", decode_mode="mask",
                       lut_mode=lm, vmem_limit_bytes=100 * 2**20)
              for lm in ("select", "mux4")]
    run(nf, 4096, hints, 670.4, reps=2)


if __name__ == "__main__":
    main()
