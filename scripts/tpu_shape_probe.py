"""Generic fused-kernel hint probe for one (M, N, K) u4 shape.

Usage: tpu_shape_probe.py M N K [cand-idx ...]   (defaults 16 640 8192)
Targets the 70B TP small-N regime (docs/Scaling70B.md): local projections
whose N is a handful of pack tiles, where grid overhead and pack padding
dominate. Floors printed alongside.
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

M = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N = int(sys.argv[2]) if len(sys.argv) > 2 else 640
K = int(sys.argv[3]) if len(sys.argv) > 3 else 8192


def main():
    cfg = MatmulConfig(M=M, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                       with_scaling=True, group_size=128, fast_decoding=False,
                       out_dtype="float16")
    spec = KernelSpec.from_config(cfg, M)
    npad = spec.n_padded
    H = lambda bm, bn, bk, mma="float32", dm="telescope": TileHint(
        block_m=bm, block_n=bn, block_k=bk, mma_dtype=mma, decode_mode=dm)
    cands = [
        ("whole-K f32 bn=full", H(256, npad, K)),
        ("whole-K f32 bn=256", H(256, 256, K)),
        ("f32 bn=full bk=K/2", H(256, npad, K // 2)),
        ("bf16 tele bn=full bk=K/2", H(256, npad, K // 2, "bfloat16")),
        ("f32 mask bn=full whole-K", H(256, npad, K, dm="mask")),
        ("bf16 tele bn=256 bk=K/4", H(256, 256, K // 4, "bfloat16")),
    ]
    sel = [int(v) for v in sys.argv[4:]] or list(range(len(cands)))

    ops = random_reference_operands(cfg, M, 0)
    dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
    args = [jnp.asarray(ops.A), jnp.asarray(dw.qweight),
            jnp.asarray(dw.scales)]
    wbytes = K * N // 2 + K * N // 128 * 4
    bw = (wbytes + M * K * 2 + M * N * 2) / 819e9
    ingest = K * npad / 1.52e12
    print(f"shape m={M} n={N}(pad {npad}) k={K}: bw {bw*1e6:.1f}us "
          f"ingest {ingest*1e6:.1f}us", flush=True)
    for i in sel:
        label, hint = cands[i]
        try:
            kf = make_dequant_matmul(spec, hint)
            sec = measure_kernel(lambda a, w, s, _k=kf: _k(a, w, scales=s),
                                 args)
            print(f"[{i}] {label:28s}: {sec*1e6:6.1f}us "
                  f"({100*max(bw, ingest)/sec:5.1f}% of floor)", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"[{i}] {label:28s}: FAIL {str(ex)[:80]}", flush=True)


if __name__ == "__main__":
    main()
