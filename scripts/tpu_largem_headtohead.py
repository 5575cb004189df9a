"""Same-window head-to-head: curated i2 large-M hint vs the taller-bm
challengers the 2026-08-19 largem sweep surfaced at 8192
(t2048x2048x1024_mask 88.3% vs the 85.7% recorded bench row — but that
record is another window; only an in-window comparison decides)."""
import sys

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import random_reference_operands
from bitblas_tpu.tuner import TileHint
from bitblas_tpu.tuner.curated import curated_hint
from bitblas_tpu.utils.timing import measure_kernel


def log(*a):
    print(*a, flush=True)


def measure(cfg, m, hint):
    spec = KernelSpec.from_config(cfg, m)
    ops = random_reference_operands(cfg, m, 0)
    dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
    args = [jnp.asarray(ops.A), jnp.asarray(dw.qweight)]
    if cfg.with_scaling:
        args.append(jnp.asarray(dw.scales))
    kf = make_dequant_matmul(spec, hint)
    if cfg.with_scaling:
        fn = lambda A, W, S, _kf=kf: _kf(A, W, scales=S)
    else:
        fn = lambda A, W, _kf=kf: _kf(A, W)
    return min(measure_kernel(fn, args) for _ in range(2))


def main():
    # 2026-08-20: curated ADOPTED the t2048 winner, so the in-window
    # comparison is now curated(t2048) vs the PREVIOUS tile (t1024) —
    # reruns re-verify the decision instead of measuring one tile twice.
    challenger = TileHint(block_m=1024, block_n=1024, block_k=1024,
                          mma_dtype="int8", decode_mode="mask")
    for nk in (8192, 4096):
        cfg = MatmulConfig(M=4096, N=nk, K=nk, A_dtype="int8",
                           W_dtype="int2", accum_dtype="int32",
                           out_dtype="float32")
        roof = 4096 * nk * nk * 2 / 410e12 * 1e6
        cur = curated_hint("int2", "int8", 4096, nk)
        for name, h in (("curated", cur), ("previous", challenger)):
            try:
                sec = measure(cfg, 4096, h)
            except Exception as e:  # noqa: BLE001 - Mosaic HTTP 500s happen
                log(f"i2 m=4096 nk={nk} {name} "
                    f"{h.short_name()}_{h.decode_mode}: FAIL {str(e)[:120]}")
                continue
            log(f"i2 m=4096 nk={nk} {name} {h.short_name()}_{h.decode_mode}:"
                f" {sec*1e6:7.1f}us ({100*roof/(sec*1e6):5.1f}%)")


if __name__ == "__main__":
    main()
