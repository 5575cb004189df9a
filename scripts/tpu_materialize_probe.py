"""Probe: two-pass materialize plan vs the fused curated winners on-chip.

Targets (VERDICT r1 #1/#2): i2 m=4096 is the fused plan's worst headline row
(432us measured = 77.6% vs a ~386us two-pass estimate); NF4 m=4096 pays the
VPU mux decode per M tile (1132us fused vs ~800us estimated two-pass, where
the LUT is a real XLA gather). u4 float is projected to LOSE (bf16 dense dot
streams 2x the decoded bytes) — measured here to confirm, not to enable.

Prints per-case fused vs materialize latency + max-abs cross-check, so the
curated table can be updated from one log.
"""
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import random_reference_operands
from bitblas_tpu.tuner import TileHint
from bitblas_tpu.tuner.curated import curated_hint
from bitblas_tpu.utils.timing import measure_kernel

N = K = 4096


def log(*a):
    print(*a, flush=True)


CASES = [
    ("int2", "int8", dict(accum_dtype="int32", out_dtype="float32"), "int8"),
    ("uint4", "float16", dict(with_scaling=True, group_size=128,
                              out_dtype="float16"), "bfloat16"),
    ("nf4", "float16", dict(with_scaling=True, group_size=128,
                            out_dtype="float16"), "bfloat16"),
]


def main():
    for w, a, kw, mat_mma in CASES:
        for m in (1024, 4096):
            cfg = MatmulConfig(M=m, N=N, K=K, A_dtype=a, W_dtype=w, **kw)
            spec = KernelSpec.from_config(cfg, m)
            ops = random_reference_operands(cfg, m, 0)
            dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
            args = [jnp.asarray(ops.A), jnp.asarray(dw.qweight)]
            if cfg.with_scaling:
                args.append(jnp.asarray(dw.scales))

            fused = curated_hint(w, a, m) or TileHint(
                block_m=min(1024, m), block_n=1024, block_k=1024,
                mma_dtype=mat_mma if a == "int8" else "bfloat16",
                decode_mode="telescope" if w != "nf4" else "mask")
            mat = TileHint(block_m=512, block_n=1024, block_k=1024,
                           mma_dtype=mat_mma, decode_mode="materialize")

            outs = {}
            for tag, hint in (("fused", fused), ("mat", mat)):
                try:
                    kf = make_dequant_matmul(spec, hint)
                    fn = (lambda A, W, S, _kf=kf: _kf(A, W, scales=S)) \
                        if cfg.with_scaling else \
                        (lambda A, W, _kf=kf: _kf(A, W))
                    outs[tag] = np.asarray(fn(*args), np.float32)
                    tkw = dict(inject=1, full_output_dep=True) \
                        if hint.decode_mode == "materialize" else {}
                    sec = min(measure_kernel(fn, args, **tkw)
                              for _ in range(2))
                    log(f"{w}x{a} m={m} {tag:5s} "
                        f"{hint.short_name()}_{hint.decode_mode}: "
                        f"{sec*1e6:8.1f}us")
                except Exception as ex:  # noqa: BLE001
                    log(f"{w}x{a} m={m} {tag:5s} FAILED: {str(ex)[:140]}")
            if len(outs) == 2:
                d = np.max(np.abs(outs["fused"] - outs["mat"]))
                ref = max(np.max(np.abs(outs["fused"])), 1e-6)
                flag = "ok" if d <= 0.02 * ref else "WARN"
                log(f"{w}x{a} m={m} cross-check max|diff|={d:.4g} "
                    f"(max|out|={ref:.4g}) {flag}")


if __name__ == "__main__":
    main()
