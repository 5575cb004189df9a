"""Probe: exact-block_m whole-K tiles for the floored 4096^2 small-M rows.

The 8192 llama-shape sweep (2026-08-19) found exact-m whole-K tiles beat
the bm=256 curated family by ~14% at m<=16 (u4 m=1: t8x256x8192 54.4us vs
t256x256x4096 63.3). This measures the same family at the 4096^2 headline
shape against the curated winners (u4 m=1 floor 16.5-17us, i2 m=1 ~11.2us).
Winners go into tuner/curated.py.
"""
import sys

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
from bitblas_tpu.tuner.curated import curated_hint
from bitblas_tpu.utils.timing import measure_kernel

N = K = 4096


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    log("devices:", jax.devices())
    cases = [("uint4", "float16",
              dict(with_scaling=True, group_size=128, fast_decoding=False,
                   out_dtype="float16")),
             ("int2", "int8", dict(accum_dtype="int32",
                                   out_dtype="float32"))]
    for w, a, kw in cases:
        for m in (1, 16):
            cfg = MatmulConfig(M=m, N=N, K=K, A_dtype=a, W_dtype=w, **kw)
            spec = KernelSpec.from_config(cfg, m)
            ops = random_reference_operands(cfg, m, 0)
            dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
            args = [jnp.asarray(ops.A), jnp.asarray(dw.qweight)]
            if cfg.with_scaling:
                args.append(jnp.asarray(dw.scales))
            exp = np.asarray(matmul_reference(
                cfg, jnp.asarray(ops.A), jnp.asarray(ops.qweight),
                None if ops.scales is None else jnp.asarray(ops.scales)),
                np.float32)
            gate = 0.01 * max(float(np.max(np.abs(exp))), 1.0)
            bm = max(m, 8)
            hints = [("curated", curated_hint(w, a, m))]
            if w == "uint4":
                for bn in (128, 256, 512):
                    hints.append((f"exact{bm}x{bn}xK", TileHint(
                        block_m=bm, block_n=bn, block_k=K,
                        mma_dtype="float32", decode_mode="telescope")))
                hints.append((f"exact{bm}x256x2048", TileHint(
                    block_m=bm, block_n=256, block_k=2048,
                    mma_dtype="float32", decode_mode="telescope")))
            else:
                for bn in (1024, 2048, 4096):
                    hints.append((f"exact{bm}x{bn}xK", TileHint(
                        block_m=bm, block_n=bn, block_k=K,
                        mma_dtype="int8", decode_mode="telescope")))
                hints.append((f"exact{bm}x2048x2048", TileHint(
                    block_m=bm, block_n=2048, block_k=2048,
                    mma_dtype="int8", decode_mode="telescope")))
            for label, hint in hints:
                try:
                    kf = make_dequant_matmul(spec, hint)
                    out = np.asarray(
                        kf(*args[:2],
                           scales=args[2] if cfg.with_scaling else None),
                        np.float32)
                    err = np.max(np.abs(out - exp))
                    assert err < gate, f"wrong: {err} (gate {gate:.3f})"
                    sec = min(measure_kernel(
                        (lambda A, W, S: kf(A, W, scales=S))
                        if cfg.with_scaling else (lambda A, W: kf(A, W)),
                        args) for _ in range(2))
                    log(f"{w}x{a} m={m} {label:16s} "
                        f"{hint.short_name()}: {sec*1e6:8.1f}us")
                except Exception as ex:  # noqa: BLE001
                    log(f"{w}x{a} m={m} {label:16s}: FAIL {str(ex)[:120]}")


if __name__ == "__main__":
    main()
