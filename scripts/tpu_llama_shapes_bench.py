"""Measure the llama-70B projection shapes as would-be bench rows.

The reference benchmarks over real LLM shape sets (M0-M12/V0-V12 from
BLOOM/OPT/LLAMA — /root/reference/benchmark/README.md:44-77), not synthetic
squares; bench.py's 4096^2 headline is the measured worst case
(docs/Benchmarks.md). This sweeps the llama-3-70B projection shape
(N=K=8192) for both headline formats over the full M sweep with the curated/
default hints plus the materialize candidate, printing rows in bench.py's
format so they can be promoted into bench.py with measured hints. Winners
are persisted into the operator hint DB so bench.py's 8192 rows (and any
library dispatch at these shapes) start from the measured-best hint.
"""
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bitblas_tpu.kernels.asplit import supports_asplit
from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
from bitblas_tpu.kernels.materialize import supports_materialize
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import random_reference_operands
from bitblas_tpu.tuner import TileHint, get_arch
from bitblas_tpu.tuner.curated import curated_hint
from bitblas_tpu.tuner.space import default_hint
from bitblas_tpu.utils.timing import measure_kernel


def log(*a):
    print(*a, flush=True)


def main():
    arch = get_arch()
    N = K = 8192
    for w, a, kw in [
        ("uint4", "float16", dict(with_scaling=True, group_size=128,
                                  out_dtype="float16")),
        ("int2", "int8", dict(accum_dtype="int32", out_dtype="float32")),
    ]:
        for m in (1, 16, 256, 4096):
            cfg = MatmulConfig(M=m, N=N, K=K, A_dtype=a, W_dtype=w, **kw)
            spec = KernelSpec.from_config(cfg, m)
            ops = random_reference_operands(cfg, m, 0)
            dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
            args = [jnp.asarray(ops.A), jnp.asarray(dw.qweight)]
            if cfg.with_scaling:
                args.append(jnp.asarray(dw.scales))

            wbits = cfg.bit
            abytes = 2 if a == "float16" else 1
            obytes = 2 if cfg.out_dtype == "float16" else 4
            wbytes = N * K * wbits // 8 + (
                N * K // cfg.effective_group_size * 4
                if cfg.with_scaling else 0)
            total = wbytes + m * K * abytes + m * N * obytes
            mxu = arch.flops_int8 if a == "int8" else arch.flops_bf16
            ingest = (arch.mxu_ingest_int8 if a == "int8"
                      else arch.mxu_ingest_bf16)
            roof = max(total / arch.hbm_bandwidth, 2 * m * N * K / mxu,
                       N * K / ingest)

            hints = []
            c = curated_hint(w, a, m)
            if c is not None:
                hints.append(c)
            try:
                hints.append(default_hint(spec, arch))
            except Exception:  # noqa: BLE001
                pass
            if m >= 512:
                mat = TileHint(block_m=512, block_n=1024, block_k=1024,
                               mma_dtype=("int8" if a == "int8"
                                          else "bfloat16"),
                               decode_mode="materialize")
                if supports_materialize(spec, mat):
                    hints.append(mat)
            if a == "float16" and m <= 256:
                # activation-split GEMV on the int8 MXU (bench.py parity)
                for bn, bk in ((2048, 1024), (512, 4096)):
                    h = TileHint(block_m=256, block_n=bn, block_k=bk,
                                 mma_dtype="int8", decode_mode="asplit")
                    if supports_asplit(spec, h):
                        hints.append(h)
            seen, uniq = set(), []
            for h in hints:
                key = h.short_name() + h.decode_mode + h.group_mode
                if key not in seen:
                    seen.add(key)
                    uniq.append(h)

            best = None
            for hint in uniq:
                try:
                    kf = make_dequant_matmul(spec, hint)
                    fn = (lambda A, W, S, _kf=kf: _kf(A, W, scales=S)) \
                        if cfg.with_scaling else \
                        (lambda A, W, _kf=kf: _kf(A, W))
                    if hint.decode_mode == "materialize":
                        tkw = dict(inject=1, full_output_dep=True)
                    elif hint.decode_mode == "asplit":
                        tkw = dict(inject=0)  # keep the quantize prologue
                    else:
                        tkw = {}
                    sec = min(measure_kernel(fn, args, **tkw)
                              for _ in range(2))
                    log(f"{w}x{a} N=K=8192 m={m:5d}: {sec*1e6:8.1f}us "
                        f"roof={roof*1e6:7.1f}us pct={100*roof/sec:5.1f}% "
                        f"({hint.short_name()}_{hint.decode_mode})")
                    if best is None or sec < best[0]:
                        best = (sec, hint)
                except Exception as ex:  # noqa: BLE001
                    log(f"{w}x{a} m={m} {hint.short_name()}"
                        f"_{hint.decode_mode} FAILED: {str(ex)[:140]}")
            if best is not None:
                _persist_winner(cfg, m, best[1])
    _save_db()


def _persist_winner(cfg, m, hint):
    """Install a measured winner into the on-disk operator hint DB (the
    same mechanism as scripts/seed_curated_hints.py) so bench.py's 8192
    rows and library dispatch start from it."""
    from bitblas_tpu import Matmul
    from bitblas_tpu.cache import global_operator_cache
    op = global_operator_cache.get(cfg)
    if op is None:
        op = Matmul(cfg, enable_tuning=False, from_database=True)
        global_operator_cache.add(cfg, op)
    op.apply_hints({m: hint})
    log(f"DB <- {cfg.W_dtype}x{cfg.A_dtype} N={cfg.N} m={m}: "
        f"{hint.short_name()}_{hint.decode_mode}")


def _save_db():
    from bitblas_tpu.cache import global_operator_cache
    global_operator_cache.save_into_database()
    log("hint DB saved")


if __name__ == "__main__":
    from bitblas_tpu.cache import global_operator_cache
    global_operator_cache.load_from_database()
    main()
