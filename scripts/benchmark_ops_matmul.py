"""Standalone operator benchmark over LLM shape sets.

TPU port of /root/reference/benchmark/operators/benchmark_ops_matmul.py: the
same (N, K) shape table drawn from BLOOM/OPT/LLAMA/LLAMA-2 (reference
benchmark/README.md:44-77), swept at GEMV (M=1) and GEMM (M=4096) regimes
for FP16xFP16, INT8xINT8, FP16xUINT4, FP16xUINT2 and INT8xUINT2.

Usage: PYTHONPATH=. python scripts/benchmark_ops_matmul.py [--tune] [--json out.json]
"""

import argparse
import sys

from bitblas_tpu import Matmul, MatmulConfig
from bitblas_tpu.benchmark import OperatorBenchmarkBase

# (N, K) pairs — the reference's full M0-M7/V0-V12 LLM shape table
# (/root/reference/benchmark/README.md:44-77: square calibration + BLOOM +
# OPT + LLAMA/LLAMA-2 projections; the M rows run these at m=8192, the V
# rows at m=1 — both covered by --m).
LLM_SHAPES = [
    (16384, 16384),                                   # M0/V0 calibration
    (43008, 14336), (14336, 14336),                   # bloom-176b V1/V2
    (57344, 14336), (14336, 57344),                   # bloom-176b V3/V4
    (9216, 9216), (36864, 9216), (9216, 36864),       # opt-175b V5-V7
    (22016, 8192), (8192, 22016),                     # llama V8/V9
    (8192, 8192), (28672, 8192), (8192, 28672),       # llama-2-70b V10-V12
    (4096, 4096), (11008, 4096), (4096, 11008),       # llama-2-7b extras
]

DTYPE_SETS = [
    ("fp16xfp16", dict(A_dtype="float16", W_dtype="float16")),
    ("int8xint8", dict(A_dtype="int8", W_dtype="int8", accum_dtype="int32",
                       out_dtype="int32")),
    ("fp16xuint4", dict(A_dtype="float16", W_dtype="uint4",
                        with_scaling=True, group_size=128)),
    ("fp16xuint2", dict(A_dtype="float16", W_dtype="uint2",
                        with_scaling=True, group_size=128)),
    ("int8xint2", dict(A_dtype="int8", W_dtype="int2", accum_dtype="int32",
                       out_dtype="float32")),
    # W4A8 (LiquidGEMM-style serving scheme): int8 activations x uint4
    # weights with grouped scales, exact via raw int dots + f32 epilogue
    ("int8xuint4g", dict(A_dtype="int8", W_dtype="uint4",
                         with_scaling=True, group_size=128,
                         out_dtype="float32")),
]


class MatmulBenchmark(OperatorBenchmarkBase):
    pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tune", action="store_true")
    ap.add_argument("--json", default=None)
    ap.add_argument("--m", type=int, nargs="*", default=[1, 4096])
    ap.add_argument("--sets", nargs="*",
                    default=[n for n, _ in DTYPE_SETS])
    ap.add_argument("--shapes", type=int, nargs="*", default=None,
                    help="indices into the LLM shape table (slice long "
                         "remote-tunnel runs)")
    args = ap.parse_args()
    shapes = (LLM_SHAPES if args.shapes is None
              else [LLM_SHAPES[i] for i in args.shapes])

    bench = MatmulBenchmark()
    for set_name, kw in DTYPE_SETS:
        if set_name not in args.sets:
            continue
        entries = []
        for m in args.m:
            for n, k in shapes:
                cfg = MatmulConfig(M=m, N=n, K=k, **kw)
                entries.append((
                    f"{set_name}_m{m}_n{n}_k{k}", cfg,
                    lambda c: Matmul(c, enable_tuning=False)))
        bench.add_benchmark_set(set_name, entries)

    bench.run(enable_tuning=args.tune)
    print(bench.report())
    if args.json:
        bench.save_results(args.json)
        print(f"saved {args.json}", file=sys.stderr)


if __name__ == "__main__":
    main()
