"""Measured support matrix: one on-chip latency + %roofline per advertised
(W_dtype x A_dtype) pair at N=K=4096, m in {1, 256}.

The reference publishes a support matrix as a feature table
(/root/reference/README.md:61-88); this records the same matrix MEASURED
(the reference's own posture for its headline dtypes,
/root/reference/benchmark/README.md:44-77). Hints resolve operator-DB ->
curated -> analytic default, like serving. Writes
docs/support_matrix_bench_v5e.json (partial rows on budget expiry — each
row also streams to stdout as it lands).

Roofline per row = max(HBM stream, MXU compute, MXU ingest at small M)
— the bench.py envelope (BASELINE.md "roofline model").
"""
import json
import os
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bitblas_tpu.cache import global_operator_cache
from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
from bitblas_tpu.kernels.dense import make_dense_matmul
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import random_reference_operands
from bitblas_tpu.tuner import default_hint, get_arch
from bitblas_tpu.tuner.curated import curated_hint
from bitblas_tpu.utils.timing import measure_kernel

N = K = 4096
MS = tuple(int(x) for x in os.environ.get(
    "BITBLAS_TPU_SMB_MS", "1,256").split(",") if x.strip())
if not MS:
    raise SystemExit("BITBLAS_TPU_SMB_MS parsed to an empty m-list")
if "--cpu" in sys.argv:  # logic smoke on the host: tiny shapes, interpret
    sys.argv.remove("--cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    N = K = 256
    MS = (16,)
_SUFFIX = "" if MS == (1, 256) else "_m" + "_".join(map(str, MS))
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs",
    f"support_matrix_bench_v5e{_SUFFIX}.json")
if N != 4096:  # CPU smoke must never clobber the recorded chip artifact
    OUT = "/tmp/support_matrix_cpu_smoke.json"

# (A_dtype, W_dtype, with_scaling) — tests/test_support_matrix.py PAIRS.
PAIRS = [
    ("float16", "float16", False),
    ("bfloat16", "bfloat16", False),
    ("float32", "float32", False),
    ("int8", "int8", False),
    ("e4m3_float8", "e4m3_float8", False),
    ("e5m2_float8", "e5m2_float8", False),
    ("float16", "uint4", True),
    ("float16", "uint2", True),
    ("float16", "uint1", True),
    ("float16", "int4", False),
    ("float16", "int2", False),
    ("float16", "int1", False),
    ("float16", "int8", False),
    ("float16", "nf4", True),
    ("float16", "fp4_e2m1", True),
    ("float16", "e4m3_float8", False),
    ("float16", "e5m2_float8", False),
    ("bfloat16", "uint4", True),
    ("bfloat16", "int4", False),
    ("bfloat16", "nf4", True),
    ("bfloat16", "fp4_e2m1", True),
    ("bfloat16", "e4m3_float8", False),
    ("bfloat16", "int8", False),
    ("bfloat16", "uint2", True),
    ("bfloat16", "int2", False),
    ("bfloat16", "uint1", True),
    ("e4m3_float8", "e5m2_float8", False),
    ("e5m2_float8", "e4m3_float8", False),
    ("int4", "int4", False),
    ("int8", "uint4", True),
    ("int8", "uint2", True),
    ("int8", "uint4", False),
    ("int8", "int4", False),
    ("int8", "uint2", False),
    ("int8", "int2", False),
    ("int8", "uint1", False),
    ("int8", "int1", False),
]

ABYTES = {"float16": 2, "bfloat16": 2, "float32": 4, "int8": 1, "int4": 1,
          "e4m3_float8": 1, "e5m2_float8": 1}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _is_fatal(ex) -> bool:
    # bench.py's worker-crash markers: these kill every device buffer.
    s = str(ex)
    return any(k in s for k in (
        "UNAVAILABLE", "crashed", "restarted", "DEADLINE_EXCEEDED"))


def main():
    # Health-gate BEFORE any backend init: jax.devices() itself wedges on
    # a dead tunnel (CLAUDE.md; same order as bench.py).
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from health_wait import wait as health_wait
    if health_wait(float(os.environ.get(
            "BITBLAS_TPU_SMB_HEALTH_WAIT", 3600))) != 0:
        log("support-matrix: tunnel never became healthy — refusing to "
            "measure")
        sys.exit(2)
    import jax
    log("devices:", jax.devices())
    arch = get_arch()
    interpret = arch.is_cpu
    budget = float(os.environ.get("BITBLAS_TPU_SMB_BUDGET", 5400))
    t0 = time.monotonic()
    global_operator_cache.load_from_database()

    rows = []

    def flush():
        with open(OUT + ".tmp", "w") as f:
            json.dump({"arch": "tpu_v5e", "n": N, "k": K,
                       "date": "2026-08-20", "rows": rows}, f, indent=1)
            f.write("\n")
        os.replace(OUT + ".tmp", OUT)

    for a_dtype, w_dtype, scaling in PAIRS:
        int_act = a_dtype in ("int8", "int4")
        for m in MS:
            if time.monotonic() - t0 > budget:
                log("over budget — flushing partial matrix")
                flush()
                return
            cfg = MatmulConfig(
                M=m, N=N, K=K, A_dtype=a_dtype, W_dtype=w_dtype,
                with_scaling=scaling, group_size=128 if scaling else -1,
                fast_decoding=False,
                accum_dtype="int32" if int_act and w_dtype not in (
                    "e4m3_float8", "e5m2_float8") else "float32",
                out_dtype="float32" if int_act else "float16")
            spec = KernelSpec.from_config(cfg, m)
            row = {"a": a_dtype, "w": w_dtype, "scaling": scaling, "m": m}
            for attempt in (0, 1):
                try:
                    _measure_row(row, cfg, spec, m, int_act, scaling,
                                 arch, interpret)
                    break
                except Exception as ex:  # noqa: BLE001 - per-row isolation
                    if attempt == 0 and _is_fatal(ex):
                        # Worker crash killed this attempt's buffers:
                        # wait for the tunnel, rebuild from scratch once
                        # (bench.py / 70B-study retry pattern).
                        log(f"row {w_dtype}x{a_dtype} m={m} worker fault: "
                            f"{str(ex)[:120]} — re-gating + retrying")
                        if health_wait(3600) == 0:
                            continue
                    row["error"] = str(ex)[:160]
                    break
            rows.append(row)
            print(json.dumps(row), flush=True)
            flush()
    flush()
    log(f"done: {len(rows)} rows -> {OUT}")


def _measure_row(row, cfg, spec, m, int_act, scaling, arch, interpret):
    a_dtype, w_dtype = cfg.A_dtype, cfg.W_dtype
    ops = random_reference_operands(cfg, m, 0)
    # hint: operator DB -> curated (swept shape families only) -> default
    hint = None
    op = global_operator_cache.get(cfg)
    if op is not None:
        hint = op.hint_for(m)
    if hint is None and N in (4096, 8192):
        hint = curated_hint(w_dtype, a_dtype, m, nk=N)
    if hint is None:
        hint = default_hint(spec, arch)
    if cfg.is_native_compute():
        kf = make_dense_matmul(spec, hint, interpret=interpret)
        args = [jnp.asarray(ops.A), jnp.asarray(ops.qweight)]
        fn = kf
    else:
        dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
        args = [jnp.asarray(ops.A), jnp.asarray(dw.qweight)]
        kf = make_dequant_matmul(spec, hint, interpret=interpret)
        if dw.scales is not None:
            args.append(jnp.asarray(dw.scales))
            fn = lambda A, W, S, _kf=kf: _kf(A, W, scales=S)  # noqa: E731
        else:
            fn = kf
    sec = min(measure_kernel(fn, args) for _ in range(2))

    # envelope (bench.py model)
    wbits = cfg.bit
    abytes = ABYTES[a_dtype]
    obytes = 2 if cfg.out_dtype == "float16" else 4
    wbytes = N * K * wbits // 8 + (
        N * K // cfg.effective_group_size * 4 if scaling else 0)
    total = wbytes + m * K * abytes + m * N * obytes
    mxu = arch.flops_int8 if int_act else (
        arch.flops_f32 if a_dtype == "float32" else arch.flops_bf16)
    ingest = arch.mxu_ingest_int8 if int_act else arch.mxu_ingest_bf16
    roof = max(total / arch.hbm_bandwidth,
               2 * m * N * K / mxu, N * K / ingest)
    row.update(us=round(sec * 1e6, 1),
               pct_roofline=round(100 * roof / sec, 1),
               hint=hint.short_name() + "_" + hint.decode_mode)


if __name__ == "__main__":
    main()
