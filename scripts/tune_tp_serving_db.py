"""Tune the Llama-3-70B TP-local projection shapes into the operator DB.

TPQuantLlama consults the DB before analytic defaults, so winners tuned
here feed straight into the serving kernels. Resumable: each tuned config
saves immediately; already-cached configs are skipped.

Usage: tune_tp_serving_db.py [tp] [m] [topk]   (defaults 8 16 6)
"""
import sys
import time

from bitblas_tpu import Matmul, MatmulConfig
from bitblas_tpu.cache import global_operator_cache

HIDDEN, KV_HEADS, HEAD_DIM, INTER = 8192, 8, 128, 28672

TP = int(sys.argv[1]) if len(sys.argv) > 1 else 8
M = int(sys.argv[2]) if len(sys.argv) > 2 else 16
TOPK = int(sys.argv[3]) if len(sys.argv) > 3 else 6


def main():
    kv = KV_HEADS * HEAD_DIM
    projs = {
        "qkv": (HIDDEN, (HIDDEN + 2 * kv) // TP),
        "o": (HIDDEN // TP, HIDDEN),
        "gateup": (HIDDEN, 2 * INTER // TP),
        "down": (INTER // TP, HIDDEN),
    }
    global_operator_cache.load_from_database()
    for name, (k, n) in projs.items():
        cfg = MatmulConfig(M=M, N=n, K=k, A_dtype="float16",
                           W_dtype="uint4", with_scaling=True,
                           with_zeros=True, zeros_mode="original",
                           group_size=128, out_dtype="float16")
        if global_operator_cache.get(cfg) is not None:
            print(f"cached: {name} [{k}x{n}]", flush=True)
            continue
        t0 = time.perf_counter()
        op = Matmul(cfg, enable_tuning=False)
        op.hardware_aware_finetune(topk=TOPK)
        global_operator_cache.add(cfg, op)
        global_operator_cache.save_into_database()
        h = op.hints[M]
        print(f"tuned {name} [{k}x{n}] m={M}: {h.short_name()} "
              f"{h.decode_mode} {op._latency.get(M, 0)*1e6:.1f}us "
              f"in {time.perf_counter()-t0:.0f}s", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
