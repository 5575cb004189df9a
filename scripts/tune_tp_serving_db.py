"""Tune the Llama-3-70B TP-local projection shapes into the operator DB.

TPQuantLlama consults the DB before analytic defaults, so winners tuned
here feed straight into the serving kernels. Resumable: each tuned config
saves immediately; already-cached configs are skipped.

Usage: tune_tp_serving_db.py [tp] [m] [topk] [force]   (defaults 8 16 6)
`force` re-tunes configs already in the DB — use after the candidate space
grows (e.g. the exact-m whole-K family landed after the first TP sweep);
the measured winner only replaces the cached hint if it is faster.
"""
import sys
import time

from bitblas_tpu import Matmul, MatmulConfig
from bitblas_tpu.cache import global_operator_cache

HIDDEN, KV_HEADS, HEAD_DIM, INTER = 8192, 8, 128, 28672

TP = int(sys.argv[1]) if len(sys.argv) > 1 else 8
M = int(sys.argv[2]) if len(sys.argv) > 2 else 16
TOPK = int(sys.argv[3]) if len(sys.argv) > 3 else 6
FORCE = len(sys.argv) > 4 and sys.argv[4] == "force"


def main():
    # GQA replication: at TP > KV_HEADS each source kv head is replicated
    # across the head group (TPQuantLlama kv_eff), so the fused qkv local N
    # uses the REPLICATED kv head count — (8192+2*16*128)/16 = 768 at tp=16,
    # not 640. (A round-3 review caught the unreplicated formula tuning a
    # shape the serving lookup can never hit.)
    kv = max(KV_HEADS, TP) * HEAD_DIM
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
        cached = global_operator_cache.get(cfg)
        if cached is not None and not FORCE:
            print(f"cached: {name} [{k}x{n}]", flush=True)
            continue
        t0 = time.perf_counter()
        op = Matmul(cfg, enable_tuning=False)
        op.hardware_aware_finetune(topk=TOPK)
        if cached is not None:
            # Head-to-head in THIS window (windows drift ~±15%): keep the
            # old hint unless the fresh winner beats it here and now.
            from bitblas_tpu.tuner.tune import _measure_candidate
            old = cached.hint_for(M)
            if old != op.hints[M]:
                spec = op._make_spec(M)
                try:
                    old_lat = _measure_candidate(
                        lambda h, s=spec: op._positional_kernel(s, h), old,
                        op._example_args(spec, old),
                        op._tune_inject_index())
                    if old_lat <= op._latency.get(M, float("inf")):
                        op._install(M, spec, old)
                        op._latency[M] = old_lat
                        print(f"  kept cached hint {old.short_name()} "
                              f"{old_lat*1e6:.1f}us", flush=True)
                except Exception as ex:  # noqa: BLE001
                    print(f"  cached hint remeasure failed: "
                          f"{str(ex)[:60]}", flush=True)
        global_operator_cache.add(cfg, op)
        global_operator_cache.save_into_database()
        h = op.hints[M]
        print(f"tuned {name} [{k}x{n}] m={M}: {h.short_name()} "
              f"{h.decode_mode} {op._latency.get(M, 0)*1e6:.1f}us "
              f"in {time.perf_counter()-t0:.0f}s", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
