"""Merge operator-DB winners for the 70B TP-local shapes into the committed
tp_serving_hints.json curated table.

Run after `tune_tp_serving_db.py` sessions: the operator DB is per-host and
gets wiped with the machine; the JSON table ships in the package and is the
serving fallback that survives (tuner/curated.py tp_serving_hint). Local
shapes use the REPLICATED kv head count (TPQuantLlama kv_eff) — the grid a
tp=16 serving process actually looks up.
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, "/root/repo")

from bitblas_tpu.cache import global_operator_cache
from bitblas_tpu.ops.matmul_config import MatmulConfig

HIDDEN, KV_HEADS, HEAD_DIM, INTER = 8192, 8, 128, 28672
PATH = os.path.join(os.path.dirname(__file__), "..",
                    "bitblas_tpu", "tuner", "tp_serving_hints.json")


def main():
    global_operator_cache.load_from_database()
    table = json.load(open(PATH))
    by_key = {(e["n"], e["k"], e["m"]): e for e in table}
    added = replaced = 0
    for tp in (4, 8, 16):
        kv = max(KV_HEADS, tp) * HEAD_DIM
        projs = {
            "qkv": (HIDDEN, (HIDDEN + 2 * kv) // tp),
            "o": (HIDDEN // tp, HIDDEN),
            "gateup": (HIDDEN, 2 * INTER // tp),
            "down": (INTER // tp, HIDDEN),
        }
        for name, (k, n) in projs.items():
            for m in (16, 64, 256):
                cfg = MatmulConfig(M=m, N=n, K=k, A_dtype="float16",
                                   W_dtype="uint4", with_scaling=True,
                                   with_zeros=True, zeros_mode="original",
                                   group_size=128, out_dtype="float16")
                op = global_operator_cache.get(cfg)
                if op is None:
                    continue
                hint = dataclasses.asdict(op.hint_for(m))
                entry = {"tp": tp, "proj": name, "m": m, "n": n, "k": k,
                         "hint": hint}
                key = (n, k, m)
                if key in by_key:
                    if by_key[key]["hint"] != hint:
                        by_key[key].update(entry)
                        replaced += 1
                else:
                    table.append(entry)
                    by_key[key] = entry
                    added += 1
    # Atomic replace: queue stages run under `timeout`, and a truncated
    # table silently degrades every serving shape to default_hint.
    tmp = PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(table, f, indent=1)
        f.write("\n")
    os.replace(tmp, PATH)
    print(f"added {added}, replaced {replaced}, total {len(table)}")


if __name__ == "__main__":
    main()
