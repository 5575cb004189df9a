"""Seed the operator hint database with the measured curated winners.

The bench.py curated table is the best-measured hint per headline config
(see scripts/tpu_gemm256_sweep.py sweeps); this installs those hints into
the on-disk operator DB so every library path (Matmul, QuantLlama, Linear)
dispatches to them without re-tuning. Runs host-side only — no chip needed.
Usage: PYTHONPATH=/root/repo python scripts/seed_curated_hints.py [target]
"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # host-side: never touch the chip

from bitblas_tpu import Matmul, MatmulConfig  # noqa: E402
from bitblas_tpu.cache import global_operator_cache  # noqa: E402

N = K = 4096
TARGET = sys.argv[1] if len(sys.argv) > 1 else "tpu_v5e"

from bitblas_tpu.tuner.curated import curated_hint  # noqa: E402

# (config-kwargs, m) — hints come from the shared curated table.
U4 = dict(A_dtype="float16", W_dtype="uint4", with_scaling=True,
          group_size=128, fast_decoding=False, out_dtype="float16")
I2 = dict(A_dtype="int8", W_dtype="int2", accum_dtype="int32",
          out_dtype="float32")
CURATED = [(U4, m, nk, curated_hint("uint4", "float16", m, nk=nk))
           for m in (1, 16, 256, 4096) for nk in (4096, 8192)] + \
          [(I2, m, nk, curated_hint("int2", "int8", m, nk=nk))
           for m in (1, 16, 256, 4096) for nk in (4096, 8192)]


def main():
    global_operator_cache.load_from_database(target=TARGET)
    for kwargs, m, nk, hint in CURATED:
        cfg = MatmulConfig(M=m, N=nk, K=nk, **kwargs)
        op = global_operator_cache.get(cfg)
        if op is None:
            op = Matmul(cfg, target=TARGET, enable_tuning=False,
                        from_database=True)
            global_operator_cache.add(cfg, op)
        op.apply_hints({m: hint})
        print(f"seeded {cfg.W_dtype}x{cfg.A_dtype} m={m}: "
              f"{hint.short_name()} {hint.decode_mode}")
    global_operator_cache.save_into_database(target=TARGET)
    print("saved to DB for target", TARGET)


if __name__ == "__main__":
    main()
