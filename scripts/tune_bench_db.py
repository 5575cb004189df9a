"""Tune the benchmark configurations into the operator database."""
import time
from bitblas_tpu import Matmul, MatmulConfig
from bitblas_tpu.cache import global_operator_cache

N = K = 4096
configs = []
for m in (1, 16, 256, 4096):
    configs.append(MatmulConfig(M=m, N=N, K=K, A_dtype="float16",
                                W_dtype="uint4", with_scaling=True,
                                group_size=128, fast_decoding=False,
                                out_dtype="float16"))
for m in (1, 16, 256, 4096):
    configs.append(MatmulConfig(M=m, N=N, K=K, A_dtype="int8",
                                W_dtype="int2", accum_dtype="int32",
                                out_dtype="float32"))

global_operator_cache.load_from_database()
for cfg in configs:
    if global_operator_cache.get(cfg) is not None:
        print(f"cached: {cfg.W_dtype}x{cfg.A_dtype} m={cfg.M}")
        continue
    t0 = time.perf_counter()
    op = Matmul(cfg, enable_tuning=False)
    op.hardware_aware_finetune(topk=10)
    global_operator_cache.add(cfg, op)
    global_operator_cache.save_into_database()
    m = cfg.M
    print(f"tuned {cfg.W_dtype}x{cfg.A_dtype} m={m}: "
          f"{op.hints[m].short_name()} {op.hints[m].decode_mode} "
          f"{op._latency.get(m, 0)*1e6:.1f}us in {time.perf_counter()-t0:.0f}s",
          flush=True)
print("done")
