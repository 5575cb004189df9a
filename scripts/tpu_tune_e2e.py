"""End-to-end tuner validation on the real chip: finetune a Matmul, save the
database, reload, verify numerics + report latencies."""
import time
import jax.numpy as jnp
import numpy as np

from bitblas_tpu import Matmul, MatmulConfig, OperatorCache
from bitblas_tpu.ops.reference import matmul_reference
from bitblas_tpu.quantization import packing
from bitblas_tpu.testing import random_reference_operands

cfg = MatmulConfig(M=[1, 256], N=4096, K=4096, A_dtype="float16",
                   W_dtype="uint4", with_scaling=True, group_size=128)
t0 = time.perf_counter()
op = Matmul(cfg, enable_tuning=False)
print(f"build: {time.perf_counter()-t0:.1f}s; default hints:")
for m, h in sorted(op.hints.items()):
    print(f"  m={m}: {h.short_name()} {h.decode_mode}")

t0 = time.perf_counter()
op.hardware_aware_finetune(topk=8)
print(f"tune(topk=8): {time.perf_counter()-t0:.1f}s; tuned hints:")
for m, h in sorted(op.hints.items()):
    lat = op._latency.get(m)
    print(f"  m={m}: {h.short_name()} {h.decode_mode} "
          f"({lat*1e6:.1f}us)" if lat else f"  m={m}: {h.short_name()}")

# numerics after tuning
ops_data = random_reference_operands(cfg, 256, 0)
codes = packing.general_decompress(ops_data.qweight, 4)
W, S = op.transform_weight(codes, scale=ops_data.scales)
out = op.forward(jnp.asarray(ops_data.A), W, scale=S)
exp = matmul_reference(cfg, jnp.asarray(ops_data.A),
                       jnp.asarray(ops_data.qweight), jnp.asarray(ops_data.scales))
err = np.abs(np.asarray(out, np.float32) - np.asarray(exp, np.float32))
rel = err.max() / np.abs(np.asarray(exp, np.float32)).max()
print(f"numerics after tuning: max rel err {rel:.2e}")

# database round trip
cache = OperatorCache()
cache.add(cfg, op)
cache.save_into_database()
cache2 = OperatorCache()
n = cache2.load_from_database()
op2 = cache2.get(cfg)
print(f"db roundtrip: loaded {n} ops, hints match: {op2.hints == op.hints}")
