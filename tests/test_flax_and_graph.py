"""Flax NNX QuantLinear + graph-level transforms."""

import jax
import jax.numpy as jnp
import numpy as np

from bitblas_tpu.graph import repack_gptq_layer, tune_all
from bitblas_tpu.module.flax_linear import QuantLinear
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.quantization import packing
from bitblas_tpu.testing import assert_close


def test_flax_quantlinear_forward():
    from flax import nnx
    K, N, g = 512, 512, 128
    layer = QuantLinear(K, N, W_dtype="uint4", with_scaling=True,
                        group_size=g, opt_M=[16], enable_tuning=False)
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, (N, K)).astype(np.int8)
    scales = (rng.standard_normal((N, K // g)) * 0.1 + 0.5).astype(np.float16)
    layer.load_and_transform_weight(codes, scales=scales)
    x = jnp.asarray(rng.standard_normal((4, K)).astype(np.float16))
    out = layer(x)
    assert out.shape == (4, N)
    # state is a pytree of QuantParams (checkpointable)
    state = nnx.state(layer)
    leaves = jax.tree.leaves(state)
    assert any(getattr(l, "dtype", None) == jnp.int8 for l in leaves)


def test_graph_repack_gptq_layer():
    K, N, g, bits = 512, 512, 128, 4
    cfg = MatmulConfig(M=16, N=N, K=K, A_dtype="float16", W_dtype="uint4",
                       with_scaling=True, with_zeros=True,
                       zeros_mode="original", group_size=g)
    rng = np.random.default_rng(1)
    intweight = rng.integers(0, 16, (N, K)).astype(np.uint8)  # [out, in]
    e32 = 32 // bits
    w_in_out = intweight.T.astype(np.uint32)
    qweight = np.zeros((K // e32, N), dtype=np.uint32)
    for i in range(e32):
        qweight |= w_in_out[i::e32] << np.uint32(bits * i)
    intz = rng.integers(1, 15, (K // g, N)).astype(np.uint32)
    qzeros = np.zeros((K // g, N // e32), dtype=np.uint32)
    for i in range(e32):
        qzeros |= ((intz[:, i::e32] - 1) & 0xF) << np.uint32(bits * i)
    scales = (rng.standard_normal((K // g, N)) * 0.05 + 0.4).astype(np.float16)

    dev = repack_gptq_layer(cfg, qweight.view(np.int32), scales,
                            qzeros.view(np.int32))
    assert dev["qweight"].shape == (K, N // 2)
    assert dev["scales"].shape == (K // g, 1, N)
    assert dev["zeros"].shape == (K // g, 1, N)
    # zeros recovered exactly (the +1 quirk must round-trip)
    np.testing.assert_array_equal(dev["zeros"][:, 0, :],
                                  intz.astype(np.float32))


def test_tune_all_fills_cache(tmp_path):
    cfgs = [MatmulConfig(M=16, N=256, K=256, A_dtype="float16",
                         W_dtype="uint4")]
    ops = tune_all(cfgs, topk=0, database_path=str(tmp_path))
    assert cfgs[0] in ops
    import os
    target_dirs = os.listdir(tmp_path)
    assert len(target_dirs) == 1


def test_checkpoint_roundtrip(tmp_path):
    from bitblas_tpu.module.checkpoint import load_quant_state, save_quant_state
    rng = np.random.default_rng(0)
    layers = {
        "l0.q": {"qweight": rng.integers(-128, 127, (64, 32)).astype(np.int8),
                 "scales": rng.standard_normal((4, 1, 64)).astype(np.float32)},
        "l0.k": {"qweight": rng.integers(-128, 127, (64, 32)).astype(np.int8)},
    }
    path = str(tmp_path / "state.npz")
    save_quant_state(path, layers, meta={"model": "test"})
    loaded = load_quant_state(path)
    assert set(loaded) == {"l0.q", "l0.k"}
    np.testing.assert_array_equal(np.asarray(loaded["l0.q"]["qweight"]),
                                  layers["l0.q"]["qweight"])
    np.testing.assert_array_equal(np.asarray(loaded["l0.q"]["scales"]),
                                  layers["l0.q"]["scales"])


def test_benchmark_harness():
    from bitblas_tpu import Matmul, MatmulConfig
    from bitblas_tpu.benchmark import OperatorBenchmarkBase

    bench = OperatorBenchmarkBase()
    cfg = MatmulConfig(M=16, N=256, K=256, A_dtype="float16", W_dtype="uint4")
    bench.add_benchmark_set("smoke", [
        ("u4_m16", cfg, lambda c: Matmul(c, enable_tuning=False)),
    ])
    results = bench.run(enable_tuning=False)
    assert "smoke" in results and len(results["smoke"]) == 1
    rec = results["smoke"][0]
    assert rec.latency_default is not None and rec.latency_default > 0
    report = bench.report()
    assert "u4_m16" in report
    json_str = bench.serialize_results()
    assert "latency_default" in json_str
