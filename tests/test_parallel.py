"""Tensor-parallel fused matmul over an 8-virtual-device CPU mesh.

The reference has no distributed layer (SURVEY.md §2.11); these tests cover
our first-class mesh sharding: column-parallel (N-sharded, no collective) and
row-parallel (K-sharded + psum / psum_scatter), numerics vs the single-device
oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.ops.reference import matmul_reference
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.parallel import (make_column_parallel_matmul,
                                  make_row_parallel_matmul,
                                  shard_weights_column, shard_weights_row)
from bitblas_tpu.testing import assert_close, random_reference_operands


def make_mesh():
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, ("dp", "tp"))


CFG = MatmulConfig(M=16, N=2048, K=1024, A_dtype="float16", W_dtype="uint4",
                   with_scaling=True, group_size=128, fast_decoding=False)


@pytest.fixture(scope="module")
def operands():
    ops = random_reference_operands(CFG, 16, 0)
    dw = transform_reference_operands(CFG, ops.qweight, ops.scales)
    expected = matmul_reference(CFG, jnp.asarray(ops.A),
                                jnp.asarray(ops.qweight),
                                jnp.asarray(ops.scales))
    return ops, dw, expected


def test_column_parallel(operands):
    ops, dw, expected = operands
    mesh = make_mesh()
    sharded = shard_weights_column(dw, mesh, "tp", CFG)
    fn = make_column_parallel_matmul(CFG, 16, mesh, "tp", gather_output=True)
    out = jax.jit(fn)(jnp.asarray(ops.A), sharded.qweight,
                      scales=sharded.scales)
    assert out.shape == (16, CFG.N)
    assert_close(out, expected, rtol=5e-2, atol=2.0)


def test_column_parallel_sharded_output(operands):
    ops, dw, expected = operands
    mesh = make_mesh()
    sharded = shard_weights_column(dw, mesh, "tp", CFG)
    fn = make_column_parallel_matmul(CFG, 16, mesh, "tp", gather_output=False)
    out = jax.jit(fn)(jnp.asarray(ops.A), sharded.qweight,
                      scales=sharded.scales)
    assert out.shape == (16, CFG.N)
    assert_close(out, expected, rtol=5e-2, atol=2.0)


def test_row_parallel_psum(operands):
    ops, dw, expected = operands
    mesh = make_mesh()
    sharded = shard_weights_row(dw, mesh, "tp", CFG)
    fn = make_row_parallel_matmul(CFG, 16, mesh, "tp")
    out = jax.jit(fn)(jnp.asarray(ops.A), sharded.qweight,
                      scales=sharded.scales)
    assert out.shape == (16, CFG.N)
    assert_close(out, expected, rtol=5e-2, atol=2.0)


def test_row_parallel_reduce_scatter(operands):
    ops, dw, expected = operands
    mesh = make_mesh()
    sharded = shard_weights_row(dw, mesh, "tp", CFG)
    fn = make_row_parallel_matmul(CFG, 16, mesh, "tp", reduce_scatter=True)
    out = jax.jit(fn)(jnp.asarray(ops.A), sharded.qweight,
                      scales=sharded.scales)
    assert out.shape == (16, CFG.N)
    assert_close(out, expected, rtol=5e-2, atol=2.0)


def test_tp_llama_layer_mesh_invariance():
    """The TP layer must produce identical results on different mesh widths
    (weights are seeded deterministically)."""
    from bitblas_tpu.models.quant_llama import LlamaConfig
    from bitblas_tpu.parallel.layers import TPQuantLlamaLayer, tp_layer_forward

    # shapes sized so every N shard covers whole pack tiles at tp=4
    cfg = LlamaConfig(hidden_size=1024, intermediate_size=2048, num_heads=8,
                      num_kv_heads=8, num_layers=1, group_size=128)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 8, 1024)).astype(np.float16))
    pos = jnp.arange(8)[None, :]

    outs = []
    for tp in (2, 4):
        mesh = Mesh(np.array(jax.devices()[:tp]).reshape(1, tp), ("dp", "tp"))
        layer = TPQuantLlamaLayer(cfg, mesh, m=8, seed=3)
        outs.append(np.asarray(tp_layer_forward(layer, x, pos),
                               dtype=np.float32))
    assert outs[0].shape == (1, 8, 1024)
    assert np.all(np.isfinite(outs[0]))
    assert_close(outs[0], outs[1], rtol=2e-2, atol=0.1)


@pytest.mark.parametrize("tp", [2, 4])
@pytest.mark.parametrize("w_dtype,n", [
    ("e4m3_float8", 320),   # 8-bit dequant: padded [K, 384], shard misalign
    ("uint4", 320),         # sub-byte retile path (pre-existing coverage)
])
def test_column_parallel_unaligned_n(w_dtype, n, tp):
    """Column sharding of a padded pack whose N/tp is not tile-aligned must
    retile per shard — regression for the r1 high-severity finding (even
    slices of the globally-padded array silently offset every shard)."""
    cfg = MatmulConfig(M=16, N=n, K=512, A_dtype="float16", W_dtype=w_dtype,
                       with_scaling=True, group_size=128, fast_decoding=False)
    ops = random_reference_operands(cfg, 16, 1)
    dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
    expected = matmul_reference(cfg, jnp.asarray(ops.A),
                                jnp.asarray(ops.qweight),
                                jnp.asarray(ops.scales))
    mesh = Mesh(np.array(jax.devices()[:tp]).reshape(1, tp), ("dp", "tp"))
    sharded = shard_weights_column(dw, mesh, "tp", cfg)
    fn = make_column_parallel_matmul(cfg, 16, mesh, "tp", gather_output=True)
    out = jax.jit(fn)(jnp.asarray(ops.A), sharded.qweight,
                      scales=sharded.scales)
    assert out.shape == (16, cfg.N)
    assert_close(out, expected, rtol=5e-2, atol=2.0)


def test_row_parallel_overlap_chunks(operands):
    """Chunked psum (comm/compute overlap lever) matches the single-psum
    path exactly — the collectives are just split along N."""
    ops, dw, expected = operands
    mesh = make_mesh()
    sharded = shard_weights_row(dw, mesh, "tp", CFG)
    for nc in (2, 4):
        fn = make_row_parallel_matmul(CFG, 16, mesh, "tp",
                                      overlap_chunks=nc)
        out = jax.jit(fn)(jnp.asarray(ops.A), sharded.qweight,
                          scales=sharded.scales)
        assert out.shape == (16, CFG.N)
        assert_close(out, expected, rtol=5e-2, atol=2.0)
