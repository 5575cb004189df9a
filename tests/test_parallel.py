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
