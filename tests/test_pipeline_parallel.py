"""GPipe pipeline parallelism over the 8-virtual-device CPU mesh.

The reference has no PP (SURVEY.md §2.11); here stages of fused dequant
matmul layers pass activations over ppermute. Correctness bar: the
pipelined run equals applying every stage sequentially on one device.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.parallel.pipeline import (make_gpipe_fn,
                                           make_quant_stage_fn,
                                           stack_stage_params)
from bitblas_tpu.testing import random_reference_operands

PP = 4
LAYERS_PER_STAGE = 2
B, H = 4, 256
N_MICRO = 3


def _mesh():
    devs = jax.devices()[:PP]
    if len(devs) < PP:
        pytest.skip("needs 4 devices")
    return Mesh(np.array(devs), ("pp",))


def _build(cfg, seed):
    """Per-stage param pytrees (device layout)."""
    stages = []
    for s in range(PP):
        qws, scs = [], []
        for i in range(LAYERS_PER_STAGE):
            ops = random_reference_operands(cfg, B, seed + s * 10 + i)
            dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
            qws.append(jnp.asarray(dw.qweight))
            scs.append(jnp.asarray(dw.scales))
        stages.append({"qweight": jnp.stack(qws), "scales": jnp.stack(scs)})
    return stages


def test_gpipe_matches_sequential():
    mesh = _mesh()
    cfg = MatmulConfig(M=B, N=H, K=H, A_dtype="float16", W_dtype="uint4",
                       with_scaling=True, group_size=128,
                       out_dtype="float16")
    stages = _build(cfg, 7)

    stage_fn = make_quant_stage_fn(cfg, B, LAYERS_PER_STAGE)
    pipe = make_gpipe_fn(stage_fn, mesh, "pp")
    params = stack_stage_params(stages, mesh, "pp")

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((N_MICRO, B, H)).astype(np.float16))

    got = pipe(params, xs)
    assert got.shape == xs.shape

    # sequential oracle: same stage_fn applied stage by stage, no mesh
    ref = []
    for i in range(N_MICRO):
        h = xs[i]
        for s in range(PP):
            h = stage_fn(stages[s], h)
        ref.append(h)
    ref = jnp.stack(ref)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_gpipe_single_microbatch_and_many():
    """Schedule edge cases: n_micro=1 (pure bubble) and n_micro > pp."""
    mesh = _mesh()
    cfg = MatmulConfig(M=B, N=H, K=H, A_dtype="float16", W_dtype="uint4",
                       with_scaling=True, group_size=128,
                       out_dtype="float16")
    stages = _build(cfg, 3)
    stage_fn = make_quant_stage_fn(cfg, B, LAYERS_PER_STAGE)
    pipe = make_gpipe_fn(stage_fn, mesh, "pp")
    params = stack_stage_params(stages, mesh, "pp")
    rng = np.random.default_rng(1)

    for n_micro in (1, 6):
        xs = jnp.asarray(
            rng.standard_normal((n_micro, B, H)).astype(np.float16))
        got = pipe(params, xs)
        ref = []
        for i in range(n_micro):
            h = xs[i]
            for s in range(PP):
                h = stage_fn(stages[s], h)
            ref.append(h)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(jnp.stack(ref), np.float32),
                                   rtol=5e-2, atol=5e-2)
