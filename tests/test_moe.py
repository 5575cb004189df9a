"""Quantized MoE: routing algebra, kernel-vs-oracle numerics, expert
parallelism (reference has no MoE layer — this extends the fused-kernel
surface like parallel/ does for TP; routing follows GShard top-k+capacity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from bitblas_tpu.models.quant_moe import (MoEConfig, QuantMoELayer,
                                          dispatch_combine, moe_capacity,
                                          moe_reference)


def _cfg(**kw):
    base = dict(hidden_size=256, intermediate_size=512, n_experts=4,
                top_k=2, group_size=128)
    base.update(kw)
    return MoEConfig(**base)


def test_dispatch_combine_invariants():
    rng = np.random.default_rng(0)
    T, E, k, C = 32, 4, 2, 24
    logits = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)
    dispatch, combine = dispatch_combine(logits, k, C)
    d = np.asarray(dispatch)
    c = np.asarray(combine)
    # each expert buffer slot holds at most one token
    assert d.sum(axis=0).max() <= 1.0 + 1e-6
    # each token occupies at most top_k slots; combine weights sum to <= 1
    assert d.sum(axis=(1, 2)).max() <= k + 1e-6
    assert c.sum(axis=(1, 2)).max() <= 1.0 + 1e-6
    # with ample capacity nothing is dropped: every token sums to ~1
    np.testing.assert_allclose(c.sum(axis=(1, 2)), 1.0, atol=1e-6)
    # combine is supported exactly on dispatch slots
    assert ((c > 0) <= (d > 0)).all()


def test_capacity_drops_overflow_tokens():
    # All tokens forced onto expert 0 (huge logit margin): only the first
    # `capacity` slots survive, later tokens contribute nothing.
    T, E, C = 16, 4, 8
    logits = jnp.asarray(np.tile([10.0, -10, -10, -10], (T, 1)), jnp.float32)
    dispatch, combine = dispatch_combine(logits, 1, C)
    c = np.asarray(combine)
    kept = c.sum(axis=(1, 2))
    np.testing.assert_allclose(kept[:C], 1.0, atol=1e-6)
    np.testing.assert_allclose(kept[C:], 0.0, atol=1e-6)


def test_moe_forward_matches_oracle():
    cfg = _cfg()
    layer = QuantMoELayer(cfg, tokens=64, seed=0)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((64, 256)) * 0.5, jnp.float16)
    y = np.asarray(layer.forward(x), np.float32)
    ref = np.asarray(moe_reference(layer, x), np.float32)
    den = max(float(np.abs(ref).max()), 1e-9)
    assert np.abs(y - ref).max() / den < 2e-2


def test_moe_capacity_alignment():
    cfg = _cfg()
    assert moe_capacity(cfg, 64) % 8 == 0
    assert moe_capacity(cfg, 1) >= 8


@pytest.mark.parametrize("ep", [2, 4])
def test_ep_matches_single_device(ep):
    from bitblas_tpu.parallel.moe import EPQuantMoELayer
    devs = jax.devices()
    if len(devs) < ep:
        pytest.skip(f"needs {ep} devices")
    cfg = _cfg()
    layer = QuantMoELayer(cfg, tokens=32, seed=1)
    mesh = Mesh(np.array(devs[:ep]), ("ep",))
    ep_layer = EPQuantMoELayer(layer, mesh)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((32, 256)) * 0.5, jnp.float16)
    y1 = np.asarray(layer.forward(x), np.float32)
    y2 = np.asarray(ep_layer.forward(x), np.float32)
    den = max(np.abs(y1).max(), 1e-9)
    assert np.abs(y1 - y2).max() / den < 1e-2
