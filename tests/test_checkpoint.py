"""Checkpoint round-trips: npz + orbax, NNX modules, sharded restore.

Reference checkpoint story = kernel DB + repack converters (SURVEY.md §5);
the TPU build adds real model-state persistence (orbax) including restore
directly onto a mesh sharding — the multi-host path BASELINE config #5 needs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bitblas_tpu.models.quant_llama import LlamaConfig, QuantLlama
from bitblas_tpu.module.checkpoint import (
    load_quant_state, load_quant_state_orbax, restore_nnx_orbax,
    save_nnx_orbax, save_quant_state, save_quant_state_orbax)


CFG = LlamaConfig(hidden_size=256, intermediate_size=512, num_heads=4,
                  num_kv_heads=2, num_layers=2, group_size=64)


def _models():
    m1 = QuantLlama(CFG, opt_m=(8,))
    m2 = QuantLlama(CFG, opt_m=(8,))
    # m2 starts with different (seeded-differently is not true here: same
    # seeds) — perturb to prove load actually changes state.
    for layer in m2.layers:
        for name, (W, S, Z) in layer.weights.items():
            layer.weights[name] = (W, S * 2.0, Z)
    return m1, m2


def test_npz_roundtrip(tmp_path):
    m1, m2 = _models()
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, 8, CFG.hidden_size))
                    .astype(np.float16))
    pos = jnp.arange(8)[None, :]
    y1 = m1(x, pos)
    save_quant_state(str(tmp_path / "ck"), m1.state_dict())
    m2.load_state_dict(load_quant_state(str(tmp_path / "ck")))
    y2 = m2(x, pos)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_orbax_roundtrip(tmp_path):
    m1, m2 = _models()
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((1, 8, CFG.hidden_size))
                    .astype(np.float16))
    pos = jnp.arange(8)[None, :]
    y1 = m1(x, pos)
    save_quant_state_orbax(str(tmp_path / "ck_orbax"), m1.state_dict())
    m2.load_state_dict(load_quant_state_orbax(str(tmp_path / "ck_orbax")))
    y2 = m2(x, pos)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_orbax_sharded_restore(tmp_path):
    """Restore packed weights directly onto a mesh: each array lands with
    the requested NamedSharding (no host-side full materialization step)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    m1, _ = _models()
    state = m1.state_dict()
    save_quant_state_orbax(str(tmp_path / "ck_sh"), state)

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("tp",))
    shardings = jax.tree.map(lambda _: None, state)
    # shard every packed qweight over its first (N-ish) dim
    for lname, tensors in state.items():
        for tname, arr in tensors.items():
            if tname.endswith("qweight") and arr.shape[0] % 2 == 0:
                shardings[lname][tname] = NamedSharding(mesh, P("tp"))
    restored = load_quant_state_orbax(str(tmp_path / "ck_sh"), shardings)
    for lname, tensors in state.items():
        for tname, arr in tensors.items():
            got = restored[lname][tname]
            np.testing.assert_array_equal(np.asarray(got), np.asarray(arr))
            if shardings[lname][tname] is not None:
                assert got.sharding == shardings[lname][tname]


def test_nnx_quantlinear_orbax(tmp_path):
    from bitblas_tpu.module.flax_linear import QuantLinear
    rng = np.random.default_rng(2)
    mk = dict(A_dtype="float16", W_dtype="uint4", with_scaling=True,
              group_size=64, opt_M=[8], enable_tuning=False)
    l1 = QuantLinear(128, 256, **mk)
    l2 = QuantLinear(128, 256, **mk)
    codes = rng.integers(0, 16, (256, 128)).astype(np.int8)
    scales = (rng.standard_normal((256, 2)) * 0.01 + 0.05).astype(np.float16)
    l1.load_and_transform_weight(codes, scales=scales)
    x = jnp.asarray(rng.standard_normal((8, 128)).astype(np.float16))
    y1 = l1(x)
    save_nnx_orbax(str(tmp_path / "lin"), l1)
    restore_nnx_orbax(str(tmp_path / "lin"), l2)
    y2 = l2(x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_bitnet_state_roundtrip(tmp_path):
    from bitblas_tpu.models.bitnet import BitNetLlama
    m1 = BitNetLlama(CFG, opt_m=(8,))
    m2 = BitNetLlama(CFG, opt_m=(8,))
    for layer in m2.layers:
        for lin in layer.projs.values():
            lin.sw = lin.sw * 3.0
    x = jnp.asarray(np.random.default_rng(3)
                    .standard_normal((1, 8, CFG.hidden_size))
                    .astype(np.float16))
    pos = jnp.arange(8)[None, :]
    y1 = m1(x, pos)
    save_quant_state_orbax(str(tmp_path / "bn"), m1.state_dict())
    m2.load_state_dict(load_quant_state_orbax(str(tmp_path / "bn")))
    y2 = m2(x, pos)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_layout_version_rejected(tmp_path):
    """A checkpoint without (or with an old) device_layout_version must be
    refused — a pre-versioning pack decodes silently wrong (ADVICE.md r1)."""
    import json
    import pytest
    from bitblas_tpu.module.checkpoint import save_quant_state

    save_quant_state(str(tmp_path / "ck"), {"l": {"w": np.zeros((2, 2))}})
    meta_path = str(tmp_path / "ck.npz.meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    assert meta["device_layout_version"] == 2

    meta["device_layout_version"] = 1
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="layout v1"):
        load_quant_state(str(tmp_path / "ck"))

    import os
    os.remove(meta_path)
    with pytest.raises(ValueError, match="pre-versioning"):
        load_quant_state(str(tmp_path / "ck"))
