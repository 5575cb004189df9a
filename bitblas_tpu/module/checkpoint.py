"""Checkpoint save/load for quantized layer states.

The reference's "checkpoint" story is (1) the kernel database and (2) GPTQ/
BitNet repack converters (SURVEY.md §5). Here, device-layout tensors are
plain arrays, so a repacked model checkpoints with a single npz (or orbax,
when the caller prefers its async/sharded machinery).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

# Device-layout version stamped into every checkpoint. Bump whenever the
# packed on-device layout changes incompatibly. History:
#   1: original slot-strided pack, plain unsigned storage, no N padding
#   2: sub-byte int/uint packs stored XOR 0x80 + N padded to whole pack tiles
#      (ops/weight_transform.storage_is_xored / padded_n)
# A v1 checkpoint decodes *silently wrong* under v2 kernels (every top bit
# flipped) — hence the hard validation on load (ADVICE.md r1).
DEVICE_LAYOUT_VERSION = 2


def _check_layout_version(meta: dict, where: str) -> None:
    v = meta.get("device_layout_version")
    if v is None:
        raise ValueError(
            f"{where} has no device_layout_version (pre-versioning "
            f"checkpoint); its packed layout predates layout v"
            f"{DEVICE_LAYOUT_VERSION} and would decode incorrectly. "
            "Re-export it from the source (GPTQ/BitNet) checkpoint.")
    if v != DEVICE_LAYOUT_VERSION:
        raise ValueError(
            f"{where} was written with device layout v{v}; this build "
            f"requires v{DEVICE_LAYOUT_VERSION}. Re-export the checkpoint.")


def save_quant_state(path: str, layers: Mapping[str, Mapping[str, np.ndarray]],
                     meta: dict | None = None) -> None:
    """layers: {layer_name: {tensor_name: array}} -> <path>.npz + meta.json."""
    flat = {}
    for lname, tensors in layers.items():
        for tname, arr in tensors.items():
            flat[f"{lname}/{tname}"] = np.asarray(arr)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path, **flat)
    # np.savez appends .npz when absent; key the meta off the real filename
    # so load (which normalizes to .npz) finds it.
    npz_path = path if path.endswith(".npz") else path + ".npz"
    meta = dict(meta or {})
    meta.setdefault("device_layout_version", DEVICE_LAYOUT_VERSION)
    with open(npz_path + ".meta.json", "w") as f:
        json.dump(meta, f, indent=1)


def load_quant_state(path: str) -> Dict[str, Dict[str, jnp.ndarray]]:
    if not path.endswith(".npz"):
        path = path + ".npz"
    meta_path = path + ".meta.json"
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    _check_layout_version(meta, path)
    data = np.load(path)
    out: Dict[str, Dict[str, jnp.ndarray]] = {}
    for key in data.files:
        lname, tname = key.rsplit("/", 1)
        out.setdefault(lname, {})[tname] = jnp.asarray(data[key])
    return out


def _layout_sidecar(path: str) -> str:
    return os.path.abspath(path).rstrip("/") + ".layout.json"


def _write_layout_sidecar(path: str) -> None:
    with open(_layout_sidecar(path), "w") as f:
        json.dump({"device_layout_version": DEVICE_LAYOUT_VERSION}, f)


def _check_layout_sidecar(path: str) -> None:
    sidecar = _layout_sidecar(path)
    meta = {}
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            meta = json.load(f)
    _check_layout_version(meta, path)


def save_quant_state_orbax(path: str, layers) -> None:
    """Orbax variant (multi-host/sharded friendly)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), dict(layers))
    ckptr.wait_until_finished()
    _write_layout_sidecar(path)


def load_quant_state_orbax(path: str, shardings=None):
    """Restore an orbax quant-state checkpoint.

    shardings: optional pytree (matching the saved tree's structure, may be
    partial — missing leaves restore unsharded) of `jax.sharding.Sharding`;
    each array is restored *directly onto the mesh* with that sharding, so
    multi-host restores never materialize full arrays on one host.
    """
    import jax
    import orbax.checkpoint as ocp
    _check_layout_sidecar(path)
    ckptr = ocp.StandardCheckpointer()
    path = os.path.abspath(path)
    if shardings is None:
        return ckptr.restore(path)
    meta = ckptr.metadata(path).item_metadata.tree

    def _abstract(m, s):
        if s is None:
            return jax.ShapeDtypeStruct(m.shape, m.dtype)
        return jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=s)

    target = jax.tree.map(_abstract, meta, shardings,
                          is_leaf=lambda x: x is None)
    return ckptr.restore(path, target)


# -- NNX module integration ---------------------------------------------------

def _nnx_pure_state(module):
    from flax import nnx
    _, state = nnx.split(module)
    return nnx.to_pure_dict(state)


def save_nnx_orbax(path: str, module) -> None:
    """Persist an NNX module's state (e.g. QuantLinear packed buffers) with
    orbax. Only array state is written — compiled operators stay out."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), _nnx_pure_state(module))
    ckptr.wait_until_finished()
    _write_layout_sidecar(path)


def restore_nnx_orbax(path: str, module, shardings=None):
    """Restore orbax state into an already-constructed NNX module in place.

    The module provides the target structure (shapes/dtypes); pass
    `shardings` (pytree of Sharding, matching the state tree) to land
    buffers sharded on a mesh.
    """
    import jax
    import orbax.checkpoint as ocp
    from flax import nnx
    _check_layout_sidecar(path)
    graphdef, state = nnx.split(module)
    pure = nnx.to_pure_dict(state)
    if shardings is not None:
        target = jax.tree.map(
            lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s)
            if s is not None else a,
            pure, shardings, is_leaf=lambda x: x is None)
    else:
        target = pure
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), target)
    nnx.replace_by_pure_dict(state, restored)
    nnx.update(module, state)
    return module
