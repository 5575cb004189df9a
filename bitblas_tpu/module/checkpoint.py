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


def save_quant_state(path: str, layers: Mapping[str, Mapping[str, np.ndarray]],
                     meta: dict | None = None) -> None:
    """layers: {layer_name: {tensor_name: array}} -> <path>.npz + meta.json."""
    flat = {}
    for lname, tensors in layers.items():
        for tname, arr in tensors.items():
            flat[f"{lname}/{tname}"] = np.asarray(arr)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path, **flat)
    with open(path + ".meta.json", "w") as f:
        json.dump(meta or {}, f, indent=1)


def load_quant_state(path: str) -> Dict[str, Dict[str, jnp.ndarray]]:
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    out: Dict[str, Dict[str, jnp.ndarray]] = {}
    for key in data.files:
        lname, tname = key.rsplit("/", 1)
        out.setdefault(lname, {})[tname] = jnp.asarray(data[key])
    return out


def save_quant_state_orbax(path: str, layers) -> None:
    """Orbax variant (multi-host/sharded friendly)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), dict(layers))
    ckptr.wait_until_finished()


def load_quant_state_orbax(path: str):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))
