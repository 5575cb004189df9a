"""Tensor-parallel quantized transformer layers.

Megatron-style placement over the fused kernels (the building block for
Llama-70B-class TP serving, BASELINE.json config #5):

  attention:  q/k/v column-parallel (heads shard with N), o row-parallel
              (psum joins the head shards)
  mlp:        gate/up column-parallel, down row-parallel

Activations stay replicated between blocks; each block costs exactly one
psum (or psum_scatter + all_gather pair when sequence-sharded).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..models.quant_llama import LlamaConfig, _PROJS, _dim, rmsnorm, rope
from ..ops.matmul_config import MatmulConfig
from ..ops.weight_transform import DeviceWeights, transform_reference_operands
from ..testing import random_reference_operands
from . import (make_column_parallel_matmul, make_row_parallel_matmul,
               shard_weights_column, shard_weights_row)

_COLUMN = {"q", "k", "v", "gate", "up"}   # shard N (outputs)
_ROW = {"o", "down"}                      # shard K (inputs) + psum


class TPQuantLlamaLayer:
    """One decoder layer with every projection mesh-sharded."""

    def __init__(self, cfg: LlamaConfig, mesh: Mesh, *, m: int,
                 axis: str = "tp", seed: int = 0,
                 interpret: Optional[bool] = None):
        self.cfg = cfg
        self.mesh = mesh
        self.axis = axis
        tp = mesh.shape[axis]
        assert cfg.num_heads % tp == 0 and cfg.num_kv_heads % tp == 0, \
            "heads must divide tp"
        self.fns: Dict[str, callable] = {}
        self.weights: Dict[str, DeviceWeights] = {}
        rng = np.random.default_rng(seed)
        for name, kin, kout in _PROJS:
            K, N = _dim(cfg, kin), _dim(cfg, kout)
            # symmetric quantization (zero point 8), like real GPTQ
            # checkpoints: uncentered uint4 codes would bias every output.
            mcfg = MatmulConfig(M=m, N=N, K=K, A_dtype=cfg.act_dtype,
                                W_dtype="uint4", with_scaling=True,
                                with_zeros=True, zeros_mode="original",
                                group_size=cfg.group_size,
                                out_dtype=cfg.act_dtype)
            # deterministic per-name seed (str hash is randomized per
            # process — irreproducible weights otherwise)
            import zlib
            ops = random_reference_operands(
                mcfg, 1, seed=seed * 10 + zlib.crc32(name.encode()) % 7)
            scales = (np.abs(rng.standard_normal((N, K // cfg.group_size)))
                      * 0.002 + 0.004).astype(np.float16)
            zeros = np.full((N, K // cfg.group_size), 8.0, np.float16)
            dw = transform_reference_operands(mcfg, ops.qweight, scales, zeros)
            if name in _COLUMN:
                self.weights[name] = shard_weights_column(dw, mesh, axis, mcfg)
                self.fns[name] = make_column_parallel_matmul(
                    mcfg, m, mesh, axis, gather_output=True,
                    interpret=interpret)
            else:
                self.weights[name] = shard_weights_row(dw, mesh, axis, mcfg)
                self.fns[name] = make_row_parallel_matmul(
                    mcfg, m, mesh, axis, interpret=interpret)
        self.attn_norm = jnp.ones((cfg.hidden_size,), jnp.float32)
        self.mlp_norm = jnp.ones((cfg.hidden_size,), jnp.float32)

    def proj(self, name: str, x: jnp.ndarray) -> jnp.ndarray:
        w = self.weights[name]
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        out = self.fns[name](x2, w.qweight, scales=w.scales, zeros=w.zeros)
        return out.reshape(*lead, out.shape[-1])


def tp_layer_forward(layer: TPQuantLlamaLayer, x: jnp.ndarray,
                     positions: jnp.ndarray) -> jnp.ndarray:
    """Replicated-activation forward (same math as models.quant_llama
    layer_forward, projections sharded)."""
    from ..models.quant_llama import layer_forward
    return layer_forward(layer, x, positions)
