"""Graph-level transforms (counterpart of the reference Relax passes,
/root/reference/bitblas/relax/):

* `ApplyFastTuning` (relax/transform/apply_fast_tuning.py:36-220) walked an
  IRModule and tuned every unscheduled PrimFunc into a meta-database. The
  JAX-native equivalent is `tune_all`: batch-tune every MatmulConfig a model
  needs and persist the hints to the operator database, so model load never
  tunes online.
* `WeightOnlyLayoutPropagation` (relax/transform/weight_only_propagate.py)
  rewrote a Relax graph to hoist ladder layout transforms onto weights.
  Here layouts are data, not IR: `repack_gptq_checkpoint` walks a checkpoint
  dict and converts every GPTQ-packed tensor bundle to the device layout
  offline (the transform is "hoisted" by construction).
"""

from __future__ import annotations

from typing import Dict, Iterable, Mapping, Optional, Tuple

import numpy as np

from ..cache import get_database_path, global_operator_cache
from ..common import get_logger
from ..ops.matmul import Matmul
from ..ops.matmul_config import MatmulConfig
from ..ops import weight_transform as wt
from ..quantization import packing
from ..tuner import auto_detect_tpu_target

logger = get_logger()


def tune_all(configs: Iterable[MatmulConfig], *, topk: int = 20,
             database_path: Optional[str] = None,
             target: Optional[str] = None) -> Dict[MatmulConfig, Matmul]:
    """Build + finetune every config, fill the global cache, persist hints."""
    database_path = database_path or get_database_path()
    target = target or auto_detect_tpu_target()
    out = {}
    for cfg in configs:
        op = global_operator_cache.get(cfg)
        if op is None:
            op = Matmul(cfg, target=target, enable_tuning=False)
            op.hardware_aware_finetune(topk=topk)
            global_operator_cache.add(cfg, op)
        out[cfg] = op
    global_operator_cache.save_into_database(database_path, target)
    logger.info("tuned %d operators into %s/%s", len(out), database_path,
                target)
    return out


def repack_gptq_layer(config: MatmulConfig, qweight: np.ndarray,
                      scales: np.ndarray, qzeros: Optional[np.ndarray],
                      bias: Optional[np.ndarray] = None, *,
                      gptq_v2: bool = False) -> Dict[str, np.ndarray]:
    """One GPTQ layer bundle (AutoGPTQ tensor conventions: qweight [K/8*b, N]
    int32, scales [K/g, N], qzeros [K/g, N/8*b] int32) -> device tensors."""
    bits = config.bit
    intweight = packing.unpack_qweight(
        np.ascontiguousarray(np.asarray(qweight).T).view(np.int8), bits)
    intweight = intweight[:, :config.K]
    dev_w = wt.unpacked_weight_to_device(config, intweight)
    np_ = wt.padded_n(config)
    out = {"qweight": dev_w,
           "scales": wt.scales_to_device(np.asarray(scales).T, n_pad=np_)}
    if qzeros is not None and config.with_zeros:
        unpack = packing.unpack_qzeros_v2 if gptq_v2 else packing.unpack_qzeros
        intz = unpack(np.asarray(qzeros), bits)[:, :config.N]  # [K/g, N]
        if config.zeros_mode == "original":
            out["zeros"] = wt.scales_to_device(
                intz.astype(np.float32).T, n_pad=np_, fill=0.0)
        elif config.zeros_mode == "rescale":
            z = intz.astype(np.float32).T * np.asarray(scales).T.astype(np.float32)
            out["zeros"] = wt.scales_to_device(z, n_pad=np_, fill=0.0)
        else:  # quantized
            qz = packing.general_compress(np.ascontiguousarray(intz), bits)
            out["zeros"] = wt.qzeros_to_device(config, qz)
    if bias is not None:
        out["bias"] = wt.bias_to_device(np.asarray(bias), n_pad=np_)
    return out


def repack_gptq_checkpoint(
    layers: Mapping[str, Tuple],
    configs: Mapping[str, MatmulConfig],
    *, gptq_v2: bool = False,
) -> Dict[str, Dict[str, np.ndarray]]:
    """Repack a whole checkpoint: {layer_name: (qweight, scales, qzeros[,
    bias])} + per-layer configs -> {layer_name: device tensor dict}."""
    out = {}
    for name, tensors in layers.items():
        cfg = configs[name]
        qweight, scales = tensors[0], tensors[1]
        qzeros = tensors[2] if len(tensors) > 2 else None
        bias = tensors[3] if len(tensors) > 3 else None
        out[name] = repack_gptq_layer(cfg, qweight, scales, qzeros, bias,
                                      gptq_v2=gptq_v2)
        logger.info("repacked %s", name)
    return out
