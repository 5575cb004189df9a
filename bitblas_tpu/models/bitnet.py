"""BitNet b1.58 layers (reference /root/reference/integration/BitNet/
utils_quant.py:19-230).

Two modes, mirroring the reference:
  * training/QAT: `BitLinearTraining` — fake-quant with straight-through
    estimator (weight_quant/activation_quant formulas reproduced exactly).
  * inference: `BitLinearInference` — weights ternarized offline to INT2
    codes + per-tensor scale `sw`; activations quantized to INT8 per-token;
    the W_INT2 x A_INT8 product runs on the fused Pallas kernel with
    integer-exact accumulation, rescaled by sw * s_a (reference
    `post_quant_process`, utils_quant.py:159-170).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.matmul import Matmul
from ..ops.matmul_config import MatmulConfig
from .quant_llama import DecoderServingMixin as _DecoderServingMixin


def weight_quant(w: jnp.ndarray, num_bits: int = 1):
    """Reference weight_quant (utils_quant.py:19-24): ternarize around the
    mean |w| scale. Returns the fake-quantized weight in w.dtype."""
    dtype = w.dtype
    w = w.astype(jnp.float32)
    s = 1.0 / jnp.clip(jnp.mean(jnp.abs(w)), 1e-5, None)
    return (jnp.clip(jnp.round(w * s), -1, 1) / s).astype(dtype)


def weight_quant_codes(w: np.ndarray):
    """Offline: ternary codes in {-1,0,1} plus the scale sw (reference
    create_bitblas_weights, utils_quant.py:119-145)."""
    w = np.asarray(w, np.float32)
    sw = 1.0 / max(np.abs(w).mean(), 1e-5)
    codes = np.clip(np.round(w * sw), -1, 1).astype(np.int8)
    return codes, np.float32(sw)


def activation_quant(x: jnp.ndarray, num_bits: int = 8):
    """Reference activation_quant (utils_quant.py:27-34): per-token absmax
    int8 fake quant."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    qp = 2 ** (num_bits - 1) - 1
    qn = -(2 ** (num_bits - 1))
    s = qp / jnp.clip(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-5, None)
    return (jnp.clip(jnp.round(x * s), qn, qp) / s).astype(dtype)


def activation_quant_int8(x: jnp.ndarray):
    """Real int8 quantization for the inference kernel: returns (q_int8,
    scale_per_token) with x ~= q / scale (reference forward,
    utils_quant.py:176-186)."""
    xf = x.astype(jnp.float32)
    qp = 127.0
    s = qp / jnp.clip(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-5, None)
    q = jnp.clip(jnp.round(xf * s), -128, 127).astype(jnp.int8)
    return q, s


def ste(x: jnp.ndarray, quantized: jnp.ndarray) -> jnp.ndarray:
    """Straight-through estimator (reference BitLinear.forward pattern)."""
    return x + jax.lax.stop_gradient(quantized - x)


def bitlinear_train_forward(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """QAT forward: fake-quant acts + weights with STE, dense matmul."""
    xq = ste(x, activation_quant(x))
    wq = ste(w, weight_quant(w))
    return jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


@dataclass
class BitLinearInference:
    """W_INT2 x A_INT8 inference layer over the fused kernel."""
    in_features: int
    out_features: int
    opt_m: tuple = (1, 16, 32, 64, 128, 256)

    def __post_init__(self):
        from ..cache import global_operator_cache
        self.config = MatmulConfig(
            M=list(self.opt_m), N=self.out_features, K=self.in_features,
            A_dtype="int8", W_dtype="int2", accum_dtype="int32",
            out_dtype="float32")
        op = global_operator_cache.get(self.config)
        if op is None:
            op = Matmul(self.config, enable_tuning=False)
            global_operator_cache.add(self.config, op)
        self.matmul = op
        self.qweight = None
        self.sw = None

    @classmethod
    def from_weight(cls, w: np.ndarray, **kw):
        """w: [out, in] float master weight -> ternarized layer."""
        layer = cls(in_features=w.shape[1], out_features=w.shape[0], **kw)
        codes, sw = weight_quant_codes(w)
        layer.qweight = layer.matmul.transform_weight(codes)
        layer.sw = jnp.float32(sw)
        return layer

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        q, s_a = activation_quant_int8(x)
        acc = self.matmul.forward(q, self.qweight)  # int-exact in f32
        out = acc / (self.sw * s_a)
        return out.astype(x.dtype)


class BitNetLlamaLayer:
    """One BitNet b1.58 decoder layer: llama topology, every projection a
    ternarized W_INT2 x A_INT8 fused matmul (reference integration/BitNet:
    BitLinear replaces nn.Linear inside a llama block)."""

    def __init__(self, cfg, opt_m=(1, 16, 256), seed: int = 0):
        import numpy as _np
        from .quant_llama import _PROJS, _dim
        self.cfg = cfg
        rng = _np.random.default_rng(seed)
        self.projs = {}
        for name, kin, kout in _PROJS:
            K, N = _dim(cfg, kin), _dim(cfg, kout)
            w = (rng.standard_normal((N, K)) * 0.02).astype(_np.float32)
            self.projs[name] = BitLinearInference.from_weight(w, opt_m=opt_m)
        self.attn_norm = jnp.ones((cfg.hidden_size,), jnp.float32)
        self.mlp_norm = jnp.ones((cfg.hidden_size,), jnp.float32)

    def proj(self, name: str, x: jnp.ndarray) -> jnp.ndarray:
        return self.projs[name](x)

    def state_dict(self):
        out = {}
        for name, lin in self.projs.items():
            out[f"{name}.qweight"] = lin.qweight
            out[f"{name}.sw"] = lin.sw
        out["attn_norm"] = self.attn_norm
        out["mlp_norm"] = self.mlp_norm
        return out

    def load_state_dict(self, state) -> None:
        for name, lin in self.projs.items():
            lin.qweight = jnp.asarray(state[f"{name}.qweight"])
            lin.sw = jnp.asarray(state[f"{name}.sw"])
        self.attn_norm = jnp.asarray(state["attn_norm"])
        self.mlp_norm = jnp.asarray(state["mlp_norm"])


class BitNetLlama(_DecoderServingMixin):
    """Stack of BitNet decoder layers (hidden-state in/out, like
    QuantLlama). Inherits the full serving surface (prefill, decode,
    chunk, paged, int8-KV) from DecoderServingMixin — BitNet runs through
    every engine, `generate`, and the speculative paths, e.g. as the cheap
    draft for a uint4 target (reference BitNet e2e is a bespoke torch
    loop, integration/BitNet/README.md)."""

    def __init__(self, cfg, opt_m=(1, 16, 256)):
        self.cfg = cfg
        self.layers = [BitNetLlamaLayer(cfg, opt_m, seed=i)
                       for i in range(cfg.num_layers)]

    def state_dict(self):
        return {f"layer_{i}": l.state_dict()
                for i, l in enumerate(self.layers)}

    def load_state_dict(self, state) -> None:
        for i, layer in enumerate(self.layers):
            layer.load_state_dict(state[f"layer_{i}"])
