"""Matmul: the flagship operator (reference
/root/reference/bitblas/ops/general_matmul/__init__.py:321-842).

Construction selects the kernel path (dense XLA vs fused Pallas dequant),
builds one compiled kernel per dynamic-M bucket, optionally runs the measured
tuner, and exposes the reference API surface: `transform_weight`,
`transform_input`, `retrieve_weight_shape`, `forward`/`__call__`.

Weight flow (reference transform_weight + OPExecutorCPU chain, here a single
numpy pass): user provides unpacked weight values/codes [N, K] (or reference
GPTQ-packed buffers via ops/weight_transform.py helpers); integers are
clamp+biased exactly like the reference; the result is slot-strided N-packed
K-major storage that every tile configuration shares.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import get_logger
from ..kernels.dense import make_dense_matmul
from ..kernels.dequant_matmul import make_dequant_matmul
from ..kernels.spec import KernelSpec
from ..quantization import packing
from ..quantization.formats import as_jax_dtype, nf4_lut
from ..testing import random_reference_operands  # reused for tuning inputs
from ..tuner import TileHint
from .matmul_config import MatmulConfig
from .operator import BaseKernelNameGenerator, Operator
from . import weight_transform as wt

logger = get_logger()


class MatmulKernelNameGenerator(BaseKernelNameGenerator):
    """Readable kernel names for logs/cache dirs (reference
    general_matmul/__init__.py:240-318)."""

    KERNEL_PREFIX = "matmul"

    SHORT = {"float32": "f32", "float16": "f16", "bfloat16": "bf16"}

    @classmethod
    def simplify_dtype(cls, dtype: str) -> str:
        if dtype in cls.SHORT:
            return cls.SHORT[dtype]
        if dtype.startswith("int"):
            return f"i{dtype[3:]}"
        if dtype.startswith("uint"):
            return f"u{dtype[4:]}"
        return dtype

    def is_valid_config(self, config) -> bool:
        return isinstance(config, MatmulConfig)

    def generate(self, hint: Optional[TileHint] = None) -> str:
        c = self.config
        shape = f"n{c.N}k{c.K}"
        if isinstance(c.M, int):
            shape = f"m{c.M}" + shape
        precision = (f"{self.simplify_dtype(c.A_dtype)}"
                     f"x{self.simplify_dtype(c.W_dtype)}")
        parts = [self.KERNEL_PREFIX, shape, precision,
                 hint.short_name() if hint else "default"]
        return "_".join(parts)


def _to_numpy(x) -> np.ndarray:
    if x is None:
        return None
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().numpy()
    return np.asarray(x)


class Matmul(Operator):

    def __init__(
        self,
        config: MatmulConfig,
        name: str = "matmul",
        target: Optional[str] = None,
        enable_tuning: bool = True,
        from_database: bool = False,
        backend: str = "pallas",
    ):
        super().__init__(name, config, target=target, backend=backend)
        self.kernel_name_generator = MatmulKernelNameGenerator(config)
        self.lut = (nf4_lut(as_jax_dtype(config.A_dtype))
                    if config.source_format == "nf" else None)
        self._extra_kernels: Dict[int, Any] = {}
        if not from_database:
            self._build_default_module()
            if enable_tuning and not self.interpret:
                self.hardware_aware_finetune()

    # -- Operator hooks -------------------------------------------------------
    @property
    def m_buckets(self) -> Tuple[int, ...]:
        return self.config.m_buckets

    def _make_spec(self, m: int) -> KernelSpec:
        return KernelSpec.from_config(self.config, m)

    def _build_kernel(self, spec: KernelSpec, hint: TileHint):
        if self.config.is_native_compute():
            # forward() normalizes t* activations to [M, K] before the
            # jitted call, so the kernel always sees the n* convention.
            layout = "n" + self.config.layout[1]
            return make_dense_matmul(spec, hint, layout=layout,
                                     interpret=self.interpret)
        return make_dequant_matmul(spec, hint, interpret=self.interpret)

    def _example_args(self, spec: KernelSpec, hint: TileHint) -> Sequence:
        cfg = self.config
        ops = random_reference_operands(cfg, spec.m, seed=7)
        if cfg.is_native_compute():
            return (jnp.asarray(ops.A), jnp.asarray(ops.qweight))
        dw = wt.transform_reference_operands(
            cfg, ops.qweight, ops.scales, ops.zeros, ops.qzeros, ops.bias)
        args = [jnp.asarray(ops.A)] + [jnp.asarray(a) for a in dw.args()]
        return tuple(args)

    def _positional_kernel(self, spec: KernelSpec, hint: TileHint):
        fn = self._build_kernel(spec, hint)
        cfg = self.config

        def positional(A, W, *rest):
            i = 0
            scales = zeros = bias = None
            if cfg.with_scaling:
                scales = rest[i]; i += 1
            if cfg.with_zeros:
                zeros = rest[i]; i += 1
            if cfg.with_bias:
                bias = rest[i]; i += 1
            return fn(A, W, scales=scales, zeros=zeros, bias=bias)

        return positional

    def _tune_inject_index(self) -> Optional[int]:
        # Perturb the smallest tensor: scales if present, else A.
        return 2 if self.config.with_scaling else 0

    # -- weight/input transforms ----------------------------------------------
    def retrieve_weight_shape(self) -> Tuple[int, ...]:
        """Device-layout packed weight shape (reference :645-660)."""
        return tuple(self._make_spec(self.m_buckets[0]).packed_k_major_shape)

    def transform_weight(self, weight, scale=None, zeros=None, bias=None):
        """Unpacked weight [N, K] -> device layout (+ transformed
        scale/zeros/bias when given). Mirrors reference semantics
        (general_matmul/__init__.py:662-711): int weights are clamped and
        biased into unsigned fields; fp8 reinterpreted as bytes; other
        formats are integer codes already.
        """
        cfg = self.config
        weight = _to_numpy(weight)
        if cfg.is_native_compute():
            result = [jnp.asarray(weight)]
        else:
            fam, bits = cfg.source_format, cfg.bit
            if fam == "int" and bits < 8:
                assert not cfg.with_scaling, "int weights use no scales"
                codes = packing.bias_signed_weight(weight, bits)
            elif fam in ("fp_e4m3", "fp_e5m2"):
                codes = weight.view(np.int8) if weight.dtype.itemsize == 1 \
                    else weight.astype(np.int8)
            elif fam == "int" and bits == 8:
                codes = weight.astype(np.int8)
            else:
                codes = weight.astype(np.int8)
            result = [jnp.asarray(wt.unpacked_weight_to_device(cfg, codes))]

        np_ = wt.padded_n(cfg)
        if scale is not None:
            result.append(jnp.asarray(
                wt.scales_to_device(_to_numpy(scale), n_pad=np_)))
        if zeros is not None:
            if cfg.zeros_mode == "quantized":
                result.append(jnp.asarray(
                    wt.qzeros_to_device(cfg, _to_numpy(zeros))))
            else:
                result.append(jnp.asarray(
                    wt.scales_to_device(_to_numpy(zeros), n_pad=np_,
                                        fill=0.0)))
        if bias is not None:
            result.append(jnp.asarray(
                wt.bias_to_device(_to_numpy(bias), n_pad=np_)))
        return result[0] if len(result) == 1 else result

    def transform_input(self, A):
        """No runtime activation transform is ever needed on TPU (the slot
        layout absorbs it) — parity stub for the reference API (:713-722)."""
        return A

    # -- forward ---------------------------------------------------------------
    def _kernel_for_m(self, m: int):
        buckets = sorted(self._kernels)
        if m <= buckets[-1]:
            return self.kernel_for(m)
        # Larger than every bucket: build (and memoize) an exact-shape
        # kernel. The largest bucket's hint is only reused when the
        # overflow is a near miss (<=2x); a 16k-row prefill wants the
        # large-M regime's tiling, so re-derive the analytic default at
        # the true shape (tall bm, large-M preferences) instead.
        padded = -(-m // 512) * 512
        if padded not in self._extra_kernels:
            spec = self._make_spec(padded)
            if padded <= 2 * buckets[-1]:
                hint = self._kernels[buckets[-1]][0]
            else:
                from ..tuner import default_hint
                hint = default_hint(spec, self.arch)
            self._extra_kernels[padded] = jax.jit(
                self._build_kernel(spec, hint))
            logger.info("%s: compiled overflow kernel m=%d (%s)", self.name,
                        padded, hint.short_name())
        return self._extra_kernels[padded]

    def forward(self, A, W, scale=None, zeros=None, bias=None, output=None):
        del output  # reference API parity; JAX returns a fresh array
        if self.config.layout[0] == "t":
            # Transposed activations arrive [K, M]; normalize to [M, K] so
            # the bucket dispatch below sees one convention. XLA fuses the
            # transpose into the dot — the kernel itself is built with the
            # A-side already normalized (see _build_kernel).
            A = A.T
        lead = A.shape[:-1]
        K = A.shape[-1]
        m = int(np.prod(lead)) if lead else 1
        A2 = A.reshape(m, K)
        buckets = sorted(self._kernels)
        if m <= buckets[-1]:
            target_m = self.select_bucket(m)
            fn = self.kernel_for(m)
        else:
            target_m = -(-m // 512) * 512
            fn = self._kernel_for_m(m)
        if m < target_m:
            # Pad to the bucket shape BEFORE the jitted call so each bucket
            # traces exactly once (the dynamic-M dispatch of the reference's
            # generated C host branch, done in Python).
            A2 = jnp.pad(A2, ((0, target_m - m), (0, 0)))
        out = fn(A2, W, scales=scale, zeros=zeros,
                 bias=bias if self.config.with_bias else None)
        return out[:m].reshape(*lead, self.config.N)

    def __call__(self, *args: Any, **kwargs: Any) -> Any:
        return self.forward(*args, **kwargs)

    # -- convenience properties (reference parity) -----------------------------
    @property
    def M(self): return self.config.M          # noqa: E704
    @property
    def N(self): return self.config.N          # noqa: E704
    @property
    def K(self): return self.config.K          # noqa: E704
    @property
    def A_dtype(self): return self.config.A_dtype      # noqa: E704
    @property
    def W_dtype(self): return self.config.W_dtype      # noqa: E704
    @property
    def out_dtype(self): return self.config.out_dtype  # noqa: E704
    @property
    def accum_dtype(self): return self.config.accum_dtype  # noqa: E704
    @property
    def storage_dtype(self): return self.config.storage_dtype  # noqa: E704
    @property
    def with_scaling(self): return self.config.with_scaling    # noqa: E704
    @property
    def with_zeros(self): return self.config.with_zeros        # noqa: E704
    @property
    def group_size(self): return self.config.effective_group_size  # noqa: E704
    @property
    def fast_decoding(self): return self.config.fast_decoding  # noqa: E704
    @property
    def with_bias(self): return self.config.with_bias          # noqa: E704
    @property
    def zeros_mode(self): return self.config.zeros_mode        # noqa: E704
    @property
    def source_format(self): return self.config.source_format  # noqa: E704
    @property
    def bit(self): return self.config.bit                      # noqa: E704
    @property
    def layout(self): return self.config.layout                # noqa: E704
