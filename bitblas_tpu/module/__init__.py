"""Linear: drop-in quantized linear layer over the Matmul operator.

Counterpart of the reference `bitblas.Linear`
(/root/reference/bitblas/module/__init__.py:77-370): builds a dynamic-M
Matmul through the global operator cache, owns the packed weight buffers, and
repacks AutoGPTQ v1 / GPTQModel v2 checkpoints (including the qzeros
off-by-one quirk) with bit-identical dequantization.

This class is framework-agnostic (plain jnp buffers + __call__); a Flax NNX
wrapper lives in module/flax_linear.py.
"""

from __future__ import annotations

from typing import List, Optional, Union

import jax.numpy as jnp
import numpy as np

from ..cache import get_database_path, global_operator_cache
from ..common import get_logger
from ..ops.matmul import Matmul, _to_numpy
from ..ops.matmul_config import MatmulConfig
from ..ops import weight_transform as wt
from ..quantization import packing
from ..quantization.formats import as_jax_dtype
from ..tuner import auto_detect_tpu_target

logger = get_logger()

BITBLAS_TPU_DATABASE_PATH = get_database_path()


def unpack_qweight(qweight, bits: int) -> np.ndarray:
    """GPTQ qweight fields (int8-packed along the last axis) -> int8 codes.
    (reference module/__init__.py:62-75)."""
    return packing.unpack_qweight(_to_numpy(qweight), bits)


def unpack_qzeros(qzeros, bits: int) -> np.ndarray:
    """AutoGPTQ v1 qzeros with the `(z + 1) & mask` quirk (reference :24-39)."""
    return packing.unpack_qzeros(_to_numpy(qzeros), bits)


def unpack_qzeros_v2(qzeros, bits: int) -> np.ndarray:
    """GPTQModel v2 qzeros, no off-by-one (reference :42-58)."""
    return packing.unpack_qzeros_v2(_to_numpy(qzeros), bits)


class Linear:
    opt_M = (1, 16, 32, 64, 128, 256, 512)
    STORAGE_DTYPE = "int8"

    def __init__(
        self,
        in_features: int,
        out_features: int,
        bias: bool = False,
        A_dtype: str = "float16",
        W_dtype: str = "float16",
        accum_dtype: str = "float32",
        out_dtype: str = "float16",
        group_size: int = -1,
        with_scaling: Optional[bool] = None,
        with_zeros: bool = False,
        zeros_mode: Optional[str] = None,
        opt_M: Union[int, List[int], None] = None,
        enable_tuning: bool = True,
        fast_decoding: Optional[bool] = None,
        target: Optional[str] = None,
    ):
        if in_features % 16 or out_features % 16:
            raise ValueError("in_features/out_features must be divisible by 16")
        self.in_features = in_features
        self.out_features = out_features
        self.opt_m = tuple(opt_M) if isinstance(opt_M, (list, tuple)) else \
            ((opt_M,) if isinstance(opt_M, int) else self.opt_M)
        self.group_size = in_features if group_size in (-1, None) else group_size
        if in_features % self.group_size:
            raise ValueError("in_features must be divisible by group_size")
        self.is_consistent = A_dtype == W_dtype
        self.zeros_mode = zeros_mode

        config = MatmulConfig(
            M=list(self.opt_m),
            N=out_features,
            K=in_features,
            A_dtype=A_dtype,
            W_dtype=W_dtype,
            out_dtype=out_dtype,
            accum_dtype=accum_dtype,
            storage_dtype=self.STORAGE_DTYPE,
            with_scaling=bool(with_scaling),
            with_zeros=with_zeros,
            group_size=group_size,
            fast_decoding=fast_decoding,
            with_bias=bias,
            zeros_mode=zeros_mode,
        )
        self.bitblas_matmul = self._get_or_create_operator(config,
                                                           enable_tuning,
                                                           target)
        self.bits = self.bitblas_matmul.bit
        self.source_format = self.bitblas_matmul.source_format

        # Buffers (device layout).
        adt = as_jax_dtype(A_dtype)
        if self.is_consistent:
            self.weight = jnp.zeros((out_features, in_features), adt)
            self.qweight = None
        else:
            self.qweight = jnp.zeros(
                self.bitblas_matmul.retrieve_weight_shape(), jnp.int8)
            self.weight = None
        gdim = in_features // self.group_size
        # Row tensors use the device-layout padded N — the kernel's lane
        # blocks read that width (unpadded rows only worked by accident of
        # interpret-mode implicit padding).
        np_ = wt.padded_n(config)
        self.scales = (jnp.ones((gdim, 1, np_), jnp.float32)
                       if config.with_scaling else None)
        if config.with_zeros:
            if zeros_mode == "quantized":
                self.zeros = jnp.zeros(
                    (gdim, 1, np_ * self.bits // 8), jnp.int8)
            else:
                self.zeros = jnp.zeros((gdim, 1, np_), jnp.float32)
        else:
            self.zeros = None
        self.bias = jnp.zeros((1, np_), jnp.float32) if bias else None

    # -- operator cache ---------------------------------------------------------
    @staticmethod
    def _get_or_create_operator(config: MatmulConfig, enable_tuning: bool,
                                target: Optional[str]) -> Matmul:
        """Reference _get_or_create_bitblas_operator (module/__init__.py:242-262)."""
        target = target or auto_detect_tpu_target()
        if global_operator_cache.size() == 0:
            loaded = global_operator_cache.load_from_database(
                BITBLAS_TPU_DATABASE_PATH, target)
            if loaded:
                logger.info("Loaded %d operators from database.", loaded)
        op = global_operator_cache.get(config)
        if op is None:
            op = Matmul(config, target=target, enable_tuning=False)
            if enable_tuning:
                op.hardware_aware_finetune(topk=20)
                global_operator_cache.add(config, op)
                global_operator_cache.save_into_database(
                    BITBLAS_TPU_DATABASE_PATH, target)
                logger.info("tuned operator saved to database")
            else:
                global_operator_cache.add(config, op)
        return op

    def warmup(self, topk: int = 20):
        self.bitblas_matmul.hardware_aware_finetune(topk=topk)

    # -- forward -----------------------------------------------------------------
    def __call__(self, A):
        return self.forward(A)

    def forward(self, A):
        W = self.weight if self.is_consistent else self.qweight
        return self.bitblas_matmul.forward(
            A, W, scale=self.scales, zeros=self.zeros, bias=self.bias)

    # -- weight loading ------------------------------------------------------------
    def load_and_transform_weight(self, weight, scales=None, zeros=None,
                                  bias=None):
        """Load an unpacked weight [out, in] (+ [out, in/g] scales/zeros,
        [out] bias), reference module/__init__.py:291-313."""
        if self.is_consistent:
            self.weight = jnp.asarray(_to_numpy(weight))
        else:
            self.qweight = self.bitblas_matmul.transform_weight(weight)
        np_ = wt.padded_n(self.bitblas_matmul.config)
        if scales is not None:
            self.scales = jnp.asarray(
                wt.scales_to_device(_to_numpy(scales), n_pad=np_))
        if zeros is not None:
            if self.zeros_mode == "quantized":
                self.zeros = jnp.asarray(
                    wt.qzeros_to_device(self.bitblas_matmul.config,
                                        _to_numpy(zeros)))
            else:
                self.zeros = jnp.asarray(
                    wt.scales_to_device(_to_numpy(zeros), n_pad=np_,
                                        fill=0.0))
        if bias is not None:
            self.bias = jnp.asarray(
                wt.bias_to_device(_to_numpy(bias), n_pad=np_))

    def _repack_gptq_common(self, qweight, qzeros, scales, bias,
                            intzeros: np.ndarray):
        """Shared tail of the GPTQ v1/v2 repack (reference :315-363)."""
        cfg = self.bitblas_matmul.config
        # qweight arrives [in, out] int32-packed along in -> transpose to
        # [out, in] codes.
        qw = _to_numpy(qweight)
        intweight = packing.unpack_qweight(
            np.ascontiguousarray(qw.T).view(np.int8), self.bits)
        intweight = intweight[:, :self.in_features]
        self.qweight = self.bitblas_matmul.transform_weight(intweight)

        np_ = wt.padded_n(cfg)
        sc = _to_numpy(scales)  # [in/g, out] -> device [in/g, 1, out]
        self.scales = jnp.asarray(
            wt.scales_to_device(np.ascontiguousarray(sc.T), n_pad=np_))

        if cfg.zeros_mode == "original":
            # intzeros is [in/g, out]; device layout wants [out, in/g] input.
            self.zeros = jnp.asarray(
                wt.scales_to_device(intzeros.astype(np.float32).T,
                                    n_pad=np_, fill=0.0))
        elif cfg.zeros_mode == "rescale":
            z = intzeros.astype(np.float32).T * sc.T.astype(np.float32)
            self.zeros = jnp.asarray(
                wt.scales_to_device(z, n_pad=np_, fill=0.0))
        elif cfg.zeros_mode == "quantized":
            qz = packing.general_compress(
                np.ascontiguousarray(intzeros), self.bits)
            self.zeros = jnp.asarray(
                wt.qzeros_to_device(cfg, qz))
        else:
            raise ValueError(f"Unsupported zeros mode {cfg.zeros_mode}")
        if bias is not None:
            if not cfg.with_bias:
                # The forward path gates on config.with_bias (the kernel
                # was built without a bias operand) — storing it here
                # would silently drop it from every output.
                raise ValueError(
                    "checkpoint carries a bias but this Linear was built "
                    "with bias=False — reconstruct with bias=True")
            self.bias = jnp.asarray(
                wt.bias_to_device(_to_numpy(bias), n_pad=np_))
        return intweight, intzeros

    def repack_from_gptq(self, gptq_module):
        """AutoGPTQ (v1) CudaOldQuantLinear repack — qzeros carry the +1
        quirk (reference :315-338). Returns the unpacked ([out, in] codes,
        [in/g, out] int zeros) so wrappers can mirror without re-unpacking."""
        intzeros = packing.unpack_qzeros(_to_numpy(gptq_module.qzeros),
                                         self.bits)[:, :self.out_features]
        return self._repack_gptq_common(
            gptq_module.qweight, gptq_module.qzeros, gptq_module.scales,
            getattr(gptq_module, "bias", None), intzeros)

    def repack_from_gptq_v2(self, gptq_module):
        """GPTQModel (v2) repack — no off-by-one (reference :340-363).
        Returns (codes, int zeros) like repack_from_gptq."""
        intzeros = packing.unpack_qzeros_v2(_to_numpy(gptq_module.qzeros),
                                            self.bits)[:, :self.out_features]
        return self._repack_gptq_common(
            gptq_module.qweight, gptq_module.qzeros, gptq_module.scales,
            getattr(gptq_module, "bias", None), intzeros)

    @property
    def consistent(self):
        return self.is_consistent


__all__ = ["Linear", "unpack_qweight", "unpack_qzeros", "unpack_qzeros_v2"]
