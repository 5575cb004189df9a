"""Reference-layout -> TPU device-layout weight transforms (host side).

This is the counterpart of the reference's offline weight pipeline
(``Matmul.transform_weight`` + the OPExecutorCPU chain of ladder_permutate ->
quant_compress -> lop3_permutate, /root/reference/bitblas/ops/operator.py:529-557).
Here the chain is: unpack reference packing (if any) -> transpose to K-major
-> slot-strided N repack for the tuned kernel's block_n.

All functions take/return numpy arrays; they run once at weight-load time.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..quantization import packing
from ..quantization.packing import pack_tile_n
from .matmul_config import MatmulConfig


@dataclass
class DeviceWeights:
    """Device-layout operand bundle for the fused kernel."""
    qweight: np.ndarray                    # [K, N*bits/8] (or [K, N] 8-bit)
    scales: Optional[np.ndarray] = None    # [K/g, 1, N]
    zeros: Optional[np.ndarray] = None     # [K/g, 1, N] / qzeros [K/g, 1, N*bits/8]
    bias: Optional[np.ndarray] = None      # [1, N]

    def args(self):
        out = [self.qweight]
        if self.scales is not None:
            out.append(self.scales)
        if self.zeros is not None:
            out.append(self.zeros)
        if self.bias is not None:
            out.append(self.bias)
        return out


def padded_n(config: MatmulConfig) -> int:
    """Device-layout N, rounded up to a whole 128*e pack tile.

    Odd output sizes (e.g. BitNet-3B's hidden 3200 at int2: 3200 % 512 != 0)
    otherwise fall back to lane-misaligned pack tiles whose kernels fault on
    real hardware. Padded columns hold zero fields; operators slice outputs
    back to the true N."""
    if config.is_native_compute():
        return config.N
    t = 128 * (8 // config.bit) if config.bit < 8 else 128
    return -(-config.N // t) * t


def storage_is_xored(config: MatmulConfig) -> bool:
    """Sub-byte int/uint packs are stored XOR 0x80 (top bit flipped): the
    kernel's telescope then uses plain arithmetic shifts on the
    sign-extended word — no unsigned-mask op per word — with the offset
    corrections telescoping away into one rowsum term on the top slot.
    LUT/bit-surgery families (nf4, fp4) keep plain unsigned storage."""
    fam = config.source_format
    return config.bit < 8 and fam in ("int", "uint")


def unpacked_weight_to_device(config: MatmulConfig,
                              w_fields_nk: np.ndarray) -> np.ndarray:
    """[N, K] unsigned fields (or int8 values for 8-bit formats) -> device.

    The slot pack tile is the canonical pack_tile_n(N, e) — independent of
    kernel tuning, so one packed weight serves every tile configuration."""
    bits = config.bit
    w_kn = np.ascontiguousarray(w_fields_nk.T)
    if bits >= 8:
        # 8-bit: one value per int8 byte. Wide ints (16/32): natural-width
        # words, stored as the signed container (uint values reinterpret).
        sdt = {8: np.int8, 16: np.int16, 32: np.int32}[bits]
        w_kn = w_kn.astype(sdt) if w_kn.dtype.itemsize * 8 != bits \
            else w_kn.view(sdt)
        np8 = padded_n(config)
        if not config.is_native_compute() and w_kn.shape[1] < np8:
            w_kn = np.pad(w_kn, ((0, 0), (0, np8 - w_kn.shape[1])))
        return w_kn
    e = 8 // bits
    np_ = padded_n(config)
    if w_kn.shape[1] < np_:
        w_kn = np.pad(w_kn, ((0, 0), (0, np_ - w_kn.shape[1])))
    packed = packing.pack_nslot(w_kn.astype(np.uint8), bits,
                                pack_tile_n(np_, e))
    if storage_is_xored(config):
        packed = (packed.view(np.uint8) ^ 0x80).view(packed.dtype)
    return packed


def reference_weight_to_device(config: MatmulConfig,
                               qweight: np.ndarray) -> np.ndarray:
    """Reference packed qweight [N, K*bits/8] -> device layout."""
    bits = config.bit
    if bits >= 8:
        sdt = {8: np.int8, 16: np.int16, 32: np.int32}[bits]
        return unpacked_weight_to_device(config, np.asarray(qweight).view(sdt))
    fields = packing.general_decompress(qweight.view(np.int8), bits,
                                        out_elems=config.K)
    return unpacked_weight_to_device(config, fields)


def scales_to_device(scales_ngk: np.ndarray,
                     n_pad: Optional[int] = None,
                     fill: float = 1.0) -> np.ndarray:
    """[N, K/g] -> [K/g, 1, N_pad] float32 (middle singleton keeps Mosaic's
    last-two-dims block constraints off the group dimension; f32 because
    Mosaic kernels cannot consume f16 refs, and the upcast is exact).
    Padded columns get `fill` (their weight fields are zero, so any finite
    value is inert; outputs are sliced to the true N anyway)."""
    t = np.ascontiguousarray(scales_ngk.T.astype(np.float32))
    if n_pad is not None and t.shape[1] < n_pad:
        t = np.pad(t, ((0, 0), (0, n_pad - t.shape[1])),
                   constant_values=fill)
    return t.reshape(t.shape[0], 1, t.shape[1])


def qzeros_to_device(config: MatmulConfig, qzeros: np.ndarray) -> np.ndarray:
    """Reference quantized-zeros [K/g, N*bits/8] (adjacent-packed along N)
    -> slot-strided [K/g, 1, N*bits/8]."""
    bits = config.bit
    zfields = packing.general_decompress(qzeros.view(np.int8), bits,
                                         out_elems=config.N)
    np_ = padded_n(config)
    if zfields.shape[1] < np_:
        zfields = np.pad(zfields, ((0, 0), (0, np_ - zfields.shape[1])))
    packed = packing.pack_nslot(zfields, bits, pack_tile_n(np_, 8 // bits))
    return packed.reshape(packed.shape[0], 1, packed.shape[1])


def bias_to_device(bias: np.ndarray,
                   n_pad: Optional[int] = None) -> np.ndarray:
    b = np.ascontiguousarray(bias.reshape(1, -1).astype(np.float32))
    if n_pad is not None and b.shape[1] < n_pad:
        b = np.pad(b, ((0, 0), (0, n_pad - b.shape[1])))
    return b


def transform_reference_operands(
    config: MatmulConfig,
    qweight: np.ndarray,
    scales: Optional[np.ndarray] = None,
    zeros: Optional[np.ndarray] = None,
    qzeros: Optional[np.ndarray] = None,
    bias: Optional[np.ndarray] = None,
) -> DeviceWeights:
    """Bundle-transform reference-layout operands (see ops/reference.py
    docstring for shapes) into the tuning-independent device layout."""
    np_ = padded_n(config)
    dw = DeviceWeights(
        qweight=reference_weight_to_device(config, qweight))
    if config.with_scaling:
        dw.scales = scales_to_device(scales, n_pad=np_)
    if config.with_zeros:
        if config.zeros_mode == "quantized":
            dw.zeros = qzeros_to_device(config, qzeros)
        else:
            dw.zeros = scales_to_device(zeros, n_pad=np_, fill=0.0)
    if config.with_bias and bias is not None:
        dw.bias = bias_to_device(bias, n_pad=np_)
    return dw
