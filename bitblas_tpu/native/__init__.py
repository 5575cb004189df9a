"""Native (C++) repack library loader.

TPU counterpart of the reference's builder/runtime layer
(`LibraryGenerator.compile_lib/load_lib`,
/root/reference/bitblas/builder/lib_generator/__init__.py:31-124): compiles
csrc/repack.cpp with the system g++ on first use, caches the .so under the
bitblas_tpu cache dir keyed by a source hash, and binds it via ctypes.
Everything degrades gracefully to the numpy implementations in
quantization/packing.py when no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from ..common import BITBLAS_TPU_DEFAULT_CACHE_PATH, get_logger

logger = get_logger()

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "repack.cpp")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _compile_lib() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_SRC):
        return None
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    out_dir = os.path.join(BITBLAS_TPU_DEFAULT_CACHE_PATH, "native")
    os.makedirs(out_dir, exist_ok=True)
    so_path = os.path.join(out_dir, f"librepack_{tag}.so")
    if not os.path.exists(so_path):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
               _SRC, "-o", so_path + ".tmp"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(so_path + ".tmp", so_path)
        except Exception as ex:  # noqa: BLE001
            logger.warning("native repack build failed (%s); using numpy",
                           str(ex)[:200])
            return None
    lib = ctypes.CDLL(so_path)
    i64, i32 = ctypes.c_int64, ctypes.c_int
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i8p = ctypes.POINTER(ctypes.c_int8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.bb_general_compress.argtypes = [u8p, u8p, i64, i64, i32]
    lib.bb_general_decompress.argtypes = [u8p, u8p, i64, i64, i32]
    lib.bb_pack_nslot.argtypes = [u8p, u8p, i64, i64, i32, i64]
    lib.bb_unpack_nslot.argtypes = [u8p, u8p, i64, i64, i32, i64]
    lib.bb_unpack_qzeros.argtypes = [i32p, i8p, i64, i64, i32, i32]
    lib.bb_transpose_u8.argtypes = [u8p, u8p, i64, i64]
    lib.bb_bias_signed.argtypes = [i8p, u8p, i64, i32]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is None and not _lib_failed:
            _lib = _compile_lib()
            if _lib is None:
                _lib_failed = True
    return _lib


def available() -> bool:
    return get_lib() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))


def general_compress(unpacked: np.ndarray, bits: int) -> np.ndarray:
    lib = get_lib()
    a = np.ascontiguousarray(unpacked.reshape(-1, unpacked.shape[-1])
                             .astype(np.uint8))
    rows, cols = a.shape
    out = np.empty((rows, cols * bits // 8), dtype=np.uint8)
    lib.bb_general_compress(_u8ptr(a), _u8ptr(out), rows, cols, bits)
    return out.view(np.int8).reshape(*unpacked.shape[:-1],
                                     unpacked.shape[-1] * bits // 8)


def general_decompress(packed: np.ndarray, bits: int) -> np.ndarray:
    lib = get_lib()
    a = np.ascontiguousarray(packed.reshape(-1, packed.shape[-1])
                             .view(np.uint8))
    rows, pcols = a.shape
    out = np.empty((rows, pcols * (8 // bits)), dtype=np.uint8)
    lib.bb_general_decompress(_u8ptr(a), _u8ptr(out), rows, pcols, bits)
    return out.reshape(*packed.shape[:-1], packed.shape[-1] * (8 // bits))


def pack_nslot(fields_kn: np.ndarray, bits: int, tile_n: int) -> np.ndarray:
    lib = get_lib()
    a = np.ascontiguousarray(fields_kn.astype(np.uint8))
    k, n = a.shape
    out = np.empty((k, n * bits // 8), dtype=np.uint8)
    lib.bb_pack_nslot(_u8ptr(a), _u8ptr(out), k, n, bits, tile_n)
    return out.view(np.int8)


def unpack_nslot(packed: np.ndarray, bits: int, tile_n: int) -> np.ndarray:
    lib = get_lib()
    a = np.ascontiguousarray(packed.view(np.uint8))
    k, pcols = a.shape
    n = pcols * (8 // bits)
    out = np.empty((k, n), dtype=np.uint8)
    lib.bb_unpack_nslot(_u8ptr(a), _u8ptr(out), k, n, bits, tile_n)
    return out


def unpack_qzeros(qzeros: np.ndarray, bits: int, add_one: bool) -> np.ndarray:
    lib = get_lib()
    a = np.ascontiguousarray(qzeros.view(np.int32))
    rows, pcols = a.shape
    out = np.empty((rows, pcols * (32 // bits)), dtype=np.int8)
    lib.bb_unpack_qzeros(a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                         _i8ptr(out), rows, pcols, bits, int(add_one))
    return out


def transpose_u8(a: np.ndarray) -> np.ndarray:
    lib = get_lib()
    a = np.ascontiguousarray(a.view(np.uint8))
    rows, cols = a.shape
    out = np.empty((cols, rows), dtype=np.uint8)
    lib.bb_transpose_u8(_u8ptr(a), _u8ptr(out), rows, cols)
    return out


def bias_signed(w: np.ndarray, bits: int) -> np.ndarray:
    lib = get_lib()
    a = np.ascontiguousarray(w.astype(np.int8))
    out = np.empty(a.shape, dtype=np.uint8)
    lib.bb_bias_signed(_i8ptr(a.reshape(-1)), _u8ptr(out.reshape(-1)),
                       a.size, bits)
    return out.view(np.int8)
