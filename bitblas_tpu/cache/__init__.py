"""Operator cache: in-memory registry + on-disk tuned-hint database.

Counterpart of the reference `OperatorCache`
(/root/reference/bitblas/cache/operator.py:24-203). The reference persists
nvcc-compiled .so files + TVMScript; on TPU the compiled executable lives in
JAX's persistent compilation cache, so the database only needs the *tuned
tile hints* (JSON) plus the config for reflection-based re-instantiation.

Layout: <db>/<target>/<sha256(repr(config))[:32]>/
    config.json   — dataclass fields of the operator config
    mapping.json  — operator/config class names (reflection, like reference
                    cache/operator.py:146-179)
    hints.json    — {m_bucket: TileHint dict}
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import shutil
import threading
from typing import Dict, Optional

from ..common import BITBLAS_TPU_DEFAULT_CACHE_PATH, get_logger
from ..tuner import HINT_CLASSES, TileHint, auto_detect_tpu_target

logger = get_logger()


def get_database_path() -> str:
    return BITBLAS_TPU_DEFAULT_CACHE_PATH


def _config_hash(config) -> str:
    return hashlib.sha256(repr(config).encode()).hexdigest()[:32]


def _atomic_write_json(path: str, obj) -> None:
    """Write JSON via tmp-file + rename: a concurrent reader (other thread
    OR other process) sees either the old complete file or the new complete
    file, never torn bytes (reference analog: the operator-cache spin-lock
    test, testing/python/cache/test_operator_cache_spin_lock.py)."""
    tmp = f"{path}.tmp.{os.getpid()}.{threading.get_ident()}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class OperatorCache:

    def __init__(self):
        self._lock = threading.RLock()
        self._ops: Dict[object, object] = {}

    def get(self, config):
        with self._lock:
            return self._ops.get(config)

    def add(self, config, op):
        with self._lock:
            self._ops[config] = op

    def size(self) -> int:
        with self._lock:
            return len(self._ops)

    def clear(self):
        with self._lock:
            self._ops.clear()

    # -- disk -----------------------------------------------------------------
    def save_into_database(self, database_path: Optional[str] = None,
                           target: Optional[str] = None):
        database_path = database_path or get_database_path()
        target = target or auto_detect_tpu_target()
        with self._lock:
            for config, op in self._ops.items():
                d = os.path.join(database_path, target, _config_hash(config))
                os.makedirs(d, exist_ok=True)
                _atomic_write_json(os.path.join(d, "config.json"),
                                   _config_to_json(config))
                hint_cls = type(next(iter(op.hints.values())
                                     )).__name__ if op.hints else "TileHint"
                _atomic_write_json(os.path.join(d, "mapping.json"), {
                    "operator": type(op).__name__,
                    "config": type(config).__name__,
                    # which record type hints.json holds (TileHint for
                    # matmul-family ops, FlashHint for attention)
                    "hint": hint_cls,
                })
                # hints.json is a read-modify-write: two processes tuning
                # different m-buckets of the same config must not drop each
                # other's buckets (cross-process twin of the RLock). The
                # merge runs under an fcntl lock. Measured/externally
                # installed buckets (tuned_hints) win over what's on disk;
                # analytic defaults only fill buckets nobody measured.
                tuned = {str(m): h.to_dict()
                         for m, h in getattr(op, "tuned_hints", {}).items()}
                allh = {str(m): h.to_dict() for m, h in op.hints.items()}
                lockpath = os.path.join(d, ".lock")
                with open(lockpath, "w") as lf:
                    try:
                        import fcntl
                        fcntl.flock(lf, fcntl.LOCK_EX)
                    except ImportError:  # pragma: no cover - non-POSIX
                        pass
                    merged = {}
                    try:
                        with open(os.path.join(d, "hints.json")) as f:
                            merged = json.load(f)
                    except (OSError, ValueError):
                        pass
                    merged.update(tuned)
                    for k, v in allh.items():
                        merged.setdefault(k, v)
                    _atomic_write_json(os.path.join(d, "hints.json"), merged)

    def load_from_database(self, database_path: Optional[str] = None,
                           target: Optional[str] = None) -> int:
        import bitblas_tpu

        database_path = database_path or get_database_path()
        target = target or auto_detect_tpu_target()
        root = os.path.join(database_path, target)
        if not os.path.isdir(root):
            return 0
        loaded = 0
        for entry in sorted(os.listdir(root)):
            d = os.path.join(root, entry)
            try:
                with open(os.path.join(d, "mapping.json")) as f:
                    mapping = json.load(f)
                with open(os.path.join(d, "config.json")) as f:
                    config_fields = json.load(f)
                with open(os.path.join(d, "hints.json")) as f:
                    hints = json.load(f)
                config_cls = getattr(bitblas_tpu, mapping["config"])
                op_cls = getattr(bitblas_tpu, mapping["operator"])
                config = config_cls(**config_fields)
                op = op_cls(config, target=target, enable_tuning=False,
                            from_database=True)
                hcls = HINT_CLASSES[mapping.get("hint", "TileHint")]
                op.apply_hints({int(m): hcls.from_dict(h)
                                for m, h in hints.items()}, pin=False)
                self.add(config, op)
                loaded += 1
            except Exception as ex:  # noqa: BLE001
                logger.warning("cache entry %s failed to load: %s", entry,
                               str(ex)[:200])
        return loaded


def _config_to_json(config) -> dict:
    out = {}
    for f in dataclasses.fields(config):
        v = getattr(config, f.name)
        if hasattr(v, "value"):  # IntEnum
            v = int(v)
        if isinstance(v, tuple):
            v = list(v)
        out[f.name] = v
    return out


global_operator_cache = OperatorCache()


def load_global_ops_cache(database_path: Optional[str] = None,
                          target: Optional[str] = None) -> int:
    return global_operator_cache.load_from_database(database_path, target)
