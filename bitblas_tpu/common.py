"""Shared constants and logging for bitblas_tpu.

TPU-native re-imagination of microsoft/BitBLAS (see SURVEY.md). Mirrors the
role of the reference's ``bitblas/common.py`` (cache path constant) and the
logging setup in ``bitblas/__init__.py:12-55``.
"""

from __future__ import annotations

import logging
import os
import sys

__version__ = "0.1.0"

# Disk database for tuned kernel hints (analog of ~/.cache/bitblas,
# reference bitblas/common.py:6).
BITBLAS_TPU_DEFAULT_CACHE_PATH = os.path.expanduser(
    os.environ.get("BITBLAS_TPU_CACHE_PATH", "~/.cache/bitblas_tpu"))

MAX_ERROR_MESSAGE_LENGTH = 500


def _machine_fingerprint() -> str:
    """Short stable token for this host's CPU (arch + model name hash)."""
    import hashlib
    import platform
    model = ""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not model and line.startswith(("model name", "Processor")):
                    model = line.split(":", 1)[1].strip()
                elif not flags and line.startswith(("flags", "Features")):
                    # Same model string can expose different ISA features
                    # under different hypervisors — and XLA:CPU AOT entries
                    # embed the feature set (mismatched loads warn about
                    # SIGILL). Hash the flags too.
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                if model and flags:
                    break
    except OSError:
        model = platform.processor() or ""
    tag = f"{platform.machine()}-{model}-{flags}"
    return hashlib.sha1(tag.encode()).hexdigest()[:10]


def enable_jax_compilation_cache() -> None:
    """Point JAX's persistent compilation cache at the bitblas_tpu cache dir.

    The hint database stores *tuned tile hints* only; compiled executables
    are meant to live in JAX's own persistent cache (SURVEY.md §7 mapping of
    the reference's wrapper_compiled.so, cache/operator.py:55-135). Without
    this call nothing enables that cache, so every process pays the 20-60 s
    remote Mosaic compile again. Set BITBLAS_TPU_NO_JAX_CACHE=1 to opt out.
    """
    if os.environ.get("BITBLAS_TPU_NO_JAX_CACHE"):
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user already directs the cache; never override it
    try:
        import jax
        if jax.config.jax_compilation_cache_dir:
            return  # configured programmatically by the user
        # Scope the dir per machine: with the thresholds at 0 the cache also
        # holds XLA:CPU AOT executables, which embed host CPU features — a
        # cache dir shared across machines (NFS home) could otherwise load
        # an entry compiled for a different CPU (SIGILL). (ADVICE.md r1.)
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(BITBLAS_TPU_DEFAULT_CACHE_PATH,
                                       "jaxcache-" + _machine_fingerprint()))
        # Cache everything incl. sub-second CPU-interpret test kernels
        # (the jax defaults skip those).
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover - old jax without the knobs
        get_logger().warning("could not enable the JAX persistent "
                             "compilation cache", exc_info=True)


_LOGGER_NAME = "bitblas_tpu"


def get_logger() -> logging.Logger:
    return logging.getLogger(_LOGGER_NAME)


def _initialize_logging() -> None:
    logger = get_logger()
    if logger.handlers:
        return
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(
        logging.Formatter("%(asctime)s [bitblas_tpu:%(levelname)s] %(message)s"))
    logger.addHandler(handler)
    logger.setLevel(logging.WARNING)
    logger.propagate = False


def set_log_level(level) -> None:
    """Set library log level (accepts int or name, like the reference API)."""
    if isinstance(level, str):
        level = getattr(logging, level.upper())
    get_logger().setLevel(level)


_initialize_logging()
