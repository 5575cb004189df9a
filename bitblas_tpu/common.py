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
