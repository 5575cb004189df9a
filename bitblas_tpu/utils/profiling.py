"""Profiling / observability helpers.

Reference tracing (SURVEY.md §5) = time_evaluator + TLProfiler + benchmark
JSON. TPU equivalents: the elision-proof timer (utils/timing.py), this
xprof trace context, and the benchmark harness reports.
"""

from __future__ import annotations

import contextlib
import os
import subprocess
from typing import Optional

import jax


@contextlib.contextmanager
def xprof_trace(logdir: str = "/tmp/bitblas_tpu_xprof"):
    """Capture an XLA/xprof device trace around a block:

        with xprof_trace("/tmp/trace"):
            fn(*args).block_until_ready()
    """
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def get_commit_id() -> Optional[str]:
    """Stamp benchmark results with the repo commit (reference
    utils/__init__.py:15-21)."""
    try:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        out = subprocess.run(["git", "rev-parse", "HEAD"], cwd=root,
                             capture_output=True, text=True, timeout=10)
        return out.stdout.strip() or None
    except Exception:  # noqa: BLE001
        return None
