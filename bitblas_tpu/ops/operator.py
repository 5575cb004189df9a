"""Operator base class: lifecycle, build, tune, profile, dispatch.

TPU counterpart of the reference `Operator`
(/root/reference/bitblas/ops/operator.py:92-557). The reference pipeline is
select-impl -> default schedule -> tvm.build -> wrap C host source -> nvcc ->
ctypes load; here it is select-spec -> analytic default hint -> jax.jit
(XLA/Mosaic compile, persistently cached by JAX) per dynamic-M bucket, with
`hardware_aware_finetune` swapping hints for measured ones.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import numpy as np

from ..common import get_logger
from ..kernels.spec import KernelSpec
from ..tuner import (TileDevice, TileHint, default_hint, fast_tune, get_arch,
                     roofline_seconds)
from ..utils.timing import measure_kernel
from .matmul_config import OperatorConfig

logger = get_logger()


class BaseKernelNameGenerator:
    """Kernel naming for cache keys/logs (reference ops/operator.py:49-69)."""

    KERNEL_PREFIX = "kernel"

    def __init__(self, config: OperatorConfig):
        assert self.is_valid_config(config)
        self.config = config

    def is_valid_config(self, config: OperatorConfig) -> bool:
        raise NotImplementedError

    def generate(self, hint: Optional[TileHint] = None) -> str:
        raise NotImplementedError


class Operator:
    """Holds one tuned/compiled kernel per dynamic-M bucket."""

    def __init__(self, name: str, config: OperatorConfig,
                 target: Optional[str] = None, backend: str = "pallas"):
        self.name = name
        self.config = config
        self.backend = backend
        self.arch: TileDevice = get_arch(target)
        self.interpret = self.arch.is_cpu
        # bucket -> (hint, callable, jitted callable)
        self._kernels: Dict[int, Tuple[TileHint, Callable, Callable]] = {}
        self._latency: Dict[int, float] = {}
        # buckets whose hints are measured / externally installed (not
        # analytic defaults) — the ones worth persisting to the hint DB
        self._pinned: set = set()

    # -- abstract hooks ------------------------------------------------------
    @property
    def m_buckets(self) -> Tuple[int, ...]:
        raise NotImplementedError

    def _make_spec(self, m: int) -> KernelSpec:
        raise NotImplementedError

    def _build_kernel(self, spec: KernelSpec, hint: TileHint) -> Callable:
        raise NotImplementedError

    def _example_args(self, spec: KernelSpec, hint: TileHint) -> Sequence:
        raise NotImplementedError

    def _tune_inject_index(self) -> Optional[int]:
        return None

    # -- lifecycle -----------------------------------------------------------
    def _build_default_module(self) -> None:
        for m in self.m_buckets:
            spec = self._make_spec(m)
            hint = default_hint(spec, self.arch)
            self._install(m, spec, hint)

    def _install(self, m: int, spec: KernelSpec, hint: TileHint) -> None:
        fn = self._build_kernel(spec, hint)
        self._kernels[m] = (hint, fn, jax.jit(fn))

    def apply_hints(self, hints: Dict[int, TileHint], *,
                    pin: bool = True) -> None:
        """Install externally provided hints. `pin=True` (measured winners
        installed by tune scripts) marks the buckets as tuned so a later DB
        save re-persists them as measured; the DB *load* path passes
        pin=False — hints merely loaded from disk must not masquerade as
        this process's measurements, or a stale loader would overwrite a
        concurrent tuner's fresher winner at save time (the fcntl merge
        lets `tuned` win precisely because it is supposed to mean
        "measured here")."""
        for m, hint in hints.items():
            if m not in self.m_buckets:
                continue
            self._install(m, self._make_spec(m), hint)
            if pin:
                self._pinned.add(m)
        for m in self.m_buckets:
            if m not in self._kernels:
                spec = self._make_spec(m)
                self._install(m, spec, default_hint(spec, self.arch))

    def hardware_aware_finetune(self, topk: int = 20) -> None:
        """Measured tuning for every bucket (reference
        ops/operator.py:347-382, topk=20 contract)."""
        if self.interpret:
            logger.info("%s: CPU/interpret arch — keeping analytic hints",
                        self.name)
            return
        for m in self.m_buckets:
            spec = self._make_spec(m)
            result = fast_tune(
                spec, self.arch,
                builder=lambda h, s=spec: self._positional_kernel(s, h),
                make_args=lambda h, s=spec: self._example_args(s, h),
                topk=topk,
                inject=self._tune_inject_index())
            self._install(m, spec, result.hint)
            self._pinned.add(m)
            self._latency[m] = result.latency
            logger.info("%s m=%d tuned: %s (%.1f us)", self.name, m,
                        result.hint.short_name(), result.latency * 1e6)

    def _positional_kernel(self, spec: KernelSpec, hint: TileHint) -> Callable:
        """Positional-args wrapper used by the tuner."""
        return self._build_kernel(spec, hint)

    # -- dispatch ------------------------------------------------------------
    def select_bucket(self, m: int) -> int:
        """Smallest bucket >= m, else the largest (inputs beyond the largest
        bucket are split by the caller or run padded)."""
        buckets = sorted(self._kernels)
        for b in buckets:
            if m <= b:
                return b
        return buckets[-1]

    def hint_for(self, m: int) -> TileHint:
        return self._kernels[self.select_bucket(m)][0]

    def kernel_for(self, m: int, jitted: bool = True) -> Callable:
        h, fn, jfn = self._kernels[self.select_bucket(m)]
        return jfn if jitted else fn

    @property
    def hints(self) -> Dict[int, TileHint]:
        return {m: h for m, (h, _, _) in self._kernels.items()}

    @property
    def tuned_hints(self) -> Dict[int, TileHint]:
        """Only the measured / externally installed buckets (the subset the
        hint DB persists; analytic defaults are reconstructible)."""
        return {m: h for m, (h, _, _) in self._kernels.items()
                if m in self._pinned}

    # -- profiling ------------------------------------------------------------
    def profile_latency(self, m: Optional[int] = None) -> float:
        """Measured seconds/run for bucket m (reference profile_latency)."""
        bucket = self.select_bucket(m if m is not None else max(self.m_buckets))
        spec = self._make_spec(bucket)
        hint, fn, _ = self._kernels[bucket]
        if self.interpret:
            return roofline_seconds(spec, hint, self.arch)
        args = self._example_args(spec, hint)
        # Native dense compute is a transparent XLA dot: without a full
        # output dependency XLA slices the dot down to the consumed element
        # and the "measurement" collapses to dispatch overhead (int8 dense
        # read 2.2us where the MXU floor is 335us). Pallas calls are opaque,
        # so the cheap single-element dependency stays for those.
        full_dep = bool(getattr(self.config, "is_native_compute",
                                lambda: False)())
        return measure_kernel(fn, args, inject=self._tune_inject_index(),
                              full_output_dep=full_dep)
