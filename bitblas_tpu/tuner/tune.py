"""Measured auto-tuning: analytic pre-rank -> compile + time top-k on device.

TPU analog of `fast_tune` / `fast_tune_with_dynamic_range`
(/root/reference/bitblas/base/tuner.py:23-419): same contract (specialize a
dynamic shape, emit candidate configs, build and profile each, keep the
best), but candidates come from the exhaustive VMEM-constrained tile space
(tuner/space.py) instead of a roller DFS, "build" is a jax.jit compile
instead of nvcc, and profiling uses the elision-proof chained timer
(utils/timing.py). Failed candidates are logged and skipped, like the
reference (tl/tuner.py:86-91,166-172).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..common import MAX_ERROR_MESSAGE_LENGTH, get_logger
from ..kernels.spec import KernelSpec
from ..utils.timing import make_chained, measure_chained
from .arch import TileDevice
from .hint import TileHint
from .space import enumerate_hints, roofline_seconds

logger = get_logger()


@dataclasses.dataclass
class TuneResult:
    hint: TileHint
    latency: float           # seconds/run (measured) or analytic estimate
    measured: bool
    candidates: List[Tuple[TileHint, float]] = dataclasses.field(
        default_factory=list)


def _measure_candidate(builder: Callable[[TileHint], Callable],
                       hint: TileHint, args: Sequence,
                       inject: Optional[int]) -> float:
    fn = builder(hint)
    full_dep = False
    if hint.decode_mode == "materialize":
        # Transparent-XLA plan: the carry MUST ride the packed weights
        # (else XLA hoists the decode out of the timing loop and the
        # candidate falsely wins) and the full output must be consumed
        # (else the dense dot can be sliced) — override any caller inject.
        from ..kernels.materialize import timing_controls
        inject, full_dep = timing_controls(hint)
    elif hint.decode_mode == "asplit":
        # The quantize prologue is transparent XLA over A — the carry must
        # ride A (arg 0) or XLA hoists the prologue out of the timing loop.
        inject = 0
    chained = make_chained(fn, args, inject=inject, full_output_dep=full_dep)
    return measure_chained(chained, target_sec=0.03, repeats=2)


def _stratified_candidates(hints: Sequence[TileHint],
                           topk: int) -> List[TileHint]:
    """Pick the measured candidate set: the roofline-ranked prefix PLUS the
    best-ranked representative of every distinct block-shape family
    ((block_k regime, block_n regime, mma_dtype, decode_mode)) until topk
    is filled. The analytic model provably mis-ranks GEMV tilings by up to
    2.3x (space.py note), so a pure prefix can exclude the true winner on
    un-measured generations; stratification guarantees shape-family
    coverage (reference analog: the roller policy's topk diversity,
    /root/reference/bitblas/base/roller/policy/default.py:37-95)."""
    def family(h: TileHint):
        return (h.block_k >= 2048, h.block_n >= 1024, h.mma_dtype,
                h.decode_mode, h.group_mode, h.lut_mode)

    half = max(topk // 2, 1)
    picked: List[TileHint] = list(hints[:half])
    seen_fams = {family(h) for h in picked}
    seen = {id(h) for h in picked}
    # one representative per unseen family, in rank order
    for h in hints[half:]:
        if len(picked) >= topk:
            return picked
        f = family(h)
        if f not in seen_fams:
            seen_fams.add(f)
            seen.add(id(h))
            picked.append(h)
    # fill the remainder with the next-ranked hints
    for h in hints[half:]:
        if len(picked) >= topk:
            break
        if id(h) not in seen:
            picked.append(h)
    return picked


def fast_tune(
    spec: KernelSpec,
    arch: TileDevice,
    builder: Callable[[TileHint], Callable],
    make_args: Callable[[TileHint], Sequence],
    topk: int = 20,
    inject: Optional[int] = None,
) -> TuneResult:
    """Tune one static-shape kernel.

    builder(hint) -> positional-args device function; make_args(hint) ->
    example inputs in the hint's device layout (layouts are hint-dependent:
    the slot packing uses block_n).
    """
    hints = enumerate_hints(spec, arch)
    if not hints:
        raise ValueError(f"No legal tile configuration for {spec}")

    if arch.is_cpu or topk <= 0:
        return TuneResult(hint=hints[0],
                          latency=roofline_seconds(spec, hints[0], arch),
                          measured=False)

    results: List[Tuple[TileHint, float]] = []
    for hint in _stratified_candidates(hints, topk):
        try:
            args = make_args(hint)
            lat = _measure_candidate(builder, hint, args, inject)
            results.append((hint, lat))
            logger.info("tune %s: %s -> %.1f us", spec, hint.short_name(),
                        lat * 1e6)
        except Exception as ex:  # noqa: BLE001
            logger.warning("tune candidate %s failed: %s", hint.short_name(),
                           str(ex)[:MAX_ERROR_MESSAGE_LENGTH])
    if not results:
        logger.warning("all measured candidates failed; falling back to "
                       "analytic best")
        return TuneResult(hint=hints[0],
                          latency=roofline_seconds(spec, hints[0], arch),
                          measured=False)
    results.sort(key=lambda t: t[1])
    best_hint, best_lat = results[0]
    return TuneResult(hint=best_hint, latency=best_lat, measured=True,
                      candidates=results)


def fast_tune_with_dynamic_range(
    make_spec: Callable[[int], KernelSpec],
    m_buckets: Sequence[int],
    arch: TileDevice,
    builder: Callable[[KernelSpec, TileHint], Callable],
    make_args: Callable[[KernelSpec, TileHint], Sequence],
    topk: int = 20,
    inject: Optional[int] = None,
) -> Dict[int, TuneResult]:
    """Tune every M bucket; the operator dispatches at runtime
    (reference base/tuner.py:257-419, minus the C dispatch codegen — bucket
    selection happens in Python, shapes stay static per bucket)."""
    out: Dict[int, TuneResult] = {}
    for m in m_buckets:
        spec = make_spec(m)
        out[m] = fast_tune(
            spec, arch,
            builder=lambda h, s=spec: builder(s, h),
            make_args=lambda h, s=spec: make_args(s, h),
            topk=topk, inject=inject)
    return out
