"""TPU architecture abstraction.

Counterpart of the reference's `TileDevice`/`CUDA` arch layer
(/root/reference/bitblas/base/arch/cuda.py:55-93) which records smem caps,
warp sizes and tensorcore dtype tables for the roller policy. The TPU
equivalent records HBM bandwidth, MXU/VPU throughput and VMEM budget for the
tile-space enumerator + roofline cost model, and detects the attached
generation from jax.devices() (the reference shells out to nvidia-smi,
utils/target_detector.py:27-105).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class TileDevice:
    """A TPU generation's performance envelope (per chip/core)."""
    name: str
    hbm_bandwidth: float      # bytes/s
    flops_bf16: float         # MXU flop/s
    flops_int8: float         # MXU op/s
    flops_f32: float          # effective f32 matmul flop/s (multi-pass)
    vpu_ops: float            # vector int/float lanes * clock (op/s)
    vmem_bytes: int           # usable VMEM budget for kernel working set
    hbm_bytes: int
    # MXU weight-ingestion rate at small M (operand elements/s): a skinny
    # dot cannot go faster than the array can load weights, independent of
    # how few A rows stream. Measured on v5e with VMEM-resident repeated
    # dots (scripts/tpu_ingest_probe.py: [1024,1024] dot at m<=32 — bf16
    # 0.69us, f32 0.68us, int8 0.57us; element-count-bound ~1024
    # elem/cycle). Other generations scaled by their flops ratio.
    mxu_ingest_bf16: float = 1.52e12
    mxu_ingest_int8: float = 1.85e12
    is_cpu: bool = False


TPU_V4 = TileDevice("tpu_v4", 1.23e12, 275e12, 275e12, 275e12 / 4, 4.3e12,
                    64 * 2**20, 32 * 2**30, 2.1e12, 2.6e12)
# v5e bf16 is published as 197 TF/s, but sustained dequant-GEMM kernels
# reproducibly measure ~205 TF/s on the attached part (670us at 2*4096^3
# flops, 3 runs) — the envelope uses the measured ceiling so "100%" stays
# honest (a kernel beating the model means the model was low, CLAUDE.md).
# int8 keeps the hardware 2x ratio so int-vs-float roofline comparisons
# stay consistent.
TPU_V5E = TileDevice("tpu_v5e", 819e9, 205e12, 410e12, 205e12 / 4, 3.2e12,
                     64 * 2**20, 16 * 2**30, 1.52e12, 1.85e12)
TPU_V5P = TileDevice("tpu_v5p", 2.77e12, 459e12, 918e12, 459e12 / 4, 7.4e12,
                     64 * 2**20, 95 * 2**30, 3.5e12, 4.3e12)
TPU_V6E = TileDevice("tpu_v6e", 1.64e12, 918e12, 1836e12, 918e12 / 4, 7.4e12,
                     64 * 2**20, 32 * 2**30, 7.1e12, 8.6e12)
CPU_INTERPRET = TileDevice("cpu_interpret", 50e9, 1e12, 1e12, 5e11, 1e11,
                           64 * 2**20, 8 * 2**30, 1e12, 1e12, is_cpu=True)

_BY_NAME = {
    "tpu_v4": TPU_V4, "v4": TPU_V4,
    "tpu_v5e": TPU_V5E, "v5e": TPU_V5E, "v5litepod": TPU_V5E,
    "tpu_v5p": TPU_V5P, "v5p": TPU_V5P, "v5": TPU_V5P,
    "tpu_v6e": TPU_V6E, "v6e": TPU_V6E,
    "cpu": CPU_INTERPRET, "cpu_interpret": CPU_INTERPRET,
}


def auto_detect_tpu_target() -> str:
    """Detect the attached TPU generation (analog of
    auto_detect_nvidia_target). Falls back to env/cpu."""
    try:
        import jax
        dev = jax.devices()[0]
        if dev.platform == "cpu":
            return "cpu_interpret"
        # Generation hint from the runtime env wins over device_kind parsing
        # (but never over an actual CPU backend).
        env = os.environ.get("PALLAS_AXON_TPU_GEN") or os.environ.get("TPU_GEN")
        if env and env.lower() in _BY_NAME:
            return _BY_NAME[env.lower()].name
        kind = getattr(dev, "device_kind", "").lower()
        # e.g. "TPU v5 lite", "TPU v4", "TPU v5p", "TPU v6 lite"
        if "v5 lite" in kind or "v5e" in kind or "v5litepod" in kind:
            return "tpu_v5e"
        if "v6" in kind:
            return "tpu_v6e"
        if "v5p" in kind or "v5" in kind:
            return "tpu_v5p"
        if "v4" in kind:
            return "tpu_v4"
    except Exception:  # noqa: BLE001
        pass
    return "cpu_interpret"


def get_arch(target: Optional[str] = None) -> TileDevice:
    if target is None:
        target = auto_detect_tpu_target()
    key = target.lower()
    if key not in _BY_NAME:
        raise ValueError(f"Unknown TPU target {target!r}; "
                         f"known: {sorted(set(_BY_NAME))}")
    return _BY_NAME[key]
