"""Tuning hints: the TPU analog of the reference roller `Hint`
(/root/reference/bitblas/base/roller/hint.py:152-260).

A GPU hint carries block/warp/rstep/pipeline/async-copy knobs; on TPU the
Mosaic compiler owns register layout and software pipelining, so the tunable
surface collapses to tile shapes plus a few numeric-path switches. Hints are
JSON-serializable — they are what the disk cache persists (the compiled
executable itself lives in the JAX persistent compilation cache).
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field, fields
from typing import Optional


@dataclass(frozen=True)
class TileHint:
    # MXU tile shape: (block_m, block_k) x (block_k, block_n) per grid step.
    block_m: int = 128
    block_n: int = 256
    block_k: int = 512
    # dtype fed to the MXU for float paths ("bfloat16" single-pass,
    # "float32" multi-pass) and int paths ("int8" native, or a float dtype
    # to emulate). Decode targets this dtype directly.
    mma_dtype: str = "bfloat16"
    # lax precision for float dots: "default" | "high" | "highest".
    precision: str = "default"
    # NF4 LUT strategy: "take" (1D dynamic gather, interpret-only — Mosaic
    # rejects it), "select" (branchless 15-blend mux), or "gather2d"
    # (per-lane sublane gather: take_along_axis on a [16, width] table —
    # the 2D gather Mosaic DOES support; ~1 op vs 15 blends).
    lut_mode: str = "take"
    # Sub-byte decode strategy for int/uint weights:
    #   "mask"      — per-slot shift+mask+cast (classic)
    #   "telescope" — dot the raw/shifted bytes and recover each slot as a
    #                 linear combination in the f32 epilogue (fewer VPU ops;
    #                 exact because byte values are bf16-exact and MXU
    #                 products round only at f32 accumulation)
    #   "materialize" — two-pass plan: decode the packed weights to a dense
    #                 HBM operand once (XLA pass), then the vendor dense dot
    #                 (kernels/materialize.py; wins at large M)
    #   "asplit"    — exact 15-bit hi/lo int8 split of float activations
    #                 feeding the int8-MXU telescope at 2M rows
    #                 (kernels/asplit.py; targets ingestion-bound small M)
    decode_mode: str = "mask"
    # Group handling when scales make the k-tile span multiple groups:
    #   "loop"    — one dot + scalar-row epilogue per group
    #   "batched" — a single batched (3D) dot per segment; scales applied as
    #               a [groups, 1, sub] tensor and reduced (no per-group row
    #               extraction). Scaling-only configs.
    group_mode: str = "loop"
    # fp8/fp4 decode implementation (r5 decode-floor campaign):
    #   "legacy" — the established exponent-surgery decoders
    #   "fast"   — branchless u32-lane rebias (e4m3: single integer ADD;
    #              e5m2: raw-exponent bitcast * 2^112 with a selected
    #              subnormal fix-up) — value-identical, ~40% fewer VPU ops
    #   "fast16" — same surgery in u16 lanes producing bf16 directly
    #              (mma_dtype bfloat16 only; exact: e4m3/fp4 values fit
    #              bf16's 7 mantissa bits, e5m2 normals too)
    # Default "fast": value-identical to legacy and measured strictly
    # faster (e4m3 m=1 1.75x) — and hint-DB records that predate this
    # field deserialize to the default, so old pinned fp8 winners pick
    # up the cheap decode automatically.
    fp_mode: str = "fast"
    # Cap Mosaic VMEM usage; None = compiler default.
    vmem_limit_bytes: Optional[int] = None

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "TileHint":
        names = {f.name for f in fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    def short_name(self) -> str:
        s = f"t{self.block_m}x{self.block_n}x{self.block_k}_{self.mma_dtype}"
        if self.precision != "default":
            s += f"_{self.precision}"
        return s


@dataclass(frozen=True)
class FlashHint:
    """Flash-attention tunables (reference tunes block_M/block_N/num_stages/
    threads, general_flashatten/tilelang/flashatten.py:60-150; Mosaic owns
    staging/threads so only the q/kv block shape survives on TPU)."""
    block_q: int = 512
    block_kv: int = 1024

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "FlashHint":
        names = {f.name for f in fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    def short_name(self) -> str:
        return f"fa{self.block_q}x{self.block_kv}"


# Reflection registry for the hint DB (cache/__init__.py stores the hint
# class name in mapping.json so each operator family round-trips its own
# record type).
HINT_CLASSES = {"TileHint": TileHint, "FlashHint": FlashHint}
