"""Measured curated hints for the v5e headline configs.

Single source of truth consumed by bench.py, scripts/seed_curated_hints.py
and anything else that wants the sweep-measured winners without running the
tuner (sweeps: scripts/tpu_gemv_sweep2.py, tpu_gemm256_sweep.py,
tpu_shape_probe.py — all timed with utils.timing.measure_kernel).
"""

from __future__ import annotations

from typing import Optional

from .hint import TileHint


def _bm8(m: int) -> int:
    """Exact-m block rounded UP to the sublane multiple (Mosaic: dim -2
    block sizes must be multiples of 8)."""
    return max(8, -(-m // 8) * 8)


def curated_hint(w_dtype: str, a_dtype: str, m: int,
                 nk: int = 4096) -> Optional[TileHint]:
    """Measured-best hint for a headline (W, A, m) regime, else None.

    `nk` selects the swept shape family: 4096 (the headline square) or
    8192 (llama-3-70B projections, swept 2026-08-19). The 8192 small-M
    winners are EXACT-block_m whole-K tiles — 14% over the bm=256 family
    (t8x256x8192 54.4us vs t256x256x4096 63.3 at u4 m=1) because the
    padded-M grid re-reads the A tile without contributing rows."""
    if nk >= 8192:
        if w_dtype == "int2" and a_dtype == "int8":
            if m <= 16:
                return TileHint(block_m=_bm8(m), block_n=2048, block_k=nk,
                                mma_dtype="int8", decode_mode="telescope")
            if m <= 256:
                # 2026-08-19 sweep (in-window): bk=2048 mask 92.9us (90.2%)
                # vs the old bk=512 tele tile's 101.2us in the same run.
                return TileHint(block_m=256, block_n=4096, block_k=2048,
                                mma_dtype="int8", decode_mode="mask")
            # 2026-08-19 head-to-head (in-window): t2048x2048x1024 1505us
            # (89.1%) vs t1024x1024x1024's 1606us (83.5%) — fewer W
            # re-streams at the taller bm.
            return TileHint(block_m=2048, block_n=2048, block_k=1024,
                            mma_dtype="int8", decode_mode="mask")
        if w_dtype == "uint4" and a_dtype in ("float16", "bfloat16"):
            if m <= 8:
                return TileHint(block_m=_bm8(m), block_n=256, block_k=nk,
                                mma_dtype="float32", decode_mode="telescope")
            if m <= 16:
                return TileHint(block_m=16, block_n=512, block_k=nk,
                                mma_dtype="float32", decode_mode="telescope")
            if m <= 256:
                return TileHint(block_m=256, block_n=1024, block_k=nk,
                                mma_dtype="bfloat16", decode_mode="telescope")
            return TileHint(block_m=1024, block_n=4096, block_k=512,
                            mma_dtype="bfloat16", decode_mode="telescope")
        return None
    if w_dtype == "int2" and a_dtype == "int8":
        if m <= 16:
            # exact-m tile (2026-08-20 in-window probe): t16x2048x2048
            # 10.0us vs the old bm=256 tile's 11.7 at m=16; t8x2048x2048
            # 11.7 vs 12.5 at m=1 — the padded-M grid re-read costs ~6-15%
            # at 4096^2 too (the 8192-sweep lesson transfers).
            return TileHint(block_m=_bm8(m), block_n=2048, block_k=2048,
                            mma_dtype="int8", decode_mode="telescope")
        if m <= 256:
            return TileHint(block_m=256, block_n=4096, block_k=512,
                            mma_dtype="int8", decode_mode="telescope")
        # compute-bound W2A8 wants the int8 MXU; taller bm cuts W
        # re-streams — 2026-08-19 in-window head-to-head: t2048x2048x1024
        # 417.8us (80.2%) vs t1024x1024x1024's 423.0us (79.3%).
        return TileHint(block_m=2048, block_n=2048, block_k=1024,
                        mma_dtype="int8", decode_mode="mask")
    if w_dtype == "uint4" and a_dtype in ("float16", "bfloat16"):
        if m <= 8:
            # f32 operands: int32->f32 casts are cheaper than ->bf16 and
            # the MXU ingests f32 at the bf16 element rate at small M.
            # exact-m bn=128 whole-K: 17.0us vs 17.4 bm=256 in-window
            # (2026-08-20 probe) — at the serial ingest+decode floor.
            return TileHint(block_m=_bm8(m), block_n=128, block_k=4096,
                            mma_dtype="float32", decode_mode="telescope")
        if m <= 16:
            # exact-m bn=512 whole-K: 15.8us vs 16.6 bm=256 in-window
            # (2026-08-20 probe)
            return TileHint(block_m=16, block_n=512, block_k=4096,
                            mma_dtype="float32", decode_mode="telescope")
        if m <= 256:
            # whole-K block: one fat W DMA per N tile (~43us vs 56us)
            return TileHint(block_m=256, block_n=512, block_k=4096,
                            mma_dtype="bfloat16", decode_mode="telescope")
        # single-N-tile tall blocks: A streamed once, W decoded once per
        # 1024 rows (717-736us vs 741-752 for bn=2048; large-M sweep)
        return TileHint(block_m=1024, block_n=4096, block_k=512,
                        mma_dtype="bfloat16", decode_mode="telescope")
    return None


def flash_block_hint(seq_len: int, dim: int,
                     causal: bool) -> "tuple[int, int]":
    """(block_q, block_kv) for the flash prefill kernel — the knob pair
    the on-chip sweep tunes (scripts/tpu_flash_tune.py). Consumed by
    FlashAtten's construction default and QuantLlama.make_prefill so a
    measured winner propagates to every prefill site; the operator hint
    DB overrides this when a tuned entry exists. 2026-08-19 sweep (v5e,
    d=128): causal wants square 1024 blocks at every s (the triangular
    walk + half-block diag sub-chunking), dense wants the wide kv block."""
    del dim
    if seq_len >= 2048:
        return (1024, 1024) if causal else (1024, 2048)
    return min(512, seq_len), min(1024, seq_len)


def tp_serving_hint(n: int, k: int, m: int) -> Optional[TileHint]:
    """Measured-best hint for a Llama-3-70B TP-LOCAL projection shape
    (scripts/tune_tp_serving_db.py winners exported to
    tp_serving_hints.json so they survive cache wipes), else None.
    Consumed by TPQuantLlama._kernel after an operator-DB miss."""
    table = _tp_serving_table()
    return table.get((n, k, m))


def _tp_serving_table():
    global _TP_TABLE
    if _TP_TABLE is None:
        import json
        import os
        path = os.path.join(os.path.dirname(__file__),
                            "tp_serving_hints.json")
        tab = {}
        # Best-effort like the operator-DB lookup above it: a corrupt or
        # field-drifted JSON must degrade to default_hint, never crash the
        # decode hot path (the table is a performance fallback only).
        try:
            with open(path) as f:
                entries = json.load(f)
        except Exception:  # noqa: BLE001  # pragma: no cover - packaging safety
            entries = []
        for e in entries:
            # Per-entry: one malformed/field-drifted entry must not drop
            # the whole table (from_dict filters unknown fields).
            try:
                tab[(e["n"], e["k"], e["m"])] = TileHint.from_dict(e["hint"])
            except Exception:  # noqa: BLE001
                continue
        _TP_TABLE = tab
    return _TP_TABLE


_TP_TABLE = None
