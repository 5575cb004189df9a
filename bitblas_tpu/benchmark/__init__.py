"""Benchmark harness (reference
/root/reference/bitblas/benchmark/operator/__init__.py:18-175):
named benchmark sets, tuned/untuned latency + tuning-time recording, JSON
serialization, and a text table report.
"""

from __future__ import annotations

import json
import sys
import time
from dataclasses import asdict, dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

from ..common import get_logger
from ..tuner import get_arch

logger = get_logger()


@dataclass
class BenchmarkRecord:
    name: str
    config: dict
    latency_default: Optional[float] = None   # seconds, analytic-hint kernel
    latency_tuned: Optional[float] = None     # seconds, after finetune
    tune_seconds: Optional[float] = None
    extra: dict = field(default_factory=dict)

    @property
    def speedup(self) -> Optional[float]:
        if self.latency_default and self.latency_tuned:
            return self.latency_default / self.latency_tuned
        return None


class OperatorBenchmarkBase:
    """Subclass and register benchmark sets of (name, config, make_op)."""

    def __init__(self):
        self.benchmark_sets: Dict[str, List[Tuple[str, Any, Callable]]] = {}
        self.results: Dict[str, List[BenchmarkRecord]] = {}
        self.arch = get_arch()

    def add_benchmark_set(self, set_name: str,
                          entries: List[Tuple[str, Any, Callable]]):
        self.benchmark_sets.setdefault(set_name, []).extend(entries)

    def run(self, *, enable_tuning: bool = True, topk: int = 20):
        for set_name, entries in self.benchmark_sets.items():
            records = []
            for name, config, make_op in entries:
                rec = BenchmarkRecord(name=name, config=self._config_dict(config))
                try:
                    op = make_op(config)
                    rec.latency_default = op.profile_latency()
                    if enable_tuning and not self.arch.is_cpu:
                        t0 = time.perf_counter()
                        op.hardware_aware_finetune(topk=topk)
                        rec.tune_seconds = time.perf_counter() - t0
                        rec.latency_tuned = op.profile_latency()
                except Exception as ex:  # noqa: BLE001
                    rec.extra["error"] = str(ex)[:300]
                    logger.warning("benchmark %s failed: %s", name,
                                   str(ex)[:200])
                records.append(rec)
                # Stream progress: remote-tunnel runs are often killed by
                # timeouts; per-entry lines salvage partial results.
                lat = rec.latency_tuned or rec.latency_default
                print(f"[bench] {name}: "
                      f"{'%.1fus' % (lat * 1e6) if lat else 'FAIL'}",
                      file=sys.stderr, flush=True)
            self.results[set_name] = records
        return self.results

    @staticmethod
    def _config_dict(config) -> dict:
        try:
            import dataclasses
            return {f.name: str(getattr(config, f.name))
                    for f in dataclasses.fields(config)}
        except Exception:  # noqa: BLE001
            return {"repr": repr(config)}

    # -- reporting -------------------------------------------------------------
    def serialize_results(self) -> str:
        from ..utils.profiling import get_commit_id
        payload = {
            "arch": self.arch.name,
            "commit": get_commit_id(),  # reference utils/__init__.py:15-21
            "sets": {
                k: [asdict(r) for r in v] for k, v in self.results.items()
            },
        }
        return json.dumps(payload, indent=1)

    def save_results(self, path: str):
        with open(path, "w") as f:
            f.write(self.serialize_results())

    def report(self) -> str:
        lines = []
        for set_name, records in self.results.items():
            lines.append(f"== {set_name} (arch={self.arch.name}) ==")
            lines.append(f"{'name':40s} {'default_us':>12s} {'tuned_us':>12s} "
                         f"{'speedup':>8s} {'tune_s':>8s}")
            for r in records:
                d = f"{r.latency_default*1e6:12.1f}" if r.latency_default else " " * 12
                t = f"{r.latency_tuned*1e6:12.1f}" if r.latency_tuned else " " * 12
                s = f"{r.speedup:8.2f}" if r.speedup else " " * 8
                ts = f"{r.tune_seconds:8.1f}" if r.tune_seconds else " " * 8
                err = f"  ERROR: {r.extra['error'][:60]}" if "error" in r.extra else ""
                lines.append(f"{r.name:40s} {d} {t} {s} {ts}{err}")
        return "\n".join(lines)
