"""Per-stage throughput metrics + lineage (north rule).

Aggregate template follows the reference benchmark statistics
(/root/reference/Sources/Benchmarks/BenchmarkCLI.swift:661-748): wall time,
rows, rows/sec per stage; linear-interpolation percentiles for per-shard
latencies (BenchmarkCLI.swift:738-748)."""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from dataclasses import dataclass, field


def percentile(sorted_vals: list[float], p: float) -> float:
    """Linear-interp percentile, reference semantics (BenchmarkCLI.swift:738-748)."""
    if not sorted_vals:
        return 0.0
    if len(sorted_vals) == 1:
        return sorted_vals[0]
    rank = p * (len(sorted_vals) - 1)
    lo = int(rank)
    hi = min(lo + 1, len(sorted_vals) - 1)
    frac = rank - lo
    return sorted_vals[lo] * (1 - frac) + sorted_vals[hi] * frac


def benchmark_stats(latencies_ms: list[float], total_chars: int = 0,
                    entities: int = 0, wall_s: float | None = None) -> dict:
    """G2: the reference's benchmark-statistics aggregate
    (BenchmarkCLI.swift:661-748): avg / median / p95 (linear-interp) / min /
    max latency in ms, chars/sec, requests/sec, entities extracted."""
    xs = sorted(latencies_ms)
    n = len(xs)
    total = sum(xs)
    wall = wall_s if wall_s is not None else total / 1000.0
    return {
        "samples": n,
        "avg_ms": round(total / n, 3) if n else 0.0,
        "median_ms": round(percentile(xs, 0.5), 3),
        "p95_ms": round(percentile(xs, 0.95), 3),
        "min_ms": round(xs[0], 3) if n else 0.0,
        "max_ms": round(xs[-1], 3) if n else 0.0,
        "chars_per_sec": round(total_chars / wall, 2) if wall > 0 else 0.0,
        "requests_per_sec": round(n / wall, 2) if wall > 0 else 0.0,
        "entities_extracted": entities,
    }


@dataclass
class RunMetrics:
    stages: dict[str, dict] = field(default_factory=dict)
    started_at: float = field(default_factory=time.time)

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        info: dict = {}
        yield info
        wall = time.perf_counter() - t0
        rows = info.get("rows", 0)
        self.stages[name] = {
            "wall_s": round(wall, 4),
            "rows": rows,
            "rows_per_s": round(rows / wall, 2) if wall > 0 and rows else None,
            **{k: v for k, v in info.items() if k != "rows"},
        }

    def summary(self) -> dict:
        return {"total_wall_s": round(time.time() - self.started_at, 3),
                "stages": self.stages}

    def write(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=1, sort_keys=True)
