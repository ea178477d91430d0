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
                    entities: int = 0, fixtures: int | None = None,
                    batch_latencies_ms: list[float] | None = None) -> dict:
    """G2: the reference's benchmark-statistics aggregate, EXACT semantics
    (BenchmarkCLI.swift:661-711): throughputs are computed over the SUM OF
    TIMED LATENCIES — never wall clock, which would fold warmup and report
    printing into the rate; ``samples`` is the FIXTURE count with the
    request count under ``total_requests`` (the reference's field split);
    requests/sec uses the batch-latency sum when batch mode supplied it."""
    xs = sorted(latencies_ms)
    n = len(xs)
    total = sum(xs)
    batch_total = sum(batch_latencies_ms) if batch_latencies_ms else 0.0
    req_denom = batch_total if batch_total > 0 else total
    return {
        "samples": n if fixtures is None else fixtures,
        "total_requests": n,
        "avg_ms": round(total / n, 3) if n else 0.0,
        "median_ms": round(percentile(xs, 0.5), 3),
        "p95_ms": round(percentile(xs, 0.95), 3),
        "min_ms": round(xs[0], 3) if n else 0.0,
        "max_ms": round(xs[-1], 3) if n else 0.0,
        "chars_per_sec": round(total_chars / (total / 1000.0), 2)
        if total > 0 else 0.0,
        "requests_per_sec": round(n / (req_denom / 1000.0), 2)
        if req_denom > 0 else 0.0,
        "entities_extracted": entities,
    }


def run_latency_mode(samples: list[dict], extract_fn, iterations: int = 5,
                     warmup: int = 1, report=print) -> dict:
    """Reference latency mode (BenchmarkCLI.swift:451-501): per sample,
    ``warmup`` untimed runs then ``iterations`` timed runs; per-iteration
    line output (padded 20-char id) and a G2 stats aggregate."""
    from ..core.wordsplit import word_count

    latencies: list[float] = []
    total_chars = total_words = total_entities = 0
    for si, s in enumerate(samples):
        labels = s.get("labels", [])
        sid = str(s.get("id", f"sample_{si:03d}"))
        for _ in range(warmup):
            extract_fn(s["text"], labels, s.get("threshold"))
        for it in range(iterations):
            t = time.perf_counter()
            entities = extract_fn(s["text"], labels, s.get("threshold"))
            ms = (time.perf_counter() - t) * 1000.0
            latencies.append(ms)
            total_chars += len(s["text"])
            total_words += word_count(s["text"])
            total_entities += len(entities)
            report(f"{sid[:20]:<20} | iter {it + 1} | {ms:.2f} ms")
    stats = benchmark_stats(latencies, total_chars, total_entities,
                            fixtures=len(samples))
    stats["mode"] = "latency"
    stats["words_analyzed"] = total_words
    stats["fixtures"] = len(samples)
    return stats


def run_throughput_mode(samples: list[dict], extract_fn, iterations: int = 5,
                        warmup: int = 1, batch_size: int = 8,
                        concurrency: int = 1, report=print) -> dict:
    """Reference throughput mode (BenchmarkCLI.swift:503-659): fixtures
    chunked into batches; per batch, warmup then ``iterations`` timed
    passes with BOUNDED concurrency (at most ``concurrency`` in-flight
    extractions); records per-sample and per-batch latencies."""
    from concurrent.futures import ThreadPoolExecutor

    from ..core.wordsplit import word_count

    batch_size = max(batch_size, 1)
    concurrency = max(concurrency, 1)
    batches = [samples[i:i + batch_size]
               for i in range(0, len(samples), batch_size)]
    latencies: list[float] = []
    batch_latencies: list[float] = []
    total_chars = total_words = total_entities = 0

    def one(s: dict) -> tuple[float, int]:
        t = time.perf_counter()
        ents = extract_fn(s["text"], s.get("labels", []), s.get("threshold"))
        return (time.perf_counter() - t) * 1000.0, len(ents)

    with ThreadPoolExecutor(max_workers=concurrency) as pool:
        for bi, batch in enumerate(batches):
            for _ in range(max(warmup, 0)):
                for s in batch:
                    extract_fn(s["text"], s.get("labels", []),
                               s.get("threshold"))
            for it in range(iterations):
                bt = time.perf_counter()
                results = list(pool.map(one, batch))
                bms = (time.perf_counter() - bt) * 1000.0
                batch_latencies.append(bms)
                for s, (ms, n_ents) in zip(batch, results):
                    latencies.append(ms)
                    total_chars += len(s["text"])
                    total_words += word_count(s["text"])
                    total_entities += n_ents
                report(f"batch {bi + 1}/{len(batches)} | iter {it + 1} | "
                       f"{bms:.2f} ms | {len(batch)} samples")
    stats = benchmark_stats(latencies, total_chars, total_entities,
                            fixtures=len(samples),
                            batch_latencies_ms=batch_latencies)
    stats["mode"] = "throughput"
    stats["words_analyzed"] = total_words
    stats["fixtures"] = len(samples)
    stats["batch_size"] = batch_size
    stats["concurrency"] = concurrency
    xs = sorted(batch_latencies)
    stats["batch_avg_ms"] = round(sum(xs) / len(xs), 3) if xs else 0.0
    stats["batch_median_ms"] = round(percentile(xs, 0.5), 3)
    stats["batch_p95_ms"] = round(percentile(xs, 0.95), 3)
    return stats


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
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=1, sort_keys=True)
