"""Benchmark-sample JSONL source (operator S1) + deterministic corpus writer.

The reference drives both its Swift and Python benchmark runners from JSONL
rows ``{id, text, labels, threshold}``
(/root/reference/Sources/Benchmarks/BenchmarkCLI.swift:275-280,397-415;
format documented in Scripts/BENCHMARK_README.md:122-138). This module reads
that format into a Dataset (blank lines skipped; an empty file is an error —
the reference's loader semantics) and can synthesize a corpus of the same
shape from the deterministic page generator (we do NOT copy the reference's
fixture files)."""

from __future__ import annotations

import json
import os

import pyarrow as pa

from ..config import KG_LABELS


def read_benchmark_jsonl(path: str):
    """JSONL → Dataset(id, text, labels, threshold). Mirrors
    decodeFixtures: skip blank lines, error on an effectively empty file."""
    import ray.data as rd

    def parse(batch: dict) -> pa.Table:
        ids, texts, labels, thresholds = [], [], [], []
        for line in batch["text"]:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            ids.append(str(row["id"]))
            texts.append(row["text"])
            labels.append([str(l) for l in row.get("labels", [])])
            thresholds.append(row.get("threshold"))
        return pa.table({
            "id": pa.array(ids, pa.string()),
            "text": pa.array(texts, pa.string()),
            "labels": pa.array(labels, pa.list_(pa.string())),
            "threshold": pa.array(thresholds, pa.float32()),
        })

    ds = rd.read_text(path).map_batches(parse, batch_format="numpy")
    if ds.count() == 0:
        raise ValueError(f"no benchmark samples in {path}")
    return ds


def load_text_file_samples(path: str, max_chars: int = 3072,
                           overlap_chars: int = 768, max_words: int = 248):
    """Operator S2: text-file → chunked benchmark samples. Mirrors the
    reference loader (BenchmarkCLI.swift:366-395): CRLF → LF, trim, split
    into overlapping chunks, one sample per chunk."""
    from ..core.chunk import chunk_text

    with open(path, encoding="utf-8") as f:
        text = f.read().replace("\r\n", "\n").strip()
    chunks = chunk_text(text, max_chars, overlap_chars, max_words) if text else []
    import ray.data as rd

    base = os.path.splitext(os.path.basename(path))[0]
    return rd.from_items([
        {"id": f"{base}_{i:03d}", "text": ch.text,
         "labels": list(KG_LABELS), "threshold": 0.3}
        for i, ch in enumerate(chunks)
    ])


def write_benchmark_jsonl(path: str, n: int = 50, seed: int = 42) -> str:
    """Synthesize a benchmark corpus in the reference JSONL shape from the
    deterministic page generator (body text only, no HTML)."""
    from .pages import synth_body

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for i in range(n):
            body = synth_body(i + 1, "", seed)     # skip doc 0 (empty page)
            if not body:
                body = synth_body(i + 1000, "", seed)
            f.write(json.dumps({
                "id": f"benchmark_{i:03d}",
                "text": body,
                "labels": KG_LABELS,
                "threshold": 0.3,
            }, ensure_ascii=False) + "\n")
    return path
