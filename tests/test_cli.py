"""CLI surface tests (no Ray session needed for the oracle path)."""

from __future__ import annotations

import json
import subprocess
import sys


def test_cli_extract_single_text():
    out = subprocess.run(
        [sys.executable, "-m", "raykg", "extract",
         "--text", "Amelia Reed works at Helios Dynamics in Seattle."],
        capture_output=True, text=True, check=True, cwd="/root/repo").stdout
    res = json.loads(out)
    surfaces = {m["text"] for m in res["mentions"]}
    assert "Amelia Reed" in surfaces and "Helios Dynamics" in surfaces
    assert any(t["pred"] == "works_at" for t in res["triples"])


def test_cli_extract_custom_labels_and_threshold():
    out = subprocess.run(
        [sys.executable, "-m", "raykg", "extract", "--text",
         "Plain lowercase words only here.", "--labels", "person",
         "--threshold", "0.99"],
        capture_output=True, text=True, check=True, cwd="/root/repo").stdout
    res = json.loads(out)
    assert res["mentions"] == [] and res["triples"] == []


def test_cli_rejects_unknown_command():
    p = subprocess.run([sys.executable, "-m", "raykg", "bogus"],
                       capture_output=True, text=True, cwd="/root/repo")
    assert p.returncode != 0


def test_cli_bench_modes():
    """Reference benchmark harness parity (BenchmarkCLI.swift:451-659):
    latency and throughput modes produce the G2 stats aggregate with the
    reference's fields; per-iteration lines print unless --quiet."""
    out = subprocess.run(
        [sys.executable, "-m", "raykg", "bench", "--quiet",
         "--iterations", "1", "--warmup", "0"],
        capture_output=True, text=True, check=True, cwd="/root/repo").stdout
    st = json.loads(out)
    assert st["mode"] == "latency" and st["fixtures"] == 50
    assert st["samples"] == 50 and st["avg_ms"] > 0
    for key in ("median_ms", "p95_ms", "chars_per_sec", "requests_per_sec",
                "entities_extracted", "words_analyzed"):
        assert key in st

    out2 = subprocess.run(
        [sys.executable, "-m", "raykg", "bench", "--mode", "throughput",
         "--quiet", "--iterations", "1", "--warmup", "0",
         "--batch-size", "16", "--concurrency", "4"],
        capture_output=True, text=True, check=True, cwd="/root/repo").stdout
    st2 = json.loads(out2)
    assert st2["mode"] == "throughput"
    assert st2["batch_size"] == 16 and st2["concurrency"] == 4
    assert st2["batch_avg_ms"] > 0
