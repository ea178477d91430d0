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
