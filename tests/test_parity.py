"""Golden-fixture parity (the reference's test methodology, SURVEY.md §5):
frozen expected outputs in tests/fixtures/golden.json; the oracle AND the
distributed stage must reproduce them exactly (token ids tol 0, scores tol
0.01 — the reference's tolerances, TestFixtures.swift:4-101)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

from raykg.core.tokenizer import encode_schema
from raykg.oracle import Oracle

GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures", "golden.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def oracle():
    return Oracle()


def test_tokenizer_golden(golden, oracle):
    for case in golden["test_cases"]:
        enc = encode_schema(case["text"], case["labels"],
                            oracle.backend.tokenizer, oracle.config.max_span_width)
        assert [int(x) for x in enc.input_ids] == \
            case["tokenizer_output"]["input_ids"], case["id"]   # tol 0
        assert len(enc.words) == case["tokenizer_output"]["n_words"]
        assert [list(r) for r in enc.prompt_ranges] == \
            case["tokenizer_output"]["prompt_ranges"]


def test_entities_golden_oracle(golden, oracle):
    tol = golden["metadata"]["tolerance"]["entity_scores"]
    for case in golden["test_cases"]:
        got = oracle.extract_mentions(case["text"], case["labels"],
                                      case["threshold"])
        exp = case["entities"]
        assert len(got) == len(exp), case["id"]
        for g, e in zip(got, exp):
            assert (g.text, g.label, g.start, g.end) == \
                (e["text"], e["label"], e["start"], e["end"]), case["id"]
            assert abs(g.score - e["score"]) <= tol


def test_entities_golden_distributed(golden, ray_session):
    """The actor-pool stage reproduces the same golden outputs."""
    from raykg.stages.mention import MentionExtractor

    for case in golden["test_cases"]:
        ex = MentionExtractor(labels=case["labels"], threshold=case["threshold"])
        batch = pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "url": pa.array(["u"], pa.string()),
            "lang": pa.array(["en"], pa.string()),
            "n_words": pa.array([0], pa.int32()),
            "text": pa.array([case["text"]], pa.string()),
        })
        out = ex(batch).column("mentions").to_pylist()[0]
        exp = case["entities"]
        assert len(out) == len(exp), case["id"]
        for g, e in zip(out, exp):
            assert (g["text"], g["label"], g["start"], g["end"]) == \
                (e["text"], e["label"], e["start"], e["end"]), case["id"]


def test_simfuncs():
    import numpy as np

    from raykg.core.decode import Mention
    from raykg.core.simfuncs import (cosine_similarity, dot_similarity, iou,
                                     iou_nms, pool_spans, sigmoid, softmax)

    assert abs(sigmoid(0.0) - 0.5) < 1e-12
    s = softmax([1.0, 2.0, 3.0])
    assert abs(s.sum() - 1.0) < 1e-12 and s.argmax() == 2
    assert iou(0, 10, 5, 15) == 5 / 15
    assert iou(0, 5, 5, 10) == 0.0
    assert abs(cosine_similarity([1, 0], [1, 1]) - 2 ** -0.5) < 1e-12
    assert cosine_similarity([0, 0], [1, 1]) == 0.0
    assert dot_similarity([2, 0], [1, 0]) == 1.0   # clamped
    embs = np.arange(12, dtype=float).reshape(4, 3)
    assert (pool_spans(embs, 1, 3, "mean") == embs[1:3].mean(axis=0)).all()
    assert pool_spans(embs, 0, 4, "concat").shape == (9,)
    # legacy IoU-NMS: same-label high-overlap suppressed, cross-label kept
    ms = [Mention("abcdef", "x", 0.9, 0, 6), Mention("abcde", "x", 0.8, 0, 5),
          Mention("abcdef", "y", 0.7, 0, 6), Mention("zz", "x", 0.6, 10, 12)]
    out = iou_nms(ms, 0.5)
    assert {(m.text, m.label) for m in out} == \
        {("abcdef", "x"), ("abcdef", "y"), ("zz", "x")}


def test_schema_extract_stage(ray_session):
    import ray.data as rd

    from raykg.config import Schema
    from raykg.stages.extract_task import schema_extract

    docs = rd.from_items([
        {"doc_id": 1, "url": "u1",
         "text": "Amelia Reed works at Helios Dynamics in Seattle."},
        {"doc_id": 2, "url": "u2", "text": ""},
    ])
    schema = (Schema().entities(["person", "organization"])
                      .classification("topic", ["business", "travel"]))
    out = schema_extract(docs, schema, concurrency=1).to_pandas()
    assert len(out) == 2
    ents = json.loads(out[out["doc_id"] == 1]["entities"].iloc[0])
    assert set(ents.keys()) == {"person", "organization"}
    empty = json.loads(out[out["doc_id"] == 2]["entities"].iloc[0])
    assert empty == {"person": [], "organization": []}
    # distributed result == single-process reference
    o = Oracle()
    ref = o.extract("Amelia Reed works at Helios Dynamics in Seattle.", schema)
    assert ents == json.loads(json.dumps(ref["entities"]))


def test_benchmark_stats_aggregate():
    from raykg.state.metrics import benchmark_stats

    s = benchmark_stats([10.0, 20.0, 30.0, 40.0], total_chars=1000,
                        entities=7)
    # reference semantics: rates over the 100ms latency SUM, not wall clock
    assert s["samples"] == 4 and s["total_requests"] == 4 and s["avg_ms"] == 25.0
    assert s["median_ms"] == 25.0            # linear interp between 20 and 30
    assert s["min_ms"] == 10.0 and s["max_ms"] == 40.0
    assert s["p95_ms"] == 38.5               # 0.95*(n-1)=2.85 → 30+0.85*10
    assert s["chars_per_sec"] == 10000.0 and s["requests_per_sec"] == 40.0
    assert benchmark_stats([])["samples"] == 0


def test_text_file_source(ray_session, tmp_path):
    from raykg.sources.fixtures import load_text_file_samples

    p = tmp_path / "doc.txt"
    p.write_text("word " * 600 + "\r\nlast line")
    ds = load_text_file_samples(str(p))
    rows = ds.to_pandas()
    assert len(rows) >= 2                    # chunked
    assert rows["id"].iloc[0] == "doc_000"
    assert "\r" not in rows["text"].iloc[0]


def test_jsonl_source_roundtrip(ray_session, tmp_path):
    from raykg.sources.fixtures import read_benchmark_jsonl, write_benchmark_jsonl

    p = write_benchmark_jsonl(str(tmp_path / "bench.jsonl"), n=10)
    ds = read_benchmark_jsonl(p)
    rows = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert len(rows) == 10
    assert rows["id"].iloc[0] == "benchmark_000"
    assert list(rows["labels"].iloc[0]) == \
        ["person", "organization", "location", "product", "publication"]
    with pytest.raises(ValueError):
        empty = tmp_path / "empty.jsonl"
        empty.write_text("\n\n")
        read_benchmark_jsonl(str(empty))
