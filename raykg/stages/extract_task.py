"""Distributed multi-task Schema extraction (the GLiNER2.extract surface).

The reference's flagship API is ``GLiNER2.extract(text, schema)`` —
entities + classifications + structured records in one call
(/root/reference/Sources/GLiNERSwift/API/GLiNER2.swift:80-161). This stage
hosts that exact per-document semantics (via raykg.oracle.Oracle, the shared
implementation) on an actor pool, one ``Schema`` broadcast per pool via
constructor args (config, not data — SURVEY.md §1.3).

Output is one row per document with the ExtractionResult flattened to
Arrow-friendly columns:
  - entities: JSON string of {label: str-or-list} (dtype projection applied)
  - classifications: JSON of {task: [{label, score}]}
  - structures: JSON of {name: {field: value}}
JSON keeps the nested, schema-dependent shape without exploding the Arrow
schema per task spec; downstream consumers parse or explode as needed.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..config import PipelineConfig, Schema
from ..oracle import Oracle


class SchemaExtractor:
    """Actor-pool UDF: docs batch → multitask extraction rows."""

    def __init__(self, schema: Schema, config: PipelineConfig | None = None,
                 threshold: float | None = None) -> None:
        self.schema = schema
        self.engine = Oracle(config)          # model state once per actor
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ents, clss, strs = [], [], []
        for text in texts:
            res = self.engine.extract(text, self.schema, self.threshold)
            ents.append(json.dumps(res["entities"], sort_keys=True))
            clss.append(json.dumps(res["classifications"], sort_keys=True))
            strs.append(json.dumps(res["structures"], sort_keys=True))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "url": batch.column("url"),
            "entities": pa.array(ents, pa.string()),
            "classifications": pa.array(clss, pa.string()),
            "structures": pa.array(strs, pa.string()),
        })


def schema_extract(docs_ds, schema: Schema, config: PipelineConfig | None = None,
                   threshold: float | None = None, concurrency: int = 8,
                   batch_size: int = 64):
    return docs_ds.map_batches(
        SchemaExtractor,
        fn_constructor_kwargs={"schema": schema, "config": config,
                               "threshold": threshold},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)
