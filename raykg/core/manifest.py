"""Model manifest loader — the reference's GLiNERManifest re-expressed.

Mirrors /root/reference/Sources/GLiNERSwift/Models/GLiNERManifest.swift:5-89:
a JSON manifest (written by the model conversion tooling) names the five
model-head artifacts (encoder, span_rep, classifier, count_predictor,
count_embed), the tokenizer directory and the shape constraints
(max_seq_len, max_schema_tokens, max_width, hidden_size, max_count,
precision). Artifact paths resolve relative to the manifest file unless
absolute (GLiNERManifest.swift:66-73).

This module is pure (no runtime deps) — the ONNX backend consumes it when
onnxruntime is available; tests exercise it with a fixture manifest either
way.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

_ARTIFACT_KEYS = ("encoder", "span_rep", "classifier", "count_predictor",
                  "count_embed")


@dataclass(frozen=True)
class ModelManifest:
    model_id: str
    max_seq_len: int
    max_schema_tokens: int
    max_width: int
    hidden_size: int
    max_count: int
    precision: str
    counting_layer: str
    artifacts: dict            # key → resolved absolute path
    tokenizer_dir: str | None

    @classmethod
    def load(cls, path: str) -> "ModelManifest":
        with open(path, encoding="utf-8") as f:
            spec = json.load(f)
        base = os.path.dirname(os.path.abspath(path))

        def resolve(p: str) -> str:
            return p if os.path.isabs(p) else os.path.normpath(
                os.path.join(base, p))

        raw = spec["artifacts"]
        missing = [k for k in _ARTIFACT_KEYS if k not in raw]
        if missing:
            raise ValueError(f"manifest missing artifacts: {missing}")
        tok = spec.get("tokenizer_dir")
        return cls(
            model_id=spec["model_id"],
            max_seq_len=int(spec["max_seq_len"]),
            max_schema_tokens=int(spec["max_schema_tokens"]),
            max_width=int(spec["max_width"]),
            hidden_size=int(spec["hidden_size"]),
            max_count=int(spec["max_count"]),
            precision=str(spec.get("precision", "float32")),
            counting_layer=str(spec.get("counting_layer", "")),
            artifacts={k: resolve(raw[k]) for k in _ARTIFACT_KEYS},
            tokenizer_dir=resolve(tok) if tok else None,
        )
