"""Pipeline configuration + task Schema.

Semantics anchored to the reference:
- defaults mirror ``Sources/GLiNERSwift/Models/Configuration.swift:45-68``
  (threshold 0.3, maxSequenceLength 384, strideLength 192, maxSpanLength 8;
  the README advertises different numbers — code wins, SURVEY.md §2.9).
- ``Schema`` mirrors the fluent multi-task builder of
  ``Sources/GLiNERSwift/API/Schema.swift:4-251``: entity specs with dtype /
  per-label threshold, classification tasks, structure fields with choices /
  description / regex validators.

These are plain-Python config objects broadcast to workers via actor
constructor args — configuration, not data (SURVEY.md §1.3).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace
from typing import Any


@dataclass(frozen=True)
class PipelineConfig:
    """Engine knobs. Model-shape fields mirror Configuration.swift:45-68."""

    threshold: float = 0.3           # Configuration.swift: default confidence threshold
    max_seq_len: int = 384           # maxSequenceLength
    stride: int = 192                # strideLength
    max_span_width: int = 8          # maxSpanLength (span width in words)
    hidden: int = 64                 # surrogate hidden size (reference: 512)
    nms_threshold: float = 0.5       # legacy IoU path only (D5); not on active path
    max_words: int = 248             # chunking trigger: spanScorer.maxWordCount - 8
                                     # (GLiNERModel.swift:322-343)
    max_chars: int = 3072            # chunker maxCharacters = max(maxSeq*8, 2048)
    overlap_chars: int = 768         # chunker overlap = max(stride*4, 256)
    max_count: int = 8               # count-predictor clamp (manifest max_count)
    seed: int = 42                   # surrogate weight seed — THE determinism root
    vocab_dir: str | None = None     # model directory holding tokenizer.json →
                                     # real HF unigram vocab; None = synthetic
                                     # fallback (no weights ship in-sandbox)

    # Ray execution knobs (scale tuning; not semantics)
    scorer_batch_size: int = 32      # docs per scorer batch (~50-100ms of
                                     # work: long-doc stragglers in the last
                                     # wave of a stage dominate tail latency
                                     # with bigger batches)
    scorer_concurrency: int = 30     # FIXED actor-pool size, capped at
                                     # CPUs-2 (autoscaling ramp measured
                                     # 2.8× slower; pool==CPUs wedges the
                                     # streaming executor)
    linker_batch_size: int = 4096
    linker_concurrency: int = 4
    shard_overlap: int = 2           # extraction shards in flight at once —
                                     # hides the ~3s/shard fixed cost (pool
                                     # spin-up, dedup pre-pass, write drain)
                                     # behind the neighbour's compute; each
                                     # shard's pool is sized to its share

    def with_threshold(self, threshold: float | None) -> "PipelineConfig":
        if threshold is None:
            return self
        return replace(self, threshold=float(threshold))


@dataclass
class Validator:
    """Regex validator: full / partial match, optional exclusion.

    Mirrors Schema.swift:265-300 — `full` requires the match to span the whole
    string; `exclude` inverts; matching is case-insensitive.
    """

    pattern: str
    full: bool = False
    exclude: bool = False

    def accepts(self, value: str) -> bool:
        rx = re.compile(self.pattern, re.IGNORECASE)
        if self.full:
            ok = rx.fullmatch(value) is not None
        else:
            ok = rx.search(value) is not None
        return (not ok) if self.exclude else ok


@dataclass
class EntitySpec:
    label: str
    description: str = ""
    dtype: str = "list"              # "str" → first match, "list" → all (GLiNER2.swift:107-118)
    threshold: float | None = None   # per-label threshold (GLiNER2.swift:97-103)


@dataclass
class ClassificationSpec:
    task: str
    labels: list[str]
    multi_label: bool = False
    cls_threshold: float = 0.5


@dataclass
class StructureField:
    name: str
    dtype: str = "str"
    choices: list[str] | None = None
    description: str | None = None
    threshold: float | None = None
    validators: list[Validator] = field(default_factory=list)


@dataclass
class StructureSpec:
    name: str
    fields: list[StructureField] = field(default_factory=list)


class Schema:
    """Fluent multi-task spec (entities / classification / structures).

    Port of the builder semantics of Schema.swift:24-251; field and entity
    insertion order is preserved (the reference records ordering metadata).

    >>> s = (Schema().entities(["person", "organization"], threshold=0.5)
    ...              .classification("topic", ["tech", "sports"])
    ...              .structure("contact").field("email", validators=[
    ...                  Validator(r"[^@]+@[^@]+", full=True)]).done())
    """

    def __init__(self) -> None:
        self.entity_specs: list[EntitySpec] = []
        self.classifications: list[ClassificationSpec] = []
        self.structures: list[StructureSpec] = []

    # -- entities --------------------------------------------------------
    def entities(
        self,
        labels: list[str] | dict[str, str],
        dtype: str = "list",
        threshold: float | None = None,
    ) -> "Schema":
        if isinstance(labels, dict):
            items = [(k, v) for k, v in labels.items()]
        else:
            items = [(l, "") for l in labels]
        seen = {e.label for e in self.entity_specs}
        for label, desc in items:
            if label in seen:               # labels deduped (BenchmarkCLI.swift:345)
                continue
            seen.add(label)
            self.entity_specs.append(
                EntitySpec(label=label, description=desc, dtype=dtype, threshold=threshold)
            )
        return self

    def entity(self, label: str, description: str = "", dtype: str = "list",
               threshold: float | None = None) -> "Schema":
        return self.entities({label: description}, dtype=dtype, threshold=threshold)

    # -- classification --------------------------------------------------
    def classification(self, task: str, labels: list[str], multi_label: bool = False,
                       cls_threshold: float = 0.5) -> "Schema":
        self.classifications.append(
            ClassificationSpec(task, list(dict.fromkeys(labels)), multi_label, cls_threshold)
        )
        return self

    # -- structures ------------------------------------------------------
    def structure(self, name: str) -> "_StructureBuilder":
        spec = StructureSpec(name)
        self.structures.append(spec)
        return _StructureBuilder(self, spec)

    # -- build -----------------------------------------------------------
    @property
    def entity_labels(self) -> list[str]:
        return [e.label for e in self.entity_specs]

    def entity_threshold(self, label: str, default: float) -> float:
        for e in self.entity_specs:
            if e.label == label and e.threshold is not None:
                return e.threshold
        return default

    def build(self) -> dict[str, Any]:
        """Nested-dict form, mirroring Schema.swift build() output shape."""
        return {
            "entities": [
                {"entity": e.label, "description": e.description} for e in self.entity_specs
            ],
            "classifications": [
                {"task": c.task, "labels": c.labels, "multi_label": c.multi_label,
                 "cls_threshold": c.cls_threshold}
                for c in self.classifications
            ],
            "json_structures": [
                {s.name: {f.name: {"dtype": f.dtype,
                                   **({"choices": f.choices} if f.choices else {}),
                                   **({"description": f.description} if f.description else {})}
                          for f in s.fields}}
                for s in self.structures
            ],
        }


class _StructureBuilder:
    def __init__(self, schema: Schema, spec: StructureSpec) -> None:
        self._schema = schema
        self._spec = spec

    def field(self, name: str, dtype: str = "str", choices: list[str] | None = None,
              description: str | None = None, threshold: float | None = None,
              validators: list[Validator] | None = None) -> "_StructureBuilder":
        self._spec.fields.append(
            StructureField(name, dtype, choices, description, threshold, validators or [])
        )
        return self

    def done(self) -> Schema:
        return self._schema


DEFAULT_CONFIG = PipelineConfig()

# Default KG entity label set for the flagship pipeline (the synthetic corpus
# plants these entity kinds; labels are zero-shot strings, not an enum).
KG_LABELS = ["person", "organization", "location", "product", "publication"]
