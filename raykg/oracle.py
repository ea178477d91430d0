"""Single-process oracle: the authoritative per-document reference.

Mirrors the reference's top-level extraction lifecycle (SURVEY.md §3):

- ``extract_mentions`` ports ``GLiNERModel.extractEntities``
  (/root/reference/Sources/GLiNERSwift/GLiNERModel.swift:120-156): empty
  labels → []; chunk when word count > max_words (:322-343) via the chunked
  path (:462-478) = chunk → per-chunk extraction → offset adjust → merge;
  otherwise one straight pass encode → score → decode.
- ``extract`` ports ``GLiNER2.extract`` (API/GLiNER2.swift:80-161):
  entities branch with per-label thresholds + dtype projection; per-task
  classification; per-field structure extraction (choices as labels, else
  description/field-name as the single label; regex validators; dtype
  projection — i.e. N more entity passes, :234-299).
- ``extract_page`` is the full KG per-document path: HTML → text (frozen
  extractor) → mentions → triples.

The driver's P/R gate compares the distributed pipeline against THIS module;
both share the identical core functions, so any mismatch localizes to the
distributed plumbing (chunk ordering, offsets, shuffle) — the thing the gate
is meant to check (SURVEY.md §7.4).
"""

from __future__ import annotations

from dataclasses import dataclass

from .config import DEFAULT_CONFIG, PipelineConfig, Schema
from .core.chunk import chunk_text, should_chunk
from .core.decode import (Mention, adjust_offsets, decode_spans_with_text,
                          merge_chunks)
from .core.relations import RelationConfig, Triple, extract_triples
from .core.scorer import SurrogateBackend
from .core.textextract import extract_text
from .core.tokenizer import encode_schema


@dataclass
class PageResult:
    url: str
    text: str
    mentions: list[Mention]
    triples: list[Triple]


class Oracle:
    """Holds one surrogate backend (model state loaded once, like
    GLiNERModel.init:304-328 loads weights once)."""

    def __init__(self, config: PipelineConfig | None = None) -> None:
        self.config = config or DEFAULT_CONFIG
        self.backend = SurrogateBackend(self.config)
        self.relations = RelationConfig()
        self._compiled = self.relations.compile()
        self._prefilter = self.relations.prefilter()

    # -- core NER path ----------------------------------------------------
    def _run_extraction(self, text: str, labels: list[str], threshold: float) -> list[Mention]:
        enc = encode_schema(text, labels, self.backend.tokenizer,
                            self.config.max_span_width)
        logits, enc = self.backend.span_scores(enc, threshold)
        return decode_spans_with_text(logits, enc, threshold, text)

    def extract_mentions(self, text: str, labels: list[str],
                         threshold: float | None = None) -> list[Mention]:
        if not labels or not text:
            return []
        cfg = self.config.with_threshold(threshold)
        if should_chunk(text, cfg.max_words):
            chunks = chunk_text(text, cfg.max_chars, cfg.overlap_chars, cfg.max_words)
            if len(chunks) == 1 and chunks[0].start_offset == 0 \
                    and chunks[0].end_offset == len(text):
                return self._run_extraction(text, labels, cfg.threshold)
            all_mentions: list[Mention] = []
            for ch in chunks:
                ms = self._run_extraction(ch.text, labels, cfg.threshold)
                all_mentions.extend(adjust_offsets(ms, ch.start_offset))
            return merge_chunks(all_mentions)
        return self._run_extraction(text, labels, cfg.threshold)

    # -- multi-task extract (GLiNER2.extract) ------------------------------
    def extract(self, text: str, schema: Schema, threshold: float | None = None) -> dict:
        cfg = self.config.with_threshold(threshold)
        result: dict = {"entities": {}, "classifications": {}, "structures": {}}
        # entities branch (GLiNER2.swift:85-120)
        labels = schema.entity_labels
        if labels:
            mentions = self.extract_mentions(text, labels, cfg.threshold)
            by_label: dict[str, list[Mention]] = {l: [] for l in labels}
            for m in mentions:
                if m.score >= schema.entity_threshold(m.label, cfg.threshold):
                    by_label.setdefault(m.label, []).append(m)
            for spec in schema.entity_specs:
                texts = [m.text for m in by_label.get(spec.label, [])]
                # dtype projection (GLiNER2.swift:107-118)
                result["entities"][spec.label] = (texts[0] if texts else "") \
                    if spec.dtype == "str" else texts
        # classification branch (GLiNER2.swift:123-146)
        for c in schema.classifications:
            preds = self.backend.classify(text, c.labels, c.multi_label, c.cls_threshold)
            result["classifications"][c.task] = [
                {"label": l, "score": s} for l, s in preds]
        # structures branch (GLiNER2.swift:149-161, extractStructure:234-299)
        for s in schema.structures:
            rec: dict = {}
            for f in s.fields:
                if f.choices:
                    ms = self.extract_mentions(text, list(f.choices),
                                               f.threshold or cfg.threshold)
                else:
                    label = f.description or f.name
                    ms = self.extract_mentions(text, [label],
                                               f.threshold or cfg.threshold)
                vals = [m.text for m in ms]
                vals = [v for v in vals if all(vd.accepts(v) for vd in f.validators)]
                rec[f.name] = (vals[0] if vals else "") if f.dtype == "str" else vals
            result["structures"][s.name] = rec
        return result

    def extract_with_triples(self, text: str, labels: list[str],
                             threshold: float | None = None):
        """Plain-text mentions + relation triples — the composition
        extract_page owns, exposed for text-level callers (CLI) so the
        relation-compilation internals stay encapsulated."""
        mentions = self.extract_mentions(text, labels, threshold)
        triples = extract_triples(text, mentions, self.relations,
                                  self._compiled, self._prefilter)
        return mentions, triples

    # -- full per-page KG path --------------------------------------------
    def extract_page(self, url: str, html: bytes, labels: list[str],
                     threshold: float | None = None) -> PageResult:
        text = extract_text(html)
        mentions, triples = self.extract_with_triples(text, labels, threshold)
        return PageResult(url, text, mentions, triples)
