"""Span decoding + chunk merging (operators D2, D4, M9).

- **Greedy span decode (D2)** ports
  /root/reference/Sources/GLiNERSwift/SpanHead/SpanDecoder.swift:12-101:
  sigmoid(logit) ≥ threshold → candidate; sort all candidates score-desc;
  greedily keep a candidate iff it overlaps NO kept span (overlap = word
  interval intersection or identical span — **label-blind**); output order is
  start asc, ties score desc; surface form is sliced from the ORIGINAL text
  via word char ranges. The reference's sort has no tie-break (Swift `sorted`
  is unstable, SURVEY.md §7.5.1) — this engine and its oracle both use the
  total-order key ``(-score, start, width, label_idx)`` so the decode is
  deterministic everywhere.
- **Chunk merge (D4)** ports
  /root/reference/Sources/GLiNERSwift/Inference/ChunkProcessor.swift:14-72:
  flatten per-chunk entities (offsets already chunk-adjusted, M9
  GLiNERModel.swift:480-491) → sort score desc → keep an entity iff no kept
  SAME-LABEL entity has equal lowercased text OR an overlapping char range.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .tokenizer import SchemaEncoding


@dataclass(frozen=True)
class Mention:
    """Mirror of the reference Entity (Entity.swift:4-34); identity is
    (text, label, start, end), score excluded — exactly the reference's
    Equatable/Hashable contract (Entity.swift:28-33)."""

    text: str
    label: str
    score: float
    start: int   # code-point offset into the (chunk or doc) text
    end: int     # exclusive

    def key(self) -> tuple[str, str, int, int]:
        return (self.text, self.label, self.start, self.end)


# single shared definition — five scattered copies meant any numeric
# hardening had to land in five places (see simfuncs)
from .simfuncs import sigmoid  # noqa: E402


def span_candidates(logits: np.ndarray, enc: SchemaEncoding,
                    threshold: float) -> tuple[np.ndarray, np.ndarray,
                                               np.ndarray, np.ndarray]:
    """Pre-NMS candidate set: the exact (span, label) rows ``decode_spans``
    feeds its greedy NMS — sigmoid(logit) ≥ threshold, word-space starts /
    widths, label index, float64 post-sigmoid score. Shared by the decode
    path below and the engine-dump oracle (``__ray_entry__``:
    ``mention_cands.parquet``), so the dumped candidates are the decoder's
    candidates by construction."""
    if logits.size == 0:
        z = np.empty(0, np.int64)
        return z, z, z, np.empty(0, np.float64)
    probs = sigmoid(logits)
    span_idx, label_idx = np.nonzero(probs >= threshold)
    return (enc.span_starts[span_idx].astype(np.int64),
            enc.span_widths[span_idx].astype(np.int64),
            label_idx.astype(np.int64),
            probs[span_idx, label_idx].astype(np.float64))


def decode_spans(logits: np.ndarray, enc: SchemaEncoding, threshold: float) -> list[Mention]:
    """D2. ``logits`` is (n_spans, n_labels) aligned to ``enc.span_starts``."""
    starts, widths, label_idx, scores = span_candidates(logits, enc, threshold)
    if len(starts) == 0:
        return []
    order = np.lexsort((label_idx, widths, starts, -scores))
    kept: list[tuple[int, int, int, float]] = []   # (start, end, label, score)
    # occupancy as an int bitmask over word positions: overlap test is one
    # big-int AND (~100ns), label-blind interval NMS semantics unchanged
    occupied = 0
    starts_l = starts.tolist()
    widths_l = widths.tolist()
    labels_l = label_idx.tolist()
    scores_l = scores.tolist()
    for i in order.tolist():
        s = starts_l[i]; e = s + widths_l[i]
        m = ((1 << (e - s + 1)) - 1) << s
        if not occupied & m:
            kept.append((s, e, labels_l[i], scores_l[i]))
            occupied |= m
    kept.sort(key=lambda t: (t[0], -t[3], t[1], t[2]))   # start asc, score desc
    out: list[Mention] = []
    for s, e, li, sc in kept:
        cs = int(enc.word_starts[s])
        ce = int(enc.word_ends[e])
        # surface form filled by decode_spans_with_text (needs original text)
        out.append(Mention(text="", label=enc.entity_labels[li], score=sc,
                           start=cs, end=ce))
    return out


def decode_spans_with_text(logits: np.ndarray, enc: SchemaEncoding,
                           threshold: float, text: str) -> list[Mention]:
    """D2 with surface-form slicing from the original text
    (SpanDecoder.swift:54-60)."""
    raw = decode_spans(logits, enc, threshold)
    return [Mention(text[m.start:m.end], m.label, m.score, m.start, m.end) for m in raw]


def adjust_offsets(mentions: list[Mention], chunk_start: int) -> list[Mention]:
    """M9: shift chunk-local offsets into doc coordinates
    (GLiNERModel.swift:480-491)."""
    return [Mention(m.text, m.label, m.score, m.start + chunk_start, m.end + chunk_start)
            for m in mentions]


def merge_chunks(mentions: list[Mention]) -> list[Mention]:
    """D4 (ChunkProcessor.swift:14-72). Offsets must already be doc-level."""
    order = sorted(mentions, key=lambda m: (-m.score, m.start, m.end, m.label, m.text))
    kept: list[Mention] = []
    for m in order:
        low = m.text.lower()
        dup = False
        for k in kept:
            if k.label != m.label:
                continue
            if k.text.lower() == low or (m.start < k.end and m.end > k.start):
                dup = True
                break
        if not dup:
            kept.append(m)
    kept.sort(key=lambda m: (m.start, -m.score, m.end, m.label))
    return kept
