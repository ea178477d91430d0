"""Scalar similarity / pooling functions (SURVEY.md §2.7) + the legacy
IoU-NMS path (D5).

These port the reference's inactive-but-public utility surface so a user of
the reference can call the same operations here:

- sigmoid — SpanDecoder.swift:98-100
- stable softmax (max-subtracted) — GLiNERModel.swift:293-302
- IoU over char ranges — EntityExtractor.swift:68-83
- cosine with zero-guard / dot clamped to [0,1] — SimilarityScorer.swift:77-110
- mean / max / concat(start,end,mean) span pooling — SpanBuilder.swift:84-146
- IoU-NMS (same-label, threshold 0.5 default) — EntityExtractor.swift:17-116
  (NOT on the active decode path — the active path is the label-blind greedy
  NMS in raykg.core.decode; kept for API parity, SURVEY.md §2.4 D5)
"""

from __future__ import annotations

import numpy as np

from .decode import Mention


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-np.asarray(x, dtype=np.float64)))


def softmax(x) -> np.ndarray:
    z = np.asarray(x, dtype=np.float64)
    z = z - z.max()
    e = np.exp(z)
    return e / e.sum()


def iou(a_start: int, a_end: int, b_start: int, b_end: int) -> float:
    """Interval IoU over [start, end) ranges (EntityExtractor.swift:68-83)."""
    inter = max(0, min(a_end, b_end) - max(a_start, b_start))
    if inter == 0:
        return 0.0
    union = (a_end - a_start) + (b_end - b_start) - inter
    return inter / union if union > 0 else 0.0


def cosine_similarity(a, b) -> float:
    """Cosine with zero-vector guard (SimilarityScorer.swift:77-96)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na < 1e-12 or nb < 1e-12:
        return 0.0
    return float(a @ b / (na * nb))


def dot_similarity(a, b) -> float:
    """Dot product clamped to [0, 1] (SimilarityScorer.swift:98-110)."""
    return float(np.clip(np.asarray(a, np.float64) @ np.asarray(b, np.float64),
                         0.0, 1.0))


def pool_spans(token_embs: np.ndarray, start: int, end: int,
               method: str = "mean") -> np.ndarray:
    """Span pooling over token embeddings, end exclusive
    (SpanBuilder.swift:84-146): 'mean', 'max', or 'concat' =
    [start_emb | end_emb | mean_emb]."""
    seg = token_embs[start:end]
    if len(seg) == 0:
        raise ValueError("empty span")
    if method == "mean":
        return seg.mean(axis=0)
    if method == "max":
        return seg.max(axis=0)
    if method == "concat":
        return np.concatenate([seg[0], seg[-1], seg.mean(axis=0)])
    raise ValueError(f"unknown pooling method {method!r}")


def iou_nms(mentions: list[Mention], nms_threshold: float = 0.5) -> list[Mention]:
    """Legacy same-label IoU suppression (EntityExtractor.swift:17-116):
    sort score desc; drop a mention if a kept SAME-LABEL mention overlaps it
    with IoU > threshold. Deterministic total order matches the engine's
    decode tie-break convention."""
    order = sorted(mentions, key=lambda m: (-m.score, m.start, m.end, m.label))
    kept: list[Mention] = []
    for m in order:
        if not any(k.label == m.label and
                   iou(m.start, m.end, k.start, k.end) > nms_threshold
                   for k in kept):
            kept.append(m)
    kept.sort(key=lambda m: (m.start, -m.score, m.end, m.label))
    return kept
