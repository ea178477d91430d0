"""Pattern-based relation extraction → (subj, pred, obj) triples.

NOT present in the reference (SURVEY.md §2.6 — the reference defines the
``[R]`` relation prompt token but never exercises it,
/root/reference/Sources/GLiNERSwift/Tokenization/GLiNER2PromptConfiguration.swift:19-20).
Designed from scratch for the north rule: deterministic, config-driven
dependency-*pattern* extraction (no parser is available in the sandbox):

- sentences are split on ``[.!?]+`` + whitespace, offsets tracked;
- for every ordered pair of mentions (A before B) in the same sentence within
  ``max_gap_chars``, the text BETWEEN them is matched against an ordered
  pattern table; the first matching pattern (honoring optional subject/object
  label constraints) emits ``(A.text, pred, B.text)``;
- triple score = min(subj.score, obj.score); at most one predicate per
  mention pair.

The pattern table is configuration (like the reference's Schema), so users
extend the relation inventory without touching engine code.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .decode import Mention

_RE_SENT = re.compile(r"[.!?]+(?:\s+|$)")


@dataclass(frozen=True)
class RelationPattern:
    pred: str
    regex: str                                   # matched against inter-mention text
    subj_labels: frozenset[str] | None = None    # None = any
    obj_labels: frozenset[str] | None = None

    def compiled(self) -> re.Pattern:
        return re.compile(self.regex, re.IGNORECASE)


def _fs(*labels: str) -> frozenset[str]:
    return frozenset(labels)


# Default inventory, ordered — first match wins. Label constraints are
# expressible per pattern (subj_labels / obj_labels) but the DEFAULT table
# leaves them open: the surrogate scorer's label assignment is hash-noise
# (SURVEY.md §7.4), so constraining on it would only thin the triple stream
# the P/R gate and the graph stages are exercised on. A production deployment
# with real weights would set them (e.g. works_at: person → organization).
DEFAULT_PATTERNS: list[RelationPattern] = [
    RelationPattern("works_at", r"\bwork(?:s|ed|ing)?\s+(?:at|for)\b"),
    RelationPattern("ceo_of", r"\b(?:CEO|chief executive|president|director|head|founder)\s+of\b"),
    RelationPattern("born_in", r"\b(?:was\s+)?born\s+in\b"),
    RelationPattern("founded", r"\bfounded\b"),
    RelationPattern("acquired", r"\bacquir(?:ed|es|ing)\b"),
    RelationPattern("partnered_with", r"\bpartner(?:ed|s|ing|ship)?\s+with\b"),
    RelationPattern("met_with", r"\bmet\s+with\b"),
    RelationPattern("published", r"\bpublish(?:ed|es|ing)\b"),
    RelationPattern("released", r"\b(?:released|launched|announced|unveiled)\b"),
    RelationPattern("visited", r"\bvisit(?:ed|s|ing)\b"),
    RelationPattern("signed_with", r"\bsign(?:ed|s|ing)\b.*\bwith\b"),
    RelationPattern("located_in",
                    r"\b(?:based|headquartered|located|held|opened|hosted)\s+in\b"),
]


@dataclass(frozen=True)
class Triple:
    subj: str
    pred: str
    obj: str
    subj_label: str
    obj_label: str
    score: float
    sent_start: int      # sentence char offset — provenance for lineage


@dataclass
class RelationConfig:
    patterns: list[RelationPattern] = field(default_factory=lambda: list(DEFAULT_PATTERNS))
    max_gap_chars: int = 120

    def compile(self) -> list[tuple[RelationPattern, re.Pattern]]:
        return [(p, p.compiled()) for p in self.patterns]

    def prefilter(self):
        """One combined alternation: a pair whose between-text matches NO
        pattern (the common case in real text) is rejected with a single
        regex scan instead of |patterns| scans.

        User patterns are configuration (this table is extensible), and two
        regex features break inside a joined alternation: numbered
        backreferences (groups renumber, silently rejecting pairs the
        individual pattern matches) and global inline flags like ``(?s)``
        mid-pattern (re.error on Python 3.11+). Such patterns are kept OUT
        of the alternation and scanned individually — correctness first,
        the single-scan fast path for the (default) safe patterns."""
        if not self.patterns:
            # No patterns ⇒ nothing can match; a never-matching stub keeps
            # callers' prefilter.search(...) contract (None would crash).
            class _Never:
                def search(self, s: str):
                    return None
            return _Never()

        unsafe_re = re.compile(r"\\[1-9]|\(\?[aiLmsux]+\)")
        safe = [p for p in self.patterns if not unsafe_re.search(p.regex)]
        unsafe = [p.compiled() for p in self.patterns
                  if unsafe_re.search(p.regex)]
        combined = re.compile(
            "|".join(f"(?:{p.regex})" for p in safe),
            re.IGNORECASE) if safe else None

        if not unsafe:
            return combined

        class _Prefilter:
            def search(self, s: str):
                got = combined.search(s) if combined is not None else None
                if got is not None:
                    return got
                for pat in unsafe:
                    got = pat.search(s)
                    if got is not None:
                        return got
                return None

        return _Prefilter()


def sentence_spans(text: str) -> list[tuple[int, int]]:
    """[(start, end)) sentence ranges covering the text, boundaries at
    ``[.!?]+\\s``. Deterministic; no trailing-empty sentences."""
    spans: list[tuple[int, int]] = []
    pos = 0
    for m in _RE_SENT.finditer(text):
        end = m.end()
        if end > pos:
            spans.append((pos, end))
        pos = end
    if pos < len(text):
        spans.append((pos, len(text)))
    return spans


def extract_triples(text: str, mentions: list[Mention],
                    config: RelationConfig | None = None,
                    compiled: list[tuple[RelationPattern, re.Pattern]] | None = None,
                    prefilter: re.Pattern | None = None) -> list[Triple]:
    """Emit triples from doc-level mentions. ``compiled``/``prefilter`` let
    an actor pass patterns compiled once in ``__init__`` (stateful-stage
    rule)."""
    config = config or RelationConfig()
    if compiled is None:
        compiled = config.compile()
    if prefilter is None:
        prefilter = config.prefilter()
    if len(mentions) < 2:
        return []
    sents = sentence_spans(text)
    out: list[Triple] = []
    ms = sorted(mentions, key=lambda m: (m.start, m.end, m.label))
    si = 0
    for i, a in enumerate(ms):
        while si < len(sents) and a.start >= sents[si][1]:
            si += 1
        if si >= len(sents):
            break
        sent_start, sent_end = sents[si]
        for b in ms[i + 1:]:
            if b.start >= sent_end:
                break
            gap = b.start - a.end
            if gap < 0 or gap > config.max_gap_chars:
                continue
            between = text[a.end:b.start]
            if not prefilter.search(between):
                continue
            for pat, rx in compiled:
                if pat.subj_labels is not None and a.label not in pat.subj_labels:
                    continue
                if pat.obj_labels is not None and b.label not in pat.obj_labels:
                    continue
                if rx.search(between):
                    out.append(Triple(a.text, pat.pred, b.text, a.label, b.label,
                                      min(a.score, b.score), sent_start))
                    break     # one predicate per ordered pair
    return out
