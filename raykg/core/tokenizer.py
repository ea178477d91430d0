"""Subword tokenization + GLiNER2-style schema encoding (operators M2–M7).

Semantics anchored to the reference:

- **Normalization (M2)**: trim → NFKC → collapse ``[\\s\\u3000\\ufeff]+`` to a
  single space → ensure a leading space → replace ``' '`` with ``'▁'``
  (/root/reference/Sources/GLiNERSwift/Tokenization/SentencePieceUnigram.swift:68-73,176-196).
- **Unigram Viterbi (M3)**: a lattice of all dictionary substrings with
  per-character fallback and a max-sum-of-scores path
  (SentencePieceUnigram.swift:140-162,219-280). The reference loads an HF
  vocab file; the repo ships no weights (they are generated locally,
  Sources/GLiNERSwift/Resources/README.md), so this engine uses a
  **deterministic synthetic vocab**: membership and score of a piece are pure
  hash functions of the piece bytes (seeded). The lattice algorithm itself is
  the real unigram Viterbi.
- **Schema encode (M6)**: token stream
  ``[CLS] [P] entities ( [E] label₁ [E] label₂ … ) [SEP_TEXT] words… [SEP]``
  with lowercased text words, per-label prompt subword ranges, first-subword
  index per text word, and char start/end maps
  (/root/reference/Sources/GLiNERSwift/Tokenization/GLiNERTokenizer.swift:269-421;
  schema tokens at :286-293; text words lowercased at :306).
- **Span plan (M7)**: spans ``(start, start+width)`` for width ``0..W-1``
  where the end word exists (GLiNERTokenizer.swift:470-491).

Everything here is pure and deterministic; per-word tokenization results are
memoized by the caller (actor-level cache, mirroring the reference's tokenizer
cache, GLiNERTokenizer.swift:5-6,442-463).
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass
from hashlib import blake2b

import numpy as np

from .vocab import UnigramVocab
from .wordsplit import split_words

# -- special token ids (synthetic vocab reserves 0..31) ----------------------
PAD_ID, CLS_ID, SEP_ID, UNK_ID = 0, 1, 2, 3
P_ID, E_ID, C_ID, R_ID, L_ID, SEP_TEXT_ID = 4, 5, 6, 7, 8, 9
_SPECIAL_BASE = 32
VOCAB_SIZE = 65536

_RE_WS = re.compile(r"[\s　﻿]+")
_MAX_PIECE_LEN = 6


def normalize(text: str) -> str:
    """M2: trim → NFKC → collapse whitespace → leading space → '▁'."""
    t = text.strip()
    t = unicodedata.normalize("NFKC", t)
    t = _RE_WS.sub(" ", t)
    if t and not t.startswith(" "):
        t = " " + t
    return t.replace(" ", "▁")


def _h64(data: bytes, salt: bytes = b"") -> int:
    return int.from_bytes(blake2b(data, digest_size=8, salt=salt.ljust(8, b"\0")[:8]).digest(),
                          "big")


def _piece_score(piece: str, seed: int) -> float | None:
    """Synthetic unigram vocab: membership + log-prob score, pure hash fns.

    Single characters are always in-vocab (the per-char fallback the real
    unigram model guarantees); longer pieces are in-vocab with ~45%
    probability. Scores favor longer pieces so Viterbi prefers merges, like a
    trained unigram model does.
    """
    b = piece.encode("utf-8")
    if len(piece) == 1:
        return -8.0 + (_h64(b, b"sc%d" % seed) % 1000) / 1000.0  # [-8, -7)
    if _h64(b, b"mem%d" % seed) % 100 >= 45:
        return None
    jitter = (_h64(b, b"sc%d" % seed) % 1000) / 1000.0 * 2.0
    return -(7.0 - 1.1 * len(piece)) - jitter


def piece_id(piece: str, seed: int) -> int:
    return _SPECIAL_BASE + _h64(piece.encode("utf-8"), b"id%d" % seed) % (VOCAB_SIZE - _SPECIAL_BASE)


def viterbi_tokenize(word: str, seed: int) -> list[int]:
    """M3: max-sum-of-scores segmentation of ``normalize(word)``.

    Returns subword ids. Empty input → [UNK]."""
    s = normalize(word)
    n = len(s)
    if n == 0:
        return [UNK_ID]
    best = np.full(n + 1, -np.inf)
    best[0] = 0.0
    back = np.zeros(n + 1, dtype=np.int64)
    for end in range(1, n + 1):
        lo = max(0, end - _MAX_PIECE_LEN)
        for start in range(lo, end):
            if best[start] == -np.inf:
                continue
            sc = _piece_score(s[start:end], seed)
            if sc is None:
                continue
            cand = best[start] + sc
            if cand > best[end]:
                best[end] = cand
                back[end] = start
    # backtrack
    pieces: list[str] = []
    i = n
    while i > 0:
        j = int(back[i])
        pieces.append(s[j:i])
        i = j
    pieces.reverse()
    return [piece_id(p, seed) for p in pieces]


@dataclass
class SpecialIds:
    """Effective ids of every structural/special token the encoders emit.

    With the synthetic vocab these are the reserved constants (0..31); with a
    REAL tokenizer.json they are resolved from the vocabulary itself —
    [CLS]/[SEP]/[PAD]/[UNK] from the required pieces, the GLiNER2 schema
    markers ([P]/[E]/[C]/[R]/[L]/[SEP_TEXT]) from added_tokens (the
    reference's resource layout carries them there: [P]=128003, [E]=128005 …,
    Sources/GLiNERSwift/Resources/tokenizer/added_tokens.json), and the
    legacy <<ENT>>/<<SEP>> markers from manifest-driven ``register_special``
    (GLiNERTokenizer.swift:458-460). A marker absent from a real vocab is
    ``None`` — using it raises at encode time, because silently emitting a
    synthetic constant would collide with real content-piece ids (ADVICE r2).
    """

    cls: int
    sep: int
    pad: int
    unk: int
    p: int | None
    e: int | None
    c: int | None
    r: int | None
    l: int | None
    sep_text: int | None
    ent: int | None
    sept: int | None

    def require(self, name: str) -> int:
        got = getattr(self, name)
        if got is None:
            raise ValueError(
                f"special token {name!r} is not in the loaded vocabulary — "
                "add it to added_tokens.json or register it via "
                "WordTokenizer.register_special before encoding")
        return got


# legacy GLiNER1 markers in the synthetic reserved range (real vocabs
# register them from manifest metadata, GLiNERTokenizer.swift:458-460)
ENT_ID, SEPT_ID = 30, 31

_SYNTHETIC_SPECIALS = SpecialIds(
    cls=CLS_ID, sep=SEP_ID, pad=PAD_ID, unk=UNK_ID, p=P_ID, e=E_ID, c=C_ID,
    r=R_ID, l=L_ID, sep_text=SEP_TEXT_ID, ent=ENT_ID, sept=SEPT_ID)


class WordTokenizer:
    """Per-word memoizing tokenizer (actor-level cache, A10 analogue).

    Two vocab backends behind one facade:
    - ``vocab_dir`` set and a ``tokenizer.json`` present → the REAL HF
      unigram vocab (raykg.core.vocab.UnigramVocab, reference-exact lattice
      semantics, per-directory parse cache);
    - otherwise the deterministic synthetic vocab (``viterbi_tokenize``) —
      the sandbox ships no model weights (reference
      Sources/GLiNERSwift/Resources/README.md), so tests/benches stay
      self-contained while real deployments drop in their model directory.

    ``special_tokens`` (token → id) registers extra markers on a real vocab
    at construction — the manifest path for <<ENT>>/<<SEP>>."""

    def __init__(self, seed: int, vocab_dir: str | None = None,
                 special_tokens: dict[str, int] | None = None) -> None:
        self.seed = seed
        self.vocab = UnigramVocab.maybe_load(vocab_dir)
        self._cache: dict[str, list[int]] = {}
        if self.vocab is not None and special_tokens:
            for token, tid in special_tokens.items():
                self.vocab.register_special(token, tid)
        self.sp = self._resolve_specials()

    def _resolve_specials(self) -> SpecialIds:
        v = self.vocab
        if v is None:
            return _SYNTHETIC_SPECIALS
        return SpecialIds(
            cls=v.cls_id, sep=v.sep_id, pad=v.pad_id, unk=v.unk_id,
            p=v.token_id("[P]"), e=v.token_id("[E]"), c=v.token_id("[C]"),
            r=v.token_id("[R]"), l=v.token_id("[L]"),
            sep_text=v.token_id("[SEP_TEXT]"),
            ent=v.token_id("<<ENT>>"), sept=v.token_id("<<SEP>>"))

    def register_special(self, token: str, token_id: int) -> None:
        """Register a marker on the REAL vocab and re-resolve (no-op for the
        synthetic vocab, whose reserved range already carries every marker)."""
        if self.vocab is not None:
            self.vocab.register_special(token, token_id)
            self.sp = self._resolve_specials()

    def ids(self, word: str) -> list[int]:
        got = self._cache.get(word)
        if got is None:
            if self.vocab is not None:
                got, _ = self.vocab.tokenize_normalized(normalize(word))
                if not got:
                    got = [self.vocab.unk_id]
            else:
                got = viterbi_tokenize(word, self.seed)
            self._cache[word] = got
        return got


@dataclass
class SchemaEncoding:
    """Mirror of GLiNER2SchemaEncoding (GLiNER2SchemaEncoding.swift:4-47),
    trimmed to the fields the surrogate pipeline consumes."""

    input_ids: np.ndarray            # (seq,) int32
    # per-label prompt subword ranges [start, end) into input_ids
    prompt_ranges: list[tuple[int, int]]
    prompt_kinds: list[str]          # 'E' entity / 'C' classification
    entity_labels: list[str]
    # first-subword index per text word (A7: word embedding = first subword,
    # GLiNER2SchemaProjector.swift:57-63)
    word_first_subword: np.ndarray   # (n_words,) int64
    words: list[str]                 # ORIGINAL surfaces (pre-lowercase)
    word_starts: np.ndarray          # (n_words,) char start per word
    word_ends: np.ndarray            # (n_words,) char end (exclusive)
    # span plan (M7)
    span_starts: np.ndarray          # (n_spans,) word index
    span_widths: np.ndarray          # (n_spans,) width 0..W-1  (end = start+width)
    # index of the first text subword (= position right after [SEP_TEXT]);
    # everything before it is the schema PREFIX, identical for every doc
    # sharing a label set → its hidden states/prompt embeddings are cached
    # per label set (SURVEY.md §2.2 M6 note)
    text_start: int = 0


def _literal_ids(tok: WordTokenizer, text: str) -> list[int]:
    return [i for w, _, _ in split_words(text) for i in tok.ids(w)]


def encode_schema(text: str, labels: list[str], tok: WordTokenizer,
                  max_span_width: int, kinds: list[str] | None = None) -> SchemaEncoding:
    """M6 + M7. ``kinds`` defaults to 'E' for every label; classification
    passes 'C' (labels arrive pre-prefixed ``"[C] <label>"`` in the reference,
    GLiNERModel.swift:218 — here the kind marker token is emitted directly)."""
    kinds = kinds or ["E"] * len(labels)
    sp = tok.sp          # vocab-resolved ids — real vocabs use the model's
    ids: list[int] = [sp.cls, sp.require("p")]
    ids.extend(_literal_ids(tok, "entities"))
    ids.extend(tok.ids("("))
    prompt_ranges: list[tuple[int, int]] = []
    kind_attr = {"E": "e", "C": "c", "R": "r", "L": "l"}
    for label, kind in zip(labels, kinds):
        ids.append(sp.require(kind_attr[kind]))
        start = len(ids)
        ids.extend(_literal_ids(tok, label.lower()))
        prompt_ranges.append((start, len(ids)))
    ids.extend(tok.ids(")"))
    ids.append(sp.require("sep_text"))
    text_start = len(ids)

    word_tuples = split_words(text)
    words = [w for w, _, _ in word_tuples]
    starts = np.fromiter((s for _, s, _ in word_tuples), dtype=np.int64, count=len(word_tuples))
    ends = np.fromiter((e for _, _, e in word_tuples), dtype=np.int64, count=len(word_tuples))
    first_sub = np.empty(len(words), dtype=np.int64)
    for i, w in enumerate(words):
        first_sub[i] = len(ids)
        ids.extend(tok.ids(w.lower()))   # text words lowercased (GLiNERTokenizer.swift:306)
    ids.append(sp.sep)

    ss, ww = _span_plan(len(words), max_span_width)
    return SchemaEncoding(
        input_ids=np.asarray(ids, dtype=np.int32),
        prompt_ranges=prompt_ranges,
        prompt_kinds=list(kinds),
        entity_labels=list(labels),
        word_first_subword=first_sub,
        words=words,
        word_starts=starts,
        word_ends=ends,
        span_starts=ss,
        span_widths=ww,
        text_start=text_start,
    )


_span_plan_cache: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _span_plan(n_words: int, max_span_width: int) -> tuple[np.ndarray, np.ndarray]:
    """M7 span plan, memoized by (word count, width) — it depends on nothing
    else, and word counts repeat constantly across documents."""
    key = (n_words, max_span_width)
    got = _span_plan_cache.get(key)
    if got is None:
        w_arr = np.arange(n_words, dtype=np.int64)
        widths = np.arange(max_span_width, dtype=np.int64)
        ss = np.repeat(w_arr, max_span_width)
        ww = np.tile(widths, n_words)
        valid = ss + ww < n_words
        got = (ss[valid], ww[valid])
        if len(_span_plan_cache) < 4096:
            _span_plan_cache[key] = got
    return got
