"""Surface-form canonicalization + node identity + alias-merge components.

North-rule operator (not in the reference; SURVEY.md §7.3): canonicalization
is a groupby-aggregate shuffle keyed on the normalized surface form; alias
merging is connected components over near-duplicate surface pairs.

- ``normalize_surface`` reuses the reference's normalization ingredients (M2
  NFKC + whitespace collapse, SentencePieceUnigram.swift:68-73; lowercase,
  GLiNERTokenizer.swift:306 / ChunkProcessor.swift:60) minus the ``▁``
  substitution, plus edge-punctuation + possessive stripping.
- ``node_id`` is a 63-bit deterministic content hash (fits signed int64 for
  Parquet/DuckDB interop) — identity-by-content makes every stage idempotent
  and retry/resume safe.
- ``surface_embedding`` is a seeded char-trigram hash embedding used for (a)
  the entity-linking ANN index and (b) near-dup alias candidate generation.
  It reuses the cosine semantics of the reference similarity scorer
  (SimilarityScorer.swift:77-110: cosine with zero-guard).
- ``UnionFind`` — driver-side connected components for the alias graph; the
  distributed fallback (iterative min-label propagation via groupby) lives in
  raykg.stages.canonicalize.
"""

from __future__ import annotations

import re
import unicodedata
from hashlib import blake2b

import numpy as np

_RE_WS = re.compile(r"\s+")
_EDGE_PUNCT = ".,;:!?\"'()[]{}<>«»“”‘’"


_CORP_SUFFIXES = {"inc", "incorporated", "corp", "corporation", "ltd",
                  "limited", "llc", "co", "gmbh", "plc", "sa", "ag"}


_EDGE_STRIP = _EDGE_PUNCT + " \t\n\r\f\v"


def _normalize_pass(t: str) -> str:
    """One round of edge cleanup: edge punct+ws strip, possessive pop,
    corporate-designator pop (never strips the only token)."""
    t = t.strip(_EDGE_STRIP)
    # both apostrophe forms: web text overwhelmingly uses the curly U+2019
    # ("McDonald’s"), and NFKC does NOT fold it to ASCII — without this the
    # two spellings of one entity land on different node_ids
    if t.endswith("'s") or t.endswith("’s"):
        t = t[:-2].strip(_EDGE_STRIP)
    toks = t.split(" ")
    while len(toks) > 1 and toks[-1].strip(_EDGE_STRIP) in _CORP_SUFFIXES:
        toks.pop()
    return " ".join(toks)


def normalize_surface(s: str) -> str:
    t = unicodedata.normalize("NFKC", s).casefold()
    t = _RE_WS.sub(" ", t)
    # Run the edge-cleanup pass to a FIXPOINT: a single strip(punct).strip()
    # is not idempotent when punctuation and whitespace alternate at the edge
    # ("0: :" → "0:" → "0"), and the possessive / corp-suffix pops can expose
    # fresh edge punctuation. A stored canonical surface must be in normal
    # form or two raw surfaces of the same entity land on different node_ids.
    # Each pass strictly shortens the string, so this terminates in O(|s|).
    prev = None
    while t != prev:
        prev = t
        t = _normalize_pass(t)
    return t


def node_id(canonical: str) -> int:
    """63-bit stable id of a canonical surface (signed-int64-safe)."""
    return int.from_bytes(blake2b(canonical.encode("utf-8"), digest_size=8).digest(),
                          "big") & 0x7FFF_FFFF_FFFF_FFFF


_SURFACE_MEMO_CAP = 200_000
_surface_memo: dict[str, tuple[str, int]] = {}


def surface_key(s: str) -> tuple[str, int]:
    """Memoized (normalize_surface(s), node_id(·)) — surfaces follow a Zipf
    law, so the per-worker cache hit rate is near 1 in the triple→node and
    canonicalization combiners. Bounded: cleared when it hits the cap (a
    cache reset only costs recomputation, never correctness)."""
    got = _surface_memo.get(s)
    if got is None:
        if len(_surface_memo) >= _SURFACE_MEMO_CAP:
            _surface_memo.clear()
        norm = normalize_surface(s)
        got = (norm, node_id(norm))
        _surface_memo[s] = got
    return got


_EMB_DIM = 64


def _tri_vec(tri: bytes, seed: int, dim: int = _EMB_DIM) -> np.ndarray:
    h = int.from_bytes(blake2b(tri, digest_size=8,
                               salt=b"emb%d" % seed).digest(), "big")
    rng = np.random.default_rng(h)
    # generate exactly `dim` values: a fixed 64-wide draw sliced to dim
    # made every dim > 64 crash at the first embed (the first `dim` draws
    # of the same seeded generator are a prefix, so dim ≤ 64 is unchanged)
    return rng.standard_normal(dim)


class SurfaceEmbedder:
    """Char-trigram hash embedder with a per-instance trigram cache.

    Stateful → build once per actor (__init__), call per batch."""

    def __init__(self, seed: int = 42, dim: int = _EMB_DIM) -> None:
        self.seed = seed
        self.dim = dim
        self._cache: dict[bytes, np.ndarray] = {}

    def embed(self, surface: str) -> np.ndarray:
        s = ("^" + normalize_surface(surface) + "$").encode("utf-8")
        acc = np.zeros(self.dim)
        for i in range(max(1, len(s) - 2)):
            tri = s[i:i + 3]
            v = self._cache.get(tri)
            if v is None:
                v = _tri_vec(tri, self.seed, self.dim)
                self._cache[tri] = v
            acc += v
        n = np.linalg.norm(acc)
        return acc / n if n > 1e-9 else acc

    def embed_many(self, surfaces: list[str]) -> np.ndarray:
        out = np.empty((len(surfaces), self.dim))
        for i, s in enumerate(surfaces):
            out[i] = self.embed(s)
        return out


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    """Cosine with zero-guard (SimilarityScorer.swift:77-110)."""
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na < 1e-12 or nb < 1e-12:
        return 0.0
    return float(a @ b / (na * nb))


class UnionFind:
    """Path-halving union-find keyed by arbitrary hashables; deterministic
    root = the MINIMUM member under Python ordering, resolved at finalize."""

    def __init__(self) -> None:
        self.parent: dict = {}

    def find(self, x):
        p = self.parent
        if x not in p:
            p[x] = x
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:          # path compression
            p[x], x = root, p[x]
        return root

    def union(self, a, b) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic orientation: smaller value becomes the root
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra

    def components(self) -> dict:
        """member → canonical (minimum) member of its component."""
        roots: dict = {}
        for x in list(self.parent):
            r = self.find(x)
            cur = roots.get(r)
            if cur is None or x < cur:
                roots[r] = x
        return {x: roots[self.find(x)] for x in self.parent}
