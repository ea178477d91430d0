"""Text analysis over the ``documents`` table: token counting, quality
scoring, language-ID, content fingerprinting.

Regex classes are EXPLICIT ASCII (``[A-Za-z0-9_]``) on both the Python and
the DuckDB side — Python's ``\\w`` is Unicode while RE2's is ASCII, and that
divergence would silently break the value-hash comparison.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pyarrow as pa

from ..sources.tables import read_table

_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]")
_STOP_RE = re.compile(r"\b(?:the|a|of|to|and|in|is)\b", re.ASCII)
# re.ASCII: Python's \b is Unicode-aware by default while DuckDB/RE2's is
# ASCII — without the flag "isé" counts a stopword in SQL but not here
_ALPHA_RE = re.compile(r"[A-Za-z]")
_PUNCT_RE = re.compile(r"[^A-Za-z0-9_\s]")

TOKEN_PATTERN_SQL = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"
STOP_PATTERN_SQL = r"\b(?:the|a|of|to|and|in|is)\b"


def q_doc_stats(sf_dir: str):
    """Per-document token statistics — one vectorized stateless pass."""
    def stats(b: pa.Table) -> pd.DataFrame:
        texts = b.column("text").to_pylist()
        return pd.DataFrame({
            "doc_id": b.column("doc_id").to_pandas(),
            "n_chars": [len(t) for t in texts],
            "n_words": [len(t.split()) for t in texts],
            "n_tokens": [len(_TOKEN_RE.findall(t)) for t in texts],
            "n_alpha": [len(_ALPHA_RE.findall(t)) for t in texts],
            "n_stop": [len(_STOP_RE.findall(t.lower())) for t in texts],
        })

    return read_table(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(stats, batch_format="pyarrow", batch_size=8192) \
        .sort("doc_id")


SQL_DOC_STATS = f"""
SELECT doc_id,
       length(text) AS n_chars,
       CASE WHEN NOT regexp_matches(text, '\\S') THEN 0
            ELSE len(regexp_split_to_array(
                   regexp_replace(text, '^\\s+|\\s+$', '', 'g'),
                   '\\s+')) END AS n_words,
       len(regexp_extract_all(text, '{TOKEN_PATTERN_SQL}')) AS n_tokens,
       length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
       len(regexp_extract_all(lower(text), '{STOP_PATTERN_SQL}')) AS n_stop
FROM documents
ORDER BY doc_id
"""


def q_lang_dist(sf_dir: str):
    """Corpus profile per (lang, source) — combiner + tiny groupby."""
    from ..stages.shuffle import bucketed_named_agg

    def partial(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "lang": b.column("lang").to_pandas(),
            "source": b.column("source").to_pandas(),
            "n_chars": b.column("n_chars").to_pandas(),
        })
        return df.groupby(["lang", "source"], as_index=False).agg(
            n_docs=("n_chars", "size"), total_chars=("n_chars", "sum"))

    partials = read_table(sf_dir, "documents", ["lang", "source", "n_chars"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
    return bucketed_named_agg(partials, ["lang", "source"],
                              {"n_docs": ("n_docs", "sum"),
                               "total_chars": ("total_chars", "sum")}) \
        .sort(["lang", "source"])


SQL_LANG_DIST = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang, source
ORDER BY lang, source
"""


def q_quality(sf_dir: str):
    """Quality features + a boolean gate on integer thresholds. Ratios are
    single IEEE divisions of the same integers on both sides → bit-identical;
    trimmed to 6 decimals via floor(x*1e6+0.5)/1e6, the same IEEE steps in
    both engines (Python round() is half-to-even, DuckDB's is half-away —
    they disagree on exact dyadic ties like 1/128)."""
    import math
    def quality(b: pa.Table) -> pd.DataFrame:
        texts = b.column("text").to_pylist()
        n_tok = [len(_TOKEN_RE.findall(t)) for t in texts]
        n_punct = [len(_PUNCT_RE.findall(t)) for t in texts]
        n_stop = [len(_STOP_RE.findall(t.lower())) for t in texts]
        return pd.DataFrame({
            "doc_id": b.column("doc_id").to_pandas(),
            "n_tokens": n_tok,
            "punct_ratio": [math.floor(p / t * 1e6 + 0.5) / 1e6 if t else 0.0
                            for p, t in zip(n_punct, n_tok)],
            "stop_ratio": [math.floor(s / t * 1e6 + 0.5) / 1e6 if t else 0.0
                           for s, t in zip(n_stop, n_tok)],
            "is_quality": [bool(t >= 20 and s > 0) for t, s in zip(n_tok, n_stop)],
        })

    return read_table(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(quality, batch_format="pyarrow", batch_size=8192) \
        .sort("doc_id")


SQL_QUALITY = f"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{TOKEN_PATTERN_SQL}')) AS n_tokens,
         len(regexp_extract_all(text, '[^A-Za-z0-9_\\s]')) AS n_punct,
         len(regexp_extract_all(lower(text), '{STOP_PATTERN_SQL}')) AS n_stop
  FROM documents)
SELECT doc_id, n_tokens,
       CASE WHEN n_tokens = 0 THEN 0.0
            ELSE floor(n_punct / CAST(n_tokens AS DOUBLE) * 1000000 + 0.5)
                 / 1000000 END AS punct_ratio,
       CASE WHEN n_tokens = 0 THEN 0.0
            ELSE floor(n_stop / CAST(n_tokens AS DOUBLE) * 1000000 + 0.5)
                 / 1000000 END AS stop_ratio,
       (n_tokens >= 20 AND n_stop > 0) AS is_quality
FROM t
ORDER BY doc_id
"""


def q_content_hash(sf_dir: str):
    """Exact content fingerprint (md5) per doc — the dedup primitive."""
    def h(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        return pa.table({
            "doc_id": b.column("doc_id"),
            "h": pa.array([hashlib.md5(t.encode("utf-8")).hexdigest()
                           for t in texts], pa.string()),
        })

    return read_table(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(h, batch_format="pyarrow", batch_size=8192).sort("doc_id")


SQL_CONTENT_HASH = """
SELECT doc_id, md5(text) AS h FROM documents ORDER BY doc_id
"""


# -- language ID (heuristic; no SQL equivalent → rows-only driver check) ----

_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "with", "for", "a"},
    "de": {"der", "die", "das", "und", "ist", "mit", "für", "von", "nicht", "ein"},
    "fr": {"le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"},
    "es": {"el", "la", "los", "y", "es", "en", "para", "que", "una", "de"},
    "zh": set(),       # no-stopword profile: falls through to CJK char test
}
_WORD_RE = re.compile(r"[a-zàâçéèêëîïôûùüÿñæœäöüß]+")


class LangId:
    """Stateful n-gram/stopword language identifier — an actor-pool stage
    (profiles built once per actor). Deterministic ties: lexicographic."""

    def __init__(self) -> None:
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def predict_counts(self, text: str) -> tuple[str, int, int]:
        """(pred_lang, n_stopword_hits_of_winner, n_words) — INTEGER
        evidence, so the DuckDB oracle can reproduce the decision exactly
        (float confidences round differently across engines)."""
        if any("一" <= c <= "鿿" for c in text[:400]):
            return "zh", 0, 0
        words = _WORD_RE.findall(text.lower()[:2000])
        if not words:
            return "und", 0, 0
        counts = {
            lang: sum(1 for w in words if w in prof)
            for lang, prof in self.profiles.items() if prof
        }
        best = max(counts.items(), key=lambda kv: (kv[1], kv[0]))
        if best[1] == 0:
            return "und", 0, len(words)
        return best[0], best[1], len(words)

    def predict(self, text: str) -> tuple[str, float]:
        lang, n_stop, n_words = self.predict_counts(text)
        if lang == "zh":
            return "zh", 1.0
        if n_words == 0 or n_stop == 0:
            return lang, 0.0
        return lang, round(n_stop / n_words, 6)

    def __call__(self, b: pa.Table) -> pa.Table:
        preds = [self.predict_counts(t) for t in b.column("text").to_pylist()]
        return pa.table({
            "doc_id": b.column("doc_id"),
            "lang": b.column("lang"),
            "pred_lang": pa.array([p[0] for p in preds], pa.string()),
            "n_stop": pa.array([p[1] for p in preds], pa.int64()),
            "n_words": pa.array([p[2] for p in preds], pa.int64()),
        })


def q_langid(sf_dir: str):
    return read_table(sf_dir, "documents", ["doc_id", "text", "lang"]) \
        .map_batches(LangId, batch_format="pyarrow", batch_size=4096,
                     concurrency=2).sort("doc_id")


def _sql_stoplist(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in sorted(_LANG_PROFILES[lang])) + "]"


# Winner selection mirrors Python's max over (count, lang): a struct list
# sorted ascending by (n, l) — the LAST element is the maximum, ties going
# to the lexicographically larger language code.
SQL_LANGID = f"""
WITH w AS (
  SELECT doc_id, lang,
         regexp_extract_all(substr(lower(text), 1, 2000),
                            '[a-zàâçéèêëîïôûùüÿñæœäöüß]+') AS words,
         regexp_matches(substr(text, 1, 400), '[\\x{{4e00}}-\\x{{9fff}}]') AS cjk
  FROM documents),
c AS (
  SELECT doc_id, lang, cjk, len(words) AS n_words,
         list_sort([
           {{'n': len(list_filter(words, x -> list_contains({_sql_stoplist('en')}, x))), 'l': 'en'}},
           {{'n': len(list_filter(words, x -> list_contains({_sql_stoplist('de')}, x))), 'l': 'de'}},
           {{'n': len(list_filter(words, x -> list_contains({_sql_stoplist('fr')}, x))), 'l': 'fr'}},
           {{'n': len(list_filter(words, x -> list_contains({_sql_stoplist('es')}, x))), 'l': 'es'}}
         ])[-1] AS best
  FROM w)
SELECT doc_id, lang,
  CASE WHEN cjk THEN 'zh'
       WHEN n_words = 0 OR best.n = 0 THEN 'und'
       ELSE best.l END AS pred_lang,
  CAST(CASE WHEN cjk THEN 0 ELSE best.n END AS BIGINT) AS n_stop,
  CAST(CASE WHEN cjk THEN 0 ELSE n_words END AS BIGINT) AS n_words
FROM c ORDER BY doc_id
"""


# -- rolling-hash fingerprint (winnowing) -----------------------------------

_FP_K = 8          # char k-gram size
_FP_WINDOW = 16    # winnowing window
_FP_BASE = 1_000_003
_FP_MOD = (1 << 61) - 1


def winnow_fingerprints(text: str) -> list[int]:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
    2003 — public algorithm): rolling polynomial hash over char k-grams;
    keep the minimum hash of each sliding window (rightmost on ties), dedup
    consecutive picks. Robust to local edits; the standard copy-detection
    primitive."""
    import numpy as np

    s = text.lower().encode("utf-8")
    n = len(s)
    if n < _FP_K:
        return [int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(),
                               "big") % _FP_MOD] if n else []
    # vectorized rolling hash: h[i] = sum(s[i+j] * BASE^(K-1-j)) mod MOD
    arr = np.frombuffer(s, dtype=np.uint8).astype(object)
    weights = [pow(_FP_BASE, _FP_K - 1 - j, _FP_MOD) for j in range(_FP_K)]
    n_grams = n - _FP_K + 1
    hashes = np.zeros(n_grams, dtype=object)
    for j, w in enumerate(weights):
        hashes += arr[j:j + n_grams] * w
    hashes = np.mod(hashes, _FP_MOD).astype(np.uint64)
    if n_grams <= _FP_WINDOW:
        return [int(hashes.min())]
    # sliding-window minima (rightmost min per window)
    out: list[int] = []
    last = -1
    from collections import deque

    dq: "deque[int]" = deque()
    for i in range(n_grams):
        while dq and hashes[dq[-1]] >= hashes[i]:
            dq.pop()
        dq.append(i)
        start = i - _FP_WINDOW + 1
        if dq[0] < start:
            dq.popleft()
        if start >= 0 and dq[0] != last:
            last = dq[0]
            out.append(int(hashes[last]))
    return out


def q_fingerprint_kgram(sf_dir: str):
    """SQL-checkable fingerprint variant: per-doc MINIMUM md5 over all
    8-char k-grams (a k-gram min-hash — the winnowing family's simplest
    member, chosen because DuckDB can enumerate the same k-grams with
    generate_series and take the same min). ``q_fingerprint`` (full
    winnowing) remains the production operator; this one exists to put the
    fingerprint math under the SQL oracle. Short texts fall back to one
    gram = the whole text, matching the SQL's clamped series."""
    def fp(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id")
        mins = []
        for t in b.column("text").to_pylist():
            grams = range(max(len(t) - 7, 1))
            mins.append(min(hashlib.md5(t[i:i + 8].encode("utf-8")).hexdigest()
                            for i in grams))
        return pa.table({"doc_id": ids,
                         "kgram_min": pa.array(mins, pa.string())})

    return read_table(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(fp, batch_format="pyarrow", batch_size=4096).sort("doc_id")


SQL_FINGERPRINT_KGRAM = """
SELECT doc_id, min(md5(substr(text, i, 8))) AS kgram_min
FROM (SELECT doc_id, text,
             unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i
      FROM documents)
GROUP BY doc_id ORDER BY doc_id
"""


def q_fingerprint(sf_dir: str):
    """Per-doc winnowing fingerprint summary: count + min + an md5 digest of
    the sorted distinct fingerprint set. All three are reproduced by
    ``SQL_FINGERPRINT`` (full winnowing in SQL: the polynomial rolling hash
    expands to an 8-term weighted sum per k-gram, the rightmost-min window
    rule becomes MIN over ``(hash, -index)`` encoded into one HUGEINT, and
    consecutive-pick dedup is a LAG comparison), so the operator is under
    the value-hash oracle, not just a row-count check. Preconditions shared
    with the SQL (all verified on the corpus, which the SQL also guards
    where it can): docs of length ≥ K+WINDOW-1 = 23 chars (corpus minimum
    44; shorter docs keep the Python fallback paths), ASCII text (Python
    hashes UTF-8 BYTES while SQL hashes codepoints — identical only for
    ASCII; the corpus is pure ASCII at every SF), and < 2^30 grams per doc
    (the SQL's rightmost-min encoding reserves 30 bits for the window
    rank)."""
    def fp(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id")
        digests, counts, mins = [], [], []
        for t in b.column("text").to_pylist():
            fps = winnow_fingerprints(t)
            counts.append(len(fps))
            mins.append(min(fps) if fps else 0)
            digests.append(hashlib.md5(
                ",".join(map(str, sorted(set(fps)))).encode()).hexdigest())
        return pa.table({
            "doc_id": ids,
            "n_fingerprints": pa.array(counts, pa.int64()),
            "min_fingerprint": pa.array(mins, pa.int64()),
            "fp_digest": pa.array(digests, pa.string()),
        })

    return read_table(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(fp, batch_format="pyarrow", batch_size=4096).sort("doc_id")


# Full winnowing in ANSI SQL (DuckDB): weights w_j = BASE^(K-1-j) mod MOD are
# inlined; HUGEINT keeps the 8-term weighted sum (< 2^71) and the
# (hash << 30 | WINDOW-rank) encoding exact. ``me % 2^30`` recovers the
# picked gram's (n_grams - i), so comparing it to its LAG is exactly the
# reference algorithm's "same deque-front index as the previous window" test.
SQL_FINGERPRINT = """
WITH g AS (
  SELECT doc_id, lower(text) AS t, length(text) - 7 AS ng FROM documents
  WHERE length(text) >= 23
),
grams AS (
  SELECT doc_id, ng, i,
         (  1501076012712181523::HUGEINT * ascii(substr(t, i    , 1))
          + 2133831443680070909::HUGEINT * ascii(substr(t, i + 1, 1))
          +  618155284961614297::HUGEINT * ascii(substr(t, i + 2, 1))
          +  168760150033166695::HUGEINT * ascii(substr(t, i + 3, 1))
          + 1000009000027000027::HUGEINT * ascii(substr(t, i + 4, 1))
          +       1000006000009::HUGEINT * ascii(substr(t, i + 5, 1))
          +             1000003::HUGEINT * ascii(substr(t, i + 6, 1))
          +                        ascii(substr(t, i + 7, 1))
         ) % 2305843009213693951 AS h
  FROM (SELECT doc_id, t, ng, unnest(generate_series(1, ng)) AS i FROM g)
),
wins AS (
  SELECT doc_id, i,
         MIN(h * 1073741824::HUGEINT + (ng - i)) OVER (
           PARTITION BY doc_id ORDER BY i
           ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS me
  FROM grams
  QUALIFY i >= 16
),
picks AS (
  SELECT doc_id, i, (me // 1073741824)::BIGINT AS fp, (me % 1073741824)::BIGINT AS ridx
  FROM wins
),
emitted AS (
  SELECT doc_id, fp FROM (
    SELECT doc_id, fp, ridx,
           LAG(ridx) OVER (PARTITION BY doc_id ORDER BY i) AS prev
    FROM picks)
  WHERE prev IS NULL OR ridx <> prev
),
per_doc AS (
  SELECT doc_id, count(*) AS n_fingerprints, min(fp) AS min_fingerprint
  FROM emitted GROUP BY doc_id
),
digests AS (
  SELECT doc_id, md5(string_agg(fp::VARCHAR, ',' ORDER BY fp)) AS fp_digest
  FROM (SELECT DISTINCT doc_id, fp FROM emitted) GROUP BY doc_id
)
SELECT p.doc_id, p.n_fingerprints, p.min_fingerprint, d.fp_digest
FROM per_doc p JOIN digests d USING (doc_id) ORDER BY doc_id
"""


# -- corpus-level token document frequency (stopword / vocabulary mining) ---

TOKEN_DF_MIN_DOCS = 50
SPLIT_TRAIN_PCT, SPLIT_VAL_PCT = 80, 10
BOILERPLATE_MIN_DOCS = 3


def q_token_df(sf_dir: str, min_docs: int = TOKEN_DF_MIN_DOCS):
    """Document frequency per token over the corpus — the vocabulary-mining
    primitive behind df-based stopword discovery and vocab pruning.

    Scale shape: each batch emits ONE row per distinct (token) carrying
    partial (n_docs, n_occurrences) — exact because a document lives in
    exactly one batch row, so per-batch distinct-doc counts sum without
    overlap — then one bucketized merge. The shuffle moves token partials,
    never text. Only tokens with df ≥ ``min_docs`` survive (the output is
    the corpus HEAD, bounded regardless of corpus size)."""
    def partial(b: pa.Table) -> pd.DataFrame:
        from collections import Counter

        n_docs: Counter = Counter()
        n_occ: Counter = Counter()
        for t in b.column("text").to_pylist():
            toks = _TOKEN_RE.findall(t.lower())
            n_occ.update(toks)
            n_docs.update(set(toks))
        toks = sorted(n_docs)
        return pd.DataFrame({
            "token": pd.Series(toks, dtype="object"),
            "n_docs": pd.Series([n_docs[t] for t in toks], dtype="int64"),
            "n_occurrences": pd.Series([n_occ[t] for t in toks],
                                       dtype="int64")})

    from ..stages.shuffle import bucketed_named_agg

    partials = read_table(sf_dir, "documents", ["text"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
    merged = bucketed_named_agg(partials, ["token"],
                                {"n_docs": ("n_docs", "sum"),
                                 "n_occurrences": ("n_occurrences", "sum")})

    def head(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["n_docs"] >= min_docs]

    return merged.map_batches(head, batch_format="pandas").sort("token")


SQL_TOKEN_DF = f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_PATTERN_SQL}')) AS token
  FROM documents)
SELECT token, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences
FROM toks GROUP BY token HAVING COUNT(DISTINCT doc_id) >= {TOKEN_DF_MIN_DOCS}
ORDER BY token
"""


# -- deterministic hash split (train/val/test) ------------------------------

def q_split(sf_dir: str, train_pct: int = SPLIT_TRAIN_PCT,
            val_pct: int = SPLIT_VAL_PCT):
    """Leakage-free corpus split: bucket = md5-derived hash of doc_id %
    100 — a pure function of the row key, so the assignment is stable
    across runs, resumes, corpus growth and parallelism (the standard way
    to split 10^12 rows without a shuffle or a stored assignment table)."""
    def assign(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        buckets = [int(hashlib.md5(b"split|%d" % i).hexdigest()[:8], 16) % 100
                   for i in ids]
        splits = ["train" if x < train_pct
                  else ("val" if x < train_pct + val_pct else "test")
                  for x in buckets]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "bucket": pa.array(buckets, pa.int64()),
                         "split": pa.array(splits, pa.string())})

    return read_table(sf_dir, "documents", ["doc_id"]) \
        .map_batches(assign, batch_format="pyarrow", batch_size=8192) \
        .sort("doc_id")


SQL_SPLIT = f"""
WITH h AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5('split|' || CAST(doc_id AS VARCHAR)),
                                  1, 8)) AS BIGINT) % 100 AS bucket
  FROM documents)
SELECT doc_id, bucket,
       CASE WHEN bucket < {SPLIT_TRAIN_PCT} THEN 'train'
            WHEN bucket < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM h ORDER BY doc_id
"""


# -- corpus-level boilerplate-line removal ----------------------------------

def boilerplate_lines(docs_ds, min_docs: int = BOILERPLATE_MIN_DOCS):
    """Lines appearing in ≥ ``min_docs`` DISTINCT documents (headers,
    footers, nav chrome — the classic Common-Crawl cleaning target).
    Combiner emits per-batch distinct (line, n_docs) partials (exact: one
    doc per row per batch); bucketized sum; only frequent lines survive —
    the result is SMALL (boilerplate is by definition shared), safe to
    broadcast to the strip pass."""

    def partial(b: pa.Table) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for t in b.column("text").to_pylist():
            c.update({ln for ln in t.split("\n") if ln})
        lines = sorted(c)
        return pd.DataFrame({"line": pd.Series(lines, dtype="object"),
                             "n_docs": pd.Series([c[x] for x in lines],
                                                 dtype="int64")})

    from ..stages.shuffle import bucketed_named_agg

    merged = bucketed_named_agg(
        docs_ds.map_batches(partial, batch_format="pyarrow", batch_size=8192),
        ["line"], {"n_docs": ("n_docs", "sum")})

    def head(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["n_docs"] >= min_docs]

    return merged.map_batches(head, batch_format="pandas")


def strip_boilerplate(docs_ds, boilerplate_ref):
    """Drop broadcast boilerplate lines from each document (stateless pass;
    ``boilerplate_ref`` = ray.put(frozenset of lines))."""
    import ray

    def strip(b: pa.Table) -> pa.Table:
        bad = ray.get(boilerplate_ref)
        ids = b.column("doc_id")
        out_text, out_removed = [], []
        for t in b.column("text").to_pylist():
            lines = t.split("\n")
            kept = [ln for ln in lines if ln not in bad]
            out_text.append("\n".join(kept))
            out_removed.append(len(lines) - len(kept))
        return pa.table({"doc_id": ids,
                         "clean_text": pa.array(out_text, pa.string()),
                         "n_removed": pa.array(out_removed, pa.int64())})

    return docs_ds.map_batches(strip, batch_format="pyarrow", batch_size=4096)


def _strip_boilerplate_join(docs_ds, freq_ds):
    """Beyond-budget strip path (VERDICT r3 #6): the frequent-line set
    never touches the driver. Docs explode to (doc_id, pos, line) rows
    (empty lines ride along so the rejoin is byte-identical); frequent
    lines tag matches in a line-hash bucketed join; a doc_id-bucketed
    regroup rebuilds clean_text from surviving lines in position order.
    Byte-identical to the broadcast path (pytest-pinned)."""
    from ..stages.shuffle import bucketed_group_apply

    def explode(b: pa.Table) -> pa.Table:
        ids, pos, lines = [], [], []
        for did, t in zip(b.column("doc_id").to_pylist(),
                          b.column("text").to_pylist()):
            ls = t.split("\n")
            ids.extend([did] * len(ls))
            pos.extend(range(len(ls)))
            lines.extend(ls)
        n = len(ids)
        return pa.table({"line": pa.array(lines, pa.string()),
                         "doc_id": pa.array(ids, pa.int64()),
                         "pos": pa.array(pos, pa.int64()),
                         "kind": pa.array([0] * n, pa.int32())})

    def freq_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        zeros = pa.array([0] * n, pa.int64())
        return pa.table({"line": b.column("line"),
                         "doc_id": zeros, "pos": zeros,
                         "kind": pa.array([1] * n, pa.int32())})

    tagged = docs_ds.map_batches(explode, batch_format="pyarrow",
                                 batch_size=4096) \
        .union(freq_ds.map_batches(freq_rows, batch_format="pyarrow"))

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        bad = set(df.loc[df["kind"] == 1, "line"])
        out = df[df["kind"] == 0].copy(deep=False)
        out["dropped"] = out["line"].isin(bad)
        return out[["doc_id", "pos", "line", "dropped"]]

    marked = bucketed_group_apply(tagged, ["line"], mark,
                                  driver_budget_rows=0)

    def rebuild(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": [], "clean_text": [], "n_removed": []}
        for did, g in df.groupby("doc_id", sort=True):
            g = g.sort_values("pos", kind="stable")
            rows["doc_id"].append(int(did))
            rows["clean_text"].append("\n".join(g.loc[~g["dropped"], "line"]))
            rows["n_removed"].append(int(g["dropped"].sum()))
        return pd.DataFrame({
            "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
            "clean_text": pd.Series(rows["clean_text"], dtype="object"),
            "n_removed": pd.Series(rows["n_removed"], dtype="int64")})

    return bucketed_group_apply(marked, ["doc_id"], rebuild,
                                driver_budget_rows=0).sort("doc_id")


def remove_boilerplate(docs_ds, min_docs: int = BOILERPLATE_MIN_DOCS,
                       budget_rows: int | None = None):
    """Boilerplate removal with the same rows+bytes driver budget as
    bucketed_group_apply (VERDICT r3 #6): when the frequent-line set fits
    (the normal case — boilerplate is by definition shared, so the set is
    tiny), it broadcasts as a frozenset; past the budget the strip runs as
    a distributed membership join and the driver never holds a line."""
    import os

    import ray

    from ..stages.shuffle import DRIVER_MERGE_BUDGET, DRIVER_MERGE_BYTES

    freq = boilerplate_lines(docs_ds, min_docs).materialize()
    budget = budget_rows if budget_rows is not None else int(
        os.environ.get("RAYKG_BOILERPLATE_BUDGET", DRIVER_MERGE_BUDGET))
    if freq.count() <= budget and freq.size_bytes() <= DRIVER_MERGE_BYTES:
        bad = frozenset(r["line"] for r in freq.take_all())
        return strip_boilerplate(docs_ds, ray.put(bad)).sort("doc_id")
    return _strip_boilerplate_join(docs_ds, freq)


def q_boilerplate(sf_dir: str, min_docs: int = BOILERPLATE_MIN_DOCS):
    """End-to-end boilerplate removal over the documents table. (The
    driver's synthetic corpus has fully distinct texts, so this is the
    identity there — the oracle still verifies the full split/strip/rejoin
    reconstruction byte-for-byte; the non-trivial behavior is pinned by
    pytest on planted boilerplate.)"""
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    return remove_boilerplate(docs, min_docs)


SQL_BOILERPLATE = f"""
WITH lines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM documents),
freq AS (
  SELECT line FROM lines WHERE line <> '' GROUP BY line
  HAVING COUNT(DISTINCT doc_id) >= {BOILERPLATE_MIN_DOCS}),
fl AS (SELECT coalesce(list(line), []) AS bl FROM freq)
SELECT d.doc_id,
  array_to_string(
    list_filter(string_split(d.text, chr(10)),
                x -> NOT list_contains(fl.bl, x)), chr(10)) AS clean_text,
  CAST(len(string_split(d.text, chr(10))) -
       len(list_filter(string_split(d.text, chr(10)),
                       x -> NOT list_contains(fl.bl, x))) AS BIGINT) AS n_removed
FROM documents d CROSS JOIN fl ORDER BY doc_id
"""


# -- deterministic uniform sample (hash-rank top-N) -------------------------

SAMPLE_N = 100


def q_sample(sf_dir: str, n: int = SAMPLE_N):
    """Deterministic uniform sample without a shuffle or an RNG: rank every
    row by md5 of its key and keep the N smallest — the standard trick for
    reproducible eval-set carving at any scale (rank is a pure function of
    the key; growing the corpus only displaces rows at the boundary).
    Per-batch partial top-N + one tiny single-block merge; only (doc_id,
    rank-hash) rows ever move."""
    def partial(b: pa.Table) -> pd.DataFrame:
        ids = b.column("doc_id").to_pylist()
        hs = [hashlib.md5(b"s|%d" % i).hexdigest() for i in ids]
        df = pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                           "h": pd.Series(hs, dtype="object")})
        return df.sort_values(["h", "doc_id"], kind="stable").head(n)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["h", "doc_id"], kind="stable").head(n) \
            .reset_index(drop=True)

    return read_table(sf_dir, "documents", ["doc_id"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=8192) \
        .repartition(1).map_batches(merge, batch_format="pandas",
                                    batch_size=None)


SQL_SAMPLE = f"""
SELECT doc_id, md5('s|' || CAST(doc_id AS VARCHAR)) AS h
FROM documents ORDER BY h, doc_id LIMIT {SAMPLE_N}
"""


# -- exact distributed quantiles via value histogram ------------------------

LEN_QUANTILES = (0.5, 0.9, 0.99)


def q_len_quantiles(sf_dir: str):
    """Exact p50/p90/p99 of document length WITHOUT a distributed sort:
    per-batch value histograms (n_chars has bounded cardinality — the
    histogram is the reduced data) merge through one bucketized sum, and
    the quantile is read off the cumulative counts in a single tiny task.
    Quantile semantics = DuckDB's quantile_disc: smallest value whose
    cumulative count ≥ ceil(q·n)."""
    def hist(b: pa.Table) -> pd.DataFrame:
        vc = pd.Series(b.column("n_chars").to_pylist()).value_counts()
        return pd.DataFrame({"value": vc.index.astype("int64"),
                             "cnt": vc.values.astype("int64")})

    from ..stages.shuffle import bucketed_named_agg

    merged = bucketed_named_agg(
        read_table(sf_dir, "documents", ["n_chars"])
        .map_batches(hist, batch_format="pyarrow", batch_size=8192),
        ["value"], {"cnt": ("cnt", "sum")})

    def quantiles(df: pd.DataFrame) -> pd.DataFrame:
        import math

        df = df.sort_values("value", kind="stable").reset_index(drop=True)
        cum = df["cnt"].cumsum()
        n = int(cum.iloc[-1]) if len(df) else 0
        out_q, out_v = [], []
        for q in LEN_QUANTILES:
            target = max(1, math.ceil(q * n))
            idx = int((cum >= target).idxmax()) if n else 0
            out_q.append(q)
            out_v.append(int(df["value"].iloc[idx]) if n else 0)
        return pd.DataFrame({"q": pd.Series(out_q, dtype="float64"),
                             "n_chars_q": pd.Series(out_v, dtype="int64")})

    return merged.repartition(1).map_batches(quantiles, batch_format="pandas",
                                             batch_size=None)


SQL_LEN_QUANTILES = """
SELECT 0.5 AS q, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS n_chars_q FROM documents
UNION ALL
SELECT 0.9, CAST(quantile_disc(n_chars, 0.9) AS BIGINT) FROM documents
UNION ALL
SELECT 0.99, CAST(quantile_disc(n_chars, 0.99) AS BIGINT) FROM documents
ORDER BY q
"""
