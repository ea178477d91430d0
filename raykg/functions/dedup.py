"""Deduplication operators over the ``documents`` table: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale shapes (ray_guide "Aggregation at scale"):
- exact: content-hash in a vectorized map_batches → groupby(hash) keep min —
  the shuffle moves (hash, id) pairs only, never text;
- MinHash/SimHash: sketch per batch → explode to (band, bandhash, doc) rows →
  groupby bands → candidate pairs → verify → distinct pairs. Sketching is
  numpy-vectorized (one (k × n_shingles) matmul-style pass per doc batch);
- candidate verification fetches doc token sets from a broadcast store at
  this corpus size; the 10^12-doc path replaces the broadcast with a
  bucketed join of pair-ids against the documents table (documented, not
  needed at driver scale).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

_TOK_RE = re.compile(r"[a-z0-9_]+")

MINHASH_K = 64
MINHASH_BANDS = 16          # 16 bands × 4 rows
_MOD_MASK = (1 << 64) - 1


def _word_tokens(text: str) -> list[str]:
    return _TOK_RE.findall(text.lower())


def _shingles(text: str, n: int = 3) -> set[str]:
    toks = _word_tokens(text)
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def _perm_params(k: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MOD_MASK, size=k, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, _MOD_MASK, size=k, dtype=np.uint64)
    return a, b


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray) -> np.ndarray | None:
    sh = _shingles(text)
    if not sh:
        return None
    x = np.fromiter((_hash64(s) for s in sh), dtype=np.uint64, count=len(sh))
    with np.errstate(over="ignore"):
        hs = a[:, None] * x[None, :] + b[:, None]     # mod 2^64 by wraparound
    return hs.min(axis=1)


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


# -- exact dedup ------------------------------------------------------------

def q_dedup_exact(sf_dir: str):
    """Exact dedup groups: md5(text) → keeper = min doc_id, group size."""
    import ray.data as rd

    from ..stages.shuffle import bucketed_named_agg

    def add_hash(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "h": pa.array([hashlib.md5(t.encode()).hexdigest()
                           for t in b.column("text").to_pylist()], pa.string()),
        })

    hashed = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "text"]) \
        .map_batches(add_hash, batch_format="pyarrow", batch_size=8192)
    return bucketed_named_agg(hashed, ["h"],
                              {"keeper": ("doc_id", "min"),
                               "n_dups": ("doc_id", "size")}).sort("h")


SQL_DEDUP_EXACT = """
SELECT md5(text) AS h, CAST(MIN(doc_id) AS BIGINT) AS keeper, COUNT(*) AS n_dups
FROM documents GROUP BY 1 ORDER BY h
"""


# -- MinHash + LSH near-dup -------------------------------------------------

def minhash_pairs(docs_ds, jaccard_threshold: float = 0.5, seed: int = 42,
                  texts_by_id: dict[int, str] | None = None):
    """documents Dataset → verified near-dup pairs (a, b, jaccard).

    shingle → minhash → band → bucket groupby → candidate pairs →
    exact-Jaccard verify (ray_guide near-dup recipe)."""
    import ray
    import ray.data as rd

    a, b = _perm_params(MINHASH_K, seed)
    rows_per_band = MINHASH_K // MINHASH_BANDS

    def bands(batch: pa.Table) -> pa.Table:
        out_band, out_hash, out_doc = [], [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            sig = minhash_signature(text, a, b)
            if sig is None:
                continue
            for band in range(MINHASH_BANDS):
                seg = sig[band * rows_per_band:(band + 1) * rows_per_band]
                out_band.append(band)
                out_hash.append(_hash64(",".join(map(str, seg))) & 0x7FFFFFFFFFFFFFFF)
                out_doc.append(did)
        return pa.table({"band": pa.array(out_band, pa.int32()),
                         "bandhash": pa.array(out_hash, pa.int64()),
                         "doc_id": pa.array(out_doc, pa.int64())})

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        aa, bb = [], []
        for _, g in df.groupby(["band", "bandhash"], sort=True):
            ids = sorted(set(int(x) for x in g["doc_id"]))
            if len(ids) < 2 or len(ids) > 500:   # skew guard: degenerate buckets
                continue
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    aa.append(ids[i])
                    bb.append(ids[j])
        return pd.DataFrame({"a": pd.Series(aa, dtype="int64"),
                             "b": pd.Series(bb, dtype="int64")})

    from ..stages.shuffle import bucketed_group_apply

    candidates = bucketed_group_apply(
        docs_ds.map_batches(bands, batch_format="pyarrow", batch_size=4096),
        ["band", "bandhash"], bucket_pairs)
    candidates = bucketed_group_apply(
        candidates, ["a", "b"], lambda df: df.drop_duplicates(["a", "b"]))

    if texts_by_id is None:
        texts_by_id = {}
        for bt in docs_ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
            texts_by_id.update(zip(bt.column("doc_id").to_pylist(),
                                   bt.column("text").to_pylist()))
    texts_ref = ray.put(texts_by_id)

    def verify(batch: pa.Table) -> pa.Table:
        texts = ray.get(texts_ref)
        aa, bb, jj = [], [], []
        for x, y in zip(batch.column("a").to_pylist(), batch.column("b").to_pylist()):
            j = jaccard(_shingles(texts[x]), _shingles(texts[y]))
            if j >= jaccard_threshold:
                aa.append(x)
                bb.append(y)
                jj.append(round(j, 6))
        return pa.table({"a": pa.array(aa, pa.int64()),
                         "b": pa.array(bb, pa.int64()),
                         "jaccard": pa.array(jj, pa.float64())})

    return candidates.map_batches(verify, batch_format="pyarrow").sort(["a", "b"])


def q_dedup_minhash(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return minhash_pairs(docs)


# -- SimHash near-dup -------------------------------------------------------

SIMHASH_BITS = 64
_SIMHASH_BANDS = 4          # 4 × 16-bit chunks; hamming ≤ 3 ⇒ ≥1 chunk equal


_BIT_POS = np.arange(SIMHASH_BITS, dtype=np.uint64)


def simhash64(text: str) -> int:
    toks = _word_tokens(text)
    if not toks:
        return 0
    acc = np.zeros(SIMHASH_BITS, dtype=np.int64)
    from collections import Counter

    for tok, cnt in Counter(toks).items():
        bits = (np.uint64(_hash64(tok)) >> _BIT_POS) & np.uint64(1)
        acc += np.where(bits == 1, cnt, -cnt)
    return int(((acc > 0).astype(np.uint64) << _BIT_POS).sum(dtype=np.uint64))


def simhash_pairs(docs_ds, max_hamming: int = 3):
    """SimHash near-dup pairs via chunk LSH (pigeonhole: hamming ≤ 3 over 4
    chunks ⇒ at least one 16-bit chunk identical) + exact hamming verify."""
    import pandas as pd

    def sketch(batch: pa.Table) -> pa.Table:
        out_chunk, out_val, out_doc, out_sig = [], [], [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            sig = simhash64(text)
            for c in range(_SIMHASH_BANDS):
                out_chunk.append(c)
                out_val.append((sig >> (16 * c)) & 0xFFFF)
                out_doc.append(did)
                out_sig.append(sig & 0x7FFFFFFFFFFFFFFF)   # int64-safe low 63
        return pa.table({"chunk": pa.array(out_chunk, pa.int32()),
                         "val": pa.array(out_val, pa.int32()),
                         "doc_id": pa.array(out_doc, pa.int64()),
                         "sig63": pa.array(out_sig, pa.int64())})

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        aa, bb, hh = [], [], []
        for _, g in df.groupby(["chunk", "val"], sort=True):
            rows = sorted(set(zip((int(x) for x in g["doc_id"]),
                                  (int(s) for s in g["sig63"]))))
            if len(rows) < 2 or len(rows) > 500:
                continue
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    # hamming over low 63 bits (bit 63 dropped by int64
                    # storage; 1-bit loss accepted for Arrow transport)
                    ham = bin(rows[i][1] ^ rows[j][1]).count("1")
                    if ham <= max_hamming:
                        aa.append(rows[i][0])
                        bb.append(rows[j][0])
                        hh.append(ham)
        return pd.DataFrame({"a": pd.Series(aa, dtype="int64"),
                             "b": pd.Series(bb, dtype="int64"),
                             "hamming": pd.Series(hh, dtype="int64")})

    from ..stages.shuffle import bucketed_group_apply

    sketched = docs_ds.map_batches(sketch, batch_format="pyarrow", batch_size=4096)
    pairs = bucketed_group_apply(sketched, ["chunk", "val"], bucket_pairs)
    return bucketed_group_apply(pairs, ["a", "b"],
                                lambda df: df.drop_duplicates(["a", "b"])) \
        .sort(["a", "b"])


def q_dedup_simhash(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return simhash_pairs(docs)


# -- n-gram Jaccard over adjacent-doc pairs (SQL-checkable) -----------------

def q_ngram_jaccard(sf_dir: str):
    """Distinct word-token Jaccard for each (doc_id, doc_id+1) pair — a
    shuffle-based SELF-JOIN: each doc emits a row into its two pair groups;
    groupby(pair_id) co-locates both sides."""
    import ray.data as rd

    def emit(b: pa.Table) -> pa.Table:
        pair_id, role, doc_id, toks = [], [], [], []
        for did, text in zip(b.column("doc_id").to_pylist(),
                             b.column("text").to_pylist()):
            tok_list = sorted(set(_word_tokens(text)))
            for pid, r in ((did, 0), (did - 1, 1)):
                pair_id.append(pid)
                role.append(r)
                doc_id.append(did)
                toks.append(tok_list)
        return pa.table({"pair_id": pa.array(pair_id, pa.int64()),
                         "role": pa.array(role, pa.int32()),
                         "doc_id": pa.array(doc_id, pa.int64()),
                         "toks": pa.array(toks, pa.list_(pa.string()))})

    def join_pairs(df: pd.DataFrame) -> pd.DataFrame:
        aa, bb, jj = [], [], []
        for _, g in df.groupby("pair_id", sort=True):
            if len(g) != 2:
                continue
            g = g.sort_values("role")
            ta = set(g["toks"].iloc[0])
            tb = set(g["toks"].iloc[1])
            aa.append(int(g["doc_id"].iloc[0]))
            bb.append(int(g["doc_id"].iloc[1]))
            jj.append(round(jaccard(ta, tb), 6))
        return pd.DataFrame({"a": pd.Series(aa, dtype="int64"),
                             "b": pd.Series(bb, dtype="int64"),
                             "jaccard": pd.Series(jj, dtype="float64")})

    from ..stages.shuffle import bucketed_group_apply

    emitted = rd.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"]) \
        .map_batches(emit, batch_format="pyarrow", batch_size=4096)
    return bucketed_group_apply(emitted, ["pair_id"], join_pairs).sort("a")


SQL_NGRAM_JACCARD = """
WITH d AS (
  SELECT doc_id,
         list_distinct(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS toks
  FROM documents)
SELECT x.doc_id AS a, y.doc_id AS b,
       round(len(list_intersect(x.toks, y.toks)) /
             CAST(len(x.toks) + len(y.toks) - len(list_intersect(x.toks, y.toks))
                  AS DOUBLE), 6) AS jaccard
FROM d x JOIN d y ON y.doc_id = x.doc_id + 1
ORDER BY a
"""


# -- embedding-cosine near-dup (SQL-checkable) ------------------------------

EMB_DUP_THRESHOLD = 0.35


def q_dedup_embedding(sf_dir: str):
    """Same-label pairwise cosine ≥ threshold over the embeddings table.
    Batch side: one f64 matmul per label block (labels partition the data —
    groupby(label) then a dense similarity inside the group)."""
    import ray.data as rd

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy()
        m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ (m / norms).T
        order = np.argsort(ids, kind="stable")
        ids_s = ids[order]
        sims = sims[np.ix_(order, order)]
        ii, jj = np.nonzero(np.triu(sims >= EMB_DUP_THRESHOLD, k=1))
        return pd.DataFrame({"a": ids_s[ii].astype(np.int64),
                             "b": ids_s[jj].astype(np.int64)})

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet") \
        .groupby("label").map_groups(pairs, batch_format="pandas") \
        .sort(["a", "b"])


SQL_DEDUP_EMBEDDING = f"""
SELECT x.vec_id AS a, y.vec_id AS b
FROM embeddings x JOIN embeddings y
  ON x.label = y.label AND x.vec_id < y.vec_id
WHERE list_cosine_similarity(x.embedding, y.embedding) >= {EMB_DUP_THRESHOLD}
ORDER BY a, b
"""
