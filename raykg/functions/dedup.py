"""Deduplication operators over the ``documents`` table: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale shapes (ray_guide "Aggregation at scale"):
- exact: content-hash in a vectorized map_batches → groupby(hash) keep min —
  the shuffle moves (hash, id) pairs only, never text;
- MinHash/SimHash: sketch per batch → explode to (band, bandhash, doc) rows →
  groupby bands → candidate pairs → verify → distinct pairs. Sketching is
  numpy-vectorized (one (k × n_shingles) matmul-style pass per doc batch);
- candidate verification is a bucketed pair↔document join (the
  ``q_ngram_jaccard`` self-join pattern): candidate doc ids (a SMALL set —
  near-dup pairs are a vanishing fraction of any real corpus) are broadcast
  as a membership filter, only those docs' shingle-hash lists enter the
  join shuffle, and exact Jaccard is computed where the two sides meet.
  Nothing corpus-sized is ever collected to the driver or ``ray.put``;
  beyond ~10^8 candidates the id-set broadcast becomes a Bloom filter
  (same plumbing, documented).
"""

from __future__ import annotations

import hashlib
import math
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.tables import read_table
from ..stages.shuffle import _h64s

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
    """64-bit string hash = first 8 bytes of md5, big-endian. md5 (not
    blake2b) so the SQL oracles can reproduce every sketch bit:
    DuckDB's ``('0x' || substr(md5(s), 1, 16))::UBIGINT`` is bit-identical."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _perm_params(k: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MOD_MASK, size=k, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, _MOD_MASK, size=k, dtype=np.uint64)
    return a, b


# -- vectorized fast string hash (VERDICT r3 #2) ----------------------------
#
# The md5 ``_hash64`` pays a Python hashlib call PER SHINGLE — the one
# code-level cost behind the dedup_minhash bench regression. The fast mode
# below hashes every shingle of a whole batch in a handful of numpy kernels
# (one utf-32 decode + segmented Horner + splitmix-style finalizer) and is
# still bit-reproducible in DuckDB (``_sql_fast64_cols``), so it gets its
# own oracle rather than weakening the md5 one. Hash mode is selected per
# query: ``*_md5`` queries keep the md5 sketch.

_FAST_P = np.uint64(1099511628211)              # FNV-64 prime
_MIX_C1 = np.uint64(0xFF51AFD7ED558CCD)         # murmur3 fmix64 constants
_MIX_C2 = np.uint64(0xC4CEB9FE1A85EC53)


def _mix64(x: np.ndarray) -> np.ndarray:
    """fmix64 finalizer, vectorized, wraparound mod 2^64."""
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(33))) * _MIX_C1
        x = (x ^ (x >> np.uint64(33))) * _MIX_C2
        return x ^ (x >> np.uint64(33))


def _fast_hash64_many(strings: list[str]) -> np.ndarray:
    """64-bit hash of each string: Horner polynomial (FNV prime) over
    UTF-32 code points mod 2^64 + fmix64, all vectorized — zero per-string
    Python. Empty strings hash to ``fmix64(0)`` (the empty-product Horner
    value); embedded NULs raise ``ValueError`` (NUL is the internal segment
    separator — a silent mis-segmentation would hash WRONG, ADVICE r4).
    Bit-identical to the DuckDB staging in ``_sql_fast64_cols`` for
    non-empty inputs (the SQL staging never sees empties: shingles/word
    tokens are non-empty by construction).

    Internally chunked (~400k code points ≈ 3 MB working set) so the
    intermediates stay allocator-reused instead of mmap-churned — with 32
    Ray workers each hashing a whole batch, fresh multi-MB allocations per
    call are page-fault-bound, not compute-bound."""
    if not strings:
        return np.zeros(0, dtype=np.uint64)
    if len(strings) > 1:
        total = sum(len(s) for s in strings)
        if total > 400_000:
            n_chunks = -(-total // 400_000)
            step = -(-len(strings) // n_chunks)
            return np.concatenate([
                _fast_hash64_many(strings[i:i + step])
                for i in range(0, len(strings), step)])
    joined = "\x00".join(strings)
    codes = np.frombuffer(joined.encode("utf-32-le"),
                          dtype=np.uint32).astype(np.uint64)
    seps = np.flatnonzero(codes == 0)
    if len(seps) != len(strings) - 1:
        raise ValueError("_fast_hash64_many: embedded NUL in input string")
    starts = np.concatenate([[0], seps + 1]).astype(np.int64)
    ends = np.concatenate([seps, [len(codes)]]).astype(np.int64)
    g = np.arange(len(codes), dtype=np.int64)
    expo = ends[np.searchsorted(ends, g, side="left")] - 1 - g
    maxlen = int((ends - starts).max())
    pw = np.ones(max(maxlen, 1), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in range(1, maxlen):
            pw[k] = pw[k - 1] * _FAST_P
        t = codes * pw[np.clip(expo, 0, None)]   # expo=-1 only at NULs...
        t[codes == 0] = 0                        # ...which contribute 0
        # reduceat can't represent empty segments (it returns the boundary
        # element, or walks off the end for a trailing empty): skip them —
        # separator positions contribute t=0, so a widened nonempty segment
        # sums identically — and leave their Horner sum at 0
        sums = np.zeros(len(starts), dtype=np.uint64)
        ne = starts < ends
        if ne.any():
            sums[ne] = np.add.reduceat(t, starts[ne])
        return _mix64(sums)


_SQL_M64 = "18446744073709551616::UHUGEINT"


def _sql_fast64_cols(char_expr: str, final_as: str = "fh") -> str:
    """Staged lateral SELECT columns reproducing ``_fast_hash64_many``
    bit-for-bit for one VARCHAR expression (DuckDB resolves prior aliases
    in the same SELECT list). Final UBIGINT column is named ``final_as``."""
    return f"""
      CAST(list_reduce(list_prepend(CAST(0 AS UHUGEINT),
             [CAST(unicode(c) AS UHUGEINT) FOR c IN string_split({char_expr}, '')]),
           (acc, c) -> (acc * 1099511628211 + c) % {_SQL_M64}) AS UBIGINT) AS fh0,
      xor(fh0, fh0 >> 33) AS fx0,
      CAST((CAST(fx0 AS UHUGEINT) * 18397679294719823053::UHUGEINT) % {_SQL_M64} AS UBIGINT) AS fx1,
      xor(fx1, fx1 >> 33) AS fx2,
      CAST((CAST(fx2 AS UHUGEINT) * 14181476777654086739::UHUGEINT) % {_SQL_M64} AS UBIGINT) AS fx3,
      xor(fx3, fx3 >> 33) AS {final_as}"""


def _sql_fast64_list_cols(list_expr: str, final_as: str = "fh") -> str:
    """Same finalized Horner, but over a list of UHUGEINT values (the band
    hash over 4 signature rows) instead of code points."""
    return f"""
      CAST(list_reduce(list_prepend(CAST(0 AS UHUGEINT), {list_expr}),
           (acc, c) -> (acc * 1099511628211 + c) % {_SQL_M64}) AS UBIGINT) AS fh0,
      xor(fh0, fh0 >> 33) AS fx0,
      CAST((CAST(fx0 AS UHUGEINT) * 18397679294719823053::UHUGEINT) % {_SQL_M64} AS UBIGINT) AS fx1,
      xor(fx1, fx1 >> 33) AS fx2,
      CAST((CAST(fx2 AS UHUGEINT) * 14181476777654086739::UHUGEINT) % {_SQL_M64} AS UBIGINT) AS fx3,
      xor(fx3, fx3 >> 33) AS {final_as}"""


def _hash_mode(explicit: str | None) -> str:
    mode = explicit or os.environ.get("RAYKG_HASH_MODE", "fast")
    if mode not in ("fast", "md5"):
        raise ValueError(f"unknown hash mode {mode!r}")
    return mode


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


# Above this many candidate rows the pair-membership map stops being a
# driver dict + single ray.put and verification switches to the fully
# distributed join (``_pair_join_distributed``): the driver then holds only
# a fixed-size Bloom bitmap, never anything pair-shaped. Same adaptive
# shape as canonicalize.alias_components. Env-overridable for tests.
_PAIR_MEMBERS_BUDGET = 2_000_000


def _bloom_mix(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer over uint64 ids (vectorized, wraparound mod
    2^64) — the Bloom filter's hash family via double hashing."""
    with np.errstate(over="ignore"):
        x = x + np.uint64(salt)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


_BLOOM_K = 8


def _bloom_positions(ids: np.ndarray, m_bits: int):
    """k = 8 bit positions per id (double hashing; m_bits is a power of 2)."""
    h1 = _bloom_mix(ids, 0x9E3779B97F4A7C15)
    h2 = _bloom_mix(ids, 0xC2B2AE3D27D4EB4F) | np.uint64(1)
    mask = np.uint64(m_bits - 1)
    with np.errstate(over="ignore"):
        return [(h1 + np.uint64(j) * h2) & mask for j in range(_BLOOM_K)]


def _bloom_add(bloom: np.ndarray, ids: np.ndarray, m_bits: int) -> None:
    for pos in _bloom_positions(ids, m_bits):
        np.bitwise_or.at(bloom, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))


def _bloom_contains(bloom: np.ndarray, ids: np.ndarray,
                    m_bits: int) -> np.ndarray:
    ok = np.ones(len(ids), dtype=bool)
    for pos in _bloom_positions(ids, m_bits):
        bit = np.uint64(1) << (pos & np.uint64(63))
        ok &= (bloom[(pos >> np.uint64(6)).astype(np.int64)] & bit) != 0
    return ok


def _pair_join_distributed(candidates, items_ds, id_col: str, payload_of,
                           payload_type: pa.DataType, pair_score,
                           score_col: str, batch_size: int):
    """The beyond-driver-budget verification path: NOTHING pair-shaped is
    ever held on the driver (VERDICT r3 #1).

    1. candidate (a, b) rows dedup in a bucketed pass (pairs repeat across
       LSH bands) and explode to membership rows (iid, a, b, role);
    2. the driver folds the member ids into a FIXED-SIZE Bloom bitmap
       (sized 16 bits/id, capped at 1 GiB — vs ~300 B/entry for the dict;
       false positives only cost a wasted payload row, dropped at the
       join) and broadcasts it once via ``ray.put``;
    3. the items scan emits (iid, payload) for Bloom-passing ids only;
    4. membership and payload rows co-locate by iid hash-bucket and emit
       (a, b, role, payload); a final bucketed pair-group pass scores.
    Payloads travel as pickled ``binary`` here (never ``payload_type``):
    a tensor-typed column that is all-null on one union side trips Ray's
    pandas TensorArray concat, and bytes survive every Arrow<->pandas hop
    unchanged. Output is byte-identical to the broadcast-dict fast path
    (pytest-pinned)."""
    import pickle

    import ray

    from ..stages.shuffle import bucketed_group_apply

    pairs = bucketed_group_apply(
        candidates, ["a", "b"], lambda df: df.drop_duplicates(["a", "b"]),
        driver_budget_rows=0)

    def explode(bt: pa.Table) -> pa.Table:
        a = bt.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = bt.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        null_pl = pa.nulls(2 * len(a), pa.binary())
        return pa.table({
            "iid": pa.array(np.concatenate([a, b]), pa.int64()),
            "a": pa.array(np.concatenate([a, a]), pa.int64()),
            "b": pa.array(np.concatenate([b, b]), pa.int64()),
            "role": pa.array(np.repeat(np.array([0, 1], dtype=np.int32),
                                       len(a)), pa.int32()),
            "payload": null_pl})

    mem = pairs.map_batches(explode, batch_format="pyarrow").materialize()

    n_ids = max(1, mem.count())
    m_bits = 1 << min(33, max(20, int(math.ceil(math.log2(n_ids * 16)))))
    bloom = np.zeros(m_bits // 64, dtype=np.uint64)
    # streamed: driver peak = bitmap + one 64k batch of int64 ids
    for bt in mem.select_columns(["iid"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        _bloom_add(bloom,
                   bt.column("iid").to_numpy(zero_copy_only=False)
                   .astype(np.uint64), m_bits)
    bloom_ref = ray.put(bloom)

    def probe(batch: pa.Table) -> pa.Table:
        bf = ray.get(bloom_ref)
        ids_np = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sel = np.flatnonzero(
            _bloom_contains(bf, ids_np.astype(np.uint64), m_bits))
        payload = [pickle.dumps(payload_of(batch, int(i)), protocol=4)
                   for i in sel]
        n = len(sel)
        # role = -1 tags payload rows; a/b carry an int sentinel, NEVER null
        # (a null would float64-coerce the whole column in the pandas bucket
        # and corrupt 63-bit ids — the partial_edges lesson)
        zeros = pa.array(np.zeros(n, dtype=np.int64), pa.int64())
        return pa.table({
            "iid": pa.array(ids_np[sel], pa.int64()),
            "a": zeros, "b": zeros,
            "role": pa.array(np.full(n, -1, dtype=np.int32), pa.int32()),
            "payload": pa.array(payload, pa.binary())})

    pay = items_ds.map_batches(probe, batch_format="pyarrow",
                               batch_size=batch_size)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        pm = df[df["role"] == -1]
        mm = df[df["role"] >= 0]
        if pm["iid"].duplicated().any():
            # all payload rows of an iid co-locate in this bucket, so this
            # check is complete; a silent last-wins dict here would diverge
            # from the broadcast path's behavior on dup ids (ADVICE r4)
            raise ValueError(
                "duplicate item ids in pair join — id column must be unique")
        pmap = dict(zip(pm["iid"], pm["payload"]))
        mm = mm[mm["iid"].isin(pmap)]    # Bloom fps / missing items drop
        return pd.DataFrame({
            "a": mm["a"].astype("int64"),
            "b": mm["b"].astype("int64"),
            "role": mm["role"].astype("int32"),
            "payload": mm["iid"].map(pmap)})

    sides_rows = bucketed_group_apply(mem.union(pay), ["iid"], attach,
                                      driver_budget_rows=0)
    return _score_pair_groups(sides_rows, pair_score, score_col,
                              pickled=True)


def _score_pair_groups(sides_rows, pair_score, score_col: str,
                       pickled: bool = False):
    """Shared tail of both pair-join paths: regroup (a, b, role, payload)
    rows by pair, score where both sides meet, deterministic final sort.
    ``pickled`` marks the distributed path's binary payloads."""
    import pickle

    from ..stages.shuffle import bucketed_group_apply

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        aa, bb, ss = [], [], []
        for (x, y), g in df.groupby(["a", "b"], sort=True):
            if len(g) > 2:
                # >2 rows for one pair ⇒ an item id appeared on several
                # item rows — fail loudly rather than silently dropping
                # the pair (ADVICE r4: the two join paths diverged here)
                raise ValueError("duplicate item ids in pair join — "
                                 "id column must be unique")
            if len(g) != 2:
                continue
            g = g.sort_values("role")
            if int(g["role"].iloc[0]) == int(g["role"].iloc[1]):
                raise ValueError("duplicate item ids in pair join — "
                                 "id column must be unique")
            p0, p1 = g["payload"].iloc[0], g["payload"].iloc[1]
            if pickled:
                p0, p1 = pickle.loads(p0), pickle.loads(p1)
            s = pair_score(p0, p1)
            if s is not None:
                aa.append(int(x))
                bb.append(int(y))
                ss.append(s)
        return pd.DataFrame({"a": pd.Series(aa, dtype="int64"),
                             "b": pd.Series(bb, dtype="int64"),
                             score_col: pd.Series(ss, dtype="float64")})

    return bucketed_group_apply(sides_rows, ["a", "b"], verify) \
        .sort(["a", "b"])


def _verified_pair_join(candidates, items_ds, id_col: str, payload_of,
                        payload_type: pa.DataType, pair_score,
                        score_col: str = "score", batch_size: int = 4096,
                        members_budget: int | None = None):
    """Distributed candidate-pair verification (the ``q_ngram_jaccard``
    self-join pattern, generalized).

    ``candidates`` is a small (a, b) Dataset (near-dup candidates are a
    vanishing fraction of any corpus). Below ``members_budget`` candidate
    rows its pair-membership map (item id → [(a, b, role)]) is broadcast
    once; the items scan then emits one (a, b, role, payload) row per
    membership — payloads are computed ONLY for candidate rows — and a
    bucketed pair-group pass calls ``pair_score(payload_a, payload_b)``
    where the two sides meet (None = rejected). Above the budget the whole
    thing runs as a distributed membership join with a Bloom-filter items
    prefilter (``_pair_join_distributed``) — nothing pair-shaped ever
    touches the driver.

    CONTRACT: ``items_ds[id_col]`` must be unique — both paths raise
    ``ValueError`` on a duplicate id (silently picking one payload would
    be order-dependent and the two paths would diverge; ADVICE r4)."""
    import ray

    from ..stages.shuffle import bucketed_group_apply

    budget = members_budget if members_budget is not None else int(
        os.environ.get("RAYKG_PAIR_MEMBERS_BUDGET", _PAIR_MEMBERS_BUDGET))
    candidates = candidates.materialize()
    if candidates.count() > budget:
        return _pair_join_distributed(candidates, items_ds, id_col,
                                      payload_of, payload_type, pair_score,
                                      score_col, batch_size)

    members: dict = {}
    seen: set = set()
    for bt in candidates.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for x, y in zip(bt.column("a").to_pylist(), bt.column("b").to_pylist()):
            if (x, y) in seen:      # candidates may repeat (e.g. a pair
                continue            # surfacing from several LSH bands) —
            seen.add((x, y))        # dedup here, where they are already
                                    # materialized, instead of paying a
                                    # dedicated shuffle pass for it
            members.setdefault(x, []).append((x, y, 0))
            members.setdefault(y, []).append((x, y, 1))
    members_ref = ray.put(members)

    def sides(batch: pa.Table) -> pa.Table:
        mm = ray.get(members_ref)
        aa, bb, role, payload = [], [], [], []
        for i, iid in enumerate(batch.column(id_col).to_pylist()):
            mships = mm.get(iid)
            if not mships:
                continue
            pl = payload_of(batch, i)
            for x, y, r in mships:
                aa.append(x)
                bb.append(y)
                role.append(r)
                payload.append(pl)
        return pa.table({"a": pa.array(aa, pa.int64()),
                         "b": pa.array(bb, pa.int64()),
                         "role": pa.array(role, pa.int32()),
                         "payload": pa.array(payload, payload_type)})

    out = items_ds.map_batches(sides, batch_format="pyarrow",
                               batch_size=batch_size)
    return _score_pair_groups(out, pair_score, score_col)


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

    hashed = read_table(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(add_hash, batch_format="pyarrow", batch_size=8192)
    return bucketed_named_agg(hashed, ["h"],
                              {"keeper": ("doc_id", "min"),
                               "n_dups": ("doc_id", "size")}).sort("h")


SQL_DEDUP_EXACT = """
SELECT md5(text) AS h, CAST(MIN(doc_id) AS BIGINT) AS keeper, COUNT(*) AS n_dups
FROM documents GROUP BY 1 ORDER BY h
"""


# -- MinHash + LSH near-dup -------------------------------------------------

def _minhash_bands_fast(batch: pa.Table, a: np.ndarray,
                        b: np.ndarray) -> pa.Table:
    """Whole-batch vectorized sketch: ONE `_fast_hash64_many` call over
    every shingle in the batch, per-doc signature mins via
    ``np.minimum.reduceat``, band hashes via a Horner fold over the 4
    signature rows — no per-shingle (or even per-doc) Python hashing."""
    all_sh: list[str] = []
    starts: list[int] = []
    docs: list[int] = []
    for did, text in zip(batch.column("doc_id").to_pylist(),
                         batch.column("text").to_pylist()):
        sh = _shingles(text)
        if not sh:
            continue
        docs.append(did)
        starts.append(len(all_sh))
        all_sh.extend(sh)
    if not docs:
        return pa.table({"band": pa.array([], pa.int32()),
                         "bandhash": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64())})
    x = _fast_hash64_many(all_sh)
    # permute+min in doc-aligned chunks of ~4k shingles: hs stays ~2 MB
    # (cache/allocator-friendly); one (K, n_batch) outer product would be
    # >100 MB of fresh pages per batch and page-fault-bound across workers
    starts_np = np.asarray(starts, dtype=np.int64)
    bounds = np.concatenate([starts_np, [len(all_sh)]])
    sig_chunks = []
    lo = 0
    with np.errstate(over="ignore"):
        while lo < len(docs):
            hi = int(np.searchsorted(bounds, bounds[lo] + 4096, "left"))
            hi = min(max(hi, lo + 1), len(docs))
            xs = x[bounds[lo]:bounds[hi]]
            hs = a[:, None] * xs[None, :] + b[:, None]   # (K, ≤~4k)
            sig_chunks.append(np.minimum.reduceat(
                hs, starts_np[lo:hi] - bounds[lo], axis=1).T)
            lo = hi
    sigs = np.concatenate(sig_chunks)                    # (n_docs, K)
    seg = sigs.reshape(len(docs), MINHASH_BANDS, MINHASH_K // MINHASH_BANDS)
    with np.errstate(over="ignore"):
        acc = np.zeros(seg.shape[:2], dtype=np.uint64)
        for r in range(seg.shape[2]):
            acc = acc * _FAST_P + seg[:, :, r]
    bh = (_mix64(acc) & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
    band_ids = np.tile(np.arange(MINHASH_BANDS, dtype=np.int32), len(docs))
    doc_ids = np.repeat(np.asarray(docs, dtype=np.int64), MINHASH_BANDS)
    return pa.table({"band": pa.array(band_ids, pa.int32()),
                     "bandhash": pa.array(bh.reshape(-1), pa.int64()),
                     "doc_id": pa.array(doc_ids, pa.int64())})


def minhash_pairs(docs_ds, jaccard_threshold: float = 0.5, seed: int = 42,
                  hash_mode: str | None = None):
    """documents Dataset → verified near-dup pairs (a, b, jaccard).

    shingle → minhash → band → bucket groupby → candidate pairs →
    exact-Jaccard verify (ray_guide near-dup recipe). The verify is a
    DISTRIBUTED bucketed join: pair-side rows and candidate docs'
    shingle-hash lists are co-located by doc_id, then regrouped by pair —
    no whole-corpus broadcast (the only driver-side object is the candidate
    pair-membership map, which is small by construction and sharded past a
    budget; Jaccard over 64-bit shingle hashes equals Jaccard over shingles
    up to 64-bit collisions).

    ``hash_mode``: "fast" (default; vectorized polynomial+fmix64 sketch,
    oracle SQL_DEDUP_MINHASH) or "md5" (per-shingle md5, oracle
    SQL_DEDUP_MINHASH_MD5)."""
    mode = _hash_mode(hash_mode)
    a, b = _perm_params(MINHASH_K, seed)
    rows_per_band = MINHASH_K // MINHASH_BANDS

    def bands(batch: pa.Table) -> pa.Table:
        if mode == "fast":
            return _minhash_bands_fast(batch, a, b)
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

    # pair dedup (a pair can surface from several bands) happens inside
    # _verified_pair_join's membership build, which materializes the
    # candidates anyway — a dedicated distributed dedup pass here was one
    # whole extra shuffle execution for work the driver does for free
    candidates = bucketed_group_apply(
        docs_ds.map_batches(bands, batch_format="pyarrow", batch_size=4096),
        ["band", "bandhash"], bucket_pairs).materialize()

    def shingle_payload(batch: pa.Table, i: int) -> list[int]:
        # int64-safe low 63 bits (the mask is injective on the drawn hashes
        # up to the same 64-bit collision bound)
        sh = _shingles(batch.column("text")[i].as_py())
        if mode == "fast":
            return (_fast_hash64_many(list(sh))
                    & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64).tolist()
        return [_hash64(s) & 0x7FFFFFFFFFFFFFFF for s in sh]

    def jaccard_score(pa_payload, pb_payload) -> float | None:
        j = jaccard(set(pa_payload), set(pb_payload))
        # floor(x*1e6+0.5)/1e6 rather than round(): identical IEEE-double
        # steps in DuckDB, so the oracle hash matches bit-for-bit
        return math.floor(j * 1e6 + 0.5) / 1e6 if j >= jaccard_threshold \
            else None

    return _verified_pair_join(candidates, docs_ds, "doc_id",
                               shingle_payload, pa.list_(pa.int64()),
                               jaccard_score, score_col="jaccard")


def q_dedup_minhash(sf_dir: str):
    import ray.data as rd

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    return minhash_pairs(docs, hash_mode="fast")


def q_dedup_minhash_md5(sf_dir: str):
    """md5-sketch parity mode (the round-1..3 canonical variant)."""
    import ray.data as rd

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    return minhash_pairs(docs, hash_mode="md5")


def _sql_md5_64(expr: str) -> str:
    """DuckDB expression reproducing ``_hash64`` bit-for-bit."""
    return f"('0x' || substr(md5({expr}), 1, 16))::UBIGINT"


def _sql_perm_values() -> str:
    a, b = _perm_params(MINHASH_K, 42)
    return ", ".join(f"({k}, {int(a[k])}::UHUGEINT, {int(b[k])}::UHUGEINT)"
                     for k in range(MINHASH_K))


# Full MinHash+LSH in SQL: the 64 permutation params (seed 42) are inlined;
# UHUGEINT keeps a*h+b exact before the mod-2^64 wrap that numpy gets from
# uint64 overflow. Every stage — shingling, signature, band hashing, bucket
# pairing with the 500-doc skew guard, exact-Jaccard verification over
# 63-bit-masked shingle hashes — mirrors minhash_pairs() exactly.
#
# FAST mode (default): shingle hash = Horner/fmix64 over code points
# (reproducing _fast_hash64_many), band hash = the same fold over the 4
# signature values.
SQL_DEDUP_MINHASH = f"""
WITH perms AS (
  SELECT * FROM (VALUES {_sql_perm_values()}) AS t(k, a, b)
),
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS tl
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(tl, i, i + 2), ' ') AS s
  FROM (SELECT doc_id, tl, unnest(generate_series(1, len(tl) - 2)) AS i
        FROM toks WHERE len(tl) >= 3)
  UNION
  SELECT doc_id, array_to_string(tl, ' ') AS s
  FROM toks WHERE len(tl) BETWEEN 1 AND 2
),
shh AS (
  SELECT DISTINCT doc_id, fh AS h FROM (
    SELECT doc_id, {_sql_fast64_cols('s')}
    FROM sh)
),
sig AS (
  SELECT doc_id, p.k,
         min((p.a * h::UHUGEINT + p.b) % 18446744073709551616::UHUGEINT)
           ::UBIGINT AS sigv
  FROM shh CROSS JOIN perms p GROUP BY doc_id, p.k
),
bands AS (
  SELECT doc_id, k // 4 AS band,
         list(sigv::UHUGEINT ORDER BY k) AS seg
  FROM sig GROUP BY doc_id, k // 4
),
bandrows AS (
  SELECT doc_id, band, (fh & 9223372036854775807)::BIGINT AS bandhash FROM (
    SELECT doc_id, band, {_sql_fast64_list_cols('seg')}
    FROM bands)
),
bsize AS (
  SELECT band, bandhash, count(DISTINCT doc_id) AS n
  FROM bandrows GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bandrows x
  JOIN bandrows y USING (band, bandhash)
  JOIN bsize s USING (band, bandhash)
  WHERE x.doc_id < y.doc_id AND s.n BETWEEN 2 AND 500
),
doc_sh AS (
  SELECT DISTINCT doc_id, (h & 9223372036854775807)::BIGINT AS h63 FROM shh
),
sizes AS (SELECT doc_id, count(*) AS n FROM doc_sh GROUP BY doc_id),
inter AS (
  SELECT c.a, c.b, count(*) AS ninter
  FROM cand c
  JOIN doc_sh da ON da.doc_id = c.a
  JOIN doc_sh db ON db.doc_id = c.b AND db.h63 = da.h63
  GROUP BY c.a, c.b
),
scored AS (
  SELECT c.a, c.b,
         coalesce(i.ninter, 0)::DOUBLE
           / (sa.n + sb.n - coalesce(i.ninter, 0)) AS j
  FROM cand c
  LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
  JOIN sizes sa ON sa.doc_id = c.a
  JOIN sizes sb ON sb.doc_id = c.b
)
SELECT a, b, floor(j * 1000000 + 0.5) / 1000000 AS jaccard
FROM scored WHERE j >= 0.5 ORDER BY a, b
"""


SQL_DEDUP_MINHASH_MD5 = f"""
WITH perms AS (
  SELECT * FROM (VALUES {_sql_perm_values()}) AS t(k, a, b)
),
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS tl
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(list_slice(tl, i, i + 2), ' ') AS s
  FROM (SELECT doc_id, tl, unnest(generate_series(1, len(tl) - 2)) AS i
        FROM toks WHERE len(tl) >= 3)
  UNION
  SELECT doc_id, array_to_string(tl, ' ') AS s
  FROM toks WHERE len(tl) BETWEEN 1 AND 2
),
shh AS (
  SELECT DISTINCT doc_id, {_sql_md5_64('s')} AS h FROM sh
),
sig AS (
  SELECT doc_id, p.k,
         min((p.a * h::UHUGEINT + p.b) % 18446744073709551616::UHUGEINT)
           ::UBIGINT AS sigv
  FROM shh CROSS JOIN perms p GROUP BY doc_id, p.k
),
bands AS (
  SELECT doc_id, k // 4 AS band,
         string_agg(sigv::VARCHAR, ',' ORDER BY k) AS segstr
  FROM sig GROUP BY doc_id, k // 4
),
bandrows AS (
  SELECT doc_id, band,
         ({_sql_md5_64('segstr')} & 9223372036854775807)::BIGINT AS bandhash
  FROM bands
),
bsize AS (
  SELECT band, bandhash, count(DISTINCT doc_id) AS n
  FROM bandrows GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bandrows x
  JOIN bandrows y USING (band, bandhash)
  JOIN bsize s USING (band, bandhash)
  WHERE x.doc_id < y.doc_id AND s.n BETWEEN 2 AND 500
),
doc_sh AS (
  SELECT DISTINCT doc_id, (h & 9223372036854775807)::BIGINT AS h63 FROM shh
),
sizes AS (SELECT doc_id, count(*) AS n FROM doc_sh GROUP BY doc_id),
inter AS (
  SELECT c.a, c.b, count(*) AS ninter
  FROM cand c
  JOIN doc_sh da ON da.doc_id = c.a
  JOIN doc_sh db ON db.doc_id = c.b AND db.h63 = da.h63
  GROUP BY c.a, c.b
),
scored AS (
  SELECT c.a, c.b,
         coalesce(i.ninter, 0)::DOUBLE
           / (sa.n + sb.n - coalesce(i.ninter, 0)) AS j
  FROM cand c
  LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
  JOIN sizes sa ON sa.doc_id = c.a
  JOIN sizes sb ON sb.doc_id = c.b
)
SELECT a, b, floor(j * 1000000 + 0.5) / 1000000 AS jaccard
FROM scored WHERE j >= 0.5 ORDER BY a, b
"""


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


def simhash64_fast(text: str) -> int:
    """simhash64 with the vectorized polynomial token hash: one
    ``_fast_hash64_many`` call for the doc's distinct tokens, one (n,64)
    bit matmul — no per-token Python hashing. Oracle: SQL_DEDUP_SIMHASH."""
    from collections import Counter

    counts = Counter(_word_tokens(text))
    if not counts:
        return 0
    x = _fast_hash64_many(list(counts.keys()))
    cnt = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    bits = ((x[:, None] >> _BIT_POS[None, :]) & np.uint64(1)).astype(np.int64)
    acc = ((2 * bits - 1) * cnt[:, None]).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << _BIT_POS).sum(dtype=np.uint64))


def simhash_pairs(docs_ds, max_hamming: int = 3, hash_mode: str | None = None):
    """SimHash near-dup pairs via chunk LSH (pigeonhole: hamming ≤ 3 over 4
    chunks ⇒ at least one 16-bit chunk identical) + exact hamming verify.
    ``hash_mode`` picks the token hash: "fast" (default, vectorized) or
    "md5" (per-token md5 parity mode)."""
    import pandas as pd

    mode = _hash_mode(hash_mode)
    sig_of = simhash64_fast if mode == "fast" else simhash64

    def sketch(batch: pa.Table) -> pa.Table:
        out_chunk, out_val, out_doc, out_sig = [], [], [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            if not _TOK_RE.search(text.lower()):
                continue      # token-less doc: no sketch (mirrors the
                              # minhash shingle-less skip AND the SQL
                              # oracle, whose toks CTE emits no rows)
            sig = sig_of(text)
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

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    return simhash_pairs(docs, hash_mode="fast")


def q_dedup_simhash_md5(sf_dir: str):
    """md5-token-hash parity mode (the round-1..3 canonical variant)."""
    import ray.data as rd

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    return simhash_pairs(docs, hash_mode="md5")


# SimHash + chunk-LSH in SQL, mirroring simhash_pairs(): per-token 64-bit
# hash bit columns weighted by term count, sign → 64-bit signature, 16-bit
# chunk buckets (full signature, bit 63 included) with the 500-doc skew
# guard, exact hamming over the low-63-bit signatures. FAST token hash
# (default mode) here; md5 variant below.
SQL_DEDUP_SIMHASH = f"""
WITH toks AS (
  SELECT doc_id, tok, count(*) AS cnt
  FROM (SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
        FROM documents)
  GROUP BY doc_id, tok
),
tokh AS (
  SELECT doc_id, fh AS h, cnt FROM (
    SELECT doc_id, cnt, {_sql_fast64_cols('tok')}
    FROM toks)
),
bitsum AS (
  SELECT doc_id, p.p,
         sum(CASE WHEN (h >> p.p) & 1 = 1 THEN cnt ELSE -cnt END) AS acc
  FROM tokh CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS p) p
  GROUP BY doc_id, p.p
),
sigs AS (
  SELECT doc_id,
         sum(CASE WHEN acc > 0 THEN ((1::UBIGINT << p))::HUGEINT
                  ELSE 0 END)::UBIGINT AS sig
  FROM bitsum GROUP BY doc_id
),
chunks AS (
  SELECT doc_id,
         (sig & 9223372036854775807::UBIGINT)::BIGINT AS sig63,
         c.c AS chunk,
         ((sig >> (16 * c.c)) & 65535)::INT AS val
  FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS c) c
),
bsize AS (
  SELECT chunk, val, count(DISTINCT doc_id) AS n FROM chunks GROUP BY 1, 2
)
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       bit_count(xor(x.sig63, y.sig63))::BIGINT AS hamming
FROM chunks x
JOIN chunks y USING (chunk, val)
JOIN bsize s USING (chunk, val)
WHERE x.doc_id < y.doc_id AND s.n BETWEEN 2 AND 500
  AND bit_count(xor(x.sig63, y.sig63)) <= 3
ORDER BY a, b
"""


SQL_DEDUP_SIMHASH_MD5 = f"""
WITH toks AS (
  SELECT doc_id, tok, count(*) AS cnt
  FROM (SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok
        FROM documents)
  GROUP BY doc_id, tok
),
tokh AS (
  SELECT doc_id, {_sql_md5_64('tok')} AS h, cnt FROM toks
),
bitsum AS (
  SELECT doc_id, p.p,
         sum(CASE WHEN (h >> p.p) & 1 = 1 THEN cnt ELSE -cnt END) AS acc
  FROM tokh CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS p) p
  GROUP BY doc_id, p.p
),
sigs AS (
  SELECT doc_id,
         sum(CASE WHEN acc > 0 THEN ((1::UBIGINT << p))::HUGEINT
                  ELSE 0 END)::UBIGINT AS sig
  FROM bitsum GROUP BY doc_id
),
chunks AS (
  SELECT doc_id,
         (sig & 9223372036854775807::UBIGINT)::BIGINT AS sig63,
         c.c AS chunk,
         ((sig >> (16 * c.c)) & 65535)::INT AS val
  FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS c) c
),
bsize AS (
  SELECT chunk, val, count(DISTINCT doc_id) AS n FROM chunks GROUP BY 1, 2
)
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
       bit_count(xor(x.sig63, y.sig63))::BIGINT AS hamming
FROM chunks x
JOIN chunks y USING (chunk, val)
JOIN bsize s USING (chunk, val)
WHERE x.doc_id < y.doc_id AND s.n BETWEEN 2 AND 500
  AND bit_count(xor(x.sig63, y.sig63)) <= 3
ORDER BY a, b
"""


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

    emitted = read_table(sf_dir, "documents", ["doc_id", "text"]) \
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
EMB_BLOCK_ROWS = 4096


def embedding_pairs_exact(emb_ds, threshold: float = EMB_DUP_THRESHOLD,
                          label_col: str | None = "label",
                          block_rows: int = EMB_BLOCK_ROWS,
                          approx_rows: int | None = None):
    """EXACT same-label pairwise cosine ≥ threshold, memory-bounded.

    All-pairs at a low threshold (0.35 ≈ 70° apart — the oracle's semantics)
    is irreducibly O(n²) COMPARISONS, but it must not be O(n²) MEMORY: rows
    are hashed into fixed-size blocks and every block-PAIR (bi ≤ bj) is
    verified independently — a task holds at most two blocks (~2·block_rows
    rows), never a whole label group. Each row is replicated to its
    n_blocks block-pairs (the inherent shipping cost of exact all-pairs);
    for realistic near-dup thresholds (≥ ~0.8) use
    ``embedding_pairs_lsh``, which prunes instead of replicating."""
    n = approx_rows if approx_rows is not None else emb_ds.count()
    nb = max(1, -(-n // block_rows))

    def explode_blockpairs(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_pylist()
        labels = (b.column(label_col).to_pylist() if label_col
                  else [0] * len(ids))
        embs = b.column("embedding").to_pylist()
        out = {"lbl": [], "bi": [], "bj": [], "side": [],
               "vec_id": [], "embedding": []}
        for iid, lbl, e in zip(ids, labels, embs):
            mine = _h64s(f"v{iid}") % nb
            for other in range(nb):
                bi, bj = min(mine, other), max(mine, other)
                out["lbl"].append(lbl)
                out["bi"].append(bi)
                out["bj"].append(bj)
                out["side"].append(0 if mine == bi else 1)
                out["vec_id"].append(iid)
                out["embedding"].append(e)
        return pa.table({
            "lbl": pa.array(out["lbl"], pa.int64()),
            "bi": pa.array(out["bi"], pa.int32()),
            "bj": pa.array(out["bj"], pa.int32()),
            "side": pa.array(out["side"], pa.int32()),
            "vec_id": pa.array(out["vec_id"], pa.int64()),
            "embedding": pa.array(out["embedding"], pa.list_(pa.float32())),
        })

    def _norm(m: np.ndarray) -> np.ndarray:
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return m / norms

    def verify_blockpair(df: pd.DataFrame) -> pd.DataFrame:
        aa, bb = [], []
        for (_, bi, bj), g in df.groupby(["lbl", "bi", "bj"], sort=True):
            if bi == bj:
                ids = g.loc[g["side"] == 0, "vec_id"].to_numpy()
                m = _norm(np.stack(g.loc[g["side"] == 0, "embedding"]
                                   .to_numpy()).astype(np.float64))
                order = np.argsort(ids, kind="stable")
                ids = ids[order]
                sims = m[order] @ m[order].T
                ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
                aa.extend(ids[ii])
                bb.extend(ids[jj])
            else:
                gi = g[g["side"] == 0]
                gj = g[g["side"] == 1]
                if gi.empty or gj.empty:
                    continue
                ids_i = gi["vec_id"].to_numpy()
                ids_j = gj["vec_id"].to_numpy()
                mi = _norm(np.stack(gi["embedding"].to_numpy()).astype(np.float64))
                mj = _norm(np.stack(gj["embedding"].to_numpy()).astype(np.float64))
                ii, jj = np.nonzero(mi @ mj.T >= threshold)
                lo = np.minimum(ids_i[ii], ids_j[jj])
                hi = np.maximum(ids_i[ii], ids_j[jj])
                aa.extend(lo)
                bb.extend(hi)
        return pd.DataFrame({"a": pd.Series(aa, dtype="int64"),
                             "b": pd.Series(bb, dtype="int64")})

    from ..stages.shuffle import bucketed_group_apply

    # size buckets so one bucket holds only a few block-pair groups (memory
    # bound = groups-per-bucket × 2·block_rows rows)
    n_combos = max(1, nb * (nb + 1) // 2)
    nbuckets = int(min(512, max(32, n_combos)))
    exploded = emb_ds.map_batches(explode_blockpairs, batch_format="pyarrow",
                                  batch_size=2048)
    return bucketed_group_apply(exploded, ["lbl", "bi", "bj"],
                                verify_blockpair,
                                num_buckets=nbuckets).sort(["a", "b"])


def q_dedup_embedding(sf_dir: str):
    """Same-label pairwise cosine ≥ threshold over the embeddings table
    (exact block-pair path — see ``embedding_pairs_exact``)."""
    import ray.data as rd

    ds = read_table(sf_dir, "embeddings")
    return embedding_pairs_exact(ds)


def embedding_pairs_lsh(emb_ds, threshold: float = 0.9, seed: int = 42,
                        n_bands: int = 24, band_bits: int = 8,
                        id_col: str = "vec_id"):
    """Approximate embedding near-dup via sign-bit (random-hyperplane) LSH:
    band → bucket groupby → candidate pairs → exact-cosine verify through
    the bucketed pair join. The scale path for REAL near-dup thresholds:
    for cosine ≥ 0.9 the per-plane collision prob is 1 − acos(0.9)/π ≈ 0.86,
    so 24 bands × 8 bits give ~0.9997 recall while a band bucket holds only
    hash-colliding vectors (no all-pairs, no replication). NOT usable for
    the oracle's τ=0.35 (collision prob 0.61 → either no pruning or no
    recall — that regime is inherently all-pairs; use
    ``embedding_pairs_exact``)."""
    dim = len(emb_ds.take(1)[0]["embedding"])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bands * band_bits, dim))
    pow2 = (1 << np.arange(band_bits, dtype=np.int64))

    def bands(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column(id_col).to_pylist(), dtype=np.int64)
        if len(ids) == 0:
            return pa.table({"band": pa.array([], pa.int32()),
                             "val": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        m = np.stack(b.column("embedding").to_pylist()).astype(np.float64)
        bits = (m @ planes.T) > 0                      # (n, bands*bits)
        bits = bits.reshape(len(ids), n_bands, band_bits)
        vals = (bits * pow2).sum(axis=2)               # (n, bands)
        band_idx = np.broadcast_to(np.arange(n_bands, dtype=np.int32),
                                   vals.shape)
        return pa.table({
            "band": pa.array(band_idx.ravel(), pa.int32()),
            "val": pa.array(vals.astype(np.int64).ravel(), pa.int64()),
            "doc_id": pa.array(np.repeat(ids, n_bands), pa.int64())})

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        aa, bb = [], []
        for _, g in df.groupby(["band", "val"], sort=True):
            ids = sorted(set(int(x) for x in g["doc_id"]))
            if len(ids) < 2 or len(ids) > 500:   # skew guard
                continue
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    aa.append(ids[i])
                    bb.append(ids[j])
        return pd.DataFrame({"a": pd.Series(aa, dtype="int64"),
                             "b": pd.Series(bb, dtype="int64")})

    from ..stages.shuffle import bucketed_group_apply

    # pair dedup rides on _verified_pair_join's membership build (see
    # minhash_pairs) — no dedicated shuffle pass
    candidates = bucketed_group_apply(
        emb_ds.map_batches(bands, batch_format="pyarrow", batch_size=4096),
        ["band", "val"], bucket_pairs).materialize()

    def emb_payload(batch: pa.Table, i: int) -> list[float]:
        return batch.column("embedding")[i].as_py()

    def cosine_score(ea, eb) -> float | None:
        va = np.asarray(ea, dtype=np.float64)
        vb = np.asarray(eb, dtype=np.float64)
        na, nb_ = np.linalg.norm(va), np.linalg.norm(vb)
        if na == 0 or nb_ == 0:
            return None
        c = float(va @ vb / (na * nb_))
        return round(c, 6) if c >= threshold else None

    return _verified_pair_join(candidates, emb_ds, id_col, emb_payload,
                               pa.list_(pa.float32()), cosine_score,
                               score_col="cosine")


SQL_DEDUP_EMBEDDING = f"""
SELECT x.vec_id AS a, y.vec_id AS b
FROM embeddings x JOIN embeddings y
  ON x.label = y.label AND x.vec_id < y.vec_id
WHERE list_cosine_similarity(x.embedding, y.embedding) >= {EMB_DUP_THRESHOLD}
ORDER BY a, b
"""
