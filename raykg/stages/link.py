"""Stage 6: entity linking — ANN index held in stateful actors (north rule).

The catalog (canonical surfaces + node ids from the canonicalization stage)
is broadcast ONCE via ``ray.put``; every LinkerActor reads the object ref in
``__init__``, builds its numpy index once, and serves batch lookups in
``__call__`` — never re-shipped per batch (SURVEY.md §2.3 L1).

Two lookup paths behind one class:
- **brute-force** (default at small catalog): one f32 matmul per batch
  against the full catalog — the exact baseline;
- **LSH-bucketed** (scale path, ``use_lsh=True``): catalog pre-bucketed by
  sign-bit LSH; a query probes only its own bucket plus single-bit-flip
  neighbors (multi-probe), turning O(catalog) per query into O(bucket).

Cosine semantics mirror the reference similarity scorer
(/root/reference/Sources/GLiNERSwift/Inference/SimilarityScorer.swift:77-110).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core.canonical import SurfaceEmbedder

_N_PLANES = 12


def build_catalog(nodes_ds, seed: int = 42) -> dict:
    """Materialize the (small) node catalog into plain numpy arrays suitable
    for ``ray.put``. The catalog is the distinct-entity set — orders of
    magnitude smaller than the corpus; at 10^12-doc scale it would be
    sharded by LSH bucket across linker actors instead (documented path)."""
    emb = SurfaceEmbedder(seed)
    surfaces: list[str] = []
    ids: list[int] = []
    for batch in nodes_ds.select_columns(["node_id", "canonical"]) \
            .iter_batches(batch_size=65536, batch_format="pyarrow"):
        surfaces.extend(batch.column("canonical").to_pylist())
        ids.extend(batch.column("node_id").to_pylist())
    mat = emb.embed_many(surfaces).astype(np.float32)
    return {"surfaces": surfaces, "node_ids": np.asarray(ids, dtype=np.int64),
            "emb": mat, "seed": seed}


class LinkerActor:
    """map_batches actor: mention rows → mention rows + (entity_id, link_score)."""

    def __init__(self, catalog_ref, use_lsh: bool = False,
                 min_score: float = 0.0) -> None:
        import ray

        cat = ray.get(catalog_ref) if not isinstance(catalog_ref, dict) else catalog_ref
        self.embedder = SurfaceEmbedder(cat["seed"])
        self.node_ids: np.ndarray = cat["node_ids"]
        self.emb: np.ndarray = cat["emb"]            # (N, d) unit rows
        self.min_score = min_score
        self.use_lsh = use_lsh and len(self.node_ids) > 0
        self._q_cache: dict[str, tuple[int, float]] = {}
        if self.use_lsh:
            rng = np.random.default_rng(cat["seed"] ^ 0x157)
            self.planes = rng.standard_normal((self.emb.shape[1], _N_PLANES)) \
                .astype(np.float32)
            bits = (self.emb @ self.planes) > 0
            codes = (bits * (1 << np.arange(_N_PLANES))).sum(axis=1)
            self.buckets: dict[int, np.ndarray] = {}
            order = np.argsort(codes, kind="stable")
            codes_sorted = codes[order]
            starts = np.searchsorted(codes_sorted, np.unique(codes_sorted), "left")
            ends = np.append(starts[1:], len(codes_sorted))
            for c, a, b in zip(np.unique(codes_sorted), starts, ends):
                self.buckets[int(c)] = order[a:b]

    def _lookup_many(self, surfaces: list[str]) -> tuple[np.ndarray, np.ndarray]:
        n = len(surfaces)
        out_id = np.full(n, -1, dtype=np.int64)
        out_sc = np.zeros(n, dtype=np.float32)
        if len(self.node_ids) == 0 or n == 0:
            return out_id, out_sc
        # per-actor query cache: surfaces repeat heavily (Zipf)
        miss_idx = [i for i, s in enumerate(surfaces) if s not in self._q_cache]
        if miss_idx:
            q = self.embedder.embed_many([surfaces[i] for i in miss_idx]) \
                .astype(np.float32)
            if not self.use_lsh:
                sims = q @ self.emb.T                       # brute-force baseline
                best = sims.argmax(axis=1)
                for k, i in enumerate(miss_idx):
                    self._q_cache[surfaces[i]] = (int(best[k]),
                                                  float(sims[k, best[k]]))
            else:
                qb = (q @ self.planes) > 0
                qcodes = (qb * (1 << np.arange(_N_PLANES))).sum(axis=1)
                for k, i in enumerate(miss_idx):
                    code = int(qcodes[k])
                    cand = [self.buckets.get(code)]
                    for bit in range(_N_PLANES):            # multi-probe: 1-bit flips
                        cand.append(self.buckets.get(code ^ (1 << bit)))
                    idx = np.concatenate([c for c in cand if c is not None]) \
                        if any(c is not None for c in cand) else np.arange(len(self.node_ids))
                    sims = self.emb[idx] @ q[k]
                    j = int(sims.argmax())
                    self._q_cache[surfaces[i]] = (int(idx[j]), float(sims[j]))
        for i, s in enumerate(surfaces):
            j, sc = self._q_cache[s]
            if sc >= self.min_score:
                out_id[i] = self.node_ids[j]
                out_sc[i] = sc
        return out_id, out_sc

    def __call__(self, batch: pa.Table) -> pa.Table:
        surfaces = batch.column("text").to_pylist()
        ids, scores = self._lookup_many(surfaces)
        return batch.append_column("entity_id", pa.array(ids, pa.int64())) \
                    .append_column("link_score", pa.array(scores, pa.float32()))


def link_mentions(mentions_ds, catalog_ref, concurrency: int = 4,
                  batch_size: int = 4096, use_lsh: bool = False):
    """mentions Dataset → links Dataset via the LinkerActor pool."""
    return mentions_ds.map_batches(
        LinkerActor,
        fn_constructor_kwargs={"catalog_ref": catalog_ref, "use_lsh": use_lsh},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)


# -- beyond-memory catalogs: shard by LSH bucket ----------------------------

def build_sharded_catalog(nodes_ds, n_shards: int = 4, seed: int = 42) -> list:
    """Catalog too big for one worker's heap → split it into ``n_shards``
    sub-catalogs by the TOP ``log2(n_shards)`` bits of each entry's sign-bit
    LSH code, each ``ray.put`` separately. A linking task then pulls ONLY
    its shard (object-store locality: on a cluster every node caches just
    the shards its tasks probe), so per-task memory is catalog/n_shards.

    ``n_shards`` must be a power of two ≤ 2^_N_PLANES."""
    import ray

    k = max(1, (n_shards - 1).bit_length())
    assert n_shards == 1 << k and n_shards <= 1 << _N_PLANES
    emb = SurfaceEmbedder(seed)
    surfaces: list[str] = []
    ids: list[int] = []
    for batch in nodes_ds.select_columns(["node_id", "canonical"]) \
            .iter_batches(batch_size=65536, batch_format="pyarrow"):
        surfaces.extend(batch.column("canonical").to_pylist())
        ids.extend(batch.column("node_id").to_pylist())
    mat = emb.embed_many(surfaces).astype(np.float32)
    rng = np.random.default_rng(seed ^ 0x157)
    planes = rng.standard_normal((mat.shape[1], _N_PLANES)).astype(np.float32)
    codes = (((mat @ planes) > 0) * (1 << np.arange(_N_PLANES))).sum(axis=1)
    shard_of = (codes >> (_N_PLANES - k)).astype(np.int64)
    refs = []
    for s in range(n_shards):
        m = shard_of == s
        refs.append(ray.put({
            "surfaces": [surfaces[i] for i in np.nonzero(m)[0]],
            "node_ids": np.asarray(ids, dtype=np.int64)[m],
            "emb": mat[m], "codes": codes[m], "seed": seed,
        }))
    return refs


def link_mentions_sharded(mentions_ds, shard_refs: list, seed: int = 42,
                          num_buckets: int = 32):
    """The 10^12-entity linking path: probe-side routing + per-shard link +
    best-of merge, all as Dataset ops.

    1. A stateless pass embeds each mention surface once, computes its LSH
       code and the DISTINCT shards reachable by single-bit multi-probe
       (flips below the shard prefix stay in-shard, so a probe set is at
       most ``log2(n_shards)+1`` shards — bounded replication), emitting
       one routed row per (mention, shard) with the query vector attached.
    2. ``groupby(shard).map_groups``: one task per shard pulls ITS
       sub-catalog ref, rebuilds the bucket index for the shard (cost
       amortized over every routed mention in the group) and scores each
       query against the probe buckets of that shard only.
    3. Best link per mention via the bucketized argmax (ties → smaller
       entity_id — deterministic).

    Semantics vs the single-actor LSH path: identical candidate set
    (bucket ∪ 1-bit flips, now unioned across probed shards), except the
    degenerate no-candidate fallback scans only the probed shards rather
    than the whole catalog (documented deviation — at sharded scale a full
    scan is exactly what must never happen)."""
    import pandas as pd

    from .shuffle import bucketed_group_apply

    k = max(1, (len(shard_refs) - 1).bit_length())
    emb_seed = seed

    def route(batch: pa.Table) -> pa.Table:
        embd = SurfaceEmbedder(emb_seed)
        surfaces = batch.column("text").to_pylist()
        if not surfaces:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "start": pa.array([], pa.int64()),
                             "shard": pa.array([], pa.int64()),
                             "code": pa.array([], pa.int64()),
                             "q": pa.array([], pa.list_(pa.float32()))})
        rng = np.random.default_rng(emb_seed ^ 0x157)
        q = embd.embed_many(surfaces).astype(np.float32)
        planes = rng.standard_normal((q.shape[1], _N_PLANES)).astype(np.float32)
        codes = (((q @ planes) > 0) * (1 << np.arange(_N_PLANES))).sum(axis=1)
        doc_ids = batch.column("doc_id").to_pylist()
        starts = batch.column("start").to_pylist()
        out = {"doc_id": [], "start": [], "shard": [], "code": [], "q": []}
        for i, code in enumerate(codes):
            code = int(code)
            shards = {code >> (_N_PLANES - k)}
            for bit in range(_N_PLANES):
                shards.add((code ^ (1 << bit)) >> (_N_PLANES - k))
            for s in sorted(shards):
                out["doc_id"].append(doc_ids[i])
                out["start"].append(starts[i])
                out["shard"].append(s)
                out["code"].append(code)
                out["q"].append(q[i])
        return pa.table({"doc_id": pa.array(out["doc_id"], pa.int64()),
                         "start": pa.array(out["start"], pa.int64()),
                         "shard": pa.array(out["shard"], pa.int64()),
                         "code": pa.array(out["code"], pa.int64()),
                         "q": pa.array(out["q"], pa.list_(pa.float32()))})

    def link_shard(df: pd.DataFrame) -> pd.DataFrame:
        import ray

        shard = int(df["shard"].iloc[0])
        cat = ray.get(shard_refs[shard])        # ONLY this shard's catalog
        codes_cat = cat["codes"]
        buckets: dict[int, np.ndarray] = {}
        order = np.argsort(codes_cat, kind="stable")
        cs = codes_cat[order]
        uniq = np.unique(cs)
        starts_ = np.searchsorted(cs, uniq, "left")
        ends_ = np.append(starts_[1:], len(cs))
        for c, a, b in zip(uniq, starts_, ends_):
            buckets[int(c)] = order[a:b]
        rows = {"doc_id": [], "start": [], "entity_id": [], "link_score": []}
        for doc_id, start, code, qv in zip(df["doc_id"], df["start"],
                                           df["code"], df["q"]):
            code = int(code)
            cand = [buckets.get(code)]
            for bit in range(_N_PLANES):
                cand.append(buckets.get(code ^ (1 << bit)))
            cand = [c for c in cand if c is not None]
            if not cand:
                continue
            idx = np.concatenate(cand)
            sims = cat["emb"][idx] @ np.asarray(qv, dtype=np.float32)
            j = int(sims.argmax())
            rows["doc_id"].append(int(doc_id))
            rows["start"].append(int(start))
            rows["entity_id"].append(int(cat["node_ids"][idx[j]]))
            rows["link_score"].append(float(sims[j]))
        return pd.DataFrame({
            "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
            "start": pd.Series(rows["start"], dtype="int64"),
            "entity_id": pd.Series(rows["entity_id"], dtype="int64"),
            "link_score": pd.Series(rows["link_score"], dtype="float64")})

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "start", "link_score", "entity_id"],
                            ascending=[True, True, False, True], kind="stable")
        return df.drop_duplicates(["doc_id", "start"], keep="first")

    routed = mentions_ds.map_batches(route, batch_format="pyarrow",
                                     batch_size=4096)
    linked = routed.groupby("shard").map_groups(link_shard,
                                                batch_format="pandas")
    return bucketed_group_apply(linked, ["doc_id", "start"], best,
                                num_buckets=num_buckets)
