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
