"""Similarity search over the ``embeddings`` table.

- ``q_knn``: brute-force cosine top-k — the exact baseline. Query vector is
  broadcast once; each batch computes one numpy matmul; global top-k =
  sort-desc + limit over per-batch score rows (only (id, score) rows ever
  move, never embeddings).
- ``q_knn_ivf``: the scale path — an IVF-style index: vectors are assigned to
  coarse cells (sign-bit LSH code over hashed hyperplanes); the query probes
  only the nearest cells by code hamming distance. Approximate → no SQL
  oracle (rows-only driver check); recall vs the brute-force baseline is
  asserted in pytest on CLUSTERED synthetic data. PARTITIONING ASSUMPTION:
  IVF requires clusterable vectors — on uniform random embeddings (like the
  driver's synthetic table) recall degrades to ~probe_fraction, which is the
  information-theoretic floor for any coarse quantizer, not a bug.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

TOP_K = 10
QUERY_VEC_ID = 0
IVF_PLANES = 6            # 64 cells
IVF_PROBES = 8            # probe the 8 nearest cells


def _query_vector(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy()
    idx = int(np.nonzero(ids == QUERY_VEC_ID)[0][0])
    return np.asarray(t.column("embedding")[idx].as_py(), dtype=np.float64)


def q_knn(sf_dir: str):
    import ray
    import ray.data as rd

    q = _query_vector(sf_dir)
    qn = q / max(1e-12, np.linalg.norm(q))
    q_ref = ray.put(qn)

    def score(b: pa.Table) -> pd.DataFrame:
        qv = ray.get(q_ref)
        ids = b.column("vec_id").to_numpy()
        m = np.stack(b.column("embedding").to_pandas().to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        cos = (m @ qv) / norms
        keep = ids != QUERY_VEC_ID
        return pd.DataFrame({"vec_id": ids[keep].astype(np.int64),
                             "cos": cos[keep]})

    top = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"]) \
        .map_batches(score, batch_format="pyarrow", batch_size=8192) \
        .sort(["cos", "vec_id"], descending=[True, False]).limit(TOP_K)

    def rank(b: pa.Table) -> pa.Table:
        return pa.table({
            "vec_id": b.column("vec_id"),
            "rank": pa.array(range(1, b.num_rows + 1), pa.int64()),
        })

    return top.repartition(1).map_batches(rank, batch_format="pyarrow")


SQL_KNN = f"""
SELECT vec_id, CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
FROM (
  SELECT y.vec_id,
         list_cosine_similarity(y.embedding,
             (SELECT embedding FROM embeddings WHERE vec_id = {QUERY_VEC_ID})) AS cos
  FROM embeddings y WHERE y.vec_id != {QUERY_VEC_ID})
ORDER BY cos DESC, vec_id
LIMIT {TOP_K}
"""


class _IvfIndexer:
    """Actor UDF: assigns vectors to IVF cells (state: hyperplanes)."""

    def __init__(self, dim: int, seed: int = 42) -> None:
        rng = np.random.default_rng(seed ^ 0x1BF)
        self.planes = rng.standard_normal((dim, IVF_PLANES))

    def __call__(self, b: pa.Table) -> pa.Table:
        m = np.stack(b.column("embedding").to_pandas().to_numpy()).astype(np.float64)
        codes = (((m @ self.planes) > 0)
                 * (1 << np.arange(IVF_PLANES))).sum(axis=1).astype(np.int64)
        return pa.table({"vec_id": b.column("vec_id"),
                         "embedding": b.column("embedding"),
                         "cell": pa.array(codes, pa.int64())})


def q_knn_ivf(sf_dir: str):
    """IVF probe: only batches' rows whose cell is within the probe set are
    scored — the filter prunes before any matmul."""
    import ray
    import ray.data as rd

    q = _query_vector(sf_dir)
    qn = q / max(1e-12, np.linalg.norm(q))
    dim = len(q)
    rng = np.random.default_rng(42 ^ 0x1BF)
    planes = rng.standard_normal((dim, IVF_PLANES))
    q_code = int((((qn @ planes) > 0) * (1 << np.arange(IVF_PLANES))).sum())
    cells = sorted(range(1 << IVF_PLANES),
                   key=lambda c: (bin(c ^ q_code).count("1"), c))[:IVF_PROBES]
    probe = set(cells)
    q_ref = ray.put(qn)

    def score_probed(b: pa.Table) -> pd.DataFrame:
        qv = ray.get(q_ref)
        cells_col = b.column("cell").to_numpy()
        mask = np.isin(cells_col, list(probe))
        ids = b.column("vec_id").to_numpy()[mask]
        if len(ids) == 0:
            return pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                 "cos": pd.Series([], dtype="float64")})
        emb = b.column("embedding").to_pandas().to_numpy()[mask]
        m = np.stack(emb).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        cos = (m @ qv) / norms
        keep = ids != QUERY_VEC_ID
        return pd.DataFrame({"vec_id": ids[keep].astype(np.int64),
                             "cos": cos[keep]})

    indexed = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"]) \
        .map_batches(_IvfIndexer, fn_constructor_kwargs={"dim": dim},
                     batch_format="pyarrow", batch_size=8192, concurrency=2)
    top = indexed.map_batches(score_probed, batch_format="pyarrow") \
        .sort(["cos", "vec_id"], descending=[True, False]).limit(TOP_K)

    def rank(b: pa.Table) -> pa.Table:
        return pa.table({
            "vec_id": b.column("vec_id"),
            "rank": pa.array(range(1, b.num_rows + 1), pa.int64()),
        })

    return top.repartition(1).map_batches(rank, batch_format="pyarrow")
