"""Stage 9: graph materialize — sorted node/edge Parquet.

Because ``node_id`` is a content hash of the canonical surface
(raykg.core.canonical.node_id), mapping a triple's subj/obj surface to its
node id is a PURE FUNCTION — no join, no shuffle, no broadcast dictionary
(SURVEY.md §7.3 contemplated a hash join / broadcast; content addressing
eliminates it). The only wide ops here are:

- edge aggregation: in-batch combiner on (src, pred, dst) over WHOLE blocks
  (``batch_size=None`` — small batches barely combine and were measured to
  push 15M partial rows into the shuffle), then a bucketized merge
  (raykg.stages.shuffle), and
- the final ``sort`` on (src, pred, dst) — a global range shuffle over
  aggregated edges only, never raw triples.

Edge url provenance is a bounded SAMPLE (≤ _MAX_URLS): each combiner emits
one representative url per edge per block; the merge unions and caps. An
exhaustive url list would make hot edges (head-of-Zipf entity pairs) into
unbounded rows — a deliberate scale tradeoff, documented in the schema.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..core.canonical import surface_key

_MAX_URLS = 8


def partial_edges(batch: pa.Table, alias_map: dict[int, int] | None = None) -> pd.DataFrame:
    """Combiner: triple rows → partial (src, pred, dst, weight, url_sample)
    rows — one per distinct edge per block, fully vectorized except the
    distinct-surface id map (Zipf ⇒ few distinct per block)."""
    am = alias_map or {}
    df = pd.DataFrame({
        "subj": batch.column("subj").to_pylist(),
        "pred": batch.column("pred").to_pylist(),
        "obj": batch.column("obj").to_pylist(),
        "url": batch.column("url").to_pylist(),
    })
    uniq = pd.unique(pd.concat([df["subj"], df["obj"]], ignore_index=True))
    # idmap holds ONLY valid (non-empty-norm) surfaces so its values are all
    # int: pandas coerces a dict with any None value to float64 internally,
    # which silently corrupts 63-bit node ids (2**53 float mantissa). Rows
    # whose endpoint is missing from idmap are dropped BEFORE mapping —
    # canonicalize drops empty-norm surfaces, and dropping the matching
    # endpoints here keeps edge→node referential integrity (an edge to
    # node_id("") would dangle).
    idmap: dict = {}
    for s in uniq:
        norm, nid = surface_key(s)
        if norm:
            idmap[s] = am.get(nid, nid)
    df = df[df["subj"].isin(idmap) & df["obj"].isin(idmap)]
    df = df.assign(src=df["subj"].map(idmap).astype("int64"),
                   dst=df["obj"].map(idmap).astype("int64"))
    keys = ["src", "pred", "dst"]
    agg = df.groupby(keys, sort=False, as_index=False).agg(
        weight=("url", "size"), url_sample=("url", "first"))
    agg["weight"] = agg["weight"].astype("int64")
    return agg


def _merge_edge_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized in-bucket merge: weight by groupby-sum; url sample = up to
    _MAX_URLS distinct urls per edge via drop_duplicates + cumcount (the
    only per-key Python is the final tiny list agg)."""
    keys = ["src", "pred", "dst"]
    weights = df.groupby(keys, sort=False, as_index=False)["weight"].sum()
    u = df[keys + ["url_sample"]].drop_duplicates()
    u = u.sort_values(keys + ["url_sample"], kind="stable")
    u = u[u.groupby(keys).cumcount() < _MAX_URLS]
    urls = u.groupby(keys, sort=False)["url_sample"].agg(list).rename("urls") \
        .reset_index()
    out = weights.merge(urls, on=keys, how="left")
    out["weight"] = out["weight"].astype("int64")
    return out[["src", "pred", "dst", "weight", "urls"]]


def aggregate_edges(triples_ds, alias_map: dict[int, int] | None = None,
                    num_buckets: int = 32):
    """triples → UNSORTED aggregated edges. With ``alias_map=None`` this has
    no dependency on the canonicalization path, so it can run CONCURRENTLY
    with it; apply the (tiny) alias rewrite afterwards via
    ``finalize_edges``."""
    from .shuffle import bucketed_group_apply

    partials = triples_ds.map_batches(
        lambda b: partial_edges(b, alias_map), batch_format="pyarrow",
        batch_size=None)
    return bucketed_group_apply(partials, ["src", "pred", "dst"],
                                _merge_edge_bucket, num_buckets)


def _remerge_edge_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Re-merge edges sharing a (rewritten) key: weight sums, url samples
    deduped/re-capped. Shared by the broadcast-dict and bucketized-join
    alias paths — byte-identical output by construction."""
    keys = ["src", "pred", "dst"]
    weights = df.groupby(keys, sort=False, as_index=False)["weight"].sum()
    u = df[keys + ["urls"]].explode("urls").drop_duplicates()
    u = u.sort_values(keys + ["urls"], kind="stable")
    u = u[u.groupby(keys).cumcount() < _MAX_URLS]
    urls = u.groupby(keys, sort=False)["urls"].agg(list).reset_index()
    out = weights.merge(urls, on=keys, how="left")
    out["weight"] = out["weight"].astype("int64")
    return out[["src", "pred", "dst", "weight", "urls"]]


def _rewrite_edge_col_join(edges_ds, alias_ds, col: str,
                           num_buckets: int = 32):
    """Bucketized hash-join rewrite of one edge endpoint column through a
    (node, root) Dataset — the alias map never touches the driver
    (VERDICT r2 #7). Tagged union: map rows build the key→root dict inside
    each bucket; edge rows probe it."""
    from .shuffle import bucketed_group_apply

    other = {"src": "dst", "dst": "src"}[col]

    def map_rows(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        return pd.DataFrame({
            col: df["node"].astype("int64"),
            "pred": [""] * n,
            other: pd.Series([0] * n, dtype="int64"),
            "weight": pd.Series([0] * n, dtype="int64"),
            "urls": [[] for _ in range(n)],
            "___root": df["root"].astype("int64"),
            "___kind": pd.Series([1] * n, dtype="int32")})

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        # normalize arrow-list round-trip artifacts so the block converts
        # back to Arrow cleanly downstream
        df["urls"] = [list(u) for u in df["urls"]]
        df["___root"] = pd.Series([0] * len(df), dtype="int64", index=df.index)
        df["___kind"] = pd.Series([0] * len(df), dtype="int32", index=df.index)
        return df

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        m = dict(zip(df.loc[df["___kind"] == 1, col],
                     df.loc[df["___kind"] == 1, "___root"]))
        out = df[df["___kind"] == 0].copy(deep=False)
        out[col] = out[col].map(lambda x: m.get(x, x)).astype("int64")
        return out.drop(columns=["___root", "___kind"])

    tagged = edges_ds.map_batches(edge_rows, batch_format="pandas") \
        .union(alias_ds.map_batches(map_rows, batch_format="pandas"))
    return bucketed_group_apply(tagged, [col], join_bucket,
                                num_buckets=num_buckets)


def finalize_edges(edges_ds, alias_map=None,
                   approx_rows: int | None = None):
    """Rewrite aggregated edges through the alias map (post-aggregation —
    sums are associative, url samples re-capped) and sort. Aggregating by
    pre-merge ids first is what lets edge aggregation overlap the
    canonicalization shuffle.

    ``alias_map`` is a broadcastable dict (node → root) or a Dataset of
    (node, root) rows for maps beyond driver memory — the src and dst
    endpoints are then rewritten by two bucketized hash-joins before the
    same re-merge, so both paths produce identical edges."""
    if alias_map is not None and not isinstance(alias_map, dict):
        rewritten = _rewrite_edge_col_join(
            _rewrite_edge_col_join(edges_ds, alias_map, "src"),
            alias_map, "dst")
        from .shuffle import adaptive_sort, bucketed_group_apply

        remerged = bucketed_group_apply(rewritten, ["src", "pred", "dst"],
                                        _remerge_edge_bucket, num_buckets=8)
        return adaptive_sort(remerged, ["src", "pred", "dst"],
                             approx_rows=approx_rows)
    if alias_map:
        am = alias_map

        def rewrite(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy(deep=False)
            df["src"] = df["src"].map(lambda x: am.get(int(x), int(x)))
            df["dst"] = df["dst"].map(lambda x: am.get(int(x), int(x)))
            return df

        from .shuffle import bucketed_group_apply

        edges_ds = bucketed_group_apply(
            edges_ds.map_batches(rewrite, batch_format="pandas"),
            ["src", "pred", "dst"], _remerge_edge_bucket, num_buckets=8)
    from .shuffle import adaptive_sort

    return adaptive_sort(edges_ds, ["src", "pred", "dst"],
                         approx_rows=approx_rows)


def materialize_edges(triples_ds, alias_map: dict[int, int] | None = None,
                      num_buckets: int = 32):
    """triples Dataset → edges Dataset sorted by (src, pred, dst).
    Single-call convenience: aggregate (with the map applied in the
    combiner) then sort (adaptive — aggregated edge sets are usually below
    the range-shuffle threshold)."""
    from .shuffle import adaptive_sort

    return adaptive_sort(aggregate_edges(triples_ds, alias_map, num_buckets),
                         ["src", "pred", "dst"])


def materialize_nodes(nodes_ds, approx_rows: int | None = None):
    """nodes Dataset → sorted by node_id (stable graph output layout;
    single-task sort below the small-data threshold)."""
    from .shuffle import adaptive_sort

    return adaptive_sort(nodes_ds, ["node_id"], approx_rows=approx_rows)
