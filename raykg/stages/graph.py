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


def rewrite_ids(values, keys: "np.ndarray", roots: "np.ndarray") -> "np.ndarray":
    """Vectorized int64-exact map-with-default: ``out[i] = roots[j] if
    keys[j] == values[i] else values[i]`` via searchsorted over the sorted
    key array. Never round-trips through float64 — ``Series.map(dict)``
    + ``fillna`` coerces missing rows to float64 and corrupts 63-bit
    content-hash ids (the ADVICE r3 failure mode); this path stays int64
    end-to-end. ``keys`` must be sorted ascending (see ``sorted_id_map``)."""
    import numpy as np

    x = np.asarray(values, dtype=np.int64)
    if len(keys) == 0 or len(x) == 0:
        return x
    pos = np.searchsorted(keys, x)
    pos[pos == len(keys)] = 0           # out-of-range probes can't match
    hit = keys[pos] == x
    return np.where(hit, roots[pos], x)


def sorted_id_map(mapping) -> tuple["np.ndarray", "np.ndarray"]:
    """dict / parallel iterables → (sorted int64 keys, matching roots) for
    ``rewrite_ids``."""
    import numpy as np

    if isinstance(mapping, dict):
        keys = np.fromiter(mapping.keys(), dtype=np.int64, count=len(mapping))
        roots = np.fromiter(mapping.values(), dtype=np.int64, count=len(mapping))
    else:
        keys, roots = (np.asarray(mapping[0], dtype=np.int64),
                       np.asarray(mapping[1], dtype=np.int64))
    order = np.argsort(keys, kind="stable")
    return keys[order], roots[order]


def _dict_codes(col) -> tuple["np.ndarray", list]:
    """Dictionary-encode an Arrow string column → (int codes per row,
    distinct values). Per-row work stays in Arrow C++; Python only ever
    touches the DISTINCT values (Zipf ⇒ few per block)."""
    import numpy as np

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = col.dictionary_encode()
    return (np.asarray(d.indices, dtype=np.int64),
            d.dictionary.to_pylist())


def partial_edges(batch: pa.Table, alias_map: dict[int, int] | None = None) -> pd.DataFrame:
    """Combiner: triple rows → partial (src, pred, dst, weight, url_sample)
    rows — one per distinct edge per block. Vectorized end-to-end via
    dictionary encoding: surface→id mapping, validity filtering and the
    groupby all run on int codes; Python handles only the distinct
    surfaces, and url strings materialize only for the ~one winner per
    edge (the row-level ``to_pylist`` here was the top Python cost of the
    graph phase at ×96 scale)."""
    import numpy as np

    am = alias_map or {}
    s_codes, s_vals = _dict_codes(batch.column("subj"))
    o_codes, o_vals = _dict_codes(batch.column("obj"))
    p_codes, p_vals = _dict_codes(batch.column("pred"))

    def ids_of(vals: list) -> tuple[np.ndarray, np.ndarray]:
        # ids only for valid (non-empty-norm) surfaces: canonicalize drops
        # empty-norm surfaces, and dropping the matching endpoints here
        # keeps edge→node referential integrity (an edge to node_id("")
        # would dangle). Int64 end-to-end — a None in a pandas map dict
        # float64-coerces the column and corrupts 63-bit ids (ADVICE r3).
        ids = np.zeros(len(vals), dtype=np.int64)
        ok = np.zeros(len(vals), dtype=bool)
        for i, s in enumerate(vals):
            norm, nid = surface_key(s)
            if norm:
                ids[i] = am.get(nid, nid)
                ok[i] = True
        return ids, ok

    s_ids, s_ok = ids_of(s_vals)
    o_ids, o_ok = ids_of(o_vals)
    mask = s_ok[s_codes] & o_ok[o_codes]
    idx = np.flatnonzero(mask)
    df = pd.DataFrame({
        "src": s_ids[s_codes[idx]],
        "_p": p_codes[idx],
        "dst": o_ids[o_codes[idx]],
        "_row": idx,                          # original row → 'first' url
    })
    keys = ["src", "_p", "dst"]
    agg = df.groupby(keys, sort=False, as_index=False).agg(
        weight=("_row", "size"), _first=("_row", "first"))
    url_col = batch.column("url")
    if isinstance(url_col, pa.ChunkedArray):
        url_col = url_col.combine_chunks()
    out = pd.DataFrame({
        "src": agg["src"].astype("int64"),
        "pred": [p_vals[c] for c in agg["_p"]],
        "dst": agg["dst"].astype("int64"),
        "weight": agg["weight"].astype("int64"),
        "url_sample": url_col.take(
            pa.array(agg["_first"].to_numpy(), pa.int64())).to_pylist(),
    })
    return out


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
        lab = df["___kind"] == 1
        keys, roots = sorted_id_map((df.loc[lab, col].to_numpy(),
                                     df.loc[lab, "___root"].to_numpy()))
        out = df[df["___kind"] == 0].copy(deep=False)
        out[col] = rewrite_ids(out[col].to_numpy(), keys, roots)
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
        keys, roots = sorted_id_map(alias_map)

        def rewrite(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy(deep=False)
            df["src"] = rewrite_ids(df["src"].to_numpy(), keys, roots)
            df["dst"] = rewrite_ids(df["dst"].to_numpy(), keys, roots)
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
