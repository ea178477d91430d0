"""Stage 9: graph materialize — sorted node/edge Parquet.

Because ``node_id`` is a content hash of the canonical surface
(raykg.core.canonical.node_id), mapping a triple's subj/obj surface to its
node id is a PURE FUNCTION — no join, no shuffle, no broadcast dictionary
(SURVEY.md §7.3 contemplated a hash join / broadcast; content addressing
eliminates it). The only wide ops here are:

- edge aggregation: in-batch combiner on (src, pred, dst) → groupby over
  partials (same two-phase shape as canonicalization), and
- the final ``sort`` on (src, pred, dst) — a global range shuffle, last.
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa

from ..core.canonical import node_id, normalize_surface
from ..schemas import EDGES

_MAX_URLS = 8


def partial_edges(batch: pa.Table, alias_map: dict[int, int] | None = None) -> pa.Table:
    """Combiner: triple rows → partial (src, pred, dst, weight, urls) rows.

    The surface→node_id map is pure; ``alias_map`` (root rewrites from alias
    merging, broadcast once via ray.put) is applied here so edges aggregate
    onto merged nodes."""
    am = alias_map or {}
    subs = batch.column("subj").to_pylist()
    preds = batch.column("pred").to_pylist()
    objs = batch.column("obj").to_pylist()
    urls = batch.column("url").to_pylist()
    from ..core.canonical import surface_key

    acc: dict[tuple[int, str, int], tuple[int, set]] = {}
    for s, p, o, u in zip(subs, preds, objs, urls):
        sid = surface_key(s)[1]
        oid = surface_key(o)[1]
        sid = am.get(sid, sid)
        oid = am.get(oid, oid)
        key = (sid, p, oid)
        got = acc.get(key)
        if got is None:
            acc[key] = got = (0, set())
        w, us = got
        if len(us) < _MAX_URLS:
            us.add(u)
        acc[key] = (w + 1, us)
    keys = sorted(acc)
    return pa.table({
        "src": pa.array([k[0] for k in keys], pa.int64()),
        "pred": pa.array([k[1] for k in keys], pa.string()),
        "dst": pa.array([k[2] for k in keys], pa.int64()),
        "weight": pa.array([acc[k][0] for k in keys], pa.int64()),
        "urls": pa.array([json.dumps(sorted(acc[k][1])) for k in keys], pa.string()),
    })


def _merge_edge_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized in-bucket merge: weights by groupby-sum; url sets merged
    per edge key (keys, not partial rows, bound the Python work)."""
    keys = ["src", "pred", "dst"]
    weights = df.groupby(keys, sort=True)["weight"].sum()
    out = {"src": [], "pred": [], "dst": [], "weight": [], "urls": []}
    for key, sub in df.groupby(keys, sort=True):
        urls: set[str] = set()
        for s in sub["urls"]:
            urls.update(json.loads(s))
        out["src"].append(int(key[0]))
        out["pred"].append(key[1])
        out["dst"].append(int(key[2]))
        out["weight"].append(int(weights.loc[key]))
        out["urls"].append(sorted(urls)[:_MAX_URLS])
    return pd.DataFrame(out)


def materialize_edges(triples_ds, alias_map: dict[int, int] | None = None,
                      num_buckets: int = 32):
    """triples Dataset → edges Dataset sorted by (src, pred, dst).

    Combiner → bucketized groupby (raykg.stages.shuffle) → global sort; the
    sort ranges over aggregated edges, never raw triples."""
    from .shuffle import bucketed_group_apply

    partials = triples_ds.map_batches(
        lambda b: partial_edges(b, alias_map), batch_format="pyarrow")
    edges = bucketed_group_apply(partials, ["src", "pred", "dst"],
                                 _merge_edge_bucket, num_buckets)
    return edges.sort(["src", "pred", "dst"])


def materialize_nodes(nodes_ds):
    """nodes Dataset → sorted by node_id (stable graph output layout)."""
    return nodes_ds.sort("node_id")
