"""Relational pipelines over the TPC-H-ish tables — the generic operator
layer (read-prune → vectorized map_batches → pre-aggregated groupby →
broadcast join → sort) with exact DuckDB oracles.

Aggregates that sum floats use INTEGER-EXACT encodings (quantities are
integral; prices are exact at 2 decimals — verified on the data): summation
order then cannot perturb the driver's value-hash comparison.
"""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.tables import read_table
import pyarrow.compute as pc


def q_lineitem_agg(sf_dir: str):
    """TPC-H Q1-shaped aggregate: pre-aggregate per batch (combiner), then a
    tiny groupby over partials. Columns pruned at the read."""
    import ray.data as rd

    from ..stages.shuffle import bucketed_named_agg

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"])

    cutoff = datetime(1996, 1, 1)

    def partial(b: pa.Table) -> pd.DataFrame:
        t = b.filter(pc.less(b.column("l_shipdate"), pa.scalar(cutoff)))
        df = pd.DataFrame({
            "l_returnflag": t.column("l_returnflag").to_pandas(),
            "l_linestatus": t.column("l_linestatus").to_pandas(),
            "qty": t.column("l_quantity").to_numpy().astype(np.int64),
            "rev_e4": np.round(t.column("l_extendedprice").to_numpy()
                               * (1.0 - t.column("l_discount").to_numpy())
                               * 10000).astype(np.int64),
        })
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty", "sum"), revenue_e4=("rev_e4", "sum"), n=("qty", "size"))
        return g

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return bucketed_named_agg(
        partials, ["l_returnflag", "l_linestatus"],
        {"sum_qty": ("sum_qty", "sum"), "revenue_e4": ("revenue_e4", "sum"),
         "n": ("n", "sum")}).sort(["l_returnflag", "l_linestatus"])


SQL_LINEITEM_AGG = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_mktsegment_orders(sf_dir: str):
    """orders ⋈ customer as a BROADCAST join: the dimension side is read once
    and captured; no shuffle of the fact table (SURVEY.md §2.6)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..stages.shuffle import bucketed_named_agg

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    seg_map_ref = ray.put(dict(zip(cust.column("c_custkey").to_pylist(),
                                   cust.column("c_mktsegment").to_pylist())))

    def join_agg(b: pa.Table) -> pd.DataFrame:
        seg_map = ray.get(seg_map_ref)
        df = pd.DataFrame({
            "segment": [seg_map[k] for k in b.column("o_custkey").to_pylist()],
            "total_e2": np.round(b.column("o_totalprice").to_numpy() * 100)
            .astype(np.int64),
        })
        return df.groupby("segment", as_index=False).agg(
            n_orders=("total_e2", "size"), total_e2=("total_e2", "sum"))

    orders = read_table(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    partials = orders.map_batches(join_agg, batch_format="pyarrow", batch_size=65536)
    return bucketed_named_agg(partials, ["segment"],
                              {"n_orders": ("n_orders", "sum"),
                               "total_e2": ("total_e2", "sum")}).sort("segment")


SQL_MKTSEGMENT_ORDERS = """
SELECT c_mktsegment AS segment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_e2
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY segment
"""


def q_orders_monthly(sf_dir: str):
    """Calendar aggregation; month key as a string to sidestep timestamp
    round-trip representation differences."""
    import ray.data as rd

    from ..stages.shuffle import bucketed_named_agg

    def partial(b: pa.Table) -> pd.DataFrame:
        months = b.column("o_orderdate").to_pandas().dt.strftime("%Y-%m")
        tot = np.round(b.column("o_totalprice").to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({"month": months, "total_e2": tot})
        return df.groupby("month", as_index=False).agg(
            n_orders=("total_e2", "size"), total_e2=("total_e2", "sum"))

    partials = read_table(sf_dir, "orders", ["o_orderdate", "o_totalprice"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return bucketed_named_agg(partials, ["month"],
                              {"n_orders": ("n_orders", "sum"),
                               "total_e2": ("total_e2", "sum")}).sort("month")


SQL_ORDERS_MONTHLY = """
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_e2
FROM orders
GROUP BY 1
ORDER BY month
"""


def q_top_parts(sf_dir: str):
    """Top-k by aggregated revenue: groupby partials → sort desc → limit.
    The sort runs over the aggregated (small) keyspace, never the fact rows."""
    import ray.data as rd

    from ..stages.shuffle import bucketed_named_agg

    def partial(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "l_partkey": b.column("l_partkey").to_pandas(),
            "rev_e4": np.round(b.column("l_extendedprice").to_numpy()
                               * (1.0 - b.column("l_discount").to_numpy())
                               * 10000).astype(np.int64),
        })
        return df.groupby("l_partkey", as_index=False).agg(rev_e4=("rev_e4", "sum"))

    agg = bucketed_named_agg(
        read_table(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536),
        ["l_partkey"], {"rev_e4": ("rev_e4", "sum")}, num_buckets=16)
    top = agg.sort(["rev_e4", "l_partkey"], descending=[True, False]).limit(10)

    def rank(b: pa.Table) -> pa.Table:
        return b.append_column("rank", pa.array(range(1, b.num_rows + 1), pa.int64()))

    return top.repartition(1).map_batches(rank, batch_format="pyarrow")


BIG_ORDER_E2 = 300000

def q_customers_without_orders(sf_dir: str):
    """ANTI-JOIN via broadcast key set: customers with no high-value order
    (o_totalprice > 300000). The key set (custkeys with such an order) is
    the small side — broadcast once, filtered inside map_batches; no shuffle
    of either table (ray_guide semi/anti pattern). At 10^12 scale the key
    set becomes a Bloom filter with a verification pass; same shape."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    orders = pq.read_table(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey", "o_totalprice"])
    big = orders.filter(pc.greater(orders.column("o_totalprice"),
                                   float(BIG_ORDER_E2)))
    keys = set(big.column("o_custkey").to_pylist())
    keys_ref = ray.put(keys)

    def anti(b: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        mask = pa.array([c not in ks for c in b.column("c_custkey").to_pylist()])
        return b.filter(mask)

    return read_table(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .map_batches(anti, batch_format="pyarrow", batch_size=None) \
        .sort("c_custkey")


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
ORDER BY c_custkey
"""


SQL_TOP_PARTS = """
SELECT l_partkey, rev_e4, CAST(row_number() OVER (ORDER BY rev_e4 DESC, l_partkey) AS BIGINT) AS rank
FROM (
  SELECT l_partkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS rev_e4
  FROM lineitem GROUP BY l_partkey)
ORDER BY rev_e4 DESC, l_partkey
LIMIT 10
"""


def q_asof_prev_view(sf_dir: str):
    """Distributed AS-OF join (events self-join): for every 'click' event,
    the SAME user's latest 'view' event at or before the click's timestamp
    (inner semantics — clicks with no preceding view drop out).

    Scale shape: column-pruned read + row-pruned to the two event types →
    bucketize by the join key's hash (whole key-groups co-locate, nothing
    corpus-wide on the driver; skewed users are bounded by the per-user
    event count, the same assumption any keyed as-of makes) → per-user
    vectorized merge: both sides sorted by ts once, one ``np.searchsorted``
    per user resolves every click in O(log n). At 100 TB this is ONE
    hash-shuffle of the pruned columns — the standard distributed as-of.

    Precondition shared with DuckDB's ASOF JOIN: (user_id, ts) is unique on
    the right side (ties would make "the" latest row ambiguous); the events
    generator's microsecond timestamps satisfy it at every SF.
    """
    import ray.data as rd

    from ..stages.shuffle import bucketed_group_apply

    ev = read_table(sf_dir, "events",
                    ["event_id", "ts", "user_id", "event_type"])

    def prune(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("event_type"),
                                 value_set=pa.array(["click", "view"])))

    def asof(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for uid, g in df.groupby("user_id", sort=True):
            clicks = g[g["event_type"] == "click"].sort_values("ts")
            views = g[g["event_type"] == "view"].sort_values("ts")
            if clicks.empty or views.empty:
                continue
            idx = np.searchsorted(views["ts"].to_numpy(),
                                  clicks["ts"].to_numpy(),
                                  side="right") - 1
            m = idx >= 0
            if not m.any():
                continue
            out.append(pd.DataFrame({
                "event_id": clicks["event_id"].to_numpy()[m],
                "user_id": np.int64(uid),
                "ts": clicks["ts"].to_numpy()[m],
                "prev_view_id": views["event_id"].to_numpy()[idx[m]],
                "prev_view_ts": views["ts"].to_numpy()[idx[m]],
            }))
        if not out:
            return pd.DataFrame({
                "event_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "ts": pd.Series(dtype="datetime64[us]"),
                "prev_view_id": pd.Series(dtype="int64"),
                "prev_view_ts": pd.Series(dtype="datetime64[us]"),
            })
        return pd.concat(out, ignore_index=True)

    pruned = ev.map_batches(prune, batch_format="pyarrow", batch_size=65536)
    return bucketed_group_apply(pruned, ["user_id"], asof).sort("event_id")


SQL_ASOF_PREV_VIEW = """
SELECT c.event_id, c.user_id, c.ts,
       v.event_id AS prev_view_id, v.ts AS prev_view_ts
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts >= v.ts
ORDER BY c.event_id
"""


def q_top_orders_per_segment(sf_dir: str, k: int = 3):
    """Per-GROUP top-k — the grouped-rank pattern the global ``q_top_parts``
    doesn't cover: top-k orders by price within each customer market
    segment.

    Scale shape: the customer dimension is broadcast once (``ray.put``) as a
    custkey→segment array lookup; each fact batch maps to (segment, price,
    key) and keeps ONLY its local top-k per segment (a combiner — at most
    k × n_segments rows leave any batch); a single small merge takes the
    global top-k per segment. No shuffle ever touches the fact table.

    Ties on price are broken by ascending o_orderkey in both engines, so
    the ranking is total and the oracle hash is stable.
    """
    import ray

    from ..stages.shuffle import bucketed_group_apply

    cust = read_table(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .to_pandas()
    seg_of = dict(zip(cust["c_custkey"].to_numpy(),
                      cust["c_mktsegment"].to_numpy()))
    seg_ref = ray.put(seg_of)

    def local_topk(b: pa.Table) -> pd.DataFrame:
        m = ray.get(seg_ref)
        df = pd.DataFrame({
            "o_orderkey": b.column("o_orderkey").to_pandas(),
            "price_e2": np.round(b.column("o_totalprice").to_numpy()
                                 * 100).astype(np.int64),
            "c_mktsegment": [m.get(c) for c in
                             b.column("o_custkey").to_pylist()],
        })
        df = df.dropna(subset=["c_mktsegment"])
        return df.sort_values(["price_e2", "o_orderkey"],
                              ascending=[False, True]) \
            .groupby("c_mktsegment", as_index=False).head(k)

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["price_e2", "o_orderkey"],
                            ascending=[False, True]) \
            .groupby("c_mktsegment", as_index=False).head(k)
        df["rank"] = df.groupby("c_mktsegment").cumcount() + 1
        return df[["c_mktsegment", "rank", "o_orderkey", "price_e2"]]

    partials = read_table(sf_dir, "orders",
                          ["o_orderkey", "o_custkey", "o_totalprice"]) \
        .map_batches(local_topk, batch_format="pyarrow", batch_size=65536)
    return bucketed_group_apply(partials, ["c_mktsegment"], merge_topk) \
        .sort(["c_mktsegment", "rank"])


SQL_TOP_ORDERS_PER_SEGMENT = """
SELECT c_mktsegment, CAST(rank AS BIGINT) AS rank, o_orderkey, price_e2
FROM (
  SELECT c.c_mktsegment, o.o_orderkey,
         CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS price_e2,
         row_number() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY ROUND(o.o_totalprice * 100) DESC,
                                     o.o_orderkey) AS rank
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
WHERE rank <= 3
ORDER BY c_mktsegment, rank
"""
