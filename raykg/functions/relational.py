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
