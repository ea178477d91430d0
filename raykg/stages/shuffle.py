"""Bucketized grouped-apply: the engine's standard shuffle pattern.

``Dataset.groupby(keys).map_groups(fn)`` invokes ``fn`` once per GROUP —
per-group Python/block-slicing overhead that melts down when groups are tiny
and numerous (measured: the edge-aggregation groupby spent seconds on a few
thousand groups; a 100-TB corpus has billions). The scale-correct shape is:

  1. hash the group key into ``num_buckets`` partitions (vectorized,
     deterministic `pandas.util.hash_pandas_object` with its fixed key),
  2. ``groupby(bucket).map_groups`` — ONE call per bucket,
  3. inside the bucket, do the real per-key work with vectorized pandas.

All rows of a logical key land in one bucket (correctness); a bucket holds
many whole keys (efficiency). Hot-key handling: partial aggregation upstream
bounds any key's rows to ≤ n_batches, and the in-bucket merge is vectorized,
so even a key appearing in every batch of a 10^12-row corpus is a plain
column sum — the salted two-phase variant (raykg.stages.canonicalize) exists
for the degenerate case where one key's partials alone exceed a worker.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
import pyarrow as pa

DEFAULT_BUCKETS = 32
_BUCKET_COL = "__bucket__"


def _with_bucket(batch: pd.DataFrame, keys: list[str], num_buckets: int) -> pd.DataFrame:
    h = pd.util.hash_pandas_object(batch[keys], index=False)
    batch = batch.copy(deep=False)
    batch[_BUCKET_COL] = (h % num_buckets).astype("int64")
    return batch


# Inputs at or under this many rows AND bytes are merged in ONE pandas call
# on the driver instead of through Ray's sort-based groupby, whose fixed
# shuffle constants (~1.5-2.5s per execution on this host) dominate small
# inputs. Driver memory stays bounded by BOTH budgets — the byte cap guards
# callers that feed wide rows (e.g. ``dedup_pages`` with full html columns),
# where a row count under budget could still mean tens of GB. Larger inputs
# take the bucketized shuffle and never touch the driver. Most callers feed
# PRE-AGGREGATED partials (block combiners upstream), so at 100-TB scale
# the row count is the distinct-key×block count, not the raw corpus.
#
# Budget calibration (round 4): the single-threaded driver merge crosses
# the distributed path's ~1.5s constant around 0.5M partial rows (measured
# at ×96/32: 850k-row edge merge = 2.3-3.5s driver vs 1.4s distributed) —
# and partial volume GROWS with block count ∝ cluster width, so an
# over-generous budget silently serializes exactly the runs that have the
# most CPUs idle. 400k keeps every small-sf win on the driver and pushes
# width-proportional merges to the cluster.
DRIVER_MERGE_BUDGET = 400_000
DRIVER_MERGE_BYTES = 256 * 1024 * 1024


def bucketed_group_apply(ds, keys: list[str],
                         fn: Callable[[pd.DataFrame], pd.DataFrame],
                         num_buckets: int = DEFAULT_BUCKETS,
                         driver_budget_rows: int | None = None):
    """Apply ``fn`` to each hash bucket of whole key-groups.

    ``fn`` receives a pandas DataFrame containing EVERY row of EVERY key in
    the bucket (no partial keys) and must itself group by ``keys``. The
    bucket column is stripped before ``fn`` sees the data.

    ADAPTIVE: the input is materialized (its blocks are shuffle inputs
    either way); when its row count fits the driver budget the whole merge
    is one vectorized ``fn`` call on the driver and the result re-enters
    the Dataset world via ``from_pandas`` — semantically identical (one
    bucket holding every key) but skipping the sort-shuffle constants that
    dominate small inputs. Past the budget, the bucketized shuffle runs
    over the materialized blocks exactly as before. ``driver_budget_rows=0``
    disables the fast path (used by tests to pin shuffle-path behavior)."""
    budget = DRIVER_MERGE_BUDGET if driver_budget_rows is None \
        else driver_budget_rows
    if budget:
        mat = ds.materialize()
        n = mat.count()
        if 0 < n <= budget and mat.size_bytes() <= DRIVER_MERGE_BYTES:
            import numpy as np
            import ray.data as rd

            df = pd.concat(
                list(mat.iter_batches(batch_size=None,
                                      batch_format="pandas")),
                ignore_index=True)
            out = fn(df)
            if len(out) == 0:
                return rd.from_pandas([out])
            nchunks = max(1, min(8, (len(out) + 65535) // 65536))
            parts = np.array_split(out, nchunks)
            return rd.from_pandas([p.reset_index(drop=True) for p in parts])
        ds = mat

    def apply_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns=[_BUCKET_COL]))

    return ds.map_batches(lambda b: _with_bucket(b, keys, num_buckets),
                          batch_format="pandas") \
        .groupby(_BUCKET_COL).map_groups(apply_bucket, batch_format="pandas")


def bucketed_named_agg(ds, keys: list[str], spec: dict[str, tuple[str, str]],
                       num_buckets: int = 8):
    """Grouped aggregation over PRE-AGGREGATED partials via the bucketized
    pattern. ``spec`` is pandas named-agg form: out_col → (src_col, how).

    Replaces ``Dataset.groupby(...).aggregate(Sum(...))`` — Ray's sort-based
    Aggregate carried ~8s of fixed overhead on a 100k-row input where this
    runs in <1s (measured); the in-bucket merge is one vectorized pandas
    groupby."""

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, as_index=False).agg(
            **{out: (src, how) for out, (src, how) in spec.items()})

    return bucketed_group_apply(ds, keys, merge, num_buckets)


def first_per_key(ds, keys: list[str], order_by: str, ascending: bool = False,
                  num_buckets: int = DEFAULT_BUCKETS,
                  tiebreak_cols: list[str] | None = None):
    """Keep one deterministic winner row per key (e.g. newest by timestamp):
    vectorized sort + drop_duplicates inside each bucket.

    ``tiebreak_cols`` (ascending) break exact (key, order_by) ties by
    CONTENT instead of delivery order, so the winner is stable across runs
    and resumes even when two rows share the primary order value (ADVICE
    round 1). Callers with payload columns that aren't directly sortable
    should pre-compute a content-hash column and pass it here."""
    tb = tiebreak_cols or []

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values([*keys, order_by, *tb],
                             ascending=[True] * len(keys) + [ascending]
                             + [True] * len(tb),
                             kind="stable").drop_duplicates(keys, keep="first")

    return bucketed_group_apply(ds, keys, pick, num_buckets)


SMALL_SORT_ROWS = 2_000_000


def adaptive_sort(ds, keys: list[str], approx_rows: int | None = None):
    """Global sort that doesn't pay Ray's range-shuffle constants on SMALL
    data: below ``SMALL_SORT_ROWS`` the dataset is coalesced to one block and
    sorted in a single vectorized task (measured: Ray's distributed sort
    spent ~6s on 200 rows); above it, the real range sort runs. Post-
    aggregation outputs (nodes, edges) are almost always on the small side —
    they are the REDUCED data."""
    n = approx_rows if approx_rows is not None else ds.count()
    if n <= SMALL_SORT_ROWS:
        def sort_block(df: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            df = df.sort_values(keys, kind="stable")
            # Arrow list columns surface as numpy arrays per element after
            # the pandas round-trip; a downstream Write can't convert those
            # back ("Unsupported numpy type") — normalize to plain lists.
            # Small path only (≤ SMALL_SORT_ROWS), so the per-element pass
            # is bounded; the large path sorts Arrow-native and never
            # round-trips.
            for c in df.columns:
                if df[c].dtype == object and len(df) and \
                        isinstance(df[c].iloc[0], np.ndarray):
                    df[c] = [list(v) for v in df[c]]
            return df

        return ds.repartition(1).map_batches(sort_block, batch_format="pandas",
                                             batch_size=None)
    return ds.sort(keys)


def _h64s(s: str) -> int:
    from hashlib import blake2b

    return int.from_bytes(blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def first_per_key_arrow(ds, key: str, order_by: str, ascending: bool = False,
                        num_buckets: int = DEFAULT_BUCKETS):
    """Arrow-native variant of ``first_per_key`` for tables with NESTED
    columns (list<struct> does not survive a pandas round-trip): winner rows
    are selected by index (`Table.take`), the payload columns never convert.
    Bucket = content hash of the key, so results are layout-independent."""

    def add_bucket(b: pa.Table) -> pa.Table:
        vals = b.column(key).to_pylist()
        return b.append_column(
            _BUCKET_COL,
            pa.array([_h64s(str(v)) % num_buckets for v in vals], pa.int64()))

    def pick(g: pa.Table) -> pa.Table:
        kcol = g.column(key).to_pylist()
        ocol = g.column(order_by).to_pylist()
        n = len(kcol)
        if ascending:
            order = sorted(range(n), key=lambda i: (kcol[i], ocol[i]))
        else:
            # stable two-pass: order_by desc within key asc
            order = sorted(range(n), key=lambda i: ocol[i], reverse=True)
            order = sorted(order, key=lambda i: kcol[i])
        seen: set = set()
        keep = []
        for i in order:
            if kcol[i] not in seen:
                seen.add(kcol[i])
                keep.append(i)
        keep.sort()
        out = g.take(pa.array(keep, pa.int64()))
        return out.drop_columns([_BUCKET_COL])

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby(_BUCKET_COL).map_groups(pick, batch_format="pyarrow")
