"""Stream-shaped workloads over the ``events`` log.

Ray Data has no event-time windowing; the engine's contract (documented
ordering assumption): events are treated as a partitioned log — partition by
key, sort by ts *within the group* — and windows are computed per group with
pandas inside ``groupby(key).map_groups`` (tumbling) or with per-batch
partial aggregation when the window key is derivable per row (the scalable
path used here for tumbling windows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.tables import read_table

SESSION_GAP_S = 1800


def q_events_hourly(sf_dir: str):
    """Tumbling 1-hour window per event_type. The window key is a pure
    function of the row → per-batch combiner + small groupby; NO per-key
    ordering requirement at all (fully parallel)."""
    import ray.data as rd

    from ..stages.shuffle import bucketed_named_agg

    def partial(b: pa.Table) -> pd.DataFrame:
        hours = b.column("ts").to_pandas().dt.strftime("%Y-%m-%d %H")
        df = pd.DataFrame({
            "event_type": b.column("event_type").to_pandas(),
            "hour": hours,
            # floor(x*1e6+0.5), not round(): numpy rounds half-to-even while
            # SQL ROUND is half-away — identical IEEE steps on both sides
            "value_e6": np.floor(b.column("value").to_numpy() * 1e6
                                 + 0.5).astype(np.int64),
        })
        return df.groupby(["event_type", "hour"], as_index=False).agg(
            n=("value_e6", "size"), value_e6=("value_e6", "sum"))

    partials = read_table(sf_dir, "events", ["ts", "event_type", "value"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return bucketed_named_agg(partials, ["event_type", "hour"],
                              {"n": ("n", "sum"),
                               "value_e6": ("value_e6", "sum")}) \
        .sort(["event_type", "hour"])


SQL_EVENTS_HOURLY = """
SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
       COUNT(*) AS n,
       CAST(SUM(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS value_e6
FROM events
GROUP BY 1, 2
ORDER BY event_type, hour
"""


def q_sessions(sf_dir: str):
    """Session windows (gap > 30 min splits) per user: the group-and-sort
    pattern — groupby(user_id) co-locates a user's events, pandas sorts by ts
    inside the group. Groups are user-sized (bounded), so skew is bounded by
    the hottest user; a production variant would sessionize per (user, day)
    to cap group size."""
    import ray.data as rd

    def sessionize_bucket(df: pd.DataFrame) -> pd.DataFrame:
        """FULLY vectorized over all users in the bucket: one sort, one
        grouped diff, one cumsum — no per-user Python."""
        df = df.sort_values(["user_id", "ts"], kind="stable")
        gaps = df.groupby("user_id", sort=False)["ts"].diff().dt.total_seconds()
        brk = (gaps > SESSION_GAP_S) | gaps.isna()
        df = df.assign(sid=brk.cumsum())     # global ids; new user ⇒ new session
        per_session = df.groupby(["user_id", "sid"], sort=False).size() \
            .rename("n").reset_index()
        out = per_session.groupby("user_id", sort=True).agg(
            n_events=("n", "sum"), n_sessions=("n", "size"),
            max_session_events=("n", "max")).reset_index()
        return out.astype({"user_id": "int64", "n_events": "int64",
                           "n_sessions": "int64", "max_session_events": "int64"})

    from ..stages.shuffle import bucketed_group_apply

    ev = read_table(sf_dir, "events", ["user_id", "ts"])
    return bucketed_group_apply(ev, ["user_id"], sessionize_bucket).sort("user_id")


def q_events_sliding(sf_dir: str):
    """SLIDING window: 1-hour windows advancing every 30 minutes. Each event
    belongs to exactly two windows; the map stage emits one row per
    (event, window) — the standard replicate-then-tumble reduction of
    sliding windows to grouped aggregation (no ordering requirement)."""
    import ray.data as rd

    from ..stages.shuffle import bucketed_named_agg

    def partial(b: pa.Table) -> pd.DataFrame:
        ts = b.column("ts").to_pandas()
        # unit-safe epoch seconds (a ns-resolution parquet column would make
        # the int64 view // 1e6 produce milliseconds and 1.8s windows)
        epoch = np.floor((ts - pd.Timestamp(0)).dt.total_seconds()) \
            .astype(np.int64).to_numpy()
        v = np.floor(b.column("value").to_numpy() * 1e6 + 0.5).astype(np.int64)
        et = b.column("event_type").to_pandas().to_numpy()
        w0 = (epoch // 1800) * 1800          # the step boundary at/just before ts
        rows = []
        for shift in (0, 1800):              # window starting at w0 and w0-1800
            start = w0 - shift
            rows.append(pd.DataFrame({"event_type": et, "win_start": start,
                                      "value_e6": v}))
        df = pd.concat(rows, ignore_index=True)
        return df.groupby(["event_type", "win_start"], as_index=False).agg(
            n=("value_e6", "size"), value_e6=("value_e6", "sum"))

    partials = read_table(sf_dir, "events", ["ts", "event_type", "value"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
    return bucketed_named_agg(partials, ["event_type", "win_start"],
                              {"n": ("n", "sum"),
                               "value_e6": ("value_e6", "sum")}) \
        .sort(["event_type", "win_start"])


SQL_EVENTS_SLIDING = """
WITH e AS (
  SELECT event_type, CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 AS w0,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
  FROM events
), expanded AS (
  SELECT event_type, w0 AS win_start, v FROM e
  UNION ALL
  SELECT event_type, w0 - 1800 AS win_start, v FROM e
)
SELECT event_type, win_start, COUNT(*) AS n,
       CAST(SUM(v) AS BIGINT) AS value_e6
FROM expanded
GROUP BY event_type, win_start
ORDER BY event_type, win_start
"""


SQL_SESSIONS = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessions AS (
  SELECT user_id, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
), per_session AS (
  SELECT user_id, sid, COUNT(*) AS n FROM sessions GROUP BY 1, 2
)
SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events,
       COUNT(*) AS n_sessions,
       CAST(MAX(n) AS BIGINT) AS max_session_events
FROM per_session
GROUP BY user_id
ORDER BY user_id
"""
