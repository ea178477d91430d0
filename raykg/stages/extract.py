"""Stateless stages: input dedup, HTML→text extraction, doc projection.

Stage 2 of the physical plan (SURVEY.md §7.2): `map_batches` over zero-copy
Arrow batches, no shuffle, html column dropped immediately after extraction
so nothing downstream ever moves the binary payloads.
"""

from __future__ import annotations

from hashlib import blake2b

import pyarrow as pa
import pyarrow.compute as pc

from ..core.textextract import extract_text
from ..core.wordsplit import word_count


def doc_id_of(url: str) -> int:
    """63-bit stable doc id from the url (signed-int64-safe; identity by
    content so retries/resume are idempotent)."""
    return int.from_bytes(blake2b(url.encode("utf-8"), digest_size=8,
                                  salt=b"doc").digest(), "big") & 0x7FFF_FFFF_FFFF_FFFF


def extract_docs(batch: pa.Table) -> pa.Table:
    """pages → docs: re-derive text from html via the FROZEN extractor
    (byte-identity invariant), add doc_id + n_words, drop html.

    ``warc_ts`` is carried through (when present) so input dedup can run
    AFTER extraction, where rows are doc-level results instead of multi-MB
    html payloads. The pipeline intentionally ignores the producer-supplied
    `text` column and recomputes it — the invariant is that they agree per
    url, asserted by tests, not assumed by the engine. EXCEPTION: rows with
    EMPTY html and a non-empty text column are WET-style conversion records
    (pre-extracted text, no html ships) — their text is taken verbatim."""
    html_col = batch.column("html").to_pylist()
    pre_text = (batch.column("text").to_pylist()
                if "text" in batch.schema.names else [None] * len(html_col))
    texts = [(t if not v and t else extract_text(v))
             for v, t in zip(html_col, pre_text)]
    urls = batch.column("url").to_pylist()
    cols = {
        "doc_id": pa.array([doc_id_of(u) for u in urls], pa.int64()),
        "url": batch.column("url"),
        "lang": batch.column("lang"),
        "text": pa.array(texts, pa.string()),
        "n_words": pa.array([word_count(t) for t in texts], pa.int32()),
    }
    if "warc_ts" in batch.schema.names:
        cols["warc_ts"] = batch.column("warc_ts")
    return pa.table(cols)


def dedup_pages(pages_ds, num_buckets: int = 32):
    """Exact input dedup by url, keeping the newest ``warc_ts``
    (SURVEY.md §7.3: hash-partition + per-key max).

    This is a full shuffle of the page rows (html included) — the
    scale-correct formulation when the caller needs the SHUFFLED dataset:
    rows sharing a url MUST be co-located to pick a winner. Implemented as
    a bucketized hash partition with a VECTORIZED in-bucket
    sort+drop_duplicates (raykg.stages.shuffle), not per-url map_groups.

    NOTE: the KG pipeline itself uses the shuffle-FREE variant
    (``dup_url_winners`` + ``filter_dup_losers``): only urls that actually
    repeat are broadcast (bounded by the shard's duplicate count — NOT all
    10^12 urls), and losers are dropped by a stateless filter before
    extraction, so neither html nor extract rows ever cross the object
    store for dedup."""
    from hashlib import md5

    from .shuffle import first_per_key

    def add_h(batch: pa.Table) -> pa.Table:
        # content tiebreak for exact (url, warc_ts) ties → winner is stable
        # across runs/resumes regardless of row delivery order
        return batch.append_column(
            "__h__", pa.array([md5(h or b"").hexdigest()
                               for h in batch.column("html").to_pylist()],
                              pa.string()))

    deduped = first_per_key(pages_ds.map_batches(add_h, batch_format="pyarrow"),
                            ["url"], "warc_ts", ascending=False,
                            num_buckets=num_buckets, tiebreak_cols=["__h__"])
    return deduped.drop_columns(["__h__"])


def dup_url_winners(pages_ds, num_buckets: int = 32,
                    capture_tied_rows: bool = False):
    """url → winning row key, for urls appearing MORE THAN ONCE.

    Pass 1 aggregates a (url, warc_ts) PROJECTION (column-pruned read — html
    never leaves storage) into per-url (count, max_ts, rows_at_max); only
    repeated urls survive, so the returned dict is bounded by the shard's
    duplicate count, not its url count. Pass 2 (rare: max-ts TIES) reads
    html for just the tied urls and picks the lexicographically smallest
    md5 — a deterministic content tiebreak, so resume/retry keeps the same
    winner regardless of row order (ADVICE round 1).

    Returns {url: (max_ts, winner_md5 | None)}; empty dict = no dups.

    With ``capture_tied_rows=True`` returns ``(winners, tied_rows)`` where
    ``tied_rows`` is a pyarrow Table holding EXACTLY ONE full page row per
    tied url (the winner) in the input schema, or None when there are no
    ties. Callers union these rows back after dropping every tied-url row
    (``filter_dup_losers(drop_tied=True)``), which closes the cross-block
    byte-identical-duplicate residual without any shuffle: the driver-side
    footprint is bounded by the TIE count (exact url+timestamp collisions),
    a pathology, not by the duplicate or url count (ADVICE round 2).

    The aggregation runs over per-block PARTIALS (url → n, max_ts,
    n_at_max — an associative combine, so block partials merge exactly)
    through the adaptive ``bucketed_group_apply``: small shards merge in
    one driver-side pandas call (measured 3.8s → 1.7s on a 40k-row shard
    whose sort-shuffle constants dominated), large ones through the
    bucketized hash-shuffle with nothing on the driver."""
    import pandas as pd

    from .shuffle import bucketed_group_apply

    proj = pages_ds.select_columns(["url", "warc_ts"])

    def block_partials(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("url", as_index=False).agg(
            n=("warc_ts", "size"), max_ts=("warc_ts", "max"))
        at_max = df.merge(g[["url", "max_ts"]], on="url")
        at_max = at_max[at_max["warc_ts"] == at_max["max_ts"]]
        g["n_at_max"] = g["url"].map(
            at_max.groupby("url").size()).fillna(1).astype(int)
        return g

    def merge_partials(df: pd.DataFrame) -> pd.DataFrame:
        """Associative merge of block partials: n sums; max_ts maxes;
        n_at_max sums over partials AT the global max only."""
        gmax = df.groupby("url")["max_ts"].transform("max")
        tot = df.groupby("url", as_index=False).agg(n=("n", "sum"))
        at_max = (df[df["max_ts"] == gmax]
                  .groupby("url", as_index=False)
                  .agg(max_ts=("max_ts", "first"),
                       n_at_max=("n_at_max", "sum")))
        g = tot.merge(at_max, on="url")
        g = g[g["n"] > 1]
        if g.empty:
            return pd.DataFrame({"url": pd.Series(dtype="object"),
                                 "max_ts": pd.Series(dtype="datetime64[us]"),
                                 "tied": pd.Series(dtype="bool")})
        g["tied"] = g["n_at_max"] > 1
        return g[["url", "max_ts", "tied"]]

    partials_ds = proj.map_batches(block_partials, batch_format="pandas")
    meta = bucketed_group_apply(partials_ds, ["url"], merge_partials,
                                num_buckets=num_buckets)
    winners: dict = {}
    tied_urls: list[str] = []
    for bt in meta.iter_batches(batch_size=65536, batch_format="pandas"):
        for url, ts, tied in bt.itertuples(index=False):
            winners[url] = (ts, None)
            if tied:
                tied_urls.append(url)
    tied_tbl = None
    if tied_urls:
        from hashlib import md5

        tied_set = set(tied_urls)

        def tie_rows(batch: pa.Table) -> pa.Table:
            # keep only tied-url rows at their max_ts, FULL row + content
            # hash — tie multiplicity bounds the output, not batch size
            urls = batch.column("url").to_pylist()
            tss = batch.column("warc_ts").to_pylist()
            keep = [i for i, (u, ts) in enumerate(zip(urls, tss))
                    if u in tied_set and ts == winners[u][0]]
            sub = batch.take(pa.array(keep, pa.int64()))
            hs = [md5(h or b"").hexdigest()
                  for h in sub.column("html").to_pylist()]
            return sub.append_column("__h__", pa.array(hs, pa.string()))

        best_rows: dict = {}          # url → (md5, row_index, table)
        for tbl in (pages_ds.map_batches(tie_rows, batch_format="pyarrow")
                    .iter_batches(batch_size=None, batch_format="pyarrow")):
            hs = tbl.column("__h__").to_pylist()
            us = tbl.column("url").to_pylist()
            for i, (u, h) in enumerate(zip(us, hs)):
                cur = best_rows.get(u)
                if cur is None or h < cur[0]:
                    best_rows[u] = (h, i, tbl)
        for u, (h, _i, _t) in best_rows.items():
            winners[u] = (winners[u][0], h)
        if capture_tied_rows and best_rows:
            slices = [t.take(pa.array([i], pa.int64())).drop_columns(["__h__"])
                      for (_h, i, t) in best_rows.values()]
            tied_tbl = pa.concat_tables(slices)
    if capture_tied_rows:
        return winners, tied_tbl
    return winners


def filter_dup_losers(pages_ds, winners_ref, drop_tied: bool = False):
    """Stateless dedup filter: drop rows that lose to the broadcast winner
    (``dup_url_winners`` output via ``ray.put``). Urls absent from the map
    are unique — kept without any hashing.

    ``drop_tied=False`` (standalone use): tied-winner rows are kept, with
    BYTE-IDENTICAL duplicates collapsed within a batch but not across
    blocks — a stateless filter has no cross-block identity for
    indistinguishable rows.

    ``drop_tied=True`` (the KG path): EVERY row of a tied url is dropped;
    the caller unions back the single captured winner row from
    ``dup_url_winners(capture_tied_rows=True)``, which makes
    one-row-per-url exact across blocks (ADVICE round 2)."""
    import ray

    def f(batch: pa.Table) -> pa.Table:
        w = ray.get(winners_ref)
        urls = batch.column("url").to_pylist()
        tss = batch.column("warc_ts").to_pylist()
        keep = []
        html_col = None
        seen_winners: set = set()     # collapse BYTE-IDENTICAL tied rows
        for i, (u, ts) in enumerate(zip(urls, tss)):
            got = w.get(u)
            if got is None:
                keep.append(i)
                continue
            max_ts, best = got
            if ts != max_ts:
                continue
            if best is not None:
                if drop_tied:           # winner re-enters via side channel
                    continue
                from hashlib import md5

                if html_col is None:
                    html_col = batch.column("html").to_pylist()
                if md5(html_col[i] or b"").hexdigest() != best:
                    continue
                if u in seen_winners:   # full-row duplicate within batch
                    continue
                seen_winners.add(u)
            keep.append(i)
        if len(keep) == len(urls):
            return batch
        return batch.take(pa.array(keep, pa.int64()))

    return pages_ds.map_batches(f, batch_format="pyarrow")


def filter_lang(ds, langs: tuple[str, ...] = ("en",)):
    """Vectorized language filter inside map_batches (not per-row ds.filter)."""
    lang_set = pa.array(list(langs), pa.string())

    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("lang"), value_set=lang_set))

    return ds.map_batches(f, batch_format="pyarrow")
