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
    url, asserted by tests, not assumed by the engine."""
    html_col = batch.column("html")
    texts = [extract_text(v) for v in html_col.to_pylist()]
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
    scale-correct formulation: rows sharing a url MUST be co-located to pick
    a winner. Implemented as a bucketized hash partition with a VECTORIZED
    in-bucket sort+drop_duplicates (raykg.stages.shuffle), not per-url
    map_groups. An alternative that avoids moving html — aggregate
    (url → max ts) small-side then semi-join — trades the shuffle for a
    broadcast that cannot hold 10^12 urls; rejected.

    NOTE: the KG pipeline itself dedups AFTER extraction
    (raykg.pipelines.kg.extract_stage uses first_per_key_arrow on the
    doc-extract rows) so html never crosses the object store; this
    pre-extraction variant remains for callers that need raw-page dedup."""
    from .shuffle import first_per_key

    return first_per_key(pages_ds, ["url"], "warc_ts", ascending=False,
                         num_buckets=num_buckets)


def filter_lang(ds, langs: tuple[str, ...] = ("en",)):
    """Vectorized language filter inside map_batches (not per-row ds.filter)."""
    lang_set = pa.array(list(langs), pa.string())

    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("lang"), value_set=lang_set))

    return ds.map_batches(f, batch_format="pyarrow")
