"""Driver contract for the raykg engine.

The driver calls ``ray.init(...)`` BEFORE importing this module; nothing here
(or in raykg) calls ``ray.init``/``ray.shutdown``.

- ``entry()`` — flagship KG pipeline (pages → mentions → triples → graph) on
  /root/testdata/sf0.001; returns the edges Dataset.
- ``queries()`` — one entry per implemented operator/pipeline (SURVEY.md §2 +
  the training-data operator suite); each callable takes ``sf_dir``.
- ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query;
  KG/sketch/ANN queries are intentionally omitted (non-SQL-expressible;
  their correctness gates are the pytest parity suites instead).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# robust under any driver import style (file-spec import with foreign cwd)
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def _register_by_value() -> None:
    """Ray workers inherit sys.path from ray.init time — if the driver
    initialised Ray from a cwd without this repo on the path, workers cannot
    unpickle ``raykg`` classes by reference (observed: ModuleNotFoundError in
    every worker). Import the whole package tree eagerly and register it for
    cloudpickle BY-VALUE serialization, so UDF classes/closures ship their
    definitions with the task instead of a module reference."""
    import importlib
    import pkgutil

    import raykg

    for info in pkgutil.walk_packages(raykg.__path__, prefix="raykg."):
        if info.name.endswith("__main__"):
            continue        # the CLI entry point executes on import
        try:
            importlib.import_module(info.name)
        except Exception:
            pass
    try:
        from ray import cloudpickle as _cp

        for name, mod in list(sys.modules.items()):
            if mod is not None and (name == "raykg" or name.startswith("raykg.")):
                try:
                    _cp.register_pickle_by_value(mod)
                except Exception:
                    pass
    except Exception:
        pass


_register_by_value()

from raykg.functions import dedup, multimodal, relational, similarity, textstats, windows
from raykg.pipelines.kg import extract_stage, kg_datasets
from raykg.sources.pages import pages_dataset
from raykg.stages.mention import explode_mentions, explode_triples

# extraction is the expensive shared prefix of the kg_* queries; memoize per
# sf_dir within one driver process (deterministic → safe)
_extract_cache: dict[str, Any] = {}
_kg_cache: dict[str, dict] = {}


def _extracts(sf_dir: str):
    ds = _extract_cache.get(sf_dir)
    if ds is None:
        ds = extract_stage(pages_dataset(sf_dir)).materialize()
        _extract_cache[sf_dir] = ds
    return ds


def _kg(sf_dir: str) -> dict:
    d = _kg_cache.get(sf_dir)
    if d is None:
        d = kg_datasets(pages_dataset(sf_dir))
        _kg_cache[sf_dir] = d
    return d


def entry() -> Any:
    """Flagship: full KG construction at sf0.001 → edges Dataset."""
    return _kg("/root/testdata/sf0.001")["edges"]


# -- KG pipeline queries (non-SQL; pytest parity gates cover correctness) ---

def _kg_mentions(sf_dir: str):
    return _extracts(sf_dir).map_batches(explode_mentions, batch_format="pyarrow", batch_size=None)


def _kg_triples(sf_dir: str):
    return _extracts(sf_dir).map_batches(explode_triples, batch_format="pyarrow", batch_size=None)


def _kg_nodes(sf_dir: str):
    return _kg(sf_dir)["nodes"]


def _kg_edges(sf_dir: str):
    return _kg(sf_dir)["edges"]


def _kg_links(sf_dir: str):
    return _kg(sf_dir)["links"]


def _kg_links_sharded(sf_dir: str):
    """L1 scale path: catalog sharded by top LSH-code bits, probe-routed
    linking, best-of merge (no_oracle: pytest asserts parity with the
    single-actor path)."""
    from raykg.stages.link import build_sharded_catalog, link_mentions_sharded

    d = _kg(sf_dir)
    refs = build_sharded_catalog(d["nodes"])
    return link_mentions_sharded(_kg_mentions(sf_dir), refs) \
        .sort(["doc_id", "start"])


def _kg_label_report(sf_dir: str):
    """G1: mentions grouped by label → sorted distinct surface forms
    (/root/reference/Sources/GLiNERSwift/Diagnostics/EntityReporter.swift:8-38),
    via the bucketized grouped-apply."""
    import pandas as pd

    from raykg.stages.shuffle import bucketed_group_apply

    def report(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"label": [], "n_distinct": [], "surfaces": []}
        for label, g in df.groupby("label", sort=True):
            distinct = sorted(set(g["text"]))
            rows["label"].append(label)
            rows["n_distinct"].append(len(distinct))
            rows["surfaces"].append(distinct[:50])
        return pd.DataFrame(rows)

    return bucketed_group_apply(_kg_mentions(sf_dir), ["label"], report,
                                num_buckets=4).sort("label")


def _legacy_mentions(sf_dir: str):
    """M5+A8: the GLiNER1 legacy path (prompted encode → BiLSTM/FFN span
    scorer → greedy overlap decode) over the page corpus — actor pool, flat
    mention rows (no_oracle: model-scored; pytest pins a golden)."""
    from raykg.stages.extract import extract_docs
    from raykg.stages.mention import LegacyMentionExtractor

    docs = pages_dataset(sf_dir).map_batches(extract_docs, batch_format="pyarrow")
    return docs.map_batches(LegacyMentionExtractor, batch_format="pyarrow",
                            batch_size=64, concurrency=4) \
        .sort(["doc_id", "start", "end"])


def _schema_extract(sf_dir: str):
    """Distributed multi-task GLiNER2.extract over the page corpus."""
    from raykg.config import Schema
    from raykg.stages.extract import extract_docs
    from raykg.stages.extract_task import schema_extract

    schema = (Schema().entities(["person", "organization"], dtype="list")
                      .classification("topic", ["business", "travel", "research"])
                      .structure("card").field("who", description="person")
                      .done())
    docs = pages_dataset(sf_dir).map_batches(extract_docs, batch_format="pyarrow")
    return schema_extract(docs, schema, concurrency=4).sort("doc_id")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # knowledge-graph construction (flagship)
        "kg_mentions": _kg_mentions,
        "kg_triples": _kg_triples,
        "kg_nodes": _kg_nodes,
        "kg_edges": _kg_edges,
        "kg_links": _kg_links,
        "kg_links_sharded": _kg_links_sharded,
        "kg_label_report": _kg_label_report,
        "schema_extract": _schema_extract,
        "legacy_mentions": _legacy_mentions,
        # relational operator layer (TPC-H-ish)
        "lineitem_agg": relational.q_lineitem_agg,
        "mktsegment_orders": relational.q_mktsegment_orders,
        "orders_monthly": relational.q_orders_monthly,
        "top_parts": relational.q_top_parts,
        "customers_without_orders": relational.q_customers_without_orders,
        "asof_prev_view": relational.q_asof_prev_view,
        "top_orders_per_segment": relational.q_top_orders_per_segment,
        # stream-shaped windows
        "events_hourly": windows.q_events_hourly,
        "events_sliding": windows.q_events_sliding,
        "sessions": windows.q_sessions,
        # text analysis
        "doc_stats": textstats.q_doc_stats,
        "lang_dist": textstats.q_lang_dist,
        "quality": textstats.q_quality,
        "content_hash": textstats.q_content_hash,
        "langid": textstats.q_langid,
        "fingerprint": textstats.q_fingerprint,
        "fingerprint_kgram": textstats.q_fingerprint_kgram,
        "token_df": textstats.q_token_df,
        "split": textstats.q_split,
        "boilerplate": textstats.q_boilerplate,
        "sample": textstats.q_sample,
        "len_quantiles": textstats.q_len_quantiles,
        # deduplication
        "dedup_exact": dedup.q_dedup_exact,
        "dedup_minhash": dedup.q_dedup_minhash,
        "dedup_minhash_md5": dedup.q_dedup_minhash_md5,
        "dedup_simhash": dedup.q_dedup_simhash,
        "dedup_simhash_md5": dedup.q_dedup_simhash_md5,
        "ngram_jaccard": dedup.q_ngram_jaccard,
        "dedup_embedding": dedup.q_dedup_embedding,
        # similarity search
        "knn": similarity.q_knn,
        "knn_ivf": similarity.q_knn_ivf,
        # multimodal plumbing
        "media_meta": multimodal.q_media_meta,
        "frame_sample": multimodal.q_frame_sample,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "lineitem_agg": relational.SQL_LINEITEM_AGG,
        "mktsegment_orders": relational.SQL_MKTSEGMENT_ORDERS,
        "orders_monthly": relational.SQL_ORDERS_MONTHLY,
        "top_parts": relational.SQL_TOP_PARTS,
        "customers_without_orders": relational.SQL_CUSTOMERS_WITHOUT_ORDERS,
        "asof_prev_view": relational.SQL_ASOF_PREV_VIEW,
        "top_orders_per_segment": relational.SQL_TOP_ORDERS_PER_SEGMENT,
        "events_hourly": windows.SQL_EVENTS_HOURLY,
        "events_sliding": windows.SQL_EVENTS_SLIDING,
        "sessions": windows.SQL_SESSIONS,
        "doc_stats": textstats.SQL_DOC_STATS,
        "lang_dist": textstats.SQL_LANG_DIST,
        "quality": textstats.SQL_QUALITY,
        "content_hash": textstats.SQL_CONTENT_HASH,
        "dedup_exact": dedup.SQL_DEDUP_EXACT,
        "dedup_minhash": dedup.SQL_DEDUP_MINHASH,
        "dedup_minhash_md5": dedup.SQL_DEDUP_MINHASH_MD5,
        "dedup_simhash": dedup.SQL_DEDUP_SIMHASH,
        "dedup_simhash_md5": dedup.SQL_DEDUP_SIMHASH_MD5,
        "ngram_jaccard": dedup.SQL_NGRAM_JACCARD,
        "dedup_embedding": dedup.SQL_DEDUP_EMBEDDING,
        "knn": similarity.SQL_KNN,
        "langid": textstats.SQL_LANGID,
        "fingerprint": textstats.SQL_FINGERPRINT,
        "fingerprint_kgram": textstats.SQL_FINGERPRINT_KGRAM,
        "token_df": textstats.SQL_TOKEN_DF,
        "split": textstats.SQL_SPLIT,
        "boilerplate": textstats.SQL_BOILERPLATE,
        "sample": textstats.SQL_SAMPLE,
        "len_quantiles": textstats.SQL_LEN_QUANTILES,
        "media_meta": multimodal.SQL_MEDIA_META,
        "frame_sample": multimodal.SQL_FRAME_SAMPLE,
        # omitted on purpose (non-SQL-expressible): kg_* + legacy_mentions
        # (model-scored extraction), knn_ivf (approximate) — covered by
        # pytest parity/recall gates.
    }
