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


# -- KG-tail oracle dump (VERDICT r3 #3) -------------------------------------
#
# kg_label_report / kg_nodes / kg_edges are deterministic GROUP/AGG/JOIN
# functions of the pipeline's own intermediates. The query callables dump
# those intermediates (mention rows, triple rows, the surface→norm/node-id
# map, the alias CC map — i.e. every model-scored / hashed / iterative
# piece, all ENGINE outputs) to a fixed path; the oracle SQL consumes the
# dump and re-derives the tail with pure relational operators. That turns
# three formerly no_oracle rows into full rows+schema+hash checks without
# pretending SQL can score a model.

_ORACLE_DUMP = "/tmp/raykg_oracle_dump"
_dump_for: list[str] = []


def _dump_kg_tail(sf_dir: str) -> None:
    if _dump_for and _dump_for[0] == sf_dir:
        return
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raykg.core.canonical import surface_key

    os.makedirs(_ORACLE_DUMP, exist_ok=True)
    mentions = _kg_mentions(sf_dir).to_pandas()      # full mention rows
    triples = _kg_triples(sf_dir).to_pandas()[["subj", "pred", "obj"]]
    surfaces = sorted(set(mentions["text"]) | set(triples["subj"])
                      | set(triples["obj"]))
    keys = [surface_key(s) for s in surfaces]
    d = _kg(sf_dir)
    am = d["alias_map"]
    # linking inputs: the engine's own (deterministic) embeddings for the
    # distinct mention texts and the catalog rows IN CATALOG ORDER — the
    # SQL oracle re-derives the cosine-argmax link decision relationally
    from raykg.core.canonical import SurfaceEmbedder
    from raykg.stages.link import build_catalog

    cat = build_catalog(d["nodes"])
    qtexts = sorted(set(mentions["text"]))
    qemb = SurfaceEmbedder(cat["seed"]).embed_many(qtexts) \
        .astype("float32") if qtexts else None
    pq.write_table(pa.table({
        "text": pa.array(qtexts, pa.string()),
        "emb": pa.array([list(map(float, v)) for v in qemb]
                        if qemb is not None else [],
                        pa.list_(pa.float64()))}),
        f"{_ORACLE_DUMP}/link_queries.parquet")
    pq.write_table(pa.table({
        "pos": pa.array(range(len(cat["node_ids"])), pa.int64()),
        "node_id": pa.array(cat["node_ids"], pa.int64()),
        "emb": pa.array([list(map(float, v)) for v in cat["emb"]],
                        pa.list_(pa.float64()))}),
        f"{_ORACLE_DUMP}/catalog.parquet")
    pq.write_table(pa.Table.from_pandas(mentions, preserve_index=False),
                   f"{_ORACLE_DUMP}/mentions.parquet")
    pq.write_table(pa.Table.from_pandas(triples, preserve_index=False),
                   f"{_ORACLE_DUMP}/triples.parquet")
    pq.write_table(pa.table({
        "text": pa.array(surfaces, pa.string()),
        "norm": pa.array([k[0] for k in keys], pa.string()),
        "node_id": pa.array([k[1] for k in keys], pa.int64())}),
        f"{_ORACLE_DUMP}/norms.parquet")
    pq.write_table(pa.table({
        "node": pa.array(sorted(am), pa.int64()),
        "root": pa.array([am[k] for k in sorted(am)], pa.int64())}),
        f"{_ORACLE_DUMP}/aliasmap.parquet")
    # pre-NMS span candidates: the model boundary of the mention path. The
    # SQL oracle re-derives D2 greedy NMS + M9 offset adjust + D4 chunk
    # merge from these rows (SQL_KG_MENTIONS, recursive CTEs) — same
    # engine-dump contract as the link embeddings above. Candidate
    # generation is the decoder's own span_candidates() by construction.
    from raykg.stages.mention import CandidateExtractor

    cands = extract_stage(pages_dataset(sf_dir),
                          extractor_cls=CandidateExtractor).to_pandas()
    pq.write_table(pa.Table.from_pandas(cands, preserve_index=False),
                   f"{_ORACLE_DUMP}/mention_cands.parquet")
    _dump_for[:] = [sf_dir]


SQL_KG_LABEL_REPORT = f"""
WITH m AS (SELECT text, label
           FROM read_parquet('{_ORACLE_DUMP}/mentions.parquet')),
d AS (SELECT DISTINCT label, text FROM m)
SELECT label, count(*)::BIGINT AS n_distinct,
       array_to_string(list_slice(list(text ORDER BY text), 1, 50), '|')
         AS surfaces
FROM d GROUP BY label ORDER BY label
"""


# kg_mentions re-derivation over the dumped PRE-NMS candidates
# (mention_cands.parquet — the model boundary; candidate generation is the
# decoder's own span_candidates()). Greedy NMS is inherently sequential, so
# both passes run as recursive CTEs over priority-sorted candidate LISTS:
# each step keeps the head and filters everything conflicting with it out of
# the tail — the same fixpoint as "keep iff it conflicts with no kept span".
# - Pass 1 (D2, per doc×chunk): priority (score DESC, ws, width, label_idx)
#   = decode.py's np.lexsort total order; conflict = inclusive word-interval
#   intersection (the decoder's occupancy bitmask covers ws..ws+width).
# - Pass 2 (D4, per doc, CHUNKED docs only — single-chunk documents skip
#   merge_chunks in the engine): priority (score DESC, start, end, label,
#   text); conflict = same label AND (equal lowercased text OR exclusive
#   char-range overlap). Binary string order == Python code-point order
#   (UTF-8 is order-preserving).
# Scores stay float64 end-to-end (the dump is the decoder's own sigmoid
# output) and cast to FLOAT only in the final projection — the same f64→f32
# IEEE cast the Arrow MENTIONS schema applies on the engine side.
SQL_KG_MENTIONS = f"""
WITH RECURSIVE
c AS (SELECT * FROM read_parquet('{_ORACLE_DUMP}/mention_cands.parquet')),
g1 AS (SELECT doc_id, chunk_idx, any_value(chunked) AS chunked,
              any_value(url) AS url,
              list(struct_pack(ws := ws, we := ws + width, sc := score,
                               cs := "start", ce := "end", lab := label,
                               txt := text)
                   ORDER BY score DESC, ws, width, label_idx) AS rem
       FROM c GROUP BY doc_id, chunk_idx),
nms AS (
  SELECT doc_id, chunk_idx, chunked, url,
         list_slice(rem, 1, 0) AS kept, rem FROM g1
  UNION ALL
  SELECT doc_id, chunk_idx, chunked, url,
         list_append(kept, rem[1]) AS kept,
         list_filter(list_slice(rem, 2, len(rem)),
                     x -> x.ws > rem[1].we OR x.we < rem[1].ws) AS rem
  FROM nms WHERE len(rem) > 0),
p1 AS (SELECT doc_id, chunked, url, unnest(kept) AS m
       FROM nms WHERE len(rem) = 0),
single AS (SELECT doc_id, url, m.txt AS txt, m.lab AS lab, m.sc AS sc,
                  m.cs AS cs, m.ce AS ce
           FROM p1 WHERE NOT chunked),
g2 AS (SELECT doc_id, any_value(url) AS url,
              list(struct_pack(sc := m.sc, cs := m.cs, ce := m.ce,
                               lab := m.lab, txt := m.txt)
                   ORDER BY m.sc DESC, m.cs, m.ce, m.lab, m.txt) AS rem
       FROM p1 WHERE chunked GROUP BY doc_id),
mrg AS (
  SELECT doc_id, url, list_slice(rem, 1, 0) AS kept, rem FROM g2
  UNION ALL
  SELECT doc_id, url, list_append(kept, rem[1]) AS kept,
         list_filter(list_slice(rem, 2, len(rem)),
                     x -> NOT (x.lab = rem[1].lab AND
                               (lower(x.txt) = lower(rem[1].txt) OR
                                (x.cs < rem[1].ce AND x.ce > rem[1].cs)))) AS rem
  FROM mrg WHERE len(rem) > 0),
merged AS (SELECT doc_id, url, m.txt AS txt, m.lab AS lab, m.sc AS sc,
                  m.cs AS cs, m.ce AS ce
           FROM (SELECT doc_id, url, unnest(kept) AS m
                 FROM mrg WHERE len(rem) = 0)),
u AS (SELECT * FROM single UNION ALL SELECT * FROM merged)
SELECT doc_id, url, txt AS text, lab AS label, sc::FLOAT AS score,
       cs AS "start", ce AS "end" FROM u
"""


# kg_nodes tail re-derivation. Pre-merge node rows are per-norm aggregates
# of the mention rows (label = argmax by (count, label); aliases = the 16
# lexicographically-smallest distinct surfaces — a min-k semilattice, so it
# is a pure function of the rows; mention_count = row count). Alias-merged
# rows then follow canonicalize._remerge_nodes exactly: canonical = winner
# by (mention_count DESC, canonical ASC); label = vote over pre-winner
# labels weighted by pre mention_count (ties to the larger label); aliases
# = (union of pre alias lists ∪ pre canonicals) minus the winner, capped at
# 16. Unaffected nodes never pass through the re-merge (so a surface equal
# to its own norm stays listed) — mirrored by the affected-set split.
SQL_KG_NODES = f"""
WITH m AS (SELECT text, label
           FROM read_parquet('{_ORACLE_DUMP}/mentions.parquet')),
n AS (SELECT text, norm, node_id
      FROM read_parquet('{_ORACLE_DUMP}/norms.parquet')),
am AS (SELECT node, root
       FROM read_parquet('{_ORACLE_DUMP}/aliasmap.parquet')),
mn AS (SELECT m.text, m.label, n.norm, n.node_id
       FROM m JOIN n USING (text) WHERE n.norm <> ''),
pre_cnt AS (SELECT norm, any_value(node_id) AS node_id,
                   count(*)::BIGINT AS mention_count
            FROM mn GROUP BY norm),
lab_cnt AS (SELECT norm, label, count(*) AS c FROM mn GROUP BY norm, label),
pre_lab AS (SELECT norm, label FROM (
    SELECT norm, label,
           row_number() OVER (PARTITION BY norm
                              ORDER BY c DESC, label DESC) AS rn
    FROM lab_cnt) WHERE rn = 1),
dtexts AS (SELECT DISTINCT norm, text FROM mn),
pre_alias AS (SELECT norm,
                     list_slice(list(text ORDER BY text), 1, 16) AS aliases
              FROM dtexts GROUP BY norm),
pre AS (SELECT p.norm AS canonical, p.node_id, p.mention_count,
               l.label, a.aliases
        FROM pre_cnt p JOIN pre_lab l USING (norm)
        JOIN pre_alias a USING (norm)),
affected AS (SELECT node FROM am UNION SELECT root FROM am),
untouched AS (
  SELECT node_id, canonical, label,
         array_to_string(aliases, '|') AS aliases, mention_count
  FROM pre WHERE node_id NOT IN (SELECT node FROM affected)),
aff AS (
  SELECT coalesce(am.root, pre.node_id) AS final_id, pre.*
  FROM pre LEFT JOIN am ON am.node = pre.node_id
  WHERE pre.node_id IN (SELECT node FROM affected)),
winner AS (SELECT final_id, canonical FROM (
    SELECT final_id, canonical,
           row_number() OVER (PARTITION BY final_id
                              ORDER BY mention_count DESC, canonical ASC)
             AS rn
    FROM aff) WHERE rn = 1),
mlab AS (SELECT final_id, label FROM (
    SELECT final_id, label,
           row_number() OVER (PARTITION BY final_id
                              ORDER BY sum(mention_count) DESC, label DESC)
             AS rn
    FROM aff GROUP BY final_id, label) WHERE rn = 1),
mcnt AS (SELECT final_id, sum(mention_count)::BIGINT AS mention_count
         FROM aff GROUP BY final_id),
alias_pool AS (
  SELECT DISTINCT final_id, a FROM (
    SELECT final_id, unnest(aliases) AS a FROM aff
    UNION ALL
    SELECT final_id, canonical AS a FROM aff)),
malias AS (
  SELECT p.final_id,
         array_to_string(list_slice(list(p.a ORDER BY p.a), 1, 16), '|')
           AS aliases
  FROM alias_pool p JOIN winner w
    ON w.final_id = p.final_id AND p.a <> w.canonical
  GROUP BY p.final_id),
merged AS (
  SELECT w.final_id AS node_id, w.canonical, ml.label,
         coalesce(ma.aliases, '') AS aliases, mc.mention_count
  FROM winner w JOIN mlab ml USING (final_id) JOIN mcnt mc USING (final_id)
  LEFT JOIN malias ma USING (final_id))
SELECT * FROM untouched UNION ALL SELECT * FROM merged ORDER BY node_id
"""


# Linking re-derivation: entity_id = catalog argmax by dot product over the
# engine's own (dumped) embeddings, ties to the lower catalog position —
# exactly LinkerActor's numpy argmax on stable catalog order; negative best
# similarity leaves the mention unlinked (-1), mirroring min_score=0.0.
# link_score is excluded from the compared projection: the engine
# accumulates it in float32, SQL in float64, and the 6-decimal hash
# rounding can land on opposite sides of the f32 ulp.
SQL_KG_LINKS = f"""
WITH m AS (SELECT * FROM read_parquet('{_ORACLE_DUMP}/mentions.parquet')),
q AS (SELECT text, emb FROM read_parquet('{_ORACLE_DUMP}/link_queries.parquet')),
c AS (SELECT pos, node_id, emb
      FROM read_parquet('{_ORACLE_DUMP}/catalog.parquet')),
sims AS (
  SELECT q.text, c.node_id, c.pos, list_dot_product(q.emb, c.emb) AS sim
  FROM q CROSS JOIN c),
best AS (
  SELECT text, node_id, sim FROM (
    SELECT text, node_id, sim,
           row_number() OVER (PARTITION BY text
                              ORDER BY sim DESC, pos ASC) AS rn
    FROM sims) WHERE rn = 1)
SELECT m.doc_id, m.url, m.text, m.label, m.score, m.start, m."end",
       coalesce(CASE WHEN b.sim >= 0 THEN b.node_id END, -1) AS entity_id
FROM m LEFT JOIN best b USING (text)
ORDER BY m.doc_id, m.start
"""


SQL_KG_EDGES = f"""
WITH t AS (SELECT subj, pred, obj
           FROM read_parquet('{_ORACLE_DUMP}/triples.parquet')),
n AS (SELECT text, norm, node_id
      FROM read_parquet('{_ORACLE_DUMP}/norms.parquet')),
am AS (SELECT node, root
       FROM read_parquet('{_ORACLE_DUMP}/aliasmap.parquet')),
r AS (
  SELECT coalesce(ams.root, ns.node_id) AS src, t.pred,
         coalesce(amo.root, nb.node_id) AS dst
  FROM t
  JOIN n ns ON ns.text = t.subj AND ns.norm <> ''
  JOIN n nb ON nb.text = t.obj AND nb.norm <> ''
  LEFT JOIN am ams ON ams.node = ns.node_id
  LEFT JOIN am amo ON amo.node = nb.node_id)
SELECT src, pred, dst, count(*)::BIGINT AS weight
FROM r GROUP BY src, pred, dst ORDER BY src, pred, dst
"""


# -- KG pipeline queries (non-SQL; pytest parity gates cover correctness) ---

def _kg_mentions(sf_dir: str):
    return _extracts(sf_dir).map_batches(explode_mentions, batch_format="pyarrow", batch_size=None)


def _kg_mentions_q(sf_dir: str):
    """queries() entry: triggers the engine dump (SQL_KG_MENTIONS reads the
    pre-NMS candidates from it) before returning the mention rows.
    ``_kg_mentions`` stays dump-free — ``_dump_kg_tail`` itself calls it."""
    _dump_kg_tail(sf_dir)
    return _kg_mentions(sf_dir)


def _kg_triples(sf_dir: str):
    return _extracts(sf_dir).map_batches(explode_triples, batch_format="pyarrow", batch_size=None)


def _kg_nodes(sf_dir: str):
    """Canonicalized + alias-merged nodes. For the driver compare the
    aliases list is projected to a '|'-joined string (list-column
    stringification differs between Arrow and DuckDB result frames); the
    pipeline parquet keeps the real list column."""
    import pandas as pd

    _dump_kg_tail(sf_dir)

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["aliases"] = ["|".join(a) for a in df["aliases"]]
        return df

    return _kg(sf_dir)["nodes"].map_batches(proj, batch_format="pandas")


def _kg_edges(sf_dir: str):
    """Aggregated alias-resolved edges, projected to (src, pred, dst,
    weight). The ``urls`` provenance column is a bounded per-block SAMPLE
    (graph.py module docstring) — deliberately block-dependent, so it is
    excluded from the oracle-compared projection (the pipeline parquet
    keeps it)."""
    _dump_kg_tail(sf_dir)
    return _kg(sf_dir)["edges"].select_columns(["src", "pred", "dst",
                                                "weight"])


def _kg_links(sf_dir: str):
    """Linked mentions, projected without ``link_score`` for the oracle
    compare (f32 vs f64 dot-product accumulation straddles the 6-decimal
    rounding; the pipeline parquet keeps the score column)."""
    _dump_kg_tail(sf_dir)
    cols = ["doc_id", "url", "text", "label", "score", "start", "end",
            "entity_id"]
    return _kg(sf_dir)["links"].select_columns(cols)


def _kg_links_sharded(sf_dir: str):
    """L1 scale path: catalog sharded by top LSH-code bits — BUILT
    DISTRIBUTIVELY (VERDICT r4 #1: per-shard sub-catalogs spill from tasks;
    the driver holds only handles, pytest pins byte-parity with the
    driver-built refs) — probe-routed linking, best-of merge (no_oracle:
    pytest asserts parity with the single-actor path)."""
    import tempfile

    from raykg.stages.link import (build_sharded_catalog_distributed,
                                   link_mentions_sharded)
    from raykg.stages.shuffle import adaptive_sort

    d = _kg(sf_dir)
    refs = build_sharded_catalog_distributed(
        d["nodes"], tempfile.mkdtemp(prefix="raykg_cat_"))
    # presentation sort only (VERDICT r3 #5): materialize (so the linker
    # runs once, count is metadata) then adaptive_sort — single-task sort
    # below the range-shuffle threshold, real range sort above it
    linked = link_mentions_sharded(_kg_mentions(sf_dir), refs).materialize()
    return adaptive_sort(linked, ["doc_id", "start"])


def _kg_label_report(sf_dir: str):
    """G1: mentions grouped by label → sorted distinct surface forms
    (/root/reference/Sources/GLiNERSwift/Diagnostics/EntityReporter.swift:8-38),
    via the bucketized grouped-apply."""
    import pandas as pd

    from raykg.stages.shuffle import bucketed_group_apply

    _dump_kg_tail(sf_dir)

    def report(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"label": [], "n_distinct": [], "surfaces": []}
        for label, g in df.groupby("label", sort=True):
            distinct = sorted(set(g["text"]))
            rows["label"].append(label)
            rows["n_distinct"].append(len(distinct))
            rows["surfaces"].append("|".join(distinct[:50]))
        return pd.DataFrame(rows)

    return bucketed_group_apply(_kg_mentions(sf_dir), ["label"], report,
                                num_buckets=4).sort("label")


def _legacy_mentions(sf_dir: str):
    """M5+A8: the GLiNER1 legacy path (prompted encode → BiLSTM/FFN span
    scorer → greedy overlap decode) over the page corpus — actor pool, flat
    mention rows. SQL-oracled since round 5 via the engine-dump pattern
    (the queries() wrapper dumps the pre-NMS candidates;
    SQL_LEGACY_MENTIONS re-derives the greedy overlap decode)."""
    from raykg.stages.extract import extract_docs
    from raykg.stages.mention import LegacyMentionExtractor
    from raykg.stages.shuffle import adaptive_sort

    from raykg.pipelines.kg import _pool_size

    docs = pages_dataset(sf_dir).map_batches(extract_docs, batch_format="pyarrow")
    # _pool_size cap: an actor pool that reserves every CPU starves its own
    # producer tasks and the streaming executor wedges (kg.py:_pool_size —
    # bit this query under the 4-CPU pytest session)
    scored = docs.map_batches(LegacyMentionExtractor, batch_format="pyarrow",
                              batch_size=64,
                              concurrency=_pool_size(4)).materialize()
    # presentation sort only (VERDICT r3 #5): scorer runs once, the sort
    # adapts to the (small) mention-row output
    return adaptive_sort(scored, ["doc_id", "start", "end"])


_legacy_dump_for: list[str] = []


def _legacy_mentions_q(sf_dir: str):
    """queries() entry: dumps the legacy decoder's pre-NMS candidates (the
    model boundary) for SQL_LEGACY_MENTIONS, then returns the mention rows.
    Same engine-dump contract (and the same to_pandas test-scaffolding
    caveat) as _dump_kg_tail."""
    if not (_legacy_dump_for and _legacy_dump_for[0] == sf_dir):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from raykg.stages.extract import extract_docs
        from raykg.stages.mention import LegacyCandidateExtractor

        import numpy as np
        import ray

        os.makedirs(_ORACLE_DUMP, exist_ok=True)
        docs = pages_dataset(sf_dir).map_batches(extract_docs,
                                                 batch_format="pyarrow")
        # unique row id per INPUT ROW: the engine decodes duplicate crawls
        # of the same doc_id independently, so the SQL NMS must group per
        # row (driver-side materialize is the same scaffolding caveat as
        # _dump_kg_tail — never a pipeline pattern)
        pdf = docs.to_pandas()
        pdf["row_uid"] = np.arange(len(pdf), dtype=np.int64)
        from raykg.pipelines.kg import _pool_size

        cands = ray.data.from_pandas(pdf).map_batches(
            LegacyCandidateExtractor, batch_format="pyarrow",
            batch_size=64, concurrency=_pool_size(4)).to_pandas()
        pq.write_table(pa.Table.from_pandas(cands, preserve_index=False),
                       f"{_ORACLE_DUMP}/legacy_cands.parquet")
        _legacy_dump_for[:] = [sf_dir]
    return _legacy_mentions(sf_dir)


# legacy_mentions re-derivation: ONE greedy overlap-decode pass per document
# (legacy.py:extract — priority (score DESC, ws, we, label_idx), keep iff no
# inclusive word-interval intersection with a kept span; no chunking, no D4)
# as a recursive CTE over the dumped pre-NMS candidates. Scores are float64
# on both sides (the legacy MENTIONS schema keeps f64).
SQL_LEGACY_MENTIONS = f"""
WITH RECURSIVE
c AS (SELECT * FROM read_parquet('{_ORACLE_DUMP}/legacy_cands.parquet')),
g1 AS (SELECT row_uid, any_value(doc_id) AS doc_id, any_value(url) AS url,
              list(struct_pack(ws := ws, we := we, sc := score,
                               cs := "start", ce := "end", lab := label,
                               txt := text)
                   ORDER BY score DESC, ws, we, label_idx) AS rem
       FROM c GROUP BY row_uid),
nms AS (
  SELECT row_uid, doc_id, url, list_slice(rem, 1, 0) AS kept, rem FROM g1
  UNION ALL
  SELECT row_uid, doc_id, url, list_append(kept, rem[1]) AS kept,
         list_filter(list_slice(rem, 2, len(rem)),
                     x -> x.ws > rem[1].we OR x.we < rem[1].ws) AS rem
  FROM nms WHERE len(rem) > 0)
SELECT doc_id, url, m.txt AS text, m.lab AS label, m.sc AS score,
       m.cs AS "start", m.ce AS "end"
FROM (SELECT doc_id, url, unnest(kept) AS m FROM nms WHERE len(rem) = 0)
"""


# -- schema_extract: engine-dump oracle (VERDICT r4 #4) ----------------------
#
# The model-scored pieces (mention scores, classification logits, structure
# field candidates) are ENGINE outputs dumped per doc; the SQL re-derives
# everything downstream of them relationally: per-label entity thresholds,
# dtype projection + '|' joins, softmax (single-label) / sigmoid
# (multi-label) + cls_threshold + (score desc, label asc) ordering, and the
# regex validator + first-valid pick for the structure field. Classification
# SCORES are not in the compared projection (SQL exp() can differ from numpy
# at f64 ulp); they only drive ordering/thresholding, where a flip would
# need two labels within one ulp.

_SE_TOPIC = ["business", "travel", "research"]
_SE_SENTI = ["positive", "negative", "neutral"]
_SE_WHO_RX = r"[a-z]+ [a-z]+"          # full-match, case-insensitive (M10)
_SE_PERSON_THR = 0.45                  # above cfg.threshold → real SQL work


def _se_schema():
    from raykg.config import Schema, Validator

    return (Schema()
            .entities(["person"], dtype="list", threshold=_SE_PERSON_THR)
            .entities(["organization"], dtype="list")
            .classification("topic", _SE_TOPIC)
            .classification("sentiment", _SE_SENTI, multi_label=True,
                            cls_threshold=0.6)
            .structure("card")
            .field("who", description="person",
                   validators=[Validator(_SE_WHO_RX, full=True)])
            .done())


_se_dump_for: list[str] = []


def _se_docs(sf_dir: str):
    """Doc set for schema_extract: extracted docs, deduped to the NEWEST
    revision per doc_id — dup-url page rows share a doc_id but carry
    different texts (the dup revision re-synthesizes its body), so without
    this the engine emits two different rows under one key and no
    relational oracle can follow."""
    from raykg.stages.extract import extract_docs
    from raykg.stages.shuffle import first_per_key

    docs = pages_dataset(sf_dir).map_batches(extract_docs,
                                             batch_format="pyarrow")
    return first_per_key(docs, ["doc_id"], "warc_ts", ascending=False,
                         tiebreak_cols=["url"])


def _dump_schema_tail(sf_dir: str) -> None:
    if _se_dump_for and _se_dump_for[0] == sf_dir:
        return
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raykg.oracle import Oracle

    os.makedirs(_ORACLE_DUMP, exist_ok=True)
    # doc-scale collect: oracle-dump scaffolding only (sf0.001/0.01), same
    # caveat as _dump_kg_tail — never a pipeline pattern
    docs = _se_docs(sf_dir).select_columns(["doc_id", "url", "text"]) \
        .to_pandas()
    o = Oracle()
    m_rows = {"doc_id": [], "ord": [], "label": [], "text": [], "score": []}
    c_rows = {"doc_id": [], "task": [], "label": [], "logit": []}
    s_rows = {"doc_id": [], "ord": [], "text": []}
    seen: set[int] = set()
    for did, text in zip(docs["doc_id"], docs["text"]):
        did = int(did)
        if did in seen:        # dup-url rows share doc_id AND text; dumps
            continue           # are per-distinct-doc, joins re-expand them
        seen.add(did)
        for i, m in enumerate(o.extract_mentions(
                text, ["person", "organization"], None)):
            m_rows["doc_id"].append(did)
            m_rows["ord"].append(i)
            m_rows["label"].append(m.label)
            m_rows["text"].append(m.text)
            m_rows["score"].append(float(m.score))
        for task, labels in (("topic", _SE_TOPIC), ("sentiment", _SE_SENTI)):
            logits = o.backend.classify_logits(text, labels)
            for lab, lg in zip(labels, logits):
                c_rows["doc_id"].append(did)
                c_rows["task"].append(task)
                c_rows["label"].append(lab)
                c_rows["logit"].append(float(lg))
        for i, m in enumerate(o.extract_mentions(text, ["person"], None)):
            s_rows["doc_id"].append(did)
            s_rows["ord"].append(i)
            s_rows["text"].append(m.text)
    pq.write_table(pa.table({
        "doc_id": pa.array([int(d) for d in docs["doc_id"]], pa.int64()),
        "url": pa.array(list(docs["url"]), pa.string())}),
        f"{_ORACLE_DUMP}/se_docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(m_rows["doc_id"], pa.int64()),
        "ord": pa.array(m_rows["ord"], pa.int64()),
        "label": pa.array(m_rows["label"], pa.string()),
        "text": pa.array(m_rows["text"], pa.string()),
        "score": pa.array(m_rows["score"], pa.float64())}),
        f"{_ORACLE_DUMP}/se_mentions.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(c_rows["doc_id"], pa.int64()),
        "task": pa.array(c_rows["task"], pa.string()),
        "label": pa.array(c_rows["label"], pa.string()),
        "logit": pa.array(c_rows["logit"], pa.float64())}),
        f"{_ORACLE_DUMP}/se_class.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(s_rows["doc_id"], pa.int64()),
        "ord": pa.array(s_rows["ord"], pa.int64()),
        "text": pa.array(s_rows["text"], pa.string())}),
        f"{_ORACLE_DUMP}/se_struct.parquet")
    _se_dump_for[:] = [sf_dir]


SQL_SCHEMA_EXTRACT = f"""
WITH d AS (SELECT doc_id, url
           FROM read_parquet('{_ORACLE_DUMP}/se_docs.parquet')),
m AS (SELECT * FROM read_parquet('{_ORACLE_DUMP}/se_mentions.parquet')),
ment AS (
  SELECT doc_id, label, string_agg(text, '|' ORDER BY ord) AS v
  FROM m
  WHERE score >= CASE WHEN label = 'person'
                      THEN {_SE_PERSON_THR} ELSE 0.3 END
  GROUP BY doc_id, label),
c AS (SELECT * FROM read_parquet('{_ORACLE_DUMP}/se_class.parquet')),
s1 AS (SELECT *, max(logit) OVER (PARTITION BY doc_id, task) AS mx FROM c),
s2 AS (SELECT *, exp(logit - mx) AS ez FROM s1),
s3 AS (SELECT *, ez / sum(ez) OVER (PARTITION BY doc_id, task) AS sm,
              1.0 / (1.0 + exp(-logit)) AS sg
       FROM s2),
topic AS (SELECT doc_id, string_agg(label, '|' ORDER BY sm DESC, label) AS v
          FROM s3 WHERE task = 'topic' AND sm >= 0.5 GROUP BY doc_id),
senti AS (SELECT doc_id, string_agg(label, '|' ORDER BY sg DESC, label) AS v
          FROM s3 WHERE task = 'sentiment' AND sg >= 0.6 GROUP BY doc_id),
st AS (SELECT * FROM read_parquet('{_ORACLE_DUMP}/se_struct.parquet')),
whof AS (SELECT doc_id, arg_min(text, ord) AS v
         FROM st
         WHERE regexp_full_match(text, '(?i){_SE_WHO_RX}')
         GROUP BY doc_id)
SELECT d.doc_id, d.url,
       coalesce(mp.v, '') AS person,
       coalesce(mo.v, '') AS organization,
       coalesce(t.v, '') AS topic,
       coalesce(sn.v, '') AS sentiment,
       coalesce(w.v, '') AS who
FROM d
LEFT JOIN ment mp ON mp.doc_id = d.doc_id AND mp.label = 'person'
LEFT JOIN ment mo ON mo.doc_id = d.doc_id AND mo.label = 'organization'
LEFT JOIN topic t ON t.doc_id = d.doc_id
LEFT JOIN senti sn ON sn.doc_id = d.doc_id
LEFT JOIN whof w ON w.doc_id = d.doc_id
ORDER BY d.doc_id, d.url
"""


def _schema_extract(sf_dir: str):
    """Distributed multi-task GLiNER2.extract over the page corpus,
    projected to flat compare columns (JSON float reprs are not
    SQL-reproducible; the label/text CONTENT is what the oracle checks)."""
    import json as _json

    import pandas as pd

    from raykg.stages.extract_task import schema_extract

    _dump_schema_tail(sf_dir)

    def proj(df: pd.DataFrame) -> pd.DataFrame:
        person, org, topic, senti, who = [], [], [], [], []
        for e, c, s in zip(df["entities"], df["classifications"],
                           df["structures"]):
            ents, cls, sts = _json.loads(e), _json.loads(c), _json.loads(s)
            person.append("|".join(ents.get("person", [])))
            org.append("|".join(ents.get("organization", [])))
            topic.append("|".join(x["label"] for x in cls.get("topic", [])))
            senti.append("|".join(x["label"]
                                  for x in cls.get("sentiment", [])))
            who.append(sts.get("card", {}).get("who", ""))
        return pd.DataFrame({
            "doc_id": df["doc_id"], "url": df["url"], "person": person,
            "organization": org, "topic": topic, "sentiment": senti,
            "who": who})

    out = schema_extract(_se_docs(sf_dir), _se_schema(), concurrency=4)
    return out.map_batches(proj, batch_format="pandas").sort(["doc_id", "url"])


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # knowledge-graph construction (flagship)
        "kg_mentions": _kg_mentions_q,
        "kg_triples": _kg_triples,
        "kg_nodes": _kg_nodes,
        "kg_edges": _kg_edges,
        "kg_links": _kg_links,
        "kg_links_sharded": _kg_links_sharded,
        "kg_label_report": _kg_label_report,
        "schema_extract": _schema_extract,
        "legacy_mentions": _legacy_mentions_q,
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
        # KG tail — group/agg/join over the engine's own dumped
        # intermediates (see _dump_kg_tail)
        "kg_mentions": SQL_KG_MENTIONS,
        "kg_label_report": SQL_KG_LABEL_REPORT,
        "kg_nodes": SQL_KG_NODES,
        "kg_edges": SQL_KG_EDGES,
        # kg_links_sharded stays no_oracle by design: its LSH multi-probe
        # candidate set is the approximation being tested (pytest pins it
        # against the single-actor LSH path); a brute-force SQL argmax is
        # only the oracle for the exact path below
        "kg_links": SQL_KG_LINKS,
        "legacy_mentions": SQL_LEGACY_MENTIONS,
        "schema_extract": SQL_SCHEMA_EXTRACT,
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
        # omitted on purpose: kg_triples (sentence-split + ordered
        # first-match regex pattern table — Python `re` semantics are not
        # reproducible in DuckDB's RE2), kg_links_sharded + knn_ivf
        # (approximate-by-design) — each covered by pytest
        # parity/golden/recall gates.
    }
