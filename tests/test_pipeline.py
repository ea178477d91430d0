"""Distributed-pipeline tests: parity vs the single-process oracle (the P/R
gate, SURVEY.md §5), determinism across parallelism, dedup, alias components,
and checkpoint/resume."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raykg.config import KG_LABELS
from raykg.oracle import Oracle
from raykg.sources.pages import pages_dataset

SF = "/root/testdata/sf0.001"


def _prf(expected: set, got: set) -> tuple[float, float]:
    if not expected and not got:
        return 1.0, 1.0
    tp = len(expected & got)
    p = tp / len(got) if got else 0.0
    r = tp / len(expected) if expected else 0.0
    return p, r


@pytest.fixture(scope="module")
def extracts(ray_session):
    from raykg.pipelines.kg import extract_stage

    return extract_stage(pages_dataset(SF)).materialize()


@pytest.fixture(scope="module")
def oracle_results():
    """Oracle over the deduped page set (newest warc_ts per url)."""
    import pyarrow.parquet as pq

    from raykg.sources.pages import make_page_row

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "lang"]).to_pylist()
    newest: dict[str, dict] = {}
    for d in docs:
        row = make_page_row(d["doc_id"], d["text"], d["lang"])
        cur = newest.get(row["url"])
        if cur is None or row["warc_ts"] > cur["warc_ts"]:
            newest[row["url"]] = row
    oracle = Oracle()
    out = {}
    for url, row in newest.items():
        out[url] = oracle.extract_page(url, row["html"], KG_LABELS)
    return out


def test_text_byte_identity(ray_session, oracle_results):
    """Per-row invariant: pipeline-extracted text is byte-identical per url
    to the oracle extractor AND to the producer-supplied text column."""
    from raykg.stages.extract import dedup_pages, extract_docs

    docs = dedup_pages(pages_dataset(SF)) \
        .map_batches(extract_docs, batch_format="pyarrow").to_pandas()
    assert len(docs) == len(oracle_results)
    for url, text in zip(docs["url"], docs["text"]):
        assert text.encode() == oracle_results[url].text.encode(), url


def test_mention_parity_exact(extracts, oracle_results):
    """Engine mentions == oracle mentions (same backend → the gate measures
    distributed plumbing; P/R must be 1.0, above the 0.95 bar). Span identity
    is exact; scores are compared with tolerance because the table stores
    float32 (the reference's golden tolerance is 0.01 — TestFixtures.swift;
    we hold 1e-4)."""
    got: dict[tuple, float] = {}
    for b in extracts.iter_batches(batch_size=256, batch_format="pyarrow"):
        for url, ms in zip(b.column("url").to_pylist(),
                           b.column("mentions").to_pylist()):
            for m in ms:
                got[(url, m["text"], m["label"], m["start"], m["end"])] = m["score"]
    expected: dict[tuple, float] = {}
    for url, res in oracle_results.items():
        for m in res.mentions:
            expected[(url, m.text, m.label, m.start, m.end)] = m.score
    p, r = _prf(set(expected), set(got))
    assert p == 1.0 and r == 1.0, (p, r, len(expected), len(got))
    max_d = max(abs(got[k] - expected[k]) for k in expected)
    assert max_d <= 1e-4, max_d


def test_triple_parity_exact(extracts, oracle_results):
    got = set()
    for b in extracts.iter_batches(batch_size=256, batch_format="pyarrow"):
        for url, ts in zip(b.column("url").to_pylist(),
                           b.column("triples").to_pylist()):
            for t in ts:
                got.add((url, t["subj"], t["pred"], t["obj"]))
    expected = {(url, t.subj, t.pred, t.obj)
                for url, res in oracle_results.items() for t in res.triples}
    p, r = _prf(expected, got)
    assert p == 1.0 and r == 1.0, (p, r, len(expected), len(got))
    assert len(expected) > 100     # the gate is non-trivial


def test_parallelism_invariance(ray_session, extracts):
    """Same results at a different batch size / pool size — batch boundaries
    must not leak into output (the in-sandbox analogue of the two-cluster-size
    determinism requirement)."""
    from raykg.config import PipelineConfig
    from raykg.pipelines.kg import extract_stage

    cfg = PipelineConfig(scorer_batch_size=32, scorer_concurrency=2)
    other = extract_stage(pages_dataset(SF), config=cfg)

    def key_set(ds):
        out = set()
        for b in ds.iter_batches(batch_size=512, batch_format="pyarrow"):
            for url, ms, ts in zip(b.column("url").to_pylist(),
                                   b.column("mentions").to_pylist(),
                                   b.column("triples").to_pylist()):
                out.add((url, tuple(sorted((m["text"], m["label"], m["start"])
                                           for m in ms)),
                         tuple(sorted((t["subj"], t["pred"], t["obj"])
                                      for t in ts))))
        return out

    assert key_set(other) == key_set(extracts)


def test_dedup_keeps_newest(ray_session):
    from raykg.stages.extract import dedup_pages

    deduped = dedup_pages(pages_dataset(SF)).to_pandas()
    assert deduped["url"].is_unique
    # duplicate generator rule: doc_id % 101 == 0 duplicates doc_id-1's url
    # with warc_ts + 1 day — the winner must be the later one
    import pyarrow.parquet as pq

    from raykg.sources.pages import make_page_row

    docs = pq.read_table(f"{SF}/documents.parquet").to_pylist()
    dup_rows = [make_page_row(d["doc_id"], d["text"], d["lang"])
                for d in docs if d["doc_id"] % 101 == 0 and d["doc_id"] > 0]
    assert dup_rows
    by_url = dict(zip(deduped["url"], deduped["warc_ts"]))
    for row in dup_rows:
        assert pd.Timestamp(by_url[row["url"]]) == pd.Timestamp(row["warc_ts"])


def test_nodes_and_edges(ray_session, extracts):
    from raykg.stages.canonicalize import canonicalize
    from raykg.stages.graph import materialize_edges
    from raykg.stages.mention import explode_mentions, explode_triples

    mentions = extracts.map_batches(explode_mentions, batch_format="pyarrow")
    triples = extracts.map_batches(explode_triples, batch_format="pyarrow")
    nodes = canonicalize(mentions).to_pandas()
    assert nodes["node_id"].is_unique and nodes["canonical"].is_unique
    assert (nodes["mention_count"] > 0).all()
    # mention_count conservation: sum of node counts == non-empty mentions
    import raykg.core.canonical as cc

    m = mentions.to_pandas()
    n_norm = sum(1 for t in m["text"] if cc.normalize_surface(t))
    assert nodes["mention_count"].sum() == n_norm
    edges = materialize_edges(triples).to_pandas()
    # sorted by (src, pred, dst), weights conserve triple count
    assert edges["weight"].sum() == len(triples.to_pandas())
    key = list(zip(edges["src"], edges["pred"], edges["dst"]))
    assert key == sorted(key)
    # every edge endpoint resolves to a canonical node id
    node_ids = set(nodes["node_id"])
    assert set(edges["src"]) <= node_ids and set(edges["dst"]) <= node_ids


def test_partial_edges_empty_norm_keeps_int64_ids(ray_session):
    """An empty-norm (punctuation-only) endpoint in a batch must not poison
    the other rows' 63-bit node ids: pandas coerces a dict with any None
    value to float64, silently flipping low bits of every mapped id
    (ADVICE r3). The bad row drops; every surviving id stays exact."""
    import pyarrow as pa

    from raykg.core.canonical import node_id, normalize_surface
    from raykg.stages.graph import partial_edges

    assert normalize_surface("!!!") == ""  # the poison surface
    batch = pa.table({
        "subj": ["Quasar Dynamics Ltd", "!!!", "Quasar Dynamics Ltd"],
        "pred": ["works_at", "works_at", "works_at"],
        "obj": ["Nebular Trust", "Nebular Trust", "???"],
        "url": ["u1", "u2", "u3"],
    })
    out = partial_edges(batch)
    # only the fully-valid row survives
    assert len(out) == 1 and int(out["weight"].iloc[0]) == 1
    assert out["src"].dtype == "int64" and out["dst"].dtype == "int64"
    # ids are EXACT (float64 round-trip would corrupt >2^53 ids)
    assert int(out["src"].iloc[0]) == node_id(
        normalize_surface("Quasar Dynamics Ltd"))
    assert int(out["dst"].iloc[0]) == node_id(
        normalize_surface("Nebular Trust"))


def test_prefilter_empty_patterns(ray_session):
    """RelationConfig(patterns=[]) is a harmless no-op, not a crash
    (ADVICE r3: prefilter() returned None and extract_triples raised)."""
    from raykg.core.decode import Mention
    from raykg.core.relations import RelationConfig, extract_triples

    cfg = RelationConfig(patterns=[])
    assert cfg.prefilter().search("Alice works at Acme Corp.") is None
    ments = [Mention("Alice", "person", 0.9, 0, 5),
             Mention("Acme Corp", "organization", 0.9, 15, 24)]
    assert extract_triples("Alice works at Acme Corp.", ments, cfg) == []


def test_alias_components(ray_session):
    """CC machinery on crafted near-dup surfaces (the corpus itself resolves
    corporate variants at normalize time, so exercise CC directly)."""
    import ray.data as rd

    from raykg.core.canonical import node_id
    from raykg.stages.canonicalize import (alias_pairs, apply_alias_merge,
                                           components_driver)

    surfaces = ["acme analytics", "acme analytic", "acme analytica",
                "zeta metrics", "unrelated thing"]
    nodes = rd.from_pandas(pd.DataFrame({
        "node_id": [node_id(s) for s in surfaces],
        "canonical": surfaces,
        "label": ["organization"] * 5,
        "aliases": [[s] for s in surfaces],
        "mention_count": [5, 1, 1, 3, 2],
    }))
    amap = components_driver(alias_pairs(nodes))
    acme = {node_id(s) for s in surfaces[:3]}
    # all three acme variants collapse to one root; zeta/unrelated untouched
    roots = {amap.get(n, n) for n in acme}
    assert len(roots) == 1
    assert node_id("zeta metrics") not in amap
    merged = apply_alias_merge(nodes, amap).to_pandas()
    assert len(merged) == 3
    top = merged[merged["mention_count"] == 7]
    assert len(top) == 1 and top["canonical"].iloc[0] == "acme analytics"


def test_finalize_edges_alias_rewrite(ray_session):
    """Post-aggregation alias rewrite (the branch that lets edge aggregation
    run concurrently with canonicalization): weights merge, url samples
    union, and the result is sorted."""
    import ray.data as rd

    from raykg.core.canonical import node_id
    from raykg.stages.graph import aggregate_edges, finalize_edges

    triples = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4], "url": ["u1", "u2", "u3", "u4"],
        "subj": ["Alpha Beta", "Alpha Betas", "Gamma", "Alpha Beta"],
        "pred": ["works_at"] * 4,
        "obj": ["Delta Inc", "Delta", "Delta", "Epsilon"],
        "subj_label": ["x"] * 4, "obj_label": ["y"] * 4,
        "score": [0.9] * 4,
    }))
    agg = aggregate_edges(triples).materialize()
    amap = {node_id("alpha betas"): node_id("alpha beta")}
    final = finalize_edges(agg, amap).to_pandas()
    ab, d = node_id("alpha beta"), node_id("delta")
    merged = final[(final["src"] == ab) & (final["dst"] == d)]
    assert len(merged) == 1 and int(merged["weight"].iloc[0]) == 2
    assert sorted(merged["urls"].iloc[0]) == ["u1", "u2"]
    assert int(final["weight"].sum()) == 4
    key = list(zip(final["src"], final["pred"], final["dst"]))
    assert key == sorted(key)


def test_components_distributed_matches_driver(ray_session):
    import ray.data as rd

    from raykg.stages.canonicalize import components_distributed

    pairs = pd.DataFrame({"a": [1, 2, 5, 8], "b": [2, 3, 6, 1]})
    ds = rd.from_pandas(pairs)
    lab = components_distributed(ds).to_pandas()
    got = dict(zip(lab["node"], lab["root"]))
    # {1,2,3,8} → root 1; {5,6} → root 5
    assert got[2] == 1 and got[3] == 1 and got[8] == 1 and got[6] == 5


def test_components_distributed_long_chain_and_random(ray_session):
    """The distributed path must return the TRUE component minimum on
    graphs whose diameter exceeds round 1's silent iteration cap (a 40-node
    chain), and byte-match driver union-find on a random graph."""
    import ray.data as rd

    from raykg.stages.canonicalize import (components_distributed,
                                           components_driver)

    # 40-node chain, worst labels-flow direction (min id at the far end)
    chain = pd.DataFrame({"a": list(range(40, 1, -1)),
                          "b": list(range(39, 0, -1))})
    lab = components_distributed(rd.from_pandas(chain)).to_pandas()
    got = dict(zip(lab["node"], lab["root"]))
    assert all(got[n] == 1 for n in range(2, 41))

    rng = np.random.default_rng(3)
    aa = rng.integers(0, 400, size=300)
    off = rng.integers(1, 50, size=300)
    rand = pd.DataFrame({"a": aa, "b": aa + off})
    ds = rd.from_pandas(rand).materialize()
    lab2 = components_distributed(ds).to_pandas()
    dist_map = {int(n): int(r) for n, r in zip(lab2["node"], lab2["root"])
                if n != r}
    assert dist_map == components_driver(ds)

    # empty pair set: both paths degrade to the identity
    from raykg.stages.canonicalize import alias_components

    empty = rd.from_pandas(pd.DataFrame({"a": pd.Series(dtype="int64"),
                                         "b": pd.Series(dtype="int64")})) \
        .materialize()
    assert alias_components(empty) == {}
    assert len(components_distributed(empty).to_pandas()) == 0


def test_alias_components_budget_zero_equals_driver(ray_session):
    """alias_components(driver_budget=0) (forces the distributed CC leg)
    must produce the same rewrite map as the driver union-find leg."""
    import ray.data as rd

    from raykg.core.canonical import node_id
    from raykg.stages.canonicalize import alias_components, alias_pairs

    surfaces = ["acme analytics", "acme analytic", "acme analytica",
                "zeta metrics", "zeta metric", "unrelated thing"]
    nodes = rd.from_pandas(pd.DataFrame({
        "node_id": [node_id(s) for s in surfaces],
        "canonical": surfaces,
        "label": ["organization"] * 6,
        "aliases": [[s] for s in surfaces],
        "mention_count": [5, 1, 1, 3, 1, 2],
    }))
    pairs = alias_pairs(nodes).materialize()
    assert alias_components(pairs, driver_budget=0) == \
        alias_components(pairs, driver_budget=10**9)


def test_links_referential_integrity(ray_session, extracts):
    """Every linked mention resolves to a catalog node; exact-surface
    mentions link at cosine ≈ 1."""
    import ray

    from raykg.stages.canonicalize import canonicalize
    from raykg.stages.link import build_catalog, link_mentions
    from raykg.stages.mention import explode_mentions

    mentions = extracts.map_batches(explode_mentions, batch_format="pyarrow")
    nodes = canonicalize(mentions).materialize()
    catalog_ref = ray.put(build_catalog(nodes))
    links = link_mentions(mentions, catalog_ref, concurrency=2).to_pandas()
    node_ids = set(nodes.to_pandas()["node_id"])
    linked = links[links["entity_id"] >= 0]
    assert len(linked) == len(links)            # catalog covers every surface
    assert set(linked["entity_id"]) <= node_ids
    # a mention whose surface IS a catalog canonical must link to itself
    assert (linked["link_score"] > 0.999).mean() > 0.95


def test_checkpoint_resume(ray_session, tmp_path):
    import ray.data as rd

    from raykg.pipelines.kg import run_kg_pipeline

    pages_dir = str(tmp_path / "pages")
    pages_dataset(SF).write_parquet(pages_dir)
    out = str(tmp_path / "kg")
    s1 = run_kg_pipeline(pages_dir, out, link=False, shard_size=1)
    assert s1["stages"]["extract"]["shards_skipped"] == 0
    n_nodes = s1["stages"]["nodes"]["rows"]
    assert n_nodes > 0 and os.path.exists(os.path.join(out, "metrics.json"))
    # second run: every shard skipped AND phase 2 skipped (nodes/edges
    # checkpoints match the extracts fingerprint) — no shuffle re-runs
    s2 = run_kg_pipeline(pages_dir, out, link=False, shard_size=1)
    assert s2["stages"]["extract"]["shards_skipped"] == s2["stages"]["extract"]["shards"]
    assert s2["stages"]["graph_phase"]["nodes_skipped"] is True
    assert s2["stages"]["graph_phase"]["edges_skipped"] is True
    assert "canonicalize" not in s2["stages"]
    nodes = rd.read_parquet(os.path.join(out, "nodes")).to_pandas()
    assert nodes["node_id"].is_unique and len(nodes) == n_nodes
    # phase-2-only crash: edges checkpoint lost → only edges recomputed,
    # node path (the expensive canonicalize shuffle) still skipped
    import json as _json

    edges_before = rd.read_parquet(os.path.join(out, "edges")).to_pandas()
    manifest0 = _json.load(open(os.path.join(out, "manifest.json")))
    del manifest0["phase2:edges"]
    _json.dump(manifest0, open(os.path.join(out, "manifest.json"), "w"))
    s2b = run_kg_pipeline(pages_dir, out, link=False, shard_size=1)
    assert s2b["stages"]["graph_phase"]["nodes_skipped"] is True
    assert s2b["stages"]["graph_phase"]["edges_skipped"] is False
    edges_after = rd.read_parquet(os.path.join(out, "edges")).to_pandas()
    assert edges_after.equals(edges_before)
    # crash-atomicity: a leftover half-written temp dir (simulated crash
    # mid-shard) must not break or pollute a resumed run; re-extracting a
    # shard changes the extracts fingerprint → phase 2 recomputes
    crash_dir = os.path.join(out, "extracts", "shard=00000.__tmp__")
    os.makedirs(crash_dir, exist_ok=True)
    with open(os.path.join(crash_dir, "garbage.parquet"), "w") as f:
        f.write("not parquet")
    manifest = _json.load(open(os.path.join(out, "manifest.json")))
    del manifest["shard=00000"]          # pretend shard 0 never completed
    _json.dump(manifest, open(os.path.join(out, "manifest.json"), "w"))
    s3 = run_kg_pipeline(pages_dir, out, link=False, shard_size=1)
    assert s3["stages"]["extract"]["shards_skipped"] == \
        s3["stages"]["extract"]["shards"] - 1
    assert s3["stages"]["graph_phase"]["nodes_skipped"] is False
    assert s3["stages"]["nodes"]["rows"] == n_nodes
    assert not os.path.exists(crash_dir)


def test_shard_overlap_equals_sequential(ray_session, tmp_path):
    """Overlapped shard execution (shard_overlap=2, halved per-shard pools)
    is a scheduling change only: nodes and edges are byte-identical to the
    sequential run."""
    import dataclasses

    import ray.data as rd

    from raykg.config import DEFAULT_CONFIG
    from raykg.pipelines.kg import run_kg_pipeline

    pages_dir = str(tmp_path / "pages")
    pages_dataset(SF).write_parquet(pages_dir)

    outs = {}
    for name, overlap in (("seq", 1), ("ovl", 2)):
        cfg = dataclasses.replace(DEFAULT_CONFIG, shard_overlap=overlap)
        out = str(tmp_path / name)
        run_kg_pipeline(pages_dir, out, link=False, shard_size=1, config=cfg)
        outs[name] = {
            t: rd.read_parquet(os.path.join(out, t)).to_pandas()
            .sort_values(list(rd.read_parquet(os.path.join(out, t))
                              .schema().names)[:3]).reset_index(drop=True)
            for t in ("nodes", "edges")
        }
    for t in ("nodes", "edges"):
        assert outs["seq"][t].equals(outs["ovl"][t]), t


def test_dup_winner_tie_and_identical_rows(ray_session):
    """Broadcast dedup edge cases the synthetic corpus never hits:
    (a) exact (url, warc_ts) ties resolve by smallest html md5 —
    deterministic across runs; (b) fully identical rows collapse to one
    within a batch."""
    from datetime import datetime
    from hashlib import md5

    import ray
    import ray.data as rd

    from raykg.stages.extract import dup_url_winners, filter_dup_losers

    ts = datetime(2025, 1, 1)
    ts2 = datetime(2025, 1, 2)
    rows = [
        # tie on max ts: two different htmls → md5 decides
        {"url": "u/tie", "warc_ts": ts, "html": b"<p>A</p>", "lang": "en",
         "text": "A"},
        {"url": "u/tie", "warc_ts": ts, "html": b"<p>B</p>", "lang": "en",
         "text": "B"},
        # plain newest-wins
        {"url": "u/new", "warc_ts": ts, "html": b"<p>old</p>", "lang": "en",
         "text": "old"},
        {"url": "u/new", "warc_ts": ts2, "html": b"<p>new</p>", "lang": "en",
         "text": "new"},
        # fully identical duplicate rows
        {"url": "u/id", "warc_ts": ts, "html": b"<p>X</p>", "lang": "en",
         "text": "X"},
        {"url": "u/id", "warc_ts": ts, "html": b"<p>X</p>", "lang": "en",
         "text": "X"},
        # unique row untouched
        {"url": "u/solo", "warc_ts": ts, "html": b"<p>S</p>", "lang": "en",
         "text": "S"},
    ]
    # single block: the identical-rows collapse is per-batch (documented:
    # byte-identical rows in DIFFERENT blocks are handled by the
    # drop_tied + captured-winner-union path, asserted below)
    ds = rd.from_items(rows).repartition(1).materialize()
    winners = dup_url_winners(ds)
    assert set(winners) == {"u/tie", "u/new", "u/id"}
    assert winners["u/tie"][1] is not None          # tie → content decides
    assert winners["u/new"][1] is None              # no tie → ts suffices
    out = filter_dup_losers(ds, ray.put(winners)).to_pandas()
    assert sorted(out["url"]) == ["u/id", "u/new", "u/solo", "u/tie"]
    # tie winner is the lexicographically smallest md5 (deterministic)
    want = min(b"<p>A</p>", b"<p>B</p>",
               key=lambda h: md5(h).hexdigest())
    assert out.loc[out["url"] == "u/tie", "html"].iloc[0] == want
    assert out.loc[out["url"] == "u/new", "text"].iloc[0] == "new"

    # cross-block byte-identical ties: one row per block → the per-batch
    # collapse can't see them; capture_tied_rows + drop_tied + union must
    # still yield EXACTLY one row per url (ADVICE round 2)
    ds2 = rd.from_items(rows).repartition(7).materialize()
    w2, tied_tbl = dup_url_winners(ds2, capture_tied_rows=True)
    assert tied_tbl is not None
    # every url with a content tiebreak has exactly one captured row
    tied_urls = {u for u, (_ts, b) in w2.items() if b is not None}
    assert sorted(tied_tbl.column("url").to_pylist()) == sorted(tied_urls)
    filt = filter_dup_losers(ds2, ray.put(w2), drop_tied=True)
    out2 = filt.union(rd.from_arrow(tied_tbl)).to_pandas()
    assert sorted(out2["url"]) == ["u/id", "u/new", "u/solo", "u/tie"]
    assert out2.loc[out2["url"] == "u/tie", "html"].iloc[0] == want
    assert out2.loc[out2["url"] == "u/id", "html"].iloc[0] == b"<p>X</p>"


def test_warc_source_roundtrip(ray_session, tmp_path):
    """WARC source (CC's native container): synthetic pages → spec WARC
    (plain AND per-record-gzip) → read_warc → identical pages rows, and the
    KG extract stage runs straight off it."""
    from raykg.pipelines.kg import extract_stage
    from raykg.sources.pages import make_page_row
    from raykg.sources.warc import read_warc, warc_to_pages, write_warc

    rows = [make_page_row(i, "filler for the body", "en") for i in range(12)]
    rows[3]["lang"] = "de"
    plain = str(tmp_path / "a.warc")
    gz = str(tmp_path / "b.warc.gz")
    write_warc(plain, rows[:7], compress=False)
    write_warc(gz, rows[7:], compress=True)

    # direct parse (both compressions) preserves every field
    with open(plain, "rb") as f:
        t = warc_to_pages(f.read())
    assert t.num_rows == 7
    for i in range(7):
        assert t.column("url")[i].as_py() == rows[i]["url"]
        assert t.column("html")[i].as_py() == rows[i]["html"]
        assert t.column("text")[i].as_py() == rows[i]["text"]   # byte identity
        assert t.column("warc_ts")[i].as_py() == rows[i]["warc_ts"].replace(microsecond=0)
    with open(gz, "rb") as f:
        t2 = warc_to_pages(f.read())
    assert t2.num_rows == 5
    assert t2.column("lang").to_pylist() == [r["lang"] for r in rows[7:]]

    # as a Dataset source feeding the pipeline
    pages = read_warc([plain, gz])
    df = pages.to_pandas().sort_values("url").reset_index(drop=True)
    assert len(df) == 12 and df["url"].is_unique
    ex = extract_stage(pages).to_pandas()
    assert len(ex) == 12 and (ex["n_words"] >= 0).all()


def test_kg_pipeline_over_warc(ray_session, tmp_path):
    """The production pipeline runs straight off a directory of WARC files
    (extension auto-detection) with checkpoints and the same outputs."""
    import ray.data as rd

    from raykg.pipelines.kg import run_kg_pipeline
    from raykg.sources.pages import make_page_row
    from raykg.sources.warc import write_warc

    rows = [make_page_row(i, "filler text body", "en") for i in range(30)]
    wdir = tmp_path / "warcs"
    wdir.mkdir()
    write_warc(str(wdir / "a.warc"), rows[:15])
    write_warc(str(wdir / "b.warc.gz"), rows[15:], compress=True)
    out = str(tmp_path / "kg")
    s = run_kg_pipeline(str(wdir), out, link=False, shard_size=1)
    assert s["stages"]["extract"]["rows"] == 30
    nodes = rd.read_parquet(os.path.join(out, "nodes")).to_pandas()
    edges = rd.read_parquet(os.path.join(out, "edges")).to_pandas()
    assert len(nodes) > 0 and len(edges) > 0
    # resume skips both warc shards
    s2 = run_kg_pipeline(str(wdir), out, link=False, shard_size=1)
    assert s2["stages"]["extract"]["shards_skipped"] == 2


def test_wet_conversion_records(ray_session, tmp_path):
    """WET (conversion) records: payload is the pre-extracted text; html is
    empty; extract_docs takes the supplied text verbatim and the mentions
    match what the same text yields through the normal path."""
    from raykg.sources.pages import make_page_row
    from raykg.sources.warc import read_warc, write_warc
    from raykg.stages.extract import extract_docs

    rows = [make_page_row(i, "wet filler", "en") for i in range(8)]
    wet = str(tmp_path / "c.warc.gz")
    write_warc(wet, rows, compress=True, wet=True)
    pages = read_warc([wet]).to_pandas().sort_values("url")
    assert (pages["html"].map(len) == 0).all()
    assert list(pages.sort_values("url")["text"]) == \
        [r["text"] for r in sorted(rows, key=lambda r: r["url"])]

    docs = read_warc([wet]).map_batches(extract_docs,
                                        batch_format="pyarrow").to_pandas()
    by_url = dict(zip(docs["url"], docs["text"]))
    for r in rows:
        assert by_url[r["url"]] == r["text"]       # taken verbatim


def test_warc_byte_range_splits(ray_session, tmp_path):
    """CC-index work units (VERDICT r2 #6): a multi-member .warc.gz read
    through >=2 (path, offset, length) split units yields pages identical to
    the whole-file read, and the streaming iterator holds only bounded state
    (exercised with a chunk-size smaller than a record)."""
    import raykg.sources.warc as W
    from raykg.sources.pages import make_page_row
    from raykg.sources.warc import (iter_warc_records, read_warc,
                                    read_warc_splits, write_warc)

    rows = [make_page_row(i, "filler body text for the record", "en")
            for i in range(10)]
    gz = str(tmp_path / "cc.warc.gz")
    index: list = []
    write_warc(gz, rows, compress=True, index=index)
    assert len(index) == 10 and index[0][0] == 0

    whole = read_warc([gz]).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert len(whole) == 10

    # three units covering the file: 4 + 3 + 3 records
    cuts = [index[0], index[4], index[7]]
    units = [
        {"path": gz, "offset": cuts[0][0],
         "length": index[3][0] + index[3][1] - cuts[0][0]},
        {"path": gz, "offset": cuts[1][0],
         "length": index[6][0] + index[6][1] - cuts[1][0]},
        {"path": gz, "offset": cuts[2][0], "length": 0},   # 0 = to EOF
    ]
    split = read_warc_splits(units).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(whole, split)

    # mid-file unit alone sees exactly its records, none of its neighbors'
    only_mid = read_warc_splits([units[1]]).to_pandas()
    assert sorted(only_mid["url"]) == sorted(r["url"] for r in rows[4:7])

    # bounded-memory path: tiny chunks force multi-fill record assembly
    old_chunk = W._READ_CHUNK
    W._READ_CHUNK = 64
    try:
        with open(gz, "rb") as f:
            recs = list(iter_warc_records(f))
        assert len(recs) == 10
        assert [h["warc-target-uri"] for h, _ in recs] == \
            [r["url"] for r in rows]
    finally:
        W._READ_CHUNK = old_chunk

    # plain (uncompressed) WARC through the same streaming reader
    plain = str(tmp_path / "cc.warc")
    pidx: list = []
    write_warc(plain, rows[:5], compress=False, index=pidx)
    got = read_warc_splits([{"path": plain, "offset": pidx[2][0],
                             "length": pidx[3][0] + pidx[3][1] - pidx[2][0]}]) \
        .to_pandas()
    assert sorted(got["url"]) == sorted(r["url"] for r in rows[2:4])


def test_alias_map_dataset_path_byte_identical(ray_session):
    """VERDICT r2 #7: the bucketized-join alias path (map as a (node, root)
    Dataset — beyond-driver-memory shape) produces byte-identical nodes AND
    edges to the broadcast-dict path."""
    import ray.data as rd

    from raykg.core.canonical import node_id
    from raykg.stages.canonicalize import (alias_components_auto, alias_pairs,
                                           apply_alias_merge,
                                           components_driver)
    from raykg.stages.graph import aggregate_edges, finalize_edges

    surfaces = ["acme analytics", "acme analytic", "acme analytica",
                "zeta metrics", "zeta metrica", "unrelated thing"]
    nodes = rd.from_pandas(pd.DataFrame({
        "node_id": [node_id(s) for s in surfaces],
        "canonical": surfaces,
        "label": ["organization"] * 6,
        "aliases": [[s] for s in surfaces],
        "mention_count": [5, 1, 1, 3, 2, 2],
    })).materialize()
    amap = components_driver(alias_pairs(nodes))
    assert amap                                  # the fixture really merges
    amap_ds = rd.from_pandas(pd.DataFrame({
        "node": pd.Series(list(amap.keys()), dtype="int64"),
        "root": pd.Series(list(amap.values()), dtype="int64")}))

    via_dict = apply_alias_merge(nodes, amap).to_pandas() \
        .sort_values("node_id").reset_index(drop=True)
    via_join = apply_alias_merge(nodes, amap_ds).to_pandas() \
        .sort_values("node_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(via_dict, via_join)

    triples = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3, 4], "url": ["u1", "u2", "u3", "u4"],
        "subj": ["acme analytics", "acme analytic", "zeta metrics",
                 "acme analytics"],
        "pred": ["works_at"] * 4,
        "obj": ["zeta metrica", "zeta metrics", "unrelated thing",
                "unrelated thing"],
        "subj_label": ["x"] * 4, "obj_label": ["y"] * 4,
        "score": [0.9] * 4,
    }))
    agg = aggregate_edges(triples).materialize()
    e_dict = finalize_edges(agg, amap).to_pandas().reset_index(drop=True)
    e_join = finalize_edges(agg, amap_ds).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(e_dict, e_join)
    # both endpoints were really rewritten somewhere
    assert set(amap.values()) & (set(e_dict["src"]) | set(e_dict["dst"]))
    assert not (set(amap.keys()) & (set(e_dict["src"]) | set(e_dict["dst"])))

    # the adaptive chooser: driver path below budget, Dataset beyond
    pairs = alias_pairs(nodes)
    small = alias_components_auto(pairs, driver_budget=10**9)
    assert isinstance(small, dict) and small == amap
    ds_out = alias_components_auto(pairs, driver_budget=0, map_budget=0)
    got = {int(r["node"]): int(r["root"]) for r in ds_out.take_all()}
    assert got == amap


def test_bucketed_group_apply_adaptive_equals_shuffle(ray_session):
    """The adaptive driver-merge fast path of ``bucketed_group_apply``
    (input under the row budget → one driver-side fn call) must be
    result-identical to the bucketized shuffle path (``driver_budget_rows=0``
    pins it) — including groups that span blocks and empty-result fns."""
    import numpy as np
    import ray.data as rd

    from raykg.stages.shuffle import bucketed_group_apply

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "k": rng.integers(0, 50, size=4000),
        "v": rng.integers(0, 1000, size=4000),
    })
    # many small blocks so most groups span blocks
    ds = rd.from_pandas(np.array_split(df, 16))

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", as_index=False).agg(
            n=("v", "size"), s=("v", "sum"), mx=("v", "max"))

    fast = bucketed_group_apply(ds, ["k"], agg).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    slow = bucketed_group_apply(ds, ["k"], agg, driver_budget_rows=0) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    assert len(fast) == df["k"].nunique()

    # empty-result fn: both paths yield an empty, schema-stable Dataset
    def none(g: pd.DataFrame) -> pd.DataFrame:
        return g[g["v"] < -1][["k", "v"]]

    assert bucketed_group_apply(ds, ["k"], none).count() == 0
    assert bucketed_group_apply(ds, ["k"], none,
                                driver_budget_rows=0).count() == 0

    # over-budget input falls back to the shuffle path and still agrees
    over = bucketed_group_apply(ds, ["k"], agg,
                                driver_budget_rows=100).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(over, slow, check_dtype=False)


def test_bucketed_group_apply_byte_budget_fallback(ray_session, monkeypatch):
    """Wide rows under the ROW budget but over the BYTE budget must take the
    shuffle path, not concat onto the driver (review: dedup_pages feeds full
    html columns through this helper)."""
    import ray.data as rd

    from raykg.stages import shuffle as sh

    df = pd.DataFrame({
        "k": [1, 1, 2, 2],
        "v": ["x" * 1000] * 4,
    })
    ds = rd.from_pandas(np.array_split(df, 2))

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", as_index=False).agg(n=("v", "size"))

    monkeypatch.setattr(sh, "DRIVER_MERGE_BYTES", 100)   # force over-bytes
    out = sh.bucketed_group_apply(ds, ["k"], agg).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert out.values.tolist() == [[1, 2], [2, 2]]


def test_resume_invalidates_on_semantic_change(ray_session, tmp_path):
    """Checkpoint fingerprints cover labels/config, not just input files:
    rerunning the same out_dir with different labels must re-extract and
    rebuild the graph, and a stale orphan shard dir from a larger previous
    run must be pruned before phase 2 (review round 3)."""
    import ray.data as rd

    from raykg.pipelines.kg import run_kg_pipeline

    pages_dir = str(tmp_path / "pages")
    pages_dataset(SF).write_parquet(pages_dir)
    out = str(tmp_path / "kg")
    s1 = run_kg_pipeline(pages_dir, out, link=False, shard_size=1)
    assert s1["stages"]["extract"]["shards_skipped"] == 0
    n_shards = s1["stages"]["extract"]["shards"]

    # same input, different labels → nothing may be skipped
    s2 = run_kg_pipeline(pages_dir, out, link=False, shard_size=1,
                         labels=["person", "organization"])
    assert s2["stages"]["extract"]["shards_skipped"] == 0
    assert s2["stages"]["graph_phase"]["nodes_skipped"] is False
    nodes = rd.read_parquet(os.path.join(out, "nodes")).to_pandas()
    assert set(nodes["label"]) <= {"person", "organization"}

    # orphan shard from a hypothetical larger run: pruned, not ingested
    orphan = os.path.join(out, "extracts", f"shard={n_shards + 7:05d}")
    os.makedirs(orphan, exist_ok=True)
    import shutil as _sh

    _sh.copytree(os.path.join(out, "extracts", "shard=00000"), orphan,
                 dirs_exist_ok=True)
    s3 = run_kg_pipeline(pages_dir, out, link=False, shard_size=1,
                         labels=["person", "organization"])
    assert not os.path.exists(orphan)
    assert s3["stages"]["extract"]["shards_skipped"] == n_shards


def test_warc_index_free_even_splits(ray_session, tmp_path):
    """read_warc(split_bytes=...) fans a .warc.gz out over even byte
    ranges with NO index — the member-resync reader makes the arbitrary
    cut points exact (VERDICT r3 #8 scale path)."""
    import os

    from raykg.sources.pages import make_page_row
    from raykg.sources.warc import read_warc, write_warc

    rows = [make_page_row(i, "index free split body", "en")
            for i in range(40)]
    gz = str(tmp_path / "seg.warc.gz")
    write_warc(gz, rows, compress=True)
    size = os.path.getsize(gz)
    whole = read_warc([gz]).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    split = read_warc(gz, split_bytes=size // 7).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(whole, split)
    assert len(split) == 40


def test_run_kg_pipeline_dataset_alias_map(ray_session, tmp_path):
    """VERDICT r4 #2: the PRODUCTION entry point takes the dataset-map path
    when the alias budgets force it — byte-identical nodes/edges vs the
    dict path, parquet-persisted map, and phase-2 resume through the
    sentinel (edges re-finalized from the RELOADED (node, root) Dataset)."""
    import glob
    import json
    import shutil

    import pyarrow.parquet as pq

    from datetime import datetime, timedelta

    from raykg.core.textextract import extract_text
    from raykg.pipelines.kg import run_kg_pipeline
    from raykg.sources.pages import synth_html

    # sf0.001 yields ZERO alias pairs (measured) — synthesize a corpus with
    # real near-duplicate org surfaces so both alias paths have work to do
    rows = []
    for i in range(24):
        name = ["Helios Dynamics", "Helios Dynamic", "Helios Dynamicss"][i % 3]
        body = (f"{name} announced a partnership with Quark Labs. "
                f"Later {name} said growth at {name} continues.")
        html = synth_html(i, body, 42)
        rows.append({"url": f"https://ex{i:02d}.example.com/a/{i}",
                     "warc_ts": datetime(2025, 1, 1) + timedelta(minutes=i),
                     "html": html, "text": extract_text(html), "lang": "en"})
    pages_dir = str(tmp_path / "pages")
    import ray.data as rd

    rd.from_pandas(pd.DataFrame(rows)).write_parquet(pages_dir)

    def read_sorted(d, drop=()):
        df = pq.read_table(sorted(glob.glob(os.path.join(d, "*.parquet")))) \
            .to_pandas()
        df = df.drop(columns=list(drop), errors="ignore")
        if "aliases" in df.columns:
            df["aliases"] = ["|".join(a) for a in df["aliases"]]
        keys = [c for c in ("node_id", "src", "pred", "dst") if c in df.columns]
        return df.sort_values(keys, kind="stable").reset_index(drop=True)

    out_dict = str(tmp_path / "kg_dict")
    out_ds = str(tmp_path / "kg_ds")
    run_kg_pipeline(pages_dir, out_dict, link=False, shard_size=2)
    run_kg_pipeline(pages_dir, out_ds, link=False, shard_size=2,
                    alias_driver_budget=0, alias_map_budget=0)

    # the forced run really took the dataset path: sentinel + parquet map
    with open(os.path.join(out_ds, "alias_map.json")) as f:
        sent = json.load(f)
    assert sent.get("__dataset__") == "alias_map_pq"
    assert glob.glob(os.path.join(out_ds, "alias_map_pq", "*.parquet"))
    # and the dict run really had merges to apply (non-degenerate fixture)
    with open(os.path.join(out_dict, "alias_map.json")) as f:
        assert json.load(f)

    pd.testing.assert_frame_equal(read_sorted(os.path.join(out_dict, "nodes")),
                                  read_sorted(os.path.join(out_ds, "nodes")))
    # edge url samples are block-dependent by design (graph.py docstring);
    # everything else must match exactly
    pd.testing.assert_frame_equal(
        read_sorted(os.path.join(out_dict, "edges"), drop=("urls",)),
        read_sorted(os.path.join(out_ds, "edges"), drop=("urls",)))

    # phase-2 resume THROUGH the sentinel: drop edges only; the node path
    # resumes by reloading the parquet map as a Dataset and finalize_edges
    # consumes it via the bucketized-join rewrite
    before = read_sorted(os.path.join(out_ds, "edges"), drop=("urls",))
    shutil.rmtree(os.path.join(out_ds, "edges"))
    s = run_kg_pipeline(pages_dir, out_ds, link=False, shard_size=2,
                        alias_driver_budget=0, alias_map_budget=0)
    assert s["stages"]["graph_phase"]["nodes_skipped"] is True
    after = read_sorted(os.path.join(out_ds, "edges"), drop=("urls",))
    pd.testing.assert_frame_equal(before, after)


def test_run_kg_pipeline_sharded_link(ray_session, tmp_path):
    """link_mode='sharded': the production entry point links through the
    DISTRIBUTIVELY-built catalog (shards spilled beside the output, driver
    holds handles only) — same row coverage as the broadcast path and full
    referential integrity, with the shard spill present on disk."""
    import glob

    import pyarrow.parquet as pq

    from raykg.pipelines.kg import run_kg_pipeline

    pages_dir = str(tmp_path / "pages")
    pages_dataset(SF).write_parquet(pages_dir)

    out_b = str(tmp_path / "kg_b")
    out_s = str(tmp_path / "kg_s")
    run_kg_pipeline(pages_dir, out_b, shard_size=2, link=True)
    run_kg_pipeline(pages_dir, out_s, shard_size=2, link=True,
                    link_mode="sharded")

    def read(d, sub):
        return pq.read_table(
            sorted(glob.glob(os.path.join(d, sub, "*.parquet")))).to_pandas()

    lb = read(out_b, "links")
    ls = read(out_s, "links")
    assert len(lb) == len(ls) > 0                  # nothing dropped
    nodes = set(read(out_s, "nodes")["node_id"])
    assert set(ls["entity_id"]) <= nodes | {-1}    # referential integrity
    assert glob.glob(os.path.join(out_s, "catalog_shards", "*.npz"))
    # exact-surface links agree between the algorithms: rows the broadcast
    # path linked with cosine ~1 must land on the same entity via shards
    kb = lb.set_index(["doc_id", "start", "end"])
    ks = ls.set_index(["doc_id", "start", "end"])
    exact = kb[kb["link_score"] > 0.999]
    agree = (ks.loc[exact.index, "entity_id"] == exact["entity_id"]).mean()
    assert agree == 1.0


def test_canonicalize_composed_equals_two_phase(ray_session, extracts, monkeypatch):
    """Round 5: below the driver budget canonicalize composes both merge
    layers into one grouped apply; the salted two-phase stays the scale
    path. Both must be byte-identical (the merge is associative +
    commutative with deterministic finalize)."""
    import raykg.stages.shuffle as sh
    from raykg.stages.canonicalize import canonicalize
    from raykg.stages.mention import explode_mentions

    mentions = extracts.map_batches(explode_mentions, batch_format="pyarrow")
    composed = canonicalize(mentions).to_pandas() \
        .sort_values("node_id").reset_index(drop=True)
    # force the two-phase path by zeroing the budget canonicalize consults
    monkeypatch.setattr(sh, "DRIVER_MERGE_BUDGET", 0)
    two_phase = canonicalize(mentions).to_pandas() \
        .sort_values("node_id").reset_index(drop=True)
    composed["aliases"] = [list(a) for a in composed["aliases"]]
    two_phase["aliases"] = [list(a) for a in two_phase["aliases"]]
    pd.testing.assert_frame_equal(composed, two_phase)
    assert len(composed) > 50
