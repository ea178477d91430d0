"""Entity-linker tests: brute-force vs LSH-bucketed lookup paths."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def catalog():
    from raykg.core.canonical import node_id
    from raykg.stages.link import build_catalog

    import ray.data as rd

    surfaces = ["helios dynamics", "northwind systems", "amelia reed",
                "seattle", "vertex labs", "tokyo", "maria chen",
                "atlas industries", "quantum labs", "berlin"]
    nodes = rd.from_pandas(pd.DataFrame({
        "node_id": [node_id(s) for s in surfaces],
        "canonical": surfaces,
        "label": ["organization"] * 10,
        "aliases": [[s] for s in surfaces],
        "mention_count": [1] * 10,
    }))
    return build_catalog(nodes), surfaces


def _link(catalog, queries, use_lsh):
    import pyarrow as pa

    from raykg.stages.link import LinkerActor

    actor = LinkerActor(catalog, use_lsh=use_lsh)
    batch = pa.table({
        "doc_id": pa.array(range(len(queries)), pa.int64()),
        "url": pa.array(["u"] * len(queries), pa.string()),
        "text": pa.array(queries, pa.string()),
        "label": pa.array(["x"] * len(queries), pa.string()),
        "score": pa.array([1.0] * len(queries), pa.float32()),
        "start": pa.array([0] * len(queries), pa.int64()),
        "end": pa.array([1] * len(queries), pa.int64()),
    })
    out = actor(batch)
    return list(zip(out.column("entity_id").to_pylist(),
                    out.column("link_score").to_pylist()))


def test_linker_exact_and_fuzzy(ray_session, catalog):
    from raykg.core.canonical import node_id

    cat, surfaces = catalog
    # exact surfaces link to their own node with cosine 1
    got = _link(cat, ["Helios Dynamics", "Seattle"], use_lsh=False)
    assert got[0][0] == node_id("helios dynamics") and got[0][1] > 0.999
    assert got[1][0] == node_id("seattle") and got[1][1] > 0.999
    # fuzzy variant links to the nearest catalog entry
    got = _link(cat, ["Helios Dynamcs"], use_lsh=False)   # typo
    assert got[0][0] == node_id("helios dynamics")
    assert 0.6 < got[0][1] < 1.0


def test_linker_lsh_matches_bruteforce_on_exact(ray_session, catalog):
    cat, surfaces = catalog
    queries = [s.title() for s in surfaces]
    brute = _link(cat, queries, use_lsh=False)
    lsh = _link(cat, queries, use_lsh=True)
    # exact-surface queries: LSH multi-probe must find the identical node
    assert [b[0] for b in brute] == [l[0] for l in lsh]
    assert all(abs(b[1] - l[1]) < 1e-6 for b, l in zip(brute, lsh))


def test_linker_empty_catalog(ray_session):
    import ray.data as rd

    from raykg.stages.link import build_catalog

    empty = rd.from_pandas(pd.DataFrame({
        "node_id": pd.Series([], dtype="int64"),
        "canonical": pd.Series([], dtype="string"),
        "label": pd.Series([], dtype="string"),
        "aliases": pd.Series([], dtype="object"),
        "mention_count": pd.Series([], dtype="int64"),
    }))
    cat = build_catalog(empty)
    got = _link(cat, ["anything"], use_lsh=False)
    assert got[0][0] == -1 and got[0][1] == 0.0


def test_sharded_catalog_matches_single_actor(ray_session):
    """The beyond-memory path (shard by top LSH-code bits + routed probes +
    best-of merge) links every exact surface to the same node as the
    single-actor LSH path, and the shards genuinely partition the catalog."""
    import ray
    import ray.data as rd

    from raykg.core.canonical import node_id
    from raykg.stages.link import (LinkerActor, build_catalog,
                                   build_sharded_catalog,
                                   link_mentions_sharded)

    surfaces = ["helios dynamics", "northwind systems", "amelia reed",
                "seattle", "vertex labs", "tokyo", "maria chen",
                "atlas industries", "quantum labs", "berlin",
                "cascade labs", "solstice industries", "omar haddad",
                "nairobi", "pinnacle systems", "meridian dynamics"]
    nodes = rd.from_pandas(pd.DataFrame({
        "node_id": [node_id(s) for s in surfaces],
        "canonical": surfaces,
        "label": ["organization"] * len(surfaces),
        "aliases": [[s] for s in surfaces],
        "mention_count": [1] * len(surfaces),
    })).materialize()

    refs = build_sharded_catalog(nodes, n_shards=4)
    shard_sizes = [len(ray.get(r)["node_ids"]) for r in refs]
    assert sum(shard_sizes) == len(surfaces)
    assert sum(1 for s in shard_sizes if s > 0) >= 2   # real partition

    import pyarrow as pa

    queries = ["Helios Dynamics", "Seattle", "Maria Chen", "Quantum Labs",
               "Berlin", "Nairobi", "Meridian Dynamics"]
    mentions = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(queries)), pa.int64()),
        "url": pa.array(["u"] * len(queries), pa.string()),
        "text": pa.array(queries, pa.string()),
        "label": pa.array(["x"] * len(queries), pa.string()),
        "score": pa.array([1.0] * len(queries), pa.float32()),
        "start": pa.array([0] * len(queries), pa.int64()),
        "end": pa.array([1] * len(queries), pa.int64()),
    }))
    got = link_mentions_sharded(mentions, refs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(queries)

    single = LinkerActor(build_catalog(nodes), use_lsh=True)
    sids, sscores = single._lookup_many(queries)
    for i in range(len(queries)):
        assert got.loc[i, "entity_id"] == sids[i], queries[i]
        assert abs(got.loc[i, "link_score"] - sscores[i]) < 1e-5

    # the probe-bucket split (parallelism knob M) must not change results:
    # gkey = shard × M + h(mention) % M only re-partitions work
    got1 = link_mentions_sharded(mentions, refs, num_probe_buckets=1) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    got16 = link_mentions_sharded(mentions, refs, num_probe_buckets=16) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got1, got16)
    pd.testing.assert_frame_equal(got1, got.sort_values("doc_id")
                                  .reset_index(drop=True))


def test_sharded_never_drops_mentions(ray_session):
    """A mention whose LSH code matches NO bucket in any probed shard must
    still emit a row (full-shard fallback, outranked by real bucket hits),
    and the single path's min_score → entity_id=-1 convention applies
    (review round 3: such mentions previously vanished from the output)."""
    import ray.data as rd

    from raykg.core.canonical import node_id
    from raykg.stages.link import build_sharded_catalog, link_mentions_sharded

    surfaces = ["helios dynamics", "northwind systems", "amelia reed",
                "vertex labs"]
    nodes = rd.from_pandas(pd.DataFrame({
        "node_id": [node_id(s) for s in surfaces],
        "canonical": surfaces,
        "label": ["organization"] * len(surfaces),
        "aliases": [[s] for s in surfaces],
        "mention_count": [1] * len(surfaces),
    })).materialize()
    refs = build_sharded_catalog(nodes, n_shards=4)

    import pyarrow as pa

    # gibberish queries: overwhelmingly likely to miss every bucket
    queries = ["zzzzqqq", "xkcd glorp wub", "qqqq zz x", "helios dynamics"]
    mentions = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(queries)), pa.int64()),
        "url": pa.array(["u"] * len(queries), pa.string()),
        "text": pa.array(queries, pa.string()),
        "label": pa.array(["x"] * len(queries), pa.string()),
        "score": pa.array([1.0] * len(queries), pa.float32()),
        "start": pa.array([0] * len(queries), pa.int64()),
        "end": pa.array([1] * len(queries), pa.int64()),
    }))
    got = link_mentions_sharded(mentions, refs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(queries)          # nothing dropped
    # the exact-match query links with score ~1; any sub-min_score row
    # carries the unlinked convention
    exact = got[got.doc_id == 3]
    assert exact["entity_id"].iloc[0] == node_id("helios dynamics")
    low = got[got.link_score == 0.0]
    assert (low["entity_id"] == -1).all()

    # n_shards=1 degenerate case is allowed and equivalent
    one = build_sharded_catalog(nodes, n_shards=1)
    got1 = link_mentions_sharded(mentions, one).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(got1) == len(queries)


def test_distributed_catalog_build_byte_equals_driver(ray_session, tmp_path):
    """VERDICT r4 #1: shards built INSIDE tasks (groupby(shard).map_groups →
    npz spill, driver holds only handles) are byte-identical to
    ``build_sharded_catalog``'s driver-built refs on node_id-sorted input,
    and ``link_mentions_sharded`` over the handles matches over the refs."""
    import ray
    import ray.data as rd

    from raykg.core.canonical import node_id
    from raykg.stages.link import (build_sharded_catalog,
                                   build_sharded_catalog_distributed,
                                   link_mentions_sharded)

    surfaces = ["helios dynamics", "northwind systems", "amelia reed",
                "seattle", "vertex labs", "tokyo", "maria chen",
                "atlas industries", "quantum labs", "berlin",
                "cascade labs", "solstice industries", "omar haddad",
                "nairobi", "pinnacle systems", "meridian dynamics",
                "quark labs", "osaka", "lagos", "delta forge"]
    df = pd.DataFrame({
        "node_id": [node_id(s) for s in surfaces],
        "canonical": surfaces,
        "label": ["organization"] * len(surfaces),
        "aliases": [[s] for s in surfaces],
        "mention_count": [1] * len(surfaces),
    }).sort_values("node_id").reset_index(drop=True)   # the ordering contract
    # several blocks: the distributed build must be batch-layout-invariant
    nodes = rd.from_pandas([df.iloc[:7], df.iloc[7:13], df.iloc[13:]]) \
        .materialize()

    for n_shards in (4, 8):          # 8 over 20 surfaces → empty shards
        refs = build_sharded_catalog(nodes, n_shards=n_shards)
        handles = build_sharded_catalog_distributed(
            nodes, str(tmp_path / f"cat{n_shards}"), n_shards=n_shards)
        assert len(refs) == len(handles) == n_shards
        for r, h in zip(refs, handles):
            want, got = ray.get(r), h.load()
            assert want["surfaces"] == got["surfaces"]
            np.testing.assert_array_equal(want["node_ids"], got["node_ids"])
            np.testing.assert_array_equal(want["codes"], got["codes"])
            np.testing.assert_array_equal(want["uniq_codes"],
                                          got["uniq_codes"])
            np.testing.assert_array_equal(want["starts"], got["starts"])
            np.testing.assert_array_equal(want["ends"], got["ends"])
            assert want["emb"].dtype == got["emb"].dtype == np.float32
            np.testing.assert_array_equal(want["emb"], got["emb"])
            assert want["seed"] == got["seed"]

    import pyarrow as pa

    queries = ["Helios Dynamics", "Quark Labs", "Lagos", "zzz glorp",
               "Meridian Dynamics", "Delta Forge"]
    mentions = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(queries)), pa.int64()),
        "url": pa.array(["u"] * len(queries), pa.string()),
        "text": pa.array(queries, pa.string()),
        "label": pa.array(["x"] * len(queries), pa.string()),
        "score": pa.array([1.0] * len(queries), pa.float32()),
        "start": pa.array([0] * len(queries), pa.int64()),
        "end": pa.array([1] * len(queries), pa.int64()),
    }))
    refs = build_sharded_catalog(nodes, n_shards=4)
    handles = build_sharded_catalog_distributed(
        nodes, str(tmp_path / "cat_link"), n_shards=4)
    via_refs = link_mentions_sharded(mentions, refs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    via_handles = link_mentions_sharded(mentions, handles).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(via_refs, via_handles)
    assert len(via_refs) == len(queries)
