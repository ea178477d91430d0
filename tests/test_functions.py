"""Tests for the general operator suite: driver-style SQL-oracle comparison
for every SQL-checkable query, brute-force ground truth for the sketch/ANN
operators, and stub contracts for multimodal decode."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import tests.driver_emu as emu

SF = "/root/testdata/sf0.001"


def _oracle_names():
    import __ray_entry__ as e

    return sorted(e.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_sql_oracle_match(ray_session, name):
    problems = emu.run(SF, only=[name])[name]
    assert not problems, problems


# -- MinHash vs brute-force ground truth ------------------------------------

def _brute_jaccard_pairs(texts: dict[int, str], threshold: float) -> set:
    from raykg.functions.dedup import _shingles, jaccard

    sh = {k: _shingles(t) for k, t in texts.items()}
    ids = sorted(sh)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if sh[a] and sh[b] and jaccard(sh[a], sh[b]) >= threshold:
                out.add((a, b))
    return out


def test_minhash_vs_bruteforce(ray_session):
    """On a corpus with planted near-dups: precision 1.0 (verification is
    exact) and recall ≥ 0.9 (LSH banding misses are bounded)."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(200)]
    texts: dict[int, str] = {}
    for i in range(60):
        words = list(rng.choice(vocab, size=80))
        texts[i] = " ".join(words)
        # planted near-dup: copy with ~7% token edits
        dup = list(words)
        for j in rng.choice(len(dup), size=6, replace=False):
            dup[j] = str(rng.choice(vocab))
        texts[1000 + i] = " ".join(dup)
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": list(texts), "text": [texts[k] for k in texts]}))

    from raykg.functions.dedup import minhash_pairs

    got = {(int(a), int(b)) for a, b in
           minhash_pairs(docs, jaccard_threshold=0.5)
           .to_pandas()[["a", "b"]].itertuples(index=False)}
    expected = _brute_jaccard_pairs(texts, 0.5)
    assert expected, "ground truth must be non-empty"
    assert got <= expected                      # exact verify → precision 1.0
    recall = len(got & expected) / len(expected)
    assert recall >= 0.9, recall


def test_minhash_no_corpus_broadcast(ray_session, monkeypatch):
    """The verify join must never ``ray.put`` a corpus-sized object: on a
    400-doc corpus with exactly one planted near-dup pair, the only
    dict/list put by the dedup code is the pair-membership map (≤ a few
    entries), not a 400-entry text store (VERDICT round 1)."""
    import ray
    import ray.data as rd

    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(500)]
    texts = {i: " ".join(rng.choice(vocab, size=60)) for i in range(400)}
    texts[9000] = texts[7]  # one exact dup pair → 1 candidate pair
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": list(texts), "text": [texts[k] for k in texts]}))

    put_sizes: list[int] = []
    real_put = ray.put

    def spy_put(obj, **kw):
        if isinstance(obj, (dict, list, set)):
            put_sizes.append(len(obj))
        return real_put(obj, **kw)

    monkeypatch.setattr(ray, "put", spy_put)
    from raykg.functions.dedup import minhash_pairs

    got = minhash_pairs(docs, jaccard_threshold=0.5).to_pandas()
    assert [(int(a), int(b)) for a, b in got[["a", "b"]]
            .itertuples(index=False)] == [(7, 9000)]
    assert put_sizes, "membership map should be broadcast via ray.put"
    assert max(put_sizes) <= 10, put_sizes   # ≪ 400 docs


def test_embedding_lsh_recall(ray_session):
    """Sign-bit LSH near-dup at a REAL dup threshold (0.9): precision 1.0
    (exact-cosine verify) and recall ≥ 0.99 on planted near-identical
    vectors."""
    import ray.data as rd

    rng = np.random.default_rng(5)
    base = rng.standard_normal((80, 32))
    rows = []
    expected = set()
    for i, v in enumerate(base):
        rows.append((i, v))
        dup = v + rng.standard_normal(32) * 0.02          # cosine ≈ 0.999
        rows.append((1000 + i, dup))
    mat = np.stack([v for _, v in rows])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = [i for i, _ in rows]
    sims = mat @ mat.T
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            if sims[x, y] >= 0.9:
                expected.add((min(ids[x], ids[y]), max(ids[x], ids[y])))
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": ids, "embedding": [v.astype(np.float32) for _, v in rows]}))

    from raykg.functions.dedup import embedding_pairs_lsh

    got = {(int(a), int(b)) for a, b, _ in
           embedding_pairs_lsh(ds, threshold=0.9).to_pandas()
           .itertuples(index=False)}
    assert got <= expected
    assert len(got & expected) / len(expected) >= 0.99


def test_embedding_exact_multiblock(ray_session):
    """The block-pair exact path must be invariant to the block size: tiny
    blocks (forcing many cross-block tasks) give the same pairs as one
    block."""
    import ray.data as rd

    from raykg.functions.dedup import embedding_pairs_exact

    rng = np.random.default_rng(9)
    n = 120
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": range(n),
        "embedding": [rng.standard_normal(16).astype(np.float32)
                      for _ in range(n)],
        "label": rng.integers(0, 3, size=n),
    })).materialize()
    one = embedding_pairs_exact(ds, threshold=0.35,
                                block_rows=10**6).to_pandas()
    many = embedding_pairs_exact(ds, threshold=0.35,
                                 block_rows=16).to_pandas()
    assert one.values.tolist() == many.values.tolist()
    assert len(one) > 0


@pytest.mark.parametrize("hash_mode", ["fast", "md5"])
def test_simhash_vs_bruteforce(ray_session, hash_mode):
    import ray.data as rd

    from raykg.functions.dedup import simhash64, simhash64_fast, simhash_pairs

    sig_of = simhash64_fast if hash_mode == "fast" else simhash64
    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(150)]
    texts = {i: " ".join(rng.choice(vocab, size=60)) for i in range(40)}
    for i in range(10):     # planted: tiny perturbations
        base = texts[i].split()
        base[0] = "zzz"
        texts[2000 + i] = " ".join(base)
    sigs = {k: sig_of(t) for k, t in texts.items()}
    ids = sorted(sigs)
    MASK63 = (1 << 63) - 1
    expected = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
                if bin((sigs[a] & MASK63) ^ (sigs[b] & MASK63)).count("1") <= 3}
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": list(texts), "text": [texts[k] for k in texts]}))
    got = {(int(a), int(b)) for a, b in
           simhash_pairs(docs, max_hamming=3, hash_mode=hash_mode)
           .to_pandas()[["a", "b"]].itertuples(index=False)}
    assert expected
    # chunk-LSH guarantees recall 1.0 for hamming ≤ 3 over 4×16-bit chunks
    # (pigeonhole) on the 63 bits carried; precision 1.0 by exact verify
    assert got == expected


def test_knn_ivf_recall(ray_session, tmp_path):
    """IVF is meaningful on CLUSTERABLE data (its core assumption — on
    uniform random vectors no coarse quantizer concentrates neighbors and
    recall degrades to probe_fraction; measured 0.1 ≈ 8/64 on the driver's
    random embeddings). Ground truth here: clustered synthetic corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raykg.functions.similarity import q_knn, q_knn_ivf

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((8, 64)) * 3
    rows = []
    for i in range(800):
        c = centers[i % 8]
        rows.append((i, (c + rng.standard_normal(64) * 0.5).astype(np.float32)))
    d = str(tmp_path)
    pq.write_table(pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1].tolist() for r in rows],
                              pa.list_(pa.float32())),
        "label": pa.array([r[0] % 8 for r in rows], pa.int32()),
    }), f"{d}/embeddings.parquet")
    exact = set(q_knn(d).to_pandas()["vec_id"])
    approx = set(q_knn_ivf(d).to_pandas()["vec_id"])
    assert len(exact) == 10 and len(approx) == 10
    recall = len(exact & approx) / 10
    assert recall >= 0.8, recall


def test_media_meta_and_stubs(ray_session):
    from raykg.functions.multimodal import (decode_audio, decode_image,
                                            q_media_meta, synth_payload)

    meta = q_media_meta(SF).to_pandas()
    assert len(meta) == 500
    imgs = meta[meta["kind"] == "image"]
    auds = meta[meta["kind"] == "audio"]
    assert len(imgs) and len(auds)
    assert (imgs["width"] > 0).all() and (imgs["rate"] == 0).all()
    assert (auds["rate"] >= 8000).all() and (auds["width"] == 0).all()
    kind, payload = synth_payload(1)
    with pytest.raises(NotImplementedError):
        decode_image(payload)
    with pytest.raises(NotImplementedError):
        decode_audio(payload)
    # deterministic payloads
    assert synth_payload(5) == synth_payload(5)


def test_winnowing_fingerprints():
    from raykg.functions.textstats import winnow_fingerprints

    t = "the quick brown fox jumps over the lazy dog " * 10
    a = winnow_fingerprints(t)
    assert a == winnow_fingerprints(t)           # deterministic
    assert len(a) > 5
    # local-edit robustness: one word changed → most fingerprints shared
    edited = t.replace("lazy", "hazy", 1)
    b = set(winnow_fingerprints(edited))
    overlap = len(set(a) & b) / len(set(a))
    assert overlap > 0.7, overlap
    # unrelated text → little overlap
    c = set(winnow_fingerprints("completely different content here " * 10))
    assert len(set(a) & c) / len(set(a)) < 0.2
    assert winnow_fingerprints("") == []
    assert len(winnow_fingerprints("ab")) == 1


def test_langid_deterministic(ray_session):
    from raykg.functions.textstats import LangId

    li = LangId()
    assert li.predict("the cat and the dog is in the house")[0] == "en"
    assert li.predict("der hund und die katze ist nicht hier")[0] == "de"
    assert li.predict("")[0] == "und"
    assert li.predict("北京 欢迎 你")[0] == "zh"


def test_entry_contract(ray_session):
    """entry() returns a Dataset with ≥0 rows and a stable schema, without
    touching ray.init (the driver owns the session)."""
    import __ray_entry__ as e

    ds = e.entry()
    assert ds.count() > 0
    assert ds.schema().names == ["src", "pred", "dst", "weight", "urls"]


def test_minhash_parallelism_invariance(ray_session):
    """The distributed verify join must give identical pairs regardless of
    input block structure (2 blocks vs 16)."""
    import ray.data as rd

    rng = np.random.default_rng(21)
    vocab = [f"w{i}" for i in range(300)]
    texts = {}
    for i in range(80):
        words = list(rng.choice(vocab, size=70))
        texts[i] = " ".join(words)
        dup = list(words)
        for j in rng.choice(len(dup), size=4, replace=False):
            dup[j] = str(rng.choice(vocab))
        texts[1000 + i] = " ".join(dup)
    df = pd.DataFrame({"doc_id": list(texts),
                       "text": [texts[k] for k in texts]})

    from raykg.functions.dedup import minhash_pairs

    outs = []
    for nblocks in (2, 16):
        ds = rd.from_pandas(df).repartition(nblocks).materialize()
        outs.append(minhash_pairs(ds, jaccard_threshold=0.5).to_pandas()
                    .reset_index(drop=True))
    assert outs[0].equals(outs[1])
    assert len(outs[0]) > 0


def test_boilerplate_removal_planted(ray_session):
    """Non-trivial boilerplate behavior on planted headers/footers: shared
    chrome lines are stripped, unique content lines survive, rare repeats
    below min_docs survive."""
    import ray
    import ray.data as rd

    from raykg.functions.textstats import (boilerplate_lines,
                                           strip_boilerplate)

    header, footer = "SITE NAVIGATION | Home | About", "(c) 2025 Example Corp"
    docs = []
    for i in range(20):
        body = f"unique content line {i}\nsecond unique line {i}"
        rare = "rare shared line" if i < 2 else f"filler {i}"
        docs.append({"doc_id": i,
                     "text": f"{header}\n{body}\n{rare}\n{footer}"})
    ds = rd.from_items(docs).materialize()
    freq = boilerplate_lines(ds, min_docs=3).to_pandas()
    assert set(freq["line"]) == {header, footer}
    bad = frozenset(freq["line"])
    out = strip_boilerplate(ds, ray.put(bad)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (out["n_removed"] == 2).all()
    assert out.loc[0, "clean_text"] == \
        "unique content line 0\nsecond unique line 0\nrare shared line"
    assert header not in out.loc[5, "clean_text"]


def test_frame_sampler(ray_session):
    """Frame sampling: every stride-th frame (incl. 0) per video, digests
    match direct payload slicing, non-video payloads skipped."""
    import struct as _struct

    import pyarrow as pa
    import ray.data as rd

    from hashlib import md5

    from raykg.functions.multimodal import (MAGIC_VID, FrameSampler,
                                            q_frame_sample,
                                            synth_video_payload)

    p = synth_video_payload(11)
    n_frames, fb = _struct.unpack(">II", p[4:12])
    sampler = FrameSampler(stride=3)
    batch = pa.table({"media_id": pa.array([11, 12], pa.int64()),
                      "payload": pa.array([p, b"JUNKxxxx"], pa.binary())})
    out = sampler(batch)
    idxs = out.column("frame_idx").to_pylist()
    assert idxs == list(range(0, n_frames, 3))
    assert set(out.column("media_id").to_pylist()) == {11}   # junk skipped
    for i, k in enumerate(idxs):
        frame = p[12 + k * fb: 12 + (k + 1) * fb]
        expect = md5(frame.hex().encode()).hexdigest()
        assert out.column("frame_digest")[i].as_py() == expect

    got = q_frame_sample(SF).to_pandas()
    assert len(got) > 500
    assert (got.groupby("media_id")["frame_idx"].min() == 0).all()
    # deterministic across runs
    got2 = q_frame_sample(SF).to_pandas()
    assert got.equals(got2)


def test_asof_join_matches_merge_asof(ray_session):
    """Distributed as-of join vs pandas.merge_asof ground truth on random
    interleavings — covers empty users, click-before-any-view, view-only
    users, and burst patterns that the real events table may not hit."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from raykg.functions.relational import q_asof_prev_view
    from raykg.stages.shuffle import bucketed_group_apply

    rng = np.random.default_rng(123)
    n = 2000
    base = pd.Timestamp("2024-01-01")
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": base + pd.to_timedelta(
            np.sort(rng.integers(0, 10**9, size=n)), unit="us"),
        "user_id": rng.integers(0, 37, size=n).astype(np.int64),
        "event_type": rng.choice(
            ["click", "view", "error", "purchase"], size=n,
            p=[0.3, 0.3, 0.2, 0.2]),
    })
    # make (user, ts) unique on the view side (the documented precondition)
    ev = ev.drop_duplicates(["user_id", "ts"]).reset_index(drop=True)

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ev.to_parquet(f"{d}/events.parquet")
        got = q_asof_prev_view(d).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)

    clicks = ev[ev.event_type == "click"].sort_values("ts")
    views = ev[ev.event_type == "view"].sort_values("ts") \
        .rename(columns={"event_id": "prev_view_id", "ts": "prev_view_ts"})
    want = pd.merge_asof(clicks, views[["prev_view_id", "prev_view_ts",
                                        "user_id"]],
                         left_on="ts", right_on="prev_view_ts",
                         by="user_id", direction="backward") \
        .dropna(subset=["prev_view_id"])
    want = want[["event_id", "user_id", "ts", "prev_view_id",
                 "prev_view_ts"]].sort_values("event_id") \
        .reset_index(drop=True)
    want["prev_view_id"] = want["prev_view_id"].astype("int64")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pair_join_distributed_byte_equal(ray_session, monkeypatch):
    """VERDICT r3 #1: forcing the beyond-budget distributed pair-join path
    (RAYKG_PAIR_MEMBERS_BUDGET=0) yields byte-identical pairs to the
    broadcast-dict fast path for both minhash and embedding-LSH, and the
    driver never ray.puts anything pair-shaped (only the fixed-size Bloom
    ndarray)."""
    import ray
    import ray.data as rd

    from raykg.functions.dedup import embedding_pairs_lsh, minhash_pairs

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(300)]
    texts = {}
    for i in range(60):
        words = list(rng.choice(vocab, size=70))
        texts[i] = " ".join(words)
        dup = list(words)
        for j in rng.choice(len(dup), size=4, replace=False):
            dup[j] = str(rng.choice(vocab))
        texts[1000 + i] = " ".join(dup)
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(texts), "text": [texts[k] for k in texts]}))

    base = rng.standard_normal((50, 24))
    rows = [(i, v) for i, v in enumerate(base)]
    rows += [(1000 + i, v + rng.standard_normal(24) * 0.02)
             for i, v in enumerate(base)]
    embs = rd.from_pandas(pd.DataFrame({
        "vec_id": [i for i, _ in rows],
        "embedding": [v.astype(np.float32) for _, v in rows]}))

    mh_fast = minhash_pairs(docs, jaccard_threshold=0.5).to_pandas() \
        .reset_index(drop=True)
    el_fast = embedding_pairs_lsh(embs, threshold=0.9).to_pandas() \
        .reset_index(drop=True)
    assert len(mh_fast) > 0 and len(el_fast) > 0

    monkeypatch.setenv("RAYKG_PAIR_MEMBERS_BUDGET", "0")
    put_shapes: list[type] = []
    real_put = ray.put

    def spy_put(obj, **kw):
        put_shapes.append(type(obj))
        return real_put(obj, **kw)

    monkeypatch.setattr(ray, "put", spy_put)
    mh_dist = minhash_pairs(docs, jaccard_threshold=0.5).to_pandas() \
        .reset_index(drop=True)
    el_dist = embedding_pairs_lsh(embs, threshold=0.9).to_pandas() \
        .reset_index(drop=True)
    monkeypatch.setattr(ray, "put", real_put)

    pd.testing.assert_frame_equal(mh_fast, mh_dist)
    pd.testing.assert_frame_equal(el_fast, el_dist)
    # the dedup module itself puts only the Bloom ndarray, never the pair
    # dict (ray.data internals may put their own non-dict plumbing)
    assert np.ndarray in put_shapes
    assert dict not in put_shapes and list not in put_shapes


def test_bloom_no_false_negatives():
    from raykg.functions.dedup import (_bloom_add, _bloom_contains,
                                       _bloom_positions)

    rng = np.random.default_rng(17)
    ids = rng.integers(0, 2**63, size=5000, dtype=np.int64).astype(np.uint64)
    m_bits = 1 << 20
    bloom = np.zeros(m_bits // 64, dtype=np.uint64)
    _bloom_add(bloom, ids, m_bits)
    assert _bloom_contains(bloom, ids, m_bits).all()
    others = rng.integers(0, 2**63, size=5000, dtype=np.int64) \
        .astype(np.uint64)
    fresh = others[~np.isin(others, ids)]
    fp = _bloom_contains(bloom, fresh, m_bits).mean()
    assert fp < 0.01, fp
    # positions stay within the bitmap
    for pos in _bloom_positions(ids, m_bits):
        assert int(pos.max()) < m_bits


def test_fast_hash64_duckdb_parity():
    """_fast_hash64_many must be bit-identical to its inline DuckDB
    reproduction (_sql_fast64_cols) — the fast sketch's oracle anchor —
    including through the internal ~400k-code-point chunking."""
    import duckdb

    from raykg.functions.dedup import _fast_hash64_many, _sql_fast64_cols

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(500)]
    strings = [" ".join(rng.choice(vocab, size=int(rng.integers(1, 6))))
               for _ in range(200)]
    strings += ["a", "0", "z_9", "x" * 300]
    got = _fast_hash64_many(strings)
    # force the chunked path too: same values, split differently
    big = strings * 800                      # ~1M chars → multiple chunks
    got_big = _fast_hash64_many(big)
    assert (got_big[:len(strings)] == got).all()
    assert (got_big.reshape(800, len(strings)) == got[None, :]).all()

    rows = duckdb.sql(
        f"SELECT s, fh FROM (SELECT s, {_sql_fast64_cols('s')} "
        "FROM (SELECT unnest(?) AS s))", params=[strings]).fetchall()
    want = {s: h for s, h in rows}
    assert all(int(g) == want[s] for s, g in zip(strings, got))


def test_boilerplate_guarded_join_byte_equal(ray_session):
    """VERDICT r3 #6: forcing the beyond-budget path (budget_rows=0) on a
    high-distinct-line corpus with planted boilerplate yields byte-identical
    (doc_id, clean_text, n_removed) to the broadcast-frozenset path."""
    import ray.data as rd

    from raykg.functions.textstats import remove_boilerplate

    rng = np.random.default_rng(23)
    header, footer = "SITE NAV | home | about", "(c) example footer"
    texts = {}
    for i in range(80):
        body = "\n".join(f"unique line {i} {j} {rng.integers(1e9)}"
                         for j in range(12))
        # plant boilerplate on most docs, include empty lines in some
        if i % 4 != 3:
            body = f"{header}\n{body}\n\n{footer}"
        texts[i] = body
    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": list(texts), "text": [texts[k] for k in texts]})) \
        .materialize()

    fast = remove_boilerplate(docs, min_docs=5).to_pandas() \
        .reset_index(drop=True)
    joined = remove_boilerplate(docs, min_docs=5, budget_rows=0) \
        .to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, joined)
    # the planted boilerplate really was removed, bodies survive intact
    assert (fast["n_removed"] > 0).sum() == sum(1 for i in texts
                                                if i % 4 != 3)
    assert header not in fast["clean_text"].iloc[0]
    assert "unique line 0 0" in fast["clean_text"].iloc[0]
