"""Property-based tests (hypothesis): structural invariants that must hold
for ANY input, not just curated cases — chunker coverage, NMS disjointness,
offset slicing, normalization idempotence, dedup-pattern determinism."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from raykg.config import KG_LABELS
from raykg.core.chunk import chunk_text
from raykg.core.wordsplit import WORD_RE, split_words
from raykg.oracle import Oracle

_oracle = Oracle()

text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),  # any non-surrogate
    max_size=400,
)
word_text_st = st.lists(
    st.sampled_from(["Alice", "bob", "Berlin", "works", "at", "Acme", "Inc",
                     "the", "café", "北京", "42", ".", ",", "—", "\n", " "]),
    max_size=120,
).map(lambda ws: " ".join(ws))


@given(text_st)
@settings(max_examples=150, deadline=None)
def test_wordsplit_slices_roundtrip(text):
    for w, s, e in split_words(text):
        assert text[s:e] == w
        assert w and not w[0].isspace()


@given(word_text_st, st.integers(8, 64), st.integers(2, 16), st.integers(4, 32))
@settings(max_examples=100, deadline=None)
def test_chunker_invariants(text, max_chars, overlap, max_words):
    chunks = chunk_text(text, max_chars, overlap, max_words)
    covered = [False] * len(text)
    for ch in chunks:
        assert text[ch.start_offset:ch.end_offset] == ch.text
        assert ch.word_count <= max_words
        assert ch.text == ch.text.strip()
        for i in range(ch.start_offset, ch.end_offset):
            covered[i] = True
    # every word character is inside some chunk (whitespace may be trimmed)
    for m in WORD_RE.finditer(text):
        assert all(covered[m.start():m.end()]), (m.group(0), m.span())


@given(word_text_st, st.floats(0.05, 0.95))
@settings(max_examples=60, deadline=None)
def test_mentions_invariants(text, threshold):
    mentions = _oracle.extract_mentions(text, KG_LABELS, threshold)
    # NMS: pairwise disjoint char ranges; surfaces slice the original text;
    # scores ≥ threshold; output sorted by start
    prev_start = -1
    for m in mentions:
        assert text[m.start:m.end] == m.text
        assert m.score >= threshold - 1e-9
        assert m.start >= prev_start
        prev_start = m.start
    for i, a in enumerate(mentions):
        for b in mentions[i + 1:]:
            assert a.end <= b.start or b.end <= a.start


@given(st.text(max_size=80))
@settings(max_examples=150, deadline=None)
def test_normalize_surface_idempotent(s):
    from raykg.core.canonical import normalize_surface

    once = normalize_surface(s)
    assert normalize_surface(once) == once


@given(st.text(max_size=300))
@settings(max_examples=80, deadline=None)
def test_winnowing_deterministic_and_bounded(text):
    from raykg.functions.textstats import winnow_fingerprints

    a = winnow_fingerprints(text)
    assert a == winnow_fingerprints(text)
    assert all(0 <= x < (1 << 61) for x in a)


@given(st.lists(st.tuples(st.integers(0, 50), st.integers(1, 10),
                          st.sampled_from("abc"),
                          st.floats(0.01, 0.99)), max_size=30))
@settings(max_examples=100, deadline=None)
def test_iou_nms_invariants(spans):
    from raykg.core.decode import Mention
    from raykg.core.simfuncs import iou, iou_nms

    ms = [Mention(f"t{s}", lab, sc, s, s + w) for s, w, lab, sc in spans]
    kept = iou_nms(ms, 0.5)
    # no two kept same-label mentions overlap above the threshold
    for i, a in enumerate(kept):
        for b in kept[i + 1:]:
            if a.label == b.label:
                assert iou(a.start, a.end, b.start, b.end) <= 0.5
    # idempotent
    assert iou_nms(kept, 0.5) == kept


@given(st.text(min_size=0, max_size=60))
@settings(max_examples=60, deadline=None)
def test_unigram_vocab_viterbi_covers(text):
    """Real-vocab Viterbi invariant: the emitted pieces exactly tile the
    normalized input (per-char UNK fallback guarantees totality), and
    tokenization is deterministic."""
    import json

    from raykg.core.tokenizer import normalize
    from raykg.core.vocab import UnigramVocab

    vocab = UnigramVocab(
        [["[UNK]", -10.0], ["[PAD]", 0.0], ["[CLS]", 0.0], ["[SEP]", 0.0],
         ["▁", -2.0], ["a", -3.0], ["ab", -2.5], ["b", -4.0], ["▁a", -2.2],
         ["c", -4.5], ["abc", -2.0]], None, 0)
    s = normalize(text)
    ids, toks = vocab.tokenize_normalized(s)
    assert (ids, toks) == vocab.tokenize_normalized(s)
    # pieces tile s exactly, with [UNK] standing for one character
    pos = 0
    for t in toks:
        if t == "[UNK]":
            pos += 1
        else:
            assert s[pos:pos + len(t)] == t
            pos += len(t)
    assert pos == len(s)


# -- WARC byte-range split partition property (VERDICT r3 #8) ----------------

_warc_cache: dict = {}


def _warc_fixture():
    """One deterministic 20-record per-member .warc.gz, built once."""
    if not _warc_cache:
        import os
        import tempfile

        from raykg.sources.pages import make_page_row
        from raykg.sources.warc import write_warc

        rows = [make_page_row(i, "körper текст 北京 body filler", "en")
                for i in range(20)]
        fd, path = tempfile.mkstemp(suffix=".warc.gz")
        os.close(fd)
        try:
            write_warc(path, rows, compress=True)
            with open(path, "rb") as f:
                data = f.read()
        finally:
            os.unlink(path)
        _warc_cache["data"] = data
        _warc_cache["urls"] = [r["url"] for r in rows]
    return _warc_cache["data"], _warc_cache["urls"]


@given(st.lists(st.integers(1, 10**9), min_size=1, max_size=6))
@settings(max_examples=80, deadline=None)
def test_warc_arbitrary_cuts_partition(raw_cuts):
    """ANY set of byte cut points — including ones bisecting gzip members
    and record heads — partitions a .warc.gz exactly: the union of the
    ranged reads equals the whole-file read, each record exactly once, in
    file order (a record belongs to the split holding its member's first
    byte)."""
    import io

    from raykg.sources.warc import _iter_gzip_records_ranged

    data, urls = _warc_fixture()
    cuts = sorted({1 + c % (len(data) - 1) for c in raw_cuts})
    bounds = [0] + cuts + [len(data)]
    got = []
    for a, b in zip(bounds, bounds[1:]):
        got.extend(h["warc-target-uri"]
                   for h, _ in _iter_gzip_records_ranged(io.BytesIO(data),
                                                         a, b))
    assert got == urls


@given(st.lists(st.tuples(st.sampled_from(["Helios Dynamics", "amelia reed",
                                           "...", "", "São Paulo", "x", "--",
                                           "Atlas  Corp"]),
                          st.sampled_from(["works_at", "based_in"]),
                          st.sampled_from(["Berlin", "!!!", "Acme Inc",
                                           "北京", ""]),
                          st.sampled_from(["u1", "u2", "u3"])),
                min_size=0, max_size=60))
@settings(max_examples=60, deadline=None)
def test_partial_edges_matches_reference_impl(rows):
    """The dictionary-encoded partial_edges (round-4 vectorization) must
    agree with a direct per-row reference implementation on ANY input —
    including punctuation-only / empty surfaces (the ADVICE-r3 idmap
    hazard) and duplicate edges across urls."""
    import pyarrow as pa

    from raykg.core.canonical import surface_key
    from raykg.stages.graph import partial_edges

    batch = pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string()),
        "url": pa.array([r[3] for r in rows], pa.string()),
    })
    got = partial_edges(batch, alias_map={123: 456})

    # reference: per-row, first-occurrence group order, first url wins
    ref: dict = {}
    order = []
    for s, p, o, u in rows:
        sn, sid = surface_key(s)
        on, oid = surface_key(o)
        if not sn or not on:
            continue
        am = {123: 456}
        key = (am.get(sid, sid), p, am.get(oid, oid))
        if key not in ref:
            ref[key] = [0, u]
            order.append(key)
        ref[key][0] += 1
    assert list(zip(got["src"], got["pred"], got["dst"])) == order
    assert got["weight"].tolist() == [ref[k][0] for k in order]
    assert got["url_sample"].tolist() == [ref[k][1] for k in order]
    assert str(got["src"].dtype) == "int64" and str(got["dst"].dtype) == "int64"


@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=60),
       st.dictionaries(st.integers(min_value=-(2**62), max_value=2**62),
                       st.integers(min_value=-(2**62), max_value=2**62),
                       max_size=30))
@settings(max_examples=200, deadline=None)
def test_rewrite_ids_matches_dict_map(values, mapping):
    """rewrite_ids == {m.get(v, v)} exactly, int64 end-to-end — including
    63-bit ids that a float64 round-trip would corrupt (the ADVICE r3
    failure mode the searchsorted path exists to avoid)."""
    import numpy as np

    from raykg.stages.graph import rewrite_ids, sorted_id_map

    keys, roots = sorted_id_map(mapping)
    got = rewrite_ids(np.asarray(values, dtype=np.int64), keys, roots)
    assert got.dtype == np.int64
    assert got.tolist() == [mapping.get(v, v) for v in values]


@given(st.lists(st.text(
    alphabet=st.characters(blacklist_characters="\x00",
                           blacklist_categories=("Cs",)), max_size=12),
    max_size=30))
@settings(max_examples=150, deadline=None)
def test_fast_hash_batch_equals_singleton(strings):
    """_fast_hash64_many is a per-string pure function: hashing a batch
    (with its internal chunking and empty-segment handling) equals hashing
    each string alone; empty string → fmix64(0)."""
    import numpy as np

    from raykg.functions.dedup import _fast_hash64_many, _mix64

    batch = _fast_hash64_many(strings)
    singles = np.array([_fast_hash64_many([s])[0] for s in strings],
                       dtype=np.uint64) if strings else batch
    assert np.array_equal(batch, singles)
    for s, h in zip(strings, batch):
        if s == "":
            assert h == _mix64(np.array([0], dtype=np.uint64))[0]
