"""Unit tests for the pure per-document semantics (raykg.core).

Mirrors the reference's component-test strategy (SURVEY.md §5): word-splitter
behavior, chunker invariants, NMS decode rules, chunk-merge dedup rules, and
the behavioral edge cases of
/root/reference/Tests/GLiNERSwiftTests/EntityExtractionTests.swift:72-114
(empty text → [], no labels → [], threshold 0.99 → few mentions).
"""

from __future__ import annotations

import numpy as np
import pytest

from raykg.config import DEFAULT_CONFIG, KG_LABELS, Schema, Validator
from raykg.core.chunk import chunk_text, should_chunk
from raykg.core.decode import Mention, adjust_offsets, merge_chunks
from raykg.core.relations import extract_triples, sentence_spans
from raykg.core.textextract import extract_text
from raykg.core.tokenizer import WordTokenizer, encode_schema, viterbi_tokenize
from raykg.core.wordsplit import split_words, word_count
from raykg.oracle import Oracle


@pytest.fixture(scope="module")
def oracle() -> Oracle:
    return Oracle()


# -- M1 word splitter ------------------------------------------------------
def test_word_splitter_pattern():
    # regex \w+(?:[-_]\w+)*|\S  (WordSplitter.swift:14)
    words = split_words("state-of-the-art AI, 2024!")
    assert [w for w, _, _ in words] == ["state-of-the-art", "AI", ",", "2024", "!"]
    text = "a  b\n c"
    for w, s, e in split_words(text):
        assert text[s:e] == w
    assert word_count("") == 0


# -- M8 chunker ------------------------------------------------------------
def test_chunker_trigger_and_coverage():
    text = " ".join(f"word{i}" for i in range(500)) + "\nlast line here"
    assert should_chunk(text, 248)
    chunks = chunk_text(text, 3072, 768, 248)
    assert len(chunks) >= 2
    for ch in chunks:
        assert text[ch.start_offset:ch.end_offset] == ch.text
        assert ch.word_count <= 248
        assert not ch.text[0].isspace() and not ch.text[-1].isspace()
    # full coverage: every char of every word is inside some chunk
    covered = np.zeros(len(text), dtype=bool)
    for ch in chunks:
        covered[ch.start_offset:ch.end_offset] = True
    for w, s, e in split_words(text):
        assert covered[s:e].all(), f"word {w!r} at {s} not covered"


def test_chunker_short_text_noop():
    assert not should_chunk("short text", 248)
    chunks = chunk_text("short text", 3072, 768, 248)
    assert len(chunks) == 1 and chunks[0].text == "short text"


def test_chunker_prefers_newline_cut():
    text = ("x " * 100).strip() + "\n" + ("y " * 2000).strip()
    chunks = chunk_text(text, 3000, 100, 1000)
    assert chunks[0].text.endswith("x")   # cut at the newline, trimmed


# -- HTML extraction -------------------------------------------------------
def test_extract_text_strips_and_unescapes():
    html = (b"<html><head><style>p{}</style><script>x='<p>no</p>'</script></head>"
            b"<body><h1>Caf\xc3\xa9 &amp; Bar</h1><!-- c --><p>A &quot;B&quot;\r\n"
            b"C</p></body></html>")
    text = extract_text(html)
    assert "no" not in text and "p{}" not in text
    assert 'Café & Bar' in text and 'A "B"' in text
    assert "\r" not in text
    assert extract_text(b"") == ""


def test_extract_text_deterministic_bytes():
    html = "<p>Ünïcödé — 北京 &#x1F600;</p>".encode("utf-8")
    assert extract_text(html) == extract_text(html)
    assert "北京" in extract_text(html)


# -- tokenizer -------------------------------------------------------------
def test_viterbi_deterministic_and_cached():
    ids1 = viterbi_tokenize("hello", 42)
    ids2 = viterbi_tokenize("hello", 42)
    assert ids1 == ids2 and len(ids1) >= 1
    assert viterbi_tokenize("hello", 43) != ids1 or True  # different seed may differ
    tok = WordTokenizer(42)
    assert tok.ids("hello") == ids1
    assert tok.ids("") == [3]  # UNK


def test_legacy_prompted_encode():
    """M5 (GLiNERTokenizer.swift:151-265): [CLS] <<ENT>> label … <<SEP>>
    text [SEP]; word_mask marks first subwords 1-based; class positions at
    each <<ENT>>; empty labels → [CLS][SEP]."""
    from raykg.core.legacy import (ENT_TOKEN_ID, SEPT_TOKEN_ID,
                                   encode_prompted)
    from raykg.core.tokenizer import CLS_ID, SEP_ID, WordTokenizer

    tok = WordTokenizer(seed=42)
    enc = encode_prompted("Ada met Bo.", ["person", "place"], tok)
    ids = list(enc.input_ids)
    assert ids[0] == CLS_ID and ids[-1] == SEP_ID
    assert [ids[p] for p in enc.class_positions] == [ENT_TOKEN_ID] * 2
    assert ids.count(SEPT_TOKEN_ID) == 1
    sep_pos = ids.index(SEPT_TOKEN_ID)
    assert all(p < sep_pos for p in enc.class_positions)
    # word_mask: 1-based first-subword markers for exactly the text words
    marks = enc.word_mask[enc.word_mask > 0]
    assert list(marks) == [1, 2, 3, 4] and enc.text_word_count == 4
    assert (enc.word_mask[:sep_pos + 1] == 0).all()
    assert enc.words == ["Ada", "met", "Bo", "."]

    empty = encode_prompted("anything", [], tok)
    assert list(empty.input_ids) == [CLS_ID, SEP_ID]
    assert empty.class_positions == [] and empty.text_word_count == 0


def test_legacy_span_scorer_golden():
    """A8 golden: deterministic output on a fixed sentence; offsets index
    the original text; empty inputs gate to []; two fresh scorers agree."""
    from raykg.core.legacy import LegacySpanScorer

    text = "Amelia Reed met Marcus Tanaka in Berlin. then they left."
    sc = LegacySpanScorer()
    got = [(m.text, m.start, m.end) for m in sc.extract(text, KG_LABELS)]
    assert got == [("Amelia Reed", 0, 11), ("Marcus", 16, 22),
                   ("Tanaka", 23, 29), ("Berlin", 33, 39)]
    for m in sc.extract(text, KG_LABELS):
        assert text[m.start:m.end] == m.text
        assert 0.0 < m.score < 1.0
    assert sc.extract("", KG_LABELS) == []
    assert sc.extract(text, []) == []
    sc2 = LegacySpanScorer()
    assert sc2.extract(text, KG_LABELS) == sc.extract(text, KG_LABELS)
    # no span survives a .99 threshold with surrogate weights
    assert sc.extract(text, KG_LABELS, threshold=0.99) == []


def test_legacy_bilstm_shapes():
    """BiLSTM concatenates fwd/bwd per step (BiLSTM.swift:118) and is
    sequence-order sensitive in each direction."""
    from raykg.core.legacy import BiLSTM

    rng = np.random.default_rng(1)
    h, d = 3, 4
    lstm = BiLSTM(rng.standard_normal((4 * h, d)), rng.standard_normal((4 * h, h)),
                  rng.standard_normal(4 * h),
                  rng.standard_normal((4 * h, d)), rng.standard_normal((4 * h, h)),
                  rng.standard_normal(4 * h))
    xs = rng.standard_normal((5, d))
    out = lstm(xs)
    assert out.shape == (5, 2 * h)
    out_rev = lstm(xs[::-1])
    assert not np.allclose(out, out_rev[::-1])
    assert lstm(np.empty((0, d))).shape == (0, d)


def test_count_heads(oracle):
    """A4/A5 (GLiNER2SpanPipeline.swift:117-198,
    GLiNER2CountPredictorModel.swift:18-51): argmax with first-max
    tie-break, clamp to max_count, prefix trim of structure embeddings, and
    the predictedCount gate between 0 and max output."""
    b = oracle.backend

    # argmax semantics: first max wins, clamp, empty → 0
    assert b.argmax_count(np.array([]), 8) == 0
    assert b.argmax_count(np.array([0.5, 2.0, 2.0, 1.0]), 8) == 1
    assert b.argmax_count(np.array([0., 0., 0., 0., 9.]), 3) == 3   # clamp
    assert b.argmax_count(np.array([7.0, 1.0]), 8) == 0

    # surrogate head: empty text → 0; non-empty → max_count (monotone bias)
    pe = np.ones((2, b.core))
    assert b.predict_count(pe, 0) == 0
    assert b.predict_count(np.empty((0, b.core)), 5) == 0
    assert b.predict_count(pe, 12) == b.config.max_count
    lg = b.count_logits(pe, 12)
    assert len(lg) == b.config.max_count + 1
    assert b.argmax_count(lg, b.config.max_count) == b.config.max_count

    # A5: trim to predictedCount; instance 0 is identity (feeds D1)
    labels = np.stack([np.arange(b.h, dtype=float),
                       np.arange(b.h, dtype=float) * 2])
    s3 = b.structure_embeddings(labels, 3)
    assert s3.shape == (3, 2, b.h)
    assert np.array_equal(s3[0], labels)
    assert not np.array_equal(s3[1], labels)
    assert b.structure_embeddings(labels, 0).shape == (0, 2, b.h)
    assert b.structure_embeddings(labels, 99).shape[0] == b.config.max_count

    # golden gate: predictedCount==0 forces [] even on entity-rich text
    text = "Amelia Reed met Marcus Tanaka in Berlin."
    normal = oracle.extract_mentions(text, KG_LABELS)
    assert normal
    orig = b.count_logits
    try:
        b.count_logits = lambda pe_, nw: np.array([5.0] + [0.0] * 8)
        b._count_memo.clear()      # count is memoized by prompt-emb content
        gated = oracle.extract_mentions(text + " gated-variant", KG_LABELS)
        assert gated == []
    finally:
        b.count_logits = orig
        b._count_memo.clear()


def test_unigram_vocab_loader(tmp_path):
    """Real tokenizer.json path (mirrors TokenizerParityTests.swift:12-44):
    exact ids from a miniature unigram vocab, Viterbi preferring the
    higher-scoring segmentation, added_tokens honored, per-char UNK
    fallback, and the synthetic fallback when no file exists."""
    import json

    from raykg.core.tokenizer import WordTokenizer, normalize
    from raykg.core.vocab import UnigramVocab

    vocab = [["[UNK]", -10.0], ["[PAD]", 0.0], ["[CLS]", 0.0], ["[SEP]", 0.0],
             ["▁", -2.0], ["▁he", -3.0], ["▁hel", -2.5], ["lo", -1.0],
             ["l", -4.0], ["o", -4.0], ["h", -5.0], ["e", -5.0],
             ["▁lo", -3.5], ["w", -6.0]]
    spec = {"model": {"type": "Unigram", "unk_id": 0, "vocab": vocab},
            "added_tokens": [{"id": 99, "content": "<<ENT>>"}]}
    (tmp_path / "tokenizer.json").write_text(json.dumps(spec))

    v = UnigramVocab.load(str(tmp_path))
    assert (v.unk_id, v.pad_id, v.cls_id, v.sep_id) == (0, 1, 2, 3)
    assert v.token_id("<<ENT>>") == 99

    # "hello" → "▁hello": best path ▁hel(-2.5)+lo(-1.0) = -3.5 beats
    # ▁he(-3)+l(-4)+lo… — exact ids [6, 7]
    ids, toks = v.tokenize_normalized(normalize("hello"))
    assert ids == [6, 7] and toks == ["▁hel", "lo"]
    # per-char UNK fallback: 'z' has no piece ("zo" normalizes to "▁zo")
    ids2, toks2 = v.tokenize_normalized(normalize("zo"))
    assert ids2 == [4, 0, 9] and toks2 == ["▁", "[UNK]", "o"]

    # WordTokenizer facade: real vocab when dir given, synthetic otherwise
    wt = WordTokenizer(seed=42, vocab_dir=str(tmp_path))
    assert wt.ids("hello") == [6, 7]
    wt_syn = WordTokenizer(seed=42, vocab_dir=None)
    assert wt_syn.vocab is None and wt_syn.ids("hello")  # synthetic path

    # per-directory cache returns the same parsed instance
    assert UnigramVocab.load(str(tmp_path)) is v

    # HF sibling added_tokens.json (the reference's real resource layout —
    # Resources/tokenizer/added_tokens.json) merges with explicit ids
    tdir = tmp_path / "withsib" / "tokenizer"
    tdir.mkdir(parents=True)
    (tdir / "tokenizer.json").write_text(json.dumps(spec))
    (tdir / "added_tokens.json").write_text(
        json.dumps({"[P]": 128003, "[E]": 128005, "[SEP_TEXT]": 128002}))
    v2 = UnigramVocab.load(str(tmp_path / "withsib"))
    assert v2.token_id("[P]") == 128003
    assert v2.token_id("[E]") == 128005
    assert v2.token_id("[SEP_TEXT]") == 128002
    assert v2.token_id("<<ENT>>") == 99    # inline added_tokens kept


def test_schema_encoding_shapes():
    tok = WordTokenizer(42)
    enc = encode_schema("John Smith works at Apple Inc.", ["person", "organization"],
                        tok, max_span_width=8)
    assert len(enc.prompt_ranges) == 2
    assert len(enc.words) == 7      # John Smith works at Apple Inc .
    assert enc.words[-1] == "."
    # span plan: (start, start+width), end < n_words (GLiNERTokenizer.swift:470-491)
    assert (enc.span_starts + enc.span_widths < len(enc.words)).all()
    n_expected = sum(min(8, 7 - s) for s in range(7))
    assert len(enc.span_starts) == n_expected
    # word char ranges slice the original surfaces
    text = "John Smith works at Apple Inc."
    for i, w in enumerate(enc.words):
        assert text[enc.word_starts[i]:enc.word_ends[i]] == w


# -- decode / NMS ----------------------------------------------------------
def test_decode_edge_cases(oracle):
    assert oracle.extract_mentions("", KG_LABELS) == []
    assert oracle.extract_mentions("John Smith works here.", []) == []
    many = oracle.extract_mentions("John Smith met with Apple Inc in Berlin.", KG_LABELS)
    few = oracle.extract_mentions("John Smith met with Apple Inc in Berlin.",
                                  KG_LABELS, threshold=0.99)
    assert len(few) <= len(many)
    assert len(few) <= 2   # reference edge test: threshold 0.99 → ≤2


def test_decode_no_overlaps(oracle):
    text = "Amelia Reed works at Helios Dynamics in Seattle."
    mentions = oracle.extract_mentions(text, KG_LABELS)
    assert mentions
    # label-blind NMS: kept spans are pairwise disjoint (SpanDecoder.swift:12-101)
    for i, a in enumerate(mentions):
        for b in mentions[i + 1:]:
            assert a.end <= b.start or b.end <= a.start
    # output sorted by start asc
    starts = [m.start for m in mentions]
    assert starts == sorted(starts)
    # surface form sliced from original text
    for m in mentions:
        assert text[m.start:m.end] == m.text


def test_decode_deterministic(oracle):
    text = "Maria Chen visited Tokyo and met with Vertex Labs."
    a = oracle.extract_mentions(text, KG_LABELS)
    b = oracle.extract_mentions(text, KG_LABELS)
    assert a == b
    b2 = Oracle().extract_mentions(text, KG_LABELS)
    assert a == b2   # no hidden state leaks across instances


# -- D4 chunk merge --------------------------------------------------------
def test_merge_chunks_rules():
    m = [
        Mention("Apple", "org", 0.9, 10, 15),
        Mention("apple", "org", 0.8, 100, 105),   # same label + same lowercased text → dup
        Mention("Apple", "person", 0.7, 200, 205),  # different label → kept
        Mention("Pear", "org", 0.6, 12, 18),      # overlaps kept 'Apple' org → dup
        Mention("Plum", "org", 0.5, 50, 54),      # clean → kept
    ]
    out = merge_chunks(m)
    keys = {(x.text, x.label) for x in out}
    assert keys == {("Apple", "org"), ("Apple", "person"), ("Plum", "org")}
    assert [x.start for x in out] == sorted(x.start for x in out)


def test_adjust_offsets():
    out = adjust_offsets([Mention("x", "l", 0.5, 3, 4)], 100)
    assert out[0].start == 103 and out[0].end == 104


# -- chunked path equivalence ---------------------------------------------
def test_chunked_path_matches_unchunked_semantics(oracle):
    # a doc just above the trigger still yields mentions with doc-level
    # offsets that slice the original text
    sent = "Amelia Reed works at Helios Dynamics in Seattle. "
    text = (sent * 40).strip()
    assert should_chunk(text, oracle.config.max_words)
    mentions = oracle.extract_mentions(text, KG_LABELS)
    assert mentions
    for m in mentions:
        assert text[m.start:m.end] == m.text


# -- relations -------------------------------------------------------------
def test_sentence_spans_cover():
    text = "A b c. D e! F g? H"
    spans = sentence_spans(text)
    assert spans[0][0] == 0 and spans[-1][1] == len(text)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 == s2


def test_extract_triples_basic():
    text = "Amelia Reed works at Helios Dynamics. Bob visited Berlin."
    mentions = [
        Mention("Amelia Reed", "person", 0.9, 0, 11),
        Mention("Helios Dynamics", "organization", 0.8, 21, 36),
        Mention("Bob", "person", 0.9, 38, 41),
        Mention("Berlin", "location", 0.85, 50, 56),
    ]
    triples = extract_triples(text, mentions)
    td = {(t.subj, t.pred, t.obj) for t in triples}
    assert ("Amelia Reed", "works_at", "Helios Dynamics") in td
    assert ("Bob", "visited", "Berlin") in td
    # no cross-sentence pair
    assert not any(t.subj == "Helios Dynamics" and t.obj == "Bob" for t in triples)


# -- schema API (ports GLiNER2SchemaAPITests.swift) ------------------------
def test_schema_builder():
    s = (Schema().entities(["person", "person", "org"], threshold=0.5)
                 .classification("topic", ["a", "b"], multi_label=True)
                 .structure("contact").field("email", validators=[
                     Validator(r"[^@]+@[^@]+\.\w+", full=True)]).done())
    assert s.entity_labels == ["person", "org"]       # deduped
    assert s.entity_threshold("person", 0.3) == 0.5
    assert s.entity_threshold("org", 0.3) == 0.5
    built = s.build()
    assert built["classifications"][0]["multi_label"] is True
    assert "contact" in built["json_structures"][0]


def test_validators():
    v_full = Validator(r"\d+", full=True)
    assert v_full.accepts("123") and not v_full.accepts("a123")
    v_part = Validator(r"\d+")
    assert v_part.accepts("a123")
    v_excl = Validator(r"spam", exclude=True)
    assert v_excl.accepts("ham") and not v_excl.accepts("SPAM")  # case-insensitive


def test_multitask_extract(oracle):
    schema = (Schema().entities(["person", "organization"], dtype="list")
                      .classification("topic", ["business", "travel"])
                      .structure("doc").field("city", description="location").done())
    res = oracle.extract(
        "Amelia Reed works at Helios Dynamics in Seattle.", schema)
    assert set(res["entities"].keys()) == {"person", "organization"}
    assert isinstance(res["entities"]["person"], list)
    assert "topic" in res["classifications"]
    assert "doc" in res["structures"]


def test_model_manifest_loader(tmp_path):
    """GLiNERManifest semantics (GLiNERManifest.swift:5-89): required
    artifact keys, relative-vs-absolute resolution against the manifest
    directory, tokenizer_dir optional."""
    import json

    from raykg.core.manifest import ModelManifest

    spec = {"model_id": "gliner2-test", "max_seq_len": 512,
            "max_schema_tokens": 64, "max_width": 8, "hidden_size": 512,
            "counting_layer": "count", "max_count": 8, "precision": "float16",
            "artifacts": {"encoder": "enc.onnx", "span_rep": "span.onnx",
                          "classifier": "/abs/cls.onnx",
                          "count_predictor": "cp.onnx",
                          "count_embed": "ce.onnx"},
            "tokenizer_dir": "tokenizer"}
    mp = tmp_path / "manifest.json"
    mp.write_text(json.dumps(spec))
    m = ModelManifest.load(str(mp))
    assert m.model_id == "gliner2-test" and m.max_count == 8
    assert m.artifacts["encoder"] == str(tmp_path / "enc.onnx")
    assert m.artifacts["classifier"] == "/abs/cls.onnx"   # absolute kept
    assert m.tokenizer_dir == str(tmp_path / "tokenizer")

    bad = dict(spec, artifacts={"encoder": "e.onnx"})
    (tmp_path / "bad.json").write_text(json.dumps(bad))
    with pytest.raises(ValueError, match="missing artifacts"):
        ModelManifest.load(str(tmp_path / "bad.json"))


def test_onnx_backend_import_guard(tmp_path):
    """Without onnxruntime the production backend fails loudly at
    construction (never silently degrades to the surrogate)."""
    import json

    from raykg.core import onnx_backend

    mp = tmp_path / "manifest.json"
    mp.write_text(json.dumps({
        "model_id": "x", "max_seq_len": 8, "max_schema_tokens": 4,
        "max_width": 2, "hidden_size": 8, "max_count": 2,
        "artifacts": {k: f"{k}.onnx" for k in
                      ("encoder", "span_rep", "classifier",
                       "count_predictor", "count_embed")}}))
    if onnx_backend._ort is None:
        with pytest.raises(ImportError, match="onnxruntime"):
            onnx_backend.OnnxBackend(str(mp))
    else:                                   # environment with onnxruntime
        with pytest.raises(Exception):      # fixture has no real models
            onnx_backend.OnnxBackend(str(mp))


def test_plain_encode():
    """M4 (GLiNERTokenizer.swift:97-148): [CLS] + truncated pieces + [SEP];
    pad-to-max appends [PAD]/mask 0; truncation keeps maxLength-2 content
    tokens."""
    from raykg.core.legacy import encode_plain
    from raykg.core.tokenizer import CLS_ID, PAD_ID, SEP_ID, WordTokenizer

    tok = WordTokenizer(seed=42)
    ids, mask = encode_plain("hello world", tok)
    assert ids[0] == CLS_ID and ids[-1] == SEP_ID
    assert mask == [1] * len(ids) and len(ids) >= 3

    ids2, mask2 = encode_plain("hello world", tok, max_length=16,
                               pad_to_max=True)
    assert len(ids2) == 16 == len(mask2)
    n_content = mask2.count(1)
    assert ids2[n_content:] == [PAD_ID] * (16 - n_content)
    assert mask2[n_content:] == [0] * (16 - n_content)
    assert ids2[:n_content] == ids      # same content prefix

    long_ids, long_mask = encode_plain("word " * 400, tok, max_length=32)
    assert len(long_ids) == 32 and long_ids[-1] == SEP_ID
    assert long_mask == [1] * 32

    empty_ids, empty_mask = encode_plain("", tok)
    assert empty_ids == [CLS_ID, SEP_ID] and empty_mask == [1, 1]


def test_onnx_backend_mocked_sessions(tmp_path):
    """OnnxBackend head→output dataflow, end-to-end on mocked
    InferenceSessions (VERDICT r2 #5): the encoder feeds the [P]-marker
    embedding (position 1) to count_predictor, the per-label prompt MEANS to
    count_embed, the FULL (S,W) span grid to span_rep (gathering valid plan
    entries after the reshape), prefix-trims structure to predictedCount,
    and classify routes schema embeddings through the classifier head with
    M13 post-processing. Every fake head records the exact tensors it was
    fed, so the assertions pin the dataflow, not just the shapes."""
    import json

    import numpy as np

    from raykg.core.onnx_backend import OnnxBackend
    from raykg.core.tokenizer import encode_schema

    H, W, MAXC = 4, 3, 5

    # miniature real vocab with the GLiNER2 markers
    tdir = tmp_path / "tokenizer"
    tdir.mkdir()
    vocab = [["[UNK]", -10.0], ["[PAD]", 0.0], ["[CLS]", 0.0], ["[SEP]", 0.0],
             ["▁", -2.0], ["a", -3.0], ["b", -3.0], ["c", -3.0], ["(", -3.0],
             [")", -3.0], ["▁a", -2.5], ["▁b", -2.5], ["▁c", -2.5],
             ["e", -3.0], ["n", -3.0], ["t", -3.0], ["i", -3.0], ["s", -3.0],
             ["▁e", -2.5], ["▁(", -2.5], ["▁)", -2.5]]
    (tdir / "tokenizer.json").write_text(json.dumps(
        {"model": {"type": "Unigram", "unk_id": 0, "vocab": vocab}}))
    (tdir / "added_tokens.json").write_text(json.dumps(
        {"[P]": 103, "[E]": 105, "[C]": 104, "[SEP_TEXT]": 102}))

    mp = tmp_path / "manifest.json"
    mp.write_text(json.dumps({
        "model_id": "mock", "max_seq_len": 64, "max_schema_tokens": 32,
        "max_width": W, "hidden_size": H, "max_count": MAXC,
        "artifacts": {k: f"{k}.onnx" for k in
                      ("encoder", "span_rep", "classifier",
                       "count_predictor", "count_embed")},
        "tokenizer_dir": "tokenizer"}))

    def fake_hidden(ids):                       # id-determined hidden states
        return np.stack([[((t * (j + 1)) % 11) / 10.0 for j in range(H)]
                         for t in ids]).astype(np.float32)

    feeds: dict[str, list] = {k: [] for k in
                              ("encoder", "span_rep", "classifier",
                               "count_predictor", "count_embed")}

    class FakeSession:
        def __init__(self, head):
            self.head = head

        def run(self, _out, inputs):
            feeds[self.head].append({k: np.asarray(v)
                                     for k, v in inputs.items()})
            if self.head == "encoder":
                return (fake_hidden(inputs["input_ids"][0])[None],)
            if self.head == "span_rep":
                tok = np.asarray(inputs["token_embeddings"])[0]   # (S, H)
                idx = np.asarray(inputs["span_idx"])[0]           # (S*W, 2)
                rows = tok[idx[:, 0]] + 2.0 * tok[idx[:, 1]]
                s = tok.shape[0]
                return (rows.reshape(1, s, W, H),)
            if self.head == "classifier":
                empr = np.asarray(inputs["schema_embeddings"])[0]  # (P, H)
                return (empr.sum(axis=1)[None],)
            if self.head == "count_predictor":
                return (np.arange(MAXC + 1, dtype=np.float32),)
            if self.head == "count_embed":
                lab = np.asarray(inputs["label_embeddings"])       # (L, H)
                return (np.stack([lab * (c + 1.0)
                                  for c in range(MAXC)]),)
            raise AssertionError(self.head)

    import os

    be = OnnxBackend(str(mp), session_factory=lambda p: FakeSession(
        os.path.basename(p).split(".")[0]))

    text = "a b c"
    labels = ["a", "b"]
    logits, enc = be.span_scores(
        encode_schema(text, labels, be.tokenizer, W))

    # dataflow: count head got EXACTLY the [P]-position embedding
    hid = fake_hidden(enc.input_ids)
    assert np.allclose(feeds["count_predictor"][0]["prompt_embeddings"],
                       hid[1][None])
    # count_embed got the per-label prompt MEANS
    expected_prompts = np.stack([hid[a:b].mean(axis=0)
                                 for a, b in enc.prompt_ranges])
    assert np.allclose(feeds["count_embed"][0]["label_embeddings"],
                       expected_prompts, atol=1e-6)
    # span_rep got the full S×W grid with clamped ends
    idx_fed = feeds["span_rep"][0]["span_idx"][0]
    s_words = len(enc.words)
    assert idx_fed.shape == (s_words * W, 2)
    assert idx_fed[:, 1].max() == s_words - 1
    # output: logits == gathered grid rows @ (structure instance 0).T;
    # count argmax = MAXC (clamped), instance 0 = labels × 1.0
    word_embs = hid[enc.word_first_subword]
    rows = word_embs[enc.span_starts] \
        + 2.0 * word_embs[np.minimum(enc.span_starts + enc.span_widths,
                                     s_words - 1)]
    assert np.allclose(logits, rows @ expected_prompts.T, atol=1e-5)
    assert logits.shape == (len(enc.span_starts), len(labels))

    # classify: schema embeddings → classifier logits → softmax → sort desc
    got = be.classify(text, ["a", "b"], multi_label=False, threshold=0.0)
    cls_feed = feeds["classifier"][0]["schema_embeddings"][0]
    lg = cls_feed.sum(axis=1).astype(np.float64)
    z = np.exp(lg - lg.max())
    sm = z / z.sum()
    expect = sorted(zip(["a", "b"], sm), key=lambda p: (-p[1], p[0]))
    assert [g[0] for g in got] == [e[0] for e in expect]
    assert np.allclose([g[1] for g in got], [e[1] for e in expect])
    # multi-label: sigmoid + threshold filter
    got_ml = be.classify(text, ["a", "b"], multi_label=True, threshold=0.9)
    assert all(s >= 0.9 for _, s in got_ml)


def test_real_vocab_special_ids(tmp_path):
    """ADVICE r2 (medium): with a real tokenizer.json the encoders must emit
    the VOCABULARY's special ids — [CLS]/[SEP] from the required pieces,
    [P]/[E]/[SEP_TEXT] from added_tokens, <<ENT>>/<<SEP>> from registration —
    never the synthetic constants (which would collide with real content
    pieces). Markers absent from the vocab raise instead of colliding."""
    import json

    import pytest as _pytest

    from raykg.core.legacy import encode_prompted
    from raykg.core.tokenizer import WordTokenizer, encode_schema

    tdir = tmp_path / "tokenizer"
    tdir.mkdir()
    vocab = [["[UNK]", -10.0], ["[PAD]", 0.0], ["[CLS]", 0.0], ["[SEP]", 0.0],
             ["▁", -2.0], ["a", -3.0], ["▁a", -2.5], ["(", -3.0],
             [")", -3.0], ["▁(", -2.5], ["▁)", -2.5], ["e", -3.0],
             ["n", -3.0], ["t", -3.0], ["i", -3.0], ["s", -3.0],
             ["▁e", -2.5]]
    (tdir / "tokenizer.json").write_text(json.dumps(
        {"model": {"type": "Unigram", "unk_id": 0, "vocab": vocab}}))
    (tdir / "added_tokens.json").write_text(json.dumps(
        {"[P]": 128003, "[E]": 128005, "[SEP_TEXT]": 128002}))

    tok = WordTokenizer(seed=42, vocab_dir=str(tdir))
    assert (tok.sp.cls, tok.sp.sep, tok.sp.p, tok.sp.e, tok.sp.sep_text) == \
        (2, 3, 128003, 128005, 128002)

    enc = encode_schema("a a", ["a"], tok, max_span_width=2)
    ids = enc.input_ids.tolist()
    assert ids[0] == 2 and ids[1] == 128003        # [CLS] [P]
    assert 128005 in ids and 128002 in ids         # [E] marker + [SEP_TEXT]
    assert ids[-1] == 3                            # trailing [SEP]
    # marker positions carry the REAL ids: position 1 is [P]=128003 (not the
    # synthetic 4), the label marker is [E]=128005 (not 5), the schema/text
    # boundary is [SEP_TEXT]=128002 (not 9)
    assert ids[ids.index(128005) + 0] == 128005
    assert enc.text_start == ids.index(128002) + 1

    # legacy markers absent → loud failure, not a silent collision
    with _pytest.raises(ValueError, match="<<ENT>>|ent"):
        encode_prompted("a", ["a"], tok)
    # manifest-style registration fixes it (GLiNERTokenizer.swift:458-460)
    tok.register_special("<<ENT>>", 128002)
    tok.register_special("<<SEP>>", 128003)
    penc = encode_prompted("a", ["a"], tok)
    pids = penc.input_ids.tolist()
    assert pids[penc.class_positions[0]] == 128002
    assert pids.count(128003) == 1

    # classification kind marker absent from THIS vocab → raises
    with _pytest.raises(ValueError, match="'c'"):
        encode_schema("a", ["a"], tok, max_span_width=2, kinds=["C"])


def test_onnx_backend_mocked_session_dataflow(tmp_path):
    """Full OnnxBackend dataflow under fake ONNX sessions (the
    ``session_factory`` hook exists for exactly this): every feed shape the
    exported heads were traced with is asserted inside the fakes, and the
    span-score / classify outputs are recomputed independently from the
    fakes' arithmetic — so the gather/trim/reshape plumbing
    (onnx_backend.py:90-200) is covered even though the sandbox ships no
    onnxruntime."""
    import json

    import numpy as np

    from raykg.core.onnx_backend import OnnxBackend

    H, W, MAXC = 8, 2, 3

    tdir = tmp_path / "tok"
    tdir.mkdir()
    vocab = [["[UNK]", -10.0], ["[PAD]", 0.0], ["[CLS]", 0.0], ["[SEP]", 0.0],
             ["▁", -2.0], ["▁he", -3.0], ["▁hel", -2.5], ["lo", -1.0],
             ["l", -4.0], ["o", -4.0], ["h", -5.0], ["e", -5.0],
             ["▁lo", -3.5], ["w", -6.0], ["(", -1.0], [")", -1.0]]
    (tdir / "tokenizer.json").write_text(json.dumps(
        {"model": {"type": "Unigram", "unk_id": 0, "vocab": vocab}}))
    (tdir / "added_tokens.json").write_text(json.dumps(
        {"[P]": 203, "[E]": 205, "[C]": 206, "[SEP_TEXT]": 202}))

    mp = tmp_path / "manifest.json"
    mp.write_text(json.dumps({
        "model_id": "fake", "max_seq_len": 128, "max_schema_tokens": 32,
        "max_width": W, "hidden_size": H, "max_count": MAXC,
        "tokenizer_dir": "tok",
        "artifacts": {k: f"{k}.onnx" for k in
                      ("encoder", "span_rep", "classifier",
                       "count_predictor", "count_embed")}}))

    def fake_hidden(ids: np.ndarray) -> np.ndarray:
        h = np.arange(1, H + 1)
        return (((ids[:, None] * h[None, :]) % 17).astype(np.float32) / 17.0)

    class FakeSession:
        def __init__(self, name):
            self.name = name

        def run(self, _outputs, feeds):
            if self.name == "encoder":
                ids = np.asarray(feeds["input_ids"])
                assert ids.ndim == 2 and ids.dtype == np.int64
                assert np.asarray(feeds["attention_mask"]).shape == ids.shape
                return (fake_hidden(ids[0])[None],)
            if self.name == "count_predictor":
                pe = np.asarray(feeds["prompt_embeddings"])
                assert pe.shape == (1, H)          # [P] embedding only
                lg = np.zeros(MAXC + 1, np.float32)
                lg[2] = 1.0                         # → predictedCount = 2
                return (lg[None],)
            if self.name == "count_embed":
                le = np.asarray(feeds["label_embeddings"])
                assert le.ndim == 2 and le.shape[1] == H
                return (np.stack([le * (i + 1) for i in range(MAXC)]),)
            if self.name == "span_rep":
                te = np.asarray(feeds["token_embeddings"])
                si = np.asarray(feeds["span_idx"])
                assert te.ndim == 3 and te.shape[2] == H
                s = te.shape[1]
                # the traced full (S, W) grid with ends clamped to S-1
                assert si.shape == (1, s * W, 2)
                starts, ends = si[0, :, 0], si[0, :, 1]
                assert (starts <= ends).all() and (ends <= s - 1).all()
                return ((te[0][starts] + 0.5 * te[0][ends])[None],)
            if self.name == "classifier":
                se = np.asarray(feeds["schema_embeddings"])
                assert se.ndim == 3 and se.shape[2] == H
                return (se[0].sum(axis=1)[None],)
            raise AssertionError(self.name)

    made = {}

    def factory(path):
        import os
        name = os.path.basename(path).removesuffix(".onnx")
        made[name] = FakeSession(name)
        return made[name]

    b = OnnxBackend(str(mp), session_factory=factory)
    assert set(made) == {"encoder", "span_rep", "classifier",
                         "count_predictor", "count_embed"}

    from raykg.core.tokenizer import encode_schema

    scores, enc = b.span_scores(
        encode_schema("hello lo hello", ["hello"], b.tokenizer, W))
    n_spans, n_labels = len(enc.span_starts), 1
    assert scores.shape == (n_spans, n_labels)

    # independent replay of the fakes' arithmetic
    hidden = fake_hidden(enc.input_ids.astype(np.int64))
    word_embs = hidden[enc.word_first_subword]
    prompts = np.stack([hidden[a:b2].mean(axis=0)
                        for a, b2 in enc.prompt_ranges])
    labels = prompts * 1                         # structure[:2][0]
    s = len(enc.words)
    gs = np.repeat(np.arange(s), W)
    ge = np.minimum(gs + np.tile(np.arange(W), s), s - 1)
    grid = (word_embs[gs] + 0.5 * word_embs[ge]).reshape(s, W, H)
    expect = grid[enc.span_starts, enc.span_widths] @ labels.T
    np.testing.assert_allclose(scores, expect, rtol=1e-6)

    # forward(): word/prompt embedding extraction
    we, pe = b.forward(enc)
    np.testing.assert_allclose(we, word_embs, rtol=1e-6)
    np.testing.assert_allclose(pe, prompts, rtol=1e-6)

    # classify(): softmax path and multi-label sigmoid path
    single = b.classify("hello lo", ["hello", "lo"], threshold=0.0)
    assert len(single) == 2 and abs(sum(sc for _, sc in single) - 1.0) < 1e-6
    assert single[0][1] >= single[1][1]
    multi = b.classify("hello lo", ["hello", "lo"], multi_label=True,
                       threshold=0.0)
    assert all(0.0 <= sc <= 1.0 for _, sc in multi)


def test_onnx_backend_batched_sessions(tmp_path):
    """VERDICT r3 #4: span_scores_batch pads a whole batch to (B, S) and
    makes ONE encoder, ONE count-predictor and ONE span_rep session call
    per BATCH (count_embed stays per-doc — traced without a batch dim),
    with output element-wise identical to the per-doc path."""
    import json

    import numpy as np

    from raykg.core.onnx_backend import OnnxBackend
    from raykg.core.tokenizer import encode_schema

    H, W, MAXC = 4, 3, 5

    tdir = tmp_path / "tokenizer"
    tdir.mkdir()
    vocab = [["[UNK]", -10.0], ["[PAD]", 0.0], ["[CLS]", 0.0], ["[SEP]", 0.0],
             ["▁", -2.0], ["a", -3.0], ["b", -3.0], ["c", -3.0], ["(", -3.0],
             [")", -3.0], ["▁a", -2.5], ["▁b", -2.5], ["▁c", -2.5],
             ["e", -3.0], ["n", -3.0], ["t", -3.0], ["i", -3.0], ["s", -3.0],
             ["▁e", -2.5], ["▁(", -2.5], ["▁)", -2.5]]
    (tdir / "tokenizer.json").write_text(json.dumps(
        {"model": {"type": "Unigram", "unk_id": 0, "vocab": vocab}}))
    (tdir / "added_tokens.json").write_text(json.dumps(
        {"[P]": 103, "[E]": 105, "[C]": 104, "[SEP_TEXT]": 102}))
    mp = tmp_path / "manifest.json"
    mp.write_text(json.dumps({
        "model_id": "mock", "max_seq_len": 64, "max_schema_tokens": 32,
        "max_width": W, "hidden_size": H, "max_count": MAXC,
        "artifacts": {k: f"{k}.onnx" for k in
                      ("encoder", "span_rep", "classifier",
                       "count_predictor", "count_embed")},
        "tokenizer_dir": "tokenizer"}))

    def fake_hidden(ids):
        return np.stack([[((t * (j + 1)) % 11) / 10.0 for j in range(H)]
                         for t in ids]).astype(np.float32)

    def make_backend():
        feeds: dict[str, list] = {k: [] for k in
                                  ("encoder", "span_rep", "classifier",
                                   "count_predictor", "count_embed")}

        class FakeSession:
            def __init__(self, head):
                self.head = head

            def run(self, _out, inputs):
                feeds[self.head].append({k: np.asarray(v)
                                         for k, v in inputs.items()})
                if self.head == "encoder":
                    ids = np.asarray(inputs["input_ids"])      # (B, S)
                    return (np.stack([fake_hidden(row) for row in ids]),)
                if self.head == "span_rep":
                    tok = np.asarray(inputs["token_embeddings"])  # (B, Sw, H)
                    idx = np.asarray(inputs["span_idx"])          # (B, Sw*W, 2)
                    b, sw, _ = tok.shape
                    rows = np.stack([tok[i][idx[i][:, 0]]
                                     + 2.0 * tok[i][idx[i][:, 1]]
                                     for i in range(b)])
                    return (rows.reshape(b, sw, W, H),)
                if self.head == "count_predictor":
                    b = np.asarray(inputs["prompt_embeddings"]).shape[0]
                    return (np.tile(np.arange(MAXC + 1, dtype=np.float32),
                                    (b, 1)),)
                if self.head == "count_embed":
                    lab = np.asarray(inputs["label_embeddings"])
                    return (np.stack([lab * (c + 1.0)
                                      for c in range(MAXC)]),)
                raise AssertionError(self.head)

        import os

        be = OnnxBackend(str(mp), session_factory=lambda p: FakeSession(
            os.path.basename(p).split(".")[0]))
        return be, feeds

    labels = ["a", "b"]
    texts = ["a", "a b c", "b c a b"]

    be1, _ = make_backend()
    singles = [be1.span_scores(encode_schema(t, labels, be1.tokenizer, W))
               for t in texts]

    be2, feeds = make_backend()
    encs = [encode_schema(t, labels, be2.tokenizer, W) for t in texts]
    batched = be2.span_scores_batch(encs)

    # one call per BATCH for the batchable heads; per doc for count_embed
    assert len(feeds["encoder"]) == 1
    assert len(feeds["count_predictor"]) == 1
    assert len(feeds["span_rep"]) == 1
    assert len(feeds["count_embed"]) == len(texts)
    # the encoder feed is padded to the batch max with [PAD] + zero mask
    ids = feeds["encoder"][0]["input_ids"]
    mask = feeds["encoder"][0]["attention_mask"]
    s_max = max(len(e.input_ids) for e in encs)
    assert ids.shape == (len(texts), s_max)
    pad_id = be2.tokenizer.sp.pad
    for i, e in enumerate(encs):
        n = len(e.input_ids)
        assert (ids[i, :n] == e.input_ids).all()
        assert (ids[i, n:] == pad_id).all()
        assert mask[i, :n].all() and not mask[i, n:].any()
    # element-wise identical to the per-doc path
    for (ls, es), (lb, eb) in zip(singles, batched):
        assert np.allclose(ls, lb)
        assert (es.input_ids == eb.input_ids).all()


def test_schema_relation_list_markers():
    """[R]/[L] prompt kinds (GLiNER2PromptConfiguration.swift:19-20 — the
    reference defines them without exercising them; this pins the repo
    twin): encode_schema emits the relation/list markers for kinds 'R'/'L'
    with both the synthetic vocab and a real tokenizer.json, and markers
    absent from a real vocab raise instead of colliding."""
    import json

    import pytest as _pytest

    from raykg.core.tokenizer import (L_ID, R_ID, WordTokenizer,
                                      encode_schema)

    tok = WordTokenizer(seed=42)
    enc = encode_schema("alice knows bob", ["knows", "friends"], tok,
                        max_span_width=4, kinds=["R", "L"])
    ids = enc.input_ids.tolist()
    assert ids.count(R_ID) == 1 and ids.count(L_ID) == 1
    assert ids.index(R_ID) < ids.index(L_ID)        # prompt order preserved
    assert enc.prompt_kinds == ["R", "L"]
    # per-label prompt ranges still cover the label pieces after the marker
    assert len(enc.prompt_ranges) == 2
    assert all(b > a for a, b in enc.prompt_ranges)

    # real vocab: resolved from added_tokens, absence raises
    import tempfile

    with tempfile.TemporaryDirectory() as tdir:
        vocab = [["[UNK]", -10.0], ["[PAD]", 0.0], ["[CLS]", 0.0],
                 ["[SEP]", 0.0], ["▁", -2.0], ["a", -3.0], ["▁a", -2.5],
                 ["(", -3.0], [")", -3.0], ["▁(", -2.5], ["▁)", -2.5],
                 ["e", -3.0], ["n", -3.0], ["t", -3.0], ["i", -3.0],
                 ["s", -3.0], ["▁e", -2.5]]
        with open(f"{tdir}/tokenizer.json", "w") as f:
            json.dump({"model": {"type": "Unigram", "unk_id": 0,
                                 "vocab": vocab}}, f)
        with open(f"{tdir}/added_tokens.json", "w") as f:
            json.dump({"[P]": 900, "[E]": 901, "[SEP_TEXT]": 902,
                       "[R]": 903}, f)
        rtok = WordTokenizer(seed=42, vocab_dir=tdir)
        renc = encode_schema("a", ["a"], rtok, max_span_width=2,
                             kinds=["R"])
        assert renc.input_ids.tolist().count(903) == 1
        with _pytest.raises(ValueError, match="'l'"):
            encode_schema("a", ["a"], rtok, max_span_width=2, kinds=["L"])


def test_surrogate_batched_forward_bit_identical():
    """VERDICT r4 #3: the SURROGATE scorer's fused multi-doc forward
    (forward_batch / span_scores_batch / MentionExtractor._mentions_batch)
    is BIT-identical to the per-document path — same operand values in the
    same order at every position, including segment boundaries, chunked
    long docs, empty docs, and the mixed case."""
    import numpy as np

    from raykg.config import DEFAULT_CONFIG, KG_LABELS
    from raykg.core.chunk import chunk_text, should_chunk
    from raykg.core.decode import adjust_offsets, decode_spans_with_text, merge_chunks
    from raykg.core.scorer import SurrogateBackend
    from raykg.core.tokenizer import encode_schema
    from raykg.sources.pages import make_page_row
    from raykg.stages.mention import MentionExtractor

    cfg = DEFAULT_CONFIG
    texts = [make_page_row(i, "fused forward identity", "en")["text"]
             for i in range(12)]
    texts += ["", "x", texts[0] * 30]          # empty / 1-word / chunked

    # scorer level: span_scores (per doc) vs span_scores_batch (fused)
    be1 = SurrogateBackend(cfg)
    be2 = SurrogateBackend(cfg)
    encs1 = [encode_schema(t, KG_LABELS, be1.tokenizer, cfg.max_span_width)
             for t in texts]
    encs2 = [encode_schema(t, KG_LABELS, be2.tokenizer, cfg.max_span_width)
             for t in texts]
    singles = [be1.span_scores(e, cfg.threshold) for e in encs1]
    batched = be2.span_scores_batch(encs2, cfg.threshold)
    for (l1, _), (l2, _) in zip(singles, batched):
        assert l1.shape == l2.shape
        assert np.array_equal(l1, l2)          # BIT-equal, not allclose

    # extractor level: the OLD per-document loop (reference impl inline)
    # vs the batched __call__ path, chunk merge included
    ex = MentionExtractor()

    def reference(text):
        if not text:
            return []
        be = ex.backend
        if should_chunk(text, cfg.max_words):
            out = []
            for ch in chunk_text(text, cfg.max_chars, cfg.overlap_chars,
                                 cfg.max_words):
                enc = encode_schema(ch.text, KG_LABELS, be.tokenizer,
                                    cfg.max_span_width)
                logits, enc = be.span_scores(enc, cfg.threshold)
                ms = decode_spans_with_text(logits, enc, cfg.threshold,
                                            ch.text)
                out.extend(adjust_offsets(ms, ch.start_offset))
            return merge_chunks(out)
        enc = encode_schema(text, KG_LABELS, be.tokenizer, cfg.max_span_width)
        logits, enc = be.span_scores(enc, cfg.threshold)
        return decode_spans_with_text(logits, enc, cfg.threshold, text)

    want = [reference(t) for t in texts]
    got = MentionExtractor()._mentions_batch(texts)
    assert [[(m.text, m.label, m.score, m.start, m.end) for m in ms]
            for ms in want] == \
           [[(m.text, m.label, m.score, m.start, m.end) for m in ms]
            for ms in got]
