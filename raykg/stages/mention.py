"""Stage 4: mention detection + relation extraction — THE actor-pool stage.

A callable CLASS for ``map_batches(MentionExtractor, concurrency=N,
batch_size=B)``: all model state (surrogate weights, tokenizer cache, label
embeddings, compiled relation patterns) is built ONCE per actor in
``__init__`` — the Ray analogue of the reference loading Core ML models once
in ``GLiNERModel.init``
(/root/reference/Sources/GLiNERSwift/GLiNERModel.swift:304-328) — and each
``__call__`` processes one Arrow batch of documents.

Per document the actor runs the reference lifecycle (SURVEY.md §3.2-3.3):
chunk-if-long → schema encode → surrogate forward → greedy NMS decode →
offset adjust → chunk merge → pattern relation extraction. Output rows are
doc-level with NESTED mention/triple list columns: each document's results
stay co-located, so downstream fan-out (mentions table, triples table) is a
cheap stateless explode with no shuffle and no regrouping.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import DEFAULT_CONFIG, KG_LABELS, PipelineConfig
from ..core.chunk import chunk_text, should_chunk
from ..core.decode import (Mention, adjust_offsets, decode_spans_with_text,
                           merge_chunks, span_candidates)
from ..core.legacy import LegacySpanScorer
from ..core.relations import RelationConfig, extract_triples
from ..core.scorer import SurrogateBackend
from ..core.tokenizer import encode_schema
from ..schemas import DOC_EXTRACTS, MENTIONS, TRIPLES


class MentionExtractor:
    """Actor-pool UDF: docs batch → doc-extract batch (nested results)."""

    def __init__(self, labels: list[str] | None = None,
                 config: PipelineConfig | None = None,
                 threshold: float | None = None,
                 relations: RelationConfig | None = None) -> None:
        self.config = (config or DEFAULT_CONFIG).with_threshold(threshold)
        self.labels = labels or KG_LABELS
        self.backend = SurrogateBackend(self.config)     # weights once per actor
        self.relations = relations or RelationConfig()
        self._compiled = self.relations.compile()        # regexes once per actor
        self._prefilter = self.relations.prefilter()

    # per-document path (shared with the oracle via raykg.core)
    def _mentions(self, text: str) -> list[Mention]:
        return self._mentions_batch([text])[0]

    def _mentions_batch(self, texts: list[str]) -> list[list[Mention]]:
        """Whole-batch mention extraction: every chunk of every document
        encodes first, then ONE ``span_scores_batch`` call runs the fused
        forward across all of them (VERDICT r4 #3 — the surrogate path the
        bench exercises now batches like the ONNX backend), then the
        per-chunk decode/merge tail runs unchanged. Bit-identical to the
        per-document path (pytest-pinned)."""
        cfg = self.config
        plans: list[list[tuple]] = []      # per doc: [(chunk_offset, enc)]
        flat_encs = []
        flat_texts = []
        for text in texts:
            plan: list[tuple] = []
            if text and self.labels:
                if should_chunk(text, cfg.max_words):
                    for ch in chunk_text(text, cfg.max_chars,
                                         cfg.overlap_chars, cfg.max_words):
                        enc = encode_schema(ch.text, self.labels,
                                            self.backend.tokenizer,
                                            cfg.max_span_width)
                        plan.append((ch.start_offset, len(flat_encs)))
                        flat_encs.append(enc)
                        flat_texts.append(ch.text)
                else:
                    enc = encode_schema(text, self.labels,
                                        self.backend.tokenizer,
                                        cfg.max_span_width)
                    plan.append((None, len(flat_encs)))
                    flat_encs.append(enc)
                    flat_texts.append(text)
            plans.append(plan)
        scored = self.backend.span_scores_batch(flat_encs, cfg.threshold) \
            if flat_encs else []
        out: list[list[Mention]] = []
        for plan in plans:
            if not plan:
                out.append([])
            elif plan[0][0] is None:
                logits, enc = scored[plan[0][1]]
                out.append(decode_spans_with_text(
                    logits, enc, cfg.threshold, flat_texts[plan[0][1]]))
            else:
                ms_all: list[Mention] = []
                for off, j in plan:
                    logits, enc = scored[j]
                    ms = decode_spans_with_text(logits, enc, cfg.threshold,
                                                flat_texts[j])
                    ms_all.extend(adjust_offsets(ms, off))
                out.append(merge_chunks(ms_all))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        mention_rows: list[list[dict]] = []
        triple_rows: list[list[dict]] = []
        all_mentions = self._mentions_batch(texts)
        for text, mentions in zip(texts, all_mentions):
            triples = extract_triples(text, mentions, self.relations,
                                      self._compiled, self._prefilter)
            mention_rows.append([
                {"text": m.text, "label": m.label, "score": m.score,
                 "start": m.start, "end": m.end} for m in mentions])
            triple_rows.append([
                {"subj": t.subj, "pred": t.pred, "obj": t.obj,
                 "subj_label": t.subj_label, "obj_label": t.obj_label,
                 "score": t.score, "sent_start": t.sent_start} for t in triples])
        cols = {
            "doc_id": batch.column("doc_id"),
            "url": batch.column("url"),
            "lang": batch.column("lang"),
            "n_words": batch.column("n_words"),
            "mentions": pa.array(mention_rows, DOC_EXTRACTS.field("mentions").type),
            "triples": pa.array(triple_rows, DOC_EXTRACTS.field("triples").type),
        }
        if "warc_ts" in batch.schema.names:   # passthrough for post-extract dedup
            cols["warc_ts"] = batch.column("warc_ts")
        return pa.table(cols)


class CandidateExtractor(MentionExtractor):
    """Oracle-dump support (NOT a pipeline stage): emits every pre-NMS span
    candidate — the model boundary of the mention path. Same actor state,
    plan construction and fused ``span_scores_batch`` call as
    ``MentionExtractor._mentions_batch``; instead of decoding it dumps the
    candidate rows (word interval, label index, float64 post-sigmoid score,
    doc-level char range, surface slice) so the SQL oracle can re-derive
    greedy NMS (D2), offset adjust (M9) and chunk merge (D4) relationally
    (``__ray_entry__.SQL_KG_MENTIONS``, recursive CTEs). ``chunked`` is
    emitted per row because single-chunk documents skip D4 in the engine
    (decode.py:merge_chunks is only applied to chunked docs)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.config
        texts = batch.column("text").to_pylist()
        doc_ids = batch.column("doc_id").to_pylist()
        urls = batch.column("url").to_pylist()
        plans: list[list[tuple]] = []
        flat_encs = []
        for text in texts:
            plan: list[tuple] = []
            if text and self.labels:
                if should_chunk(text, cfg.max_words):
                    for ci, ch in enumerate(chunk_text(text, cfg.max_chars,
                                                       cfg.overlap_chars,
                                                       cfg.max_words)):
                        plan.append((ci, ch.start_offset, True, len(flat_encs)))
                        flat_encs.append(encode_schema(ch.text, self.labels,
                                                       self.backend.tokenizer,
                                                       cfg.max_span_width))
                else:
                    plan.append((0, 0, False, len(flat_encs)))
                    flat_encs.append(encode_schema(text, self.labels,
                                                   self.backend.tokenizer,
                                                   cfg.max_span_width))
            plans.append(plan)
        scored = self.backend.span_scores_batch(flat_encs, cfg.threshold) \
            if flat_encs else []
        out = {k: [] for k in ("doc_id", "url", "chunk_idx", "chunked", "ws",
                               "width", "label_idx", "score", "label",
                               "start", "end", "text")}
        for did, url, text, plan in zip(doc_ids, urls, texts, plans):
            for ci, off, chunked, j in plan:
                logits, enc = scored[j]
                ws, wd, li, sc = span_candidates(logits, enc, cfg.threshold)
                n = len(ws)
                if not n:
                    continue
                cs = enc.word_starts[ws] + off
                ce = enc.word_ends[ws + wd] + off
                out["doc_id"].extend([did] * n)
                out["url"].extend([url] * n)
                out["chunk_idx"].extend([ci] * n)
                out["chunked"].extend([chunked] * n)
                out["ws"].extend(ws.tolist())
                out["width"].extend(wd.tolist())
                out["label_idx"].extend(li.tolist())
                out["score"].extend(sc.tolist())
                out["label"].extend(enc.entity_labels[i] for i in li.tolist())
                out["start"].extend(cs.tolist())
                out["end"].extend(ce.tolist())
                out["text"].extend(text[a:b] for a, b in
                                   zip(cs.tolist(), ce.tolist()))
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "url": pa.array(out["url"], pa.string()),
            "chunk_idx": pa.array(out["chunk_idx"], pa.int64()),
            "chunked": pa.array(out["chunked"], pa.bool_()),
            "ws": pa.array(out["ws"], pa.int64()),
            "width": pa.array(out["width"], pa.int64()),
            "label_idx": pa.array(out["label_idx"], pa.int64()),
            "score": pa.array(out["score"], pa.float64()),
            "label": pa.array(out["label"], pa.string()),
            "start": pa.array(out["start"], pa.int64()),
            "end": pa.array(out["end"], pa.int64()),
            "text": pa.array(out["text"], pa.string()),
        })


class LegacyMentionExtractor:
    """Actor-pool UDF for the GLiNER1 legacy path (M5 + A8,
    raykg.core.legacy): prompted encode → BiLSTM/FFN span scorer → greedy
    overlap decode. Emits FLAT mention rows (the v1 API has no
    relation/structure tasks, so there is nothing to co-locate)."""

    def __init__(self, labels: list[str] | None = None,
                 config: PipelineConfig | None = None,
                 threshold: float | None = None) -> None:
        self.config = (config or DEFAULT_CONFIG).with_threshold(threshold)
        self.labels = labels or KG_LABELS
        self.scorer = LegacySpanScorer(self.config)      # weights once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, urls, texts_o, labels_o, scores, starts, ends = \
            [], [], [], [], [], [], []
        for did, url, text in zip(batch.column("doc_id").to_pylist(),
                                  batch.column("url").to_pylist(),
                                  batch.column("text").to_pylist()):
            for m in self.scorer.extract(text, self.labels,
                                         self.config.threshold):
                doc_ids.append(did)
                urls.append(url)
                texts_o.append(m.text)
                labels_o.append(m.label)
                scores.append(m.score)
                starts.append(m.start)
                ends.append(m.end)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "text": pa.array(texts_o, pa.string()),
            "label": pa.array(labels_o, pa.string()),
            "score": pa.array(scores, pa.float64()),
            "start": pa.array(starts, pa.int64()),
            "end": pa.array(ends, pa.int64()),
        })


class LegacyCandidateExtractor(LegacyMentionExtractor):
    """Oracle-dump support (NOT a pipeline stage): emits the legacy
    decoder's pre-NMS candidates — word interval, label index, float64
    post-sigmoid score, char range, surface slice. The SQL oracle
    (``__ray_entry__.SQL_LEGACY_MENTIONS``) re-derives the greedy overlap
    decode (SpanDecoder.swift:11-90 semantics) as a recursive CTE."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("row_uid", "doc_id", "url", "ws", "we",
                               "label_idx", "score", "label", "start",
                               "end", "text")}
        # row_uid (assigned by the dump harness) disambiguates duplicate
        # crawls of the same doc_id: the engine decodes each input ROW
        # independently, so the SQL NMS must group per row, not per doc_id
        for uid, did, url, text in zip(batch.column("row_uid").to_pylist(),
                                       batch.column("doc_id").to_pylist(),
                                       batch.column("url").to_pylist(),
                                       batch.column("text").to_pylist()):
            cands, enc = self.scorer.candidates(text, self.labels,
                                                self.config.threshold)
            for sc, s0, e0, li in cands:
                a = int(enc.word_starts[s0])
                b = int(enc.word_ends[e0])
                out["row_uid"].append(uid)
                out["doc_id"].append(did)
                out["url"].append(url)
                out["ws"].append(s0)
                out["we"].append(e0)
                out["label_idx"].append(li)
                out["score"].append(sc)
                out["label"].append(self.labels[li])
                out["start"].append(a)
                out["end"].append(b)
                out["text"].append(text[a:b])
        return pa.table({
            "row_uid": pa.array(out["row_uid"], pa.int64()),
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "url": pa.array(out["url"], pa.string()),
            "ws": pa.array(out["ws"], pa.int64()),
            "we": pa.array(out["we"], pa.int64()),
            "label_idx": pa.array(out["label_idx"], pa.int64()),
            "score": pa.array(out["score"], pa.float64()),
            "label": pa.array(out["label"], pa.string()),
            "start": pa.array(out["start"], pa.int64()),
            "end": pa.array(out["end"], pa.int64()),
            "text": pa.array(out["text"], pa.string()),
        })


def _explode(batch: pa.Table, list_col: str, fields: list[str],
             schema: pa.Schema) -> pa.Table:
    """Vectorized nested-list explode: pyarrow list_flatten +
    list_parent_indices (zero Python per row — the Python-loop version cost
    tens of CPU-seconds at bench scale)."""
    import pyarrow.compute as pc

    col = batch.column(list_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col)
    parents = pc.list_parent_indices(col)
    cols = {
        "doc_id": pc.take(batch.column("doc_id").combine_chunks()
                          if isinstance(batch.column("doc_id"), pa.ChunkedArray)
                          else batch.column("doc_id"), parents),
        "url": pc.take(batch.column("url").combine_chunks()
                       if isinstance(batch.column("url"), pa.ChunkedArray)
                       else batch.column("url"), parents),
    }
    for f in fields:
        cols[f] = pc.struct_field(flat, f)
    return pa.table(cols, schema=schema)


def explode_mentions(batch: pa.Table) -> pa.Table:
    """doc-extract rows → flat mention rows (stateless, no shuffle)."""
    return _explode(batch, "mentions",
                    ["text", "label", "score", "start", "end"], MENTIONS)


def explode_triples(batch: pa.Table) -> pa.Table:
    """doc-extract rows → flat triple rows (stateless, no shuffle)."""
    return _explode(batch, "triples",
                    ["subj", "pred", "obj", "subj_label", "obj_label", "score"],
                    TRIPLES)
