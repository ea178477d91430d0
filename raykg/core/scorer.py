"""Surrogate GLiNER2 model heads (A1–A7) + span-score builder (D1).

The sandbox has no torch/onnxruntime and the reference ships no weights
(they are generated locally — /root/reference/Sources/GLiNERSwift/Resources/README.md),
so the engine defines a scorer *backend interface* with a deterministic numpy
implementation (SURVEY.md §7.4). The DATAFLOW mirrors the reference exactly:

  encode ids → hidden states                (A1, GLiNEREncoder.swift:46-85)
  word emb = first-subword hidden state     (A7, GLiNER2SchemaProjector.swift:57-63)
  prompt emb = mean over label subwords     (A7, GLiNER2SchemaProjector.swift:97-115)
  span emb from (start, end, width)         (A2, GLiNER2SpanRepresentationModel.swift:18-59)
  count argmax gates empty output           (A4, GLiNER2SpanPipeline.swift:173-198)
  score[span][label] = dot(spanEmb, labelEmb)  (D1, GLiNER2SpanScoreBuilder.swift:5-58)

The surrogate "weights" are seeded hash-derived Gaussians, plus a handful of
hand-set feature weights that make the model behave like a (weak) NER: spans
that are runs of capitalized words score above the 0.3 default threshold,
other spans below it. The oracle (raykg.oracle) uses this identical backend,
so the driver's P/R gate measures the ENGINE's plumbing (chunking, offsets,
merge, shuffle), which is what it can check without real weights.

An ONNX production backend would slot in behind the same interface
(``ScorerBackend``), import-guarded; it is intentionally not implemented in
this sandbox.
"""

from __future__ import annotations

import numpy as np

from ..config import PipelineConfig
from .tokenizer import SchemaEncoding, WordTokenizer, encode_schema, _h64

# feature slots occupy the LAST `N_FEAT` dims of the hidden space
N_FEAT = 6
_F_BIAS, _F_CAPALL, _F_CAPFRAC, _F_WIDTH_CAP, _F_WIDTH_MIX, _F_DIGIT = range(N_FEAT)

# label-side weights over the feature slots (the surrogate's "learned" head)
_LABEL_FEAT_W = np.array([-4.0, 5.5, 1.0, 2.5, -3.0, -1.5], dtype=np.float64)
_NOISE_SCALE = 0.7    # std of the label-discriminating hash-noise term in the logit


def _seeded_vec(key: bytes, seed: int, dim: int) -> np.ndarray:
    rng = np.random.default_rng(_h64(key, b"vec%d" % seed))
    return rng.standard_normal(dim)


class SurrogateBackend:
    """Deterministic numpy stand-in for the encoder + span/classifier heads.

    Stateful (embedding caches) → lives inside one actor, built once in
    ``__init__`` of the MentionScorer actor (never per batch)."""

    def __init__(self, config: PipelineConfig) -> None:
        self.config = config
        self.h = config.hidden
        self.core = self.h - N_FEAT
        self.seed = config.seed
        self.tokenizer = WordTokenizer(config.seed,
                                       vocab_dir=config.vocab_dir)
        import threading

        # (sorted id keys, aligned vectors) swapped as ONE tuple: callers
        # may share a backend across threads (the CLI bench's harness-parity
        # pool does) — readers snapshot the tuple, the writer swaps it under
        # a lock, so a gather never mixes two table generations
        self._emb_tab: tuple[np.ndarray, np.ndarray] = (
            np.empty(0, dtype=np.int64), np.empty((0, self.h - N_FEAT)))
        self._emb_lock = threading.Lock()
        self._label_emb: dict[str, np.ndarray] = {}
        self._feat_cache: dict[str, tuple[float, float]] = {}
        self._prefix_cache: dict[tuple, np.ndarray] = {}
        self._scale = 1.0 / np.sqrt(self.core)
        # A4 count head: fixed hash-seeded projection (built once per actor)
        rng = np.random.default_rng(_h64(b"count_head", b"ch%d" % self.seed))
        self._count_head = rng.standard_normal(
            (config.max_count + 1, self.core)) * 0.02
        self._count_memo: dict[int, int] = {}

    # -- A1: encoder ------------------------------------------------------
    def _embed_ids(self, ids: np.ndarray) -> np.ndarray:
        """Token ids → raw embeddings via a sorted-key gather table: the
        per-call work is one ``searchsorted`` + one row gather — the
        former per-token Python dict loop was the hot path of the whole
        extract stage. New ids (vocabulary saturates quickly) are seeded
        lazily; values are identical to the old per-id cache by
        construction (same ``_seeded_vec`` per id, gathered not recomputed)."""
        ids = np.asarray(ids, dtype=np.int64)
        keys, rows = self._emb_tab                 # one-generation snapshot
        if len(keys):
            pos = np.searchsorted(keys, ids)
            np.minimum(pos, len(keys) - 1, out=pos)
            miss = keys[pos] != ids
        else:
            pos = np.zeros(len(ids), dtype=np.int64)
            miss = np.ones(len(ids), dtype=bool)
        if miss.any():
            with self._emb_lock:
                keys, rows = self._emb_tab         # re-check under the lock
                if len(keys):
                    p2 = np.searchsorted(keys, ids)
                    np.minimum(p2, len(keys) - 1, out=p2)
                    still = ids[keys[p2] != ids]
                else:
                    still = ids
                new = np.unique(still)
                if len(new):
                    vecs = np.stack([_seeded_vec(int(t).to_bytes(4, "big"),
                                                 self.seed, self.core)
                                     for t in new])
                    keys = np.concatenate([keys, new])
                    rows = np.concatenate([rows, vecs]) if len(rows) else vecs
                    order = np.argsort(keys, kind="stable")
                    keys, rows = keys[order], rows[order]
                    self._emb_tab = (keys, rows)   # atomic tuple swap
            pos = np.searchsorted(keys, ids)
        return rows[pos]

    def encode(self, ids: np.ndarray) -> np.ndarray:
        """Token ids → contextualized hidden states (seq, core).

        Context mix = 0.6·self + 0.2·left + 0.2·right, a deterministic
        stand-in for the DeBERTa backbone (A1)."""
        e = self._embed_ids(ids)
        h = 0.6 * e
        h[1:] += 0.2 * e[:-1]
        h[:-1] += 0.2 * e[1:]
        return h

    # -- A7: projector ----------------------------------------------------
    def project(self, enc: SchemaEncoding, hidden: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """word embeddings (first subword) + prompt embeddings (mean range)."""
        word_embs = hidden[enc.word_first_subword] if len(enc.words) else \
            np.empty((0, self.core))
        prompt = np.empty((len(enc.prompt_ranges), self.core), dtype=np.float64)
        for i, (a, b) in enumerate(enc.prompt_ranges):
            prompt[i] = hidden[a:b].mean(axis=0) if b > a else 0.0
        return word_embs, prompt

    # -- fused A1+A7 with schema-prefix caching ---------------------------
    def forward(self, enc: SchemaEncoding) -> tuple[np.ndarray, np.ndarray]:
        """(word_embs, prompt_embs), numerically IDENTICAL to
        encode(full)+project but with the schema prefix computed once per
        label set: the ±1 context-mix window means (a) label-range hidden
        states never see text tokens — their mean (prompt embedding) is a
        pure function of the prefix — and (b) the text side only needs the
        raw embedding of [SEP_TEXT] as its left boundary. The prompt is
        identical for every row sharing a label set (SURVEY.md M6 note:
        GLiNERTokenizer.swift:286-293), so this cache hits on every doc of a
        pipeline batch after the first."""
        key = (tuple(enc.entity_labels), tuple(enc.prompt_kinds))
        cached = self._prefix_cache.get(key)
        if cached is None:
            prefix_hidden = self.encode(enc.input_ids[:enc.text_start])
            prompt = np.empty((len(enc.prompt_ranges), self.core))
            for i, (a, b) in enumerate(enc.prompt_ranges):
                # ranges end ≥2 positions before text_start → exact under
                # the truncated-prefix encode (right neighbor in prefix)
                prompt[i] = prefix_hidden[a:b].mean(axis=0) if b > a else 0.0
            cached = prompt
            self._prefix_cache[key] = cached
        if not enc.words:
            return np.empty((0, self.core)), cached
        text_ids = enc.input_ids[enc.text_start:]
        e = self._embed_ids(text_ids)
        h = 0.6 * e
        h[1:] += 0.2 * e[:-1]
        h[:-1] += 0.2 * e[1:]
        # left boundary: first text subword's left neighbor is [SEP_TEXT]
        h[0] += 0.2 * self._embed_ids(enc.input_ids[enc.text_start - 1:
                                                    enc.text_start])[0]
        word_embs = h[enc.word_first_subword - enc.text_start]
        return word_embs, cached

    # -- fused batched forward across documents ---------------------------
    def forward_batch(self, encs: list[SchemaEncoding]) \
            -> list[tuple[np.ndarray, np.ndarray]]:
        """``forward`` over MANY documents in one fused pass (VERDICT r4
        #3): all text ids concatenate into ONE embed gather and ONE
        context-mix, with the ±1 window corrected at segment boundaries by
        masked index adds — each output element sees the SAME operand
        values in the SAME order as the single-doc path, so results are
        bit-identical (pytest-pinned). Prompt embeddings ride the existing
        schema-prefix cache (shared label set ⇒ one entry)."""
        prompts: list[np.ndarray] = []
        segs: list[tuple[int, int]] = []       # (enc index, text offset)
        parts: list[np.ndarray] = []
        sep_ids: list[int] = []
        total = 0
        for i, enc in enumerate(encs):
            key = (tuple(enc.entity_labels), tuple(enc.prompt_kinds))
            cached = self._prefix_cache.get(key)
            if cached is None:
                prefix_hidden = self.encode(enc.input_ids[:enc.text_start])
                prompt = np.empty((len(enc.prompt_ranges), self.core))
                for j, (a, b) in enumerate(enc.prompt_ranges):
                    prompt[j] = prefix_hidden[a:b].mean(axis=0) if b > a else 0.0
                cached = prompt
                self._prefix_cache[key] = cached
            prompts.append(cached)
            if enc.words:
                text_ids = np.asarray(enc.input_ids[enc.text_start:])
                segs.append((i, total))
                parts.append(text_ids)
                sep_ids.append(int(enc.input_ids[enc.text_start - 1]))
                total += len(text_ids)
        out: list = [None] * len(encs)
        for i, enc in enumerate(encs):
            if not enc.words:
                out[i] = (np.empty((0, self.core)), prompts[i])
        if not segs:
            return out
        # doc-aligned internal chunking: a whole batch's fused (T, core)
        # intermediates can reach hundreds of MB and go page-fault-bound
        # under many parallel workers (the round-4 sketch lesson) — cap the
        # working set at ~8k tokens per fused pass (a few MB). Per-element
        # operations are unchanged, so results stay bit-identical.
        _CAP = 8192
        group: list[int] = []           # indices into segs/parts
        gtok = 0
        runs: list[list[int]] = []
        for j in range(len(segs)):
            if group and gtok + len(parts[j]) > _CAP:
                runs.append(group)
                group, gtok = [], 0
            group.append(j)
            gtok += len(parts[j])
        if group:
            runs.append(group)
        for run in runs:
            concat = np.concatenate([parts[j] for j in run])
            total = len(concat)
            e = self._embed_ids(concat)
            lens = np.array([len(parts[j]) for j in run], dtype=np.int64)
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            ends = np.cumsum(lens)
            h = 0.6 * e
            # left neighbor for every non-start position (same add the
            # single path's h[1:] += 0.2*e[:-1], skipped across boundaries)
            nonstart = np.ones(total, dtype=bool)
            nonstart[starts] = False
            idx = np.flatnonzero(nonstart)
            h[idx] += 0.2 * e[idx - 1]
            # right neighbor for every non-end position
            nonend = np.ones(total, dtype=bool)
            nonend[ends - 1] = False
            idx = np.flatnonzero(nonend)
            h[idx] += 0.2 * e[idx + 1]
            # left boundary: first text subword's left neighbor is
            # [SEP_TEXT] (added LAST, matching the single path's order)
            h[starts] += 0.2 * self._embed_ids(
                np.asarray([sep_ids[j] for j in run]))
            for local, j in enumerate(run):
                i, _ = segs[j]
                enc = encs[i]
                word_embs = h[int(starts[local])
                              + (enc.word_first_subword - enc.text_start)]
                out[i] = (word_embs, prompts[i])
        return out

    # -- label embeddings (A9 cache analogue) -----------------------------
    def label_embedding(self, label: str) -> np.ndarray:
        v = self._label_emb.get(label)
        if v is None:
            core = _seeded_vec(label.encode("utf-8"), self.seed, self.core)
            core /= np.linalg.norm(core)
            # span core is unit-norm; dot of two unit vectors has std
            # ≈ 1/sqrt(core_dim) — rescale so the label-noise term has std
            # ≈ _NOISE_SCALE in the final logit
            v = np.concatenate([core * (_NOISE_SCALE * np.sqrt(self.core)), _LABEL_FEAT_W])
            self._label_emb[label] = v
        return v

    # -- word surface features -------------------------------------------
    def _word_feats(self, words: list[str]) -> np.ndarray:
        """(n_words, 2): [is_capitalized_alpha, has_digit] per ORIGINAL word.

        Capitalization is read from the original surface — the reference
        lowercases words only for subword tokenization and slices surfaces
        from the original text (GLiNERTokenizer.swift:306,
        SpanDecoder.swift:54-60). Per-word results are memoized (surfaces
        follow a Zipf law; the cache hit rate is near 1)."""
        cache = self._feat_cache
        n = len(words)
        f = np.empty((n, 2), dtype=np.float64)
        for i, w in enumerate(words):
            got = cache.get(w)
            if got is None:
                c0 = w[0] if w else ""
                got = (1.0 if (c0.isupper() and w.isalnum()) else 0.0,
                       1.0 if any(ch.isdigit() for ch in w) else 0.0)
                cache[w] = got
            f[i, 0] = got[0]
            f[i, 1] = got[1]
        return f

    # -- A2: span representation -----------------------------------------
    def span_embeddings(self, enc: SchemaEncoding, word_embs: np.ndarray) -> np.ndarray:
        """(n_spans, h): core = mean(start_emb, end_emb)·scale·unit-ish,
        features = [bias, cap_all, cap_frac, width·cap_all, width·(1-cap_all),
        digit_frac]."""
        ss, ww = enc.span_starts, enc.span_widths
        ee = ss + ww
        n = len(ss)
        out = np.empty((n, self.h), dtype=np.float64)
        core = 0.5 * (word_embs[ss] + word_embs[ee])
        norms = np.linalg.norm(core, axis=1, keepdims=True)
        np.maximum(norms, 1e-9, out=norms)
        out[:, : self.core] = core / norms

        wf = self._word_feats(enc.words)
        cap_cum = np.concatenate([[0.0], np.cumsum(wf[:, 0])])
        dig_cum = np.concatenate([[0.0], np.cumsum(wf[:, 1])])
        lens = (ww + 1).astype(np.float64)
        cap_frac = (cap_cum[ee + 1] - cap_cum[ss]) / lens
        dig_frac = (dig_cum[ee + 1] - dig_cum[ss]) / lens
        cap_all = (cap_frac >= 1.0 - 1e-12).astype(np.float64)
        wnorm = ww / max(1, self.config.max_span_width - 1)
        out[:, self.core + _F_BIAS] = 1.0
        out[:, self.core + _F_CAPALL] = cap_all
        out[:, self.core + _F_CAPFRAC] = cap_frac
        out[:, self.core + _F_WIDTH_CAP] = wnorm * cap_all
        out[:, self.core + _F_WIDTH_MIX] = wnorm * (1.0 - cap_all)
        out[:, self.core + _F_DIGIT] = dig_frac
        return out

    # -- A4: count predictor ---------------------------------------------
    @staticmethod
    def argmax_count(logits: np.ndarray, max_count: int) -> int:
        """Reference-exact count decode (GLiNER2SpanPipeline.swift:174-198):
        argmax with FIRST-max tie-break (strict ``>`` scan), clamped to
        ``min(idx, maxCount)``; empty logits → 0."""
        if logits is None or len(logits) == 0:
            return 0
        best_idx, best = 0, logits[0]
        for i in range(1, len(logits)):
            if logits[i] > best:
                best = logits[i]
                best_idx = i
        return min(best_idx, max_count)

    def count_logits(self, prompt_embs: np.ndarray, n_words: int) -> np.ndarray:
        """Surrogate count head (GLiNER2CountPredictorModel.swift:18-51
        analogue): a fixed hash-seeded linear head over the mean prompt
        embedding → (max_count+1,) logits. Empty text yields an empty logits
        vector (→ predictedCount 0 → decode returns [], the
        GLiNERModel.swift:424 gate). A monotone +1.0/level bias dominates
        the small projection noise, so the surrogate's argmax sits at
        max_count for any non-empty prompt — the same effective behavior the
        engine always had, now produced by the real logits→argmax→clamp
        mechanism."""
        if n_words == 0 or len(prompt_embs) == 0:
            return np.empty(0)
        n_levels = self.config.max_count + 1
        w = self._count_head  # (n_levels, hidden), entries in ±0.02
        mean = prompt_embs.mean(axis=0)
        mean = mean / max(1e-9, np.linalg.norm(mean))
        return w @ mean + np.arange(n_levels, dtype=np.float64)

    def predict_count(self, prompt_embs: np.ndarray, n_words: int) -> int:
        """A4: count logits → argmax → clamp (GLiNER2SpanPipeline.swift:117,
        173-198)."""
        return self.argmax_count(self.count_logits(prompt_embs, n_words),
                                 self.config.max_count)

    def _predict_count_cached(self, prompt_embs: np.ndarray,
                              n_words: int) -> int:
        """predict_count memoized on the CONTENT of the prompt embeddings —
        documents sharing a label set share the schema prefix (and its
        cached hidden states), so the count head's input repeats constantly;
        keying on the bytes keeps the memo exact even if it didn't."""
        if n_words == 0 or len(prompt_embs) == 0:
            return 0
        key = _h64(prompt_embs.tobytes(), b"cnt")
        got = self._count_memo.get(key)
        if got is None:
            got = self.predict_count(prompt_embs, n_words)
            if len(self._count_memo) < 4096:
                self._count_memo[key] = got
        return got

    # -- A5: count-embed head (structure embeddings) ---------------------
    def structure_embeddings(self, label_embs: np.ndarray,
                             predicted_count: int) -> np.ndarray:
        """A5 (GLiNER2CountEmbedModel.swift:32-60 +
        GLiNER2SpanPipeline.swift:118-123): per-instance projections of the
        label embeddings, prefix-TRIMMED to ``predictedCount`` (0 → empty).
        Instance 0 — the only instance the span scorer consumes
        (GLiNER2SpanScoreBuilder.swift:11-22) — is the identity projection,
        so D1's scores are exactly the label-embedding dots; later instances
        are deterministically phase-rotated placeholders (the real model's
        extra instances are likewise unused by the entity path)."""
        if predicted_count <= 0 or len(label_embs) == 0:
            return np.empty((0, *label_embs.shape))
        n = min(predicted_count, self.config.max_count)
        out = np.empty((n, *label_embs.shape))
        out[0] = label_embs
        for c in range(1, n):
            out[c] = np.roll(label_embs, c, axis=1) * (1.0 - 0.01 * c)
        return out

    # -- D1: span-score builder ------------------------------------------
    _NOISE_CLIP = 2.5     # hash-noise term clipped to ±2.5 → a span with no
                          # capitalized word has logit ≤ -4 + 2.5 = -1.5,
                          # i.e. sigmoid ≤ 0.18: provably below any
                          # threshold ≥ 0.2, enabling the prefilter below

    def span_scores(self, enc: SchemaEncoding,
                    threshold: float | None = None) -> tuple[np.ndarray, SchemaEncoding]:
        """Full per-document forward pass → logits (n_spans, n_labels).

        When ``threshold ≥ 0.2`` the candidate set is PRE-FILTERED to spans
        containing at least one capitalized word: with the clipped noise
        term, zero-cap spans are mathematically incapable of reaching the
        threshold, so skipping their embeddings changes nothing in the
        decoded output while cutting the span-embedding work to the
        capitalized fraction. (Both the engine and the oracle run this exact
        code, so the equivalence is also enforced by the parity gates.)"""
        word_embs, prompt_embs = self.forward(enc)
        return self._span_scores_post(enc, word_embs, prompt_embs, threshold)

    def span_scores_batch(self, encs: list[SchemaEncoding],
                          threshold: float | None = None) -> list:
        """``span_scores`` over many documents: ONE fused forward
        (``forward_batch``) then the per-doc span scoring tail —
        bit-identical results to per-doc ``span_scores`` (pytest-pinned)."""
        fwd = self.forward_batch(encs)
        return [self._span_scores_post(enc, w, p, threshold)
                for enc, (w, p) in zip(encs, fwd)]

    def _span_scores_post(self, enc: SchemaEncoding, word_embs: np.ndarray,
                          prompt_embs: np.ndarray,
                          threshold: float | None) -> tuple[np.ndarray, SchemaEncoding]:
        n_labels = len(enc.entity_labels)
        predicted_count = self._predict_count_cached(prompt_embs,
                                                     len(enc.words))
        if predicted_count == 0:
            # predictedCount==0 → no spans (GLiNERModel.swift:424)
            return np.empty((0, n_labels)), enc
        n_spans = len(enc.span_starts)
        # A5: the span scorer consumes structure-embedding INSTANCE 0 only
        # (GLiNER2SpanScoreBuilder.swift:15-22), whose surrogate projection
        # is the identity — so score against the label embeddings directly
        # instead of materializing all predictedCount instances per doc
        # (structure_embeddings stays the full A5 surface for callers that
        # need the trimmed stack; allocating it here cost 14% of the span
        # pass for rows nothing reads)
        labels = np.stack([self.label_embedding(l) for l in enc.entity_labels])

        keep = None
        if threshold is not None and threshold >= 0.2 and n_spans:
            wf = self._word_feats(enc.words)[:, 0]
            cap_cum = np.concatenate([[0.0], np.cumsum(wf)])
            ss, ww = enc.span_starts, enc.span_widths
            keep = (cap_cum[ss + ww + 1] - cap_cum[ss]) > 0
            if not keep.any():
                return np.full((n_spans, n_labels), -10.0), enc

        if keep is None:
            span_embs = self.span_embeddings(enc, word_embs)
            logits = self._dot_clipped(span_embs, labels)   # D1 dot (noise clipped)
        else:
            sub = SchemaEncoding(
                input_ids=enc.input_ids, prompt_ranges=enc.prompt_ranges,
                prompt_kinds=enc.prompt_kinds, entity_labels=enc.entity_labels,
                word_first_subword=enc.word_first_subword, words=enc.words,
                word_starts=enc.word_starts, word_ends=enc.word_ends,
                span_starts=enc.span_starts[keep],
                span_widths=enc.span_widths[keep])
            span_embs = self.span_embeddings(sub, word_embs)
            sub_logits = self._dot_clipped(span_embs, labels)
            logits = np.full((n_spans, n_labels), -10.0)
            logits[keep] = sub_logits
        return logits, enc

    def _dot_clipped(self, span_embs: np.ndarray, labels: np.ndarray) -> np.ndarray:
        """D1 dot product with the hash-noise (core) contribution clipped to
        ±_NOISE_CLIP — the bound that makes the prefilter exact."""
        core = span_embs[:, : self.core] @ labels[:, : self.core].T
        feat = span_embs[:, self.core:] @ labels[:, self.core:].T
        return np.clip(core, -self._NOISE_CLIP, self._NOISE_CLIP) + feat

    # -- A3 + M13: classification ----------------------------------------
    def classify_logits(self, text: str, labels: list[str]) -> np.ndarray:
        """Raw classification logits for one (text, labels) task — the
        engine output the schema_extract oracle dumps; sigmoid/softmax +
        threshold + ordering are re-derived relationally in SQL. Empty
        text → empty logits (→ classify returns [])."""
        enc = encode_schema(text, labels, self.tokenizer,
                            self.config.max_span_width, kinds=["C"] * len(labels))
        word_embs, prompt_embs = self.forward(enc)
        if len(enc.words) == 0:
            return np.empty(0)
        text_repr = word_embs.mean(axis=0)
        text_repr /= max(1e-9, np.linalg.norm(text_repr))
        sims = prompt_embs @ text_repr / np.sqrt(self.core)
        return sims * 4.0

    def classify(self, text: str, labels: list[str], multi_label: bool,
                 threshold: float) -> list[tuple[str, float]]:
        """Text-level classification. Labels ride the schema prompt with the
        [C] marker (GLiNERModel.swift:207-245); logits over prompt embeddings
        vs the mean word embedding; sigmoid each (multi-label) or stable
        softmax; keep ≥ threshold; sort score desc (GLiNERModel.swift:247-302)."""
        logits = self.classify_logits(text, labels)
        if len(logits) == 0:
            return []
        if multi_label:
            scores = 1.0 / (1.0 + np.exp(-logits))
        else:
            z = logits - logits.max()
            ez = np.exp(z)
            scores = ez / ez.sum()
        pairs = [(l, float(s)) for l, s in zip(labels, scores) if s >= threshold]
        pairs.sort(key=lambda p: (-p[1], p[0]))
        return pairs
