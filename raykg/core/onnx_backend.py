"""ONNX production scorer backend — the pluggable real-model slot.

The reference's architecture is "pluggable real models behind one runtime"
(GLiNERManifest.swift:56-89 + the five model-head wrappers under
Sources/GLiNERSwift/Models/). This module is the raykg analogue for
deployments that HAVE onnxruntime and exported heads: it implements the
same scoring interface as ``SurrogateBackend`` (raykg.core.scorer) so
``MentionExtractor`` swaps backends via config without touching any
pipeline code.

Import-guarded: onnxruntime does not exist in this sandbox, so constructing
the backend here raises a clear error; the manifest parsing, session
layout, and head→output dataflow are real code, exercised end-to-end by a
mocked-``InferenceSession`` pytest (tests/test_core.py).

Session-per-head layout (once per actor — the Ray analogue of
GLiNERModel.init loading five Core ML models once):
  encoder          input_ids[1,S], attention_mask[1,S] → hidden[1,S,H]
  span_rep         token_embeddings[1,S,H], span_idx[1,S*W,2] → the FULL
                   (S, W) span grid [1,S,W,H] — one row per (word, width)
                   pair exactly as supplied (GLiNER2SpanPipeline.swift:
                   103-113 pads spanIndices to S*W and trims the output
                   back to the word count); valid plan entries are gathered
                   AFTER the reshape, so a head that really emits the grid
                   and one that emits only masked rows can't be confused.
  classifier       schema_embeddings[1,P,H] → logits[1,P]
  count_predictor  prompt_embeddings[1,H] → count_logits[C+1]
                   (fed the [P] marker embedding ONLY,
                   GLiNER2SpanPipeline.swift:115)
  count_embed      label_embeddings[L,H] → structure[maxCount,L,H], prefix-
                   trimmed to predictedCount (GLiNER2SpanPipeline.swift:
                   117-123); instance 0 feeds the span-score dot (D1).
These mirror the Core ML feature names in the reference wrappers
(GLiNER2SpanRepresentationModel / GLiNER2ClassifierModel /
GLiNER2CountPredictorModel / GLiNER2CountEmbedModel).
"""

from __future__ import annotations

import numpy as np

from .manifest import ModelManifest
from .tokenizer import SchemaEncoding, WordTokenizer, encode_schema

try:
    import onnxruntime as _ort
except ImportError:          # sandbox: no onnxruntime wheel baked in
    _ort = None


class OnnxBackend:
    """Real-model backend: five ONNX sessions + the HF tokenizer.json vocab.

    Construct once per actor (``MentionExtractor`` with
    ``backend_factory=OnnxBackend`` semantics); batched inference per
    ``__call__`` through the same span_scores/classify surface the
    surrogate has."""

    def __init__(self, manifest_path: str, seed: int = 0,
                 providers: list[str] | None = None,
                 session_factory=None, max_span_width: int | None = None) -> None:
        """``session_factory(path)`` overrides onnxruntime session creation —
        the mocked-session test hook; production leaves it None."""
        self.manifest = ModelManifest.load(manifest_path)
        if session_factory is None and _ort is None:
            raise ImportError(
                "onnxruntime is not available in this environment; the "
                "OnnxBackend is the production slot — use SurrogateBackend "
                "(default) for deterministic in-sandbox runs")
        self.tokenizer = WordTokenizer(seed,
                                       vocab_dir=self.manifest.tokenizer_dir)
        if self.tokenizer.vocab is None:
            raise ValueError("OnnxBackend requires a real tokenizer.json "
                             f"under {self.manifest.tokenizer_dir}")
        self.max_span_width = max_span_width or self.manifest.max_width
        if session_factory is None:
            opts = _ort.SessionOptions()
            opts.graph_optimization_level = \
                _ort.GraphOptimizationLevel.ORT_ENABLE_ALL
            prov = providers or ["CPUExecutionProvider"]

            def session_factory(path):
                return _ort.InferenceSession(path, opts, providers=prov)
        self.sessions = {
            name: session_factory(path)
            for name, path in self.manifest.artifacts.items()
        }

    # -- the ScorerBackend surface ----------------------------------------
    def forward(self, enc: SchemaEncoding) -> tuple[np.ndarray, np.ndarray]:
        """Encoder pass → (word_embs, per-label prompt embeddings).

        Word embedding = hidden state at the word's FIRST subword; prompt
        embedding = MEAN of the label's subword range
        (GLiNER2SchemaProjector.swift:44-95)."""
        hidden = self._encode(enc)
        word_embs = hidden[enc.word_first_subword]
        prompts = self._prompt_embs(hidden, enc) if enc.prompt_ranges else \
            np.empty((0, self.manifest.hidden_size))
        return word_embs, prompts

    def _encode(self, enc: SchemaEncoding) -> np.ndarray:
        return self._encode_batch([enc])[0]      # (S, H)

    def _encode_batch(self, encs: list[SchemaEncoding]) -> list[np.ndarray]:
        """ONE padded (B, S) encoder session call for a whole batch — the
        reference's own TODO (GLiNER2.swift:178-179) and SURVEY §7.4's
        promise. Sequences pad to the batch max with the vocab [PAD] id and
        a zeroed attention mask; per-doc hidden states slice back to their
        true lengths, so downstream heads never see pad positions."""
        pad = self.tokenizer.sp.pad
        s_max = max(len(e.input_ids) for e in encs)
        ids = np.full((len(encs), s_max), pad, dtype=np.int64)
        mask = np.zeros((len(encs), s_max), dtype=np.int64)
        for i, e in enumerate(encs):
            ids[i, :len(e.input_ids)] = e.input_ids
            mask[i, :len(e.input_ids)] = 1
        (hidden,) = self.sessions["encoder"].run(
            None, {"input_ids": ids, "attention_mask": mask})
        hidden = np.asarray(hidden)
        return [hidden[i, :len(e.input_ids)] for i, e in enumerate(encs)]

    def _p_embedding(self, hidden: np.ndarray) -> np.ndarray:
        """[P] marker embedding — the count predictor's ONLY input
        (GLiNER2SpanPipeline.swift:79-81,115). encode_schema always emits
        the [P] marker at position 1 ([CLS] [P] entities ( …)."""
        return hidden[1]

    def _prompt_embs(self, hidden: np.ndarray, enc: SchemaEncoding) -> np.ndarray:
        """Mean over each label's subword range, with the same empty-range
        zeros fallback as ``forward`` — a label whose pieces vanish must
        yield zeros, not a NaN row that silently poisons every score."""
        return np.stack([
            hidden[a:b].mean(axis=0) if b > a
            else np.zeros(self.manifest.hidden_size, dtype=hidden.dtype)
            for a, b in enc.prompt_ranges])

    def span_scores(self, enc: SchemaEncoding,
                    threshold: float | None = None):
        return self.span_scores_batch([enc], threshold)[0]

    def span_scores_batch(self, encs: list[SchemaEncoding],
                          threshold: float | None = None):
        """True batched (B, S) inference — VERDICT r3 #4 / the reference's
        own TODO (GLiNER2.swift:178-179): ONE padded encoder call, ONE
        (B, H) count-predictor call, and ONE padded span_rep call per
        BATCH, not per document. ``count_embed`` stays per-doc: its
        label_embeddings input is traced without a batch dimension and the
        label count varies per schema. The padding/slicing DATAFLOW is
        element-wise identical to the single-doc path (pytest-pinned with
        mocked sessions); a REAL ONNX encoder under padded batching may
        differ at float-ulp level (or more if an exported op is not
        mask-aware) — before wiring multi-doc batches into a production
        scorer, add an ``np.allclose`` integration check against B=1 on
        the actual model (ADVICE r4)."""
        if not encs:
            return []
        for enc in encs:
            if len(enc.span_widths) and \
                    int(np.max(enc.span_widths)) >= self.max_span_width:
                raise ValueError(
                    f"encoding uses span widths up to "
                    f"{int(np.max(enc.span_widths)) + 1} but the manifest's "
                    f"span_rep head was traced with max_width "
                    f"{self.max_span_width} — encode with the manifest's "
                    "width")
        hiddens = self._encode_batch(encs)
        p_embs = np.stack([self._p_embedding(h) for h in hiddens])
        (count_logits,) = self.sessions["count_predictor"].run(
            None, {"prompt_embeddings": p_embs.astype(np.float32)})
        count_logits = np.asarray(count_logits).reshape(len(encs), -1)
        from .scorer import SurrogateBackend

        predicted = [SurrogateBackend.argmax_count(row,
                                                   self.manifest.max_count)
                     for row in count_logits]
        results: list = [None] * len(encs)
        active = []
        for i, enc in enumerate(encs):
            if predicted[i] == 0 or len(enc.words) == 0:
                results[i] = (np.empty((0, len(enc.entity_labels))), enc)
            else:
                active.append(i)
        if not active:
            return results
        # full (S, W) grid span_idx per doc — ends clamped to the doc's
        # last word, padded to the batch word max (pad rows index word 0;
        # never read, the gather below uses each doc's VALID span plan)
        w_max = self.max_span_width
        h_dim = hiddens[active[0]].shape[1]
        sw_max = max(len(encs[i].words) for i in active)
        tok = np.zeros((len(active), sw_max, h_dim), dtype=np.float32)
        idx = np.zeros((len(active), sw_max * w_max, 2), dtype=np.int64)
        for j, i in enumerate(active):
            enc = encs[i]
            s_words = len(enc.words)
            tok[j, :s_words] = hiddens[i][enc.word_first_subword]
            grid_start = np.repeat(np.arange(s_words, dtype=np.int64), w_max)
            grid_end = np.minimum(
                grid_start + np.tile(np.arange(w_max, dtype=np.int64),
                                     s_words), s_words - 1)
            idx[j, :s_words * w_max] = np.stack([grid_start, grid_end],
                                                axis=1)
        (span_embs,) = self.sessions["span_rep"].run(
            None, {"token_embeddings": tok, "span_idx": idx})
        span_embs = np.asarray(span_embs)
        for j, i in enumerate(active):
            enc = encs[i]
            prompt_embs = self._prompt_embs(hiddens[i], enc)
            (structure,) = self.sessions["count_embed"].run(
                None, {"label_embeddings": prompt_embs.astype(np.float32)})
            # prefix-trim to predictedCount (GLiNER2SpanPipeline.swift:
            # 117-123); instance 0 is what the span scorer consumes
            structure = np.asarray(structure)[:predicted[i]]
            labels = structure[0]                # (L, H)
            grid = span_embs[j].reshape(sw_max, w_max, -1)     # (S, W, H)
            flat = grid[enc.span_starts, enc.span_widths]      # (n_spans, H)
            results[i] = (flat @ np.asarray(labels).T, enc)
        return results

    # -- A3 + M13: classification ----------------------------------------
    def classify(self, text: str, labels: list[str], multi_label: bool = False,
                 threshold: float = 0.5) -> list[tuple[str, float]]:
        """Text-level classification through the classifier head. Labels
        ride the schema prompt with the [C] marker (GLiNERModel.swift:
        207-245); the head consumes the schema prompt embeddings and emits
        one logit per prompt; M13 post-processing — sigmoid each
        (multi-label) or max-stabilized softmax, keep ≥ threshold, sort
        score desc (GLiNERModel.swift:247-302)."""
        if not labels:
            return []
        enc = encode_schema(text, labels, self.tokenizer,
                            self.max_span_width, kinds=["C"] * len(labels))
        hidden = self._encode(enc)
        prompt_embs = self._prompt_embs(hidden, enc)
        (logits,) = self.sessions["classifier"].run(
            None, {"schema_embeddings": prompt_embs[None].astype(np.float32)})
        logits = np.asarray(logits).ravel()[: len(labels)].astype(np.float64)
        if multi_label:
            scores = 1.0 / (1.0 + np.exp(-logits))
        else:
            z = logits - logits.max()
            ez = np.exp(z)
            scores = ez / ez.sum()
        pairs = [(l, float(s)) for l, s in zip(labels, scores)
                 if s >= threshold]
        pairs.sort(key=lambda p: (-p[1], p[0]))
        return pairs
