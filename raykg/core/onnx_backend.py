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
layout, and head→output dataflow are real code, exercised by tests up to
the session boundary.

Session-per-head layout (once per actor — the Ray analogue of
GLiNERModel.init loading five Core ML models once):
  encoder          input_ids[1,S], attention_mask[1,S] → hidden[1,S,H]
  span_rep         token_embeddings[1,S,H], span_idx[1,S*W,2] → span[1,S,W,H]
  classifier       schema_embeddings[1,P,H] → logits[1,P]
  count_predictor  prompt_embeddings[P,H] → count_logits[C+1]
  count_embed      label_embeddings[L,H] → structure[maxCount,L,H]
These mirror the Core ML feature names in the reference wrappers
(GLiNER2SpanRepresentationModel / GLiNER2ClassificationModel /
GLiNER2CountPredictorModel / GLiNER2CountEmbedModel).
"""

from __future__ import annotations

import numpy as np

from .manifest import ModelManifest
from .tokenizer import SchemaEncoding, WordTokenizer

try:
    import onnxruntime as _ort
except ImportError:          # sandbox: no onnxruntime wheel baked in
    _ort = None


class OnnxBackend:
    """Real-model backend: five ONNX sessions + the HF tokenizer.json vocab.

    Construct once per actor (``MentionExtractor`` with
    ``backend_factory=OnnxBackend`` semantics); batched inference per
    ``__call__`` through the same span_scores surface the surrogate has."""

    def __init__(self, manifest_path: str, seed: int = 0,
                 providers: list[str] | None = None) -> None:
        if _ort is None:
            raise ImportError(
                "onnxruntime is not available in this environment; the "
                "OnnxBackend is the production slot — use SurrogateBackend "
                "(default) for deterministic in-sandbox runs")
        self.manifest = ModelManifest.load(manifest_path)
        self.tokenizer = WordTokenizer(seed,
                                       vocab_dir=self.manifest.tokenizer_dir)
        if self.tokenizer.vocab is None:
            raise ValueError("OnnxBackend requires a real tokenizer.json "
                             f"under {self.manifest.tokenizer_dir}")
        opts = _ort.SessionOptions()
        opts.graph_optimization_level = \
            _ort.GraphOptimizationLevel.ORT_ENABLE_ALL
        prov = providers or ["CPUExecutionProvider"]
        self.sessions = {
            name: _ort.InferenceSession(path, opts, providers=prov)
            for name, path in self.manifest.artifacts.items()
        }

    # -- the ScorerBackend surface ----------------------------------------
    def forward(self, enc: SchemaEncoding) -> tuple[np.ndarray, np.ndarray]:
        ids = enc.input_ids[None, :].astype(np.int64)
        mask = np.ones_like(ids)
        (hidden,) = self.sessions["encoder"].run(
            None, {"input_ids": ids, "attention_mask": mask})
        hidden = hidden[0]                       # (S, H)
        word_embs = hidden[enc.word_first_subword]
        prompts = np.stack([
            hidden[a:b].mean(axis=0) if b > a
            else np.zeros(self.manifest.hidden_size)
            for a, b in enc.prompt_ranges])
        return word_embs, prompts

    def span_scores(self, enc: SchemaEncoding,
                    threshold: float | None = None):
        word_embs, prompt_embs = self.forward(enc)
        (count_logits,) = self.sessions["count_predictor"].run(
            None, {"prompt_embeddings": prompt_embs.astype(np.float32)})
        from .scorer import SurrogateBackend

        predicted = SurrogateBackend.argmax_count(
            np.asarray(count_logits).ravel(), self.manifest.max_count)
        n_labels = len(enc.entity_labels)
        if predicted == 0 or len(enc.words) == 0:
            return np.empty((0, n_labels)), enc
        (structure,) = self.sessions["count_embed"].run(
            None, {"label_embeddings": prompt_embs.astype(np.float32)})
        labels = np.asarray(structure)[0]        # instance 0 feeds D1
        span_idx = np.stack([enc.span_starts,
                             enc.span_starts + enc.span_widths], axis=1)
        (span_embs,) = self.sessions["span_rep"].run(
            None, {"token_embeddings":
                   word_embs[None].astype(np.float32),
                   "span_idx": span_idx[None].astype(np.int64)})
        flat = np.asarray(span_embs).reshape(-1, labels.shape[-1])
        flat = flat[: len(enc.span_starts)]
        return flat @ np.asarray(labels).T, enc
