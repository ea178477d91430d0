"""Legacy GLiNER1 path: prompted encode (M5) + BiLSTM/FFN span scorer (A8).

The reference keeps a full v1 pipeline alongside the GLiNER2 schema path:

- **M5 prompted encode** (GLiNERTokenizer.swift:151-265): sequence
  ``[CLS] <<ENT>> label₁-pieces <<ENT>> label₂-pieces … <<SEP>> text-word
  pieces [SEP]``; ``word_mask`` holds ``wordIndex+1`` at the FIRST subword
  of each text word and 0 elsewhere; ``class_positions`` are the token
  positions of every ``<<ENT>>``; labels are tokenized as-is (the v1 path
  does NOT lowercase, unlike GLiNER2's schema encode at :306); empty labels
  short-circuit to ``[CLS][SEP]`` (:152-161).
- **A8 span scorer** (SpanScorer.swift:17-105): prompt embedding = hidden
  state AT each class-token position (:59-70, not a mean); word embedding =
  hidden state at the first subword via word_mask (:73-88); span inputs
  enumerate (start, width) with an end<wordCount mask (:90-105).
- **BiLSTM** (BiLSTM.swift:24-110): single-layer bidirectional LSTM, gate
  order i,f,g,o (sigmoid, sigmoid, tanh, sigmoid), forward/backward hidden
  states CONCATENATED per step (the `+` at BiLSTM.swift:118 is array
  concat).
- **FFN projections** (LinearLayer.swift: Linear → ReLU → Linear;
  SpanHeadResources.swift:32-35: project_start / project_end / out_project
  / prompt_projection).
- **Greedy decode** (SpanDecoder.swift:11-90): sigmoid ≥ threshold →
  candidates sorted score-desc → keep unless word-overlap with a kept span.

No v1 weights exist in the sandbox (the reference generates them locally),
so the layers carry seeded hash-derived surrogate weights plus the same
capitalized-run feature nudge the GLiNER2 surrogate uses — detections are
qualitatively NER-like and fully deterministic; the layer STRUCTURE and
dataflow are the reference's.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..config import DEFAULT_CONFIG, PipelineConfig
from .decode import Mention
from .tokenizer import (ENT_ID as ENT_TOKEN_ID, SEPT_ID as SEPT_TOKEN_ID,
                        WordTokenizer, _h64)
from .wordsplit import split_words

# <<ENT>>/<<SEP>> constants above are the SYNTHETIC-vocab ids (reserved range
# 0..31); with a real vocab the encoders read tok.sp, whose ids come from the
# vocabulary / manifest registration (GLiNERTokenizer.swift:458-460).


@dataclass
class PromptEncoding:
    """Mirror of the reference PromptEncoding (GLiNERTokenizer.swift:259-266)."""

    input_ids: np.ndarray                 # (seq,) int32
    attention_mask: np.ndarray            # (seq,) int32 — all 1 unless padded
    word_mask: np.ndarray                 # (seq,) int32 — wordIndex+1 at first subword
    class_positions: list[int]            # positions of <<ENT>> tokens
    words: list[str]                      # text word surfaces
    word_starts: np.ndarray               # char offsets
    word_ends: np.ndarray
    text_word_count: int = field(default=0)


def encode_plain(text: str, tok: WordTokenizer, max_length: int = 384,
                 pad_to_max: bool = False) -> tuple[list[int], list[int]]:
    """M4 plain encode (GLiNERTokenizer.swift:97-148):
    ``[CLS] + pieces(text, truncated to maxLength-2) + [SEP]``, attention
    mask 1 for content, optional pad-to-max with ``[PAD]``/mask 0. The
    whole text is tokenized as ONE string (not per word — that is M5/M6's
    job). Returns (input_ids, attention_mask)."""
    if tok.vocab is not None:
        from .tokenizer import normalize

        pieces, _ = tok.vocab.tokenize_normalized(normalize(text))
        cls_id, sep_id, pad_id = (tok.vocab.cls_id, tok.vocab.sep_id,
                                  tok.vocab.pad_id)
    else:
        from .tokenizer import viterbi_tokenize

        pieces = viterbi_tokenize(text, tok.seed) if text else []
        cls_id, sep_id, pad_id = tok.sp.cls, tok.sp.sep, tok.sp.pad
    content = pieces[: max(0, max_length - 2)]
    ids = [cls_id, *content, sep_id]
    mask = [1] * len(ids)
    if len(ids) > max_length:             # degenerate maxLength < 2
        ids = ids[:max_length]
        mask = mask[:max_length]
    elif pad_to_max and len(ids) < max_length:
        pad = max_length - len(ids)
        ids.extend([pad_id] * pad)
        mask.extend([0] * pad)
    return ids, mask


def encode_prompted(text: str, labels: list[str],
                    tok: WordTokenizer) -> PromptEncoding:
    """M5 (GLiNERTokenizer.swift:151-265)."""
    sp = tok.sp          # vocab-resolved special ids (ADVICE r2: real vocabs
    #                      must emit THEIR [CLS]/<<ENT>>/<<SEP>> ids)
    if not labels:
        return PromptEncoding(
            input_ids=np.array([sp.cls, sp.sep], dtype=np.int32),
            attention_mask=np.array([1, 1], dtype=np.int32),
            word_mask=np.array([0, 0], dtype=np.int32),
            class_positions=[], words=[],
            word_starts=np.empty(0, dtype=np.int64),
            word_ends=np.empty(0, dtype=np.int64), text_word_count=0)
    ids: list[int] = [sp.cls]
    word_mask: list[int] = [0]
    class_positions: list[int] = []
    ent_id, sept_id = sp.require("ent"), sp.require("sept")
    for label in labels:
        class_positions.append(len(ids))
        ids.append(ent_id)
        word_mask.append(0)
        for pid in tok.ids(label):           # labels NOT lowercased on v1
            ids.append(pid)
            word_mask.append(0)
    ids.append(sept_id)
    word_mask.append(0)
    word_tuples = split_words(text)
    words = [w for w, _, _ in word_tuples]
    starts = np.fromiter((s for _, s, _ in word_tuples), dtype=np.int64,
                         count=len(word_tuples))
    ends = np.fromiter((e for _, _, e in word_tuples), dtype=np.int64,
                       count=len(word_tuples))
    for wi, w in enumerate(words):
        pieces = tok.ids(w)                  # v1 keeps original case
        for k, pid in enumerate(pieces):
            ids.append(pid)
            word_mask.append(wi + 1 if k == 0 else 0)
    ids.append(sp.sep)
    word_mask.append(0)
    return PromptEncoding(
        input_ids=np.asarray(ids, dtype=np.int32),
        attention_mask=np.ones(len(ids), dtype=np.int32),
        word_mask=np.asarray(word_mask, dtype=np.int32),
        class_positions=class_positions,
        words=words, word_starts=starts, word_ends=ends,
        text_word_count=len(words))


class BiLSTM:
    """Reference-exact single-layer BiLSTM (BiLSTM.swift:24-110), numpy.

    Gate layout in the fused (4H,) vector: [input, forget, cell, output]
    (BiLSTM.swift:63-70); fwd/bwd outputs are CONCATENATED per step."""

    def __init__(self, w_ih_f: np.ndarray, w_hh_f: np.ndarray, b_f: np.ndarray,
                 w_ih_b: np.ndarray | None = None,
                 w_hh_b: np.ndarray | None = None,
                 b_b: np.ndarray | None = None) -> None:
        self.fwd = (w_ih_f, w_hh_f, b_f)
        self.bwd = (w_ih_b, w_hh_b, b_b) if w_ih_b is not None else None
        self.hidden = len(b_f) // 4

    @staticmethod
    def _sigmoid(x: np.ndarray) -> np.ndarray:
        return 1.0 / (1.0 + np.exp(-x))

    def _run(self, weights, xs: np.ndarray, reverse: bool) -> np.ndarray:
        w_ih, w_hh, b = weights
        hsz = self.hidden
        n = len(xs)
        out = np.zeros((n, hsz))
        h = np.zeros(hsz)
        c = np.zeros(hsz)
        order = range(n - 1, -1, -1) if reverse else range(n)
        for t in order:
            g = b + w_ih @ xs[t] + w_hh @ h
            i = self._sigmoid(g[:hsz])
            f = self._sigmoid(g[hsz:2 * hsz])
            gg = np.tanh(g[2 * hsz:3 * hsz])
            o = self._sigmoid(g[3 * hsz:])
            c = f * c + i * gg
            h = o * np.tanh(c)
            out[t] = h
        return out

    def __call__(self, xs: np.ndarray) -> np.ndarray:
        if len(xs) == 0:
            return xs
        fwd = self._run(self.fwd, xs, reverse=False)
        if self.bwd is None:
            return fwd
        bwd = self._run(self.bwd, xs, reverse=True)
        return np.concatenate([fwd, bwd], axis=1)


class FeedForward:
    """Linear → ReLU → Linear (LinearLayer.swift FeedForwardLayer)."""

    def __init__(self, w1, b1, w2, b2) -> None:
        self.w1, self.b1, self.w2, self.b2 = w1, b1, w2, b2

    def __call__(self, x: np.ndarray) -> np.ndarray:
        return np.maximum(x @ self.w1.T + self.b1, 0.0) @ self.w2.T + self.b2


def _seeded(key: str, seed: int, shape: tuple, scale: float) -> np.ndarray:
    rng = np.random.default_rng(_h64(key.encode(), b"lg%d" % seed))
    return rng.standard_normal(shape) * scale


class LegacySpanScorer:
    """A8: the GLiNER1 span-scoring backend behind the ``ScorerBackend``
    slot — prompted encode, BiLSTM contextualizer, start/end FFN span rep,
    prompt projection, sigmoid + greedy overlap decode.

    Stateful (weights + tokenizer cache) — construct once per actor."""

    def __init__(self, config: PipelineConfig | None = None) -> None:
        cfg = config or DEFAULT_CONFIG
        self.config = cfg
        self.tokenizer = WordTokenizer(cfg.seed, vocab_dir=cfg.vocab_dir)
        h = cfg.hidden
        self.h = h
        s = cfg.seed
        self.max_width = 12      # legacy span head width (SpanHead metadata
        #                          maxWidth 12 vs GLiNER2 manifest 8)
        self._emb_cache: dict[int, np.ndarray] = {}
        lstm_h = h // 2
        sc = 1.0 / np.sqrt(h)
        self.rnn = BiLSTM(
            _seeded("wihf", s, (4 * lstm_h, h), sc),
            _seeded("whhf", s, (4 * lstm_h, lstm_h), sc),
            _seeded("bf", s, (4 * lstm_h,), 0.1),
            _seeded("wihb", s, (4 * lstm_h, h), sc),
            _seeded("whhb", s, (4 * lstm_h, lstm_h), sc),
            _seeded("bb", s, (4 * lstm_h,), 0.1))
        half = h // 2

        def ffn(name: str, din: int, dout: int) -> FeedForward:
            return FeedForward(
                _seeded(name + ".w1", s, (din, din), 1.0 / np.sqrt(din)),
                _seeded(name + ".b1", s, (din,), 0.05),
                _seeded(name + ".w2", s, (dout, din), 1.0 / np.sqrt(din)),
                _seeded(name + ".b2", s, (dout,), 0.05))

        self.project_start = ffn("project_start", h, half)
        self.project_end = ffn("project_end", h, half)
        self.out_project = ffn("out_project", h, h)
        self.prompt_projection = ffn("prompt_projection", h, h)

    # -- encoder (shares the surrogate philosophy: hash embeddings + mix) --
    def _embed(self, ids: np.ndarray) -> np.ndarray:
        out = np.empty((len(ids), self.h))
        for i, t in enumerate(ids):
            t = int(t)
            v = self._emb_cache.get(t)
            if v is None:
                v = _seeded("tok%d" % t, self.config.seed, (self.h,), 1.0)
                self._emb_cache[t] = v
            out[i] = v
        return out

    def hidden_states(self, enc: PromptEncoding) -> np.ndarray:
        e = self._embed(enc.input_ids)
        hst = 0.6 * e
        hst[1:] += 0.2 * e[:-1]
        hst[:-1] += 0.2 * e[1:]
        return hst

    # -- SpanScorer.swift:59-88 gathers -----------------------------------
    @staticmethod
    def gather_prompt_embeddings(hidden: np.ndarray,
                                 class_positions: list[int],
                                 label_count: int) -> np.ndarray:
        return hidden[np.asarray(class_positions[:label_count], dtype=np.int64)]

    @staticmethod
    def gather_word_embeddings(hidden: np.ndarray,
                               word_mask: np.ndarray) -> np.ndarray:
        pos = np.nonzero(word_mask > 0)[0]
        order = np.argsort(word_mask[pos], kind="stable")   # wordIndex+1 asc
        return hidden[pos[order]]

    # -- span scores -------------------------------------------------------
    def span_logits(self, enc: PromptEncoding) -> np.ndarray:
        """(n_words, max_width, n_labels) logits; masked (end ≥ n_words)
        slots stay at -inf so decode skips them."""
        n_labels = len(enc.class_positions)
        n_words = enc.text_word_count
        if n_labels == 0 or n_words == 0:
            return np.full((0, self.max_width, max(n_labels, 1)), -np.inf)
        hidden = self.hidden_states(enc)
        prompts = self.prompt_projection(
            self.gather_prompt_embeddings(hidden, enc.class_positions, n_labels))
        words = self.rnn(self.gather_word_embeddings(hidden, enc.word_mask))
        starts = self.project_start(words)      # (n_words, h/2)
        ends = self.project_end(words)
        logits = np.full((n_words, self.max_width, n_labels), -np.inf)
        scale = 1.0 / np.sqrt(self.h)
        cap = np.array([1.0 if w[:1].isupper() else 0.0 for w in enc.words])
        cap_cum = np.concatenate([[0.0], np.cumsum(cap)])
        for start in range(n_words):
            max_w = min(self.max_width, n_words - start)
            span = self.out_project(
                np.concatenate([np.broadcast_to(starts[start],
                                                (max_w, starts.shape[1])),
                                ends[start:start + max_w]], axis=1))
            base = np.clip(span @ prompts.T * scale, -2.0, 2.0) - 4.0
            # surrogate feature nudge: all-capitalized spans clear the
            # default threshold, like the GLiNER2 surrogate (scorer.py)
            widths = np.arange(1, max_w + 1)
            all_cap = (cap_cum[start + widths] - cap_cum[start]) == widths
            logits[start, :max_w, :] = base + np.where(all_cap, 6.0, 0.0)[:, None]
        return logits

    def candidates(self, text: str, labels: list[str],
                   threshold: float | None = None):
        """Pre-NMS candidate set of the greedy decode below — the legacy
        twin of ``decode.span_candidates`` (engine-dump oracle support,
        ``__ray_entry__.SQL_LEGACY_MENTIONS``): (float64 post-sigmoid
        score, word start, inclusive word end, label index) tuples plus the
        encoding for char-offset projection. ``extract`` consumes exactly
        this set, so the dumped candidates are the decoder's candidates by
        construction."""
        thr = threshold if threshold is not None else self.config.threshold
        if not text or not labels:
            return [], None
        enc = encode_prompted(text, labels, self.tokenizer)
        logits = self.span_logits(enc)
        probs = 1.0 / (1.0 + np.exp(-logits))
        ss, ww, ll = np.nonzero(probs >= thr)
        return list(zip(probs[ss, ww, ll].tolist(), ss.tolist(),
                        (ss + ww).tolist(), ll.tolist())), enc

    # -- SpanDecoder.swift:11-90 greedy decode -----------------------------
    def extract(self, text: str, labels: list[str],
                threshold: float | None = None) -> list[Mention]:
        raw, enc = self.candidates(text, labels, threshold)
        if not raw:
            return []
        cands = sorted(
            raw,
            key=lambda t: (-t[0], t[1], t[2], t[3]))   # score desc, then a
        #   deterministic positional tiebreak (the reference's sort is
        #   unstable on ties; a total order keeps the engine reproducible)
        chosen: list[tuple] = []
        for score, s0, e0, li in cands:
            if any(not (e0 < cs or s0 > ce) for _, cs, ce, _ in chosen):
                continue
            chosen.append((score, s0, e0, li))
        chosen.sort(key=lambda t: (t[1], t[2], t[3]))
        out = []
        for score, s0, e0, li in chosen:
            a = int(enc.word_starts[s0])
            b = int(enc.word_ends[e0])
            out.append(Mention(text=text[a:b], label=labels[int(li)],
                               score=float(score), start=a, end=b))
        return out
