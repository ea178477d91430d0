"""HF ``tokenizer.json`` unigram-vocab loader + reference-exact Viterbi.

Mirrors the reference's SentencePiece-unigram model
(/root/reference/Sources/GLiNERSwift/Tokenization/SentencePieceUnigram.swift):

- file discovery: ``<dir>/tokenizer/tokenizer.json`` then
  ``<dir>/tokenizer.json`` (SentencePieceUnigram.swift:89-97);
- parse: ``model.type`` must be ``unigram``; ``model.vocab`` is a list of
  ``[token, score]`` pairs whose INDEX is the id; ``added_tokens`` entries
  carry explicit ids and score 0 and never override an existing piece
  (SentencePieceUnigram.swift:100-121);
- specials: ``[UNK] [PAD] [CLS] [SEP]`` required, ``[MASK]`` optional,
  ``unk_id`` from ``model.unk_id`` (SentencePieceUnigram.swift:123-137);
- lattice: at each character, every dictionary substring up to the longest
  vocab piece; a position with no candidate gets a single-char UNK
  (SentencePieceUnigram.swift:218-232);
- Viterbi: forward max-sum over positions, candidates in increasing length,
  strict ``>`` improvement — tie goes to the candidate seen first
  (SentencePieceUnigram.swift:249-262);
- per-directory instance cache so actors pay the JSON parse once
  (the reference caches per resource directory the same way).

The engine's surrogate path (raykg.core.tokenizer) keeps its synthetic vocab
when no tokenizer.json is present; this loader is the drop-in real-model
path behind the same ``WordTokenizer`` facade.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass


@dataclass(frozen=True)
class _Piece:
    id: int
    score: float


class UnigramVocab:
    """Parsed unigram tokenizer.json: piece dictionary + special ids."""

    def __init__(self, vocab: list, added_tokens: list | None,
                 unk_id: int) -> None:
        pieces: dict[str, _Piece] = {}
        max_len = 0
        for idx, (token, score) in enumerate(vocab):
            pieces[token] = _Piece(idx, float(score))
            max_len = max(max_len, len(token))
        for entry in added_tokens or []:
            content = entry["content"]
            if content in pieces:
                continue
            pieces[content] = _Piece(int(entry["id"]), 0.0)
            max_len = max(max_len, len(content))
        for required in ("[UNK]", "[PAD]", "[CLS]", "[SEP]"):
            if required not in pieces:
                raise ValueError(f"tokenizer vocabulary missing {required}")
        self.pieces = pieces
        self.max_piece_len = max_len
        self.unk = pieces["[UNK]"]
        self.unk_id = int(unk_id)
        self.pad_id = pieces["[PAD]"].id
        self.cls_id = pieces["[CLS]"].id
        self.sep_id = pieces["[SEP]"].id
        self.mask_id = pieces["[MASK]"].id if "[MASK]" in pieces else None

    # -- loading -------------------------------------------------------------

    _DIR_CACHE: dict[str, "UnigramVocab"] = {}

    @classmethod
    def load(cls, resource_dir: str) -> "UnigramVocab":
        """Load (cached per directory) from ``<dir>/tokenizer/tokenizer.json``
        or ``<dir>/tokenizer.json``."""
        key = os.path.abspath(resource_dir)
        got = cls._DIR_CACHE.get(key)
        if got is not None:
            return got
        for cand in (os.path.join(key, "tokenizer", "tokenizer.json"),
                     os.path.join(key, "tokenizer.json")):
            if os.path.exists(cand):
                with open(cand, encoding="utf-8") as f:
                    spec = json.load(f)
                model = spec.get("model", {})
                if str(model.get("type", "")).lower() != "unigram":
                    raise ValueError(
                        f"unsupported tokenizer model type: {model.get('type')}")
                added = list(spec.get("added_tokens") or [])
                # HF directory layout also ships a sibling added_tokens.json
                # ({token: id}) — the reference's resource dir has exactly
                # that (Sources/GLiNERSwift/Resources/tokenizer/
                # added_tokens.json: [P]=128003, [E]=128005, …); merge it
                sibling = os.path.join(os.path.dirname(cand),
                                       "added_tokens.json")
                if os.path.exists(sibling):
                    with open(sibling, encoding="utf-8") as f:
                        for token, tid in json.load(f).items():
                            added.append({"id": int(tid), "content": token})
                vocab = cls(model["vocab"], added, model.get("unk_id", 0))
                if len(cls._DIR_CACHE) < 64:
                    cls._DIR_CACHE[key] = vocab
                return vocab
        raise FileNotFoundError(
            f"no tokenizer.json under {resource_dir} (tried tokenizer/ and root)")

    @classmethod
    def maybe_load(cls, resource_dir: str | None) -> "UnigramVocab | None":
        """Synthetic-fallback hook: None when no directory / file exists."""
        if not resource_dir:
            return None
        try:
            return cls.load(resource_dir)
        except FileNotFoundError:
            return None

    def register_special(self, token: str, token_id: int) -> None:
        """registerSpecialToken analogue (SentencePieceUnigram.swift:166-171)."""
        self.pieces[token] = _Piece(int(token_id), 0.0)
        self.max_piece_len = max(self.max_piece_len, len(token))

    def token_id(self, token: str) -> int | None:
        got = self.pieces.get(token)
        return got.id if got is not None else None

    # -- tokenization --------------------------------------------------------

    def tokenize_normalized(self, s: str) -> tuple[list[int], list[str]]:
        """Viterbi over an ALREADY-normalized string ('▁'-form; the engine's
        shared ``normalize`` in raykg.core.tokenizer applies the reference's
        M2 normalization before any vocab is consulted)."""
        n = len(s)
        if n == 0:
            return [], []
        NEG = float("-inf")
        scores = [NEG] * (n + 1)
        scores[0] = 0.0
        back: list[tuple[int, _Piece, str] | None] = [None] * (n + 1)
        pieces = self.pieces
        max_len = self.max_piece_len
        for pos in range(n):
            cur = scores[pos]
            if cur == NEG:
                continue
            found = False
            limit = min(max_len, n - pos)
            for size in range(1, limit + 1):
                piece = s[pos:pos + size]
                tp = pieces.get(piece)
                if tp is None:
                    continue
                found = True
                nxt = pos + size
                cand = cur + tp.score
                if cand > scores[nxt]:
                    scores[nxt] = cand
                    back[nxt] = (pos, tp, piece)
            if not found:
                # per-char UNK fallback (SentencePieceUnigram.swift:229-231)
                nxt = pos + 1
                cand = cur + self.unk.score
                if cand > scores[nxt]:
                    scores[nxt] = cand
                    back[nxt] = (pos, self.unk, "[UNK]")
        ids: list[int] = []
        tokens: list[str] = []
        pos = n
        while pos > 0:
            bp = back[pos]
            if bp is None:        # unreachable: every position has a candidate
                ids.append(self.unk.id)
                tokens.append("[UNK]")
                pos -= 1
                continue
            prev, tp, piece = bp
            ids.append(tp.id)
            tokens.append(piece)
            pos = prev
        ids.reverse()
        tokens.reverse()
        return ids, tokens
