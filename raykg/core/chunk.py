"""Long-document chunking (operator M8).

Semantics ported from
/root/reference/Sources/GLiNERSwift/Tokenization/TextChunker.swift:31-106:

- trigger: chunk only when ``word_count(text) > max_words``
  (TextChunker.swift ``shouldChunk``; wired to spanScorer.maxWordCount - 8 =
  248 in GLiNERModel.swift:322-343)
- each chunk is at most ``max_chars`` characters; when cutting mid-document,
  prefer the last ``\\n`` inside the window, else the last whitespace, else a
  hard cut
- the chunk is trimmed of surrounding whitespace (offsets track the trim)
- while the trimmed chunk still has more than ``max_words`` words, shrink it
  to end exactly at the ``max_words``-th word boundary
- the next chunk starts ``overlap_chars`` before this chunk's end (forward
  progress is guaranteed)

Offsets are code-point offsets into the ORIGINAL text, so downstream entity
offsets adjust by plain addition (operator M9, GLiNERModel.swift:480-491).
"""

from __future__ import annotations

from dataclasses import dataclass

from .wordsplit import WORD_RE


@dataclass(frozen=True)
class TextChunk:
    """Mirror of the reference TextChunk (TextChunker.swift:3-8)."""

    text: str
    start_offset: int
    end_offset: int          # exclusive
    word_count: int


def should_chunk(text: str, max_words: int) -> bool:
    # early exit at max_words+1: the exact count (already computed upstream
    # as n_words) is not needed here, and long docs shouldn't pay a full
    # regex scan in the scorer actor's hot path just to learn "yes"
    for i, _ in enumerate(WORD_RE.finditer(text)):
        if i >= max_words:
            return True
    return False


def chunk_text(text: str, max_chars: int, overlap_chars: int,
               max_words: int) -> list[TextChunk]:
    """Split ``text`` into overlapping chunks per the rules above."""
    n = len(text)
    if n == 0:
        return []
    chunks: list[TextChunk] = []
    pos = 0
    while pos < n:
        end = min(pos + max_chars, n)
        if end < n:
            nl = text.rfind("\n", pos + 1, end)
            if nl > pos:
                end = nl
            else:
                cut = -1
                for i in range(end - 1, pos, -1):
                    if text[i].isspace():
                        cut = i
                        break
                if cut > pos:
                    end = cut
        # trim whitespace, tracking offsets
        s, e = pos, end
        while s < e and text[s].isspace():
            s += 1
        while e > s and text[e - 1].isspace():
            e -= 1
        piece = text[s:e]
        # shrink while word count > max_words: end at the max_words-th word
        words = list(WORD_RE.finditer(piece))
        if len(words) > max_words:
            cut_local = words[max_words - 1].end()
            e = s + cut_local
            piece = text[s:e]
            words = words[:max_words]
        if piece:
            chunks.append(TextChunk(piece, s, e, len(words)))
        # exit when only whitespace remains past the consumed end: testing
        # the trimmed `e >= n` never terminates via break when the document
        # has trailing whitespace — the loop would rewind by overlap_chars
        # past the real final chunk and crawl forward 1 char/iteration,
        # emitting dozens of shrinking mid-word junk chunks ("295", "95",
        # …) that the scorer then wastes forwards on. (A plain `end >= n`
        # would instead DROP tail words whenever the max_words shrink cut
        # the final window short.)
        if not text[e:].strip():
            break
        next_pos = max(e - overlap_chars, pos + 1)
        # never restart inside the region we already fully consumed with no
        # progress; guarantee forward motion
        pos = next_pos if next_pos > pos else pos + 1
    return chunks
