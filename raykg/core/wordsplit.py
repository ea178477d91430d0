"""Word splitting with character offsets (operator M1).

Exact port of the reference regex
``\\w+(?:[-_]\\w+)*|\\S``
(/root/reference/Sources/GLiNERSwift/Tokenization/WordSplitter.swift:14):
words are runs of word characters optionally joined by ``-``/``_``; any other
non-space character is its own token. Offsets are Python-``str`` code-point
offsets (decision recorded in SURVEY.md §1.2).
"""

from __future__ import annotations

import re

WORD_RE = re.compile(r"\w+(?:[-_]\w+)*|\S")


def split_words(text: str) -> list[tuple[str, int, int]]:
    """Return [(word, start, end)] with end exclusive, code-point offsets."""
    return [(m.group(0), m.start(), m.end()) for m in WORD_RE.finditer(text)]


def word_count(text: str) -> int:
    """Count-only mode (WordSplitter.swift:18-36 has the same fast path)."""
    n = 0
    for _ in WORD_RE.finditer(text):
        n += 1
    return n
