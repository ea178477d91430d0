"""Deterministic HTML → text extraction.

THE frozen function behind the per-row invariant "extracted text is
byte-identical per url to the reference extractor" (BASELINE.json input_hint).
Both the distributed pipeline stage (raykg.stages.extract) and the
single-process oracle (raykg.oracle) call exactly this function; every
normalization choice is fixed here and never re-implemented elsewhere
(SURVEY.md §7.5 item 2).

Normalization semantics are seeded from the reference's text handling:
- CRLF → LF and trim, as the benchmark text loader does
  (/root/reference/Sources/Benchmarks/BenchmarkCLI.swift:370-372).
- Whitespace runs (incl. ideographic space U+3000 and BOM U+FEFF) collapse to
  a single space, as the tokenizer normalizer does
  (/root/reference/Sources/GLiNERSwift/Tokenization/SentencePieceUnigram.swift:68-73).
The HTML stripping itself (script/style/comment removal, block-tag newlines,
entity unescape) is new — the reference has no HTML input — and is defined
once, here.
"""

from __future__ import annotations

import html as _html
import re

# Compiled once at import; reused by every batch in every worker.
_RE_SCRIPT = re.compile(r"<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>",
                        re.IGNORECASE | re.DOTALL)
_RE_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_RE_BLOCK_TAG = re.compile(
    r"</?(?:p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|blockquote|section|article|"
    r"header|footer|nav|aside|figure|figcaption|pre|hr|form|title)\b[^>]*>",
    re.IGNORECASE,
)
_RE_TAG = re.compile(r"<[^>]+>")
_RE_HSPACE = re.compile(r"[ \t 　﻿]+")
_RE_BLANK_LINES = re.compile(r" *\n(?: *\n)+ *")
_RE_LINE_EDGES = re.compile(r" *\n *")


def extract_text(html_bytes: bytes | str) -> str:
    """Extract visible text from an HTML document. Deterministic; frozen.

    Steps (order matters — DO NOT reorder):
      1. decode UTF-8 (replacement char on invalid bytes), CRLF/CR → LF
      2. drop <script>/<style>/<noscript>/<template> elements and comments
      3. block-level tags become newlines; all remaining tags are dropped
      4. HTML entities are unescaped (&amp; → &, numeric refs, …)
      5. horizontal whitespace runs collapse to one space; blank-line runs
         collapse to one newline; leading/trailing whitespace trimmed
    """
    if isinstance(html_bytes, (bytes, bytearray, memoryview)):
        text = bytes(html_bytes).decode("utf-8", errors="replace")
    else:
        text = html_bytes
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    text = _RE_SCRIPT.sub(" ", text)
    text = _RE_COMMENT.sub(" ", text)
    text = _RE_BLOCK_TAG.sub("\n", text)
    text = _RE_TAG.sub(" ", text)
    text = _html.unescape(text)
    text = _RE_HSPACE.sub(" ", text)
    text = _RE_BLANK_LINES.sub("\n", text)
    text = _RE_LINE_EDGES.sub("\n", text)
    return text.strip()
