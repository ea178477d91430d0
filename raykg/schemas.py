"""pyarrow schemas for every logical table (SURVEY.md §1.3).

Dense tensors (hidden states, span scores) never appear in tables — they live
only inside map_batches UDFs as numpy arrays, exactly as the reference
confines MLMultiArrays to model wrappers (SURVEY.md §1.3).
"""

from __future__ import annotations

import pyarrow as pa

# input (BASELINE.json input_hint shape)
PAGES = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

MENTION_T = pa.struct([
    ("text", pa.string()),
    ("label", pa.string()),
    ("score", pa.float32()),
    ("start", pa.int64()),
    ("end", pa.int64()),
])

TRIPLE_T = pa.struct([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("subj_label", pa.string()),
    ("obj_label", pa.string()),
    ("score", pa.float32()),
    ("sent_start", pa.int64()),
])

# post-extraction doc rows; `html` is DROPPED here so downstream shuffles
# never move multi-MB binary payloads (SURVEY.md §7.5 item 7)
DOCS = pa.schema([
    ("doc_id", pa.int64()),
    ("url", pa.string()),
    ("lang", pa.string()),
    ("text", pa.string()),
    ("n_words", pa.int32()),
])

# doc-level extraction output (stage-A checkpoint unit): nested mention /
# triple columns keep each document's results co-located with zero shuffles
DOC_EXTRACTS = pa.schema([
    ("doc_id", pa.int64()),
    ("url", pa.string()),
    ("lang", pa.string()),
    ("n_words", pa.int32()),
    ("mentions", pa.list_(MENTION_T)),
    ("triples", pa.list_(TRIPLE_T)),
])

MENTIONS = pa.schema([
    ("doc_id", pa.int64()),
    ("url", pa.string()),
    ("text", pa.string()),
    ("label", pa.string()),
    ("score", pa.float32()),
    ("start", pa.int64()),
    ("end", pa.int64()),
])

TRIPLES = pa.schema([
    ("doc_id", pa.int64()),
    ("url", pa.string()),
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("subj_label", pa.string()),
    ("obj_label", pa.string()),
    ("score", pa.float32()),
])

LINKS = pa.schema([
    ("doc_id", pa.int64()),
    ("url", pa.string()),
    ("text", pa.string()),
    ("label", pa.string()),
    ("score", pa.float32()),
    ("start", pa.int64()),
    ("end", pa.int64()),
    ("entity_id", pa.int64()),
    ("link_score", pa.float32()),
])

NODES = pa.schema([
    ("node_id", pa.int64()),
    ("canonical", pa.string()),
    ("label", pa.string()),          # majority mention label
    ("aliases", pa.list_(pa.string())),
    ("mention_count", pa.int64()),
])

EDGES = pa.schema([
    ("src", pa.int64()),
    ("pred", pa.string()),
    ("dst", pa.int64()),
    ("weight", pa.int64()),
    ("urls", pa.list_(pa.string())),
])
