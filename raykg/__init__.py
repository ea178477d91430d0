"""raykg — a Ray-Data-native knowledge-graph construction engine.

Built from scratch around GLiNER2-style zero-shot span-classification NER
(semantics anchored to the reference at /root/reference, see SURVEY.md), but
architected Ray-Data-first: every stage is a batch transform over a
``ray.data.Dataset`` of Arrow blocks; stateful stages (tokenizer/scorer/linker)
are actor pools; wide steps (canonicalization, graph materialize) are explicit
groupby/sort shuffles with salting for hot keys.

Layout
------
- ``raykg.config``      — PipelineConfig + Schema (task spec)
- ``raykg.core``        — pure per-document semantics shared by the distributed
                          pipeline and the single-process oracle (textextract,
                          wordsplit, tokenizer, scorer, decode, chunk,
                          relations, canonical)
- ``raykg.oracle``      — single-process reference implementation used by the
                          P/R and byte-identity gates
- ``raykg.sources``     — readers + deterministic synthetic `pages` generation
- ``raykg.stages``      — Ray Data stage wrappers (map_batches UDFs / actors)
- ``raykg.pipelines``   — end-to-end DAG assembly, checkpointing, metrics
- ``raykg.functions``   — general data-processing operators (dedup, similarity
                          search, text stats, windows, relational, multimodal)
- ``raykg.state``       — checkpoint manifests + per-stage metrics
"""

__version__ = "0.1.0"
