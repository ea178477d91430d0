"""General large-scale data-processing operators (dedup, similarity search,
text analysis, windows, relational, multimodal) — each exposed as a
``queries()`` entry in __ray_entry__ with a DuckDB oracle where SQL can
express the semantics."""
