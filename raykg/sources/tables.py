"""Clean parquet reads for the driver testdata tables.

``read_parquet`` preserves parquet schema metadata; pandas-written files
carry a ``pandas`` metadata entry containing DICTS, which defeats Ray's
schema-dedup hashing (the per-worker ``Failed to hash the schemas (for
deduplication): unhashable type: 'dict'`` warning) and its fusion
eligibility checks. ``read_table`` strips schema metadata in a fused
map_batches right at the read — zero-copy (``replace_schema_metadata``
touches only the schema object, never the columns).
"""

from __future__ import annotations

import pyarrow as pa


def _strip_meta(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None)


def read_table(sf_dir: str, name: str, columns: list[str] | None = None):
    """``{sf_dir}/{name}.parquet`` → Dataset with a metadata-free schema."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)
    return ds.map_batches(_strip_meta, batch_format="pyarrow")
