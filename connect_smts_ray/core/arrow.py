"""Small Arrow interop helpers shared by the batch transforms."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def from_pandas(df: pd.DataFrame) -> pa.Table:
    """``pa.Table.from_pandas`` without the pandas schema metadata blob.

    The metadata dict defeats Ray Data's schema-dedup hash ('Failed to hash
    the schemas (for deduplication)' warned once per task) and makes block
    schemas compare unequal across stages that built the same columns.
    """
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def read_parquet_clean(path: str, columns=None, **kwargs):
    """``ray.data.read_parquet`` with an explicit pandas-metadata-free
    schema. Driver-written parquet carries pandas schema metadata whose
    dict defeats Ray Data's schema-dedup hash INSIDE the fused read task
    ('Failed to hash the schemas' spam) — a post-read strip can't reach
    it, so the read itself must be handed a clean schema."""
    import pyarrow.parquet as pq
    import ray.data

    sch = pq.read_schema(path).remove_metadata()
    if columns is not None:
        sch = pa.schema([sch.field(c) for c in columns])
    return ray.data.read_parquet(path, columns=columns, schema=sch, **kwargs)
