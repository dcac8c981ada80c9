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
