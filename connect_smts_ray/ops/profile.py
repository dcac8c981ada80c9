"""Data-quality profiling: per-column row/null counts and typed min/max
for a Dataset, computed combiner-first (one summary row per column per
block crosses the shuffle — the table itself never moves).

The profile is the standard pre-ingest audit for a 100-TB drop: which
columns are null-riddled, what are the key ranges, did a feed start
emitting empty strings. Output one row per column:
(col_name, n_rows, n_nulls, min_int, max_int, min_str, max_str) — integer
and string extrema ride in separate typed columns (a stringified int
min would merge lexically: "10" < "9"); other dtypes profile counts
only."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def table_profile(ds, int_cols=(), str_cols=(), other_cols=()):
    """Per-column profile Dataset. ``int_cols``/``str_cols`` get typed
    min/max; ``other_cols`` (floats, timestamps, binaries) get counts
    only. One tiny groupby(column) merges the per-block partials."""
    int_cols, str_cols = list(int_cols), list(str_cols)
    all_cols = int_cols + str_cols + list(other_cols)

    def partial(batch: pa.Table) -> pa.Table:
        names, n_rows, n_nulls = [], [], []
        min_i, max_i, min_s, max_s = [], [], [], []
        for c in all_cols:
            col = batch.column(c)
            names.append(c)
            n_rows.append(batch.num_rows)
            n_nulls.append(col.null_count)
            valid = batch.num_rows - col.null_count
            if c in int_cols and valid:
                mm = pc.min_max(col)
                min_i.append(mm["min"].as_py())
                max_i.append(mm["max"].as_py())
            else:
                min_i.append(None)
                max_i.append(None)
            if c in str_cols and valid:
                mm = pc.min_max(col)
                min_s.append(mm["min"].as_py())
                max_s.append(mm["max"].as_py())
            else:
                min_s.append(None)
                max_s.append(None)
        return pa.table({
            "col_name": pa.array(names, pa.string()),
            "n_rows": pa.array(n_rows, pa.int64()),
            "n_nulls": pa.array(np.asarray(n_nulls, dtype=np.int64)),
            "min_int": pa.array(min_i, pa.int64()),
            "max_int": pa.array(max_i, pa.int64()),
            "min_str": pa.array(min_s, pa.string()),
            "max_str": pa.array(max_s, pa.string()),
        })

    from ray.data.aggregate import Max, Min, Sum

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby("col_name").aggregate(
        Sum("n_rows"), Sum("n_nulls"),
        Min("min_int"), Max("max_int"), Min("min_str"), Max("max_str"),
    )
    return agg.map_batches(
        lambda b: pa.table({
            "col_name": b.column("col_name"),
            "n_rows": pc.cast(b.column("sum(n_rows)"), pa.int64()),
            "n_nulls": pc.cast(b.column("sum(n_nulls)"), pa.int64()),
            "min_int": pc.cast(b.column("min(min_int)"), pa.int64()),
            "max_int": pc.cast(b.column("max(max_int)"), pa.int64()),
            "min_str": pc.cast(b.column("min(min_str)"), pa.string()),
            "max_str": pc.cast(b.column("max(max_str)"), pa.string()),
        }),
        batch_format="pyarrow",
    )
