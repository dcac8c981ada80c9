"""Sort-aware data layout: range-partitioned shards + zone-map pruning.

The 100-TB read problem is not scan speed, it is NOT reading: a query
with a time/key predicate should open only the files that can contain
matches. This module is the engine's layout path for that:

- ``write_sorted_shards``: range-partition a Dataset on a sort column
  (bounds from a distributed sample → every shard owns a disjoint key
  range), sort within each shard, write one parquet file per shard, and
  commit a ZONE MAP (per-file min/max + row count) via atomic rename —
  the same manifest discipline as the LWW sink, so a crashed layout job
  re-runs idempotently and readers never see a half-written layout.
- ``read_pruned``: open the zone map (one tiny JSON), keep only shards
  whose [min, max] intersects the predicate range, and read those files
  ONLY — file skipping before any task is scheduled; the residual
  filter inside ``map_batches`` trims the boundary shards.

This is the engine-level analog of Delta/Iceberg data skipping or
ClickHouse's primary-key ranges, built on plain parquet + one JSON
(reference analog: none — the reference leaves layout to Kafka topic
partitions).

Scale notes: bounds come from a per-block sample capped at
``sample_per_block`` rows (driver sees ≤ blocks × cap values, never the
column); each shard is one task's sort (keep ``num_shards`` ≥ data /
worker-heap); the zone map is O(num_shards) — thousands of entries, not
millions, because shards are file-sized, not row-group-sized.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_ZONE_MAP = "_ZONE_MAP.json"


def write_sorted_shards(ds, sort_col: str, out_dir: str,
                        num_shards: int = 16,
                        sample_per_block: int = 1000,
                        bounds=None) -> dict:
    """Range-partition ``ds`` on ``sort_col`` into ``num_shards`` sorted
    parquet shards under ``out_dir`` and commit a zone map. Returns the
    zone map dict (which records the split ``bounds``). ``sort_col`` must
    be int64-comparable (ints or timestamps; timestamps are laid out as
    int64 µs).

    Pass explicit ``bounds`` (sorted int64 split points) to skip the
    sampling pass and reuse another layout's partitioning — that is what
    CO-PARTITIONS two tables on the same key ranges (e.g. the iterative
    rank table against a fixed edge layout, ``ops/graph.py``)."""
    import ray.data

    os.makedirs(out_dir, exist_ok=True)

    def sample(b: pa.Table) -> pa.Table:
        col = pc.cast(pc.cast(b.column(sort_col), pa.timestamp("us")),
                      pa.int64()) if pa.types.is_timestamp(
            b.column(sort_col).type) else pc.cast(b.column(sort_col),
                                                  pa.int64())
        n = min(b.num_rows, sample_per_block)
        # deterministic stride sample — no RNG, reruns identical
        idx = np.linspace(0, b.num_rows - 1, n).astype(np.int64) \
            if b.num_rows else np.array([], np.int64)
        return pa.table({"v": col.take(pa.array(idx))})

    if bounds is None:
        vals = np.asarray(
            [r["v"] for r in ds.map_batches(
                sample, batch_format="pyarrow").take_all()], dtype=np.int64)
        vals.sort()
        if len(vals) == 0:
            bounds = []
        else:
            qs = np.linspace(0, 1, num_shards + 1)[1:-1]
            bounds = sorted(set(int(np.quantile(vals, q)) for q in qs))
    else:
        bounds = [int(x) for x in bounds]

    def to_i64(b: pa.Table):
        col = b.column(sort_col)
        if pa.types.is_timestamp(col.type):
            col = pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
        else:
            col = pc.cast(col, pa.int64())
        return col

    def assign(b: pa.Table) -> pa.Table:
        key = to_i64(b).to_numpy(zero_copy_only=False)
        shard = np.searchsorted(np.asarray(bounds, np.int64), key,
                                side="right") if bounds else \
            np.zeros(b.num_rows, np.int64)
        return b.append_column(pa.field("__shard", pa.int64()),
                               pa.array(shard.astype(np.int64)))

    def write_shard(g: pa.Table) -> pa.Table:
        sid = g.column("__shard")[0].as_py()
        key = to_i64(g)
        order = pc.sort_indices(key)
        t = g.take(order).drop_columns(["__shard"])
        path = os.path.join(out_dir, f"shard-{sid:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        kmin = pc.min(key).as_py()
        kmax = pc.max(key).as_py()
        return pa.table({
            "shard": pa.array([sid], pa.int64()),
            "path": pa.array([path], pa.string()),
            "min": pa.array([kmin], pa.int64()),
            "max": pa.array([kmax], pa.int64()),
            "rows": pa.array([t.num_rows], pa.int64()),
        })

    entries = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("__shard").map_groups(write_shard, batch_format="pyarrow")
        .take_all()
    )
    zone = {"sort_col": sort_col, "bounds": bounds,
            "shards": sorted(entries, key=lambda e: e["shard"])}
    tmp = os.path.join(out_dir, _ZONE_MAP + ".tmp")
    with open(tmp, "w") as f:
        json.dump(zone, f)
    os.replace(tmp, os.path.join(out_dir, _ZONE_MAP))
    return zone


def read_pruned(out_dir: str, lo: int | None = None, hi: int | None = None):
    """Dataset over only the shards whose [min, max] intersects
    [lo, hi] (inclusive; None = unbounded), with the residual row filter
    applied per batch. Returns (dataset, n_files_read, n_files_total)."""
    import ray.data

    with open(os.path.join(out_dir, _ZONE_MAP)) as f:
        zone = json.load(f)
    shards = zone["shards"]
    keep = [s for s in shards
            if (lo is None or s["max"] >= lo)
            and (hi is None or s["min"] <= hi)]
    sort_col = zone["sort_col"]
    if not keep:
        schema = pq.read_schema(shards[0]["path"]) if shards else None
        empty = pa.Table.from_pylist([], schema=schema) if schema else \
            pa.table({})
        return ray.data.from_arrow(empty), 0, len(shards)

    ds = ray.data.read_parquet([s["path"] for s in keep])

    def residual(b: pa.Table) -> pa.Table:
        col = b.column(sort_col)
        if pa.types.is_timestamp(col.type):
            col = pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
        else:
            col = pc.cast(col, pa.int64())
        mask = pa.nulls(b.num_rows, pa.bool_()).fill_null(True)
        if lo is not None:
            mask = pc.and_(mask, pc.greater_equal(col, lo))
        if hi is not None:
            mask = pc.and_(mask, pc.less_equal(col, hi))
        return b.filter(mask)

    return ds.map_batches(residual, batch_format="pyarrow"), \
        len(keep), len(shards)
