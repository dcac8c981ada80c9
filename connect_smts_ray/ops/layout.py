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


# ---------------------------------------------------------------------------
# Z-order (multi-column) layout — data skipping on EITHER column
# ---------------------------------------------------------------------------

_ZORDER_MAP = "_ZORDER_MAP.json"


def _quantile_buckets(vals: np.ndarray, bits: int) -> list:
    """Sorted split points dividing ``vals`` into ≤ 2**bits equal-depth
    buckets (duplicates collapse — skew cannot explode one bucket)."""
    if len(vals) == 0:
        return []
    qs = np.linspace(0, 1, (1 << bits) + 1)[1:-1]
    return sorted(set(int(np.quantile(vals, q)) for q in qs))


def _scaled_rank(vals: np.ndarray, bounds: list, bits: int) -> np.ndarray:
    """Bucket rank of each value, RESCALED to span the full 2**bits code
    space. A low-cardinality column (15 users → 15 buckets) would
    otherwise occupy only the low bits of its plane and the other column
    would dominate every high Morton bit — the z-curve degenerates to a
    single-column sort and pruning on the sparse column dies. Scaling
    rank → rank·2**bits/n_buckets gives both planes equal weight no
    matter their cardinality."""
    n_buckets = len(bounds) + 1
    rank = np.searchsorted(np.asarray(bounds, np.int64), vals,
                           side="right").astype(np.uint64)
    return (rank * np.uint64(1 << bits)) // np.uint64(n_buckets)


def _interleave(x: np.ndarray, y: np.ndarray, bits: int) -> np.ndarray:
    """Bit-interleave two (bits)-wide bucket ids into a Morton z-value:
    z = ...y1x1y0x0. Vectorized — one numpy pass per bit plane."""
    z = np.zeros(len(x), dtype=np.uint64)
    x = x.astype(np.uint64)
    y = y.astype(np.uint64)
    for i in range(bits):
        z |= ((x >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i)
        z |= ((y >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i + 1)
    return z


def _col_i64(b: pa.Table, col: str):
    c = b.column(col)
    if pa.types.is_timestamp(c.type):
        c = pc.cast(pc.cast(c, pa.timestamp("us")), pa.int64())
    else:
        c = pc.cast(c, pa.int64())
    return c


def write_zorder_shards(ds, cols, out_dir: str, num_shards: int = 16,
                        bits: int = 8, sample_per_block: int = 1000) -> dict:
    """Z-ORDER layout over two columns (Delta ``OPTIMIZE ZORDER BY`` /
    Iceberg z-sort analog): each row's per-column equal-depth bucket ids
    (≤ 2**bits buckets per column, sample-derived bounds) are
    bit-interleaved into a Morton z-value; rows are range-partitioned and
    sorted by z. Locality in z implies locality in BOTH columns, so every
    shard covers only ~1/sqrt(num_shards) of each column's value range —
    a predicate on EITHER column then skips most files, where a
    single-column sort prunes one column and nothing else.

    The committed ``_ZORDER_MAP.json`` records per-shard min/max of BOTH
    original columns (pruning never needs z itself). Same atomic-rename
    manifest discipline as ``write_sorted_shards``; deterministic stride
    sample, so re-layout is idempotent."""
    import ray.data

    if len(cols) != 2:
        raise ValueError(f"z-order is defined here for 2 columns, got {cols}")
    cx, cy = cols
    os.makedirs(out_dir, exist_ok=True)

    def sample(b: pa.Table) -> pa.Table:
        n = min(b.num_rows, sample_per_block)
        idx = pa.array(np.linspace(0, b.num_rows - 1, n).astype(np.int64)) \
            if b.num_rows else pa.array([], pa.int64())
        return pa.table({"x": _col_i64(b, cx).take(idx),
                         "y": _col_i64(b, cy).take(idx)})

    samp = ds.map_batches(sample, batch_format="pyarrow").take_all()
    xs = np.asarray([r["x"] for r in samp], np.int64)
    ys = np.asarray([r["y"] for r in samp], np.int64)
    bx = _quantile_buckets(xs, bits)
    by = _quantile_buckets(ys, bits)
    zb = _interleave(_scaled_rank(xs, bx, bits),
                     _scaled_rank(ys, by, bits), bits)
    zb.sort()
    if len(zb) == 0:
        zbounds = []
    else:
        qs = np.linspace(0, 1, num_shards + 1)[1:-1]
        zbounds = sorted(set(int(np.quantile(zb, q)) for q in qs))

    def zvals(b: pa.Table) -> np.ndarray:
        x = _col_i64(b, cx).to_numpy(zero_copy_only=False)
        y = _col_i64(b, cy).to_numpy(zero_copy_only=False)
        return _interleave(_scaled_rank(x, bx, bits),
                           _scaled_rank(y, by, bits), bits)

    def assign(b: pa.Table) -> pa.Table:
        z = zvals(b)
        shard = np.searchsorted(
            np.asarray(zbounds, np.uint64), z, side="right") if zbounds \
            else np.zeros(b.num_rows, np.int64)
        return b.append_column(pa.field("__shard", pa.int64()),
                               pa.array(shard.astype(np.int64)))

    def write_shard(g: pa.Table) -> pa.Table:
        sid = g.column("__shard")[0].as_py()
        z = zvals(g)
        t = g.take(pa.array(np.argsort(z, kind="stable"))) \
            .drop_columns(["__shard"])
        path = os.path.join(out_dir, f"zshard-{sid:05d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        out = {"shard": [sid], "path": [path], "rows": [t.num_rows]}
        for name, col in ((f"min_{cx}", _col_i64(t, cx)),
                          (f"max_{cx}", _col_i64(t, cx)),
                          (f"min_{cy}", _col_i64(t, cy)),
                          (f"max_{cy}", _col_i64(t, cy))):
            fn = pc.min if name.startswith("min_") else pc.max
            out[name] = [fn(col).as_py()]
        return pa.table(out)

    entries = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("__shard").map_groups(write_shard, batch_format="pyarrow")
        .take_all()
    )
    zone = {"kind": "zorder", "cols": [cx, cy], "bits": bits,
            "zbounds": zbounds,
            "shards": sorted(entries, key=lambda e: e["shard"])}
    tmp = os.path.join(out_dir, _ZORDER_MAP + ".tmp")
    with open(tmp, "w") as f:
        json.dump(zone, f)
    os.replace(tmp, os.path.join(out_dir, _ZORDER_MAP))
    return zone


def read_zorder_pruned(out_dir: str, col: str, lo: int | None = None,
                       hi: int | None = None):
    """Pruned Dataset over a z-ordered layout for a range predicate on
    EITHER of its two columns: skip every shard whose per-file
    [min_col, max_col] misses [lo, hi], residual-filter the rest.
    Returns (dataset, n_files_read, n_files_total)."""
    import ray.data

    with open(os.path.join(out_dir, _ZORDER_MAP)) as f:
        zone = json.load(f)
    if col not in zone["cols"]:
        raise ValueError(f"{col!r} is not a z-order column of {zone['cols']}")
    shards = zone["shards"]
    keep = [s for s in shards
            if (lo is None or s[f"max_{col}"] >= lo)
            and (hi is None or s[f"min_{col}"] <= hi)]
    if not keep:
        schema = pq.read_schema(shards[0]["path"]) if shards else None
        empty = pa.Table.from_pylist([], schema=schema) if schema else \
            pa.table({})
        return ray.data.from_arrow(empty), 0, len(shards)

    ds = ray.data.read_parquet([s["path"] for s in keep])

    def residual(b: pa.Table) -> pa.Table:
        c = _col_i64(b, col)
        mask = pa.nulls(b.num_rows, pa.bool_()).fill_null(True)
        if lo is not None:
            mask = pc.and_(mask, pc.greater_equal(c, lo))
        if hi is not None:
            mask = pc.and_(mask, pc.less_equal(c, hi))
        return b.filter(mask)

    return ds.map_batches(residual, batch_format="pyarrow"), \
        len(keep), len(shards)
