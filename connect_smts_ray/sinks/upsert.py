"""Key-partitioned last-write-wins upsert sink (SURVEY §2.4, §4.2).

Pipeline shape (the engine's ONE shuffle)::

    events
      → map_batches(add_partition_id)      # murmur2(repo␟path) % P, vectorized
      → map_batches(partial_lww)           # combiner: per-key winner per batch
      → groupby("partition_id").map_groups(PartitionMerger)   # the shuffle
      → lineage rows (small)

Why this scales:

- The per-batch *partial* reduce collapses duplicate keys before the
  shuffle (at most one row per key per batch crosses the wire) — the
  combiner that makes hot keys safe: a key with 10⁶ events in an epoch
  ships ≤ #blocks rows, not 10⁶ (SURVEY §4.2.2's salting concern is
  subsumed because max-LWW is associative/commutative).
- ``P`` (``num_partitions``) is fixed per table and recorded in manifests,
  so replay partitioning is stable across cluster sizes.
- Each partition merge is vectorized (polars sort + unique-last) and writes
  its own state file + manifest — resumable, no global barrier besides the
  hash exchange itself.

LWW semantics: per key keep the row with max ``(commit_lsn,
source_offset)``; a winning tombstone (Outbox ``__deleted``/null-payload
record) deletes the key. State files carry the *full merged partition
state* per epoch, so tombstones need not persist; correctness relies on the
CDC guarantee that per-key ``commit_lsn`` is non-decreasing across epochs
(Kafka per-partition ordering, doc/outbox.md:7-12).

Ordering is order-insensitive (max-reduce), so shuffles, stragglers and
task retries cannot change the result (SURVEY §4.2.5).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

import polars as pl
import pyarrow as pa
import pyarrow.parquet as pq

from connect_smts_ray.core.hashing import murmur2_positive_many
from connect_smts_ray.sinks.manifest import ManifestStore

KEY_SEP = "\x1f"


@dataclass(frozen=True)
class UpsertConfig:
    lake_dir: str
    num_partitions: int = 32
    key_columns: tuple = ("repo", "path")
    order_columns: tuple = ("commit_lsn", "source_offset")
    tombstone_column: str = "is_tombstone"

    def store(self) -> ManifestStore:
        return ManifestStore(self.lake_dir)


# ---------------------------------------------------------------------------
# Stage 1: partition id (stateless, vectorized)
# ---------------------------------------------------------------------------

def composite_key_bytes(batch: pa.Table, key_columns) -> list:
    """Unambiguous composite key encoding: each part is length-prefixed
    (``len:value``) with a distinct null marker, so (None, 'x') ≠ ('', 'x')
    and a separator byte inside a value cannot collide with the joint of an
    adjacent key — silent key collisions would merge unrelated rows in the
    LWW reduce."""
    cols = [batch.column(c).to_pylist() for c in key_columns]
    out = []
    for row in zip(*cols):
        parts = []
        for v in row:
            if v is None:
                parts.append("n:")
            else:
                s = str(v)
                parts.append(f"{len(s)}:{s}")
        out.append(KEY_SEP.join(parts).encode())
    return out


def add_partition_id(batch: pa.Table, cfg: UpsertConfig) -> pa.Table:
    if batch.num_rows == 0:
        return batch.append_column(
            pa.field("partition_id", pa.int32()), pa.array([], type=pa.int32())
        )
    hashes = murmur2_positive_many(composite_key_bytes(batch, cfg.key_columns))
    pids = (hashes % cfg.num_partitions).astype("int32")
    return batch.append_column(
        pa.field("partition_id", pa.int32()), pa.array(pids, type=pa.int32())
    )


# ---------------------------------------------------------------------------
# LWW winner selection (shared by combiner + merger)
# ---------------------------------------------------------------------------

def lww_winners(table: pa.Table, cfg: UpsertConfig) -> pa.Table:
    """Per key, keep the single row with max order columns. Vectorized."""
    if table.num_rows == 0:
        return table
    df = pl.from_arrow(table)
    df = df.sort(list(cfg.order_columns)).unique(
        subset=list(cfg.key_columns), keep="last", maintain_order=True
    )
    return df.to_arrow()


def partial_lww(batch: pa.Table, cfg: UpsertConfig) -> pa.Table:
    """The pre-shuffle combiner. Tombstone rows are kept (they may win)."""
    return lww_winners(batch, cfg)


# ---------------------------------------------------------------------------
# Stage 3: per-partition merge + exactly-once commit
# ---------------------------------------------------------------------------

def _canonicalize(table: pa.Table, cfg: UpsertConfig) -> pa.Table:
    """Deterministic row & column order → byte-stable state files
    (sha256-exact reconvergence from any checkpoint)."""
    keys = list(cfg.key_columns)
    others = sorted(c for c in table.column_names if c not in keys)
    table = table.select(keys + others)
    return table.sort_by([(k, "ascending") for k in keys])


def merge_partition(
    group: pa.Table, cfg: UpsertConfig, epoch: int
) -> pa.Table:
    """``map_groups`` body for one partition_id group: merge new winners with
    the previous epoch's state, apply deletes, commit atomically."""
    store = cfg.store()
    pid = int(group.column("partition_id")[0].as_py())

    existing_manifest = store.read_manifest(pid, epoch)
    if existing_manifest is not None:
        # Replay of a committed epoch → exact no-op (idempotence gate).
        return _lineage_row(existing_manifest, skipped=True)

    prior_epochs = [e for e in store.committed_epochs(pid) if e < epoch]
    if prior_epochs:
        prior = pq.read_table(store.state_path(pid, prior_epochs[-1]))
    else:
        prior = None

    rows_in = group.num_rows
    offsets = group.column(cfg.order_columns[-1])
    min_off = pa.compute.min(offsets).as_py() if rows_in else None
    max_off = pa.compute.max(offsets).as_py() if rows_in else None

    new = group.drop_columns(["partition_id"])
    if prior is not None:
        # Schema evolution: widen prior to the union of both schemas; new
        # fields read as null in old rows (mirrors repackage, SURVEY §4.2.4).
        prior, new = _align_schemas(prior, new, cfg)
        merged = pa.concat_tables([prior, new], promote_options="permissive")
    else:
        merged = new

    winners = lww_winners(merged, cfg)
    tomb = cfg.tombstone_column
    deletes = 0
    if tomb in winners.column_names:
        mask = winners.column(tomb)
        deletes = pa.compute.sum(
            pa.compute.cast(pa.compute.fill_null(mask, False), pa.int64())
        ).as_py() or 0
        keep = pa.compute.invert(pa.compute.fill_null(mask, False))
        winners = winners.filter(keep)

    state = _canonicalize(winners, cfg)

    manifest = store.commit(
        pid,
        epoch,
        lambda tmp: pq.write_table(state, tmp, compression="snappy"),
        lineage={
            "rows_in": rows_in,
            "rows_merged": state.num_rows,
            "deletes_applied": int(deletes),
            "offset_range": [min_off, max_off],
            "num_partitions": cfg.num_partitions,
            "key_columns": list(cfg.key_columns),
            "schema": state.schema.to_string(),
        },
    )
    return _lineage_row(manifest, skipped=False)


def _align_schemas(prior: pa.Table, new: pa.Table, cfg: UpsertConfig):
    """Union-widen the two tables to a common schema (missing columns →
    null; struct widening via core.schema.union_arrow_types)."""
    from connect_smts_ray.core.schema import union_arrow_types

    names = list(dict.fromkeys(prior.column_names + new.column_names))
    out = []
    for t in (prior, new):
        cols = {}
        for name in names:
            a = t.column(name) if name in t.column_names else None
            b_t = (
                new.schema.field(name).type
                if name in new.column_names
                else prior.schema.field(name).type
            )
            a_t = (
                t.schema.field(name).type if name in t.column_names else None
            )
            target = b_t if a_t is None else (
                a_t if a_t == b_t else union_arrow_types(a_t, b_t)
            )
            if a is None:
                cols[name] = pa.nulls(t.num_rows, type=target)
            elif a.type != target:
                cols[name] = pa.compute.cast(a, target)
            else:
                cols[name] = a
        out.append(pa.table(cols))
    return out[0], out[1]


def _lineage_row(manifest: dict, skipped: bool) -> pa.Table:
    return pa.table(
        {
            "partition_id": pa.array([manifest["partition_id"]], type=pa.int32()),
            "epoch": pa.array([manifest["epoch"]], type=pa.int32()),
            "rows_in": pa.array([manifest.get("rows_in", 0)], type=pa.int64()),
            "rows_merged": pa.array([manifest.get("rows_merged", 0)], type=pa.int64()),
            "deletes_applied": pa.array(
                [manifest.get("deletes_applied", 0)], type=pa.int64()
            ),
            "bytes_written": pa.array(
                [manifest.get("bytes_written", 0)], type=pa.int64()
            ),
            "min_offset": pa.array(
                [(manifest.get("offset_range") or [None, None])[0]], type=pa.int64()
            ),
            "max_offset": pa.array(
                [(manifest.get("offset_range") or [None, None])[1]], type=pa.int64()
            ),
            "skipped": pa.array([skipped], type=pa.bool_()),
        }
    )


# ---------------------------------------------------------------------------
# Dataset-level entry points
# ---------------------------------------------------------------------------

def run_upsert(ds, cfg: UpsertConfig, epoch: int = 0):
    """events Dataset → lineage Dataset (consuming it executes the sink)."""
    ds = ds.map_batches(
        lambda b: add_partition_id(b, cfg), batch_format="pyarrow"
    )
    ds = ds.map_batches(lambda b: partial_lww(b, cfg), batch_format="pyarrow")
    return ds.groupby("partition_id").map_groups(
        lambda g: merge_partition(g, cfg, epoch), batch_format="pyarrow"
    )


def read_lake(cfg: UpsertConfig) -> pa.Table:
    """Final table state = f(committed manifests). Small-scale driver read;
    at scale use ``ray.data.read_parquet(store.latest_state_files())``."""
    files = cfg.store().latest_state_files()
    if not files:
        return pa.table({})
    tables = [pq.read_table(f) for f in files]
    return pa.concat_tables(tables, promote_options="permissive")
