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
record) deletes the key.

Storage layout is EPOCH-DELTA + merge-on-read (round 2; the round-1 design
rewrote the full partition state every epoch — a full-table rewrite per
checkpoint at 100 TB):

- each epoch commits ``delta-epoch={e}.parquet`` holding ONLY that epoch's
  LWW winners, tombstones included (they must survive until merge);
- the partition's current state = LWW-merge of (latest compacted base +
  every delta after it), tombstoned keys dropped at read;
- every ``compact_every`` epochs a base file is compacted from the plan
  (pure function of the committed deltas → idempotent under races and
  replays); bases drop tombstoned keys, which is safe because per-key
  ``commit_lsn`` is non-decreasing across epochs (Kafka per-partition
  ordering, doc/outbox.md:7-12);
- epoch N+1 never rewrites epoch N's bytes (asserted in
  tests/test_replay.py::test_epoch_delta_no_rewrite).

Ordering is order-insensitive (max-reduce), so shuffles, stragglers and
task retries cannot change the result (SURVEY §4.2.5).
"""

from __future__ import annotations

from dataclasses import dataclass

import polars as pl
import pyarrow as pa
import pyarrow.parquet as pq

from connect_smts_ray.core.hashing import murmur2_positive_many
from connect_smts_ray.core.metrics import emit_merge_lineage
from connect_smts_ray.sinks.manifest import ManifestStore

KEY_SEP = "\x1f"


@dataclass(frozen=True)
class UpsertConfig:
    lake_dir: str
    # Partition-count guidance (100-TB design note): P fixes the unit of
    # merge/compaction parallelism AND the state a single merge task must
    # hold — size it so one partition's live state fits a worker's heap:
    # P ≈ ceil(expected_live_bytes / target_partition_bytes), see
    # ``partitions_for``. Prefer the next power of two (splits then keep
    # halving cleanly). P is recorded in ``_table.json`` on first split;
    # ``run_upsert``/readers resolve the authoritative value from there,
    # so a stale config cannot mis-route keys. Undersized tables start
    # small (32) and ``split_partitions`` widens them without a shuffle.
    num_partitions: int = 32
    key_columns: tuple = ("repo", "path")
    order_columns: tuple = ("commit_lsn", "source_offset")
    tombstone_column: str = "is_tombstone"
    # Compact a base every N epochs (deterministic trigger: after epoch e
    # iff (e+1) % N == 0, so replays re-arrive at the same decision).
    # 0 disables compaction (pure delta log).
    compact_every: int = 8

    def store(self) -> ManifestStore:
        return ManifestStore(self.lake_dir)

    @staticmethod
    def partitions_for(est_live_bytes: int,
                       target_partition_bytes: int = 4 << 30) -> int:
        """Derive ``num_partitions`` from the expected LIVE table size
        (post-LWW state, not raw event volume): smallest power of two with
        ≤ ``target_partition_bytes`` per partition. 4 GiB default keeps a
        partition's merge/compaction comfortably inside one worker's heap
        (merge-on-read materializes base + deltas for ONE partition only).
        A 100 TB live table → 32768 partitions; a 10 GB table → 4."""
        p = 1
        while p * target_partition_bytes < est_live_bytes:
            p *= 2
        return max(p, 1)

    def resolve(self) -> "UpsertConfig":
        """Return the config with the AUTHORITATIVE table settings: the
        table's ``_table.json`` supersedes whatever the caller
        constructed — routing with a stale partition count would commit
        deltas to partitions readers never see, and merging with the
        wrong key/order/tombstone columns (a reader rebuilt from
        ``lake_dir`` alone, e.g. the CLI) would KeyError or mis-merge.
        ``run_upsert`` records these on first write."""
        meta = self.store().read_table_meta()
        if not meta:
            return self
        kw = {}
        if int(meta.get("num_partitions",
                        self.num_partitions)) != self.num_partitions:
            kw["num_partitions"] = int(meta["num_partitions"])
        if ("key_columns" in meta
                and tuple(meta["key_columns"]) != tuple(self.key_columns)):
            kw["key_columns"] = tuple(meta["key_columns"])
        if ("order_columns" in meta
                and tuple(meta["order_columns"]) != tuple(self.order_columns)):
            kw["order_columns"] = tuple(meta["order_columns"])
        if ("tombstone_column" in meta
                and meta["tombstone_column"] != self.tombstone_column):
            kw["tombstone_column"] = meta["tombstone_column"]
        if kw:
            import dataclasses

            return dataclasses.replace(self, **kw)
        return self


# ---------------------------------------------------------------------------
# Stage 1: partition id (stateless, vectorized)
# ---------------------------------------------------------------------------

def composite_key_bytes(batch: pa.Table, key_columns) -> list:
    """Unambiguous composite key encoding: each part is length-prefixed
    (``len:value``) with a distinct null marker, so (None, 'x') ≠ ('', 'x')
    and a separator byte inside a value cannot collide with the joint of an
    adjacent key — silent key collisions would merge unrelated rows in the
    LWW reduce.

    Non-string key columns are rendered via the ARROW string cast (bool →
    'true', 2.0 → '2'), not Python ``str()`` ('True', '2.0') — the same
    rendering ``composite_key_array`` uses, so partition routing is
    identical between the scalar and vectorized builders for every key
    dtype (equivalence pinned in tests across str/int/bool/float keys)."""
    cols = []
    for c in key_columns:
        col = batch.column(c)
        if not pa.types.is_string(col.type):
            col = pa.compute.cast(col, pa.string())
        cols.append(col.to_pylist())
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


def composite_key_array(batch: pa.Table, key_columns) -> pa.Array:
    """Vectorized builder of the same encoding as ``composite_key_bytes``
    (pure Arrow kernels — no per-row Python; equality with the scalar
    builder is pinned in tests). Returns a utf8 array whose UTF-8 bytes
    are the key bytes."""
    import pyarrow.compute as pc

    parts = []
    for c in key_columns:
        col = batch.column(c)
        if not pa.types.is_string(col.type):
            col = pc.cast(col, pa.string())
        lens = pc.cast(pc.utf8_length(col), pa.string())
        prefixed = pc.binary_join_element_wise(lens, col, ":")
        parts.append(
            pc.if_else(pc.is_null(col), pa.scalar("n:"), prefixed)
        )
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, KEY_SEP)


def add_partition_id(batch: pa.Table, cfg: UpsertConfig) -> pa.Table:
    """Append ``partition_id`` (murmur2 of the composite key % P) and the
    composite key itself as ``__ckey`` — the combiner reuses it for winner
    selection (single-column hashing beats re-hashing the key columns) and
    for the exact per-key lineage telemetry; the merger drops it."""
    if batch.num_rows == 0:
        batch = batch.append_column(
            pa.field("partition_id", pa.int32()), pa.array([], type=pa.int32())
        )
        return batch.append_column(
            pa.field("__ckey", pa.string()), pa.array([], type=pa.string())
        )
    keys = composite_key_array(batch, cfg.key_columns)
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    hashes = murmur2_positive_many(keys)
    pids = (hashes % cfg.num_partitions).astype("int32")
    batch = batch.append_column(
        pa.field("partition_id", pa.int32()), pa.array(pids, type=pa.int32())
    )
    return batch.append_column(pa.field("__ckey", pa.string()), keys)


# ---------------------------------------------------------------------------
# LWW winner selection (shared by combiner + merger)
# ---------------------------------------------------------------------------

def lww_winners(table: pa.Table, cfg: UpsertConfig) -> pa.Table:
    """Per key, keep the single row with max order columns. Vectorized.

    Fast path: numeric order columns → numpy lexsort (best row first, stable)
    + pandas hash-based duplicated() over the key columns — ~5× cheaper than
    the polars sort+unique it replaces, which was the single most expensive
    stage of the replay pipeline (13.8 µs/event of 42 total; the combiner
    runs over every pre-shuffle batch). Non-numeric order columns fall back
    to the polars path (identical semantics)."""
    if table.num_rows == 0:
        return table
    try:
        import numpy as np

        # NULL in any order column: to_numpy coerces int64+null to
        # float64 NaN, which lexsort ranks LAST (as if largest) while the
        # polars path ranks nulls FIRST (smallest) — route to ONE
        # deterministic path instead of diverging by dtype
        if any(table.column(c).null_count for c in cfg.order_columns):
            raise TypeError("null in order column")
        arrays = [
            table.column(c).to_numpy(zero_copy_only=False)
            for c in cfg.order_columns
        ]
        # Negation is only order-reversing for signed ints and floats —
        # unsigned negation WRAPS (uint 0 would rank as the max and the
        # wrong row silently wins), and datetime/str don't negate. Anything
        # else takes the polars path below.
        if not all(a.dtype.kind in ("i", "f") for a in arrays):
            raise TypeError("non-signed-numeric order column")
        n = len(arrays[0])
        # lexsort: LAST key is primary → reversed; negated → descending.
        # Least-significant tiebreak = descending original index, so among
        # fully-tied order columns the LATEST input row sorts first — the
        # same winner the polars keep="last" fallback picks.
        order = np.lexsort(
            (-np.arange(n),) + tuple(-a for a in reversed(arrays))
        )
    except (TypeError, ValueError):
        df = pl.from_arrow(table)
        # maintain_order on the SORT too: an unstable sort may interleave
        # fully-tied rows differently per run/thread-count, and
        # keep="last" would then pick an arbitrary winner — breaking the
        # byte-stable reconvergence the numpy path guarantees (latest
        # input row wins among ties)
        df = df.sort(list(cfg.order_columns), maintain_order=True).unique(
            subset=list(cfg.key_columns), keep="last", maintain_order=True
        )
        return df.to_arrow()
    reordered = table.take(pa.array(order))
    import pandas as pd

    keydf = pd.DataFrame({
        c: reordered.column(c).to_pandas() for c in cfg.key_columns
    })
    keep = ~keydf.duplicated(list(cfg.key_columns), keep="first").to_numpy()
    return reordered.filter(pa.array(keep))


_TELEMETRY_COLS = ("__rows_rep", "__min_off", "__max_off")


def partial_lww(batch: pa.Table, cfg: UpsertConfig) -> pa.Table:
    """The pre-shuffle combiner. Tombstone rows are kept (they may win).

    When ``add_partition_id`` ran first (``__ckey`` present), each winner
    also carries exact per-key telemetry for this batch — ``__rows_rep``
    (events it collapsed), ``__min_off``/``__max_off`` (true offset
    extremes) — so the merger's lineage reports EVENT counts and offset
    ranges, not combiner-output artifacts that would depend on block
    layout. That makes the lineage a pure function of the input stream
    (and therefore SQL-oracle-checkable by the driver)."""
    if "__ckey" not in batch.column_names:
        return lww_winners(batch, cfg)
    off_col = cfg.order_columns[-1]
    if batch.num_rows == 0:
        off_type = batch.schema.field(off_col).type
        for name, typ in zip(
            _TELEMETRY_COLS, (pa.int64(), off_type, off_type)
        ):
            batch = batch.append_column(
                pa.field(name, typ), pa.array([], type=typ)
            )
        return batch
    import numpy as np
    import pandas as pd

    codes, _ = pd.factorize(
        batch.column("__ckey").to_pandas(), use_na_sentinel=False
    )
    k = int(codes.max()) + 1
    counts = np.bincount(codes, minlength=k)
    off = batch.column(off_col).to_numpy(zero_copy_only=False)
    try:
        # a single NULL offset/order value coerces the numpy arrays to
        # float64 NaN: np.minimum.at propagates NaN into __min_off and
        # merge_partition later dies casting inf/NaN to int64 — nulls
        # take the generic cold path, whose pandas reduce skips them
        if any(batch.column(c).null_count for c in cfg.order_columns):
            raise TypeError("null in order column")
        arrays = [
            batch.column(c).to_numpy(zero_copy_only=False)
            for c in cfg.order_columns
        ]
        if not all(a.dtype.kind in ("i", "f") for a in arrays):
            raise TypeError("non-signed-numeric order column")
        if off.dtype.kind not in ("i", "f"):
            raise TypeError("non-numeric offset column")
        n = len(codes)
        order = np.lexsort(
            (-np.arange(n),) + tuple(-a for a in reversed(arrays))
        )
        codes_r = codes[order]
        keep = ~pd.Series(codes_r).duplicated().to_numpy()
        if off.dtype.kind == "i":
            mn = np.full(k, np.iinfo(off.dtype).max, dtype=off.dtype)
            mx = np.full(k, np.iinfo(off.dtype).min, dtype=off.dtype)
        else:
            mn = np.full(k, np.inf, dtype=off.dtype)
            mx = np.full(k, -np.inf, dtype=off.dtype)
        np.minimum.at(mn, codes, off)
        np.maximum.at(mx, codes, off)
        winners = batch.take(pa.array(order[keep]))
        wcodes = codes_r[keep]
    except (TypeError, ValueError):
        # generic dtypes (cold path): winners via the polars fallback;
        # telemetry via a per-key pandas reduce keyed on __ckey
        winners = lww_winners(batch, cfg)
        g = pd.DataFrame({
            "ck": batch.column("__ckey").to_pandas(),
            "o": batch.column(off_col).to_pandas(),
        }).groupby("ck", sort=False)["o"].agg(["size", "min", "max"])
        wk = winners.column("__ckey").to_pandas()
        winners = winners.append_column(
            "__rows_rep",
            pa.array(g["size"][wk].to_numpy().astype("int64")),
        )
        off_type = batch.schema.field(off_col).type

        def _vals(s):
            # pandas min/max skip nulls; an all-null group yields NaN,
            # which int/string Arrow types reject -> None
            return [None if pd.isna(v) else v for v in s.tolist()]

        winners = winners.append_column(
            "__min_off", pa.array(_vals(g["min"][wk]), type=off_type)
        )
        return winners.append_column(
            "__max_off", pa.array(_vals(g["max"][wk]), type=off_type)
        )
    winners = winners.append_column(
        "__rows_rep", pa.array(counts[wcodes].astype(np.int64))
    )
    winners = winners.append_column("__min_off", pa.array(mn[wcodes]))
    return winners.append_column("__max_off", pa.array(mx[wcodes]))


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
    """``map_groups`` body for one partition_id group: LWW-reduce the
    epoch's rows and commit them as that epoch's DELTA (tombstones kept —
    merge-on-read applies them), then compact a base when due. Never reads
    or rewrites previous epochs' delta bytes."""
    store = cfg.store()
    pid = int(group.column("partition_id")[0].as_py())

    existing_manifest = store.read_manifest(pid, epoch)
    if existing_manifest is not None:
        # Replay of a committed epoch → exact no-op (idempotence gate).
        # Still ensure the deterministic compaction for this epoch exists
        # (the interrupted run may have died between commit and compact).
        _maybe_compact(store, cfg, pid, epoch)
        emit_merge_lineage(existing_manifest, skipped=True)
        return _lineage_row(existing_manifest, skipped=True)

    has_telemetry = "__rows_rep" in group.column_names
    if has_telemetry:
        # exact event-stream lineage (see partial_lww): counts/extremes
        # over every event routed here, not over combiner survivors
        rows_in = pa.compute.sum(group.column("__rows_rep")).as_py() or 0
        min_off = pa.compute.min(group.column("__min_off")).as_py()
        max_off = pa.compute.max(group.column("__max_off")).as_py()
    else:
        rows_in = group.num_rows
        offsets = group.column(cfg.order_columns[-1])
        min_off = pa.compute.min(offsets).as_py() if rows_in else None
        max_off = pa.compute.max(offsets).as_py() if rows_in else None

    drop = ["partition_id"] + [
        c for c in ("__ckey",) + _TELEMETRY_COLS if c in group.column_names
    ]
    winners = lww_winners(group.drop_columns(drop), cfg)
    tomb = cfg.tombstone_column
    deletes = 0
    if tomb in winners.column_names:
        mask = pa.compute.fill_null(winners.column(tomb), False)
        deletes = pa.compute.sum(
            pa.compute.cast(mask, pa.int64())
        ).as_py() or 0

    delta = _canonicalize(winners, cfg)

    manifest = store.commit(
        pid,
        epoch,
        lambda tmp: pq.write_table(delta, tmp, compression="snappy"),
        lineage={
            "rows_in": rows_in,
            # rows that actually crossed the shuffle (combiner output) —
            # the hot-key-bound telemetry; rows_in is exact event counts
            "rows_shuffled": group.num_rows,
            # live winners this epoch (delta rows minus tombstone winners)
            "rows_merged": delta.num_rows - int(deletes),
            "deletes_applied": int(deletes),
            "offset_range": [min_off, max_off],
            "num_partitions": cfg.num_partitions,
            "key_columns": list(cfg.key_columns),
            "schema": delta.schema.to_string(),
        },
    )
    _maybe_compact(store, cfg, pid, epoch)
    emit_merge_lineage(manifest, skipped=False)
    return _lineage_row(manifest, skipped=False)


def merge_tables(tables: list, cfg: UpsertConfig,
                 drop_tombstones: bool = True) -> pa.Table:
    """Merge-on-read: align schemas (union-widening — new fields read as
    null in older files, mirroring repackage, SURVEY §4.2.4), concat, LWW
    per key, optionally drop tombstoned keys, canonicalize."""
    aligned = _align_schemas(tables)
    merged = pa.concat_tables(aligned, promote_options="permissive")
    winners = lww_winners(merged, cfg)
    tomb = cfg.tombstone_column
    if drop_tombstones and tomb in winners.column_names:
        keep = pa.compute.invert(
            pa.compute.fill_null(winners.column(tomb), False)
        )
        winners = winners.filter(keep)
    return _canonicalize(winners, cfg)


def _maybe_compact(store: ManifestStore, cfg: UpsertConfig, pid: int,
                   epoch: int) -> None:
    """Deterministic compaction: after epoch e iff (e+1) % compact_every
    == 0. The base is a pure function of the committed deltas it covers →
    identical bytes no matter which run (first, resumed, replayed, racing
    retry) computes it; commit_base is atomic + idempotent."""
    if cfg.compact_every <= 0 or (epoch + 1) % cfg.compact_every != 0:
        return
    if store.read_base_manifest(pid, epoch) is not None:
        return
    bases = [b for b in store.committed_base_epochs(pid) if b <= epoch]
    prev_base = bases[-1] if bases else None
    tables = []
    if prev_base is not None:
        tables.append(pq.read_table(store.base_path(pid, prev_base)))
    prev_cover = (
        store.base_covers_through(pid, prev_base)
        if prev_base is not None else None
    )
    delta_epochs = [
        e for e in store.committed_epochs(pid)
        if e <= epoch and (prev_cover is None or e > prev_cover)
    ]
    tables.extend(
        pq.read_table(store.state_path(pid, e)) for e in delta_epochs
    )
    if not tables:
        return
    base = merge_tables(tables, cfg, drop_tombstones=True)
    store.commit_base(
        pid, epoch,
        lambda tmp: pq.write_table(base, tmp, compression="snappy"),
        lineage={
            "covers_epochs": delta_epochs,
            "prev_base": prev_base,
            "rows_merged": base.num_rows,
            "schema": base.schema.to_string(),
        },
    )


def _align_schemas(tables: list) -> list:
    """Union-widen N tables to a common schema (missing columns → typed
    nulls; struct widening via core.schema.union_arrow_types)."""
    from connect_smts_ray.core.schema import union_arrow_types

    names: list = []
    target: dict = {}
    for t in tables:
        for name in t.column_names:
            ft = t.schema.field(name).type
            if name not in target:
                names.append(name)
                target[name] = ft
            elif target[name] != ft:
                target[name] = union_arrow_types(target[name], ft)
    out = []
    for t in tables:
        cols = {}
        for name in names:
            if name in t.column_names:
                a = t.column(name)
                cols[name] = (
                    a if a.type == target[name]
                    else pa.compute.cast(a, target[name])
                )
            else:
                cols[name] = pa.nulls(t.num_rows, type=target[name])
        out.append(pa.table(cols))
    return out


def _int_or_none(v):
    return v if isinstance(v, int) and not isinstance(v, bool) else None


def _lineage_row(manifest: dict, skipped: bool) -> pa.Table:
    return pa.table(
        {
            "partition_id": pa.array([manifest["partition_id"]], type=pa.int32()),
            "epoch": pa.array([manifest["epoch"]], type=pa.int32()),
            "rows_in": pa.array([manifest.get("rows_in", 0)], type=pa.int64()),
            "rows_shuffled": pa.array(
                [manifest.get("rows_shuffled", 0)], type=pa.int64()
            ),
            "rows_merged": pa.array([manifest.get("rows_merged", 0)], type=pa.int64()),
            "deletes_applied": pa.array(
                [manifest.get("deletes_applied", 0)], type=pa.int64()
            ),
            "bytes_written": pa.array(
                [manifest.get("bytes_written", 0)], type=pa.int64()
            ),
            # lineage offsets are int64; a table ordered by a
            # non-integer column (string offsets via the polars path)
            # records NULL here instead of crashing the merge — the
            # manifest's offset_range keeps the typed values
            "min_offset": pa.array(
                [_int_or_none(
                    (manifest.get("offset_range") or [None, None])[0])],
                type=pa.int64()
            ),
            "max_offset": pa.array(
                [_int_or_none(
                    (manifest.get("offset_range") or [None, None])[1])],
                type=pa.int64()
            ),
            "skipped": pa.array([skipped], type=pa.bool_()),
        }
    )


# ---------------------------------------------------------------------------
# Partition split (compaction-time escape hatch for oversized partitions)
# ---------------------------------------------------------------------------

def split_partitions(cfg: UpsertConfig, factor: int = 2) -> UpsertConfig:
    """Widen the table from P to ``factor``·P partitions WITHOUT a shuffle.

    Because partition routing is ``murmur2(key) % P``, a key in parent
    ``pid`` can only land in child ids ``{pid + j·P : 0 ≤ j < factor}``
    under the new modulus — every parent splits locally into its own
    children, so the rewrite is one independent task per parent (run them
    distributed at scale; driver-side loop here).

    Protocol (safe under crashes and replays):
    - per parent: merge-on-read the current state, re-route rows with the
      NEW modulus, commit each child's rows as a compacted BASE at a fresh
      epoch ``E_split`` = max committed epoch + 1. Child j=0 shares the
      parent's pid; its new base supersedes the parent's older files in
      ``read_plan`` (latest base wins), so no collision and full audit
      history.
    - finally record the new P in ``_table.json``; ``UpsertConfig.resolve``
      makes every later writer/reader adopt it.
    - replaying an epoch ≤ E_split afterwards: old pids skip via their
      manifests; new child pids commit deltas BELOW their base epoch,
      which ``read_plan`` ignores — correct, since the split base already
      contains those events (they were in the parent's state).

    Returns the post-split config. Byte-exact state preservation is pinned
    in tests/test_split.py."""
    import dataclasses

    if factor < 2:
        return cfg
    cfg = cfg.resolve()
    store = cfg.store()
    old_p = cfg.num_partitions
    new_p = old_p * factor
    new_cfg = dataclasses.replace(cfg, num_partitions=new_p)
    parents = store.all_partitions()
    # E_split must exceed EVERY committed epoch number in the table —
    # delta epochs AND base epochs. A previous split commits bases at its
    # own E_split with no accompanying deltas, so a max over delta epochs
    # alone could reuse that number: commit_base's idempotent skip would
    # then keep the stale j=0 bases (verified: duplicated keys), and a
    # below-base replayed delta could even push the max BELOW the current
    # base, numbering the new bases where read_plan never looks.
    def _max_epoch(pid: int) -> int:
        bases = store.committed_base_epochs(pid)
        return max(
            max(store.committed_epochs(pid), default=-1),
            max(bases, default=-1),
        )

    e_split = max((_max_epoch(pid) for pid in parents), default=-1) + 1
    for pid in parents:
        base, deltas = store.read_plan(pid)
        tables = []
        if base is not None:
            tables.append(pq.read_table(store.base_path(pid, base)))
        tables.extend(pq.read_table(store.state_path(pid, e)) for e in deltas)
        if not tables:
            continue
        state = merge_tables(tables, cfg, drop_tombstones=True)
        if state.num_rows == 0:
            continue
        keys = composite_key_array(state, cfg.key_columns)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        child = murmur2_positive_many(keys) % new_p
        for j in range(factor):
            child_pid = pid + j * old_p
            part = state.filter(pa.array(child == child_pid))
            # j=0 shares the parent's pid: its new base is what SUPERSEDES
            # the parent's old files, so it must be committed even when
            # empty — skipping it leaves the old base visible and the rows
            # that moved to j>0 children appear twice (r3 review finding,
            # reproduced with a split whose parent keeps zero keys).
            if part.num_rows == 0 and j > 0:
                continue
            part = _canonicalize(part, cfg)
            store.commit_base(
                child_pid, e_split,
                lambda tmp, t=part: pq.write_table(
                    t, tmp, compression="snappy"
                ),
                lineage={
                    "split_from": pid,
                    "split_factor": factor,
                    # the base is NUMBERED e_split (to supersede the
                    # parent's files) but only CONTAINS epochs ≤ e_split-1
                    # — deltas later committed at exactly e_split must
                    # still merge on read (manifest.base_covers_through)
                    "covers_through": e_split - 1,
                    "rows_merged": part.num_rows,
                    "schema": part.schema.to_string(),
                },
            )
    # UPDATE the meta, never replace it wholesale — _table.json also
    # carries tags, branches, vacuum horizons and the order/tombstone
    # schema; overwriting them would unpin every named cut and mis-merge
    # custom tables (round-5 review finding, reproduced)
    store.mutate_table_meta(lambda m: m.update({
        "num_partitions": new_p,
        "split_epoch": e_split,
        "key_columns": list(cfg.key_columns),
    }))
    return new_cfg


# ---------------------------------------------------------------------------
# Dataset-level entry points
# ---------------------------------------------------------------------------

def run_upsert(ds, cfg: UpsertConfig, epoch: int = 0):
    """events Dataset → lineage Dataset (consuming it executes the sink)."""
    cfg = cfg.resolve()
    # record the table's key/order/tombstone schema on first write so a
    # reader rebuilt from lake_dir alone (the CLI, another job) resolves
    # the SAME merge semantics — resolve() treats _table.json as
    # authoritative, like it already does for num_partitions
    store = cfg.store()
    if "key_columns" not in (store.read_table_meta() or {}):
        def record(m: dict) -> None:
            if "key_columns" in m:  # raced another first-writer: keep its
                return
            m.update({
                "key_columns": list(cfg.key_columns),
                "order_columns": list(cfg.order_columns),
                "tombstone_column": cfg.tombstone_column,
                # P too: without it a later writer constructed from
                # lake_dir alone (default P) would route the same key to
                # different partitions across epochs and the LWW merge
                # would never see both versions (resolve() can only
                # protect what the meta records)
                "num_partitions": cfg.num_partitions,
            })

        store.mutate_table_meta(record)
    ds = ds.map_batches(
        lambda b: add_partition_id(b, cfg), batch_format="pyarrow"
    )
    ds = ds.map_batches(lambda b: partial_lww(b, cfg), batch_format="pyarrow")
    return ds.groupby("partition_id").map_groups(
        lambda g: merge_partition(g, cfg, epoch), batch_format="pyarrow"
    )


def _resolve_cut(store, as_of: int | None, tag: str | None) -> int | None:
    """One read-time cut from (as_of | tag) — a tag is just a named,
    vacuum-pinned as_of (sinks/manifest.py: create_tag)."""
    if tag is None:
        return as_of
    if as_of is not None:
        raise ValueError("pass either as_of or tag, not both")
    from connect_smts_ray.sinks.manifest import resolve_tag

    return resolve_tag(store, tag)


def read_lake_ds(cfg: UpsertConfig, as_of: int | None = None,
                 tag: str | None = None):
    """Distributed merge-on-read: one task per partition runs
    ``merge_tables`` over that partition's (base + deltas) — partitions are
    independent, so the read scales with partitions and no single node ever
    holds more than one partition's state. This is the 100-TB read path;
    ``read_lake`` below is the small-scale driver-side convenience.
    ``as_of``: time-travel to the state after epoch ``as_of`` (the delta
    log keeps every epoch immutable, so any cut reconstructs exactly).
    ``tag``: read a named snapshot tag instead (mutually exclusive)."""
    import ray.data

    cfg = cfg.resolve()
    store = cfg.store()
    as_of = _resolve_cut(store, as_of, tag)
    items = []
    index = store.manifest_index()
    for pid in sorted(set(index["deltas"]) | set(index["bases"])):
        base, deltas = store.read_plan(pid, as_of=as_of, index=index)
        files = ([store.base_path(pid, base)] if base is not None else []) + [
            store.state_path(pid, e) for e in deltas
        ]
        if files:
            items.append({"pid": pid, "files": files})

    def merge_batch(b: pa.Table) -> pa.Table:
        outs = []
        for row in b.to_pylist():
            tables = [pq.read_table(f) for f in row["files"]]
            outs.append(merge_tables(tables, cfg))
        return pa.concat_tables(_align_schemas(outs))

    if not items:
        return ray.data.from_items([])
    # batch_size=1 → exactly one merge task per partition
    return ray.data.from_items(items).map_batches(
        merge_batch, batch_size=1, batch_format="pyarrow"
    )


def read_lake(cfg: UpsertConfig, as_of: int | None = None,
              tag: str | None = None) -> pa.Table:
    """Final table state = f(committed manifests): per partition, LWW
    merge-on-read of (latest base + subsequent deltas), tombstones applied.
    Small-scale driver read; at scale run the same per-partition
    ``merge_tables`` distributed — one task per partition over
    ``store.read_plan(pid)``'s files (partitions are independent).
    ``tag`` reads a named snapshot tag (see sinks/manifest.create_tag)."""
    cfg = cfg.resolve()
    store = cfg.store()
    as_of = _resolve_cut(store, as_of, tag)
    parts = []
    index = store.manifest_index()
    for pid in sorted(set(index["deltas"]) | set(index["bases"])):
        base, deltas = store.read_plan(pid, as_of=as_of, index=index)
        tables = []
        if base is not None:
            tables.append(pq.read_table(store.base_path(pid, base)))
        tables.extend(pq.read_table(store.state_path(pid, e)) for e in deltas)
        if tables:
            parts.append(merge_tables(tables, cfg))
    if not parts:
        return pa.table({})
    return pa.concat_tables(_align_schemas(parts))
