"""MERGE INTO — the declarative CDC apply statement over the delta lake.

Delta Lake's ``MERGE INTO target USING source ON key`` (the operation
most CDC pipelines terminate in) expressed Ray-Data-first against this
engine's epoch-delta lake:

    WHEN MATCHED [AND cond]     THEN UPDATE   (source row replaces target)
    WHEN MATCHED [AND cond]     THEN DELETE   (tombstone the key)
    WHEN NOT MATCHED [AND cond] THEN INSERT   (source row appended)

Shape: the source Dataset is routed with the sink's OWN murmur2-%-P
partitioner (``add_partition_id``), then ONE task per touched partition
joins the source slice against that partition's merge-on-read state
(base + deltas — partition-local, never the whole table), applies the
clause matrix vectorized, and commits the outcome as a normal epoch
DELTA through the manifest protocol — so a merge is exactly-once,
resumable, time-travelable and vacuumable like every other epoch, and
untouched partitions write nothing at all.

Clause conditions are named-column predicates evaluated with
``pyarrow.compute`` over the joined (source ⋈ target) row — pass a
callable ``cond(joined: pa.Table) -> BooleanArray`` where target columns
appear under a ``t_`` prefix. ``None`` means unconditional.

LWW interplay: the merge stamps every written row (updates, inserts AND
tombstones) with ``merge_lsn`` as the primary order column, so the merge
wins over prior epochs exactly when its lsn does — the same rule every
other writer follows. Rows the merge does NOT touch are simply absent
from the delta (merge-on-read keeps serving their old winners); no
rewrite amplification.

Source rows with duplicate keys are pre-reduced per key (max order wins,
matching DuckDB's "multiple source rows match" erroring being replaced
by deterministic last-wins — documented divergence, pinned in tests).

Reference analog: none (the reference stops at the Kafka producer; this
extends the engine's sink surface, SURVEY §2.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from connect_smts_ray.core.metrics import emit_merge_lineage
from connect_smts_ray.sinks.upsert import (
    UpsertConfig,
    add_partition_id,
    lww_winners,
    merge_tables,
    _align_schemas,
    _canonicalize,
    _lineage_row,
    _maybe_compact,
)


def _partition_state(store, cfg: UpsertConfig, pid: int) -> pa.Table:
    import pyarrow.parquet as pq

    base, deltas = store.read_plan(pid)
    files = ([store.base_path(pid, base)] if base is not None else []) + [
        store.state_path(pid, e) for e in deltas
    ]
    if not files:
        return pa.table({})
    return merge_tables([pq.read_table(f) for f in files], cfg)


def _true(n: int) -> pa.Array:
    return pa.array(np.ones(n, dtype=bool))


def merge_into(source_ds, cfg: UpsertConfig, merge_lsn: int, epoch: int,
               when_matched_update=True, when_matched_delete=None,
               when_not_matched_insert=True):
    """Apply the MERGE clause matrix of ``source_ds`` onto the lake at
    ``cfg``; returns the per-partition lineage Dataset (consume it to
    drive the write — same contract as ``run_upsert``).

    ``when_matched_update`` / ``when_not_matched_insert``: True, False,
    or ``cond(joined) -> BooleanArray``. ``when_matched_delete``: None
    (no delete clause) or a condition; delete is evaluated FIRST and
    wins over update on rows where both hold (Delta's clause order)."""
    cfg = cfg.resolve()

    def route(b: pa.Table) -> pa.Table:
        return add_partition_id(b, cfg)

    def apply_merge(group: pa.Table) -> pa.Table:
        store = cfg.store()
        pid = int(group.column("partition_id")[0].as_py())

        existing = store.read_manifest(pid, epoch)
        if existing is not None:
            _maybe_compact(store, cfg, pid, epoch)
            emit_merge_lineage(existing, skipped=True)
            return _lineage_row(existing, skipped=True)

        # deterministic last-wins among duplicate source keys; sources
        # without the sink's order columns get constant-zero stand-ins
        # (lww_winners' tie-break then keeps the latest input row)
        for oc in cfg.order_columns:
            if oc not in group.column_names:
                group = group.append_column(
                    pa.field(oc, pa.int64()),
                    pa.array(np.zeros(group.num_rows, np.int64)))
        src = lww_winners(group, cfg)
        src_keys = src.column("__ckey")
        src = src.drop_columns(["partition_id", "__ckey"])

        state = _partition_state(store, cfg, pid)
        if state.num_rows:
            from connect_smts_ray.sinks.upsert import composite_key_array

            st_keys = composite_key_array(state, cfg.key_columns)
            if isinstance(st_keys, pa.ChunkedArray):
                st_keys = st_keys.combine_chunks()
            # one vectorized index_in gives both the match mask and the
            # state-row gather positions (state keys are unique post-LWW,
            # so first-occurrence semantics are exact) — no O(state)
            # Python dict / to_pylist pass per merge task
            pos = pc.index_in(src_keys, value_set=st_keys)
            matched_mask = pc.is_valid(pos)
            pos = pc.cast(pos, pa.int64())
            # target columns for clause predicates, aligned to source order
            t_cols = {
                f"t_{name}": state.column(name).take(pos)
                for name in state.column_names
            }
        else:
            matched_mask = pa.array(np.zeros(src.num_rows, dtype=bool))
            t_cols = {}

        joined = src
        for name, col in t_cols.items():
            joined = joined.append_column(name, col)

        def clause_mask(clause, base_mask):
            if clause is True:
                return base_mask
            if clause in (False, None) or not (pc.sum(base_mask).as_py()
                                               or 0):
                # no row can satisfy the clause — never evaluate the
                # condition (an empty partition state has no t_ columns)
                return pa.array(np.zeros(src.num_rows, dtype=bool))
            return pc.and_(base_mask, pc.fill_null(clause(joined), False))

        unmatched = pc.invert(matched_mask)
        delete_m = clause_mask(when_matched_delete, matched_mask)
        update_m = pc.and_(clause_mask(when_matched_update, matched_mask),
                           pc.invert(delete_m))
        insert_m = clause_mask(when_not_matched_insert, unmatched)

        tomb = cfg.tombstone_column
        lsn_col = cfg.order_columns[0]

        def stamped(t: pa.Table, is_tomb: bool) -> pa.Table:
            if lsn_col in t.column_names:
                t = t.drop_columns([lsn_col])
            t = t.append_column(
                pa.field(lsn_col, pa.int64()),
                pa.array(np.full(t.num_rows, merge_lsn, np.int64)))
            if tomb in t.column_names:
                t = t.drop_columns([tomb])
            return t.append_column(
                pa.field(tomb, pa.bool_()),
                pa.array(np.full(t.num_rows, is_tomb, bool)))

        writes = [
            stamped(src.filter(update_m), False),
            stamped(src.filter(insert_m), False),
            stamped(src.filter(delete_m), True),
        ]
        writes = [w for w in writes if w.num_rows]
        delta = pa.concat_tables(_align_schemas(writes),
                                 promote_options="permissive") \
            if writes else None

        n_upd = pc.sum(update_m).as_py() or 0
        n_ins = pc.sum(insert_m).as_py() or 0
        n_del = pc.sum(delete_m).as_py() or 0

        if delta is None or delta.num_rows == 0:
            # nothing to write for this partition — still commit an empty
            # manifest so a re-run of the same epoch is a recognized no-op
            delta = src.slice(0, 0)
            delta = stamped(delta, False)

        import pyarrow.parquet as pq

        # keys are unique post-LWW and the clause masks are disjoint, so
        # the canonical (key-sorted, column-ordered) form is fully
        # deterministic — without it the delta's byte content would
        # depend on shuffle arrival order (all-tie sort when the source
        # lacked order columns), breaking the commit protocol's
        # byte-stable-file invariant under speculative re-execution
        delta = _canonicalize(delta, cfg)
        manifest = store.commit(
            pid, epoch,
            lambda tmp: pq.write_table(delta, tmp),
            {"rows_in": group.num_rows, "rows_shuffled": group.num_rows,
             "rows_merged": n_upd + n_ins, "deletes_applied": n_del,
             "offset_range": [merge_lsn, merge_lsn]},
        )
        _maybe_compact(store, cfg, pid, epoch)
        emit_merge_lineage(manifest, skipped=False)
        return _lineage_row(manifest, skipped=False)

    routed = source_ds.map_batches(route, batch_format="pyarrow")
    return routed.groupby("partition_id").map_groups(
        apply_merge, batch_format="pyarrow")
