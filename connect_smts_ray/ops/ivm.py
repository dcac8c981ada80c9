"""Incremental view maintenance (IVM) over a CDC changelog.

The CDC thesis, applied to aggregates: a grouped view ``SELECT g,
count(*), sum(m) FROM state GROUP BY g`` over the lake's live table can be
maintained from the change stream ALONE — no scan of the table, no
materialized state — by turning every event into retraction deltas
(Gupta & Mumick, "Maintenance of Materialized Views", IEEE DE Bulletin
1995; the delta/z-set formulation of streaming engines):

    upsert (c/u) at a key with prior live state p:  (-p) then (+new)
    delete (d)  at a key with prior live state p:   (-p)
    anything at a key with no prior live state:      (+new) for c/u only

Summing the deltas per group reproduces EXACTLY the aggregate of the
final replayed table (LWW per-key winner, winning delete removes the
key) — pinned against the pure-SQL final-state oracle in
tests/test_ivm.py and the driver's ``ivm_repo_stats`` query.

Scale shape (the sessionization pattern, relational.py:1046): the prior
state of a key lives at the PREVIOUS event of that key under a per-key
lsn sort, so keys hash-BUCKET into ``num_partitions`` groups, each whole
bucket sorts ONCE by (key, lsn), and a segmented shift materializes every
retraction in one vectorized pass — one Python call per bucket, one
shuffle total, per-bucket Arrow partials before the final tiny groupby.
Nothing driver-side ever holds more than |groups| rows.

``changelog_aggregate_epochs`` is the genuinely incremental form: the
stream arrives in epoch chunks and only (a) per-bucket key→last-state
checkpoints and (b) the per-group delta table cross epoch boundaries —
the replayed table itself is never materialized. Checkpoint writes are
deterministic content + atomic ``os.replace`` (idempotent under task
retry / crash-rerun, the manifest discipline of sinks/manifest.py).

Reference analog: none — engine op beyond the reference's surface; it
consumes the same Debezium-flattened stream the LWW sink does
(is_tombstone marker, transforms/outbox.py:187).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from connect_smts_ray.ops.components import fuse_key_columns
from connect_smts_ray.ops.relational import _add_key_bucket

_STATE_COLS = ("__mkey", "live", "group", "measure")


def _delta_empty() -> pa.Table:
    return pa.table({"group": pa.array([], pa.string()),
                     "dn": pa.array([], pa.int64()),
                     "dm": pa.array([], pa.int64())})


def _bucket_deltas(tbl: pa.Table, lsn_col: str, delete_col: str,
                   group_col: str, measure_col: str,
                   synthetic_mask: np.ndarray | None = None) -> pa.Table:
    """One bucket's retraction deltas, vectorized: sort by (key, lsn),
    segmented shift for the prior state, one Arrow group_by partial.
    ``synthetic_mask`` marks carried-in state rows (epoch variant) whose
    own +delta was already counted in an earlier epoch — they contribute
    only as retraction *targets*."""
    n = tbl.num_rows
    if n == 0:
        return _delta_empty()
    order = pc.sort_indices(tbl, sort_keys=[("__mkey", "ascending"),
                                            (lsn_col, "ascending")])
    tbl = tbl.take(order)
    keys = tbl.column("__mkey").to_numpy(zero_copy_only=False)
    is_del = pc.fill_null(tbl.column(delete_col), False) \
        .to_numpy(zero_copy_only=False).astype(bool)
    group = pc.cast(tbl.column(group_col), pa.string()).combine_chunks()
    measure = pc.fill_null(pc.cast(tbl.column(measure_col), pa.int64()), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    synth = np.zeros(n, dtype=bool) if synthetic_mask is None else \
        synthetic_mask.astype(bool)[order.to_numpy(zero_copy_only=False)]

    # prior state of row i = row i-1 iff same key and i-1 was live
    prev_live = np.zeros(n, dtype=bool)
    if n > 1:
        prev_live[1:] = (keys[1:] == keys[:-1]) & ~is_del[:-1]

    plus_idx = np.nonzero(~is_del & ~synth)[0]
    minus_idx = np.nonzero(prev_live & ~synth)[0] - 1  # retract the prior row
    if len(plus_idx) == 0 and len(minus_idx) == 0:
        return _delta_empty()

    g = pa.concat_arrays([
        group.take(pa.array(plus_idx, pa.int64())),
        group.take(pa.array(minus_idx, pa.int64())),
    ])
    dn = np.concatenate([np.ones(len(plus_idx), np.int64),
                         -np.ones(len(minus_idx), np.int64)])
    dm = np.concatenate([measure[plus_idx], -measure[minus_idx]])
    part = pa.table({"group": g, "dn": pa.array(dn), "dm": pa.array(dm)}) \
        .group_by("group", use_threads=False) \
        .aggregate([("dn", "sum"), ("dm", "sum")])
    return pa.table({"group": part.column("group"),
                     "dn": part.column("dn_sum"),
                     "dm": part.column("dm_sum")})


def _finalize(ds, n_name: str, m_name: str):
    """Global delta sum → live groups only (a group whose keys all died
    sums to exactly (0, 0) — integers, so the filter is exact)."""
    from ray.data.aggregate import Sum

    out = ds.groupby("group").aggregate(Sum("dn"), Sum("dm"))
    return out.map_batches(
        lambda b: pa.table({
            "group": b.column("group"),
            n_name: b.column("sum(dn)"),
            m_name: b.column("sum(dm)"),
        }).filter(pc.greater(b.column("sum(dn)"), 0)),
        batch_format="pyarrow")


def changelog_aggregate(ds, key_cols, lsn_col: str, delete_col: str,
                        group_col: str, measure_col: str,
                        num_partitions: int = 64,
                        n_name: str = "n_keys", m_name: str = "total"):
    """Single-pass delta-stream aggregation: the grouped view of the
    final replayed table computed from the changelog alone (module
    docstring). Output: (group, ``n_name`` = live keys, ``m_name`` =
    exact int64 sum of ``measure_col`` over live keys)."""

    # prune BEFORE the bucket shuffle: only the key/lsn/delete/group/measure
    # columns move — the payload (content at ~KB/row) stays behind
    need = [*dict.fromkeys([*key_cols, lsn_col, delete_col, group_col,
                            measure_col])]
    # the fused __mkey is the authoritative key downstream; drop the raw
    # key columns EXCEPT any that double as the lsn/delete/group/measure
    # column (e.g. grouping a composite-keyed table by one key component)
    referenced = {lsn_col, delete_col, group_col, measure_col}
    key_drop = [c for c in key_cols if c not in referenced]

    bucketer = _add_key_bucket("__mkey", num_partitions)

    def prep(b: pa.Table) -> pa.Table:
        return bucketer(fuse_key_columns(b.select(need), key_cols)
                        .drop_columns(key_drop))

    def per_bucket(group: pa.Table) -> pa.Table:
        return _bucket_deltas(group, lsn_col, delete_col, group_col,
                              measure_col)

    deltas = (ds.map_batches(prep, batch_format="pyarrow")
                .groupby("__bucket")
                .map_groups(per_bucket, batch_format="pyarrow"))
    return _finalize(deltas, n_name, m_name)


def emit_change_feed(old, new, key_cols, value_cols,
                     num_partitions: int = 16):
    """CDC feed GENERATION — the inverse of the replay sink: diff two
    snapshots of a keyed table into a Debezium-flattened changelog
    (op ``c``/``u``/``d``, ``before_<col>``/``after_<col>`` images,
    typed-null on the absent side) ready to drive a downstream
    ``changelog_aggregate`` or LWW upsert. Built on ``table_diff``'s
    single bucketed exchange (relational.py:1102); unchanged keys emit
    nothing. Snapshot-based feeds carry no lsn — consumers order by feed
    generation, the anti-entropy convention.

    Reference analog: the Outbox transform's op envelope
    (smt/Outbox.java:70-132) read in reverse — the engine *produces* the
    change stream a connect-smts deployment would consume."""
    from connect_smts_ray.ops.relational import table_diff

    diff = table_diff(old, new, key_cols, value_cols, num_partitions)

    def envelope(b: pa.Table) -> pa.Table:
        ct = b.column("change_type")
        op = pc.case_when(
            pc.make_struct(
                pc.equal(ct, pa.scalar("added")),
                pc.equal(ct, pa.scalar("changed"))),
            pa.scalar("c"), pa.scalar("u"), pa.scalar("d"))
        cols = {c: b.column(c) for c in key_cols}
        cols["op"] = op
        for c in value_cols:
            cols[f"before_{c}"] = b.column(f"old_{c}")
            cols[f"after_{c}"] = b.column(f"new_{c}")
        return pa.table(cols)

    return diff.map_batches(envelope, batch_format="pyarrow")


# -- epoch-incremental form -------------------------------------------------

def _state_path(state_dir: str, epoch: int, bucket: int) -> str:
    return os.path.join(state_dir, f"epoch={epoch}",
                        f"bucket={bucket:05d}.parquet")


def _read_bucket_state(state_dir: str, bucket: int,
                       upto_epoch: int) -> pa.Table | None:
    """Most recent checkpoint for a bucket at or before ``upto_epoch``
    (buckets untouched by an epoch write no file — state carries by
    falling back to the last epoch that did)."""
    for e in range(upto_epoch, -1, -1):
        p = _state_path(state_dir, e, bucket)
        if os.path.exists(p):
            return pq.read_table(p)
    return None


def _write_bucket_state(state_dir: str, epoch: int, bucket: int,
                        state: pa.Table) -> None:
    """Idempotent checkpoint: deterministic content, atomic replace —
    a retried task rewrites byte-identical state."""
    path = _state_path(state_dir, epoch, bucket)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(state, tmp)
    os.replace(tmp, path)


def changelog_aggregate_epochs(make_epoch_ds, epochs: int, state_dir: str,
                               key_cols, lsn_col: str, delete_col: str,
                               group_col: str, measure_col: str,
                               num_partitions: int = 16,
                               n_name: str = "n_keys",
                               m_name: str = "total") -> pa.Table:
    """Epoch-incremental IVM: ``make_epoch_ds(e)`` yields epoch ``e``'s
    slice of the changelog (per-key lsn monotone across epochs — the
    Kafka ordering guarantee the LWW sink relies on). Each epoch moves
    only its own events plus O(live keys in touched buckets) of carried
    state; the per-group delta table (≤ |groups| rows) is the only thing
    crossing epochs on the driver. Equality with the single-pass form and
    with a full recompute is pinned in tests/test_ivm.py."""
    need = [*dict.fromkeys([*key_cols, lsn_col, delete_col, group_col,
                            measure_col])]
    # same collision rule as changelog_aggregate: keep raw key columns
    # that double as the lsn/delete/group/measure column
    referenced = {lsn_col, delete_col, group_col, measure_col}
    key_drop = [c for c in key_cols if c not in referenced]
    merged: dict = {}
    for e in range(epochs):
        ds = make_epoch_ds(e)

        bucketer = _add_key_bucket("__mkey", num_partitions)

        def prep(b: pa.Table) -> pa.Table:
            return bucketer(fuse_key_columns(b.select(need), key_cols)
                            .drop_columns(key_drop))

        def per_bucket(group: pa.Table, _e=e) -> pa.Table:
            bucket = group.column("__bucket")[0].as_py()
            ev = group.select(
                ["__mkey", lsn_col, delete_col, group_col, measure_col])
            n_ev = ev.num_rows
            prior = _read_bucket_state(state_dir, bucket, _e - 1) \
                if _e > 0 else None
            if prior is not None and prior.num_rows:
                # carried state enters as synthetic rows below every real
                # lsn; dead keys carry too (a later re-insert must NOT
                # retract them — live=False keeps prev_live False).
                synth_rows = pa.table({
                    "__mkey": prior.column("__mkey"),
                    lsn_col: pa.array(
                        np.full(prior.num_rows, -1, np.int64),
                        ev.schema.field(lsn_col).type),
                    delete_col: pc.invert(prior.column("live")),
                    group_col: pc.cast(prior.column("group"),
                                       ev.schema.field(group_col).type),
                    measure_col: pc.cast(prior.column("measure"),
                                         ev.schema.field(measure_col).type),
                })
                ev = pa.concat_tables([synth_rows, ev])
            synth = np.zeros(ev.num_rows, dtype=bool)
            synth[:ev.num_rows - n_ev] = True
            deltas = _bucket_deltas(ev, lsn_col, delete_col, group_col,
                                    measure_col, synthetic_mask=synth)

            # new state = last row per key under the same sort
            order = pc.sort_indices(ev, sort_keys=[
                ("__mkey", "ascending"), (lsn_col, "ascending")])
            s = ev.take(order)
            keys = s.column("__mkey").to_numpy(zero_copy_only=False)
            last = np.ones(len(keys), dtype=bool)
            if len(keys) > 1:
                last[:-1] = keys[1:] != keys[:-1]
            s = s.filter(pa.array(last))
            state = pa.table({
                "__mkey": s.column("__mkey"),
                "live": pc.invert(pc.fill_null(s.column(delete_col), False)),
                "group": pc.cast(s.column(group_col), pa.string()),
                "measure": pc.fill_null(
                    pc.cast(s.column(measure_col), pa.int64()), 0),
            })
            _write_bucket_state(state_dir, _e, bucket, state)
            return deltas

        epoch_deltas = (ds.map_batches(prep, batch_format="pyarrow")
                          .groupby("__bucket")
                          .map_groups(per_bucket, batch_format="pyarrow")
                          .groupby("group")
                          .sum(["dn", "dm"])
                          .take_all())
        for row in epoch_deltas:
            g = row["group"]
            dn, dm = merged.get(g, (0, 0))
            merged[g] = (dn + row["sum(dn)"], dm + row["sum(dm)"])

    # NULL group keys sort first (None is uncomparable to str — a live
    # NULL-group row must not crash the final sort; single-pass
    # changelog_aggregate handles the same input through Arrow groupby)
    live = sorted(((g, n, m) for g, (n, m) in merged.items() if n > 0),
                  key=lambda t: (t[0] is not None, t[0] or ""))
    return pa.table({
        "group": pa.array([g for g, _, _ in live], pa.string()),
        n_name: pa.array([n for _, n, _ in live], pa.int64()),
        m_name: pa.array([m for _, _, m in live], pa.int64()),
    })
