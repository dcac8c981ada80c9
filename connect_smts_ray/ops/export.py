"""Resumable partitioned corpus export — the training-data sink.

A 100-TB export must be restartable: a failed run re-executes ONLY the
shards whose output is missing or unverified, and a shard's bytes are a
pure function of its rows (layout-independent), so resumed and fresh runs
produce identical files.

Shape (reference analog: the exactly-once manifest pattern of
`sinks/manifest.py`, applied to corpus shards instead of CDC partitions):

1. every row gets a content-addressed ``shard`` id —
   ``md5(salt ∥ id) % num_shards`` (DuckDB mirror: ``md5_number_lower``),
   so shard membership is identical across runs and cluster layouts;
2. ``groupby(shard).map_groups`` — each shard is written by ONE task:
   rows sorted by id (deterministic bytes), one parquet file + one
   manifest json per shard directory;
3. a shard whose manifest already matches (row count + content sha) is
   SKIPPED — the writer never rewrites committed bytes;
4. the op returns the per-shard summary Dataset (shard, n_rows, sum/min/
   max id, skipped) — cheap to verify against SQL and small enough to
   collect.

At 10^10 rows pick ``num_shards`` so one shard ≈ one task's memory
budget; shards are md5-uniform, so sizing is corpus_rows / num_shards.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def add_shard(batch: pa.Table, id_col: str, num_shards: int,
              salt: str = "shard|") -> pa.Table:
    """Content-addressed shard id per row: ``md5(salt ∥ id) % num_shards``
    (little-endian uint64 of md5 bytes 8..16 = DuckDB md5_number_lower)."""
    ids = batch.column(id_col).to_pylist()
    shards = [
        int.from_bytes(
            hashlib.md5(f"{salt}{v}".encode()).digest()[8:], "little"
        ) % num_shards
        for v in ids
    ]
    return batch.append_column(
        pa.field("shard", pa.int64()), pa.array(shards, pa.int64())
    )


def _shard_sha(table: pa.Table, id_col: str) -> str:
    """sha256 over the id-sorted rows' canonical CSV — layout-independent
    shard fingerprint (the manifest's integrity check)."""
    cols = sorted(table.column_names)
    canon = table.select(cols).sort_by([(id_col, "ascending")])
    payload = canon.to_pandas().to_csv(index=False).encode()
    return hashlib.sha256(payload).hexdigest()


def export_shards(ds, out_dir: str, id_col: str = "doc_id",
                  num_shards: int = 8, salt: str = "shard|"):
    """Resumable sharded parquet export. Returns the per-shard summary
    Dataset ``(shard, n_rows, sum_id, min_id, max_id, skipped)``.

    Each shard directory ``{out_dir}/shard={k}/`` holds ``data.parquet``
    (rows sorted by id) and ``_MANIFEST.json`` (row count + content
    sha256). A writer task first checks the manifest: on a match it skips
    the write entirely, so re-running after a partial failure touches
    only the unfinished shards — and a pytest pins that the re-written
    bytes are identical either way."""
    os.makedirs(out_dir, exist_ok=True)

    # Fail BEFORE any shard writes: a non-integer id_col would otherwise
    # write every shard's parquet + manifest and then fail building the
    # summary — full export I/O for a job that can never succeed.
    sch = ds.schema()
    if sch is not None:
        t = dict(zip(sch.names, sch.types)).get(id_col)
        if t is not None and not pa.types.is_integer(t):
            raise ValueError(
                f"export_shards id_col must be an integer column for the "
                f"summary stats, got {t}")

    sharded = ds.map_batches(
        lambda b: add_shard(b, id_col, num_shards, salt),
        batch_format="pyarrow",
    )

    def write_shard(group: pa.Table) -> pa.Table:
        k = int(group.column("shard")[0].as_py())
        body = group.drop_columns(["shard"]).sort_by([(id_col, "ascending")])
        sha = _shard_sha(body, id_col)
        sdir = os.path.join(out_dir, f"shard={k}")
        mpath = os.path.join(sdir, "_MANIFEST.json")
        dpath = os.path.join(sdir, "data.parquet")
        skipped = False
        # A manifest alone is NOT proof of a committed shard: the data file
        # may have been lost after the manifest commit (partial rsync, disk
        # swap). Honor the skip only when data.parquet exists AND its footer
        # row count matches the manifest — a footer read costs O(KB), never
        # a full-file scan, so resume stays cheap at 10^5 shards.
        if os.path.exists(mpath) and os.path.exists(dpath):
            try:
                m = json.load(open(mpath))
                skipped = (m.get("n_rows") == body.num_rows
                           and m.get("sha256") == sha
                           and pq.read_metadata(dpath).num_rows
                           == body.num_rows)
            except (json.JSONDecodeError, OSError, pa.ArrowInvalid):
                skipped = False
        if not skipped:
            os.makedirs(sdir, exist_ok=True)
            # pid-suffixed scratch: a Ray retry racing a still-live
            # original must not interleave writes into ONE tmp file and
            # publish the corrupt result (same guard as dlq.py)
            tmp = dpath + f".{os.getpid()}.tmp"
            pq.write_table(body, tmp)
            os.replace(tmp, dpath)  # atomic: readers never see half a file
            mtmp = mpath + ".tmp"
            with open(mtmp, "w") as f:
                json.dump({"shard": k, "n_rows": body.num_rows,
                           "sha256": sha}, f)
            os.replace(mtmp, mpath)  # manifest last = the commit point
        # Arrow kernels, NOT numpy: a null id coerces the numpy array to
        # float64 (NaN sum → ValueError) where pc.sum/min_max skip nulls;
        # sum is exact within int64 per shard (the SQL oracle also sums
        # per shard, so both sides agree or both overflow loudly).
        idc = body.column(id_col)
        if not pa.types.is_integer(idc.type):
            raise ValueError(
                f"export_shards id_col must be an integer column for the "
                f"summary stats, got {idc.type}")
        mm = pc.min_max(idc)
        s = pc.sum(idc)
        return pa.table({
            "shard": pa.array([k], pa.int64()),
            "n_rows": pa.array([body.num_rows], pa.int64()),
            "sum_id": pa.array([s.as_py() or 0], pa.int64()),
            "min_id": pa.array([mm["min"].as_py()], pa.int64()),
            "max_id": pa.array([mm["max"].as_py()], pa.int64()),
            "skipped": pa.array([skipped], pa.bool_()),
        })

    return sharded.groupby("shard").map_groups(
        write_shard, batch_format="pyarrow"
    )


def read_shards(out_dir: str):
    """Read back ONLY committed shards (manifest present and matching the
    recorded row count) — the resume-side view of a partial export."""
    import ray.data

    paths = []
    for name in sorted(os.listdir(out_dir)):
        sdir = os.path.join(out_dir, name)
        mpath = os.path.join(sdir, "_MANIFEST.json")
        dpath = os.path.join(sdir, "data.parquet")
        if not (os.path.exists(mpath) and os.path.exists(dpath)):
            continue
        try:
            m = json.load(open(mpath))
            if pq.read_metadata(dpath).num_rows != m.get("n_rows"):
                continue  # data file doesn't match its manifest — unverified
        except (json.JSONDecodeError, OSError, pa.ArrowInvalid):
            continue
        paths.append(dpath)
    if not paths:
        raise FileNotFoundError(f"no committed shards under {out_dir}")
    return ray.data.read_parquet(paths)
