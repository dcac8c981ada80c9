"""Dead-letter queue: per-record error tolerance for batch transforms.

Kafka Connect's ``errors.tolerance=all`` + ``errors.deadletterqueue.*``
(the reference's deploy surface) routes records a transform rejects to a
DLQ topic instead of failing the task. The engine analog wraps any batch
transform:

    ds.map_batches(with_dlq(fn, dlq_dir, stage="expand"), ...)

Vectorized happy path: the batch is tried WHOLE — zero overhead when
nothing fails. On an exception the batch bisects recursively down to
single rows (log₂(n) extra applications around each poison row); failing
rows land in ``{dlq_dir}/part-*.parquet`` as
``(record_json, error, stage)`` — schema-stable regardless of the input
schema, so one DLQ directory serves every stage — and the surviving rows
flow on. Deterministic: which rows fail is a pure function of the rows.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _bisect_apply(fn, batch: pa.Table, dead: list):
    """Apply fn to batch; on failure split in half (single rows → DLQ).
    Returns list of successful output tables (order-preserving)."""
    if batch.num_rows == 0:
        return []
    try:
        return [fn(batch)]
    except Exception as e:  # noqa: BLE001 — the DLQ exists to catch fn's errors
        if batch.num_rows == 1:
            dead.append((batch, f"{type(e).__name__}: {e}"))
            return []
        mid = batch.num_rows // 2
        return (_bisect_apply(fn, batch.slice(0, mid), dead)
                + _bisect_apply(fn, batch.slice(mid), dead))


def with_dlq(fn, dlq_dir: str, stage: str = "stage"):
    """Wrap a ``pa.Table -> pa.Table`` transform with per-record error
    tolerance. Failed rows append to ``dlq_dir`` (one file per failing
    batch, content-addressed name + atomic rename → idempotent under Ray
    task retries); survivors pass through fn's normal output."""
    os.makedirs(dlq_dir, exist_ok=True)

    def wrapped(batch: pa.Table) -> pa.Table:
        dead: list = []
        goods = _bisect_apply(fn, batch, dead)
        if dead:
            rows, errs = [], []
            for row_tbl, err in dead:
                rows.append(json.dumps(
                    {c: str(row_tbl.column(c)[0].as_py())
                     for c in row_tbl.column_names},
                    sort_keys=True,
                ))
                errs.append(err)
            t = pa.table({
                "record_json": pa.array(rows, pa.string()),
                "error": pa.array(errs, pa.string()),
                "stage": pa.array([stage] * len(rows), pa.string()),
            })
            # File name is a pure function of the WHOLE input batch (its
            # Arrow IPC bytes) + the dead rows: a Ray task retry /
            # speculative re-execution of the same batch rewrites the
            # SAME file (identical bytes, atomic replace) instead of
            # dead-lettering the rows twice — while two DIFFERENT batches
            # whose failing row sets happen to coincide (legitimate
            # duplicate records upstream) still land in distinct files,
            # preserving dead-row multiplicity. Only batches identical in
            # FULL content collapse to one file, and for those one DLQ
            # record per distinct failing batch is the intended contract.
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, batch.schema) as w:
                w.write_table(batch)
            h = hashlib.sha256(sink.getvalue())
            h.update(("\x1e".join(rows) + "\x1f" + "\x1e".join(errs)
                      + "\x1f" + stage).encode())
            tag = h.hexdigest()[:32]
            path = os.path.join(dlq_dir, f"part-{tag}.parquet")
            tmp = path + f".{os.getpid()}.tmp"  # retry-race-safe scratch
            pq.write_table(t, tmp)
            os.replace(tmp, path)
        if goods:
            # Remember fn's output schema so a later all-fail batch on this
            # worker can still return a correctly-shaped empty table.
            wrapped._out_schema = goods[0].schema
            return pa.concat_tables(goods)
        # Every row failed — OR the batch was empty (Ray Data routinely
        # produces 0-row blocks downstream of filters; zero rows failing
        # must not raise). The output must still carry fn's schema:
        # prefer the schema recorded from a prior success; otherwise try
        # fn on the empty slice — some transforms can't handle 0-row
        # input, so guard it and fall back to the recorded schema.
        if wrapped._out_schema is not None:
            return wrapped._out_schema.empty_table()
        try:
            return fn(batch.slice(0, 0))
        except Exception as e:  # noqa: BLE001 — same contract as the bisect
            if batch.num_rows == 0:
                # nothing failed; no schema knowable yet — an empty
                # SCHEMALESS table unions cleanly with later real output
                return batch.select([])
            raise RuntimeError(
                f"DLQ stage '{stage}': every row of the first batch failed "
                "and fn cannot produce a 0-row output to define the schema; "
                "pass a batch with at least one good row first or make fn "
                f"0-row-safe (underlying error: {e})"
            ) from e

    wrapped._out_schema = None

    wrapped.__name__ = wrapped.__qualname__ = f"dlq[{getattr(fn, '__name__', 'fn')}]"
    return wrapped


def read_dlq(dlq_dir: str) -> pa.Table:
    """All dead-lettered records (driver-side convenience; the directory
    is plain parquet for ray.data.read_parquet at scale)."""
    parts = [
        pq.read_table(os.path.join(dlq_dir, n))
        for n in sorted(os.listdir(dlq_dir)) if n.endswith(".parquet")
    ]
    if not parts:
        return pa.table({
            "record_json": pa.array([], pa.string()),
            "error": pa.array([], pa.string()),
            "stage": pa.array([], pa.string()),
        })
    return pa.concat_tables(parts)


def replay_dlq(dlq_dir: str, fn, schema: pa.Schema, repair=None,
               dlq_dir_out: str | None = None, stage: str = "replay",
               from_stage: str | None = None):
    """Reprocess a DLQ after the failure is fixed — the operational other
    half of ``with_dlq`` (Connect ops teams drain the DLQ topic back
    through the repaired connector; the engine analog drains the DLQ
    directory back through the repaired transform).

    ``schema`` declares the original row types (the DLQ stores rows as
    string renderings to stay schema-stable across stages; the caller
    knows their real types). ``repair(row_dict) -> row_dict`` is the fix —
    applied before ``fn``. Rows that STILL fail dead-letter again into
    ``dlq_dir_out`` (pass one to keep the loop going; omit to let a
    repeated failure raise). Returns the healed-output Dataset.

    Caveat (documented, inherent to the string rendering): a value that
    was Python ``None`` is stored as the string ``'None'`` — a ``repair``
    that needs true nulls must map it back.

    ``from_stage`` selects WHICH stage's dead rows to drain when one DLQ
    directory serves several stages (the shared-directory layout the
    module docstring describes): rows from other stages have different
    original columns and would rebuild as all-null through this
    ``schema``. None replays everything (single-stage directories).

    Scale: one Dataset task per DLQ file; DLQ volume is the error rate,
    not the data rate."""
    import glob

    import ray.data

    files = sorted(glob.glob(os.path.join(dlq_dir, "part-*.parquet")))
    if not files:
        return ray.data.from_arrow(schema.empty_table())

    def rebuild(b: pa.Table) -> pa.Table:
        if from_stage is not None:
            b = b.filter(pc.equal(b.column("stage"), from_stage))
        rows = [json.loads(s) for s in b.column("record_json").to_pylist()]
        if repair is not None:
            rows = [repair(dict(r)) for r in rows]
        cols = {}
        for f in schema:
            vals = pa.array([r.get(f.name) for r in rows], pa.string())
            cols[f.name] = vals if pa.types.is_string(f.type) \
                else vals.cast(f.type)
        return pa.table(cols)

    ds = ray.data.read_parquet(files).map_batches(
        rebuild, batch_format="pyarrow")
    run = with_dlq(fn, dlq_dir_out, stage=stage) if dlq_dir_out else fn
    return ds.map_batches(run, batch_format="pyarrow")
