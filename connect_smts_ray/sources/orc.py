"""ORC source + sink as a custom Ray Data connector.

Ray 2.49 ships no ORC reader/writer; pyarrow does (``pyarrow.orc``). The
idiomatic composition:

- **sink**: one ORC file per input block via ``map_batches`` (writer tasks
  run distributed, atomic write-then-rename per file — never one giant
  file; the file name is a content hash of the block so a Ray task retry
  / speculative re-execution rewrites the SAME file instead of
  duplicating rows),
- **source**: a STRIPE is the decode unit. Planning lists each file's
  stripe count from its footer (metadata-only, the same footer-planning
  Ray's own ``read_parquet`` does) and fans one task per stripe, so a
  single huge ORC file still decodes with parallelism = its stripe
  count, and a task never holds more than one stripe in memory.

Listing ignores everything but ``*.orc`` — a writer task killed
mid-write can leave a ``part-*.orc.tmp`` behind (the rename never ran),
and feeding that half-file to the decoder poisons the whole read.
Decode errors are re-raised with the payload TRUNCATED out of the
message (a raw ORC byte dump in an exception string helps nobody and
bloats driver logs).
"""

from __future__ import annotations

import glob
import hashlib
import os

import pyarrow as pa
import pyarrow.orc


def _short_err(e: Exception, limit: int = 160) -> str:
    """Exception text with any embedded payload bytes truncated away."""
    s = f"{type(e).__name__}: {e}"
    return s if len(s) <= limit else s[:limit] + f"... [{len(s)} chars]"


def write_orc(ds, out_dir: str):
    """Write a Dataset to ``{out_dir}/part-*.orc``, one file per block,
    via a ``Datasink`` (streaming — blocks write as they arrive). Runs
    the write eagerly and returns the per-file summary Dataset
    (path, n_rows). File identity = (stable write-task index, block
    ordinal, content sha): a task retry rewrites the SAME file
    idempotently (atomic ``os.replace``), while two different blocks
    with identical content keep distinct files — directory reads
    preserve row multiplicity (pure content-addressing collapsed them;
    round-5 review finding)."""
    import ray.data

    from connect_smts_ray.sources.filesink import BlockFileDatasink

    sink = BlockFileDatasink(
        out_dir, ".orc",
        lambda t, tmp, _sync: pyarrow.orc.write_table(t, tmp))
    ds.write_datasink(sink)
    if not sink.results:
        return ray.data.from_arrow(pa.table({
            "path": pa.array([], pa.string()),
            "n_rows": pa.array([], pa.int64())}))
    return ray.data.from_items(sink.results)


def _resolve_orc_paths(dir_or_paths) -> list:
    """Explicit file list, or ``*.orc`` under a directory — never ``.tmp``
    leftovers from a killed writer task."""
    if isinstance(dir_or_paths, (str, os.PathLike)):
        p = str(dir_or_paths)
        if os.path.isdir(p):
            return sorted(glob.glob(os.path.join(p, "*.orc")))
        return [p]
    return [str(x) for x in dir_or_paths]


def _stripe_count(p: str) -> int:
    try:
        return pyarrow.orc.ORCFile(p).nstripes
    except Exception as e:  # noqa: BLE001 — re-raise without payload bytes
        raise ValueError(
            f"cannot read ORC footer of {p}: {_short_err(e)}") from None


def _plan_pair(p: str) -> tuple:
    return p, _stripe_count(p)


def _stripe_counts(paths: list) -> list:
    """``(path, nstripes)`` per file via the shared chunked-Ray planner
    (``sources/filesink.py: plan_files``) — a thousand-part directory
    plans distributed, and only tiny ints come back to the driver."""
    from connect_smts_ray.sources.filesink import plan_files

    return plan_files(paths, _plan_pair)


def read_orc(dir_or_paths):
    """Read ORC files as a Dataset, one decode task per STRIPE.

    ``dir_or_paths`` is a directory (only ``*.orc`` files are read), one
    path, or an explicit list of paths — prefer passing ``write_orc``'s
    summary paths so the read sees exactly the committed files.

    Planning opens each file's footer for its stripe count (metadata-only,
    like parquet footer planning; distributed across chunked tasks when
    the directory has many parts); each decode task then reads only its
    own stripe via ``ORCFile.read_stripe`` — a single multi-GB file fans
    across as many tasks as it has stripes instead of serializing on one.
    """
    import ray.data

    paths = _resolve_orc_paths(dir_or_paths)
    units: list = []
    for p, n in _stripe_counts(paths):
        units.extend({"path": p, "stripe": i} for i in range(n))
    if not units:
        return ray.data.from_items([])

    plan = ray.data.from_items(units, override_num_blocks=len(units))

    def decode(batch: pa.Table) -> pa.Table:
        tables = []
        for path, stripe in zip(batch.column("path").to_pylist(),
                                batch.column("stripe").to_pylist()):
            try:
                rb = pyarrow.orc.ORCFile(path).read_stripe(stripe)
            except Exception as e:  # noqa: BLE001 — truncate payload bytes
                raise ValueError(
                    f"cannot decode stripe {stripe} of {path}: "
                    f"{_short_err(e)}") from None
            tables.append(pa.Table.from_batches([rb]))
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables, promote_options="default")

    return plan.map_batches(decode, batch_format="pyarrow")
