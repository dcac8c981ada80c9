"""ORC source + sink as a custom Ray Data connector.

Ray 2.49 ships no ORC reader/writer; pyarrow does (``pyarrow.orc``). The
idiomatic composition:

- **sink**: one ORC file per input block via ``map_batches`` (writer tasks
  run distributed, atomic rename per file — never one giant file),
- **source**: ``ray.data.read_binary_files`` (parallel file listing +
  reads with streaming backpressure) + a per-file Arrow decode stage.

A file is the decode unit (ORC stripes aren't independently listable
through the binary-files path), so write many small-ish files at export
time — the reader's parallelism is the file count.
"""

from __future__ import annotations

import io
import os
import uuid

import pyarrow as pa
import pyarrow.orc


def write_orc(ds, out_dir: str):
    """Write a Dataset to ``{out_dir}/part-*.orc``, one file per block.
    Returns the per-file summary Dataset (path, n_rows) — consuming it is
    what drives the distributed write."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_rows": pa.array([], pa.int64())})
        name = f"part-{uuid.uuid4().hex}.orc"
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        pyarrow.orc.write_table(batch, tmp)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path]),
                         "n_rows": pa.array([batch.num_rows], pa.int64())})

    return ds.map_batches(write_block, batch_format="pyarrow")


def read_orc(dir_or_paths):
    """Read ORC files as a Dataset: parallel binary reads, then a per-file
    vectorized Arrow decode (``pyarrow.orc.ORCFile.read``)."""
    import ray.data

    raw = ray.data.read_binary_files(dir_or_paths)

    def decode(batch: pa.Table) -> pa.Table:
        tables = [
            pyarrow.orc.ORCFile(io.BytesIO(buf.as_py())).read()
            for buf in batch.column("bytes")
        ]
        if not tables:
            return pa.table({})
        return pa.concat_tables(tables, promote_options="default")

    return raw.map_batches(decode, batch_format="pyarrow")
