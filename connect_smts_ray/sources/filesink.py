"""One-output-file-per-block Datasink with STABLE block identity.

The connector sinks (ORC, Avro) need a per-file name that is BOTH:

- retry-idempotent — a Ray task retry / speculative re-execution of the
  same block must rewrite the identical path with identical bytes
  (atomic ``os.replace``), never a duplicate file (uuid naming failed
  this, ADVICE r04), and
- multiplicity-preserving — two DIFFERENT blocks whose content happens
  to be identical (legitimate duplicate rows upstream) must land in
  DISTINCT files, or a directory read silently drops rows (pure
  content-addressing failed this, round-5 review).

``map_batches`` UDFs see no stable block ordinal, but a
``ray.data.Datasink``'s write tasks do: ``TaskContext.task_idx`` is the
logical index of the write task in the operator — stable across retries
of that task. The file name mixes (task_idx, within-task block ordinal,
content sha) so both properties hold at once.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
from ray.data import Datasink


class BlockFileDatasink(Datasink):
    """Write each input block to ``{out_dir}/part-{task}-{j}-{sha}{ext}``
    via ``encode_fn(table, tmp_path, content_sha16)`` — the third
    argument is the first 16 bytes of the block's content sha256, for
    formats that want a deterministic sync marker (Avro); encoders that
    don't need it take it as ``_sync`` and ignore it (ORC). Collects
    (path, n_rows) rows in ``self.results`` after the write completes."""

    def __init__(self, out_dir: str, ext: str, encode_fn):
        self.out_dir = out_dir
        self.ext = ext
        self.encode_fn = encode_fn
        self.results: list = []

    def on_write_start(self) -> None:
        os.makedirs(self.out_dir, exist_ok=True)

    def write(self, blocks, ctx):
        out = []
        for j, block in enumerate(blocks):
            if not isinstance(block, pa.Table):
                block = pa.Table.from_pandas(block, preserve_index=False)
            if block.num_rows == 0:
                continue
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, block.schema) as w:
                w.write_table(block)
            digest = hashlib.sha256(sink.getvalue())
            tag = f"{ctx.task_idx:05d}-{j:03d}-{digest.hexdigest()[:24]}"
            path = os.path.join(self.out_dir, f"part-{tag}{self.ext}")
            tmp = path + f".{os.getpid()}.tmp"
            self.encode_fn(block, tmp, digest.digest()[:16])
            os.replace(tmp, path)
            out.append({"path": path, "n_rows": block.num_rows})
        return out

    def on_write_complete(self, write_result) -> None:
        rows = [r for ret in write_result.write_returns for r in ret]
        self.results = sorted(rows, key=lambda r: r["path"])


def plan_files(paths: list, per_path_fn) -> list:
    """Run a metadata-only planning callable over every path — as chunked
    Ray tasks past a handful of files, so planning a thousand-part
    directory never serializes blocking storage opens on the driver.
    Returns the per-path results in path order; only the tiny planning
    tuples cross back. Shared by the ORC reader (stripe counts) and the
    Avro reader (header offsets) — round-5 review factored it out of
    their two near-identical copies."""
    import ray

    if len(paths) <= 8 or not ray.is_initialized():
        return [per_path_fn(p) for p in paths]

    @ray.remote(num_cpus=0.5)
    def chunk(paths_chunk):
        return [per_path_fn(p) for p in paths_chunk]

    step = max(8, -(-len(paths) // 64))  # ≤64 planning tasks
    futs = [chunk.remote(paths[i:i + step])
            for i in range(0, len(paths), step)]
    return [r for res in ray.get(futs) for r in res]
