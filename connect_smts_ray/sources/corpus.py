"""Deterministic source-code-repo corpus (BASELINE.json input_hint shape).

The engine's authoritative input is a Parquet table
``(repo:string, path:string, commit:string, lang:string, content:string)``.
In the sandbox we synthesize it deterministically from the driver-provided
``documents`` table (seed data, /root/testdata/sf*/documents.parquet) so no
external data is involved: repo = the document's ``source``, path is derived
from ``doc_id``, content is the document text, commit is a stable hash.

Everything is a pure function of the row → identical output regardless of
block partitioning or cluster size.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


CORPUS_SCHEMA = pa.schema(
    [
        pa.field("repo", pa.string(), nullable=False),
        pa.field("path", pa.string(), nullable=False),
        pa.field("commit", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("content", pa.string()),
    ]
)


def _documents_to_corpus(batch: pa.Table) -> pa.Table:
    # pa.table(...) below builds a metadata-free schema, which also strips
    # the driver parquet's pandas metadata dict (it otherwise defeats Ray
    # Data's schema-dedup hash: 'Failed to hash the schemas' per task).
    doc_ids = batch.column("doc_id").to_pylist()
    langs = batch.column("lang")
    texts = batch.column("text")
    repos = batch.column("source")
    paths = [f"src/file_{d}.txt" for d in doc_ids]
    # md5 (not sha1): the replay's DuckDB oracle reproduces this value in
    # pure SQL as substr(md5(repo || '/' || path), 1, 12) — DuckDB has no
    # sha1. The hash only needs stability, not strength.
    commits = [
        hashlib.md5(f"{r}/{p}".encode()).hexdigest()[:12]
        for r, p in zip(repos.to_pylist(), paths)
    ]
    return pa.table(
        {
            "repo": pc.cast(repos, pa.string()),
            "path": pa.array(paths, type=pa.string()),
            "commit": pa.array(commits, type=pa.string()),
            "lang": pc.cast(langs, pa.string()),
            "content": pc.cast(texts, pa.string()),
        }
    )


def read_corpus(sf_dir: str, num_blocks: int | None = None) -> "ray.data.Dataset":
    """Corpus dataset derived from ``{sf_dir}/documents.parquet``.
    See ``read_corpus_file`` for the num_blocks contract."""
    return read_corpus_file(f"{sf_dir}/documents.parquet", num_blocks)


def read_corpus_file(path: str, num_blocks: int | None = None) -> "ray.data.Dataset":
    """Corpus dataset from one documents-shaped parquet file — the unit the
    micro-batch ingestion driver (pipelines.replay.run_until) tails.

    ``num_blocks`` forces the read to split into that many blocks — essential
    on small inputs where a single Parquet file would otherwise produce ONE
    block and serialize the whole downstream pipeline onto one task. At real
    scale (many files / row groups) the read parallelizes naturally and the
    override is a no-op-ish repartition hint.
    """
    kwargs = {}
    if num_blocks is not None:
        kwargs["override_num_blocks"] = num_blocks
        # A single-file read with override_num_blocks=N runs as ONE task
        # (ReadParquet->SplitBlocks(N)) whose streaming generator yields the
        # N blocks sequentially — and pauses after
        # _max_num_blocks_in_streaming_gen_buffer (default 2) unconsumed
        # outputs. The executor drains that buffer at ~20 blocks/s, so the
        # whole downstream pipeline is throttled to ~20 tasks/s regardless
        # of cluster width (measured: the synth stage ran at 2.7 of 32
        # cores; raising the buffer to 32 cut its wall 6.6 s → 2.6 s).
        # Only RAISE the buffer, bounded at 64 — split blocks here are tiny
        # (≤ a few hundred KB), so the buffered bytes stay negligible. At
        # real scale the corpus is many files, each read task yields few
        # blocks, and this knob is inert.
        ctx = ray.data.DataContext.get_current()
        want = min(int(num_blocks), 64)
        if ctx._max_num_blocks_in_streaming_gen_buffer < want:
            ctx._max_num_blocks_in_streaming_gen_buffer = want
    from connect_smts_ray.core.arrow import read_parquet_clean

    ds = read_parquet_clean(
        path,
        columns=["doc_id", "text", "lang", "source"],
        **kwargs,
    )
    return ds.map_batches(_documents_to_corpus, batch_format="pyarrow")


def corpus_table(sf_dir: str) -> pa.Table:
    """Driver-side (small-scale) corpus for oracles/tests."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    return _documents_to_corpus(t)
