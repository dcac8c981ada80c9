"""Deterministic Debezium-shaped binlog synthesis (SURVEY §2.4, FIXTURES F2).

Expands each corpus row ``(repo, path, commit, lang, content)`` into
``events_per_key`` change events for the CDC replay:

- op ``c`` (insert, always event 0), ``u`` (update), ``d`` (delete,
  Debezium-flattened ``__deleted="true"``), ``t`` (key-only tombstone —
  null value; the Outbox stage *drops* these, smt/Outbox.java:79-82).
- ``commit_lsn`` is monotone per key (= event index); ``source_offset`` is
  globally unique; both are pure functions of the row → the stream is
  identical regardless of block partitioning, cluster size or retry.
- ``value_json`` is the flattened-row JSON (the ``io.debezium.data.Json``
  analog) carrying repo/path/commit/lang/content/version.

The op at index i is drawn from a per-key LCG seeded by sha1(key):
~70% update / ~15% delete / ~15% tombstone after the initial insert.

``expected_final_state`` is the pure-Python LWW oracle: per key, the winning
event is the max ``commit_lsn`` among non-tombstone events ('t' rows never
reach the sink); a winning delete removes the key. The engine's full replay
must reproduce exactly this table (per-row sha256(content) equality —
BASELINE.json correctness gate).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import orjson
import pyarrow as pa

KEY_SEP = "\x1f"


@dataclass(frozen=True)
class BinlogConfig:
    events_per_key: int = 8
    seed: int = 42
    base_ts_ms: int = 1_700_000_000_000


def key_seed(repo: str, path: str, seed: int) -> int:
    h = hashlib.sha1(f"{seed}|{repo}{KEY_SEP}{path}".encode()).digest()
    return int.from_bytes(h[:8], "little")


def op_at(ks: int, i: int) -> str:
    """Deterministic op for event index i of a key (LCG over the key seed)."""
    if i == 0:
        return "c"
    r = (ks * 2654435761 + i * 40503) & 0xFFFFFFFF
    b = r % 100
    if b < 70:
        return "u"
    if b < 85:
        return "d"
    return "t"


def content_version(content: str, repo: str, path: str, version: int) -> str:
    if version == 0:
        return content
    tag = hashlib.sha1(f"{repo}{KEY_SEP}{path}|{version}".encode()).hexdigest()[:8]
    return f"{content}\n// rev {version} {tag}"


def synthesize_events(batch: pa.Table, cfg: BinlogConfig) -> pa.Table:
    """Corpus batch → event batch (1 row in, ``events_per_key`` rows out).

    Emitted columns (FIXTURES F2 + outbox envelope):
    repo, path, op, commit_lsn, source_offset, ts_ms, partition_key,
    payload (value_json string; null for 't'), __deleted, value_is_null.
    """
    repos = batch.column("repo").to_pylist()
    paths = batch.column("path").to_pylist()
    commits = batch.column("commit").to_pylist()
    langs = batch.column("lang").to_pylist()
    contents = batch.column("content").to_pylist()

    k = cfg.events_per_key
    out = {
        "repo": [], "path": [], "op": [], "commit_lsn": [],
        "source_offset": [], "ts_ms": [], "partition_key": [],
        "payload": [], "__deleted": [], "value_is_null": [],
    }
    for repo, path, commit, lang, content in zip(
        repos, paths, commits, langs, contents
    ):
        ks = key_seed(repo, path, cfg.seed)
        pk = f"{repo}{KEY_SEP}{path}"
        version = 0
        for i in range(k):
            op = op_at(ks, i)
            out["repo"].append(repo)
            out["path"].append(path)
            out["op"].append(op)
            out["commit_lsn"].append(i)
            out["source_offset"].append(((ks & 0x7FFFFFFFFFFF) << 16) | i)
            out["ts_ms"].append(cfg.base_ts_ms + i)
            out["partition_key"].append(pk)
            if op == "t":
                out["payload"].append(None)
                out["__deleted"].append(None)
                out["value_is_null"].append(True)
            elif op == "d":
                out["payload"].append(None)
                out["__deleted"].append("true")
                out["value_is_null"].append(False)
            else:
                if op == "u":
                    version = i
                body = orjson.dumps(
                    {
                        "repo": repo,
                        "path": path,
                        "commit": commit,
                        "lang": lang,
                        "content": content_version(content, repo, path, version),
                        "version": version,
                    }
                ).decode()
                out["payload"].append(body)
                out["__deleted"].append("false")
                out["value_is_null"].append(False)

    return pa.table(
        {
            "repo": pa.array(out["repo"], type=pa.string()),
            "path": pa.array(out["path"], type=pa.string()),
            "op": pa.array(out["op"], type=pa.string()),
            "commit_lsn": pa.array(out["commit_lsn"], type=pa.int64()),
            "source_offset": pa.array(out["source_offset"], type=pa.int64()),
            "ts_ms": pa.array(out["ts_ms"], type=pa.int64()),
            "partition_key": pa.array(out["partition_key"], type=pa.string()),
            "payload": pa.array(out["payload"], type=pa.string()),
            "__deleted": pa.array(out["__deleted"], type=pa.string()),
            "value_is_null": pa.array(out["value_is_null"], type=pa.bool_()),
        }
    )


class SynthesizeBinlog:
    """map_batches callable: corpus → event stream."""

    def __init__(self, cfg: BinlogConfig = BinlogConfig()):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        return synthesize_events(batch, self.cfg)


def expected_final_state(corpus: pa.Table, cfg: BinlogConfig) -> dict:
    """Pure-Python LWW oracle: {(repo, path) -> final row dict}, deletes
    applied. Order-insensitive; used by the replay correctness tests."""
    out = {}
    for repo, path, commit, lang, content in zip(
        corpus.column("repo").to_pylist(),
        corpus.column("path").to_pylist(),
        corpus.column("commit").to_pylist(),
        corpus.column("lang").to_pylist(),
        corpus.column("content").to_pylist(),
    ):
        ks = key_seed(repo, path, cfg.seed)
        winner = None  # (lsn, op, version)
        version = 0
        for i in range(cfg.events_per_key):
            op = op_at(ks, i)
            if op == "u":
                version = i
            if op == "t":
                continue  # dropped by Outbox, never reaches the sink
            winner = (i, op, version if op in ("c", "u") else None)
        if winner is None or winner[1] == "d":
            continue
        i, op, v = winner
        out[(repo, path)] = {
            "repo": repo,
            "path": path,
            "commit": commit,
            "lang": lang,
            "content": content_version(content, repo, path, v),
            "version": v,
            "commit_lsn": i,
            "source_offset": ((ks & 0x7FFFFFFFFFFF) << 16) | i,
        }
    return out
