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

The op at index i is drawn from a per-key LCG seeded by md5(key):
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
    # md5 first-8-bytes little-endian == DuckDB md5_number_upper(), so the
    # whole binlog (ops, offsets, versions) is reproducible in pure SQL —
    # the driver-side correctness oracle for the replay family. (sha1 is
    # not available in DuckDB; the seed only needs determinism.)
    h = hashlib.md5(f"{seed}|{repo}{KEY_SEP}{path}".encode()).digest()
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
    # md5 hex (SQL: substr(md5(...), 1, 8)) — see key_seed on why not sha1
    tag = hashlib.md5(f"{repo}{KEY_SEP}{path}|{version}".encode()).hexdigest()[:8]
    return f"{content}\n// rev {version} {tag}"


def synthesize_events(batch: pa.Table, cfg: BinlogConfig,
                      lsn_range: tuple | None = None) -> pa.Table:
    """Corpus batch → event batch (1 row in, ``events_per_key`` rows out).

    Emitted columns (FIXTURES F2 + outbox envelope):
    repo, path, op, commit_lsn, source_offset, ts_ms, partition_key,
    payload (value_json string; null for 't'), __deleted, value_is_null.

    ``lsn_range=(lo, hi)`` generates ONLY events with ``lo <= commit_lsn <
    hi`` — every per-event column is a pure function of the event index, so
    a slice is exact (byte-identical to slicing the full stream). This is
    how epoch replays avoid re-synthesizing the whole stream per epoch: an
    E-epoch replay costs one synthesis total, not E (VERDICT r02 #4).

    Vectorized: the op matrix / lsn / offset columns are pure numpy over the
    (rows × events_per_key) grid; repo/path replicate via Arrow ``take``
    (no Python string copies); only the JSON payload needs a per-event
    Python step, built from a cached per-key prefix so the static fields are
    serialized once per key, not once per event.
    """
    import numpy as np
    import pyarrow.compute as pc

    n = batch.num_rows
    lo, hi = (0, cfg.events_per_key) if lsn_range is None else lsn_range
    lo, hi = max(0, lo), min(cfg.events_per_key, hi)
    k = hi - lo
    if k <= 0:
        return synthesize_events(batch.slice(0, 0), cfg)
    repos = batch.column("repo").to_pylist()
    paths = batch.column("path").to_pylist()
    commits = batch.column("commit").to_pylist()
    langs = batch.column("lang").to_pylist()
    contents = batch.column("content").to_pylist()

    ks = np.fromiter(
        (key_seed(r, p, cfg.seed) for r, p in zip(repos, paths)),
        dtype=np.uint64,
        count=n,
    )
    i_row = np.arange(lo, hi, dtype=np.uint64)
    rand = (
        ks[:, None] * np.uint64(2654435761) + i_row[None, :] * np.uint64(40503)
    ) & np.uint64(0xFFFFFFFF)
    bucket = (rand % np.uint64(100)).astype(np.int16)
    # op codes: 0='c', 1='u', 2='d', 3='t' — matches op_at exactly
    code = np.where(bucket < 70, 1, np.where(bucket < 85, 2, 3)).astype(np.int8)
    if lo == 0:
        code[:, 0] = 0
    flat_code = code.ravel()

    take_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
    lsn = np.tile(np.arange(lo, hi, dtype=np.int64), n)
    soff = (
        ((ks.astype(np.int64) & 0x7FFFFFFFFFFF) << 16)[:, None]
        | np.arange(lo, hi, dtype=np.int64)[None, :]
    ).ravel()

    op_lut = np.array(["c", "u", "d", "t"])
    ops = pa.array(op_lut[flat_code], type=pa.string())

    pk_col = pc.binary_join_element_wise(
        pc.cast(batch.column("repo"), pa.string()),
        pc.cast(batch.column("path"), pa.string()),
        KEY_SEP,
    )

    # payload: only codes 0/1 carry a body; version = 0 for 'c', i for 'u'
    payloads: list = [None] * (n * k)
    for r in range(n):
        row_code = code[r]
        body_idx = np.nonzero(row_code <= 1)[0]
        if len(body_idx) == 0:
            continue
        repo, path, content = repos[r], paths[r], contents[r]
        prefix = orjson.dumps(
            {
                "repo": repo,
                "path": path,
                "commit": commits[r],
                "lang": langs[r],
            }
        ).decode()[:-1]
        base = r * k
        for i in body_idx:
            i = int(i)
            version = 0 if row_code[i] == 0 else lo + i
            cv = content_version(content, repo, path, version)
            payloads[base + i] = (
                f'{prefix},"content":{orjson.dumps(cv).decode()},'
                f'"version":{version}}}'
            )

    deleted = np.full(n * k, None, dtype=object)
    deleted[flat_code <= 1] = "false"
    deleted[flat_code == 2] = "true"

    return pa.table(
        {
            "repo": pc.take(pc.cast(batch.column("repo"), pa.string()), take_idx),
            "path": pc.take(pc.cast(batch.column("path"), pa.string()), take_idx),
            "op": ops,
            "commit_lsn": pa.array(lsn, type=pa.int64()),
            "source_offset": pa.array(soff, type=pa.int64()),
            "ts_ms": pa.array(lsn + cfg.base_ts_ms, type=pa.int64()),
            "partition_key": pc.take(pk_col, take_idx),
            "payload": pa.array(payloads, type=pa.string()),
            "__deleted": pa.array(deleted, type=pa.string()),
            "value_is_null": pa.array(flat_code == 3),
        }
    )


def synthesize_snapshot(batch: pa.Table, cfg: BinlogConfig,
                        snapshot_lsn: int) -> pa.Table:
    """Source-TABLE state at ``snapshot_lsn``, emitted directly as
    lake-shaped rows — the Debezium initial-snapshot phase. A snapshot
    reads the table, not the log, so bootstrap works even when the binlog
    before ``snapshot_lsn`` is purged; the tail then streams only events
    with ``commit_lsn >= snapshot_lsn`` (pipelines/replay.py:
    snapshot_then_tail).

    State at L = LWW over events with ``commit_lsn < L``: per key the
    winner is the max-lsn non-tombstone event ('t' never mutates the
    table); a winning delete means the key is absent from the snapshot.
    Snapshot rows carry the WINNER's ``commit_lsn``/``source_offset``
    (what Debezium's snapshot offset records), so any tail event for the
    same key — all at lsn ≥ L > winner — beats it under the sink's LWW
    merge, and replaying the tail twice stays idempotent.

    Vectorized like ``synthesize_events``: the op-code grid is pure numpy
    over (rows × L); only the surviving rows' content re-derivation is a
    per-key Python step (one call per LIVE key, not per event).
    """
    import numpy as np
    import pyarrow.compute as pc

    n = batch.num_rows
    L = min(max(snapshot_lsn, 0), cfg.events_per_key)
    lake_schema = pa.schema([
        ("repo", pa.string()), ("path", pa.string()),
        ("commit_lsn", pa.int64()), ("source_offset", pa.int64()),
        ("is_tombstone", pa.bool_()), ("commit", pa.string()),
        ("lang", pa.string()), ("content", pa.string()),
        ("version", pa.int32()),
    ])
    if n == 0 or L == 0:  # empty table before the first insert
        return lake_schema.empty_table()

    repos = batch.column("repo").to_pylist()
    paths = batch.column("path").to_pylist()
    ks = np.fromiter(
        (key_seed(r, p, cfg.seed) for r, p in zip(repos, paths)),
        dtype=np.uint64, count=n,
    )
    i_row = np.arange(L, dtype=np.uint64)
    rand = (
        ks[:, None] * np.uint64(2654435761) + i_row[None, :] * np.uint64(40503)
    ) & np.uint64(0xFFFFFFFF)
    bucket = (rand % np.uint64(100)).astype(np.int16)
    code = np.where(bucket < 70, 1, np.where(bucket < 85, 2, 3)).astype(np.int8)
    code[:, 0] = 0  # event 0 is always the insert

    mutating = code <= 2  # c/u/d touch the table; 't' does not
    win = (L - 1) - np.argmax(mutating[:, ::-1], axis=1)
    wcode = code[np.arange(n), win]
    live = wcode != 2  # winning delete → absent from the snapshot

    idx = np.nonzero(live)[0]
    win_l = win[idx].astype(np.int64)
    version = np.where(wcode[idx] == 0, 0, win_l).astype(np.int64)
    soff = ((ks[idx].astype(np.int64) & 0x7FFFFFFFFFFF) << 16) | win_l

    contents = batch.column("content").take(pa.array(idx)).to_pylist()
    snap_content = [
        content_version(c, repos[r], paths[r], int(v))
        for c, r, v in zip(contents, idx, version)
    ]
    take = pa.array(idx)
    return pa.table({
        "repo": pc.cast(batch.column("repo").take(take), pa.string()),
        "path": pc.cast(batch.column("path").take(take), pa.string()),
        "commit_lsn": pa.array(win_l, type=pa.int64()),
        "source_offset": pa.array(soff, type=pa.int64()),
        "is_tombstone": pa.array(np.zeros(len(idx), dtype=bool)),
        "commit": pc.cast(batch.column("commit").take(take), pa.string()),
        "lang": pc.cast(batch.column("lang").take(take), pa.string()),
        "content": pa.array(snap_content, type=pa.string()),
        "version": pa.array(version.astype(np.int32), type=pa.int32()),
    })


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
