"""Point lookups on the epoch-delta lake via per-file Bloom sidecars.

A CDC lake is written for scans (merge-on-read over a partition's base +
deltas), but operations teams constantly ask it point questions — "what is
the current row for key K?", "was K deleted?". Answering by scanning the
key's whole partition is O(partition) per probe; at 100 TB that is a
full-rack read for a one-row answer. The standard fix (Delta/Iceberg/Hudi
all ship a variant) is a per-data-file key index that can say "definitely
not in this file" without opening it:

1. ``build_bloom_sidecars`` — for every data file in every partition's
   current read plan, write ``<file>.bloom.json``: a Bloom filter over the
   file's composite keys (the same length-prefixed encoding the router
   hashes, ``sinks/upsert.py:121``). Lake files are IMMUTABLE (epoch N+1
   never rewrites epoch N's bytes; compaction adds bases), so sidecar
   existence == sidecar valid and the build is idempotent — a crashed
   build just resumes. The build itself is a Dataset pipeline (one task
   per file, reading ONLY the key columns).

2. ``point_lookup`` — route each probe key with the sink's own
   murmur2-%-P partitioner (so only 1/P of the lake is even considered
   per key), load the plan files' sidecars (the plan is bounded:
   ≤ 1 base + ``compact_every`` deltas per partition), and schedule read
   tasks ONLY for files whose filter says "maybe". Matched rows flow
   through the same ``lww_winners`` + tombstone-drop the scan path uses,
   so a lookup can never disagree with ``read_lake``. Files missing a
   sidecar are conservatively read (the index is an optimization, never a
   correctness gate).

False positives cost one extra pruned-column file read; false negatives
are impossible (the sidecar hashes every key actually in the file).

Scale notes: the probe set is O(#lookups) driver-side state, never
data-scale. Sidecars are a few KiB (bits_per_key × keys-in-file) and are
read only for the probed partitions' plans. The candidate reads prune to
key + order + tombstone + requested payload columns.

Reference analog: none (engine feature beyond connect-smts' surface; the
lake itself extends the reference's sink side, SURVEY §2.4).
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from connect_smts_ray.core.hashing import murmur2_positive_many
from connect_smts_ray.ops.components import _bloom_hashes
from connect_smts_ray.sinks.upsert import (
    UpsertConfig,
    composite_key_array,
    merge_tables,
)


def _sidecar_path(data_path: str) -> str:
    return data_path + ".bloom.json"


def _next_pow2(n: int) -> int:
    return 1 << max(10, int(n - 1).bit_length())  # ≥ 1024 bits


def _bloom_bits(ckeys, bits: int, k: int) -> np.ndarray:
    """Packed bitmap with each composite key's k double-hashed bits set."""
    bitmap = np.zeros(bits // 8, dtype=np.uint8)
    if len(ckeys):
        h1, h2 = _bloom_hashes(ckeys.to_pandas())
        for i in range(k):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(bits)
            np.bitwise_or.at(
                bitmap, (idx >> np.uint64(3)).astype(np.int64),
                np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8),
            )
    return bitmap


def _bloom_probe(ckeys, bitmap: np.ndarray, bits: int, k: int) -> np.ndarray:
    """True = maybe present, False = definitely absent."""
    h1, h2 = _bloom_hashes(ckeys.to_pandas())
    mask = np.ones(len(h1), dtype=bool)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(bits)
        bit = (bitmap[(idx >> np.uint64(3)).astype(np.int64)]
               >> (idx & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
        mask &= bit.astype(bool)
    return mask


def build_bloom_sidecars(cfg: UpsertConfig, bits_per_key: int = 16,
                         k: int = 8) -> dict:
    """Write a ``<file>.bloom.json`` sidecar for every data file in every
    partition's current read plan. Idempotent (immutable files → existing
    sidecar is final); distributed (one Dataset task per file, key columns
    only). Returns ``{"files": total, "built": n, "skipped": n}``."""
    import ray.data

    cfg = cfg.resolve()
    store = cfg.store()
    files = store.latest_state_files()
    todo = [f for f in files if not os.path.exists(_sidecar_path(f))]
    key_columns = list(cfg.key_columns)

    def build_one(b: pa.Table) -> pa.Table:
        built = []
        for row in b.to_pylist():
            path = row["path"]
            side = _sidecar_path(path)
            if os.path.exists(side):  # raced/resumed build
                built.append(False)
                continue
            keys = pq.read_table(path, columns=key_columns)
            ckeys = composite_key_array(keys, key_columns)
            if isinstance(ckeys, pa.ChunkedArray):
                ckeys = ckeys.combine_chunks()
            ckeys = ckeys.unique()
            bits = _next_pow2(max(1, len(ckeys)) * bits_per_key)
            bitmap = _bloom_bits(ckeys, bits, k)
            doc = {
                "bits": bits, "k": k, "num_keys": len(ckeys),
                "key_columns": key_columns,
                "bitmap": bitmap.tobytes().hex(),
            }
            tmp = f"{side}.tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                json.dump(doc, f)
            os.replace(tmp, side)
            built.append(True)
        return pa.table({"built": pa.array(built, pa.bool_())})

    built = 0
    if todo:
        out = ray.data.from_items([{"path": f} for f in todo]).map_batches(
            build_one, batch_size=1, batch_format="pyarrow"
        ).take_all()
        built = sum(1 for r in out if r["built"])
    return {"files": len(files), "built": built,
            "skipped": len(files) - built}


def point_lookup(cfg: UpsertConfig, keys: pa.Table,
                 columns: list | None = None,
                 as_of: int | None = None) -> tuple:
    """Current-state rows for a probe set of keys, reading only files whose
    Bloom sidecar admits a candidate.

    ``keys``: a table holding exactly ``cfg.key_columns`` (one probe per
    row). Returns ``(state_table, stats)`` where ``state_table`` has the
    same schema/semantics as the scan path restricted to the probed keys
    (absent and tombstoned keys simply yield no row) and ``stats`` counts
    ``plan_files`` / ``candidate_files`` / ``unindexed_files``."""
    import ray.data

    cfg = cfg.resolve()
    store = cfg.store()

    ckeys = composite_key_array(keys, cfg.key_columns)
    if isinstance(ckeys, pa.ChunkedArray):
        ckeys = ckeys.combine_chunks()
    pids = murmur2_positive_many(ckeys) % np.uint32(cfg.num_partitions)

    by_pid: dict[int, list] = {}
    for ck, pid in zip(ckeys.to_pylist(), pids.tolist()):
        by_pid.setdefault(int(pid), []).append(ck)

    plan_files = candidate_files = unindexed = 0
    items = []
    for pid, pid_keys in sorted(by_pid.items()):
        base, deltas = store.read_plan(pid, as_of=as_of)
        files = ([store.base_path(pid, base)] if base is not None else []) + [
            store.state_path(pid, e) for e in deltas
        ]
        plan_files += len(files)
        probe = pa.array(sorted(set(pid_keys)), pa.string())
        for f in files:
            side = _sidecar_path(f)
            try:
                with open(side) as fh:
                    doc = json.load(fh)
                bitmap = np.frombuffer(bytes.fromhex(doc["bitmap"]),
                                       dtype=np.uint8)
                mask = _bloom_probe(probe, bitmap, doc["bits"], doc["k"])
                cand = probe.filter(pa.array(mask))
            except (OSError, ValueError, KeyError):
                # missing OR unreadable/corrupt sidecar (truncated copy,
                # bad hex, absent fields): the index is an optimization,
                # never a correctness gate — fall back to reading the file
                unindexed += 1
                cand = probe  # no index → must read (never skip blindly)
            if len(cand):
                candidate_files += 1
                items.append({"file": f, "ckeys": cand.to_pylist()})

    aux = {cfg.tombstone_column, *cfg.order_columns}
    want = None if columns is None else sorted(
        {*cfg.key_columns, *aux, *columns})
    key_columns = list(cfg.key_columns)

    def probe_file(b: pa.Table) -> pa.Table:
        outs = []
        for row in b.to_pylist():
            names = pq.read_schema(row["file"]).names
            cols = names if want is None else [c for c in want if c in names]
            t = pq.read_table(row["file"], columns=cols)
            fk = composite_key_array(t, key_columns)
            hit = pc.is_in(fk, value_set=pa.array(row["ckeys"], pa.string()))
            outs.append(t.filter(pc.fill_null(hit, False)))
        return pa.concat_tables(outs, promote_options="permissive")

    stats = {"plan_files": plan_files, "candidate_files": candidate_files,
             "unindexed_files": unindexed, "probed_keys": len(ckeys)}

    def empty_like_scan() -> pa.Table:
        # honor the documented contract (same schema as the scan path)
        # even when nothing matches: derive it from any plan file
        for pid in store.all_partitions():
            base, deltas = store.read_plan(pid, as_of=as_of)
            f = (store.base_path(pid, base) if base is not None
                 else (store.state_path(pid, deltas[0]) if deltas else None))
            if f is not None:
                schema = pq.read_schema(f)
                if want is not None:
                    schema = pa.schema(
                        [schema.field(c) for c in want
                         if schema.get_field_index(c) >= 0])
                return schema.empty_table()
        return pa.table({})

    if not items:
        return empty_like_scan(), stats

    import ray

    refs = ray.data.from_items(items).map_batches(
        probe_file, batch_size=1, batch_format="pyarrow"
    ).to_arrow_refs()
    parts = [t for t in ray.get(refs) if t.num_rows]
    if not parts:
        return empty_like_scan(), stats
    # Same LWW + tombstone-drop the scan path applies — a lookup can
    # never disagree with read_lake on a probed key.
    return merge_tables(parts, cfg), stats
