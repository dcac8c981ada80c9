"""Flagship CDC replay pipeline (SURVEY §3.5) — the full chain:

    corpus (repo,path,commit,lang,content)
      → SynthesizeBinlog                      # Debezium-shaped events, N× scale
      → EncryptColumn(payload)                # fixture synthesis: encrypted source
      → DecryptColumn(payload)                # actor pool, JWK ring in __init__
      → outbox_route                          # tombstones, partition routing
      → ExpandJson(out_payload)               # actor pool, schema registry
      → FieldMapping                          # flatten struct → lake columns
      → LWW upsert (hash shuffle on (repo,path)) + manifests

Each epoch covers a contiguous ``commit_lsn`` range (per-key lsn is monotone
across epochs — the Kafka per-partition ordering guarantee the LWW merge
relies on). Resume = rerun any epoch range; committed ``(partition_id,
epoch)`` manifests make replays exact no-ops, so the final lake state is
byte-identical from any checkpoint (tests/test_replay.py asserts
sha256-exact reconvergence).
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from connect_smts_ray.core.schema import SType, stype_to_dict
from connect_smts_ray.core.worker_state import stateful_task
from connect_smts_ray.sources.binlog import BinlogConfig, synthesize_events
from connect_smts_ray.sinks.upsert import UpsertConfig, read_lake, run_upsert
from connect_smts_ray.transforms.crypto import (
    DecryptColumn,
    EncryptColumn,
    JoseConfig,
)
from connect_smts_ray.transforms.expand_json import ExpandJson, ExpandJsonConfig
from connect_smts_ray.transforms.field_mapping import (
    FieldMap,
    FieldMappingConfig,
    apply_field_mapping,
)
from connect_smts_ray.transforms.outbox import OutboxConfig, outbox_route

# Reference test JWK (JoseTest.java:25) — a synthetic symmetric test key.
TEST_JWK = (
    "eyJrdHkiOiJvY3QiLCJraWQiOiJIMmg1WHlIM0dPSHQ4Wm5vTndBOUFoay1FQlJ3cTQxTHo3U01p"
    "WDJDLVRJIiwiYWxnIjoiQTI1NkdDTSIsImsiOiJkR2tQRU41YUhaQnFocDY5TmpVWGpjTUJST1R4"
    "amZ6Yl9hYldVeUo2ajBBIn0="
)

# Stable payload schema for ExpandJson bootstrap: every actor starts from the
# same widened schema → identical block schemas across the cluster
# (the union-previous-messages-schema.topic.{t}.field.{f} analog).
PAYLOAD_BOOTSTRAP = SType(
    "struct",
    name="out_payload",
    fields=(
        ("commit", SType("string", optional=True)),
        ("content", SType("string", optional=True)),
        ("lang", SType("string", optional=True)),
        ("path", SType("string", optional=True)),
        ("repo", SType("string", optional=True)),
        ("version", SType("int32", optional=True)),
    ),
)

LAKE_MAPPING = FieldMappingConfig(
    keep=("repo", "path", "commit_lsn", "source_offset", "is_tombstone"),
    mappings=(
        FieldMap("commit", "out_payload.commit"),
        FieldMap("lang", "out_payload.lang"),
        FieldMap("content", "out_payload.content"),
        FieldMap("version", "out_payload.version", pa.int32()),
    ),
)


@dataclass(frozen=True)
class ReplayConfig:
    sf_dir: str
    lake_dir: str
    events_per_key: int = 8
    num_partitions: int = 16
    epochs: int = 1
    encrypt: bool = True
    keys: str = TEST_JWK
    expand_concurrency: int = 4
    crypto_concurrency: int = 4
    # Fractional so the stage pools co-schedule with the stateless tasks on
    # small CPU budgets; size concurrency × num_cpus ≤ cluster CPUs.
    actor_num_cpus: float = 0.5
    # "task" (default): the stateful stages run as plain tasks with the
    # instance cached per worker process (core/worker_state.py) — no pool
    # cap, stages scale with cluster CPUs, fused per-block chains. "actor":
    # classic fixed actor pools sized by the *_concurrency knobs above
    # (kept for genuinely expensive state and as the comparison baseline;
    # task-vs-actor output equality is pinned in tests/test_replay.py).
    stateful_mode: str = "task"
    batch_size: int = 8192
    seed: int = 42
    # Blocks to split the corpus read into. A single small Parquet file
    # otherwise yields ONE block and the whole downstream pipeline collapses
    # onto one task. None → derived so each block amplifies to roughly
    # ``target_events_per_block`` events: block size must be bounded in
    # EVENTS (post-amplification), not corpus rows — oversized event blocks
    # (>100k rows) measured 8× slower end-to-end at 32 CPUs (giant per-batch
    # Python object churn inside every actor + lumpy scheduling).
    read_blocks: int | None = None
    target_events_per_block: int = 24576
    compact_every: int = 8  # forwarded to the upsert sink's compaction

    def effective_read_blocks(self, n_corpus_rows: int | None = None) -> int:
        if self.read_blocks is not None:
            return self.read_blocks
        floor = 2 * max(2, self.expand_concurrency, self.crypto_concurrency)
        # The fused per-block task chain can use at most num_blocks cores:
        # on small corpora the events-per-block target alone can yield fewer
        # blocks than the cluster has CPUs (sf0.1 × 100 events/key → 21
        # blocks → 18 of 32 cores busy, measured). Fan out to ≥ 2× cluster
        # CPUs; the event-size cap only matters in the OTHER direction
        # (oversized blocks), and at real scale by_events ≫ CPUs anyway.
        try:
            import ray

            if ray.is_initialized():
                floor = max(
                    floor, 2 * int(ray.cluster_resources().get("CPU", 0))
                )
        except Exception:
            pass
        if not n_corpus_rows:
            return floor
        by_events = -(-n_corpus_rows * self.events_per_key
                      // self.target_events_per_block)
        return min(max(floor, min(by_events, 4096)),
                   max(1, n_corpus_rows))

    def binlog(self) -> BinlogConfig:
        return BinlogConfig(events_per_key=self.events_per_key, seed=self.seed)

    def upsert(self) -> UpsertConfig:
        return UpsertConfig(
            lake_dir=self.lake_dir, num_partitions=self.num_partitions,
            compact_every=self.compact_every,
        )

    def jose(self) -> JoseConfig:
        return JoseConfig(keys=self.keys, columns=("payload",))

    def expand(self) -> ExpandJsonConfig:
        return ExpandJsonConfig(
            columns=("out_payload",),
            bootstrap_schemas={"out_payload": [stype_to_dict(PAYLOAD_BOOTSTRAP)]},
        )

    def outbox(self) -> OutboxConfig:
        return OutboxConfig(
            topic="lake.files",
            partition_setting="partition-key",
            num_partitions=self.num_partitions,
            # LAKE_MAPPING projects headers away immediately — skip the
            # per-row header JSON encode (vectorized outbox fast path).
            emit_headers=False,
        )

    def epoch_lsn_range(self, epoch: int) -> tuple:
        per = max(1, self.events_per_key // self.epochs)
        lo = epoch * per
        hi = (epoch + 1) * per if epoch < self.epochs - 1 else self.events_per_key
        return lo, hi


def _payload_to_string(batch: pa.Table) -> pa.Table:
    idx = batch.column_names.index("payload")
    return batch.set_column(
        idx,
        pa.field("payload", pa.string()),
        pc.cast(batch.column("payload"), pa.string()),
    )


def build_event_stream(cfg: ReplayConfig, epoch=None,
                       source_path: str | None = None,
                       lsn_range: tuple | None = None) -> "ray.data.Dataset":
    """corpus → binlog events (optionally restricted to one epoch's lsn
    range) → decrypted, routed, expanded, flattened lake-ready rows.
    ``source_path`` overrides the corpus file (micro-batch ingestion reads
    one arriving file at a time; default is the sf_dir documents table).
    ``lsn_range`` overrides the epoch-derived slice (snapshot_then_tail
    streams only the post-snapshot suffix)."""
    # Task granularity note: batch_size=None everywhere below makes one task
    # per input BLOCK. This matters because the synth stage amplifies rows
    # events_per_key×: a row-count batch_size would bundle tasks by
    # pre-amplification corpus rows and collapse the whole pipeline into one
    # task on small inputs. Blocks after synthesis are already ~(corpus block
    # rows × events_per_key) events — the right batch size — and at real
    # scale Ray's dynamic block splitting caps them at target_max_block_size.
    import pyarrow.parquet as _pq

    from connect_smts_ray.sources.corpus import read_corpus_file

    src = source_path or f"{cfg.sf_dir}/documents.parquet"
    n_corpus = _pq.read_metadata(src).num_rows
    ds = read_corpus_file(src, num_blocks=cfg.effective_read_blocks(n_corpus))
    binlog_cfg = cfg.binlog()
    # Epoch slices are generated, not filtered: synthesize_events(lsn_range)
    # emits only the epoch's lsn span (every column is a pure function of
    # the event index, so the slice is byte-identical to filtering the full
    # stream) — an E-epoch replay synthesizes each event once total instead
    # of E times (VERDICT r02 #4; equality pinned in tests/test_replay.py).
    if lsn_range is None:
        lsn_range = cfg.epoch_lsn_range(epoch) if epoch is not None else None
    ds = ds.map_batches(
        lambda b: synthesize_events(b, binlog_cfg, lsn_range=lsn_range),
        batch_format="pyarrow",
        batch_size=None,
    )
    task_mode = cfg.stateful_mode == "task"
    if cfg.encrypt:
        if task_mode:
            ds = ds.map_batches(
                stateful_task(EncryptColumn, config=cfg.jose(),
                              deterministic=True),
                batch_format="pyarrow", batch_size=None,
            )
            ds = ds.map_batches(
                stateful_task(DecryptColumn, config=cfg.jose()),
                batch_format="pyarrow", batch_size=None,
            )
        else:
            ds = ds.map_batches(
                EncryptColumn,
                fn_constructor_kwargs={"config": cfg.jose(),
                                       "deterministic": True},
                batch_format="pyarrow",
                batch_size=None,
                concurrency=cfg.crypto_concurrency,
                num_cpus=cfg.actor_num_cpus,
                max_restarts=0,
            )
            ds = ds.map_batches(
                DecryptColumn,
                fn_constructor_kwargs={"config": cfg.jose()},
                batch_format="pyarrow",
                batch_size=None,
                concurrency=cfg.crypto_concurrency,
                num_cpus=cfg.actor_num_cpus,
                max_restarts=0,
            )
        ds = ds.map_batches(_payload_to_string, batch_format="pyarrow")

    outbox_cfg = cfg.outbox()
    ds = ds.map_batches(
        lambda b: outbox_route(b, outbox_cfg),
        batch_format="pyarrow",
        batch_size=None,
    )
    if task_mode:
        ds = ds.map_batches(
            stateful_task(ExpandJson, config=cfg.expand()),
            batch_format="pyarrow", batch_size=None,
        )
    else:
        ds = ds.map_batches(
            ExpandJson,
            fn_constructor_kwargs={"config": cfg.expand()},
            batch_format="pyarrow",
            batch_size=None,
            concurrency=cfg.expand_concurrency,
            num_cpus=cfg.actor_num_cpus,
            # max_restarts=0: actor replacement is owned by Ray Data's pool
            # (state rebuilds in __init__); core-worker restart would depend
            # on ctor args living in the object store (ray#53727 warning).
            max_restarts=0,
        )
    ds = ds.map_batches(
        lambda b: apply_field_mapping(b, LAKE_MAPPING), batch_format="pyarrow"
    )
    return ds


def replay(cfg: ReplayConfig, fresh: bool = False) -> list:
    """Run all epochs; returns the list of per-epoch lineage tables."""
    if fresh:
        shutil.rmtree(cfg.lake_dir, ignore_errors=True)
    lineage = []
    for epoch in range(cfg.epochs):
        ds = build_event_stream(cfg, epoch=epoch if cfg.epochs > 1 else None)
        lin = run_upsert(ds, cfg.upsert(), epoch=epoch)
        lineage.append(lin.to_pandas())
    return lineage


def snapshot_then_tail(cfg: ReplayConfig, snapshot_lsn: int,
                       fresh: bool = False) -> list:
    """Debezium-style bootstrap: consistent initial SNAPSHOT of the source
    table at ``snapshot_lsn`` (epoch 0), then the binlog TAIL of events
    with ``commit_lsn >= snapshot_lsn`` (epoch 1) — reconverging to the
    exact same final state as a full-history replay, without needing any
    log before the snapshot point (the "binlog was purged" reality every
    real CDC deployment bootstraps from).

    Why it reconverges (pinned in tests/test_replay.py): snapshot rows
    carry their winner's lsn < snapshot_lsn, so every tail event for the
    same key beats them under LWW; a key whose overall winner predates the
    snapshot receives only dropped tombstones in the tail, and its
    snapshot row — already the final state — survives untouched.

    Both phases commit through the same (partition, epoch) manifests, so
    the bootstrap is exactly-once and resumable: a crashed/duplicated
    snapshot or tail re-run is a per-partition no-op."""
    if fresh:
        shutil.rmtree(cfg.lake_dir, ignore_errors=True)
    import pyarrow.parquet as _pq

    from connect_smts_ray.sources.binlog import synthesize_snapshot
    from connect_smts_ray.sources.corpus import read_corpus_file

    src = f"{cfg.sf_dir}/documents.parquet"
    n_corpus = _pq.read_metadata(src).num_rows
    snap = read_corpus_file(src, num_blocks=cfg.effective_read_blocks(n_corpus))
    binlog_cfg = cfg.binlog()
    snap = snap.map_batches(
        lambda b: synthesize_snapshot(b, binlog_cfg, snapshot_lsn),
        batch_format="pyarrow", batch_size=None,
    )
    lineage = [run_upsert(snap, cfg.upsert(), epoch=0).to_pandas()]
    if snapshot_lsn < cfg.events_per_key:
        tail = build_event_stream(
            cfg, lsn_range=(snapshot_lsn, cfg.events_per_key)
        )
        lineage.append(run_upsert(tail, cfg.upsert(), epoch=1).to_pandas())
    return lineage


def final_state(cfg: ReplayConfig, as_of: int | None = None) -> pa.Table:
    """Lake state at the head, or time-traveled to the end of epoch
    ``as_of`` (exact: the delta log keeps every epoch's bytes)."""
    return read_lake(cfg.upsert(), as_of=as_of)


# ---------------------------------------------------------------------------
# Micro-batch ingestion driver (Kafka Connect's runtime role)
# ---------------------------------------------------------------------------

def _ledger_path(cfg: ReplayConfig) -> str:
    import os

    return os.path.join(cfg.lake_dir, "_INGEST_LEDGER.json")


def _read_ledger(cfg: ReplayConfig) -> dict:
    import json

    try:
        with open(_ledger_path(cfg)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {"files": {}}


def _write_ledger(cfg: ReplayConfig, ledger: dict) -> None:
    import json
    import os

    os.makedirs(cfg.lake_dir, exist_ok=True)
    tmp = _ledger_path(cfg) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(ledger, f, sort_keys=True)
    os.replace(tmp, _ledger_path(cfg))  # rename = the batch's commit point


def run_until(cfg: ReplayConfig, watch_dir: str,
              max_batches: int | None = None, poll_interval: float = 0.25,
              idle_polls: int = 0, fresh: bool = False) -> list:
    """Continuous / micro-batch ingestion: tail ``watch_dir`` for corpus
    parquet files and ingest each NEW file as its own upsert epoch — the
    long-running-runtime role Kafka Connect plays around the reference's
    SMTs, expressed as a resume-aware driver loop over the exactly-once
    sink.

    Exactly-once under crashes, with NO coordination beyond the lake:

    - one file per epoch, files ingested in sorted-name order, so the
      file→epoch assignment is a pure function of the ledger — a crashed
      batch re-runs with the SAME epoch number, where already-committed
      (partition, epoch) manifests turn the rerun into per-partition
      no-ops (the resume machinery of ``replay`` itself);
    - the ingestion ledger (``_INGEST_LEDGER.json``, tmp+rename) commits
      AFTER the epoch's upsert: the crash window between upsert-commit and
      ledger-commit re-ingests idempotently, never skips;
    - epoch numbers continue from the ledger across process restarts, so
      a restarted tailer appends instead of colliding.

    Stops once ``max_batches`` files have been ingested THIS call, or after
    ``idle_polls`` consecutive empty scans (0 → drain what's there and
    return; raise it for a long-running tail). Returns the per-batch
    lineage tables. Final state equals a single-shot replay over the union
    corpus — LWW is per-key and each key's full event grid lands in one
    epoch (pinned by test_run_until_tail_reconverges; keys must not
    straddle files, the per-key analog of Kafka's partition ordering)."""
    import os
    import time

    if fresh:
        shutil.rmtree(cfg.lake_dir, ignore_errors=True)
    lineage = []
    ingested = 0
    idle = 0
    while True:
        ledger = _read_ledger(cfg)
        new = sorted(
            f for f in os.listdir(watch_dir)
            if f.endswith(".parquet") and f not in ledger["files"]
        )
        if not new:
            if idle >= idle_polls:
                return lineage
            idle += 1
            time.sleep(poll_interval)
            continue
        idle = 0
        if "base_epoch" not in ledger:
            # First ledger write for this lake: epochs must start ABOVE
            # everything a prior replay()/snapshot_then_tail committed —
            # the ledger never saw those epochs, and reusing a number
            # would make the idempotence gate silently no-op this file's
            # data (round-5 review finding). The base is PINNED into the
            # ledger so a crash between upsert-commit and ledger-commit
            # still re-runs the file at the SAME epoch (byte-idempotent
            # resume), which a live store-max probe would break.
            store = cfg.upsert().resolve().store()
            deltas = store.manifest_index()["deltas"]
            ledger["base_epoch"] = max(
                (max(es) for es in deltas.values() if es), default=-1) + 1
            # durable BEFORE the first upsert commit: a crash in the
            # first batch must re-derive the SAME base on restart
            _write_ledger(cfg, ledger)
        for fname in new:
            epoch = max(max(ledger["files"].values(), default=-1) + 1,
                        int(ledger["base_epoch"]))
            ds = build_event_stream(
                cfg, epoch=None, source_path=os.path.join(watch_dir, fname)
            )
            lin = run_upsert(ds, cfg.upsert(), epoch=epoch)
            lineage.append(lin.to_pandas())
            ledger["files"][fname] = epoch
            _write_ledger(cfg, ledger)
            ingested += 1
            if max_batches is not None and ingested >= max_batches:
                return lineage
