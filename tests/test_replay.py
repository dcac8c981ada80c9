"""End-to-end replay oracles (FIXTURES F7):

- full replay → final LWW table equals the pure-Python oracle, per-row
  sha256(content) equality (the BASELINE.json correctness gate);
- replays are idempotent (exactly-once manifests);
- checkpoint resume: epoch-split run ≡ single run, byte-identical;
- schema evolution: late-arriving nested fields widen the lake schema.
"""

import hashlib
import shutil

import pyarrow as pa
import pytest

from connect_smts_ray.pipelines.replay import (
    ReplayConfig,
    build_event_stream,
    final_state,
    replay,
)
from connect_smts_ray.sources.binlog import BinlogConfig, expected_final_state
from connect_smts_ray.sources.corpus import corpus_table


def state_digest(table: pa.Table) -> str:
    """Order-insensitive digest over (repo, path, sha256(content), lsn)."""
    rows = sorted(
        zip(
            table.column("repo").to_pylist(),
            table.column("path").to_pylist(),
            [
                hashlib.sha256((c or "").encode()).hexdigest()
                for c in table.column("content").to_pylist()
            ],
            table.column("commit_lsn").to_pylist(),
        )
    )
    return hashlib.sha256(repr(rows).encode()).hexdigest()


@pytest.fixture()
def cfg(tmp_path, sf_dir):
    return ReplayConfig(
        sf_dir=sf_dir,
        lake_dir=str(tmp_path / "lake"),
        events_per_key=6,
        num_partitions=8,
        expand_concurrency=2,
        crypto_concurrency=2,
    )


def oracle_table(sf_dir, events_per_key, seed=42) -> dict:
    corpus = corpus_table(sf_dir)
    return expected_final_state(
        corpus, BinlogConfig(events_per_key=events_per_key, seed=seed)
    )


def test_full_replay_matches_oracle(ray_session, cfg, sf_dir):
    replay(cfg, fresh=True)
    got = final_state(cfg)
    want = oracle_table(sf_dir, cfg.events_per_key)

    got_rows = {
        (r, p): (hashlib.sha256(c.encode()).hexdigest(), lsn, v)
        for r, p, c, lsn, v in zip(
            got.column("repo").to_pylist(),
            got.column("path").to_pylist(),
            got.column("content").to_pylist(),
            got.column("commit_lsn").to_pylist(),
            got.column("version").to_pylist(),
        )
    }
    want_rows = {
        k: (
            hashlib.sha256(v["content"].encode()).hexdigest(),
            v["commit_lsn"],
            v["version"],
        )
        for k, v in want.items()
    }
    assert got_rows == want_rows
    assert got.num_rows == len(want)


def test_task_mode_equals_actor_mode(ray_session, tmp_path, sf_dir):
    """The per-worker stateful-task pipeline (default) must produce the
    byte-identical lake state of the classic actor-pool pipeline."""
    import dataclasses

    base = ReplayConfig(
        sf_dir=sf_dir, lake_dir=str(tmp_path / "lake_task"),
        events_per_key=5, num_partitions=8,
        expand_concurrency=2, crypto_concurrency=2,
    )
    assert base.stateful_mode == "task"
    replay(base, fresh=True)
    d_task = state_digest(final_state(base))

    actor = dataclasses.replace(
        base, lake_dir=str(tmp_path / "lake_actor"), stateful_mode="actor"
    )
    replay(actor, fresh=True)
    assert state_digest(final_state(actor)) == d_task


def test_replay_is_idempotent(ray_session, cfg):
    lineage1 = replay(cfg, fresh=True)
    d1 = state_digest(final_state(cfg))
    lineage2 = replay(cfg, fresh=False)  # same epoch again → all skipped
    assert lineage2[0]["skipped"].all()
    assert state_digest(final_state(cfg)) == d1


def test_checkpoint_resume_reconverges(ray_session, tmp_path, sf_dir):
    single = ReplayConfig(
        sf_dir=sf_dir, lake_dir=str(tmp_path / "lake1"),
        events_per_key=6, num_partitions=8, epochs=1,
        expand_concurrency=2, crypto_concurrency=2,
    )
    split = ReplayConfig(
        sf_dir=sf_dir, lake_dir=str(tmp_path / "lake2"),
        events_per_key=6, num_partitions=8, epochs=3,
        expand_concurrency=2, crypto_concurrency=2,
    )
    replay(single, fresh=True)
    replay(split, fresh=True)
    assert state_digest(final_state(single)) == state_digest(final_state(split))

    # resume mid-checkpoint: wipe nothing, rerun only the last epoch
    import pandas as pd

    ds = build_event_stream(split, epoch=2)
    from connect_smts_ray.sinks.upsert import run_upsert

    lin = run_upsert(ds, split.upsert(), epoch=2).to_pandas()
    assert lin["skipped"].all()
    assert state_digest(final_state(split)) == state_digest(final_state(single))


def test_lineage_counts(ray_session, cfg, sf_dir):
    lineage = replay(cfg, fresh=True)
    lin = lineage[0]
    assert (lin["rows_merged"] >= 0).all()
    assert lin["bytes_written"].sum() > 0
    state = final_state(cfg)
    assert lin["rows_merged"].sum() == state.num_rows
    # every partition has at most num_partitions manifests
    assert len(lin) <= cfg.num_partitions


def test_schema_evolution_widens_lake(ray_session, tmp_path):
    """Events whose payload later adds a nested field → final schema carries
    the new column; pre-evolution rows read as null (SURVEY §4.2.4)."""
    import ray.data
    from connect_smts_ray.sinks.upsert import UpsertConfig, read_lake, run_upsert

    lake = str(tmp_path / "lake_evo")
    cfg = UpsertConfig(lake_dir=lake, num_partitions=4)

    batch1 = pa.table({
        "repo": ["r"] * 2, "path": ["a", "b"],
        "commit_lsn": pa.array([0, 0], type=pa.int64()),
        "source_offset": pa.array([1, 2], type=pa.int64()),
        "is_tombstone": [False, False],
        "content": ["c1", "c2"],
    })
    run_upsert(ray.data.from_arrow(batch1), cfg, epoch=0).materialize()

    batch2 = pa.table({
        "repo": ["r"], "path": ["a"],
        "commit_lsn": pa.array([1], type=pa.int64()),
        "source_offset": pa.array([3], type=pa.int64()),
        "is_tombstone": [False],
        "content": ["c1v2"],
        "new_field": ["hello"],   # discovered later
    })
    run_upsert(ray.data.from_arrow(batch2), cfg, epoch=1).materialize()

    state = read_lake(cfg)
    assert "new_field" in state.column_names
    rows = {
        (r, p): (c, nf)
        for r, p, c, nf in zip(
            state.column("repo").to_pylist(),
            state.column("path").to_pylist(),
            state.column("content").to_pylist(),
            state.column("new_field").to_pylist(),
        )
    }
    assert rows[("r", "a")] == ("c1v2", "hello")
    assert rows[("r", "b")] == ("c2", None)  # old row: null for new column


def test_tombstone_deletes_key(ray_session, tmp_path):
    import ray.data
    from connect_smts_ray.sinks.upsert import UpsertConfig, read_lake, run_upsert

    cfg = UpsertConfig(lake_dir=str(tmp_path / "lake_del"), num_partitions=2)
    batch = pa.table({
        "repo": ["r", "r", "r"], "path": ["a", "a", "b"],
        "commit_lsn": pa.array([0, 1, 0], type=pa.int64()),
        "source_offset": pa.array([1, 2, 3], type=pa.int64()),
        "is_tombstone": [False, True, False],
        "content": ["c1", None, "c2"],
    })
    run_upsert(ray.data.from_arrow(batch), cfg, epoch=0).materialize()
    state = read_lake(cfg)
    assert state.column("path").to_pylist() == ["b"]


def test_epoch_delta_no_rewrite(ray_session, tmp_path):
    """Epoch N+1 must not rewrite epoch N's bytes (delta log, not
    full-state-per-epoch), and each delta's size tracks ITS rows, not the
    accumulated partition state."""
    import os

    import ray.data
    from connect_smts_ray.sinks.upsert import UpsertConfig, read_lake, run_upsert

    cfg = UpsertConfig(lake_dir=str(tmp_path / "lake_delta"), num_partitions=2)

    def batch(epoch, n):
        return pa.table({
            "repo": ["r"] * n,
            "path": [f"p{i}" for i in range(n)],
            "commit_lsn": pa.array([epoch] * n, type=pa.int64()),
            "source_offset": pa.array(range(n), type=pa.int64()),
            "is_tombstone": [False] * n,
            "content": [f"c{epoch}-{i}" for i in range(n)],
        })

    run_upsert(ray.data.from_arrow(batch(0, 100)), cfg, epoch=0).materialize()
    store = cfg.store()
    files0 = {
        store.state_path(pid, 0): (
            os.path.getmtime(store.state_path(pid, 0)),
            hashlib.sha256(
                open(store.state_path(pid, 0), "rb").read()
            ).hexdigest(),
        )
        for pid in store.all_partitions()
    }

    # epoch 1 touches only 2 keys — its deltas must be tiny and epoch 0's
    # files must remain byte-identical
    run_upsert(ray.data.from_arrow(batch(1, 2)), cfg, epoch=1).materialize()
    for path, (mtime, digest) in files0.items():
        assert os.path.getmtime(path) == mtime
        assert hashlib.sha256(open(path, "rb").read()).hexdigest() == digest
    delta1_rows = sum(
        pa.parquet.read_table(store.state_path(pid, 1)).num_rows
        for pid in store.all_partitions()
        if os.path.exists(store.state_path(pid, 1))
    )
    assert delta1_rows == 2  # not 100: deltas carry the epoch, not the state

    state = read_lake(cfg)
    rows = {
        (r, p): c for r, p, c in zip(
            state.column("repo").to_pylist(),
            state.column("path").to_pylist(),
            state.column("content").to_pylist(),
        )
    }
    assert rows[("r", "p0")] == "c1-0" and rows[("r", "p1")] == "c1-1"
    assert rows[("r", "p99")] == "c0-99"


def test_compaction_preserves_state_and_old_bytes(ray_session, tmp_path):
    """Compaction (every compact_every epochs) must not change the merged
    state, must leave committed delta bytes untouched, and must make the
    read plan collapse to base + post-base deltas."""
    import os

    import ray.data
    from connect_smts_ray.sinks.upsert import UpsertConfig, read_lake, run_upsert

    # one partition: compaction triggers only for partitions that receive
    # rows in the trigger epoch, so a multi-partition assertion would race
    # with which keys hash where
    cfg = UpsertConfig(
        lake_dir=str(tmp_path / "lake_compact"), num_partitions=1,
        compact_every=2,
    )

    def batch(epoch):
        # overlapping keys + one tombstone per epoch
        return pa.table({
            "repo": ["r"] * 3,
            "path": ["a", "b", f"e{epoch}"],
            "commit_lsn": pa.array([epoch] * 3, type=pa.int64()),
            "source_offset": pa.array([0, 1, 2], type=pa.int64()),
            "is_tombstone": [False, epoch == 1, False],
            "content": [f"a{epoch}", None if epoch == 1 else f"b{epoch}",
                        f"x{epoch}"],
        })

    digests = []
    for e in range(4):
        run_upsert(ray.data.from_arrow(batch(e)), cfg, epoch=e).materialize()
        digests.append(state_digest(read_lake(cfg)))

    store = cfg.store()
    for pid in store.all_partitions():
        base, deltas = store.read_plan(pid)
        assert base == 3                    # trigger: (e+1) % 2 == 0 → e ∈ {1, 3}
        assert deltas == []                 # nothing after the base
        assert store.committed_base_epochs(pid) == [1, 3]
    # replaying an already-committed epoch after compaction is still a no-op
    lin = run_upsert(
        ray.data.from_arrow(batch(2)), cfg, epoch=2
    ).to_pandas()
    assert lin["skipped"].all()
    assert state_digest(read_lake(cfg)) == digests[-1]
    # tombstone applied: 'b' was deleted at epoch 1 and re-inserted at 2, 3
    state = read_lake(cfg)
    rows = dict(zip(state.column("path").to_pylist(),
                    state.column("content").to_pylist()))
    assert rows["a"] == "a3" and rows["b"] == "b3"


def test_read_lake_ds_matches_driver_read(ray_session, cfg):
    """The distributed merge-on-read path must equal the driver-side read."""
    from connect_smts_ray.sinks.upsert import read_lake, read_lake_ds

    replay(cfg, fresh=True)
    got = read_lake_ds(cfg.upsert()).to_pandas()
    want = read_lake(cfg.upsert()).to_pandas()
    key = ["repo", "path"]
    got = got.sort_values(key).reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values(key).reset_index(drop=True)[sorted(want.columns)]
    assert got.equals(want)


def test_resume_with_compaction_reconverges(ray_session, tmp_path, sf_dir):
    """Epoch-split replay WITH mid-run compaction (compact_every=2 over 4
    epochs → bases after epochs 1 and 3) must still equal the single-shot
    replay, and resuming a committed epoch must stay a no-op after its
    range was compacted away."""
    single = ReplayConfig(
        sf_dir=sf_dir, lake_dir=str(tmp_path / "lake_s"),
        events_per_key=8, num_partitions=4, epochs=1,
        expand_concurrency=2, crypto_concurrency=2,
    )
    split = ReplayConfig(
        sf_dir=sf_dir, lake_dir=str(tmp_path / "lake_c"),
        events_per_key=8, num_partitions=4, epochs=4, compact_every=2,
        expand_concurrency=2, crypto_concurrency=2,
    )
    replay(single, fresh=True)
    replay(split, fresh=True)
    assert state_digest(final_state(single)) == state_digest(final_state(split))

    # at least one partition must actually have compacted
    store = split.upsert().store()
    assert any(store.committed_base_epochs(pid)
               for pid in store.all_partitions())

    # replay epoch 1 (covered by a base) → still skipped, state unchanged
    from connect_smts_ray.sinks.upsert import run_upsert

    ds = build_event_stream(split, epoch=1)
    lin = run_upsert(ds, split.upsert(), epoch=1).to_pandas()
    assert lin["skipped"].all()
    assert state_digest(final_state(split)) == state_digest(final_state(single))


def test_time_travel_every_epoch(ray_session, tmp_path, sf_dir):
    """as_of=e must equal the pure-Python oracle cut at that epoch's lsn
    hi — including cuts that land before, on, and after compacted bases
    (compact_every=2 over 6 epochs → bases at 1, 3, 5)."""
    cfg = ReplayConfig(
        sf_dir=sf_dir, lake_dir=str(tmp_path / "lake_tt"),
        events_per_key=6, num_partitions=4, epochs=6, compact_every=2,
        expand_concurrency=2, crypto_concurrency=2,
    )
    replay(cfg, fresh=True)

    def state_sha(table):
        return {
            (r, p): hashlib.sha256(c.encode()).hexdigest()
            for r, p, c in zip(
                table.column("repo").to_pylist(),
                table.column("path").to_pylist(),
                table.column("content").to_pylist(),
            )
        }

    for e in range(cfg.epochs):
        lo, hi = cfg.epoch_lsn_range(e)
        want = oracle_table(sf_dir, hi)
        got = final_state(cfg, as_of=e)
        assert state_sha(got) == {
            k: hashlib.sha256(v["content"].encode()).hexdigest()
            for k, v in want.items()
        }, f"as_of={e}"
    # head == as_of last epoch == plain read
    assert state_sha(final_state(cfg, as_of=cfg.epochs - 1)) == \
        state_sha(final_state(cfg))


def test_vacuum_retention(ray_session, tmp_path, sf_dir):
    """vacuum keeps the head byte-identical, keeps time travel within
    retention, deletes covered deltas + older bases, and raises on as_of
    below the horizon. Second vacuum is a no-op."""
    import os

    from connect_smts_ray.sinks.manifest import vacuum

    cfg = ReplayConfig(
        sf_dir=sf_dir, lake_dir=str(tmp_path / "lake_vac"),
        events_per_key=6, num_partitions=4, epochs=6, compact_every=2,
        expand_concurrency=2, crypto_concurrency=2,
    )
    replay(cfg, fresh=True)
    store = cfg.upsert().resolve().store()

    def sha(table):
        return {
            (r, p): hashlib.sha256(c.encode()).hexdigest()
            for r, p, c in zip(
                table.column("repo").to_pylist(),
                table.column("path").to_pylist(),
                table.column("content").to_pylist(),
            )
        }

    head_before = sha(final_state(cfg))
    asof4_before = sha(final_state(cfg, as_of=4))
    asof3_before = sha(final_state(cfg, as_of=3))

    changed = vacuum(store, retain_epochs=2)
    assert changed, "nothing vacuumed"
    # bases at 1,3,5 (compact_every=2): anchor covers 3 -> deltas 0-3 gone
    pid0 = store.all_partitions()[0]
    assert not os.path.exists(store.state_path(pid0, 0))
    assert not os.path.exists(store.base_path(pid0, 1))
    assert os.path.exists(store.state_path(pid0, 4))

    assert sha(final_state(cfg)) == head_before
    assert sha(final_state(cfg, as_of=4)) == asof4_before
    # as_of == the anchor's cover (the horizon itself) is exactly the
    # anchor base — still reconstructible after vacuum.
    assert sha(final_state(cfg, as_of=3)) == asof3_before
    with pytest.raises(ValueError, match="vacuum horizon"):
        final_state(cfg, as_of=2)

    assert vacuum(store, retain_epochs=2) == {}  # idempotent no-op
    assert sha(final_state(cfg)) == head_before


def test_run_until_tail_reconverges(ray_session, tmp_path, sf_dir):
    """Micro-batch ingestion driver: corpus files appended between calls
    reconverge to the same sha256 state as a single-shot replay over the
    union corpus; a simulated crash in the upsert→ledger window re-ingests
    idempotently; epoch numbers continue across calls via the ledger."""
    import json
    import os

    import pyarrow.parquet as pq

    from connect_smts_ray.pipelines.replay import _ledger_path, run_until

    # split the sf corpus into three arrival files
    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    watch = tmp_path / "incoming"
    os.makedirs(watch)
    n = docs.num_rows
    cuts = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        pq.write_table(docs.slice(cuts[i], cuts[i + 1] - cuts[i]),
                       str(watch / f"arrival_{i}.parquet"))

    cfg = ReplayConfig(
        sf_dir=sf_dir, lake_dir=str(tmp_path / "lake_tail"),
        events_per_key=6, num_partitions=4, epochs=1,
        expand_concurrency=2, crypto_concurrency=2,
    )

    # arrival 0 only, then the rest appear before the second call
    os.rename(watch / "arrival_1.parquet", tmp_path / "a1.hold")
    os.rename(watch / "arrival_2.parquet", tmp_path / "a2.hold")
    lin1 = run_until(cfg, str(watch), fresh=True)
    assert len(lin1) == 1
    os.rename(tmp_path / "a1.hold", watch / "arrival_1.parquet")
    os.rename(tmp_path / "a2.hold", watch / "arrival_2.parquet")
    lin2 = run_until(cfg, str(watch))
    assert len(lin2) == 2

    ledger = json.load(open(_ledger_path(cfg)))
    assert ledger["files"] == {
        "arrival_0.parquet": 0, "arrival_1.parquet": 1,
        "arrival_2.parquet": 2,
    }

    # single-shot oracle over the union corpus
    single = ReplayConfig(
        sf_dir=sf_dir, lake_dir=str(tmp_path / "lake_single"),
        events_per_key=6, num_partitions=4, epochs=1,
        expand_concurrency=2, crypto_concurrency=2,
    )
    replay(single, fresh=True)
    assert state_digest(final_state(cfg)) == state_digest(final_state(single))

    # crash window: upsert committed but ledger write lost → the file
    # re-ingests under the SAME epoch and every partition no-ops
    del ledger["files"]["arrival_2.parquet"]
    tmp = _ledger_path(cfg) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(ledger, f)
    os.replace(tmp, _ledger_path(cfg))
    lin3 = run_until(cfg, str(watch))
    assert len(lin3) == 1
    assert bool(lin3[0]["skipped"].all())
    assert state_digest(final_state(cfg)) == state_digest(final_state(single))

    # nothing new → drain-and-return with no batches
    assert run_until(cfg, str(watch)) == []


def test_snapshot_then_tail_reconverges(ray_session, tmp_path, sf_dir):
    """Debezium-style bootstrap: initial table snapshot at LSN L, then the
    binlog tail (events with lsn >= L) — sha256-identical to a full-history
    replay for L at the boundaries and mid-stream; tail re-run no-ops."""
    from connect_smts_ray.pipelines.replay import snapshot_then_tail
    from connect_smts_ray.sinks.upsert import run_upsert

    single = ReplayConfig(
        sf_dir=sf_dir, lake_dir=str(tmp_path / "lake_full"),
        events_per_key=6, num_partitions=4,
        expand_concurrency=2, crypto_concurrency=2,
    )
    replay(single, fresh=True)
    want = state_digest(final_state(single))

    for lsn in (0, 3, 6):  # no snapshot / mid-stream / snapshot-only
        cfg = ReplayConfig(
            sf_dir=sf_dir, lake_dir=str(tmp_path / f"lake_snap{lsn}"),
            events_per_key=6, num_partitions=4,
            expand_concurrency=2, crypto_concurrency=2,
        )
        lineage = snapshot_then_tail(cfg, snapshot_lsn=lsn, fresh=True)
        assert state_digest(final_state(cfg)) == want, f"L={lsn}"
        assert len(lineage) == (1 if lsn == 6 else 2)

    # exactly-once: re-running the tail epoch is a per-partition no-op
    cfg3 = ReplayConfig(
        sf_dir=sf_dir, lake_dir=str(tmp_path / "lake_snap3"),
        events_per_key=6, num_partitions=4,
        expand_concurrency=2, crypto_concurrency=2,
    )
    tail = build_event_stream(cfg3, lsn_range=(3, 6))
    lin = run_upsert(tail, cfg3.upsert(), epoch=1).to_pandas()
    assert bool(lin["skipped"].all())
    assert state_digest(final_state(cfg3)) == want


def test_synthesize_snapshot_matches_prefix_oracle(sf_dir):
    """The vectorized snapshot generator equals the pure-Python LWW oracle
    restricted to events with lsn < L, for every L."""
    from connect_smts_ray.sources.binlog import synthesize_snapshot

    corpus = corpus_table(sf_dir).slice(0, 40)
    K = 6
    for L in range(0, K + 1):
        snap = synthesize_snapshot(corpus, BinlogConfig(events_per_key=K), L)
        want = (
            expected_final_state(corpus, BinlogConfig(events_per_key=L))
            if L else {}
        )
        got = {
            (r, p): (c, lsn, v)
            for r, p, c, lsn, v in zip(
                snap.column("repo").to_pylist(),
                snap.column("path").to_pylist(),
                snap.column("content").to_pylist(),
                snap.column("commit_lsn").to_pylist(),
                snap.column("version").to_pylist(),
            )
        }
        assert got == {
            k: (v["content"], v["commit_lsn"], v["version"])
            for k, v in want.items()
        }, f"L={L}"
        assert not snap.column("is_tombstone").to_pylist().count(True)


def test_snapshot_tags(ray_session, tmp_path, sf_dir):
    """Named snapshot tags: a tag is a vacuum-pinned as_of — tag reads
    equal the as_of read byte-for-byte, vacuum cannot reclaim a tagged
    cut, deleting the tag releases it, and the tag API enforces its
    invariants (idempotent re-create, collision raises, unknown raises,
    tagging below the horizon raises)."""
    import os

    from connect_smts_ray.sinks.manifest import (
        create_tag,
        delete_tag,
        list_tags,
        resolve_tag,
        vacuum,
    )
    from connect_smts_ray.sinks.upsert import read_lake

    cfg = ReplayConfig(
        sf_dir=sf_dir, lake_dir=str(tmp_path / "lake_tag"),
        events_per_key=6, num_partitions=4, epochs=6, compact_every=2,
        expand_concurrency=2, crypto_concurrency=2,
    )
    replay(cfg, fresh=True)
    ucfg = cfg.upsert().resolve()
    store = ucfg.store()

    def sha(table):
        return {
            (r, p): hashlib.sha256(c.encode()).hexdigest()
            for r, p, c in zip(
                table.column("repo").to_pylist(),
                table.column("path").to_pylist(),
                table.column("content").to_pylist(),
            )
        }

    assert create_tag(store, "release-1", as_of=1) == {"as_of": 1}
    create_tag(store, "release-1", as_of=1)  # idempotent re-create
    with pytest.raises(ValueError, match="already points"):
        create_tag(store, "release-1", as_of=2)
    head_tag = create_tag(store, "head")  # defaults to newest epoch
    assert head_tag["as_of"] == cfg.epochs - 1
    assert resolve_tag(store, "release-1") == 1
    assert set(list_tags(store)) == {"release-1", "head"}
    with pytest.raises(KeyError):
        resolve_tag(store, "nope")

    tag_read_before = sha(read_lake(ucfg, tag="release-1"))
    assert tag_read_before == sha(read_lake(ucfg, as_of=1))
    with pytest.raises(ValueError, match="not both"):
        read_lake(ucfg, as_of=1, tag="release-1")

    # vacuum with retention that WOULD reclaim epochs 0-3 is pinned by
    # the release-1 tag: target clamps to 1, so the anchor covers <= 1
    # and the tagged cut survives byte-identically
    vacuum(store, retain_epochs=2)
    assert sha(read_lake(ucfg, tag="release-1")) == tag_read_before
    pid0 = store.all_partitions()[0]
    assert os.path.exists(store.state_path(pid0, 2))  # not reclaimed

    # tagging below an established horizon must raise
    assert delete_tag(store, "release-1") is True
    assert delete_tag(store, "release-1") is False  # idempotent
    changed = vacuum(store, retain_epochs=2)  # now free to advance
    assert changed
    with pytest.raises(ValueError, match="vacuum horizon"):
        create_tag(store, "too-late", as_of=0)
    # head tag still pins nothing below the new horizon; still readable
    assert sha(read_lake(ucfg, tag="head")) == sha(read_lake(ucfg))
