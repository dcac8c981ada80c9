"""Bloom-sidecar point lookups (sinks/lookup.py).

The contract under test: a point lookup returns exactly the scan path's
rows for the probed keys (never disagrees with read_lake), tombstoned and
absent keys yield nothing, sidecar builds are idempotent over the
immutable lake files, and the bloom index actually prunes file reads when
a key is absent from an epoch's delta.
"""

import pyarrow as pa
import pytest

from connect_smts_ray.sinks.lookup import (
    build_bloom_sidecars,
    point_lookup,
)
from connect_smts_ray.sinks.upsert import UpsertConfig, read_lake, run_upsert


def _batch(rows):
    return pa.table({
        "repo": pa.array([r[0] for r in rows], pa.string()),
        "path": pa.array([r[1] for r in rows], pa.string()),
        "commit_lsn": pa.array([r[2] for r in rows], pa.int64()),
        "source_offset": pa.array([r[3] for r in rows], pa.int64()),
        "is_tombstone": pa.array([r[4] for r in rows], pa.bool_()),
        "content": pa.array([r[5] for r in rows], pa.string()),
    })


def _keys(pairs):
    return pa.table({
        "repo": pa.array([p[0] for p in pairs], pa.string()),
        "path": pa.array([p[1] for p in pairs], pa.string()),
    })


@pytest.fixture()
def lake(ray_session, tmp_path):
    """Two epochs touching DISJOINT key sets (epoch 1 only updates 'a' and
    deletes 'd'), so bloom pruning inside a partition is observable."""
    import ray.data

    cfg = UpsertConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4)
    e0 = _batch([
        ("r", "a", 0, 1, False, "a0"),
        ("r", "b", 0, 2, False, "b0"),
        ("r", "c", 0, 3, False, "c0"),
        ("r", "d", 0, 4, False, "d0"),
        ("s", "e", 0, 5, False, "e0"),
    ])
    e1 = _batch([
        ("r", "a", 1, 6, False, "a1"),
        ("r", "d", 1, 7, True, ""),
    ])
    run_upsert(ray.data.from_arrow(e0), cfg, epoch=0).materialize()
    run_upsert(ray.data.from_arrow(e1), cfg, epoch=1).materialize()
    return cfg


def test_build_is_idempotent(lake):
    first = build_bloom_sidecars(lake)
    assert first["files"] > 0 and first["built"] == first["files"]
    second = build_bloom_sidecars(lake)
    assert second["built"] == 0
    assert second["skipped"] == second["files"] == first["files"]


def test_lookup_matches_scan(lake):
    build_bloom_sidecars(lake)
    state = read_lake(lake)
    got, stats = point_lookup(
        lake, _keys([("r", "a"), ("r", "b"), ("s", "e")]))
    want = {
        (r, p): c for r, p, c in zip(
            state.column("repo").to_pylist(),
            state.column("path").to_pylist(),
            state.column("content").to_pylist(),
        ) if (r, p) in {("r", "a"), ("r", "b"), ("s", "e")}
    }
    rows = {
        (r, p): c for r, p, c in zip(
            got.column("repo").to_pylist(),
            got.column("path").to_pylist(),
            got.column("content").to_pylist(),
        )
    }
    assert rows == want == {
        ("r", "a"): "a1", ("r", "b"): "b0", ("s", "e"): "e0"}
    assert stats["candidate_files"] >= 1


def test_tombstoned_and_absent_yield_nothing(lake):
    build_bloom_sidecars(lake)
    got, _ = point_lookup(lake, _keys([("r", "d"), ("zz", "nope")]))
    assert got.num_rows == 0
    # contract: even an all-miss probe returns the SCAN schema, so
    # callers can select() on the result unconditionally
    assert {"repo", "path", "content"} <= set(got.column_names)

    none_at_all, _ = point_lookup(lake, _keys([("zz", "nope")]))
    assert none_at_all.num_rows == 0
    assert {"repo", "path", "content"} <= set(none_at_all.column_names)


def test_bloom_prunes_unrelated_epoch_files(lake):
    """'b' was only written in epoch 0 — epoch 1's delta must be bloom-
    skipped, not opened. (Both files are in the same key partition.)"""
    build_bloom_sidecars(lake)
    got, stats = point_lookup(lake, _keys([("r", "b")]))
    assert got.num_rows == 1
    assert got.column("content").to_pylist() == ["b0"]
    assert stats["plan_files"] == 2  # epoch-0 + epoch-1 deltas of the pid
    assert stats["candidate_files"] == 1  # epoch-1 pruned by its sidecar
    assert stats["unindexed_files"] == 0


def test_missing_sidecar_is_read_not_skipped(lake):
    """The index is an optimization: with no sidecars at all, lookups
    still return correct rows and report the files as unindexed."""
    got, stats = point_lookup(lake, _keys([("r", "a")]))
    assert got.column("content").to_pylist() == ["a1"]
    assert stats["unindexed_files"] == stats["plan_files"] > 0


def test_column_pruned_lookup(lake):
    build_bloom_sidecars(lake)
    got, _ = point_lookup(lake, _keys([("r", "c")]), columns=["content"])
    assert got.column("content").to_pylist() == ["c0"]
    assert set(got.column_names) >= {"repo", "path", "content"}


def test_lookup_after_compaction(ray_session, tmp_path):
    """Sidecars extend to compacted bases: the base file gets its own
    filter and tombstoned keys (dropped from the base) stop matching."""
    import ray.data

    cfg = UpsertConfig(lake_dir=str(tmp_path / "lake_c"),
                       num_partitions=2, compact_every=2)
    run_upsert(ray.data.from_arrow(_batch([
        ("r", "a", 0, 1, False, "a0"),
        ("r", "b", 0, 2, False, "b0"),
    ])), cfg, epoch=0).materialize()
    run_upsert(ray.data.from_arrow(_batch([
        ("r", "b", 1, 3, True, ""),
    ])), cfg, epoch=1).materialize()  # triggers base at epoch 1

    summary = build_bloom_sidecars(cfg)
    assert summary["built"] == summary["files"] > 0
    got, stats = point_lookup(cfg, _keys([("r", "a"), ("r", "b")]))
    assert got.column("content").to_pylist() == ["a0"]
    assert stats["candidate_files"] >= 1


def test_lookup_after_merge_with_stale_sidecars(ray_session, tmp_path):
    """Cross-feature: sidecars built BEFORE a MERGE epoch — the merge's
    new delta is unindexed, so lookups must read it via the conservative
    fallback and still return the merged (newest) state."""
    import ray.data

    from connect_smts_ray.sinks.merge import merge_into

    cfg = UpsertConfig(lake_dir=str(tmp_path / "lake_m"), num_partitions=2)
    run_upsert(ray.data.from_arrow(_batch([
        ("r", "a", 0, 1, False, "a0"),
        ("r", "b", 0, 2, False, "b0"),
    ])), cfg, epoch=0).materialize()
    build_bloom_sidecars(cfg)  # indexes epoch 0 only

    src = pa.table({
        "repo": pa.array(["r"], pa.string()),
        "path": pa.array(["a"], pa.string()),
        "content": pa.array(["a-merged"], pa.string()),
    })
    merge_into(ray.data.from_arrow(src), cfg, merge_lsn=5,
               epoch=1).to_pandas()

    got, stats = point_lookup(cfg, _keys([("r", "a")]))
    assert got.column("content").to_pylist() == ["a-merged"]
    assert stats["unindexed_files"] >= 1  # the merge delta, pre-index

    # indexing the new files restores full pruning
    build_bloom_sidecars(cfg)
    got2, stats2 = point_lookup(cfg, _keys([("r", "a")]))
    assert got2.column("content").to_pylist() == ["a-merged"]
    assert stats2["unindexed_files"] == 0
