"""Writable branches (sinks/branch.py): isolation, LWW merge-on-read,
fast-forward publish with crash idempotence, vacuum pinning."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest


def _rows(spec, lsn0=0):
    """spec: list of (repo, path, content|None-for-tombstone)."""
    n = len(spec)
    return pa.table({
        "repo": pa.array([s[0] for s in spec], pa.string()),
        "path": pa.array([s[1] for s in spec], pa.string()),
        "commit_lsn": pa.array(range(lsn0, lsn0 + n), pa.int64()),
        "source_offset": pa.array(range(lsn0, lsn0 + n), pa.int64()),
        "content": pa.array(
            [s[2] if s[2] is not None else "" for s in spec], pa.string()),
        "is_tombstone": pa.array([s[2] is None for s in spec], pa.bool_()),
    })


def _state(table):
    return {
        (r, p): c for r, p, c in zip(
            table.column("repo").to_pylist(),
            table.column("path").to_pylist(),
            table.column("content").to_pylist(),
        )
    }


def test_branch_lifecycle(ray_session, tmp_path):
    import ray.data

    from connect_smts_ray.sinks.branch import (
        branch_cfg,
        create_branch,
        delete_branch,
        list_branches,
        publish_branch,
        read_branch,
    )
    from connect_smts_ray.sinks.manifest import vacuum
    from connect_smts_ray.sinks.upsert import (
        UpsertConfig,
        read_lake,
        run_upsert,
    )

    cfg = UpsertConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4,
                       compact_every=2)
    # main: two epochs
    run_upsert(ray.data.from_arrow(_rows([
        ("r1", "a", "v0"), ("r1", "b", "v0"), ("r2", "c", "v0"),
    ])), cfg, epoch=0).materialize()
    run_upsert(ray.data.from_arrow(_rows([
        ("r1", "a", "v1"),
    ], lsn0=10)), cfg, epoch=1).materialize()
    head = _state(read_lake(cfg))
    assert head == {("r1", "a"): "v1", ("r1", "b"): "v0",
                    ("r2", "c"): "v0"}

    # fork at head; invalid names / double-fork rules
    assert create_branch(cfg, "feature") == {"fork": 1}
    create_branch(cfg, "feature", at=1)  # idempotent re-create
    with pytest.raises(ValueError, match="already forked"):
        create_branch(cfg, "feature", at=0)
    with pytest.raises(ValueError, match="invalid branch name"):
        create_branch(cfg, "_bad")
    assert set(list_branches(cfg)) == {"feature"}

    # branch writes: update a, tombstone b, insert d — two epochs
    bcfg = branch_cfg(cfg, "feature")
    run_upsert(ray.data.from_arrow(_rows([
        ("r1", "a", "v2-branch"), ("r1", "b", None),
    ], lsn0=20)), bcfg, epoch=0).materialize()
    run_upsert(ray.data.from_arrow(_rows([
        ("r3", "d", "new-branch"),
    ], lsn0=30)), bcfg, epoch=1).materialize()

    # isolation: main unchanged; branch sees fork + its deltas
    assert _state(read_lake(cfg)) == head
    branch_view = _state(read_branch(cfg, "feature"))
    assert branch_view == {("r1", "a"): "v2-branch", ("r2", "c"): "v0",
                           ("r3", "d"): "new-branch"}

    # vacuum cannot reclaim the fork's view while the branch is open
    vacuum(cfg.store(), retain_epochs=0)
    assert _state(read_branch(cfg, "feature")) == branch_view

    # diverged main blocks fast-forward
    run_upsert(ray.data.from_arrow(_rows([
        ("r2", "c", "v1-main"),
    ], lsn0=40)), cfg, epoch=2).materialize()
    with pytest.raises(ValueError, match="not a fast-forward"):
        publish_branch(cfg, "feature")

    # abandon instead; then rebuild the branch on the new head and publish
    assert delete_branch(cfg, "feature") is True
    assert delete_branch(cfg, "feature") is False
    create_branch(cfg, "feature2", at=2)
    bcfg2 = branch_cfg(cfg, "feature2")
    run_upsert(ray.data.from_arrow(_rows([
        ("r1", "a", "v2-branch"), ("r1", "b", None),
        ("r3", "d", "new-branch"),
    ], lsn0=50)), bcfg2, epoch=0).materialize()
    want = _state(read_branch(cfg, "feature2"))
    out = publish_branch(cfg, "feature2")
    assert out["published_epochs"] == 1
    assert _state(read_lake(cfg)) == want
    assert list_branches(cfg) == {}
    # published epoch landed as main epoch fork+1 = 3 with lineage
    store = cfg.resolve().store()
    man = store.read_manifest(store.all_partitions()[0], 3)
    assert man is None or man.get("published_from") == "feature2"
    # fork cut still time-travels on main
    assert _state(read_lake(cfg, as_of=2))[("r2", "c")] == "v1-main"


def test_publish_crash_retry_idempotent(ray_session, tmp_path):
    """A publish that died after committing SOME mapped epochs re-runs to
    the identical final state (ManifestStore.commit no-ops on existing
    manifests; the branch entry is removed only at the end)."""
    import ray.data

    from connect_smts_ray.sinks.branch import (
        branch_cfg,
        create_branch,
        publish_branch,
        read_branch,
    )
    from connect_smts_ray.sinks.manifest import ManifestStore
    from connect_smts_ray.sinks.upsert import (
        UpsertConfig,
        read_lake,
        run_upsert,
    )
    import os
    import pyarrow.parquet as pq

    cfg = UpsertConfig(lake_dir=str(tmp_path / "lake"), num_partitions=2)
    run_upsert(ray.data.from_arrow(_rows([
        ("r1", "a", "v0"), ("r2", "b", "v0"),
    ])), cfg, epoch=0).materialize()
    create_branch(cfg, "fix", at=0)
    bcfg = branch_cfg(cfg, "fix")
    run_upsert(ray.data.from_arrow(_rows([
        ("r1", "a", "v1"), ("r2", "b", None),
    ], lsn0=10)), bcfg, epoch=0).materialize()
    want = _state(read_branch(cfg, "fix"))

    # simulate the crashed first attempt: hand-commit ONE partition's
    # mapped epoch exactly as publish would (fork 0 -> target epoch 1)
    store = cfg.resolve().store()
    bstore = ManifestStore(os.path.join(cfg.lake_dir, "_branches", "fix"))
    pid = bstore.all_partitions()[0]
    src = pq.read_table(bstore.state_path(
        pid, bstore.committed_epochs(pid)[0]))
    store.commit(pid, 1, lambda tmp: pq.write_table(src, tmp),
                 lineage={"published_from": "fix", "branch_epoch": 0})

    out = publish_branch(cfg, "fix")  # the retry
    assert out["published_epochs"] == 1
    assert _state(read_lake(cfg)) == want
    # no duplicate epochs: each partition has at most epochs {0, 1}
    for p in store.all_partitions():
        assert set(store.committed_epochs(p)) <= {0, 1}


def test_read_branch_ds_and_namespace_gc(ray_session, tmp_path):
    """Distributed branch read equals the driver-side read row-for-row;
    gc_branch_namespaces reclaims only dead namespaces."""
    import os

    import ray.data

    from connect_smts_ray.sinks.branch import (
        branch_cfg,
        create_branch,
        delete_branch,
        gc_branch_namespaces,
        read_branch,
        read_branch_ds,
    )
    from connect_smts_ray.sinks.upsert import UpsertConfig, run_upsert

    cfg = UpsertConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4)
    run_upsert(ray.data.from_arrow(_rows([
        ("r1", "a", "v0"), ("r2", "b", "v0"), ("r3", "c", "v0"),
    ])), cfg, epoch=0).materialize()
    create_branch(cfg, "live", at=0)
    create_branch(cfg, "dead", at=0)
    run_upsert(ray.data.from_arrow(_rows([
        ("r1", "a", "v1"), ("r4", "d", "new"),
    ], lsn0=10)), branch_cfg(cfg, "live"), epoch=0).materialize()
    run_upsert(ray.data.from_arrow(_rows([
        ("r2", "b", None),
    ], lsn0=20)), branch_cfg(cfg, "dead"), epoch=0).materialize()

    driver = _state(read_branch(cfg, "live"))
    dist_tab = pa.concat_tables(
        [pa.Table.from_pylist(read_branch_ds(cfg, "live").take_all())])
    assert _state(dist_tab) == driver

    delete_branch(cfg, "dead")
    removed = gc_branch_namespaces(cfg)
    assert removed == ["dead"]
    assert not os.path.isdir(os.path.join(cfg.lake_dir, "_branches", "dead"))
    # live branch untouched and still readable
    assert _state(read_branch(cfg, "live")) == driver


def test_branch_tombstone_survives_compaction_config(ray_session, tmp_path):
    """Review repro: with main's compact_every inherited, a branch-side
    base dropped tombstones without main's pre-fork files underneath and
    resurrected deleted keys. branch_cfg pins compact_every=0 and the
    branch read plan uses raw deltas only — the deletion must hold in
    the branch view AND after publish."""
    import ray.data

    from connect_smts_ray.sinks.branch import (
        branch_cfg,
        create_branch,
        publish_branch,
        read_branch,
    )
    from connect_smts_ray.sinks.upsert import (
        UpsertConfig,
        read_lake,
        run_upsert,
    )

    cfg = UpsertConfig(lake_dir=str(tmp_path / "lake"), num_partitions=1,
                       compact_every=2)
    run_upsert(ray.data.from_arrow(_rows([("r1", "a", "v0")])),
               cfg, epoch=0).materialize()
    create_branch(cfg, "del", at=0)
    bcfg = branch_cfg(cfg, "del")
    assert bcfg.compact_every == 0
    run_upsert(ray.data.from_arrow(_rows([("r1", "a", None)], lsn0=10)),
               bcfg, epoch=0).materialize()
    # epoch 1 would have triggered (e+1) % 2 == 0 compaction pre-fix
    run_upsert(ray.data.from_arrow(_rows([("r2", "b", "new")], lsn0=20)),
               bcfg, epoch=1).materialize()
    assert _state(read_branch(cfg, "del")) == {("r2", "b"): "new"}
    publish_branch(cfg, "del")
    assert _state(read_lake(cfg)) == {("r2", "b"): "new"}


def test_recreated_branch_does_not_resurrect_stale_namespace(
        ray_session, tmp_path):
    """Review repro: delete_branch leaves the namespace; re-creating the
    same name found the old epoch-0 manifest, no-opped the new writer's
    commit, and resurrected abandoned rows. create_branch now purges a
    dead namespace."""
    import ray.data

    from connect_smts_ray.sinks.branch import (
        branch_cfg,
        create_branch,
        delete_branch,
        read_branch,
    )
    from connect_smts_ray.sinks.upsert import UpsertConfig, run_upsert

    cfg = UpsertConfig(lake_dir=str(tmp_path / "lake"), num_partitions=2)
    run_upsert(ray.data.from_arrow(_rows([("r1", "a", "v0")])),
               cfg, epoch=0).materialize()
    create_branch(cfg, "fix", at=0)
    run_upsert(ray.data.from_arrow(_rows([("r1", "a", "ABANDONED")],
                                         lsn0=10)),
               branch_cfg(cfg, "fix"), epoch=0).materialize()
    delete_branch(cfg, "fix")  # namespace left on disk, entry gone

    create_branch(cfg, "fix", at=0)  # must purge the dead namespace
    run_upsert(ray.data.from_arrow(_rows([("r1", "a", "WANTED")],
                                         lsn0=11)),
               branch_cfg(cfg, "fix"), epoch=0).materialize()
    assert _state(read_branch(cfg, "fix"))[("r1", "a")] == "WANTED"


def test_branch_name_path_escape_rejected(ray_session, tmp_path):
    """'.', '..' and path-separator names would alias the branch
    namespace into the lake itself (and gc would rmtree the lake)."""
    import ray.data

    from connect_smts_ray.sinks.branch import create_branch
    from connect_smts_ray.sinks.upsert import UpsertConfig, run_upsert

    cfg = UpsertConfig(lake_dir=str(tmp_path / "lake"), num_partitions=1)
    run_upsert(ray.data.from_arrow(_rows([("r1", "a", "v0")])),
               cfg, epoch=0).materialize()
    for bad in ("..", ".", "a/b", "a\\b", "_x", "", ".hidden"):
        with pytest.raises(ValueError, match="invalid branch name"):
            create_branch(cfg, bad, at=0)


def test_publish_foreign_collision_preserves_branch(ray_session, tmp_path):
    """Review repro: require_fast_forward=False silently skipped branch
    epochs whose mapped target was held by a FOREIGN manifest, then
    deleted the branch — data loss. A foreign collision must raise and
    leave the branch intact."""
    import ray.data

    from connect_smts_ray.sinks.branch import (
        branch_cfg,
        create_branch,
        list_branches,
        publish_branch,
        read_branch,
    )
    from connect_smts_ray.sinks.upsert import UpsertConfig, run_upsert

    cfg = UpsertConfig(lake_dir=str(tmp_path / "lake"), num_partitions=1)
    run_upsert(ray.data.from_arrow(_rows([("r1", "a", "v0")])),
               cfg, epoch=0).materialize()
    create_branch(cfg, "fix", at=0)
    run_upsert(ray.data.from_arrow(_rows([("r1", "a", "branch")],
                                         lsn0=10)),
               branch_cfg(cfg, "fix"), epoch=0).materialize()
    # main diverges: foreign epoch 1 (the branch's mapped target)
    run_upsert(ray.data.from_arrow(_rows([("r2", "b", "main")], lsn0=20)),
               cfg, epoch=1).materialize()
    with pytest.raises(ValueError, match="foreign manifest"):
        publish_branch(cfg, "fix", require_fast_forward=False)
    # branch preserved, still readable
    assert "fix" in list_branches(cfg)
    assert _state(read_branch(cfg, "fix"))[("r1", "a")] == "branch"


def test_reader_recovers_table_schema_from_meta(ray_session, tmp_path):
    """Review repro: a reader rebuilt from lake_dir alone (the CLI) used
    the ('repo','path') defaults and KeyError'd on lakes keyed
    differently. run_upsert records key/order/tombstone columns in
    _table.json; resolve() treats them as authoritative."""
    import ray.data

    from connect_smts_ray.sinks.upsert import (
        UpsertConfig,
        read_lake,
        run_upsert,
    )

    writer = UpsertConfig(lake_dir=str(tmp_path / "lake"),
                          num_partitions=2, key_columns=("k",),
                          order_columns=("lsn",), tombstone_column="dead")
    t = pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "lsn": pa.array([0, 1, 0], pa.int64()),
        "v": pa.array(["old", "new", "x"], pa.string()),
        "dead": pa.array([False, False, False], pa.bool_()),
    })
    run_upsert(ray.data.from_arrow(t), writer, epoch=0).materialize()

    bare = UpsertConfig(lake_dir=str(tmp_path / "lake"))  # defaults
    resolved = bare.resolve()
    assert resolved.key_columns == ("k",)
    assert resolved.order_columns == ("lsn",)
    assert resolved.tombstone_column == "dead"
    got = {r["k"]: r["v"] for r in read_lake(bare).to_pylist()}
    assert got == {1: "new", 2: "x"}
