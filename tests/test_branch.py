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
