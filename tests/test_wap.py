"""Write-Audit-Publish (sinks/wap.py).

Pinned contract: a passing audit publishes an epoch bit-identical to a
direct write; a failing audit leaves the main lake untouched (no
manifests, no files); a crash mid-publish resumes to completion without
re-auditing; double publish is a no-op.
"""

import hashlib
import os

import pyarrow as pa
import pytest

from connect_smts_ray.sinks.upsert import UpsertConfig, read_lake, run_upsert
from connect_smts_ray.sinks.wap import (
    audit_and_publish,
    stage_epoch,
    wap_write,
)


def _batch(offset: int = 0):
    n = 20
    return pa.table({
        "repo": pa.array(["r"] * n, pa.string()),
        "path": pa.array([f"p{i}" for i in range(n)], pa.string()),
        "commit_lsn": pa.array([offset] * n, pa.int64()),
        "source_offset": pa.array(list(range(n)), pa.int64()),
        "is_tombstone": pa.array([False] * n, pa.bool_()),
        "content": pa.array([f"c{offset}-{i}" for i in range(n)],
                            pa.string()),
    })


def _state_hash(cfg) -> str:
    df = read_lake(cfg).to_pandas().sort_values(["repo", "path"]) \
        .reset_index(drop=True)
    return hashlib.sha256(df.to_csv(index=False).encode()).hexdigest()


def _count_audit(min_rows: int):
    def audit(ds):
        n = ds.count()
        return n >= min_rows, {"rows": n, "min_rows": min_rows}
    return audit


def test_wap_pass_equals_direct_write(ray_session, tmp_path):
    import ray.data

    main = UpsertConfig(lake_dir=str(tmp_path / "main"), num_partitions=4)
    res = wap_write(ray.data.from_arrow(_batch()), main, epoch=0,
                    audit_fn=_count_audit(1),
                    staging_dir=str(tmp_path / "stage0"))
    assert res["published"] and res["partitions"] >= 1

    direct = UpsertConfig(lake_dir=str(tmp_path / "direct"),
                          num_partitions=4)
    run_upsert(ray.data.from_arrow(_batch()), direct, epoch=0).materialize()
    assert _state_hash(main) == _state_hash(direct)


def test_wap_failed_audit_leaves_main_untouched(ray_session, tmp_path):
    import ray.data

    main = UpsertConfig(lake_dir=str(tmp_path / "main"), num_partitions=4)
    res = wap_write(ray.data.from_arrow(_batch()), main, epoch=0,
                    audit_fn=_count_audit(10_000),  # cannot pass
                    staging_dir=str(tmp_path / "stage0"))
    assert not res["published"]
    assert res["report"]["rows"] == 20
    store = main.store()
    assert store.all_partitions() == []
    assert not os.path.exists(os.path.join(main.lake_dir, "partition=0"))


def test_wap_crash_window_resumes_without_reaudit(ray_session, tmp_path):
    import ray.data

    main = UpsertConfig(lake_dir=str(tmp_path / "main"), num_partitions=4)
    scfg = stage_epoch(ray.data.from_arrow(_batch()), main, epoch=0,
                       staging_dir=str(tmp_path / "stage0"))

    # simulate the crash window: audit passed + marker written + exactly
    # ONE partition published, then death
    calls = {"n": 0}

    def audit_once(ds):
        calls["n"] += 1
        return True, {"rows": ds.count()}

    class Die(Exception):
        pass

    import connect_smts_ray.sinks.wap as wap_mod
    orig_commit = type(main.store()).commit
    state = {"commits": 0}

    def dying_commit(self, pid, epoch, write_table, lineage):
        if state["commits"] >= 1:
            raise Die()
        state["commits"] += 1
        return orig_commit(self, pid, epoch, write_table, lineage)

    type(main.store()).commit = dying_commit
    try:
        with pytest.raises(Die):
            audit_and_publish(main, scfg, 0, audit_once)
    finally:
        type(main.store()).commit = orig_commit

    assert calls["n"] == 1
    # resume: no re-audit (marker), completes the remaining partitions
    res = audit_and_publish(main, scfg, 0, audit_once)
    assert res["published"]
    assert calls["n"] == 1  # audit was NOT re-run

    direct = UpsertConfig(lake_dir=str(tmp_path / "direct"),
                          num_partitions=4)
    run_upsert(ray.data.from_arrow(_batch()), direct, epoch=0).materialize()
    assert _state_hash(main) == _state_hash(direct)


def test_wap_double_publish_is_noop(ray_session, tmp_path):
    import ray.data

    main = UpsertConfig(lake_dir=str(tmp_path / "main"), num_partitions=4)
    scfg = stage_epoch(ray.data.from_arrow(_batch()), main, epoch=0,
                       staging_dir=str(tmp_path / "stage0"))
    r1 = audit_and_publish(main, scfg, 0, _count_audit(1))
    h1 = _state_hash(main)
    r2 = audit_and_publish(main, scfg, 0, _count_audit(1))
    assert r1["published"] and r2["published"]
    assert _state_hash(main) == h1


def test_wap_second_epoch_on_published_base(ray_session, tmp_path):
    """A WAP epoch stacks on an existing lake like any other epoch."""
    import ray.data

    main = UpsertConfig(lake_dir=str(tmp_path / "main"), num_partitions=4)
    run_upsert(ray.data.from_arrow(_batch(0)), main, epoch=0).materialize()
    res = wap_write(ray.data.from_arrow(_batch(5)), main, epoch=1,
                    audit_fn=_count_audit(1),
                    staging_dir=str(tmp_path / "stage1"))
    assert res["published"]
    state = read_lake(main)
    contents = set(state.column("content").to_pylist())
    assert all(c.startswith("c5-") for c in contents)  # epoch 1 LWW-wins
    assert state.num_rows == 20
