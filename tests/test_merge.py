"""MERGE INTO clause matrix over the delta lake (sinks/merge.py).

Pinned contract: the full WHEN MATCHED UPDATE / WHEN MATCHED [AND cond]
DELETE / WHEN NOT MATCHED INSERT matrix against a live lake; delete
beats update where both clauses hold; conditions see target columns
under the t_ prefix; duplicate source keys reduce deterministically;
re-running the same merge epoch is an exact no-op (manifest gate); and
the merge result equals the DuckDB FULL OUTER reference computation.
"""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from connect_smts_ray.sinks.merge import merge_into
from connect_smts_ray.sinks.upsert import UpsertConfig, read_lake, run_upsert


def _target_batch():
    return pa.table({
        "repo": pa.array(["r"] * 6, pa.string()),
        "path": pa.array(list("abcdef"), pa.string()),
        "commit_lsn": pa.array([0] * 6, pa.int64()),
        "source_offset": pa.array(list(range(6)), pa.int64()),
        "is_tombstone": pa.array([False] * 6, pa.bool_()),
        "content": pa.array([f"{c}0" for c in "abcdef"], pa.string()),
        "size": pa.array([10, 20, 30, 40, 50, 60], pa.int64()),
    })


def _source():
    # a: update; b: delete-cond hits (size>=20); c: both clauses hold →
    #    delete wins; x,y: inserts; a duplicated (lsn 5 then 9 → 9 wins)
    return pa.table({
        "repo": pa.array(["r"] * 6, pa.string()),
        "path": pa.array(["a", "a", "b", "c", "x", "y"], pa.string()),
        "commit_lsn": pa.array([5, 9, 9, 9, 9, 9], pa.int64()),
        "source_offset": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "content": pa.array(["aOLD", "a1", "b1", "c1", "x1", "y1"],
                            pa.string()),
        "size": pa.array([11, 12, 22, 33, 99, 98], pa.int64()),
    })


@pytest.fixture()
def lake(ray_session, tmp_path):
    import ray.data

    cfg = UpsertConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4)
    run_upsert(ray.data.from_arrow(_target_batch()), cfg,
               epoch=0).materialize()
    return cfg


def _state_rows(cfg):
    t = read_lake(cfg)
    return {
        p: (c, s) for p, c, s in zip(
            t.column("path").to_pylist(),
            t.column("content").to_pylist(),
            t.column("size").to_pylist(),
        )
    }


def test_merge_clause_matrix(lake):
    import ray.data

    def del_cond(joined):
        import pyarrow.compute as pc
        return pc.greater_equal(joined.column("t_size"), pa.scalar(20))

    lin = merge_into(
        ray.data.from_arrow(_source()), lake, merge_lsn=10, epoch=1,
        when_matched_update=True, when_matched_delete=del_cond,
        when_not_matched_insert=True,
    ).to_pandas()
    assert not lin["skipped"].any()

    rows = _state_rows(lake)
    # a updated (duplicate source keys → lsn 9 wins, not lsn 5)
    assert rows["a"] == ("a1", 12)
    # b, c deleted (t_size 20 and 30 both >= 20; delete beats update on c)
    assert "b" not in rows and "c" not in rows
    # d, e, f untouched
    assert rows["d"] == ("d0", 40) and rows["f"] == ("f0", 60)
    # x, y inserted
    assert rows["x"] == ("x1", 99) and rows["y"] == ("y1", 98)


def test_merge_matches_duckdb_reference(lake):
    import ray.data

    merge_into(ray.data.from_arrow(_source()), lake, merge_lsn=10,
               epoch=1).to_pandas()  # update + insert, no delete clause
    got = read_lake(lake).select(["path", "content", "size"]).to_pandas() \
        .sort_values("path").reset_index(drop=True)

    con = duckdb.connect()
    con.register("target", _target_batch().to_pandas())
    src = _source().to_pandas()
    con.register("source_raw", src)
    want = con.execute("""
        WITH source AS (
          SELECT path, arg_max(content, commit_lsn * 1000 + source_offset)
                   AS content,
                 arg_max(size, commit_lsn * 1000 + source_offset) AS size
          FROM source_raw GROUP BY path
        )
        SELECT coalesce(s.path, t.path) AS path,
               coalesce(s.content, t.content) AS content,
               coalesce(s.size, t.size) AS size
        FROM target t FULL OUTER JOIN source s USING (path)
        ORDER BY path
    """).df()
    pd.testing.assert_frame_equal(
        got.astype({"size": "int64"}), want.astype({"size": "int64"}))


def test_merge_is_idempotent(lake):
    import ray.data

    merge_into(ray.data.from_arrow(_source()), lake, merge_lsn=10,
               epoch=1).to_pandas()
    before = _state_rows(lake)
    lin2 = merge_into(ray.data.from_arrow(_source()), lake, merge_lsn=10,
                      epoch=1).to_pandas()
    assert lin2["skipped"].all()
    assert _state_rows(lake) == before


def test_insert_only_and_update_only(lake):
    import ray.data

    # insert-only: matched rows must NOT change
    merge_into(ray.data.from_arrow(_source()), lake, merge_lsn=10, epoch=1,
               when_matched_update=False).to_pandas()
    rows = _state_rows(lake)
    assert rows["a"] == ("a0", 10)           # untouched despite match
    assert rows["x"] == ("x1", 99)           # inserted

    # update-only on top: unmatched source rows must NOT insert
    src2 = pa.table({
        "repo": pa.array(["r", "r"], pa.string()),
        "path": pa.array(["a", "zz"], pa.string()),
        "commit_lsn": pa.array([0, 0], pa.int64()),
        "source_offset": pa.array([0, 1], pa.int64()),
        "content": pa.array(["a2", "never"], pa.string()),
        "size": pa.array([13, 1], pa.int64()),
    })
    merge_into(ray.data.from_arrow(src2), lake, merge_lsn=11, epoch=2,
               when_not_matched_insert=False).to_pandas()
    rows = _state_rows(lake)
    assert rows["a"] == ("a2", 13)
    assert "zz" not in rows


def test_conditional_update(lake):
    import ray.data

    def only_small(joined):
        import pyarrow.compute as pc
        return pc.less(joined.column("t_size"), pa.scalar(25))

    merge_into(ray.data.from_arrow(_source()), lake, merge_lsn=10, epoch=1,
               when_matched_update=only_small,
               when_not_matched_insert=False).to_pandas()
    rows = _state_rows(lake)
    assert rows["a"] == ("a1", 12)   # t_size 10 < 25 → updated
    assert rows["b"] == ("b1", 22)   # t_size 20 < 25 → updated
    assert rows["c"] == ("c0", 30)   # t_size 30 → kept
    assert "x" not in rows


def test_source_without_order_columns(ray_session, tmp_path):
    """A bare (key, payload) source merges fine — order stand-ins are
    synthesized and the merge lsn stamps the written rows."""
    import ray.data

    cfg = UpsertConfig(lake_dir=str(tmp_path / "lake2"), num_partitions=2)
    run_upsert(ray.data.from_arrow(_target_batch()), cfg,
               epoch=0).materialize()
    src = pa.table({
        "repo": pa.array(["r"], pa.string()),
        "path": pa.array(["a"], pa.string()),
        "content": pa.array(["a9"], pa.string()),
        "size": pa.array([77], pa.int64()),
    })
    merge_into(ray.data.from_arrow(src), cfg, merge_lsn=3,
               epoch=1).to_pandas()
    rows = _state_rows(cfg)
    assert rows["a"] == ("a9", 77)
    assert rows["b"] == ("b0", 20)
