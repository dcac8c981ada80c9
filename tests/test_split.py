"""Partition split (sinks/upsert.split_partitions): widening P without a
shuffle must preserve the merge-on-read state byte-exactly, later epochs
must route with the post-split modulus even under a stale caller config,
and replays of pre-split epochs must remain no-ops."""

import hashlib

import pyarrow as pa
import pytest


def _batch(epoch: int, keys, tomb=()):
    n = len(keys)
    return pa.table({
        "repo": pa.array([k[0] for k in keys], type=pa.string()),
        "path": pa.array([k[1] for k in keys], type=pa.string()),
        "commit_lsn": pa.array([epoch] * n, type=pa.int64()),
        "source_offset": pa.array(
            [epoch * 1000 + i for i in range(n)], type=pa.int64()
        ),
        "payload": pa.array([f"v{epoch}:{k[0]}/{k[1]}" for k in keys]),
        "is_tombstone": pa.array([k in tomb for k in keys]),
    })


def _keys(n):
    return [(f"repo{i % 7}", f"src/f{i}.txt") for i in range(n)]


def _digest(table: pa.Table) -> str:
    table = table.sort_by(
        [("repo", "ascending"), ("path", "ascending")]
    ).select(sorted(table.column_names))
    return hashlib.sha256(
        table.to_pandas().to_csv(index=False).encode()
    ).hexdigest()


@pytest.fixture()
def lake(tmp_path, ray_session):
    import ray.data

    from connect_smts_ray.sinks.upsert import UpsertConfig, run_upsert

    cfg = UpsertConfig(lake_dir=str(tmp_path / "lake"), num_partitions=4,
                       compact_every=0)
    ks = _keys(60)
    run_upsert(ray.data.from_arrow(_batch(0, ks)), cfg, epoch=0).materialize()
    run_upsert(
        ray.data.from_arrow(_batch(1, ks[:30], tomb=set(ks[:5]))),
        cfg, epoch=1,
    ).materialize()
    return cfg


def test_split_preserves_state_byte_exact(lake, ray_session):
    from connect_smts_ray.sinks.upsert import read_lake, split_partitions

    before = read_lake(lake)
    cfg2 = split_partitions(lake, factor=2)
    assert cfg2.num_partitions == 8
    after = read_lake(cfg2)
    assert _digest(before) == _digest(after)
    # table meta is authoritative for later sessions
    meta = lake.store().read_table_meta()
    assert meta["num_partitions"] == 8


def test_split_routes_later_epochs_with_new_modulus(lake, ray_session):
    import ray.data

    from connect_smts_ray.sinks.upsert import (
        UpsertConfig,
        read_lake,
        run_upsert,
        split_partitions,
    )

    split_partitions(lake, factor=2)
    # stale caller config (P=4) — resolve() must adopt P=8 from _table.json
    ks = _keys(60)
    run_upsert(
        ray.data.from_arrow(_batch(2, ks[20:50])), lake, epoch=2
    ).materialize()
    got = read_lake(lake)

    # control: never-split lake at P=8 receiving the same three epochs
    control = UpsertConfig(
        lake_dir=lake.lake_dir + "_ctl", num_partitions=8, compact_every=0
    )
    run_upsert(ray.data.from_arrow(_batch(0, ks)), control, epoch=0).materialize()
    run_upsert(
        ray.data.from_arrow(_batch(1, ks[:30], tomb=set(ks[:5]))),
        control, epoch=1,
    ).materialize()
    run_upsert(
        ray.data.from_arrow(_batch(2, ks[20:50])), control, epoch=2
    ).materialize()
    assert _digest(got) == _digest(read_lake(control))


def test_replay_of_presplit_epoch_is_noop(lake, ray_session):
    import ray.data

    from connect_smts_ray.sinks.upsert import (
        read_lake,
        run_upsert,
        split_partitions,
    )

    cfg2 = split_partitions(lake, factor=2)
    before = _digest(read_lake(cfg2))
    # replaying epoch 0 after the split: old pids skip via manifests, new
    # child pids commit below-base deltas that read_plan ignores
    ks = _keys(60)
    run_upsert(ray.data.from_arrow(_batch(0, ks)), cfg2, epoch=0).materialize()
    assert _digest(read_lake(cfg2)) == before


def test_partitions_for_guidance():
    from connect_smts_ray.sinks.upsert import UpsertConfig

    assert UpsertConfig.partitions_for(1) == 1
    assert UpsertConfig.partitions_for(10 << 30) == 4
    assert UpsertConfig.partitions_for(100 << 40) == 32768


def test_double_split_no_duplicates(lake, ray_session):
    """Regression (r3 review): a second split with no intervening epochs
    must pick a FRESH base epoch — reusing the first split's E_split made
    commit_base's idempotent skip keep stale j=0 bases (duplicated keys)."""
    from connect_smts_ray.sinks.upsert import read_lake, split_partitions

    before = _digest(read_lake(lake))
    cfg2 = split_partitions(lake, factor=2)
    cfg3 = split_partitions(cfg2, factor=2)
    after = read_lake(cfg3)
    keys = list(zip(after.column("repo").to_pylist(),
                    after.column("path").to_pylist()))
    assert len(keys) == len(set(keys))
    assert _digest(after) == before
    # and a third split still converges
    cfg4 = split_partitions(cfg3, factor=2)
    assert _digest(read_lake(cfg4)) == before
