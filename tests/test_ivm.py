"""Incremental view maintenance (ops/ivm.py): delta-stream aggregation
must equal the grouped aggregate of the replayed final table, in both the
single-pass and the epoch-checkpointed forms."""

import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pytest


def _synthetic_changelog(n_keys=400, events_per_key=7, seed=7) -> pa.Table:
    """Deterministic changelog: per-key monotone lsn, op ∈ {c,u,d} (c at
    index 0), group/measure vary per event — includes delete-last keys,
    re-inserts after delete, and consecutive deletes."""
    rng = np.random.default_rng(seed)
    rows = {"k1": [], "k2": [], "lsn": [], "is_del": [], "grp": [], "m": []}
    for k in range(n_keys):
        n_ev = 1 + int(rng.integers(1, events_per_key))
        for i in range(n_ev):
            op_del = bool(i > 0 and rng.random() < 0.3)
            rows["k1"].append(f"repo_{k % 13}")
            rows["k2"].append(f"path_{k}")
            rows["lsn"].append(i)
            rows["is_del"].append(op_del)
            rows["grp"].append(None if op_del else f"g{(k + i) % 5}")
            rows["m"].append(0 if op_del else int(rng.integers(1, 1000)))
    return pa.table({
        "k1": pa.array(rows["k1"]), "k2": pa.array(rows["k2"]),
        "lsn": pa.array(rows["lsn"], pa.int64()),
        "is_del": pa.array(rows["is_del"]),
        "grp": pa.array(rows["grp"], pa.string()),
        "m": pa.array(rows["m"], pa.int64()),
    })


def _replay_expected(tbl: pa.Table) -> dict:
    """Brute-force per-key state machine → grouped (count, sum)."""
    state = {}
    order = sorted(range(tbl.num_rows),
                   key=lambda i: (tbl["k1"][i].as_py(), tbl["k2"][i].as_py(),
                                  tbl["lsn"][i].as_py()))
    for i in order:
        key = (tbl["k1"][i].as_py(), tbl["k2"][i].as_py())
        if tbl["is_del"][i].as_py():
            state.pop(key, None)
        else:
            state[key] = (tbl["grp"][i].as_py(), tbl["m"][i].as_py())
    agg = {}
    for g, m in state.values():
        n, s = agg.get(g, (0, 0))
        agg[g] = (n + 1, s + m)
    return agg


def _as_dict(result) -> dict:
    rows = result.to_pylist() if isinstance(result, pa.Table) else \
        result.take_all()
    return {r["group"]: (r["n_keys"], r["total"]) for r in rows}


def test_changelog_aggregate_matches_replay(ray_session):
    import ray.data

    from connect_smts_ray.ops.ivm import changelog_aggregate

    tbl = _synthetic_changelog()
    want = _replay_expected(tbl)
    ds = ray.data.from_arrow(tbl).repartition(8)
    got = _as_dict(changelog_aggregate(
        ds, key_cols=("k1", "k2"), lsn_col="lsn", delete_col="is_del",
        group_col="grp", measure_col="m", num_partitions=16))
    assert got == want


def test_changelog_aggregate_delete_only_group_absent(ray_session):
    import ray.data

    from connect_smts_ray.ops.ivm import changelog_aggregate

    tbl = pa.table({
        "k1": ["a", "a", "b", "b"], "k2": ["x", "x", "y", "y"],
        "lsn": pa.array([0, 1, 0, 1], pa.int64()),
        "is_del": [False, True, False, False],
        "grp": ["dead", None, "live", "live"],
        "m": pa.array([5, 0, 3, 9], pa.int64()),
    })
    got = _as_dict(changelog_aggregate(
        ray.data.from_arrow(tbl), key_cols=("k1", "k2"), lsn_col="lsn",
        delete_col="is_del", group_col="grp", measure_col="m",
        num_partitions=4))
    assert got == {"live": (1, 9)}


def test_epochs_equal_single_pass_and_idempotent(ray_session):
    import ray.data

    from connect_smts_ray.ops.ivm import (
        changelog_aggregate,
        changelog_aggregate_epochs,
    )

    tbl = _synthetic_changelog(n_keys=250, events_per_key=6, seed=11)
    want = _as_dict(changelog_aggregate(
        ray.data.from_arrow(tbl), key_cols=("k1", "k2"), lsn_col="lsn",
        delete_col="is_del", group_col="grp", measure_col="m",
        num_partitions=8))

    # per-key lsn is monotone, so slicing the stream by lsn yields epochs
    # with the Kafka ordering guarantee the op requires
    bounds = [(0, 2), (2, 4), (4, 100)]

    def make_epoch(e):
        lo, hi = bounds[e]
        import pyarrow.compute as pc
        sl = tbl.filter(pc.and_(pc.greater_equal(tbl["lsn"], lo),
                                pc.less(tbl["lsn"], hi)))
        return ray.data.from_arrow(sl).repartition(4)

    state_dir = tempfile.mkdtemp(prefix="csr_ivm_state_")
    try:
        got = _as_dict(changelog_aggregate_epochs(
            make_epoch, epochs=3, state_dir=state_dir,
            key_cols=("k1", "k2"), lsn_col="lsn", delete_col="is_del",
            group_col="grp", measure_col="m", num_partitions=8))
        assert got == want

        # crash-rerun idempotence: rerunning the whole job over the SAME
        # state dir rewrites byte-identical checkpoints and the same answer
        got2 = _as_dict(changelog_aggregate_epochs(
            make_epoch, epochs=3, state_dir=state_dir,
            key_cols=("k1", "k2"), lsn_col="lsn", delete_col="is_del",
            group_col="grp", measure_col="m", num_partitions=8))
        assert got2 == want
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)


def test_one_bucket_many_keys(ray_session):
    """Granularity pin: 10^4 distinct keys forced into ONE bucket still
    runs one vectorized pass (no per-key Python), and the answer is the
    replay truth."""
    import ray.data

    from connect_smts_ray.ops.ivm import changelog_aggregate

    n = 10_000
    tbl = pa.table({
        "k1": pa.array([f"r{i}" for i in range(n)] * 2),
        "k2": pa.array(["p"] * (2 * n)),
        "lsn": pa.array([0] * n + [1] * n, pa.int64()),
        "is_del": pa.array([False] * n + [i % 3 == 0 for i in range(n)]),
        "grp": pa.array(["g"] * n
                        + [None if i % 3 == 0 else "g" for i in range(n)]),
        "m": pa.array([1] * n + [0 if i % 3 == 0 else 2
                                 for i in range(n)], pa.int64()),
    })
    got = _as_dict(changelog_aggregate(
        ray.data.from_arrow(tbl), key_cols=("k1", "k2"), lsn_col="lsn",
        delete_col="is_del", group_col="grp", measure_col="m",
        num_partitions=1))
    survivors = [i for i in range(n) if i % 3 != 0]
    assert got == {"g": (len(survivors), 2 * len(survivors))}


def test_hll_register_table_matches_estimate(ray_session):
    """hll_register_table at any parallelism == the dense single-pass
    registers; the estimate lands within 5% of truth at p=12."""
    import ray.data

    from connect_smts_ray.ops.sketch import (
        hll_estimate_from_table,
        hll_register_table,
    )

    vals = pa.table({"v": pa.array(
        [f"user_{i % 3000}" for i in range(20_000)] + [None])})
    t1 = hll_register_table(
        ray.data.from_arrow(vals).repartition(1), "v", p=12) \
        .to_pandas().sort_values("reg").reset_index(drop=True)
    t8 = hll_register_table(
        ray.data.from_arrow(vals).repartition(8), "v", p=12) \
        .to_pandas().sort_values("reg").reset_index(drop=True)
    assert t1.equals(t8)
    est = hll_estimate_from_table(pa.Table.from_pandas(t8), p=12)
    assert est == pytest.approx(3000, rel=0.05)


def test_change_feed_roundtrip(ray_session):
    """emit_change_feed(old, new) applied to old as a state machine must
    reconstruct new exactly; unchanged keys emit nothing."""
    import ray.data

    from connect_smts_ray.ops.ivm import emit_change_feed

    old = pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array(["a", "b", "c", "d"]),
    })
    new = pa.table({
        "k": pa.array([2, 3, 4, 5], pa.int64()),
        "v": pa.array(["b", "C", "d", "e"]),   # 1 removed, 3 changed, 5 added
    })
    feed = emit_change_feed(
        ray.data.from_arrow(old), ray.data.from_arrow(new),
        key_cols=["k"], value_cols=["v"], num_partitions=4).take_all()
    ops = {r["k"]: r for r in feed}
    assert set(ops) == {1, 3, 5}
    assert ops[1]["op"] == "d" and ops[1]["after_v"] is None
    assert ops[3]["op"] == "u" and (ops[3]["before_v"], ops[3]["after_v"]) \
        == ("c", "C")
    assert ops[5]["op"] == "c" and ops[5]["before_v"] is None

    state = {1: "a", 2: "b", 3: "c", 4: "d"}
    for r in feed:
        if r["op"] == "d":
            del state[r["k"]]
        else:
            state[r["k"]] = r["after_v"]
    assert state == {2: "b", 3: "C", 4: "d", 5: "e"}
