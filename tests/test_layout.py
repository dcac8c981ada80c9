"""Sorted-shard layout + zone-map pruning."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture()
def laid_out(ray_session, tmp_path):
    import ray.data

    from connect_smts_ray.ops.layout import write_sorted_shards

    rng = np.random.RandomState(1)
    t = pa.table({
        "k": pa.array(rng.randint(0, 10_000, 5000), pa.int64()),
        "v": pa.array(rng.randint(0, 100, 5000), pa.int64()),
    })
    d = str(tmp_path / "layout")
    zone = write_sorted_shards(
        ray.data.from_arrow(t).repartition(4), "k", d, num_shards=8)
    return t, d, zone


def test_layout_covers_all_rows_sorted(laid_out):
    import pyarrow.parquet as pq

    t, d, zone = laid_out
    assert sum(s["rows"] for s in zone["shards"]) == t.num_rows
    # shards own disjoint, sorted ranges; rows sorted within each shard
    prev_max = None
    for s in sorted(zone["shards"], key=lambda s: s["shard"]):
        tt = pq.read_table(s["path"])
        ks = tt.column("k").to_numpy()
        assert (np.diff(ks) >= 0).all()
        assert ks.min() == s["min"] and ks.max() == s["max"]
        if prev_max is not None:
            assert s["min"] >= prev_max
        prev_max = s["max"]


def test_pruned_read_skips_files_and_matches_filter(laid_out):
    from connect_smts_ray.ops.layout import read_pruned

    t, d, _ = laid_out
    kk = t.column("k").to_numpy()
    for lo, hi in [(2000, 2999), (0, 10_000), (9_990, 10_000)]:
        ds, n_read, n_total = read_pruned(d, lo, hi)
        rows = ds.take_all()
        want = int(((kk >= lo) & (kk <= hi)).sum())
        assert len(rows) == want, (lo, hi)
        assert all(lo <= r["k"] <= hi for r in rows)
        if hi - lo < 2000:
            assert n_read < n_total  # narrow ranges must actually skip

    ds, n_read, _ = read_pruned(d, 10**8, None)
    assert ds.count() == 0 and n_read == 0


def test_relayout_is_idempotent(laid_out, ray_session):
    """Re-running the layout job into the same directory (crash rerun)
    leaves an equivalent committed zone map."""
    import ray.data

    from connect_smts_ray.ops.layout import read_pruned, write_sorted_shards

    t, d, zone1 = laid_out
    zone2 = write_sorted_shards(
        ray.data.from_arrow(t).repartition(2), "k", d, num_shards=8)
    assert sum(s["rows"] for s in zone2["shards"]) == t.num_rows
    ds, _, _ = read_pruned(d, None, None)
    assert ds.count() == t.num_rows


def test_timestamp_sort_column(ray_session, tmp_path):
    import ray.data

    from connect_smts_ray.ops.layout import read_pruned, write_sorted_shards

    us = np.arange(0, 1000) * 1_000_000
    t = pa.table({"ts": pa.array(us, pa.timestamp("us")),
                  "x": pa.array(np.arange(1000), pa.int64())})
    d = str(tmp_path / "ts_layout")
    write_sorted_shards(ray.data.from_arrow(t).repartition(3), "ts", d,
                        num_shards=4)
    lo, hi = 100 * 1_000_000, 199 * 1_000_000
    ds, n_read, n_total = read_pruned(d, lo, hi)
    rows = ds.take_all()
    assert len(rows) == 100
    assert n_read < n_total


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------

def _grid_table(n_side: int = 100) -> pa.Table:
    """Uniform 2-D grid: every (x, y) in [0, n_side)² exactly once —
    the textbook case where z-order prunes on either axis and a
    single-column sort cannot."""
    n = n_side * n_side
    i = np.arange(n, dtype=np.int64)
    return pa.table({
        "x": i % n_side,
        "y": i // n_side,
        "payload": i * 7,
    })


def test_zorder_prunes_both_columns(ray_session, tmp_path):
    import ray.data

    from connect_smts_ray.ops.layout import (
        read_zorder_pruned,
        write_zorder_shards,
    )

    t = _grid_table(100)
    out = str(tmp_path / "z")
    zone = write_zorder_shards(
        ray.data.from_arrow(t), ["x", "y"], out, num_shards=16)
    assert len(zone["shards"]) >= 8
    assert sum(s["rows"] for s in zone["shards"]) == t.num_rows

    for col, other in (("x", "y"), ("y", "x")):
        ds, nread, ntotal = read_zorder_pruned(out, col, lo=10, hi=19)
        got = ds.to_pandas()
        assert len(got) == 10 * 100
        assert got[col].between(10, 19).all()
        assert set(got[other]) == set(range(100))
        # the whole point: a 10% slice on EITHER axis skips most files
        assert nread < ntotal
        assert nread <= ntotal // 2, (col, nread, ntotal)


def test_zorder_matches_brute_filter(ray_session, tmp_path):
    import ray.data

    from connect_smts_ray.ops.layout import (
        read_zorder_pruned,
        write_zorder_shards,
    )

    t = _grid_table(40)
    out = str(tmp_path / "z2")
    write_zorder_shards(ray.data.from_arrow(t), ["x", "y"], out,
                        num_shards=8)
    ds, _, _ = read_zorder_pruned(out, "y", lo=5, hi=7)
    got = ds.to_pandas().sort_values(["x", "y"]).reset_index(drop=True)
    want = t.to_pandas()
    want = want[(want.y >= 5) & (want.y <= 7)] \
        .sort_values(["x", "y"]).reset_index(drop=True)
    assert got[["x", "y", "payload"]].equals(want[["x", "y", "payload"]])


def test_zorder_relayout_is_deterministic(ray_session, tmp_path):
    import ray.data

    from connect_smts_ray.ops.layout import write_zorder_shards

    t = _grid_table(30)
    z1 = write_zorder_shards(ray.data.from_arrow(t), ["x", "y"],
                             str(tmp_path / "za"), num_shards=4)
    z2 = write_zorder_shards(ray.data.from_arrow(t), ["x", "y"],
                             str(tmp_path / "zb"), num_shards=4)
    strip = lambda z: [{k: v for k, v in s.items() if k != "path"}
                       for s in z["shards"]]
    assert z1["zbounds"] == z2["zbounds"]
    assert strip(z1) == strip(z2)


def test_zorder_timestamp_column(ray_session, tmp_path):
    import ray.data

    from connect_smts_ray.ops.layout import (
        read_zorder_pruned,
        write_zorder_shards,
    )

    n = 2000
    i = np.arange(n, dtype=np.int64)
    t = pa.table({
        "ts": pa.array(i * 1_000_000, pa.timestamp("us")),
        "k": i % 50,
    })
    out = str(tmp_path / "zt")
    write_zorder_shards(ray.data.from_arrow(t), ["ts", "k"], out,
                        num_shards=8)
    ds, nread, ntotal = read_zorder_pruned(
        out, "ts", lo=100 * 1_000_000, hi=199 * 1_000_000)
    got = ds.to_pandas()
    assert len(got) == 100
    assert nread < ntotal


def test_zorder_bad_column_raises(ray_session, tmp_path):
    import ray.data

    import pytest as _pytest

    from connect_smts_ray.ops.layout import (
        read_zorder_pruned,
        write_zorder_shards,
    )

    t = _grid_table(10)
    out = str(tmp_path / "zx")
    write_zorder_shards(ray.data.from_arrow(t), ["x", "y"], out,
                        num_shards=2)
    with _pytest.raises(ValueError):
        read_zorder_pruned(out, "payload", lo=0, hi=1)
