"""ORC connector: stripe-split reads, tmp-file immunity, idempotent sink.

Pins the r4 driver red (`orc_roundtrip`): a writer task killed
mid-write leaves `part-*.orc.tmp`, and a directory re-list that feeds it
to the decoder poisons the whole read. The fixed reader (a) globs
`*.orc` only and (b) fans one decode task per STRIPE so one big file
still parallelizes.
"""

import os

import pyarrow as pa
import pyarrow.orc
import pytest

from connect_smts_ray.sources.orc import read_orc, write_orc


def _events_table(n=5000):
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "event_type": pa.array(
            ["click", "view", "purchase", "error"][:1] * 0
            + [["click", "view", "purchase", "error"][i % 4]
               for i in range(n)], pa.string()),
        "value_cents": pa.array([i * 7 % 10_000 for i in range(n)],
                                pa.int64()),
    })


def _sorted_pandas(ds):
    return (ds.to_pandas().sort_values("event_id")
            .reset_index(drop=True))


def test_orc_roundtrip_and_tmp_immunity(ray_session, tmp_path):
    import ray

    t = _events_table(2000)
    ds = ray.data.from_arrow(t).repartition(4)
    out = str(tmp_path / "orc")
    summary = write_orc(ds, out).take_all()
    paths = [r["path"] for r in summary]
    assert sum(r["n_rows"] for r in summary) == 2000
    assert all(p.endswith(".orc") for p in paths)

    # poison the directory the way a killed writer task would
    with open(os.path.join(out, "part-deadbeef.orc.tmp"), "wb") as f:
        f.write(b"ORC garbage that must never reach the decoder")

    # directory read skips the .tmp; explicit-path read sees only commits
    for src in (out, paths):
        back = _sorted_pandas(read_orc(src))
        assert back.equals(_sorted_pandas(ray.data.from_arrow(t)))


def test_orc_single_file_splits_by_stripe(ray_session, tmp_path):
    """One multi-stripe file must decode with parallelism > 1 (one unit
    per stripe) and produce identical content."""
    import ray

    t = _events_table(50_000)
    path = str(tmp_path / "big.orc")
    # tiny stripes force many stripes in one file
    pyarrow.orc.write_table(t, path, stripe_size=64 * 1024)
    assert pyarrow.orc.ORCFile(path).nstripes > 1

    ds = read_orc([path]).materialize()
    # planning made one block per stripe — that IS the read parallelism
    assert ds.num_blocks() == pyarrow.orc.ORCFile(path).nstripes
    back = _sorted_pandas(ds)
    assert back.equals(_sorted_pandas(ray.data.from_arrow(t)))


def test_orc_write_is_idempotent_by_content(ray_session, tmp_path):
    """A retried write of the same block lands on the same file name —
    no duplicate rows on re-read."""
    import ray

    t = _events_table(100)
    out = str(tmp_path / "orc")
    p1 = sorted(r["path"] for r in
                write_orc(ray.data.from_arrow(t).repartition(1), out)
                .take_all())
    p2 = sorted(r["path"] for r in
                write_orc(ray.data.from_arrow(t).repartition(1), out)
                .take_all())
    assert p1 == p2
    assert read_orc(out).count() == 100


def test_orc_decode_error_is_truncated(ray_session, tmp_path):
    """A corrupt file raises with a short message — no payload bytes."""
    bad = str(tmp_path / "bad.orc")
    with open(bad, "wb") as f:
        f.write(b"\x00" * 4096 + b"ORC")
    with pytest.raises(Exception) as ei:
        read_orc([bad]).count()
    assert len(str(ei.value)) < 4000  # Ray wraps; our fragment is <200
