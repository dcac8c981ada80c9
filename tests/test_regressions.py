"""Regression tests for review-found defects — each test pins a fix that
the standard fixtures could not catch (no NULLs, no ties, no slot-1-only
batches in the driver corpora)."""

import hashlib
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_expand_json_slot0_always_emitted(ray_session):
    """A batch whose rows all union-miss slot 0 must still emit the primary
    column (all-null), not only the __s1 column."""
    from connect_smts_ray.core.schema import SType, stype_to_dict
    from connect_smts_ray.transforms.expand_json import (
        ExpandJson,
        ExpandJsonConfig,
    )

    boot = SType("struct", name="j", fields=(("a", SType("int32", optional=True)),))
    ex = ExpandJson(ExpandJsonConfig(
        columns=("j",), bootstrap_schemas={"j": [stype_to_dict(boot)]}
    ))
    out = ex(pa.table({"j": pa.array(['{"a":"x"}', '{"a":"y"}'], pa.string())}))
    assert "j" in out.column_names
    assert out.column("j").null_count == 2
    assert "j__s1" in out.column_names


def test_expand_json_empty_bytes_payload(ray_session):
    """b'' payloads drop like '' (the decrypt chain emits binary columns)."""
    from connect_smts_ray.transforms.expand_json import (
        ExpandJson,
        ExpandJsonConfig,
    )

    ex = ExpandJson(ExpandJsonConfig(columns=("j",)))
    out = ex(pa.table({"j": pa.array([b'{"a":1}', b"", None], pa.binary())}))
    assert out.column("j").null_count == 2


def test_decrypt_skip_on_error_malformed_protected(ray_session):
    """Non-ASCII / non-string protected headers must honor skip_on_error."""
    from connect_smts_ray.pipelines.replay import TEST_JWK
    from connect_smts_ray.transforms.crypto import DecryptColumn, JoseConfig

    dc = DecryptColumn(JoseConfig(keys=TEST_JWK, columns=("p",), skip_on_error=True))
    bad = pa.table({"p": pa.array([
        b'{"protected":"\\u00e9","iv":"AA","ciphertext":"AA","tag":"AA"}',
        b'{"protected":5,"iv":"AA","ciphertext":"AA","tag":"AA"}',
    ], pa.binary())})
    out = dc(bad)
    assert out.column("p").to_pylist() == bad.column("p").to_pylist()


def test_knn_tie_break_smallest_id(ray_session):
    import ray.data

    from connect_smts_ray.ops.similarity import knn_brute_force

    t = pa.table({
        "vec_id": pa.array([30, 10, 20], pa.int64()),
        "embedding": pa.array([[1.0, 0.0]] * 3, pa.list_(pa.float64())),
    })
    res = knn_brute_force(ray.data.from_arrow(t), np.array([[1.0, 0.0]]), k=1)
    assert res.column("neighbor_id").to_pylist() == [10]


def test_outbox_int_partition_key_both_paths(ray_session):
    from dataclasses import replace

    from connect_smts_ray.transforms.outbox import OutboxConfig, outbox_route

    b = pa.table({
        "partition_key": pa.array([1234, 99], pa.int64()),
        "payload": pa.array(['{"x":1}', '{"y":2}'], pa.string()),
    })
    fast = OutboxConfig(topic="t", partition_setting="partition-key",
                        num_partitions=3, emit_headers=False)
    slow = replace(fast, emit_headers=True)
    pf = outbox_route(b, fast).column("out_partition").to_pylist()
    pg = outbox_route(b, slow).column("out_partition").to_pylist()
    assert pf == pg


def test_composite_keys_unambiguous():
    from connect_smts_ray.sinks.upsert import composite_key_bytes

    kb = composite_key_bytes(pa.table({
        "repo": pa.array([None, "", "a\x1fb", "a"], pa.string()),
        "path": pa.array(["x", "x", "c", "b\x1fc"], pa.string()),
    }), ("repo", "path"))
    assert len(set(kb)) == 4


def test_murmur2_many_rejects_nulls():
    from connect_smts_ray.core.hashing import murmur2_positive_many

    with pytest.raises(ValueError, match="null key"):
        murmur2_positive_many(pa.array(["a", None], pa.string()))


def test_events_type_stats_with_nulls(ray_session):
    """NULL value and NULL event_type rows must match SQL GROUP BY exactly
    (NULL group kept, NULL values skipped by sum, counted by count(*))."""
    import duckdb

    import __ray_entry__ as e

    src = pq.read_table(
        "/root/testdata/sf0.001/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    extra = pa.table({
        "event_id": pa.array([999991, 999992], pa.int64()),
        "ts": pa.array([src.column("ts")[0].as_py()] * 2,
                       src.schema.field("ts").type),
        "user_id": pa.array([3, 4], pa.int64()),
        "event_type": pa.array([None, "view"], pa.string()),
        "value": pa.array([12.5, None], pa.float64()),
        "props": pa.array(['{"k":1}', '{"k":2}'], pa.string()),
    })
    tmpd = tempfile.mkdtemp()
    pq.write_table(
        pa.concat_tables([src.select(extra.column_names), extra]).combine_chunks(),
        f"{tmpd}/events.parquet",
    )

    got = e.queries()["events_type_stats"](tmpd).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmpd}/events.parquet')"
    )
    want = con.execute(e.oracle_sql()["events_type_stats"]).df()

    def canon(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    g, w = canon(got), canon(want)
    assert len(g) == len(w)
    assert hashlib.sha256(
        g.to_csv(index=False, float_format="%.9g").encode()
    ).hexdigest() == hashlib.sha256(
        w.to_csv(index=False, float_format="%.9g").encode()
    ).hexdigest()


def test_hot_key_skew_upsert(ray_session):
    """A key carrying 90% of all events (extreme skew) must still resolve
    to the correct LWW winner with bounded shuffle: the per-block partial
    combiner collapses the hot key to one row per block BEFORE the hash
    exchange (max-reduce is associative, so salting is subsumed —
    SURVEY §4.2.2)."""
    import ray.data

    from connect_smts_ray.sinks.upsert import UpsertConfig, read_lake, run_upsert

    n_hot, n_cold = 9000, 1000
    t = pa.table({
        "repo": pa.array(["hot"] * n_hot + [f"c{i}" for i in range(n_cold)],
                         pa.string()),
        "path": pa.array(["p"] * (n_hot + n_cold), pa.string()),
        "commit_lsn": pa.array(
            list(range(n_hot)) + [0] * n_cold, pa.int64()
        ),
        "source_offset": pa.array(range(n_hot + n_cold), pa.int64()),
        "content": pa.array(
            [f"v{i}" for i in range(n_hot)] + ["cold"] * n_cold, pa.string()
        ),
        "is_tombstone": pa.array([False] * (n_hot + n_cold), pa.bool_()),
    })
    lake = tempfile.mkdtemp(prefix="hotkey_")
    cfg = UpsertConfig(lake_dir=lake, num_partitions=8)
    ds = ray.data.from_arrow(t).repartition(16)
    lineage = run_upsert(ds, cfg, epoch=0).to_pandas()
    state = read_lake(cfg)

    # hot key resolves to max-lsn content; every cold key survives
    rows = {
        (r, p): c for r, p, c in zip(
            state.column("repo").to_pylist(),
            state.column("path").to_pylist(),
            state.column("content").to_pylist(),
        )
    }
    assert rows[("hot", "p")] == f"v{n_hot - 1}"
    assert len(rows) == 1 + n_cold
    # combiner bound: the shuffle carried at most (keys × blocks) rows,
    # never the 9000 hot-key events; rows_in meanwhile reports the EXACT
    # event count (lineage telemetry carried through the combiner)
    assert lineage["rows_shuffled"].sum() <= (1 + n_cold) * 16
    assert lineage["rows_in"].sum() == n_hot + n_cold


# ---------------------------------------------------------------------------
# Round-2: distributed dedup (components, anti-joins, bucket caps)
# ---------------------------------------------------------------------------

_DEDUP_PINS = {
    # sf0.001 survivor-id sets pinned when the dedup families moved from
    # driver-side union-find/text-lookups to the fully distributed path
    # (components.py) — the rewrite must not change a single survivor.
    "dedup_exact": (500, "0c107320ad64414b"),
    "dedup_jaccard": (476, "04ed23967f5edb4f"),
    "dedup_minhash": (476, "04ed23967f5edb4f"),
    # simhash re-pinned when _stable_hash64 moved blake2b → md5 (so the
    # word hashes are reproducible in DuckDB for the driver SQL oracle);
    # value derived from an INDEPENDENT all-pairs hamming + union-find
    # replication, not from the pipeline under test.
    "dedup_simhash": (350, "f0f716e6758b60bd"),
    "dedup_embedding": (500, "0c107320ad64414b"),
}


@pytest.mark.parametrize("name", sorted(_DEDUP_PINS))
def test_dedup_survivors_pinned(ray_session, name):
    import __ray_entry__ as e

    id_col = "vec_id" if name == "dedup_embedding" else "doc_id"
    df = e.queries()[name]("/root/testdata/sf0.001").to_pandas()
    ids = sorted(df[id_col].tolist())
    h = hashlib.sha256(",".join(map(str, ids)).encode()).hexdigest()[:16]
    want_n, want_h = _DEDUP_PINS[name]
    assert (len(ids), h) == (want_n, want_h)


def test_exact_dedup_join_path_matches_broadcast(ray_session):
    """The anti-join loser-removal path (dup-heavy corpora where the
    {hash: winner} dict would not fit a worker heap) must produce the same
    survivors as the broadcast path."""
    import ray.data
    from connect_smts_ray.ops.dedup import exact_dedup

    texts = [f"doc {i % 7} body" for i in range(40)]  # 7 distinct contents
    t = pa.table({
        "doc_id": pa.array(range(40), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    ds = ray.data.from_arrow(t)
    via_bcast = sorted(
        r["doc_id"] for r in exact_dedup(ds, strategy="broadcast").take_all()
    )
    via_join = sorted(
        r["doc_id"] for r in exact_dedup(ds, strategy="join").take_all()
    )
    assert via_bcast == via_join == list(range(7))


def test_embedding_dedup_giant_bucket_capped(ray_session):
    """Adversarial dense cluster: hundreds of near-identical vectors land in
    ONE LSH bucket in every table. The capped verify (recursive split +
    star fallback) must still link the whole cluster and keep only the
    min-id representative — without O(b²) work on the full bucket."""
    import ray.data
    from connect_smts_ray.ops.dedup import embedding_dedup

    rng = np.random.RandomState(7)
    base = rng.normal(size=16)
    dense = base + rng.normal(scale=1e-6, size=(300, 16))  # one dense cluster
    others = rng.normal(size=(50, 16))
    vecs = np.vstack([dense, others])
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    survivors, _ = embedding_dedup(
        ray.data.from_arrow(t), threshold=0.999, n_planes=8, bucket_cap=32
    )
    ids = {r["vec_id"] for r in survivors.take_all()}
    assert 0 in ids                       # cluster representative survives
    assert not (ids & set(range(1, 300)))  # the other 299 collapse onto it
    assert len(ids & set(range(300, 350))) >= 45  # random vectors survive


def test_connected_components_long_path(ray_session):
    """Path-shaped components (versioned near-dup chains) must converge
    within O(log diameter) iterations — pointer jumping, not plain
    diameter-bound propagation."""
    import ray.data
    from connect_smts_ray.ops.components import connected_components
    from connect_smts_ray.ops.dedup import union_find_components

    pairs = [(i, i + 1) for i in range(40)]          # one 41-node path
    pairs += [(100, 101), (101, 102), (100, 102)]    # plus a triangle
    t = pa.table({
        "id_a": pa.array([a for a, _ in pairs], type=pa.int64()),
        "id_b": pa.array([b for _, b in pairs], type=pa.int64()),
    })
    out = connected_components(ray.data.from_arrow(t), max_iters=8)
    got = {r["doc_id"]: r["component"] for r in out.take_all()}
    assert got == union_find_components(pairs)


def test_ivf_training_sample_unbiased(ray_session):
    """Centroid training must sample uniformly by content hash, not take
    the first blocks (sorted corpora would otherwise bias centroids)."""
    import ray.data
    from connect_smts_ray.ops.similarity import IvfConfig, _training_sample

    # vectors encode their own index so we can recover which ids got picked
    vecs = [[float(i), 0.0] for i in range(2000)]
    t = pa.table({
        "vec_id": pa.array(range(2000), type=pa.int64()),
        "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
    })
    cfg = IvfConfig(sample_size=200)
    s1 = _training_sample(
        ray.data.from_arrow(t).repartition(4), cfg, "embedding", "vec_id"
    )
    s2 = _training_sample(
        ray.data.from_arrow(t).repartition(13), cfg, "embedding", "vec_id"
    )
    assert np.array_equal(s1, s2)          # layout-independent
    picked = s1[:, 0].astype(int)
    assert len(picked) == 200
    assert picked.max() > 1500 and picked.min() < 500  # spread, not head


def test_vectorized_key_and_murmur_equivalence():
    """The Arrow-kernel composite-key builder and the zero-copy murmur2
    buffer path must agree byte-for-byte with the scalar references
    (nulls, unicode, embedded separator bytes, empty strings)."""
    from connect_smts_ray.core.hashing import (
        murmur2_positive,
        murmur2_positive_many,
    )
    from connect_smts_ray.sinks.upsert import (
        composite_key_array,
        composite_key_bytes,
    )

    t = pa.table({
        "repo": ["r1", None, "a\x1fb", "émoji™", "", "r1"],
        "path": ["p", "p2", "x", "p\x1f", None, ""],
    })
    old = composite_key_bytes(t, ("repo", "path"))
    new = [s.encode() for s in composite_key_array(t, ("repo", "path")).to_pylist()]
    assert old == new

    arr = pa.array(["", "a", "some-partition-key", "émoji™-key",
                    "1234-5678", "x" * 37])
    fast = murmur2_positive_many(arr)
    slow = np.array([murmur2_positive(s.encode()) for s in arr.to_pylist()],
                    dtype=np.uint32)
    assert (fast == slow).all()


def test_gather_join_null_keys_unmatched(ray_session):
    """pandas merge matches null==null; the list-payload gather path must
    mirror acero (nulls never match): inner drops null-key rows, left_outer
    keeps them with null right columns — no null cross-product."""
    import ray.data

    from connect_smts_ray.ops.components import hash_join

    # list-typed payload forces the _gather_join path
    left = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", None, None], pa.string()),
        "emb": pa.array([[1.0], [2.0], [3.0]], pa.list_(pa.float64())),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", None], pa.string()),
        "v": pa.array([10, 20], pa.int64()),
    }))
    ls = pa.schema([("k", pa.string()), ("emb", pa.list_(pa.float64()))])
    rs = pa.schema([("k", pa.string()), ("v", pa.int64())])

    inner = hash_join(left, right, "k", "k", how="inner",
                      left_schema=ls, right_schema=rs).take_all()
    assert len(inner) == 1 and inner[0]["k"] == "a" and inner[0]["v"] == 10

    outer = hash_join(left, right, "k", "k", how="left_outer",
                      left_schema=ls, right_schema=rs).take_all()
    assert len(outer) == 3
    null_rows = [r for r in outer if r["k"] is None]
    assert len(null_rows) == 2 and all(r["v"] is None for r in null_rows)


def test_range_join_negative_timestamps(ray_session):
    """Left bands must use FLOOR division like the replicated right side:
    trunc-vs-floor disagreement dropped pre-1970 matches silently."""
    import ray.data

    from connect_smts_ray.ops.relational import range_join

    width = 200
    left = ray.data.from_arrow(pa.table({
        "key": pa.array(["k"] * 4, pa.string()),
        "lts": pa.array([-450, -250, -100, 150], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "rkey": pa.array(["k"] * 3, pa.string()),
        "rts": pa.array([-500, -300, 100], pa.int64()),
    }))
    out = range_join(
        left, right, "key", "rkey", "lts", "rts", width_us=width,
        left_schema=pa.schema([("key", pa.string()), ("lts", pa.int64())]),
        right_schema=pa.schema([("rkey", pa.string()), ("rts", pa.int64())]),
    ).take_all()
    got = {(r["lts"], r["rts"]) for r in out}
    # brute-force oracle: rts <= lts < rts + width
    want = {(l, r) for l in (-450, -250, -100, 150) for r in (-500, -300, 100)
            if r <= l < r + width}
    assert got == want


def test_window_pre_epoch_timestamps(ray_session):
    """Pre-1970 events must land in the floor window, not the trunc one."""
    import ray.data

    from connect_smts_ray.ops.relational import hopping_window, tumbling_window

    ts = pa.array([-1_000_000, 1_000_000], pa.timestamp("us"))
    ds = ray.data.from_arrow(pa.table({
        "event_ts": ts, "k": pa.array(["a", "a"]),
        "v": pa.array([1.0, 2.0]),
    }))
    out = tumbling_window(ds, "event_ts", 60, ["k"],
                          {"n": ("v", "count")}).take_all()
    starts = sorted(r["window_start"] for r in out)
    assert starts == [-60_000_000, 0]

    out2 = hopping_window(ds, "event_ts", 120, 60, ["k"],
                          {"n": ("v", "count")}).take_all()
    starts2 = sorted({r["window_start"] for r in out2})
    assert starts2 == [-120_000_000, -60_000_000, 0]


def test_connected_components_driver_path_preserves_dtype(ray_session):
    """The small-graph driver union-find must emit labels in the input id
    dtype (int32 here), matching the iterative path's schema."""
    import ray.data

    from connect_smts_ray.ops.components import connected_components

    pairs = ray.data.from_arrow(pa.table({
        "id_a": pa.array([1, 2], pa.int32()),
        "id_b": pa.array([2, 3], pa.int32()),
    }))
    labels = connected_components(pairs, driver_edge_limit=1000)
    sch = {f.name: f.type for b in labels.iter_batches(batch_format="pyarrow") for f in b.schema}
    assert sch["doc_id"] == pa.int32()
    assert sch["component"] == pa.int32()


def test_knn_string_query_ids_grouped(ray_session):
    """String query_ids through the grouped merge path (n_q >= 64) — the
    int64 np.full crashed; both paths must emit the string-typed column."""
    import ray.data

    from connect_smts_ray.ops.similarity import knn_brute_force

    rng = np.random.RandomState(5)
    vecs = rng.randn(100, 8)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(100), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
    }))
    q = vecs[:64]
    qids = [f"q-{i:03d}" for i in range(64)]
    grouped = knn_brute_force(ds, q, k=3, query_ids=qids, merge="grouped")
    driver = knn_brute_force(ds, q, k=3, query_ids=qids, merge="driver")
    assert grouped.schema.field("query_id").type == pa.string()
    assert grouped.sort_by([("query_id", "ascending"), ("rank", "ascending")]).equals(
        driver.sort_by([("query_id", "ascending"), ("rank", "ascending")]))


def test_auto_join_paths_identical(ray_session):
    """auto_join must produce identical rows via the broadcast path and the
    hash-exchange path (forced with broadcast_limit=0)."""
    import ray.data

    from connect_smts_ray.ops.relational import auto_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "a": pa.array(["w", "x", "y", "z"]),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([2, 3, 5], pa.int64()),
        "b": pa.array([20, 30, 50], pa.int64()),
    }))
    ls = pa.schema([("k", pa.int64()), ("a", pa.string())])
    rs = pa.schema([("k", pa.int64()), ("b", pa.int64())])

    def rows(ds):
        return sorted(
            (tuple(sorted(r.items())) for r in ds.take_all()),
        )

    bc = auto_join(left, right, on="k", broadcast_limit=1000,
                   left_schema=ls, right_schema=rs)
    hx = auto_join(left, right, on="k", broadcast_limit=0,
                   left_schema=ls, right_schema=rs)
    assert rows(bc) == rows(hx)
    assert len(rows(bc)) == 2


def test_broadcast_join_null_keys_and_dtypes(ray_session):
    """broadcast_join must mirror hash_join: null keys never match, int64
    columns stay int64 (a full-row pandas merge float-ified them)."""
    import ray.data

    from connect_smts_ray.ops.relational import auto_join, broadcast_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, None, None], pa.int64()),
        "a": pa.array([10, 20, 30], pa.int64()),
    }))
    right = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"),
                          "v": pd.array([100, 200], dtype="Int64")})
    inner = broadcast_join(left, right, on="k", how="inner")
    rows = inner.take_all()
    assert rows == [{"k": 1, "a": 10, "v": 100}]
    sch = {f.name: f.type for b in inner.iter_batches(batch_format="pyarrow")
           for f in b.schema}
    assert sch["k"] == pa.int64() and sch["v"] == pa.int64()

    outer = broadcast_join(left, right, on="k", how="left").take_all()
    assert len(outer) == 3
    assert all(r["v"] is None for r in outer if r["k"] is None)

    # and the two auto_join paths agree in the presence of nulls
    right_ds = ray.data.from_arrow(pa.table({
        "k": pa.array([1, None], pa.int64()),
        "v": pa.array([100, 200], pa.int64()),
    }))
    ls = pa.schema([("k", pa.int64()), ("a", pa.int64())])
    rs = pa.schema([("k", pa.int64()), ("v", pa.int64())])
    bc = auto_join(left, right_ds, on="k", broadcast_limit=10,
                   left_schema=ls, right_schema=rs).take_all()
    hx = auto_join(left, right_ds, on="k", broadcast_limit=0,
                   left_schema=ls, right_schema=rs).take_all()
    key = lambda r: tuple(sorted((k, v if v is not None else -1)
                                 for k, v in r.items()))
    assert sorted(map(key, bc)) == sorted(map(key, hx))


def test_hash_join_anti_semi_null_keys(ray_session):
    """anti/semi must treat null keys as matching nothing, even when the
    right side also carries nulls (pc.is_in default matched null==null)."""
    import ray.data

    from connect_smts_ray.ops.components import hash_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", None], pa.string()),
        "x": pa.array([1, 2], pa.int64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", None], pa.string()),
    }))
    ls = pa.schema([("k", pa.string()), ("x", pa.int64())])
    rs = pa.schema([("k", pa.string())])
    anti = hash_join(left, right, "k", "k", how="left_anti",
                     left_schema=ls, right_schema=rs).take_all()
    assert [r["x"] for r in anti] == [2]   # null-key row kept
    semi = hash_join(left, right, "k", "k", how="left_semi",
                     left_schema=ls, right_schema=rs).take_all()
    assert [r["x"] for r in semi] == [1]   # null-key row dropped


def test_doc_ngram_windows_string_ids(ray_session):
    """Gram explosion must preserve non-int64 id dtypes."""
    from connect_smts_ray.ops.corpus import doc_ngram_windows

    b = pa.table({
        "doc_id": pa.array(["d1", "d2"], pa.string()),
        "text": pa.array(["one two three", "four five"], pa.string()),
    })
    out = doc_ngram_windows(b, 2, "doc_id", "text")
    assert out.schema.field("doc_id").type == pa.string()
    got = set(zip(out.column("doc_id").to_pylist(),
                  out.column("gram").to_pylist()))
    assert got == {("d1", "one two"), ("d1", "two three"), ("d2", "four five")}


def test_lww_winners_unsigned_and_tie_semantics(ray_session):
    """ADVICE r02 #1: negating an unsigned order column WRAPS (uint 0
    would rank as max), so uint dtypes must take the polars fallback —
    and fully-tied order columns must keep the LAST input row in both
    the numpy fast path and the polars path."""
    from connect_smts_ray.sinks.upsert import UpsertConfig, lww_winners

    cfg = UpsertConfig(
        lake_dir="/tmp/unused_lww", key_columns=("k",),
        order_columns=("o",),
    )
    # uint64 order: max is 5, NOT 0 — a wrapped negation would pick 0
    t = pa.table({
        "k": pa.array(["a", "a", "a"]),
        "o": pa.array([0, 5, 3], pa.uint64()),
        "v": pa.array([1, 2, 3], pa.int64()),
    })
    out = lww_winners(t, cfg)
    assert out.num_rows == 1 and out.column("v")[0].as_py() == 2

    # signed fast path, full tie on the order column: LAST input row wins
    t2 = pa.table({
        "k": pa.array(["a", "a", "b"]),
        "o": pa.array([7, 7, 1], pa.int64()),
        "v": pa.array([10, 20, 30], pa.int64()),
    })
    out2 = lww_winners(t2, cfg)
    got = {r["k"]: r["v"] for r in out2.to_pylist()}
    assert got == {"a": 20, "b": 30}

    # same tie through the polars path (uint dtype forces it)
    t3 = pa.table({
        "k": pa.array(["a", "a"]),
        "o": pa.array([7, 7], pa.uint64()),
        "v": pa.array([10, 20], pa.int64()),
    })
    assert lww_winners(t3, cfg).column("v")[0].as_py() == 20


def test_composite_key_builders_equal_nonstring_dtypes():
    """ADVICE r02 #3: scalar and vectorized key builders must render
    int/bool/float/timestamp key columns identically (both use the Arrow
    string cast), so partition routing cannot silently diverge."""
    import datetime as dt

    from connect_smts_ray.sinks.upsert import (
        composite_key_array,
        composite_key_bytes,
    )

    t = pa.table({
        "i": pa.array([0, -7, None, 2**62], pa.int64()),
        "b": pa.array([True, False, True, None], pa.bool_()),
        "f": pa.array([2.0, -0.5, 1e300, None], pa.float64()),
        "ts": pa.array(
            [dt.datetime(2026, 1, 1), None,
             dt.datetime(1969, 12, 31, 23, 59, 59), dt.datetime(2000, 6, 15)],
            pa.timestamp("us")),
    })
    for cols in (("i",), ("b", "f"), ("i", "b", "f", "ts")):
        old = composite_key_bytes(t, cols)
        new = [
            s.encode()
            for s in composite_key_array(t, cols).to_pylist()
        ]
        assert old == new, cols


def test_funnel_counts_string_user_ids(ray_session):
    """ADVICE r04: funnel_counts pinned the user column to int64; string
    ids must funnel identically (key type now derived from the data)."""
    import ray

    from connect_smts_ray.ops.relational import funnel_counts

    t = pa.table({
        "user_id": pa.array(["a", "a", "a", "b", "b", "c"], pa.string()),
        "event_type": pa.array(
            ["view", "click", "purchase", "view", "click", "click"],
            pa.string()),
        "ts": pa.array([1, 2, 3, 1, 2, 1], pa.timestamp("us")),
    })
    out = funnel_counts(ray.data.from_arrow(t).repartition(2),
                        steps=["view", "click", "purchase"])
    assert out.column("n_users").to_pylist() == [2, 2, 1]


def test_skew_and_multi_join_reject_full_outer(ray_session):
    """ADVICE r04: full_outer under salting emits phantom unmatched-right
    rows and hash_join_multi loses right key values — both must refuse."""
    import ray

    from connect_smts_ray.ops.components import (hash_join,
                                                 hash_join_multi, skew_join)

    t = pa.table({"k": pa.array([1, 2], pa.int64()),
                  "v": pa.array([10, 20], pa.int64())})
    r = pa.table({"k": pa.array([2, 3], pa.int64()),
                  "w": pa.array([5, 6], pa.int64())})
    lds, rds = ray.data.from_arrow(t), ray.data.from_arrow(r)
    with pytest.raises(ValueError, match="full_outer"):
        skew_join(lds, rds, left_on="k", right_on="k", how="full_outer",
                  left_schema=t.schema, right_schema=r.schema)
    with pytest.raises(ValueError, match="full_outer"):
        hash_join_multi(lds, rds, left_on=["k"], right_on=["k"],
                        how="full_outer",
                        left_schema=t.schema, right_schema=r.schema)
    # schema-less empty left + full_outer must demand a schema, not
    # silently drop the right side
    empty = ray.data.from_arrow(t.slice(0, 0)).filter(lambda row: False)
    with pytest.raises(ValueError, match="left_schema"):
        hash_join(empty, rds, left_on="k", right_on="k", how="full_outer",
                  right_schema=r.schema)


def test_dlq_distinct_batches_same_dead_rows_both_recorded(tmp_path):
    """ADVICE r04: two DIFFERENT batches whose failing rows coincide must
    produce TWO DLQ files (multiplicity preserved); a retry of the SAME
    batch still dedups to one."""
    import pyarrow.compute as pc

    from connect_smts_ray.transforms.dlq import read_dlq, with_dlq

    def fn(b: pa.Table) -> pa.Table:
        if pc.any(pc.equal(b.column("x"), pa.scalar(13))).as_py():
            raise ValueError("poison")
        return b

    d = str(tmp_path / "dlq")
    w = with_dlq(fn, d, stage="s")
    b1 = pa.table({"x": pa.array([1, 13], pa.int64())})
    b2 = pa.table({"x": pa.array([2, 13], pa.int64())})
    w(b1)
    w(b1)  # retry of the identical batch → same file
    w(b2)  # different batch, same dead row → second file
    dead = read_dlq(d)
    assert dead.num_rows == 2


# ---------------------------------------------------------------------------
# Round-5 review findings
# ---------------------------------------------------------------------------

def test_identical_blocks_keep_distinct_files_orc_avro(ray_session, tmp_path):
    """Two DIFFERENT blocks with IDENTICAL content must write distinct
    files — pure content-addressing collapsed them and a directory read
    silently lost rows (round-5 review)."""
    import ray.data

    from connect_smts_ray.sources.avro import read_avro, write_avro
    from connect_smts_ray.sources.orc import read_orc, write_orc

    t = pa.table({"a": pa.array([1, 2, 3] * 2, pa.int64())})
    ds = ray.data.from_arrow(t).repartition(2)  # two identical 3-row blocks

    orc_dir = str(tmp_path / "orc")
    summary = write_orc(ds, orc_dir).to_pandas()
    assert summary["n_rows"].sum() == 6
    assert len(set(summary["path"])) == len(summary)
    assert read_orc(orc_dir).count() == 6  # directory read, full rows

    avro_dir = str(tmp_path / "avro")
    summary = write_avro(ds, avro_dir).to_pandas()
    assert summary["n_rows"].sum() == 6
    assert read_avro(avro_dir).count() == 6


def test_ivf_training_sample_saturated_fraction(ray_session):
    """n within 1.25× of sample_size made the uint64 cut overflow
    (round-5 review): the sample must simply keep everything."""
    import ray.data

    from connect_smts_ray.ops.similarity import IvfConfig, _training_sample

    n = 2100  # 2048 < n <= 2560 → fraction saturates at 1.0
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([[float(i), 1.0] for i in range(n)],
                              pa.list_(pa.float64())),
    })
    cfg = IvfConfig(sample_size=2048)
    sample = _training_sample(ray.data.from_arrow(t), cfg,
                              vec_col="embedding", id_col="doc_id")
    assert len(sample) >= cfg.sample_size


def test_avro_split_read_bounded_window(ray_session, tmp_path):
    """A split whose last block overruns the window must extend and
    decode exactly once (bounded-IO read path, round-5 review)."""
    import ray.data

    from connect_smts_ray.sources.avro import read_avro, write_avro

    n = 5000
    t = pa.table({
        "k": pa.array(range(n), pa.int64()),
        "s": pa.array([f"row-{i}" * 8 for i in range(n)], pa.string()),
    })
    d = str(tmp_path / "avro_big")
    write_avro(ray.data.from_arrow(t), d).to_pandas()
    # tiny split_size → many splits per file, every boundary case hit
    got = read_avro(d, split_size=4096).to_pandas().sort_values("k") \
        .reset_index(drop=True)
    assert len(got) == n
    assert got["k"].tolist() == list(range(n))


def test_grouped_corr_null_pairs(ray_session):
    """Population = complete pairs (SQL corr()): rows with a NULL x or y
    contribute to NOTHING — not to n, not to the x-moments — so partial
    nulls cannot blend inconsistent populations (pre-fix, (1,10),(2,20),
    (3,NULL) returned corr=-0.5 where SQL corr()=1.0); groups with zero
    complete pairs are absent, and an all-null block partial cannot
    crash the final reduce."""
    import ray.data

    from connect_smts_ray.ops.relational import grouped_corr

    # block 1: group 'a' all-null y; block 2: real pairs for both groups
    t1 = pa.table({"k": ["a", "a"], "x": pa.array([1, 2], pa.int64()),
                   "y": pa.array([None, None], pa.int64())})
    t2 = pa.table({"k": ["a", "a", "b", "b", "b"],
                   "x": pa.array([1, 2, 1, 2, 3], pa.int64()),
                   "y": pa.array([10, 20, 5, 9, 13], pa.int64())})
    ds = ray.data.from_arrow([t1, t2])
    got = {r["k"]: (r["n"], r["corr"])
           for r in grouped_corr(ds, "k", "x", "y").take_all()}
    # 'b' is perfectly linear; 'a' counts only its 2 complete pairs
    assert got["b"][1] == pytest.approx(1.0)
    assert got["a"] == (2, pytest.approx(1.0))

    # the reviewer's sign-flip case: (1,10),(2,20),(3,NULL) must be 1.0
    t4 = pa.table({"k": ["m"] * 3, "x": pa.array([1, 2, 3], pa.int64()),
                   "y": pa.array([10, 20, None], pa.int64())})
    got4 = {r["k"]: (r["n"], r["corr"])
            for r in grouped_corr(ray.data.from_arrow([t4]),
                                  "k", "x", "y").take_all()}
    assert got4["m"] == (2, pytest.approx(1.0))

    # group with ZERO complete pairs is absent (the oracle's WHERE
    # x IS NOT NULL AND y IS NOT NULL drops it before grouping)
    t3 = pa.table({"k": ["c", "c"], "x": pa.array([1, 2], pa.int64()),
                   "y": pa.array([None, None], pa.int64())})
    got3 = grouped_corr(ray.data.from_arrow([t3]), "k", "x", "y").take_all()
    assert got3 == []


def test_changelog_aggregate_epochs_null_group_live(ray_session, tmp_path):
    """A live changelog row whose group value is NULL must not crash the
    final sort (None is uncomparable to str); it groups under NULL like
    the single-pass variant and SQL GROUP BY."""
    import ray.data

    from connect_smts_ray.ops.ivm import changelog_aggregate_epochs

    ch = pa.table({
        "key": pa.array([1, 2, 3], pa.int64()),
        "grp": pa.array(["x", None, "x"], pa.string()),
        "val": pa.array([10, 20, 30], pa.int64()),
        "lsn": pa.array([1, 2, 3], pa.int64()),
        "deleted": pa.array([False, False, False], pa.bool_()),
    })
    out = changelog_aggregate_epochs(
        lambda e: ray.data.from_arrow(ch), epochs=1,
        state_dir=str(tmp_path), key_cols=("key",), lsn_col="lsn",
        delete_col="deleted", group_col="grp", measure_col="val")
    rows = {r["group"]: (r["n_keys"], r["total"])
            for r in out.to_pylist()}
    assert rows[None] == (1, 20)
    assert rows["x"] == (2, 40)


def test_grouped_string_agg_all_null_group_kept(ray_session):
    """SQL string_agg keeps a group whose values are all NULL (agg NULL);
    nulls inside a mixed group are skipped without breaking the order."""
    import ray.data

    from connect_smts_ray.ops.relational import grouped_string_agg

    t = pa.table({
        "u": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "v": pa.array(["a", None, "b", None, None, "z"], pa.string()),
        "ts": pa.array([1, 2, 3, 1, 2, 1], pa.int64()),
        "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
    })
    out = {r["u"]: r["agg"]
           for r in grouped_string_agg(
               ray.data.from_arrow(t), "u", "v", "ts", "id",
               sep=">").take_all()}
    assert out == {1: "a>b", 2: None, 3: "z"}


def test_hash_join_full_outer_schemaless_empty_right(ray_session):
    """full_outer with a schema-less empty RIGHT side raises (mirror of
    the empty-left guard) instead of silently dropping right columns."""
    import ray.data

    from connect_smts_ray.ops.components import hash_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()), "a": pa.array([2], pa.int64())}))
    empty_right = ray.data.from_items([])
    with pytest.raises(ValueError, match="schema-less empty right"):
        hash_join(left, empty_right, left_on="k", right_on="k",
                  how="full_outer")


def test_merge_lineage_metrics_emission(ray_session):
    """The north-star contract emits per-partition lineage as Ray
    metrics: emitting from inside a Ray session must register the
    counter/gauge instances, and emission must be a no-op (never a
    raise) on malformed input — a metrics failure can't fail a merge
    whose manifest is already durable."""
    from connect_smts_ray.core import metrics as m

    manifest = {"partition_id": 3, "rows_in": 10, "rows_merged": 7,
                "deletes_applied": 1, "bytes_written": 4096,
                "offset_range": [0, 99]}
    m.emit_merge_lineage(manifest, skipped=False)
    m.emit_merge_lineage(manifest, skipped=True)
    assert "csr_replay_rows_merged" in m._cache
    assert "csr_replay_max_source_offset" in m._cache
    assert "csr_replay_epochs_skipped" in m._cache

    # malformed manifests are swallowed, not raised
    m.emit_merge_lineage({}, skipped=False)
    m.emit_merge_lineage({"partition_id": None, "rows_in": "x"},
                         skipped=False)


def test_upsert_string_order_columns_lineage(ray_session, tmp_path):
    """A table ordered by STRING columns (polars fallback path) must
    merge and commit; the int64 lineage offsets record NULL instead of
    crashing, while the manifest keeps the typed offset range."""
    import ray.data

    from connect_smts_ray.sinks.upsert import (
        UpsertConfig,
        read_lake,
        run_upsert,
    )

    cfg = UpsertConfig(lake_dir=str(tmp_path / "lake"), num_partitions=2,
                       key_columns=("k",), order_columns=("lsn_s", "off_s"))
    t = pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "lsn_s": pa.array(["a1", "b2", "a1"], pa.string()),
        "off_s": pa.array(["x1", "x2", "x1"], pa.string()),
        "v": pa.array(["old", "new", "solo"], pa.string()),
        "is_tombstone": pa.array([False] * 3, pa.bool_()),
    })
    lin = run_upsert(ray.data.from_arrow(t), cfg, epoch=0).to_pandas()
    assert lin["min_offset"].isna().all()  # typed range lives in manifest
    got = {r["k"]: r["v"] for r in read_lake(cfg).to_pylist()}
    assert got == {1: "new", 2: "solo"}
    man = cfg.resolve().store().read_manifest(
        cfg.resolve().store().all_partitions()[0], 0)
    assert isinstance(man["offset_range"][0], str)


def test_upsert_null_offset_does_not_kill_epoch(ray_session, tmp_path):
    """Review repro: one NULL in an int64 offset column coerced the
    telemetry arrays to float NaN and merge_partition died casting inf
    to int64. Null order values route to the cold path, whose pandas
    reduce skips them."""
    import ray.data

    from connect_smts_ray.sinks.upsert import (
        UpsertConfig,
        read_lake,
        run_upsert,
    )

    cfg = UpsertConfig(lake_dir=str(tmp_path / "lake"), num_partitions=2,
                       key_columns=("k",), order_columns=("lsn", "off"))
    t = pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "lsn": pa.array([0, 1, 0], pa.int64()),
        "off": pa.array([10, None, 30], pa.int64()),
        "v": pa.array(["old", "new", "x"], pa.string()),
        "is_tombstone": pa.array([False] * 3, pa.bool_()),
    })
    run_upsert(ray.data.from_arrow(t), cfg, epoch=0).materialize()
    got = {r["k"]: r["v"] for r in read_lake(cfg).to_pylist()}
    assert got[2] == "x" and 1 in got


def test_union_arrow_types_null_is_bottom(ray_session):
    """pa.null() unions to the other side (all-null ExpandJson block /
    delta), and _align_schemas casts the null column to the target."""
    from connect_smts_ray.core.schema import union_arrow_types
    from connect_smts_ray.sinks.upsert import _align_schemas

    assert union_arrow_types(pa.null(), pa.string()) == pa.string()
    assert union_arrow_types(pa.int64(), pa.null()) == pa.int64()
    a = pa.table({"c": pa.array([None, None])})  # null-typed
    b = pa.table({"c": pa.array(["x"], pa.string())})
    out = _align_schemas([a, b])
    assert all(t.schema.field("c").type == pa.string() for t in out)


def test_split_preserves_table_meta(ray_session, tmp_path):
    """Review repro: split_partitions overwrote _table.json wholesale,
    destroying tags/branches/vacuum horizons. It must UPDATE the meta."""
    import ray.data

    from connect_smts_ray.sinks.branch import create_branch, list_branches
    from connect_smts_ray.sinks.manifest import create_tag, list_tags
    from connect_smts_ray.sinks.upsert import (
        UpsertConfig,
        run_upsert,
        split_partitions,
    )

    cfg = UpsertConfig(lake_dir=str(tmp_path / "lake"), num_partitions=2,
                       key_columns=("k",), order_columns=("lsn",),
                       tombstone_column="dead")
    t = pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "lsn": pa.array([0, 0, 0], pa.int64()),
        "v": pa.array(["a", "b", "c"], pa.string()),
        "dead": pa.array([False] * 3, pa.bool_()),
    })
    run_upsert(ray.data.from_arrow(t), cfg, epoch=0).materialize()
    create_tag(cfg.store(), "v1", as_of=0)
    create_branch(cfg, "wip", at=0)
    new_cfg = split_partitions(cfg, factor=2)
    assert new_cfg.num_partitions == 4
    assert "v1" in list_tags(cfg.store())
    assert "wip" in list_branches(cfg)
    # table schema survives too
    resolved = UpsertConfig(lake_dir=cfg.lake_dir).resolve()
    assert resolved.key_columns == ("k",)
    assert resolved.tombstone_column == "dead"


def test_run_until_starts_above_replayed_epochs(ray_session, tmp_path,
                                                sf_dir):
    """Review repro: run_until's ledger-only epoch numbering collided
    with epochs a prior replay() committed, and the idempotence gate
    silently no-opped the new file's data. The ledger pins a base_epoch
    above the store's max on first write."""
    import json
    import os

    import pyarrow.parquet as pq2

    from connect_smts_ray.pipelines.replay import (
        ReplayConfig,
        final_state,
        replay,
        run_until,
    )

    lake = str(tmp_path / "lake")
    cfg = ReplayConfig(sf_dir=sf_dir, lake_dir=lake, events_per_key=4,
                       num_partitions=4, epochs=2, expand_concurrency=2,
                       crypto_concurrency=2)
    replay(cfg, fresh=True)  # commits epochs 0..1, no ledger
    before = final_state(cfg).num_rows

    # a new documents-shaped file with brand-new keys arrives via the
    # tailer (run_until reads documents parquet, not corpus tables)
    watch = tmp_path / "watch"
    watch.mkdir()
    docs = pq2.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text", "lang", "source"])
    extra = docs.slice(0, 5)
    extra = extra.set_column(
        extra.column_names.index("source"),
        "source",
        pa.array(["tail-repo"] * extra.num_rows, pa.string()))
    pq2.write_table(extra, str(watch / "f0.parquet"))
    run_until(cfg, str(watch), max_batches=1)

    ledger = json.load(open(os.path.join(lake, "_INGEST_LEDGER.json")))
    assert ledger["base_epoch"] == 2  # above the replayed epochs
    assert ledger["files"]["f0.parquet"] == 2
    after = final_state(cfg)
    assert after.num_rows > before  # the file's data actually landed
    repos = set(after.column("repo").to_pylist())
    assert "tail-repo" in repos


def test_exact_dedup_null_text_both_paths(ray_session):
    """Review repro: null text hashed to None — the broadcast dict
    grouped the nulls (SQL GROUP BY semantics) while the join kernels'
    null-matches-nothing kept them all, so strategy='auto' flipped the
    survivor set with corpus size. The __null__ sentinel makes both
    paths group null text identically."""
    import ray.data

    from connect_smts_ray.ops.dedup import exact_dedup

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([None, None, "x", "x"], pa.string()),
    })
    for strategy in ("broadcast", "join"):
        out = exact_dedup(ray.data.from_arrow(t), strategy=strategy)
        ids = sorted(r["doc_id"] for r in out.take_all())
        assert ids == [1, 3], strategy  # min-id per group, nulls grouped


def test_incremental_dedup_keeps_null_text(ray_session, tmp_path):
    """Review repro: the survivors inner join on a None content_hash
    dropped null-text rows outright (permanent data loss). With the
    sentinel they dedupe like any other group instead of vanishing."""
    import ray.data

    from connect_smts_ray.ops.dedup import incremental_exact_dedup

    t = pa.table({
        "doc_id": pa.array([7, 8], pa.int64()),
        "text": pa.array([None, "real"], pa.string()),
    })
    out = incremental_exact_dedup(
        ray.data.from_arrow(t), state_dir=str(tmp_path))
    ids = sorted(r["doc_id"] for r in out.take_all())
    assert ids == [7, 8]  # the null-text doc survives (first of its group)

    # second epoch: another null-text doc is now a duplicate of epoch 0's
    t2 = pa.table({
        "doc_id": pa.array([9], pa.int64()),
        "text": pa.array([None], pa.string()),
    })
    out2 = incremental_exact_dedup(
        ray.data.from_arrow(t2), state_dir=str(tmp_path))
    assert [r["doc_id"] for r in out2.take_all()] == []


def test_knn_empty_block_guard(ray_session):
    """Review repro: an empty block made vectors_to_numpy return (0,0)
    and the query matmul raise a dimension mismatch."""
    import ray.data

    from connect_smts_ray.ops.similarity import knn_brute_force

    t = pa.table({
        "vec_id": pa.array([1, 2], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                              pa.list_(pa.float64())),
    })
    # repartition past the row count forces empty blocks through the map
    ds = ray.data.from_arrow(t).repartition(6)
    res = knn_brute_force(ds, np.array([[1.0, 0.0]]), k=1)
    assert res.column("neighbor_id").to_pylist() == [1]


def test_ngram_join_counts_survive_block_splits(ray_session):
    """Review repro: per-block gram counts were never re-aggregated, so
    a doc whose gram rows straddle a block boundary yielded duplicate
    join rows with undersized n and inflated jaccard. Forcing many tiny
    blocks through the gram table must not change the result."""
    import ray.data

    from connect_smts_ray.ops.similarity import ngram_similarity_join

    left = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["a b c d e f g h i j k l m n o p"], pa.string()),
    })
    right = pa.table({
        "doc_id": pa.array([2], pa.int64()),
        "text": pa.array(["a b c d e f g h i j k l m n o q"], pa.string()),
    })
    out = ngram_similarity_join(
        ray.data.from_arrow(left).repartition(4),
        ray.data.from_arrow(right).repartition(4),
        n=3, threshold=0.5)
    rows = out.take_all()
    assert len(rows) == 1  # exactly ONE pair row, not per-partial dups
    # 16 words -> 14 trigrams per doc; 13 shared -> j = 13/15
    assert rows[0]["jaccard"] == pytest.approx(13 / 15)


def test_scd2_history_ns_timestamps(ray_session):
    """scd2_history on a timestamp[ns] column (the pandas default) must
    return the SAME wall-clock validity intervals as a timestamp[us]
    column — pre-fix the µs int64s were reinterpreted in the input
    column's native unit, shrinking every interval 1000×."""
    import ray.data

    from connect_smts_ray.ops.relational import scd2_history

    us = [1_700_000_000_000_000, 1_700_000_060_000_000]

    def run(unit, scale):
        t = pa.table({
            "k": pa.array([1, 1], pa.int64()),
            "v": pa.array(["a", "b"], pa.string()),
            "ts": pa.array([u * scale for u in us],
                           pa.timestamp(unit)),
            "lsn": pa.array([1, 2], pa.int64()),
        })
        out = scd2_history(ray.data.from_arrow(t), "k", "ts", "lsn",
                           "v").take_all()
        return sorted(out, key=lambda r: r["valid_from"])

    got_us = run("us", 1)
    got_ns = run("ns", 1000)
    for a, b in zip(got_us, got_ns):
        # both render to the same wall-clock datetimes
        assert pd.Timestamp(a["valid_from"]) == pd.Timestamp(b["valid_from"])
    assert pd.Timestamp(got_ns[0]["valid_from"]).year == 2023  # not 1970
    assert pd.Timestamp(got_ns[0]["valid_to"]) == \
        pd.Timestamp(got_ns[1]["valid_from"])


def test_attribution_null_value_conversion(ray_session):
    """A conversion row with a NULL value must contribute 0 cents (SQL
    sum() skips NULLs) — pre-fix NaN.astype(int64) injected INT64_MIN
    into the credited touch's value_cents sum."""
    import ray.data

    from connect_smts_ray.ops.relational import last_touch_attribution

    t = pa.table({
        "u": pa.array([1, 1, 2, 2], pa.int64()),
        "et": pa.array(["ad", "purchase", "ad", "purchase"], pa.string()),
        "ts": pa.array([1_000_000, 2_000_000, 1_000_000, 2_000_000],
                       pa.timestamp("us")),
        "lsn": pa.array([1, 2, 3, 4], pa.int64()),
        "value": pa.array([None, None, None, 2.5], pa.float64()),
    })
    out = {r["touch_type"]: (r["n_conversions"], r["value_cents"])
           for r in last_touch_attribution(
               ray.data.from_arrow(t), key_col="u", ts_col="ts",
               tiebreak_col="lsn", type_col="et", value_col="value",
               touch_types=["ad"], convert_type="purchase",
               window_us=3_600_000_000).take_all()}
    assert out["ad"] == (2, 250)  # NULL conversion counted, 0 cents


def test_cohort_retention_string_user_ids(ray_session):
    """String user ids flow through cohort_retention (pre-fix a hard
    pc.cast(user, int64) raised ArrowInvalid on every map task)."""
    import ray.data

    from connect_smts_ray.ops.relational import cohort_retention

    week = 7 * 86_400_000_000
    t = pa.table({
        "user_id": pa.array(["u_a", "u_a", "u_b"], pa.string()),
        "ts": pa.array([0, week, 0], pa.timestamp("us")),
    })
    out = {(r["cohort_period"], r["period_offset"]): r["n_users"]
           for r in cohort_retention(ray.data.from_arrow(t), "user_id",
                                     "ts").take_all()}
    assert out[(0, 0)] == 2
    assert out[(0, 1)] == 1


def test_auto_join_broadcast_preserves_nullable_int64(ray_session):
    """auto_join's broadcast path must keep a nullable int64 right column
    as int64 (pre-fix the right.to_pandas() round-trip degraded it to
    float64, flipping output dtype versus the hash path and rounding
    values above 2^53)."""
    import ray.data

    from connect_smts_ray.ops.relational import auto_join

    big = (1 << 60) + 1  # not exactly representable in float64
    left = pa.table({"k": pa.array([1, 2], pa.int64())})
    right = pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "payload": pa.array([big, None], pa.int64()),
    })
    out = auto_join(ray.data.from_arrow(left),
                    ray.data.from_arrow(right), on="k")
    tbl = pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")])
    assert tbl.schema.field("payload").type == pa.int64()
    vals = {r["k"]: r["payload"] for r in tbl.to_pylist()}
    assert vals[1] == big
    assert vals[2] is None


def test_asof_broadcast_typed_null_misses(ray_session):
    """asof_join's broadcast path gathers right payloads with Arrow take:
    unmatched left rows carry TYPED int64 nulls, not float64 NaN (which
    made block dtypes differ from the partitioned path)."""
    import ray.data

    from connect_smts_ray.ops.relational import asof_join

    left = pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "ts": pa.array([100, 100], pa.int64()),
    })
    right = pa.table({
        "k2": pa.array([1], pa.int64()),
        "rts": pa.array([50], pa.int64()),
        "ival": pa.array([(1 << 60) + 1], pa.int64()),
    })
    out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    left_on="ts", right_on="rts",
                    left_by="k", right_by="k2")
    tbl = pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")])
    assert tbl.schema.field("ival").type == pa.int64()
    vals = {r["k"]: r["ival"] for r in tbl.to_pylist()}
    assert vals[1] == (1 << 60) + 1
    assert vals[2] is None


def test_temporal_join_expired_keeps_dtype(ray_session):
    """Gapped SCD2 history: the expiry mask must NULL dimension columns
    via Arrow if_else, keeping int64 columns int64 in EVERY batch —
    pre-fix pandas .loc assignment floated them only in batches that
    contained an expired match, yielding mixed block schemas."""
    import ray.data

    from connect_smts_ray.ops.relational import temporal_join

    dim = pa.table({
        "k": pa.array([7], pa.int64()),
        "valid_from": pa.array([0], pa.int64()),
        "valid_to": pa.array([100], pa.int64()),  # expires at 100
        "dim_payload": pa.array([42], pa.int64()),
    })
    fact = pa.table({
        "k": pa.array([7, 7], pa.int64()),
        "fts": pa.array([50, 200], pa.int64()),  # one live, one expired
    })
    out = temporal_join(ray.data.from_arrow(fact),
                        ray.data.from_arrow(dim),
                        fact_key="k", fact_ts="fts", dim_key="k")
    tbl = pa.concat_tables(
        [pa.table(b) for b in out.iter_batches(batch_format="pyarrow")])
    assert tbl.schema.field("dim_payload").type == pa.int64()
    vals = {r["fts"]: r["dim_payload"] for r in tbl.to_pylist()}
    assert vals[50] == 42
    assert vals[200] is None  # expired → typed null, dtype intact


def test_ols_trend_null_pairs(ray_session):
    """grouped_ols_trend drops incomplete (ts, value) pairs BEFORE the
    moments — pre-fix a NULL y row counted in n/Σx/Σx² while Arrow's
    null-skipping sum dropped it from Σy/Σxy, skewing the fit."""
    import ray.data

    from connect_smts_ray.ops.relational import grouped_ols_trend

    def mk(vals):
        return pa.table({
            "k": pa.array([1] * len(vals), pa.int64()),
            "ts": pa.array([i * 1_000_000 for i in range(len(vals))],
                           pa.timestamp("us")),
            "y": pa.array(vals, pa.int64()),
        })

    with_null = grouped_ols_trend(
        ray.data.from_arrow(mk([10, None, 30])), "k", "ts", "y").take_all()
    # x positions of the surviving pairs differ (0,2) vs (0,1), so compare
    # against the same two complete pairs, not a renumbered series
    assert with_null[0]["n"] == 2
    assert with_null[0]["slope"] == pytest.approx(10.0)  # 20 per 2 sec


def test_group_quantiles_ignores_nulls(ray_session):
    """quantile_disc semantics: NULL values are not CDF entries — q=1.0
    must return the max non-null value, and rank bases must not be
    inflated by null-count rows (pre-fix q=1.0 could return NULL)."""
    import ray.data

    from connect_smts_ray.ops.corpus import group_quantiles

    t = pa.table({
        "g": pa.array(["a", "a", "a"], pa.string()),
        "v": pa.array([1, 2, None], pa.int64()),
    })
    out = {(r["g"], r["q_pct"]): r["v"]
           for r in group_quantiles(ray.data.from_arrow(t), "g", "v",
                                    [0.5, 1.0]).take_all()}
    assert out[("a", 100)] == 2
    assert out[("a", 50)] == 1


def test_changelog_aggregate_group_col_in_key(ray_session):
    """Grouping a composite-keyed changelog by one of its OWN key
    components (key=(tenant,id), group=tenant) must work — pre-fix the
    post-fuse drop of key columns removed the group column and every
    bucket task raised KeyError."""
    import ray.data

    from connect_smts_ray.ops.ivm import changelog_aggregate

    t = pa.table({
        "tenant": pa.array(["t1", "t1", "t2"], pa.string()),
        "id": pa.array([1, 2, 1], pa.int64()),
        "lsn": pa.array([1, 2, 3], pa.int64()),
        "deleted": pa.array([False, False, False], pa.bool_()),
        "amount": pa.array([10, 20, 5], pa.int64()),
    })
    out = {r["group"]: (r["n_keys"], r["total"])
           for r in changelog_aggregate(
               ray.data.from_arrow(t), key_cols=["tenant", "id"],
               lsn_col="lsn", delete_col="deleted", group_col="tenant",
               measure_col="amount").take_all()}
    assert out["t1"] == (2, 30)
    assert out["t2"] == (1, 5)


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2 allows 0xFF fill bytes before any marker — both in
    the segment stream and inside the entropy stream before RSTn. The
    decoder must skip them, not truncate the scan (sixth review pass)."""
    from connect_smts_ray.ops.jpeg import decode_jpeg, encode_jpeg

    img = np.repeat(np.repeat(
        (2 * np.arange(12).reshape(3, 4) % 256).astype(np.uint8), 8, 0),
        8, 1)
    enc = encode_jpeg(img, restart_interval=1)

    # fill byte ahead of a header segment marker (DQT)
    dqt = enc.find(b"\xff\xdb")
    padded = enc[:dqt] + b"\xff" + enc[dqt:]
    assert np.array_equal(decode_jpeg(padded), img)

    # fill byte ahead of an in-scan restart marker
    rst = enc.find(b"\xff\xd0")
    assert rst != -1
    padded = enc[:rst] + b"\xff" + enc[rst:]
    assert np.array_equal(decode_jpeg(padded), img)


def test_jpeg_multiscan_rejected_not_grayscale():
    """A baseline file whose first SOS covers fewer components than the
    frame declares (non-interleaved multi-scan) must raise, not silently
    return the luma plane as grayscale (sixth review pass)."""
    from connect_smts_ray.ops.jpeg import decode_jpeg, encode_jpeg

    rgb = (np.arange(16 * 16 * 3).reshape(16, 16, 3) % 256).astype(np.uint8)
    enc = encode_jpeg(rgb)
    sos = enc.find(b"\xff\xda")
    assert sos != -1
    old_len = int.from_bytes(enc[sos + 2:sos + 4], "big")
    # rebuild the SOS to cover ONLY the first component of the three
    body = enc[sos + 4:sos + 2 + old_len]
    ns = body[0]
    assert ns == 3
    comp1 = body[1:3]
    spec = body[1 + 2 * ns:]
    new_body = bytes([1]) + comp1 + spec
    new_sos = b"\xff\xda" + (len(new_body) + 2).to_bytes(2, "big") + new_body
    patched = enc[:sos] + new_sos + enc[sos + 2 + old_len:]
    with pytest.raises(ValueError, match="multi-scan"):
        decode_jpeg(patched)


def test_y4m_frame_random_access_validates_truncation():
    """decode_y4m_frame must reject truncated FRAME headers / frame data
    like the full-decode path does, not return header bytes as pixels
    (sixth review pass)."""
    from connect_smts_ray.ops.multimodal import decode_y4m_frame, encode_y4m

    frames = (np.arange(2 * 2 * 3).reshape(2, 2, 3) % 256).astype(np.uint8)
    enc = encode_y4m(frames)
    with pytest.raises(ValueError, match="truncated Y4M frame data"):
        decode_y4m_frame(enc[:-3], 1)  # frame 1's data cut short
    second_frame = enc.rfind(b"FRAME")
    with pytest.raises(ValueError, match="truncated FRAME header"):
        decode_y4m_frame(enc[:second_frame + 5], 1)  # marker, no newline


def test_wav_zero_channels_raises_value_error():
    """A corrupt fmt chunk with n_channels=0 must raise ValueError, not
    ZeroDivisionError (sixth review pass)."""
    import struct

    from connect_smts_ray.ops.multimodal import decode_wav, encode_wav

    enc = bytearray(encode_wav(np.array([1, 2, 3], np.int16)))
    fmt_at = bytes(enc).find(b"fmt ") + 8
    enc[fmt_at + 2:fmt_at + 4] = struct.pack("<H", 0)  # n_channels := 0
    with pytest.raises(ValueError, match="n_channels=0"):
        decode_wav(bytes(enc))


def test_avro_uint64_overflow_raises_not_corrupts():
    """Avro 'long' is signed: a uint64 value >= 2^63 must raise at encode
    time, not silently round-trip as a negative number; representable
    uint64 values round-trip exactly (sixth review pass)."""
    from connect_smts_ray.sources.avro import decode_container, encode_container

    ok = pa.table({"v": pa.array([0, 5, 2**63 - 1], pa.uint64())})
    back = decode_container(encode_container(ok))
    assert back.column("v").to_pylist() == [0, 5, 2**63 - 1]

    bad = pa.table({"v": pa.array([2**63], pa.uint64())})
    with pytest.raises(pa.lib.ArrowInvalid):
        encode_container(bad)


def test_orc_avro_many_file_planning_distributed(ray_session, tmp_path):
    """Reading a directory with more than 8 part files exercises the
    chunked-Ray-task planning path (driver-stall review finding) and
    must return exactly the written rows."""
    import ray.data

    from connect_smts_ray.sources.avro import read_avro, write_avro
    from connect_smts_ray.sources.orc import read_orc, write_orc

    t = pa.table({"k": pa.array(range(120), pa.int64())})
    ds = ray.data.from_arrow(t).repartition(12)
    for write, read, sub in ((write_orc, read_orc, "orc"),
                             (write_avro, read_avro, "avro")):
        d = str(tmp_path / sub)
        paths = write(ds, d)
        assert paths.count() >= 9  # enough parts to hit the task path
        got = sorted(r["k"] for r in read(d).take_all())
        assert got == list(range(120))


def test_field_mapping_vacuous_config_raises():
    """A mapping config that produces no columns must raise, not emit a
    zero-row table that silently deletes the stream (seventh review
    pass)."""
    from connect_smts_ray.transforms.field_mapping import (
        FieldMappingConfig,
        apply_field_mapping,
    )

    batch = pa.table({"a": pa.array([1, 2], pa.int64())})
    with pytest.raises(ValueError, match="no columns"):
        apply_field_mapping(batch, FieldMappingConfig(mappings=()))
    with pytest.raises(ValueError, match="no columns"):
        apply_field_mapping(
            batch, FieldMappingConfig(mappings=(), keep=("missing",)))


def test_lookup_corrupt_sidecar_falls_back(ray_session, tmp_path):
    """A truncated/garbage .bloom.json sidecar must degrade to reading
    the data file (index is an optimization), not crash the lookup
    (seventh review pass)."""
    import glob as _glob

    import ray.data

    from connect_smts_ray.sinks.lookup import (
        _sidecar_path,
        build_bloom_sidecars,
        point_lookup,
    )
    from connect_smts_ray.sinks.upsert import UpsertConfig, run_upsert

    cfg = UpsertConfig(lake_dir=str(tmp_path / "lake"), num_partitions=2)
    t = pa.table({
        "repo": pa.array(["r"] * 4, pa.string()),
        "path": pa.array(list("abcd"), pa.string()),
        "commit_lsn": pa.array([1] * 4, pa.int64()),
        "source_offset": pa.array(range(4), pa.int64()),
        "is_tombstone": pa.array([False] * 4, pa.bool_()),
        "content": pa.array([c + "1" for c in "abcd"], pa.string()),
    })
    run_upsert(ray.data.from_arrow(t), cfg, epoch=0).materialize()
    build_bloom_sidecars(cfg)
    sides = [_sidecar_path(f) for f in _glob.glob(
        str(tmp_path / "lake") + "/**/*.parquet", recursive=True)]
    sides = [s for s in sides if os.path.exists(s)]
    assert sides
    for s in sides:  # corrupt every sidecar three different ways
        with open(s, "w") as fh:
            fh.write('{"bits": 64')  # truncated JSON
    keys = pa.table({"repo": pa.array(["r", "r"], pa.string()),
                     "path": pa.array(["a", "d"], pa.string())})
    got, stats = point_lookup(cfg, keys)
    assert sorted(got.column("path").to_pylist()) == ["a", "d"]
    assert stats["unindexed_files"] >= 1


def test_merge_delta_bytes_deterministic(ray_session, tmp_path):
    """merge_into's committed delta file must be byte-identical across
    source arrival orders (canonicalized like every other writer), so a
    speculative re-execution cannot swap in a byte-different file
    (seventh review pass)."""
    import hashlib as _hashlib

    import ray.data

    from connect_smts_ray.sinks.merge import merge_into
    from connect_smts_ray.sinks.upsert import UpsertConfig, run_upsert

    def target():
        return pa.table({
            "repo": pa.array(["r"] * 3, pa.string()),
            "path": pa.array(list("abc"), pa.string()),
            "commit_lsn": pa.array([0] * 3, pa.int64()),
            "source_offset": pa.array(range(3), pa.int64()),
            "is_tombstone": pa.array([False] * 3, pa.bool_()),
            "content": pa.array(["a0", "b0", "c0"], pa.string()),
        })

    # source WITHOUT order columns → all-tie sort inside the merge; rows
    # reversed between the two runs to vary arrival order
    src_rows = pa.table({
        "repo": pa.array(["r"] * 4, pa.string()),
        "path": pa.array(["a", "b", "x", "y"], pa.string()),
        "content": pa.array(["a9", "b9", "x9", "y9"], pa.string()),
    })

    hashes = []
    for tag, tbl in (("fwd", src_rows),
                     ("rev", src_rows.take(pa.array([3, 2, 1, 0])))):
        cfg = UpsertConfig(lake_dir=str(tmp_path / f"lake-{tag}"),
                           num_partitions=2)
        run_upsert(ray.data.from_arrow(target()), cfg, epoch=0).materialize()
        merge_into(ray.data.from_arrow(tbl), cfg, merge_lsn=7,
                   epoch=1).to_pandas()
        store = cfg.resolve().store()
        per_pid = {}
        for pid in range(2):
            p = store.state_path(pid, 1)
            if os.path.exists(p):
                per_pid[pid] = _hashlib.sha256(
                    open(p, "rb").read()).hexdigest()
        hashes.append(per_pid)
    assert hashes[0] == hashes[1] and hashes[0]


def test_cli_read_refuses_nonempty_out(ray_session, tmp_path):
    """Rerunning `read` into a non-empty --out must fail loudly (Ray's
    write_parquet would otherwise accumulate both runs' files and
    double-count rows); --overwrite clears and rewrites (seventh review
    pass)."""
    import argparse

    import pyarrow.dataset as pads
    import ray.data

    from connect_smts_ray.__main__ import cmd_read
    from connect_smts_ray.sinks.upsert import UpsertConfig, run_upsert

    cfg = UpsertConfig(lake_dir=str(tmp_path / "lake"), num_partitions=2)
    t = pa.table({
        "repo": pa.array(["r"] * 3, pa.string()),
        "path": pa.array(list("abc"), pa.string()),
        "commit_lsn": pa.array([1] * 3, pa.int64()),
        "source_offset": pa.array(range(3), pa.int64()),
        "is_tombstone": pa.array([False] * 3, pa.bool_()),
        "content": pa.array(["a1", "b1", "c1"], pa.string()),
    })
    run_upsert(ray.data.from_arrow(t), cfg, epoch=0).materialize()

    out = str(tmp_path / "state")
    ns = argparse.Namespace(lake_dir=cfg.lake_dir, out=out, as_of=None,
                            tag=None, branch=None, overwrite=False)
    assert cmd_read(ns)["rows"] == 3
    with pytest.raises(SystemExit, match="not empty"):
        cmd_read(ns)
    ns.overwrite = True
    assert cmd_read(ns)["rows"] == 3
    assert pads.dataset(out).count_rows() == 3


def test_expand_json_single_parse_on_fast_path_miss():
    """A fast-path miss must NOT re-parse payloads the vectorized pass
    already decoded — one orjson.loads per row, not two (seventh review
    pass)."""
    import connect_smts_ray.transforms.expand_json as ej
    from connect_smts_ray.core.schema import SType, stype_to_dict
    from connect_smts_ray.transforms.expand_json import (
        ExpandJson,
        ExpandJsonConfig,
    )

    boot = SType("struct", name="j",
                 fields=(("a", SType("int32", optional=True)),))
    ex = ExpandJson(ExpandJsonConfig(
        columns=("j",), bootstrap_schemas={"j": [stype_to_dict(boot)]}))

    calls = {"n": 0}
    real = ej.orjson

    class CountingOrjson:
        JSONDecodeError = real.JSONDecodeError
        dumps = staticmethod(real.dumps)

        @staticmethod
        def loads(s):
            calls["n"] += 1
            return real.loads(s)

    ej.orjson = CountingOrjson
    try:
        # last row has a NEW field → slot-0 checker miss → row-wise path
        batch = pa.table({"j": pa.array(
            ['{"a":1}', '{"a":2}', '{"a":3,"zz":"new"}'], pa.string())})
        out = ex(batch)
    finally:
        ej.orjson = real
    assert calls["n"] == 3  # one parse per row, no second full pass
    assert out.num_rows == 3


def test_bucket_of_null_independent(ray_session):
    """The SAME int key must land in the SAME join bucket whether or not
    its batch carries a null (to_pandas float64 coercion changed the
    hashed bits — ninth review pass, silent join misses)."""
    from connect_smts_ray.ops.components import _bucket_of

    clean = pa.chunked_array([pa.array([5, 7, 123456789], pa.int64())])
    nully = pa.chunked_array([pa.array([5, None, 7, 123456789], pa.int64())])
    b_clean = _bucket_of(clean, 16).to_pylist()
    b_nully = _bucket_of(nully, 16).to_pylist()
    assert b_clean[0] == b_nully[0]   # 5
    assert b_clean[1] == b_nully[2]   # 7
    assert b_clean[2] == b_nully[3]   # 123456789


def test_hash_join_nulls_uneven_across_blocks(ray_session):
    """End-to-end: matches survive when one side's blocks mix null and
    null-free layouts of the same int key (ninth review pass)."""
    import ray.data

    from connect_smts_ray.ops.components import hash_join

    lt1 = pa.table({"k": pa.array([5, 7], pa.int64()),
                    "l": pa.array(["a", "b"], pa.string())})
    lt2 = pa.table({"k": pa.array([9, None], pa.int64()),
                    "l": pa.array(["c", "d"], pa.string())})
    rt = pa.table({"k": pa.array([5, 7, 9], pa.int64()),
                   "r": pa.array(["x", "y", "z"], pa.string())})
    left = ray.data.from_arrow([lt1, lt2])
    right = ray.data.from_arrow(rt)
    out = hash_join(left, right, left_on="k", right_on="k", how="inner",
                    num_partitions=4).take_all()
    assert sorted((r["k"], r["r"]) for r in out) == \
        [(5, "x"), (7, "y"), (9, "z")]


def test_bloom_no_false_negative_with_nulls(ray_session):
    """A bloom built over null-free int blocks must still claim presence
    for the same values probed from a null-carrying array ('5' vs '5.0'
    rendering split — ninth review pass)."""
    import ray.data

    from connect_smts_ray.ops.components import (
        bloom_build,
        bloom_maybe_contains,
    )

    vals = list(range(100))
    ds = ray.data.from_arrow(pa.table({"k": pa.array(vals, pa.int64())}))
    bm = bloom_build(ds, "k", bits=1 << 12, k=4)
    probe = pa.array([5, None, 42, 99, 100000], pa.int64())
    mask = bloom_maybe_contains(probe, bm, bits=1 << 12, k=4)
    assert mask[0] and mask[2] and mask[3]  # present values: NEVER negative
    # and the reverse: build WITH nulls, probe clean
    ds2 = ray.data.from_arrow(pa.table({
        "k": pa.array(vals + [None], pa.int64())}))
    bm2 = bloom_build(ds2, "k", bits=1 << 12, k=4)
    mask2 = bloom_maybe_contains(pa.array([5, 42], pa.int64()), bm2,
                                 bits=1 << 12, k=4)
    assert mask2.all()


def test_gather_join_big_int_ids_exact(ray_session):
    """The list-payload join path must not collapse 64-bit ids above 2^53
    through float64 (ninth review pass): adjacent huge ids join exactly."""
    import ray.data

    from connect_smts_ray.ops.components import hash_join

    base = 2**60
    lt = pa.table({
        "k": pa.array([base, base + 1, None], pa.int64()),
        "emb": pa.array([[1.0], [2.0], [3.0]], pa.list_(pa.float64())),
    })
    rt = pa.table({"k": pa.array([base + 1], pa.int64()),
                   "tag": pa.array(["hit"], pa.string())})
    out = hash_join(ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                    left_on="k", right_on="k", how="inner",
                    num_partitions=2).take_all()
    assert len(out) == 1 and out[0]["k"] == base + 1


def test_export_shards_null_ids_and_string_rejection(ray_session, tmp_path):
    """Null ids must not crash the shard summary (Arrow kernels skip
    them); a string id_col raises a clear error instead of a numpy
    concat crash (ninth review pass)."""
    import ray.data

    from connect_smts_ray.ops.export import export_shards

    t = pa.table({"doc_id": pa.array([1, 2, None, 4], pa.int64()),
                  "x": pa.array(list("abcd"), pa.string())})
    out = export_shards(ray.data.from_arrow(t), str(tmp_path / "e1"),
                        id_col="doc_id", num_shards=2).take_all()
    assert sum(r["n_rows"] for r in out) == 4
    assert sum(r["sum_id"] for r in out) == 7  # nulls skipped

    t2 = pa.table({"doc_id": pa.array(["a", "b"], pa.string()),
                   "x": pa.array([1, 2], pa.int64())})
    with pytest.raises(Exception, match="integer column"):
        export_shards(ray.data.from_arrow(t2), str(tmp_path / "e2"),
                      id_col="doc_id", num_shards=2).take_all()


def test_with_dlq_empty_batch_no_raise(tmp_path):
    """A 0-row batch through a DLQ-wrapped transform that cannot handle
    empty input must return empty, not raise 'every row failed' (ninth
    review pass)."""
    from connect_smts_ray.transforms.dlq import with_dlq

    def fussy(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            raise ValueError("cannot handle empty input")
        return b

    wrapped = with_dlq(fussy, str(tmp_path / "dlq"), stage="s")
    out = wrapped(pa.table({"a": pa.array([], pa.int64())}))
    assert out.num_rows == 0
    # and real rows still flow after the empty block
    out2 = wrapped(pa.table({"a": pa.array([1, 2], pa.int64())}))
    assert out2.num_rows == 2


def test_replay_dlq_stage_filter(ray_session, tmp_path):
    """replay_dlq(from_stage=...) drains only the named stage's dead rows
    when one DLQ directory serves several stages (ninth review pass)."""
    from connect_smts_ray.transforms.dlq import replay_dlq, with_dlq

    d = str(tmp_path / "dlq")

    def fail_all(b: pa.Table) -> pa.Table:
        if b.num_rows:
            raise ValueError("boom")
        return b

    # stage A dead rows have column 'a'; stage B rows have column 'b'
    with_dlq(fail_all, d, stage="A")(
        pa.table({"a": pa.array([1, 2], pa.int64())}))
    with_dlq(fail_all, d, stage="B")(
        pa.table({"b": pa.array(["x"], pa.string())}))

    healed = replay_dlq(
        d, lambda b: b, schema=pa.schema([("a", pa.int64())]),
        repair=lambda r: r, from_stage="A",
    ).take_all()
    assert sorted(r["a"] for r in healed) == [1, 2]


def test_cli_read_overwrite_preserves_old_on_failure(ray_session, tmp_path):
    """--overwrite must not destroy the previous export when the new read
    FAILS (typo'd tag): the new state writes to a scratch dir and swaps
    in only on success (review of the round-5 diff)."""
    import argparse

    from connect_smts_ray.__main__ import cmd_read
    from connect_smts_ray.sinks.upsert import UpsertConfig, run_upsert

    import ray.data

    cfg = UpsertConfig(lake_dir=str(tmp_path / "lake"), num_partitions=2)
    t = pa.table({
        "repo": pa.array(["r"] * 2, pa.string()),
        "path": pa.array(["a", "b"], pa.string()),
        "commit_lsn": pa.array([1, 1], pa.int64()),
        "source_offset": pa.array([0, 1], pa.int64()),
        "is_tombstone": pa.array([False, False], pa.bool_()),
        "content": pa.array(["a1", "b1"], pa.string()),
    })
    run_upsert(ray.data.from_arrow(t), cfg, epoch=0).materialize()
    out = str(tmp_path / "state")
    ns = argparse.Namespace(lake_dir=cfg.lake_dir, out=out, as_of=None,
                            tag=None, branch=None, overwrite=False)
    assert cmd_read(ns)["rows"] == 2
    before = sorted(os.listdir(out))

    ns.tag, ns.overwrite = "no-such-tag", True
    with pytest.raises(Exception):
        cmd_read(ns)
    assert sorted(os.listdir(out)) == before  # old export untouched
    leftovers = [d for d in os.listdir(tmp_path) if ".tmp-" in d]
    assert not leftovers

    ns.tag = None
    assert cmd_read(ns)["rows"] == 2  # successful overwrite still works


def test_bloom_accepts_numpy_and_nan_consistency(ray_session):
    """bloom_maybe_contains accepts numpy arrays (pre-round-5 behavior
    restored), and a float NaN probed via pandas matches one built via
    Arrow (no null-vs-'nan' rendering split)."""
    import ray.data

    from connect_smts_ray.ops.components import (
        bloom_build,
        bloom_maybe_contains,
    )

    ds = ray.data.from_arrow(pa.table({
        "k": pa.array([1.5, float("nan"), 7.25], pa.float64())}))
    bm = bloom_build(ds, "k", bits=1 << 12, k=4)
    assert bloom_maybe_contains(np.array([1.5, 7.25]), bm,
                                bits=1 << 12, k=4).all()
    assert bloom_maybe_contains(pd.Series([float("nan")]), bm,
                                bits=1 << 12, k=4).all()
