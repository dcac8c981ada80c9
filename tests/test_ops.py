"""Ops-layer tests: dedup families, similarity search, text analysis,
multimodal plumbing, relational helpers."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture()
def docs_with_dups(ray_session):
    import ray.data

    base = [
        "the quick brown fox jumps over the lazy dog and runs far away",
        "a completely different document about ray data pipelines and arrow",
        "numbers and words mixed together in a fairly unique ordering here",
    ]
    texts = [
        base[0],
        base[0],  # exact dup of 0
        base[0].replace("lazy", "sleepy"),  # near dup of 0
        base[1],
        base[2],
        base[1] + " with a tiny suffix appended",  # near dup of 3
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    return ray.data.from_arrow(t)


def test_exact_dedup(docs_with_dups):
    from connect_smts_ray.ops.dedup import exact_dedup

    out = exact_dedup(docs_with_dups).take_all()
    ids = sorted(r["doc_id"] for r in out)
    assert 0 in ids and 1 not in ids  # min-id survivor kept
    assert len(ids) == 5


def test_minhash_dedup(docs_with_dups):
    from connect_smts_ray.ops.dedup import MinHashConfig, minhash_dedup

    # bands=32 (2 rows/band): the fixture's near-dup pair sits at Jaccard
    # ≈0.57, right at the threshold — 4-row bands give only ~83% LSH recall
    # there (hash-seed luck), while 2-row bands are >99.99%. The threshold
    # 0.5 verify stage still adjudicates every candidate exactly.
    survivors, labels = minhash_dedup(
        docs_with_dups,
        MinHashConfig(num_perm=64, bands=32, jaccard_threshold=0.5),
    )
    ids = sorted(r["doc_id"] for r in survivors.take_all())
    assert 1 not in ids            # exact dup collapsed
    assert 2 not in ids            # near dup collapsed
    assert 0 in ids and 3 in ids and 4 in ids
    comp = {r["doc_id"]: r["component"] for r in labels.take_all()}
    assert comp[1] == 0 and comp[2] == 0


def test_ngram_jaccard_values():
    from connect_smts_ray.ops.dedup import ngram_jaccard

    assert ngram_jaccard("a b c d", "a b c d") == 1.0
    assert ngram_jaccard("a b c d", "x y z w") == 0.0
    mid = ngram_jaccard("a b c d e", "a b c d x")
    assert 0.0 < mid < 1.0


def test_simhash_dedup(docs_with_dups):
    from connect_smts_ray.ops.dedup import simhash_dedup

    survivors, _labels = simhash_dedup(docs_with_dups, max_hamming=6)
    ids = sorted(r["doc_id"] for r in survivors.take_all())
    assert 1 not in ids  # exact dup always hamming 0
    assert 0 in ids


def test_union_find():
    from connect_smts_ray.ops.dedup import union_find_components

    comp = union_find_components([(1, 2), (2, 3), (5, 6)])
    assert comp[1] == 1 or 1 not in comp  # rep maps to min id
    assert comp[2] == 1 and comp[3] == 1
    assert comp[6] == 5


def test_embedding_dedup(ray_session):
    import ray.data
    from connect_smts_ray.ops.dedup import embedding_dedup

    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(20, 8)).astype(np.float32)
    vecs[5] = vecs[0] * 1.001          # near-dup pair
    vecs[11] = vecs[7] + 1e-4          # near-dup pair
    t = pa.table({
        "vec_id": pa.array(range(20), type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    survivors, _labels = embedding_dedup(
        ray.data.from_arrow(t), threshold=0.999, n_planes=8
    )
    ids = {r["vec_id"] for r in survivors.take_all()}
    assert 5 not in ids and 0 in ids
    assert 11 not in ids and 7 in ids


def test_knn_brute_force(ray_session):
    import ray.data
    from connect_smts_ray.ops.similarity import knn_brute_force

    rng = np.random.RandomState(11)
    vecs = rng.normal(size=(100, 16))
    t = pa.table({
        "vec_id": pa.array(range(100), type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t)
    q = np.asarray(pa.Table.from_arrays(
        [t.column("embedding")], names=["e"]
    ).column("e").to_pylist()[:3], dtype=np.float64)
    out = knn_brute_force(ds, q, k=5, query_ids=[0, 1, 2])
    df = out.to_pandas()
    # each query's rank-0 neighbor is itself (cosine 1.0)
    top = df[df["rank"] == 0].set_index("query_id")["neighbor_id"]
    assert top[0] == 0 and top[1] == 1 and top[2] == 2
    assert (df.groupby("query_id").size() == 5).all()
    # exact: matches a numpy oracle
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = unit[:3] @ unit.T
    for qi in range(3):
        want = list(np.lexsort((np.arange(100), -sims[qi]))[:5])
        got = list(df[df["query_id"] == qi].sort_values("rank")["neighbor_id"])
        assert got == want


def test_knn_grouped_merge_matches_driver_merge(ray_session):
    """The scale path (grouped shuffle per query) must equal the driver
    merge bit-for-bit, including score ties and exclude_self."""
    import ray.data
    from connect_smts_ray.ops.similarity import knn_brute_force

    rng = np.random.RandomState(7)
    vecs = rng.normal(size=(120, 8))
    vecs[40] = vecs[3]  # force an exact score tie
    t = pa.table({
        "vec_id": pa.array(range(120), type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    q = np.asarray(t.column("embedding").to_pylist()[:6], dtype=np.float64)
    for excl in (False, True):
        a = knn_brute_force(
            ray.data.from_arrow(t), q, k=5, query_ids=list(range(6)),
            exclude_self=excl, merge="driver",
        ).to_pandas()
        b = knn_brute_force(
            ray.data.from_arrow(t), q, k=5, query_ids=list(range(6)),
            exclude_self=excl, merge="grouped",
        ).to_pandas()
        a = a.sort_values(["query_id", "rank"]).reset_index(drop=True)
        b = b.sort_values(["query_id", "rank"]).reset_index(drop=True)
        assert a.equals(b), (excl, a.compare(b))


def test_knn_ivf_recall(ray_session):
    import ray.data
    from connect_smts_ray.ops.similarity import IvfConfig, knn_brute_force, knn_ivf

    rng = np.random.RandomState(4)
    vecs = rng.normal(size=(300, 12))
    t = pa.table({
        "vec_id": pa.array(range(300), type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t)
    q = vecs[:5]
    exact = knn_brute_force(ds, q, k=10).to_pandas()
    approx = knn_ivf(ds, q, k=10, cfg=IvfConfig(n_centroids=8, n_probe=4)).to_pandas()
    recalls = []
    for qi in range(5):
        e = set(exact[exact["query_id"] == qi]["neighbor_id"])
        a = set(approx[approx["query_id"] == qi]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5  # probing 4/8 buckets


def test_text_stages(ray_session, sf_dir):
    import ray.data
    from connect_smts_ray.ops.text import LangId, QualityScore, add_fingerprint, add_token_count

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    out = (
        ds.map_batches(add_token_count, batch_format="pyarrow")
        .map_batches(add_fingerprint, batch_format="pyarrow")
        .map_batches(LangId, batch_format="pyarrow", concurrency=1, num_cpus=0.5)
        .map_batches(QualityScore, batch_format="pyarrow", concurrency=1, num_cpus=0.5)
    )
    rows = out.take(20)
    for r in rows:
        assert r["n_tokens"] == len(r["text"].split())
        assert len(r["fingerprint"]) == 32
        assert r["lang_pred"] in ("en", "es", "fr", "de")
        assert 0.0 <= r["quality"] <= 1.0


def test_multimodal_plumbing(ray_session):
    import ray.data
    from connect_smts_ray.ops.multimodal import (
        DecodeConfig,
        DecodeMedia,
        FrameSample,
        synthesize_media_table,
    )

    t = synthesize_media_table(32)
    ds = ray.data.from_arrow(t)
    feats = ds.map_batches(
        DecodeMedia,
        fn_constructor_kwargs={"config": DecodeConfig(fake=True)},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=1,
        num_cpus=0.5,
    )
    rows = feats.take(5)
    assert all(len(r["features"]) == 32 for r in rows)
    # deterministic: same payload → same features
    again = ds.map_batches(
        DecodeMedia,
        fn_constructor_kwargs={"config": DecodeConfig(fake=True)},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=1,
        num_cpus=0.5,
    ).take(5)
    assert [r["features"] for r in rows] == [r["features"] for r in again]

    frames = ds.map_batches(
        FrameSample,
        fn_constructor_kwargs={"n_frames": 4},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=1,
        num_cpus=0.5,
    )
    assert frames.count() == 32 * 4

    with pytest.raises(Exception):
        DecodeMedia(DecodeConfig(fake=False))(t.slice(0, 2))


def test_broadcast_join(ray_session, sf_dir):
    import pandas as pd
    import ray.data
    from connect_smts_ray.ops.relational import broadcast_join

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet")
    customer = pd.read_parquet(f"{sf_dir}/customer.parquet")[
        ["c_custkey", "c_mktsegment"]
    ].rename(columns={"c_custkey": "o_custkey"})
    joined = broadcast_join(orders, customer, on="o_custkey")
    rows = joined.take(10)
    assert all("c_mktsegment" in r for r in rows)
    assert joined.count() == orders.count()  # all orders have customers


def test_tumbling_window(ray_session, sf_dir):
    import duckdb
    import ray.data
    from connect_smts_ray.ops.relational import tumbling_window

    events = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    out = tumbling_window(
        events, ts_col="ts", width_seconds=3600, key_cols=["user_id"],
        aggs={"n_events": ("event_id", "count"), "sum_value": ("value", "sum")},
    ).to_pandas()
    want = duckdb.sql(
        f"""
        SELECT user_id,
               epoch_us(date_trunc('hour', ts)) AS window_start,
               count(*) AS n_events, sum(value) AS sum_value
        FROM '{sf_dir}/events.parquet'
        GROUP BY 1, 2
        """
    ).df()
    got = out.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    want = want.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["n_events"].values == want["n_events"].values).all()
    assert np.allclose(got["sum_value"].values, want["sum_value"].values)


def test_jaccard_dedup(docs_with_dups):
    from connect_smts_ray.ops.dedup import jaccard_dedup

    survivors, _labels = jaccard_dedup(docs_with_dups, threshold=0.5)
    ids = sorted(r["doc_id"] for r in survivors.take_all())
    # near-dups of doc 0 (ids 1, 2) and of doc 3 (id 5) collapse; min id wins
    assert 0 in ids and 3 in ids and 4 in ids
    assert 1 not in ids and 2 not in ids and 5 not in ids


def test_topk(ray_session):
    import ray.data
    from connect_smts_ray.ops.relational import topk

    t = pa.table({
        "id": pa.array(range(100), type=pa.int64()),
        "score": pa.array([(i * 37) % 50 for i in range(100)], type=pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(7)
    out = topk(ds, by="score", k=10, descending=True,
               tiebreak=("id", True)).take_all()
    want = sorted(
        ({"id": i, "score": (i * 37) % 50} for i in range(100)),
        key=lambda r: (-r["score"], r["id"]),
    )[:10]
    assert [r["id"] for r in out] == [r["id"] for r in want]
    assert [r["score"] for r in out] == [r["score"] for r in want]


def test_label_propagation_matches_union_find(ray_session):
    import ray.data
    from connect_smts_ray.ops.dedup import (
        label_propagation,
        union_find_components,
    )

    # two chains and a triangle: {1-2-3-4}, {10-11}, {20-21-22 triangle}
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)]
    t = pa.table({
        "id_a": pa.array([a for a, _ in pairs], type=pa.int64()),
        "id_b": pa.array([b for _, b in pairs], type=pa.int64()),
    })
    want = union_find_components(pairs)
    # distributed iterative path (forced: driver_edge_limit=0)
    out = label_propagation(
        ray.data.from_arrow(t), max_iters=6, driver_edge_limit=0
    )
    got = {r["doc_id"]: r["component"] for r in out.take_all()}
    assert got == want
    # size-gated driver fast path must agree
    fast = label_propagation(ray.data.from_arrow(t), max_iters=6)
    got_fast = {r["doc_id"]: r["component"] for r in fast.take_all()}
    assert got_fast == want


def test_scd2_history_islands(ray_session):
    """Gaps-and-islands semantics: runs collapse, re-appearing values open
    NEW intervals, last interval is open-ended/current."""
    import datetime as dt

    import ray.data

    from connect_smts_ray.ops.relational import scd2_history

    def ts(s):
        return dt.datetime(2026, 1, 1, 0, 0, s)

    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([7, 7, 7, 7, 9], pa.int64()),
        "ts": pa.array([ts(1), ts(2), ts(3), ts(4), ts(1)],
                       pa.timestamp("us")),
        "event_type": pa.array(["a", "a", "b", "a", "x"]),
    })
    out = scd2_history(ray.data.from_arrow(t), "user_id", "ts",
                       "event_id", "event_type").take_all()
    u7 = sorted([r for r in out if r["user_id"] == 7],
                key=lambda r: r["valid_from"])
    assert [r["event_type"] for r in u7] == ["a", "b", "a"]
    assert [r["n_events"] for r in u7] == [2, 1, 1]
    assert u7[0]["valid_to"] == u7[1]["valid_from"]
    assert u7[-1]["valid_to"] is None and u7[-1]["is_current"]
    assert not u7[0]["is_current"]
    u9 = [r for r in out if r["user_id"] == 9]
    assert len(u9) == 1 and u9[0]["is_current"] and u9[0]["n_events"] == 1


def test_trailing_window_sum_peers_nulls_and_edges(ray_session):
    """Exact RANGE-frame semantics: equal-ts peers share the frame sum
    (including FOLLOWING peers), both window ends closed (a row exactly
    window_us older is IN), NULL values skipped, all-NULL frames NULL,
    and no cross-key bleed in a shared bucket."""
    import datetime as dt

    import ray.data

    from connect_smts_ray.ops.relational import trailing_window_sum

    def ts(m, s=0):
        return dt.datetime(2026, 1, 1, 0, 0, 0) + dt.timedelta(
            minutes=m, seconds=s)

    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6, 7, 8], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 1, 2, 2, 3], pa.int64()),
        "ts": pa.array([ts(0), ts(30), ts(30), ts(60), ts(61),
                        ts(10), ts(10), ts(5)], pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0,
                           None, 32.0, None], pa.float64()),
    })
    out = trailing_window_sum(
        ray.data.from_arrow(t), key_col="user_id", ts_col="ts",
        tiebreak_col="event_id", value_col="value",
        window_us=3_600_000_000, num_partitions=1,
    ).take_all()
    got = {r["event_id"]: r["trail_cents"] for r in out}
    assert got[1] == 100
    # peers at :30 both see 1+2+4
    assert got[2] == 700 and got[3] == 700
    # :60 still includes :00 (closed lower bound, exactly 1h old)
    assert got[4] == 1500
    # :61 drops the :00 row
    assert got[5] == 3000
    # NULL value row still gets its peer's sum; peers share it
    assert got[6] == 3200 and got[7] == 3200
    # an all-NULL frame is NULL, like SQL SUM
    assert got[8] is None


def test_bucketed_window_kernels_many_keys_one_bucket(ray_session):
    """The bucketed sessionization kernels (ordered_group_windows /
    scd2_history) must segment correctly when MANY distinct keys land in
    the same bucket (VERDICT r04 #3 contract: one Python call per bucket,
    segment boundaries purely data-driven). 10⁴ keys × 3 rows, bucket
    count 1 — every window value must match the per-key definition."""
    import ray.data

    from connect_smts_ray.ops.relational import (
        ordered_group_windows,
        scd2_history,
    )

    n_keys = 10_000
    keys = np.repeat(np.arange(n_keys, dtype=np.int64), 3)
    # per key: ts 10,20,40 (gaps 10 and 20 us); values 1.0, 3.0, 2.0
    ts = np.tile(np.array([10, 20, 40], dtype=np.int64), n_keys)
    vals = np.tile(np.array([1.0, 3.0, 2.0]), n_keys)
    t = pa.table({
        "user_id": pa.array(keys),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_id": pa.array(np.arange(3 * n_keys, dtype=np.int64)),
        "value": pa.array(vals),
    })
    ds = ray.data.from_arrow(t)
    out = ordered_group_windows(
        ds, key_col="user_id", ts_col="ts", order_tiebreak="event_id",
        value_col="value", num_partitions=1,
    ).sort("event_id").take_all()
    assert len(out) == 3 * n_keys
    assert [r["seq"] for r in out[:3]] == [1, 2, 3]
    assert [r["gap_us"] for r in out[:3]] == [None, 10, 20]
    assert [r["run_max"] for r in out[:3]] == [1.0, 3.0, 3.0]
    # spot-check a middle key: identical windows, no cross-key bleed
    mid = out[3 * 4321: 3 * 4321 + 3]
    assert [r["user_id"] for r in mid] == [4321] * 3
    assert [r["seq"] for r in mid] == [1, 2, 3]
    assert [r["gap_us"] for r in mid] == [None, 10, 20]
    assert [r["run_max"] for r in mid] == [1.0, 3.0, 3.0]

    # scd2: values 1,3,2 → 3 runs per key, last one current/open
    hist = scd2_history(ds, "user_id", "ts", "event_id", "value").take_all()
    assert len(hist) == 3 * n_keys
    per_key = {}
    for r in hist:
        per_key.setdefault(r["user_id"], []).append(r)
    runs = sorted(per_key[4321], key=lambda r: r["valid_from"])
    assert [r["value"] for r in runs] == [1.0, 3.0, 2.0]
    assert [r["is_current"] for r in runs] == [False, False, True]
    assert runs[-1]["valid_to"] is None
    assert sum(r["is_current"] for r in hist) == n_keys


def test_hash_join_multi_null_and_collision_safety(ray_session):
    """Composite keys: length-prefixed fusing can't collide ('a','bc' vs
    'ab','c'); a null in ANY key component matches nothing (SQL)."""
    import ray.data

    from connect_smts_ray.ops.components import hash_join_multi

    left = pa.table({
        "k1": pa.array(["a", "ab", "x", None]),
        "k2": pa.array(["bc", "c", "y", "z"]),
        "lv": pa.array([1, 2, 3, 4], pa.int64()),
    })
    right = pa.table({
        "k1": pa.array(["a", "ab", None]),
        "k2": pa.array(["bc", "c", "z"]),
        "rv": pa.array([10, 20, 30], pa.int64()),
    })
    out = hash_join_multi(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        left_on=["k1", "k2"], right_on=["k1", "k2"], how="inner",
        left_schema=left.schema, right_schema=right.schema,
    ).take_all()
    got = {(r["k1"], r["k2"]): (r["lv"], r["rv"]) for r in out}
    # ('a','bc') matches only ('a','bc'), never ('ab','c'); nulls match nothing
    assert got == {("a", "bc"): (1, 10), ("ab", "c"): (2, 20)}

    anti = hash_join_multi(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        left_on=["k1", "k2"], right_on=["k1", "k2"], how="left_anti",
        left_schema=left.schema, right_schema=right.schema,
    ).take_all()
    assert sorted(r["lv"] for r in anti) == [3, 4]  # null left key -> anti keeps


def test_declarative_chain_validation_and_equivalence(ray_session):
    """Connect-style properties build the same pipeline as code; unknown
    types/keys raise like ConfigDef validation."""
    import pytest as _pytest
    import ray.data

    from connect_smts_ray.pipelines.declarative import (
        ChainConfigError,
        build_chain,
        parse_chain,
    )
    from connect_smts_ray.pipelines.replay import TEST_JWK

    t = pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "props": pa.array(['{"k": 5}', '{"k": 7}']),
    })

    props = {
        "transforms": "enc,dec,expand,map",
        "transforms.enc.type": "encrypt",
        "transforms.enc.keys": TEST_JWK,
        "transforms.enc.columns": "props",
        "transforms.enc.deterministic": "true",
        "transforms.dec.type": "decrypt",
        "transforms.dec.keys": TEST_JWK,
        "transforms.dec.columns": "props",
        "transforms.expand.type": "expand-json",
        "transforms.expand.columns": "props",
        "transforms.map.type": "field-mapping",
        "transforms.map.keep": "event_id",
        "transforms.map.mappings": "k=props.k:int32",
    }
    # crypto stages emit binary then string payloads; cast back for expand
    import pyarrow.compute as _pc

    ds = ray.data.from_arrow(t)
    out_ds = build_chain(ds, {
        "transforms": "enc,dec",
        "transforms.enc.type": "encrypt",
        "transforms.enc.keys": TEST_JWK,
        "transforms.enc.columns": "props",
        "transforms.enc.deterministic": "true",
        "transforms.dec.type": "decrypt",
        "transforms.dec.keys": TEST_JWK,
        "transforms.dec.columns": "props",
    }).map_batches(
        lambda b: b.set_column(
            b.column_names.index("props"), "props",
            _pc.cast(b.column("props"), pa.string()),
        ),
        batch_format="pyarrow",
    )
    out_ds = build_chain(out_ds, {
        "transforms": "expand,map",
        "transforms.expand.type": "expand-json",
        "transforms.expand.columns": "props",
        "transforms.map.type": "field-mapping",
        "transforms.map.keep": "event_id",
        "transforms.map.mappings": "k=props.k:int32",
    })
    rows = {r["event_id"]: r["k"] for r in out_ds.take_all()}
    assert rows == {1: 5, 2: 7}

    with _pytest.raises(ChainConfigError, match="unknown transform type"):
        parse_chain({"transforms": "x", "transforms.x.type": "nope"})
    with _pytest.raises(ChainConfigError, match="unknown config key"):
        build_chain(ds, {
            "transforms": "e", "transforms.e.type": "expand-json",
            "transforms.e.bogus": "1",
        })
    with _pytest.raises(ChainConfigError, match="missing 'transforms'"):
        parse_chain({})


def test_dlq_isolates_poison_rows(ray_session, tmp_path):
    """Poison rows land in the DLQ with their error; survivors transform
    normally; a fully-poisoned batch still yields fn's schema."""
    import ray.data

    from connect_smts_ray.transforms.dlq import read_dlq, with_dlq

    def strict(b: pa.Table) -> pa.Table:
        vals = b.column("x").to_pylist()
        if any(v < 0 for v in vals):
            raise ValueError("negative!")
        return pa.table({"x2": pa.array([v * 2 for v in vals], pa.int64())})

    dlq = str(tmp_path / "dlq")
    t = pa.table({"x": pa.array([1, -5, 3, -7, 4], pa.int64())})
    out = ray.data.from_arrow(t).map_batches(
        with_dlq(strict, dlq, stage="double"), batch_format="pyarrow"
    ).take_all()
    assert sorted(r["x2"] for r in out) == [2, 6, 8]
    dead = read_dlq(dlq)
    assert dead.num_rows == 2
    assert set(dead.column("stage").to_pylist()) == {"double"}
    assert all("negative" in e for e in dead.column("error").to_pylist())
    import json as _json
    xs = sorted(_json.loads(r)["x"] for r in
                dead.column("record_json").to_pylist())
    assert xs == ["-5", "-7"]

    # all-poison batch: the wrapper still returns fn's schema, zero rows
    # (asserted on the wrapper directly — Ray's to_pandas drops column
    # names for all-empty datasets, which is a display quirk, not DLQ's)
    dlq2 = str(tmp_path / "dlq2")
    t2 = pa.table({"x": pa.array([-1, -2], pa.int64())})
    wrapped = with_dlq(strict, dlq2, stage="double")
    empty_out = wrapped(t2)
    assert empty_out.num_rows == 0
    assert empty_out.column_names == ["x2"]
    assert read_dlq(dlq2).num_rows == 2

    # retry idempotence: re-running the same batch (a Ray task retry)
    # rewrites the SAME content-addressed file — no duplicate dead letters
    wrapped(t2)
    assert read_dlq(dlq2).num_rows == 2

    # a transform that cannot handle 0-row input: after one good batch the
    # wrapper reuses the recorded schema instead of calling fn(empty)
    def strict_no_empty(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            raise RuntimeError("cannot run on empty input")
        return strict(b)

    dlq3 = str(tmp_path / "dlq3")
    w3 = with_dlq(strict_no_empty, dlq3, stage="double")
    assert w3(pa.table({"x": pa.array([2], pa.int64())})).num_rows == 1
    empty3 = w3(pa.table({"x": pa.array([-9], pa.int64())}))
    assert empty3.num_rows == 0 and empty3.column_names == ["x2"]
    # with NO prior success the guarded fallback raises a clear error
    w4 = with_dlq(strict_no_empty, str(tmp_path / "dlq4"), stage="double")
    with pytest.raises(RuntimeError, match="0-row"):
        w4(pa.table({"x": pa.array([-9], pa.int64())}))


def test_similarity_join_hot_gram_prefix_filter(ray_session):
    """A boilerplate gram shared by EVERY doc must not blow up candidate
    generation: the (is_hot, gram) prefix order ranks it last in each doc,
    so docs with |x| > 1/t never emit it as a blocking gram — candidates
    stay O(n) — while exact verification keeps the output identical to the
    unfiltered all-grams join (one planted near-dup pair must survive)."""
    import ray.data

    from connect_smts_ray.ops.similarity import (
        ngram_similarity_join,
        prefix_gram_table,
    )

    # 120 left / 120 right docs; all share the boilerplate sentence, each
    # has a unique tail → no cross pairs except the one planted near-dup.
    boiler = "common header present in every document here"
    n_docs = 120

    def mk(side, start_id):
        rows = []
        for i in range(n_docs):
            uniq = " ".join(f"{side}tok{i}w{j}" for j in range(12))
            rows.append((start_id + i, f"{boiler} {uniq}"))
        return rows

    lrows, rrows = mk("l", 0), mk("r", 10_000)
    # planted near-dup: right doc 10_000 reuses left doc 0's text verbatim
    rrows[0] = (10_000, lrows[0][1])

    def tbl(rows):
        return pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        })

    left = ray.data.from_arrow(tbl(lrows)).repartition(4)
    right = ray.data.from_arrow(tbl(rrows)).repartition(4)

    out = ngram_similarity_join(left, right, n=3, threshold=0.5,
                                max_df=16).take_all()
    assert [(r["lid"], r["rid"]) for r in out] == [(0, 10_000)]
    assert out[0]["jaccard"] == 1.0

    # pinned candidate bound: with every boilerplate gram hot, no doc's
    # prefix contains ANY hot gram (|x| ≫ 1/t), so the per-doc prefix is
    # made of unique-tail grams only → total candidate rows are O(n), not
    # n²: assert directly on the blocking table.
    batch = tbl(lrows)
    from connect_smts_ray.ops.corpus import doc_ngram_windows
    all_grams = doc_ngram_windows(batch, 3, "doc_id", "text")
    df = all_grams.group_by("gram", use_threads=False).aggregate(
        [([], "count_all")]
    )
    hot = df.filter(
        pa.compute.greater(df.column("count_all"), pa.scalar(16))
    ).column("gram").combine_chunks()
    assert len(hot) > 0, "test corpus must actually have hot grams"
    pfx = prefix_gram_table(batch, 3, "doc_id", "text", hot, 0.5)
    hot_in_prefix = pa.compute.is_in(pfx.column("gram"), value_set=hot)
    assert pa.compute.sum(
        pa.compute.cast(hot_in_prefix, pa.int64())
    ).as_py() == 0, "hot grams leaked into blocking prefixes"
    # and every unique-tail prefix gram has df == 1 → candidates ≤ n
    assert pfx.num_rows <= all_grams.num_rows


def test_lsh_big_bucket_streaming_star_identical_survivors(ray_session):
    """A bucket whose membership dwarfs pair_cap (every duplicate doc
    collides in EVERY band) must never pass through the list gather: the
    big-bucket split streams it as a min-id star. Pinned property: the
    survivor set is IDENTICAL to the pure-gather run (huge cap), for
    minhash, simhash and embedding alike, and the split actually triggers
    (hubs found for the duplicated buckets)."""
    import ray.data

    from connect_smts_ray.ops.dedup import (
        MinHashConfig,
        MinHasher,
        _signature_stage,
        _split_big_buckets,
        embedding_dedup,
        minhash_dedup,
        simhash_dedup,
    )

    n_dup, n_uniq = 200, 60
    texts = ["identical boilerplate content repeated verbatim in every "
             "duplicate row of this synthetic corpus"] * n_dup
    texts += [
        " ".join(f"unique{i}token{j}" for j in range(14))
        for i in range(n_uniq)
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    ds = ray.data.from_arrow(t).repartition(6)
    want_ids = [0] + list(range(n_dup, n_dup + n_uniq))

    cfg = MinHashConfig(num_perm=64, bands=16, jaccard_threshold=0.5)

    # the split must actually find the duplicated buckets at the small cap
    sig = _signature_stage(ds, MinHasher,
                           {"cfg": cfg, "text_col": "text",
                            "id_col": "doc_id"})
    _, hubs = _split_big_buckets(sig, ["band", "band_hash"], "doc_id",
                                 cap=32)
    assert len(hubs) >= cfg.bands  # every band's dup bucket is big
    assert set(hubs.values()) == {0}  # hub is the min id

    for cap in (32, 10_000):
        surv, _ = minhash_dedup(ds, cfg, pair_cap=cap)
        assert sorted(r["doc_id"] for r in surv.take_all()) == want_ids, cap

    for cap in (32, 10_000):
        surv, _ = simhash_dedup(ds, max_hamming=3, pair_cap=cap)
        got = sorted(r["doc_id"] for r in surv.take_all())
        assert got == want_ids, ("simhash", cap)

    # embedding: 150 identical vectors + unique ones
    rng = np.random.RandomState(17)
    vecs = rng.normal(size=(200, 12))
    vecs[:150] = vecs[0]
    et = pa.table({
        "vec_id": pa.array(range(200), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })
    eds = ray.data.from_arrow(et).repartition(5)
    for gcap in (32, 100_000):
        surv, _ = embedding_dedup(eds, threshold=0.999, n_planes=8,
                                  gather_cap=gcap)
        got = sorted(r["vec_id"] for r in surv.take_all())
        assert got[0] == 0 and 1 not in got and len(got) == 51, ("emb", gcap)


def test_vectors_to_numpy_zero_copy_paths():
    """Buffer-reshape extraction equals the to_pylist path for every
    layout the engine sees: list<f32>, list<f64>, fixed_size_list, sliced
    and chunked arrays; ragged input falls back without corruption."""
    from connect_smts_ray.ops.similarity import vectors_to_numpy

    rows = [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 9.0]]
    for typ in (pa.list_(pa.float32()), pa.list_(pa.float64()),
                pa.list_(pa.float64(), 3)):
        arr = pa.array(rows, type=typ)
        np.testing.assert_allclose(
            vectors_to_numpy(arr), np.asarray(rows), rtol=1e-6)
        # slice (non-zero offset) and chunked layouts
        np.testing.assert_allclose(
            vectors_to_numpy(arr.slice(1)), np.asarray(rows[1:]), rtol=1e-6)
        ch = pa.chunked_array([arr.slice(0, 1), arr.slice(1)])
        np.testing.assert_allclose(
            vectors_to_numpy(ch), np.asarray(rows), rtol=1e-6)
    ragged = pa.array([[1.0], [2.0, 3.0]], type=pa.list_(pa.float64()))
    out = vectors_to_numpy(ragged, dtype=object)
    assert list(out[0]) == [1.0] and list(out[1]) == [2.0, 3.0]


def test_png_codec_roundtrip_and_validation():
    """Real PNG codec: bit-exact round-trip across shapes (the encoder
    cycles all five scanline filters, so every unfilter path runs), CRC
    corruption and unsupported color types raise."""
    import struct
    import zlib

    from connect_smts_ray.ops.multimodal import decode_png, encode_png

    rng = np.random.RandomState(41)
    for h, w in [(1, 1), (2, 3), (5, 5), (7, 11), (16, 4), (6, 1)]:
        img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert (decode_png(encode_png(img)) == img).all(), (h, w)
    grad = (np.arange(9 * 13 * 3).reshape(9, 13, 3) % 256).astype(np.uint8)
    assert (decode_png(encode_png(grad)) == grad).all()

    blob = bytearray(encode_png(grad))
    blob[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM123456")

    # unsupported color type (grayscale) must raise, not mis-decode
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))
    gray = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00ab\x00cd"))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(gray)


def test_y4m_codec_roundtrip_and_random_access():
    """Real YUV4MPEG2 codec: mono and C444 round-trips are bit-exact,
    decode_y4m_frame(k) matches full-decode frame k without touching the
    others, C420 plane geometry parses, and malformed streams raise."""
    from connect_smts_ray.ops.multimodal import (
        decode_y4m,
        decode_y4m_frame,
        encode_y4m,
    )

    rng = np.random.RandomState(43)
    # mono round-trip across shapes
    for n, h, w in [(1, 1, 1), (3, 4, 5), (5, 2, 7)]:
        frames = rng.randint(0, 256, size=(n, h, w)).astype(np.uint8)
        d = decode_y4m(encode_y4m(frames, fps=(30, 1)))
        assert (d["width"], d["height"], d["n_frames"]) == (w, h, n)
        assert d["colorspace"] == "Cmono" and d["fps"] == (30, 1)
        for f in range(n):
            assert (d["frames"][f][0] == frames[f]).all()
            assert (decode_y4m_frame(encode_y4m(frames), f)[0]
                    == frames[f]).all()

    # C444 round-trip: three full-size planes in Y,U,V order
    yuv = rng.randint(0, 256, size=(2, 3, 4, 3)).astype(np.uint8)
    d = decode_y4m(encode_y4m(yuv))
    assert d["colorspace"] == "C444" and len(d["frames"][0]) == 3
    for f in range(2):
        for p in range(3):
            assert (d["frames"][f][p] == yuv[f, :, :, p]).all()

    # C420: hand-built stream (encoder is mono/444-only); subsampled
    # chroma planes must parse with quarter-size geometry
    y = bytes(range(16))          # 4x4 luma
    u, v = bytes([7] * 4), bytes([9] * 4)  # 2x2 chroma
    payload = (b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420jpeg\n"
               + b"FRAME\n" + y + u + v)
    d = decode_y4m(payload)
    assert d["frames"][0][0].shape == (4, 4)
    assert d["frames"][0][1].shape == (2, 2)
    assert d["frames"][0][2].shape == (2, 2)
    assert d["frames"][0][1][0, 0] == 7 and d["frames"][0][2][1, 1] == 9

    # per-frame parameters after the FRAME marker are tolerated
    payload2 = (b"YUV4MPEG2 W2 H1 Cmono\n"
                + b"FRAME Xtag=1\n" + bytes([5, 6])
                + b"FRAME\n" + bytes([7, 8]))
    d2 = decode_y4m(payload2)
    assert d2["n_frames"] == 2 and (d2["frames"][1][0] == [[7, 8]]).all()

    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        decode_y4m(b"RIFF1234WAVE")
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(b"YUV4MPEG2 W4 H4 Cmono\nFRAME\n" + bytes(8))
    with pytest.raises(IndexError):
        decode_y4m_frame(encode_y4m(rng.randint(
            0, 256, size=(2, 2, 2)).astype(np.uint8)), 5)


def test_frame_sample_real_y4m(ray_session):
    """FrameSample(fake=False) samples evenly-spaced REAL frames: with
    n_frames=2 over a 4-frame clip it picks orig frames 0 and 2, and the
    emitted bytes are the exact luma planes."""
    import ray.data

    from connect_smts_ray.ops.multimodal import FrameSample, encode_y4m

    frames = (np.arange(4 * 2 * 3).reshape(4, 2, 3) % 256).astype(np.uint8)
    t = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([encode_y4m(frames)], pa.binary()),
    })
    out = ray.data.from_arrow(t).map_batches(
        FrameSample, fn_constructor_kwargs={"n_frames": 2, "fake": False},
        batch_format="pyarrow", concurrency=1, num_cpus=0.5,
    ).take_all()
    assert [(r["frame_index"], r["orig_frame"]) for r in out] == \
        [(0, 0), (1, 2)]
    assert out[0]["frame"] == frames[0].tobytes()
    assert out[1]["frame"] == frames[2].tobytes()

    # clip shorter than requested sample count: one row per real frame
    short = FrameSample(n_frames=8, fake=False)(t)
    assert short.num_rows == 4
    assert short.column("orig_frame").to_pylist() == [0, 1, 2, 3]


def test_pagerank_fixed_point(ray_session):
    """Distributed PageRank equals a pure-Python fixed-point oracle on a
    small digraph (multi-edges counted, dangling leak, no-in-edge nodes
    kept at base), and is invariant to block layout."""
    import ray.data

    from connect_smts_ray.ops.graph import pagerank

    # 0 is dangling-in (no in-edges), 4 is dangling-out (no out-edges),
    # (1,2) is a multi-edge
    edges = [(0, 1), (1, 2), (1, 2), (2, 3), (3, 1), (3, 4)]
    t = pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64()),
    })

    init, d_num, d_den, K = 10**9, 85, 100, 4
    base = (d_den - d_num) * init // d_den
    nodes = {n for e in edges for n in e}
    deg: dict = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    r = {n: init for n in nodes}
    for _ in range(K):
        s = {n: 0 for n in nodes}
        for a, b in edges:
            s[b] += r[a] // deg[a]
        r = {n: base + (d_num * s[n]) // d_den for n in nodes}

    for blocks in (1, 3):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = {
            row["node"]: row["pr"]
            for row in pagerank(ds, iterations=K).take_all()
        }
        assert got == r, f"blocks={blocks}"
    assert r[0] == base  # no in-edges → pure base after round 1


def test_funnel_counts_strict_ordering(ray_session):
    """Greedy earliest-first funnel: steps must occur in strictly
    increasing timestamp order; out-of-order or missing steps stop the
    chain; the earliest match is always taken (never foreclosing later
    steps)."""
    import ray.data

    from connect_smts_ray.ops.relational import funnel_counts

    rows = [
        # user 1: full funnel in order
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # user 2: purchase BEFORE its click → reaches click, not purchase
        (2, "view", 10), (2, "purchase", 15), (2, "click", 20),
        # user 3: view only
        (3, "view", 5),
        # user 4: click without view → never enters the funnel
        (4, "click", 1), (4, "purchase", 2),
        # user 5: greedy earliest view (t=1) still allows click at t=2
        # (a later view at t=100 would have missed it)
        (5, "view", 1), (5, "click", 2), (5, "view", 100),
        # user 6: tie timestamps — strict > means same-ts click not counted
        (6, "view", 50), (6, "click", 50),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([r[2] for r in rows], pa.int64()),
    })
    out = funnel_counts(ray.data.from_arrow(t).repartition(3),
                        ["view", "click", "purchase"])
    got = {r["step_type"]: r["n_users"] for r in out.to_pylist()}
    assert got == {"view": 5, "click": 3, "purchase": 1}


def test_triangle_counts_exact(ray_session):
    """Degree-ordered triangle counting equals a brute-force oracle on a
    random graph (multi-edges/reversed-dups/self-loops in the raw input),
    is block-layout invariant, and keeps zero-triangle nodes."""
    import itertools
    import random

    import ray.data

    from connect_smts_ray.ops.graph import triangle_counts

    random.seed(11)
    n = 30
    edges = set()
    while len(edges) < 90:
        a, b = random.randrange(n), random.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    raw = (list(edges)
           + [(b, a) for a, b in list(edges)[:20]]  # reversed dups
           + [(3, 3), (9, 9)])                       # self-loops
    t = pa.table({"src": pa.array([e[0] for e in raw], pa.int64()),
                  "dst": pa.array([e[1] for e in raw], pa.int64())})

    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = {i: 0 for i in {x for e in edges for x in e}}
    for a, b, c in itertools.combinations(sorted(want), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            want[a] += 1
            want[b] += 1
            want[c] += 1

    for blocks in (1, 4):
        ds = ray.data.from_arrow(t).repartition(blocks)
        got = {r["node"]: r["triangles"]
               for r in triangle_counts(ds).take_all()}
        assert got == want, f"blocks={blocks}"


def test_triangle_counts_star_hub(ray_session):
    """A pure star (hub with many spokes) has zero triangles; adding one
    spoke-spoke edge creates exactly one — orientation must not double- or
    zero-count around the high-degree hub."""
    import ray.data

    from connect_smts_ray.ops.graph import triangle_counts

    spokes = list(range(1, 41))
    star = [(0, s) for s in spokes]
    t = pa.table({"src": pa.array([e[0] for e in star], pa.int64()),
                  "dst": pa.array([e[1] for e in star], pa.int64())})
    got = {r["node"]: r["triangles"]
           for r in triangle_counts(ray.data.from_arrow(t)).take_all()}
    assert got == {i: 0 for i in range(41)}

    t2 = pa.table({"src": pa.array([e[0] for e in star] + [1], pa.int64()),
                   "dst": pa.array([e[1] for e in star] + [2], pa.int64())})
    got2 = {r["node"]: r["triangles"]
            for r in triangle_counts(ray.data.from_arrow(t2)).take_all()}
    want = {i: 0 for i in range(41)}
    want[0] = want[1] = want[2] = 1
    assert got2 == want


def test_cohort_retention_matrix(ray_session):
    """Retention cells equal a hand-computed matrix; repeat activity in a
    period counts once; layout-invariant."""
    import ray.data

    from connect_smts_ray.ops.relational import cohort_retention

    P = 100  # period_us
    # user 1: periods 0,0,1,3 -> cohort 0, offsets {0,1,3}
    # user 2: periods 1,2     -> cohort 1, offsets {0,1}
    # user 3: period 3        -> cohort 3, offset {0}
    rows = [(1, 5), (1, 90), (1, 150), (1, 399),
            (2, 101), (2, 250), (3, 399)]
    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })
    want = {(0, 0): 1, (0, 1): 1, (0, 3): 1,
            (1, 0): 1, (1, 1): 1, (3, 0): 1}
    for blocks in (1, 3):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = cohort_retention(ds, user_col="u", ts_col="ts", period_us=P)
        got = {(r["cohort_period"], r["period_offset"]): r["n_users"]
               for r in out.take_all()}
        assert got == want, f"blocks={blocks}"


def test_transition_counts_ordering(ray_session):
    """Bigrams are per-key, ordered by (ts, tiebreak); ties break on the
    tiebreak column; single-event keys contribute nothing."""
    import ray.data

    from connect_smts_ray.ops.relational import transition_counts

    rows = [
        (1, 10, 0, "a"), (1, 20, 1, "b"), (1, 20, 2, "a"),  # a→b→a (tie)
        (2, 5, 3, "b"), (2, 6, 4, "b"),                      # b→b
        (3, 7, 5, "c"),                                      # no bigram
    ]
    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "eid": pa.array([r[2] for r in rows], pa.int64()),
        "et": pa.array([r[3] for r in rows], pa.string()),
    })
    want = {("a", "b"): 1, ("b", "a"): 1, ("b", "b"): 1}
    for blocks in (1, 3):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = transition_counts(ds, key_col="u", ts_col="ts",
                                tiebreak_col="eid", type_col="et")
        got = {(r["from_type"], r["to_type"]): r["n"]
               for r in out.take_all()}
        assert got == want, f"blocks={blocks}"


def test_cms_sketch_properties(ray_session):
    """Count-Min estimates are layout-invariant (exact cell sums merge
    associatively), never undercount, and are exact when width >> vocab."""
    import ray.data

    from connect_smts_ray.ops.sketch import cms_build, cms_estimate

    words = (["apple"] * 50 + ["banana"] * 30 + ["cherry"] * 7
             + ["date"] * 3 + ["elderberry"] * 1)
    t = pa.table({"w": pa.array(words, pa.string())})
    truth = {"apple": 50, "banana": 30, "cherry": 7,
             "date": 3, "elderberry": 1}
    keys = sorted(truth)

    sketches = []
    for blocks in (1, 4):
        ds = ray.data.from_arrow(t).repartition(blocks)
        cms = cms_build(ds, "w", depth=4, width=8)
        sketches.append(cms.tobytes())
        est = dict(zip(keys, cms_estimate(cms, keys)))
        assert all(est[k] >= truth[k] for k in keys)  # CMS never undercounts
        assert sum(cms[0]) == len(words)  # each row sums to the stream size
    assert sketches[0] == sketches[1]  # block layout cannot change the sketch

    wide = cms_build(ray.data.from_arrow(t), "w", depth=4, width=4096)
    est = dict(zip(keys, cms_estimate(wide, keys)))
    assert est == truth  # no collisions at 4096 cells for 5 words


def test_skew_join_matches_hash_join(ray_session):
    """Salted skew join is row-identical to the plain reduce-side join on
    a power-law key distribution, for inner/left_outer/left_anti, at
    multiple block layouts; cold inputs (no hot keys) take the plain
    path untouched."""
    import collections

    import ray.data

    from connect_smts_ray.ops.components import hash_join, skew_join

    # key 7 is pathologically hot on the probe side
    lkeys = [7] * 400 + [1, 2, 3] * 30 + [99] * 5
    lt = pa.table({
        "k": pa.array(lkeys, pa.int64()),
        "lv": pa.array(range(len(lkeys)), pa.int64()),
    })
    rkeys = [7, 7, 1, 2, 4]
    rt = pa.table({
        "rk": pa.array(rkeys, pa.int64()),
        "rv": pa.array([70, 71, 10, 20, 40], pa.int64()),
    })
    lsch = pa.schema([("k", pa.int64()), ("lv", pa.int64())])
    rsch = pa.schema([("rk", pa.int64()), ("rv", pa.int64())])

    def rows(ds):
        return collections.Counter(
            tuple(sorted(r.items())) for r in ds.take_all())

    for how in ("inner", "left_outer", "left_anti"):
        for blocks in (1, 4):
            left = ray.data.from_arrow(lt).repartition(blocks)
            right = ray.data.from_arrow(rt).repartition(blocks)
            want = rows(hash_join(
                left, right, left_on="k", right_on="rk", how=how,
                left_schema=lsch, right_schema=rsch))
            got = rows(skew_join(
                left, right, left_on="k", right_on="rk", how=how,
                num_salts=4, hot_threshold=100,
                left_schema=lsch, right_schema=rsch))
            assert got == want, f"{how} blocks={blocks}"

    # no key reaches the threshold -> identical to plain hash_join too
    left = ray.data.from_arrow(lt)
    right = ray.data.from_arrow(rt)
    got = rows(skew_join(left, right, left_on="k", right_on="rk",
                         hot_threshold=10**9,
                         left_schema=lsch, right_schema=rsch))
    want = rows(hash_join(left, right, left_on="k", right_on="rk",
                          left_schema=lsch, right_schema=rsch))
    assert got == want


def test_table_diff_semantics(ray_session):
    """added/removed/changed classification with IS DISTINCT FROM null
    semantics (null==null is unchanged; null vs value is changed);
    unchanged keys dropped; layout-invariant."""
    import ray.data

    from connect_smts_ray.ops.relational import table_diff

    old = pa.table({
        "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "v": pa.array([10.0, 20.0, None, 40.0, None], pa.float64()),
    })
    new = pa.table({
        "k": pa.array([2, 3, 4, 5, 6], pa.int64()),
        "v": pa.array([20.0, 30.0, None, 50.0, 60.0], pa.float64()),
    })
    # k=1 removed; k=2 unchanged (dropped); k=3 null→30 and k=4 40→null
    # and k=5 null→50 all changed (null is distinct from a value); k=6 added
    want = {
        1: ("removed", 10.0, None),
        3: ("changed", None, 30.0),
        4: ("changed", 40.0, None),
        5: ("changed", None, 50.0),
        6: ("added", None, 60.0),
    }
    for blocks in (1, 3):
        o = ray.data.from_arrow(old).repartition(blocks)
        n = ray.data.from_arrow(new).repartition(blocks)
        rows = table_diff(o, n, key_cols=["k"], value_cols=["v"]).take_all()
        got = {r["k"]: (r["change_type"], r["old_v"], r["new_v"])
               for r in rows}
        assert got == want, f"blocks={blocks}"


def test_last_touch_attribution(ray_session):
    """Window expiry, strict precedence, latest-touch-wins, and '(none)'
    fallback; layout-invariant."""
    import ray.data

    from connect_smts_ray.ops.relational import last_touch_attribution

    # user 1: view@0, click@50, purchase@100 (credit click);
    #         purchase@2000 (window 500 expired -> none)
    # user 2: purchase@10 with no touches -> none
    # user 3: click@5, view@6, purchase@7 -> view (latest wins)
    rows = [
        (1, 0, 0, "view", 0.0), (1, 50, 1, "click", 0.0),
        (1, 100, 2, "purchase", 10.0), (1, 2000, 3, "purchase", 5.0),
        (2, 10, 4, "purchase", 2.0),
        (3, 5, 5, "click", 0.0), (3, 6, 6, "view", 0.0),
        (3, 7, 7, "purchase", 1.5),
    ]
    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "eid": pa.array([r[2] for r in rows], pa.int64()),
        "et": pa.array([r[3] for r in rows], pa.string()),
        "v": pa.array([r[4] for r in rows], pa.float64()),
    })
    want = {"click": (1, 1000), "view": (1, 150), "(none)": (2, 700)}
    for blocks in (1, 3):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = last_touch_attribution(
            ds, key_col="u", ts_col="ts", tiebreak_col="eid",
            type_col="et", value_col="v",
            touch_types=("view", "click"), convert_type="purchase",
            window_us=500)
        got = {r["touch_type"]: (r["n_conversions"], r["value_cents"])
               for r in out.take_all()}
        assert got == want, f"blocks={blocks}"


def test_grouped_cube_lattice(ray_session):
    """CUBE emits all 2^K grouping sets with correct sums, distinguishes
    a REAL ""/0 key value from an aggregated (NULL) slot, and is
    layout-invariant."""
    import ray.data

    from connect_smts_ray.ops.relational import grouped_cube

    t = pa.table({
        "a": pa.array(["x", "x", "", "y"], pa.string()),  # "" is a REAL key
        "b": pa.array([0, 1, 0, 1], pa.int64()),          # 0 is a REAL key
        "v": pa.array([1, 2, 4, 8], pa.int64()),
    })
    want = {
        # (a, b) -> (n, sum); None = aggregated
        ("x", 0): (1, 1), ("x", 1): (1, 2), ("", 0): (1, 4), ("y", 1): (1, 8),
        ("x", None): (2, 3), ("", None): (1, 4), ("y", None): (1, 8),
        (None, 0): (2, 5), (None, 1): (2, 10),
        (None, None): (4, 15),
    }
    for blocks in (1, 3):
        ds = ray.data.from_arrow(t).repartition(blocks)
        rows = grouped_cube(ds, ["a", "b"], "v").take_all()
        got = {(r["a"], r["b"]): (r["n_rows"], r["sum_val"]) for r in rows}
        assert got == want, f"blocks={blocks}"


def test_resize_image_nearest_neighbor(ray_session):
    """ResizeImage down- and up-samples with the integer nearest-neighbor
    map ((x*w_in)//out_w), re-encoding through the real BMP codec."""
    import ray.data

    from connect_smts_ray.ops.multimodal import (ResizeImage, decode_bmp,
                                                 encode_bmp)

    rng = np.random.RandomState(9)
    imgs = [rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
            for (h, w) in [(3, 4), (8, 2), (5, 5)]]
    t = pa.table({
        "media_id": pa.array(range(len(imgs)), pa.int64()),
        "payload": pa.array([encode_bmp(i) for i in imgs], pa.binary()),
    })
    out_w, out_h = 6, 4
    res = ray.data.from_arrow(t).map_batches(
        ResizeImage, fn_constructor_kwargs={"out_w": out_w, "out_h": out_h},
        batch_format="pyarrow", concurrency=1,
    ).take_all()
    assert len(res) == len(imgs)
    for r in res:
        img_in = imgs[r["media_id"]]
        h_in, w_in, _ = img_in.shape
        xs = (np.arange(out_w) * w_in) // out_w
        ys = (np.arange(out_h) * h_in) // out_h
        want = img_in[np.ix_(ys, xs)]
        got = decode_bmp(r["payload"])
        assert got.shape == (out_h, out_w, 3)
        assert np.array_equal(got, want), r["media_id"]


def test_grouped_ols_trend_exact(ray_session):
    """Per-key OLS slope/intercept equal a numpy polyfit oracle on exact
    integer data; degenerate keys (n<2 or zero x-variance) give NULLs;
    layout-invariant."""
    import ray.data

    from connect_smts_ray.ops.relational import grouped_ols_trend

    rows = [
        # key 1: y = 3x + 700 exactly over x in {0, 10, 20, 30}
        (1, 0, 700), (1, 10, 730), (1, 20, 760), (1, 30, 790),
        # key 2: noisy
        (2, 0, 100), (2, 5, 180), (2, 12, 90), (2, 20, 260),
        # key 3: single point -> NULL
        (3, 7, 500),
        # key 4: two points, same timestamp -> zero x-variance -> NULL
        (4, 9, 10), (4, 9, 20),
    ]
    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * 1_000_000 for r in rows], pa.timestamp("us")),
        "cents": pa.array([r[2] for r in rows], pa.int64()),
    })
    for blocks in (1, 3):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = {r["u"]: r for r in grouped_ols_trend(
            ds, key_col="u", ts_col="ts",
            value_cents_col="cents").take_all()}
        assert out[1]["slope"] == pytest.approx(3.0) \
            and out[1]["intercept"] == pytest.approx(700.0)
        xs = np.array([0, 5, 12, 20.0])
        ys = np.array([100, 180, 90, 260.0])
        m, c = np.polyfit(xs, ys, 1)
        assert out[2]["slope"] == pytest.approx(m)
        assert out[2]["intercept"] == pytest.approx(c)
        assert out[3]["slope"] is None and out[3]["intercept"] is None
        assert out[4]["slope"] is None and out[4]["n"] == 2


def test_hash_join_full_outer(ray_session):
    """full_outer matches DuckDB FULL OUTER JOIN semantics — coalesced
    key, both sides' unmatched rows kept, null keys match nothing — on
    both the acero kernel and the list-payload gather fallback."""
    import collections

    import duckdb
    import ray.data

    from connect_smts_ray.ops.components import hash_join

    lt = pa.table({
        "k": pa.array([1, 2, 2, None, 5], pa.int64()),
        "lv": pa.array([10, 20, 21, 30, 50], pa.int64()),
    })
    rt = pa.table({
        "k": pa.array([2, 3, None], pa.int64()),
        "rv": pa.array([200, 300, 400], pa.int64()),
    })
    con = duckdb.connect()
    con.register("l", lt.to_pandas())
    con.register("r", rt.to_pandas())
    want_df = con.execute("""
        SELECT COALESCE(l.k, r.k) AS k, l.lv, r.rv
        FROM l FULL OUTER JOIN r ON l.k = r.k
    """).df()
    want = collections.Counter(
        (None if __import__("pandas").isna(a) else int(a),
         None if __import__("pandas").isna(b) else int(b),
         None if __import__("pandas").isna(c) else int(c))
        for a, b, c in want_df.itertuples(index=False))

    lsch = pa.schema([("k", pa.int64()), ("lv", pa.int64())])
    rsch = pa.schema([("k", pa.int64()), ("rv", pa.int64())])
    for blocks in (1, 3):
        left = ray.data.from_arrow(lt).repartition(blocks)
        right = ray.data.from_arrow(rt).repartition(blocks)
        got = collections.Counter(
            (r["k"], r["lv"], r["rv"])
            for r in hash_join(left, right, left_on="k", right_on="k",
                               how="full_outer", left_schema=lsch,
                               right_schema=rsch).take_all())
        assert got == want, f"acero blocks={blocks}"

    # list-payload gather path: add a list column to force the fallback
    lt2 = lt.append_column(
        "emb", pa.array([[1.0], [2.0], [2.5], [3.0], [5.0]],
                        pa.list_(pa.float64())))
    lsch2 = pa.schema(list(lsch) + [pa.field("emb",
                                             pa.list_(pa.float64()))])
    got2 = collections.Counter(
        (r["k"], r["lv"], r["rv"])
        for r in hash_join(ray.data.from_arrow(lt2),
                           ray.data.from_arrow(rt),
                           left_on="k", right_on="k", how="full_outer",
                           left_schema=lsch2, right_schema=rsch,
                           ).take_all())
    assert got2 == want


def test_pagerank_resumable_checkpoints(ray_session, tmp_path):
    """Checkpointed pagerank: resume-then-finish equals single-shot
    bit-for-bit; a crash between data write and manifest commit re-runs
    that round idempotently; a completed dir re-runs zero rounds."""
    import os
    import shutil

    import ray.data

    from connect_smts_ray.ops.graph import pagerank, pagerank_resumable

    edges_t = pa.table({
        "src": pa.array([0, 1, 1, 2, 3, 3], pa.int64()),
        "dst": pa.array([1, 2, 2, 3, 1, 4], pa.int64()),
    })

    def edges():
        return ray.data.from_arrow(edges_t).repartition(2)

    want = {r["node"]: r["pr"]
            for r in pagerank(edges(), iterations=4).take_all()}

    # partial run (up to iter-2), then resume to 4
    d1 = str(tmp_path / "ck1")
    _, rounds = pagerank_resumable(edges(), d1, iterations=2)
    assert rounds == 3  # iter-0 (init) + 2 real rounds
    ranks, rounds2 = pagerank_resumable(edges(), d1, iterations=4)
    assert rounds2 == 2  # only the remaining rounds ran
    got = {r["node"]: r["pr"] for r in ranks.take_all()}
    assert got == want

    # crash window: iter-4 data written but manifest missing -> re-run it
    os.remove(os.path.join(d1, "iter-4", "_COMMITTED.json"))
    ranks, rounds3 = pagerank_resumable(edges(), d1, iterations=4)
    assert rounds3 == 1
    assert {r["node"]: r["pr"] for r in ranks.take_all()} == want

    # fully committed -> no rounds run, same result read back
    ranks, rounds4 = pagerank_resumable(edges(), d1, iterations=4)
    assert rounds4 == 0
    assert {r["node"]: r["pr"] for r in ranks.take_all()} == want


class TestGifCodec:
    """Real LZW GIF codec: roundtrips, a spec-built golden stream, and
    honest unsupported-feature failures."""

    def test_roundtrip_various(self):
        from connect_smts_ray.ops.multimodal import decode_gif, encode_gif

        rng = np.random.RandomState(2)
        for (h, w, ncol) in [(3, 4, 4), (16, 16, 256), (40, 60, 7),
                             (1, 1, 2)]:
            pal = rng.randint(0, 256, size=(ncol, 3)).astype(np.uint8)
            idx = rng.randint(0, ncol, size=(h, w)).astype(np.uint8)
            out = decode_gif(encode_gif(idx, pal))
            assert (out == pal[idx]).all(), (h, w, ncol)

    def test_dictionary_overflow_clears(self):
        from connect_smts_ray.ops.multimodal import decode_gif, encode_gif

        # long repetitive stream: dictionary hits the 12-bit cap and the
        # encoder must emit a mid-stream clear (and the KwKwK case fires)
        idx = np.tile(np.arange(2, dtype=np.uint8),
                      35000).reshape(200, 350)
        pal = np.asarray([[0, 0, 0], [255, 255, 255]], np.uint8)
        assert (decode_gif(encode_gif(idx, pal)) == pal[idx]).all()

    def test_golden_hand_built_stream(self):
        """A GIF assembled from the spec with an independent bit-packer
        (clear, literal codes, width bump after code 8, EOI) decodes to
        the expected pixels — pins the READER to the wire format."""
        from connect_smts_ray.ops.multimodal import decode_gif

        # 2x2 image, palette 4 colors, pixels [1, 2, 2, 0]
        codes = [(4, 3), (1, 3), (2, 3), (2, 3), (0, 4), (5, 4)]
        acc = bit_n = 0
        payload = bytearray()
        for code, cw in codes:
            acc |= code << bit_n
            bit_n += cw
            while bit_n >= 8:
                payload.append(acc & 0xFF)
                acc >>= 8
                bit_n -= 8
        if bit_n:
            payload.append(acc & 0xFF)

        pal = bytes([10, 11, 12, 20, 21, 22, 30, 31, 32, 40, 41, 42])
        buf = (b"GIF89a"
               + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
               + bytes([0x80 | 0x10 | 0x01, 0, 0])  # GCT, 4 entries
               + pal
               + b"\x2c" + b"\x00\x00\x00\x00"
               + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
               + b"\x00"
               + bytes([2])                       # LZW min code size
               + bytes([len(payload)]) + bytes(payload) + b"\x00"
               + b"\x3b")
        img = decode_gif(bytes(buf))
        want = np.asarray([[[20, 21, 22], [30, 31, 32]],
                           [[30, 31, 32], [10, 11, 12]]], np.uint8)
        assert (img == want).all()

    def test_unsupported_features_raise(self):
        from connect_smts_ray.ops.multimodal import (decode_gif,
                                                     encode_gif)

        pal = np.asarray([[0, 0, 0], [9, 9, 9]], np.uint8)
        data = bytearray(encode_gif(
            np.zeros((2, 2), np.uint8), pal))
        with pytest.raises(ValueError, match="not a GIF"):
            decode_gif(b"BMPX" + bytes(data))
        # flip the interlace bit in the image descriptor
        idesc = bytes(data).index(b"\x2c")
        data[idesc + 9] |= 0x40
        with pytest.raises(ValueError, match="interlaced"):
            decode_gif(bytes(data))


def test_table_diff_null_keys_never_pair(ray_session):
    """A null key on each side must NOT match the other side's null key
    (SQL join semantics): both surface as their own unmatched rows."""
    import ray.data

    from connect_smts_ray.ops.relational import table_diff

    old = pa.table({"k": pa.array([None, 1], pa.int64()),
                    "v": pa.array([5.0, 10.0], pa.float64())})
    new = pa.table({"k": pa.array([None, 1], pa.int64()),
                    "v": pa.array([7.0, 10.0], pa.float64())})
    rows = table_diff(ray.data.from_arrow(old), ray.data.from_arrow(new),
                      key_cols=["k"], value_cols=["v"]).take_all()
    got = sorted([(r["k"], r["change_type"], r["old_v"], r["new_v"])
                  for r in rows], key=str)
    assert got == sorted([(None, "removed", 5.0, None),
                          (None, "added", None, 7.0)], key=str)


def test_cohort_retention_pre_1970_floor(ray_session):
    """Negative timestamps floor into the period BELOW zero (SQL
    floor(epoch/period)), not toward zero."""
    import ray.data

    from connect_smts_ray.ops.relational import cohort_retention

    t = pa.table({
        "u": pa.array([1, 1], pa.int64()),
        "ts": pa.array([-50, 150], pa.timestamp("us")),  # period 100
    })
    out = cohort_retention(ray.data.from_arrow(t), user_col="u",
                           ts_col="ts", period_us=100).take_all()
    got = {(r["cohort_period"], r["period_offset"]): r["n_users"]
           for r in out}
    # -50us floors to period -1 (cohort); 150us -> period 1 -> offset 2
    assert got == {(-1, 0): 1, (-1, 2): 1}


def test_skew_join_cap_keeps_largest(ray_session):
    """With more hot keys than max_hot_keys, the cap keeps the LARGEST
    offenders salted and the rest unsalted — output unchanged either
    way (equivalence is the invariant; the cap only shapes memory)."""
    import collections

    import ray.data

    from connect_smts_ray.ops.components import hash_join, skew_join

    # keys 1..5 all hot (counts 60, 50, 40, 30, 20), cap at 2
    lkeys = sum([[k] * (70 - 10 * k) for k in range(1, 6)], [])
    lt = pa.table({"k": pa.array(lkeys, pa.int64()),
                   "lv": pa.array(range(len(lkeys)), pa.int64())})
    rt = pa.table({"rk": pa.array([1, 2, 3, 4, 5, 9], pa.int64()),
                   "rv": pa.array([10, 20, 30, 40, 50, 90], pa.int64())})
    lsch = pa.schema([("k", pa.int64()), ("lv", pa.int64())])
    rsch = pa.schema([("rk", pa.int64()), ("rv", pa.int64())])

    def rows(ds):
        return collections.Counter(
            tuple(sorted(r.items())) for r in ds.take_all())

    left, right = ray.data.from_arrow(lt), ray.data.from_arrow(rt)
    want = rows(hash_join(left, right, left_on="k", right_on="rk",
                          left_schema=lsch, right_schema=rsch))
    got = rows(skew_join(left, right, left_on="k", right_on="rk",
                         hot_threshold=15, max_hot_keys=2, num_salts=4,
                         left_schema=lsch, right_schema=rsch))
    assert got == want


def test_bucketed_kernels_many_keys_one_bucket(ray_session):
    """VERDICT r04 #3: bigrams + attribution are one Python call per
    BUCKET — 10⁵ distinct keys in a single bucket must still be exact
    (segmented shift / segmented forward-fill, no per-key dispatch)."""
    import ray

    from connect_smts_ray.ops.relational import (last_touch_attribution,
                                                 transition_counts)

    n_keys = 100_000
    # every key gets the same 3-event history: A@1, B@2, A@3
    keys = np.repeat(np.arange(n_keys, dtype=np.int64), 3)
    ts = np.tile(np.array([1, 2, 3], dtype=np.int64), n_keys)
    types = np.tile(np.array(["A", "B", "A"], dtype=object), n_keys)
    t = pa.table({
        "u": pa.array(keys, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "eid": pa.array(np.arange(3 * n_keys, dtype=np.int64), pa.int64()),
        "etype": pa.array(list(types), pa.string()),
        "value": pa.array(np.full(3 * n_keys, 1.0), pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(8)

    # num_partitions=1: ALL keys land in one bucket → one kernel call
    big = transition_counts(ds, key_col="u", ts_col="ts",
                            tiebreak_col="eid", type_col="etype",
                            num_partitions=1).to_pandas()
    got = {(r.from_type, r.to_type): r.n for r in big.itertuples()}
    # cross-key pairs must NOT leak: exactly A→B and B→A, n_keys each
    assert got == {("A", "B"): n_keys, ("B", "A"): n_keys}

    attr = last_touch_attribution(
        ds, key_col="u", ts_col="ts", tiebreak_col="eid",
        type_col="etype", value_col="value",
        touch_types=["B"], convert_type="A",
        window_us=10, num_partitions=1).to_pandas()
    by = {r.touch_type: (r.n_conversions, r.value_cents)
          for r in attr.itertuples()}
    # first A of each key has no preceding touch; last A credits B
    assert by == {"(none)": (n_keys, 100 * n_keys),
                  "B": (n_keys, 100 * n_keys)}


def test_pagerank_copartitioned_matches_pagerank(ray_session, tmp_path):
    """Co-partitioned pagerank (edge layout written once, rank shards
    re-partitioned on the same bounds each round, local merge joins) is
    bit-identical to the shuffle-per-round ``pagerank`` — including
    multi-edges, dangling leak, and no-in-edge nodes — and the edge
    layout is written exactly once (no per-round edge movement)."""
    import os

    import ray.data

    from connect_smts_ray.ops.graph import pagerank, pagerank_copartitioned

    rng = np.random.RandomState(9)
    src = rng.randint(0, 60, size=400)
    dst = rng.randint(0, 60, size=400)
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})

    def edges():
        return ray.data.from_arrow(t).repartition(5)

    want = {r["node"]: r["pr"]
            for r in pagerank(edges(), iterations=3).take_all()}

    wd = str(tmp_path / "copart")
    got_ds = pagerank_copartitioned(edges(), wd, iterations=3, num_shards=4)
    got = {r["node"]: r["pr"] for r in got_ds.take_all()}
    assert got == want

    edir = os.path.join(wd, "edges")
    mtimes = {f: os.path.getmtime(os.path.join(edir, f))
              for f in os.listdir(edir)}
    # per-round artifacts are rank shards only
    assert sorted(d for d in os.listdir(wd) if d.startswith("ranks-")) == [
        "ranks-0", "ranks-1", "ranks-2"]
    got2 = {r["node"]: r["pr"]
            for r in pagerank_copartitioned(
                edges(), str(tmp_path / "copart2"), iterations=3,
                num_shards=1).take_all()}
    assert got2 == want  # single-shard degenerate layout still exact
    assert mtimes == {f: os.path.getmtime(os.path.join(edir, f))
                      for f in os.listdir(edir)}


# ---------------------------------------------------------------------------
# unpivot / grouped_mode / grouped_string_agg (round 5)
# ---------------------------------------------------------------------------

def test_unpivot_stacks_and_coerces(ray_session):
    import ray.data

    from connect_smts_ray.ops.relational import unpivot

    t = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "a": pa.array([10, 20], pa.int64()),
        "b": pa.array([0.5, 1.5], pa.float64()),
    })
    out = unpivot(ray.data.from_arrow(t), ["id"], ["a", "b"]).to_pandas()
    assert len(out) == 4
    assert set(out["variable"]) == {"a", "b"}
    got = {(r.id, r.variable): r.value for r in out.itertuples()}
    assert got[(1, "a")] == 10.0 and got[(2, "b")] == 1.5
    assert out["value"].dtype == "float64"


def test_grouped_mode_tiebreak_and_partition_invariance(ray_session):
    import ray.data

    from connect_smts_ray.ops.relational import grouped_mode

    t = pa.table({
        "g": pa.array([1, 1, 1, 1, 2, 2, 2], pa.int64()),
        # g=1: b×2, a×2 → tie → 'a' (smallest); g=2: z×2 beats y×1
        "v": pa.array(["b", "a", "b", "a", "z", "y", "z"], pa.string()),
    })
    for parts in (1, 32):
        out = grouped_mode(ray.data.from_arrow(t), "g", "v",
                           num_partitions=parts).to_pandas() \
            .sort_values("g").reset_index(drop=True)
        assert out["mode_value"].tolist() == ["a", "z"]
        assert out["n"].tolist() == [2, 2]


def test_grouped_string_agg_order_nulls_and_blocks(ray_session):
    import ray.data

    from connect_smts_ray.ops.relational import grouped_string_agg

    t = pa.table({
        "g": pa.array([1, 1, 1, 2, 1], pa.int64()),
        "v": pa.array(["c", None, "a", "solo", "b"], pa.string()),
        "ts": pa.array([3, 2, 1, 1, 1], pa.int64()),
        "tb": pa.array([0, 0, 0, 0, 1], pa.int64()),  # a(ts1,tb0) < b(ts1,tb1)
    })
    # split across 3 blocks to prove cross-block groups assemble correctly
    ds = ray.data.from_arrow(t).repartition(3)
    out = grouped_string_agg(ds, "g", "v", "ts", "tb",
                             sep=">").to_pandas() \
        .sort_values("g").reset_index(drop=True)
    assert out["agg"].tolist() == ["a>b>c", "solo"]  # null skipped


def test_temporal_join_gapped_history_expires(ray_session):
    """A dimension with a GAP between versions: facts landing in the gap
    must get NULL dim columns (the as-of backward match exists but has
    expired), facts inside an interval match it, facts before the first
    interval never match."""
    import ray.data

    from connect_smts_ray.ops.relational import temporal_join

    dim = pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "version": pa.array(["v1", "v2"], pa.string()),
        "valid_from": pa.array([100, 300], pa.int64()),
        "valid_to": pa.array([200, None], pa.int64()),  # gap [200, 300)
    })
    fact = pa.table({
        "fid": pa.array([0, 1, 2, 3], pa.int64()),
        "k": pa.array([1, 1, 1, 1], pa.int64()),
        "ts": pa.array([50, 150, 250, 350], pa.int64()),
    })
    out = temporal_join(
        ray.data.from_arrow(fact), ray.data.from_arrow(dim),
        fact_key="k", fact_ts="ts", dim_key="k",
    ).to_pandas().sort_values("fid").reset_index(drop=True)
    import pandas as pd
    vals = [None if pd.isna(v) else v for v in out["version"]]
    assert vals == [None, "v1", None, "v2"]


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF container codec
# ---------------------------------------------------------------------------

def test_mp4_codec_roundtrip_and_random_access():
    """Full round-trip through the real box writer/parser; sample k must
    be recoverable via the stco×stsc×stsz-resolved offsets without
    touching any other sample's bytes."""
    import struct

    from connect_smts_ray.ops.multimodal import (
        decode_mp4,
        decode_mp4_sample,
        encode_mp4,
    )

    samples = [bytes((7 * i + k) % 256 for k in range(15 + 11 * i))
               for i in range(6)]
    p = encode_mp4(samples, timescale=600, sample_delta=20,
                   width=320, height=240)
    m = decode_mp4(p)
    assert m["timescale"] == 600
    assert m["duration"] == 120 and m["media_duration"] == 120
    assert m["n_samples"] == 6
    assert (m["width"], m["height"]) == (320, 240)
    assert m["codec"] == "avc1"
    assert list(m["sample_sizes"]) == [len(s) for s in samples]
    for k in range(6):
        assert decode_mp4_sample(p, m, k) == samples[k]

    # size==1 largesize form: rebuild the mdat with a 16-byte header —
    # parsing must still walk past it (offsets shift by 8; parse only)
    mdat_body = b"".join(samples)
    i = p.index(b"mdat") - 4
    large = (struct.pack(">I", 1) + b"mdat"
             + struct.pack(">Q", 16 + len(mdat_body)) + mdat_body)
    p2 = p[:i] + large + p[i + 8 + len(mdat_body):]
    assert decode_mp4(p2)["n_samples"] == 6

    # truncated box must raise, and the error must not embed payload
    try:
        decode_mp4(p[:40])
        raise AssertionError("truncated mp4 parsed")
    except ValueError as e:
        assert len(str(e)) < 200

    # empty-track edge: zero samples
    m0 = decode_mp4(encode_mp4([], sample_delta=40))
    assert m0["n_samples"] == 0 and m0["duration"] == 0


def test_mp4_multi_chunk_stsc_resolution():
    """Hand-build sample tables with TWO chunks and a stsc run so the
    chunk-expansion path (first_chunk ranges) is exercised, not just the
    single-chunk layout the encoder writes. Boxes are laid flat (the
    collector flattens containers anyway), with chunk 2 at a
    non-contiguous offset — only a correct stsc×stco×stsz walk can
    produce these positions."""
    import struct

    from connect_smts_ray.ops.multimodal import (
        _box,
        _full_box,
        decode_mp4,
    )

    sizes = [10, 20, 30, 40, 50]
    mvhd = _full_box(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, 1000, 200)
                     + b"\x00" * 80)
    stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1)
                     + _box(b"avc1", b"\x00" * 78))
    stts = _full_box(b"stts", 0, 0, struct.pack(">III", 1, 5, 40))
    stsz = _full_box(b"stsz", 0, 0, struct.pack(">II", 0, 5)
                     + b"".join(struct.pack(">I", s) for s in sizes))
    # chunk 1: samples 1-2 at offset 1000; chunk 2: samples 3-5 at 5000
    stsc = _full_box(b"stsc", 0, 0,
                     struct.pack(">IIIIIII", 2, 1, 2, 1, 2, 3, 1))
    stco = _full_box(b"stco", 0, 0, struct.pack(">III", 2, 1000, 5000))
    m = decode_mp4(mvhd + stsd + stts + stsz + stsc + stco)
    assert list(m["sample_offsets"]) == [1000, 1010, 5000, 5030, 5070]
    assert list(m["sample_sizes"]) == sizes


def test_mp4_version1_boxes_and_malformed_tables():
    """Spec-valid VERSION-1 mvhd/tkhd (64-bit times) must parse to the
    same timescale/duration/dimensions as v0 (review finding: v1 tkhd
    width was read 8 bytes late; v1 mvhd was read with the v0 layout,
    yielding timescale=0 → ZeroDivisionError downstream). Malformed
    tables must raise descriptive ValueErrors at parse time, not
    IndexError/garbage later."""
    import struct

    import pytest

    from connect_smts_ray.ops.multimodal import (
        _box,
        _full_box,
        decode_mp4,
    )

    sizes = [10, 20, 30]
    # v1 mvhd: 8B creation + 8B modification, 4B timescale, 8B duration
    mvhd1 = _full_box(b"mvhd", 1, 0,
                      b"\x00" * 16 + struct.pack(">IQ", 1000, 120)
                      + b"\x00" * 80)
    # v1 tkhd: 8+8 times, 4 track, 4 reserved, 8 duration (32B), then
    # 8 reserved + 8 layer/alt/volume + 36 matrix, then 16.16 w/h
    tkhd1 = _full_box(b"tkhd", 1, 0,
                      b"\x00" * 32 + b"\x00" * 52
                      + struct.pack(">II", 320 << 16, 240 << 16))
    stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1)
                     + _box(b"avc1", b"\x00" * 78))
    stts = _full_box(b"stts", 0, 0, struct.pack(">III", 1, 3, 40))
    stsz = _full_box(b"stsz", 0, 0, struct.pack(">II", 0, 3)
                     + b"".join(struct.pack(">I", s) for s in sizes))
    stsc = _full_box(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 3, 1))
    stco = _full_box(b"stco", 0, 0, struct.pack(">II", 1, 1000))
    m = decode_mp4(mvhd1 + tkhd1 + stsd + stts + stsz + stsc + stco)
    assert (m["timescale"], m["duration"]) == (1000, 120)
    assert (m["width"], m["height"]) == (320, 240)
    assert list(m["sample_sizes"]) == sizes

    tail = stsd + stts + stsz + stsc + stco
    # zero timescale must raise at parse time (not ZeroDivisionError later)
    mvhd_zero = _full_box(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, 0, 0)
                          + b"\x00" * 80)
    with pytest.raises(ValueError, match="timescale"):
        decode_mp4(mvhd_zero + tail)

    mvhd0 = _full_box(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, 1000, 120)
                      + b"\x00" * 80)
    # stts claiming MORE samples than stsz holds → parse-time ValueError
    stts_bad = _full_box(b"stts", 0, 0, struct.pack(">III", 1, 5, 40))
    with pytest.raises(ValueError, match="stts sample total"):
        decode_mp4(mvhd0 + stsd + stts_bad + stsz + stsc + stco)

    # stsz count field overrunning its own box body → bounded-read error
    stsz_over = _full_box(b"stsz", 0, 0, struct.pack(">II", 0, 99)
                          + b"".join(struct.pack(">I", s) for s in sizes))
    with pytest.raises(ValueError, match="overruns its box body"):
        decode_mp4(mvhd0 + stsd + stts + stsz_over + stsc + stco)

    # stsc first run not starting at chunk 1 → undefined chunks rejected
    stsc_bad = _full_box(b"stsc", 0, 0, struct.pack(">IIII", 1, 2, 3, 1))
    stco2 = _full_box(b"stco", 0, 0, struct.pack(">III", 2, 1000, 2000))
    with pytest.raises(ValueError, match="chunk 1"):
        decode_mp4(mvhd0 + stsd + stts + stsz + stsc_bad + stco2)


# ---------------------------------------------------------------------------
# BFS hop distances
# ---------------------------------------------------------------------------

def test_bfs_hops_hand_graph(ray_session):
    """Path 0-1-2-3-4-5 plus an off-path triangle (10,11,12) and an
    isolated edge (20,21): hops from seed {0} must be exact, bounded by
    max_hops, and unreachable nodes absent."""
    import ray.data

    from connect_smts_ray.ops.graph import bfs_hops

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1, 2, 3, 4, 10, 11, 12, 20], pa.int64()),
        "dst": pa.array([1, 2, 3, 4, 5, 11, 12, 10, 21], pa.int64()),
    }))
    seeds = ray.data.from_arrow(
        pa.table({"node": pa.array([0], pa.int64())}))
    got = {r["node"]: r["hops"]
           for r in bfs_hops(edges, seeds, max_hops=3).take_all()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # 4,5 beyond max_hops

    # symmetrize: seed at the END of the path reaches backwards too
    seeds5 = ray.data.from_arrow(
        pa.table({"node": pa.array([5], pa.int64())}))
    got5 = {r["node"]: r["hops"]
            for r in bfs_hops(edges, seeds5, max_hops=2).take_all()}
    assert got5 == {5: 0, 4: 1, 3: 2}

    # duplicate seeds collapse; two seeds race — min distance wins
    seeds2 = ray.data.from_arrow(
        pa.table({"node": pa.array([0, 0, 5], pa.int64())}))
    got2 = {r["node"]: r["hops"]
            for r in bfs_hops(edges, seeds2, max_hops=5).take_all()}
    assert got2[0] == 0 and got2[5] == 0
    assert got2[2] == 2 and got2[3] == 2  # met in the middle
    assert 10 not in got2 and 20 not in got2


def test_bfs_hops_regimes_identical(ray_session):
    """Broadcast-frontier and partitioned-exchange BFS rounds return the
    identical (node, hops) table — including the mid-run handoff when
    the visited set outgrows the broadcast limit."""
    import ray.data

    from connect_smts_ray.ops.graph import bfs_hops

    # 3-regular-ish deterministic graph: 200 nodes, i -> (i*3+1)%200,
    # i -> (i*7+2)%200 — frontiers grow fast so a tiny limit forces the
    # broadcast -> distributed transition inside the loop.
    n = 200
    src = list(range(n)) * 2
    dst = [(i * 3 + 1) % n for i in range(n)] + \
          [(i * 7 + 2) % n for i in range(n)]
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
    }))
    seeds = ray.data.from_arrow(
        pa.table({"node": pa.array([0, 17], pa.int64())}))

    def run(limit):
        return sorted(
            (r["node"], r["hops"])
            for r in bfs_hops(edges, seeds, max_hops=4,
                              broadcast_limit=limit).take_all())

    pure_broadcast = run(10**9)
    pure_exchange = run(0)
    handoff = run(25)  # overflows after a round or two
    assert pure_broadcast == pure_exchange == handoff
    assert len(pure_broadcast) > 50  # the graph actually expanded


# ---------------------------------------------------------------------------
# Edit-distance join
# ---------------------------------------------------------------------------

def test_deletion_variants_complete_for_d1():
    """SymSpell completeness at d=1, checked exhaustively over a small
    alphabet: every pair with levenshtein ≤ 1 shares a deletion
    variant; every pair sharing a variant is within distance 2 (the
    verify step prunes those)."""
    from itertools import product

    from connect_smts_ray.ops.similarity import (
        _deletion_variants,
        levenshtein,
    )

    words = ["".join(t) for n in (1, 2, 3)
             for t in product("ab", repeat=n)]
    for a in words:
        va = _deletion_variants(a, 1)
        for b in words:
            d = levenshtein(a, b)
            shared = bool(va & _deletion_variants(b, 1))
            if d <= 1:
                assert shared, (a, b)
            if shared:
                assert d <= 2, (a, b)


def test_levenshtein_dp():
    from connect_smts_ray.ops.similarity import levenshtein

    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("flaw", "lawn") == 2


def test_edit_distance_join_matches_bruteforce(ray_session):
    """Engine candidates+verify vs a brute-force cross join on a word
    set with dist-0, dist-1 (sub/ins/del) and dist-2 pairs."""
    import ray.data

    from connect_smts_ray.ops.similarity import (
        edit_distance_join,
        levenshtein,
    )

    left = ["merge", "batch", "shard", "scan", "row"]
    right = ["merge", "merg", "merges", "barch", "shird", "scans",
             "rows", "xx", "scab"]
    lds = ray.data.from_arrow(pa.table({"w": pa.array(left)}))
    rds = ray.data.from_arrow(pa.table({"p": pa.array(right)}))
    got = sorted(
        (r["word_a"], r["word_b"], r["dist"])
        for r in edit_distance_join(lds, rds, "w", "p",
                                    max_dist=1).take_all())
    want = sorted(
        (a, b, levenshtein(a, b))
        for a in left for b in right if levenshtein(a, b) <= 1)
    assert got == want


def test_sssp_bounded_hand_graph(ray_session):
    """Weighted path 0→1→2 (1+1=2) vs direct heavy edge 0→2 (5): the
    two-edge path must win at K≥2 but NOT at K=1; a node first reached
    expensively must improve when a cheaper longer path fits the
    bound."""
    import ray.data

    from connect_smts_ray.ops.graph import sssp_bounded

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1, 0, 2], pa.int64()),
        "dst": pa.array([1, 2, 2, 3], pa.int64()),
        "weight": pa.array([1, 1, 5, 2], pa.int64()),
    }))
    seeds = ray.data.from_arrow(
        pa.table({"node": pa.array([0], pa.int64())}))

    got1 = {r["node"]: r["dist"]
            for r in sssp_bounded(edges, seeds, max_edges=1).take_all()}
    assert got1 == {0: 0, 1: 1, 2: 5}

    got2 = {r["node"]: r["dist"]
            for r in sssp_bounded(edges, seeds, max_edges=2).take_all()}
    assert got2 == {0: 0, 1: 1, 2: 2, 3: 7}

    got3 = {r["node"]: r["dist"]
            for r in sssp_bounded(edges, seeds, max_edges=3).take_all()}
    assert got3[3] == 4  # 0→1→2→3 = 1+1+2

    # symmetrize: distances flow backwards over undirected edges too
    seeds3 = ray.data.from_arrow(
        pa.table({"node": pa.array([3], pa.int64())}))
    back = {r["node"]: r["dist"]
            for r in sssp_bounded(edges, seeds3, max_edges=3).take_all()}
    assert back == {3: 0, 2: 2, 1: 3, 0: 4}


def test_sssp_bounded_regimes_identical(ray_session):
    """Broadcast-dist and partitioned-exchange Bellman-Ford rounds
    return the identical (node, dist) table — including the mid-run
    handoff when the dist table outgrows the broadcast limit."""
    import ray.data

    from connect_smts_ray.ops.graph import sssp_bounded

    # expander with deterministic non-uniform weights so cheap long
    # paths beat expensive short ones in several places
    n = 120
    src = list(range(n)) * 2
    dst = [(i * 5 + 3) % n for i in range(n)] + \
          [(i * 11 + 7) % n for i in range(n)]
    w = [(i % 7) + 1 for i in range(n)] + [(i % 3) + 2 for i in range(n)]
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
        "weight": pa.array(w, pa.int64()),
    }))
    seeds = ray.data.from_arrow(
        pa.table({"node": pa.array([0, 42], pa.int64())}))

    def run(limit):
        return sorted(
            (r["node"], r["dist"])
            for r in sssp_bounded(edges, seeds, max_edges=3,
                                  broadcast_limit=limit).take_all())

    pure_broadcast = run(10**9)
    pure_exchange = run(0)
    handoff = run(20)  # overflows after a round
    assert pure_broadcast == pure_exchange == handoff
    assert len(pure_broadcast) > 40


def test_interval_coverage_islands(ray_session):
    """Overlap-or-touch merges; a gap > duration starts a new island;
    many keys sharing ONE bucket stay segmented (num_partitions=1 forces
    every key through the same vectorized pass)."""
    import ray.data

    from connect_smts_ray.ops.relational import interval_coverage

    D = 10  # seconds; intervals [ts, ts+10s)
    rows = [
        (1, 0), (1, 5), (1, 10),   # chain: 0-10, 5-15, 10-20 → one island
        (1, 100),                  # far gap → second island
        (2, 0), (2, 11),           # 0-10 then 11-21: gap of 1us+ → 2 islands
        (3, 7),                    # single event, one island
    ]
    t = pa.table({
        "u": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * 1_000_000 for r in rows],
                       pa.timestamp("us")),
    })
    want = {
        1: (2, (20 + 10) * 1_000_000),   # island 0-20s + island 100-110s
        2: (2, 20 * 1_000_000),
        3: (1, 10 * 1_000_000),
    }
    for blocks in (1, 3):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = interval_coverage(ds, key_col="u", ts_col="ts",
                                duration_seconds=D, num_partitions=1)
        got = {r["u"]: (r["n_islands"], r["covered_us"])
               for r in out.take_all()}
        assert got == want, f"blocks={blocks}"


def test_interval_coverage_touching_merges(ray_session):
    """start == running end merges (half-open adjacency), start == end+1us
    does not."""
    import ray.data

    from connect_smts_ray.ops.relational import interval_coverage

    t = pa.table({
        "u": pa.array([1, 1, 2, 2], pa.int64()),
        "ts": pa.array([0, 1_000_000, 0, 1_000_001], pa.timestamp("us")),
    })
    ds = ray.data.from_arrow(t)
    out = interval_coverage(ds, key_col="u", ts_col="ts",
                            duration_seconds=1, num_partitions=2)
    got = {r["u"]: r["n_islands"] for r in out.take_all()}
    assert got == {1: 1, 2: 2}


def test_bloom_semi_join_exactness(ray_session):
    """The bloom prefilter + exact semi join equals a plain semi join even
    with a tiny bitmap (high FP rate) — false positives die in the exact
    pass, false negatives cannot exist."""
    import ray

    from connect_smts_ray.ops.components import (
        bloom_build,
        bloom_maybe_contains,
        hash_join,
    )

    keep = pa.table({"k": pa.array(list(range(0, 100, 7)), pa.int64())})
    big = pa.table({
        "k": pa.array(list(range(100)), pa.int64()),
        "v": pa.array([i * 2 for i in range(100)], pa.int64()),
    })
    keep_ds = ray.data.from_arrow(keep).materialize()
    bm = bloom_build(keep_ds, "k", bits=64, k=2)  # deliberately saturated

    def prefilter(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(bloom_maybe_contains(b.column("k"), bm,
                                                      bits=64, k=2)))

    cand = ray.data.from_arrow(big).repartition(4).map_batches(
        prefilter, batch_format="pyarrow")
    out = hash_join(
        cand, keep_ds, left_on="k", right_on="k", how="left_semi",
        left_schema=big.schema, right_schema=keep.schema)
    got = sorted(r["k"] for r in out.take_all())
    assert got == list(range(0, 100, 7))


def test_grouped_corr_exact(ray_session):
    """corr matches the closed-form moment formula (numpy cross-check);
    degenerate groups (n < 2, zero variance) emit NULL; layout-invariant."""
    import ray.data

    from connect_smts_ray.ops.relational import grouped_corr

    rows = {
        "pos": ([1, 2, 3, 4], [10, 20, 30, 40]),      # corr = +1
        "neg": ([1, 2, 3, 4], [40, 30, 20, 10]),      # corr = -1
        "mix": ([0, 1, 2, 3, 4], [5, 1, 4, 2, 8]),    # some value
        "one": ([7], [3]),                             # n < 2 → NULL
        "flat": ([5, 5, 5], [1, 2, 3]),                # zero x-var → NULL
    }
    ks, xs, ys = [], [], []
    for k, (x, y) in rows.items():
        ks += [k] * len(x)
        xs += x
        ys += y
    t = pa.table({
        "k": pa.array(ks, pa.string()),
        "x": pa.array(xs, pa.int64()),
        "y": pa.array(ys, pa.int64()),
    })
    want_mix = np.corrcoef(rows["mix"][0], rows["mix"][1])[0, 1]
    for blocks in (1, 4):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = {r["k"]: r["corr"] for r in grouped_corr(
            ds, key_col="k", x_col="x", y_col="y").take_all()}
        assert abs(out["pos"] - 1.0) < 1e-12
        assert abs(out["neg"] + 1.0) < 1e-12
        assert abs(out["mix"] - want_mix) < 1e-12
        assert out["one"] is None and out["flat"] is None, f"blocks={blocks}"
