"""Unit tests for ops/corpus.py (vocab/tfidf/packing/quantiles/topk) and
the range join / centroid assignment — edge cases the driver parity sweep
does not construct (empty docs, tie boundaries, band straddling, ranges
with gaps)."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(ray, rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def test_word_counts_and_vocab(ray_session):
    from connect_smts_ray.ops.corpus import vocab_topk, word_counts

    ds = _docs_ds(ray_session, [
        (0, "a b a"), (1, "b c"), (2, ""), (3, None), (4, "A a"),
    ])
    wc = {r["word"]: r["count"] for r in word_counts(ds).take_all()}
    assert wc == {"a": 4, "b": 2, "c": 1}
    top = vocab_topk(ds, k=2).take_all()
    assert [(r["word"], r["count"]) for r in top] == [("a", 4), ("b", 2)]


def test_tfidf_rarity_ranking(ray_session):
    from connect_smts_ray.ops.corpus import tfidf_top_terms

    # 'rare' appears once in doc0 only (df=1, score 1); 'common' is in all
    # docs (df=3, score tf/3) — rare must outrank common at equal tf.
    ds = _docs_ds(ray_session, [
        (0, "common rare"), (1, "common x"), (2, "common y"),
    ])
    rows = tfidf_top_terms(ds, k_per_doc=1).take_all()
    by_doc = {r["doc_id"]: r for r in rows}
    assert by_doc[0]["term"] == "rare" and by_doc[0]["df"] == 1


def test_grouped_topk_ties_and_k_boundary(ray_session):
    from connect_smts_ray.ops.corpus import grouped_topk

    t = pa.table({
        "g": pa.array(["x"] * 4 + ["y"], pa.string()),
        "v": pa.array([5, 5, 5, 1, 9], pa.int64()),
        "id": pa.array([3, 1, 2, 0, 7], pa.int64()),
    })
    ds = ray_session.data.from_arrow(t)
    rows = grouped_topk(ds, ["g"], by="v", k=2, descending=True,
                        tiebreak=("id", True)).take_all()
    got = sorted((r["g"], r["v"], r["id"]) for r in rows)
    # x: among the three v=5 rows the two smallest ids win; y: its only row
    assert got == [("x", 5, 1), ("x", 5, 2), ("y", 9, 7)]


def test_group_quantiles_matches_numpy_disc(ray_session):
    from connect_smts_ray.ops.corpus import group_quantiles

    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    t = pa.table({
        "g": pa.array(["a"] * len(vals), pa.string()),
        "v": pa.array(vals, pa.int64()),
    })
    out = group_quantiles(
        ray_session.data.from_arrow(t), "g", "v", [0.5, 0.25]
    ).take_all()
    got = {r["q_pct"]: r["v"] for r in out}
    s = sorted(vals)
    # disc quantile = value at 1-indexed rank ceil(q*n)
    assert got == {50: s[int(np.ceil(0.5 * 8)) - 1],
                   25: s[int(np.ceil(0.25 * 8)) - 1]}


def test_group_quantiles_many_groups_one_bucket(ray_session):
    """Bucketed quantile reduce: many groups in one bucket — each group's
    ranks must resolve inside its own segment of the global CDF, with
    unequal group sizes and cross-group duplicate values."""
    from connect_smts_ray.ops.corpus import group_quantiles

    rng = np.random.RandomState(7)
    gs, vs = [], []
    sizes = {f"g{k:02d}": 3 + (k * 5) % 40 for k in range(30)}
    for g, sz in sizes.items():
        gs += [g] * sz
        vs += rng.randint(0, 25, size=sz).tolist()
    t = pa.table({"g": pa.array(gs, pa.string()),
                  "v": pa.array(vs, pa.int64())})
    out = group_quantiles(
        ray_session.data.from_arrow(t), "g", "v", [0.25, 0.5, 0.9],
        num_partitions=1,
    ).take_all()
    got = {(r["g"], r["q_pct"]): r["v"] for r in out}
    assert len(got) == 3 * len(sizes)
    by_g = {}
    for g, v in zip(gs, vs):
        by_g.setdefault(g, []).append(v)
    for g, xs in by_g.items():
        s = sorted(xs)
        for q, pct in ((0.25, 25), (0.5, 50), (0.9, 90)):
            want = s[max(1, int(np.ceil(q * len(s) - 1e-9))) - 1]
            assert got[(g, pct)] == want, (g, pct)


def test_pack_sequences_offsets_and_straddle(ray_session):
    from connect_smts_ray.ops.corpus import pack_sequences

    # range_size=2 forces multiple ranges; doc 2 straddles a boundary.
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 5], pa.int64()),  # gap at 4
        "n_tokens": pa.array([3, 4, 6, 0, 2], pa.int64()),
    })
    ds = ray_session.data.from_arrow(t).repartition(3)
    rows = sorted(pack_sequences(ds, seq_len=8, range_size=2).take_all(),
                  key=lambda r: r["doc_id"])
    off = [r["token_offset"] for r in rows]
    assert off == [0, 3, 7, 13, 13]
    spans = [(r["first_seq"], r["last_seq"]) for r in rows]
    # doc2: tokens 7..12 → seqs 0..1 (straddle); doc3 empty at offset 13
    assert spans == [(0, 0), (0, 0), (0, 1), (1, 1), (1, 1)]


def test_stratified_sample_matches_reference_hash(ray_session):
    import hashlib

    from connect_smts_ray.ops.corpus import stratified_sample

    t = pa.table({
        "doc_id": pa.array(list(range(200)), pa.int64()),
        "lang": pa.array((["en", "fr"] * 100), pa.string()),
    })
    rates = {"en": 30, "fr": 0}
    out = stratified_sample(
        ray_session.data.from_arrow(t), "lang", rates, id_col="doc_id"
    ).take_all()
    assert all(r["lang"] == "en" for r in out)
    expect = {
        i for i in range(0, 200, 2)
        if int.from_bytes(hashlib.md5(f"en|{i}".encode()).digest()[8:],
                          "little") % 100 < 30
    }
    assert {r["doc_id"] for r in out} == expect


def test_range_join_band_straddle(ray_session):
    from connect_smts_ray.ops.relational import range_join

    W = 100  # interval width == band width
    left = ray_session.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 2], pa.int64()),
        "lts": pa.array([50, 149, 150, 149], pa.int64()),
        "lid": pa.array([0, 1, 2, 3], pa.int64()),
    }))
    right = ray_session.data.from_arrow(pa.table({
        "rk": pa.array([1, 2], pa.int64()),
        "rts": pa.array([50, 150], pa.int64()),  # r0 straddles bands 0,1
        "rid": pa.array([10, 11], pa.int64()),
    }))
    ls = pa.schema([("k", pa.int64()), ("lts", pa.int64()),
                    ("lid", pa.int64())])
    rs = pa.schema([("rk", pa.int64()), ("rts", pa.int64()),
                    ("rid", pa.int64())])
    out = range_join(left, right, "k", "rk", "lts", "rts", W,
                     out_cols=["lid", "rid"], left_schema=ls,
                     right_schema=rs).take_all()
    pairs = sorted((r["lid"], r["rid"]) for r in out)
    # lid0 (t=50) and lid1 (t=149, other band) match r10=[50,150);
    # lid2 (t=150) is outside; lid3 (k=2, t=149) is before r11=[150,250)
    assert pairs == [(0, 10), (1, 10)]


def test_assign_to_centroids_ties_and_stats(ray_session):
    from connect_smts_ray.ops.similarity import (
        assign_to_centroids,
        cluster_stats,
    )

    vecs = [[1.0, 0.0], [0.0, 1.0], [0.7, 0.7], [-1.0, 0.0]]
    ds = ray_session.data.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    }))
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    assigned = assign_to_centroids(ds, cents).materialize()
    got = {r["vec_id"]: r["cluster"] for r in assigned.take_all()}
    # vec2 is equidistant → lowest centroid index wins
    assert got == {0: 0, 1: 1, 2: 0, 3: 1}
    stats = {r["cluster"]: (r["n"], r["min_id"], r["max_id"])
             for r in cluster_stats(assigned).take_all()}
    assert stats == {0: (2, 0, 2), 1: (2, 1, 3)}


def test_inverted_index_min_df_and_truncation(ray_session):
    from connect_smts_ray.ops.corpus import inverted_index

    docs = [(i, "common " + ("odd" if i % 2 else "even")) for i in range(12)]
    ds = _docs_ds(ray_session, docs)
    rows = inverted_index(ds, min_df=6, max_postings=3).take_all()
    got = {r["term"]: (r["df"], r["postings"]) for r in rows}
    assert got["common"] == (12, "0,1,2")
    assert got["even"] == (6, "0,2,4")
    assert got["odd"] == (6, "1,3,5")


def test_inverted_index_small_group_boundary(ray_session):
    """Regression: a per-block term group SMALLER than max_postings must
    not pull neighboring terms' doc ids into its partial posting list."""
    from connect_smts_ray.ops.corpus import inverted_index

    ds = _docs_ds(ray_session, [(0, "aaa zzz"), (1, "zzz"), (2, "aaa")])
    rows = inverted_index(ds, min_df=1, max_postings=5).take_all()
    got = {r["term"]: (r["df"], r["postings"]) for r in rows}
    assert got == {"aaa": (2, "0,2"), "zzz": (2, "0,1")}


def test_inverted_index_many_terms_one_bucket(ray_session):
    """The bucketed final reduce must segment correctly with MANY terms
    in one bucket (num_partitions=1): per-term df sums, min_df filtering
    BETWEEN surviving neighbors, and per-segment posting truncation."""
    from connect_smts_ray.ops.corpus import inverted_index

    # 50 terms t00..t49: term k appears in docs k..k+2 (df=3) except every
    # 7th term, which appears once (df=1) and must be filtered out
    docs = {}
    for k in range(50):
        term = f"t{k:02d}"
        reach = 1 if k % 7 == 0 else 3
        for d in range(k, k + reach):
            docs.setdefault(d, []).append(term)
    ds = _docs_ds(ray_session,
                  [(d, " ".join(ws)) for d, ws in sorted(docs.items())])
    rows = inverted_index(ds, min_df=2, max_postings=2,
                          num_partitions=1).take_all()
    got = {r["term"]: (r["df"], r["postings"]) for r in rows}
    assert len(got) == 50 - len([k for k in range(50) if k % 7 == 0])
    for k in range(50):
        term = f"t{k:02d}"
        if k % 7 == 0:
            assert term not in got
        else:
            assert got[term] == (3, f"{k},{k + 1}")


def test_normalize_and_redact(ray_session):
    from connect_smts_ray.ops.text import normalize_text, redact_pii

    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([
            '<div class="x"> Hello <b>world</b> </div>\n\n  done ',
            "mail bob.smith+x@corp.example.co, ip 192.168.1.1, "
            "call +44 (20) 7946-0958 now",
        ]),
    })
    ds = ray_session.data.from_arrow(t)
    clean = {r["doc_id"]: r["text_clean"] for r in ds.map_batches(
        normalize_text, batch_format="pyarrow").take_all()}
    assert clean[0] == "Hello world done"
    red = {r["doc_id"]: r["text_redacted"] for r in ds.map_batches(
        redact_pii, batch_format="pyarrow").take_all()}
    assert "[EMAIL]" in red[1] and "[IP]" in red[1] and "[PHONE]" in red[1]
    assert "bob" not in red[1] and "192.168" not in red[1]
    assert "7946" not in red[1]


def test_chunk_documents_edges(ray_session):
    from connect_smts_ray.ops.corpus import chunk_documents

    ds = _docs_ds(ray_session, [
        (0, "a" * 10),   # single short chunk
        (1, ""),          # empty → one empty chunk
        (2, None),        # null → dropped
        (3, "b" * 25),    # 10-char chunks, 4 overlap → step 6
    ])
    rows = chunk_documents(ds, chunk_chars=10, overlap=4).take_all()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_start"], r["chunk_text"]))
    assert by_doc[0] == [(0, 0, "a" * 10)]
    assert by_doc[1] == [(0, 0, "")]
    assert 2 not in by_doc
    # doc3: starts 0,6,12,18 — 18+10 >= 25 stops; last chunk is the tail
    assert [c[1] for c in sorted(by_doc[3])] == [0, 6, 12, 18]
    assert sorted(by_doc[3])[-1][2] == "b" * 7
    # overlap invariant: consecutive chunks share `overlap` chars
    assert sorted(by_doc[3])[0][2][-4:] == sorted(by_doc[3])[1][2][:4]


def test_kmeans_lloyd_converges_and_is_deterministic(ray_session):
    from connect_smts_ray.ops.similarity import kmeans_lloyd

    # Two well-separated blobs around (0,0) and (10,10); seeds one in each.
    pts = [[0.1 * i, 0.05 * i] for i in range(10)] + \
          [[10 + 0.1 * i, 10 - 0.05 * i] for i in range(10)]
    ds = ray_session.data.from_arrow(pa.table({
        "vec_id": pa.array(list(range(20)), pa.int64()),
        "embedding": pa.array(pts, pa.list_(pa.float32())),
    })).repartition(4)
    init = np.array([pts[0], pts[10]], dtype=np.float64)
    cents, assigned = kmeans_lloyd(ds, init, n_iter=3)
    got = {r["vec_id"]: r["cluster"] for r in assigned.take_all()}
    assert all(got[i] == 0 for i in range(10))
    assert all(got[i] == 1 for i in range(10, 20))
    # centroids = blob means (exact, float64 accumulation)
    expect0 = np.mean(np.asarray(pts[:10], dtype=np.float32), axis=0,
                      dtype=np.float64)
    assert np.allclose(cents[0], expect0, atol=1e-9)
    # re-run → identical (no RNG)
    cents2, _ = kmeans_lloyd(ds, init, n_iter=3)
    assert np.array_equal(cents, cents2)


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    from connect_smts_ray.ops.similarity import kmeans_lloyd

    pts = [[0.0, 0.0], [1.0, 1.0]]
    ds = ray_session.data.from_arrow(pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array(pts, pa.list_(pa.float32())),
    }))
    # far-away seed never wins a point → must keep its position
    init = np.array([[0.5, 0.5], [100.0, 100.0]])
    cents, _ = kmeans_lloyd(ds, init, n_iter=2)
    assert np.array_equal(cents[1], np.array([100.0, 100.0]))


def test_ngram_counts_doc_boundaries(ray_session):
    from connect_smts_ray.ops.corpus import ngram_counts

    ds = _docs_ds(ray_session, [(0, "a b c"), (1, "c a"), (2, "x")])
    got = {r["ngram"]: r["count"] for r in ngram_counts(ds, n=2).take_all()}
    # no cross-document bigram ("c"→"c" or "a"→"x"); single-word doc emits none
    assert got == {"a b": 1, "b c": 1, "c a": 1}


def test_incremental_exact_dedup_state(ray_session, tmp_path):
    from connect_smts_ray.ops.dedup import incremental_exact_dedup

    state = str(tmp_path / "seen")

    def ds_of(rows):
        return _docs_ds(ray_session, rows)

    # epoch 1: two distinct contents (8 survives as min-id dup winner)
    e1 = incremental_exact_dedup(
        ds_of([(8, "hello  world"), (9, "hello world"), (3, "other")]), state
    ).take_all()
    assert sorted(r["doc_id"] for r in e1) == [3, 8]
    # epoch 2: one already-seen (whitespace-normalized match), one new pair
    e2 = incremental_exact_dedup(
        ds_of([(20, "hello\nworld"), (21, "fresh"), (22, "fresh")]), state
    ).take_all()
    assert sorted(r["doc_id"] for r in e2) == [21]
    # epoch 3: everything seen → empty
    e3 = incremental_exact_dedup(
        ds_of([(30, "other"), (31, "fresh")]), state
    ).take_all()
    assert e3 == []


def test_train_val_test_split_deterministic(ray_session):
    """Assignments are a pure function of the id — identical across runs
    and layouts; fractions must sum to 100."""
    import ray.data

    from connect_smts_ray.ops.corpus import train_val_test_split

    t = pa.table({"doc_id": pa.array(range(1000), pa.int64())})
    a = train_val_test_split(ray.data.from_arrow(t)).take_all()
    b = train_val_test_split(
        ray.data.from_arrow(t).repartition(7)
    ).take_all()
    am = {r["doc_id"]: r["split"] for r in a}
    bm = {r["doc_id"]: r["split"] for r in b}
    assert am == bm
    from collections import Counter
    c = Counter(am.values())
    # ~90/5/5 within generous tolerance at n=1000
    assert 850 < c["train"] < 950 and c["val"] > 20 and c["test"] > 20

    with pytest.raises(ValueError):
        train_val_test_split(ray.data.from_arrow(t), pct=(80, 10, 5))


def test_ngram_contamination_oracle(ray_session):
    """Exact hit counts vs a brute-force Python oracle on a tiny corpus."""
    import ray.data

    from connect_smts_ray.ops.corpus import ngram_contamination

    corpus = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "the quick brown fox jumps",   # shares 'the quick brown' x1... and 'quick brown fox'
            "totally unrelated words here",
            "brown fox jumps over lazy",   # shares 'brown fox jumps'
        ]),
    })
    bench = pa.table({
        "doc_id": pa.array([10], pa.int64()),
        "text": pa.array(["the quick brown fox jumps over"]),
    })
    out = ngram_contamination(
        ray.data.from_arrow(corpus), ray.data.from_arrow(bench), n=3
    ).take_all()
    hits = {r["doc_id"]: r["n_hits"] for r in out}
    # doc 1: grams {the quick brown, quick brown fox, brown fox jumps} all in bench -> 3
    # doc 3: {brown fox jumps, fox jumps over} in bench -> 2
    assert hits == {1: 3, 3: 2}


def test_repetition_stats_edges(ray_session):
    """Empty / single-token / fully-repetitive docs, computed per batch."""
    from connect_smts_ray.ops.text import repetition_stats

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["", "word", "a b a b a b", "x y z w"]),
    })
    out = repetition_stats(t)
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows[1]["n_2grams"] == 0 and rows[1]["dup_2gram_frac"] is None
    assert rows[2]["n_2grams"] == 0
    # 'a b a b a b' -> grams [a b, b a, a b, b a, a b]: all 5 are repeats
    assert rows[3]["n_2grams"] == 5
    assert rows[3]["dup_2gram_tokens"] == 5
    assert rows[3]["top_2gram_count"] == 3
    assert rows[3]["dup_2gram_frac"] == 1.0
    # 'x y z w' -> 3 distinct grams, no repeats
    assert rows[4]["n_2grams"] == 3 and rows[4]["dup_2gram_tokens"] == 0
    assert rows[4]["top_2gram_frac"] == 1.0 / 3.0


def test_global_shuffle_rank_dense_and_stable(ray_session):
    """Ranks are a dense 0..n-1 permutation, identical across block
    layouts, and match a driver-side sort by the same md5 key."""
    import hashlib

    import ray.data

    from connect_smts_ray.ops.corpus import global_shuffle_rank

    ids = list(range(300))
    t = pa.table({"doc_id": pa.array(ids, pa.int64())})
    out = global_shuffle_rank(
        ray.data.from_arrow(t).repartition(5), seed="s", num_buckets=16
    ).take_all()
    got = {r["doc_id"]: r["shuffle_rank"] for r in out}
    assert sorted(got.values()) == ids  # dense permutation
    expected_order = sorted(
        ids, key=lambda v: (hashlib.md5(f"s{v}".encode()).hexdigest(), v)
    )
    assert got == {v: i for i, v in enumerate(expected_order)}
    # block-layout independence
    out2 = global_shuffle_rank(
        ray.data.from_arrow(t).repartition(11), seed="s", num_buckets=64
    ).take_all()
    assert {r["doc_id"]: r["shuffle_rank"] for r in out2} == got


def test_token_rarity_tiny_oracle(ray_session):
    """Hand-checked corpus: freqs the=3, cat=2, dog=1."""
    import ray.data

    from connect_smts_ray.ops.corpus import token_rarity

    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["the cat the dog", "the cat"]),
    })
    out = token_rarity(ray.data.from_arrow(t).materialize()).take_all()
    rows = {r["doc_id"]: r for r in out}
    # doc 1: the(3)+cat(2)+the(3)+dog(1) = 9 over 4 tokens
    assert rows[1]["n_tokens"] == 4 and rows[1]["sum_freq"] == 9
    assert rows[1]["mean_freq"] == 9 / 4
    # doc 2: the(3)+cat(2) = 5 over 2
    assert rows[2]["sum_freq"] == 5 and rows[2]["mean_freq"] == 2.5


def test_export_shards_resume(ray_session, tmp_path):
    """Exactly-once export: a second run skips every committed shard; a
    shard whose manifest is destroyed is rewritten byte-identically; reads
    see only committed shards."""
    import os

    import ray.data

    from connect_smts_ray.ops.export import export_shards, read_shards

    t = pa.table({
        "doc_id": pa.array(list(range(100)), pa.int64()),
        "lang": pa.array(["en"] * 100),
    })
    out = str(tmp_path / "export")

    def run():
        return {
            r["shard"]: r
            for r in export_shards(
                ray.data.from_arrow(t).repartition(7), out, num_shards=4
            ).take_all()
        }

    first = run()
    assert sorted(first) == [0, 1, 2, 3]
    assert not any(r["skipped"] for r in first.values())
    assert sum(r["n_rows"] for r in first.values()) == 100
    files = {
        k: open(os.path.join(out, f"shard={k}", "data.parquet"), "rb").read()
        for k in first
    }

    second = run()
    assert all(r["skipped"] for r in second.values())
    assert {k: r["n_rows"] for k, r in second.items()} == \
        {k: r["n_rows"] for k, r in first.items()}

    # destroy one shard's manifest -> only that shard rewrites, same bytes
    os.remove(os.path.join(out, "shard=2", "_MANIFEST.json"))
    third = run()
    assert not third[2]["skipped"]
    assert all(third[k]["skipped"] for k in (0, 1, 3))
    assert open(os.path.join(out, "shard=2", "data.parquet"), "rb").read() \
        == files[2]

    # destroy one shard's DATA file but keep its manifest -> the manifest
    # alone is not trusted: the shard re-executes (and read_shards never
    # surfaces the unverified shard while the data file is gone)
    os.remove(os.path.join(out, "shard=1", "data.parquet"))
    assert read_shards(out).count() == 100 - first[1]["n_rows"]
    fourth = run()
    assert not fourth[1]["skipped"]
    assert all(fourth[k]["skipped"] for k in (0, 2, 3))
    assert open(os.path.join(out, "shard=1", "data.parquet"), "rb").read() \
        == files[1]

    back = read_shards(out)
    assert back.count() == 100


def test_bloom_prefilter_no_false_negatives(ray_session):
    """Bloom guarantees: every inserted value tests positive; absent
    values are mostly negative (fp rate sane at this sizing)."""
    import ray.data

    from connect_smts_ray.ops.components import (
        bloom_build,
        bloom_maybe_contains,
    )

    present = [f"gram-{i}" for i in range(2000)]
    absent = [f"other-{i}" for i in range(2000)]
    ds = ray.data.from_arrow(
        pa.table({"gram": pa.array(present)})
    ).repartition(5)
    bm = bloom_build(ds, "gram", bits=1 << 16, k=4)
    assert bloom_maybe_contains(
        pa.array(present), bm, bits=1 << 16
    ).all(), "false negative!"
    fp = bloom_maybe_contains(pa.array(absent), bm, bits=1 << 16).mean()
    assert fp < 0.15, f"fp rate {fp}"

    # non-string columns: hash_pandas_object ignores hash_key for numeric
    # dtypes, so the two hash streams must be made independent by the
    # string-cast path — no false negatives AND a sane fp rate
    nums = ray.data.from_arrow(
        pa.table({"v": pa.array(list(range(2000)), pa.int64())})
    ).repartition(3)
    bmn = bloom_build(nums, "v", bits=1 << 16, k=4)
    assert bloom_maybe_contains(
        pa.array(list(range(2000)), pa.int64()), bmn, bits=1 << 16
    ).all()
    fpn = bloom_maybe_contains(
        pa.array(list(range(10_000, 12_000)), pa.int64()), bmn, bits=1 << 16
    ).mean()
    assert fpn < 0.15, f"numeric fp rate {fpn}"

    # malformed sizing is rejected, not silently truncated
    with pytest.raises(ValueError, match="multiple of 8"):
        bloom_build(nums, "v", bits=1001)
    with pytest.raises(ValueError, match="multiple of 8"):
        bloom_maybe_contains(pa.array([1]), bmn, bits=1001)
    with pytest.raises(ValueError, match="bitmap holds"):
        bloom_maybe_contains(pa.array([1]), bmn[:10], bits=1 << 16)


def test_hll_approx_distinct_bounds(ray_session):
    """HLL estimate within ~3σ of truth at p=12 (σ ≈ 1.04/64 ≈ 1.6%);
    merge order must not change the sketch."""
    import numpy as np
    import ray.data

    from connect_smts_ray.ops.sketch import (
        approx_distinct,
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    n = 50_000
    vals = pa.array([f"v{i}" for i in range(n)])
    ds = ray.data.from_arrow(pa.table({"x": vals})).repartition(9)
    est = approx_distinct(ds, "x", p=12)
    assert abs(est - n) / n < 0.05, est

    # associativity/commutativity of the merge
    a = hll_registers(pa.array([f"v{i}" for i in range(0, n, 2)]))
    b = hll_registers(pa.array([f"v{i}" for i in range(1, n, 2)]))
    assert (hll_merge(a, b) == hll_merge(b, a)).all()
    est2 = hll_estimate(hll_merge(a, b))
    assert abs(est2 - est) / n < 0.01  # same sketch as the whole-set build

    # duplicates do not move the estimate
    dup = ray.data.from_arrow(
        pa.table({"x": pa.array([f"v{i % 100}" for i in range(10_000)])})
    ).repartition(4)
    est3 = approx_distinct(dup, "x", p=12)
    assert abs(est3 - 100) / 100 < 0.10, est3


def test_duplicated_span_stats_hot_gram_and_truth(ray_session):
    """Brute-force truth on a corpus with one corpus-wide hot gram (every
    doc shares it — the skew case: a single gram's occurrences all land
    in ONE bucket) plus per-doc unique spans; short docs emit nothing."""
    import ray.data

    from connect_smts_ray.ops.corpus import duplicated_span_stats

    docs = {
        0: "alpha beta gamma alpha beta gamma",   # internal repeat: distinct
        1: "alpha beta gamma delta one",
        2: "xx yy zz alpha beta gamma",
        3: "one two",                              # < 3 words: no grams
        4: None,                                   # null text: no grams
        5: "solo unique words here only",
    }
    tbl = {"doc_id": list(docs), "text": list(docs.values())}
    ds = ray.data.from_items(
        [{"doc_id": k, "text": v} for k, v in docs.items()]).repartition(3)

    # brute force
    def grams(t):
        import re
        ws = re.findall(r"[a-z0-9]+", (t or "").lower())
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    gsets = {k: grams(v) for k, v in docs.items()}
    from collections import Counter
    df = Counter(g for s in gsets.values() for g in s)
    want = {k: (len(s), sum(1 for g in s if df[g] >= 2))
            for k, s in gsets.items() if s}

    out = duplicated_span_stats(ds, n=3, num_partitions=4)
    got = {r["doc_id"]: (r["n_grams"], r["n_dup_grams"])
           for r in out.take_all()}
    assert got == want
    assert 3 not in got and 4 not in got
    # the hot gram 'alpha beta gamma' is duplicated across docs 0,1,2
    assert got[0][1] >= 1 and got[1][1] >= 1 and got[2][1] >= 1


def test_grouped_hll_parallelism_invariant(ray_session):
    """grouped_hll_register_table must be identical at any block layout
    (register max is order-free), and each group's estimate must track
    its true distinct count at p=8 (~6.5% typical error)."""
    import pyarrow as pa
    import ray.data

    from connect_smts_ray.ops.sketch import (
        grouped_hll_register_table,
        hll_estimate_from_table,
    )

    rows = [{"g": f"t{i % 3}", "v": f"u{(i * 7) % (300 * (1 + i % 3))}"}
            for i in range(9000)]
    rows.append({"g": None, "v": "skipme"})
    rows.append({"g": "t0", "v": None})

    def run(parts):
        ds = ray.data.from_items(rows).repartition(parts)
        return grouped_hll_register_table(ds, "g", "v", p=8) \
            .to_pandas().sort_values(["group", "reg"]).reset_index(drop=True)

    t1, t8 = run(1), run(8)
    assert t1.equals(t8)

    import collections
    truth = collections.defaultdict(set)
    for r in rows:
        if r["g"] is not None and r["v"] is not None:
            truth[r["g"]].add(r["v"])
    for g, vals in truth.items():
        sub = t8[t8["group"] == g][["reg", "max_rank"]]
        est = hll_estimate_from_table(pa.Table.from_pandas(sub), p=8)
        assert abs(est - len(vals)) / len(vals) < 0.25


def test_weighted_sample_deterministic(ray_session):
    """A-ES winners equal an independent NumPy-free recomputation of
    -ln(u)/w, at any parallelism; weight ≤ 0 / null rows never qualify."""
    import hashlib
    import math

    import ray.data

    from connect_smts_ray.ops.corpus import weighted_sample

    ids = list(range(1, 41))
    weights = [(i % 7) * 10 or None for i in ids]  # some None, rest > 0
    weights[3] = 0  # and an explicit zero
    t = pa.table({
        "id": pa.array(ids, pa.int64()),
        "w": pa.array(weights, pa.int64()),
    })

    def score(i, w):
        h = int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:],
                           "little") >> 1
        u = (h + 1.0) / 9223372036854775808.0
        return -math.log(u) / w

    eligible = [(score(i, w), i) for i, w in zip(ids, weights)
                if w is not None and w > 0]
    want = sorted(i for _, i in sorted(eligible)[:10])

    for blocks in (1, 5):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = weighted_sample(ds, id_col="id", weight_col="w", k=10)
        got = sorted(r["id"] for r in out.take_all())
        assert got == want, f"blocks={blocks}"
