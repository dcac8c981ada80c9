"""Property-based tests (hypothesis) for the pure batch kernels whose
edge cases are easy to miss example-by-example: LWW winner selection
(dtype/tie corners), composite-key injectivity, repetition-stat bounds.
No Ray needed — these are plain pa.Table → pa.Table functions."""

from __future__ import annotations

import re

import pyarrow as pa
from hypothesis import given, settings, strategies as st

SET = settings(max_examples=40, deadline=None)


keys_st = st.lists(st.sampled_from(["a", "b", "c", "d"]),
                   min_size=1, max_size=40)


@given(keys=keys_st, data=st.data())
@SET
def test_lww_winner_matches_bruteforce(keys, data):
    """For random (key, order) rows: the winner per key is the max order,
    ties broken by LATEST input position — across signed ints (fast
    path) and uint64 (polars fallback)."""
    from connect_smts_ray.sinks.upsert import UpsertConfig, lww_winners

    n = len(keys)
    typ = data.draw(st.sampled_from(["int64", "uint64"]))
    lo, hi = (-50, 50) if typ == "int64" else (0, 100)
    orders = data.draw(st.lists(st.integers(lo, hi), min_size=n, max_size=n))
    t = pa.table({
        "k": pa.array(keys),
        "o": pa.array(orders, getattr(pa, typ)()),
        "row": pa.array(range(n), pa.int64()),
    })
    cfg = UpsertConfig(lake_dir="/tmp/unused_prop", key_columns=("k",),
                       order_columns=("o",))
    out = lww_winners(t, cfg)
    got = {r["k"]: r["row"] for r in out.to_pylist()}
    want = {}
    for i, (k, o) in enumerate(zip(keys, orders)):
        if k not in want or o >= orders[want[k]]:
            want[k] = i  # >= : later row wins ties
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.text(alphabet="ab:|\x1f", max_size=4),
                  st.text(alphabet="ab:|\x1f", max_size=4)),
        min_size=1, max_size=30,
    )
)
@SET
def test_composite_key_injective(rows):
    """Fused keys are equal IFF the key tuples are equal — no separator
    or length-prefix trickery can make ('a','bc') collide with ('ab','c')."""
    from connect_smts_ray.sinks.upsert import composite_key_array

    t = pa.table({
        "x": pa.array([r[0] for r in rows]),
        "y": pa.array([r[1] for r in rows]),
    })
    fused = composite_key_array(t, ("x", "y")).to_pylist()
    for i in range(len(rows)):
        for j in range(len(rows)):
            assert (fused[i] == fused[j]) == (rows[i] == rows[j]), (
                rows[i], rows[j]
            )


@given(texts=st.lists(
    st.text(alphabet="abc xyz0", max_size=30), min_size=1, max_size=20,
))
@SET
def test_repetition_stats_invariants(texts):
    """n_2grams == max(len(words)-1, 0) per doc; fractions in [0,1] and
    dup ≤ 1, top ≥ 1/n when grams exist; NULL fractions iff no grams."""
    from connect_smts_ray.ops.text import repetition_stats

    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    out = repetition_stats(t).to_pylist()
    word_re = re.compile(r"[a-z0-9]+")
    for row, text in zip(out, texts):
        words = word_re.findall(text.lower())
        expect_n = max(len(words) - 1, 0)
        assert row["n_2grams"] == expect_n, (text, words)
        if expect_n == 0:
            assert row["dup_2gram_frac"] is None
            assert row["top_2gram_frac"] is None
        else:
            assert 0.0 <= row["dup_2gram_frac"] <= 1.0
            assert 1.0 / expect_n <= row["top_2gram_frac"] <= 1.0


@given(
    vals=st.lists(
        st.one_of(st.integers(-2**62, 2**62), st.none()),
        min_size=1, max_size=30),
    extra_nulls=st.lists(st.booleans(), min_size=1, max_size=30),
)
@SET
def test_bucket_of_invariant_to_null_neighbors(vals, extra_nulls):
    """PROPERTY: a key's join bucket depends only on its VALUE, never on
    whether its batch happens to carry nulls (the Arrow→pandas float64
    coercion bug class, ninth review pass)."""
    from connect_smts_ray.ops.components import _bucket_of

    base = pa.chunked_array([pa.array(vals, pa.int64())])
    # same values with a different null layout appended
    padded = pa.chunked_array([pa.array(
        vals + [None if b else 1 for b in extra_nulls], pa.int64())])
    b1 = _bucket_of(base, 16).to_pylist()
    b2 = _bucket_of(padded, 16).to_pylist()[: len(vals)]
    for v, x, y in zip(vals, b1, b2):
        if v is not None:
            assert x == y, f"bucket of {v} changed with null neighbors"


@given(
    vals=st.lists(st.integers(0, 10**15), min_size=1, max_size=25,
                  unique=True),
    null_positions=st.lists(st.booleans(), min_size=1, max_size=25),
)
@SET
def test_bloom_never_false_negative_any_null_layout(vals, null_positions):
    """PROPERTY: every value inserted into the bloom — from blocks with
    arbitrary null layouts — must probe as maybe-present from probes with
    arbitrary null layouts (false positives allowed, negatives never)."""
    import numpy as np

    from connect_smts_ray.ops.components import (
        _bloom_hashes,
        bloom_maybe_contains,
    )

    bits, k = 1 << 12, 4
    bitmap = np.zeros(bits // 8, dtype=np.uint8)
    # build from a null-interleaved layout
    mixed = []
    for v, b in zip(vals, null_positions + [False] * len(vals)):
        if b:
            mixed.append(None)
        mixed.append(v)
    h1, h2 = _bloom_hashes(pa.array(mixed, pa.int64()))
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(bits)
        np.bitwise_or.at(bitmap, (idx >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
    # probe from a null-free layout AND a null-carrying one
    for probe in (pa.array(vals, pa.int64()),
                  pa.array([None] + vals, pa.int64())):
        mask = bloom_maybe_contains(probe, bitmap.tobytes(), bits=bits, k=k)
        present = [m for m, v in zip(mask, probe.to_pylist())
                   if v is not None]
        assert all(present), "bloom false negative"
