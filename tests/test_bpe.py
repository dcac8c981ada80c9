"""BPE trainer (ops/bpe.py) pinned against a pure-Python sequential
reference implementation of Sennrich et al. 2016 — same tokenization
(lowercase [a-z0-9]+ runs), same tie-break (count desc, then (left,
right) lexicographic), same greedy leftmost non-overlapping merge
application. The distributed trainer must reproduce the reference's
merge list EXACTLY at any block layout."""

import re

import numpy as np
import pyarrow as pa
import pytest


# ---------------------------------------------------------------- reference
def _ref_word_counts(texts):
    counts = {}
    for t in texts:
        if t is None:
            continue
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            counts[w] = counts.get(w, 0) + 1
    return counts


def _ref_apply(sym_words, pair, merged):
    """Greedy leftmost non-overlapping single-rule application."""
    out = []
    for syms in sym_words:
        new = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                new.append(merged)
                i += 2
            else:
                new.append(syms[i])
                i += 1
        out.append(new)
    return out


def _ref_bpe(texts, num_merges, min_pair_count=2):
    wc = _ref_word_counts(texts)
    words = sorted(wc)
    counts = [wc[w] for w in words]
    sym_words = [list(w) for w in words]
    merges = []
    for rank in range(num_merges):
        pairs = {}
        for syms, c in zip(sym_words, counts):
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        if pairs[best] < min_pair_count:
            break
        merged = best[0] + best[1]
        merges.append((rank, best[0], best[1], merged, pairs[best]))
        sym_words = _ref_apply(sym_words, best, merged)
    return merges


def _run(ray, texts, num_merges, parallelism, min_pair_count=2):
    from connect_smts_ray.ops.bpe import bpe_train

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(parallelism)
    t = bpe_train(ds, num_merges=num_merges, num_partitions=parallelism,
                  min_pair_count=min_pair_count)
    return list(zip(t.column("rank").to_pylist(),
                    t.column("left").to_pylist(),
                    t.column("right").to_pylist(),
                    t.column("merged").to_pylist(),
                    t.column("pair_count").to_pylist()))


def test_bpe_matches_reference_small(ray_session):
    texts = [
        "low lower lowest", "newer newer wider", "low low new",
        "the newest widest low", "new new newer",
    ]
    ref = _ref_bpe(texts, 12)
    got = _run(ray_session, texts, 12, parallelism=3)
    assert got == ref
    # sanity: merges actually compose multi-char units
    assert any(len(m[3]) >= 3 for m in ref)


def test_bpe_partition_invariance(ray_session):
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 12)))
             for _ in range(60)]
    ref = _ref_bpe(texts, 15)
    got1 = _run(ray_session, texts, 15, parallelism=1)
    got8 = _run(ray_session, texts, 15, parallelism=8)
    assert got1 == ref
    assert got8 == ref


def test_bpe_overlapping_same_symbol_runs(ray_session):
    # 'aaaa' exercises the l == r alternating-position path: leftmost
    # non-overlapping turns a a a a -> (aa)(aa), and 'aaa' -> (aa)a.
    texts = ["aaaa aaaa aaa", "aaaa aa", "aaa aaa"]
    ref = _ref_bpe(texts, 6, min_pair_count=1)
    got = _run(ray_session, texts, 6, parallelism=2, min_pair_count=1)
    assert got == ref


def test_bpe_early_stop_and_empty(ray_session):
    # Every word is a single distinct char: no pair ever reaches
    # min_pair_count=2 -> zero merges.
    got = _run(ray_session, ["a b", "c d"], 5, parallelism=2)
    assert got == []
    # Empty / null / punctuation-only corpus -> empty merge table, not a crash.
    got = _run(ray_session, ["", None, "!!!"], 3, parallelism=2)
    assert got == []


def test_bpe_tiebreak_is_lexicographic(ray_session):
    # 'ab' and 'ba' pairs appear with the SAME total count; the reference
    # picks ('a','b') < ('b','a'). Counts: 'abab' has ab,ab,ba; add one
    # extra 'ba' word so both pairs total 2 in distinct-word space... use
    # explicit construction: words 'ab' x2-count via two docs, 'ba' x2.
    texts = ["ab", "ab", "ba", "ba"]
    ref = _ref_bpe(texts, 1)
    got = _run(ray_session, texts, 1, parallelism=2)
    assert got == ref
    assert got[0][1:3] == ("a", "b")
