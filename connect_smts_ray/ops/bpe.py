"""Distributed BPE tokenizer TRAINING (Sennrich, Haddow & Birch, ACL 2016
— "Neural Machine Translation of Rare Words with Subword Units").

The industrial shape: the CORPUS-scale pass is one combiner-first word
count (the token stream never leaves its blocks); training then iterates
over the DISTINCT-WORD table — bounded by vocabulary size (Zipf: ~10⁵–10⁶
rows even at 10-TB corpora), partitioned across the cluster. Each merge
iteration is

    pair-count partial per block (fully vectorized over the flattened
      symbol arrays — adjacent (left,right) int pairs weighted by word
      frequency, one Arrow group_by per block)
    → driver argmax over the per-block partials (count desc, then
      lexicographic (left,right) — the deterministic tie Sennrich uses)
    → one vectorized merge-application pass per block (greedy leftmost
      non-overlapping: within each run of consecutive candidate
      positions keep the alternating ones — exactly sequential BPE's
      exhaustive single-rule application)

Symbols are int32 ids into a driver-held vocab (strings never move after
init), so a merge round ships two ints down and ≤ |distinct pairs per
block| partial rows up. State on the driver: the vocab + merge list —
O(initial alphabet + num_merges), never the word table.

No SQL oracle — the per-iteration argmax data dependence is not
expressible in DuckDB SQL; correctness is pinned instead against a
pure-Python reference trainer (tests/test_bpe.py) and the driver records
the weaker rows-only check for the ``bpe_train_merges`` query.

Reference analog: none (engine op beyond the reference's surface).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _word_table(ds, text_col: str):
    """Corpus → distinct (word, count) Dataset — the only corpus-scale
    pass, combiner-first (ops/corpus.word_counts)."""
    from connect_smts_ray.ops.corpus import word_counts

    return word_counts(ds, text_col=text_col)


def _initial_alphabet(words) -> list:
    """Sorted distinct characters across the word table (one distributed
    pass; each block ships its ≤ |alphabet| distinct chars)."""
    def block_chars(b: pa.Table) -> pa.Table:
        chars = set()
        for w in b.column("word").to_pylist():
            chars.update(w)
        return pa.table({"ch": pa.array(sorted(chars), pa.string())})

    parts = words.map_batches(block_chars, batch_format="pyarrow").take_all()
    return sorted({r["ch"] for r in parts})


def _encode_words(char_id: dict):
    """Init pass: word string → list<int32> symbol ids. Python per
    DISTINCT word, once (vocab-bounded, not corpus-bounded)."""
    def f(b: pa.Table) -> pa.Table:
        syms = [[char_id[c] for c in w] for w in b.column("word").to_pylist()]
        return pa.table({
            "symbols": pa.array(syms, pa.list_(pa.int32())),
            "count": pc.cast(b.column("count"), pa.int64()),
        })
    return f


def _flat_parents(b: pa.Table):
    syms = b.column("symbols")
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    flat = syms.flatten().to_numpy(zero_copy_only=False).astype(np.int32)
    parent = pc.list_parent_indices(syms).to_numpy(zero_copy_only=False)
    return syms, flat, parent


def _pair_partial(b: pa.Table) -> pa.Table:
    """Adjacent symbol pairs of one block, weighted by word count — one
    vectorized pass + one Arrow group_by."""
    empty = pa.table({"l": pa.array([], pa.int32()),
                      "r": pa.array([], pa.int32()),
                      "w": pa.array([], pa.int64())})
    if not b.num_rows:
        return empty
    _, flat, parent = _flat_parents(b)
    if len(flat) < 2:
        return empty
    adj = parent[1:] == parent[:-1]
    if not adj.any():
        return empty
    counts = b.column("count").to_numpy(zero_copy_only=False)
    t = pa.table({
        "l": pa.array(flat[:-1][adj]),
        "r": pa.array(flat[1:][adj]),
        "w": pa.array(counts[parent[:-1][adj]].astype(np.int64)),
    })
    g = t.group_by(["l", "r"], use_threads=False).aggregate([("w", "sum")])
    return pa.table({"l": g.column("l"), "r": g.column("r"),
                     "w": g.column("w_sum")})


def _apply_merge(l: int, r: int, new_id: int):
    """One vectorized merge-application pass: greedy leftmost
    non-overlapping occurrences of (l, r) collapse to ``new_id``."""
    def f(b: pa.Table) -> pa.Table:
        if not b.num_rows:
            return b
        syms, flat, parent = _flat_parents(b)
        n = len(flat)
        if n < 2:
            return b
        cand = (flat[:-1] == l) & (flat[1:] == r) & (parent[:-1] == parent[1:])
        p = np.nonzero(cand)[0]
        if len(p) == 0:
            return b
        # runs of consecutive candidates (only possible when l == r —
        # overlapping pairs share a symbol): keep alternating positions
        # from each run start — identical to sequential left-to-right
        # single-rule application
        is_start = np.ones(len(p), dtype=bool)
        is_start[1:] = np.diff(p) != 1
        run_start = np.maximum.accumulate(np.where(is_start, p, 0))
        keep = p[(p - run_start) % 2 == 0]
        out = flat.copy()
        out[keep] = new_id
        remove = np.zeros(n, dtype=bool)
        remove[keep + 1] = True
        new_flat = out[~remove]
        per_word = np.bincount(parent, minlength=b.num_rows)
        merged_per_word = np.bincount(parent[keep], minlength=b.num_rows)
        new_lens = per_word - merged_per_word
        offsets = np.concatenate([[0], np.cumsum(new_lens)]).astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(new_flat, pa.int32()))
        return pa.table({"symbols": lists, "count": b.column("count")})
    return f


def bpe_train(ds, num_merges: int, text_col: str = "text",
              num_partitions: int = 16, min_pair_count: int = 2) -> pa.Table:
    """Learn ``num_merges`` BPE merge rules over a document corpus.

    Returns the merge table (rank BIGINT, left STRING, right STRING,
    merged STRING, pair_count BIGINT) — deterministic at any parallelism:
    pair sums are exact integers and the argmax tie-break is total
    (count desc, then (left, right) lexicographic). Stops early when no
    pair reaches ``min_pair_count``."""
    # materialize: the word table is consumed twice (alphabet + encode)
    # and is vocab-bounded, so pinning it avoids re-running the corpus
    # count pass
    words = _word_table(ds, text_col).repartition(num_partitions).materialize()
    alphabet = _initial_alphabet(words)
    vocab = list(alphabet)
    char_id = {c: i for i, c in enumerate(vocab)}
    # id <-> string stays a BIJECTION: merged symbols intern by string, so
    # two merge paths producing the same string (e.g. 'a'+'ba' and
    # 'ab'+'a' -> 'aba') share ONE id and their adjacency counts pool —
    # string identity is what the sequential reference trainer uses;
    # duplicate ids would split the counts and skew later argmaxes
    sym_id = dict(char_id)
    table = words.map_batches(_encode_words(char_id),
                              batch_format="pyarrow").materialize()

    merges = []
    for rank in range(num_merges):
        parts = table.map_batches(_pair_partial,
                                  batch_format="pyarrow").take_all()
        if not parts:
            break
        agg: dict = {}
        for row in parts:
            k = (row["l"], row["r"])
            agg[k] = agg.get(k, 0) + row["w"]
        if not agg:
            break
        best, best_w = None, -1
        for (li, ri), w in agg.items():
            key = (vocab[li], vocab[ri])
            if w > best_w or (w == best_w and key < best):
                best, best_w, best_ids = key, w, (li, ri)
        if best_w < min_pair_count:
            break
        merged_str = best[0] + best[1]
        new_id = sym_id.get(merged_str)
        if new_id is None:
            new_id = len(vocab)
            vocab.append(merged_str)
            sym_id[merged_str] = new_id
        merges.append((rank, best[0], best[1], merged_str, best_w))
        table = table.map_batches(
            _apply_merge(best_ids[0], best_ids[1], new_id),
            batch_format="pyarrow").materialize()

    return pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "merged": pa.array([m[3] for m in merges], pa.string()),
        "pair_count": pa.array([m[4] for m in merges], pa.int64()),
    })
