"""Corpus-level text ops for LLM training-data pipelines: vocabulary,
TF-IDF, inverted index, sequence packing, grouped top-k, exact grouped
quantiles, stratified sampling.

Reference analog: none (the reference is a CDC SMT library,
`smt/DebeziumJsonDeserializer.java` etc.); these are the north-star
training-data operators the engine adds (SURVEY §2.4 spirit). Every op is
a composition of vectorized ``map_batches`` partials + one bounded
``groupby`` — the combiner-before-shuffle shape that holds at 100 TB:

- ``word_counts``      per-block Arrow split/explode/group_by partial →
                       one (word, partial_count) row per word per block
                       crosses the shuffle, never the corpus itself.
- ``tfidf_top_terms``  (doc, term, tf) × (term, df) via the reduce-side
                       ``hash_join`` on term, then per-doc top-k with a
                       per-block partial — no driver materialization.
- ``pack_sequences``   distributed prefix sum: per-range token subtotals
                       (tiny groupby) → driver cumsum over ranges (one row
                       per range, NOT per doc) → broadcast base offsets →
                       exact per-doc offsets inside each range group.
- ``grouped_topk``     per-block per-group partial top-k combiner, then a
                       final per-group reduce — generalizes relational.topk.
- ``group_quantiles``  exact (not sketch) quantiles from a (group, value)
                       value-count table: the combiner collapses blocks to
                       distinct values, so the shuffle moves counts, not
                       rows.

Tokenization everywhere: lowercase, ``[a-z0-9]+`` runs (DuckDB mirror:
``regexp_extract_all(lower(text), '[a-z0-9]+')``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_WORD_SPLIT = "[^a-z0-9]+"


def _explode_words(batch: pa.Table, id_col: str, text_col: str):
    """(doc ids, words) — lowercase [a-z0-9]+ runs, fully Arrow-vectorized
    (split on the complement regex, flatten with parent indices, drop the
    empty strings the split emits at boundaries)."""
    text = pc.utf8_lower(batch.column(text_col))
    lists = pc.split_pattern_regex(
        pc.coalesce(text, pa.scalar("")), _WORD_SPLIT
    )
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    parents = pc.list_parent_indices(lists)
    words = pc.list_flatten(lists)
    keep = pc.not_equal(words, pa.scalar(""))
    ids = pc.take(batch.column(id_col), pc.filter(parents, keep))
    return ids, pc.filter(words, keep)


def word_counts(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Corpus-wide word frequencies as a Dataset (word, count).

    Per-block partial count (Arrow group_by) → groupby(word).sum — the
    shuffle carries one row per DISTINCT word per block (Zipf makes that
    tiny next to the token stream)."""

    def partial(batch: pa.Table) -> pa.Table:
        _, words = _explode_words(batch, id_col, text_col)
        t = pa.table({"word": words})
        g = t.group_by("word", use_threads=False).aggregate([([], "count_all")])
        return pa.table({
            "word": g.column("word"),
            "count": pc.cast(g.column("count_all"), pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby("word").sum("count")
    return agg.map_batches(
        lambda b: pa.table({
            "word": b.column("word"),
            "count": pc.cast(b.column("sum(count)"), pa.int64()),
        }),
        batch_format="pyarrow",
    )


def vocab_topk(ds, k: int = 50, text_col: str = "text",
               id_col: str = "doc_id"):
    """Top-k vocabulary by corpus frequency (count desc, word asc ties)."""
    from connect_smts_ray.ops.relational import topk

    wc = word_counts(ds, text_col=text_col, id_col=id_col)
    return topk(wc, by="count", k=k, descending=True, tiebreak=("word", True))


def term_doc_counts(ds, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, term, tf) — complete per block because a document's text
    lives in exactly one row."""

    def per_block(batch: pa.Table) -> pa.Table:
        ids, words = _explode_words(batch, id_col, text_col)
        t = pa.table({id_col: ids, "term": words})
        g = t.group_by([id_col, "term"], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return pa.table({
            id_col: g.column(id_col),
            "term": g.column("term"),
            "tf": pc.cast(g.column("count_all"), pa.int64()),
        })

    return ds.map_batches(per_block, batch_format="pyarrow")


def doc_frequencies(td, id_col: str = "doc_id", num_partitions: int = 16):
    """(term, df) from a term_doc_counts Dataset. Per-block partial (each
    (doc, term) pair is unique, so counting rows per term per block is a
    valid df combiner) → groupby(term).sum."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("term", use_threads=False).aggregate(
            [([], "count_all")]
        )
        return pa.table({
            "term": g.column("term"),
            "df": pc.cast(g.column("count_all"), pa.int64()),
        })

    partials = td.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby("term").sum("df")
    return agg.map_batches(
        lambda b: pa.table({
            "term": b.column("term"),
            "df": pc.cast(b.column("sum(df)"), pa.int64()),
        }),
        batch_format="pyarrow",
    )


def tfidf_top_terms(ds, k_per_doc: int = 3, id_col: str = "doc_id",
                    text_col: str = "text", num_partitions: int = 16):
    """Per document, the top-k terms by tf·idf with idf = 1/df (rarity
    weighting; a single small-int division, bit-identical between numpy and
    SQL ``tf * 1.0 / df`` — no transcendental whose libm rounding could
    flip a rank). Ties → term asc. Output (doc_id, term, tf, df).

    Shape: term_doc table ⋈ df table on term (reduce-side hash_join, one
    shuffle) → per-doc top-k via ``grouped_topk`` (per-block partial, one
    more bounded shuffle). Nothing touches the driver.
    """
    td = term_doc_counts(ds, id_col=id_col, text_col=text_col)
    td = td.materialize()  # consumed twice (df agg + join probe)
    df_ds = doc_frequencies(td, id_col=id_col, num_partitions=num_partitions)
    from connect_smts_ray.ops.relational import auto_join

    td_schema = pa.schema([(id_col, pa.int64()), ("term", pa.string()),
                           ("tf", pa.int64())])
    df_schema = pa.schema([("term", pa.string()), ("df", pa.int64())])
    # auto_join: the (term, df) side is the VOCABULARY — Zipf-sublinear in
    # corpus size — so it broadcasts and the fat exploded td table never
    # shuffles. That also keeps each document's rows co-located in their
    # original block, so grouped_topk's per-block partial already reduces
    # to the final per-doc top-k and its shuffle carries only k rows/doc.
    # A vocabulary above the broadcast limit falls back to the hash
    # exchange (one td shuffle) automatically.
    joined = auto_join(
        td, df_ds, on="term", num_partitions=num_partitions,
        left_schema=td_schema, right_schema=df_schema,
    )

    def add_score(batch: pa.Table) -> pa.Table:
        tf = batch.column("tf").to_numpy(zero_copy_only=False).astype("float64")
        dfv = batch.column("df").to_numpy(zero_copy_only=False).astype("float64")
        return batch.append_column(
            pa.field("score", pa.float64()), pa.array(tf / dfv)
        )

    scored = joined.map_batches(add_score, batch_format="pyarrow")
    top = grouped_topk(
        scored, group_cols=[id_col], by="score", k=k_per_doc,
        descending=True, tiebreak=("term", True),
    )
    return top.map_batches(
        lambda b: b.select([id_col, "term", "tf", "df"]),
        batch_format="pyarrow",
    )


def inverted_index(ds, min_df: int = 2, max_postings: int = 10,
                   id_col: str = "doc_id", text_col: str = "text",
                   num_partitions: int = 16):
    """Posting lists: per term with df ≥ min_df, the first ``max_postings``
    doc ids ascending, rendered as a comma-joined string (SQL mirror:
    ``string_agg(... ORDER BY doc_id)`` over a ranked CTE). Output
    (term, df, postings).

    Hot-term safe: each block pre-combines to (term, partial_df, its own
    smallest ``max_postings`` ids) — so a stop-word that appears in every
    document ships one bounded row per block through the shuffle instead
    of its full posting list, and the grouped reduce merges partials, not
    raw (term, doc) pairs."""
    td = term_doc_counts(ds, id_col=id_col, text_col=text_col)

    def block_partial(batch: pa.Table) -> pa.Table:
        # fully segmented (no Python loop over term runs — this combiner
        # runs on EVERY block): sort, segment on term change, df = run
        # lengths, posting prefix = rank-within-run < max_postings
        # assembled as a ListArray straight from offsets
        n = batch.num_rows
        if n == 0:
            return pa.table({
                "term": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "ids": pa.array([], pa.list_(pa.int64())),
            })
        s = batch.sort_by([("term", "ascending"), (id_col, "ascending")])
        terms = s.column("term").to_numpy(zero_copy_only=False)
        ids = s.column(id_col).to_numpy(zero_copy_only=False)
        new_seg = np.ones(n, dtype=bool)
        new_seg[1:] = terms[1:] != terms[:-1]
        seg = np.cumsum(new_seg) - 1
        starts = np.flatnonzero(new_seg)
        df = np.diff(np.append(starts, n)).astype(np.int64)
        rank = np.arange(n) - starts[seg]
        keep = rank < max_postings
        kept = np.minimum(df, max_postings)
        offsets = np.zeros(len(starts) + 1, dtype=np.int32)
        np.cumsum(kept, out=offsets[1:])
        return pa.table({
            "term": pa.array(terms[starts], pa.string()),
            "df": pa.array(df, pa.int64()),
            "ids": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                pa.array(ids[keep].astype(np.int64), pa.int64())),
        })

    partials = td.map_batches(block_partial, batch_format="pyarrow")

    empty = pa.table({
        "term": pa.array([], pa.string()),
        "df": pa.array([], pa.int64()),
        "postings": pa.array([], pa.string()),
    })

    def per_bucket(group: pa.Table) -> pa.Table:
        # Bucketed final reduce (one Python call per BUCKET, not per term
        # — the r4 per-term map_groups was one call per vocabulary entry):
        # sort the bucket's partials by term, segment on term change, df =
        # segmented sum, postings = the ascending-sorted flattened id list
        # of each surviving segment truncated to max_postings.
        n = group.num_rows
        if n == 0:
            return empty
        s = group.sort_by([("term", "ascending")])
        terms = s.column("term").to_numpy(zero_copy_only=False)
        dfv = s.column("df").to_numpy(zero_copy_only=False)
        new_seg = np.ones(n, dtype=bool)
        new_seg[1:] = terms[1:] != terms[:-1]
        seg = np.cumsum(new_seg) - 1
        n_seg = int(seg[-1]) + 1
        df_sum = np.bincount(seg, weights=dfv, minlength=n_seg).astype(
            np.int64)
        keep = df_sum >= min_df
        if not keep.any():
            return empty
        ids_col = s.column("ids").combine_chunks()
        flat = pc.list_flatten(ids_col).to_numpy(zero_copy_only=False)
        pseg = seg[pc.list_parent_indices(ids_col).to_numpy()]
        m = keep[pseg]
        flat, pseg = flat[m], pseg[m]
        order = np.lexsort((flat, pseg))
        flat, pseg = flat[order], pseg[order]
        # rank within segment → keep the first max_postings ids of each
        new_p = np.ones(len(pseg), dtype=bool)
        new_p[1:] = pseg[1:] != pseg[:-1]
        starts = np.flatnonzero(new_p)
        rank = np.arange(len(pseg)) - starts[np.cumsum(new_p) - 1]
        tk = rank < max_postings
        flat, pseg = flat[tk], pseg[tk]
        joined = (pd.Series(flat.astype(str))
                  .groupby(pseg, sort=True).agg(",".join))
        kept_seg = joined.index.to_numpy()
        first_row = np.flatnonzero(new_seg)  # first partial row per segment
        return pa.table({
            "term": pa.array(terms[first_row[kept_seg]], pa.string()),
            "df": pa.array(df_sum[kept_seg], pa.int64()),
            "postings": pa.array(joined.to_numpy(), pa.string()),
        })

    from connect_smts_ray.ops.relational import _add_key_bucket

    return (
        partials.map_batches(_add_key_bucket("term", num_partitions),
                             batch_format="pyarrow")
        .groupby("__bucket").map_groups(
            lambda g: per_bucket(g.drop_columns(["__bucket"])),
            batch_format="pyarrow")
    )


def grouped_topk(ds, group_cols, by: str, k: int, descending: bool = True,
                 tiebreak=None, num_partitions: int = 32):
    """Per-group top-k without materializing groups: every block first
    reduces to its own per-group top-k (the combiner — at most k rows per
    group per block cross the shuffle), then groups hash-BUCKET and each
    bucket runs the same segmented rank-within-group pass once — one
    Python call per bucket, never per group (the r4 final sorted and
    sliced each group in its own map_groups call). ``tiebreak`` =
    (col, ascending)."""
    order = [(by, "descending" if descending else "ascending")]
    if tiebreak is not None:
        col, asc = tiebreak
        order.append((col, "ascending" if asc else "descending"))

    def block_partial(batch: pa.Table) -> pa.Table:
        s = batch.sort_by([(c, "ascending") for c in group_cols] + order)
        # per-group head-k via rank-within-group, vectorized: group change
        # points → running index reset at each boundary
        n = s.num_rows
        if n == 0:
            return s
        keys = [s.column(c) for c in group_cols]
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for key in keys:
            a = key.to_numpy(zero_copy_only=False)
            change[1:] |= a[1:] != a[:-1]
        idx = np.arange(n)
        start = np.maximum.accumulate(np.where(change, idx, 0))
        rank = idx - start
        return s.filter(pa.array(rank < k))

    partials = ds.map_batches(block_partial, batch_format="pyarrow")

    def add_bucket(batch: pa.Table) -> pa.Table:
        # polynomial combine (not plain xor: equal-valued columns would
        # cancel to 0 and collapse every row into one bucket)
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for c in group_cols:
                h = h * np.uint64(1000003) ^ pd.util.hash_pandas_object(
                    batch.column(c).to_pandas(), index=False).to_numpy()
        part = (h % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column(
            pa.field("__gbucket", pa.int32()), pa.array(part, pa.int32()))

    def per_bucket(group: pa.Table) -> pa.Table:
        # same segmented rank pass as the combiner, now over the bucket's
        # complete per-group partials → the global per-group top-k
        return block_partial(group.drop_columns(["__gbucket"]))

    return (
        partials.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__gbucket").map_groups(per_bucket, batch_format="pyarrow")
    )


def sample_k_per_group(ds, group_cols, id_col: str, k: int):
    """EXACT-k deterministic per-group sample: rank every row by the md5
    of its id (``md5_number_lower`` convention — a uniform, seedless,
    SQL-mirrorable permutation) and keep each group's ``k`` smallest.
    Unlike rate-based ``stratified_sample`` this guarantees the sample
    SIZE per group (the eval-set / few-shot-pool contract), stays
    identical at any parallelism, and rides ``grouped_topk``'s
    combiner-first shape: at most k rows per group per block shuffle.

    Reference analog: none (engine op beyond the reference's surface).
    """
    from connect_smts_ray.core.hashing import md5_rank64

    def add_rank(b: pa.Table) -> pa.Table:
        ids = pc.cast(b.column(id_col), pa.string()).to_pylist()
        rk = md5_rank64(ids)  # md5_number_lower // 2 — core/hashing.py
        return b.append_column(pa.field("__rk", pa.int64()), pa.array(rk))

    ranked = ds.map_batches(add_rank, batch_format="pyarrow")
    out = grouped_topk(ranked, list(group_cols), by="__rk", k=k,
                       descending=False, tiebreak=(id_col, True))
    return out.map_batches(lambda b: b.drop_columns(["__rk"]),
                           batch_format="pyarrow")


def group_quantiles(ds, group_col: str, value_col: str, qs,
                    num_partitions: int = 16):
    """EXACT discrete quantiles per group (DuckDB ``quantile_disc``
    semantics: the value at 1-indexed rank ``ceil(q·n)``, i.e. the smallest
    value whose cumulative count reaches q·n). Output
    (group, q_pct int, value).

    Scale shape: per-block (group, value) → count partial collapses each
    block to its distinct values; the groupby moves VALUE COUNTS, and the
    per-group quantile scan runs over the distinct-value CDF, not the rows.

    NULL values are ignored (quantile_disc semantics). A group whose
    values are ALL null is omitted from the output entirely (SQL would
    emit it with NULL quantiles) — filter such groups upstream if they
    must appear.
    """
    qs = list(qs)

    def partial(batch: pa.Table) -> pa.Table:
        # drop NULL values up front: quantile_disc ignores NULLs, so a
        # (group, NULL) CDF entry would both inflate every rank base and
        # let q=1.0 land on the NULL (sorted last) instead of the max
        batch = batch.filter(pc.is_valid(batch.column(value_col)))
        t = pa.table({
            group_col: batch.column(group_col),
            value_col: batch.column(value_col),
        })
        g = t.group_by([group_col, value_col], use_threads=False).aggregate(
            [([], "count_all")]
        )
        return pa.table({
            group_col: g.column(group_col),
            value_col: g.column(value_col),
            "n": pc.cast(g.column("count_all"), pa.int64()),
        })

    counts = ds.map_batches(partial, batch_format="pyarrow")

    def per_bucket(group: pa.Table) -> pa.Table:
        # Bucketed final reduce (one Python call per bucket, not per
        # group): sort by (group, value), collapse duplicate (group,
        # value) partials with reduceat, then answer every quantile with
        # ONE searchsorted over the global cumulative-count array — a
        # rank inside group g maps to global target offset(g) + rank, and
        # the non-decreasing global cumsum makes the found index land
        # inside g's segment.
        n_rows = group.num_rows
        if n_rows == 0:
            return pa.table({
                group_col: group.column(group_col),
                "q_pct": pa.array([], pa.int64()),
                value_col: group.column(value_col),
            })
        s = group.sort_by([(group_col, "ascending"),
                           (value_col, "ascending")])
        gv = s.column(group_col).to_numpy(zero_copy_only=False)
        vv = s.column(value_col).to_numpy(zero_copy_only=False)
        ns = s.column("n").to_numpy(zero_copy_only=False)
        new_gv = np.ones(n_rows, dtype=bool)
        new_gv[1:] = (gv[1:] != gv[:-1]) | (vv[1:] != vv[:-1])
        idx = np.flatnonzero(new_gv)          # collapsed → original row
        cnt = np.add.reduceat(ns, idx)
        g2 = gv[idx]
        new_g = np.ones(len(idx), dtype=bool)
        new_g[1:] = g2[1:] != g2[:-1]
        gstart = np.flatnonzero(new_g)
        gcum = np.cumsum(cnt)
        offset = np.where(gstart > 0, gcum[gstart - 1], 0)
        gend = np.append(gstart[1:], len(idx)) - 1
        n_group = gcum[gend] - offset
        take_group, take_value, out_q = [], [], []
        for q in qs:
            rank = np.maximum(
                1, np.ceil(q * n_group - 1e-9).astype(np.int64))
            pos = np.searchsorted(gcum, offset + rank, side="left")
            take_group.append(idx[gstart])    # first row of each group
            take_value.append(idx[pos])
            out_q.append(np.full(len(gstart), int(round(q * 100)),
                                 dtype=np.int64))
        tg = pa.array(np.concatenate(take_group))
        tv = pa.array(np.concatenate(take_value))
        return pa.table({
            group_col: s.column(group_col).take(tg),
            "q_pct": pa.array(np.concatenate(out_q)),
            value_col: s.column(value_col).take(tv),
        })

    from connect_smts_ray.ops.relational import _add_key_bucket

    return (
        counts.map_batches(_add_key_bucket(group_col, num_partitions),
                           batch_format="pyarrow")
        .groupby("__bucket").map_groups(
            lambda g: per_bucket(g.drop_columns(["__bucket"])),
            batch_format="pyarrow")
    )


def stratified_sample(ds, group_col: str, rates: dict, id_col: str,
                      default_pct: int = 0, salt: str = ""):
    """Per-group deterministic Bernoulli sample: keep rows where
    ``md5(salt ∥ group ∥ '|' ∥ id) % 100 < rates[group]`` (little-endian
    uint64 of md5 bytes 8..16 — DuckDB ``md5_number_lower``). Identical
    across runs, block layouts and cluster sizes; stateless filter."""

    def keep(batch: pa.Table) -> pa.Table:
        groups = batch.column(group_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        mask = []
        for g, i in zip(groups, ids):
            pct = rates.get(g, default_pct)
            h = int.from_bytes(
                hashlib.md5(f"{salt}{g}|{i}".encode()).digest()[8:], "little"
            )
            mask.append(h % 100 < pct)
        return batch.filter(pa.array(mask, type=pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")


def pack_sequences(ds, seq_len: int, id_col: str = "doc_id",
                   token_col: str = "n_tokens", range_size: int = 1024):
    """Sequence packing for LLM pretraining: documents are concatenated in
    ``id_col`` order into one token stream and chunked into fixed
    ``seq_len`` sequences; each doc gets its global ``token_offset`` and
    the [first_seq, last_seq] span it lands in.

    Distributed prefix sum (the scan never sees the corpus on the driver):

    1. per-doc token counts → per-RANGE subtotals (range = id_col //
       range_size; a groupby over n_docs / range_size rows),
    2. driver cumsum over the tiny range-subtotal table → broadcast base
       offsets (at 10^10 docs pick range_size so ranges ≲ 10^6),
    3. per-range grouped reduce: exclusive cumsum within the range + its
       base offset = exact global offset.

    Output (doc_id, n_tokens, token_offset, first_seq, last_seq).
    """
    import ray

    def with_range(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        rng = pc.divide(ids, pa.scalar(range_size, pa.int64()))
        return batch.append_column(pa.field("__range", pa.int64()),
                                   pc.cast(rng, pa.int64()))

    base = ds.map_batches(with_range, batch_format="pyarrow").materialize()

    subtotals = base.groupby("__range").sum(token_col)
    sub = subtotals.to_pandas().sort_values("__range")
    csum = sub[f"sum({token_col})"].cumsum().shift(1, fill_value=0)
    base_offsets = dict(zip(sub["__range"].astype(int), csum.astype(int)))
    ref = ray.put(base_offsets)

    def per_range(group: pa.Table) -> pa.Table:
        offsets = ray.get(ref)
        s = group.sort_by([(id_col, "ascending")])
        n = s.column(token_col).to_numpy(zero_copy_only=False).astype("int64")
        rid = int(s.column("__range")[0].as_py())
        off = int(offsets[rid]) + np.concatenate(([0], np.cumsum(n)[:-1]))
        first = off // seq_len
        last = np.where(n > 0, (off + np.maximum(n, 1) - 1) // seq_len, first)
        return pa.table({
            id_col: s.column(id_col),
            token_col: pa.array(n, pa.int64()),
            "token_offset": pa.array(off, pa.int64()),
            "first_seq": pa.array(first.astype("int64"), pa.int64()),
            "last_seq": pa.array(last.astype("int64"), pa.int64()),
        })

    return base.groupby("__range").map_groups(per_range, batch_format="pyarrow")


def chunk_documents(ds, chunk_chars: int, overlap: int = 0,
                    id_col: str = "doc_id", text_col: str = "text"):
    """RAG-style fixed-size chunking with overlap: doc text → chunks of
    ``chunk_chars`` characters, consecutive chunks sharing ``overlap``
    chars; the last chunk keeps the tail (may be short). Emits
    (id_col, chunk_id, chunk_text, chunk_start). Stateless flat-map shape —
    each batch explodes independently, chunk ids are per-document (not
    global), so the op is embarrassingly parallel at any corpus size.

    SQL mirror: ``generate_series`` over chunk starts + ``substr``.
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be < chunk_chars")
    step = chunk_chars - overlap

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_cid, out_txt, out_start = [], [], [], []
        for i, txt in zip(ids, texts):
            if txt is None:
                continue
            n = len(txt)
            starts = range(0, max(n, 1), step)
            for cid, s in enumerate(starts):
                out_id.append(i)
                out_cid.append(cid)
                out_txt.append(txt[s:s + chunk_chars])
                out_start.append(s)
                if s + chunk_chars >= n:
                    break
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            "chunk_id": pa.array(out_cid, pa.int64()),
            "chunk_text": pa.array(out_txt, pa.string()),
            "chunk_start": pa.array(out_start, pa.int64()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def ngram_counts(ds, n: int = 2, text_col: str = "text",
                 id_col: str = "doc_id"):
    """Corpus-wide n-gram frequencies (tokens = the standard [a-z0-9]+
    runs, n-grams joined with single spaces). Same combiner shape as
    ``word_counts``: each block counts its own n-grams (complete per block
    — a doc's text lives in one row), so the groupby moves one row per
    distinct n-gram per block."""

    def partial(batch: pa.Table) -> pa.Table:
        ids, words = _explode_words(batch, id_col, text_col)
        idv = ids.to_numpy(zero_copy_only=False)
        m = len(idv)
        if m < n:
            return pa.table({
                "ngram": pa.array([], pa.string()),
                "count": pa.array([], pa.int64()),
            })
        # vectorized window join: numpy unicode array + char.add; a window
        # is kept only when its first and last token share a doc (ids are
        # contiguous per doc, so endpoints imply the middle)
        wv = np.asarray(words.to_pylist(), dtype=object)
        grams = wv[: m - n + 1]
        for j in range(1, n):
            grams = grams + " "
            grams = grams + wv[j: m - n + 1 + j]
        keep = idv[: m - n + 1] == idv[n - 1:]
        t = pa.table({"ngram": pa.array(grams[keep].tolist(), pa.string())})
        g = t.group_by("ngram", use_threads=False).aggregate(
            [([], "count_all")]
        )
        return pa.table({
            "ngram": g.column("ngram"),
            "count": pc.cast(g.column("count_all"), pa.int64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby("ngram").sum("count")
    return agg.map_batches(
        lambda b: pa.table({
            "ngram": b.column("ngram"),
            "count": pc.cast(b.column("sum(count)"), pa.int64()),
        }),
        batch_format="pyarrow",
    )


def train_val_test_split(ds, id_col: str = "doc_id",
                         pct=(90, 5, 5), salt: str = "split"):
    """Deterministic hash-addressed train/val/test assignment: bucket =
    md5(salt ∥ '|' ∥ id) % 100 (little-endian uint64 of md5 bytes 8..16 —
    DuckDB ``md5_number_lower``), buckets [0, pct₀) → train,
    [pct₀, pct₀+pct₁) → val, rest → test. Stable across runs, block
    layouts and cluster sizes; a stateless per-batch map, no shuffle —
    the standard reproducible-split shape for training corpora."""
    if sum(pct) != 100:
        raise ValueError("pct must sum to 100")
    lo_train, lo_val = pct[0], pct[0] + pct[1]

    def assign(batch: pa.Table) -> pa.Table:
        out = []
        for i in batch.column(id_col).to_pylist():
            h = int.from_bytes(
                hashlib.md5(f"{salt}|{i}".encode()).digest()[8:], "little"
            )
            b = h % 100
            out.append("train" if b < lo_train
                       else "val" if b < lo_val else "test")
        return batch.append_column(
            pa.field("split", pa.string()), pa.array(out, pa.string())
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def doc_ngram_windows(batch: pa.Table, n: int, id_col: str = "doc_id",
                      text_col: str = "text") -> pa.Table:
    """Distinct (doc_id, gram) word n-grams of each document in a batch —
    the vectorized window join of ``ngram_counts`` plus a per-batch
    distinct. Complete per block because a doc's text lives in one row."""
    id_type = batch.schema.field(id_col).type  # don't assume int64
    ids, words = _explode_words(batch, id_col, text_col)
    idv = ids.to_numpy(zero_copy_only=False)
    m = len(idv)
    empty = pa.table({
        id_col: pa.array([], id_type),
        "gram": pa.array([], pa.string()),
    })
    if m < n:
        return empty
    wv = np.asarray(words.to_pylist(), dtype=object)
    grams = wv[: m - n + 1]
    for j in range(1, n):
        grams = grams + " "
        grams = grams + wv[j: m - n + 1 + j]
    keep = idv[: m - n + 1] == idv[n - 1:]
    if not keep.any():
        return empty
    t = pa.table({
        id_col: pa.array(idv[: m - n + 1][keep].tolist(), id_type),
        "gram": pa.array(grams[keep].tolist(), pa.string()),
    })
    g = t.group_by([id_col, "gram"], use_threads=False).aggregate([])
    return g


def duplicated_span_stats(ds, n: int = 5, id_col: str = "doc_id",
                          text_col: str = "text",
                          num_partitions: int = 16, min_df: int = 2):
    """Cross-document duplicated n-gram spans — the distributed
    approximation of suffix-array span dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a span
    is *duplicated* when the same word ``n``-gram occurs in ≥ ``min_df``
    distinct documents. Returns (doc_id, n_grams, n_dup_grams) — per doc,
    its distinct-gram count and how many of those are corpus-duplicated;
    a curation pass drops or trims docs with high ``n_dup/n`` ratios.

    Shape: docs explode to per-doc DISTINCT (doc_id, gram) rows inside
    their own blocks (doc_ngram_windows); ONE hash shuffle on the gram
    buckets every occurrence of a gram together, and each bucket resolves
    df + per-doc partials fully vectorized (group_by census → index_in
    gather → group_by partial, no per-gram Python — hot grams inflate a
    bucket's row count, never its kernel count); a final tiny groupby
    sums partials per doc. At corpus scale the gram STRING is the shuffle
    payload — swap in the 8-byte md5 fingerprint (md5_number convention)
    to cut bytes moved ~5×; the string form is kept here for the exact
    DuckDB mirror.

    Reference analog: none (engine op beyond the reference's surface).
    """
    from ray.data.aggregate import Sum

    from connect_smts_ray.ops.relational import _add_key_bucket

    bucketer = _add_key_bucket("gram", num_partitions)

    def explode(b: pa.Table) -> pa.Table:
        return bucketer(doc_ngram_windows(b, n, id_col, text_col))

    def per_bucket(g: pa.Table) -> pa.Table:
        census = g.select(["gram"]).group_by(
            "gram", use_threads=False).aggregate([([], "count_all")])
        pos = pc.index_in(g.column("gram"), census.column("gram"))
        d = census.column("count_all").take(pos)
        dup = pc.cast(pc.greater_equal(d, pa.scalar(min_df)), pa.int64())
        part = pa.table({id_col: g.column(id_col), "dup": dup}) \
            .group_by(id_col, use_threads=False) \
            .aggregate([("dup", "sum"), ([], "count_all")])
        return pa.table({
            id_col: part.column(id_col),
            "n_grams": pc.cast(part.column("count_all"), pa.int64()),
            "n_dup_grams": part.column("dup_sum"),
        })

    out = (ds.map_batches(explode, batch_format="pyarrow")
             .groupby("__bucket")
             .map_groups(per_bucket, batch_format="pyarrow")
             .groupby(id_col)
             .aggregate(Sum("n_grams"), Sum("n_dup_grams")))
    return out.map_batches(
        lambda b: pa.table({
            id_col: b.column(id_col),
            "n_grams": b.column("sum(n_grams)"),
            "n_dup_grams": b.column("sum(n_dup_grams)"),
        }),
        batch_format="pyarrow")


def ngram_contamination(corpus_ds, benchmark_ds, n: int = 5,
                        id_col: str = "doc_id", text_col: str = "text",
                        num_partitions: int = 16,
                        id_type: pa.DataType = pa.int64(),
                        bloom_bits: int = 1 << 20):
    """Benchmark decontamination: per corpus document, the number of
    DISTINCT word ``n``-grams it shares with ANY benchmark document
    (docs with ``n_hits > 0`` are contaminated and would be dropped
    before training). Returns Dataset (doc_id, n_hits), hits only.

    Shape: both sides explode to distinct (doc, gram) rows inside their
    own blocks (no driver pass); a reduce-side LEFT SEMI hash join on the
    gram string keeps only corpus grams present in the benchmark set; one
    grouped count per doc. The benchmark gram table is usually tiny next
    to the corpus but the semi join never assumes it fits anywhere.

    A broadcast Bloom filter over the benchmark grams (``bloom_bits``
    bits; 0 disables) prefilters corpus grams INSIDE each map task before
    the shuffle — at corpus scale almost no gram matches a benchmark, so
    the semi join's left side shrinks from the whole gram stream to the
    (tiny) maybe-matching set. False positives only, so the exact semi
    join downstream keeps correctness; the filter itself is built
    distributed (one small bitmap per block → driver OR)."""
    import ray

    from connect_smts_ray.ops.components import (
        bloom_build,
        bloom_maybe_contains,
        hash_join,
    )

    corpus_grams = corpus_ds.map_batches(
        lambda b: doc_ngram_windows(b, n, id_col, text_col),
        batch_format="pyarrow",
    )
    # materialize: the bloom build and the join both consume this side
    bench_grams = benchmark_ds.map_batches(
        lambda b: doc_ngram_windows(b, n, id_col, text_col)
        .select(["gram"]),
        batch_format="pyarrow",
    ).materialize()
    if bloom_bits:
        bitmap_ref = ray.put(bloom_build(bench_grams, "gram",
                                         bits=bloom_bits))

        def prefilter(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            mask = bloom_maybe_contains(
                batch.column("gram"), ray.get(bitmap_ref), bits=bloom_bits
            )
            return batch.filter(pa.array(mask))

        corpus_grams = corpus_grams.map_batches(
            prefilter, batch_format="pyarrow"
        )
    hits = hash_join(
        corpus_grams, bench_grams, left_on="gram", right_on="gram",
        how="left_semi", num_partitions=num_partitions,
        left_schema=pa.schema([(id_col, id_type), ("gram", pa.string())]),
        right_schema=pa.schema([("gram", pa.string())]),
    )
    agg = hits.groupby(id_col).count()
    return agg.map_batches(
        lambda b: pa.table({
            id_col: b.column(id_col),
            "n_hits": pc.cast(b.column("count()"), pa.int64()),
        }),
        batch_format="pyarrow",
    )


def token_rarity(ds, id_col: str = "doc_id", text_col: str = "text",
                 num_partitions: int = 16):
    """Perplexity-proxy scoring under the corpus's own unigram model: per
    document, the total and mean corpus-wide frequency of its tokens (docs
    made of globally rare tokens — gibberish, OCR noise — score low; see
    Wenzek et al. 2020, CCNet, which filters on LM scores the same way).

    Fully distributed two-pass shape that holds at corpus scale:

    1. ``word_counts`` — combiner-first global (word, count),
    2. ``term_doc_counts`` — per-block (doc, term, tf),
    3. reduce-side ``hash_join`` on the term (never a driver vocabulary),
    4. per-doc grouped sum of ``tf`` and ``tf·count``.

    All-integer sums with ONE final IEEE division (``sum_freq/n_tokens``),
    so the DuckDB mirror is bit-exact. Input ``ds`` is consumed by both
    passes — pass a materialized Dataset to avoid plan re-execution.
    """
    from connect_smts_ray.ops.components import hash_join

    wc = word_counts(ds, text_col=text_col, id_col=id_col)
    td = term_doc_counts(ds, id_col=id_col, text_col=text_col)
    joined = hash_join(
        td, wc, left_on="term", right_on="word", how="inner",
        num_partitions=num_partitions,
        left_schema=pa.schema([(id_col, pa.int64()), ("term", pa.string()),
                               ("tf", pa.int64())]),
        right_schema=pa.schema([("word", pa.string()),
                                ("count", pa.int64())]),
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            id_col: batch.column(id_col),
            "n_tokens": batch.column("tf"),
            "sum_freq": pc.multiply(batch.column("tf"),
                                    batch.column("count")),
        })
        g = t.group_by(id_col, use_threads=False).aggregate(
            [("n_tokens", "sum"), ("sum_freq", "sum")]
        )
        return pa.table({
            id_col: g.column(id_col),
            "n_tokens": pc.cast(g.column("n_tokens_sum"), pa.int64()),
            "sum_freq": pc.cast(g.column("sum_freq_sum"), pa.int64()),
        })

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby(id_col).sum(["n_tokens", "sum_freq"])

    def final(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("sum(n_tokens)"), pa.int64())
        s = pc.cast(batch.column("sum(sum_freq)"), pa.int64())
        mean = pc.divide(pc.cast(s, pa.float64()), pc.cast(n, pa.float64()))
        return pa.table({
            id_col: batch.column(id_col),
            "n_tokens": n,
            "sum_freq": s,
            "mean_freq": mean,
        })

    return agg.map_batches(final, batch_format="pyarrow")


def global_shuffle_rank(ds, id_col: str = "doc_id", seed: str = "s",
                        num_buckets: int = 256):
    """Deterministic global shuffle with an explicit, dense, 0-based rank:
    rows are ordered by ``md5(seed ∥ id)`` (tie-break: id), the standard
    content-addressed shuffle for training-data export — identical across
    runs, block layouts and cluster sizes, and resumable (a re-run assigns
    the same rank to every row).

    Distributed zip-with-index (Ray Data has no rank primitive; a naive
    global sort + driver enumerate would materialize the corpus):

    1. key + bucket (top 8 hex bits of the md5) per row,
    2. per-bucket counts — ONE tiny groupby (≤ num_buckets rows),
    3. driver prefix-sum over bucket counts → broadcast base offsets,
    4. per-bucket grouped reduce: sort by (key, id) inside the bucket,
       rank = base_offset + arange.

    The md5 keys are uniform, so bucket sizes are balanced (≈ n/buckets);
    at 10^10 rows raise ``num_buckets`` so a bucket fits one task.
    Output: (id_col, shuffle_rank).
    """
    import ray

    if num_buckets > 65536:
        raise ValueError("num_buckets must fit the md5 prefix (≤ 65536)")
    # RANGE partitioning on the 16-bit md5 prefix: bucket b holds a
    # contiguous key range, so base_offset(b) + in-bucket position IS the
    # global rank (a modulo here would interleave key ranges and break it).
    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        keys = [hashlib.md5(f"{seed}{v}".encode()).hexdigest() for v in ids]
        buckets = [int(k[:4], 16) * num_buckets // 65536 for k in keys]
        return pa.table({
            id_col: batch.column(id_col),
            "__key": pa.array(keys, pa.string()),
            "__bucket": pa.array(buckets, pa.int64()),
        })

    keyed = ds.map_batches(add_key, batch_format="pyarrow").materialize()
    counts = keyed.groupby("__bucket").count().to_pandas() \
        .sort_values("__bucket")
    csum = counts["count()"].cumsum().shift(1, fill_value=0)
    offsets = dict(zip(counts["__bucket"].astype(int), csum.astype(int)))
    ref = ray.put(offsets)

    def per_bucket(group: pa.Table) -> pa.Table:
        base = int(ray.get(ref)[int(group.column("__bucket")[0].as_py())])
        s = group.sort_by([("__key", "ascending"), (id_col, "ascending")])
        return pa.table({
            id_col: s.column(id_col),
            "shuffle_rank": pa.array(
                base + np.arange(s.num_rows, dtype=np.int64), pa.int64()
            ),
        })

    return keyed.groupby("__bucket").map_groups(
        per_bucket, batch_format="pyarrow"
    )


def weighted_sample(ds, id_col: str, weight_col: str, k: int):
    """Deterministic weighted sample WITHOUT replacement (Efraimidis–
    Spirakis A-ES): each row draws u ∈ (0, 1] from the md5 of its id
    (``md5_number_lower`` convention — seedless, uniform, SQL-mirrorable),
    scores ``-ln(u) / w`` (an Exponential(rate=w) variate — the smaller
    the score the luckier the row, proportionally to its weight), and the
    k SMALLEST scores win. P(row in sample) is exactly the A-ES
    weighted-reservoir law; rows with weight ≤ 0 or null never qualify.

    Scale shape: the score is a per-batch vectorized pass; selection is
    the global ``topk`` (each block keeps its local k, one tiny final
    reduce) — nothing but 2k candidate rows ever crosses a block
    boundary. The float ln() is computed identically (IEEE double) on
    the SQL side; a last-ulp libm disagreement would need two scores
    within ~1e-15 relative to flip the cut, vanishing for non-adversarial
    ids (ties inside the engine break on the id).

    Reference analog: none (engine op beyond the reference's surface).
    """
    from connect_smts_ray.core.hashing import md5_rank64

    from connect_smts_ray.ops.relational import topk

    def add_score(b: pa.Table) -> pa.Table:
        w = pc.cast(b.column(weight_col), pa.float64())
        keep = pc.fill_null(pc.greater(w, 0.0), False)
        b = b.filter(keep)
        if b.num_rows == 0:
            return b.append_column(
                pa.field("__score", pa.float64()),
                pa.array([], pa.float64()))
        ids = pc.cast(b.column(id_col), pa.string()).to_pylist()
        h = md5_rank64(ids)  # md5_number_lower // 2 — core/hashing.py
        # float64(h + 1) exactly as the oracle's BIGINT + 1 converts —
        # float64(h) + 1.0 differs by 1 ulp whenever h (> 2^53) sits on
        # a rounding boundary (~1/512 of ids); integer add FIRST
        u = (h + 1).astype(np.float64) / 9223372036854775808.0
        wv = pc.cast(b.column(weight_col), pa.float64()).to_numpy(
            zero_copy_only=False)
        score = -np.log(u) / wv
        return b.append_column(pa.field("__score", pa.float64()),
                               pa.array(score, pa.float64()))

    scored = ds.map_batches(add_score, batch_format="pyarrow")
    out = topk(scored, by="__score", k=k, descending=False,
               tiebreak=(id_col, True))
    return out.map_batches(lambda b: b.drop_columns(["__score"]),
                           batch_format="pyarrow")
