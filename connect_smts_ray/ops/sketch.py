"""Mergeable sketches — the approximate path for 100-TB cardinalities.

Exact ``grouped_count_distinct`` shuffles every distinct (group, value)
pair; at extreme cardinality the sketch path moves a FIXED 2^p bytes per
block instead: HyperLogLog registers built per block, merged by
elementwise max (associative + commutative, so any tree of merges gives
the identical sketch), estimated once on the driver.

Flajolet et al. 2007 (HyperLogLog) with the standard small-range linear
counting correction; hashes are pandas' vectorized 64-bit hash (stable
across processes — no per-row Python)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_HLL_KEY = "csr-hll-hash-key"  # 16 chars, pandas hash_key contract


def hll_registers(values, p: int = 12) -> np.ndarray:
    """2^p uint8 registers for one batch of values (vectorized)."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pandas()
    h = pd.util.hash_pandas_object(
        pd.Series(values), index=False, hash_key=_HLL_KEY
    ).to_numpy()
    m = 1 << p
    idx = (h & np.uint64(m - 1)).astype(np.int64)
    rest = h >> np.uint64(p)
    # rank = position of the first 1-bit in the remaining 64-p bits (1-based)
    nbits = 64 - p
    rank = np.full(len(h), nbits + 1, dtype=np.uint8)
    found = np.zeros(len(h), dtype=bool)
    for b in range(nbits):
        hit = ~found & (((rest >> np.uint64(b)) & np.uint64(1)) == 1)
        rank[hit] = b + 1
        found |= hit
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate with linear-counting small-range correction."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Distributed approximate count-distinct: per-block registers (one
    2^p-byte row per block crosses to the driver — never the values),
    driver-side max-merge + estimate. Typical error ≈ 1.04/√(2^p)
    (~1.6% at p=12)."""

    def block_regs(batch: pa.Table) -> pa.Table:
        regs = hll_registers(batch.column(col), p=p) if batch.num_rows \
            else np.zeros(1 << p, dtype=np.uint8)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.map_batches(block_regs, batch_format="pyarrow").take_all()
    merged = np.zeros(1 << p, dtype=np.uint8)
    for row in parts:
        merged = hll_merge(merged, np.frombuffer(row["regs"], dtype=np.uint8))
    return hll_estimate(merged)


def hll_register_table(ds, col: str, p: int = 12):
    """SQL-mirrorable HyperLogLog: the sketch itself as a tiny TABLE of
    nonzero registers ``(reg BIGINT, max_rank BIGINT)`` instead of a float
    estimate — every cell is an exact integer max, so the whole sketch is
    bit-reproducible at any parallelism and verifiable in pure SQL.

    Hash = md5 first-8-bytes little-endian (``DuckDB md5_number_upper``,
    the binlog.key_seed convention, sources/binlog.py:43-49):
    ``reg = h & (2^p - 1)``; ``rank`` = 1-based position of the first
    1-bit of ``h >> p`` (``64 - p + 1`` when those bits are all zero).
    SQL mirror of the rank: ``1 + log2(rest - (rest & (rest - 1)))`` —
    the isolated lowest set bit is an exact power of two ≤ 2^(63-p), so
    float log2 is exact.

    Scale shape: each block collapses to its DISTINCT values first (local
    Arrow group_by — the md5 loop runs per distinct, not per row), folds
    into ≤ 2^p (reg, rank) partial rows, and a final groupby-max merges
    them; register max is associative + commutative so any merge tree
    yields the identical sketch. Estimate with ``hll_estimate_from_table``
    (driver-side, O(2^p)). The pandas-hash ``approx_distinct`` above stays
    the fast path; this one trades ~0.8 µs/row of C md5 (core/hashing.py
    note) for a DuckDB-exact oracle."""
    from ray.data.aggregate import Max

    from connect_smts_ray.core.hashing import md5_rank64

    nbits = 64 - p
    m = 1 << p

    def block_regs(batch: pa.Table) -> pa.Table:
        regs = np.zeros(m, dtype=np.uint8)
        if batch.num_rows:
            vals = batch.select([col]).group_by(
                col, use_threads=False).aggregate([]).column(col)
            vals = vals.drop_null()
            if len(vals):
                h = md5_rank64(vals.to_pylist(), upper=True)
                idx = (h & np.uint64(m - 1)).astype(np.int64)
                rest = h >> np.uint64(p)
                rank = np.full(len(h), nbits + 1, dtype=np.uint8)
                nz = rest != 0
                if nz.any():
                    # rank = 1 + trailing zeros; the isolated low bit is an
                    # exact power of two, so float log2 is exact.
                    r = rest[nz]
                    lsb = r - (r & (r - np.uint64(1)))
                    rank[nz] = (np.log2(lsb.astype(np.float64))
                                .astype(np.uint8) + 1)
                np.maximum.at(regs, idx, rank)
        hit = np.nonzero(regs)[0]
        return pa.table({"reg": pa.array(hit, pa.int64()),
                         "max_rank": pa.array(regs[hit].astype(np.int64))})

    out = ds.map_batches(block_regs, batch_format="pyarrow") \
            .groupby("reg").aggregate(Max("max_rank"))
    return out.map_batches(
        lambda b: pa.table({"reg": b.column("reg"),
                            "max_rank": b.column("max(max_rank)")}),
        batch_format="pyarrow")


def grouped_hll_register_table(ds, group_col: str, col: str, p: int = 8):
    """Per-GROUP HyperLogLog register tables in one pass — the sketch
    answer to ``SELECT g, count(DISTINCT v)`` when the distinct set per
    group is too large to shuffle: each block emits ≤ |groups|·2^p exact
    (group, reg, max_rank) partial rows (the values never move), and ONE
    groupby-max merges. Same md5_number_upper hash convention as
    hll_register_table, so the oracle rebuilds every group's sketch
    cell-for-cell in SQL; estimate any group with
    ``hll_estimate_from_table`` over its rows."""
    from ray.data.aggregate import Max

    from connect_smts_ray.core.hashing import md5_rank64

    nbits = 64 - p
    m = 1 << p

    def block_regs(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "group": pa.array([], pa.string()),
            "reg": pa.array([], pa.int64()),
            "max_rank": pa.array([], pa.int64()),
        })
        if not batch.num_rows:
            return empty
        # distinct (group, value) of the block — md5 runs per distinct
        gv = batch.select([group_col, col]).group_by(
            [group_col, col], use_threads=False).aggregate([])
        gv = gv.filter(pc.and_(pc.is_valid(gv.column(group_col)),
                               pc.is_valid(gv.column(col))))
        if not gv.num_rows:
            return empty
        vals = gv.column(col).to_pylist()
        h = md5_rank64(vals, upper=True)
        reg = (h & np.uint64(m - 1)).astype(np.int64)
        rest = h >> np.uint64(p)
        rank = np.full(len(h), nbits + 1, dtype=np.int64)
        nz = rest != 0
        if nz.any():
            r = rest[nz]
            lsb = r - (r & (r - np.uint64(1)))
            rank[nz] = np.log2(lsb.astype(np.float64)).astype(np.int64) + 1
        part = pa.table({
            "group": pc.cast(gv.column(group_col), pa.string()),
            "reg": pa.array(reg),
            "max_rank": pa.array(rank),
        }).group_by(["group", "reg"], use_threads=False) \
          .aggregate([("max_rank", "max")])
        return pa.table({"group": part.column("group"),
                         "reg": part.column("reg"),
                         "max_rank": part.column("max_rank_max")})

    out = ds.map_batches(block_regs, batch_format="pyarrow") \
            .groupby(["group", "reg"]).aggregate(Max("max_rank"))
    return out.map_batches(
        lambda b: pa.table({"group": b.column("group"),
                            "reg": b.column("reg"),
                            "max_rank": b.column("max(max_rank)")}),
        batch_format="pyarrow")


def hll_estimate_from_table(tbl: pa.Table, p: int = 12) -> float:
    """Estimate from a (reg, max_rank) register table (hll_register_table
    output, materialized): scatter into the dense 2^p array and apply the
    standard Flajolet estimator + linear-counting correction."""
    regs = np.zeros(1 << p, dtype=np.uint8)
    if tbl.num_rows:
        regs[tbl.column("reg").to_numpy()] = \
            tbl.column("max_rank").to_numpy().astype(np.uint8)
    return hll_estimate(regs)


# -- Count-Min sketch ------------------------------------------------------

def _cms_cells(words: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(n, depth) int64 cell indices: md5(f"cms{d}|{word}") bytes 8..16
    little-endian (DuckDB ``md5_number_lower``) mod width. Hash the
    DISTINCT words of a batch only — callers pre-collapse with a local
    group_by, so Zipf keeps this loop off the token stream."""
    import hashlib

    out = np.empty((len(words), depth), dtype=np.int64)
    for d in range(depth):
        pre = f"cms{d}|".encode()
        for i, w in enumerate(words):
            h = int.from_bytes(
                hashlib.md5(pre + str(w).encode()).digest()[8:], "little")
            out[i, d] = h % width
    return out


def cms_build(ds, col: str, depth: int = 4, width: int = 1024) -> np.ndarray:
    """Distributed Count-Min sketch (Cormode & Muthukrishnan 2005) over a
    column: per block, values collapse to (distinct, count) via a local
    Arrow group_by, each distinct value increments one cell per depth row,
    and ONE fixed-size (depth × width × 8 B) partial crosses to the driver
    per block — never the values. Cell merge is elementwise int64 sum
    (associative + commutative → identical sketch at any parallelism).

    Estimates are deterministic given (depth, width): every cell count is
    an exact sum, so the sketch — including its overcounts — is
    bit-reproducible and SQL-mirrorable (md5_number_lower cell addressing).
    """

    def block_cells(batch: pa.Table) -> pa.Table:
        cells = np.zeros((depth, width), dtype=np.int64)
        if batch.num_rows:
            g = batch.select([col]).group_by(
                col, use_threads=False).aggregate([([], "count_all")])
            words = np.asarray(g.column(col).to_pylist())
            counts = g.column("count_all").to_numpy().astype(np.int64)
            idx = _cms_cells(words, depth, width)
            for d in range(depth):
                np.add.at(cells[d], idx[:, d], counts)
        return pa.table({"cells": pa.array([cells.tobytes()], pa.binary())})

    merged = np.zeros((depth, width), dtype=np.int64)
    for row in ds.map_batches(block_cells, batch_format="pyarrow").take_all():
        merged += np.frombuffer(
            row["cells"], dtype=np.int64).reshape(depth, width)
    return merged


def cms_estimate(cms: np.ndarray, values) -> np.ndarray:
    """Point estimates (min over depth rows) for an array of values."""
    depth, width = cms.shape
    vals = np.asarray(list(values))
    idx = _cms_cells(vals, depth, width)
    ests = np.min(
        np.stack([cms[d][idx[:, d]] for d in range(depth)], axis=1), axis=1)
    return ests.astype(np.int64)
