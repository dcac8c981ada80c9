"""Iterative graph algorithms over edge Datasets (Pregel-style rounds).

``pagerank`` is the canonical iterate-until-K loop expressed in Ray Data
primitives: each round is ONE reduce-side hash join (ship ranks to their
out-edges) plus ONE union-groupby (sum contributions per destination,
with a zero row per node so rank mass never silently drops for nodes
without in-edges). Ranks are materialized per round, so the plan stays
two stages deep regardless of K — the iterative-algorithm analog of
``ops/components.py: connected_components``.

Fixed-point integer arithmetic throughout: floating-point PageRank sums
depend on reduction order, which would make results block-layout- and
cluster-size-dependent (and unhashable against a SQL oracle). With ranks
as int64 "mass units" (``init`` per node) every sum is exact and
commutative, so the result is bit-identical at any parallelism — the
same determinism contract the binlog/LWW pipeline keeps.

Scale notes (100-TB regime):
- per-round cost is 2 hash shuffles of |edges| + |nodes| rows — the
  minimum for a rank-routing round without a persistent partitioner;
  a co-partitioned implementation could cache the edge shuffle, which
  Ray Data's stateless all-to-all does not express today (documented
  partitioning assumption).
- int64 headroom: a single node's inbound sum is bounded by the total
  mass ``n_nodes × init``; keep ``damping[0] × n_nodes × init < 2^63``
  (at the default init=10^9 that is ~10^8 nodes; drop init to 10^6 for
  10^11-node graphs — precision degrades gracefully, determinism never).
- dangling nodes (no out-edges) leak their mass each round rather than
  redistributing it — the simple variant; both sides of the oracle agree.

Reference analog: none (engine op beyond the reference's surface).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from connect_smts_ray.ops.components import hash_join


def pagerank(edges, iterations: int = 3, num_partitions: int = 16,
             damping: tuple = (85, 100), init: int = 10**9):
    """Edge Dataset[src:int64, dst:int64] → Dataset[node:int64, pr:int64].

    ``pr`` after K rounds of r'(u) = base + (d_num · Σ_{v→u} r(v)⌊/⌋deg(v))
    ⌊/⌋ d_den, with base = ((d_den − d_num) · init) ⌊/⌋ d_den and r0 = init
    for every node appearing in any edge. Multi-edges count once per
    occurrence (pre-dedup if adjacency semantics are wanted).
    """
    import ray.data
    from ray.data.aggregate import Sum

    d_num, d_den = damping
    base = ((d_den - d_num) * init) // d_den

    edges = edges.select_columns(["src", "dst"]).materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(pa.schema(
            [("node", pa.int64()), ("pr", pa.int64())]).empty_table())

    outdeg = edges.groupby("src").count()  # (src, count())
    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    deg_schema = pa.schema([("src", pa.int64()), ("count()", pa.int64())])
    edges_deg = hash_join(
        edges, outdeg, left_on="src", right_on="src",
        num_partitions=num_partitions,
        left_schema=edge_schema, right_schema=deg_schema,
    ).materialize()
    edges_deg_schema = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("count()", pa.int64())]
    )

    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays([
            pc.cast(b.column("src"), pa.int64()).combine_chunks(),
            pc.cast(b.column("dst"), pa.int64()).combine_chunks(),
        ])})

    nodes = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node").count()
        .map_batches(
            lambda b: pa.table({
                "dst": b.column("node"),
                "c": pa.nulls(b.num_rows, pa.int64()).fill_null(0),
            }),
            batch_format="pyarrow",
        )
        .materialize()
    )  # (dst, c=0): the zero row keeps no-in-edge nodes in every round

    ranks = nodes.map_batches(
        lambda b: pa.table({
            "node": b.column("dst"),
            "pr": pc.add(b.column("c"), init),
        }),
        batch_format="pyarrow",
    ).materialize()
    ranks_schema = pa.schema([("node", pa.int64()), ("pr", pa.int64())])

    for _ in range(iterations):
        joined = hash_join(
            edges_deg, ranks, left_on="src", right_on="node",
            num_partitions=num_partitions,
            left_schema=edges_deg_schema, right_schema=ranks_schema,
        )
        contrib = joined.map_batches(
            lambda b: pa.table({
                "dst": b.column("dst"),
                # floor division is exact in int64 — no reduction-order
                # dependence anywhere in the round
                "c": pc.divide(b.column("pr"), b.column("count()")),
            }),
            batch_format="pyarrow",
        )
        sums = contrib.union(nodes).groupby("dst").aggregate(Sum("c"))
        ranks = sums.map_batches(
            lambda b: pa.table({
                "node": b.column("dst"),
                "pr": pc.add(
                    pc.divide(pc.multiply(b.column("sum(c)"), d_num), d_den),
                    base,
                ),
            }),
            batch_format="pyarrow",
        ).materialize()
    return ranks
