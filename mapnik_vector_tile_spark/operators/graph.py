"""Iterative graph operators over edge tables — the routing-side
companion to dedup's connected-components (pointer-doubling min-label)
and the snap join's map matching: once traces are matched to a road
network, travel-cost fields are Bellman-Ford relaxations over the
segment graph.

`bellman_ford` implements the HOP-BOUNDED form: after R rounds the
result is EXACTLY "minimum path cost using at most R edges" — a
well-defined operator for any R (no convergence precondition), which
equals true shortest path wherever the optimal path has ≤ R hops.
This is the same fixed-round contract the DuckDB twin unrolls, so the
oracle is bit-exact by construction rather than by a convergence
argument.

Scale shape (Pregel/GraphFrames AggregateMessages): the distance
table and edge table partition on node id; each round is ONE
equi-join + ONE map-side-combining min aggregate. localCheckpoint
every 4 rounds truncates the lineage chain (the dedup-CC pattern) so
round r doesn't re-execute rounds 0..r-1. At 100 TB the edge table
partitions once and is reused every round."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bellman_ford(
    edges: DataFrame, sources: DataFrame, rounds: int = 12
) -> DataFrame:
    """edges: (u, v, w) directed integer-weight edges (symmetrize
    upstream for undirected graphs); sources: (node). Output
    (node, d): min cost over paths from any source using ≤ `rounds`
    edges; nodes unreachable within the hop bound emit no row."""
    dist = sources.select("node", F.lit(0).cast("long").alias("d"))
    e = edges.alias("e")
    for r in range(rounds):
        relaxed = dist.alias("t").join(
            e, F.col("t.node") == F.col("e.u")
        ).select(
            F.col("e.v").alias("node"),
            (F.col("t.d") + F.col("e.w")).alias("d"),
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("d").alias("d"))
        )
        if (r + 1) % 4 == 0:
            dist = dist.localCheckpoint(eager=False)
    return dist
