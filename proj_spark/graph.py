"""Distributed connected components — the dedup-clustering step.

Near-dup pair lists (MinHash-LSH, SimHash, embedding-LSH) only give EDGES;
choosing one canonical document per duplicate CLUSTER needs the connected
components of that pair graph. At web scale the graph has billions of
nodes, so this is the alternating large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14):
every round is two shuffle-by-node aggregations, converges in O(log n)
rounds even on pathological chain graphs (plain min-label propagation
needs O(diameter) rounds), and at convergence the edge set IS the
component map (every node points at its component's minimum id).

Scale notes (100 TB): each round shuffles the current edge set keyed by
node — no broadcast, no driver-side state besides the convergence
checksum (2 longs). Lineage is truncated every round with an eager
localCheckpoint; without it the plan doubles per iteration and the
convergence-check actions re-execute the whole history. Duplicate
clusters shrink the edge set monotonically toward one edge per non-root
node, so later rounds are cheaper than earlier ones. Skew: a mega-cluster
(boilerplate page duplicated everywhere) turns into a hot root key; the
groupBy min is a partial (map-side) aggregation, so the hot key reduces
to one row per partition before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Drop self-loops, order every edge (hi, lo), dedup."""
    return (edges.select(F.greatest("u", "v").alias("u"),
                         F.least("u", "v").alias("v"))
                 .filter(F.col("u") != F.col("v"))
                 .distinct())


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m) for every neighbor v > u, where m = min(N(u) + {u})."""
    sym = edges.unionByName(edges.select(F.col("v").alias("u"),
                                         F.col("u").alias("v")))
    mins = (sym.groupBy("u")
               .agg(F.least(F.min("v"), F.first("u")).alias("m")))
    return (sym.join(mins, "u")
               .filter(F.col("v") > F.col("u"))
               .select(F.col("v").alias("u"), F.col("m").alias("v")))


def _small_star(edges: DataFrame) -> DataFrame:
    """(v, m) for every neighbor v <= u plus (u, m), m = min(N<=(u) + {u})."""
    ordered = _canon(edges)  # (u, v) with v < u
    mins = ordered.groupBy("u").agg(F.min("v").alias("m"))
    moved = (ordered.join(mins, "u")
                    .select(F.col("v").alias("u"), F.col("m").alias("v")))
    roots = mins.select(F.col("u"), F.col("m").alias("v"))
    return moved.unionByName(roots)


def _checksum(edges: DataFrame) -> tuple:
    """Order-insensitive fingerprint of the edge set (one tiny action)."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def connected_components(nodes: DataFrame, edges: DataFrame,
                         max_rounds: int = 25) -> DataFrame:
    """Component id (minimum member id) for every node.

    nodes: one column ``id`` (long) — every vertex, including isolated ones.
    edges: columns ``u``, ``v`` (long) — undirected pair list.
    Returns (id, component); isolated nodes map to themselves.
    """
    cur = _canon(edges).localCheckpoint(eager=True)
    prev_sum = _checksum(cur)
    for _ in range(max_rounds):
        cur = _canon(_small_star(_large_star(cur))).localCheckpoint(eager=True)
        cur_sum = _checksum(cur)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    # at convergence every edge is (member, root); roots map to themselves
    membership = cur.select(F.col("u").alias("id"),
                            F.col("v").alias("component"))
    return (nodes.join(membership, "id", "left")
                 .select("id",
                         F.coalesce("component", "id").alias("component")))
