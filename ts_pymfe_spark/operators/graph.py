"""Distributed connected components for near-dup clustering.

Engine addition (no reference counterpart — the reference computes
single-series meta-features; clustering the LSH candidate graph is the
step a training-data pipeline runs AFTER candidate generation, per
Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better"): group candidate pairs into duplicate clusters and pick one
survivor per cluster.

Algorithm: min-label propagation with pointer jumping.  Each round
  1. ``comp(v) <- min(comp(v), min over neighbors comp(u))``
     (one join edges->labels + one groupBy, both keyed uniformly);
  2. ``comp(v) <- comp(comp(v))`` (path halving — one self-join),
so label trees collapse geometrically: O(log d) rounds for diameter d
instead of the O(d) of plain propagation.  Every step is a min over a
deterministic total order, so the fixpoint (min node id per component)
is independent of iteration count and partitioning — which is what
makes the result exactly oracle-able in SQL.

Scale shape (100 TB): per round, shuffles are O(edges) keyed by node
id (uniform for md5-derived doc ids; no hot keys beyond a genuinely
giant cluster, which dedup pipelines cap upstream anyway).  Lineage is
truncated each round with ``localCheckpoint`` — without it the
iterated plan grows exponentially and the driver OOMs on plan
serialization long before data is the problem.  The loop's only
driver-side action is the single-row convergence count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 50,
                         eager_checkpoint: bool = True,
                         stats: dict | None = None) -> DataFrame:
    """Components of the undirected graph given as an edge list ->
    ``(node, comp)`` with ``comp`` = min node id in the component.
    Nodes appearing only as isolated endpoints of self-loops or not at
    all are absent — callers join back to their full entity table for
    singletons (see ``textpipe.dedup_clusters``).

    Pass ``stats={}`` to receive ``{"rounds": k}`` — the number of
    label-propagation rounds run to the fixpoint (incl. the final
    no-change round), the O(log diameter) quantity the scale-stress
    probe records (round 6)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
    )
    if eager_checkpoint:
        sym = sym.localCheckpoint()
        labels = labels.localCheckpoint()
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # 1. pull the min neighbor label
        neigh = sym.join(
            labels.withColumnRenamed("node", "b"), "b"
        ).select(F.col("a").alias("node"), "comp")
        pulled = (
            labels.unionByName(neigh)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # 2. pointer jumping: comp(v) <- comp(comp(v)).  Disjoint column
        # names on the lookup side — a swapped-name self-join (node->comp,
        # comp->_cc) trips Spark 4's self-join attribute dedup during
        # checkpoint ("key not found: node#...").
        lookup = pulled.select(
            F.col("node").alias("_jnode"), F.col("comp").alias("_jcomp")
        )
        jumped = (
            pulled.join(lookup, pulled["comp"] == lookup["_jnode"], "left")
            .select(
                pulled["node"],
                F.coalesce("_jcomp", pulled["comp"]).alias("comp"),
            )
        )
        if eager_checkpoint:
            jumped = jumped.localCheckpoint()
        n_changed = (
            jumped.join(
                labels.withColumnRenamed("comp", "_old"), "node"
            )
            .where(F.col("comp") != F.col("_old"))
            .count()
        )
        labels = jumped
        if n_changed == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds
    return labels.select("node", "comp")
