"""Distributed graph primitives built from DataFrame ops — no GraphX
(JVM-only RDD API) and no GraphFrames dependency; the engine needs one
algorithm (connected components for dup clustering) and it composes
from joins + aggregates.

Reference parity: the reference has no graph surface; this backs the
``near_dup_clusters`` training-data operator (queries/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Label every vertex of the undirected graph ``edges`` with the
    minimum vertex id reachable from it: (doc_id, label) — label is the
    component id.

    Iterative min-label propagation: label(x) ← min(label(x), min label
    over x's neighbors), to a fixpoint. Converges in O(diameter) rounds;
    the fixpoint test is sum(label) unchanged (labels only ever
    decrease, so an unchanged sum means no label moved).

    Scale: each round is one equi-join edges⋈labels plus one groupBy,
    both hash-partitioned on the vertex id — no driver-side graph, no
    broadcast of the vertex set. localCheckpoint cuts lineage each
    round (the same driver-loop pattern as iterative k-means); on a
    cluster you'd checkpoint to reliable storage instead. For graphs
    with large diameter switch to large-star/small-star (fewer rounds);
    near-dup clusters have diameter ~2-3 so plain propagation is
    already round-optimal."""
    sym = (
        edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
        .union(edges.select(F.col(dst).alias("_s"), F.col(src).alias("_d")))
        .persist()
    )
    # Fold the first propagation round into initialization: label₀(x) =
    # min(x, min direct neighbor) — one groupBy instead of distinct +
    # identity-join round (propagation from the identity labeling would
    # compute exactly this).
    labels = (
        sym.groupBy("_s")
        .agg(F.min("_d").alias("_m"))
        .select(
            F.col("_s").alias("doc_id"),
            F.least(F.col("_s"), F.col("_m")).alias("label"),
        )
        .localCheckpoint()
    )
    prev_sum = None
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["_d"] == labels.doc_id)
            .groupBy("_s")
            .agg(F.min("label").alias("nbr_min"))
        )
        labels = (
            labels.join(nbr, labels.doc_id == nbr["_s"], "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:  # fixpoint: no label moved
            break
        prev_sum = cur_sum
    sym.unpersist()
    return labels
