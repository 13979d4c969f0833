"""Iterative algorithms — the driver contract's genuinely
non-SQL-expressible category (fixed-point loops over DataFrames).
Registered WITHOUT an oracle: the driver applies its rows-only check,
and tests/test_training_ops.py asserts the algorithmic invariants.

Pattern (the Spark-idiomatic iterative shape): the BIG side (vectors)
stays distributed and is re-scanned per iteration; the SMALL side
(centroids) is collected to the driver and re-broadcast — k·dim doubles
per round, never the corpus. This is how MLlib's own Lloyd iterations
work, re-expressed on the public DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_project_spark.queries import register
from olap_project_spark.queries.similarity import _emb

K_CLUSTERS = 8
N_ITERATIONS = 3


@register("kmeans_cluster_profile", oracle=None)
def kmeans_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means (k=8, 3 Lloyd iterations, deterministic init = the first
    k vectors) over the embeddings corpus; returns per-cluster sizes
    and dispersion.

    Per iteration: assignment is one fused pass over the corpus
    (broadcast centroid literals, argmin of squared distance with
    cluster-id tie-break); the centroid update aggregates dim element
    sums per cluster (emb[i] extraction — no posexplode row blow-up:
    the shuffle carries k rows of k×(dim+1) partials, not N×dim
    exploded rows) and only the k×dim result reaches the driver."""
    e = _emb(spark, sf_dir).select("vec_id", "emb").persist()

    centroids = [
        (int(r["vec_id"]), [float(x) for x in r["emb"]])
        for r in e.filter(F.col("vec_id") < K_CLUSTERS).collect()
    ]
    centroids = [c for _, c in sorted(centroids)]

    def assign(df: DataFrame, cents: list[list[float]]) -> DataFrame:
        # Literal-free assignment: centroids travel as a broadcast
        # DataFrame, distance is ONE zip_with/aggregate expression over
        # (emb, cvec). The plan is IDENTICAL every iteration (only the
        # broadcast data changes), so codegen is compiled once and
        # cache-hit for the rest of the loop — the literal-specialized
        # formulation (8 centroid arrays inlined as 512 literals)
        # recompiled the whole stage per iteration and cost more than
        # the arithmetic itself.
        #
        # Argmin via per-vector row_number with cluster-id tie-break.
        # (A min(struct(dist, cluster, emb)) aggregate was tried and is
        # SLOWER: the 64-double vector rides inside the aggregation
        # buffer and every partial-merge compares/copies it; the window
        # sorts only the k-expanded (dist, cluster) keys.)
        from pyspark.sql.window import Window

        cents_df = spark.createDataFrame(
            [(k, c) for k, c in enumerate(cents)], "cluster int, cvec array<double>"
        )
        dist = F.aggregate(
            F.zip_with(F.col("emb"), F.col("cvec"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        w = Window.partitionBy("vec_id").orderBy("dist", "cluster")
        return (
            df.crossJoin(F.broadcast(cents_df))
            .withColumn("dist", dist)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "emb", "cluster", "dist")
        )

    dim = len(centroids[0])
    assigned = None
    for it in range(N_ITERATIONS):
        assigned = assign(e, centroids)
        if it == N_ITERATIONS - 1:
            # the final assignment feeds the profile aggregate below —
            # cache it so the last Lloyd pass isn't executed twice
            assigned = assigned.persist()
        new_cents = (
            assigned.groupBy("cluster")
            .agg(
                F.count("*").alias("n"),
                *[F.sum(F.col("emb")[i]).alias(f"s{i}") for i in range(dim)],
            )
            .collect()
        )
        by_cluster = {
            r["cluster"]: [r[f"s{i}"] / r["n"] for i in range(dim)] for r in new_cents
        }
        centroids = [by_cluster.get(k, centroids[k]) for k in range(K_CLUSTERS)]

    return assigned.groupBy("cluster").agg(
        F.count("*").alias("n_vectors"),
        F.round(F.avg("dist"), 4).alias("mean_sq_dist"),
    )
