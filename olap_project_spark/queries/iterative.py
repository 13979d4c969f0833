"""Iterative algorithms — the driver contract's genuinely
non-SQL-expressible category (fixed-point loops over DataFrames).
Gated via a SELF-VALIDATING contract row (exact cross-engine scalars +
invariant booleans — the approx_distinct_summary pattern), since no SQL
oracle can replay the loop itself; tests/test_training_ops.py asserts
the algorithmic invariants.

Pattern (the Spark-idiomatic iterative shape): the BIG side (vectors)
stays distributed and is re-scanned per iteration; the SMALL side
(centroids) is collected to the driver and re-broadcast — k·dim doubles
per round, never the corpus. This is how MLlib's own Lloyd iterations
work, re-expressed on the public DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olap_project_spark.functions.localframe import local_frame
from olap_project_spark.queries import register
from olap_project_spark.queries.similarity import _emb

K_CLUSTERS = 8
N_ITERATIONS = 3


@register(
    "kmeans_cluster_profile",
    # The per-cluster profile itself is FP-order fragile (centroid sums
    # reduce in partition order, so boundary points can flip cluster at
    # the 1e-15 level) and no SQL engine can replay Lloyd's loop — so,
    # like approx_distinct_summary, the gate row is a SELF-VALIDATING
    # contract: exact cross-engine scalars (corpus size, vector dim)
    # plus booleans asserting the algorithm's invariants (every vector
    # assigned exactly once, ≤k clusters, Lloyd monotone non-increasing
    # dispersion). The oracle asserts the exact values and literal TRUE.
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(MAX(len(embedding)) AS INT) AS dim,
           TRUE AS all_assigned,
           TRUE AS k_at_most_8,
           TRUE AS dispersion_monotone
    FROM embeddings
    """,
)
def kmeans_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means (k=8, 3 Lloyd iterations, deterministic init = the first
    k vectors) over the embeddings corpus; returns a convergence
    contract row (corpus size, dim, and invariant booleans — see the
    oracle note above for why the raw per-cluster profile can't be the
    cross-engine surface).

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

        cents_df = local_frame(spark, 
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
    total_sq_dist: list[float] = []  # per-iteration Σ dist² (from the same
    n_by_iter: list[int] = []  # collect that ships the centroid partials)
    for it in range(N_ITERATIONS):
        assigned = assign(e, centroids)
        new_cents = (
            assigned.groupBy("cluster")
            .agg(
                F.count("*").alias("n"),
                F.sum("dist").alias("sum_dist"),
                *[F.sum(F.col("emb")[i]).alias(f"s{i}") for i in range(dim)],
            )
            .collect()
        )
        total_sq_dist.append(sum(r["sum_dist"] for r in new_cents))
        n_by_iter.append(sum(r["n"] for r in new_cents))
        by_cluster = {
            r["cluster"]: [r[f"s{i}"] / r["n"] for i in range(dim)] for r in new_cents
        }
        centroids = [by_cluster.get(k, centroids[k]) for k in range(K_CLUSTERS)]

    from olap_project_spark.sources.registry import table_row_count

    n_total = n_by_iter[-1]
    n_corpus = table_row_count(sf_dir, "embeddings")  # footer metadata, no job
    # Lloyd guarantees Σdist² non-increasing per reassignment round;
    # allow 1e-9 relative slack for FP partial-sum order.
    monotone = all(
        b <= a * (1.0 + 1e-9) + 1e-9
        for a, b in zip(total_sq_dist, total_sq_dist[1:])
    )
    n_clusters = len(by_cluster)
    e.unpersist()
    return local_frame(spark, 
        [
            (
                n_corpus,
                dim,
                n_total == n_corpus and all(n == n_corpus for n in n_by_iter),
                n_clusters <= K_CLUSTERS,
                monotone,
            )
        ],
        "n_vectors bigint, dim int, all_assigned boolean, "
        "k_at_most_8 boolean, dispersion_monotone boolean",
    )
