#!/usr/bin/env python3
"""Dump the formatted physical plan of registered queries — the
evidence for each query's scale claims (pushed filters, broadcast vs
shuffle joins, whole-stage codegen spans, top-k compilation).

Usage:
    python3 tools/explain.py q_name [q_name ...] [--sf DIR]
    python3 tools/explain.py --all          # every non-streaming query
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Streaming / iterative queries execute work at build time; exclude from
# --all so the dump stays a planning-only operation.
EXECUTING = {
    "streaming_hourly_stats",
    "streaming_sliding_stats",
    "streaming_session_counts",
    "streaming_click_attribution",
    "streaming_distinct_user_types",
    "streaming_continuous_rollup",
    "kmeans_cluster_profile",
    "near_dup_clusters",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sf", default=os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001"))
    args = ap.parse_args()

    from olap_project_spark.queries import QUERY_REGISTRY, _import_all
    from olap_project_spark.session import build_session

    _import_all()
    names = args.queries or (
        [n for n in QUERY_REGISTRY if n not in EXECUTING] if args.all else []
    )
    if not names:
        ap.error("give query names or --all")
    spark = build_session(app_name="explain", extra_conf={"spark.ui.enabled": "false"})
    for name in names:
        print(f"\n{'=' * 70}\n{name}\n{'=' * 70}")
        QUERY_REGISTRY[name].fn(spark, args.sf).explain("formatted")
    return 0


if __name__ == "__main__":
    main()
