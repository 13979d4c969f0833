#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run every registered
query on Spark AND its DuckDB oracle on the same parquet tables, compare
row count + schema + order-insensitive value hash.

Usage:
    python3 tools/oracle_check.py [query ...] [--sf DIR]

Exit 0 iff every checked query matches.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from olap_project_spark.schemas import STAR_TABLES


def normalize(df) -> tuple[int, list[str], str]:
    """(row_count, sorted columns, order-insensitive value hash) of a
    pandas DataFrame — columns sorted by name, rows sorted by repr."""
    import pandas as pd

    cols = sorted(df.columns)
    df = df[cols]

    def cell(v):
        if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
            return "∅"
        if isinstance(v, float):
            # repr at 12 significant digits absorbs <1ulp formatting noise
            return f"{v:.12g}"
        return str(v)

    rows = sorted("\x1f".join(cell(v) for v in row) for row in df.itertuples(index=False))
    h = hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]
    return len(df), cols, h


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--json", default=None, metavar="PATH",
                    help="also write per-query results as a JSON artifact")
    ap.add_argument("--note", default=None, help="note field for the JSON artifact")
    args = ap.parse_args()

    from olap_project_spark.queries import QUERY_REGISTRY, _import_all
    from olap_project_spark.session import build_session

    _import_all()
    names = args.queries or list(QUERY_REGISTRY)
    spark = build_session(app_name="oracle-check", extra_conf={"spark.ui.enabled": "false"})

    con = duckdb.connect()
    for t in STAR_TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures, skipped = [], []
    results: dict[str, dict] = {}
    sf_label = args.sf.rstrip("/").rsplit("sf", 1)[-1]
    for name in names:
        q = QUERY_REGISTRY[name]
        sdf = q.fn(spark, args.sf).toPandas()
        if q.oracle is None:
            skipped.append(name)
            results[name] = {"ok": None, "spark_rows": len(sdf), "sf": sf_label}
            print(f"  ~ {name}: rows={len(sdf)} (no oracle — rows-only)")
            continue
        ddf = con.execute(q.oracle).fetchdf()
        sn, so = normalize(sdf), normalize(ddf)
        ok = sn == so
        results[name] = {"ok": ok, "spark_rows": sn[0], "oracle_rows": so[0],
                         "sf": sf_label}
        status = "ok" if ok else "MISMATCH"
        print(f"  {'✓' if ok else '✗'} {name}: spark={sn[0]} duck={so[0]} {status}")
        if not ok:
            failures.append(name)
            if sn[1] != so[1]:
                print(f"      columns spark={sn[1]} duck={so[1]}")
            elif sn[0] != so[0]:
                print("      row counts differ")
            else:
                print("      value hash differs; sample:")
                print("      spark:", sdf.sort_values(sorted(sdf.columns)[0]).head(3).to_dict("records"))
                print("      duck :", ddf.sort_values(sorted(ddf.columns)[0]).head(3).to_dict("records"))
    print(f"\n{len(names) - len(failures) - len(skipped)} ok, "
          f"{len(failures)} mismatched, {len(skipped)} rows-only")
    if args.json:
        import json as _json

        artifact = {"queries": results}
        if args.note:
            artifact["note"] = args.note
        with open(args.json, "w") as f:
            _json.dump(artifact, f, indent=1, sort_keys=True)
        print(f"wrote {args.json}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
