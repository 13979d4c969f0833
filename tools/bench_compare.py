#!/usr/bin/env python3
"""Median-based bench comparison: totals drift ±25% same-code between
runs (measured round 4), so cross-round comparisons must quote the
MEDIAN per-query ratio over the intersection, never the totals.

Usage:
    python3 tools/bench_compare.py OLD_DETAIL.json NEW_DETAIL.json

Prints the intersection size, median/p25/p75 of new/old per-query time
ratios, and the biggest movers in each direction. A median near 1.0
with a grown total just means the library gained queries.

Memo-order normalization: whichever query FIRST touches a shared
memoized intermediate pays its build, so a registry reorder (or an
added query) shifts multi-second builds between consumers and fakes
>2× movers in both directions (r6: near_dup_clusters 6.27× vs
leakage_safe_split_stats 0.09×, same code). When either detail file
carries ``memo_builds`` (kind → building query), queries that built a
memo in EITHER run are excluded from the ratio distribution and listed
separately — their wall-time attribution is an ordering artifact, not
a plan change.
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old_doc = json.load(open(sys.argv[1]))
    new_doc = json.load(open(sys.argv[2]))
    old, new = old_doc["queries"], new_doc["queries"]
    common = sorted(set(old) & set(new))
    if not common:
        print("no common queries")
        return 1
    builders = set(old_doc.get("memo_builds", {}).values()) | set(
        new_doc.get("memo_builds", {}).values()
    )
    clean = [n for n in common if n not in builders]
    excluded = [n for n in common if n in builders]
    ratios = {n: new[n] / old[n] for n in clean if old[n] > 0}
    if not ratios:  # legacy files without memo_builds exclude nothing
        ratios = {n: new[n] / old[n] for n in common if old[n] > 0}
        excluded = []
    vals = sorted(ratios.values())
    q = statistics.quantiles(vals, n=4) if len(vals) >= 4 else [vals[0], vals[len(vals) // 2], vals[-1]]
    print(f"common queries: {len(common)}  (old total {sum(old[n] for n in common):.1f}s, "
          f"new total {sum(new[n] for n in common):.1f}s on the intersection)")
    if excluded:
        print(f"memo-builder queries excluded from ratios: {len(excluded)} "
              f"(attribution is ordering noise): {excluded[:8]}"
              + (" ..." if len(excluded) > 8 else ""))
    print(f"ratio new/old: median {statistics.median(vals):.3f}  p25 {q[0]:.3f}  p75 {q[2]:.3f}")
    # Venue calibration (BENCH_DETAIL ≥ r14 carries calibration_rps, a
    # fixed JVM-only plan's rows/sec; ingest_eps is the r13-era probe).
    # venue_ratio > 1 means the NEW run's venue was faster; dividing
    # the raw median by it reads the code effect with drift removed.
    for probe in ("calibration_rps", "ingest_eps"):
        o, nw = old_doc.get(probe), new_doc.get(probe)
        if o and nw:
            venue = nw / o
            print(
                f"venue calibration ({probe}): old {o:,.0f}  new {nw:,.0f}"
                f"  venue_ratio {venue:.3f}  → drift-normalized median "
                f"{statistics.median(vals) * venue:.3f}"
            )
            break
    movers = sorted(ratios.items(), key=lambda kv: kv[1])
    print("fastest movers:", [(n, round(r, 2)) for n, r in movers[:3]])
    print("slowest movers:", [(n, round(r, 2)) for n, r in movers[-3:]])
    # family-level medians (needs the "family" map, BENCH_DETAIL ≥ r8):
    # totals hide which operator family moved; per-family medians are
    # drift-robust the same way the global median is
    fam_of = new_doc.get("family") or old_doc.get("family") or {}
    by_fam: dict[str, list[float]] = {}
    for n, r in ratios.items():
        fam = fam_of.get(n)
        if fam:
            by_fam.setdefault(fam, []).append(r)
    if by_fam:
        rows = sorted(
            (statistics.median(v), f, len(v)) for f, v in by_fam.items()
        )
        print("family medians (new/old):")
        for med, fam, n in rows:
            print(f"  {fam:<22} {med:.3f}  (n={n})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
