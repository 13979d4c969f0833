#!/usr/bin/env python3
"""Regenerate QUERIES.md — the one-line-per-query catalog of the
registry (name, family, oracle kind, first docstring sentence).
Run after adding queries: ``python3 tools/gen_catalog.py``."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def first_sentence(doc: str) -> str:
    text = " ".join((doc or "").split())
    for stop in (". ", ".\n"):
        if stop in text:
            return text[: text.index(stop) + 1]
    return text[:160]


def main() -> None:
    from olap_project_spark.queries import QUERY_REGISTRY, _import_all

    _import_all()
    by_family: dict[str, list] = {}
    for name, q in QUERY_REGISTRY.items():
        fam = q.fn.__module__.rsplit(".", 1)[-1]
        by_family.setdefault(fam, []).append((name, q))

    lines = [
        "# QUERIES — the registry catalog",
        "",
        f"{len(QUERY_REGISTRY)} registered queries; every one carries a "
        "DuckDB oracle (self-validating contract rows for the sketch/"
        "iterative ones). Regenerate with `python3 tools/gen_catalog.py`.",
        "",
    ]
    for fam in sorted(by_family):
        entries = by_family[fam]
        lines.append(f"## {fam} ({len(entries)})")
        lines.append("")
        lines.append("| query | summary |")
        lines.append("|---|---|")
        for name, q in sorted(entries):
            summary = first_sentence(q.doc).replace("|", "\\|")
            lines.append(f"| `{name}` | {summary} |")
        lines.append("")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if "__file__" in globals()
        else ".",
        "QUERIES.md",
    )
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "QUERIES.md")
    with open(os.path.abspath(out), "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {os.path.abspath(out)}: {len(QUERY_REGISTRY)} queries")


if __name__ == "__main__":
    main()
