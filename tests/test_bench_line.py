"""The bench's one-line JSON contract: rounds 1 and 2 both failed to
give the driver a parsable metric (r1 line overflowed the 2000-char
tail capture, r2 crashed before printing). These tests pin the two
guarantees that prevent a third miss: the line always fits the cap and
always parses, under any query count / name length / error volume."""

from __future__ import annotations

import json

from bench import build_line


def _mk(n_queries: int, name_len: int = 40, n_errors: int = 0):
    times = {f"q{'x' * name_len}_{i}": 1.234 for i in range(n_queries)}
    errors = {
        f"e{'y' * name_len}_{i}": "SomeException: " + "z" * 300
        for i in range(n_errors)
    }
    fams = {f"family_{i}": 9.9 for i in range(min(n_queries, 12))}
    headline = dict(list(times.items())[:20])
    return times, fams, headline, errors


class TestBenchLine:
    def test_typical_shape_fits_and_parses(self):
        times, fams, headline, errors = _mk(142)
        line = build_line(123.4, times, fams, headline, errors, "0.1")
        assert len(line) <= 1800
        d = json.loads(line)
        assert d["metric"] == "query_library_total"
        assert d["value"] == 123.4 and d["sf"] == 0.1
        assert d["n_queries"] == 142

    def test_pathological_names_and_errors_still_fit(self):
        times, fams, headline, errors = _mk(500, name_len=120, n_errors=200)
        line = build_line(999.9, times, fams, headline, errors, "0.1")
        assert len(line) <= 1800
        assert json.loads(line)["n_errors"] == 200

    def test_all_failed_run_still_reports(self):
        times, fams, headline, errors = _mk(0, n_errors=142)
        line = build_line(0.0, times, fams, headline, errors, "0.1")
        assert len(line) <= 1800
        d = json.loads(line)
        assert d["n_queries"] == 0 and d["n_errors"] == 142
        assert d["sec_per_query"] == 0.0  # no division crash

    def test_non_numeric_sf_passes_through(self):
        times, fams, headline, errors = _mk(3)
        d = json.loads(build_line(1.0, times, fams, headline, errors, "custom"))
        assert d["sf"] == "custom"
