"""Property-based routing invariants (SURVEY.md §5): for arbitrary raw
transaction rows, the four streams obey their mode's algebra. Uses
hypothesis to generate adversarial field combinations (nulls, garbage
amounts, short cards, invalid dates) far beyond the fixture."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from olap_project_spark.schemas import RAW_TRANSACTION_SCHEMA
from olap_project_spark.transforms import clean, route

amounts = st.one_of(
    st.none(),
    st.just("$0.00"),
    st.just("-$12.00"),
    st.just("not-money"),
    st.builds(lambda d: f"${d:,.2f}", st.floats(0.01, 99999, allow_nan=False)),
)
cards = st.one_of(st.none(), st.just("123"), st.just("4532015112830366"))
users = st.one_of(st.none(), st.text(alphabet="0123456789", min_size=1, max_size=3))
errors = st.sampled_from([None, "", "Bad CVV", " Technical Glitch "])
fraud = st.sampled_from(["Yes", "No"])
timestamps = st.sampled_from(
    ["2024-01-15T08:30:15", "2024-02-30T10:00:00", "garbage", "2024-01-13T23:59:59"]
)

row_strategy = st.tuples(users, cards, amounts, errors, fraud, timestamps)


def make_raw(spark, rows):
    data = [
        (u, c, 2024, 1, 15, "08:30:15", a, "Chip", "M", "C", "ST", "0", "0", e, f, ts)
        for (u, c, a, e, f, ts) in rows
    ]
    return spark.createDataFrame(data, RAW_TRANSACTION_SCHEMA)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(row_strategy, min_size=1, max_size=12))
def test_routing_invariants(spark, rows):
    cleaned = clean(make_raw(spark, rows), processed_at="2024-01-15 09:00:00")
    cleaned = cleaned.cache()
    try:
        n = cleaned.count()

        ref_streams = route(cleaned, mode="reference")
        spec_streams = route(cleaned, mode="spec")
        spec = {k: v.count() for k, v in spec_streams.items()}

        # Reference mode: the invalid audit contains only non-fraud,
        # non-error rows (its literal predicate, F4)
        assert ref_streams["invalid"].filter("Is_Fraud <> 'No'").count() == 0
        assert (
            ref_streams["invalid"]
            .filter("Errors IS NOT NULL AND Errors <> ''")
            .count()
            == 0
        )

        # Spec mode: the four streams cover the space without valid/fraud
        # or valid/error overlap, and (valid + invalid) ∪ fraud ∪ error
        # partitions rows up to the error∩fraud overlap (a row can be
        # both error and fraud).
        both_ef = spec_streams["error"].filter("Is_Fraud = 'Yes'").count()
        assert spec["valid"] + spec["invalid"] + spec["fraud"] + spec["error"] - both_ef == n

        # valid rows in spec mode are structurally sound
        for r in spec_streams["valid"].collect():
            assert r["Amount_USD"] is not None and r["Amount_USD"] > 0
            assert r["Card"] is not None and len(r["Card"]) >= 16
            assert r["Is_Fraud"] == "No"
    finally:
        cleaned.unpersist()


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(row_strategy, min_size=1, max_size=8))
def test_null_contract(spark, rows):
    """null-in → null-out for amount parsing; VND null iff USD null/≤0."""
    cleaned = clean(make_raw(spark, rows), processed_at="2024-01-15 09:00:00")
    for r in cleaned.select("Amount", "Amount_USD", "Amount_VND").collect():
        if r["Amount"] is None or r["Amount_USD"] is None:
            assert r["Amount_VND"] is None
        elif r["Amount_USD"] <= 0:
            assert r["Amount_VND"] is None
        else:
            assert r["Amount_VND"] == pytest.approx(r["Amount_USD"] * 25057.0)
