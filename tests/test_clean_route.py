"""Unit tests for transforms.clean / transforms.route on the synthetic
fixture, plus the golden end-to-end test against the reference's sample
output (path-gated; pins reference semantics exactly — SURVEY.md §5)."""

from __future__ import annotations

import csv

import pytest
from pyspark.sql import functions as F

from olap_project_spark.schemas import OUTPUT_COLUMNS, RAW_TRANSACTION_SCHEMA
from olap_project_spark.transforms import clean, route
from olap_project_spark.transforms.clean import to_output
from olap_project_spark.transforms.route import invalid_log
from tests.fixtures import raw_transactions_df

FIXED_TS = "2024-01-15 08:30:20"


@pytest.fixture(scope="module")
def cleaned(spark):
    df = clean(raw_transactions_df(spark), rate=25057.0, processed_at=FIXED_TS)
    df.cache().count()
    yield df
    df.unpersist()


def by_user(df, cols):
    return {r["User"]: r for r in df.select("User", *cols).collect()}


class TestClean:
    def test_amount_parsing(self, cleaned):
        rows = by_user(cleaned, ["Amount_USD", "Amount_VND"])
        assert rows["0"]["Amount_USD"] == 125.50
        assert rows["1"]["Amount_USD"] == 1000.0  # comma stripped
        assert rows["6"]["Amount_USD"] == -5.0
        assert rows["5"]["Amount_USD"] is None
        # VND contract: null/≤0 USD → null VND (P14 null-guard)
        assert rows["0"]["Amount_VND"] == pytest.approx(125.50 * 25057.0)
        assert rows["6"]["Amount_VND"] is None
        assert rows["7"]["Amount_VND"] is None
        assert rows["5"]["Amount_VND"] is None

    def test_calendar_derivation(self, cleaned):
        rows = by_user(
            cleaned,
            ["Year", "Month", "Day", "Hour", "Day_of_Week", "Is_Weekend",
             "DateTime_Hour_Key", "Date_Formatted", "Time_Formatted"],
        )
        r = rows["0"]
        assert (r["Year"], r["Month"], r["Day"], r["Hour"]) == (2024, 1, 15, 8)
        assert r["Day_of_Week"] == "Monday"
        assert r["Is_Weekend"] == "No"
        assert r["DateTime_Hour_Key"] == "2024-01-15-08"
        assert r["Date_Formatted"] == "15/01/2024"
        assert r["Time_Formatted"] == "08:30:15"
        # Saturday + Sunday-boundary rows
        assert rows["1"]["Day_of_Week"] == "Saturday"
        assert rows["1"]["Is_Weekend"] == "Yes"
        assert rows["2"]["Day_of_Week"] == "Sunday"
        assert rows["2"]["Is_Weekend"] == "Yes"
        # unparseable timestamp → null calendar
        assert rows["8"]["Year"] is None
        assert rows["8"]["DateTime_Hour_Key"] is None

    def test_renames_and_trim(self, cleaned):
        assert "Use_Chip" in cleaned.columns and "Use Chip" not in cleaned.columns
        assert "Errors" in cleaned.columns and "Errors?" not in cleaned.columns
        r = by_user(cleaned, ["Errors", "Is_Fraud"])["3"]
        assert r["Errors"] == "Bad CVV"
        assert r["Is_Fraud"] == "No"

    def test_validity_flag_reference_mode(self, cleaned):
        rows = by_user(cleaned, ["is_valid_date"])
        assert rows["0"]["is_valid_date"] is True
        assert rows["8"]["is_valid_date"] is False  # bad timestamp

    def test_spec_mode_validates_raw_calendar(self, spark):
        """Regression: (a) lenient parser must not roll Feb-30 → Mar-1 into
        validity; (b) the check must read the RAW Year/Month/Day, not the
        timestamp-derived calendar that replaces them later in the chain."""
        from olap_project_spark.schemas import RAW_TRANSACTION_SCHEMA

        rows = [
            ("1", "c" * 16, 2024, 2, 30, "09:00:00", "$10.00", "Chip", "M",
             "C", "ST", "0", "0", "", "No", "2024-03-01T09:00:00"),
            ("2", "c" * 16, 2024, 2, 29, "09:00:00", "$10.00", "Chip", "M",
             "C", "ST", "0", "0", "", "No", "2024-02-29T09:00:00"),
            ("3", "c" * 16, None, None, None, "09:00:00", "$10.00", "Chip",
             "M", "C", "ST", "0", "0", "", "No", "2024-02-29T09:00:00"),
        ]
        df = spark.createDataFrame(rows, schema=RAW_TRANSACTION_SCHEMA)
        got = {
            r["User"]: r["is_valid_date"]
            for r in clean(df, validate_raw_date=True)
            .select("User", "is_valid_date")
            .collect()
        }
        # Feb-30 invalid even though its *timestamp* (Mar-1) is fine
        assert got == {"1": False, "2": True, "3": False}

    def test_output_projection(self, cleaned):
        out = to_output(cleaned)
        assert out.columns == OUTPUT_COLUMNS

    def test_no_python_udf_in_plan(self, cleaned, spark):
        """The whole transform must stay JVM-side (SURVEY.md §4)."""
        plan = to_output(
            clean(raw_transactions_df(spark), processed_at=FIXED_TS)
        )._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


class TestRoute:
    def test_reference_mode_counts(self, cleaned):
        streams = route(cleaned, mode="reference")
        got = {k: sorted(r["User"] or "~" for r in v.select("User").collect())
               for k, v in streams.items()}
        # valid: users 0,1,2(fraud overlap!),3(error overlap!)
        assert got["valid"] == ["0", "1", "2", "3"]
        # fraud: 2 and 9 (garbage-amount fraud)
        assert got["fraud"] == ["2", "9"]
        assert got["error"] == ["3"]
        # invalid: 4,5,6,7,8 — null-User row and fraud rows never audited
        assert got["invalid"] == ["4", "5", "6", "7", "8"]

    def test_spec_mode_partitions_input(self, cleaned):
        streams = route(cleaned, mode="spec")
        got = {k: sorted(r["User"] or "~" for r in v.select("User").collect())
               for k, v in streams.items()}
        assert got["valid"] == ["0", "1"]  # fraud/error excluded
        assert got["fraud"] == ["2", "9"]
        assert got["error"] == ["3"]
        # spec invalid = ¬error ∧ ¬fraud ∧ ¬well-formed → includes null-User
        assert got["invalid"] == ["4", "5", "6", "7", "8", "~"]
        # valid ∩ fraud = ∅ by construction
        assert not set(got["valid"]) & set(got["fraud"])

    def test_invalid_reasons(self, cleaned):
        inv = route(cleaned, mode="reference")["invalid"]
        reasons = {r["User"]: r["invalid_reason"]
                   for r in inv.select("User", "invalid_reason").collect()}
        assert reasons["8"] == "Invalid Date"
        assert reasons["4"] == "Data format invalid or missing"

    def test_invalid_log_projection(self, cleaned):
        log = invalid_log(route(cleaned, mode="reference")["invalid"])
        assert log.columns == ["Card", "User", "Amount_USD", "invalid_reason", "timestamp"]


class TestGoldenEndToEnd:
    """Run the batch-equivalent pipeline on the reference's own sample CSV
    and diff against its golden processed output (v2, 21 columns)."""

    @pytest.fixture(scope="class")
    def golden_rows(self, golden_v2_csv, raw_transactions_csv):
        with open(golden_v2_csv, newline="") as f:
            gold = list(csv.DictReader(f))
        with open(raw_transactions_csv, newline="") as f:
            raw_keys = {
                (r["User"], r["Card"], r["Year"], r["Month"], r["Day"])
                for r in csv.DictReader(f)
            }
        # The golden carries 2 rows (days 21-22) with no raw-CSV source —
        # compare on the intersection only.
        return [
            r for r in gold
            if (r["User"], r["Card"], r["Year"], r["Month"], r["Day"]) in raw_keys
        ]

    @pytest.fixture(scope="class")
    def implied_rate(self, golden_rows):
        # The golden was generated with a live float rate; its Exchange_Rate
        # column shows int(rate)=25057 but Amount_VND uses the float value.
        # Recover it from the data (SURVEY.md §1.3 "rate frozen at startup").
        for r in golden_rows:
            if r["Amount_USD"] and float(r["Amount_USD"]) > 0 and r["Amount_VND"]:
                return float(r["Amount_VND"]) / float(r["Amount_USD"])
        pytest.skip("no positive-amount golden row")

    @pytest.fixture(scope="class")
    def ours(self, spark, raw_transactions_csv, implied_rate):
        raw = (
            spark.read.option("header", True)
            .schema(RAW_TRANSACTION_SCHEMA)
            .csv(raw_transactions_csv)
        )
        # Producer behavior (pos_simulator.py:79-110): timestamp synthesized
        # from CSV Year/Month/Day + Time. We reproduce it batch-side.
        raw = raw.withColumn(
            "timestamp",
            F.format_string("%04d-%02d-%02dT%s", "Year", "Month", "Day", "Time"),
        )
        return to_output(clean(raw, rate=implied_rate, processed_at=FIXED_TS))

    def test_row_count_matches(self, ours, golden_rows):
        assert ours.count() == len(golden_rows)

    def test_values_match_golden(self, ours, golden_rows):
        skip = {"Processed_Timestamp"}  # wall-clock, excluded (P15)
        ours_rows = sorted(
            ours.collect(), key=lambda r: (r["User"], r["Card"], r["DateTime_Hour_Key"], str(r["Amount_USD"]))
        )
        # Golden timestamps came from the *live* producer run date; the raw
        # CSV Year/Month/Day is what both sides key on, so sort identically.
        gold = sorted(
            golden_rows, key=lambda r: (r["User"], r["Card"], r["DateTime_Hour_Key"], str(float(r["Amount_USD"]) if r["Amount_USD"] else None))
        )
        mismatches = []
        for mine, want in zip(ours_rows, gold):
            for col in OUTPUT_COLUMNS:
                if col in skip:
                    continue
                m, w = mine[col], want[col]
                if col == "Amount_VND":
                    # Golden rows carry rates from *several* live producer
                    # runs (25056.78..25058.05) — a single implied rate
                    # can't match exactly; verify the conversion shape to
                    # 1e-4 relative instead.
                    m = None if m is None else float(m)
                    w = None if w in ("", None) else float(w)
                    if m is not None and w is not None and w != 0:
                        if abs(m - w) / abs(w) < 5e-4:
                            continue
                elif col == "Amount_USD":
                    m = None if m is None else round(float(m), 2)
                    w = None if w in ("", None) else round(float(w), 2)
                elif col in ("Year", "Month", "Day", "Hour", "Exchange_Rate"):
                    m = None if m is None else int(m)
                    w = None if w in ("", None) else int(w)
                else:
                    m = "" if m is None else str(m)
                    w = "" if w is None else str(w)
                if m != w:
                    mismatches.append((mine["User"], col, m, w))
        assert not mismatches, mismatches[:10]


class TestObservability:
    """Production metric collection with the Observation API: pipeline
    health counters ride along with the action (no second scan), the
    in-flight form of the reference's console-sink debugging."""

    def test_clean_metrics_ride_along(self, spark):
        from pyspark.sql import Observation

        raw = raw_transactions_df(spark)
        obs = Observation("clean_metrics")
        cleaned = clean(raw).observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("Amount_USD").isNull(), 1).otherwise(0)
            ).alias("n_bad_amount"),
            F.sum(F.when(F.col("Is_Fraud") == "Yes", 1).otherwise(0)).alias(
                "n_fraud"
            ),
        )
        n = cleaned.count()  # ONE action: metrics observed during it
        got = obs.get
        assert got["n_rows"] == n
        want_fraud = clean(raw).filter(F.col("Is_Fraud") == "Yes").count()
        want_bad = clean(raw).filter(F.col("Amount_USD").isNull()).count()
        assert got["n_fraud"] == want_fraud
        assert got["n_bad_amount"] == want_bad
