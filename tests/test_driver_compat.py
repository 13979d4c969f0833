"""Driver-environment compatibility: the contract functions must work
on a session the engine did NOT build — Spark 4 defaults (ANSI on, no
legacy nanos conf). ``spark.newSession()`` shares the JVM but gets its
own SQLConf, so we can simulate the driver's session inside the test
JVM."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def vanilla(spark):
    ns = spark.newSession()
    # undo the engine builder's session-level choices → Spark 4 defaults
    ns.conf.set("spark.sql.ansi.enabled", "true")
    ns.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return ns


class TestDriverContract:
    def test_entry_on_vanilla_session(self, vanilla):
        import __spark_entry__ as e

        df = e.entry(vanilla)
        assert df.count() > 0
        assert df.columns == ["r_name", "n_name", "revenue", "n_items"]

    def test_contract_maps_align(self):
        import __spark_entry__ as e

        qs, oracles = e.queries(), e.oracle_sql()
        assert set(oracles) <= set(qs)
        assert len(qs) >= 40

    @pytest.mark.parametrize(
        "name",
        [
            "events_by_hour",          # needs the ns-timestamp load path
            "streaming_hourly_stats",  # streaming machinery + nanos conf
            "pricing_summary",         # decimal arithmetic under ANSI
            "minhash_dup_pairs",       # hash/conv arithmetic under ANSI
            "value_percentiles",       # percentile under ANSI
        ],
    )
    def test_representative_queries_on_vanilla_session(self, vanilla, name, sf_dir):
        import __spark_entry__ as e

        assert e.queries()[name](vanilla, sf_dir).count() >= 0
