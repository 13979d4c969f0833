"""Property tests for context-window packing: for ANY corpus the bin
assignment must be a contiguous, order-preserving partition of each
source's documents with exact token conservation. The DuckDB oracle
pins one dataset; these pin the algebra."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from olap_project_spark.queries.text import PACK_BUDGET


def reference_pack(token_counts: list[int], budget: int) -> list[int]:
    """Independent pure-Python packing: doc i's bin = its starting
    token offset // budget under in-order concatenation."""
    bins, offset = [], 0
    for n in token_counts:
        bins.append(offset // budget)
        offset += n
    return bins


doc_strategy = st.lists(
    st.integers(min_value=0, max_value=3 * PACK_BUDGET), min_size=1, max_size=40
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(doc_strategy, doc_strategy)
def test_packing_matches_reference_and_conserves_tokens(spark, src_a, src_b):
    rows = []
    did = 0
    for source, counts in (("a", src_a), ("b", src_b)):
        for n in counts:
            rows.append((source, did, " ".join(["tok"] * n)))
            did += 1
    docs = spark.createDataFrame(rows, "source string, doc_id long, text string")

    # mirror the registered query's packing on an arbitrary frame
    from olap_project_spark.functions.text import token_count
    from pyspark.sql.window import Window as W

    toks = docs.select(
        "source", "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    cum = F.sum("n_tokens").over(
        W.partitionBy("source").orderBy("doc_id").rowsBetween(
            W.unboundedPreceding, W.currentRow
        )
    )
    got = {
        (r["source"], r["doc_id"]): r["bin"]
        for r in toks.withColumn(
            "bin",
            F.floor((cum - F.col("n_tokens")) / float(PACK_BUDGET)).cast("bigint"),
        ).collect()
    }

    did = 0
    for source, counts in (("a", src_a), ("b", src_b)):
        want = reference_pack(counts, PACK_BUDGET)
        for j, n in enumerate(counts):
            assert got[(source, did)] == want[j], (source, did, n)
            did += 1
        # bins are contiguous and non-decreasing per source
        assert want == sorted(want)


def test_registered_query_partitions_the_corpus(spark, sf_dir):
    """Every document lands in exactly one (source, bin); token totals
    are conserved; bins within a source tile contiguous doc ranges."""
    import duckdb

    from olap_project_spark.queries import QUERY_REGISTRY, _import_all

    _import_all()
    rows = QUERY_REGISTRY["context_packing_stats"].fn(spark, sf_dir).collect()
    n_docs = sum(r["n_docs"] for r in rows)
    want_docs, want_tokens = duckdb.sql(
        "SELECT count(*), sum(CASE WHEN trim(text)='' THEN 0 ELSE"
        " len(string_split_regex(trim(text), '\\s+')) END)"
        f" FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchone()
    assert n_docs == want_docs
    assert sum(r["n_tokens"] for r in rows) == want_tokens
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for rs in by_source.values():
        rs.sort(key=lambda r: r["bin"])
        for a, b in zip(rs, rs[1:]):
            assert a["last_doc"] < b["first_doc"]  # contiguous tiling


pii_text = st.text(
    alphabet=st.sampled_from("ab @.+-0123456789<>"), min_size=0, max_size=60
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(pii_text, min_size=1, max_size=20))
def test_redact_pii_idempotent_and_complete(spark, texts):
    """Redaction is a fixpoint (tags contain nothing matchable) and no
    PII pattern survives one pass, for adversarial near-PII strings."""
    from olap_project_spark.functions.text import (
        CCN_PATTERN,
        EMAIL_PATTERN,
        PHONE_PATTERN,
        redact_pii,
    )

    df = spark.createDataFrame([(t,) for t in texts], "s string")
    once = redact_pii(F.col("s"))
    rows = df.select(
        once.alias("r1"),
        redact_pii(once).alias("r2"),
        (
            F.col("s").rlike(EMAIL_PATTERN)
            | F.col("s").rlike(PHONE_PATTERN)
            | F.col("s").rlike(CCN_PATTERN)
        ).alias("had_pii"),
    ).collect()
    for r in rows:
        assert r["r1"] == r["r2"]  # idempotent
        for pat in (EMAIL_PATTERN, PHONE_PATTERN, CCN_PATTERN):
            import re

            assert not re.search(pat, r["r1"]), (r["r1"], pat)


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
