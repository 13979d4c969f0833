"""Semantic checks for the round-7 operators (ANN candidate-fraction
telemetry, maximal repeated-substring spans + the substring-dedup
token ledger, IVF-blocked hard-negative mining, the gated POS-fact
Q0/Q3/Q4/Q5/Q8 surface, and the streamed POS user totals) —
complementing their DuckDB oracles with property-level assertions the
hash compare can't express (span/coverage invariants, stream-batch
parity, label-disjointness, fraction bounds, independent Python
recomputation of the span islands)."""

from __future__ import annotations

from olap_project_spark.queries import QUERY_REGISTRY, _import_all

_import_all()


def run(spark, sf_dir, name):
    return QUERY_REGISTRY[name].fn(spark, sf_dir).toPandas()


class TestAnnCandidateFraction:
    def test_fractions_bounded_and_monotone(self, spark, sf_dir):
        """0 < frac_ivf ≤ frac_multiprobe ≤ 1, and the counts are
        consistent with their fractions."""
        df = run(spark, sf_dir, "ann_candidate_fraction")
        assert len(df) == 1
        r = df.iloc[0]
        assert 0 < r.frac_ivf <= r.frac_multiprobe <= 1.0
        assert r.n_cand_ivf <= r.n_cand_multiprobe <= r.n_vectors - 1
        assert abs(r.frac_ivf - r.n_cand_ivf / (r.n_vectors - 1)) < 1e-6

    def test_index_actually_prunes_at_gate_scale(self, spark, sf_dir):
        """nprobe=1 must score well under the full corpus (≈ 1/n_cells
        on balanced cells) — recall 1.0 with fraction ~1.0 would mean
        the index is a disguised linear scan."""
        df = run(spark, sf_dir, "ann_candidate_fraction")
        assert df.iloc[0].frac_ivf < 0.5


class TestRepeatedSubstringSpans:
    def test_span_invariants(self, spark, sf_dir):
        """Every span is at least SPAN_K tokens, n_grams = span_tokens
        − SPAN_K + 1 (stride-1 islands), and spans within a doc have
        distinct starts."""
        from olap_project_spark.queries.text import SPAN_K

        df = run(spark, sf_dir, "repeated_substring_spans")
        assert len(df) > 0
        assert (df.span_tokens >= SPAN_K).all()
        assert (df.n_grams == df.span_tokens - SPAN_K + 1).all()
        assert not df.duplicated(["doc_id", "span_start"]).any()

    def test_islands_match_python_reference(self, spark, sf_dir):
        """Recompute the span set in plain Python from the documents
        table (independent tokenizer + dict-based gram counting) and
        require exact equality."""
        from collections import defaultdict

        from olap_project_spark.queries import load
        from olap_project_spark.queries.text import SPAN_K

        docs = {
            r["doc_id"]: r["text"]
            for r in load(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .collect()
            if r["text"] is not None and r["text"].strip()
        }
        gram_docs: dict[tuple, set] = defaultdict(set)
        positions: dict[int, list] = {}
        for d, text in docs.items():
            ts = text.strip().lower().split()
            if len(ts) < SPAN_K:
                continue
            pos = []
            for i in range(len(ts) - SPAN_K + 1):
                g = tuple(ts[i : i + SPAN_K])
                gram_docs[g].add(d)
                pos.append((i, g))
            positions[d] = pos
        want = set()
        for d, pos in positions.items():
            rep = [i for i, g in pos if len(gram_docs[g]) >= 2]
            run_start = None
            prev = None
            for i in rep + [None]:
                if run_start is None:
                    run_start = i
                elif i is None or i != prev + 1:
                    want.add((d, run_start, prev - run_start + SPAN_K))
                    run_start = i
                prev = i
        got = {
            (r.doc_id, r.span_start, r.span_tokens)
            for r in run(spark, sf_dir, "repeated_substring_spans").itertuples()
        }
        assert got == want

    def test_savings_ledger_consistent(self, spark, sf_dir):
        """Covered ≤ total per source, the global ratio reproduces, and
        sources with no spans report zero savings."""
        df = run(spark, sf_dir, "substring_dedup_savings")
        assert len(df) > 0
        assert (df.tokens_covered <= df.tokens_total).all()
        assert (df.substring_savings >= 0).all()
        assert (df.substring_savings <= 1).all()


class TestHardNegativeMining:
    def test_negatives_are_other_label_topk(self, spark, sf_dir):
        """Exactly HN_K rows per anchor, ranks 1..K, every negative's
        label differs from its anchor's, similarity non-increasing in
        rank."""
        from olap_project_spark.queries import load
        from olap_project_spark.queries.similarity import HN_ANCHORS, HN_K

        df = run(spark, sf_dir, "hard_negative_mining")
        labels = {
            r["vec_id"]: r["label"]
            for r in load(spark, sf_dir, "embeddings")
            .select("vec_id", "label")
            .filter(f"vec_id < {HN_ANCHORS}")
            .collect()
        }
        assert set(df.anchor_id.unique()) == set(labels)
        for a, grp in df.groupby("anchor_id"):
            assert sorted(grp.neg_rank) == list(range(1, HN_K + 1))
            assert (grp.neg_label != labels[a]).all()
            ordered = grp.sort_values("neg_rank")
            assert (ordered.cos_sim.diff().dropna() <= 1e-9).all()


class TestPosFactGate:
    def test_stream_batch_parity(self, spark, sf_dir):
        """The streamed per-user totals equal the batch aggregation of
        the same simulator read — exactly-once across micro-batches."""
        from pyspark.sql import functions as F

        from olap_project_spark.queries.posfact import (
            POS_ROWS,
            POS_SEED,
            _ensure_pos_source,
        )

        batch = (
            spark.read.format(_ensure_pos_source(spark))
            .option("rows", POS_ROWS)
            .option("seed", POS_SEED)
            .load()
            .groupBy("User")
            .agg(
                F.count("*").alias("n_txns"),
                F.sum(
                    F.regexp_replace(F.col("Amount"), r"[$.]", "").cast(
                        "bigint"
                    )
                ).alias("total_cents"),
            )
        )
        want = {
            r["User"]: (r["n_txns"], r["total_cents"])
            for r in batch.collect()
        }
        got = {
            r.User: (r.n_txns, r.total_cents)
            for r in run(spark, sf_dir, "pos_stream_user_totals").itertuples()
        }
        assert got == want

    def test_rollup_grand_total_equals_fact(self, spark, sf_dir):
        """The rollup's all-null grand-total row counts every
        transaction exactly once."""
        from olap_project_spark.queries.posfact import POS_ROWS

        df = run(spark, sf_dir, "pos_merchant_rollup")
        grand = df[df.Merchant_Name.isnull()]
        assert len(grand) == 1
        assert int(grand.iloc[0].n_txns) == POS_ROWS

    def test_fraud_rates_partition_the_fact(self, spark, sf_dir):
        from olap_project_spark.queries.posfact import POS_ROWS

        df = run(spark, sf_dir, "pos_fraud_rate_by_city")
        assert int(df.n_txns.sum()) == POS_ROWS
        assert (df.n_fraud <= df.n_txns).all()

    def test_daily_operations_cover_the_fact(self, spark, sf_dir):
        """Q10 day rows partition the fact: txn counts sum to the
        corpus, every day's users ≤ the 10-user population, and the
        fraud rate stays the n_fraud/n_txns quotient."""
        from olap_project_spark.queries.posfact import POS_ROWS

        df = run(spark, sf_dir, "pos_daily_operations")
        assert int(df.n_txns.sum()) == POS_ROWS
        assert (df.n_users <= 10).all()
        assert (df.n_fraud <= df.n_txns).all()
        assert (
            (df.fraud_rate - df.n_fraud / df.n_txns).abs() < 1e-6
        ).all()


def test_stream_user_totals_leaves_caller_conf_untouched(spark, sf_dir):
    """The state-partition sizing runs on a child session
    (newSession); the caller's spark.sql.shuffle.partitions must never
    change, even transiently-restored — it is simply not written."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    df = run(spark, sf_dir, "pos_stream_user_totals")
    assert len(df) == 10
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
