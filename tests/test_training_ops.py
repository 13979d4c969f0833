"""Tests for the training-data operators (dedup / similarity / text /
multimodal) against independent pure-Python references — complementing
the DuckDB oracle gate (tools/oracle_check.py) with semantic checks."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from olap_project_spark.functions.text import (
    MERSENNE31,
    minhash_param,
    portable_hash48,
    token_count,
)
from olap_project_spark.queries import QUERY_REGISTRY, _import_all

_import_all()


def q(name):
    return QUERY_REGISTRY[name].fn


class TestTextFunctions:
    def test_portable_hash48_matches_hashlib(self, spark):
        df = spark.createDataFrame([("hello world",)], "s string")
        got = df.select(portable_hash48(F.col("s")).alias("h")).collect()[0]["h"]
        want = int(hashlib.md5(b"hello world").hexdigest()[:12], 16)
        assert got == want

    def test_token_count_edges(self, spark):
        rows = [("a b  c",), ("  ",), ("",), ("one",), (None,)]
        df = spark.createDataFrame(rows, "s string")
        got = [r["n"] for r in df.select(token_count(F.col("s")).alias("n")).collect()]
        assert got == [3, 0, 0, 1, None]

    def test_minhash_params_deterministic(self):
        assert minhash_param(0) == minhash_param(0)
        assert len({minhash_param(k) for k in range(32)}) == 32
        for k in range(32):
            a, b = minhash_param(k)
            assert 1 <= a < MERSENNE31 and 0 <= b < MERSENNE31

    def test_redact_pii(self, spark):
        from olap_project_spark.functions.text import redact_pii

        rows = [
            ("mail me at a.b+tag@sub.example.co.uk today",),
            ("call +84-123-4567 or +1-555-123-4567 now",),
            ("card 1234-5678-9012-3456 expired",),
            ("multi j@x.io k@y.org +1-555-0000 9999-8888-7777-6666",),
            ("clean text, no pii at all",),
            ("",),
            (None,),
        ]
        df = spark.createDataFrame(rows, "s string")
        got = [
            r["r"] for r in df.select(redact_pii(F.col("s")).alias("r")).collect()
        ]
        assert got[0] == "mail me at <EMAIL> today"
        assert got[1] == "call <PHONE> or <PHONE> now"
        assert got[2] == "card <CCN> expired"
        assert got[3] == "multi <EMAIL> <EMAIL> <PHONE> <CCN>"
        assert got[4] == "clean text, no pii at all"
        assert got[5] == ""
        assert got[6] is None


class TestDedup:
    @pytest.fixture(scope="class")
    def truth_pairs(self, spark, sf_dir):
        """Ground-truth near-dup pairs: exact shingle Jaccard ≥ 0.7 over
        the stop-shingle-filtered universe (df ≤ NGRAM_MAX_DF, mirroring
        the engine's cap), computed by an independent pure-Python
        implementation."""
        import duckdb  # only to read parquet conveniently

        from olap_project_spark.queries.dedup import NGRAM_MAX_DF

        rows = duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
        shingles = {}
        for doc_id, text in rows:
            toks = text.strip().lower().split()
            shingles[doc_id] = {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }
        df_count: dict[str, int] = {}
        for s in shingles.values():
            for sh in s:
                df_count[sh] = df_count.get(sh, 0) + 1
        shingles = {
            d: {sh for sh in s if df_count[sh] <= NGRAM_MAX_DF}
            for d, s in shingles.items()
        }
        pairs = {}
        ids = sorted(shingles)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                inter = len(shingles[a] & shingles[b])
                if not inter:
                    continue
                jac = inter / (len(shingles[a]) + len(shingles[b]) - inter)
                if jac >= 0.7:
                    pairs[(a, b)] = round(jac, 6)
        return pairs

    def test_ngram_pairs_match_python_reference(self, spark, sf_dir, truth_pairs):
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in q("ngram_dup_pairs")(spark, sf_dir).collect()
        }
        assert got == truth_pairs

    def test_prefix_filter_is_lossless(self, spark, sf_dir, truth_pairs):
        """PPJoin prefix filtering must yield EXACTLY the full posting-
        join's pair set — it is a candidate-pruning rewrite, not an
        approximation."""
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in q("prefix_filtered_dup_pairs")(spark, sf_dir).collect()
        }
        assert got == truth_pairs

    def test_minhash_recall_and_precision(self, spark, sf_dir, truth_pairs):
        got = {
            (r["doc_a"], r["doc_b"]) for r in q("minhash_dup_pairs")(spark, sf_dir).collect()
        }
        # Precision is 1.0 by construction (candidates are verified with
        # exact Jaccard); recall bounded by the LSH miss rate.
        assert got <= set(truth_pairs)
        if truth_pairs:
            recall = len(got) / len(truth_pairs)
            assert recall >= 0.8, f"LSH recall {recall:.2f} too low"

    def test_simhash_finds_mostly_true_pairs(self, spark, sf_dir, truth_pairs):
        got = {
            (r["doc_a"], r["doc_b"]) for r in q("simhash_dup_pairs")(spark, sf_dir).collect()
        }
        if truth_pairs:
            # sketch-based: allow some slack both directions, but it must
            # overlap the truth set substantially
            inter = got & set(truth_pairs)
            assert len(inter) >= 0.6 * len(truth_pairs)
            assert len(got) <= 3 * len(truth_pairs) + 5

    def test_exact_dedup_consistent_totals(self, spark, sf_dir):
        rows = q("exact_dedup_summary")(spark, sf_dir).collect()
        for r in rows:
            assert r["n_docs"] == r["n_unique"] + r["n_dupes"]

    def test_benchmark_contamination_invariants(self, spark, sf_dir):
        """Train/eval roles are disjoint by construction, overlap is a
        valid fraction, and every reported pair clears the threshold."""
        from olap_project_spark.queries.dedup import (
            CONTAM_EVAL_MOD,
            CONTAM_MIN_OVERLAP,
        )

        rows = q("benchmark_contamination")(spark, sf_dir).collect()
        for r in rows:
            assert r["eval_doc"] % CONTAM_EVAL_MOD == 0
            assert r["train_doc"] % CONTAM_EVAL_MOD != 0
            assert CONTAM_MIN_OVERLAP <= r["overlap_frac"] <= 1.0
            assert r["n_common"] >= 1


class TestSimilarity:
    @pytest.fixture(scope="class")
    def vectors(self, sf_dir):
        import duckdb

        rows = duckdb.sql(
            f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
        ).fetchall()
        return {vid: np.array(emb, dtype=np.float64) for vid, emb in rows}

    def test_bruteforce_topk_matches_numpy(self, spark, sf_dir, vectors):
        qv = vectors[0]
        sims = {
            vid: float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))
            for vid, v in vectors.items()
            if vid != 0
        }
        want = sorted(sims, key=lambda k: (-sims[k], k))[:10]
        got = [r["vec_id"] for r in q("ann_topk_bruteforce")(spark, sf_dir).collect()]
        assert got == want  # result arrives in rank order
        for r in q("ann_topk_bruteforce")(spark, sf_dir).collect():
            assert r["cos_sim"] == pytest.approx(sims[r["vec_id"]], abs=1e-6)

    def test_ivf_near_dups_subset_of_exact(self, spark, sf_dir):
        exact = {
            (r["vec_a"], r["vec_b"]): r["cos_sim"]
            for r in q("embedding_near_dup_pairs")(spark, sf_dir).collect()
        }
        ivf = {
            (r["vec_a"], r["vec_b"]): r["cos_sim"]
            for r in q("ivf_near_dup_pairs")(spark, sf_dir).collect()
        }
        # precision 1.0: every IVF pair is a true near-dup with the same cosine
        for k, v in ivf.items():
            assert k in exact and exact[k] == v
        # recall: same-cell restriction misses cross-cell pairs; require >0
        if exact:
            assert len(ivf) > 0

    def test_ivf_results_subset_of_corpus_cell(self, spark, sf_dir, vectors):
        got = q("ann_ivf_topk")(spark, sf_dir).collect()
        assert 0 < len(got) <= 10
        # every IVF hit's cosine must match the exact cosine
        qv = vectors[0]
        for r in got:
            v = vectors[r["vec_id"]]
            exact = float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))
            assert r["cos_sim"] == pytest.approx(exact, abs=1e-6)


class TestIterative:
    def test_kmeans_invariants(self, spark, sf_dir):
        import duckdb

        n = duckdb.sql(
            f"SELECT count(*) FROM read_parquet('{sf_dir}/embeddings.parquet')"
        ).fetchone()[0]
        rows = q("kmeans_cluster_profile")(spark, sf_dir).collect()
        # single self-validating contract row (see the oracle note)
        assert len(rows) == 1
        r = rows[0]
        assert r["n_vectors"] == n
        assert r["dim"] > 0
        assert r["all_assigned"] is True
        assert r["k_at_most_8"] is True
        assert r["dispersion_monotone"] is True
        # deterministic across runs (fixed init, fixed iterations)
        rows2 = q("kmeans_cluster_profile")(spark, sf_dir).collect()
        assert rows == rows2


class TestMultimodal:
    def test_resize_frames_features_plumbing(self, spark, sf_dir):
        from olap_project_spark.functions.multimodal import (
            extract_features,
            resize_media,
            sample_frames,
            with_media_column,
        )
        from olap_project_spark.sources import load_table

        media = with_media_column(load_table(spark, sf_dir, "documents")).repartition(5)
        n_docs = media.count()

        resized = resize_media(media, 64, 48)
        assert resized.columns == ["doc_id", "width", "height", "resized_bytes"]
        r = resized.first()
        assert (r["width"], r["height"], r["resized_bytes"]) == (64, 48, 64 * 48 * 3)
        assert resized.count() == n_docs

        frames = sample_frames(media, every_n_bytes=100)
        assert frames.count() > n_docs  # one-to-many expansion
        one = frames.filter(F.col("frame_index") == 1).first()
        assert one["frame_offset_bytes"] == 100

        feats = extract_features(media)
        assert feats.count() == n_docs
        # deterministic across runs
        a = {r["doc_id"]: r["feature_norm"] for r in feats.collect()}
        b = {r["doc_id"]: r["feature_norm"] for r in extract_features(media).collect()}
        assert a == b

    def test_decode_pipeline_schema_and_determinism(self, spark, sf_dir):
        from olap_project_spark.functions.multimodal import (
            decode_media,
            with_media_column,
        )
        from olap_project_spark.sources import load_table

        docs = load_table(spark, sf_dir, "documents")
        media = with_media_column(docs)
        assert dict(media.dtypes)["media_bytes"] == "binary"
        decoded = decode_media(media.repartition(7))  # exercise batch boundaries
        assert decoded.columns == ["doc_id", "n_bytes", "width", "height", "n_frames"]
        rows = {r["doc_id"]: r for r in decoded.collect()}
        docs_rows = {r["doc_id"]: r["text"] for r in docs.collect()}
        assert len(rows) == len(docs_rows)
        for doc_id, text in list(docs_rows.items())[:20]:
            n = len(text.encode("utf-8"))
            r = rows[doc_id]
            assert r["n_bytes"] == n
            assert r["width"] == 64 + n % 577
            assert r["height"] == 64 + (n * 31) % 353
            assert r["n_frames"] == 1 + n % 7


class TestConnectedComponents:
    """Multi-hop convergence of the graph primitive on synthetic edges
    (the corpus's real dup clusters are mostly diameter-1 pairs)."""

    def test_chain_and_island(self, spark):
        from olap_project_spark.functions.graph import connected_components

        # chain 1-2-3-4-5 (diameter 4) + island pair 10-11 + triangle 20-21-22
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22), (20, 22)],
            "src: bigint, dst: bigint",
        )
        got = {
            r.doc_id: r.label
            for r in connected_components(edges).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                       10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


class TestUdtfExtensionPoint:
    """§2.10 UDTF surface: the escape hatch must agree with the native
    chunking path on the common subset."""

    def test_udtf_matches_native_chunker(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from olap_project_spark.functions.udtfs import register_udtfs

        register_udtfs(spark)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
        docs.createOrReplaceTempView("udtf_docs")
        via_udtf = spark.sql(
            """
            SELECT d.doc_id, c.chunk_idx, c.n_tokens, md5(c.chunk_text) AS chunk_hash
            FROM udtf_docs d, LATERAL chunk_tokens(d.text, 50, 40) c
            """
        )
        native = QUERY_REGISTRY["doc_chunks"].fn(spark, sf_dir)
        doc_ids = [r.doc_id for r in docs.select("doc_id").collect()]
        native_sub = native.filter(F.col("doc_id").isin(doc_ids))
        got = {tuple(r) for r in via_udtf.collect()}
        want = {tuple(r) for r in native_sub.collect()}
        assert got == want and len(got) > 0


class TestConnectedComponentsProperty:
    """Property: the DataFrame CC must agree with a union-find reference
    on random graphs (multi-hop paths, cycles, isolated pairs)."""

    def test_random_graphs_match_union_find(self, spark):
        import random

        from olap_project_spark.functions.graph import connected_components

        rng = random.Random(7)
        for trial in range(3):
            n = 40
            edges = [
                (rng.randrange(n), rng.randrange(n)) for _ in range(30)
            ]
            edges = [(a, b) for a, b in edges if a != b]
            # union-find reference
            parent = list(range(n))

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in edges:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            touched = {v for e in edges for v in e}
            want = {}
            for v in touched:
                root_min = min(u for u in touched if find(u) == find(v))
                want[v] = root_min
            got = {
                r.doc_id: r.label
                for r in connected_components(
                    spark.createDataFrame(edges, "src: bigint, dst: bigint")
                ).collect()
            }
            assert got == want, f"trial {trial}"


class TestPolymorphicUdtf:
    """Spark 4 analyze()-API UDTF: output schema computed from the
    literal header argument at analysis time."""

    def test_schema_follows_header_literal(self, spark):
        from olap_project_spark.functions.udtfs import register_udtfs

        register_udtfs(spark)
        got = spark.sql(
            "SELECT * FROM parse_delimited('7|4111|125.50', 'user|card|amount', '|')"
        )
        assert got.columns == ["user", "card", "amount"]
        row = got.collect()[0]
        assert (row["user"], row["card"], row["amount"]) == ("7", "4111", "125.50")

    def test_short_lines_null_fill_and_long_lines_truncate(self, spark):
        from olap_project_spark.functions.udtfs import register_udtfs

        register_udtfs(spark)
        short = spark.sql(
            "SELECT * FROM parse_delimited('only', 'a|b|c', '|')"
        ).collect()[0]
        assert (short["a"], short["b"], short["c"]) == ("only", None, None)
        long = spark.sql(
            "SELECT * FROM parse_delimited('1|2|3|4', 'a|b', '|')"
        ).collect()[0]
        assert (long["a"], long["b"]) == ("1", "2")

    def test_lateral_over_table(self, spark):
        from olap_project_spark.functions.udtfs import register_udtfs

        register_udtfs(spark)
        spark.createDataFrame(
            [("1|a",), ("2|b",)], "line string"
        ).createOrReplaceTempView("raw_lines")
        got = spark.sql(
            """SELECT p.k, p.v FROM raw_lines r,
               LATERAL parse_delimited(r.line, 'k|v', '|') p"""
        ).collect()
        assert sorted((r["k"], r["v"]) for r in got) == [("1", "a"), ("2", "b")]


class TestCurationOps:
    """Pure-Python references for the corpus-curation operators
    (queries/curation.py) — complementing their DuckDB oracles."""

    @pytest.fixture(scope="class")
    def docs(self, sf_dir):
        import duckdb

        return duckdb.sql(
            f"SELECT doc_id, text, source, lang FROM '{sf_dir}/documents.parquet'"
        ).fetchall()

    def test_repetition_stats_match_python(self, spark, sf_dir, docs):
        from collections import Counter

        per_source = {}
        for doc_id, text, source, _lang in docs:
            toks = text.lower().strip().split()
            if len(toks) < 2:
                continue
            c = Counter(zip(toks, toks[1:]))
            total = sum(c.values())
            n_distinct = len(c)
            top = max(c.values())
            s = per_source.setdefault(source, [0, 0, 0, 0, 0])
            s[0] += 1
            s[1] += top
            s[2] += total - n_distinct
            s[3] += total
            s[4] += int(top * 5 > total or (total - n_distinct) * 2 > total)
        got = {
            r["source"]: r
            for r in q("repetition_quality_stats")(spark, sf_dir).collect()
        }
        assert set(got) == set(per_source)
        for src, (n, top_sum, dup_sum, tot, flagged) in per_source.items():
            r = got[src]
            assert r["n_docs"] == n
            assert r["n_flagged"] == flagged
            assert r["pooled_top_bigram_frac"] == pytest.approx(
                top_sum / tot, abs=1e-6
            )
            assert r["pooled_dup_bigram_frac"] == pytest.approx(
                dup_sum / tot, abs=1e-6
            )

    def test_boilerplate_coverage_matches_python(self, spark, sf_dir, docs):
        shingles = {}  # doc_id -> set of 3-gram shingles
        source_of = {}
        for doc_id, text, source, _lang in docs:
            toks = text.lower().strip().split()
            source_of[doc_id] = source
            if len(toks) >= 3:
                shingles[doc_id] = {
                    " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
                }
        ndocs = {}
        for sh_set in shingles.values():
            for s in sh_set:
                ndocs[s] = ndocs.get(s, 0) + 1
        per_source = {}
        for doc_id, sh_set in shingles.items():
            n_sh = len(sh_set)
            n_shared = sum(1 for s in sh_set if ndocs[s] > 1)
            agg = per_source.setdefault(source_of[doc_id], [0, 0, 0, 0])
            agg[0] += 1
            agg[1] += n_shared
            agg[2] += n_sh
            agg[3] += int(n_shared * 2 > n_sh)
        got = {
            r["source"]: r
            for r in q("boilerplate_coverage_stats")(spark, sf_dir).collect()
        }
        assert set(got) == set(per_source)
        for src, (n, shared, tot, mostly) in per_source.items():
            r = got[src]
            assert r["n_docs"] == n
            assert r["n_docs_mostly_shared"] == mostly
            assert r["pooled_shared_frac"] == pytest.approx(shared / tot, abs=1e-6)

    def test_shard_assignment_deterministic_and_complete(self, spark, sf_dir, docs):
        got = q("training_shard_stats")(spark, sf_dir).collect()
        # every document lands in exactly one shard; shards cover 0..15
        assert sum(r["n_docs"] for r in got) == len(docs)
        assert all(0 <= r["shard"] < 16 for r in got)
        # deterministic: same hash in python
        shard_of = {
            doc_id: int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16) % 16
            for doc_id, *_ in docs
        }
        from collections import Counter

        want = Counter(shard_of.values())
        assert {r["shard"]: r["n_docs"] for r in got} == dict(want)

    def test_mixture_plan_invariants(self, spark, sf_dir):
        rows = q("source_mixture_plan")(spark, sf_dir).collect()
        shares = [r["actual_share"] for r in rows]
        assert sum(shares) == pytest.approx(1.0, abs=1e-3)
        for r in rows:
            # weight and share are reciprocal around uniform:
            # weight = (1/n_sources) / share
            assert r["sampling_weight"] == pytest.approx(
                (1.0 / len(rows)) / r["actual_share"], rel=1e-3
            )
            assert r["oversample"] == (r["sampling_weight"] > 1.0)

    def test_cluster_purity_invariants(self, spark, sf_dir):
        rows = q("cluster_label_purity")(spark, sf_dir).collect()
        import duckdb

        n_vecs = duckdb.sql(
            f"SELECT COUNT(*) FROM '{sf_dir}/embeddings.parquet'"
        ).fetchone()[0]
        assert sum(r["n_vecs"] for r in rows) == n_vecs
        for r in rows:
            assert 0 < r["n_majority"] <= r["n_vecs"]
            assert r["purity"] == pytest.approx(
                r["n_majority"] / r["n_vecs"], abs=1e-6
            )

    def test_token_frequency_quality_matches_python(self, spark, sf_dir, docs):
        from collections import Counter

        uni = Counter()
        doc_toks = {}
        for doc_id, text, source, _lang in docs:
            toks = text.lower().strip().split()
            if text.strip() == "":
                continue
            doc_toks[doc_id] = (source, toks)
            uni.update(toks)
        per_source = {}
        corpus_tokens = sum(len(t) for _, t in doc_toks.values())
        corpus_freq = sum(uni[tok] for _, t in doc_toks.values() for tok in t)
        for doc_id, (source, toks) in doc_toks.items():
            fs = sum(uni[t] for t in toks)
            s = per_source.setdefault(source, [0, 0, 0, 0])
            s[0] += 1
            s[1] += fs
            s[2] += len(toks)
            s[3] += int(fs * corpus_tokens > corpus_freq * len(toks))
        got = {
            r["source"]: r
            for r in q("token_frequency_quality")(spark, sf_dir).collect()
        }
        assert set(got) == set(per_source)
        for src, (n, fs, nt, above) in per_source.items():
            r = got[src]
            assert r["n_docs"] == n
            assert r["n_above_corpus_mean"] == above
            assert r["mean_token_freq"] == pytest.approx(fs / nt, abs=1e-6)


class TestLeakageSafeSplit:
    def test_no_near_dup_pair_straddles_splits(self, spark, sf_dir):
        """The operator's defining invariant: every verified near-dup
        pair shares a split."""
        from olap_project_spark.functions.text import portable_hash48 as _  # noqa: F401

        pairs = q("ngram_dup_pairs")(spark, sf_dir).collect()
        clusters = {
            r["doc_id"]: r["cluster_id"]
            for r in q("near_dup_clusters")(spark, sf_dir).collect()
        }

        def split_of(doc_id):
            gid = clusters.get(doc_id, doc_id)
            b = int(hashlib.md5(str(gid).encode()).hexdigest()[:12], 16) % 10
            return "train" if b <= 7 else ("val" if b == 8 else "test")

        for r in pairs:
            assert split_of(r["doc_a"]) == split_of(r["doc_b"]), (
                r["doc_a"],
                r["doc_b"],
            )

    def test_split_totals_cover_corpus(self, spark, sf_dir):
        import duckdb

        n = duckdb.sql(
            f"SELECT COUNT(*) FROM '{sf_dir}/documents.parquet'"
        ).fetchone()[0]
        rows = q("leakage_safe_split_stats")(spark, sf_dir).collect()
        assert sum(r["n_docs"] for r in rows) == n
        assert {r["split"] for r in rows} <= {"train", "val", "test"}
