"""Per-file TOKEN bloom index on the manifest table: keyword-search
data skipping over a text column — write-side Arrow-vectorized
tokenization, adaptive bitmap sizing, plan-side probing, and the
exact-residual-filter read contract."""

from __future__ import annotations

import pytest

from olap_project_spark.export.manifest_sink import (
    TOKEN_BLOOM_M_MAX,
    TOKEN_BLOOM_M_MIN,
    ManifestSinkDataSource,
    _token_bloom_pack,
    _token_hash,
    plan_token_pruned_files,
    read_token_search,
)

SCHEMA = "id int, body string"

DOCS = [
    (1, "the quick brown fox"),
    (2, "pack my box with five dozen jugs"),
    (3, "sphinx of black quartz judge my vow"),
    (4, "the lazy dog sleeps"),
]


@pytest.fixture(scope="module")
def registered(spark):
    try:
        spark.dataSource.register(ManifestSinkDataSource)
    except Exception:  # noqa: BLE001 — already registered this session
        pass
    return spark


def _write(spark, path, rows, n_parts=2, **opts):
    w = (
        spark.createDataFrame(rows, SCHEMA)
        .repartitionByRange(n_parts, "id")
        .write.format("manifest_sink")
        .option("path", path)
        .option("token_bloom_col", "body")
    )
    for key, val in opts.items():
        w = w.option(key, val)
    w.mode("append").save()


class TestPlanning:
    def test_prunes_absent_and_keeps_present(self, registered, tmp_path):
        path = str(tmp_path / "t")
        _write(registered, path, DOCS)  # ids 1-2 | 3-4 in two files
        keep, total = plan_token_pruned_files(path, "body", "quartz")
        assert total == 2 and len(keep) == 1
        keep, _ = plan_token_pruned_files(path, "body", "zzznotoken")
        assert keep == []
        # present in both files
        keep, _ = plan_token_pruned_files(path, "body", "my")
        assert len(keep) == 2

    def test_probe_is_case_normalized_and_single_token(
        self, registered, tmp_path
    ):
        path = str(tmp_path / "t")
        _write(registered, path, DOCS)
        keep, _ = plan_token_pruned_files(path, "body", "QUARTZ")
        assert len(keep) == 1
        with pytest.raises(ValueError, match="single token"):
            plan_token_pruned_files(path, "body", "two words")
        with pytest.raises(ValueError, match="single token"):
            plan_token_pruned_files(path, "body", "")

    def test_unindexed_files_conservatively_kept(
        self, registered, tmp_path
    ):
        path = str(tmp_path / "t")
        _write(registered, path, DOCS[:2])
        # a second commit WITHOUT the token bloom option
        (
            registered.createDataFrame(DOCS[2:], SCHEMA)
            .repartition(1)
            .write.format("manifest_sink")
            .option("path", path)
            .mode("append")
            .save()
        )
        keep, total = plan_token_pruned_files(path, "body", "zzznotoken")
        assert total == 3 and len(keep) == 1  # only the blind file


class TestReadContract:
    def test_search_equals_full_scan_filter(self, registered, tmp_path):
        from pyspark.sql import functions as F

        path = str(tmp_path / "t")
        _write(registered, path, DOCS)
        df = registered.createDataFrame(DOCS, SCHEMA)
        for token in ("the", "my", "fox", "zzznotoken"):
            got = sorted(
                r.id
                for r in read_token_search(
                    registered, path, df.schema, "body", token
                ).collect()
            )
            want = sorted(
                r.id
                for r in df.filter(
                    F.array_contains(
                        F.split(F.lower("body"), "[^a-z0-9]+"), token
                    )
                ).collect()
            )
            assert got == want, token


class TestBitmapSizing:
    def test_adaptive_m_and_no_false_negatives(self):
        small = _token_bloom_pack({_token_hash("a")})
        assert small["m"] == TOKEN_BLOOM_M_MIN
        big = _token_bloom_pack({_token_hash(f"t{i}") for i in range(50000)})
        assert big["m"] == TOKEN_BLOOM_M_MAX
        from olap_project_spark.export.manifest_sink import _token_bloom_hit

        for i in range(0, 50000, 997):
            assert _token_bloom_hit(big, _token_hash(f"t{i}"))


class TestMultiToken:
    """Round-12: AND/phrase keyword search — per-token surviving sets
    intersect at the driver in ONE log pass, the scan routes through
    the public batch reader (pruning visible as input partitions), and
    the exact residual reproduces the full-scan answer."""

    def test_and_intersects_per_token_sets(self, registered, tmp_path):
        from olap_project_spark.export.manifest_sink import (
            plan_token_pruned_files_all,
        )

        path = str(tmp_path / "t")
        _write(registered, path, DOCS)  # ids 1-2 | 3-4 in two files
        # 'my' survives both files; 'quartz' only the second;
        # the AND is their intersection
        keep, total = plan_token_pruned_files_all(
            path, "body", ["my", "quartz"]
        )
        assert total == 2 and len(keep) == 1
        k1, _ = plan_token_pruned_files(path, "body", "my")
        k2, _ = plan_token_pruned_files(path, "body", "quartz")
        assert set(keep) == set(k1) & set(k2)
        # an absent token zeroes the intersection
        keep, _ = plan_token_pruned_files_all(
            path, "body", ["my", "zzznotoken"]
        )
        assert keep == []

    def test_reader_partitions_equal_intersected_set(
        self, registered, tmp_path
    ):
        from olap_project_spark.export.manifest_sink import (
            plan_token_pruned_files_all,
            read_token_search_all,
        )

        path = str(tmp_path / "t")
        _write(registered, path, DOCS)
        keep, _ = plan_token_pruned_files_all(
            path, "body", ["my", "quartz"]
        )
        df = read_token_search_all(
            registered, path, "body", ["my", "quartz"]
        )
        # files opened == the intersected set (input-partition pruning
        # through the public reader's keepFiles hook)
        assert df.rdd.getNumPartitions() == len(keep) == 1
        assert [(r.id) for r in df.collect()] == [3]

    def test_and_equals_full_scan(self, registered, tmp_path):
        from pyspark.sql import functions as F

        from olap_project_spark.export.manifest_sink import (
            TOKEN_SPLIT_RE,
            read_committed,
            read_token_search_all,
            table_schema,
        )

        path = str(tmp_path / "t")
        _write(registered, path, DOCS)
        got = sorted(
            r.id
            for r in read_token_search_all(
                registered, path, "body", ["the"]
            ).collect()
        )
        full = read_committed(registered, path, table_schema(path))
        toks = F.split(F.lower("body"), TOKEN_SPLIT_RE)
        want = sorted(
            r.id
            for r in full.filter(
                F.array_contains(toks, "the")
            ).collect()
        )
        assert got == want == [1, 4]

    def test_phrase_requires_adjacency(self, registered, tmp_path):
        from olap_project_spark.export.manifest_sink import (
            read_token_search_all,
        )

        path = str(tmp_path / "t")
        _write(registered, path, DOCS)
        # 'quick brown' is consecutive in doc 1; 'quick fox' is not,
        # though both tokens appear (AND matches, phrase must not)
        hit = read_token_search_all(
            registered, path, "body", ["quick", "brown"], phrase=True
        )
        assert [r.id for r in hit.collect()] == [1]
        miss = read_token_search_all(
            registered, path, "body", ["quick", "fox"], phrase=True
        )
        assert miss.count() == 0
        and_hit = read_token_search_all(
            registered, path, "body", ["quick", "fox"]
        )
        assert [r.id for r in and_hit.collect()] == [1]

    def test_tombstones_still_apply_under_keepfiles(
        self, registered, tmp_path
    ):
        from olap_project_spark.export.manifest_sink import (
            delete_where,
            read_token_search_all,
        )

        path = str(tmp_path / "t")
        _write(registered, path, DOCS)
        delete_where(
            registered,
            path,
            registered.createDataFrame([(3,)], "id int"),
        )
        got = read_token_search_all(
            registered, path, "body", ["my", "quartz"]
        )
        assert got.count() == 0  # the only match was tombstoned
