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
