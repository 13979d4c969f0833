"""Exactly-once warehouse append via a manifest-commit sink — the
commit protocol the reference's DAG lacks (bigquery_update_scheduler.py
:249-282 stages a CSV and issues WRITE_APPEND with no transactional
fence: a retried task double-loads). Implemented on the PySpark 4
Python DataSource writer API:

1. every task writes its rows to a uniquely-named ``part-*.jsonl``
   under ``<path>/_staging/`` and returns the file name + row count as
   its commit message;
2. the DRIVER, only after every task succeeded, atomically renames a
   ``_manifest-<uuid>.json`` into place listing exactly the committed
   files;
3. readers (:func:`read_committed`) take the union of all manifests'
   file lists — orphaned staging files from failed/aborted attempts are
   invisible, so the sink is effectively-exactly-once per query even
   under task retries (Spark de-duplicates task attempts before
   ``commit``; ``abort`` removes this attempt's staging files).

This is the same fence Iceberg/Delta build on (manifest = the commit),
reduced to its teachable core. At scale the manifest holds file paths +
stats, not data — commit cost is O(tasks), independent of row volume.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType


@dataclass
class _PartCommit(WriterCommitMessage):
    file_name: str
    n_rows: int


class ManifestWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest_sink requires a 'path' option")

    def write(self, iterator: Iterator[Row]) -> _PartCommit:
        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(staging, name), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _PartCommit(file_name=name, n_rows=n)

    def commit(self, messages: list[_PartCommit]) -> None:
        manifest = {
            "files": sorted(m.file_name for m in messages),
            "n_rows": sum(m.n_rows for m in messages),
        }
        tmp = os.path.join(self.path, f"._manifest-{uuid.uuid4().hex}.tmp")
        final = os.path.join(
            self.path, f"_manifest-{uuid.uuid4().hex}.json"
        )
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, final)  # the atomic commit point

    def abort(self, messages: list[_PartCommit]) -> None:
        for m in messages:
            try:
                os.remove(os.path.join(self.path, "_staging", m.file_name))
            except FileNotFoundError:
                pass


class ManifestSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifest_sink"

    def writer(self, schema: StructType, overwrite: bool) -> ManifestWriter:
        return ManifestWriter(self.options, overwrite)


def read_committed(spark: SparkSession, path: str, schema) -> DataFrame:
    """Read ONLY manifest-committed files (uncommitted staging output is
    invisible). Driver-side listing is O(#manifests); the data read is
    a parallel JSON-lines scan of exactly the committed files."""
    committed: list[str] = []
    for entry in os.listdir(path):
        if entry.startswith("_manifest-") and entry.endswith(".json"):
            with open(os.path.join(path, entry)) as f:
                committed += json.load(f)["files"]
    if not committed:
        return spark.createDataFrame([], schema)
    paths = [os.path.join(path, "_staging", name) for name in sorted(committed)]
    return spark.read.schema(schema).json(paths)
