"""Exactly-once warehouse append via a manifest-commit sink — the
commit protocol the reference's DAG lacks (bigquery_update_scheduler.py
:249-282 stages a CSV and issues WRITE_APPEND with no transactional
fence: a retried task double-loads). Implemented on the PySpark 4
Python DataSource writer API:

1. every task writes its rows to a uniquely-named ``part-*.parquet``
   under ``<path>/_staging/`` (Arrow-batched columnar writes — bounded
   memory per task, column pruning and predicate pushdown for every
   reader) and returns the file name + row count as its commit message;
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
Pre-columnar tables (staging files named ``part-*.jsonl``) stay
readable: the read path dispatches on extension and unions, so a table
migrates to parquet by simply compacting (the rewrite snapshot is
written through the current writer).

Durability boundary: the commit point is ``os.replace`` after a
version claim. The claim is the ONE store-specific primitive, so it is
a pluggable seam (:class:`VersionClaimer`): the default
:class:`PosixVersionClaimer` uses ``O_CREAT|O_EXCL`` — atomic on POSIX
filesystems and HDFS, NOT on S3-style object stores (rename is
copy+delete and create-exclusive is unavailable) — and
:class:`ConditionalPutClaimer` carries the same protocol to object
stores via conditional PUT (If-None-Match) or an external log service,
which is exactly why Delta ships per-store LogStore implementations
and Iceberg uses a catalog swap; the rest of the protocol (staging
files + manifest listing) is store-agnostic and carries over unchanged.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import threading
import uuid
from collections import OrderedDict
from collections.abc import Iterator
from dataclasses import dataclass

from collections.abc import Iterator as _Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructField, StructType

from olap_project_spark.functions.localframe import local_frame


@dataclass
class _PartCommit(WriterCommitMessage):
    file_name: str
    n_rows: int
    col_stats: dict | None = None  # col -> [min, max] for orderable types
    bloom_bits: list | None = None  # sorted set positions for bloom_col
    part_range: list | None = None  # [min, max] transform value
    # exact per-partition-tuple row counts for this file —
    # [[ [v1, v2, ...], n_rows ], ...] over the spec list's transform
    # values, capped at PART_VALUES_CAP distinct tuples (None past the
    # cap or when any spec slot saw nulls) — the record that powers
    # the table$partitions metadata surface with zero data scans
    part_rows: list | None = None
    # packed token bloom for this file ({"m", "b64"}), when the writer
    # ran with a token_bloom_col — powers plan_token_pruned_files
    token_bloom: dict | None = None
    # exact per-column null counts (col -> n) — metadata-only
    # COUNT(col)/IS NULL accounting; recorded for every column
    col_nulls: dict | None = None


# Per-file cap on recorded partition tuples: a data file that spans
# more distinct partition values than this records no value-level
# stats (range pruning still applies); bounds manifest size — a
# well-laid-out file covers FEW partitions, which is the layout
# write_partitioned produces.
PART_VALUES_CAP = 128


# Per-file bloom parameters (opt-in via the writer's ``bloom_col``
# option): m bits / k hashes over an INTEGER column. With ~1k distinct
# values per file the false-positive rate is ≈1% — the point-lookup
# complement to zone maps (which prune nothing when every file spans
# the full value range of an unsorted high-cardinality column). The
# positions are exact integer arithmetic, reproducible anywhere.
BLOOM_M = 16384
BLOOM_K = 2

# TOKEN bloom (opt-in via ``token_bloom_col``): per-file bloom over the
# DISTINCT lowercase tokens of a text column — the pruning class
# neither zone maps (min/max of whole strings) nor the integer bloom
# can provide: "which files contain the word W" over a 100-TB document
# corpus. The bitmap is sized adaptively to the file's distinct-token
# count (10 bits/token, power of two, within [TOKEN_BLOOM_M_MIN,
# TOKEN_BLOOM_M_MAX]) and stored base64-packed, so a file with a small
# vocabulary costs ~128 B of manifest while a 100k-token file caps at
# 16 KiB — bounded metadata, never a posting list. Tokenization is the
# shared TOKEN_SPLIT_RE (lowercase, alnum runs), applied identically at
# write (Arrow-vectorized), at plan (the probe token), and at read (the
# residual filter), so pruning can never disagree with the filter.
TOKEN_SPLIT_RE = "[^a-z0-9]+"
TOKEN_BLOOM_K = 3
TOKEN_BLOOM_M_MIN = 1024
TOKEN_BLOOM_M_MAX = 131072


def _token_hash(token: str) -> int:
    """Portable 48-bit token hash (md5 prefix — the same convention the
    engine's SQL-side portable_hash48 uses), exact integer arithmetic
    everywhere."""
    import hashlib as _hashlib

    return int(_hashlib.md5(token.encode("utf-8")).hexdigest()[:12], 16)


def _token_bloom_positions(th: int, m: int) -> tuple[int, ...]:
    h1 = (th * 2654435761) % (1 << 32)
    h2 = (th * 40503 + 2699) % (1 << 31)
    return tuple((h1 + i * h2) % m for i in range(TOKEN_BLOOM_K))


def _token_bloom_pack(hashes: set[int]) -> dict:
    """Size and pack a token bloom: m = the smallest power of two
    holding ~10 bits per distinct token, clamped to the global bounds;
    returns {"m": m, "b64": base64 bitmap}."""
    import base64 as _base64

    m = TOKEN_BLOOM_M_MIN
    target = 10 * max(1, len(hashes))
    while m < target and m < TOKEN_BLOOM_M_MAX:
        m *= 2
    bits = bytearray(m // 8)
    for th in hashes:
        for p in _token_bloom_positions(th, m):
            bits[p >> 3] |= 1 << (p & 7)
    return {"m": m, "b64": _base64.b64encode(bytes(bits)).decode("ascii")}


def _token_bloom_hit(packed: dict, th: int) -> bool:
    import base64 as _base64

    m = packed["m"]
    bits = _base64.b64decode(packed["b64"])
    return all(
        bits[p >> 3] & (1 << (p & 7))
        for p in _token_bloom_positions(th, m)
    )


def _bloom_positions(v: int) -> tuple[int, ...]:
    h1 = (v * 2654435761) % (1 << 32)
    h2 = (v * 40503 + 2699) % (1 << 31)
    return tuple((h1 + i * h2) % BLOOM_M for i in range(BLOOM_K))


# ---------------------------------------------------------------------------
# HIDDEN PARTITIONING — Iceberg-style partition transforms. The table
# records a transform SPEC ({"col", "kind", "arg"}) per manifest and a
# per-file transform-value range; readers prune files by a predicate on
# the SOURCE column with no materialized partition column and no layout
# knowledge in the query — the reference's year/month/day directory
# scheme (spark_streaming_consumer.py:323) generalized into table
# metadata. Supported kinds: identity, truncate[W] and bucket[N] on
# integers, year/month/days/hours on timestamps. All except bucket are
# MONOTONE in the source value, so a source range [lo, hi] maps to the
# transform range [T(lo), T(hi)]; bucket prunes equality probes only.
# ---------------------------------------------------------------------------
_EPOCH_ORDINAL = 719163  # date(1970, 1, 1).toordinal()


def _parse_transform(raw) -> dict:
    spec = json.loads(raw) if isinstance(raw, str) else dict(raw)
    kind = spec.get("kind")
    if kind not in ("identity", "truncate", "bucket", "year", "month",
                    "days", "hours"):
        raise ValueError(f"unknown partition transform kind: {kind!r}")
    if not spec.get("col"):
        raise ValueError("partition transform needs a 'col'")
    if kind in ("truncate", "bucket"):
        arg = spec.get("arg")
        if not isinstance(arg, int) or arg < 1:
            raise ValueError(f"{kind} transform needs a positive int arg")
    return {"col": spec["col"], "kind": kind, "arg": spec.get("arg")}


def _parse_transforms(raw) -> list[dict]:
    """Normalize the ``partition_transform`` option to a SPEC LIST —
    Iceberg partition specs are multi-field (e.g. days(ts) +
    bucket(user)); a single dict stays the canonical one-field form."""
    val = json.loads(raw) if isinstance(raw, str) else raw
    if isinstance(val, dict):
        return [_parse_transform(val)]
    specs = [_parse_transform(s) for s in val]
    if not specs:
        raise ValueError("partition_transform list is empty")
    if len({s["col"] for s in specs}) != len(specs):
        raise ValueError("one transform per source column")
    return specs


def _specs_of(m: dict) -> list[dict]:
    """The manifest's recorded spec list (a one-field spec is stored
    as a bare dict for round-11 back-compat)."""
    raw = m.get("partition_transform")
    if raw is None:
        return []
    return [raw] if isinstance(raw, dict) else list(raw)


def _ranges_of(value, n_specs: int) -> list:
    """Normalize a file's recorded transform range(s) to a list
    aligned with the spec list (a one-field range is stored flat)."""
    if value is None:
        return [None] * n_specs
    if n_specs == 1 and value and not isinstance(value[0], list):
        return [value]
    return list(value)


def _transform_scalar(spec: dict, v) -> int:
    """Apply the transform to ONE source value (planning-side: maps a
    predicate bound into transform space). Timestamps accept Python
    datetime/date; integer kinds accept ints. Python floor-mod keeps
    truncate/bucket correct for negative values."""
    import datetime as _dt

    kind = spec["kind"]
    if kind == "identity":
        return int(v)
    if kind == "truncate":
        return int(v) - (int(v) % spec["arg"])
    if kind == "bucket":
        return int(v) % spec["arg"]
    if isinstance(v, str):
        v = _dt.datetime.fromisoformat(v)
    if kind == "year":
        return v.year - 1970
    if kind == "month":
        return (v.year - 1970) * 12 + v.month - 1
    if kind == "days":
        d = v.date() if isinstance(v, _dt.datetime) else v
        return d.toordinal() - _EPOCH_ORDINAL
    # hours: naive timestamps are wall-clock UTC by the engine's
    # session-timezone pin (sources/registry.load_table). timedelta
    # floor-division FLOORS (matching the writer's microsecond floor
    # for pre-epoch values); int(total_seconds()) would truncate
    # toward zero and disagree in the final second before the epoch
    epoch = _dt.datetime(1970, 1, 1)
    return (v - epoch) // _dt.timedelta(hours=1)


def _transform_array(spec: dict, arr):
    """Vectorized transform of one Arrow array → int64 numpy values
    (writer-side: per-batch transform-range tracking). Returns None
    when any null is present — the file then records no partition
    range and is never pruned, matching the zone-map contract."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if arr.null_count:
        return None
    kind = spec["kind"]
    if kind in ("identity", "truncate", "bucket"):
        if not pa.types.is_integer(arr.type):
            return None
        v = arr.to_numpy(zero_copy_only=False).astype(np.int64)
        if kind == "identity":
            return v
        if kind == "truncate":
            return v - np.mod(v, spec["arg"])
        return np.mod(v, spec["arg"])
    if not pa.types.is_timestamp(arr.type):
        return None
    if kind == "year":
        return pc.year(arr).to_numpy(zero_copy_only=False).astype(
            np.int64
        ) - 1970
    if kind == "month":
        y = pc.year(arr).to_numpy(zero_copy_only=False).astype(np.int64)
        m = pc.month(arr).to_numpy(zero_copy_only=False).astype(np.int64)
        return (y - 1970) * 12 + m - 1
    us = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
    if kind == "days":
        return us // 86_400_000_000
    return us // 3_600_000_000  # hours


def transform_column(spec: dict):
    """The Spark Column mirroring the transform — what
    :func:`write_partitioned` range-partitions by, so files land with
    tight transform ranges. Timestamp kinds assume the engine's UTC
    session pin (every load path sets it)."""
    from pyspark.sql import functions as _F

    c = _F.col(spec["col"])
    kind = spec["kind"]
    if kind == "identity":
        return c
    if kind == "truncate":
        return c - _F.pmod(c, _F.lit(spec["arg"]))
    if kind == "bucket":
        return _F.pmod(c, _F.lit(spec["arg"]))
    if kind == "year":
        return _F.year(c) - _F.lit(1970)
    if kind == "month":
        return (_F.year(c) - _F.lit(1970)) * 12 + _F.month(c) - _F.lit(1)
    if kind == "days":
        return _F.datediff(c, _F.lit("1970-01-01"))
    return _F.floor(_F.unix_timestamp(c) / _F.lit(3600))  # hours


class VersionClaimer:
    """The ONE primitive of the commit protocol that must be atomic per
    backing store: claiming an integer snapshot version such that two
    racing committers can never both own it. Everything else (staging
    files, manifest content, the read path) is store-agnostic — which
    is exactly why Delta ships per-store ``LogStore`` implementations
    and Iceberg swaps a catalog pointer: the claim is the only part
    that changes shape between POSIX/HDFS and S3-class object stores.

    ``claim(path, version)`` returns True iff THIS caller won the
    version; ``claimed_versions(path)`` lists every claimed version
    (won by anyone, committed or still in flight) so the committer can
    pick the next free number; ``release(path, version)`` frees a
    claim whose commit will never complete (abandoned branches,
    stale-claim GC) — a no-op where the claim IS the manifest file
    (POSIX), a store delete where it lives elsewhere.

    Every consumer of the commit-in-flight signal (the streaming
    head, vacuum's orphan-GC guard, publish's main-head computation)
    derives it from THIS interface — a version claimed here but with
    no readable manifest file is in flight, whether or not any file
    exists yet — so the not-yet-readable-gap guarantees survive a
    claimer whose claims live outside the filesystem."""

    def claim(self, path: str, version: int) -> bool:
        raise NotImplementedError

    def claimed_versions(self, path: str) -> list[int]:
        raise NotImplementedError

    def can_release(self) -> bool:
        """Whether :meth:`release` will succeed — checked BEFORE any
        destructive step that must be followed by a release, so a
        release-incapable claimer (conditional PUT without a delete
        callable) degrades to skipping the operation instead of
        half-performing it."""
        return True

    def release(self, path: str, version: int) -> None:
        """Free an abandoned claim (default: nothing to do — POSIX
        claims are the manifest files themselves, removed by the
        caller)."""

    def in_flight_versions(self, path: str) -> set[int]:
        """Claimed versions whose manifest content is not yet
        readable — the commit-in-flight set every gap-rule consumer
        (the streaming head, publish's main-head computation, vacuum's
        orphan-GC guard) obtains from THIS method. Derived, not
        overridden: (claims ∪ on-disk version files) minus
        readable-manifest versions — the union covers both claim
        shapes (POSIX claims ARE the version files; conditional-PUT
        claims live in the store while an unparseable on-disk file can
        still appear mid-``os.replace``). The hot streaming path
        (:func:`_stream_visible_head`) inlines this same formula over
        one shared parse pass rather than parsing the log twice per
        trigger."""
        files, parsed = _parse_all(path)
        return (set(self.claimed_versions(path)) | set(files)) - set(
            parsed
        )


class PosixVersionClaimer(VersionClaimer):
    """Default claimer: ``O_CREAT|O_EXCL`` on the manifest's final
    name — atomic on POSIX filesystems and HDFS. The empty claimed
    file doubles as the read path's commit-in-flight signal until
    ``os.replace`` lands the content."""

    def claim(self, path: str, version: int) -> bool:
        final = os.path.join(path, f"_manifest-{version:06d}.json")
        try:
            fd = os.open(final, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        os.close(fd)
        return True

    def claimed_versions(self, path: str) -> list[int]:
        return [v for v, _ in _list_manifests(path)]


class ConditionalPutClaimer(VersionClaimer):
    """Object-store-shaped claimer: the claim is a conditional PUT
    (S3 ``If-None-Match: *`` / GCS ``x-goog-if-generation-match: 0``
    semantics) against an injected key-value store, because
    create-exclusive and atomic rename do not exist on S3-class
    stores. ``store`` models the minimal object-store API the
    protocol needs: a ``put_if_absent(key) -> bool`` callable (a real
    deployment backs it with S3 conditional PUT or a DynamoDB lock
    table, which is precisely Delta's ``S3DynamoDBLogStore``). The
    claim registry lives in the store, NOT the filesystem — the
    in-flight signal moves with it."""

    def __init__(self, put_if_absent, list_claimed, delete=None):
        self._put_if_absent = put_if_absent
        self._list_claimed = list_claimed
        self._delete = delete

    @staticmethod
    def _key(path: str, version: int) -> str:
        return f"{path}/_manifest-{version:06d}.json"

    def claim(self, path: str, version: int) -> bool:
        return self._put_if_absent(self._key(path, version))

    def claimed_versions(self, path: str) -> list[int]:
        return list(self._list_claimed(path))

    def can_release(self) -> bool:
        return self._delete is not None

    def release(self, path: str, version: int) -> None:
        """Remove the claim from the store — without this, an
        abandoned branch's or stale-claim GC's freed version stays a
        permanent phantom claim (the streaming head blocks at it
        forever and vacuum counts it in-flight forever). ``delete`` is
        the store's delete-object callable (S3 DeleteObject / the lock
        table's delete item); constructing the claimer without one
        keeps the old never-release behavior and is rejected HERE, at
        release time, so read-only deployments still work."""
        if self._delete is None:
            raise NotImplementedError(
                "this ConditionalPutClaimer was built without a "
                "delete callable; abandon_branch and stale-claim GC "
                "need one to free claims"
            )
        self._delete(self._key(path, version))


_VERSION_CLAIMER: VersionClaimer = PosixVersionClaimer()


def set_version_claimer(claimer: VersionClaimer) -> VersionClaimer:
    """Install a claim strategy (returns the previous one, so tests
    and store-specific deployments can swap and restore)."""
    global _VERSION_CLAIMER
    prev = _VERSION_CLAIMER
    _VERSION_CLAIMER = claimer
    return prev


class ManifestWriter(DataSourceArrowWriter):
    def __init__(self, options, overwrite: bool, schema: StructType | None = None):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest_sink requires a 'path' option")
        self.kind = options.get("kind", "append")
        if self.kind not in ("append", "rewrite", "delete", "merge"):
            raise ValueError(f"unknown manifest kind: {self.kind}")
        # MERGE (upsert) commits: ONE atomic snapshot that is both the
        # tombstone and the insert — the manifest's data files hold the
        # update rows, and ``merge_keys`` names the key columns whose
        # projection of those same rows tombstones the matched
        # pre-merge state. No separate delete files exist, so there is
        # no two-commit window a reader could observe half of (the
        # Iceberg-v2 single-snapshot delete-file + data-file shape,
        # specialized to whole-row upserts where tombstone keys ARE a
        # projection of the new rows).
        mk = options.get("merge_keys")
        self.merge_keys: list | None = json.loads(mk) if mk else None
        if (self.kind == "merge") != (self.merge_keys is not None):
            raise ValueError("kind='merge' and merge_keys come together")
        if self.merge_keys is not None:
            if not self.merge_keys:
                raise ValueError("merge_keys must name at least one column")
            if schema is not None:
                missing = set(self.merge_keys) - {f.name for f in schema.fields}
                if missing:
                    raise ValueError(
                        f"merge_keys {sorted(missing)} not in the "
                        "update rows' schema"
                    )
        # write-audit-publish: a branch-tagged commit claims a version
        # in the shared sequence but is INVISIBLE to main readers until
        # published (the tag is dropped atomically by publish_branch)
        self.branch = options.get("branch")
        # opt-in EAGER file staging: declared layouts (the range-
        # partitioned rewrite verbs / write_partitioned) contract one
        # file per declared range, empty ranges included — their file
        # counts are part of the layout the oracles pin. Accidental-
        # width writes leave this off and skip empty partitions' files.
        self.eager_files = str(options.get("eager_files", "")) == "1"
        # opt-in per-file bloom filter over one integer column — the
        # point-lookup skipping index zone maps cannot provide
        self.bloom_col = options.get("bloom_col")
        # opt-in per-file TOKEN bloom over one text column — the
        # keyword-search skipping index (see TOKEN_SPLIT_RE block)
        self.token_bloom_col = options.get("token_bloom_col")
        # opt-in BUCKETED layout (Spark-native bucketing): the caller
        # guarantees the incoming DataFrame is hash-partitioned
        # ``n_buckets``-ways on ``bucket_by`` (``df.repartition(n, col)``
        # — HashPartitioning's pmod(murmur3, n) IS Spark's bucket-id
        # function), each task embeds its partition id in the file name
        # as the bucket id Spark's scan parses, and the layout is
        # recorded in the manifest like bloom_col — so a catalog
        # registration (:func:`register_bucketed_table`) gives every
        # future join/agg on the key an exchange-free plan.
        self.bucket_by = options.get("bucket_by")
        nb = options.get("n_buckets")
        self.n_buckets = int(nb) if nb is not None else None
        if (self.bucket_by is None) != (self.n_buckets is None):
            raise ValueError("bucket_by and n_buckets come together")
        # dedicated staging subdirectory for this commit's files —
        # required for bucketed commits (a catalog table's LOCATION is
        # directory-scoped, so the bucketed snapshot needs a directory
        # that holds exactly its own files)
        self.subdir = options.get("subdir")
        if self.subdir is not None and (
            "/" in self.subdir or self.subdir.startswith(".")
        ):
            raise ValueError(f"invalid staging subdir: {self.subdir!r}")
        if self.bucket_by is not None and self.subdir is None:
            raise ValueError("bucketed commits require a 'subdir' option")
        # HIDDEN PARTITIONING: a transform SPEC LIST recorded per
        # manifest (Iceberg multi-field partition specs — e.g.
        # days(ts) + bucket(user)); each task tracks its file's
        # [min, max] value per transform so readers prune by
        # source-column predicates with no materialized partition
        # column (see _parse_transforms)
        pt = options.get("partition_transform")
        self.partition_transforms = _parse_transforms(pt) if pt else None
        if self.partition_transforms is not None and schema is not None:
            names = {f.name for f in schema.fields}
            missing = [
                s["col"]
                for s in self.partition_transforms
                if s["col"] not in names
            ]
            if missing:
                raise ValueError(
                    f"partition transform columns {missing} not in schema"
                )
        # partial-rewrite support: JSON map of RETAINED file name →
        # {"rows": n, "stats": zone-map} carried verbatim into the
        # rewrite manifest beside the newly-written files (the caller —
        # compact_range — computes it from the current committed state)
        retain = options.get("retain")
        self.retain: dict = json.loads(retain) if retain else {}
        # caller-generated opaque token recorded in the manifest: the
        # ONLY race-free way for an API caller to find the version ITS
        # write committed (a post-write "latest version" re-read can
        # pick up a concurrent writer's commit instead)
        self.commit_token = options.get("commit_token")
        # free-form snapshot summary (Iceberg snapshot-summary /
        # Delta commitInfo shape): a JSON object recorded verbatim in
        # the manifest and surfaced by table_history — the seam write
        # APIs use to make their provenance (e.g. the expectation
        # contract a write enforced) part of the table's audit trail
        cp = options.get("commit_props")
        self.commit_props: dict | None = json.loads(cp) if cp else None
        if self.commit_props is not None and not isinstance(
            self.commit_props, dict
        ):
            raise ValueError("commit_props must be a JSON object")
        # recorded in the manifest so readers can DISCOVER the table
        # schema (and its evolution history) instead of knowing it
        self.schema = schema

    # Rows buffered before flushing to the parquet writer — bounds task
    # memory to O(batch), not O(partition), and keeps row groups at the
    # historical 64k size (incoming Arrow batches are
    # ``spark.sql.execution.arrow.maxRecordsPerBatch`` ≈ 10k rows).
    # Timestamp columns: the incoming batches carry
    # timestamp[us, tz=<session tz>] and the target schema is
    # timestamp[us, tz=UTC]; the cast is epoch-preserving, and the
    # engine pins a UTC session timezone on every load path
    # (see sources/registry.load_table) so wall clocks agree too.
    BATCH_ROWS = 65536

    def write(
        self, iterator: Iterator["pa.RecordBatch"], force_file: bool = False  # noqa: F821
    ) -> _PartCommit:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        staging = os.path.join(self.path, "_staging")
        out_dir = (
            os.path.join(staging, self.subdir) if self.subdir else staging
        )
        os.makedirs(out_dir, exist_ok=True)
        base = f"part-{uuid.uuid4().hex}"
        if self.bucket_by is not None:
            # the task's partition id IS the bucket id (the caller
            # repartitioned by pmod(murmur3(key), n)); the `_NNNNN`
            # suffix is the exact pattern Spark's bucketed scan parses
            from pyspark import TaskContext

            bucket_id = TaskContext.get().partitionId()
            if bucket_id >= self.n_buckets:
                raise ValueError(
                    f"task partition {bucket_id} >= n_buckets "
                    f"{self.n_buckets}: the input was not repartitioned "
                    "n_buckets-ways on the bucket key"
                )
            base += f"_{bucket_id:05d}"
        name = f"{base}.parquet"
        arrow_schema = to_arrow_schema(self.schema)
        cols = [f.name for f in self.schema.fields]
        n = 0
        stats: dict[str, list] = {}  # zone map: col -> [min, max]
        disabled: set[str] = set()  # null/complex seen → no zone map
        # exact per-column null counts (metadata-only COUNT(col)):
        # tracked for EVERY column, independent of the zone map's
        # null-disabling rule
        nulls: dict[str, int] = {c: 0 for c in cols}

        def feed_stats(batch: "pa.RecordBatch") -> None:
            # vectorized zone-map update (Arrow min_max kernel); a
            # column drops out of the zone map on the first null or
            # non-orderable-scalar value, matching the read contract
            # (files without a map for a column are never skipped)
            for c in cols:
                arr0 = batch.column(batch.schema.get_field_index(c))
                nulls[c] += arr0.null_count
                if c in disabled:
                    continue
                arr = arr0
                if arr.null_count or not (
                    pa.types.is_integer(arr.type)
                    or pa.types.is_floating(arr.type)
                    or pa.types.is_string(arr.type)
                    or pa.types.is_large_string(arr.type)
                ):
                    disabled.add(c)
                    stats.pop(c, None)
                    continue
                mm = pc.min_max(arr)
                lo, hi = mm["min"].as_py(), mm["max"].as_py()
                s = stats.get(c)
                if s is None:
                    stats[c] = [lo, hi]
                else:
                    if lo < s[0]:
                        s[0] = lo
                    if hi > s[1]:
                        s[1] = hi

        bloom: set[int] | None = set() if self.bloom_col else None

        def feed_bloom(batch: "pa.RecordBatch") -> None:
            # unique-first: the bloom is a set of bit positions, so
            # hashing each DISTINCT value once is exactly equivalent
            arr = batch.column(batch.schema.get_field_index(self.bloom_col))
            for v in pc.unique(arr.drop_null()).to_pylist():
                bloom.update(_bloom_positions(int(v)))

        token_hashes: set[int] | None = (
            set() if self.token_bloom_col else None
        )

        def feed_tokens(batch: "pa.RecordBatch") -> None:
            # Arrow-vectorized tokenization of the batch: lowercase,
            # split on non-alnum runs, flatten, unique — only the
            # UNIQUE tokens (bounded by the batch vocabulary) are
            # hashed in Python
            arr = batch.column(
                batch.schema.get_field_index(self.token_bloom_col)
            )
            toks = pc.unique(
                pc.list_flatten(
                    pc.split_pattern_regex(
                        pc.utf8_lower(pc.coalesce(arr, "")),
                        pattern=TOKEN_SPLIT_RE,
                    )
                )
            )
            for t in toks.to_pylist():
                if t:
                    token_hashes.add(_token_hash(t))

        # per-file transform-value range PER SPEC (hidden
        # partitioning); a spec's slot falls to None on
        # nulls/untransformable values — the file is then never pruned
        # on that transform, the zone-map conservatism contract
        n_specs = (
            len(self.partition_transforms)
            if self.partition_transforms
            else 0
        )
        part_ranges: list = [None] * n_specs
        # exact tuple-level row counts (the table$partitions record);
        # disabled (None) on the first null-bearing batch or past the
        # PART_VALUES_CAP distinct-tuple bound
        part_counts: dict | None = {} if n_specs else None

        def feed_partition(batch) -> None:
            nonlocal part_counts
            import numpy as _np

            batch_vals: list = []
            for i, spec in enumerate(self.partition_transforms or ()):
                if part_ranges[i] is False:
                    batch_vals.append(None)
                    continue  # disabled for this spec
                arr = batch.column(
                    batch.schema.get_field_index(spec["col"])
                )
                vals = _transform_array(spec, arr)
                if vals is None or len(vals) == 0:
                    part_ranges[i] = False
                    batch_vals.append(None)
                    continue
                batch_vals.append(vals)
                lo, hi = int(vals.min()), int(vals.max())
                if part_ranges[i] is None:
                    part_ranges[i] = [lo, hi]
                else:
                    part_ranges[i][0] = min(part_ranges[i][0], lo)
                    part_ranges[i][1] = max(part_ranges[i][1], hi)
            if part_counts is None:
                return
            if any(v is None for v in batch_vals):
                part_counts = None  # conservatism: no value-level stats
                return
            # vectorized tuple histogram over the Arrow batch
            stacked = _np.stack(batch_vals, axis=1)
            uniq, counts = _np.unique(stacked, axis=0, return_counts=True)
            for t, c in zip(uniq.tolist(), counts.tolist()):
                key = tuple(t)
                part_counts[key] = part_counts.get(key, 0) + c
            if len(part_counts) > PART_VALUES_CAP:
                part_counts = None

        # Arrow batches arrive straight from the JVM (no Row
        # materialization — guide-§4 boundary hygiene); align each to
        # the declared write schema (a cast is epoch-preserving for
        # timestamps and a no-op otherwise), feed the metadata
        # trackers batch-wise, and buffer up to BATCH_ROWS before each
        # parquet row-group write so the on-disk layout matches the
        # historical row-path files.
        #
        # The parquet file is created LAZILY, on the first non-empty
        # batch: a task whose partition carries no rows stages NO file
        # (file_name=None; commit() drops it). A tombstone or merge
        # frame arriving through a default-width exchange would
        # otherwise stage dozens of empty parquet files per commit —
        # every later read then stats, lists, and anti-joins them
        # (measured: a 2-key SQL DELETE committed 32 files, 30 empty).
        # Bucketed layouts are the exception: their contract is one
        # file per bucket id, empty buckets included, so they keep the
        # eager create.
        pending: list = []
        pending_rows = 0
        writer: "pq.ParquetWriter | None" = None
        force_file = (
            force_file or self.bucket_by is not None or self.eager_files
        )

        def flush() -> None:
            nonlocal pending, pending_rows, writer
            if writer is None and (pending or force_file):
                writer = pq.ParquetWriter(
                    os.path.join(out_dir, name), arrow_schema
                )
            if pending:
                writer.write_table(
                    pa.Table.from_batches(pending, schema=arrow_schema)
                )
                pending, pending_rows = [], 0

        if force_file:
            flush()  # eager create: the empty file IS the payload
        for batch in iterator:
            if batch.num_rows == 0:
                continue
            if batch.schema != arrow_schema:
                batch = pa.record_batch(
                    [
                        batch.column(
                            batch.schema.get_field_index(c)
                        ).cast(arrow_schema.field(c).type)
                        for c in cols
                    ],
                    schema=arrow_schema,
                )
            n += batch.num_rows
            feed_partition(batch)
            feed_stats(batch)
            if bloom is not None:
                feed_bloom(batch)
            if token_hashes is not None:
                feed_tokens(batch)
            pending.append(batch)
            pending_rows += batch.num_rows
            if pending_rows >= self.BATCH_ROWS:
                flush()
        flush()
        if writer is not None:
            writer.close()
        if writer is None:
            return _PartCommit(file_name=None, n_rows=0)
        return _PartCommit(
            # staging-relative name: commits into a dedicated subdir
            # carry the "<subdir>/" prefix everywhere the file is named
            file_name=f"{self.subdir}/{name}" if self.subdir else name,
            n_rows=n,
            col_stats=stats,
            bloom_bits=sorted(bloom) if bloom is not None else None,
            # flat [lo, hi] for a one-field spec (round-11 on-disk
            # form); list-of-ranges for multi-field specs; None when
            # no spec or every slot disabled
            part_range=(
                None
                if not n_specs
                or all(r in (None, False) for r in part_ranges)
                else (
                    (part_ranges[0] if part_ranges[0] is not False else None)
                    if n_specs == 1
                    else [
                        (r if r is not False else None)
                        for r in part_ranges
                    ]
                )
            ),
            part_rows=(
                [
                    [list(t), int(c)]
                    for t, c in sorted(part_counts.items())
                ]
                if part_counts
                else None
            ),
            token_bloom=(
                _token_bloom_pack(token_hashes)
                if token_hashes is not None
                else None
            ),
            col_nulls=dict(nulls),
        )

    def commit(self, messages: list[_PartCommit]) -> None:
        # Sequential snapshot versions: each commit claims the next
        # integer version with an O_EXCL create (two racing committers
        # cannot claim the same version; the loser retries the next
        # number). The table's state at version v = the union of all
        # commits with version <= v — append-only snapshot semantics,
        # which is what makes read_committed(as_of=...) time travel.
        #
        # Empty partitions staged no file (lazy create in write());
        # drop their messages here. A commit whose EVERY partition was
        # empty still stages one empty file (driver-side) so
        # schema-recording commits (CREATE TABLE) keep their on-disk
        # shape and the table directory exists before the claim.
        messages = [m for m in messages if m.file_name is not None]
        if not messages:
            messages = [self.write(iter(()), force_file=True)]
        manifest = {
            "kind": self.kind,
            "files": sorted(m.file_name for m in messages),
            "n_rows": sum(m.n_rows for m in messages),
            # per-file zone maps: the data-skipping index readers use
            # to plan scans without opening files
            "file_stats": {
                m.file_name: m.col_stats for m in messages if m.col_stats
            },
            # per-file row counts: the `table$files` metadata surface
            # (planning row estimates without opening footers)
            "file_rows": {m.file_name: m.n_rows for m in messages},
            # per-file per-column null counts: metadata-only
            # COUNT(col) and the IS NULL accounting zone maps drop
            # (they disable on the first null by contract)
            "file_nulls": {
                m.file_name: m.col_nulls
                for m in messages
                if m.col_nulls is not None
            },
        }
        if any(m.bloom_bits is not None for m in messages):
            manifest["bloom_col"] = self.bloom_col
            manifest["file_blooms"] = {
                m.file_name: m.bloom_bits
                for m in messages
                if m.bloom_bits is not None
            }
        if any(m.token_bloom is not None for m in messages):
            manifest["token_bloom_col"] = self.token_bloom_col
            manifest["file_token_blooms"] = {
                m.file_name: m.token_bloom
                for m in messages
                if m.token_bloom is not None
            }
        if self.bucket_by is not None:
            # layout metadata, recorded like bloom_col: readers can
            # register the snapshot as a Spark bucketed table and run
            # exchange-free joins/aggs on the bucket key. Validate the
            # layout BEFORE it becomes a manifest: every bucket id in
            # [0, n_buckets) must appear exactly once (each partition
            # writes one file, empty partitions included) — an input
            # repartitioned fewer ways than n_buckets would otherwise
            # commit a layout whose bucket-id assumption is false and
            # an exchange-free join would silently drop matches. (A
            # repartition on the WRONG key at the right width remains
            # the caller's contract — only compact_snapshots calls
            # this, and it repartitions on bucket_by itself.)
            bucket_ids = sorted(
                int(m.file_name.rsplit("_", 1)[1].split(".")[0])
                for m in messages
            )
            if bucket_ids != list(range(self.n_buckets)):
                raise ValueError(
                    f"bucketed commit expected one file per bucket id "
                    f"0..{self.n_buckets - 1}, got {bucket_ids}: the "
                    "input was not repartitioned n_buckets-ways on the "
                    "bucket key"
                )
            manifest["bucket_by"] = self.bucket_by
            manifest["n_buckets"] = self.n_buckets
        if self.subdir is not None:
            manifest["layout_dir"] = self.subdir
        if self.retain:
            # PARTIAL rewrite (OPTIMIZE WHERE): the rewrite manifest
            # must list the FULL consolidated state, so the untouched
            # files — with their zone maps and row counts — are folded
            # in beside the newly-written ones. Their per-file blooms
            # are NOT carried (blooms are per-manifest, keyed by this
            # manifest's bloom_col); bloom pruning then conservatively
            # keeps retained files — correctness over skipping.
            if self.kind != "rewrite":
                raise ValueError("'retain' applies to rewrite commits only")
            manifest["files"] = sorted(
                set(manifest["files"]) | set(self.retain)
            )
            manifest["n_rows"] += sum(
                e.get("rows", 0) for e in self.retain.values()
            )
            for name, entry in self.retain.items():
                if entry.get("stats"):
                    manifest["file_stats"][name] = entry["stats"]
                if "rows" in entry:
                    manifest["file_rows"][name] = entry["rows"]
                if entry.get("nulls") is not None:
                    manifest["file_nulls"][name] = entry["nulls"]
        if self.partition_transforms is not None:
            manifest["partition_transform"] = (
                self.partition_transforms[0]
                if len(self.partition_transforms) == 1
                else self.partition_transforms
            )
            fparts = {
                m.file_name: m.part_range
                for m in messages
                if m.part_range is not None
            }
            # partial rewrites carry RETAINED files' transform ranges
            # beside the newly-computed ones (compact_range includes
            # them only when they were recorded under THIS spec)
            for name, entry in self.retain.items():
                if entry.get("part") is not None:
                    fparts[name] = entry["part"]
            manifest["file_partitions"] = fparts
            # exact per-tuple row counts (table$partitions): new files'
            # histograms plus retained files' carried ones
            prows = {
                m.file_name: m.part_rows
                for m in messages
                if m.part_rows is not None
            }
            for name, entry in self.retain.items():
                if entry.get("prows") is not None:
                    prows[name] = entry["prows"]
            if prows:
                manifest["file_partition_rows"] = prows
        if self.merge_keys is not None:
            manifest["merge_keys"] = self.merge_keys
        if self.commit_token is not None:
            manifest["commit_token"] = self.commit_token
        if self.commit_props is not None:
            manifest["props"] = self.commit_props
        if self.schema is not None:
            manifest["schema"] = self.schema.jsonValue()
        if self.branch is not None:
            manifest["branch"] = self.branch
        tmp = os.path.join(self.path, f"._manifest-{uuid.uuid4().hex}.tmp")
        while True:
            version = 1 + max(
                _VERSION_CLAIMER.claimed_versions(self.path), default=0
            )
            if not _VERSION_CLAIMER.claim(self.path, version):
                continue  # lost the race for this version; take the next
            final = os.path.join(self.path, f"_manifest-{version:06d}.json")
            manifest["version"] = version
            with open(tmp, "w") as f:
                json.dump(manifest, f)
            os.replace(tmp, final)  # the atomic commit point
            break

    def abort(self, messages: list[_PartCommit]) -> None:
        for m in messages:
            if m.file_name is None:
                continue  # empty partition: nothing was staged
            try:
                os.remove(os.path.join(self.path, "_staging", m.file_name))
            except FileNotFoundError:
                pass


class _VersionFiles(InputPartition):
    """One streaming input partition = one data file of one committed
    version — executor-parallel tailing, schema shipped as JSON."""

    def __init__(self, version: int, file_path: str, schema_json: str):
        self.version = version
        self.file_path = file_path
        self.schema_json = schema_json


class ManifestStreamReader(DataSourceStreamReader):
    """STREAM the manifest table — the Delta ``readStream`` contract on
    the teachable log: the offset IS the snapshot version, each
    micro-batch reads exactly the files committed by the versions in
    ``(start, end]``, and a checkpoint restart resumes from the
    committed version — exactly-once tailing with no extra machinery,
    because the commit protocol already made versions atomic and
    immutable. APPEND-ONLY by contract: a delete or rewrite snapshot
    inside the range raises (Delta's default ``ignoreChanges=false``
    semantics — a file-level tail cannot represent row removals; run
    consumers before compacting, or restart them from the rewrite).
    Two Delta-parity opt-outs relax it: ``ignoreDeletes`` skips
    equality-delete snapshots, and ``skipChangeCommits`` skips every
    non-append kind (delete/merge/rewrite/restore) — the tail then
    delivers exactly the rows plain appends committed, never
    re-delivering reorganized or updated bytes (see __init__).

    Exactly-once under concurrency: the offset never advances past a
    version that is claimed but not yet readable. An in-flight commit
    (claimed version file, content not yet replaced) and an
    unpublished write-audit-publish branch commit (parseable but
    branch-tagged — it may become visible at exactly that version when
    published) both HOLD the stream head at the version before them —
    the Delta rule that a log gap is not-yet-readable, never skippable.
    A version HOLE (no file at all — an abandoned branch or a
    vacuumed-away stale claim) is genuinely unreachable: commit always
    claims above the observed maximum, so holes below it are permanent
    and the head skips them.

    Backpressure: ``maxVersionsPerTrigger`` (Delta's
    ``maxFilesPerTrigger`` analog, per-version granularity) bounds how
    many versions one micro-batch may drain, so a 100-TB backlog
    arrives as bounded batches instead of one giant one. The cap
    applies from the first trigger of a fresh stream (the Python
    stream API polls ``latestOffset`` before the start offset is
    knowable, so the first poll assumes a fresh start); on a
    checkpoint-restart the reader learns the true position only when
    Spark plans a batch, so the first restarted batch under a
    processing-time trigger is uncapped catch-up and every subsequent
    trigger is capped again. Trigger interplay (probed on Spark 4.1):
    ``processingTime`` drains a backlog as a sequence of capped
    batches; ``availableNow`` captures its target from the FIRST poll,
    so one fresh run processes one capped batch — and a RESTARTED
    availableNow run whose checkpoint is at or past the cap makes no
    progress that run (the capped first-poll target lands at or below
    the checkpoint). Drain deep backlogs with a processing-time
    trigger; use availableNow throttling for fresh bounded ingest.

    Scale: ``latestOffset`` is O(#manifests) driver-side metadata; the
    data reads are per-file executor tasks (Arrow record batches)."""

    def __init__(self, options, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest stream source requires 'path'")
        mv = options.get("maxVersionsPerTrigger")
        self.max_versions = int(mv) if mv is not None else None
        if self.max_versions is not None and self.max_versions < 1:
            raise ValueError("maxVersionsPerTrigger must be >= 1")
        # Delta-parity relaxations of the append-only contract, both
        # default-off (the raise is the safe default):
        # - ignoreDeletes: SKIP equality-delete snapshots (their
        #   removals simply never reach the tail — correct for
        #   retention/GDPR deletes whose consumers only accrete, the
        #   exact use Delta documents for its option of the same name);
        # - skipChangeCommits: additionally skip merge/rewrite/restore
        #   snapshots (Delta's skipChangeCommits): the tail delivers
        #   ONLY rows committed by plain appends, at-least-append-only
        #   semantics — updates from merges and reorganized bytes from
        #   compactions never re-deliver, at the documented cost of
        #   missing merge-inserted rows.
        self.ignore_deletes = str(
            options.get("ignoreDeletes", "false")
        ).lower() in ("true", "1")
        self.skip_change_commits = str(
            options.get("skipChangeCommits", "false")
        ).lower() in ("true", "1")
        # last offset this reader planned/committed — the base the
        # per-trigger version cap counts from (None until known)
        self._cursor: int | None = None
        self._unknown_polls = 0
        self.schema = schema

    def initialOffset(self) -> dict:
        self._cursor = 0
        return {"version": 0}

    def latestOffset(self) -> dict:
        head = _stream_visible_head(self.path)
        if self.max_versions is not None:
            if self._cursor is not None:
                head = min(head, self._cursor + self.max_versions)
            else:
                # Spark polls latestOffset BEFORE initialOffset (probed
                # on 4.1), so the first poll runs with an unknown start.
                # A fresh stream starts at 0 — cap against that, and
                # initialOffset/partitions pin the cursor right after.
                # On a checkpoint RESTART initialOffset never runs; if
                # the guess undershoots the checkpointed start, Spark
                # plans no batch and the NEXT poll lifts the cap (one
                # uncapped batch beats a permanent stall).
                self._unknown_polls += 1
                if self._unknown_polls == 1:
                    head = min(head, self.max_versions)
        if self._cursor is not None:
            head = max(head, self._cursor)  # an offset never regresses
        return {"version": head}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        self._cursor = end["version"]
        out: list[InputPartition] = []
        sj = json.dumps(self.schema.jsonValue())
        for version, m in _log(self.path, raw=True):
            if version <= start["version"] or version > end["version"]:
                continue
            kind = m.get("kind", "append")
            if kind == "analyze":
                continue  # NDV sketches: pure metadata, no rows change
            if kind == "alter":
                if not (
                    m.get("rename") or m.get("drop") or m.get("widen")
                ):
                    # a SPEC-ONLY or ADD-COLUMN alter moves no names,
                    # changes no readable types, and commits no rows:
                    # the fixed-schema tail reads on unchanged (an
                    # added column becomes visible at the NEXT stream
                    # start) — pure metadata, safe to pass by default
                    continue
                if m.get("widen"):
                    raise ValueError(
                        f"streaming tail hit a type widening at "
                        f"version {version}; files written under the "
                        "wider type cannot scan under the stream's "
                        "started schema — restart the stream to pick "
                        "up the widened schema"
                    )
                # a COLUMN RENAME/DROP always stops the stream, even
                # under skipChangeCommits: the stream's schema is
                # fixed at start, so appends across the rename
                # boundary would silently null the renamed column —
                # restart the consumer at the rename with the new
                # schema
                raise ValueError(
                    f"streaming tail hit a column rename at version "
                    f"{version}; restart the stream with the renamed "
                    "schema (a fixed-schema tail cannot cross naming "
                    "eras)"
                )
            if kind != "append":
                if self.skip_change_commits:
                    continue  # at-least-append-only: change commits
                    # (delete/merge/rewrite/restore) pass silently
                if self.ignore_deletes and kind == "delete":
                    continue  # removals never reach the tail
                raise ValueError(
                    f"streaming tail hit a {kind} snapshot at version "
                    f"{version}; the file-level CDF is append-only — "
                    "restart the consumer from the rewrite, or opt in "
                    "to ignoreDeletes / skipChangeCommits"
                )
            legacy = [f for f in m["files"] if not f.endswith(".parquet")]
            if legacy:
                raise ValueError(
                    f"version {version} commits pre-columnar staging "
                    f"files ({legacy[0]}, …); the streaming tail reads "
                    "the parquet data plane only — compact the table "
                    "to parquet before streaming it"
                )
            staging = os.path.join(self.path, "_staging")
            out += [
                _VersionFiles(version, os.path.join(staging, f), sj)
                for f in m["files"]
            ]
        return out

    def read(self, partition: _VersionFiles):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        want = to_arrow_schema(StructType.fromJson(json.loads(partition.schema_json)))
        pf = pq.ParquetFile(partition.file_path)
        for batch in pf.iter_batches():
            # project/cast to the DISCOVERED table schema; files
            # written before a schema-evolution column existed
            # null-backfill it (the same add-only contract the batch
            # read path honors), and files written at a narrower
            # widened type up-cast
            cols = []
            for f in want:
                if f.name in batch.schema.names:
                    cols.append(
                        batch.column(f.name).cast(f.type)
                    )
                else:
                    cols.append(pa.nulls(batch.num_rows, type=f.type))
            yield pa.record_batch(cols, schema=want)

    def commit(self, end: dict) -> None:
        self._cursor = end["version"]  # versions are immutable; just
        # advance the backpressure base — nothing to release


class _FileScan(InputPartition):
    """One batch input partition = one live data file, carrying the
    version it committed at, the tombstone applications whose sequence
    number exceeds it (the per-file equality-delete rule), and — for
    files written before a column rename — the field-id-derived map
    from CURRENT column names to this file's WRITE-ERA names."""

    def __init__(
        self,
        file_path: str,
        schema_json: str,
        tombs: list,  # [(era key cols, current key cols, [paths]), ...]
        colmap: dict | None = None,  # {current name: era name | None}
    ):
        self.file_path = file_path
        self.schema_json = schema_json
        self.tombs = tombs
        self.colmap = colmap


def _resolve_as_of(options) -> int | None:
    """Time-travel option resolution shared by the batch reader and
    schema discovery: ``versionAsOf`` pins a snapshot version, ``tag``
    resolves a named ref; both together is ambiguous and rejected."""
    v = options.get("versionAsOf")
    tag = options.get("tag")
    if v is not None and tag is not None:
        raise ValueError("pass versionAsOf OR tag, not both")
    if v is not None:
        return int(v)
    if tag is not None:
        return read_tag(options.get("path"), tag)
    return None


class ManifestBatchReader(DataSourceReader):
    """BATCH-read the manifest table through the public DataSource API —
    ``spark.read.format(fmt).option('path', …).load()`` on a vanilla
    session, no library import needed on the read side. Plans the same
    committed-file list :func:`read_committed` folds (time travel via
    ``versionAsOf`` or ``tag``, WAP staging via ``branch``), applies
    row-level tombstones per task by the SEQUENCE-NUMBER rule (a
    tombstone committed at version vt removes matching rows from files
    committed at vf < vt — exactly Iceberg's equality-delete sequence
    semantics, so a key re-inserted after its delete survives), and
    skips files the pushed-down filters provably exclude:

    - zone maps prune range/equality comparisons on any stats column;
    - per-file blooms prune integer equality probes on the bloom_col;
    - HIDDEN-PARTITION transform ranges prune comparisons on the
      transform's source column — including TIMESTAMP predicates,
      which zone maps (int/float/string only) never see.

    Every pushed filter is RETURNED to Spark for re-evaluation — the
    pruning only shrinks the FILE list, so it is transparently
    conservative. Tombstone applications are never pruned. One input
    partition per live data file keeps the scan executor-parallel and
    the tombstone anti-joins local Arrow joins against the (delta-
    sized) key files.

    Pushdown is OPT-IN via ``.option('pushdown', 'true')`` (which
    requires ``spark.sql.python.filterPushdown.enabled=true``): Spark
    4.1 refuses to plan a Python reader that merely IMPLEMENTS
    pushFilters while that conf is off, so the base reader stays
    pushdown-free and a vanilla session can read the table with zero
    configuration."""

    def __init__(self, options, schema: StructType):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("manifest batch read requires a 'path' option")
        self.as_of = _resolve_as_of(options)
        self.branch = options.get("branch")
        self.schema = schema
        # optional explicit DATA-file restriction (JSON list) — the
        # hook external index planners (token-bloom keyword search)
        # use to surface their pruning as input-partition pruning.
        # Restricts files SCANNED only; tombstone applications still
        # attach to every surviving file — correctness over skipping.
        kf = options.get("keepFiles")
        self.keep_files: set | None = (
            set(json.loads(kf)) if kf else None
        )
        # (col, op, value) comparisons recorded by pushFilters
        self._pushed: list[tuple[str, str, object]] = []

    @staticmethod
    def _excluded(stats: dict, bloom_col, bloom_bits, specs, pranges, pushed) -> bool:
        import datetime as _dt

        for col, op, val in pushed:
            if not isinstance(val, (_dt.datetime, _dt.date)):
                rng = (stats or {}).get(col)
                if rng is not None:
                    lo, hi = rng[0], rng[1]
                    # compare only like-typed values (zone maps hold
                    # the column's native type; a mistyped literal
                    # never prunes)
                    same = isinstance(val, str) == isinstance(lo, str)
                    if same:
                        if op == "EqualTo" and (val < lo or val > hi):
                            return True
                        if op == "GreaterThan" and hi <= val:
                            return True
                        if op == "GreaterThanOrEqual" and hi < val:
                            return True
                        if op == "LessThan" and lo >= val:
                            return True
                        if op == "LessThanOrEqual" and lo > val:
                            return True
                if (
                    op == "EqualTo"
                    and bloom_bits is not None
                    and col == bloom_col
                    and isinstance(val, int)
                    and not all(
                        p in bloom_bits for p in _bloom_positions(val)
                    )
                ):
                    return True
            # HIDDEN-PARTITION pruning: map the comparison into
            # transform space against the file's recorded transform
            # range(s) — the path that prunes TIMESTAMP filters, which
            # zone maps (int/float/string only) never see, and the
            # bucket-field equality probes of a multi-field spec. The
            # comparison bound maps CONSERVATIVELY (inclusive), which
            # is always safe for monotone transforms.
            for i, spec in enumerate(specs or ()):
                prng = pranges[i] if pranges is not None else None
                if prng is None or col != spec["col"]:
                    continue
                try:
                    t = _transform_scalar(spec, val)
                except (TypeError, ValueError, AttributeError):
                    continue  # untransformable literal: keep the file
                if spec["kind"] == "bucket":
                    if op == "EqualTo" and not (prng[0] <= t <= prng[1]):
                        return True
                    continue
                if op == "EqualTo" and (t < prng[0] or t > prng[1]):
                    return True
                if op in ("GreaterThan", "GreaterThanOrEqual") and (
                    prng[1] < t
                ):
                    return True
                if op in ("LessThan", "LessThanOrEqual") and prng[0] > t:
                    return True
        return False

    def partitions(self) -> list[InputPartition]:
        staging = os.path.join(self.path, "_staging")
        # fold the log driver-side: live file -> (commit version, zone
        # map, bloom), plus the tombstone ledger (version, keys, files)
        live: dict[str, tuple] = {}
        tombs: list[tuple[int, tuple, tuple, list[str]]] = []
        reader_log = _log(self.path, self.as_of, self.branch)
        renamed = _alters_since_last_rewrite(reader_log)
        per_index, current_ids, fid_ok = _field_id_history(reader_log)
        if renamed and not fid_ok:
            raise ValueError(
                "the public batch reader cannot read across a column "
                "rename on this log: a file-bearing manifest records "
                "no schema, so field ids cannot be derived — read "
                "through read_evolved, or compact to collapse the eras"
            )
        # per-manifest translation: field id -> write-era name, and
        # current name -> write-era name (None = the file predates the
        # column's current generation, so its rows are all-null for it)
        id_to_cur = {i: n for n, i in current_ids.items()}

        def cur2era(idx: int) -> dict[str, str | None] | None:
            if not renamed:
                return None  # identity: names never moved
            pi = per_index[idx] or {}
            inv = {i: n for n, i in pi.items()}
            return {
                cn: inv.get(cid) for cn, cid in current_ids.items()
            }

        for idx, (version, m) in enumerate(reader_log):
            kind = m.get("kind", "append")
            if kind == "alter":
                continue  # metadata-only: no files
            fs = m.get("file_stats", {})
            bcol = m.get("bloom_col")
            blooms = m.get("file_blooms", {})
            specs = _specs_of(m)
            fparts = m.get("file_partitions", {}) if specs else {}
            if kind in ("delete", "merge"):
                # tombstone key names are the names CURRENT at this
                # commit; translate them to the read schema's names so
                # the anti-join runs in one coordinate system (a
                # rename is a column bijection, so equality is
                # preserved). A key column dropped later cannot be
                # expressed in current coordinates — reject.
                era_cols = (
                    tuple(f["name"] for f in m["schema"]["fields"])
                    if kind == "delete"
                    else tuple(m["merge_keys"])
                )
                if renamed:
                    pi = per_index[idx] or {}
                    cur_cols = tuple(
                        id_to_cur.get(pi.get(c)) for c in era_cols
                    )
                    if any(c is None for c in cur_cols):
                        raise ValueError(
                            f"tombstone at version {version} is keyed "
                            f"on {era_cols}, of which a column was "
                            "later dropped; the flat batch reader "
                            "cannot apply it — read through "
                            "read_evolved, or compact first"
                        )
                else:
                    cur_cols = era_cols
                tombs.append(
                    (version, era_cols, cur_cols, list(m["files"]))
                )
                if kind == "delete":
                    continue
            rows = m.get("file_rows", {})
            entries = {
                f: (
                    version,
                    fs.get(f, {}),
                    bcol,
                    set(blooms[f]) if f in blooms else None,
                    specs,
                    (
                        _ranges_of(fparts[f], len(specs))
                        if f in fparts
                        else None
                    ),
                    rows.get(f),
                    idx,
                )
                for f in m["files"]
            }
            if kind == "rewrite":
                live = entries
            else:
                live.update(entries)
        legacy = [f for f in live if not f.endswith(".parquet")]
        if legacy:
            raise ValueError(
                f"the batch DataSource reads the parquet data plane "
                f"only and {legacy[0]} is pre-columnar; compact the "
                "table to parquet first (read_committed still reads "
                "legacy files)"
            )
        sj = json.dumps(self.schema.jsonValue())
        colmap_cache: dict[int, dict | None] = {}
        out: list[InputPartition] = []
        for name in sorted(live):
            vf, stats, bcol, bits, specs, pranges, n_rows, idx = live[
                name
            ]
            if n_rows == 0:
                continue  # recorded empty: provably nothing to scan
            if self.keep_files is not None and name not in self.keep_files:
                continue  # external index (token blooms) excluded it
            if idx not in colmap_cache:
                colmap_cache[idx] = cur2era(idx)
            colmap = colmap_cache[idx]
            pushed = self._pushed
            if colmap is not None and pushed:
                # translate pushed probes into this file's write-era
                # names so its name-keyed stats/blooms/transform
                # ranges keep pruning after a rename. A probe on a
                # column the file PREDATES excludes the file outright:
                # its rows are all-null there, and every pushable
                # comparison is null-rejecting.
                pushed, skip = [], False
                for col, op, val in self._pushed:
                    era = colmap.get(col, col)
                    if era is None:
                        skip = True
                        break
                    pushed.append((era, op, val))
                if skip:
                    continue
            if self._excluded(stats, bcol, bits, specs, pranges, pushed):
                continue
            applicable = [
                (ec, cc, [os.path.join(staging, t) for t in files])
                for vt, ec, cc, files in tombs
                if vt > vf
            ]
            out.append(
                _FileScan(
                    os.path.join(staging, name), sj, applicable, colmap
                )
            )
        return out

    def read(self, partition: _FileScan | None):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        if partition is None:
            # an empty partitions() list (empty table, or every file
            # pruned by the pushed filters) reaches the task as ONE
            # None partition — Spark's empty-scan convention
            return
        want = to_arrow_schema(
            StructType.fromJson(json.loads(partition.schema_json))
        )
        colmap = partition.colmap or {}
        # tombstone key tables: read under the key columns' WRITE-ERA
        # names, rename to the current names, and cast to the read
        # schema's key types so the anti-join compares like types (a
        # delete written at int still removes rows read under a
        # widened bigint schema)
        keysets: list[tuple[list[str], pa.Table]] = []
        for era_cols, cur_cols, files in partition.tombs:
            tables = [
                pq.read_table(f, columns=list(era_cols)) for f in files
            ]
            t = pa.concat_tables(tables) if tables else None
            if t is None or t.num_rows == 0:
                continue
            t = t.rename_columns(list(cur_cols)).cast(
                pa.schema(
                    [pa.field(c, want.field(c).type) for c in cur_cols]
                )
            )
            keysets.append((list(cur_cols), t))
        pf = pq.ParquetFile(partition.file_path)
        for batch in pf.iter_batches():
            cols = []
            for f in want:
                # a pre-rename file serves the column under its
                # write-era name (field-id column mapping); None means
                # the file predates the column's current generation
                src = colmap.get(f.name, f.name)
                if src is not None and src in batch.schema.names:
                    cols.append(batch.column(src).cast(f.type))
                else:
                    cols.append(pa.nulls(batch.num_rows, type=f.type))
            tbl = pa.Table.from_batches(
                [pa.record_batch(cols, schema=want)]
            )
            for kcols, keys in keysets:
                tbl = tbl.join(keys, keys=kcols, join_type="left anti")
            for out in tbl.to_batches():
                if out.num_rows:
                    yield out


class ManifestBatchReaderPushdown(ManifestBatchReader):
    """The pushdown-enabled variant, selected by
    ``.option('pushdown', 'true')`` — separate because Spark 4.1
    refuses any Python reader that implements pushFilters under the
    default ``spark.sql.python.filterPushdown.enabled=false``."""

    def pushFilters(self, filters):
        import datetime as _dt

        for f in filters:
            if (
                isinstance(
                    f,
                    (
                        EqualTo,
                        GreaterThan,
                        GreaterThanOrEqual,
                        LessThan,
                        LessThanOrEqual,
                    ),
                )
                and len(f.attribute) == 1
                and isinstance(
                    f.value, (int, float, str, _dt.datetime, _dt.date)
                )
                and not isinstance(f.value, bool)
            ):
                self._pushed.append(
                    (f.attribute[0], type(f).__name__, f.value)
                )
        # everything is handed back: Spark re-applies the row filters,
        # the recorded comparisons only prune the file list
        return filters


class ManifestSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifest_sink"

    def schema(self) -> StructType:
        # table schema DISCOVERED from the manifest log (readers never
        # declare it) — the same discovery read_evolved uses; honors
        # versionAsOf/tag so a time-travel read binds the schema AS OF
        # that snapshot
        sch = table_schema(
            self.options.get("path"), _resolve_as_of(self.options)
        )
        if sch is None:
            raise ValueError(
                "manifest table has no recorded schema; cannot read"
            )
        return sch

    def reader(self, schema: StructType) -> ManifestBatchReader:
        if str(self.options.get("pushdown", "")).lower() == "true":
            return ManifestBatchReaderPushdown(self.options, schema)
        return ManifestBatchReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> ManifestWriter:
        return ManifestWriter(self.options, overwrite, schema)

    def streamReader(self, schema: StructType) -> ManifestStreamReader:
        return ManifestStreamReader(self.options, schema)


def _list_manifests(path: str) -> list[tuple[int, str]]:
    """(version, filename) for every committed manifest. Legacy
    uuid-named manifests (pre-versioning) sort first as version 0."""
    out: list[tuple[int, str]] = []
    if not os.path.isdir(path):
        return out  # never-written table: no commits
    for entry in sorted(os.listdir(path)):
        if entry.startswith("_manifest-") and entry.endswith(".json"):
            stem = entry[len("_manifest-") : -len(".json")]
            out.append((int(stem) if stem.isdigit() else 0, entry))
    return out


# ---------------------------------------------------------------------------
# In-process parsed-log cache.
#
# Every driver-side planning step — read planning, schema resolution,
# pruning, metadata tables, field-id derivation, the streaming head's
# latestOffset poll — funnels through _log()/_parse_all(). Without a
# cache each call re-opens and re-JSON-parses the latest checkpoint
# bundle PLUS the log tail; a lifecycle operation makes dozens of such
# calls, so driver work grows quadratically in log depth per session.
# The cache makes each call O(#log files) stat()s instead: a scandir
# fingerprint of every manifest + checkpoint file's (name, mtime_ns,
# size) validates the cached parse, so ANY commit — a new manifest, a
# claim file landing its os.replace, a branch publish rewriting a
# manifest IN PLACE, a vacuum removing one, a new checkpoint —
# invalidates it without writer coordination, including commits made
# by OTHER processes (no in-process hook could see those). Entries are
# parsed checkpoint-first exactly as _log() always has; the checkpoint
# is a pure parse cache (it can never change WHAT is read), so serving
# _parse_all() from the same entries is content-identical to its old
# per-file parse. Consumers never mutate returned manifests (audited;
# publish_branch copies before popping), so sharing the parsed dicts
# is safe.
_SCAN_CACHE: OrderedDict[
    str, tuple[tuple, list[tuple[int, str, dict | None]]]
] = OrderedDict()
_SCAN_CACHE_MAX = 32
_SCAN_LOCK = threading.Lock()
_SCAN_STATS = {"hits": 0, "rebuilds": 0, "extends": 0}


def clear_log_cache() -> None:
    """Drop every cached parsed log (tests; long-lived sessions that
    want to bound memory across thousands of tables)."""
    with _SCAN_LOCK:
        _SCAN_CACHE.clear()
        _SCAN_STATS["hits"] = 0
        _SCAN_STATS["rebuilds"] = 0
        _SCAN_STATS["extends"] = 0


def _log_fingerprint(path: str) -> tuple | None:
    """Stat-level fingerprint of the log directory: (name, mtime_ns,
    size) for every manifest and checkpoint file, sorted. One syscall
    per file — no opens, no JSON. None when the table directory does
    not exist (never-written table)."""
    try:
        it = os.scandir(path)
    except OSError:
        return None
    fp: list[tuple[str, int, int]] = []
    with it:
        for de in it:
            n = de.name
            if not n.endswith(".json"):
                continue
            if not (
                n.startswith("_manifest-")
                or n.startswith("_logcheckpoint-")
            ):
                continue
            try:
                st = de.stat()
            except OSError:
                continue  # racing remove: next call re-fingerprints
            fp.append((n, st.st_mtime_ns, st.st_size))
    fp.sort()
    return tuple(fp)


def _scan_log(path: str) -> list[tuple[int, str, dict | None]]:
    """(version, filename, parsed manifest | None) for every committed
    manifest file, in :func:`_list_manifests` order — the ONE parse
    pass behind :func:`_log` and :func:`_parse_all`, cached per
    process and validated by :func:`_log_fingerprint` on every call.
    ``None`` marks an unreadable entry (an in-flight claim mid-write,
    a corrupt file) — the in-flight signal the streaming head and the
    claimer derivation consume."""
    fp = _log_fingerprint(path)
    if fp is None:
        return []
    with _SCAN_LOCK:
        hit = _SCAN_CACHE.get(path)
        if hit is not None and hit[0] == fp:
            _SCAN_CACHE.move_to_end(path)
            _SCAN_STATS["hits"] += 1
            return hit[1]
    entries = None
    if hit is not None:
        entries = _extend_scan(path, hit[0], hit[1], fp)
    if entries is None:
        ck = _latest_checkpoint(path)
        entries = []
        for version, entry in _list_manifests(path):
            m = ck.get(version)
            if m is None:
                try:
                    with open(os.path.join(path, entry)) as f:
                        m = json.load(f)
                except (json.JSONDecodeError, OSError):
                    m = None
            entries.append((version, entry, m))
        with _SCAN_LOCK:
            _SCAN_STATS["rebuilds"] += 1
            _SCAN_CACHE[path] = (fp, entries)
            _SCAN_CACHE.move_to_end(path)
            while len(_SCAN_CACHE) > _SCAN_CACHE_MAX:
                _SCAN_CACHE.popitem(last=False)
    return entries


def _extend_scan(
    path: str,
    old_fp: tuple,
    old_entries: list[tuple[int, str, dict | None]],
    fp: tuple,
) -> list[tuple[int, str, dict | None]] | None:
    """INCREMENTAL cache update for the append-only common case: when
    the fingerprint changed ONLY by manifest files appended past the
    old tail (every old file identical, no checkpoint churn, new names
    sorting strictly after — so in-place publishes, vacuums, landed
    claims, and legacy unordered names all fall through), parse just
    the new files and extend the cached list. This turns a lifecycle
    session's write→plan loop from O(log²) total parse work into
    O(log): each plan call after a commit parses ONE new manifest.
    Returns None when the mutation shape is anything else — the caller
    rebuilds from scratch (correctness never rests on this path)."""
    old_map = {name: (mt, sz) for name, mt, sz in old_fp}
    new_names = []
    for name, mt, sz in fp:
        prev = old_map.pop(name, None)
        if prev is None:
            new_names.append(name)
        elif prev != (mt, sz):
            return None  # in-place change (publish/landed claim)
    if old_map:
        return None  # a file vanished (vacuum/abandon)
    if not all(
        n.startswith("_manifest-") and n.endswith(".json")
        for n in new_names
    ):
        return None  # checkpoint churn: rebuild against the new bundle
    last_old = max(
        (e for _v, e, _m in old_entries), default=""
    )
    new_names.sort()
    if new_names and last_old and new_names[0] <= last_old:
        return None  # out-of-order name (legacy uuid): full rebuild
    entries = list(old_entries)
    for name in new_names:
        stem = name[len("_manifest-") : -len(".json")]
        version = int(stem) if stem.isdigit() else 0
        try:
            with open(os.path.join(path, name)) as f:
                m = json.load(f)
        except (json.JSONDecodeError, OSError):
            m = None
        entries.append((version, name, m))
    with _SCAN_LOCK:
        _SCAN_STATS["extends"] = _SCAN_STATS.get("extends", 0) + 1
        _SCAN_CACHE[path] = (fp, entries)
        _SCAN_CACHE.move_to_end(path)
    return entries


def _parse_all(path: str) -> tuple[dict[int, str], dict[int, dict]]:
    """ONE parse pass over the manifest log: (version → filename,
    version → parsed manifest for the readable subset). The shared
    substrate of the in-flight derivation and the streaming head, so
    a latestOffset poll costs one cached :func:`_scan_log` pass, not
    two parses."""
    scan = _scan_log(path)
    files = {version: entry for version, entry, _m in scan}
    last: dict[int, dict | None] = {}
    for version, _entry, m in scan:
        last[version] = m  # last filename per version wins, as before
    parsed = {v: m for v, m in last.items() if m is not None}
    return files, parsed


def table_versions(path: str) -> list[int]:
    """Committed snapshot versions, ascending — the time-travel axis."""
    return sorted(v for v, _ in _list_manifests(path))


def committed_versions(path: str) -> list[int]:
    """Versions with a READABLE MAIN manifest — excludes in-flight
    claims and unpublished branch commits. This is the axis tags and
    API return values use; :func:`table_versions` remains the raw
    claimed-file listing (vacuum's bookkeeping axis). Versions behind
    a later RESTORE stay listed — they remain time-travel targets."""
    return sorted(v for v, _m in _log(path, raw=True))


def _stream_visible_head(path: str) -> int:
    """The largest version a streaming tail may deliver THROUGH: walk
    claimed versions ascending and stop before the first one that is
    not yet main-readable — an in-flight commit (claimed, content not
    yet written) or an unpublished branch commit (could become visible
    at exactly this version when published). Either would otherwise be
    skipped by the checkpoint and its rows lost when it completes; the
    stream waits instead (Delta's not-yet-readable-gap rule). Version
    holes with NO file AND no live claim (abandoned branches, vacuumed
    stale claims) are safe to walk over: a hole BELOW a higher claimed
    version is permanent (commit always claims above the observed
    max), and a freed TOP version can only be reclaimed while the head
    still holds below it — nothing was ever delivered past it either
    way. The in-flight signal is the
    :meth:`VersionClaimer.in_flight_versions` derivation — (claims ∪
    on-disk) − readable — inlined over ONE shared parse pass
    (:func:`_parse_all`), so a claimer whose claims live outside the
    filesystem (conditional PUT) still holds the head below its
    file-less claims and a latestOffset poll parses each manifest
    exactly once."""
    files, parsed = _parse_all(path)
    claimed = set(_VERSION_CLAIMER.claimed_versions(path))
    in_flight = (claimed | set(files)) - set(parsed)
    head = 0
    for version in sorted(claimed | set(files)):
        if version in in_flight:
            break  # commit in flight: not yet readable — wait
        if parsed[version].get("branch") is not None:
            break  # staged WAP commit: may publish at this version — wait
        head = version
    return head


def _read_files(spark: SparkSession, path: str, schema, names) -> DataFrame:
    """Scan exactly the named committed staging files. Parquet is the
    data plane (columnar: the scan prunes columns and pushes predicates
    into row-group filters); legacy ``.jsonl`` files from pre-columnar
    commits are still read (extension dispatch + unionByName), so a
    table migrates formats by simply compacting. Missing-in-file
    columns read as NULL against the explicit schema in BOTH formats —
    the add-only evolution contract."""
    names = sorted(names)
    if not names:
        return local_frame(spark, [], schema)
    staging = os.path.join(path, "_staging")
    pq = [os.path.join(staging, n) for n in names if n.endswith(".parquet")]
    js = [os.path.join(staging, n) for n in names if not n.endswith(".parquet")]
    parts = []
    if pq:
        parts.append(spark.read.schema(schema).parquet(*pq))
    if js:
        parts.append(spark.read.schema(schema).json(js))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def _committed_entry_of(
    path: str, token: str, branch: str | None = None
) -> tuple[int, dict]:
    """(version, manifest) of the commit that recorded ``token`` — the
    race-free post-write lookup every write-API return value uses
    (scanning for "the latest version" instead would attribute a
    CONCURRENT writer's commit to this caller)."""
    for version, m in reversed(_log(path, branch=branch, raw=True)):
        if m.get("commit_token") == token and m.get("branch") == branch:
            return version, m
    raise RuntimeError(
        f"commit with token {token!r} not found at {path}; the write "
        "did not land"
    )


def read_committed(
    spark: SparkSession,
    path: str,
    schema,
    as_of: int | None = None,
    _keep: set | None = None,
    branch: str | None = None,
) -> DataFrame:
    """Read ONLY manifest-committed files (uncommitted staging output is
    invisible). ``as_of`` reads the table AS OF that snapshot version —
    the union of all commits with version <= as_of, so a reader can
    reproduce yesterday's training set after today's append.
    Driver-side listing is O(#manifests); the data read is a parallel
    columnar scan of exactly the committed files.

    Row-level DELETES (Iceberg-v2-style equality deletes, written via
    :func:`delete_where`) apply MERGE-ON-READ: when the log contains
    delete snapshots, the read folds it in commit order — appends
    accumulate, a delete anti-joins the state-so-far on the tombstone
    file's key columns (so a key re-inserted AFTER its delete
    survives, the sequence-number rule), and a rewrite resets to its
    consolidated state (compaction MATERIALIZES deletes: it rewrites
    through this reader, so tombstones never outlive it). A MERGE
    snapshot (atomic upsert, :func:`merge_upsert`) folds as
    delete-then-insert from ONE commit: the state-so-far is
    anti-joined on the merge's key columns projected from the merge's
    OWN data files, then those files append — matched rows replaced,
    unmatched inserted, no intermediate state ever readable. Logs
    without deletes or merges take the single-scan fast path
    unchanged. ``_keep`` restricts the DATA files scanned (zone-map
    pruning); tombstone applications are never pruned — a pruned-out
    merge file still anti-joins its keys, it just isn't scanned as
    data — correctness over skipping.

    RENAMED tables (live naming eras) are REJECTED here: this is the
    explicit-schema path, and scanning a pre-rename file under the
    current names would silently null the renamed columns. Read
    through :func:`read_evolved` (the segmented era fold) or the
    public batch reader (field-id column mapping) instead."""
    log = _log(path, as_of, branch)
    if _alters_since_last_rewrite(log):
        raise ValueError(
            "table has live naming eras (column rename/drop above the "
            "last rewrite); the explicit-schema read would silently "
            "null pre-rename columns — read through read_evolved or "
            "the public batch reader, or compact to collapse the eras"
        )
    if not any(
        m.get("kind", "append") in ("delete", "merge") for _, m in log
    ):
        committed = [f for f, _ in _committed_files(path, as_of, branch)]
        if _keep is not None:
            committed = [f for f in committed if f in _keep]
        return _read_files(spark, path, schema, committed)

    def flush(df: DataFrame | None, pending: list) -> DataFrame | None:
        if _keep is not None:
            pending = [f for f in pending if f in _keep]
        if not pending:
            return df
        scan = _read_files(spark, path, schema, pending)
        return scan if df is None else df.unionByName(scan)

    df: DataFrame | None = None
    pending: list = []
    for version, m in log:
        kind = m.get("kind", "append")
        if kind in ("alter", "analyze"):
            continue  # metadata-only (rename / NDV sketches): no rows
            # change; renamed tables read era-correctly via read_evolved
        if kind == "rewrite":
            df, pending = None, list(m["files"])
        elif kind == "append":
            pending += m["files"]
        elif kind == "merge":
            # atomic upsert: tombstone the pre-merge state on the key
            # projection of this commit's OWN files, then append them
            df, pending = flush(df, pending), []
            keys = m["merge_keys"]
            if df is not None:
                tomb = _read_files(spark, path, schema, m["files"]).select(
                    *keys
                )
                df = df.join(tomb, on=keys, how="left_anti")
            pending += m["files"]
        else:  # delete
            df, pending = flush(df, pending), []
            if df is None:
                continue
            if "schema" not in m:
                raise ValueError(
                    f"delete snapshot {version} recorded no key schema"
                )
            key_schema = StructType.fromJson(m["schema"])
            tomb = _read_files(spark, path, key_schema, m["files"])
            df = df.join(
                tomb, on=[f.name for f in key_schema.fields], how="left_anti"
            )
    df = flush(df, pending)
    return df if df is not None else local_frame(spark, [], schema)


def delete_where(
    spark: SparkSession,
    path: str,
    keys: DataFrame,
    branch: str | None = None,
) -> int:
    """Row-level DELETE from the manifest table without rewriting any
    data file — an equality-delete snapshot (Iceberg v2 merge-on-read):
    ``keys``' rows are written as tombstone files through the same
    exactly-once writer, and every committed row matching a tombstone
    on ALL of ``keys``' columns disappears from subsequent reads (of
    versions >= this one — earlier versions still time-travel to the
    undeleted state). The delete costs O(|keys|) writes + one manifest,
    never a table rewrite; the rewrite happens lazily at the next
    compaction, which materializes the deletes and drops the
    tombstones. ``branch`` stages the delete on a write-audit-publish
    branch instead of committing it to main directly. Returns the new
    snapshot version."""
    token = uuid.uuid4().hex
    opts = {"kind": "delete", "commit_token": token}
    if branch is not None:
        opts["branch"] = branch
    save_manifest(keys, path, **opts)
    return _committed_entry_of(path, token, branch)[0]


def tag_snapshot(
    path: str, name: str, version: int | None = None
) -> int:
    """Create an immutable NAMED TAG for a snapshot version — the
    Iceberg tag / Delta named-version ref: ``read_committed(path,
    schema, as_of=read_tag(path, name))`` then reproduces the tagged
    state forever (or until vacuum expires the underlying versions —
    expiry is the documented retention boundary, same as Iceberg's).
    Defaults to tagging the current head. Tags are immutable by
    contract (re-tagging a name raises — drop it first with
    :func:`drop_tag`); the tag file is written atomically via the same
    tmp + ``os.replace`` pattern as commits.

    Scale: a tag is one O(1) metadata file — the mechanism that makes
    'the exact training set of run X' a durable, named artifact
    instead of a copied table."""
    if "/" in name or name.startswith("."):
        raise ValueError(f"invalid tag name: {name!r}")
    versions = committed_versions(path)  # never an in-flight or
    # unpublished-branch version: a tag must resolve to main state
    if version is None:
        version = max(versions, default=0)
    if version not in versions:
        raise ValueError(f"cannot tag version {version}: not committed")
    final = os.path.join(path, f"_tag-{name}.json")
    tmp = os.path.join(path, f"._tag-{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump({"name": name, "version": version}, f)
    try:
        # link is create-EXCLUSIVE and delivers full content atomically
        # (no exists-then-replace TOCTOU: two racing taggers cannot
        # both win, and no reader ever sees a half-written tag)
        os.link(tmp, final)
    except FileExistsError:
        raise ValueError(
            f"tag {name!r} already exists; drop it first"
        ) from None
    finally:
        os.remove(tmp)
    return version


def read_tag(path: str, name: str) -> int:
    """Resolve a named tag to its snapshot version."""
    final = os.path.join(path, f"_tag-{name}.json")
    try:
        with open(final) as f:
            return int(json.load(f)["version"])
    except FileNotFoundError:
        raise ValueError(f"no tag {name!r} at {path}") from None


def list_tags(path: str) -> dict[str, int]:
    """Every tag name → version, the table's named-ref catalog."""
    out: dict[str, int] = {}
    if not os.path.isdir(path):
        return out
    for entry in sorted(os.listdir(path)):
        if entry.startswith("_tag-") and entry.endswith(".json"):
            try:
                with open(os.path.join(path, entry)) as f:
                    m = json.load(f)
                out[m["name"]] = int(m["version"])
            except (json.JSONDecodeError, OSError, KeyError):
                continue
    return out


def drop_tag(path: str, name: str) -> bool:
    """Remove a tag (the ref only — never the data); False if absent."""
    try:
        os.remove(os.path.join(path, f"_tag-{name}.json"))
        return True
    except FileNotFoundError:
        return False


def list_branches(path: str) -> dict[str, int]:
    """Every LIVE branch name → number of staged (unpublished)
    commits — the WAP audit inventory. A branch 'exists' exactly while
    branch-tagged manifests sit in the log (publish rewrites them into
    main; abandon removes them), so the listing is a pure fold of the
    raw log with no separate ref files to drift."""
    out: dict[str, int] = {}
    for _v, _entry, m in _scan_log(path):
        if m is None:
            continue  # in-flight claim / corrupt file
        b = m.get("branch")
        if b is not None:
            out[b] = out.get(b, 0) + 1
    return out


def _commit_manifest_dict(path: str, manifest: dict) -> int:
    """Commit a driver-built manifest through the SAME claim protocol
    the Spark writer uses (claim the next version exclusively, write
    to a temp name, ``os.replace`` as the atomic commit point) — the
    shared primitive for metadata-only commits (RESTORE) that carry
    no new data files and therefore need no Spark job."""
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f"._manifest-{uuid.uuid4().hex}.tmp")
    while True:
        version = 1 + max(
            _VERSION_CLAIMER.claimed_versions(path), default=0
        )
        if not _VERSION_CLAIMER.claim(path, version):
            continue
        final = os.path.join(path, f"_manifest-{version:06d}.json")
        manifest["version"] = version
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, final)
        return version


def restore_table(path: str, version: int) -> int:
    """RESTORE the table to an earlier snapshot as a NEW commit — the
    Delta ``RESTORE TABLE ... TO VERSION AS OF`` contract. The commit
    is METADATA-ONLY: one ``kind='restore'`` manifest recording the
    target version; no data file is read, copied, or rewritten, so
    restoring a 100-TB table costs one JSON write. Readers expand it
    through the effective log (:func:`_effective`): the state at/after
    the restore version equals the state as of the target (including
    across delete/merge tombstone folds — the expansion replays the
    ORIGINAL log prefix, so merge-on-read semantics are preserved
    exactly), while ``as_of`` reads BELOW the restore still see the
    pre-restore history unchanged — restore never rewrites the past,
    it appends a new head. History (``table_history``) shows the
    restore event; :func:`read_changes` emits its row-level symmetric
    diff; the streaming tail treats it like every other non-append
    snapshot (restart-from-snapshot rule); vacuum refuses snapshot
    expiry that would cut a retained restore's target out from under
    it. Restoring PAST a restore chains correctly (the target's own
    effective state is what returns).

    Rejected: a target that is not a readable main snapshot (expired,
    in-flight, branch-staged, or future), and restoring while
    unpublished WAP branches exist — their staged commits were built
    on the pre-restore head; publish or abandon them first (the same
    fast-forward discipline :func:`publish_branch` enforces).

    Returns the new snapshot version. Reference analogue: the closest
    behavior the reference has is re-running its daily batch export
    over yesterday's partition directories
    (bigquery_update_scheduler.py:163-231) — recovery by reprocessing;
    here recovery is a constant-time catalog operation."""
    committed = committed_versions(path)
    if version not in committed:
        raise ValueError(
            f"restore target {version} is not a readable main snapshot "
            f"at {path} (committed: {committed})"
        )
    staged_branches = sorted(
        {
            m.get("branch")
            for _v, entry in _list_manifests(path)
            for m in (_load_manifest_or_none(path, entry),)
            if m is not None and m.get("branch") is not None
        }
    )
    if staged_branches:
        raise ValueError(
            f"cannot restore while write-audit-publish branches "
            f"{staged_branches} hold unpublished commits built on the "
            "current head; publish or abandon them first"
        )
    return _commit_manifest_dict(
        path,
        {"kind": "restore", "restore_as_of": version, "files": []},
    )


def _load_manifest_or_none(path: str, entry: str) -> dict | None:
    """Parse one manifest file, None for in-flight/corrupt content —
    the tolerant single-file read the scan loops share."""
    try:
        with open(os.path.join(path, entry)) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None


def rename_column(path: str, old: str, new: str) -> int:
    """RENAME a column — Delta column-mapping / Iceberg field-ID rename
    as a METADATA-ONLY ``kind='alter'`` commit: no data file is
    touched; the manifest records the rename map and the post-rename
    schema, and readers resolve each file under its WRITE-TIME schema
    (every data manifest records the schema its files were written
    with), aliasing to the current names — so files written before the
    rename keep serving the column under its new name, which the plain
    add-only evolution contract cannot express (it rejects renames at
    discovery precisely because a name-based read would null them).

    Reads of renamed tables go through :func:`read_evolved` (the
    schema-discovery path — it performs the per-era aliasing) or the
    public batch reader (which resolves each file's columns through
    FIELD IDS, :func:`_field_id_history`); :func:`read_committed`
    keeps its explicit-schema contract and documents that renamed
    tables need one of those paths. The metadata surfaces — metadata
    aggregates, table$partitions, the public reader's pushdown
    pruning — likewise translate every probe current name → field id
    → write-era name, so they answer EXACTLY across a rename with no
    compaction, and pre-rename files keep being pruned by their stats
    under the new name. Only legacy logs whose file-bearing manifests
    record no schema still reject (ids underivable — compact first).

    Rejected: renaming a column that does not exist, onto a name that
    does, while unpublished WAP branches exist, or while the table has
    no recorded schema. Returns the new snapshot version."""
    sch = table_schema(path)
    if sch is None:
        raise ValueError(f"no recorded schema at {path}; nothing to rename")
    names = [f.name for f in sch.fields]
    if old not in names:
        raise ValueError(f"column {old!r} not in schema {names}")
    if new in names:
        raise ValueError(f"column {new!r} already exists in {names}")
    retired = _retired_since_last_rewrite(_log(path))
    if new in retired:
        raise ValueError(
            f"column name {new!r} was dropped by an earlier alter and "
            "pre-drop live files still hold that generation's bytes "
            "and name-keyed stats; renaming onto it would serve the "
            "dropped column's old values — compact to rewrite the "
            "live files first"
        )
    staged = sorted(
        {
            m.get("branch")
            for _v, entry in _list_manifests(path)
            for m in (_load_manifest_or_none(path, entry),)
            if m is not None and m.get("branch") is not None
        }
    )
    if staged:
        raise ValueError(
            f"cannot rename while write-audit-publish branches {staged} "
            "hold unpublished commits; publish or abandon them first"
        )
    _reject_constrained_column(path, old, "rename")
    renamed = StructType(
        [
            StructField(new if f.name == old else f.name, f.dataType, f.nullable)
            for f in sch.fields
        ]
    )
    return _commit_manifest_dict(
        path,
        {
            "kind": "alter",
            "rename": {old: new},
            "schema": renamed.jsonValue(),
            "files": [],
        },
    )


def drop_column(path: str, col: str) -> int:
    """DROP a column — the other half of column mapping, the same
    METADATA-ONLY ``kind='alter'`` commit: no data file is rewritten;
    the column simply leaves the discovered schema, and the era read
    (:func:`read_evolved`) stops projecting it (pre-drop files keep
    their bytes — time travel below the drop still reads them, and a
    RESTORE below the drop brings the column back entirely). Dropping
    the last column is rejected, as is dropping while unpublished WAP
    branches exist. RE-USING a dropped name in a later append is
    rejected at schema discovery until a compaction rewrites the live
    files without the column — a name-based era read would otherwise
    resurrect the retired generation's values (Delta avoids this with
    field IDs; the guard is the honest equivalent). Returns the new
    snapshot version."""
    sch = table_schema(path)
    if sch is None:
        raise ValueError(f"no recorded schema at {path}; nothing to drop")
    names = [f.name for f in sch.fields]
    if col not in names:
        raise ValueError(f"column {col!r} not in schema {names}")
    if len(names) == 1:
        raise ValueError("cannot drop the table's only column")
    staged = sorted(
        {
            m.get("branch")
            for _v, entry in _list_manifests(path)
            for m in (_load_manifest_or_none(path, entry),)
            if m is not None and m.get("branch") is not None
        }
    )
    if staged:
        raise ValueError(
            f"cannot drop a column while write-audit-publish branches "
            f"{staged} hold unpublished commits; publish or abandon "
            "them first"
        )
    _reject_constrained_column(path, col, "drop")
    remaining = StructType([f for f in sch.fields if f.name != col])
    return _commit_manifest_dict(
        path,
        {
            "kind": "alter",
            "drop": [col],
            "schema": remaining.jsonValue(),
            "files": [],
        },
    )


def add_column(path: str, col: str, dtype: str) -> int:
    """ADD a column — the third leg of the alter triple, a
    METADATA-ONLY ``kind='alter'`` commit: no data file is touched;
    the column joins the discovered schema with a fresh FIELD ID and
    every pre-existing file reads NULL for it (the add-column
    backfill contract the append-driven evolution already honors —
    this makes the step an EXPLICIT one-JSON-write DDL instead of a
    side effect of the next wider append). ``dtype`` is a Spark type
    string (``int``, ``bigint``, ``string``, ``array<float>``, …).

    Re-using a name retired by a live-era DROP is rejected exactly as
    the append path rejects it (pre-drop files still hold that
    generation's bytes and name-keyed stats); compaction clears the
    guard. Returns the new snapshot version."""
    from pyspark.sql.types import _parse_datatype_string

    sch = table_schema(path)
    if sch is None:
        raise ValueError(f"no recorded schema at {path}; nothing to alter")
    names = [f.name for f in sch.fields]
    if col in names:
        raise ValueError(f"column {col!r} already exists in {names}")
    retired = _retired_since_last_rewrite(_log(path))
    if col in retired:
        raise ValueError(
            f"column name {col!r} was dropped by an earlier alter and "
            "pre-drop live files still hold that generation's bytes "
            "and name-keyed stats — compact to rewrite the live files "
            "first"
        )
    widened = StructType(
        list(sch.fields)
        + [StructField(col, _parse_datatype_string(dtype), True)]
    )
    return _commit_manifest_dict(
        path,
        {
            "kind": "alter",
            "add": [col],
            "schema": widened.jsonValue(),
            "files": [],
        },
    )


def widen_column(path: str, col: str, dtype: str) -> int:
    """WIDEN a column's type — Iceberg v3 type promotion as an
    explicit METADATA-ONLY ``kind='alter'`` commit: no data file is
    rewritten; the discovered schema changes and every existing file
    reads losslessly under the wider type (the same safe-promotion
    ladder the append-driven evolution enforces: int→bigint,
    float→double, … — Spark's parquet scan natively up-casts).
    Narrowing or lateral changes are rejected. Returns the new
    snapshot version."""
    from pyspark.sql.types import _parse_datatype_string

    sch = table_schema(path)
    if sch is None:
        raise ValueError(f"no recorded schema at {path}; nothing to alter")
    target = _parse_datatype_string(dtype)
    fields = []
    found = False
    for f in sch.fields:
        if f.name == col:
            found = True
            pair = (f.dataType.simpleString(), target.simpleString())
            if pair[0] == pair[1]:
                raise ValueError(
                    f"column {col!r} is already {pair[0]}"
                )
            if pair not in _TYPE_WIDENINGS:
                raise ValueError(
                    f"cannot alter {col!r} from {pair[0]} to "
                    f"{pair[1]}: not a safe widening (allowed: "
                    f"{sorted(_TYPE_WIDENINGS)})"
                )
            fields.append(StructField(col, target, f.nullable))
        else:
            fields.append(f)
    if not found:
        raise ValueError(
            f"column {col!r} not in schema "
            f"{[f.name for f in sch.fields]}"
        )
    return _commit_manifest_dict(
        path,
        {
            "kind": "alter",
            "widen": {col: target.simpleString()},
            "schema": StructType(fields).jsonValue(),
            "files": [],
        },
    )


def _reject_constrained_column(path: str, col: str, what: str) -> None:
    """A column referenced by a live CHECK constraint cannot be
    renamed or dropped (the expression would stop resolving and every
    write would fail late) — Delta's contract: drop the constraint
    first. Detection is a conservative word-boundary match of the
    identifier in each expression (a false positive costs an explicit
    DROP CONSTRAINT; a false negative would break writes)."""
    import re as _re

    for n, e in table_constraints(path).items():
        if _re.search(rf"\b{_re.escape(col)}\b", e):
            raise ValueError(
                f"cannot {what} column {col!r}: constraint {n!r} "
                f"references it in CHECK ({e}); DROP CONSTRAINT first"
            )


def table_constraints(path: str, as_of: int | None = None) -> dict:
    """The table's live CHECK constraints: name → boolean SQL
    expression — a pure fold of constraint alters in the log
    (adds override nothing: re-adding a live name rejects; drops
    retire)."""
    out: dict[str, str] = {}
    for _v, m in _log(path, as_of):
        if m.get("kind") != "alter":
            continue
        for n, e in (m.get("constraint_add") or {}).items():
            out[n] = e
        for n in m.get("constraint_drop") or []:
            out.pop(n, None)
    return out


def add_constraint(
    spark: SparkSession, path: str, name: str, expr: str
) -> int:
    """``ALTER TABLE … ADD CONSTRAINT name CHECK (expr)`` — a
    TABLE-LEVEL row contract recorded in the manifest log (Delta CHECK
    constraints): every subsequent write through the engine's write
    surfaces (INSERT / COPY INTO / MERGE / UPDATE / INSERT OVERWRITE /
    write_partitioned) re-validates its rows against every live
    constraint and REJECTS the whole commit on a violation — bad data
    never lands, instead of being found by the next audit.

    Delta's add-time contract travels too: the EXISTING committed
    rows must already satisfy the expression (one validation scan
    here, so the constraint is an invariant from birth, not a hope).
    SQL NULL semantics: a row violates only when the expression is
    FALSE — NULL passes, like SQL CHECK.

    The commit is a pure-metadata alter (no file bytes change): it
    passes streaming tails and partial rewrites, and costs one
    manifest. Writes pay ONE extra aggregation over the written rows
    per commit — the same pass Delta's writer makes.

    Reference analogue: the reference validates rows in Python per
    micro-batch and routes failures to an error stream
    (spark_streaming_consumer.py:92-118) but nothing stops a later
    batch job from appending garbage; a table-level constraint
    guards every writer."""
    from pyspark.sql import functions as _F

    if not name.isidentifier():
        raise ValueError(f"invalid constraint name: {name!r}")
    if name in table_constraints(path):
        raise ValueError(
            f"constraint {name!r} already exists; drop it first"
        )
    sch = table_schema(path)
    if sch is None:
        raise ValueError(f"table at {path} records no schema")
    # the expression must resolve against the declared schema (typo'd
    # columns fail HERE, not at the first write)
    probe = local_frame(spark, [], sch)
    try:
        probe.filter(_F.expr(expr)).schema
    except Exception as e:  # noqa: BLE001 - surface the parse error
        raise ValueError(
            f"constraint expression {expr!r} does not resolve against "
            f"the table schema: {e}"
        ) from None
    current = read_evolved(spark, path)
    n_bad = current.filter(
        _F.expr(expr).cast("boolean") == _F.lit(False)
    ).count()
    if n_bad:
        raise ValueError(
            f"cannot add constraint {name!r}: {n_bad} existing rows "
            f"violate CHECK ({expr})"
        )
    return _commit_manifest_dict(
        path,
        {
            "kind": "alter",
            "constraint_add": {name: expr},
            "files": [],
        },
    )


def drop_constraint(path: str, name: str) -> int:
    """Retire a CHECK constraint — pure metadata; the data it guarded
    stays, later writes stop validating against it."""
    if name not in table_constraints(path):
        raise ValueError(f"no constraint {name!r} at {path}")
    return _commit_manifest_dict(
        path,
        {"kind": "alter", "constraint_drop": [name], "files": []},
    )


def enforce_constraints(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    what: str = "write",
    extra: dict | None = None,
):
    """Validate ``df`` against every live CHECK constraint in ONE
    aggregation pass (all constraints as parallel conditional sums);
    raise naming each violated constraint and its violation count.
    Called by every data-adding write surface BEFORE its commit.

    ``extra`` piggy-backs caller aggregates (name → Column) onto the
    SAME single pass — a validating write that also needs a row count
    or a range check pays one scan, not two (guide §1.2) — and the
    aggregated row is returned (None when there was nothing to run)."""
    from pyspark.sql import functions as _F

    cons = table_constraints(path)
    if not cons and not extra:
        return None
    aggs = [
        _F.sum(
            _F.when(
                _F.expr(e).cast("boolean") == _F.lit(False), 1
            ).otherwise(0)
        ).alias(n)
        for n, e in cons.items()
    ] + [v.alias(n) for n, v in (extra or {}).items()]
    row = df.agg(*aggs).collect()[0]
    bad = {
        n: int(row[n]) for n in cons if row[n] is not None and row[n]
    }
    if bad:
        detail = "; ".join(
            f"{n}: {c} rows violate CHECK ({cons[n]})"
            for n, c in sorted(bad.items())
        )
        raise ValueError(f"{what} rejected by table constraints — {detail}")
    return row


def set_partition_spec(
    path: str, transforms: list[tuple] | tuple | None
) -> int:
    """PARTITION-SPEC EVOLUTION — Iceberg's ``ALTER TABLE … ADD/
    REPLACE PARTITION FIELD`` as a METADATA-ONLY ``kind='alter'``
    commit: no data file moves; the table's DECLARED spec changes, and
    the two eras coexist. ``transforms`` is ``(col, kind[, arg])`` or
    a list of such tuples (the multi-field spec shape
    :func:`compact_snapshots` takes), or ``None`` to unpartition.

    Era semantics fall out of the per-manifest design: every data
    manifest already records the spec its files were written under
    plus per-file transform ranges, and the planners
    (:func:`plan_pruned_files`, the public reader's ``_excluded``)
    evaluate each file against ITS OWN recorded spec — so after an
    evolution, old files keep pruning under the old spec and new
    files under the new one, exactly Iceberg's mixed-spec contract.
    What this commit changes is the DECLARED CURRENT spec:

    - :func:`write_partitioned` with no explicit transform follows it
      (writers inherit the table's layout, Iceberg-style);
    - :func:`maintain` preserves it through full compactions (the
      rewrite re-partitions under the CURRENT spec, collapsing the
      spec eras the way it collapses naming eras);
    - :func:`table_partitions` treats it as the reference spec: files
      written under an older spec report as unaccounted (their
      histograms describe different tuples) until a rewrite refreshes
      them.

    A spec-only alter changes NO column names, so it never creates
    naming eras: reads, metadata aggregates, and the CDF are
    unaffected. Spec columns must exist in the current schema.
    Returns the new snapshot version."""
    sch = table_schema(path)
    if sch is None:
        raise ValueError(
            f"no recorded schema at {path}; nothing to partition"
        )
    specs = None
    if transforms is not None:
        fields = (
            transforms if isinstance(transforms, list) else [transforms]
        )
        specs = _parse_transforms(
            [
                {"col": c, "kind": k, "arg": (rest[0] if rest else None)}
                for c, k, *rest in fields
            ]
        )
        names = {f.name for f in sch.fields}
        missing = [s["col"] for s in specs if s["col"] not in names]
        if missing:
            raise ValueError(
                f"partition spec references unknown column(s) "
                f"{missing}; schema has {sorted(names)}"
            )
    return _commit_manifest_dict(
        path,
        {
            "kind": "alter",
            "partition_spec": specs,
            "schema": sch.jsonValue(),
            "files": [],
        },
    )


def current_partition_spec(
    path: str, as_of: int | None = None
) -> list[dict] | None:
    """The table's DECLARED current partition spec: the latest signal
    in the effective log wins, whether a :func:`set_partition_spec`
    alter or an explicit :func:`write_partitioned` (a writer declaring
    a spec evolves the table's layout as much as an alter does — the
    round-11 behavior, kept). ``None`` = unpartitioned."""
    spec: list[dict] | None = None
    for _version, m in _log(path, as_of):
        if m.get("kind") == "alter" and "partition_spec" in m:
            spec = m["partition_spec"]
        else:
            sp = _specs_of(m)
            if sp:
                spec = sp
    return spec


def clone_table(
    src: str,
    dst: str,
    as_of: int | None = None,
    include_tags: bool = True,
) -> dict:
    """ZERO-COPY clone of the manifest table — Delta SHALLOW CLONE /
    Iceberg register_table, strengthened to a FULL-HISTORY clone: the
    source's main manifests at/<= ``as_of`` are replayed verbatim into
    ``dst`` (claimed at their ORIGINAL version numbers through the
    standard protocol), and every staging file they reference — data,
    tombstones, bucketed-layout subdirs — is hard-linked, not copied.
    The clone is then a fully independent table: its own commit log,
    its own tags, its own vacuum/compaction/restore lifecycle, with
    time travel to every cloned version intact — yet zero data bytes
    were moved (``os.link`` shares inodes; cloning a 100-TB table
    costs O(#manifests + #files) metadata operations).

    Divergence is free in both directions: appends/deletes/restores on
    either side are invisible to the other. Unlike Delta's shallow
    clone — where VACUUM on the source BREAKS clones that reference
    its files — POSIX hard links make the clone vacuum-proof: the
    source deleting its directory entry leaves the clone's link (and
    the shared inode) alive. On an object store (no links) a
    deployment substitutes server-side copy (S3 CopyObject is a
    metadata operation within a bucket) — the manifest-replay protocol
    is unchanged; ``copied_fallback`` counts files that fell back to a
    byte copy here (cross-device links).

    Branch-staged source commits are NOT cloned (they are unpublished
    by definition); in-flight claims below ``as_of`` become permanent
    version holes the readers already skip. ``include_tags`` carries
    the source's named tags whose target is <= ``as_of``.

    Returns {"versions_cloned", "files_linked", "copied_fallback",
    "head_version"}. Refuses a ``dst`` that already holds manifests —
    clone creates tables, it never splices histories."""
    committed = committed_versions(src)
    if not committed:
        raise ValueError(f"no committed snapshots to clone at {src}")
    if as_of is None:
        as_of = committed[-1]
    elif as_of not in committed:
        raise ValueError(
            f"clone as_of={as_of} is not a readable main snapshot at "
            f"{src} (committed: {committed})"
        )
    if os.path.isdir(dst) and _list_manifests(dst):
        raise ValueError(
            f"clone destination {dst} already holds a committed table"
        )
    src_staging = os.path.join(src, "_staging")
    dst_staging = os.path.join(dst, "_staging")
    os.makedirs(dst_staging, exist_ok=True)
    linked = 0
    copied = 0
    seen: set[str] = set()
    log = _log(src, as_of=as_of, raw=True)
    for _version, m in log:
        for name in m.get("files", []):
            if name in seen:
                continue  # rewrites re-reference earlier files
            seen.add(name)
            s = os.path.join(src_staging, name)
            d = os.path.join(dst_staging, name)
            os.makedirs(os.path.dirname(d), exist_ok=True)
            try:
                os.link(s, d)
                linked += 1
            except OSError:
                shutil.copy2(s, d)  # cross-device: byte copy fallback
                copied += 1
    for version, m in log:
        if not _VERSION_CLAIMER.claim(dst, version):
            raise RuntimeError(
                f"version {version} already claimed at fresh clone "
                f"destination {dst}; a concurrent writer is racing the "
                "clone"
            )
        tmp = os.path.join(dst, f"._manifest-{uuid.uuid4().hex}.tmp")
        final = os.path.join(dst, f"_manifest-{version:06d}.json")
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, final)
    if include_tags:
        for name, target in list_tags(src).items():
            if target <= as_of:
                tag_snapshot(dst, name, target)
    return {
        "versions_cloned": len(log),
        "files_linked": linked,
        "copied_fallback": copied,
        "head_version": as_of,
    }


def write_with_expectations(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    rules: dict[str, str],
    on_violation: str = "fail",
    quarantine_path: str | None = None,
) -> dict:
    """Write-time data-quality EXPECTATIONS on the manifest table —
    the Delta Live Tables expect / expect-or-drop / expect-or-fail
    contract, Spark-first. ``rules`` maps rule names to SQL boolean
    predicates every written row must satisfy.

    - ``on_violation='fail'``: ALL-OR-NOTHING. The rows are written to
      a private write-audit-publish branch with per-rule violation
      counters attached as **observation metrics**
      (``df.observe``/CollectMetrics — the counters ride the write
      job itself, so auditing costs ZERO extra scans even at 100 TB).
      A clean audit publishes the branch atomically; any violation
      abandons it (nothing was ever visible to readers) and raises
      with the counts — the WAP loop, driven by expectations.
    - ``on_violation='drop'``: valid rows commit to main; violating
      rows are dropped. The same observe-metrics trick counts
      violations on the single write scan (the filter and the
      counters share one pass over the input).
    - ``on_violation='quarantine'``: like drop, but violating rows are
      ALSO written — to a side manifest table (default
      ``<path>_quarantine``) with a ``_violated`` array column naming
      each rule the row broke, so triage reads the quarantine table
      instead of re-scanning the source. Costs one extra scan of the
      input for the violating-row projection (cache ``df`` upstream
      if it is expensive to recompute).

    Every commit records the enforced contract in its manifest
    ``props`` (snapshot-summary style, surfaced by
    :func:`table_history`) — the audit trail shows WHICH rules guarded
    WHICH snapshot. Returns {"version", "violations": {rule: count},
    "rows_written", "rows_quarantined", "quarantine_version"}.

    Reference analogue: the reference's routing classifier tags
    invalid rows with ``invalid_reason`` and writes them to a CSV
    validation log (spark_streaming_consumer.py:270-281, :367-392) —
    the same quarantine idea, here promoted to an enforced write-time
    contract on a transactional table."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as _F

    if on_violation not in ("fail", "drop", "quarantine"):
        raise ValueError(f"unknown on_violation mode: {on_violation!r}")
    if not rules:
        raise ValueError("expectations need at least one rule")
    names = list(rules)
    ok = None
    for pred in rules.values():
        e = _F.expr(pred)
        ok = e if ok is None else ok & e
    counters = [_F.count(_F.lit(1)).alias("_rows_in")] + [
        _F.sum(
            _F.when(~_F.coalesce(_F.expr(p), _F.lit(False)), 1).otherwise(0)
        ).alias(n)
        for n, p in rules.items()
    ]
    token = uuid.uuid4().hex
    props = json.dumps(
        {"expectations": rules, "on_violation": on_violation}
    )
    obs = Observation()
    if on_violation == "fail":
        branch = f"_expect-{token[:12]}"
        save_manifest(
            df.observe(obs, *counters),
            path,
            branch=branch,
            commit_token=token,
            commit_props=props,
        )
        got = obs.get
        violations = {n: int(got[n] or 0) for n in names}
        if any(violations.values()):
            abandon_branch(path, branch)
            raise ValueError(
                f"expectations violated, write rolled back: "
                f"{ {n: c for n, c in violations.items() if c} }"
            )
        try:
            version = publish_branch(path, branch)[0]
        except ValueError as e:
            # a concurrent main commit landed between our branch claim
            # and this publish — the fast-forward condition fails.
            # Roll the staged write back (pure GC: it was never
            # visible) and surface a retryable conflict, the same
            # shape as Delta's commit-conflict retry loop.
            abandon_branch(path, branch)
            raise RuntimeError(
                "expect-or-fail write lost a commit race on "
                f"{path}; the staged branch was rolled back — retry "
                f"the write ({e})"
            ) from e
        return {
            "version": version,
            "violations": violations,
            "rows_written": int(got["_rows_in"] or 0),
            "rows_quarantined": 0,
            "quarantine_version": None,
        }
    # drop / quarantine: filter AFTER observe so the counters see the
    # pre-filter rows on the same scan the write consumes
    valid = df.observe(obs, *counters).filter(
        _F.coalesce(ok, _F.lit(False))
    )
    save_manifest(
        valid, path, commit_token=token, commit_props=props
    )
    version, main_manifest = _committed_entry_of(path, token)
    got = obs.get
    violations = {n: int(got[n] or 0) for n in names}
    n_bad = 0
    q_version = None
    if on_violation == "quarantine" and any(violations.values()):
        qp = quarantine_path or f"{path}_quarantine"
        q_token = uuid.uuid4().hex
        # NULL predicate results count as violations on BOTH sides:
        # valid keeps coalesce(ok, False); bad takes its complement,
        # so no row can fall through the quarantine
        bad = df.filter(~_F.coalesce(ok, _F.lit(False))).withColumn(
            "_violated",
            _F.array_compact(
                _F.array(
                    *[
                        _F.when(
                            ~_F.coalesce(_F.expr(p), _F.lit(False)),
                            _F.lit(n),
                        )
                        for n, p in rules.items()
                    ]
                )
            ),
        )
        save_manifest(
            bad, qp, commit_token=q_token, commit_props=props
        )
        # quarantined row count straight from the quarantine commit's
        # manifest — no extra count job
        q_version, q_manifest = _committed_entry_of(qp, q_token)
        n_bad = q_manifest.get("n_rows", 0)
    return {
        "version": version,
        "violations": violations,
        "rows_written": main_manifest.get("n_rows", 0),
        "rows_quarantined": n_bad,
        "quarantine_version": q_version,
    }


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    branch: str | None = None,
    props: dict | None = None,
) -> dict:
    """MERGE (upsert) into the manifest table as ONE ATOMIC SNAPSHOT,
    merge-on-read style: a single ``kind='merge'`` commit whose data
    files hold the update rows and whose recorded ``merge_keys``
    tombstone the matched pre-merge state (the tombstone keys are the
    key projection of the commit's OWN files, so no separate delete
    files exist). Matched keys are replaced, unmatched keys are
    inserted, and NO existing data file is read or rewritten. Cost is
    O(|updates|) writes + one manifest; the reconciliation happens
    lazily in :func:`read_committed`'s fold (a later compaction
    materializes it). This is the Iceberg-v2 single-snapshot
    delete-file + data-file shape — the merge economics that make CDC
    upserts tractable at 100 TB, where the copy-on-write alternative
    rewrites every file containing a matched key.

    Atomicity: the commit point is the one ``os.replace`` of the one
    manifest, so a reader pinned at any version sees exactly the
    pre-merge state or exactly the post-merge state — the
    delete-applied-but-not-yet-reinserted window of a two-commit MERGE
    cannot be observed. ``updates``' plan is evaluated exactly once
    (the write job), so non-deterministic inputs cannot diverge
    between tombstone and insert legs — both are the same rows by
    construction. ``branch`` stages the merge on a write-audit-publish
    branch; publish flips its ONE manifest atomically.

    Returns {"version", "n_updates", "n_data_files"}."""
    if not keys:
        raise ValueError("merge_upsert requires at least one key column")
    # a merge records its rows' schema as a table-schema step (it IS a
    # data commit), so validate the evolution contract BEFORE the
    # commit: an update frame missing a table column (or narrowing a
    # type) would otherwise land and poison schema discovery for every
    # subsequent reader
    current = table_schema(path)
    if current is not None:
        cur = {f.name: f.dataType for f in current.fields}
        upd = {f.name: f.dataType for f in updates.schema.fields}
        missing = set(cur) - set(upd)
        if missing:
            raise ValueError(
                f"merge_upsert update rows lack table columns "
                f"{sorted(missing)}; MERGE is whole-row — supply full "
                "rows (read-modify-write the missing columns)"
            )
        for name, pt in cur.items():
            ct = upd[name]
            if ct != pt and (
                pt.simpleString(),
                ct.simpleString(),
            ) not in _TYPE_WIDENINGS:
                raise ValueError(
                    f"merge_upsert changes {name!r} from "
                    f"{pt.simpleString()} to {ct.simpleString()}, "
                    "which is not a safe widening"
                )
    enforce_constraints(spark, path, updates, "MERGE")
    token = uuid.uuid4().hex
    opts = {
        "kind": "merge",
        "merge_keys": json.dumps(list(keys)),
        "commit_token": token,
    }
    if props is not None:
        # snapshot-summary provenance (e.g. the matview refresh range
        # — the idempotence record its exactly-once recovery reads)
        opts["commit_props"] = json.dumps(props)
    if branch is not None:
        opts["branch"] = branch
    save_manifest(updates, path, **opts)
    version, m = _committed_entry_of(path, token, branch)
    return {
        "version": version,
        "n_updates": m["n_rows"],
        "n_data_files": len(m["files"]),
    }


def update_where(
    spark: SparkSession,
    path: str,
    assignments: dict[str, str],
    predicate: str,
    branch: str | None = None,
) -> dict:
    """``UPDATE t SET col = expr, ... WHERE pred`` as ONE ATOMIC
    snapshot, compiled to the merge-on-read path: the matched rows are
    read, the assignments applied (cast back to each column's declared
    type — the standard UPDATE contract), and the result committed
    through :func:`merge_upsert` with the UNTOUCHED columns as the
    merge keys — so the one ``kind='merge'`` manifest tombstones
    exactly the matched pre-update rows and inserts their rewritten
    images. No data file is read twice or rewritten; a reader pinned
    at any version sees exactly pre- or post-update state (the
    delete-applied-but-not-reinserted window of a two-commit UPDATE
    cannot be observed), and the CDF surface shows the delete+insert
    pairs of a row-level update.

    The merge expresses the update faithfully iff tombstoning on the
    untouched projection kills ONLY matched rows — i.e. no unmatched
    row shares its untouched-column values with a matched row. That is
    checked with one aggregation BEFORE the commit; an ambiguous
    UPDATE raises (the caller can widen the SET-free identity —
    standard MERGE engines reject the analogous multi-match — or fall
    back to an explicit DELETE + INSERT pair). Duplicated matched rows
    update together and keep their multiplicity. Returns
    {"version", "n_updated", "n_data_files"}."""
    from pyspark.sql import functions as _F

    if not assignments:
        raise ValueError("UPDATE requires at least one SET assignment")
    sch = table_schema(path)
    if sch is None:
        raise ValueError(f"no recorded schema in manifest log at {path}")
    cols = [f.name for f in sch.fields]
    types = {f.name: f.dataType for f in sch.fields}
    unknown = sorted(set(assignments) - set(cols))
    if unknown:
        raise ValueError(f"UPDATE sets unknown columns: {unknown}")
    untouched = [c for c in cols if c not in assignments]
    if not untouched:
        raise ValueError(
            "UPDATE sets every column, leaving no row identity for the "
            "atomic merge; keep at least one column out of SET (or "
            "DELETE + INSERT)"
        )
    df = read_evolved(spark, path)
    # NULL predicate results are non-matches (SQL WHERE semantics) in
    # BOTH the match leg and the ambiguity probe, so they agree.
    pred = _F.coalesce(_F.expr(predicate), _F.lit(False))
    # Two-pass ambiguity probe, sized for 100 TB: pass 1 shuffles only
    # (64-bit hash of the untouched projection, match flag) — ~9 bytes
    # a row instead of the full-width tuple — and pass 2 re-checks the
    # (rare) suspect hashes EXACTLY on the real columns, so a hash
    # collision between a matched and an unmatched row can never
    # produce a spurious rejection.
    h = _F.xxhash64(*[_F.col(c) for c in untouched])
    suspects = [
        r["__h"]
        for r in (
            df.groupBy(h.alias("__h"))
            .agg(
                _F.max(pred).alias("__any_m"),
                _F.min(pred).alias("__all_m"),
            )
            .filter("__any_m AND NOT __all_m")
            .limit(101)
            .collect()
        )
    ]
    ambiguous = 0
    if suspects:
        if len(suspects) > 100:
            ambiguous = 1  # overwhelmingly real; skip the exact pass
        else:
            ambiguous = (
                df.filter(h.isin(suspects))
                .groupBy(*[_F.col(c) for c in untouched])
                .agg(
                    _F.max(pred).alias("__any_m"),
                    _F.min(pred).alias("__all_m"),
                )
                .filter("__any_m AND NOT __all_m")
                .limit(1)
                .count()
            )
    if ambiguous:
        raise ValueError(
            "ambiguous UPDATE: rows NOT matching the WHERE share their "
            f"non-updated column values {untouched} with matched rows, "
            "so the atomic merge would update them too; narrow the SET "
            "list or use DELETE + INSERT"
        )
    new_rows = df.filter(pred).select(
        *[
            _F.expr(assignments[c]).cast(types[c]).alias(c)
            if c in assignments
            else _F.col(c)
            for c in cols
        ]
    )
    r = merge_upsert(
        spark,
        path,
        new_rows,
        keys=untouched,
        branch=branch,
        props={"update_where": predicate, "update_set": dict(assignments)},
    )
    return {
        "version": r["version"],
        "n_updated": r["n_updates"],
        "n_data_files": r["n_data_files"],
    }


def plan_compaction_ranges(
    path: str,
    col: str,
    n_ranges: int = 8,
    min_files: int = 4,
    max_avg_rows: float = 100_000,
) -> list[dict]:
    """The MAINTENANCE-POLICY advisor closing the loop to
    :func:`compact_range`: bucket the live files (``table$files``
    metadata — zone maps + row counts, no data read) into
    ``n_ranges`` equal-width key ranges, score each range's file
    population, and flag the ranges whose small-file pressure
    warrants a scoped rewrite (``file_count >= min_files`` AND
    ``avg_rows < max_avg_rows`` — many files, each small). A file
    spanning several ranges counts toward each (it would be rewritten
    by any of them). Returns one dict per range: lo, hi, file_count,
    total_rows, avg_rows, needs_compaction — driver-side,
    O(#files), the planning pass a real table service (Delta's
    auto-compaction, Iceberg's maintenance jobs) runs on metadata
    before spending I/O."""
    files = [
        f
        for f in table_files(path)
        if f["col_stats"].get(col) is not None
    ]
    if not files:
        return []
    if not all(
        isinstance(b, (int, float)) and not isinstance(b, bool)
        for f in files
        for b in f["col_stats"][col]
    ):
        raise ValueError(
            f"plan_compaction_ranges needs NUMERIC zone maps on "
            f"{col!r}; string-keyed layouts need a numeric surrogate "
            "(hash bucket, date ordinal) as the range axis"
        )
    lo = min(f["col_stats"][col][0] for f in files)
    hi = max(f["col_stats"][col][1] for f in files)
    # contiguous half-open ranges (the last closed at hi): integer
    # "width-1" arithmetic would leave 1-unit gaps on FLOAT axes where
    # a file could sit in no range and never be flagged
    width = (hi - lo) / n_ranges if hi > lo else 1.0
    out = []
    for i in range(n_ranges):
        r_lo = lo + i * width
        r_hi = hi if i == n_ranges - 1 else lo + (i + 1) * width
        last = i == n_ranges - 1
        members = [
            f
            for f in files
            if not (
                f["col_stats"][col][1] < r_lo
                or (
                    f["col_stats"][col][0] > r_hi
                    if last
                    else f["col_stats"][col][0] >= r_hi
                )
            )
        ]
        rows = sum(f["n_rows"] or 0 for f in members)
        avg = rows / len(members) if members else 0.0
        out.append(
            {
                "range_lo": r_lo,
                "range_hi": r_hi,
                "file_count": len(members),
                "total_rows": rows,
                "avg_rows": avg,
                "needs_compaction": len(members) >= min_files
                and avg < max_avg_rows,
            }
        )
    return out


@dataclass
class MaintenancePolicy:
    """One declarative knob set for the table's maintenance loop —
    what Delta's auto-compaction / Iceberg's maintenance jobs encode
    as service configuration:

    - ``col``: the numeric range axis the advisor buckets on;
    - ``n_ranges`` / ``min_files`` / ``max_avg_rows``: the advisor's
      flagging thresholds (many files, each small — see
      :func:`plan_compaction_ranges`);
    - ``n_files_per_range``: rewrite width for a scoped compaction;
    - ``full_n_files``: consolidation width when a FULL compaction is
      needed (unmaterialized delete/merge tombstones block scoped
      rewrites, so the loop materializes them first);
    - ``vacuum``: expire pre-rewrite snapshots + collect orphans after
      a rewrite landed this pass;
    - ``stale_claim_ttl_s``: forwarded to vacuum's crashed-claim GC;
    - ``partition_by``: ``(col, kind[, arg])`` or a list of such
      tuples (multi-field spec) — the table's HIDDEN PARTITIONING
      layout, preserved through any full compaction this loop
      performs (otherwise the rewrite would drop the transform
      metadata and time-window pruning with it); when absent the loop
      preserves the table's DECLARED spec
      (:func:`current_partition_spec`) instead;
    - ``checkpoint``: write a LOG CHECKPOINT (:func:`checkpoint_log`)
      at the end of every non-noop pass, so read planning parses one
      bundled file + the tail instead of the whole manifest log;
    - ``matviews``: paths of MATERIALIZED VIEWS over this table
      (export/matview.py) the loop keeps fresh: each pass runs the
      CDF-incremental ``mv_refresh`` (exactly-once by the view's own
      commit-log stamps), then — when the view has accumulated at
      least ``mv_vacuum_min_tombstones`` zero-count tombstone rows —
      purges them and compacts the view's OWN manifest log, so the
      view's small-file and tombstone pressure is serviced by the
      same scheduler entry point as the base table's;
    - ``mv_vacuum_min_tombstones``: the purge threshold above.
    """

    col: str
    n_ranges: int = 8
    min_files: int = 4
    max_avg_rows: float = 100_000
    n_files_per_range: int = 4
    full_n_files: int = 16
    vacuum: bool = True
    stale_claim_ttl_s: float | None = None
    partition_by: tuple | list | None = None
    matviews: list[str] | None = None
    mv_vacuum_min_tombstones: int = 16
    checkpoint: bool = False


def _maintain_matview(
    spark: SparkSession, mv_path: str, policy: MaintenancePolicy
) -> dict:
    """One maintenance pass over a registered MATERIALIZED VIEW:
    CDF-incremental refresh (exactly-once via the view's own commit
    stamps), then tombstone purge + view-manifest compaction once the
    zero-count rows pass the policy threshold — the view's own
    small-file/tombstone pressure serviced alongside the base's.
    Lazy import: matview builds ON the sink, not the reverse."""
    from pyspark.sql import functions as _F

    from olap_project_spark.export import matview as _mv

    r = _mv.mv_refresh(spark, mv_path)
    out = {
        "path": mv_path,
        "mode": r["mode"],
        "to_version": r["to_version"],
        "tombstones_purged": 0,
        "compacted": False,
    }
    state = read_committed(spark, mv_path, table_schema(mv_path))
    n_dead = state.filter(
        _F.col(_mv._COUNT_COL) <= 0
    ).count()
    if n_dead >= policy.mv_vacuum_min_tombstones:
        _mv.mv_vacuum(spark, mv_path)
        compact_snapshots(spark, mv_path, None)
        out["tombstones_purged"] = n_dead
        out["compacted"] = True
    return out


def maintain(
    spark: SparkSession,
    path: str,
    schema,
    policy: MaintenancePolicy,
    dry_run: bool = False,
) -> dict:
    """ONE pass of the auto-maintenance loop — the promotion of the
    advise→compact chain into a single entry point a scheduler calls
    (Delta auto-compaction / Iceberg maintenance-job shape):

    0. registered MATERIALIZED VIEWS refresh first (CDF-incremental,
       exactly-once), then purge+compact past the tombstone threshold
       — before any base rewrite can truncate the CDF range;
    1. PLAN on metadata only (:func:`plan_compaction_ranges` over the
       zone maps — no data read);
    2. if tombstones (delete/merge snapshots) sit above the latest
       rewrite, a scoped rewrite is unsafe (it would resurrect rows in
       retained files), so a FULL clustered compaction materializes
       them — also resolving the flagged small-file pressure;
    3. otherwise each flagged range gets a scoped
       :func:`compact_range` (pay I/O proportional to the range);
    4. a rewrite landed this pass → :func:`vacuum_snapshots` expires
       pre-rewrite history and collects orphans (per policy).

    ``dry_run=True`` returns the same report with ZERO writes — the
    operator preview. The pass is IDEMPOTENT: a second call on a
    maintained table reports ``noop=True`` and commits nothing.

    Returns {"dry_run", "had_tombstones", "flagged_before", "actions",
    "versions_written", "vacuum", "matviews", "noop"}."""
    log = _log(path)
    # a pending column rename/drop forces the FULL compaction path
    # exactly like tombstones do: the scoped rewrite is name-keyed and
    # cannot cross eras, while the full pass collapses them. A
    # spec-only alter (partition evolution) does NOT force it — the
    # flagged ranges decide, and the full path preserves the CURRENT
    # spec when it runs.
    had_tombstones = _tombstones_since_last_rewrite(
        log
    ) or _alters_since_last_rewrite(log)
    plan = plan_compaction_ranges(
        path,
        policy.col,
        n_ranges=policy.n_ranges,
        min_files=policy.min_files,
        max_avg_rows=policy.max_avg_rows,
    )
    flagged = [r for r in plan if r["needs_compaction"]]
    report: dict = {
        "dry_run": dry_run,
        "had_tombstones": had_tombstones,
        "flagged_before": len(flagged),
        "actions": [],
        "versions_written": [],
        "vacuum": None,
        "matviews": [],
        "noop": not flagged and not had_tombstones,
    }
    # registered materialized views refresh BEFORE any base rewrite —
    # the CDF is consumed while the unrefreshed range is still
    # rewrite-free, so the refresh stays O(|changes|) incremental
    # instead of falling back to a full recompute (the run-the-CDF-
    # before-compacting rule, automated)
    if not dry_run:
        for mv_path in policy.matviews or []:
            r = _maintain_matview(spark, mv_path, policy)
            report["matviews"].append(r)
            if r["mode"] != "noop" or r["compacted"]:
                report["noop"] = False
                report["actions"].append(f"matview[{mv_path}]")
    if dry_run or (not flagged and not had_tombstones):
        return report
    if had_tombstones:
        # materialize tombstones + consolidate in ONE clustered
        # rewrite; the sort also turns the zone maps on the policy
        # axis from "present" into "selective". A declared hidden-
        # partitioning layout takes precedence as the rewrite axis so
        # the loop never strips the table's transform metadata — the
        # policy's declared layout first, else the table's CURRENT
        # spec (set_partition_spec / latest partitioned write), so a
        # maintenance pass after a spec evolution collapses the spec
        # eras under the NEW spec rather than silently dropping it.
        pby = policy.partition_by
        if pby is None:
            cur = current_partition_spec(path)
            if cur is not None:
                pby = [
                    (s["col"], s["kind"], s["arg"])
                    if s.get("arg") is not None
                    else (s["col"], s["kind"])
                    for s in cur
                ]
        v = compact_snapshots(
            spark,
            path,
            schema,
            cluster_by=None if pby else [policy.col],
            partition_by=pby,
            n_files=policy.full_n_files,
        )
        report["actions"].append("full_compact")
        report["versions_written"].append(v)
    else:
        for r in flagged:
            res = compact_range(
                spark,
                path,
                schema,
                policy.col,
                r["range_lo"],
                r["range_hi"],
                n_files=policy.n_files_per_range,
            )
            if res["n_rewritten"]:
                report["actions"].append(
                    f"compact_range[{r['range_lo']}, {r['range_hi']}]"
                )
                report["versions_written"].append(res["version"])
    if policy.vacuum and report["versions_written"]:
        report["vacuum"] = vacuum_snapshots(
            path, stale_claim_ttl_s=policy.stale_claim_ttl_s
        )
        report["actions"].append("vacuum")
    if policy.checkpoint:
        ck = checkpoint_log(path)
        if ck["version"] is not None:
            report["actions"].append(f"checkpoint@{ck['version']}")
        report["checkpoint"] = ck
    return report


def _effective(
    entries: list[tuple[int, dict]],
) -> list[tuple[int, dict]]:
    """Expand RESTORE snapshots into the log they denote. A
    ``kind='restore'`` manifest (written by :func:`restore_table`)
    carries no files; its meaning is "the table state becomes exactly
    what it was as of ``restore_as_of``" — so the effective log up to
    and including a restore is the (recursively expanded) prefix of
    the ORIGINAL log at/<= the target version, and later commits
    append on top of that. Expansion keeps versions ascending (the
    restored prefix's versions all precede the restore's own), so
    every fold downstream — read_committed's tombstone fold, zone-map
    pruning, table_files, schema resolution — consumes restore-free
    logs unchanged. O(n · #restores) over driver-side JSON dicts;
    restores are rare maintenance events."""
    out: list[tuple[int, dict]] = []
    for i, (version, m) in enumerate(entries):
        if m.get("kind") == "restore":
            target = int(m["restore_as_of"])
            out = _effective(
                [(v, pm) for v, pm in entries[:i] if v <= target]
            )
        else:
            out.append((version, m))
    return out


def _log(
    path: str,
    as_of: int | None = None,
    branch: str | None = None,
    raw: bool = False,
) -> list[tuple[int, dict]]:
    """(version, parsed manifest) in commit order at/<= the requested
    version; in-flight commits (claimed but unwritten version files)
    are skipped — the read path's standing contract. Branch-tagged
    commits (write-audit-publish staging) are invisible to main
    readers (``branch=None``); a branch reader sees main PLUS its own
    branch's commits, Iceberg-branch-from-main-head style.

    By default the log is the EFFECTIVE log — RESTORE snapshots are
    expanded into the state they denote (:func:`_effective`), so every
    state-folding consumer (reads, pruning, schema, compaction
    planning) sees only append/rewrite/delete/merge kinds.
    ``raw=True`` returns the physical log instead — the axis vacuum,
    branch publish/abandon, version listings, history, and the
    file-level CDF paths operate on (those either manage the manifest
    files themselves or must keep referencing pre-restore entries).

    Parsing is served by the fingerprint-validated process cache
    (:func:`_scan_log`): a call costs one stat pass over the log
    directory, not a re-parse of the checkpoint bundle + tail."""
    out: list[tuple[int, dict]] = []
    for version, _entry, m in _scan_log(path):
        if m is None:
            continue  # in-flight claim / corrupt file: not readable
        if as_of is not None and version > as_of:
            continue
        tag = m.get("branch")
        if tag is not None and tag != branch:
            continue
        out.append((version, m))
    return out if raw else _effective(out)


def commit_rows(path: str, version: int, branch: str | None = None) -> int:
    """Row count recorded by the commit at ``version`` — read from the
    manifest metadata (driver-side, served by the log cache), zero
    Spark actions. The scale-honest way for a write API's caller to
    report "rows written": re-running the write's SELECT to count it
    is a full second scan at 100 TB (guide §1.2)."""
    for v, m in _log(path, branch=branch, raw=True):
        if v == version:
            return int(m.get("n_rows", 0))
    raise ValueError(f"no commit at version {version} in {path}")


def _checkpoint_names(path: str) -> list[str]:
    """Every LOG CHECKPOINT filename in the table directory, newest
    (highest bundled version) first."""
    names: list[tuple[int, str]] = []
    if not os.path.isdir(path):
        return []
    for entry in os.listdir(path):
        if entry.startswith("_logcheckpoint-") and entry.endswith(".json"):
            stem = entry[len("_logcheckpoint-") : -len(".json")]
            if stem.isdigit():
                names.append((int(stem), entry))
    names.sort(reverse=True)
    return [n for _v, n in names]


def _latest_checkpoint(path: str) -> dict[int, dict]:
    """The newest readable LOG CHECKPOINT's bundled entries
    ({version: manifest}), or {} — the pure PARSE CACHE behind
    :func:`checkpoint_log`. A version absent from the bundle (a
    branch-staged commit, an in-flight claim that landed after the
    checkpoint, anything newer) simply falls back to its own file, so
    a checkpoint can never change WHAT is read — only how many files
    the driver must open to read it.

    Checkpoints are tried NEWEST-FIRST: a checkpoint that vanishes
    between the listing and the open (a racing writer retired it) or
    fails to parse (corrupt, half-written) degrades to the NEXT newest
    bundle — because :func:`checkpoint_log` retains the previous
    generation (``keep=2``), a reader racing one full churn cycle
    still plans from a bundle instead of forfeiting to a per-file
    parse of the whole log. Only when every checkpoint fails does the
    cache degrade to empty."""
    for name in _checkpoint_names(path):
        try:
            with open(os.path.join(path, name)) as f:
                bundle = json.load(f)
            return {int(v): m for v, m in bundle["entries"].items()}
        except (json.JSONDecodeError, OSError, KeyError, ValueError):
            continue  # racing retirement / corrupt: try the previous
    return {}  # no readable cache: parse the files instead


def checkpoint_log(path: str, keep: int = 2) -> dict:
    """Write a LOG CHECKPOINT — the Delta ``_last_checkpoint`` /
    Iceberg metadata-file mechanism for the manifest table: ONE JSON
    file bundling every parseable MAIN manifest of the STABLE PREFIX
    (at or below the lowest in-flight claim, so a claimed-but-unwritten
    commit that lands later is never frozen out). Read planning then
    parses 1 checkpoint + the tail instead of the whole log — at a
    100-TB table's commit cadence (thousands of manifests between
    compactions) this turns every driver-side plan from O(#manifests)
    file opens into O(#manifests-since-checkpoint) + 1.

    The checkpoint is a CACHE, not a truth: readers still LIST the
    physical manifests (vacuum-expired versions never resurrect) and
    fall back to per-file parsing for any version the bundle lacks —
    branch-staged commits (excluded by construction; they may mutate
    at publish), late-landing in-flight claims, and everything newer.
    Idempotent: re-checkpointing at the same stable head is a no-op.

    Retention (``keep``, default 2): the newest ``keep`` generations
    survive a churn — a reader that LISTED the directory just before
    this call retired the old bundle would otherwise open a vanished
    file and forfeit the optimization (correct but O(log) parses);
    keeping the previous generation closes that race for any reader at
    most one churn behind. Older generations are retired here and by
    :func:`vacuum_snapshots` (which keeps only the newest — vacuum is
    a maintenance window by contract).

    Returns {"version": k, "bundled": n} (or {"version": None} when
    there is nothing new to checkpoint)."""
    files, parsed = _parse_all(path)
    in_flight = _VERSION_CLAIMER.in_flight_versions(path)
    head = max(parsed, default=0)
    k = min(in_flight) - 1 if in_flight else head
    k = min(k, head)
    if k <= 0:
        return {"version": None, "bundled": 0}
    existing = _latest_checkpoint(path)
    entries = {
        v: m
        for v, m in parsed.items()
        if v <= k and m.get("branch") is None
    }
    if existing and max(existing, default=0) >= max(entries, default=0):
        return {"version": None, "bundled": len(existing)}
    tmp = os.path.join(path, f"._ckpt-{uuid.uuid4().hex}.tmp")
    final = os.path.join(path, f"_logcheckpoint-{k:06d}.json")
    with open(tmp, "w") as f:
        json.dump({"version": k, "entries": entries}, f)
    os.replace(tmp, final)  # atomic: readers see old or new cache
    # retire superseded caches beyond the newest `keep` generations —
    # the survivors cover readers that listed before this churn
    for entry in _checkpoint_names(path)[max(keep, 1) :]:
        try:
            os.remove(os.path.join(path, entry))
        except OSError:
            pass  # a racing reader may hold it; next pass retries
    return {"version": k, "bundled": len(entries)}


def _last_rewrite_index(log: list[tuple[int, dict]]) -> int:
    """Index of the latest rewrite snapshot in the log, or -1. A
    rewrite holds the CONSOLIDATED table state: everything below it is
    history the live file set no longer reflects, so state-sensitive
    checks (naming eras, unmaterialized tombstones) scope to the
    entries ABOVE it."""
    last_rw = -1
    for i, (_v, m) in enumerate(log):
        if m.get("kind", "append") == "rewrite":
            last_rw = i
    return last_rw


def _alters_since_last_rewrite(log: list[tuple[int, dict]]) -> bool:
    """True when a column RENAME/DROP (``kind='alter'`` with a rename
    map or drop list) sits ABOVE the latest rewrite — i.e. the live
    file set still spans naming eras. Alters below a rewrite are
    history: compaction rewrote every live file under the current
    names, so name-keyed surfaces answer exactly again. Alters that
    change no names — partition-spec evolution commits — never create
    naming eras and are not counted."""
    return any(
        m.get("kind") == "alter"
        and (m.get("rename") or m.get("drop"))
        for _v, m in log[_last_rewrite_index(log) + 1 :]
    )


def _tombstones_since_last_rewrite(log: list[tuple[int, dict]]) -> bool:
    """True when an UNMATERIALIZED delete/merge tombstone sits above
    the latest rewrite. Tombstones below a rewrite are already folded
    into the consolidated files (compaction materializes them), so
    surfaces that cannot apply row-level tombstones — metadata
    aggregates, table$partitions, the era read — must reject only the
    ones above; rejecting on ANY historical tombstone would wedge
    those surfaces forever (old manifests persist until snapshot
    expiry, so 'compact first' would never clear the condition)."""
    return any(
        m.get("kind", "append") in ("delete", "merge")
        for _v, m in log[_last_rewrite_index(log) + 1 :]
    )


def _field_id_history(
    log: list[tuple[int, dict]],
) -> tuple[list[dict[str, int] | None], dict[str, int], bool]:
    """Derive per-column FIELD IDs from the manifest log — the Delta
    column-mapping / Iceberg field-ID mechanism, computed as a PURE
    FUNCTION of the log instead of stored state: every column is
    assigned a stable integer id at its BIRTH (first appearance in a
    data manifest's recorded schema, ids issued in log order and never
    reused), renames carry the id to the new name, drops retire it.
    Because the log already records each manifest's write schema and
    each alter's rename/drop, the derivation is deterministic,
    race-free (no writer coordination needed), and applies
    RETROACTIVELY to every existing table.

    Returns ``(per_index, current, ok)``:

    - ``per_index[i]`` maps the WRITE-ERA column names of ``log[i]``'s
      files to their field ids (for delete manifests: the tombstone
      key names; ``None`` when the manifest records no schema);
    - ``current`` maps the CURRENT names to ids;
    - ``ok`` is False when a file-bearing manifest records no schema
      (legacy log) — name-keyed surfaces then keep their strict
      reject-on-rename behavior.

    A name dropped and later re-used gets a NEW id, so the two
    generations never alias: a stats probe for the new generation
    finds NO id match in pre-drop manifests and conservatively treats
    those files as predating the column — which they do."""
    mapping: dict[str, int] = {}
    next_id = 1
    per_index: list[dict[str, int] | None] = []
    ok = True
    for _v, m in log:
        kind = m.get("kind", "append")
        sch = m.get("schema")
        if kind == "alter":
            for d in m.get("drop", []):
                mapping.pop(d, None)
            ren = m.get("rename", {})
            mapping = {ren.get(n, n): i for n, i in mapping.items()}
            for a in m.get("add", []):
                if a not in mapping:
                    mapping[a] = next_id
                    next_id += 1
            per_index.append(dict(mapping))
            continue
        if kind == "delete":
            if sch is None:
                per_index.append(None)
                if m.get("files"):
                    ok = False
                continue
            keys = [f["name"] for f in sch["fields"]]
            per_index.append(
                {n: mapping[n] for n in keys if n in mapping}
            )
            continue
        if sch is None:
            per_index.append(None)
            if m.get("files"):
                ok = False
            continue
        names = [f["name"] for f in sch["fields"]]
        for n in names:
            if n not in mapping:
                mapping[n] = next_id
                next_id += 1
        per_index.append({n: mapping[n] for n in names})
    return per_index, mapping, ok


def _retired_since_last_rewrite(log: list[tuple[int, dict]]) -> set[str]:
    """Column names DROPPED by an alter above the latest rewrite.
    These names are radioactive until a compaction rewrites the live
    files without them: pre-drop files still hold the retired
    generation's bytes AND its name-keyed zone maps/blooms, so a new
    column re-using the name (by append — guarded at schema
    discovery — or by rename, guarded in :func:`rename_column`) would
    make era reads and pruning probes serve the wrong generation."""
    out: set[str] = set()
    for _v, m in log[_last_rewrite_index(log) + 1 :]:
        if m.get("kind") == "alter":
            out |= set(m.get("drop", []))
    return out


def _committed_files(
    path: str, as_of: int | None = None, branch: str | None = None
) -> list[tuple[str, dict]]:
    """(file_name, zone-map stats) for every committed DATA file at/<=
    the requested version, honoring rewrite snapshots (a rewrite
    replaces everything before it — it holds the consolidated table
    state). Delete manifests list tombstone files, not data — they are
    excluded here; tombstone application happens in
    :func:`read_committed`'s fold. MERGE manifests' files ARE data
    (the update rows) and are included; their tombstone side is a key
    projection applied in the same fold."""
    committed: list[tuple[str, dict]] = []
    for _version, m in _log(path, as_of, branch):
        if m.get("kind", "append") == "delete":
            continue
        fs = m.get("file_stats", {})
        entries = [(name, fs.get(name, {})) for name in m["files"]]
        if m.get("kind", "append") == "rewrite":
            committed = entries
        else:
            committed += entries
    return committed


def plan_pruned_files(
    path: str, col: str, lo, hi, as_of: int | None = None
) -> tuple[list[str], int]:
    """Data skipping against the manifest metadata: return (files that
    may contain rows with ``col`` in [lo, hi], total committed files).
    A file is skipped ONLY when provably excluded, by EITHER index:

    - its zone map — the recorded raw [min, max] misses the range;
    - its HIDDEN-PARTITION range — when the committing manifest
      records a partition transform ON THIS COLUMN, the query range
      maps into transform space ([T(lo), T(hi)] for the monotone
      kinds; bucket handles equality probes only) and is checked
      against the file's recorded transform range. This is what
      prunes TIMESTAMP predicates: zone maps track only
      int/float/string, so a month/days-partitioned fact prunes by
      time through the transform with no materialized date column.

    Files without either record (nulls seen, complex type, pre-stats
    manifests) are conservatively kept — skipping is an optimization,
    never a correctness gamble. The one unconditional exclusion:
    files whose manifest records ZERO rows (empty partitions of a
    range-partitioned write) provably contain nothing."""
    live: dict[str, tuple] = {}
    for _version, m in _log(path, as_of):
        kind = m.get("kind", "append")
        if kind == "delete":
            continue
        fs = m.get("file_stats", {})
        rows = m.get("file_rows", {})
        specs = _specs_of(m)
        # (index into the spec list, spec) for the transforms ON this
        # column — multi-field specs carry one range per field
        matching = [
            (i, s) for i, s in enumerate(specs) if s.get("col") == col
        ]
        fparts = m.get("file_partitions", {}) if matching else {}
        entries = {
            name: (
                fs.get(name, {}),
                matching,
                len(specs),
                fparts.get(name),
                rows.get(name),
            )
            for name in m["files"]
        }
        if kind == "rewrite":
            live = entries
        else:
            live.update(entries)
    keep = []
    for name in sorted(live):
        st, matching, n_specs, pval, n_rows = live[name]
        if n_rows == 0:
            continue  # recorded empty: provably nothing to read
        rng = (st or {}).get(col)
        excluded = rng is not None and (hi < rng[0] or lo > rng[1])
        if not excluded and matching and pval is not None:
            ranges = _ranges_of(pval, n_specs)
            for i, spec in matching:
                prng = ranges[i]
                if prng is None:
                    continue
                try:
                    tlo = _transform_scalar(spec, lo)
                    thi = _transform_scalar(spec, hi)
                except (TypeError, ValueError, AttributeError):
                    continue  # untransformable bound: no pruning here
                if spec["kind"] == "bucket":
                    # bucket is not monotone — equality probes only
                    if lo == hi and not (prng[0] <= tlo <= prng[1]):
                        excluded = True
                elif thi < prng[0] or tlo > prng[1]:
                    excluded = True
                if excluded:
                    break
        if not excluded:
            keep.append(name)
    return sorted(keep), len(live)


def plan_bloom_pruned_files(
    path: str, col: str, value: int, as_of: int | None = None
) -> tuple[list[str], int]:
    """Point-lookup data skipping against the per-file BLOOM filters:
    (files that MIGHT contain ``col == value``, total committed files).
    A file is skipped only when its bloom provably excludes the value
    (all k positions unset) — no false negatives by construction; files
    without a bloom for ``col`` (written before the option, or a
    different bloom column) are conservatively kept. The complement to
    :func:`plan_pruned_files`: zone maps prune RANGE predicates on
    clustered columns; blooms prune EQUALITY probes on columns whose
    per-file [min,max] spans everything."""
    want = _bloom_positions(int(value))
    keep: list[str] = []
    total = 0
    for _version, m in _log(path, as_of):
        if m.get("kind", "append") == "delete":
            continue
        blooms = m.get("file_blooms", {}) if m.get("bloom_col") == col else {}
        entries = []
        for name in m["files"]:
            bits = blooms.get(name)
            if bits is None or all(p in set(bits) for p in want):
                entries.append(name)
        if m.get("kind", "append") == "rewrite":
            keep, total = entries, len(m["files"])
        else:
            keep += entries
            total += len(m["files"])
    return sorted(keep), total


def plan_token_pruned_files(
    path: str, col: str, token: str, as_of: int | None = None
) -> tuple[list[str], int]:
    """Keyword-search data skipping against the per-file TOKEN blooms:
    (files that MIGHT contain the word ``token`` in text column
    ``col``, total committed files). The probe token passes through
    the same normalization the writer applied (lowercase; it must be a
    single TOKEN_SPLIT_RE token). A file is skipped only when its
    token bloom provably excludes the word — no false negatives by
    construction; files without a token bloom for ``col`` are
    conservatively kept. This is the pruning class neither zone maps
    (whole-string min/max) nor the integer bloom can serve: "which
    files of a 100-TB document corpus contain the word W" becomes a
    driver-side bitmap probe, with only the surviving files scanned."""
    token = token.lower()
    import re as _re

    if not token or _re.search(TOKEN_SPLIT_RE, token):
        raise ValueError(
            f"probe {token!r} is not a single token under "
            f"TOKEN_SPLIT_RE ({TOKEN_SPLIT_RE})"
        )
    th = _token_hash(token)
    keep: list[str] = []
    total = 0
    for _version, m in _log(path, as_of):
        if m.get("kind", "append") == "delete":
            continue
        blooms = (
            m.get("file_token_blooms", {})
            if m.get("token_bloom_col") == col
            else {}
        )
        entries = []
        for name in m["files"]:
            packed = blooms.get(name)
            if packed is None or _token_bloom_hit(packed, th):
                entries.append(name)
        if m.get("kind", "append") == "rewrite":
            keep, total = entries, len(m["files"])
        else:
            keep += entries
            total += len(m["files"])
    return sorted(keep), total


def read_token_search(
    spark: SparkSession, path: str, schema, col: str, token: str
) -> DataFrame:
    """Keyword search over the manifest table: token-bloom pruning
    (:func:`plan_token_pruned_files`) + the EXACT residual filter —
    ``array_contains`` over the same lowercase/TOKEN_SPLIT_RE
    tokenization the writer indexed, so the result equals a full scan
    with the filter, having opened only the surviving files."""
    from pyspark.sql import functions as _F

    keep, _total = plan_token_pruned_files(path, col, token)
    df = read_committed(spark, path, schema, _keep=set(keep))
    return df.filter(
        _F.array_contains(
            _F.split(_F.lower(_F.col(col)), TOKEN_SPLIT_RE),
            token.lower(),
        )
    )


def plan_token_pruned_files_all(
    path: str, col: str, tokens: list[str], as_of: int | None = None
) -> tuple[list[str], int]:
    """MULTI-TOKEN keyword-search data skipping: files that MIGHT
    contain EVERY word of ``tokens`` in text column ``col``. AND is
    free at the driver — a file survives only when every token hits
    its bloom, i.e. the per-token surviving file sets intersect as a
    bitmap operation, in ONE pass over the manifest log (not one pass
    per token). Files without a token bloom are conservatively kept;
    no false negatives by construction, so the exact residual filter
    on top equals a full scan having opened only the intersection.

    Scale: "which files of a 100-TB corpus contain w1 AND w2 AND w3"
    costs O(#manifests + #files·#tokens) driver-side integer probes —
    and the selectivities MULTIPLY, so each extra token shrinks the
    scan geometrically."""
    import re as _re

    if not tokens:
        raise ValueError("need at least one probe token")
    norm = [t.lower() for t in tokens]
    for t in norm:
        if not t or _re.search(TOKEN_SPLIT_RE, t):
            raise ValueError(
                f"probe {t!r} is not a single token under "
                f"TOKEN_SPLIT_RE ({TOKEN_SPLIT_RE})"
            )
    hashes = [_token_hash(t) for t in norm]
    keep: list[str] = []
    total = 0
    for _version, m in _log(path, as_of):
        if m.get("kind", "append") == "delete":
            continue
        blooms = (
            m.get("file_token_blooms", {})
            if m.get("token_bloom_col") == col
            else {}
        )
        entries = []
        for name in m["files"]:
            packed = blooms.get(name)
            if packed is None or all(
                _token_bloom_hit(packed, th) for th in hashes
            ):
                entries.append(name)
        if m.get("kind", "append") == "rewrite":
            keep, total = entries, len(m["files"])
        else:
            keep += entries
            total += len(m["files"])
    return sorted(keep), total


def read_token_search_all(
    spark: SparkSession,
    path: str,
    col: str,
    tokens: list[str],
    phrase: bool = False,
    as_of: int | None = None,
) -> DataFrame:
    """Multi-token keyword search over the manifest table, routed
    through the PUBLIC batch reader so the bloom pruning shows up as
    INPUT-PARTITION pruning (``df.rdd.getNumPartitions()`` equals the
    surviving non-empty file count): token-bloom AND-intersection
    (:func:`plan_token_pruned_files_all`) shrinks the file list via
    the reader's ``keepFiles`` option, then the EXACT residual filter
    reproduces the full-scan answer —

    - ``phrase=False``: the document's token array (same
      lowercase/TOKEN_SPLIT_RE tokenization the writer indexed)
      contains EVERY probe token, in any order;
    - ``phrase=True``: the tokens appear CONSECUTIVELY in probe
      order — checked on the space-joined token string with sentinel
      spaces, so it is exact w.r.t. the tokenization (a phrase is an
      AND plus an adjacency residual; the bloom prune set is
      identical).

    Tombstones still apply (the reader attaches them per surviving
    file); pruning never skips a tombstone application."""
    from pyspark.sql import functions as _F

    keep, _total = plan_token_pruned_files_all(path, col, tokens, as_of)
    fmt = ensure_manifest_sink(spark)
    reader = (
        spark.read.format(fmt)
        .option("path", path)
        .option("keepFiles", json.dumps(keep))
    )
    if as_of is not None:
        reader = reader.option("versionAsOf", str(as_of))
    df = reader.load()
    toks = _F.split(_F.lower(_F.col(col)), TOKEN_SPLIT_RE)
    if phrase:
        joined = _F.concat(
            _F.lit(" "), _F.array_join(toks, " "), _F.lit(" ")
        )
        needle = " " + " ".join(t.lower() for t in tokens) + " "
        return df.filter(joined.contains(needle))
    cond = None
    for t in tokens:
        c = _F.array_contains(toks, t.lower())
        cond = c if cond is None else (cond & c)
    return df.filter(cond)


def table_history(path: str) -> list[dict]:
    """DESCRIBE HISTORY for the manifest table: one dict per committed
    snapshot — version, kind (append/rewrite), file count, row count,
    and whether it recorded a schema. Driver-side, served from the
    fingerprint-validated parse cache (:func:`_scan_log`)."""
    out = []
    for version, _entry, m in _scan_log(path):
        if m is None:
            continue
        out.append(
            {
                "version": version,
                "kind": m.get("kind", "append"),
                "n_files": len(m["files"]),
                "n_rows": m.get("n_rows"),
                "has_schema": "schema" in m,
                "props": m.get("props"),
            }
        )
    return out


def version_at_timestamp(path: str, ts) -> int:
    """Resolve a wall-clock instant to the snapshot version current AT
    that instant — the latest committed version whose commit time is
    at or before ``ts`` — enabling ``FOR TIMESTAMP AS OF`` /
    BigQuery-style ``FOR SYSTEM_TIME AS OF`` reads (the reference's
    warehouse time-travel verb, bigquery_update_scheduler.py:255-260,
    re-expressed over the manifest log). Commit time is the manifest
    file's modification time — the same mechanism Delta's
    ``timestampAsOf`` uses (commit-file modification timestamps) — so
    it applies retroactively to every existing table with no manifest
    format change. ``ts`` is epoch seconds or an ISO-8601 string
    (naive strings are UTC — the engine's wall-clock convention).
    Raises when the table has no commit at or before ``ts``."""
    if isinstance(ts, str):
        from datetime import datetime, timezone

        dt = datetime.fromisoformat(ts)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        epoch = dt.timestamp()
    else:
        epoch = float(ts)
    best = None
    for version, entry, m in _scan_log(path):
        if m is None or m.get("branch") is not None:
            continue  # in-flight, corrupt, or staged: not main-visible
        try:
            mtime = os.path.getmtime(os.path.join(path, entry))
        except OSError:
            continue  # racing vacuum
        if mtime <= epoch and (best is None or version > best):
            best = version
    if best is None:
        raise ValueError(
            f"no snapshot of {path} is as old as {ts!r}; the earliest "
            "commit is newer (or the table is empty)"
        )
    return best


def table_files(
    path: str, as_of: int | None = None, branch: str | None = None
) -> list[dict]:
    """The ``table$files`` metadata surface (Iceberg's files table /
    Delta's DESCRIBE DETAIL file list): one dict per LIVE data file at
    the requested version — committing version, file name, row count
    (when the manifest recorded it), and the zone-map stats. Rewrites
    supersede earlier files exactly as the read path sees them; delete
    manifests' tombstone files are metadata, not data, and are
    excluded. Driver-side, O(#manifests)."""
    live: list[dict] = []
    for version, m in _log(path, as_of, branch):
        kind = m.get("kind", "append")
        if kind == "delete":
            continue
        rows = m.get("file_rows", {})
        stats = m.get("file_stats", {})
        entries = [
            {
                "version": version,
                "file_name": name,
                "n_rows": rows.get(name),
                "col_stats": stats.get(name, {}),
            }
            for name in m["files"]
        ]
        if kind == "rewrite":
            live = entries
        else:
            live += entries
    return live


def table_partitions(
    path: str,
    as_of: int | None = None,
    branch: str | None = None,
    strict: bool = True,
) -> dict:
    """The ``table$partitions`` METADATA TABLE (Iceberg's partitions
    table): exact per-partition file and row counts for a
    hidden-partitioned table, computed ENTIRELY from the manifest
    log — zero data files opened, zero scans. The writer records each
    file's per-partition-tuple row histogram
    (``file_partition_rows``, capped at PART_VALUES_CAP tuples per
    file); this folds them over the live file set exactly as the read
    path would (rewrites supersede, deletes excluded).

    Returns {"spec": <the latest transform spec list>, "partitions":
    [{"partition": [v, ...], "n_rows", "n_files"}, ...] sorted by
    partition tuple, "unaccounted_files": k} where ``k`` counts live
    files WITHOUT value-level stats (written before the feature,
    recorded under an older spec, past the tuple cap, or null-bearing).
    ``strict=True`` (default) raises when k > 0 — partial metadata
    must never masquerade as exact counts; ``strict=False`` returns
    the accounted subset plus the honest remainder count.

    A file is counted toward a partition only when its histogram was
    recorded under the CURRENT spec — spec evolution invalidates older
    histograms for this surface (they describe different tuples), the
    same rule compact_range applies to carried ranges. Spec identity
    is by FIELD ID (:func:`_field_id_history`), so RENAMING the
    transform's source column does not invalidate histograms — the
    surface answers exactly across renames, and the returned ``spec``
    shows the CURRENT column names.

    Scale: driver-side O(#manifests + #files·#tuples-per-file) JSON
    work; answering "how many rows landed in yesterday's partition"
    on a 100-TB fact costs no cluster time at all. DELETE/MERGE
    tombstones are NOT folded here (they are row-level, file counts
    are physical) — tables with unmaterialized tombstones ABOVE the
    latest rewrite are rejected so the counts can never silently
    overstate (compact first); tombstones a rewrite already
    materialized don't block.

    Reference analogue: the reference answers this by listing HDFS
    partition directories and counting (bigquery_update_scheduler.py:
    163-231); here it is a catalog lookup."""
    log = _log(path, as_of, branch)
    if _tombstones_since_last_rewrite(log):
        raise ValueError(
            "table$partitions requires materialized state: the log "
            "holds unmaterialized delete/merge tombstones that row "
            "counts cannot reflect — compact first"
        )
    renamed = _alters_since_last_rewrite(log)
    per_index, current_ids, fid_ok = _field_id_history(log)
    if renamed and not fid_ok:
        raise ValueError(
            "table$partitions cannot answer across a column rename on "
            "this log: a file-bearing manifest records no schema, so "
            "field ids cannot be derived — compact to collapse the "
            "eras first"
        )

    def canon(sp, idx: int):
        """Spec identity by FIELD ID: a spec on a column keeps its
        identity across renames of that column (the histograms it
        produced describe the same physical tuples), while a spec
        naming a dropped-and-reused name does NOT match the new
        generation. None when any spec column is untranslatable."""
        specs = sp if isinstance(sp, list) else [sp]
        pi = per_index[idx] if fid_ok else None
        out = []
        for s in specs:
            key = (
                pi.get(s["col"])
                if pi is not None
                else s["col"]  # legacy identity (never-renamed)
            )
            if key is None:
                return None
            out.append((key, s.get("kind"), s.get("arg")))
        return tuple(out)

    live: dict[str, tuple] = {}
    spec_latest = None
    spec_latest_canon = None
    for idx, (_version, m) in enumerate(log):
        if m.get("kind", "append") == "delete":
            continue  # materialized tombstone files are not data
        if m.get("kind") == "alter" and "partition_spec" in m:
            # spec evolution: the DECLARED spec becomes the reference;
            # files written under older specs report as unaccounted
            sp2 = m["partition_spec"]
            spec_latest = sp2
            spec_latest_canon = (
                canon(sp2, idx) if sp2 is not None else None
            )
            continue
        sp = m.get("partition_transform")
        spc = canon(sp, idx) if sp is not None else None
        pr = m.get("file_partition_rows", {})
        fr = m.get("file_rows", {})
        entries = {f: (spc, pr.get(f), fr.get(f)) for f in m["files"]}
        if m.get("kind", "append") == "rewrite":
            live = entries
        else:
            live.update(entries)
        if sp is not None:
            spec_latest, spec_latest_canon = sp, spc
    if spec_latest is None:
        raise ValueError(
            f"table at {path} records no partition transform spec"
        )
    agg: dict[tuple, list] = {}
    unaccounted = 0
    for _name, (spc, prows, n_rows) in live.items():
        if n_rows == 0:
            continue  # an empty file is exactly accounted: no rows
        if spc is None or spc != spec_latest_canon or prows is None:
            unaccounted += 1
            continue
        for t, c in prows:
            key = tuple(t)
            slot = agg.setdefault(key, [0, 0])
            slot[0] += c
            slot[1] += 1
    if strict and unaccounted:
        raise ValueError(
            f"{unaccounted} live file(s) carry no value-level "
            "partition stats under the current spec; pass "
            "strict=False for the accounted subset or compact to "
            "refresh the histograms"
        )
    # report the spec under CURRENT column names (the recorded one may
    # carry a pre-rename name)
    if fid_ok:
        id_to_cur = {i: n for n, i in current_ids.items()}
        shown = []
        for s, (key, _k, _a) in zip(
            spec_latest
            if isinstance(spec_latest, list)
            else [spec_latest],
            spec_latest_canon or (),
        ):
            s = dict(s)
            if isinstance(key, int) and key in id_to_cur:
                s["col"] = id_to_cur[key]
            shown.append(s)
        if not shown:
            spec_shown = spec_latest  # canon-untranslatable: as recorded
        elif isinstance(spec_latest, list):
            spec_shown = shown
        else:
            spec_shown = shown[0]
    else:
        spec_shown = spec_latest
    return {
        "spec": spec_shown,
        "partitions": [
            {"partition": list(k), "n_rows": v[0], "n_files": v[1]}
            for k, v in sorted(agg.items())
        ],
        "unaccounted_files": unaccounted,
    }


def metadata_aggregate(
    path: str,
    cols: list[str] | None = None,
    minmax_cols: list[str] | None = None,
    as_of: int | None = None,
    branch: str | None = None,
) -> dict:
    """METADATA-ONLY AGGREGATES — answer ``COUNT(*)``, per-column
    ``MIN``/``MAX``, and ``COUNT(col)``/null counts ENTIRELY from the
    manifest log (the Iceberg/Spark metadata-query optimization):
    row counts fold from ``file_rows``, null counts from
    ``file_nulls``, and min/max from the zone maps — which are EXACT
    per-file extremes computed from the data at write time, so their
    fold is the exact table extreme, not an estimate. Zero data files
    opened; "SELECT COUNT(*), MIN(k), MAX(k) FROM a 100-TB table"
    costs O(#manifests) driver-side JSON work.

    STRICT by construction — an answer is returned only when it is
    provably exact, else ValueError:

    - UNMATERIALIZED delete/merge tombstones (above the latest
      rewrite) → rejected (row-level removals are invisible to
      file-level metadata; compact first — tombstones below a rewrite
      are already folded into the consolidated files and don't
      block);
    - a live file without a recorded row count (pre-columnar legacy)
      → rejected;
    - MIN/MAX (columns listed in ``minmax_cols``) → every live file
      holding at least one non-null value of the column must carry a
      zone map; a file that saw nulls (the zone map disables on the
      first null) or predates the column makes min/max unanswerable —
      ask for such columns via ``cols`` (counts only) instead. None
      min/max is returned ONLY in the all-null case, which is exact;
    - null counts for a column → every live file must carry a
      ``file_nulls`` record; a post-evolution reader counts a file
      that PREDATES the column as all-null for it — exactly what the
      null-backfill read contract produces.

    RENAMED tables answer EXACTLY without compaction: every probe
    translates current name → FIELD ID → the file's write-era name
    (:func:`_field_id_history` derives stable per-column ids from the
    log itself), so pre-rename files' name-keyed stats keep serving
    the column under its new name, and a dropped-then-reused name
    never reads the retired generation's stats (the reuse gets a new
    id). Only legacy logs whose file-bearing manifests record no
    schema still reject on rename (ids underivable — compact first).

    Returns {"n_rows": N, "cols": {c: {"min", "max", "nulls",
    "non_null"}}}."""
    log = _log(path, as_of, branch)
    if _tombstones_since_last_rewrite(log):
        raise ValueError(
            "metadata aggregates require materialized state: the log "
            "holds unmaterialized delete/merge tombstones — compact "
            "first"
        )
    renamed = _alters_since_last_rewrite(log)
    per_index, current_ids, fid_ok = _field_id_history(log)
    if renamed and not fid_ok:
        raise ValueError(
            "metadata aggregates cannot answer across a column rename "
            "on this log: a file-bearing manifest records no schema, "
            "so field ids cannot be derived — compact to collapse the "
            "eras first"
        )
    live: dict[str, tuple] = {}
    for idx, (_version, m) in enumerate(log):
        if m.get("kind", "append") == "delete":
            continue  # materialized tombstone files are not data
        fr = m.get("file_rows", {})
        fs = m.get("file_stats", {})
        fn = m.get("file_nulls", {})
        entries = {
            f: (fr.get(f), fs.get(f, {}), fn.get(f), idx)
            for f in m["files"]
        }
        if m.get("kind", "append") == "rewrite":
            live = entries
        else:
            live.update(entries)
    # per-manifest inverse maps: field id -> that manifest's write-era
    # name for it. A probe for a CURRENT column translates current
    # name -> id -> era name, so per-file stats keyed by write-time
    # names answer EXACTLY across renames — no compaction required.
    inv_cache: dict[int, dict[int, str]] = {}

    def era_name(idx: int, col: str) -> str | None:
        """The write-era name of current column ``col`` in manifest
        ``idx``; None when the file predates the column (its rows are
        all-null for it, the backfill contract)."""
        if not fid_ok:
            return col  # legacy identity (never-renamed, checked above)
        cid = current_ids.get(col)
        if cid is None:
            return None
        if idx not in inv_cache:
            pi = per_index[idx]
            inv_cache[idx] = (
                {} if pi is None else {i: n for n, i in pi.items()}
            )
        return inv_cache[idx].get(cid)
    n_rows = 0
    for name, (rows, _s, _n, _i) in live.items():
        if rows is None:
            raise ValueError(
                f"live file {name} records no row count (pre-columnar "
                "commit); compact to refresh metadata"
            )
        n_rows += rows
    # strictness extends to the REQUEST: a column name outside the
    # discovered schema raises (a typo must never be indistinguishable
    # from an all-null added column). Branch reads skip the check —
    # branch commits may add columns main's schema has not seen.
    if branch is None and (cols or minmax_cols):
        sch = table_schema(path, as_of)
        if sch is not None:
            known = {f.name for f in sch.fields}
            unknown = sorted(
                (set(cols or []) | set(minmax_cols or [])) - known
            )
            if unknown:
                raise ValueError(
                    f"unknown column(s) {unknown}; table schema has "
                    f"{sorted(known)}"
                )
    out: dict = {"n_rows": n_rows, "cols": {}}
    want_minmax = set(minmax_cols or [])
    for c in list(cols or []) + sorted(want_minmax - set(cols or [])):
        nulls = 0
        lo = hi = None
        for name, (rows, fstats, fnulls, idx) in live.items():
            if rows == 0:
                continue
            if fnulls is None:
                raise ValueError(
                    f"live file {name} records no null counts; compact "
                    "to refresh metadata"
                )
            era = era_name(idx, c)
            # a file predating an added column — or predating the
            # column's CURRENT generation after a drop-and-reuse — is
            # all-null for it: the null-backfill contract, counted
            # exactly
            c_nulls = rows if era is None else fnulls.get(era, rows)
            nulls += c_nulls
            if c_nulls == rows or c not in want_minmax:
                continue  # counts-only column, or nothing non-null
            s = fstats.get(era)
            if s is None:
                raise ValueError(
                    f"live file {name} holds non-null {c!r} values but "
                    "no zone map (nulls or non-orderable type disabled "
                    "it); min/max is not answerable from metadata — "
                    "request it via cols= for counts only"
                )
            lo = s[0] if lo is None or s[0] < lo else lo
            hi = s[1] if hi is None or s[1] > hi else hi
        entry = {"nulls": nulls, "non_null": n_rows - nulls}
        if c in want_minmax:
            entry["min"] = lo
            entry["max"] = hi
        out["cols"][c] = entry
    return out


def read_version_delta(
    spark: SparkSession, path: str, schema, from_v: int, to_v: int
) -> DataFrame:
    """Change data feed for the append-only manifest table: the rows
    ADDED strictly after ``from_v`` up to and including ``to_v`` — read
    from exactly the files those manifests committed, no diffing scan.
    A rewrite snapshot inside the range is rejected: it replaces the
    base rather than appending, so a file-level delta is no longer the
    row-level delta (run the CDF before compacting, as Delta does). A
    delete snapshot is rejected for the same reason — its change rows
    are REMOVALS, which a file-level feed cannot represent (Delta's CDF
    emits them as _change_type=delete rows from a row-level log).
    A restore snapshot is likewise rejected — its change rows are the
    symmetric diff :func:`read_changes` computes at the row level."""
    files: list[str] = []
    for version, m in _log(path, raw=True):
        if version <= from_v or version > to_v:
            continue
        kind = m.get("kind", "append")
        if kind == "analyze":
            continue  # NDV sketches: pure metadata, no file changes
        if kind != "append":
            raise ValueError(
                f"version delta ({from_v}, {to_v}] crosses the {kind} "
                f"snapshot {version}; file-level CDF is append-only"
            )
        files += m["files"]
    return _read_files(spark, path, schema, files)


def read_pruned(
    spark: SparkSession,
    path: str,
    schema,
    col: str,
    lo,
    hi,
    as_of: int | None = None,
) -> DataFrame:
    """Read only the files the zone maps can't exclude for ``col`` in
    [lo, hi] — the Iceberg/Delta file-skipping contract. The caller
    still applies the actual row filter; this prunes the FILE LIST the
    scan opens (at 100 TB, the difference between touching 2 files and
    2000). Tombstones from delete snapshots still apply (the pruned
    scan routes through :func:`read_committed`'s fold) — skipping
    never resurrects deleted rows."""
    files, _ = plan_pruned_files(path, col, lo, hi, as_of)
    return read_committed(spark, path, schema, as_of=as_of, _keep=set(files))


# Safe type promotions (Iceberg v3 type-widening set restricted to
# what Spark's parquet scan natively up-casts): a file written at the
# narrower type reads losslessly under the wider schema; the reverse
# direction fails the scan, so it is rejected at discovery time.
_TYPE_WIDENINGS = {
    ("tinyint", "smallint"),
    ("tinyint", "int"),
    ("tinyint", "bigint"),
    ("smallint", "int"),
    ("smallint", "bigint"),
    ("int", "bigint"),
    ("float", "double"),
}


def table_schema(path: str, as_of: int | None = None) -> StructType | None:
    """Discover the table schema from the manifest log — the schema AS
    OF the given version (latest recorded at or below it), so time
    travel reads old snapshots with their OWN schema. Returns None if
    no manifest in range recorded one (pre-evolution tables).

    Enforces the EVOLUTION contract while walking the log: every
    recorded schema must contain all field names of the previous one
    (Iceberg v1-style additive evolution — drops/renames break old
    readers and are rejected here at discovery time), and a common
    field may only keep its type or WIDEN it along the safe promotion
    ladder (int→bigint, float→double — the Iceberg v3 type-widening
    set Spark's parquet scan natively up-casts; narrowing would fail
    every pre-evolution file at scan time and is rejected here
    instead). Delete snapshots are skipped: they record the TOMBSTONE
    KEY schema (a subset by design), not a table-schema evolution
    step."""
    latest: StructType | None = None
    # names retired by an alter DROP since the last rewrite: re-adding
    # one would make the era read resurrect the retired column's OLD
    # values from pre-drop files (name-based mapping has no field IDs
    # to distinguish generations) — rejected until a compaction
    # rewrites the live files without the column
    retired: set[str] = set()
    for version, m in _log(path, as_of):
        kind = m.get("kind", "append")
        if kind == "delete":
            continue
        if kind == "rewrite":
            retired = set()  # the consolidated files carry no ghosts
        sch = m.get("schema")
        if sch is None:
            continue
        st = StructType.fromJson(sch)
        if latest is not None:
            prev = {f.name: f.dataType for f in latest.fields}
            if kind == "alter":
                # a RENAME/DROP/ADD commit: the recorded schema must
                # be exactly the previous schema with the declared
                # renames applied, the declared drops removed, and the
                # declared adds appended (types unchanged otherwise) —
                # the column-mapping evolution steps the plain
                # add-only rule cannot express
                ren = m.get("rename", {})
                dropped = set(m.get("drop", []))
                added = set(m.get("add", []))
                expect = {
                    ren.get(n, n): t
                    for n, t in prev.items()
                    if n not in dropped
                }
                cur = {f.name: f.dataType for f in st.fields}
                for wcol, wtype in (m.get("widen") or {}).items():
                    if wcol not in expect:
                        raise ValueError(
                            f"alter snapshot {version} widens "
                            f"unknown column {wcol!r}"
                        )
                    pair = (expect[wcol].simpleString(), wtype)
                    if pair not in _TYPE_WIDENINGS:
                        raise ValueError(
                            f"alter snapshot {version} changes "
                            f"{wcol!r} from {pair[0]} to {pair[1]}, "
                            "not a safe widening"
                        )
                    cur_t = cur.get(wcol)
                    if cur_t is None or cur_t.simpleString() != wtype:
                        raise ValueError(
                            f"alter snapshot {version} declares "
                            f"{wcol!r} widened to {wtype} but its "
                            "schema disagrees"
                        )
                    expect[wcol] = cur_t
                ghosts = retired & added
                if ghosts:
                    raise ValueError(
                        f"alter snapshot {version} re-adds "
                        f"{sorted(ghosts)}, dropped earlier by an "
                        "alter — a name-based era read would "
                        "resurrect the old values; compact before "
                        "reusing a dropped name"
                    )
                if added - set(cur):
                    raise ValueError(
                        f"alter snapshot {version} declares adds "
                        f"{sorted(added)} absent from its schema"
                    )
                if {
                    n: t for n, t in cur.items() if n not in added
                } != expect:
                    raise ValueError(
                        f"alter snapshot {version} declares renames "
                        f"{ren} / drops {sorted(dropped)} / adds "
                        f"{sorted(added)} but its schema does not "
                        "match the previous schema with those changes "
                        "applied"
                    )
                retired |= dropped
                latest = st
                continue
            cur = {f.name: f.dataType for f in st.fields}
            if not set(prev) <= set(cur):
                raise ValueError(
                    f"schema evolution at version {version} is not "
                    f"add-only: dropped {sorted(set(prev) - set(cur))}"
                )
            ghosts = retired & (set(cur) - set(prev))
            if ghosts:
                raise ValueError(
                    f"schema evolution at version {version} re-adds "
                    f"{sorted(ghosts)}, dropped earlier by an alter — "
                    "a name-based era read would resurrect the old "
                    "values; compact before reusing a dropped name"
                )
            for name, pt in prev.items():
                ct = cur[name]
                if ct == pt:
                    continue
                pair = (pt.simpleString(), ct.simpleString())
                if pair not in _TYPE_WIDENINGS:
                    raise ValueError(
                        f"schema evolution at version {version} "
                        f"changes {name!r} from {pair[0]} to {pair[1]}"
                        ", which is not a safe widening — old files "
                        "could not be read under the new schema"
                    )
        latest = st
    return latest


def read_evolved(
    spark: SparkSession, path: str, as_of: int | None = None
) -> DataFrame:
    """Read the committed table under schema evolution: the schema is
    DISCOVERED from the manifest log (as of the requested version), and
    files written before a column existed yield NULL for it — the JSON
    reader backfills missing fields against the explicit schema, which
    is exactly the Iceberg/Delta add-column read contract.

    RENAMED tables (``kind='alter'`` commits in range) read by a
    SEGMENTED FOLD: the log is replayed in commit order, the folded
    state is kept in the naming of the segment being replayed (each
    data manifest recorded the schema its files were written with),
    and each alter commit applies its renames/drops TO THE STATE as a
    metadata-only projection — Delta column-mapping semantics with the
    manifest-recorded schema standing in for field IDs. Because every
    delete/merge tombstone anti-joins the state under the SAME names
    it was written with (the names current at its sequence point),
    row-level operations compose exactly with renames and drops in
    ANY interleaving — delete-then-rename, rename-then-delete, and
    drop-then-rename-reuse all fold to the correct rows (a rename is
    a column bijection, so the per-segment fold is the
    :func:`read_committed` fold expressed in each segment's own
    coordinate system). Columns added after a file's write-era
    null-backfill, so rename, drop, add-column, and type-widening
    evolution all compose."""
    sch = table_schema(path, as_of)
    if sch is None:
        raise ValueError(f"no recorded schema in manifest log at {path}")
    log = _log(path, as_of)
    if not _alters_since_last_rewrite(log):
        # no live naming eras (never renamed, or compaction collapsed
        # them): the ordinary committed read under the current schema
        return read_committed(spark, path, sch, as_of=as_of)
    from pyspark.sql import functions as _F

    def conform(df: DataFrame, st: StructType) -> DataFrame:
        """Project to exactly ``st``: present columns cast to the
        (possibly widened) target type, absent ones null-backfill."""
        have = set(df.columns)
        return df.select(
            *[
                (
                    _F.col(f.name).cast(f.dataType)
                    if f.name in have
                    else _F.lit(None).cast(f.dataType)
                ).alias(f.name)
                for f in st.fields
            ]
        )

    def data_schema(m: dict, version: int) -> StructType:
        if m.get("schema") is None:
            raise ValueError(
                f"manifest version {version} recorded no schema; its "
                "files' write-era names are unknowable under a rename "
                "— compact the table to collapse the eras"
            )
        return StructType.fromJson(m["schema"])

    df: DataFrame | None = None  # state, in the segment's naming
    pending: list = []  # buffered append files of this segment
    seg: StructType | None = None  # latest write schema in segment

    def flush(df: DataFrame | None) -> DataFrame | None:
        if not pending:
            return df
        scan = _read_files(spark, path, seg, pending)
        return scan if df is None else conform(df, seg).unionByName(scan)

    for version, m in log:
        kind = m.get("kind", "append")
        if kind == "analyze":
            continue  # NDV sketches: pure metadata, no rows change
        if kind == "alter":
            df, pending = flush(df), []
            if df is not None:
                ren = m.get("rename", {})
                dropped = set(m.get("drop", []))
                df = df.select(
                    *[
                        _F.col(c).alias(ren.get(c, c))
                        for c in df.columns
                        if c not in dropped
                    ]
                )
            seg = data_schema(m, version)
        elif kind == "rewrite":
            seg = data_schema(m, version)
            df, pending = None, list(m["files"])
        elif kind == "append":
            seg = data_schema(m, version)
            pending += m["files"]
        elif kind == "merge":
            seg = data_schema(m, version)
            df, pending = flush(df), []
            keys = m["merge_keys"]
            if df is not None:
                tomb = _read_files(spark, path, seg, m["files"]).select(
                    *keys
                )
                df = conform(df, seg).join(tomb, on=keys, how="left_anti")
            pending += m["files"]
        else:  # delete: key names are the segment's names
            df, pending = flush(df), []
            if df is None:
                continue
            if "schema" not in m:
                raise ValueError(
                    f"delete snapshot {version} recorded no key schema"
                )
            key_schema = StructType.fromJson(m["schema"])
            keys = [f.name for f in key_schema.fields]
            tomb = _read_files(spark, path, key_schema, m["files"])
            df = conform(df, seg).join(tomb, on=keys, how="left_anti")
    df = flush(df)
    if df is None:
        return local_frame(spark, [], sch)
    return conform(df, sch)


def publish_branch(path: str, branch: str) -> list[int]:
    """PUBLISH a write-audit-publish branch: atomically drop the branch
    tag from each of its committed manifests (os.replace per manifest,
    oldest first), making them visible to main readers at the versions
    they already claimed — the Iceberg fast-forward. Requires the
    fast-forward condition: every branch version must be GREATER than
    the newest unbranched version, otherwise publishing would splice
    history into main's past (rejected, as Iceberg rejects
    non-fast-forward refs). Returns the published versions.

    The WAP loop this implements: write to the branch (the same
    exactly-once writer with ``.option('branch', name)``), AUDIT the
    branch read (``read_committed(..., branch=name)`` sees main + the
    staged commits while main readers see nothing), then publish on a
    green audit or :func:`abandon_branch` on a red one."""
    staged = [
        (v, m)
        for v, m in _log(path, branch=branch, raw=True)
        if m.get("branch") == branch
    ]
    if not staged:
        return []
    # main head over ALL claimed version files, not just parseable main
    # manifests: an in-flight commit (claimed, content not yet written)
    # counts as main conservatively — publishing past it would let a
    # lower main version land AFTER a higher published one became
    # visible, retroactively changing history/as_of. Other branches'
    # staged commits do NOT count (they may be abandoned; their own
    # publish runs this same check symmetrically).
    staged_versions = {v for v, _ in staged}
    main_head = 0
    for version, _entry, m in _scan_log(path):
        if version in staged_versions:
            continue
        if m is None:
            main_head = max(main_head, version)  # in-flight: assume main
            continue
        if m.get("branch") is None:
            main_head = max(main_head, version)
    # in-flight claims (unparseable file, or no file yet under a
    # conditional-PUT claimer) are main conservatively — the shared
    # derivation from the claimer interface
    for version in _VERSION_CLAIMER.in_flight_versions(path):
        if version not in staged_versions:
            main_head = max(main_head, version)
    behind = [v for v, _ in staged if v <= main_head]
    if behind:
        raise ValueError(
            f"branch {branch!r} versions {behind} are behind main head "
            f"{main_head} (counting in-flight claims); publish is "
            "fast-forward-only — rebase by re-writing the branch"
        )
    published = []
    for version, m in staged:
        m = dict(m)
        m.pop("branch")
        final = os.path.join(path, f"_manifest-{version:06d}.json")
        tmp = os.path.join(path, f"._publish-{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, final)  # atomic visibility flip
        published.append(version)
    return published


def abandon_branch(path: str, branch: str) -> int:
    """Drop a red-audit branch: remove its manifests and their staging
    files (nothing was ever visible to main readers, so this is pure
    GC). The freed version numbers MAY be reclaimed by later commits —
    safe precisely because an abandoned commit was never visible to
    main readers, so no reader holds an ``as_of`` that meant it.
    Returns the number of abandoned commits."""
    staged = [
        (v, m)
        for v, m in _log(path, branch=branch, raw=True)
        if m.get("branch") == branch
    ]
    if staged and not _VERSION_CLAIMER.can_release():
        # fail BEFORE any destructive step: removing manifests and
        # then failing to release their store claims would leave
        # permanent phantom in-flight versions (stream head blocked,
        # orphan GC disarmed forever)
        raise NotImplementedError(
            "the installed VersionClaimer cannot release claims; "
            "abandon_branch needs a delete-capable claimer"
        )
    # files still referenced by surviving manifests must not be GC'd
    # (the RAW main log: pre-restore manifests' files remain live as
    # time-travel and restore targets; branch-tagged manifests are
    # excluded; distinct staging files per commit make cross-branch
    # sharing impossible anyway)
    keep = {
        f for _v, m in _log(path, raw=True) for f in m.get("files", [])
    }
    staging = os.path.join(path, "_staging")
    for version, m in staged:
        for name in m.get("files", []):
            target = os.path.join(staging, name)
            if name not in keep and os.path.exists(target):
                os.remove(target)
        os.remove(os.path.join(path, f"_manifest-{version:06d}.json"))
        _VERSION_CLAIMER.release(path, version)
    return len(staged)


_RANGE_SAMPLE_CONF = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
# Reentrant set/restore guard: the manifest layer supports concurrent
# writers, and SQLConf is session-global — two overlapping rewrites in
# threads of one session would otherwise race the restore (one thread
# resetting the hint to 100 while the other's range exchange is still
# planning, silently reintroducing the nondeterminism the hint fixes).
# A depth counter under a lock makes nesting/overlap restore only when
# the LAST scope exits.
_RANGE_HINT_LOCK = threading.Lock()
_RANGE_HINT_DEPTH: dict[str, list] = {}  # session uuid -> [depth, saved]


@contextlib.contextmanager
def _tight_range_boundaries(spark: SparkSession, hint: int = 10_000):
    """Run a layout-rewrite job with a large range-exchange sampling
    hint. ``repartitionByRange`` picks partition boundaries from a
    reservoir sample whose seed derives from the RDD id — i.e. from
    session history — so under the default 100-points-per-partition
    hint the physical layout of a clustered or hidden-partitioned
    rewrite is visibly run-dependent: the same rewrite can scatter a
    zone-map box across a different number of files, or merge two
    partition-transform values into one file, depending on what ran
    earlier in the session. A 10,000-point hint makes small-table
    boundaries exact (the reservoir keeps every row, so layouts are
    session-independent) and large-table jitter ~10x tighter; the
    driver-side cost stays bounded at any table size because
    RangePartitioner clamps the total sample at 1e6 keys. Scoped to
    the one rewrite job and restored after, so the setting never
    leaks into query plans."""
    uid = spark._jsparkSession.sessionUUID()
    with _RANGE_HINT_LOCK:
        entry = _RANGE_HINT_DEPTH.get(uid)
        if entry is None:
            try:
                old = spark.conf.get(_RANGE_SAMPLE_CONF)
            except Exception:
                old = None
            entry = _RANGE_HINT_DEPTH[uid] = [0, old]
            spark.conf.set(_RANGE_SAMPLE_CONF, str(hint))
        entry[0] += 1
    try:
        yield
    finally:
        with _RANGE_HINT_LOCK:
            entry[0] -= 1
            if entry[0] == 0:
                del _RANGE_HINT_DEPTH[uid]
                if entry[1] is None:
                    spark.conf.unset(_RANGE_SAMPLE_CONF)
                else:
                    spark.conf.set(_RANGE_SAMPLE_CONF, entry[1])


def compact_snapshots(
    spark: SparkSession,
    path: str,
    schema,
    cluster_by: list[str] | None = None,
    n_files: int = 16,
    bucket_by: str | None = None,
    n_buckets: int | None = None,
    partition_by: tuple | list | None = None,
) -> int:
    """Consolidate the table's current committed state into ONE rewrite
    snapshot — the small-file compaction lever for the manifest table
    (appends accumulate a staging file per task per commit; training
    readers pay per-file open cost). The rewrite commit lists the full
    consolidated state and supersedes earlier manifests for readers at
    or past its version, while every EARLIER version stays re-readable
    from the untouched old staging files — compaction preserves time
    travel. Returns the new snapshot version.

    ``cluster_by`` makes it an OPTIMIZE-style clustered rewrite (Delta
    ``OPTIMIZE ZORDER BY`` / Iceberg sort-order rewrite): the state is
    range-partitioned into ``n_files`` files on the given columns and
    sorted within each, so the rewrite's per-file zone maps become
    tight ranges on the cluster key — the layout step that turns the
    manifest's data-skipping stats from "present" into "selective".
    Pass a space-filling-curve column (functions/scale.zorder_key) to
    cluster on two dimensions at once.

    ``bucket_by``/``n_buckets`` make it a BUCKETED rewrite instead
    (Spark-native hash bucketing, the §2.5 co-location lever): the
    state is hash-partitioned ``n_buckets``-ways on the key — the one
    exchange that pre-pays every future shuffle on it — each task's
    file carries its bucket id in the Spark-parseable ``_NNNNN`` name
    suffix, the files land in a dedicated staging subdirectory, and
    the manifest records the layout. Register the snapshot with
    :func:`register_bucketed_table` and joins/aggregations on the
    bucket key run with NO exchange on this table's side (asserted by
    plan in tests). Mutually exclusive with ``cluster_by``: bucketing
    optimizes JOIN/AGG co-location, clustering optimizes RANGE
    skipping — a table layout picks one clustering axis.

    ``partition_by`` = ``(col, kind[, arg])`` — or a LIST of such
    tuples for a multi-field spec — preserves (or establishes)
    a HIDDEN-PARTITIONING layout through the rewrite: without it a
    compaction of a :func:`write_partitioned` table would silently
    DROP the transform metadata — the rewrite manifest records no
    spec, so every later time-window read stops pruning. The rewrite
    range-partitions on the transform and records the spec + per-file
    transform ranges exactly like the original writes.

    Scale: the consolidation is a normal distributed read + write
    through the same exactly-once writer (one pass; clustered rewrites
    add the one range-exchange any sort-order rewrite costs); expired
    staging files are garbage to collect only once no reader needs
    pre-compaction versions (the Iceberg/Delta VACUUM contract)."""
    if sum(1 for x in (bucket_by, cluster_by, partition_by) if x) > 1:
        raise ValueError(
            "bucket_by, cluster_by, and partition_by are mutually "
            "exclusive — a layout picks one clustering axis"
        )
    if any(m.get("kind") == "alter" for _v, m in _log(path)):
        # a renamed table compacts through the era-aware read, and the
        # rewrite lands under the CURRENT names — eras collapse here,
        # restoring every name-keyed metadata surface (stats, blooms,
        # partitions, metadata aggregates) for the consolidated files
        current = read_evolved(spark, path)
        schema = current.schema
    else:
        if schema is None:
            schema = table_schema(path)
            if schema is None:
                raise ValueError(
                    f"no recorded schema in manifest log at {path}; "
                    "pass an explicit schema to compact"
                )
        current = read_committed(spark, path, schema)
    writer_opts: dict[str, str] = {}
    if partition_by is not None:
        fields = (
            partition_by
            if isinstance(partition_by, list)
            else [partition_by]
        )
        specs = _parse_transforms(
            [
                {"col": c, "kind": k, "arg": (rest[0] if rest else None)}
                for c, k, *rest in fields
            ]
        )
        pt_cols = [f"_pt{i}" for i in range(len(specs))]
        current = current.select(
            "*",
            *[
                transform_column(s).alias(c)
                for s, c in zip(specs, pt_cols)
            ],
        ).repartitionByRange(n_files, *pt_cols).drop(*pt_cols)
        writer_opts = {
            "partition_transform": json.dumps(
                specs[0] if len(specs) == 1 else specs
            )
        }
    elif bucket_by is not None:
        n_buckets = n_buckets or 16
        current = current.repartition(n_buckets, bucket_by)
        writer_opts = {
            "bucket_by": bucket_by,
            "n_buckets": str(n_buckets),
            "subdir": f"bkt-{uuid.uuid4().hex[:12]}",
        }
    elif cluster_by:
        current = current.repartitionByRange(
            n_files, *cluster_by
        ).sortWithinPartitions(*cluster_by)
    with _tight_range_boundaries(spark):
        # declared layout: one file per range/bucket, empties included
        save_manifest(
            current, path, kind="rewrite", eager_files="1", **writer_opts
        )
    return max(committed_versions(path))


def _partial_rewrite_guards(log: list, what: str) -> None:
    """Shared rejection gate for PARTIAL rewrites (compact_range,
    replace_where): a scoped rewrite retains files verbatim, so it is
    only sound when nothing since the last full rewrite re-interprets
    them. Unmaterialized delete/merge tombstones would be RESURRECTED
    in retained files (tombstones stop applying at a rewrite), and a
    column rename shifts the name-keyed stats the retained entries
    carry. Both raise, naming the full-rewrite alternative."""
    last_rw = -1
    for i, (_v, m) in enumerate(log):
        if m.get("kind", "append") == "rewrite":
            last_rw = i
    if any(
        m.get("kind", "append") in ("delete", "merge")
        for _v, m in log[last_rw + 1 :]
    ):
        raise ValueError(
            f"{what} over unmaterialized delete/merge "
            "snapshots would resurrect tombstoned rows in retained "
            "files; run a full compact_snapshots() first to "
            "materialize them"
        )
    if any(
        m.get("kind") == "alter"
        and any(
            k in m
            for k in ("rename", "drop", "widen", "add", "partition_spec")
        )
        for _v, m in log[last_rw + 1 :]
    ):
        # pure-metadata alters that move no names and change no file
        # bytes (CHECK-constraint add/drop) are exempt — retained
        # stats stay name-exact under them
        raise ValueError(
            f"{what} cannot cross a column rename (the "
            "scoped read and retained stats are name-keyed); run a "
            "full compact_snapshots() first to collapse the eras"
        )


def _retain_entries(
    path: str, log: list, exclude: set
) -> tuple[dict, list | None]:
    """Build the ``retain`` map a partial-rewrite commit carries:
    every LIVE file not in ``exclude``, with its zone-map stats, row
    count, null counts and (current-spec) hidden-partition ranges
    preserved verbatim — so metadata-only aggregates and pruning keep
    answering exactly for the files the rewrite does not touch.
    Returns (retain, latest recorded partition spec or None)."""
    retain: dict = {}
    for name, st in _committed_files(path):
        if name in exclude:
            continue
        entry: dict = {"stats": st or {}}
        retain[name] = entry
    # row counts for the retained files, from the freshest manifest
    # that recorded them (table$files semantics)
    for f in table_files(path):
        if f["file_name"] in retain and f["n_rows"] is not None:
            retain[f["file_name"]]["rows"] = f["n_rows"]
    # null counts likewise (metadata-only COUNT(col) must survive a
    # scoped rewrite for the files it does not touch)
    live_nulls: dict[str, dict] = {}
    for _v3, m3 in log:
        if m3.get("kind", "append") == "delete":
            continue
        fn = m3.get("file_nulls", {})
        entries3 = {f: fn.get(f) for f in m3["files"]}
        if m3.get("kind", "append") == "rewrite":
            live_nulls = entries3
        else:
            live_nulls.update(entries3)
    for name, entry in retain.items():
        if live_nulls.get(name) is not None:
            entry["nulls"] = live_nulls[name]
    # HIDDEN-PARTITIONING preservation: a scoped rewrite must not
    # strip the table's transform metadata (the round-11 layout —
    # otherwise every later time-window read stops pruning). The
    # LATEST recorded spec survives: retained files carry their
    # recorded transform range (only if recorded under that same
    # spec), and the writer recomputes ranges for the new files.
    live_spec_parts: dict[str, tuple] = {}
    spec_latest = None
    for _v2, m2 in log:
        kind2 = m2.get("kind", "append")
        if kind2 == "delete":
            continue
        sp = m2.get("partition_transform")
        fp = m2.get("file_partitions", {})
        pr = m2.get("file_partition_rows", {})
        entries2 = {f: (sp, fp.get(f), pr.get(f)) for f in m2["files"]}
        if kind2 == "rewrite":
            live_spec_parts = entries2
        else:
            live_spec_parts.update(entries2)
        if sp is not None:
            spec_latest = sp
    if spec_latest is not None:
        for name, entry in retain.items():
            sp, rng, prows = live_spec_parts.get(name, (None, None, None))
            if sp == spec_latest and rng is not None:
                entry["part"] = rng
            if sp == spec_latest and prows is not None:
                entry["prows"] = prows
    return retain, spec_latest


def replace_where(
    spark: SparkSession,
    path: str,
    schema,
    col: str,
    lo,
    hi,
    df: DataFrame,
    n_files: int = 4,
) -> dict:
    """Atomic predicate-scoped OVERWRITE — Delta's ``replaceWhere`` /
    ``INSERT INTO t REPLACE WHERE``: in ONE rewrite commit, every
    committed row with ``col`` in [lo, hi] disappears and ``df``'s
    rows take their place. Readers see either the complete old state
    or the complete new state — never the deleted-but-not-yet-inserted
    middle a DELETE+INSERT pair exposes (and a crash between the pair
    can strand permanently).

    Delta's constraint travels too: every row of ``df`` must satisfy
    the predicate — a violation RAISES before anything commits
    (silently widening the replaced range is how backfills corrupt
    neighboring partitions).

    Scale: the replaced range is planned from metadata
    (:func:`plan_pruned_files` — zone maps + hidden-partition ranges),
    so only files that MAY hold matching rows are read and rewritten;
    everything else is carried into the rewrite manifest verbatim
    (stats, row counts, nulls, partition ranges — :func:`_retain_entries`),
    byte-identical on disk. Replacing one day of a 100-TB,
    day-partitioned fact costs I/O proportional to that day, and the
    enforcement pass scans only ``df``. Unmaterialized delete/merge
    tombstones or a pending rename reject with the full-rewrite
    alternative named (same contract as :func:`compact_range`).

    Returns {"version", "n_replaced_files", "n_retained", "n_new",
    "n_insert_rows"}.

    Reference analogue: the reference's loader can only append or
    wholesale-replace its BigQuery tables
    (bigquery_update_scheduler.py:247-260, WRITE_TRUNCATE); a scoped,
    atomic backfill verb does not exist there."""
    from pyspark.sql import functions as F

    log = _log(path)
    _partial_rewrite_guards(log, "replace_where")
    # NULL-safe on both sides: a NULL key cannot satisfy the range, so
    # it is a constraint violation in df — and in the keep-filter
    # below a NULL-key row is KEPT (it provably isn't being replaced);
    # a bare ~between would silently drop it. The range check, the
    # CHECK constraints, and the caller-reported insert-row count all
    # ride ONE aggregation pass over df (guide §1.2).
    probe = enforce_constraints(
        spark,
        path,
        df,
        "INSERT OVERWRITE",
        extra={
            "__rw_bad": F.sum(
                F.when(
                    F.col(col).isNull()
                    | ~F.col(col).between(F.lit(lo), F.lit(hi)),
                    1,
                ).otherwise(0)
            ),
            "__rw_n": F.count(F.lit(1)),
        },
    )
    bad = int(probe["__rw_bad"] or 0)
    if bad:
        raise ValueError(
            f"replace_where: {bad} insert rows violate "
            f"{col} BETWEEN {lo!r} AND {hi!r}; the replacement data "
            "must live entirely inside the range it replaces"
        )
    replaced_files, total = plan_pruned_files(path, col, lo, hi)
    replaced_set = set(replaced_files)
    retain, spec_latest = _retain_entries(path, log, replaced_set)
    new_state = df
    if replaced_set:
        keep = read_committed(
            spark, path, schema, _keep=replaced_set
        ).filter(
            F.col(col).isNull()
            | ~F.col(col).between(F.lit(lo), F.lit(hi))
        )
        new_state = keep.unionByName(df)
    new_state = new_state.repartitionByRange(
        n_files, col
    ).sortWithinPartitions(col)
    token = uuid.uuid4().hex
    opts = {
        "kind": "rewrite",
        "retain": json.dumps(retain),
        "commit_token": token,
        "eager_files": "1",  # declared layout: one file per range
    }
    if spec_latest is not None:
        opts["partition_transform"] = json.dumps(spec_latest)
    with _tight_range_boundaries(spark):
        save_manifest(new_state, path, **opts)
    version, _m = _committed_entry_of(path, token)
    return {
        "version": version,
        "n_replaced_files": len(replaced_set),
        "n_retained": len(retain),
        "n_new": len(_m["files"]) - len(retain),
        "n_insert_rows": int(probe["__rw_n"] or 0),
    }


def overwrite_table(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    n_files: int = 4,
) -> int:
    """Full-table INSERT OVERWRITE: ONE rewrite commit whose live file
    list IS ``df`` — the atomic truncate+insert (Delta
    ``mode("overwrite")`` / the reference's BigQuery WRITE_TRUNCATE,
    bigquery_update_scheduler.py:247-260, made snapshot-isolated).
    Unlike a scoped replace, a full rewrite needs NO guards: it
    materializes every pending tombstone and collapses alter eras by
    construction, because nothing is retained. Every earlier version
    stays time-travelable from the untouched old files until vacuum.
    The table's declared hidden-partitioning spec survives: new files
    are range-clustered on the spec's source columns and their
    transform ranges recorded, so pruning keeps working after the
    swap. Returns the new snapshot version."""
    enforce_constraints(spark, path, df, "INSERT OVERWRITE")
    spec = current_partition_spec(path)
    out = df
    if spec:
        out = df.repartitionByRange(
            max(n_files, len(spec)), *[s["col"] for s in spec]
        ).sortWithinPartitions(*[s["col"] for s in spec])
    token = uuid.uuid4().hex
    opts = {"kind": "rewrite", "commit_token": token}
    if spec:
        opts["partition_transform"] = json.dumps(spec)
        opts["eager_files"] = "1"  # declared layout: one file per range
    with _tight_range_boundaries(spark):
        save_manifest(out, path, **opts)
    return _committed_entry_of(path, token)[0]


def analyze_table(
    spark: SparkSession,
    path: str,
    cols: list[str],
    k: int = 256,
) -> dict:
    """``ANALYZE TABLE`` — record a PER-FILE KMV distinct-value sketch
    for each named column as a metadata-only ``kind='analyze'`` commit
    (Iceberg's puffin NDV blobs / Delta's column stats, folded into
    the manifest log). The sketch is the ``k`` smallest ``xxhash64``
    values of the column's distinct non-null values in that file; a
    file with fewer than ``k`` distinct values stores them ALL and is
    marked complete (the sketch IS the distinct-hash set, so merges
    of complete sketches count exactly).

    INCREMENTAL by construction: files that already carry a sketch
    for a column (at this ``k``) are skipped, so the steady-state cost
    of keeping a 100-TB table analyzed is one pass over each NEW
    commit's files — and the whole computation is JVM-side
    (xxhash64 + distinct + per-file top-k window: one shuffle of
    8-byte hashes, never values).

    Rewrites invalidate naturally: sketches key on file NAMES, a
    compaction's new files simply have none until the next analyze.
    Returns {"version", "n_files_analyzed", "n_sketches"} (version is
    the current head when nothing needed analyzing — no empty commit).

    Reference analogue: the reference has no statistics surface at
    all; its BigQuery tables re-scan for every COUNT(DISTINCT)
    (bigquery_update_scheduler.py:255-260)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    sch = table_schema(path)
    if sch is None:
        raise ValueError(f"table at {path} records no schema")
    have = {f.name for f in sch.fields}
    missing = [c for c in cols if c not in have]
    if missing:
        raise ValueError(f"analyze_table: unknown columns {missing}")
    live = [name for name, _ in _committed_files(path)]
    existing = _ndv_sketches(path)
    todo: dict[str, list[str]] = {}
    for c in cols:
        for f in live:
            s = existing.get((f, c))
            if s is None or s["k"] != k:
                todo.setdefault(f, []).append(c)
    head = max(committed_versions(path), default=0)
    if not todo:
        return {"version": head, "n_files_analyzed": 0, "n_sketches": 0}
    base_map = {os.path.basename(n): n for n in todo}
    payload: dict[str, dict] = {}
    n_sketches = 0
    for c in cols:
        cfiles = [f for f in sorted(todo) if c in todo[f]]
        if not cfiles:
            continue
        fld = next(f for f in sch.fields if f.name == c)
        scan = _read_files(spark, path, StructType([fld]), cfiles)
        d = (
            scan.where(F.col(c).isNotNull())
            .select(
                F.input_file_name().alias("f"),
                F.xxhash64(F.col(c)).alias("h"),
            )
            .distinct()
        )
        w = Window.partitionBy("f").orderBy("h")
        topk = (
            d.withColumn("r", F.row_number().over(w))
            .where(F.col("r") <= k)
            .groupBy("f")
            .agg(
                F.sort_array(F.collect_list("h")).alias("hs"),
                F.max("r").alias("n"),
            )
        )
        seen = set()
        for row in topk.collect():
            fname = base_map[os.path.basename(row.f)]
            payload.setdefault(fname, {})[c] = {
                "h": [int(x) for x in row.hs],
                # n == k is treated as truncated even when the file
                # held exactly k distinct values — the estimator is
                # then merely approximate, never wrong-exact
                "complete": int(row.n) < k,
            }
            seen.add(fname)
            n_sketches += 1
        for f in cfiles:
            if f not in seen:  # all-NULL or empty file: zero distinct
                payload.setdefault(f, {})[c] = {"h": [], "complete": True}
                n_sketches += 1
    v = _commit_manifest_dict(
        path,
        {"kind": "analyze", "files": [], "ndv": payload, "ndv_k": k},
    )
    return {
        "version": v,
        "n_files_analyzed": len(todo),
        "n_sketches": n_sketches,
    }


def _ndv_sketches(
    path: str, as_of: int | None = None
) -> dict[tuple, dict]:
    """Latest recorded sketch per (file, column) — a pure fold of the
    analyze commits in the log (later analyzes override earlier)."""
    out: dict[tuple, dict] = {}
    for _v, m in _log(path, as_of):
        if m.get("kind") != "analyze":
            continue
        kk = int(m.get("ndv_k", 0))
        for f, cmap in m.get("ndv", {}).items():
            for c, sk in cmap.items():
                out[(f, c)] = {
                    "h": sk["h"],
                    "complete": bool(sk["complete"]),
                    "k": kk,
                }
    return out


def table_ndv(
    path: str, col: str, as_of: int | None = None
) -> dict:
    """DISTINCT-VALUE COUNT from metadata alone — zero data files
    opened: merge the live files' KMV sketches (union of hash sets;
    KMV closure: the union's k smallest hashes are the table's k
    smallest, so per-file sketches merge losslessly). When every live
    file's sketch is COMPLETE the merged count is exact (modulo
    64-bit hash collisions — vanishing below billions of distincts);
    otherwise the classic KMV estimator (k-1)/U(k) over the merged
    k-minimum.

    STRICT like :func:`metadata_aggregate`: unmaterialized
    delete/merge tombstones make every per-file sketch an overcount
    (raises — OPTIMIZE first), and live files missing a sketch for
    ``col`` raise naming :func:`analyze_table` (a silent partial
    answer would undercount). A rename retires sketches with the old
    name — re-analyze under the new one.

    Returns {"ndv", "exact", "n_files"}."""
    log = _log(path, as_of)
    if _tombstones_since_last_rewrite(log):
        raise ValueError(
            "table_ndv: unmaterialized delete/merge tombstones make "
            "file sketches an overcount; run compact_snapshots() / "
            "OPTIMIZE first to materialize them"
        )
    live = [n for n, _ in _committed_files(path, as_of)]
    if not live:
        return {"ndv": 0, "exact": True, "n_files": 0}
    sk = _ndv_sketches(path, as_of)
    missing = [f for f in live if (f, col) not in sk]
    if missing:
        raise ValueError(
            f"table_ndv: {len(missing)} live files carry no NDV "
            f"sketch for {col!r}; run analyze_table(spark, path, "
            f"[{col!r}]) to (incrementally) cover them"
        )
    union: set[int] = set()
    complete = True
    kmin: int | None = None
    for f in live:
        s = sk[(f, col)]
        union.update(s["h"])
        complete = complete and s["complete"]
        kmin = s["k"] if kmin is None else min(kmin, s["k"])
    if complete:
        return {"ndv": len(union), "exact": True, "n_files": len(live)}
    hs = sorted(union)[:kmin]
    u = (hs[-1] + 2**63 + 1) / 2.0**64
    return {
        "ndv": int(round((kmin - 1) / u)),
        "exact": False,
        "n_files": len(live),
    }


def estimate_join_rows(
    path_a: str, key_a: str, path_b: str, key_b: str
) -> dict:
    """EQUI-JOIN CARDINALITY ESTIMATE from metadata alone — the
    classic CBO formula ``|A| * |B| / max(ndv_a, ndv_b)`` (System R's
    containment-of-value-sets assumption, what Spark's CBO and every
    warehouse optimizer compute from ANALYZE statistics): row counts
    from :func:`metadata_aggregate`, distinct counts from the KMV
    sketches (:func:`table_ndv`). ZERO data files are opened, so a
    planner (or the partition-layout advisor) can ask "how big is
    this join?" for a 100-TB pair of tables at the cost of two log
    folds — the decision input for broadcast-vs-shuffle and
    pre-aggregation choices.

    Inherits table_ndv's strictness: unanalyzed columns or
    unmaterialized tombstones raise (an estimate from known-stale
    statistics is a wrong plan waiting to happen, not a fallback).
    Returns {"rows_a", "rows_b", "ndv_a", "ndv_b", "estimated_rows",
    "exact_ndv"} — ``exact_ndv`` is True when BOTH sides' sketches
    merged exactly, making the estimate the true expectation under
    uniformity rather than a doubly-approximate one."""
    ra = metadata_aggregate(path_a)["n_rows"]
    rb = metadata_aggregate(path_b)["n_rows"]
    na = table_ndv(path_a, key_a)
    nb = table_ndv(path_b, key_b)
    denom = max(na["ndv"], nb["ndv"], 1)
    return {
        "rows_a": ra,
        "rows_b": rb,
        "ndv_a": na["ndv"],
        "ndv_b": nb["ndv"],
        "estimated_rows": int(round(ra * rb / denom)),
        "exact_ndv": bool(na["exact"] and nb["exact"]),
    }


def compact_range(
    spark: SparkSession,
    path: str,
    schema,
    col: str,
    lo,
    hi,
    n_files: int = 4,
) -> dict:
    """PARTIAL compaction — ``OPTIMIZE WHERE col BETWEEN lo AND hi``
    (Iceberg ``rewrite_data_files`` with a filter / Delta OPTIMIZE on a
    partition predicate): rewrite ONLY the files whose zone maps
    overlap [lo, hi], carry every other file into the rewrite manifest
    untouched (with its zone maps and row counts), and leave the data
    of retained files byte-identical on disk. At 100 TB this is the
    only compaction that exists — nobody rewrites a full table; the
    maintenance job walks hot key ranges (recent ingest, small-file
    storms) and consolidates just those, paying I/O proportional to
    the range, not the table.

    The rewrite snapshot lists the full consolidated state (retained ∪
    new), so the read path needs no new rules: time travel to
    pre-compaction versions still reads the old file lists, vacuum's
    expiry keeps every file the rewrite references, and the zone maps
    of the rewritten range become tight (range-partitioned + sorted on
    ``col``) while retained files keep theirs.

    Delete and MERGE snapshots not yet materialized by a full rewrite
    are REJECTED: a partial rewrite would resurrect tombstoned rows in
    files it retains (the tombstones stop applying at the rewrite, but
    retained files were never re-folded — a merge's key-tombstones
    carry the same hazard as a standalone delete). Deletes/merges
    BEFORE the latest full rewrite are fine — that rewrite already
    materialized them. Run a FULL :func:`compact_snapshots` first,
    then range-compact freely.

    Returns {"version", "n_rewritten", "n_retained", "n_new"}."""
    log = _log(path)
    _partial_rewrite_guards(log, "partial compaction")
    rewrite_files, _total = plan_pruned_files(path, col, lo, hi)
    rewrite_set = set(rewrite_files)
    if not rewrite_set:  # nothing overlaps: a no-op, commit nothing
        return {
            "version": max(committed_versions(path), default=0),
            "n_rewritten": 0,
            "n_retained": _total,
            "n_new": 0,
        }
    retain, spec_latest = _retain_entries(path, log, rewrite_set)
    current = read_committed(spark, path, schema, _keep=rewrite_set)
    current = current.repartitionByRange(n_files, col).sortWithinPartitions(
        col
    )
    token = uuid.uuid4().hex
    opts = {
        "kind": "rewrite",
        "retain": json.dumps(retain),
        "commit_token": token,
        "eager_files": "1",  # declared layout: one file per range
    }
    if spec_latest is not None:
        opts["partition_transform"] = json.dumps(spec_latest)
    with _tight_range_boundaries(spark):
        save_manifest(current, path, **opts)
    version, rewrite_m = _committed_entry_of(path, token)
    new_files = [
        f
        for f in rewrite_m["files"]
        if f not in retain and f not in rewrite_set
    ]
    return {
        "version": version,
        "n_rewritten": len(rewrite_set),
        "n_retained": len(retain),
        "n_new": len(new_files),
    }


def write_partitioned(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    col: str | None = None,
    kind: str | None = None,
    arg: int | None = None,
    n_files: int = 16,
    branch: str | None = None,
    transforms: list[tuple] | None = None,
    props: dict | None = None,
) -> int:
    """Append ``df`` under a HIDDEN-PARTITIONING layout: the rows are
    range-partitioned on the transform of ``col`` (month/days/year/
    hours for timestamps, truncate/bucket/identity for integers) so
    each task's file covers a tight transform range, and the manifest
    records the spec plus every file's [min, max] transform value.
    Readers then prune by SOURCE-column predicates
    (:func:`plan_pruned_files` / :func:`read_pruned`) with no
    materialized partition column and no layout knowledge in the query
    — Iceberg's hidden partitioning, the generalization of the
    reference's year/month/day output directories
    (spark_streaming_consumer.py:323).

    ``transforms`` = ``[(col, kind[, arg]), …]`` writes a MULTI-FIELD
    spec (Iceberg's partition-spec shape — e.g. ``[("ts", "days"),
    ("user_id", "bucket", 16)]``): rows are range-partitioned
    lexicographically on ALL the transform values, so a file is tight
    in the leading field and contiguous in the rest, and every field
    prunes independently (a time window via the days range, a user
    point-lookup via the bucket equality) — the layout a 100-TB
    events fact actually wants.

    Scale: the one range exchange here is the pay-once layout cost;
    every later time-windowed scan opens only the files whose
    transform range intersects the window. Returns the new snapshot
    version."""
    if transforms is not None:
        if col is not None or kind is not None:
            raise ValueError("pass col/kind OR transforms, not both")
        specs = [
            _parse_transform(
                {"col": c, "kind": k, "arg": (rest[0] if rest else None)}
            )
            for c, k, *rest in transforms
        ]
        specs = _parse_transforms(specs)  # uniqueness/shape checks
    elif col is not None:
        specs = [_parse_transform({"col": col, "kind": kind, "arg": arg})]
    else:
        # no explicit transform: follow the table's DECLARED spec
        # (set_partition_spec / the latest partitioned write) — the
        # Iceberg contract that writers inherit the table layout
        specs = current_partition_spec(path)
        if specs is None:
            raise ValueError(
                "write_partitioned needs a transform: pass col/kind, "
                "transforms=[...], or declare one with "
                "set_partition_spec first"
            )
    enforce_constraints(spark, path, df, "write_partitioned")
    token = uuid.uuid4().hex
    pt_cols = [f"_pt{i}" for i in range(len(specs))]
    out = df.select(
        "*",
        *[
            transform_column(s).alias(c)
            for s, c in zip(specs, pt_cols)
        ],
    ).repartitionByRange(n_files, *pt_cols).drop(*pt_cols)
    opts = {
        "partition_transform": json.dumps(
            specs[0] if len(specs) == 1 else specs
        ),
        "commit_token": token,
        "eager_files": "1",  # declared layout: one file per range
    }
    if branch is not None:
        opts["branch"] = branch
    if props is not None:
        opts["commit_props"] = json.dumps(props)
    with _tight_range_boundaries(spark):
        save_manifest(out, path, **opts)
    return _committed_entry_of(path, token, branch)[0]


def read_changes(
    spark: SparkSession, path: str, schema, from_v: int, to_v: int
) -> DataFrame:
    """ROW-LEVEL change data feed — the Delta CDF contract including
    removals: every row changed in versions (from_v, to_v], tagged
    with ``_change_type`` ('insert' | 'delete') and
    ``_commit_version``. Appends contribute their files' rows as
    inserts (no diffing scan — exactly the committed files). A delete
    snapshot contributes the rows it REMOVED: the table state as of
    the preceding version, semi-joined to the tombstone keys — a
    distributed join against only the pre-delete state, never a full
    history diff. A rewrite (compaction) inside the range still
    raises: it reorganizes bytes without changing rows, so a
    row-level feed crossing it would double-count (Delta's CDF makes
    the same run-before-compacting demand).

    A RESTORE snapshot contributes its row-level symmetric diff: the
    rows the restore removed (pre-restore state minus the restored
    state, ``exceptAll`` so duplicate multiplicities diff exactly) as
    deletes, and the rows it brought back as inserts — a consumer
    replaying (delete, insert) in order lands on exactly the restored
    state, the same contract the merge arm keeps. Both sides are
    as-of reads of committed state, never a history walk.

    This supersedes the file-level :func:`read_version_delta` when
    the range crosses deletes — incremental view maintenance over a
    mutating table consumes inserts AND deletes and stays O(delta)."""
    from pyspark.sql import functions as _F

    parts: list[DataFrame] = []
    for version, m in _log(path, raw=True):
        if version <= from_v or version > to_v:
            continue
        kind = m.get("kind", "append")
        if kind == "analyze":
            continue  # NDV sketches: pure metadata, no row changes
        if kind == "alter":
            raise ValueError(
                f"row-level CDF ({from_v}, {to_v}] crosses the rename "
                f"snapshot {version}; earlier versions' files carry "
                "the pre-rename column names — consume the feed before "
                "renaming, or restart it at the rename"
            )
        if kind == "rewrite":
            raise ValueError(
                f"row-level CDF ({from_v}, {to_v}] crosses the rewrite "
                f"snapshot {version}; compaction reorganizes bytes "
                "without changing rows — consume the feed before "
                "compacting"
            )
        if kind == "restore":
            # the restore's row-level change = symmetric diff between
            # the pre-restore state and the state it restored to;
            # exceptAll keeps duplicate-row multiplicities exact
            before = read_committed(spark, path, schema, as_of=version - 1)
            after = read_committed(spark, path, schema, as_of=version)
            removed = before.exceptAll(after)
            added = after.exceptAll(before)
            for side, tag in ((removed, "delete"), (added, "insert")):
                parts.append(
                    side.withColumn("_change_type", _F.lit(tag)).withColumn(
                        "_commit_version", _F.lit(version).cast("int")
                    )
                )
            continue
        if kind == "append":
            df = _read_files(spark, path, schema, m["files"])
        elif kind == "merge":
            # atomic upsert: the rows its key-tombstones REMOVED from
            # the pre-merge state, plus its own rows as inserts — both
            # stamped with the ONE commit version (a CDF consumer
            # replaying them in (delete, insert) order reconstructs
            # exactly the post-merge state)
            keys = m["merge_keys"]
            rows = _read_files(spark, path, schema, m["files"])
            before = read_committed(spark, path, schema, as_of=version - 1)
            removed = before.join(
                rows.select(*keys), on=keys, how="left_semi"
            )
            parts.append(
                removed.withColumn("_change_type", _F.lit("delete"))
                .withColumn("_commit_version", _F.lit(version).cast("int"))
            )
            df = rows
        else:  # delete: emit the rows the tombstones removed
            if "schema" not in m:
                raise ValueError(
                    f"delete snapshot {version} recorded no key schema"
                )
            key_schema = StructType.fromJson(m["schema"])
            tomb = _read_files(spark, path, key_schema, m["files"])
            before = read_committed(spark, path, schema, as_of=version - 1)
            df = before.join(
                tomb, on=[f.name for f in key_schema.fields], how="left_semi"
            )
        parts.append(
            df.withColumn(
                "_change_type",
                _F.lit("delete" if kind == "delete" else "insert"),
            ).withColumn("_commit_version", _F.lit(version).cast("int"))
        )
    if not parts:
        empty = local_frame(spark, [], schema)
        return empty.withColumn("_change_type", _F.lit("")).withColumn(
            "_commit_version", _F.lit(0).cast("int")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def register_bucketed_table(
    spark: SparkSession, path: str, table_name: str
) -> str:
    """Register the manifest table's current BUCKETED snapshot as a
    Spark catalog table so Catalyst plans exchange-free joins and
    aggregations on the bucket key — the storage-partitioned-join
    contract on the teachable lakehouse. Requires the latest committed
    snapshot to be a bucketed rewrite (written by
    :func:`compact_snapshots` with ``bucket_by``): its manifest records
    the key, bucket count, and the dedicated staging subdirectory that
    holds exactly its files.

    Because a catalog table's LOCATION is directory-scoped while the
    manifest's contract is an explicit file LIST, registration
    RECONCILES the two: any file in the snapshot's subdirectory that
    the manifest does not list (residue of retried task attempts whose
    first write survived) is deleted before the table is created —
    after commit, unlisted files in a committed snapshot's private
    subdir are garbage by definition. This is the listing-vs-manifest
    gap Iceberg closes natively; a dir-scoped register must close it
    explicitly.

    The table is EXTERNAL (LOCATION-based): dropping it later never
    touches the data files, and time travel to pre-compaction versions
    still reads through the manifest path unchanged."""
    log = _log(path, raw=True)
    if not log:
        raise ValueError(f"no committed snapshots at {path}")
    version, m = log[-1]
    if m.get("kind", "append") != "rewrite" or "bucket_by" not in m:
        raise ValueError(
            f"latest snapshot {version} is not a bucketed rewrite; run "
            "compact_snapshots(bucket_by=...) first"
        )
    sch = table_schema(path)
    if sch is None:
        raise ValueError(f"no recorded schema in manifest log at {path}")
    layout_dir = m["layout_dir"]
    loc = os.path.join(path, "_staging", layout_dir)
    committed = {f.split("/", 1)[1] for f in m["files"]}
    for entry in sorted(os.listdir(loc)):
        if entry not in committed:
            os.remove(os.path.join(loc, entry))
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in sch.fields
    )
    spark.sql(f"DROP TABLE IF EXISTS `{table_name}`")
    spark.sql(
        f"CREATE TABLE `{table_name}` ({cols}) USING parquet "
        f"CLUSTERED BY (`{m['bucket_by']}`) "
        f"INTO {int(m['n_buckets'])} BUCKETS "
        f"LOCATION '{loc}'"
    )
    return table_name


# Spark's Python-DataSource registry scopes LOOKUP per-session but the
# name-uniqueness check JVM-wide (a sibling session can neither read
# nor re-register a name) — so, like the POS simulator source, each
# session registers the sink under a session-scoped name, keyed by the
# never-reused sessionUUID.
_SINK_REGISTERED: dict[str, str] = {}


def ensure_manifest_sink(spark: SparkSession) -> str:
    """Register the manifest sink on ``spark`` (idempotent) and return
    the format name to write through on that session.

    Also pins ``spark`` as the JVM thread's ACTIVE session: the batch
    ``DataFrameWriter`` resolves Python data sources against the
    active session's manager, not the DataFrame's own session — on a
    sibling ``newSession()`` the scoped name is otherwise invisible to
    the write path even though reads resolve fine (probed empirically
    on Spark 4.1; streaming foreachBatch writes are unaffected because
    the micro-batch thread activates its own clone)."""
    uid = spark._jsparkSession.sessionUUID()
    fmt = _SINK_REGISTERED.get(uid)
    if fmt is None:
        fmt = "manifest_sink_" + uid.replace("-", "")
        scoped = type(
            "ManifestSinkScoped",
            (ManifestSinkDataSource,),
            {"name": classmethod(lambda cls, _n=fmt: _n)},
        )
        spark.dataSource.register(scoped)
        _SINK_REGISTERED[uid] = fmt
    try:
        spark._jvm.org.apache.spark.sql.classic.SparkSession.setActiveSession(
            spark._jsparkSession
        )
    except Exception:  # noqa: BLE001 — non-classic shells lack the hook
        pass
    return fmt


def save_manifest(df: DataFrame, path: str, **options) -> dict:
    """Fast-path manifest commit: byte-identical write semantics to
    ``df.write.format(ensure_manifest_sink(spark)).options(...).save()``
    — the same :class:`ManifestWriter` runs in each task (one staging
    file per partition, same zone maps/blooms/transform ranges), and
    the same driver-side :meth:`ManifestWriter.commit` claims the next
    version — minus the Python-DataSource write protocol's
    per-statement planner round-trips (datasource lookup + writer
    instantiation worker + commit worker). The data job is one plain
    ``mapInArrow`` whose single output row per task is the pickled
    commit message; measured at gate scale this halves the fixed cost
    of a small commit, and lifecycle proofs are built from dozens of
    them.

    ``options`` take the exact option names/values of the DataSource
    API (``kind``, ``merge_keys``, ``bloom_col``, ``branch``, ...).

    Failure semantics: a failed job leaves unreferenced staging files
    (the DataSource path's best-effort ``abort`` cleanup does not run);
    they are invisible to every reader and collected by
    ``vacuum_snapshots`` orphan GC — the same residue a crashed driver
    leaves on either path.

    Returns ``{"n_rows", "n_files"}`` of the commit, straight from the
    task commit messages — the caller-visible row count of what was
    written WITHOUT re-running ``df``'s plan (counting a 100-TB insert
    by re-executing its SELECT is a full second scan; guide §1.2,
    don't compute things twice)."""
    import pickle as _pickle

    writer = ManifestWriter(
        {"path": path, **{k: str(v) for k, v in options.items()}},
        overwrite=False,
        schema=df.schema,
    )

    def _task(batches):
        import pyarrow as _pa

        msg = writer.write(batches)
        yield _pa.record_batch(
            [_pa.array([_pickle.dumps(msg)], type=_pa.binary())],
            names=["msg"],
        )

    msgs = [
        _pickle.loads(bytes(r.msg))
        for r in df.mapInArrow(_task, "msg binary").collect()
    ]
    writer.commit(msgs)  # drops empty-partition messages; an all-empty
    # commit stages its one empty file inside commit() itself
    return {
        "n_rows": sum(m.n_rows for m in msgs),
        "n_files": sum(1 for m in msgs if m.file_name is not None),
    }


def vacuum_snapshots(
    path: str,
    keep_from: int | None = None,
    delete_orphans: bool = True,
    stale_claim_ttl_s: float | None = None,
) -> dict:
    """Expire old snapshots and collect unreferenced staging files —
    the Iceberg ``expire_snapshots`` + ``remove_orphan_files`` /
    Delta VACUUM contract for the manifest table. Two independent
    actions:

    1. **Orphan GC** (``delete_orphans``): staging files referenced by
       NO committed manifest — the residue of failed attempts whose
       ``abort`` never ran — are deleted. Run it in a maintenance
       window (no in-flight writers), the same precondition Delta's
       retention check encodes.
    2. **Snapshot expiry**: every manifest with version < ``keep_from``
       is removed, along with any staging file only those expired
       manifests reference. ``keep_from`` MUST be a rewrite
       (compaction) snapshot — the consolidated base from which every
       retained version is still reconstructible; expiring past a
       plain append would break the retained versions' lineage, so
       that is rejected. Default: the latest rewrite version (no-op if
       the table was never compacted). After expiry,
       ``read_committed(as_of=v)`` for v < keep_from reads EMPTY —
       time travel is shortened, exactly as in Iceberg/Delta.

    Returns counts: orphans_deleted, expired_manifests, expired_files,
    expired_checkpoints (log-checkpoint generations beyond the newest,
    collected here because vacuum IS the maintenance window the
    ``keep=2`` retirement in :func:`checkpoint_log` defers to),
    kept_versions. Driver-side O(#manifests + #staging-files) metadata
    work; no data is read or rewritten.

    In-flight-commit guard: a version file claimed (O_EXCL) but not yet
    atomically replaced with its content is the read path's explicit
    commit-in-flight signal — its freshly-written staging files are not
    yet referenced by any parseable manifest and would look like
    orphans. When one is present, orphan GC is SKIPPED for this run
    (``in_flight_commits`` > 0 in the returned stats) rather than
    merely documented as a maintenance-window precondition; snapshot
    expiry still proceeds, since it deletes only files referenced by
    expired manifests, which an in-flight commit cannot reference.

    Stale-claim GC (``stale_claim_ttl_s``): a writer that crashes
    BETWEEN the version claim and the atomic content replace leaves a
    permanently-empty claimed manifest — a version that will never
    become readable, invisible to history, holding the streaming tail
    and the in-flight guard forever. An unparseable claim OLDER than
    the TTL (far beyond any plausible commit duration; Delta's
    equivalent knob is its log-retry timeout) is deleted
    (``stale_claims_deleted``), turning it into a permanent version
    hole that readers, streams, and history all already skip — and its
    never-referenced staging files become collectible orphans on the
    next pass. Claims younger than the TTL still count as in-flight.

    The GC is check-then-remove, not atomic: the claim file is
    re-verified (still empty, mtime unchanged) IMMEDIATELY before the
    ``os.remove`` to shrink the window in which a committer stalled
    past the TTL lands its ``os.replace`` between the failed parse and
    the remove. The residual hazard is inherent to a TTL — a committer
    whose ``os.replace`` is delayed past BOTH the TTL and the re-check
    loses its commit (or, if the version was reclaimed, silently
    overwrites the rival's manifest). This is the same hazard class as
    Delta's log-retry timeout: the TTL must dominate any plausible
    commit duration by orders of magnitude, which is why it is an
    explicit opt-in knob with no default."""
    import time

    entries: list[tuple[int, str, dict]] = []
    stale_deleted = 0
    # unparseable claims seen DURING the scan, whether young-and-kept
    # or caught mid-replace: each may become readable between this
    # loop and the claimer derivation below, in which case it is no
    # longer "in flight" there yet its files are absent from
    # `entries` — orphan GC must stay disarmed for this run either way
    unresolved = 0
    for version, entry in _list_manifests(path):
        full = os.path.join(path, entry)
        try:
            with open(full) as f:
                m = json.load(f)
        except (json.JSONDecodeError, OSError):
            try:
                st = os.stat(full)
            except FileNotFoundError:
                continue  # a rival vacuum removed it first
            if st.st_size > 0:
                # the commit LANDED between the failed parse and the
                # re-stat: re-parse so its files are referenced (they
                # must not look like orphans this run)
                try:
                    with open(full) as f:
                        m = json.load(f)
                    entries.append((version, entry, m))
                except (json.JSONDecodeError, OSError):
                    unresolved += 1  # racing replace: defer GC this run
                continue
            age = time.time() - st.st_mtime
            if (
                stale_claim_ttl_s is not None
                and age > stale_claim_ttl_s
                and _VERSION_CLAIMER.can_release()
            ):
                # the size-0 re-stat just above is the last-moment
                # re-verification: a committer that landed its
                # os.replace since the failed parse shows non-zero
                # size and is left alone. A claimer that cannot
                # release (conditional-PUT without a delete callable)
                # skips the GC entirely: removing the file while the
                # store claim lingers would leave a permanent phantom
                # in-flight version.
                os.remove(full)  # crashed claim: permanent hole, GC it
                _VERSION_CLAIMER.release(path, version)
                stale_deleted += 1
            else:
                unresolved += 1  # young/unreleasable: in flight now
            continue
        entries.append((version, entry, m))
    # the commit-in-flight count: the claimer derivation (covers
    # store-side claims with no file yet) joined with the scan loop's
    # own unresolved count via max — a commit that LANDED between the
    # loop and the derivation is readable there (not in-flight) yet
    # absent from `entries`, so the loop's count must still disarm
    # orphan GC; max (not sum) avoids double-counting a claim both
    # saw
    in_flight = max(
        len(_VERSION_CLAIMER.in_flight_versions(path)), unresolved
    )
    # retention anchors are MAIN rewrites only: an unpublished WAP
    # branch's rewrite is invisible to main readers — expiring main
    # history against it would empty the table for everyone
    rewrites = [
        v
        for v, _, m in entries
        if m.get("kind") == "rewrite" and m.get("branch") is None
    ]
    if keep_from is None:
        keep_from = max(rewrites) if rewrites else None
    elif keep_from not in rewrites:
        raise ValueError(
            f"keep_from={keep_from} is not a main rewrite snapshot "
            f"(main rewrites: {rewrites}); expiring past an append "
            "base (or anchoring on an unpublished branch) would break "
            "the retained versions"
        )
    if keep_from is not None:
        # a retained RESTORE whose target lies below the expiry line
        # would silently lose its meaning (the effective-log expansion
        # references manifests expiry deletes); targets AT/ABOVE
        # keep_from are safe because the anchor rewrite consolidates
        # everything below it
        broken = [
            v
            for v, _, m in entries
            if m.get("kind") == "restore"
            and m.get("branch") is None
            and v >= keep_from
            and int(m.get("restore_as_of", 0)) < keep_from
        ]
        if broken:
            raise ValueError(
                f"snapshot expiry below {keep_from} would cut the "
                f"target out from under restore snapshot(s) {broken}; "
                "compact after the restore and anchor on that rewrite "
                "instead"
            )
    stats = {
        "orphans_deleted": 0,
        "expired_manifests": 0,
        "expired_files": 0,
        "expired_checkpoints": 0,
        "in_flight_commits": in_flight,
        "stale_claims_deleted": stale_deleted,
    }
    staging = os.path.join(path, "_staging")
    referenced_any = {f for _, _, m in entries for f in m.get("files", [])}
    if in_flight:
        delete_orphans = False  # the guard: never GC under a live commit
    if delete_orphans and os.path.isdir(staging):
        # recursive: bucketed snapshots stage files under dedicated
        # subdirectories, referenced by staging-relative name
        for dirpath, _dirs, files in os.walk(staging):
            for fname in sorted(files):
                full = os.path.join(dirpath, fname)
                rel = os.path.relpath(full, staging)
                if rel not in referenced_any:
                    os.remove(full)
                    stats["orphans_deleted"] += 1
    if keep_from is not None:
        retained = {
            f
            for v, _, m in entries
            if v >= keep_from
            for f in m.get("files", [])
        }
        for v, entry, m in entries:
            if v >= keep_from or m.get("branch") is not None:
                continue  # branch-staged manifests belong to
                # publish/abandon, never to main expiry
            for name in m.get("files", []):
                target = os.path.join(staging, name)
                if name not in retained and os.path.exists(target):
                    os.remove(target)
                    stats["expired_files"] += 1
            os.remove(os.path.join(path, entry))
            stats["expired_manifests"] += 1
    # drop staging subdirectories emptied by orphan GC / expiry
    if os.path.isdir(staging):
        for dirpath, _dirs, files in sorted(os.walk(staging), reverse=True):
            if dirpath != staging and not files and not os.listdir(dirpath):
                os.rmdir(dirpath)
    # LOG-CHECKPOINT GC: checkpoint_log() keeps the newest `keep`
    # generations alive for racing readers; vacuum — a maintenance
    # window by the same contract that arms orphan GC — collects every
    # generation but the newest. A checkpoint is a pure parse cache,
    # so removing one can never change what is read; the next plan
    # call falls back to the survivor (or per-file parsing).
    for entry in _checkpoint_names(path)[1:]:
        try:
            os.remove(os.path.join(path, entry))
            stats["expired_checkpoints"] += 1
        except OSError:
            pass  # racing remove: already gone
    stats["kept_versions"] = table_versions(path)
    return stats
