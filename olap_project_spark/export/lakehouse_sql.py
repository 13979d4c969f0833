"""SQL DDL ENTRY for the manifest lakehouse — the table-format verbs
exposed as SQL, parsed to the library calls, so a SQL-ONLY user drives
the same code paths (exactly-once writer, metadata-only alters,
restore/vacuum/optimize, materialized views) the Python API does.

The reference's warehouse users speak DDL to BigQuery
(bigquery_update_scheduler.py:34-56 creates datasets/tables by API —
the DDL analogue); here the verbs target the manifest table format:

    CREATE TABLE t AS SELECT ...
    CREATE TABLE t (a INT, b STRING
        [, CONSTRAINT n CHECK (expr)])     -- schema-only empty commit,
        [PARTITIONED BY (days(ts), bucket(k, 16))]  -- born guarded
    CREATE TABLE dst CLONE src [VERSION AS OF n]  -- zero-copy clone
    DROP TABLE t / DROP MATERIALIZED VIEW v
    RESTORE TABLE t TO TIMESTAMP AS OF '...'
    INSERT INTO t SELECT ...
    INSERT OVERWRITE t SELECT ...          -- atomic truncate+insert
    INSERT OVERWRITE t WHERE col BETWEEN lo AND hi SELECT ...
        -- replaceWhere: scoped atomic backfill, range-enforced
    COPY INTO t FROM '<dir>' FILEFORMAT = PARQUET|CSV|JSON
        [PATTERN = '<glob>']               -- exactly-once file ledger
    INSERT INTO t BRANCH b SELECT ...      -- WAP: staged, main-invisible
    ALTER TABLE t PUBLISH BRANCH b         -- prefix-monotonic fast-forward
    ALTER TABLE t ABANDON BRANCH b         -- red audit: metadata GC
    SELECT ... FROM t BRANCH b             -- audit read (main + staged)
    DELETE FROM t WHERE ...                -- equality-delete commit
    UPDATE t SET c = expr [, ...] [WHERE pred]  -- ONE atomic merge
    MERGE INTO t USING (SELECT ...) ON (k1, k2)
        WHEN MATCHED [AND cond] THEN UPDATE SET *
        [WHEN NOT MATCHED THEN INSERT *]   -- atomic MoR upsert
    MERGE INTO t USING (...) ON (k) WHEN MATCHED [AND cond] THEN DELETE
    MERGE INTO t USING (...) ON (k) WHEN NOT MATCHED THEN INSERT *
    MERGE INTO t USING (...) ON (k)        -- FULL SYNC: one rewrite
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        WHEN NOT MATCHED BY SOURCE THEN DELETE
    MERGE INTO t USING (...) ON (k)
        WHEN NOT MATCHED BY SOURCE THEN DELETE  -- retain source keys
    ALTER TABLE t ADD CONSTRAINT n CHECK (expr)  -- validated now,
        -- enforced on every later write surface
    ALTER TABLE t DROP CONSTRAINT n
    ALTER TABLE t RENAME COLUMN a TO b
    ALTER TABLE t DROP COLUMN c
    ALTER TABLE t ADD COLUMN x INT
    ALTER TABLE t ALTER COLUMN c TYPE BIGINT   -- safe widening
    ALTER TABLE t SET PARTITION SPEC (month(ts), bucket(user_id, 16))
    ALTER TABLE t CREATE TAG name [AS OF VERSION n]  -- immutable ref
    ALTER TABLE t DROP TAG name
    RESTORE TABLE t TO VERSION AS OF n
    OPTIMIZE t [ZORDER BY (c1, c2)]        -- full compaction
    OPTIMIZE t WHERE col BETWEEN lo AND hi -- partial (zone-map-scoped)
    ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS (a, b)
        -- per-file KMV NDV sketches; t__ndv answers COUNT(DISTINCT)
        -- from metadata alone
    VACUUM t [RETAIN FROM VERSION n]
    DESCRIBE HISTORY t / DESCRIBE DETAIL t / SHOW CREATE TABLE t
    SHOW PARTITIONS t                      -- log-derived, zero scans
    EXPLAIN SELECT ...                     -- the plan that runs
    CREATE MATERIALIZED VIEW v AS
        SELECT k, SUM(expr) AS a, COUNT(*) AS n,
               COUNT(col) AS c, AVG(expr) AS m
        FROM t [JOIN dim USING (k1, k2)] [WHERE pred] GROUP BY k
        -- filtered + fact-incremental join views; a dimension commit
        -- falls back to an atomic full recompute on the next REFRESH
    REFRESH MATERIALIZED VIEW v
    SELECT ... (any Spark SQL; lakehouse tables resolve era-aware,
                materialized views resolve tombstone-filtered, and
                t__history / t__files / t__partitions / t__tags /
                t__branches / t__ndv / t__constraints resolve as
                driver-side metadata views — zero data
                files opened; registration is LAZY — only the tables
                a statement references fold their logs)
    SELECT ... FROM t VERSION AS OF n           -- time-travel reads
    SELECT ... FROM t VERSION AS OF '<tag>'     -- named-ref reads
    SELECT ... FROM t [FOR] TIMESTAMP AS OF '2026-01-01 00:00:00'
    SELECT ... FROM t FOR SYSTEM_TIME AS OF '...'  -- BigQuery spelling
    SELECT ... FROM table_changes('t', start[, end])  -- row-level CDF

Statements are dispatched by a small grammar (regex head + Spark SQL
for every relational body); anything that is not a lakehouse verb
falls through to ``spark.sql`` with the catalog's tables registered
as temp views — so the analyst surface and the DDL surface are ONE
entry point. Unknown verbs against known heads (e.g. ``ALTER TABLE …
CLUSTER BY``) raise rather than half-apply.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from olap_project_spark.functions.localframe import local_frame
from olap_project_spark.export.manifest_sink import (
    abandon_branch,
    add_column,
    committed_versions,
    compact_snapshots,
    delete_where,
    drop_column,
    drop_tag,
    ensure_manifest_sink,
    list_branches,
    list_tags,
    merge_upsert,
    publish_branch,
    read_changes,
    read_committed,
    read_evolved,
    rename_column,
    restore_table,
    save_manifest,
    set_partition_spec,
    table_files,
    table_history,
    table_partitions,
    table_schema,
    tag_snapshot,
    update_where,
    vacuum_snapshots,
    version_at_timestamp,
    widen_column,
)

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"

# Words that may directly follow a table reference and therefore are
# NOT aliases — the time-travel rewriter uses this to decide whether
# the original table name must be re-bound as an alias.
_NOT_AN_ALIAS = {
    "WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "UNION", "EXCEPT",
    "INTERSECT", "JOIN", "INNER", "LEFT", "RIGHT", "FULL", "CROSS",
    "NATURAL", "SEMI", "ANTI", "LATERAL", "ON", "USING", "WINDOW",
    "QUALIFY", "DISTRIBUTE", "CLUSTER", "SORT", "PIVOT", "UNPIVOT",
    "TABLESAMPLE", "FOR", "VERSION", "TIMESTAMP", "AND", "OR",
}


class LakehouseSQL:
    """One SQL entry point over a DIRECTORY CATALOG: every manifest
    table lives at ``<root>/<name>``; a table is 'in the catalog' iff
    its directory holds committed manifests. No server, no metastore —
    the manifest logs ARE the catalog, exactly as the table format
    intends (a deployment points root at its object-store prefix)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.fmt = ensure_manifest_sink(spark)

    # ---------------------------------------------------------------- util
    def path(self, name: str) -> str:
        if not re.fullmatch(_IDENT, name):
            raise ValueError(f"invalid table name: {name!r}")
        return os.path.join(self.root, name)

    def _exists(self, name: str) -> bool:
        p = self.path(name)
        return os.path.isdir(p) and any(
            e.startswith("_manifest-") for e in os.listdir(p)
        )

    def _require(self, name: str) -> str:
        if not self._exists(name):
            raise ValueError(f"no lakehouse table named {name!r}")
        return self.path(name)

    def _tables(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            e
            for e in os.listdir(self.root)
            if re.fullmatch(_IDENT, e) and self._exists(e)
        )

    def _register_catalog(self, statement: str | None = None) -> None:
        """Expose catalog tables to Spark SQL: manifest tables resolve
        through the era-aware read, materialized views through mv_read
        (tombstone rows filtered) — a SELECT never sees internals.
        Each table can also register its METADATA TABLES (Iceberg's
        ``t$files``/``t$partitions``/``t$history``, spelled
        ``t__files``/``t__partitions``/``t__history`` — ``$`` is not a
        Spark view-name character): driver-side folds of the manifest
        log, zero data files opened.

        Registration is LAZY per statement: only tables whose bare
        identifier appears in ``statement`` register, and each
        metadata view registers only when ITS identifier appears —
        word-boundary matching on the raw SQL is a safe
        over-approximation (any reference contains the identifier;
        a false positive merely registers an unused view). Without
        this, every statement would fold every table's full log —
        O(catalog × log depth) driver work per SELECT. ``None``
        registers everything (the eager legacy behavior, kept for
        callers that enumerate the catalog)."""
        from olap_project_spark.export.matview import _meta_path, mv_read

        for name in self._tables():
            if statement is None:
                base = hist = files = parts = tags = branches = True
                ndv = cons = True
            else:
                base = re.search(rf"\b{name}\b", statement) is not None
                hist = f"{name}__history" in statement
                files = f"{name}__files" in statement
                parts = f"{name}__partitions" in statement
                tags = f"{name}__tags" in statement
                branches = f"{name}__branches" in statement
                ndv = f"{name}__ndv" in statement
                cons = f"{name}__constraints" in statement
                if not (
                    base
                    or hist
                    or files
                    or parts
                    or tags
                    or branches
                    or ndv
                    or cons
                ):
                    continue
            p = self.path(name)
            if base:
                if os.path.exists(_meta_path(p)):
                    df = mv_read(self.spark, p)
                else:
                    df = read_evolved(self.spark, p)
                df.createOrReplaceTempView(name)
            if hist:
                local_frame(self.spark, 
                    [
                        (h["version"], h["kind"], h["n_files"], h["n_rows"])
                        for h in table_history(p)
                    ],
                    "version int, kind string, n_files int, n_rows bigint",
                ).createOrReplaceTempView(f"{name}__history")
            if files:
                local_frame(self.spark, 
                    [
                        (e["version"], e["file_name"], e.get("n_rows"))
                        for e in table_files(p)
                    ],
                    "version int, file_name string, n_rows bigint",
                ).createOrReplaceTempView(f"{name}__files")
            if parts:
                try:
                    tp = table_partitions(p, strict=False)
                except ValueError:
                    tp = None  # no transform spec recorded: no view
                if tp is not None:
                    local_frame(self.spark, 
                        [
                            (str(e["partition"]), e["n_rows"], e["n_files"])
                            for e in tp["partitions"]
                        ],
                        "partition string, n_rows bigint, n_files int",
                    ).createOrReplaceTempView(f"{name}__partitions")
            if tags:
                local_frame(self.spark, 
                    sorted(list_tags(p).items()),
                    "tag string, version int",
                ).createOrReplaceTempView(f"{name}__tags")
            if branches:
                local_frame(self.spark, 
                    sorted(list_branches(p).items()),
                    "branch string, staged_commits int",
                ).createOrReplaceTempView(f"{name}__branches")
            if ndv:
                # distinct counts from merged KMV sketches — zero data
                # files; lists ONLY answerable columns (the strict
                # read refuses partial sketch coverage and
                # unmaterialized tombstones — an absent row is "run
                # ANALYZE TABLE / OPTIMIZE", never a silent guess)
                from olap_project_spark.export.manifest_sink import (
                    _ndv_sketches,
                    table_ndv,
                )

                rows = []
                for c in sorted({c for _f, c in _ndv_sketches(p)}):
                    try:
                        r = table_ndv(p, c)
                    except ValueError:
                        continue
                    rows.append((c, r["ndv"], r["exact"]))
                local_frame(self.spark, 
                    rows or [("", 0, False)],
                    "column string, ndv bigint, exact boolean",
                ).filter("column <> ''").createOrReplaceTempView(
                    f"{name}__ndv"
                )
            if cons:
                from olap_project_spark.export.manifest_sink import (
                    table_constraints,
                )

                local_frame(self.spark, 
                    sorted(table_constraints(p).items())
                    or [("", "")],
                    "name string, expr string",
                ).filter("name <> ''").createOrReplaceTempView(
                    f"{name}__constraints"
                )

    @staticmethod
    def _parse_literal(x: str):
        """A scalar SQL literal: 'quoted' → str, else int/float —
        the value types zone maps record and prune by."""
        if x.startswith("'"):
            return x[1:-1]
        return float(x) if "." in x else int(x)

    def _one_row(self, **kv) -> DataFrame:
        cols = ", ".join(f"{k} string" for k in kv)
        return local_frame(self.spark, 
            [tuple(str(v) for v in kv.values())], cols
        )

    @staticmethod
    def _parse_transforms(body: str) -> list[tuple]:
        out: list[tuple] = []
        for part in (
            p.strip()
            for p in LakehouseSQL._split_select(body.strip())
        ):
            m = re.fullmatch(
                rf"({_IDENT})\s*\(\s*({_IDENT})\s*"
                rf"(?:,\s*(\d+)\s*)?\)",
                part,
            )
            if not m:
                raise ValueError(
                    f"cannot parse partition transform {part!r}; "
                    "expected kind(col) or kind(col, arg)"
                )
            kind, col, arg = m.group(1).lower(), m.group(2), m.group(3)
            out.append(
                (col, kind, int(arg)) if arg is not None else (col, kind)
            )
        return out

    def _merge(
        self, name: str, body: str, keys: list[str], tail: str
    ) -> DataFrame:
        """Dispatch MERGE's WHEN-clause combinations — each compiled to
        ONE atomic commit:

        - ``WHEN MATCHED [AND cond] THEN UPDATE SET * WHEN NOT MATCHED
          THEN INSERT *`` — the upsert: one ``kind='merge'`` snapshot;
          a matched-clause condition keeps non-qualifying target rows
          untouched (they are simply absent from the commit, so their
          keys are never tombstoned).
        - ``WHEN MATCHED [AND cond] THEN UPDATE SET *`` — update-only:
          unmatched source rows are dropped, not inserted.
        - ``WHEN MATCHED [AND cond] THEN DELETE`` — delete-by-source:
          one equality-delete commit tombstoning the qualifying source
          keys (a key with no target match tombstones nothing).
        - ``WHEN NOT MATCHED THEN INSERT *`` — insert-if-absent: one
          append commit of the anti-joined source rows.

        - ``WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN
          INSERT * WHEN NOT MATCHED BY SOURCE THEN DELETE`` — the
          FULL SYNC (Delta's three-clause replicate verb): the table
          becomes exactly the source, compiled to ONE atomic rewrite
          commit (``overwrite_table``) — the only commit kind that
          can delete one key set while inserting another atomically;
          the cost is a table rewrite, which full sync inherently is.
          A matched-clause condition is rejected here (a conditional
          sync is not "become the source"; run the conditional MERGE
          then a DELETE).
        - ``WHEN NOT MATCHED BY SOURCE THEN DELETE`` alone — retain
          only source keys, the same one-commit rewrite of the
          semi-joined state.

        Any OTHER ``DELETE`` + ``INSERT`` combination is rejected: no
        delta-shaped commit kind tombstones one key set while
        inserting a DIFFERENT one, and splitting into two commits
        would silently break MERGE's atomicity contract — run two
        statements to opt into that explicitly. Conditions may
        reference source columns (the usual CDC shape: operation
        flags, sequence numbers)."""
        p = self._require(name)
        full_sync = re.fullmatch(
            r"(?is)WHEN\s+MATCHED\s+(?:AND\s+(.+?)\s+)?THEN\s+UPDATE"
            r"\s+SET\s+\*\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*"
            r"\s+WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\s+THEN\s+DELETE",
            tail,
        )
        nmbs_only = re.fullmatch(
            r"(?is)WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\s+THEN\s+DELETE",
            tail,
        )
        if full_sync is not None and full_sync.group(1) is not None:
            raise ValueError(
                "full-sync MERGE does not take a matched-clause "
                "condition (the table would not become the source); "
                "run the conditional MERGE and a DELETE as two "
                "statements"
            )
        upsert = re.fullmatch(
            r"(?is)WHEN\s+MATCHED\s+(?:AND\s+(.+?)\s+)?THEN\s+UPDATE"
            r"\s+SET\s+\*\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*",
            tail,
        )
        upd_only = re.fullmatch(
            r"(?is)WHEN\s+MATCHED\s+(?:AND\s+(.+?)\s+)?THEN\s+UPDATE"
            r"\s+SET\s+\*",
            tail,
        )
        del_only = re.fullmatch(
            r"(?is)WHEN\s+MATCHED\s+(?:AND\s+(.+?)\s+)?THEN\s+DELETE",
            tail,
        )
        ins_only = re.fullmatch(
            r"(?is)WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*", tail
        )
        if (
            full_sync is None
            and re.search(r"(?is)THEN\s+DELETE", tail)
            and re.search(r"(?is)THEN\s+INSERT", tail)
        ):
            raise ValueError(
                "MERGE cannot combine WHEN MATCHED THEN DELETE with "
                "WHEN NOT MATCHED THEN INSERT atomically (no single "
                "commit tombstones one key set while inserting "
                "another); run a MERGE … DELETE and an INSERT-only "
                "MERGE as two statements"
            )
        if not (
            upsert or upd_only or del_only or ins_only or full_sync
            or nmbs_only
        ):
            raise ValueError(
                f"unsupported MERGE clause combination: {tail!r} "
                "(supported: [AND cond on] UPDATE SET * / DELETE / "
                "INSERT *, one matched clause + optional INSERT; "
                "the full-sync triple; NOT MATCHED BY SOURCE DELETE)"
            )
        from pyspark.sql import functions as F

        source = self.sql(body)
        sch = table_schema(p)
        if sch is not None and del_only is None and nmbs_only is None:
            # SQL MERGE conformance, as INSERT: whole rows bound by
            # name, literal types coerced to the declared column types
            have, need = set(source.columns), {f.name for f in sch.fields}
            if have != need:
                raise ValueError(
                    f"MERGE INTO {name} source columns {sorted(have)} "
                    f"!= table columns {sorted(need)}"
                )
            source = source.select(
                *[
                    F.col(f.name).cast(f.dataType).alias(f.name)
                    for f in sch.fields
                ]
            )
        elif sch is not None:
            # DELETE-by-source needs only keys (+ condition columns);
            # coerce the key types so the tombstone equality is exact
            types = {f.name: f.dataType for f in sch.fields}
            source = source.select(
                *[
                    F.col(c).cast(types[c]).alias(c)
                    if c in types
                    else F.col(c)
                    for c in source.columns
                ]
            )
        if full_sync is not None:
            from olap_project_spark.export.manifest_sink import (
                commit_rows,
                overwrite_table,
            )

            # the rewrite commit's recorded row count IS |source| (a
            # full overwrite writes exactly the source) — no second
            # evaluation of the source query
            v = overwrite_table(self.spark, p, source)
            return self._one_row(
                table=name, version=v, n_rows=commit_rows(p, v)
            )
        if nmbs_only is not None:
            from olap_project_spark.export.manifest_sink import (
                commit_rows,
                overwrite_table,
            )

            kept = read_evolved(self.spark, p).join(
                source.select(*keys).distinct(), on=keys, how="left_semi"
            )
            v = overwrite_table(self.spark, p, kept)
            return self._one_row(
                table=name, version=v, n_kept=commit_rows(p, v)
            )
        if upsert is not None and upsert.group(1) is None:
            r = merge_upsert(self.spark, p, source, keys=keys)
            return self._one_row(
                table=name, version=r["version"], n_updates=r["n_updates"]
            )
        target_keys = read_evolved(self.spark, p).select(*keys).distinct()
        if del_only is not None:
            cond = del_only.group(1)
            victims = source
            if cond:
                victims = victims.filter(F.expr(cond))
            # persist: the count decides whether to commit at all, and
            # the tombstone write then reuses the materialized victims
            # instead of re-deriving them (one evaluation, not two)
            victims = (
                victims.select(*keys)
                .distinct()
                .join(target_keys, on=keys, how="left_semi")
            ).persist()
            try:
                n = victims.count()
                v = (
                    # rebalance: same exchange-width inheritance as the
                    # SQL DELETE (see there)
                    delete_where(self.spark, p, victims.hint("rebalance"))
                    if n
                    else None
                )
            finally:
                victims.unpersist()
            return self._one_row(table=name, version=v, n_deleted=n)
        if ins_only is not None:
            inserts = source.join(
                target_keys, on=keys, how="left_anti"
            ).persist()
            try:
                n = inserts.count()
                if n:
                    save_manifest(inserts.hint("rebalance"), p)
            finally:
                inserts.unpersist()
            return self._one_row(table=name, n_inserted=n)
        clause = upsert or upd_only
        cond = clause.group(1)
        matched = source.join(target_keys, on=keys, how="left_semi")
        if cond:
            matched = matched.filter(F.expr(cond))
        frame = matched
        if upsert is not None:
            frame = matched.unionByName(
                source.join(target_keys, on=keys, how="left_anti")
            )
        r = merge_upsert(self.spark, p, frame, keys=keys)
        return self._one_row(
            table=name, version=r["version"], n_updates=r["n_updates"]
        )

    def _rewrite_time_travel(self, s: str) -> str:
        """Resolve SQL READ-SIDE TIME TRAVEL: every ``t VERSION AS OF
        n``, ``t [FOR] TIMESTAMP AS OF '...'``, and BigQuery-spelled
        ``t FOR SYSTEM_TIME AS OF '...'`` (the reference warehouse's
        verb, bigquery_update_scheduler.py:255-260) over a catalog
        table is replaced by a temp view bound to the era-aware
        ``read_evolved(as_of=version)`` — the same history read the
        Python API serves — re-aliased to the original name unless the
        query supplies its own alias. Timestamps resolve through
        :func:`version_at_timestamp` (manifest-file commit mtimes,
        Delta's mechanism); an out-of-range version or a
        timestamp older than the first commit raises rather than
        silently reading a different snapshot. The same strictness
        covers DANGLING tags: a tag whose pinned version vacuum has
        expired raises the missing-version error here, where the
        library's ``read_committed(as_of=expired)`` reads empty —
        an interactive SQL user should hear 'this ref no longer
        resolves', not get a silently empty training set."""
        pat = re.compile(
            rf"\b({_IDENT})\s+(?:FOR\s+)?"
            rf"(VERSION|TIMESTAMP|SYSTEM_TIME)\s+AS\s+OF\s+"
            rf"('[^']*'|\d+)",
            re.IGNORECASE,
        )
        out: list[str] = []
        last = 0
        for m in pat.finditer(s):
            name, axis, lit = m.group(1), m.group(2).upper(), m.group(3)
            if not self._exists(name):
                continue  # not a catalog table: leave for spark.sql
            p = self.path(name)
            if axis == "VERSION":
                if lit.startswith("'"):
                    # Iceberg's ref form: VERSION AS OF '<tag>' — an
                    # immutable named snapshot resolves to its pinned
                    # version (t__tags lists them)
                    tag = lit[1:-1]
                    tags = list_tags(p)
                    if tag not in tags:
                        raise ValueError(
                            f"table {name!r} has no tag {tag!r}; "
                            f"tags: {sorted(tags)}"
                        )
                    v = tags[tag]
                else:
                    v = int(lit)
                versions = committed_versions(p)
                if v not in versions:
                    raise ValueError(
                        f"table {name!r} has no version {v}; committed "
                        f"versions: {versions}"
                    )
            else:  # TIMESTAMP / SYSTEM_TIME
                if not lit.startswith("'"):
                    raise ValueError(
                        f"{axis} AS OF takes a quoted timestamp, got {lit}"
                    )
                v = version_at_timestamp(p, lit[1:-1])
            view = f"{name}__asof_{v}"
            read_evolved(self.spark, p, as_of=v).createOrReplaceTempView(
                view
            )
            alias = re.match(
                rf"\s+(?:AS\s+)?({_IDENT})", s[m.end() :], re.IGNORECASE
            )
            has_alias = (
                alias is not None
                and alias.group(1).upper() not in _NOT_AN_ALIAS
            )
            out.append(s[last : m.start()])
            out.append(view if has_alias else f"{view} AS {name}")
            last = m.end()
        out.append(s[last:])
        return "".join(out)

    def _insert(self, name: str, body: str, branch: str | None) -> DataFrame:
        """The INSERT execution both grammar forms share: run the
        body, conform it to the declared schema (bind by name, coerce
        types, declared order), write through the exactly-once writer
        — to MAIN or, for WAP, as a BRANCH-STAGED commit invisible to
        main readers until publish."""
        return self._conform_and_write(name, self.sql(body), branch)

    def _conform(self, name: str, df: DataFrame) -> DataFrame:
        """SQL INSERT conformance: bind by name, coerce to the
        declared column types (a literal 100 arrives as INT even into
        a BIGINT column), declared order."""
        sch = table_schema(self._require(name))
        if sch is None:
            return df
        have = set(df.columns)
        need = {f.name for f in sch.fields}
        if have != need:
            raise ValueError(
                f"INSERT INTO {name} columns {sorted(have)} != "
                f"table columns {sorted(need)}"
            )
        from pyspark.sql import functions as F

        return df.select(
            *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                for f in sch.fields
            ]
        )

    def _conform_and_write(
        self,
        name: str,
        df: DataFrame,
        branch: str | None,
        props: dict | None = None,
    ) -> DataFrame:
        p = self._require(name)
        df = self._conform(name, df)
        from olap_project_spark.export.manifest_sink import (
            current_partition_spec,
            enforce_constraints,
            write_partitioned,
        )

        if current_partition_spec(p):
            # writers inherit the table's declared layout
            # (Iceberg-style): range-partition on the transforms so
            # files stay tight and the histograms/pruning hold
            # (write_partitioned enforces table constraints itself)
            from olap_project_spark.export.manifest_sink import commit_rows

            v = write_partitioned(
                self.spark, df, p, branch=branch, props=props
            )
            n_rows = commit_rows(p, v, branch=branch)
        else:
            import json as _json

            enforce_constraints(self.spark, p, df, "INSERT")
            opts = {}
            if branch is not None:
                opts["branch"] = branch
            if props is not None:
                opts["commit_props"] = _json.dumps(props)
            n_rows = save_manifest(df, p, **opts)["n_rows"]
        # rows from the commit metadata, not a re-run of the insert body
        out = {"table": name, "rows": n_rows}
        if branch is not None:
            out["branch"] = branch
        return self._one_row(**out)

    def _rewrite_branch_reads(self, s: str) -> str:
        """Resolve ``FROM t BRANCH b`` — the audit read of
        write-audit-publish: main's committed state PLUS the branch's
        staged commits (``read_committed(branch=b)``), which is
        exactly what publish would make main. Non-catalog identifiers
        pass through untouched."""
        pat = re.compile(
            rf"\b({_IDENT})\s+BRANCH\s+({_IDENT})\b", re.IGNORECASE
        )
        out: list[str] = []
        last = 0
        for m in pat.finditer(s):
            name, branch = m.group(1), m.group(2)
            if not self._exists(name):
                continue  # not a catalog table: leave for spark.sql
            if branch.upper() in _NOT_AN_ALIAS:
                # `FROM t branch JOIN …` — an alias literally named
                # "branch" followed by a keyword, not a branch read
                continue
            p = self.path(name)
            live = list_branches(p)
            if branch not in live:
                # same strictness as dangling tags: a typo'd,
                # already-published, or abandoned branch must not
                # silently audit as main's state — the WAP gate would
                # 'pass' against the wrong data
                raise ValueError(
                    f"table {name!r} has no staged branch {branch!r}; "
                    f"staged branches: {sorted(live)}"
                )
            view = f"{name}__branch_{branch}"
            read_committed(
                self.spark, p, table_schema(p), branch=branch
            ).createOrReplaceTempView(view)
            alias = re.match(
                rf"\s+(?:AS\s+)?({_IDENT})", s[m.end() :], re.IGNORECASE
            )
            has_alias = (
                alias is not None
                and alias.group(1).upper() not in _NOT_AN_ALIAS
            )
            out.append(s[last : m.start()])
            out.append(view if has_alias else f"{view} AS {name}")
            last = m.end()
        out.append(s[last:])
        return "".join(out)

    def _rewrite_table_changes(self, s: str) -> str:
        """Resolve the Delta-spelled CDF table function:
        ``table_changes('t', start[, end])`` — every row changed by
        commits ``start..end`` INCLUSIVE (Delta's convention; ``end``
        defaults to the head), tagged ``_change_type``
        ('insert'|'delete') and ``_commit_version`` — becomes a temp
        view over the library's :func:`read_changes` (whose range is
        exclusive-start, so ``start-1`` is passed). The same contract
        applies: a rewrite (compaction) inside the range raises, so an
        answer returned is an answer proved."""
        pat = re.compile(
            rf"\btable_changes\s*\(\s*'({_IDENT})'\s*,\s*(\d+)\s*"
            rf"(?:,\s*(\d+)\s*)?\)",
            re.IGNORECASE,
        )
        out: list[str] = []
        last = 0
        for m in pat.finditer(s):
            name, start = m.group(1), int(m.group(2))
            p = self._require(name)
            head = max(committed_versions(p), default=0)
            end = int(m.group(3)) if m.group(3) is not None else head
            if not 1 <= start <= end <= head:
                raise ValueError(
                    f"table_changes range [{start}, {end}] out of "
                    f"bounds for table {name!r} (head {head})"
                )
            view = f"{name}__changes_{start}_{end}"
            read_changes(
                self.spark, p, table_schema(p), start - 1, end
            ).createOrReplaceTempView(view)
            out.append(s[last : m.start()])
            out.append(view)
            last = m.end()
        out.append(s[last:])
        return "".join(out)

    # ----------------------------------------------------------------- sql
    def sql(self, statement: str) -> DataFrame:
        s = statement.strip().rstrip(";").strip()

        m = re.match(
            rf"(?i)^CREATE\s+TABLE\s+({_IDENT})\s+CLONE\s+({_IDENT})"
            rf"(?:\s+VERSION\s+AS\s+OF\s+(\d+))?$",
            s,
        )
        if m:
            # zero-copy clone (Delta SHALLOW CLONE strengthened to
            # full-history): manifests replayed, data files
            # hard-linked — cloning a 100-TB table moves no bytes
            dst, src, ver = m.groups()
            if self._exists(dst):
                raise ValueError(f"table {dst!r} already exists")
            from olap_project_spark.export.manifest_sink import (
                clone_table,
            )

            r = clone_table(
                self._require(src),
                self.path(dst),
                as_of=int(ver) if ver is not None else None,
            )
            return self._one_row(
                table=dst,
                source=src,
                versions_cloned=r["versions_cloned"],
                files_linked=r["files_linked"],
                head_version=r["head_version"],
            )

        m = re.match(
            rf"(?is)^CREATE\s+TABLE\s+({_IDENT})\s+AS\s+(.+)$", s
        )
        if m and not re.match(r"(?i)^CREATE\s+MATERIALIZED", s):
            name, body = m.group(1), m.group(2)
            if self._exists(name):
                raise ValueError(f"table {name!r} already exists")
            df = self.sql(body)
            st = save_manifest(df, self.path(name))
            # rows from the commit messages — the CTAS body is
            # evaluated exactly once (re-counting re-runs the SELECT)
            return self._one_row(table=name, rows=st["n_rows"])

        m = re.match(
            rf"(?is)^CREATE\s+TABLE\s+({_IDENT})\s*\((.+?)\)\s*"
            rf"(?:PARTITIONED\s+BY\s*\((.+)\)\s*)?$",
            s,
        )
        if m and not re.match(r"(?i)^CREATE\s+MATERIALIZED", s):
            name, col_list, part_spec = m.group(1), m.group(2), m.group(3)
            if self._exists(name):
                raise ValueError(f"table {name!r} already exists")
            cols, constraints = [], []
            for item in self._split_select(col_list):
                km = re.match(
                    rf"(?is)^\s*CONSTRAINT\s+({_IDENT})\s+CHECK\s*"
                    rf"\((.+)\)\s*$",
                    item,
                )
                if km:
                    # inline table constraint (standard SQL shape) —
                    # recorded after the schema commit so the table is
                    # born guarded
                    constraints.append((km.group(1), km.group(2).strip()))
                    continue
                cm = re.match(
                    rf"(?s)^\s*({_IDENT})\s+([A-Za-z0-9_<>,() ]+?)\s*$",
                    item,
                )
                if not cm:
                    raise ValueError(
                        f"cannot parse column definition {item.strip()!r}"
                    )
                cols.append(f"{cm.group(1)} {cm.group(2).strip().lower()}")
            # an empty commit that RECORDS the schema: the manifest is
            # the metastore entry; the first INSERT appends under it
            # (and schema evolution validates against it)
            empty = local_frame(self.spark, [], ", ".join(cols))
            save_manifest(empty.coalesce(1), self.path(name))
            if part_spec is not None:
                # hidden partitioning from birth: writers inherit the
                # spec, files prune under it (Iceberg CREATE ...
                # PARTITIONED BY transforms)
                set_partition_spec(
                    self.path(name), self._parse_transforms(part_spec)
                )
            if constraints:
                from olap_project_spark.export.manifest_sink import (
                    add_constraint,
                )

                for cn, ce in constraints:
                    add_constraint(self.spark, self.path(name), cn, ce)
            return self._one_row(table=name, rows=0)

        m = re.match(
            rf"(?is)^COPY\s+INTO\s+({_IDENT})\s+FROM\s+'([^']+)'\s+"
            rf"FILEFORMAT\s*=\s*(PARQUET|CSV|JSON)"
            rf"(?:\s+PATTERN\s*=\s*'([^']+)')?$",
            s,
        )
        if m:
            # bulk file ingest (Databricks COPY INTO shape): read the
            # staged files, conform to the declared schema, land ONE
            # exactly-once commit. IDEMPOTENT the way Databricks is:
            # every commit records the source files it loaded
            # (copy_loaded in commit_props), and a re-run loads only
            # files no prior commit recorded — a retried statement
            # whose write actually landed appends nothing
            name, src, fmt, pattern = m.groups()
            p = self._require(name)
            target = os.path.join(src, pattern) if pattern else src

            def _read(paths):
                if fmt.upper() == "CSV":
                    # header binds columns BY NAME (all-string);
                    # _conform_and_write casts to the declared types.
                    # Applying the declared schema to the reader would
                    # bind POSITIONALLY and silently mis-assign a file
                    # whose header order differs from the table's.
                    return self.spark.read.option("header", True).csv(
                        paths
                    )
                if fmt.upper() == "JSON":
                    # JSONL: keys bind by name already; types cast by
                    # the declared schema in _conform_and_write
                    return self.spark.read.json(
                        [paths] if isinstance(paths, str) else paths
                    )
                if isinstance(paths, str):
                    return self.spark.read.parquet(paths)
                return self.spark.read.parquet(*paths)

            probe = _read(target)
            loaded: set[str] = set()
            for h in table_history(p):
                loaded.update((h.get("props") or {}).get("copy_loaded", []))
            new_files = sorted(set(probe.inputFiles()) - loaded)
            if not new_files:
                return self._one_row(
                    table=name, rows=0, skipped_files=len(loaded)
                )
            return self._conform_and_write(
                name,
                _read(new_files),
                branch=None,
                props={"copy_loaded": new_files},
            )

        m = re.match(
            rf"(?is)^INSERT\s+OVERWRITE\s+({_IDENT})\s+"
            rf"(?:WHERE\s+({_IDENT})\s+"
            rf"(?:BETWEEN\s+('[^']*'|\S+)\s+AND\s+('[^']*'|\S+)"
            rf"|=\s*('[^']*'|\S+))\s+)?"
            rf"(SELECT\s+.+)$",
            s,
        )
        if m:
            # atomic overwrite: the full-table form is ONE rewrite
            # commit whose live file list is the SELECT's result
            # (truncate+insert with snapshot isolation); the WHERE
            # form is Delta's replaceWhere — rows in the range are
            # replaced in the SAME commit, files outside the range are
            # retained byte-identical (planned from zone maps /
            # hidden-partition ranges), and replacement rows that
            # violate the range REJECT before anything commits
            name, col, lo, hi, eq, body = m.groups()
            self._require(name)
            df = self._conform(name, self.sql(body))
            from olap_project_spark.export.manifest_sink import (
                overwrite_table,
                replace_where,
            )

            if col is None:
                from olap_project_spark.export.manifest_sink import (
                    commit_rows,
                )

                v = overwrite_table(self.spark, self.path(name), df)
                # the rewrite writes exactly df: report its recorded
                # row count instead of re-running the SELECT
                return self._one_row(
                    table=name, rows=commit_rows(self.path(name), v),
                    version=v
                )
            if eq is not None:
                lo = hi = eq
            lo_v, hi_v = self._parse_literal(lo), self._parse_literal(hi)
            sch = table_schema(self.path(name))
            r = replace_where(
                self.spark, self.path(name), sch, col, lo_v, hi_v, df
            )
            return self._one_row(
                table=name,
                rows=r["n_insert_rows"],
                version=r["version"],
                replaced_files=r["n_replaced_files"],
                retained_files=r["n_retained"],
            )

        m = re.match(
            rf"(?is)^INSERT\s+INTO\s+({_IDENT})\s+BRANCH\s+"
            rf"({_IDENT})\s+(.+)$",
            s,
        )
        if m:
            # WAP staging: a branch-tagged commit invisible to main
            # readers until ALTER TABLE ... PUBLISH BRANCH
            return self._insert(m.group(1), m.group(3), branch=m.group(2))

        m = re.match(
            rf"(?is)^INSERT\s+INTO\s+({_IDENT})\s+(.+)$", s
        )
        if m:
            return self._insert(m.group(1), m.group(2), branch=None)

        m = re.match(
            rf"(?is)^DELETE\s+FROM\s+({_IDENT})\s+WHERE\s+(.+)$", s
        )
        if m:
            name, pred = m.group(1), m.group(2)
            p = self._require(name)
            # row-level equality delete: the predicate selects the
            # victim KEY ROWS over the table's full column set — an
            # Iceberg-v2 tombstone commit, zero data files rewritten.
            # Duplicated rows matching the predicate all disappear
            # (equality semantics), exactly like the library call.
            self._register_catalog(s)
            # persist: the count decides whether a delete commit is
            # needed, and the tombstone write then reuses the
            # materialized keys instead of re-scanning the table
            keys = self.spark.sql(
                f"SELECT DISTINCT * FROM {name} WHERE {pred}"
            ).persist()
            try:
                n = keys.count()
                if n:
                    # REBALANCE: the tombstone frame inherits the
                    # DISTINCT's full exchange width (32 partitions →
                    # 32 tiny files per delete, each stat'ed and
                    # anti-joined by every later read); AQE resizes
                    # the write to the advisory partition size instead
                    # — one file at gate scale, byte-sized files at
                    # 100 TB (guide §6: coalesce on write)
                    v = delete_where(self.spark, p, keys.hint("rebalance"))
                else:
                    v = None
            finally:
                keys.unpersist()
            return self._one_row(table=name, matched_keys=n, version=v)

        m = re.match(
            rf"(?is)^UPDATE\s+({_IDENT})\s+SET\s+(.+?)"
            rf"(?:\s+WHERE\s+(.+))?$",
            s,
        )
        if m:
            name, set_list, pred = m.group(1), m.group(2), m.group(3)
            p = self._require(name)
            assignments: dict[str, str] = {}
            for item in self._split_select(set_list):
                am = re.match(
                    rf"(?s)^\s*({_IDENT})\s*=\s*(.+?)\s*$", item
                )
                if not am:
                    raise ValueError(
                        f"cannot parse SET assignment {item.strip()!r}; "
                        "expected col = expr"
                    )
                col = am.group(1)
                if col in assignments:
                    raise ValueError(f"column {col!r} SET twice")
                assignments[col] = am.group(2)
            r = update_where(
                self.spark, p, assignments, pred if pred else "true"
            )
            return self._one_row(
                table=name,
                version=r["version"],
                n_updated=r["n_updated"],
            )

        m = re.match(
            rf"(?is)^MERGE\s+INTO\s+({_IDENT})\s+USING\s+\((.+)\)\s+"
            rf"ON\s+\(?\s*({_IDENT}(?:\s*,\s*{_IDENT})*)\s*\)?\s+"
            rf"(WHEN\s+.+)$",
            s,
        )
        if m:
            return self._merge(
                m.group(1),
                m.group(2),
                [k.strip() for k in m.group(3).split(",")],
                m.group(4).strip(),
            )

        m = re.match(
            rf"(?is)^ALTER\s+TABLE\s+({_IDENT})\s+ADD\s+CONSTRAINT\s+"
            rf"({_IDENT})\s+CHECK\s*\((.+)\)$",
            s,
        )
        if m:
            # table-level CHECK constraint (Delta shape): existing
            # rows are validated NOW; every later write re-validates
            # and rejects whole commits on violation
            from olap_project_spark.export.manifest_sink import (
                add_constraint,
            )

            v = add_constraint(
                self.spark,
                self._require(m.group(1)),
                m.group(2),
                m.group(3).strip(),
            )
            return self._one_row(
                table=m.group(1), constraint=m.group(2), version=v
            )

        m = re.match(
            rf"(?i)^ALTER\s+TABLE\s+({_IDENT})\s+DROP\s+CONSTRAINT\s+"
            rf"({_IDENT})$",
            s,
        )
        if m:
            from olap_project_spark.export.manifest_sink import (
                drop_constraint,
            )

            v = drop_constraint(self._require(m.group(1)), m.group(2))
            return self._one_row(
                table=m.group(1), constraint=m.group(2), version=v
            )

        m = re.match(
            rf"(?i)^ALTER\s+TABLE\s+({_IDENT})\s+RENAME\s+COLUMN\s+"
            rf"({_IDENT})\s+TO\s+({_IDENT})$",
            s,
        )
        if m:
            v = rename_column(self._require(m.group(1)), m.group(2), m.group(3))
            return self._one_row(table=m.group(1), version=v)

        m = re.match(
            rf"(?i)^ALTER\s+TABLE\s+({_IDENT})\s+DROP\s+COLUMN\s+"
            rf"({_IDENT})$",
            s,
        )
        if m:
            v = drop_column(self._require(m.group(1)), m.group(2))
            return self._one_row(table=m.group(1), version=v)

        m = re.match(
            rf"(?i)^ALTER\s+TABLE\s+({_IDENT})\s+ADD\s+COLUMN\s+"
            rf"({_IDENT})\s+([A-Za-z0-9_<>,() ]+?)$",
            s,
        )
        if m:
            v = add_column(
                self._require(m.group(1)),
                m.group(2),
                m.group(3).strip().lower(),
            )
            return self._one_row(table=m.group(1), version=v)

        m = re.match(
            rf"(?i)^ALTER\s+TABLE\s+({_IDENT})\s+ALTER\s+COLUMN\s+"
            rf"({_IDENT})\s+TYPE\s+([A-Za-z0-9_<>,() ]+?)$",
            s,
        )
        if m:
            v = widen_column(
                self._require(m.group(1)),
                m.group(2),
                m.group(3).strip().lower(),
            )
            return self._one_row(table=m.group(1), version=v)

        m = re.match(
            rf"(?i)^ALTER\s+TABLE\s+({_IDENT})\s+SET\s+PARTITION\s+"
            rf"SPEC\s*\((.+)\)$",
            s,
        )
        if m:
            v = set_partition_spec(
                self._require(m.group(1)),
                self._parse_transforms(m.group(2)),
            )
            return self._one_row(table=m.group(1), version=v)

        m = re.match(
            rf"(?i)^ALTER\s+TABLE\s+({_IDENT})\s+PUBLISH\s+BRANCH\s+"
            rf"({_IDENT})$",
            s,
        )
        if m:
            # the WAP gate: fast-forward the branch's staged commits
            # into main, oldest first — each commit flip is atomic
            # (os.replace), so a concurrent reader observes a
            # MONOTONIC PREFIX of the staged sequence (exactly what it
            # would see had those commits landed on main directly); a
            # crash mid-publish leaves the suffix staged and a
            # re-publish resumes
            published = publish_branch(
                self._require(m.group(1)), m.group(2)
            )
            return self._one_row(
                table=m.group(1),
                branch=m.group(2),
                published=len(published),
            )

        m = re.match(
            rf"(?i)^ALTER\s+TABLE\s+({_IDENT})\s+ABANDON\s+BRANCH\s+"
            rf"({_IDENT})$",
            s,
        )
        if m:
            # red audit: drop the staged commits; pure metadata GC,
            # main never saw them
            n = abandon_branch(self._require(m.group(1)), m.group(2))
            return self._one_row(
                table=m.group(1), branch=m.group(2), abandoned=n
            )

        m = re.match(
            rf"(?i)^ALTER\s+TABLE\s+({_IDENT})\s+CREATE\s+TAG\s+"
            rf"({_IDENT})(?:\s+AS\s+OF\s+VERSION\s+(\d+))?$",
            s,
        )
        if m:
            # Iceberg's ALTER TABLE … CREATE TAG: an immutable named
            # ref to a committed snapshot (defaults to the head);
            # readable as VERSION AS OF '<tag>' and listed by t__tags
            v = tag_snapshot(
                self._require(m.group(1)),
                m.group(2),
                int(m.group(3)) if m.group(3) is not None else None,
            )
            return self._one_row(
                table=m.group(1), tag=m.group(2), version=v
            )

        m = re.match(
            rf"(?i)^ALTER\s+TABLE\s+({_IDENT})\s+DROP\s+TAG\s+"
            rf"({_IDENT})$",
            s,
        )
        if m:
            existed = drop_tag(self._require(m.group(1)), m.group(2))
            if not existed:
                raise ValueError(
                    f"table {m.group(1)!r} has no tag {m.group(2)!r}"
                )
            return self._one_row(table=m.group(1), tag=m.group(2))

        if re.match(rf"(?i)^ALTER\s+TABLE\s+{_IDENT}\b", s):
            raise ValueError(
                f"unsupported ALTER TABLE verb: {s!r} (supported: "
                "RENAME COLUMN, DROP COLUMN, ADD COLUMN, "
                "ALTER COLUMN TYPE, SET PARTITION SPEC, "
                "CREATE TAG [AS OF VERSION n], DROP TAG, "
                "PUBLISH BRANCH, ABANDON BRANCH)"
            )

        m = re.match(
            rf"(?i)^RESTORE\s+TABLE\s+({_IDENT})\s+TO\s+VERSION\s+"
            rf"AS\s+OF\s+(\d+)$",
            s,
        )
        if m:
            v = restore_table(self._require(m.group(1)), int(m.group(2)))
            return self._one_row(table=m.group(1), version=v)

        m = re.match(
            rf"(?i)^RESTORE\s+TABLE\s+({_IDENT})\s+TO\s+"
            rf"(?:TIMESTAMP|SYSTEM_TIME)\s+AS\s+OF\s+'([^']*)'$",
            s,
        )
        if m:
            p = self._require(m.group(1))
            v = restore_table(p, version_at_timestamp(p, m.group(2)))
            return self._one_row(table=m.group(1), version=v)

        m = re.match(
            rf"(?i)^DROP\s+(?:TABLE|MATERIALIZED\s+VIEW)\s+({_IDENT})$",
            s,
        )
        if m:
            import shutil

            name = m.group(1)
            # the parsed-log cache self-heals: a vanished directory
            # fingerprints to None (empty log), and a new table later
            # created at the same path re-fingerprints fresh
            shutil.rmtree(self._require(name))
            try:
                self.spark.catalog.dropTempView(name)
            except Exception:  # noqa: BLE001 — never registered: fine
                pass
            return self._one_row(table=name, dropped=True)

        m = re.match(
            rf"(?i)^OPTIMIZE\s+({_IDENT})\s+WHERE\s+({_IDENT})\s+"
            rf"BETWEEN\s+('[^']*'|-?\d+(?:\.\d+)?)\s+AND\s+"
            rf"('[^']*'|-?\d+(?:\.\d+)?)$",
            s,
        )
        if m:
            # PARTIAL compaction — Delta's OPTIMIZE-with-predicate /
            # Iceberg rewrite_data_files-with-filter: rewrites only
            # the files whose zone maps overlap [lo, hi]; at 100 TB
            # this is the only compaction anyone runs
            from olap_project_spark.export.manifest_sink import (
                compact_range,
            )

            name, col, lo, hi = m.groups()
            p = self._require(name)
            r = compact_range(
                self.spark,
                p,
                table_schema(p),
                col,
                self._parse_literal(lo),
                self._parse_literal(hi),
            )
            return self._one_row(table=name, **r)

        m = re.match(
            rf"(?i)^OPTIMIZE\s+({_IDENT})"
            rf"(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?$",
            s,
        )
        if m:
            cluster = (
                [c.strip() for c in m.group(2).split(",")]
                if m.group(2)
                else None
            )
            v = compact_snapshots(
                self.spark, self._require(m.group(1)), None,
                cluster_by=cluster,
            )
            return self._one_row(table=m.group(1), version=v)

        m = re.match(
            rf"(?is)^ANALYZE\s+TABLE\s+({_IDENT})\s+COMPUTE\s+"
            rf"STATISTICS\s+FOR\s+COLUMNS\s*\((.+)\)$",
            s,
        )
        if m:
            # per-file KMV NDV sketches as a metadata-only commit —
            # incremental: files already sketched are skipped, so the
            # steady-state cost is one pass over NEW files only; the
            # merged counts surface through t__ndv (zero data files)
            name, col_list = m.group(1), m.group(2)
            p = self._require(name)
            from olap_project_spark.export.manifest_sink import (
                analyze_table,
            )

            cols = [c.strip() for c in col_list.split(",") if c.strip()]
            r = analyze_table(self.spark, p, cols)
            return self._one_row(
                table=name,
                version=r["version"],
                files_analyzed=r["n_files_analyzed"],
                sketches=r["n_sketches"],
            )

        m = re.match(
            rf"(?i)^VACUUM\s+({_IDENT})"
            rf"(?:\s+RETAIN\s+FROM\s+VERSION\s+(\d+))?$",
            s,
        )
        if m:
            # RETAIN FROM VERSION n = Iceberg expire_snapshots'
            # retain-last boundary: versions below n expire, n and
            # above stay time-travelable
            name, keep = m.group(1), m.group(2)
            r = vacuum_snapshots(
                self._require(name),
                keep_from=int(keep) if keep is not None else None,
            )
            return self._one_row(table=name, **r)

        m = re.match(rf"(?i)^SHOW\s+PARTITIONS\s+({_IDENT})$", s)
        if m:
            # per-partition row/file counts from the log alone
            # (table$partitions) — zero data files opened
            from olap_project_spark.export.manifest_sink import (
                table_partitions,
            )

            p = self._require(m.group(1))
            try:
                tp = table_partitions(p, strict=False)
            except ValueError as e:
                raise ValueError(
                    f"table {m.group(1)!r} records no partition "
                    f"spec: {e}"
                ) from None
            return local_frame(self.spark, 
                [
                    (str(e["partition"]), e["n_rows"], e["n_files"])
                    for e in tp["partitions"]
                ]
                or [("", 0, 0)],
                "partition string, n_rows bigint, n_files int",
            ).filter("partition <> ''")

        m = re.match(rf"(?is)^EXPLAIN\s+(SELECT\s+.+)$", s)
        if m:
            # the optimizer's plan for a catalog query — time-travel
            # and branch reads resolve first, so the plan shown is the
            # plan that runs
            body = self._rewrite_time_travel(
                self._rewrite_branch_reads(m.group(1))
            )
            self._register_catalog(body)
            return self.spark.sql(f"EXPLAIN {body}")

        if re.match(r"(?i)^SHOW\s+TABLES$", s):
            from olap_project_spark.export.matview import _meta_path

            rows = [
                (
                    n,
                    "materialized_view"
                    if os.path.exists(_meta_path(self.path(n)))
                    else "table",
                )
                for n in self._tables()
            ]
            return local_frame(self.spark, 
                rows or [("", "")], "name string, kind string"
            ).filter("name <> ''")

        m = re.match(rf"(?i)^SHOW\s+CREATE\s+TABLE\s+({_IDENT})$", s)
        if m:
            name = m.group(1)
            p = self._require(name)
            sch = table_schema(p)
            if sch is None:
                raise ValueError(f"table {name!r} records no schema")
            from olap_project_spark.export.manifest_sink import (
                current_partition_spec,
            )

            from olap_project_spark.export.manifest_sink import (
                table_constraints as _tcs,
            )

            cols = ", ".join(
                f"{f.name} {f.dataType.simpleString().upper()}"
                for f in sch.fields
            )
            for cn, ce in sorted(_tcs(p).items()):
                # inline table-constraint clauses: the emitted DDL
                # re-creates the table GUARDED, not just shaped
                cols += f", CONSTRAINT {cn} CHECK ({ce})"
            ddl = f"CREATE TABLE {name} ({cols})"
            spec = current_partition_spec(p)
            if spec:
                ddl += " PARTITIONED BY (" + ", ".join(
                    t["col"]
                    if t["kind"] == "identity"
                    else (
                        f"{t['kind']}({t['col']}, {t['arg']})"
                        if t.get("arg") is not None
                        else f"{t['kind']}({t['col']})"
                    )
                    for t in spec
                ) + ")"
            return self._one_row(createtab_stmt=ddl)

        m = re.match(rf"(?i)^DESCRIBE\s+DETAIL\s+({_IDENT})$", s)
        if m:
            # Delta's DESCRIBE DETAIL: one row of table-level facts,
            # folded from the manifest log alone (zero data files)
            name = m.group(1)
            p = self._require(name)
            from olap_project_spark.export.manifest_sink import (
                current_partition_spec,
            )
            from olap_project_spark.export.manifest_sink import (
                table_constraints as _tc,
            )

            files = table_files(p)
            hist = table_history(p)
            spec = current_partition_spec(p)
            # num_rows is STRICT: metadata_aggregate proves the exact
            # live count (tombstones folded) or raises — summing live
            # files' n_rows would overstate a table with
            # unmaterialized deletes/merges, a metadata surface
            # silently disagreeing with every read
            from olap_project_spark.export.manifest_sink import (
                metadata_aggregate,
            )

            try:
                n_rows = metadata_aggregate(p)["n_rows"]
            except ValueError:
                n_rows = "unknown (unmaterialized row-level changes; OPTIMIZE to materialize)"
            return self._one_row(
                name=name,
                location=p,
                format="manifest_sink/parquet",
                num_files=len(files),
                num_rows=n_rows,
                head_version=max(
                    (h["version"] for h in hist), default=0
                ),
                partition_spec=", ".join(
                    f"{t['kind']}({t['col']}"
                    + (f", {t['arg']}" if t.get("arg") is not None else "")
                    + ")"
                    for t in spec
                )
                if spec
                else "",
                num_tags=len(list_tags(p)),
                num_constraints=len(_tc(p)),
            )

        m = re.match(rf"(?i)^DESCRIBE\s+({_IDENT})$", s)
        if m:
            sch = table_schema(self._require(m.group(1)))
            if sch is None:
                raise ValueError(
                    f"table {m.group(1)!r} records no schema"
                )
            return local_frame(self.spark, 
                [
                    (f.name, f.dataType.simpleString())
                    for f in sch.fields
                ],
                "col_name string, data_type string",
            )

        m = re.match(rf"(?i)^DESCRIBE\s+HISTORY\s+({_IDENT})$", s)
        if m:
            hist = table_history(self._require(m.group(1)))
            return local_frame(self.spark, 
                [
                    (h["version"], h["kind"], h["n_files"], h["n_rows"])
                    for h in hist
                ],
                "version int, kind string, n_files int, n_rows bigint",
            )

        m = re.match(
            rf"(?is)^CREATE\s+MATERIALIZED\s+VIEW\s+({_IDENT})\s+AS\s+"
            rf"SELECT\s+(.+?)\s+FROM\s+({_IDENT})"
            rf"(?:\s+JOIN\s+({_IDENT})\s+USING\s*\(([^)]+)\))?"
            rf"(?:\s+WHERE\s+(.+?))?"
            rf"\s+GROUP\s+BY\s+(.+)$",
            s,
        )
        if m:
            from olap_project_spark.export.matview import mv_create

            view, select_list, base, dim, using, where, group_by = (
                m.groups()
            )
            keys = [k.strip() for k in re.split(r"\s*,\s*", group_by)]
            aggs = []
            for item in self._split_select(select_list):
                if item.strip() in keys:
                    continue
                am = re.fullmatch(
                    r"(?is)SUM\s*\((.+)\)\s+AS\s+(" + _IDENT + ")",
                    item.strip(),
                )
                if am:
                    aggs.append(
                        {"expr": am.group(1).strip(), "as": am.group(2)}
                    )
                    continue
                am = re.fullmatch(
                    r"(?is)COUNT\s*\(\s*\*\s*\)\s+AS\s+(" + _IDENT + ")",
                    item.strip(),
                )
                if am:
                    aggs.append({"expr": "1", "as": am.group(1)})
                    continue
                am = re.fullmatch(
                    r"(?is)COUNT\s*\((.+)\)\s+AS\s+(" + _IDENT + ")",
                    item.strip(),
                )
                if am:
                    aggs.append(
                        {
                            "expr": am.group(1).strip(),
                            "as": am.group(2),
                            "fn": "count",
                        }
                    )
                    continue
                am = re.fullmatch(
                    r"(?is)(AVG|MIN|MAX)\s*\((.+)\)\s+AS\s+("
                    + _IDENT
                    + ")",
                    item.strip(),
                )
                if am:
                    aggs.append(
                        {
                            "expr": am.group(2).strip(),
                            "as": am.group(3),
                            "fn": am.group(1).lower(),
                        }
                    )
                    continue
                raise ValueError(
                    f"materialized views support GROUP BY keys, "
                    f"SUM(expr) AS name, COUNT(*)/COUNT(expr) AS name, "
                    f"AVG(expr) AS name, and MIN/MAX(expr) AS name "
                    f"(MIN/MAX refresh incrementally on insert-only "
                    f"ranges and full-recompute past deletes); got "
                    f"{item.strip()!r}"
                )
            spec: dict = {"group_by": keys, "aggs": aggs}
            if dim is not None:
                spec["join"] = {
                    "path": self._require(dim),
                    "using": [
                        c.strip() for c in re.split(r"\s*,\s*", using)
                    ],
                }
            if where is not None:
                spec["where"] = where.strip()
            meta = mv_create(
                self.spark,
                self.path(view),
                self._require(base),
                spec,
            )
            return self._one_row(view=view, base_version=meta["base_version"])

        m = re.match(
            rf"(?i)^REFRESH\s+MATERIALIZED\s+VIEW\s+({_IDENT})$", s
        )
        if m:
            from olap_project_spark.export.matview import mv_refresh

            r = mv_refresh(self.spark, self._require(m.group(1)))
            return self._one_row(
                view=m.group(1), mode=r["mode"], to_version=r["to_version"]
            )

        # relational fall-through: catalog tables resolve as views,
        # time-travel clauses resolve to as-of temp views, and only
        # the tables the statement references register (lazy — a
        # SELECT over one table folds one table's log, not the
        # catalog's)
        s = self._rewrite_table_changes(s)
        s = self._rewrite_branch_reads(s)
        s = self._rewrite_time_travel(s)
        self._register_catalog(s)
        return self.spark.sql(s)

    @staticmethod
    def _split_select(select_list: str) -> list[str]:
        """Split a select list on top-level commas (commas inside
        parentheses — SUM(a + b), COUNT(*) — don't split)."""
        out, depth, cur = [], 0, []
        for ch in select_list:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                out.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if cur:
            out.append("".join(cur))
        return out
