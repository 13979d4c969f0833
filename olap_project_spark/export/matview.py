"""MATERIALIZED VIEWS over the manifest table, with CDF-driven
incremental refresh — the lakehouse MV maintenance loop
(Delta Live Tables materialized views / Snowflake MVs / the classic
self-maintainable-view literature), Spark-first.

View class: KEYED AGGREGATES — ``GROUP BY k1..kn`` with integer SUM
aggregates, non-null COUNTs, and AVGs, the self-maintainable family:
every base-table change folds into the view as a SIGNED delta (+row
for an insert, −row for a delete), so a refresh costs O(|changes|),
never a base re-scan. Sums are exact integers (the engine's
cross-engine convention — express money as cents in the agg expr).
AVG is stored as its exact (sum, non-null count) pair in hidden state
columns and derived at read time — the counted-IVM decomposition —
so it stays exactly incremental. MIN/MAX — the classic
non-self-maintainable pair — are supported with the standard demotion
rule (Snowflake MVs make the same trade): an INSERT-ONLY refresh
range folds incrementally (``least``/``greatest`` against the stored
extremum), while any range whose filtered slice carries a delete leg
— which could strand the stored extremum — falls back to the same
ATOMIC full recompute a base rewrite takes. Appends dominate a
lakehouse table's cadence, so the common refresh stays O(changes).

Two relational extensions keep the same exactness:

- **Filtered views** (``spec["where"]``): the predicate applies to the
  full-recompute frame AND to each CDF slice — row-level CDF makes
  filtered IVM exact for free (a row crossing the filter boundary
  appears as delete(old)+insert(new), and the filter keeps exactly the
  legs that were/are in the view).
- **Join views** (``spec["join"]``: fact ⋈ dimension USING equi-keys):
  the view is incrementally maintainable WITH RESPECT TO FACT CHANGES
  — each fact CDF slice joins against the dimension state PINNED at
  the version recorded by the last refresh, the textbook
  IVM-under-stable-dimension case. A dimension commit in the
  unrefreshed range voids that premise, so the refresh falls back to
  an atomic full recompute against the new pinned dimension head
  (exactly as a base rewrite does). Inner-join semantics on both
  paths; dimension column names must not collide with fact columns.

The view itself IS a manifest table, so it inherits time travel,
snapshot isolation, vacuum, and the metadata surfaces. A refresh is
ONE atomic merge commit even when keys must disappear: a key whose
base-row count reaches zero stays in the view's data plane as a
TOMBSTONE ROW (``_mv_count = 0``) that ``mv_read`` filters out — the
classic counted-IVM trick, which keeps every refresh single-commit
(no multi-statement window exists, even for time-travel readers
pinned at any version). ``mv_vacuum`` purges accumulated tombstone
rows as a maintenance operation, exactly as compaction materializes
the base table's deletes.

When the base log crosses a REWRITE (compaction) inside the unrefreshed
range, the row-level CDF is undefined (Delta makes the same demand), so
the refresh falls back to a FULL recompute committed as one rewrite
snapshot — correctness first, and the fallback is itself atomic.

Reference analogue: the reference's Airflow DAG re-aggregates
yesterday's partitions wholesale into BigQuery every day
(bigquery_update_scheduler.py:163-260) — a full recompute on a timer;
here the same freshness costs O(changes) with exactly-once semantics.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from olap_project_spark.export.manifest_sink import (  # noqa: F401 — ensure_manifest_sink re-exported for callers
    committed_versions,
    delete_where,
    ensure_manifest_sink,
    merge_upsert,
    read_changes,
    read_committed,
    read_evolved,
    save_manifest,
    table_history,
    table_schema,
)

_COUNT_COL = "_mv_count"  # internal per-key base-row count (zero ⇒ drop)


def _meta_path(mv_path: str) -> str:
    return os.path.join(mv_path, "_mv.json")


def _load_meta(mv_path: str) -> dict:
    with open(_meta_path(mv_path)) as f:
        return json.load(f)


def _store_meta(mv_path: str, meta: dict) -> None:
    os.makedirs(mv_path, exist_ok=True)
    tmp = os.path.join(mv_path, f"._mv-{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _meta_path(mv_path))


def _applied_base_version(mv_path: str) -> int:
    """The base version the view's OWN COMMIT LOG proves applied: the
    largest ``mv_to`` recorded in any view commit's props. This — not
    ``_mv.json`` — is the exactly-once source of truth: every refresh
    stamps its applied range into the commit it lands, so a crash
    between the commit and the metadata-cache write cannot double-
    apply the range on recovery (the next refresh reconciles from
    here). 0 when the view has no stamped commit (pre-feature logs)."""
    applied = 0
    for h in table_history(mv_path):
        props = h.get("props") or {}
        if "mv_to" in props:
            applied = max(applied, int(props["mv_to"]))
    return applied


def _agg_fn(a: dict) -> str:
    fn = a.get("fn", "sum").lower()
    if fn not in ("sum", "count", "avg", "min", "max"):
        raise ValueError(
            f"materialized views maintain sum/count/avg/min/max, "
            f"not {fn!r}"
        )
    return fn


def _minmax_cols(spec: dict) -> dict[str, str]:
    """{state column: 'min'|'max'} for the spec's MIN/MAX aggregates —
    the non-self-maintainable pair whose presence demotes any refresh
    range containing a delete leg to a full recompute."""
    return {
        a["as"]: _agg_fn(a)
        for a in spec["aggs"]
        if _agg_fn(a) in ("min", "max")
    }


def _state_cols(spec: dict) -> list[str]:
    """The PHYSICAL aggregate columns of the view's state (excluding
    the internal row count): sums and counts store under their own
    names; an avg stores its exact (sum, non-null count) pair in
    hidden columns and is derived at read time."""
    out: list[str] = []
    for a in spec["aggs"]:
        if _agg_fn(a) == "avg":
            out += [f"__mv_sum__{a['as']}", f"__mv_cnt__{a['as']}"]
        else:
            out.append(a["as"])
    return out


def _dim_frame(spark: SparkSession, spec: dict, version: int) -> DataFrame:
    """The join dimension pinned at ``version`` — every maintenance
    path reads the SAME dimension state the recorded ``dim_version``
    names, so incremental folds and recomputes can never mix eras."""
    return read_evolved(spark, spec["join"]["path"], as_of=version)


def _input_frame(
    df: DataFrame, spec: dict, dim: DataFrame | None
) -> DataFrame:
    """The view's relational input: (fact ⋈ dim) then WHERE — applied
    identically to the full-recompute frame and to CDF slices (whose
    ``_change_type``/``_commit_version`` columns pass through), which
    is what makes filtered/joined IVM exact."""
    j = spec.get("join")
    if j is not None:
        if dim is None:
            raise ValueError("join view requires the pinned dimension")
        df = df.join(dim, on=list(j["using"]), how="inner")
    if spec.get("where"):
        df = df.filter(F.expr(spec["where"]))
    return df


def _view_frame(df: DataFrame, spec: dict) -> DataFrame:
    """The full-recompute aggregation: GROUP BY keys with exact
    integer sums / non-null counts (avg as its sum+count pair) + the
    internal row count."""
    aggs = []
    for a in spec["aggs"]:
        fn, e = _agg_fn(a), F.expr(a["expr"])
        if fn == "sum":
            aggs.append(F.sum(e).cast("bigint").alias(a["as"]))
        elif fn == "count":
            aggs.append(F.count(e).cast("bigint").alias(a["as"]))
        elif fn == "min":
            aggs.append(F.min(e).cast("bigint").alias(a["as"]))
        elif fn == "max":
            aggs.append(F.max(e).cast("bigint").alias(a["as"]))
        else:  # avg: exact decomposition
            aggs.append(
                F.sum(e).cast("bigint").alias(f"__mv_sum__{a['as']}")
            )
            aggs.append(
                F.count(e).cast("bigint").alias(f"__mv_cnt__{a['as']}")
            )
    aggs.append(F.count(F.lit(1)).alias(_COUNT_COL))
    return df.groupBy(*spec["group_by"]).agg(*aggs)


def _delta_frame(changes: DataFrame, spec: dict) -> DataFrame:
    """Signed-delta aggregation over a CDF slice: inserts weigh +1,
    deletes −1, so summing weighted values per key yields exactly the
    adjustment the view needs. COUNT legs weigh only non-null expr
    rows — SQL count semantics — so they stay exact under deltas.
    MIN/MAX legs fold the slice's own extremum over INSERT rows only —
    by the caller's contract a slice reaching this path under a
    MIN/MAX spec contains no delete legs (those demote to a full
    recompute), so the insert extremum is the complete adjustment."""
    w = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    ins = F.col("_change_type") == "insert"
    aggs = []
    for a in spec["aggs"]:
        fn, e = _agg_fn(a), F.expr(a["expr"])
        signed_cnt = F.coalesce(
            F.sum(F.when(e.isNotNull(), w)), F.lit(0)
        ).cast("bigint")
        if fn == "sum":
            aggs.append(F.sum(e * w).cast("bigint").alias(a["as"]))
        elif fn == "count":
            aggs.append(signed_cnt.alias(a["as"]))
        elif fn == "min":
            aggs.append(
                F.min(F.when(ins, e)).cast("bigint").alias(a["as"])
            )
        elif fn == "max":
            aggs.append(
                F.max(F.when(ins, e)).cast("bigint").alias(a["as"])
            )
        else:  # avg
            aggs.append(
                F.sum(e * w).cast("bigint").alias(f"__mv_sum__{a['as']}")
            )
            aggs.append(signed_cnt.alias(f"__mv_cnt__{a['as']}"))
    aggs.append(F.sum(w).cast("bigint").alias(_COUNT_COL))
    return changes.groupBy(*spec["group_by"]).agg(*aggs)


def mv_create(
    spark: SparkSession,
    mv_path: str,
    base_path: str,
    spec: dict,
) -> dict:
    """Define a materialized view over a manifest table and run its
    initial full refresh. ``spec`` = {"group_by": [cols], "aggs":
    [{"expr": <integer-valued SQL expr>, "as": name, ["fn": "sum" |
    "count" | "avg" | "min" | "max"]}, ...], ["where": <SQL pred>],
    ["join": {"path": <dim table>, "using": [equi-key cols]}]}. The view definition
    persists beside the view's own manifest log (``_mv.json``), so any
    session can refresh it later. Returns the stored metadata."""
    if os.path.exists(_meta_path(mv_path)):
        raise ValueError(f"materialized view already exists at {mv_path}")
    if not spec.get("group_by") or not spec.get("aggs"):
        raise ValueError("spec needs group_by and at least one agg")
    head = max(committed_versions(base_path), default=0)
    # the era-aware read: equals read_committed for never-renamed
    # bases, and resolves write-era names for renamed ones. PINNED to
    # the head captured above — an unpinned read would include any
    # base commit landing between the two calls while base_version
    # recorded the older head, and the next incremental refresh would
    # re-apply that version's CDF slice and double-count it.
    base = read_evolved(spark, base_path, as_of=head)
    dim = None
    dim_head = None
    j = spec.get("join")
    if j is not None:
        dim_head = max(committed_versions(j["path"]), default=0)
        dim = _dim_frame(spark, spec, dim_head)
        using = set(j["using"])
        missing = using - set(base.columns), using - set(dim.columns)
        if missing[0] or missing[1]:
            raise ValueError(
                f"join keys missing: fact lacks {sorted(missing[0])}, "
                f"dimension lacks {sorted(missing[1])}"
            )
        clash = (set(dim.columns) - using) & set(base.columns)
        if clash:
            raise ValueError(
                f"dimension columns {sorted(clash)} collide with fact "
                "columns; rename them in the dimension table"
            )
    save_manifest(
        _view_frame(_input_frame(base, spec, dim), spec),
        mv_path,
        commit_props=json.dumps({"mv_from": 0, "mv_to": head}),
    )
    meta = {"base": base_path, "spec": spec, "base_version": head}
    if j is not None:
        meta["dim_version"] = dim_head
    _store_meta(mv_path, meta)
    return meta


def mv_status(mv_path: str) -> dict:
    """Freshness: the base version the view reflects vs the base's
    current head, and how many unapplied versions lie between."""
    meta = _load_meta(mv_path)
    head = max(committed_versions(meta["base"]), default=0)
    out = {
        "base": meta["base"],
        "base_version": meta["base_version"],
        "base_head": head,
        "lag_versions": head - meta["base_version"],
        "fresh": head == meta["base_version"],
    }
    j = meta["spec"].get("join")
    if j is not None:
        dim_head = max(committed_versions(j["path"]), default=0)
        out["dim_version"] = meta.get("dim_version")
        out["dim_head"] = dim_head
        out["fresh"] = out["fresh"] and dim_head == meta.get("dim_version")
    return out


def mv_read(spark: SparkSession, mv_path: str) -> DataFrame:
    """The view's current state (exposed columns only — the internal
    count column stays an implementation detail unless the spec
    exposes its own count via ``{"expr": "1", "as": name}``).
    Zero-count tombstone rows (keys whose base rows were all deleted)
    are filtered here, so consumers never see them. AVG aggregates are
    derived from their exact hidden (sum, count) pair — double
    division of exact integer state, NULL when every base value was
    NULL, exactly SQL AVG."""
    meta = _load_meta(mv_path)
    spec = meta["spec"]
    df = read_committed(spark, mv_path, table_schema(mv_path))
    df = df.filter(F.col(_COUNT_COL) > 0)
    exposed = []
    for a in spec["aggs"]:
        if _agg_fn(a) == "avg":
            s, c = f"__mv_sum__{a['as']}", f"__mv_cnt__{a['as']}"
            exposed.append(
                F.when(
                    F.col(c) > 0,
                    F.col(s).cast("double") / F.col(c),
                ).alias(a["as"])
            )
        else:
            exposed.append(F.col(a["as"]))
    return df.select(*spec["group_by"], *exposed)


def mv_refresh(spark: SparkSession, mv_path: str) -> dict:
    """Bring the view up to the base head. Incremental when the
    unrefreshed range is CDF-expressible: the signed delta joins
    against ONLY the view's current state (never the base) and every
    touched key — including keys whose count reaches zero, kept as
    filtered tombstone rows — lands in ONE atomic merge commit, so
    no reader (current or time-traveling) can observe a half-applied
    refresh. Falls back to an atomic full recompute (one rewrite
    snapshot) when the range crosses a base compaction — or when a
    MIN/MAX spec meets a delete leg in the range (the
    non-self-maintainable case). Returns
    {"mode": "noop"|"incremental"|"full", "from_version",
    "to_version", "keys_upserted", "keys_deleted"}."""
    meta = _load_meta(mv_path)
    base_path, spec = meta["base"], meta["spec"]
    # exactly-once recovery: the view's own commit log outranks the
    # metadata cache — a crash after the refresh commit but before the
    # cache write must not re-apply the range
    from_v = max(meta["base_version"], _applied_base_version(mv_path))
    head = max(committed_versions(base_path), default=0)
    j = spec.get("join")
    dim = None
    dim_moved = False
    dim_head = meta.get("dim_version")
    if j is not None:
        dim_now = max(committed_versions(j["path"]), default=0)
        dim_moved = dim_now != dim_head
        dim_head = dim_now
    if head == from_v and not dim_moved:
        if meta["base_version"] != from_v:  # heal the stale cache
            meta["base_version"] = from_v
            _store_meta(mv_path, meta)
        return {
            "mode": "noop",
            "from_version": from_v,
            "to_version": head,
            "keys_upserted": 0,
            "keys_deleted": 0,
        }
    base_schema = table_schema(base_path)
    keys = spec["group_by"]
    if j is not None:
        dim = _dim_frame(spark, spec, dim_head)

    def _full_recompute() -> dict:
        # atomic full recompute through the era-aware read — the
        # fallback for a base rewrite/rename in range AND for a
        # dimension commit (which voids the pinned-dimension premise
        # fact-side incremental maintenance rests on)
        base = read_evolved(spark, base_path, as_of=head)
        save_manifest(
            _view_frame(_input_frame(base, spec, dim), spec),
            mv_path,
            kind="rewrite",
            commit_props=json.dumps({"mv_from": from_v, "mv_to": head}),
        )
        meta["base_version"] = head
        if j is not None:
            meta["dim_version"] = dim_head
        _store_meta(mv_path, meta)
        return {
            "mode": "full",
            "from_version": from_v,
            "to_version": head,
            "keys_upserted": -1,
            "keys_deleted": -1,
        }

    if dim_moved:
        return _full_recompute()
    try:
        changes = read_changes(
            spark, base_path, base_schema, from_v, head
        )
    except ValueError:
        # a base rewrite (or rename) inside the range
        return _full_recompute()
    sliced = _input_frame(changes, spec, dim)
    minmax = _minmax_cols(spec)
    if minmax:
        # MIN/MAX are not self-maintainable under deletes — a delete
        # leg in the (filtered, joined) slice can strand the stored
        # extremum, so the refresh demotes to the same atomic full
        # recompute a base rewrite takes. Insert-only ranges — the
        # overwhelmingly common append cadence — stay incremental.
        # The probe is two-tier: the COMMIT KINDS in range are already
        # parsed driver-side (free), and only a range that actually
        # carries delete-capable commits pays the row-level check —
        # which still matters for filtered views, where a delete that
        # never passed the WHERE leaves the slice insert-only.
        range_kinds = {
            h["kind"]
            for h in table_history(base_path)
            if from_v < h["version"] <= head
        }
        if range_kinds & {"delete", "merge", "restore"}:
            has_delete = bool(
                sliced.filter(F.col("_change_type") == "delete")
                .limit(1)
                .take(1)
            )
            if has_delete:
                return _full_recompute()
    delta = _delta_frame(sliced, spec)
    state = read_committed(spark, mv_path, table_schema(mv_path))
    agg_cols = _state_cols(spec) + [_COUNT_COL]

    def _combine(c):
        if c in minmax:
            # least/greatest skip NULLs, so a key new to the view
            # (NULL state) or an all-NULL slice folds correctly
            f = F.least if minmax[c] == "min" else F.greatest
            return f(state[c], delta[c]).alias(c)
        return (
            F.coalesce(state[c], F.lit(0))
            + F.coalesce(delta[c], F.lit(0))
        ).alias(c)

    merged = (
        state.join(delta, on=keys, how="right")  # touched keys only
        .select(*keys, *[_combine(c) for c in agg_cols])
        .localCheckpoint(eager=True)  # bounded: touched keys only
    )
    n_up = merge_upsert(
        spark,
        mv_path,
        # REBALANCE: the merged frame inherits the refresh join's full
        # exchange width (session shuffle partitions → that many tiny
        # files per refresh, re-listed and anti-joined by every later
        # view read); AQE resizes the commit to the advisory partition
        # size — one file at gate scale, byte-sized files at 100 TB
        merged.hint("rebalance"),
        keys=keys,
        props={"mv_from": from_v, "mv_to": head},
    )
    n_dead = merged.filter(F.col(_COUNT_COL) <= 0).count()
    meta["base_version"] = head
    _store_meta(mv_path, meta)
    return {
        "mode": "incremental",
        "from_version": from_v,
        "to_version": head,
        "keys_upserted": n_up["n_updates"] - n_dead,
        "keys_deleted": n_dead,
    }


def mv_vacuum(spark: SparkSession, mv_path: str) -> int:
    """Purge accumulated zero-count tombstone rows from the view's
    data plane (maintenance, never required for correctness —
    ``mv_read`` filters them). One equality-delete commit; returns
    the number of purged keys. Compact afterwards to materialize."""
    meta = _load_meta(mv_path)
    keys = meta["spec"]["group_by"]
    state = read_committed(spark, mv_path, table_schema(mv_path))
    dead = state.filter(F.col(_COUNT_COL) <= 0).select(*keys)
    n = dead.count()
    if n:
        delete_where(spark, mv_path, dead)
    return n
