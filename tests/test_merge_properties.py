"""Property tests for the warehouse-maintenance operators: a pure-
Python reference model of MERGE upsert and SCD2 compression checked
against the Spark implementations on randomized inputs (few examples —
each drives a real Spark job — but unconstrained shapes: duplicate
attrs, single-observation keys, all-same / all-different streams)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from olap_project_spark.functions.merge import merge_upsert, scd2_compress

keys = st.integers(min_value=0, max_value=4)
attrs = st.sampled_from(["a", "b", "c", None])


def model_scd2(rows):
    """Reference SCD2: per key, order by t, split on attr change."""
    out = []
    by_key: dict[int, list[tuple[int, str | None]]] = {}
    for k, t, a in rows:
        by_key.setdefault(k, []).append((t, a))
    for k, obs in by_key.items():
        obs.sort()
        runs = []
        for t, a in obs:
            if runs and runs[-1]["attr"] == a:
                runs[-1]["to"] = t
                runs[-1]["n"] += 1
            else:
                runs.append({"attr": a, "from": t, "to": t, "n": 1})
        for i, r in enumerate(runs):
            out.append(
                (k, r["attr"], r["from"], r["to"], r["n"], i == len(runs) - 1)
            )
    return sorted(out, key=lambda r: (r[0], r[2]))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(keys, st.integers(min_value=0, max_value=20), attrs),
        min_size=1,
        max_size=25,
        unique_by=lambda r: (r[0], r[1]),  # one observation per (key, t)
    )
)
def test_scd2_matches_reference_model(spark, rows):
    df = spark.createDataFrame(rows, "k int, t int, attr string")
    got = sorted(
        (
            (
                r["k"],
                r["attr"],
                r["valid_from"],
                r["valid_to"],
                r["n_obs"],
                r["is_current"],
            )
            for r in scd2_compress(df, ["k"], ["attr"], "t").collect()
        ),
        key=lambda r: (r[0], r[2]),  # (key, valid_from): attrs may be None
    )
    assert got == model_scd2(rows)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.tuples(keys, st.integers(min_value=-2**62, max_value=2**62)),
             max_size=10, unique_by=lambda r: r[0]),
    st.lists(st.tuples(keys, st.integers(min_value=-2**62, max_value=2**62)),
             max_size=10, unique_by=lambda r: r[0]),
)
def test_merge_upsert_matches_dict_semantics(spark, tgt, src):
    target = spark.createDataFrame(tgt, "k int, v long")
    source = spark.createDataFrame(src, "k int, v long")
    got = {
        r["k"]: r["v"] for r in merge_upsert(target, source, ["k"]).collect()
    }
    want = dict(tgt)
    want.update(dict(src))  # MERGE == dict update on the key
    assert got == want
