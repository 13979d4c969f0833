"""Property tests for the CUSUM prefix-sum identity: the recursive fold
``S_t = max(0, S_{t-1} + e_t)`` must equal ``P_t - min(0, P_1..P_t)``
for EVERY integer sequence — including the virtual initial state S_0=0
in the reflecting floor (omitting the 0 broke the identity for
sequences whose walk never dips below zero; caught in round 8). Pure
Python, no Spark, so hypothesis can run many examples."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _fold(es: list[int]) -> list[int]:
    s, out = 0, []
    for e in es:
        s = max(0, s + e)
        out.append(s)
    return out


def _prefix_form(es: list[int]) -> list[int]:
    p, minp, out = 0, 0, []  # minp starts at 0 = the virtual S_0 state
    for e in es:
        p += e
        minp = min(minp, p)
        out.append(p - minp)
    return out


def _fold_down(es: list[int]) -> list[int]:
    s, out = 0, []
    for e in es:
        s = max(0, s - e)
        out.append(s)
    return out


def _prefix_form_down(es: list[int]) -> list[int]:
    p, maxp, out = 0, 0, []
    for e in es:
        p += e
        maxp = max(maxp, p)
        out.append(maxp - p)
    return out


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=-10**9, max_value=10**9), max_size=200))
def test_upward_identity(es):
    assert _prefix_form(es) == _fold(es)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=-10**9, max_value=10**9), max_size=200))
def test_downward_identity(es):
    assert _prefix_form_down(es) == _fold_down(es)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=-1000, max_value=1000), max_size=120),
    st.integers(min_value=0, max_value=2000),
)
def test_crossing_detection_matches_fold(es, h):
    """Upward-crossing emission (s > h while prev_s <= h) over the
    prefix form equals the same rule over the recursive fold — the
    contract shared by stateful_cusum_alarms and its SQL oracle."""
    def crossings(series):
        prev, hits = 0, []
        for i, s in enumerate(series):
            if s > h and prev <= h:
                hits.append((i, s))
            prev = s
        return hits

    assert crossings(_prefix_form(es)) == crossings(_fold(es))


def test_all_positive_walk_regression():
    """The exact case the round-8 fix addressed: a walk that never dips
    below zero. Without the virtual 0 in the floor, S_1 would read 0
    instead of e_1."""
    es = [5, 3, 7]
    assert _fold(es) == [5, 8, 15]
    assert _prefix_form(es) == [5, 8, 15]
