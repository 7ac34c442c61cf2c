"""Property-based tests (hypothesis) for the merge-as-of join
(operators/join_ext.py): model equivalence over randomized inputs,
tie (equal-timestamp) inclusivity, null payloads when nothing
qualifies, and empty-right edges."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipeline_postgres_spark.operators.join_ext import (
    asof_join,
    dedup_right_for_asof,
)

KEYS = st.integers(min_value=1, max_value=4)
TS = st.integers(min_value=0, max_value=20)
PAY = st.one_of(st.none(), st.integers(min_value=0, max_value=99))


def _left(spark, rows):
    return spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(rows)],
        "lid bigint, k bigint, lt bigint",
    )


def _right(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, rt bigint, pay bigint"
    )


def _spark_asof(spark, left_rows, right_rows):
    out = asof_join(
        _left(spark, left_rows),
        dedup_right_for_asof(_right(spark, right_rows), "k", "rt", "pay"),
        key="k",
        left_ts="lt",
        right_ts="rt",
        payload=["pay"],
    )
    return sorted((r.lid, r.k, r.lt, r.pay) for r in out.collect())


def _model(left_rows, right_rows):
    """Plain-Python as-of: newest right row with same key and
    rt <= lt (ties included); right pre-deduped to max-pay per
    (k, rt) — the same dedup contract the Spark path applies."""
    best = {}
    for k, rt, pay in right_rows:
        kk = (k, rt)
        if kk not in best:
            best[kk] = pay
        elif best[kk] is None or (pay is not None and pay > best[kk]):
            best[kk] = pay
    out = []
    for i, (k, lt) in enumerate(left_rows):
        cand = [
            (rt, pay)
            for (bk, rt), pay in best.items()
            if bk == k and rt <= lt
        ]
        pay = max(cand)[1] if cand else None
        out.append((i, k, lt, pay))
    return sorted(out)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    left=st.lists(st.tuples(KEYS, TS), max_size=8),
    right=st.lists(st.tuples(KEYS, TS, PAY), max_size=10),
)
def test_asof_matches_model(spark, left, right):
    assert _spark_asof(spark, left, right) == _model(left, right)


def test_equal_ts_is_inclusive(spark):
    # right row at exactly the left timestamp must be matched
    got = _spark_asof(spark, [(1, 5)], [(1, 5, 42)])
    assert got == [(0, 1, 5, 42)]


def test_no_earlier_right_gives_null(spark):
    got = _spark_asof(spark, [(1, 3)], [(1, 4, 42), (2, 1, 7)])
    assert got == [(0, 1, 3, None)]


def test_empty_right_all_null(spark):
    got = _spark_asof(spark, [(1, 1), (2, 9)], [])
    assert got == [(0, 1, 1, None), (1, 2, 9, None)]


def test_newest_of_several_wins(spark):
    right = [(1, 1, 10), (1, 3, 30), (1, 7, 70)]
    got = _spark_asof(spark, [(1, 0), (1, 2), (1, 5), (1, 9)], right)
    assert got == [
        (0, 1, 0, None),
        (1, 1, 2, 10),
        (2, 1, 5, 30),
        (3, 1, 9, 70),
    ]
