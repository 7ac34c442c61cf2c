"""Property-based tests (hypothesis) for the join-based MERGE — the
engine's one real algorithmic module (SURVEY.md §2.6 hard-part #1):
idempotence, delete/insert/update semantics, null-safety, and
empty-batch edges over randomized CDC batches."""

from __future__ import annotations

import datetime

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipeline_postgres_spark.operators.merge import cdc_merge

KEYS = st.integers(min_value=1, max_value=8)
VALS = st.one_of(st.none(), st.integers(min_value=0, max_value=99))
OPS = st.sampled_from(["I", "U", "D"])


def _target(spark, rows):
    return spark.createDataFrame(
        [(k, v) for k, v in rows], "id bigint, val bigint"
    )


def _batch(spark, rows):
    # (id, val, op, seq) — seq is the change order within the batch
    return spark.createDataFrame(
        [
            (k, v, op, datetime.datetime(2024, 1, 1, 0, 0, i))
            for i, (k, v, op) in enumerate(rows)
        ],
        "id bigint, val bigint, operation string, last_updated timestamp",
    )


def _merge(spark, target_rows, batch_rows):
    out = cdc_merge(
        _target(spark, target_rows),
        _batch(spark, batch_rows),
        key="id",
        order_col="last_updated",
    )
    return sorted((r.id, r.val) for r in out.collect())


def _model(target_rows, batch_rows):
    """Reference MERGE semantics in plain Python (the exact clause set
    of mnt/dags/unused_02retail_stage.py:101-144): latest change per
    id wins; WHEN MATCHED & D → delete, WHEN MATCHED & U → update,
    WHEN MATCHED & I → no-op (keep target); WHEN NOT MATCHED & I →
    insert, NOT MATCHED & U/D → no-op."""
    target = dict(target_rows)
    state = dict(target_rows)
    latest = {}
    for k, v, op in batch_rows:  # later rows have later timestamps
        latest[k] = (v, op)
    for k, (v, op) in latest.items():
        if k in target:
            if op == "D":
                state.pop(k, None)
            elif op == "U":
                state[k] = v
        elif op == "I":
            state[k] = v
    return sorted(state.items())


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    target=st.lists(
        st.tuples(KEYS, VALS), max_size=8, unique_by=lambda r: r[0]
    ),
    batch=st.lists(st.tuples(KEYS, VALS, OPS), max_size=10),
)
def test_merge_matches_model(spark, target, batch):
    assert _merge(spark, target, batch) == _model(target, batch)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    target=st.lists(
        st.tuples(KEYS, VALS), min_size=1, max_size=6, unique_by=lambda r: r[0]
    ),
    batch=st.lists(st.tuples(KEYS, VALS, OPS), min_size=1, max_size=8),
)
def test_merge_is_idempotent(spark, target, batch):
    once = _merge(spark, target, batch)
    twice_out = cdc_merge(
        _target(spark, once),
        _batch(spark, batch),
        key="id",
        order_col="last_updated",
    )
    twice = sorted((r.id, r.val) for r in twice_out.collect())
    assert twice == once


def test_empty_batch_is_noop(spark):
    target = [(1, 10), (2, None)]
    assert _merge(spark, target, []) == sorted(target)


def test_empty_target_all_inserts(spark):
    # key 1's LATEST op is U on an unmatched key → no-op (the
    # reference has no NOT-MATCHED-U clause); key 2 inserts
    batch = [(1, 5, "I"), (2, 7, "I"), (1, 6, "U")]
    assert _merge(spark, [], batch) == [(2, 7)]
    assert _merge(spark, [], [(1, 5, "I"), (2, 7, "I")]) == [(1, 5), (2, 7)]
