"""The gate test: every registered query matches its DuckDB oracle at
sf0.001 (fast) — a strict local mirror of the driver's sf0.01 check."""

from __future__ import annotations

import pytest

from data_pipeline_postgres_spark.plans import registry

from .conftest import SF_SMOKE
from .oracle_util import assert_matches_oracle, duck_connect

registry.load_all()
ORACLE_QUERIES = sorted(registry.ORACLES)


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    df = registry.QUERIES[name](spark, SF_SMOKE)
    assert_matches_oracle(df, duck, registry.ORACLES[name], name)


def test_all_queries_have_impl():
    assert set(registry.ORACLES) <= set(registry.QUERIES)


def test_events_load_does_not_leak_session_conf(spark):
    """Whatever timestamp unit the events table carries (NANOS in the
    round-1 testdata, MICROS since round 5 — catalog.parquet_ts_unit
    sniffs it), the reader must never flip
    spark.sql.legacy.parquet.nanosAsLong session-wide: a leaked conf
    would change how OTHER parquet reads interpret nanos columns."""
    from data_pipeline_postgres_spark.catalog import load_table

    df = load_table(spark, SF_SMOKE, "events")
    assert df.count() > 0
    assert dict(df.dtypes)["ts"] == "timestamp"
    # unset ⇒ .get returns the conf's built-in default "false"
    assert (
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "false"
    )


def test_rows_only_queries_run(spark):
    """Queries without an oracle must still run and return a schema."""
    for name, fn in registry.QUERIES.items():
        if name in registry.ORACLES:
            continue
        df = fn(spark, SF_SMOKE)
        assert df.columns, name
        assert df.count() >= 0, name
