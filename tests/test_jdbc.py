"""COPY-sink core + DSN mapping unit tests (no live Postgres: the
connection is faked, which exercises the exact CSV-encode →
copy_expert → commit path each executor partition runs)."""

from __future__ import annotations

import pytest

from data_pipeline_postgres_spark.sources.jdbc import copy_rows, pg_dsn


class FakeCursor:
    def __init__(self, fail_on_call: int | None = None):
        self.copies: list[tuple[str, str]] = []
        self.fail_on_call = fail_on_call

    def copy_expert(self, sql: str, buf) -> None:
        if self.fail_on_call is not None and len(self.copies) + 1 == self.fail_on_call:
            raise RuntimeError("copy failed")
        self.copies.append((sql, buf.read()))


class FakeConn:
    def __init__(self, cursor: FakeCursor):
        self._cursor = cursor
        self.committed = False
        self.rolled_back = False
        self.closed = False

    def cursor(self) -> FakeCursor:
        return self._cursor

    def commit(self) -> None:
        self.committed = True

    def rollback(self) -> None:
        self.rolled_back = True

    def close(self) -> None:
        self.closed = True


def test_copy_rows_streams_csv_chunks():
    cur = FakeCursor()
    conn = FakeConn(cur)
    rows = [(1, "a,b", None), (2, 'say "hi"', 3.5), (3, "", 0)]
    n = copy_rows(lambda: conn, "wh.t", ["id", "txt", "x"], rows, chunk_rows=2)
    assert n == 3
    assert len(cur.copies) == 2  # 2-row chunk + 1-row chunk
    sql, payload = cur.copies[0]
    assert sql == "COPY wh.t (id, txt, x) FROM STDIN WITH (FORMAT CSV, NULL '\\N')"
    # None → unquoted \N marker; everything else force-quoted so an
    # empty string survives as "" instead of loading as NULL
    assert payload.splitlines() == ['"1","a,b",\\N', '"2","say ""hi""","3.5"']
    assert cur.copies[1][1].splitlines() == ['"3","","0"']
    assert conn.committed and conn.closed and not conn.rolled_back


def test_copy_rows_rolls_back_on_failure():
    cur = FakeCursor(fail_on_call=2)
    conn = FakeConn(cur)
    rows = [(i,) for i in range(4)]
    with pytest.raises(RuntimeError):
        copy_rows(lambda: conn, "t", ["id"], rows, chunk_rows=2)
    assert conn.rolled_back and conn.closed and not conn.committed


def test_pg_dsn_mapping():
    assert (
        pg_dsn("jdbc:postgresql://db:5432/wh")
        == "postgresql://db:5432/wh"
    )
    assert (
        pg_dsn(
            "jdbc:postgresql://db:5432/wh",
            {"user": "u", "password": "p"},
        )
        == "postgresql://u:p@db:5432/wh"
    )
    # credentials with URI metacharacters are percent-encoded
    assert (
        pg_dsn(
            "jdbc:postgresql://db:5432/wh",
            {"user": "u@corp", "password": "p:a/s#w"},
        )
        == "postgresql://u%40corp:p%3Aa%2Fs%23w@db:5432/wh"
    )
    with pytest.raises(ValueError):
        pg_dsn("postgresql://db/wh")
