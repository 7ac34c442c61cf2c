"""I/O edges (SURVEY.md §2.1): CSV/parquet lake, date-partitioned
layout, JDBC source/sink wrappers. File-backed implementations run in
tests; the JDBC paths take over unchanged when a database URL is
supplied (no Postgres in the test container)."""
