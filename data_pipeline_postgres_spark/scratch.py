"""Scratch-space resolution for queries that materialize intermediate
files (partitioned writes, CSV/JSON round-trips, streaming spools).

Resolution order: ``$SPARK_GRAFT_SCRATCH`` if set, else ``.scratch/``
under the repo root (derived from this file's location, so the package
is relocatable — no absolute paths baked in).
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRATCH_ROOT = os.environ.get(
    "SPARK_GRAFT_SCRATCH", os.path.join(_REPO_ROOT, ".scratch")
)


def scratch_dir(*parts: str) -> str:
    """Path under the scratch root; parent dirs created."""
    path = os.path.join(SCRATCH_ROOT, *parts)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


def warehouse_dir(spark) -> str:
    """The session's spark-warehouse location as a local path (managed
    table data lives here; used to clear stale CTAS locations)."""
    loc = spark.conf.get("spark.sql.warehouse.dir")
    return loc.removeprefix("file:")
