"""Core operator queries (SURVEY.md §2.1-2.9) bound to driver testdata.

Each ``@query(id, oracle)`` registers a ``(spark, sf_dir) -> DataFrame``
plus a DuckDB-equivalent SQL string. Bindings onto the testdata star
schema follow FIXTURES.md F5. Scratch I/O (CSV/lake/DDL round-trips)
stays under the repo's ``.scratch/`` directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table, register_views
from ..operators import merge as merge_ops
from ..operators import reshape, transform, window
from ..operators.aggregate import exact_sum
from ..sources import filesource, jdbc, lake
from .flagship import (
    PRODUCT_DEMAND_VIEW_SQL,
    flagship,
    material_demand_grams,
    product_demand_view,
)
from .registry import query

from ..scratch import SCRATCH_ROOT as SCRATCH  # noqa: E402


def _scratch(name: str, wipe: bool = False) -> str:
    os.makedirs(SCRATCH, exist_ok=True)
    path = os.path.join(SCRATCH, name)
    if wipe and os.path.exists(path):
        # CTAS refuses non-empty locations; a previous session's files
        # survive DROP TABLE on a fresh in-memory catalog.
        import shutil

        shutil.rmtree(path)
    return path


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Flagship (SURVEY.md §7)
# --------------------------------------------------------------------------

_GRAMS_CASE_SQL = """
        CASE product_name WHEN 'cheap' THEN CAST(demand AS DECIMAL(18,2)) * 20
                          WHEN 'medium' THEN CAST(demand AS DECIMAL(18,2)) * 10
                          ELSE CAST(0 AS DECIMAL(18,2)) END AS local_arabica_g,
        CASE product_name WHEN 'medium' THEN CAST(demand AS DECIMAL(18,2)) * 10
                          WHEN 'expensive' THEN CAST(demand AS DECIMAL(18,2)) * 10
                          ELSE CAST(0 AS DECIMAL(18,2)) END AS foreign_arabica_g,
        CASE product_name WHEN 'expensive' THEN CAST(demand AS DECIMAL(18,2)) * 10
                          ELSE CAST(0 AS DECIMAL(18,2)) END AS robusta_g
"""

FLAGSHIP_ORACLE = f"""
WITH product_demand AS ({PRODUCT_DEMAND_VIEW_SQL}),
grams AS (
    SELECT date, shop_id, {_GRAMS_CASE_SQL}
    FROM product_demand
),
agg AS (
    SELECT date, shop_id,
           CAST(SUM(local_arabica_g) AS DOUBLE)   AS local_arabica,
           CAST(SUM(foreign_arabica_g) AS DOUBLE) AS foreign_arabica,
           CAST(SUM(robusta_g) AS DOUBLE)         AS robusta
    FROM grams GROUP BY date, shop_id
)
SELECT date, shop_id, raw_material, demand / 1000.0 AS demand_kg FROM (
    SELECT date, shop_id, 'local_arabica' AS raw_material, local_arabica AS demand FROM agg
    UNION ALL
    SELECT date, shop_id, 'foreign_arabica' AS raw_material, foreign_arabica AS demand FROM agg
    UNION ALL
    SELECT date, shop_id, 'robusta' AS raw_material, robusta AS demand FROM agg
)
"""


@query("material_demand", FLAGSHIP_ORACLE)
def q_material_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: product demand → material demand, kg (live-DAG dialect;
    reference: mnt/dags/02datalake_to_datawarehouse.py:59-95)."""
    return flagship(spark, sf_dir)


@query(
    "agg_group_sum_sql",
    f"""
WITH product_demand AS ({PRODUCT_DEMAND_VIEW_SQL}),
grams AS (
    SELECT date, shop_id, {_GRAMS_CASE_SQL}
    FROM product_demand
),
long AS (
    SELECT date, shop_id, 'local_arabica' AS material_name, local_arabica_g AS quantity FROM grams
    UNION ALL
    SELECT date, shop_id, 'foreign_arabica' AS material_name, foreign_arabica_g AS quantity FROM grams
    UNION ALL
    SELECT date, shop_id, 'robusta' AS material_name, robusta_g AS quantity FROM grams
)
SELECT date, shop_id, material_name, CAST(SUM(quantity) AS DOUBLE) AS quantity_g
FROM long GROUP BY date, shop_id, material_name
""",
)
def q_agg_group_sum_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-dialect grams variant: unpivot-then-GROUP-BY, emits
    ``quantity_g`` (reference: mnt/dags/unused_pipeline_sourcecode.py:36-97)."""
    return material_demand_grams(product_demand_view(spark, sf_dir))


# --------------------------------------------------------------------------
# §2.2 projections / filters / scalar expressions
# --------------------------------------------------------------------------


@query("project_star", "SELECT * FROM region")
def q_project_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * (reference: mnt/dags/01fetch_from_database.py:52)."""
    return _t(spark, sf_dir, "region").select("*")


@query("project_cols", "SELECT o_orderkey, o_custkey, o_totalprice FROM orders")
def q_project_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit column-list projection (reference:
    mnt/dags/unused_pipeline_sourcecode.py:61-65). Column pruning
    reaches the parquet scan (ReadSchema shows only these columns)."""
    return _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")


@query(
    "filter_date_range",
    """
SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
""",
)
def q_filter_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-open incremental window (reference:
    mnt/dags/01fetch_from_database.py:52). The predicate pushes into the
    parquet scan (PushedFilters)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"
    )
    return transform.filter_date_range(li, "l_shipdate", "1996-01-01", "1997-01-01")


_DERIVE_ORACLE = f"""
WITH product_demand AS ({PRODUCT_DEMAND_VIEW_SQL})
SELECT date, shop_id, product_name, demand,
       CAST(CASE product_name WHEN 'cheap' THEN CAST(demand AS DECIMAL(18,2)) * 20
                              WHEN 'medium' THEN CAST(demand AS DECIMAL(18,2)) * 10
                              ELSE CAST(0 AS DECIMAL(18,2)) END AS DOUBLE) AS local_arabica_g,
       CAST(CASE product_name WHEN 'medium' THEN CAST(demand AS DECIMAL(18,2)) * 10
                              WHEN 'expensive' THEN CAST(demand AS DECIMAL(18,2)) * 10
                              ELSE CAST(0 AS DECIMAL(18,2)) END AS DOUBLE) AS foreign_arabica_g,
       CAST(CASE product_name WHEN 'expensive' THEN CAST(demand AS DECIMAL(18,2)) * 10
                              ELSE CAST(0 AS DECIMAL(18,2)) END AS DOUBLE) AS robusta_g
FROM product_demand
"""


@query("derive_case_when", _DERIVE_ORACLE)
def q_derive_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized CASE WHEN product→material derivation, replacing the
    reference's three row-at-a-time ``df.apply(axis=1)`` lambdas
    (reference: mnt/dags/02datalake_to_datawarehouse.py:65-67)."""
    pd_view = product_demand_view(spark, sf_dir)
    grams = transform.derive_material_grams(pd_view)
    return grams.select(
        "date",
        "shop_id",
        "product_name",
        "demand",
        *[F.col(f"{m}_g").cast("double").alias(f"{m}_g") for m in transform.MATERIALS],
    )


@query("derive_case_when_sql", _DERIVE_ORACLE)
def q_derive_case_when_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics via ``spark.sql`` CASE WHEN text (reference:
    mnt/dags/unused_pipeline_sourcecode.py:42-56) — Catalyst produces
    the same plan as the DataFrame form."""
    product_demand_view(spark, sf_dir).createOrReplaceTempView("product_demand")
    return spark.sql(
        f"""
        SELECT date, shop_id, product_name, demand,
               CAST(CASE product_name WHEN 'cheap' THEN CAST(demand AS DECIMAL(18,2)) * 20
                                      WHEN 'medium' THEN CAST(demand AS DECIMAL(18,2)) * 10
                                      ELSE CAST(0 AS DECIMAL(18,2)) END AS DOUBLE) AS local_arabica_g,
               CAST(CASE product_name WHEN 'medium' THEN CAST(demand AS DECIMAL(18,2)) * 10
                                      WHEN 'expensive' THEN CAST(demand AS DECIMAL(18,2)) * 10
                                      ELSE CAST(0 AS DECIMAL(18,2)) END AS DOUBLE) AS foreign_arabica_g,
               CAST(CASE product_name WHEN 'expensive' THEN CAST(demand AS DECIMAL(18,2)) * 10
                                      ELSE CAST(0 AS DECIMAL(18,2)) END AS DOUBLE) AS robusta_g
        FROM product_demand
        """
    )


@query(
    "cast_numeric",
    """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_linenumber AS VARCHAR) AS DOUBLE) AS linenumber_num
FROM lineitem
""",
)
def q_cast_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String→numeric ingest cast (reference:
    mnt/dags/unused_pipeline_sourcecode.py:43 ``CAST(demand AS NUMERIC)``)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_linenumber").cast("string").cast("double").alias("linenumber_num"),
    )


@query(
    "arith_mul",
    "SELECT o_orderkey, o_totalprice * 20 AS price_x20 FROM orders",
)
def q_arith_mul(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiply-by-literal (reference grams-per-unit:
    mnt/dags/02datalake_to_datawarehouse.py:65-67)."""
    o = _t(spark, sf_dir, "orders")
    return transform.arith_mul(o, "o_totalprice", 20, "price_x20").select(
        "o_orderkey", "price_x20"
    )


@query(
    "arith_div",
    "SELECT o_orderkey, o_totalprice / 1000.0 AS price_k FROM orders",
)
def q_arith_div(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Divide-by-literal, the g→kg conversion (reference:
    mnt/dags/02datalake_to_datawarehouse.py:73)."""
    o = _t(spark, sf_dir, "orders")
    return transform.arith_div(o, "o_totalprice", 1000.0, "price_k").select(
        "o_orderkey", "price_k"
    )


@query(
    "drop_col",
    """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate FROM orders
""",
)
def q_drop_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop a column after deriving its replacement (reference:
    mnt/dags/02datalake_to_datawarehouse.py:74). Catalyst prunes the
    dropped column out of the scan entirely."""
    return transform.drop_cols(_t(spark, sf_dir, "orders"), "o_orderpriority")


@query(
    "in_list_pred",
    """
SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
WHERE o_orderstatus IN ('O', 'F')
""",
)
def q_in_list_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership predicate (reference:
    mnt/dags/02datalake_to_datawarehouse.py:66-67)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    return transform.in_list(o, "o_orderstatus", ["O", "F"])


@query(
    "str_lit_tag",
    "SELECT r_regionkey, r_name, 'local_arabica' AS material_name FROM region",
)
def q_str_lit_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant string tag column (reference:
    mnt/dags/unused_pipeline_sourcecode.py:70,77,84)."""
    return transform.tag_literal(
        _t(spark, sf_dir, "region"), "local_arabica", "material_name"
    )


# --------------------------------------------------------------------------
# §2.3 aggregation
# --------------------------------------------------------------------------


@query(
    "agg_group_sum_multi",
    """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(SUM(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE)           AS sum_tax
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
)
def q_agg_group_sum_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-agg, 2 keys × 3 summed measures (reference pandas groupby:
    mnt/dags/02datalake_to_datawarehouse.py:69). Partial map-side agg
    means the shuffle carries one row per group per partition."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        exact_sum("l_quantity", "sum_qty"),
        exact_sum("l_extendedprice", "sum_price"),
        exact_sum("l_tax", "sum_tax"),
    )


@query(
    "distinct_rows",
    """
SELECT DISTINCT o_custkey,
       first_value(o_orderstatus) OVER w AS o_orderstatus,
       first_value(o_totalprice) OVER w  AS o_totalprice,
       first_value(o_orderdate)  OVER w  AS o_orderdate
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC)
""",
)
def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a first_value-windowed projection — the reference's
    CDC dedup shape, literal form (reference:
    mnt/dags/unused_02retail_stage.py:109-122). Tie-broken on
    o_orderkey so content is deterministic (SURVEY.md §5 risk 5)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return o.select(
        "o_custkey",
        F.first("o_orderstatus").over(w).alias("o_orderstatus"),
        F.first("o_totalprice").over(w).alias("o_totalprice"),
        F.first("o_orderdate").over(w).alias("o_orderdate"),
    ).distinct()


# --------------------------------------------------------------------------
# §2.4 reshape
# --------------------------------------------------------------------------

_UNPIVOT_ORACLE = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS measure, l_extendedprice AS value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax' AS measure, l_tax AS value FROM lineitem
"""


@query("unpivot_melt", _UNPIVOT_ORACLE)
def q_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long via native unpivot (reference ``pd.melt``:
    mnt/dags/02datalake_to_datawarehouse.py:71). Narrow op — no shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    return reshape.unpivot_melt(
        li,
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_tax"],
        "measure",
        "value",
    )


@query("unpivot_union_all", _UNPIVOT_ORACLE)
def q_unpivot_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same reshape as 3-way tagged UNION ALL (reference:
    mnt/dags/unused_pipeline_sourcecode.py:66-87); asserted ≡ melt in
    tests (metamorphic, SURVEY.md §5)."""
    li = _t(spark, sf_dir, "lineitem")
    return reshape.unpivot_union_all(
        li,
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_tax"],
        "measure",
        "value",
    )


# --------------------------------------------------------------------------
# §2.5 sorts / set ops
# --------------------------------------------------------------------------


@query(
    "order_by_multi",
    """
SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice FROM orders
ORDER BY o_orderdate, o_custkey, o_orderkey
""",
)
def q_order_by_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ascending ORDER BY (reference:
    mnt/dags/unused_pipeline_sourcecode.py:92-95). Spark executes as a
    range-partitioned sort (sampled boundaries → parallel total order)."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderdate", "o_custkey", "o_orderkey")
    )


@query(
    "sort_pandas",
    """
SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
ORDER BY l_shipdate, l_orderkey, l_linenumber
""",
)
def q_sort_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The README's commented-out pandas sort-by-date variant
    (reference: README.md:236-237)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_shipdate")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    )


@query(
    "union_all",
    """
SELECT o_orderkey, 'open' AS bucket, o_totalprice FROM orders WHERE o_orderstatus = 'O'
UNION ALL
SELECT o_orderkey, 'finished' AS bucket, o_totalprice FROM orders WHERE o_orderstatus = 'F'
UNION ALL
SELECT o_orderkey, 'partial' AS bucket, o_totalprice FROM orders WHERE o_orderstatus = 'P'
""",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union of uniform-schema tagged selects (reference:
    mnt/dags/unused_pipeline_sourcecode.py:73,80). Spark unions are
    metadata-only — partitions concatenate, no shuffle."""
    o = _t(spark, sf_dir, "orders")

    def part(status: str, tag: str) -> DataFrame:
        return o.filter(F.col("o_orderstatus") == status).select(
            "o_orderkey", F.lit(tag).alias("bucket"), "o_totalprice"
        )

    return (
        part("O", "open").unionByName(part("F", "finished")).unionByName(part("P", "partial"))
    )


# --------------------------------------------------------------------------
# §2.7 window
# --------------------------------------------------------------------------


@query(
    "window_latest_per_key",
    """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM orders
) WHERE rn = 1
""",
)
def q_window_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest order per customer — the reference's CDC latest-per-key
    dedup (reference: mnt/dags/unused_02retail_stage.py:109-122),
    idiomatic row_number()==1 form."""
    return window.latest_per_key(
        _t(spark, sf_dir, "orders"), ["o_custkey"], "o_orderdate", tiebreak=["o_orderkey"]
    )


# --------------------------------------------------------------------------
# §2.6 merge / upsert / delete
# --------------------------------------------------------------------------

_ORDER_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)
_DATA_COLS = tuple(c for c in _ORDER_COLS if c != "o_orderkey")


def _cdc_batch(orders: DataFrame) -> DataFrame:
    """Deterministic CDC batch synthesized from orders (FIXTURES.md F5):
    gen1 = every 3rd key, op from o_orderstatus (O→I, F→U, else D);
    gen2 = every 6th key, a later 'U' touching o_totalprice — exercises
    latest-change-wins."""
    gen1 = (
        orders.filter(F.col("o_orderkey") % 3 == 0)
        .withColumn(
            "operation",
            F.when(F.col("o_orderstatus") == "O", "I")
            .when(F.col("o_orderstatus") == "F", "U")
            .otherwise("D"),
        )
        .withColumn("last_updated", F.col("o_orderdate"))
    )
    gen2 = (
        orders.filter(F.col("o_orderkey") % 6 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1.0))
        .withColumn("operation", F.lit("U"))
        .withColumn("last_updated", F.col("o_orderdate") + F.expr("INTERVAL 1 DAY"))
    )
    return gen1.unionByName(gen2)


def _merge_pick_sql(cols: tuple[str, ...], use_batch_cond: str) -> str:
    picks = [
        f"CASE WHEN {use_batch_cond} THEN b.{c} ELSE t.{c} END AS {c}" for c in cols
    ]
    return ",\n           ".join(picks)


_CDC_MERGE_ORACLE = f"""
WITH target AS (SELECT * FROM orders WHERE o_orderkey % 10 < 8),
g1 AS (
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
           CASE o_orderstatus WHEN 'O' THEN 'I' WHEN 'F' THEN 'U' ELSE 'D' END AS operation,
           o_orderdate AS last_updated
    FROM orders WHERE o_orderkey % 3 = 0
),
g2 AS (
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1.0 AS o_totalprice,
           o_orderdate, o_orderpriority,
           'U' AS operation, o_orderdate + INTERVAL 1 DAY AS last_updated
    FROM orders WHERE o_orderkey % 6 = 0
),
batch AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2),
latest AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY last_updated DESC) AS rn
        FROM batch
    ) WHERE rn = 1
)
SELECT COALESCE(t.o_orderkey, b.o_orderkey) AS o_orderkey,
       {_merge_pick_sql(_DATA_COLS, "(t.o_orderkey IS NULL AND b.operation = 'I') OR (t.o_orderkey IS NOT NULL AND b.o_orderkey IS NOT NULL AND b.operation = 'U')")}
FROM target t FULL OUTER JOIN latest b ON t.o_orderkey = b.o_orderkey
WHERE b.o_orderkey IS NULL
   OR (t.o_orderkey IS NULL AND b.operation = 'I')
   OR (t.o_orderkey IS NOT NULL AND b.operation <> 'D')
"""


@query("cdc_merge", _CDC_MERGE_ORACLE)
def q_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-based CDC MERGE with I/U/D ops and latest-change-wins
    (reference: mnt/dags/unused_02retail_stage.py:101-144). The batch
    side is small vs the target → Spark broadcasts it; the target is
    never shuffled."""
    orders = _t(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderkey") % 10 < 8)
    return merge_ops.cdc_merge(target, _cdc_batch(orders), "o_orderkey", "last_updated")


_UPSERT_ORACLE = f"""
WITH target AS (SELECT * FROM orders WHERE o_orderkey % 10 < 8),
batch AS (
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 10.0 AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 4 = 0
)
SELECT COALESCE(b.o_orderkey, t.o_orderkey) AS o_orderkey,
       {_merge_pick_sql(_DATA_COLS, "b.o_orderkey IS NOT NULL")}
FROM target t FULL OUTER JOIN batch b ON t.o_orderkey = b.o_orderkey
"""


@query("upsert_on_conflict", _UPSERT_ORACLE)
def q_upsert_on_conflict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT … ON CONFLICT DO UPDATE intent (reference:
    mnt/dags/unused_pipeline_sourcecode.py:218-245 — the reference SQL
    is syntactically broken; we implement the intent)."""
    orders = _t(spark, sf_dir, "orders")
    target = orders.filter(F.col("o_orderkey") % 10 < 8)
    batch = orders.filter(F.col("o_orderkey") % 4 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(10.0)
    )
    return merge_ops.upsert(target, batch, "o_orderkey")


@query("delete_all", "SELECT * FROM orders WHERE 1 = 0")
def q_delete_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE FROM t → empty relation, schema preserved (reference:
    mnt/dags/unused_pipeline_sourcecode.py:247-253)."""
    return merge_ops.delete_all(_t(spark, sf_dir, "orders"))


# --------------------------------------------------------------------------
# §2.8 date/string functions
# --------------------------------------------------------------------------


@query(
    "date_fmt_partition",
    """
SELECT o_orderkey,
       strftime(o_orderdate, '%Y/%m') AS ym_path,
       strftime(o_orderdate, '%Y_%m') AS ym_shard
FROM orders
""",
)
def q_date_fmt_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp → 'YYYY/MM' S3 prefix and 'YYYY_MM' shard suffix
    (reference: mnt/dags/02datalake_to_datawarehouse.py:30,88,100;
    mnt/dags/01fetch_from_database.py:55)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy/MM").alias("ym_path"),
        F.date_format("o_orderdate", "yyyy_MM").alias("ym_shard"),
    )


@query(
    "date_iso_ds",
    """
SELECT event_id, CAST(ts AS DATE) AS ds, value
FROM events
WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-06'
""",
)
def q_date_iso_ds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO ``ds``/``next_ds`` day-slice parameterization (reference:
    mnt/dags/01fetch_from_database.py:52,55) — one logical day of
    events."""
    ev = _t(spark, sf_dir, "events")
    return transform.filter_date_range(ev, "ts", "2024-01-05", "2024-01-06").select(
        "event_id", F.to_date("ts").alias("ds"), "value"
    )


@query(
    "json_extract",
    """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
""",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed field extraction from the events.props JSON string
    ([EXT] per SURVEY.md §2.8 — the reference has no JSON surface)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )


# --------------------------------------------------------------------------
# §2.9 batch analog of the tumbling daily window
# --------------------------------------------------------------------------


@query(
    "window_tumbling_daily",
    """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1
""",
)
def q_window_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day event-time window — the reference's ``@daily``
    ``[ds, next_ds)`` batch cadence made first-class (reference:
    mnt/dags/01fetch_from_database.py:42,52). Same groupBy works under
    Structured Streaming with a watermark (streaming module)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("n_events"), exact_sum("value", "sum_value"))
        .select(F.col("w.start").cast("date").alias("day"), "n_events", "sum_value")
    )


# --------------------------------------------------------------------------
# §2.1 I/O edges (file-backed; JDBC wrappers take over with a real URL)
# --------------------------------------------------------------------------


@query("jdbc_scan_full", "SELECT * FROM orders")
def q_jdbc_scan_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table extract (reference: SELECT * shipped to Postgres,
    mnt/dags/01fetch_from_database.py:49-59). File-backed Source here;
    ``sources.jdbc.jdbc_scan`` is the partitioned JDBC binding."""
    return jdbc.file_backed_source(sf_dir)(spark, "orders")


@query(
    "jdbc_scan_pushdown",
    """
SELECT * FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'
""",
)
def q_jdbc_scan_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental extract with pushed date predicate (reference:
    mnt/dags/01fetch_from_database.py:52). Catalyst pushes the filter
    into the scan (JDBC: into the remote SQL; parquet: PushedFilters)."""
    scan = jdbc.file_backed_source(sf_dir)(spark, "lineitem")
    return transform.filter_date_range(scan, "l_shipdate", "1996-01-01", "1996-02-01")


@query(
    "jdbc_scan_param",
    """
SELECT * FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
""",
)
def q_jdbc_scan_param(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized extract — driver-bound params instead of templated
    SQL strings (reference: mnt/dags/unused_postgres_hooks_V02.py:25-34)."""
    ds, next_ds = "1996-01-01", "1997-01-01"  # driver-supplied run window
    scan = jdbc.file_backed_source(sf_dir)(spark, "orders")
    return transform.filter_date_range(scan, "o_orderdate", ds, next_ds)


_NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), True),
        T.StructField("n_name", T.StringType(), True),
        T.StructField("n_regionkey", T.IntegerType(), True),
    ]
)


@query("csv_write", "SELECT * FROM nation")
def q_csv_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-CSV egress + re-ingest round-trip (reference:
    mnt/dags/02datalake_to_datawarehouse.py:84-85)."""
    path = _scratch("csv_write_nation")
    filesource.csv_write(_t(spark, sf_dir, "nation"), path)
    return filesource.csv_read(spark, path, _NATION_SCHEMA)


@query("csv_read", "SELECT * FROM nation")
def q_csv_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-schema CSV ingest (reference infers with pd.read_csv —
    mnt/dags/02datalake_to_datawarehouse.py:62; inference is its
    VARCHAR-numerics bug class, so the engine reads with a declared
    StructType)."""
    path = _scratch("csv_read_nation")
    filesource.csv_write(_t(spark, sf_dir, "nation"), path)
    return filesource.csv_read(spark, path, _NATION_SCHEMA)


@query("s3_put", "SELECT * FROM supplier")
def q_s3_put(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent lake PUT (reference ``replace=True``:
    mnt/dags/02datalake_to_datawarehouse.py:90-95): overwrite-write
    twice, read back — same result (no download/rename/re-upload hop;
    executors address the lake path directly)."""
    path = _scratch("s3_put_supplier")
    sup = _t(spark, sf_dir, "supplier")
    filesource.parquet_write(sup, path)
    filesource.parquet_write(sup, path)  # idempotent re-run
    return filesource.parquet_read(spark, path)


@query("bulk_load_copy", "SELECT * FROM customer")
def q_bulk_load_copy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk warehouse load (reference COPY FROM STDIN:
    mnt/dags/02datalake_to_datawarehouse.py:136-148). Engine-native
    sink is a parallel partitioned write; against Postgres use
    ``sources.jdbc.jdbc_write`` (batched) or ``copy_sink`` — a real
    per-partition ``COPY … FROM STDIN (FORMAT CSV)`` via psycopg2
    copy_expert (CSV-encode core unit-tested in tests/test_jdbc.py;
    needs psycopg2 + a live Postgres on executors to run end-to-end,
    neither exists in this container)."""
    path = _scratch("warehouse_customer")
    filesource.parquet_write(_t(spark, sf_dir, "customer"), path)
    return filesource.parquet_read(spark, path)


# --------------------------------------------------------------------------
# §2.1 DDL surface
# --------------------------------------------------------------------------


@query("ddl_create_schema", "SELECT * FROM region")
def q_ddl_create_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE SCHEMA IF NOT EXISTS dbo (reference:
    postgresql/db-setup/setup.sql:1)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS dbo LOCATION '{_scratch('dbo_db')}'")
    return _t(spark, sf_dir, "region")


@query("ddl_create_table", FLAGSHIP_ORACLE)
def q_ddl_create_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent CREATE TABLE IF NOT EXISTS + load + read-back
    (reference: mnt/dags/02datalake_to_datawarehouse.py:228-240)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS dbo LOCATION '{_scratch('dbo_db')}'")
    loc = _scratch("dbo_material_demand")
    spark.sql("DROP TABLE IF EXISTS dbo.table_material_demand")
    spark.sql(
        f"""
        CREATE TABLE IF NOT EXISTS dbo.table_material_demand
        (date DATE, shop_id STRING, raw_material STRING, demand_kg DOUBLE)
        USING PARQUET LOCATION '{loc}'
        """
    )
    flagship(spark, sf_dir).createOrReplaceTempView("__flagship_out")
    spark.sql("INSERT OVERWRITE TABLE dbo.table_material_demand SELECT * FROM __flagship_out")
    return spark.table("dbo.table_material_demand")


@query("ddl_drop_create", "SELECT * FROM part")
def q_ddl_drop_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Destructive reload: DROP TABLE IF EXISTS + CREATE ... AS SELECT
    (reference: mnt/dags/unused_01retail_origin.py:73-94;
    postgresql/db-setup/setup.sql:3-10)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS dbo LOCATION '{_scratch('dbo_db')}'")
    spark.sql("DROP TABLE IF EXISTS dbo.part_reload")
    _t(spark, sf_dir, "part").createOrReplaceTempView("__part_src")
    spark.sql(
        f"""
        CREATE TABLE dbo.part_reload USING PARQUET
        LOCATION '{_scratch('dbo_part_reload', wipe=True)}'
        AS SELECT * FROM __part_src
        """
    )
    return spark.table("dbo.part_reload")


@query(
    "ddl_monthly_shard",
    f"""
WITH md AS ({FLAGSHIP_ORACLE})
SELECT date, shop_id, raw_material, demand_kg,
       CAST(year(date) AS INTEGER) AS year,
       CAST(month(date) AS INTEGER) AS month
FROM md
""",
)
def q_ddl_monthly_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-sharded storage (reference mangles table *names*
    ``table_material_demand_{YYYY_MM}`` — README.md:774-787; comment
    mnt/dags/02datalake_to_datawarehouse.py:118-132). Here: ONE
    partitioned dataset; month filters prune directories, no name
    mangling.

    The scratch target is wiped first: this query is a one-shot full
    rebuild, and dynamic partition overwrite (the engine default,
    right for the incremental pipeline) would otherwise leave behind
    partitions a previous run wrote for months the current result no
    longer contains."""
    path = _scratch("material_demand_partitioned", wipe=True)
    lake.write_partitioned(flagship(spark, sf_dir), path, date_col="date")
    df = lake.read_partitioned(spark, path)
    return df.select(
        "date",
        "shop_id",
        "raw_material",
        "demand_kg",
        F.col("year").cast("int").alias("year"),
        F.col("month").cast("int").alias("month"),
    )


# Ensure register_views is importable for SQL-text queries that need it.
__all__ = ["register_views"]


@query(
    "jdbc_scan_partitioned",
    """
WITH b AS (
    SELECT MIN(o_orderkey) AS lo, MAX(o_orderkey) + 1 AS up FROM orders
),
s AS (SELECT lo, (up // 8) - (lo // 8) AS stride FROM b)
SELECT LEAST(GREATEST((o_orderkey - lo) // stride, 0), 7) AS slice_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key
FROM orders, s
GROUP BY 1
""",
)
def q_jdbc_scan_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned-extract balance report: how the 8 key-range slices
    Spark's JDBC source would issue (partitionColumn=o_orderkey,
    bounds = [min, max+1)) distribute rows — (slice_id, n_rows,
    min_key, max_key). THE pre-flight check before pointing
    ``sources.jdbc.jdbc_scan`` at a production table: a skewed slice
    means one executor drags the whole extract, and the fix (a
    different partitionColumn or explicit predicates) is decided from
    exactly this report.

    Faithful to JDBCRelation.columnPartition semantics: stride =
    up/num − lo/num in INTEGER division, first slice unbounded below,
    last unbounded above (the LEAST/GREATEST clamp ≡ the generated
    `key < lo+stride` / `key >= lo+(n−1)·stride` WHERE clauses, since
    every key lies in [lo, up)). The bounds ride in as a broadcast
    1-row aggregate — no driver round-trip; the report itself is one
    map-side-combined count shuffle to 8 rows. The same
    tests/test_round8.py gate proves the 8 generated predicates
    partition the table (disjoint + covering)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    b = o.agg(
        F.min("o_orderkey").alias("lo"),
        (F.max("o_orderkey") + 1).alias("up"),
    )
    s = b.select(
        "lo",
        (
            F.expr("up div 8") - F.expr("lo div 8")
        ).alias("stride"),
    )
    return (
        o.crossJoin(F.broadcast(s))
        .select(
            F.least(
                F.greatest(
                    F.expr("(o_orderkey - lo) div stride"), F.lit(0)
                ),
                F.lit(7),
            ).alias("slice_id"),
            "o_orderkey",
        )
        .groupBy("slice_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
    )
