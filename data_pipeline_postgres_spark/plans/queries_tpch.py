"""[EXT] Classic TPC-H-shaped analytical queries over the synthetic
warehouse tables — the canonical multi-join / wide-aggregate workload a
warehouse engine must run well. The reference repo has no multi-join
reporting queries (its analytics stop at single-table GROUP BY,
mnt/dags/02datalake_to_datawarehouse.py:60-112); these are the natural
widening, and each is a plan-shape benchmark:

- ``tpch_q1_pricing_summary``: full-scan wide aggregate — the map-side
  partial-agg / whole-stage-codegen stress test. One shuffle of 4
  grouped rows; everything else is codegen over the scan.
- ``tpch_q3_shipping_priority``: selective dim filter + 2 fact joins +
  global top-N — TakeOrderedAndProject, never a global sort.
- ``tpch_q5_local_supplier``: 6-way star join with a co-location
  predicate (customer nation == supplier nation) — broadcast the
  dim chain, shuffle only the two facts.

Exactness: all money math in exact DECIMAL on both engines —
price DECIMAL(12,2), discount/tax DECIMAL(4,2), so the 3-factor charge
term stays inside DECIMAL(38) width on Spark AND DuckDB (a (18,2)³
product would overflow DuckDB's 38-digit cap); one final cast to
double. Averages are decimal-sum / count in one double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dec_price(col: str) -> F.Column:
    return F.col(col).cast("decimal(12,2)")


def _dec_rate(col: str) -> F.Column:
    """0.xx rate (discount / tax) as exact 2-decimal."""
    return F.col(col).cast("decimal(4,2)")


_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
           AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))
                * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
           AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
           AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
           / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*)
           AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-08-06'
GROUP BY l_returnflag, l_linestatus
"""


@query("tpch_q1_pricing_summary", _Q1_ORACLE)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: pricing summary report. Single scan, shipdate
    predicate pushed to parquet, 8 aggregates over ~4 groups — the
    shuffle carries only the grouped partials (map-side combine), so
    wall time is the codegen'd scan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("2001-08-06"))
    )
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = _dec_price("l_extendedprice")
    disc_f = F.lit(1) - _dec_rate("l_discount")
    charge_f = F.lit(1) + _dec_rate("l_tax")
    cnt = F.count("*")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * disc_f).cast("double").alias("sum_disc_price"),
            F.sum(price * disc_f * charge_f).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / cnt).alias("avg_qty"),
            (F.sum(price).cast("double") / cnt).alias("avg_price"),
            (F.sum(_dec_rate("l_discount")).cast("double") / cnt).alias(
                "avg_disc"
            ),
            cnt.alias("count_order"),
        )
    )


_Q3_ORACLE = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS revenue,
       o_orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("tpch_q3_shipping_priority", _Q3_ORACLE)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped orders by revenue for one
    market segment. Segment filter prunes customer before the join;
    the global top-10 is ``orderBy().limit(10)`` →
    TakeOrderedAndProject (per-partition heap + driver merge of 10-row
    heads), never a single-partition sort. l_orderkey tiebreak makes
    the cut deterministic across engines."""
    cutoff = F.to_timestamp(F.lit("1998-06-01"))
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    rev = _dec_price("l_extendedprice") * (F.lit(1) - _dec_rate("l_discount"))
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


_Q5_ORACLE = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


@query("tpch_q5_local_supplier", _Q5_ORACLE)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where the supplier is in the
    customer's own nation. 6-way join: the two facts (orders ⋈
    lineitem) shuffle on orderkey; supplier/nation/region are
    broadcast (supplier is dim-sized — at extreme scale swap to a
    shuffled join on l_suppkey and AQE will do so automatically once
    it exceeds the broadcast threshold). The co-location predicate
    (c_nationkey = s_nationkey) rides the supplier broadcast join as
    an extra equi-condition — no extra shuffle."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    s = F.broadcast(_t(spark, sf_dir, "supplier"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    rev = _dec_price("l_extendedprice") * (F.lit(1) - _dec_rate("l_discount"))
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )
