"""Analytics-surface tests: as-of join semantics on a hand fixture,
sketch accuracy, and PHYSICAL PLAN assertions — the shape Catalyst
must pick (broadcast vs shuffle, pushdown, group-limit) is part of
the operator contract at scale, not an accident."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from data_pipeline_postgres_spark.operators import join_ext
from data_pipeline_postgres_spark.plans import registry

from .conftest import SF_SMOKE

registry.load_all()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestAsofJoin:
    def test_hand_fixture(self, spark):
        TS = datetime.datetime
        left = spark.createDataFrame(
            [(1, TS(2024, 1, 10)), (1, TS(2024, 1, 1)), (2, TS(2024, 1, 5))],
            "k bigint, t timestamp",
        )
        right = spark.createDataFrame(
            [
                (1, TS(2024, 1, 5), 100.0),
                (1, TS(2024, 1, 9), 200.0),
                (2, TS(2024, 1, 6), 300.0),  # after left's t → no match
            ],
            "k bigint, rt timestamp, px double",
        )
        out = join_ext.asof_join(
            left, right, key="k", left_ts="t", right_ts="rt", payload=["px"]
        )
        got = {(r.k, r.t): r.px for r in out.collect()}
        assert got[(1, TS(2024, 1, 10))] == 200.0  # newest at-or-before
        assert got[(1, TS(2024, 1, 1))] is None  # nothing before
        assert got[(2, TS(2024, 1, 5))] is None  # right row is later

    def test_exact_timestamp_is_inclusive(self, spark):
        TS = datetime.datetime
        left = spark.createDataFrame(
            [(1, TS(2024, 1, 5))], "k bigint, t timestamp"
        )
        right = spark.createDataFrame(
            [(1, TS(2024, 1, 5), 42.0)], "k bigint, rt timestamp, px double"
        )
        out = join_ext.asof_join(
            left, right, key="k", left_ts="t", right_ts="rt", payload=["px"]
        )
        assert out.collect()[0].px == 42.0


class TestSketchAccuracy:
    def test_approx_distinct_within_5pct(self, spark):
        exact = {
            r.o_orderpriority: r.n_customers
            for r in registry.QUERIES["agg_count_distinct"](
                spark, SF_SMOKE
            ).collect()
        }
        approx = {
            r.o_orderpriority: r.n_customers
            for r in registry.QUERIES["agg_approx_distinct"](
                spark, SF_SMOKE
            ).collect()
        }
        assert set(exact) == set(approx)
        for k, v in exact.items():
            assert abs(approx[k] - v) <= max(2, 0.05 * v), (k, v, approx[k])


class TestApproxQuantile:
    def test_within_tolerance_of_exact(self, spark):
        exact = {
            r.o_orderstatus: (r.p50, r.p90)
            for r in registry.QUERIES["agg_percentile"](
                spark, SF_SMOKE
            ).collect()
        }
        approx = {
            r.o_orderstatus: (r.p50, r.p90)
            for r in registry.QUERIES["agg_approx_quantile"](
                spark, SF_SMOKE
            ).collect()
        }
        assert set(exact) == set(approx)
        for k, (e50, e90) in exact.items():
            a50, a90 = approx[k]
            assert abs(a50 - e50) / max(e50, 1) < 0.05
            assert abs(a90 - e90) / max(e90, 1) < 0.05


class TestPhysicalPlans:
    """The plan the optimizer must produce — these assertions are the
    scale contract (a broadcast that silently becomes a shuffle join
    is a 100 TB regression even if results stay correct)."""

    def test_dim_join_broadcasts(self, spark):
        plan = _plan(registry.QUERIES["join_broadcast_dim"](spark, SF_SMOKE))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_fact_join_shuffles_not_nested_loop(self, spark):
        plan = _plan(registry.QUERIES["join_shuffle_fact"](spark, SF_SMOKE))
        assert "NestedLoop" not in plan
        # equi-join: hash or sort-merge are both acceptable; cartesian isn't
        assert ("SortMergeJoin" in plan) or ("HashJoin" in plan)

    def test_topk_uses_group_limit(self, spark):
        plan = _plan(
            registry.QUERIES["window_topk_per_group"](spark, SF_SMOKE)
        )
        # rank<=k must push a per-group limit below the window sort
        assert "WindowGroupLimit" in plan

    def test_filter_pushdown_reaches_scan(self, spark):
        plan = _plan(
            registry.QUERIES["jdbc_scan_pushdown"](spark, SF_SMOKE)
        )
        assert "PushedFilters: [" in plan
        assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual" in plan

    def test_projection_prunes_scan_columns(self, spark):
        plan = _plan(registry.QUERIES["project_cols"](spark, SF_SMOKE))
        # ReadSchema must not contain columns the query never touches
        read = plan.split("ReadSchema:", 1)[1].splitlines()[0]
        assert "o_orderpriority" not in read

    def test_semi_anti_join_physical_types(self, spark):
        semi = _plan(registry.QUERIES["join_semi"](spark, SF_SMOKE))
        anti = _plan(registry.QUERIES["join_anti"](spark, SF_SMOKE))
        assert "LeftSemi" in semi
        assert "LeftAnti" in anti

    def test_pivot_has_no_distinct_values_job(self, spark):
        # explicit value list → values baked into pivotfirst, no
        # distinct-scan pre-job; both exchanges sit above partial
        # aggregates so they carry only |status|x|year| rows
        plan = _plan(registry.QUERIES["pivot_wide"](spark, SF_SMOKE))
        assert "pivotfirst" in plan
        assert plan.count("Exchange hashpartitioning") <= 2
        assert plan.index("partial_count") > plan.rindex("Exchange")

    def test_range_join_avoids_nested_loop(self, spark):
        # the bin-bucket rewrite must turn the interval predicate
        # into an equi-join; a NestedLoop here is O(n*m) at scale
        plan = _plan(registry.QUERIES["join_range_banded"](spark, SF_SMOKE))
        assert "NestedLoop" not in plan
        assert "BroadcastHashJoin" in plan

    def test_global_topn_uses_take_ordered(self, spark):
        plan = _plan(registry.QUERIES["sort_limit_topn"](spark, SF_SMOKE))
        assert "TakeOrderedAndProject" in plan
        assert "Exchange rangepartitioning" not in plan  # no global sort

    def test_partitioned_read_prunes(self, spark):
        df = registry.QUERIES["partitioned_write_prune"](spark, SF_SMOKE)
        plan = _plan(df)
        assert "PartitionFilters: [" in plan
        # the day predicate must be a partition filter, not a data filter
        assert "day" in plan.split("PartitionFilters:", 1)[1].splitlines()[0]

    def test_bucketed_join_has_no_join_exchange(self, spark):
        plan = _plan(
            registry.QUERIES["join_bucketed_colocated"](spark, SF_SMOKE)
        )
        assert plan.count("Bucketed: true") == 2
        # no shuffle on the join key — the join must consume the
        # bucketed layout (or broadcast at tiny scale); only the final
        # group-by may exchange
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan

    def test_salted_join_equals_plain(self, spark):
        salted = registry.QUERIES["join_salted_skew"](spark, SF_SMOKE)
        plain = registry.QUERIES["stream_static_join"](spark, SF_SMOKE)
        assert sorted(map(tuple, salted.collect())) == sorted(
            map(tuple, plain.collect())
        )

    def test_asof_join_single_shuffle(self, spark):
        plan = _plan(registry.QUERIES["join_asof"](spark, SF_SMOKE))
        # merge-asof = union + ONE window exchange (+ the right-side
        # dedup window sharing the same key partitioning); no join node
        assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


class TestTpchShapes:
    """Plan-shape contracts for the TPC-H-style reporting queries."""

    def test_q1_pushdown_and_partial_agg(self, spark):
        plan = _plan(
            registry.QUERIES["tpch_q1_pricing_summary"](spark, SF_SMOKE)
        )
        # shipdate predicate must reach the parquet scan, and the
        # single exchange must sit above the partial aggregate (the
        # shuffle carries ~4 grouped rows, not 60k lineitems)
        assert "PushedFilters: [" in plan
        pushed = plan.split("PushedFilters:", 1)[1].splitlines()[0]
        assert "l_shipdate" in pushed
        assert plan.index("partial_sum") > plan.rindex("Exchange")

    def test_q3_topn_is_take_ordered(self, spark):
        plan = _plan(
            registry.QUERIES["tpch_q3_shipping_priority"](spark, SF_SMOKE)
        )
        assert "TakeOrderedAndProject" in plan
        assert "Exchange rangepartitioning" not in plan  # no global sort

    def test_q5_broadcasts_dim_chain(self, spark):
        plan = _plan(
            registry.QUERIES["tpch_q5_local_supplier"](spark, SF_SMOKE)
        )
        # supplier, nation, region ride broadcasts; only the facts
        # (customer⋈orders, ⋈lineitem) may shuffle
        assert plan.count("BroadcastHashJoin") >= 3
        assert "NestedLoop" not in plan
        assert "CartesianProduct" not in plan

    def test_q6_all_predicates_pushed(self, spark):
        plan = _plan(
            registry.QUERIES["tpch_q6_forecast_revenue"](spark, SF_SMOKE)
        )
        pushed = plan.split("PushedFilters:", 1)[1].splitlines()[0]
        for col in ("l_shipdate", "l_discount", "l_quantity"):
            assert col in pushed
        # only the grouped partial crosses the wire
        assert plan.index("partial_sum") > plan.rindex("Exchange")

    def test_q4_exists_is_semi_join(self, spark):
        plan = _plan(
            registry.QUERIES["tpch_q4_order_priority"](spark, SF_SMOKE)
        )
        assert "LeftSemi" in plan
        assert "CartesianProduct" not in plan

    def test_q18_having_is_semi_join_no_sort(self, spark):
        plan = _plan(
            registry.QUERIES["tpch_q18_large_orders"](spark, SF_SMOKE)
        )
        assert "LeftSemi" in plan
        assert "TakeOrderedAndProject" in plan
        assert "Exchange rangepartitioning" not in plan

    def test_q10_topn_and_broadcast_nation(self, spark):
        plan = _plan(
            registry.QUERIES["tpch_q10_returned_items"](spark, SF_SMOKE)
        )
        assert "TakeOrderedAndProject" in plan
        assert "BroadcastHashJoin" in plan

    def test_q22_anti_join_and_scalar_broadcast(self, spark):
        plan = _plan(
            registry.QUERIES["tpch_q22_sales_opportunity"](spark, SF_SMOKE)
        )
        assert "LeftAnti" in plan
        # the avg-balance scalar rides a broadcast, not a shuffle
        assert "BroadcastNestedLoopJoin" in plan

    def test_q8_single_aggregate_no_cartesian(self, spark):
        plan = _plan(
            registry.QUERIES["tpch_q8_market_share"](spark, SF_SMOKE)
        )
        assert "CartesianProduct" not in plan
        assert plan.count("BroadcastHashJoin") >= 3

    def test_q15_decimal_max_broadcast(self, spark):
        plan = _plan(
            registry.QUERIES["tpch_q15_top_supplier"](spark, SF_SMOKE)
        )
        # the max-revenue scalar arrives by broadcast, not a shuffle
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        assert "CartesianProduct" not in plan

    def test_q17_shares_partkey_shuffle(self, spark):
        plan = _plan(
            registry.QUERIES["tpch_q17_small_qty_revenue"](spark, SF_SMOKE)
        )
        # decorrelated per-part avg joins on the same key it grouped on
        assert "hashpartitioning(l_partkey" in plan or "hashpartitioning(pk" in plan
        assert "CartesianProduct" not in plan

    def test_q21_semi_anti_via_aggregate(self, spark):
        plan = _plan(
            registry.QUERIES["tpch_q21_waiting_supplier"](spark, SF_SMOKE)
        )
        assert "TakeOrderedAndProject" in plan
        assert "CartesianProduct" not in plan

    def test_bloom_runtime_filter_injected(self, spark):
        """With size thresholds lowered, the optimizer must build a
        bloom over the selective orders side and inject
        might_contain into the lineitem branch."""
        confs = {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "0",
        }
        old = {k: spark.conf.get(k, None) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            plan = _plan(
                registry.QUERIES["join_bloom_filtered"](spark, SF_SMOKE)
            )
            assert "bloom_filter_agg" in plan
            assert "might_contain" in plan
        finally:
            for k, v in old.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)


class TestAdaptiveExecution:
    def test_aqe_coalesces_post_shuffle_partitions(self, spark):
        """AQE must shrink the static 8-partition shuffle to match the
        tiny grouped output — the runtime re-planning the session
        builder promises (one plan surviving 100× scale relies on it)."""
        df = (
            registry.QUERIES["agg_group_sum_multi"](spark, SF_SMOKE)
        )
        df.collect()
        assert df.rdd.getNumPartitions() < int(
            spark.conf.get("spark.sql.shuffle.partitions")
        )

    def test_aqe_skew_and_coalesce_enabled(self, spark):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        assert (
            spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
        )


class TestCapAndCorr:
    def test_cap_per_source_uses_window_group_limit(self, spark):
        """The per-source cap must be rank-limit-pushed (per-partition
        heaps before the source exchange), never a global sort."""
        from data_pipeline_postgres_spark.plans import registry

        registry.load_all()
        df = registry.QUERIES["docs_cap_per_source"](spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan
        assert "SinglePartition" not in plan

    def test_corr_matches_spark_corr(self, spark):
        """The exact-moment Pearson r agrees with Spark's float corr()
        to float tolerance (the exact path exists for cross-engine
        determinism, not different math)."""
        import pytest as _pytest
        from pyspark.sql import functions as F

        from data_pipeline_postgres_spark.plans import registry

        registry.load_all()
        got = {
            r.l_returnflag: r.corr_qty_price
            for r in registry.QUERIES["agg_corr_exact"](
                spark, SF_SMOKE
            ).collect()
        }
        ref = {
            r.l_returnflag: r.c
            for r in spark.read.parquet(SF_SMOKE + "/lineitem.parquet")
            .groupBy("l_returnflag")
            .agg(F.corr("l_quantity", "l_extendedprice").alias("c"))
            .collect()
        }
        assert set(got) == set(ref)
        for k in got:
            assert got[k] == _pytest.approx(ref[k], abs=1e-5)


class TestRound4Analytics:
    def test_winsorize_broadcasts_percentiles(self, spark):
        """The 3-row per-group percentile table must come back as a
        broadcast join — no fact re-shuffle for the clamp."""
        from data_pipeline_postgres_spark.plans import registry

        registry.load_all()
        df = registry.QUERIES["agg_winsorize"](spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_winsorized_mean_is_pulled_toward_center(self, spark):
        from data_pipeline_postgres_spark.plans import registry

        registry.load_all()
        for r in registry.QUERIES["agg_winsorize"](spark, SF_SMOKE).collect():
            assert r.mean_winsorized != r.mean_raw or r.n < 40

    def test_funnel_counts_are_monotone(self, spark):
        from data_pipeline_postgres_spark.plans import registry

        registry.load_all()
        [r] = registry.QUERIES["events_funnel_batch"](
            spark, SF_SMOKE
        ).collect()
        assert r.n_view >= r.n_view_click >= r.n_view_click_purchase >= 0
        assert r.n_view > 0

    def test_zorder_is_map_only(self, spark):
        """Morton-key derivation must not shuffle (pure projection:
        zero Exchange nodes in the physical plan)."""
        from data_pipeline_postgres_spark.plans import registry

        registry.load_all()
        df = registry.QUERIES["layout_zorder"](spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_zorder_locality_beats_row_order(self, spark):
        """Sanity on the clustering claim: sorting by zkey, consecutive
        rows should be closer in (custkey, day) L1 distance on average
        than sorting by raw o_orderkey."""
        from data_pipeline_postgres_spark.plans import registry

        registry.load_all()
        df = registry.QUERIES["layout_zorder"](spark, SF_SMOKE)
        o = spark.read.parquet(SF_SMOKE + "/orders.parquet").select(
            "o_orderkey",
            (F.col("o_custkey").cast("bigint") % 65536).alias("xk"),
            (
                F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
                .cast("bigint")
                % 65536
            ).alias("yk"),
        )
        j = df.join(o, "o_orderkey").toPandas()

        def avg_l1(frame, key):
            s = frame.sort_values(key)
            return (
                (s.xk.diff().abs() + s.yk.diff().abs()).iloc[1:].mean()
            )

        assert avg_l1(j, "zkey") < avg_l1(j, "o_orderkey")
