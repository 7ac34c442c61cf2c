"""Driver-facing registry: every implemented operator from SURVEY.md §2
as a ``(spark, sf_dir) -> DataFrame`` callable plus (where expressible)
a DuckDB-runnable ANSI-SQL oracle string.

Conventions (driver contract, __spark_entry__.py):
- Keys are the stable SURVEY §2 IDs.
- Every computed column is aliased IDENTICALLY in the Spark plan and
  the oracle SQL (the driver sorts columns by name before hashing).
- Exact-arithmetic policy: 2-decimal measures are summed as
  DECIMAL(18,2) then cast to double on BOTH sides, so value hashes are
  bit-stable regardless of partial-agg ordering (SURVEY.md §5).
- Non-SQL-expressible ops (spark.ml LSH, stateful streaming) have no
  oracle entry → the driver records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query implementation and optionally its SQL oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver's correctness sweep checks exactly the first 50 entries of
# ``queries()`` in dict-insertion order (verified: CORRECTNESS_r01..r13
# keys == list(QUERIES)[:50]).
#
# Round-14 rotation (committed as VERDICT r13 items 1+2, first commit
# of the round): (a) ``cdc_scd2_apply`` stays at position 1 for the
# re-drive of the r12/r13 hash-red — the r13 judging root-caused it to
# the fleet's only NULL-BEARING LTZ output; the r14 fix casts
# ``valid_from``/``valid_to`` to ``timestamp_ntz`` (FIXTURES.md F6);
# (b) the 15 round-13 net-new queries, never driver-checked (all
# locally oracle-verified at sf0.001 + sf0.01 with the inline Arrow
# type audit, or accuracy-gated where rows-only); (c) ``sim_topk_lsh``
# plus the 17 other round-6-stale rows (latest check r6); (d) the
# alphabetically-first 16 of the 48 round-7-stale rows.
# 1 + 15 + 18 + 16 = 50.
#
# Round-15 rotation queue (committed now per the standing VERDICT
# discipline): the 14 round-14 net-new queries first
# (stream_scd2_apply, dedup_bloom_incremental, emb_ivf_delta_merge,
# layout_file_skipping_audit, layout_partition_skew_audit,
# parts_er_fuzzy_name, parts_price_elasticity,
# customers_dp_group_counts, supplier_scorecard_weighted,
# pipeline_ivm_agg_maintenance, multimodal_nibble_entropy,
# events_attribution_shapley, parts_eoq_policy,
# events_gap_fill_interpolate — all
# locally oracle-verified at sf0.001 + sf0.01 + sf0.1 with the inline
# Arrow type audit), then the 32 remaining round-7-stale rows,
# alphabetically:
# docs_token_budget_select, emb_knn_classify, emb_pq_encode,
# events_activity_streaks, events_anomaly_mad,
# events_changepoint_cusum, events_markov_transitions,
# events_retention_cohorts, events_trend_ols, graph_triangle_stats,
# join_asof_nearest, json_extract, json_source_roundtrip,
# multimodal_decode, orders_assoc_rules, orders_cohort_ltv,
# orders_copurchase_pairs, project_star, sim_ann_pq_adc,
# sim_ivfpq_index_search, stream_dedup, stream_gopher_filter,
# stream_hll_rollup, stream_minhash_dedup, supplier_pareto_share,
# table_quality_checks, tokenizer_vocab_coverage,
# tpch_q11_important_stock, tpch_q16_parts_supplier,
# tpch_q20_potential_promotion, tpch_q2_min_cost_supplier,
# tpch_q9_product_profit. Slots beyond 50 spill to round 16 (the
# round-8-stale tier, 50 rows, follows).

DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) the r12/r13 red, re-driven first with the timestamp_ntz fix
    "cdc_scd2_apply",
    # (b) round-13 net-new, never driver-checked
    "dedup_payload_cdc",
    "emb_mutual_knn_ann",
    "orders_acf",
    "orders_mann_kendall",
    "customer_churn_training_set",
    "docs_curriculum_pacing",
    "stream_curriculum_pacing",
    "layout_vacuum_plan",
    "profile_drift_two_period",
    "docs_split_leakage_audit",
    "orders_rfm_segments",
    "parts_abc_classification",
    "emb_kmeans_lloyd",
    "pipeline_gdpr_erasure_plan",
    "dedup_payload_cdc_incremental",
    # (c) the 18 round-6-stale rows (latest driver check r6)
    "sim_topk_lsh",
    "stream_cdc_latest",
    "stream_dedup_watermark",
    "stream_incremental_agg",
    "stream_session_1h",
    "stream_sliding_3d1d",
    "stream_static_join",
    "stream_stream_funnel",
    "stream_tumbling_daily",
    "stream_tumbling_watermark",
    "text_inverted_index",
    "tpch_q12_priority_class",
    "window_lead_lag",
    "window_moving_avg_rows",
    "window_rolling_7d",
    "window_session_1h",
    "window_sliding_3d1d",
    "window_tumbling_daily",
    # (d) alphabetically-first 16 round-7-stale rows
    "agg_group_sum_sql",
    "agg_hll_sketch_rollup",
    "agg_kll_quantile_sketch",
    "binary_file_ingest",
    "customer_rfm_segments",
    "date_iso_ds",
    "ddl_create_table",
    "ddl_monthly_shard",
    "dedup_containment",
    "dedup_substring_windows",
    "derive_case_when",
    "derive_case_when_sql",
    "docs_ccnet_buckets",
    "docs_chunk_overlap",
    "docs_gopher_quality",
    "docs_pack_manifest",
)


def _reorder() -> None:
    """Rewrite QUERIES/ORACLES insertion order: DRIVER_PRIORITY first,
    then everything else in registration order."""
    for d in (QUERIES, ORACLES):
        snapshot = dict(d)
        d.clear()
        for name in DRIVER_PRIORITY:
            if name in snapshot:
                d[name] = snapshot.pop(name)
        d.update(snapshot)


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from . import queries_analytics  # noqa: F401
    from . import queries_core  # noqa: F401
    from . import queries_ext  # noqa: F401
    from . import queries_r9  # noqa: F401
    from . import queries_r11  # noqa: F401
    from . import queries_r12  # noqa: F401
    from . import queries_r13  # noqa: F401
    from . import queries_r14  # noqa: F401
    from . import queries_tpch  # noqa: F401

    _reorder()
