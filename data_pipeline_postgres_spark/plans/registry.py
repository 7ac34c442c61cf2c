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
# ``queries()`` in dict-insertion order (verified: CORRECTNESS_r01..r12
# keys == list(QUERIES)[:50]).
#
# Round-13 rotation (committed as VERDICT r12 item 1, first commit of
# the round): (a) ``cdc_scd2_apply`` promoted to position 1 for the
# re-drive of the r12 hash-red (locally value- and Arrow-type-exact;
# the all-NULL DATE union arm is pinned this round — see
# queries_r11.py and FIXTURES.md F6); (b) the 32 round-12 net-new
# queries, never driver-checked (all locally oracle-verified at
# sf0.001 + sf0.01 with the inline Arrow type audit); (c) the
# alphabetically-first 17 of the 18 remaining round-6 rows.
# 1 + 32 + 17 = 50.
#
# Round-14 rotation queue (to be committed at the start of round 14,
# kept honest here per the standing VERDICT discipline): the 15
# round-13 net-new queries first (dedup_payload_cdc,
# emb_mutual_knn_ann, orders_acf, orders_mann_kendall,
# customer_churn_training_set, docs_curriculum_pacing,
# stream_curriculum_pacing, layout_vacuum_plan,
# profile_drift_two_period, docs_split_leakage_audit,
# orders_rfm_segments, parts_abc_classification, emb_kmeans_lloyd,
# pipeline_gdpr_erasure_plan, dedup_payload_cdc_incremental — all
# locally
# oracle-verified at sf0.001 + sf0.01 with the inline Arrow type
# audit, or accuracy-gated where rows-only), then ``sim_topk_lsh``
# (the one round-6 row deferred from r13) and the 17 round-6 rows
# left over:
# stream_cdc_latest, stream_dedup_watermark, stream_incremental_agg,
# stream_session_1h, stream_sliding_3d1d, stream_static_join,
# stream_stream_funnel, stream_tumbling_daily,
# stream_tumbling_watermark, text_inverted_index,
# tpch_q12_priority_class, window_lead_lag, window_moving_avg_rows,
# window_rolling_7d, window_session_1h, window_sliding_3d1d,
# window_tumbling_daily. That is 15 + 18 = 33; the remaining 17 slots
# go to the alphabetically-first round-7 rows (the next-stalest
# tier). Any slots beyond 50 spill to round 15.

DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) the r12 red, re-driven first
    "cdc_scd2_apply",
    # (b) round-12 net-new, never driver-checked
    "docs_pack_bestfit",
    "docs_pack_efficiency",
    "dedup_payload_shingle",
    "docs_mix_capped_alloc",
    "dedup_payload_incremental",
    "docs_dup_spectrum",
    "stream_payload_dedup",
    "docs_dup_maxrun",
    "events_attribution_models",
    "events_attribution_markov",
    "multimodal_cdc_chunks",
    "multimodal_cdc_dedup_ratio",
    "customers_k_anonymity",
    "profile_dq_constraints",
    "docs_score_auc",
    "customers_kaplan_meier",
    "layout_compaction_plan",
    "orders_seasonal_decompose",
    "docs_mix_temperature",
    "tokenizer_coverage_curve",
    "sim_mmr_rerank",
    "stream_dq_constraints",
    "emb_knn_label_accuracy",
    "graph_assortativity",
    "orders_benford_audit",
    "orders_runs_test",
    "graph_modularity",
    "emb_mutual_knn",
    "pipeline_backfill_plan",
    "dedup_method_overlap",
    "customer_feature_snapshot",
    "stream_feature_snapshot",
    # (c) oldest round-6 rows (alphabetical first 17 of 18)
    "docs_split_train_val",
    "emb_quantize",
    "emb_random_projection",
    "events_forward_fill",
    "events_funnel_batch",
    "join_asof",
    "join_asof_forward",
    "join_range_banded",
    "join_salted_skew",
    "layout_zorder",
    "material_demand",
    "orc_roundtrip",
    "partitioned_write_prune",
    "pipeline_incremental_day",
    "profile_heavy_hitters",
    "profile_table_approx",
    "sim_ann_ivf_kmeans",
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
    from . import queries_tpch  # noqa: F401

    _reorder()
