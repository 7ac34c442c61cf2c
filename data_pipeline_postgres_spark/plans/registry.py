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
# ``queries()`` in dict-insertion order (verified: CORRECTNESS_r01..r08
# keys == list(QUERIES)[:50]).  Round-9 rotation, per VERDICT r8 items
# 1-2: (a) all 26 round-8 additions that have never held a driver slot
# (oracle-backed except stream_zscore_daily, green in the local parity
# suite) — including the 3 late-commit text queries
# (text_char_entropy, text_unigram_logprob, text_zipf_fit) whose
# log2-based int64-quantized oracles specifically want the driver's
# sf0.01 libm-parity confirmation; (b) the 4 rows whose latest
# evidence is r2; (c) the first 20 rows whose latest evidence is r3.
# 26 + 4 + 20 = 50.  After this window every query's most recent
# driver evidence is r3 or newer and nothing is never-checked.
#
# Round-10 rotation queue (front-load in this order — never-checked
# queries take priority over refresh rows now that together they
# exceed the 50-slot window): (a) the 52 round-9 additions (never
# driver-checked; all in bench HEADLINE and local parity) — decontaminate_embedding, graph_kcore,
# table_diff_audit, bpe_pair_merges, text_bigram_logprob,
# lang_id_confusion, emb_pca_power_iteration (rows-only),
# dedup_simhash_incremental, events_pattern_detect,
# profile_column_entropy, docs_pack_fragmentation, stream_pii_redact,
# docs_shingle_novelty, graph_bfs_distance, csv_malformed_permissive,
# agg_mode_exact, docs_compression_ratio (rows-only),
# docs_dsir_weights, stream_decontaminate, sim_ivf_balance,
# docs_gopher_rule_ablation, events_conversion_lag_stats,
# orders_basket_size_histogram, emb_hard_negative_mining,
# emb_matryoshka_agreement, part_entity_match, sim_topk_int8,
# sim_topk_int8_recall, events_session_paths, agg_weighted_median,
# orders_revenue_holt_forecast, sketch_count_min_freq,
# sketch_bloom_membership, stream_cms_rollup,
# multimodal_shard_manifest, events_out_of_order_audit,
# text_bigram_kn_logprob, part_brand_discount_ols,
# events_ab_welch_ttest, events_km_conversion_curve,
# events_cuped_ab_adjusted, graph_random_walks,
# agg_bootstrap_ci_mean, text_bm25_search, search_hybrid_rrf,
# graph_walk_skipgram_pairs, events_psi_value_drift,
# events_ks_two_sample, events_mann_whitney_u,
# events_chi2_independence, events_did_estimator,
# orders_holt_backtest, text_rake_keywords,
# docs_naive_bayes_source, orders_theil_sen_trend;
# (the 19 r3-evidence refresh rows all roll to r11:
# dedup_embedding_cosine, sim_topk, sim_ann_ivf, profile_table,
# emb_normalize, emb_centroid_per_label, text_stats, token_count,
# lang_id, text_quality, doc_fingerprint, text_normalize,
# pii_redact, text_repetition_filter, multimodal_meta,
# tpch_q1_pricing_summary, tpch_q3_shipping_priority,
# tpch_q5_local_supplier, plus dedup_simhash_pairs rolling too).
# 60 never-checked round-9 additions > 50 slots: the LAST ten
# (events_did_estimator, orders_holt_backtest, text_rake_keywords,
# docs_naive_bayes_source, orders_theil_sen_trend,
# text_pmi_collocations, docs_winnowing_fingerprints,
# events_burst_range_join, docs_nb_margin_calibration,
# docs_ngram_novelty_curve) roll to r11 with the 19 r3 refresh rows.

DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) round-8 additions, never driver-checked (26)
    "text_char_entropy",
    "text_unigram_logprob",
    "text_zipf_fit",
    "jdbc_scan_partitioned",
    "events_user_gini",
    "orders_ship_backlog_daily",
    "events_rolling_slope_7d",
    "events_new_vs_returning",
    "events_dormancy_revival",
    "emb_label_drift",
    "emb_outlier_topk",
    "docs_boilerplate_ngrams",
    "docs_near_dup_rate_by_source",
    "docs_vocab_growth",
    "docs_length_histogram_pow2",
    "docs_quality_dup_crosstab",
    "dedup_simhash_hamming_hist",
    "events_anomaly_zscore_rolling",
    "docs_mix_temperature_alloc",
    "stream_zscore_daily",
    "docs_dedup_impact_tokens",
    "docs_quality_drift_by_decile",
    "emb_centroid_cosine_matrix",
    "dedup_minhash_jaccard_hist",
    "events_audience_overlap",
    "emb_norm_histogram",
    # (b) refresh filler: latest driver evidence r2 (4)
    "agg_grouping_sets",
    "agg_having",
    "agg_count_distinct",
    "agg_stats_multi",
    # (c) refresh filler: latest driver evidence r3, oldest-first (20)
    "s3_put",
    "bulk_load_copy",
    "join_bucketed_colocated",
    "text_ngram_topk",
    "sort_limit_topn",
    "set_intersect",
    "set_except",
    "join_semi",
    "join_anti",
    "pivot_wide",
    "agg_cube",
    "filter_scalar_subquery",
    "join_bloom_filtered",
    "dedup_exact",
    "dedup_incremental",
    "docs_sample_stratified",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "dedup_cluster_cc",
    "dedup_simhash",
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
    from . import queries_tpch  # noqa: F401

    _reorder()
