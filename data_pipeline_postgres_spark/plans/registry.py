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
# ``queries()`` in dict-insertion order (verified: CORRECTNESS_r01..r09
# keys == list(QUERIES)[:50]).
#
# Round-10 rotation, per VERDICT r9 item 1: drain the never-checked
# backlog (60 round-9 additions).  The window takes 50 of the 60 —
# the statistical-test suite and BM25/RRF retrieval stack front-loaded
# as the verdict prioritizes (their int64-ubit quantized log-prob /
# libm-sensitive arithmetic is exactly what the driver's sf0.01 check
# exists to confirm), with ``events_did_estimator`` swapped into the
# window (verdict names it a priority) and ``emb_matryoshka_agreement``
# rolling to r11 in its place.  Net-new queries are FROZEN this round
# until the backlog fits inside one window (verdict item 1).
#
# Round-11 rotation queue (committed now per VERDICT r9 item 5):
# (a) the 10 never-checked leftovers — emb_matryoshka_agreement,
#     orders_holt_backtest, text_rake_keywords, docs_naive_bayes_source,
#     orders_theil_sen_trend, text_pmi_collocations,
#     docs_winnowing_fingerprints, events_burst_range_join,
#     docs_nb_margin_calibration, docs_ngram_novelty_curve;
# (b) the 19 rows whose latest driver evidence is r3 —
#     dedup_embedding_cosine, sim_topk, sim_ann_ivf, profile_table,
#     emb_normalize, emb_centroid_per_label, text_stats, token_count,
#     lang_id, text_quality, doc_fingerprint, text_normalize,
#     pii_redact, text_repetition_filter, multimodal_meta,
#     tpch_q1_pricing_summary, tpch_q3_shipping_priority,
#     tpch_q5_local_supplier, dedup_simhash_pairs;
# (c) the 21 oldest rows whose latest evidence is r5.
# 10 + 19 + 21 = 50.  After the r11 window nothing is never-checked
# and no query's latest evidence is older than r5.

DRIVER_PRIORITY: tuple[str, ...] = (
    # statistical-test suite (verdict-prioritized)
    "events_ab_welch_ttest",
    "events_cuped_ab_adjusted",
    "events_did_estimator",
    "events_ks_two_sample",
    "events_mann_whitney_u",
    "events_chi2_independence",
    "events_km_conversion_curve",
    # retrieval stack (verdict-prioritized)
    "text_bm25_search",
    "search_hybrid_rrf",
    # remaining never-checked round-9 additions
    "decontaminate_embedding",
    "graph_kcore",
    "table_diff_audit",
    "bpe_pair_merges",
    "text_bigram_logprob",
    "lang_id_confusion",
    "emb_pca_power_iteration",
    "dedup_simhash_incremental",
    "events_pattern_detect",
    "profile_column_entropy",
    "docs_pack_fragmentation",
    "stream_pii_redact",
    "docs_shingle_novelty",
    "graph_bfs_distance",
    "csv_malformed_permissive",
    "agg_mode_exact",
    "docs_compression_ratio",
    "docs_dsir_weights",
    "stream_decontaminate",
    "sim_ivf_balance",
    "docs_gopher_rule_ablation",
    "events_conversion_lag_stats",
    "orders_basket_size_histogram",
    "emb_hard_negative_mining",
    "part_entity_match",
    "sim_topk_int8",
    "sim_topk_int8_recall",
    "events_session_paths",
    "agg_weighted_median",
    "orders_revenue_holt_forecast",
    "sketch_count_min_freq",
    "sketch_bloom_membership",
    "stream_cms_rollup",
    "multimodal_shard_manifest",
    "events_out_of_order_audit",
    "text_bigram_kn_logprob",
    "part_brand_discount_ols",
    "graph_random_walks",
    "agg_bootstrap_ci_mean",
    "graph_walk_skipgram_pairs",
    "events_psi_value_drift",
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
