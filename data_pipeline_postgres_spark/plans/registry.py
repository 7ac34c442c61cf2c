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
# ``queries()`` in dict-insertion order (verified: CORRECTNESS_r01..r10
# keys == list(QUERIES)[:50]).
#
# Round-11 rotation, per VERDICT r10 items 1-2: (a) the 10 round-9
# additions never driver-checked (all locally oracle-verified); (b) the
# re-drive of ``multimodal_shard_manifest`` — r10's only hash-fail,
# root-caused to the oracle's uncast HUGEINT shard_id surfacing as
# decimal128 through Arrow (fixed queries_r9.py; tools/type_audit.py
# now gates the whole registry on Arrow-level type identity); (c) the
# 19 rows whose latest driver evidence is round 3; (d) the 20
# alphabetically-first of the 39 round-5 rows. 10+1+19+20 = 50.
#
# Round-12 rotation queue (committed now): the 17 round-11 net-new
# queries, never driver-checked (docs_bpe_train_merges,
# docs_url_dedup_cap, docs_snapshot_curation_diff,
# docs_perplexity_bucket, decontaminate_overlap_frac,
# tokenizer_fertility_by_lang, emb_cosine_calibration,
# dedup_minhash_band_sweep, decontaminate_multi_benchmark,
# docs_dup_source_matrix, events_holt_winters_forecast,
# demand_croston_forecast, docs_dsir_gumbel_select, cdc_scd2_apply,
# sim_ivf_nprobe_recall_curve, text_textrank_keywords,
# join_asof_tolerance (17 total) — all locally
# oracle-verified at sf0.01 + sf0.001 and Arrow-type-audited), then
# the 19 remaining r5 rows — sim_topk_batch, str_funcs_suite,
# text_rarity_score, text_tfidf_topterms, tpch_q4/q6/q7/q8/q10/q13/
# q14/q15/q17/q18/q19/q21/q22 suites, window_first_last_nth,
# window_rank_suite — then the oldest r6 rows to fill 50.

DRIVER_PRIORITY: tuple[str, ...] = (
    # (a) never driver-checked (round-9 additions)
    "docs_naive_bayes_source",
    "docs_nb_margin_calibration",
    "docs_ngram_novelty_curve",
    "docs_winnowing_fingerprints",
    "emb_matryoshka_agreement",
    "events_burst_range_join",
    "orders_holt_backtest",
    "orders_theil_sen_trend",
    "text_pmi_collocations",
    "text_rake_keywords",
    # (b) r10 hash-fail re-drive (oracle HUGEINT cast fix)
    "multimodal_shard_manifest",
    # (c) latest driver evidence round 3
    "dedup_embedding_cosine",
    "dedup_simhash_pairs",
    "doc_fingerprint",
    "emb_centroid_per_label",
    "emb_normalize",
    "lang_id",
    "multimodal_meta",
    "pii_redact",
    "profile_table",
    "sim_ann_ivf",
    "sim_topk",
    "text_normalize",
    "text_quality",
    "text_repetition_filter",
    "text_stats",
    "token_count",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    # (d) oldest round-5 rows (alphabetical first 20 of 39)
    "agg_corr_exact",
    "agg_histogram",
    "agg_zscore_exact",
    "bucket_global_quantile",
    "dataset_mixture",
    "date_funcs_suite",
    "ddl_create_schema",
    "ddl_drop_create",
    "decontaminate_ngram",
    "dedup_cluster_cc_star",
    "dedup_semantic",
    "docs_cap_per_source",
    "docs_curation_incremental",
    "docs_curation_pipeline",
    "join_left_outer",
    "multimodal_framesample",
    "parquet_schema_merge",
    "set_union_distinct",
    "sim_ann_ivf_batch",
    "sim_range_search",
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
    from . import queries_tpch  # noqa: F401

    _reorder()
