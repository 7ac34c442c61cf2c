"""Text cleaning / filtering operators for training-data curation
(SURVEY.md §2.11 [EXT]): normalization, PII redaction, repetition
filtering — the standard pre-training scrub passes (C4/Gopher-style)
that sit upstream of dedup in an LLM data pipeline.

All regex/scalar work is pure Column expressions (JVM-side, whole-stage
codegen); the only shuffle in the module is the per-doc bigram mode in
``repetition`` (explode → two key-local aggregations — linear, and both
shuffles are keyed by doc_id so AQE coalesces them). Regex patterns are
module constants interpolated into the DuckDB oracles, so both engines
run byte-identical patterns (Java regex and RE2 agree on this subset:
ASCII classes, bounded repeats, word boundaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX

# Control characters (C0 + DEL) → space, then whitespace runs collapse.
CTRL_RE = r"[\x00-\x1f\x7f]"
WS_RE = r"\s+"

# PII patterns — applied in this fixed order (email, then IPv4, then
# phone) on both engines; counts are measured on the ORIGINAL text.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d[\d\- ]{7,}\d"

# Repetition-filter thresholds (Gopher-style keep gate).
MIN_DISTINCT_RATIO = 0.3
MAX_TOP_BIGRAM_FRAC = 0.25


def normalize(docs: DataFrame) -> DataFrame:
    """Canonical text form: (doc_id, norm_text, n_chars_norm).

    lower → control chars to spaces → collapse whitespace runs → trim.
    Per-row, no shuffle; at 100 TB this is a pure map stage that
    pipelines into whatever consumes it.
    """
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), CTRL_RE, " "),
            WS_RE,
            " ",
        )
    )
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).cast("bigint").alias("n_chars_norm"),
    )


def pii_redact(docs: DataFrame) -> DataFrame:
    """PII scrub: (doc_id, redacted, n_emails, n_ips, n_phones).

    Emails → ``<EMAIL>``, IPv4 → ``<IP>``, phone-like runs →
    ``<PHONE>``, applied in that fixed order; counts are of the
    original text so they are independent of replacement order.
    Per-row map stage, no shuffle.
    """
    t = F.col("text")
    red = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, IPV4_RE, "<IP>")
    red = F.regexp_replace(red, PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        red.alias("redacted"),
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("bigint").alias("n_ips"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("bigint").alias("n_phones"),
    )


def repetition(docs: DataFrame) -> DataFrame:
    """Repetition metrics + keep gate: (doc_id, n_tokens,
    distinct_ratio, top_bigram_frac, keep).

    distinct_ratio = |distinct tokens| / |tokens| (pure Column).
    top_bigram_frac = occurrences of the doc's most frequent word
    bigram / total bigrams — the per-doc mode needs a real
    aggregation: explode bigrams → count per (doc, bigram) → max/sum
    per doc. Both aggregations and the final join are keyed by doc_id,
    so the whole thing is one logical repartition by doc — linear in
    corpus size, never pairwise. Ratios are exact-int divisions.
    """
    toks = TX.tokens("text")
    base = docs.select(
        "doc_id",
        F.size(toks).alias("n"),
        F.size(F.array_distinct(toks)).alias("nd"),
    )
    bg = docs.select(
        "doc_id",
        F.explode(TX.word_shingles(TX.tokens("text"), 2)).alias("bg"),
    )
    top = (
        bg.groupBy("doc_id", "bg")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_c"), F.sum("count").alias("n_bg"))
    )
    # Zero-token guard: non-ANSI Spark yields NULL for 0/0 while
    # DuckDB yields inf — pin the empty-doc case to 0.0 (and keep=false)
    # on both sides.
    dr = F.when(
        F.col("n") > 0, F.col("nd").cast("double") / F.col("n")
    ).otherwise(F.lit(0.0))
    tbf = F.coalesce(
        F.col("top_c").cast("double") / F.col("n_bg"), F.lit(0.0)
    )
    return base.join(top, "doc_id", "left").select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        dr.alias("distinct_ratio"),
        tbf.alias("top_bigram_frac"),
        (
            (dr >= MIN_DISTINCT_RATIO) & (tbf <= MAX_TOP_BIGRAM_FRAC)
        ).alias("keep"),
    )
