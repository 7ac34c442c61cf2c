"""Deduplication operators for LLM-training-data pipelines
(SURVEY.md §2.11 [EXT]; grounded in the driver's ``documents`` and
``embeddings`` tables — the reference pipeline has no dedup surface).

Scale design (the point of each operator at 100 TB):

- **exact**: one shuffle on a 256-bit content hash; map-side partial
  aggregation collapses most duplicates before the exchange.
- **minhash LSH**: per-doc signature is narrow (explode shingles →
  groupBy doc×band = one shuffle keyed by doc_id); candidate generation
  shuffles on *band key* (small, uniform); verification joins only the
  candidate pairs, never the full cross product. This is the textbook
  shingle→minhash→band→bucket-join pipeline: cost O(docs × shingles)
  + O(candidates), not O(docs²).
- **simhash**: single explode + one groupBy(doc) — linear, no pairwise
  stage at all; near-dup lookup is then an equality/band probe on the
  64-bucket fingerprint space.
- **n-gram Jaccard**: exact pairwise scores via shingle equi-join —
  quadratic in bucket size, so at scale it runs AFTER an LSH/band
  filter (as minhash's verify step does); exposed standalone for
  small/bucketed inputs and as the oracle-checkable ground truth.
- **embedding cosine**: brute pairwise is the correctness baseline;
  the scale path buckets by sign-LSH first (similarity.py).

All hashes are lowercase-hex md5 strings compared lexicographically —
bit-identical in DuckDB, so every operator here is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..functions import vectors as V


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup on normalized content hash; survivor = min doc_id
    per hash group. Returns (doc_id, text_hash, n_copies).

    Replaces nothing in the reference (it has no dedup); the idiom is
    sha2(normalized text) → hash-shuffle groupBy. At 100 TB the groupBy
    does map-side partial min/count, so the exchange carries one row
    per distinct hash per partition.
    """
    return (
        docs.select(
            F.col("doc_id"),
            F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("text_hash"),
        )
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count("*").alias("n_copies"),
        )
        .select("doc_id", "text_hash", "n_copies")
    )


def doc_shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (doc_id, shingle)."""
    return docs.select(
        "doc_id",
        F.explode(TX.word_shingles(TX.tokens("text"), n)).alias("shingle"),
    ).distinct()


def _minhash_sig(band: Column, row: Column, shingle: Column) -> Column:
    """One minhash slot: md5 over (band, row, shingle) — an independent
    hash family member per (band, row), min-reduced over shingles."""
    return F.md5(
        F.concat_ws(":", band.cast("string"), row.cast("string"), shingle)
    )


def minhash_bands(
    shingles: DataFrame, bands: int = 4, rows: int = 2
) -> DataFrame:
    """Per-doc LSH band keys: (doc_id, band, band_key).

    band_key = concat of the band's ``rows`` minhash values; two docs
    land in the same bucket for a band iff all ``rows`` slots agree.
    One explode (bands) + one groupBy(doc_id, band) — a single shuffle
    keyed by doc, which AQE coalesces; no pairwise work here.
    """
    b = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    per_band = shingles.select("doc_id", "shingle", b)
    aggs = [
        F.min(_minhash_sig(F.col("band"), F.lit(r), F.col("shingle"))).alias(
            f"mh{r}"
        )
        for r in range(rows)
    ]
    sig = per_band.groupBy("doc_id", "band").agg(*aggs)
    return sig.select(
        "doc_id",
        "band",
        F.concat_ws("|", F.col("band").cast("string"), *[f"mh{r}" for r in range(rows)]).alias(
            "band_key"
        ),
    )


def minhash_candidates(band_keys: DataFrame) -> DataFrame:
    """Candidate pairs: docs sharing ≥1 band bucket → (doc_a, doc_b).

    Self-join on band_key (small uniform key → well-distributed
    shuffle; AQE skew-split handles hot buckets), then distinct.
    """
    a = band_keys.alias("a")
    b = band_keys.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def jaccard_pairs(
    shingles: DataFrame,
    candidates: DataFrame | None = None,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact shingle-Jaccard pairs ≥ threshold:
    (doc_a, doc_b, jaccard).

    Intersections come from a shingle equi-join (never a cross join);
    when ``candidates`` is given (the LSH path), the join is
    pre-filtered to candidate pairs so cost is O(candidates), the
    100 TB idiom. jaccard = |∩| / (|A|+|B|-|∩|) — exact integer
    division to double, deterministic for the oracle hash.
    """
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = shingles.alias("sa")
    b = shingles.alias("sb")
    inter = (
        a.join(
            b,
            (F.col("sa.shingle") == F.col("sb.shingle"))
            & (F.col("sa.doc_id") < F.col("sb.doc_id")),
        )
        .groupBy(
            F.col("sa.doc_id").alias("doc_a"),
            F.col("sb.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("n_common"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["doc_a", "doc_b"], "left_semi")
    na = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")
    )
    nb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")
    )
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_dedup(
    docs: DataFrame,
    n: int = 3,
    bands: int = 4,
    rows: int = 2,
    threshold: float = 0.8,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: shingle → minhash → band →
    bucket-join → exact-Jaccard verify. Returns verified pairs
    (doc_a, doc_b, jaccard) with jaccard ≥ threshold.

    False positives from banding are removed by the verify step, so
    the output is exact *given* the candidate set; recall is governed
    by (bands, rows) — P(candidate) = 1-(1-j^rows)^bands.
    """
    sh = doc_shingles(docs, n)
    cands = minhash_candidates(minhash_bands(sh, bands, rows))
    return jaccard_pairs(sh, cands, threshold)


# -- SimHash ---------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(docs: DataFrame) -> DataFrame:
    """32-bit SimHash fingerprint per doc: (doc_id, simhash).

    Bit b of md5(token) is extracted hex-digit-wise with arithmetic
    DuckDB reproduces exactly (instr on a hex alphabet + floor/pow),
    summed ±1 over distinct tokens, majority → bit. One explode
    (tokens × 32 bit slots) + one groupBy(doc_id) — linear, no pairs.
    Near-dup probing is then a fingerprint-equality (or banded
    hamming) lookup, done by the caller.
    """
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(TX.tokens("text"))).alias("tok")
    )
    b = F.explode(
        F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))
    ).alias("b")
    bits = toks.select("doc_id", F.md5(F.col("tok")).alias("h"), b)
    hexdigit = F.substring(
        F.col("h"), (F.col("b") / 4).cast("int") + 1, 1
    )
    val = F.instr(F.lit("0123456789abcdef"), hexdigit) - 1
    bit = (
        F.floor(val / F.pow(F.lit(2), 3 - (F.col("b") % 4))).cast("int") % 2
    )
    contrib = bits.select(
        "doc_id", "b", (bit * 2 - 1).alias("c")
    )
    return (
        contrib.groupBy("doc_id", "b")
        .agg(F.sum("c").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("s") > 0,
                    F.pow(F.lit(2), F.col("b")).cast("bigint"),
                ).otherwise(F.lit(0).cast("bigint"))
            ).alias("simhash")
        )
    )


# -- Embedding near-dup ----------------------------------------------------


def embedding_near_dup(
    emb: DataFrame, threshold: float = 0.45, round_digits: int = 6
) -> DataFrame:
    """Near-duplicate vector pairs by cosine ≥ threshold:
    (vec_id_a, vec_id_b, cosine).

    Brute pairwise — the correctness baseline (verified bit-identical
    against DuckDB's ordered list fold). The 100 TB path replaces the
    `<` cross-join with a sign-LSH bucket equi-join
    (similarity.sign_lsh_buckets) and runs this exact scorer only
    within buckets.
    """
    v = emb.select(
        "vec_id", V.as_double(F.col("embedding")).alias("v")
    )
    a = v.alias("a")
    b = v.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            F.round(
                V.cosine(F.col("a.v"), F.col("b.v")), round_digits
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
