"""Exact-substring duplication analysis by HASH DOUBLING (SURVEY.md
§2.11 [EXT]) — the distributed form of the suffix-array dedup
diagnostics from the exact-substring-dedup line of work.

A 2^k-token window fingerprint is md5(h_{k-1}(pos) ||
h_{k-1}(pos + 2^(k-1))): every level is ONE position-shift equi-join
of the N-row (pos, digest) relation, so all K levels cost O(K·N) and
the corpus text is scanned exactly once (level 0). Fingerprint
equality is content equality modulo md5 collisions (~2^-64, and
identical in both engines — the repo-wide digest posture).

Per-document sentinel tokens (chr(1) || doc_id, globally unique)
terminate each document, so a window spanning a document boundary
contains a unique token and can never be duplicated — the
generalized-suffix-array trick. Corpus positions come from the same
two-level prefix sum as operators/packing.py (bucketed within-sums +
one window over the tiny bucket-totals relation; never a
single-partition window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def position_stream(
    docs: DataFrame, bucket_width: int = 1000
) -> tuple[DataFrame, DataFrame]:
    """Lay the corpus out as one token stream in doc_id order:
    returns (level0, docmap) where level0 is (pos, h) — md5 token
    digests plus one unique sentinel digest per doc — and docmap is
    (pos, doc_id) for the REAL token positions only (sentinels carry
    no document)."""
    d = docs.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("w")
    ).withColumn("n", F.size("w").cast("bigint"))
    b = d.withColumn("bucket", F.expr(f"doc_id div {bucket_width}"))
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = b.withColumn("cum_in", F.sum(F.col("n") + 1).over(w_in))
    totals = b.groupBy("bucket").agg(
        F.sum(F.col("n") + 1).alias("btot")
    )
    w_b = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "bucket",
        F.coalesce(F.sum("btot").over(w_b), F.lit(0)).alias("boff"),
    )
    placed = within.join(F.broadcast(offsets), "bucket").withColumn(
        "cb", F.col("boff") + F.col("cum_in") - (F.col("n") + 1)
    )
    toks = placed.select(
        "doc_id",
        "cb",
        "n",
        F.posexplode("w").alias("i", "tok"),
    ).select(
        "doc_id",
        (F.col("cb") + F.col("i")).alias("pos"),
        F.md5("tok").alias("h"),
    )
    sent = placed.select(
        (F.col("cb") + F.col("n")).alias("pos"),
        F.md5(
            F.concat(F.lit("\x01"), F.col("doc_id").cast("string"))
        ).alias("h"),
    )
    toks = toks.localCheckpoint(eager=False)
    level0 = (
        toks.select("pos", "h")
        .unionByName(sent)
        .localCheckpoint(eager=False)
    )
    return level0, toks.select("pos", "doc_id")


def hash_doubling_levels(
    level0: DataFrame, rounds: int
) -> list[DataFrame]:
    """levels[k] = (pos, h) where h identifies the 2^k-token window
    starting at pos. Each level is one left shift-join of the
    previous one (windows running past the stream end pad with a
    literal — they are unique anyway). Every level is lineage-cut so
    level k is computed once, not 2^(K-k) times."""
    levels = [level0]
    for k in range(1, rounds + 1):
        delta = 1 << (k - 1)
        prev = levels[-1]
        nxt = (
            prev.join(
                prev.select(
                    (F.col("pos") - delta).alias("pos"),
                    F.col("h").alias("h2"),
                ),
                "pos",
                "left",
            )
            .select(
                "pos",
                F.md5(
                    F.concat(
                        F.col("h"),
                        F.coalesce(F.col("h2"), F.lit("E")),
                    )
                ).alias("h"),
            )
            .localCheckpoint(eager=False)
        )
        levels.append(nxt)
    return levels


def oracle_level_ctes(rounds: int) -> str:
    """The DuckDB mirror of position_stream + hash_doubling_levels:
    CTEs d/off/docpos/h0..h{rounds}. Every level re-referenced by the
    next is MATERIALIZED (DuckDB inlines plain CTEs; a doubling chain
    would re-plan the base scan 2^rounds times)."""
    head = r"""
WITH d AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w,
           len(regexp_split_to_array(trim(text), '\s+')) AS n
    FROM documents
),
off AS (
    SELECT doc_id, w, n,
           SUM(n + 1) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
               - (n + 1) AS cb
    FROM d
),
docpos AS MATERIALIZED (
    SELECT doc_id, cb + i - 1 AS pos
    FROM off, unnest(range(1, CAST(n AS BIGINT) + 1)) AS t(i)
),
h0 AS MATERIALIZED (
    SELECT cb + i - 1 AS pos, md5(w[i]) AS h
    FROM off, unnest(range(1, CAST(n AS BIGINT) + 1)) AS t(i)
    UNION ALL
    SELECT cb + n AS pos, md5(chr(1) || CAST(doc_id AS VARCHAR))
    FROM off
)"""
    return head + "".join(
        f""",
h{k} AS MATERIALIZED (
    SELECT a.pos, md5(a.h || COALESCE(b.h, 'E')) AS h
    FROM h{k - 1} a LEFT JOIN h{k - 1} b ON b.pos = a.pos + {1 << (k - 1)}
)"""
        for k in range(1, rounds + 1)
    )
