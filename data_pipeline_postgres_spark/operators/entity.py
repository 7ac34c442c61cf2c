"""Entity resolution: blocked fuzzy matching of catalog records.

The classic record-linkage shape (no analog in the reference — its
catalog arrives pre-keyed; this is the [EXT] operator a real lake needs
when the same real-world entity lands under multiple ids):

    normalize → BLOCK (cheap deterministic key) → pairwise verify
    INSIDE blocks only → match features / score.

Blocking is the whole scale story: candidate pairs are quadratic only
within a block, so the block key must have frequencies that DON'T grow
with catalog size. The product noun alone fails that test here —
measured on the sf0.1 catalog it yields 8 blocks for 20 000 parts
(25 M candidate pairs, 75 s of verify work; at 100 TB it is quadratic
death) because the noun vocabulary is fixed while the catalog grows.
The composite (noun, brand, type) key is the documented hot-block
mitigation applied as the default: block frequency is bounded by the
catalog's real granularity (1 200 blocks, max 33 rows, 167 k pairs on
the same data — a 150× candidate reduction with the match rule's hard
constraints, same brand + same type, moved INTO the key where they
prune before the join instead of after). AQE skew-join splitting
remains the backstop for a residual hot block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_name_match(part: DataFrame, min_jaccard: float = 0.3) -> DataFrame:
    """Candidate duplicate part listings: block on (product noun,
    brand, type) — duplicate listings of one real-world part agree on
    the hard attributes; the name is what drifts — then verify every
    within-block pair by exact token-set Jaccard of the full name,
    keeping pairs at or above ``min_jaccard`` → (a_key, b_key, block,
    jaccard, size_delta, price_delta_cents).

    The numeric deltas ride along so a downstream match rule can
    score without re-joining. All arithmetic is exact small-int
    counts until the single Jaccard division — identical in both
    engines, hash-safe.
    """
    toks = F.array_distinct(F.split(F.col("p_name"), " "))
    t = part.select(
        F.col("p_partkey").alias("key"),
        toks.alias("toks"),
        F.concat_ws(
            "|",
            F.element_at(F.split(F.col("p_name"), " "), -1),
            F.col("p_brand"),
            F.col("p_type"),
        ).alias("block"),
        F.col("p_size").cast("long").alias("size"),
        (F.col("p_retailprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("price_c"),
    )
    a, b = t.alias("a"), t.alias("b")
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    # union via inclusion-exclusion over the DISTINCT token arrays —
    # the one formula both engines compute identically
    uni = F.size(F.col("a.toks")) + F.size(F.col("b.toks")) - inter
    jac = inter.cast("double") / uni.cast("double")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.key") < F.col("b.key")),
        )
        .select(
            F.col("a.key").alias("a_key"),
            F.col("b.key").alias("b_key"),
            F.col("a.block").alias("block"),
            jac.alias("jaccard"),
            F.abs(F.col("a.size") - F.col("b.size")).alias("size_delta"),
            F.abs(F.col("a.price_c") - F.col("b.price_c")).alias(
                "price_delta_cents"
            ),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
