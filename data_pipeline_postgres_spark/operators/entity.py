"""Entity resolution: blocked fuzzy matching of catalog records.

The classic record-linkage shape (no analog in the reference — its
catalog arrives pre-keyed; this is the [EXT] operator a real lake needs
when the same real-world entity lands under multiple ids):

    normalize → BLOCK (cheap deterministic key) → pairwise verify
    INSIDE blocks only → match features / score.

Blocking is the whole scale story: candidate pairs are quadratic only
within a block, and block sizes are bounded by the key's frequency
distribution — the same reasoning as LSH bucketing in
``operators/dedup``. At 100 TB a hot block (a generic product noun) is
the skew risk; the mitigations are a finer composite key (noun +
brand), a block-size cap with overflow to a secondary key, or plain AQE
skew-join splitting — the verify math is unchanged under all three.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_name_match(part: DataFrame, min_jaccard: float = 0.3) -> DataFrame:
    """Candidate duplicate part listings: block on the product noun
    (last name token), verify every within-block pair by exact
    token-set Jaccard of the full name, keep pairs at or above
    ``min_jaccard`` → (a_key, b_key, block, jaccard, same_brand,
    same_type).

    Equality-feature columns (brand/type agreement) ride along so a
    downstream match rule can score them without re-joining. All
    arithmetic is exact small-int counts until the single Jaccard
    division — identical in both engines, hash-safe.
    """
    toks = F.array_distinct(F.split(F.col("p_name"), " "))
    t = part.select(
        F.col("p_partkey").alias("key"),
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("ptype"),
        toks.alias("toks"),
        F.element_at(F.split(F.col("p_name"), " "), -1).alias("block"),
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
            (F.col("a.brand") == F.col("b.brand")).alias("same_brand"),
            (F.col("a.ptype") == F.col("b.ptype")).alias("same_type"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
