"""Approximate-nearest-neighbor / similarity search over an embedding
column (SURVEY.md §2.11 [EXT]; ``embeddings`` table: vec_id,
embedding array<float>, label).

Three tiers, from correctness baseline to 100 TB scale path:

1. **brute_topk** — exact cosine top-k against a query vector. One
   narrow pass (per-row HOF dot product, whole-stage codegen) + a
   top-k sort. On a cluster this is a map + takeOrdered: no shuffle
   of the corpus, only k rows per partition reach the driver-side
   merge. Baseline + oracle.
2. **sign_lsh_buckets** — random-hyperplane LSH: bucket id = sign
   bits of dot(v, hyperplane_p). Hyperplanes are derived
   deterministically from md5, so the bucketing is reproducible
   across engines and runs. Near-dup / knn probing becomes a bucket
   equi-join (shuffle on small uniform bucket keys) instead of a
   cross join.
3. **ivf_topk** — IVF-lite: coarse quantizer = nlist deterministic
   seed centroids; every vector is assigned to its nearest centroid
   (one narrow pass — the centroid set is tiny and broadcast); a
   query probes the ``nprobe`` closest inverted lists and reranks
   exactly within them. At 100 TB the inverted lists are the
   partitioning key (write-time clustering), so a probe touches
   nprobe/nlist of the data — classic IVF pruning. Real systems
   train centroids with k-means (spark.ml KMeans drops in here);
   the seed-sample quantizer keeps this deterministic and
   oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V


def _vecs(emb: DataFrame) -> DataFrame:
    return emb.select("vec_id", V.as_double(F.col("embedding")).alias("v"))


def query_vector(emb: DataFrame) -> DataFrame:
    """Deterministic 1-row query-vector relation: the min-vec_id row.

    Kept as a relation (not a collected literal) so the plan is a
    broadcast-able 1-row cross join — no driver round-trip, and the
    oracle can express the identical thing as a CTE.

    ``orderBy().limit(1)`` compiles to TakeOrderedAndProject: each
    partition keeps its min row, the driver merges N candidates — no
    single-partition global sort.
    """
    return (
        _vecs(emb)
        .orderBy("vec_id")
        .limit(1)
        .select(F.col("v").alias("qv"))
    )


def brute_topk(emb: DataFrame, k: int = 10, round_digits: int = 6) -> DataFrame:
    """Exact cosine top-k vs the deterministic query vector:
    (vec_id, cosine), ties broken by vec_id.

    The reduction is ``orderBy().limit(k)`` → TakeOrderedAndProject:
    a per-partition k-heap, then a driver merge of k rows per
    partition — the scored corpus never funnels through one
    partition (plan-asserted in tests/test_ext.py).
    """
    vs = _vecs(emb)
    q = query_vector(emb)
    scored = vs.crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.round(V.cosine(F.col("v"), F.col("qv")), round_digits).alias(
            "cosine"
        ),
    )
    return (
        scored.orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "cosine")
    )


# -- sign LSH --------------------------------------------------------------


def _hyperplane(p: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane p: component d is mapped
    from md5("p:d") hex into [-1, 1). Reproducible everywhere."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(str(p)), d.cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(2**31))
            - 1.0
        ),
    )


def sign_lsh_buckets(
    emb: DataFrame, planes: int = 8, dim: int = 64, band: int = 0
) -> DataFrame:
    """(vec_id, bucket): bucket = integer of sign bits of
    dot(v, hyperplane_p) for p in 0..planes-1. ``band`` offsets the
    hyperplane family (plane index = band·planes + p) so multi-band
    OR-amplification (dedup.embedding_near_dup_lsh) gets independent
    families per band.

    Narrow per-row computation; the payoff is that cosine-similar
    vectors collide with high probability, so downstream pairwise
    work becomes a bucket equi-join.
    """
    vs = _vecs(emb)
    bits = [
        F.when(
            V.dot(F.col("v"), _hyperplane(band * planes + p, dim)) >= 0,
            F.lit(1 << p),
        ).otherwise(F.lit(0))
        for p in range(planes)
    ]
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return vs.select("vec_id", bucket.cast("bigint").alias("bucket"))


def lsh_topk(
    emb: DataFrame,
    k: int = 10,
    planes: int = 4,
    dim: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """ANN top-k: score only vectors in the query's LSH bucket, rerank
    exactly. Approximate — recall measured against brute_topk in
    tests. (vec_id, cosine)."""
    buckets = sign_lsh_buckets(emb, planes, dim)
    vs = _vecs(emb).join(buckets, "vec_id")
    q = (
        vs.orderBy("vec_id")
        .limit(1)
        .select(
            F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
        )
    )
    scored = (
        vs.crossJoin(F.broadcast(q))
        .filter(F.col("bucket") == F.col("qbucket"))
        .select(
            "vec_id",
            F.round(
                V.cosine(F.col("v"), F.col("qv")), round_digits
            ).alias("cosine"),
        )
    )
    return (
        scored.orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "cosine")
    )


# -- IVF-lite --------------------------------------------------------------


def ivf_centroids(emb: DataFrame, nlist: int = 8) -> DataFrame:
    """Coarse quantizer: the ``nlist`` smallest-vec_id vectors as seed
    centroids → (centroid_id 0.., cv). Deterministic stand-in for a
    KMeans fit (spark.ml KMeans(seed=…) slots in here unchanged).

    The corpus-wide reduction is ``orderBy().limit(nlist)``
    (TakeOrderedAndProject); the row_number that assigns centroid ids
    runs AFTER the limit, over an nlist-row relation — a window over
    ≤nlist rows, not over the corpus."""
    seeds = _vecs(emb).orderBy("vec_id").limit(nlist)
    w = Window.orderBy("vec_id")
    return (
        seeds.withColumn("rn", F.row_number().over(w))
        .select(
            (F.col("rn") - 1).alias("centroid_id"),
            F.col("v").alias("cv"),
        )
    )


def ivf_assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine:
    (vec_id, centroid_id). The centroid relation is tiny → broadcast;
    assignment is a narrow map over the corpus (argmax via
    row_number within vec_id), the write-time clustering key at
    scale."""
    scored = (
        _vecs(emb)
        .crossJoin(F.broadcast(centroids))
        .select(
            "vec_id",
            "centroid_id",
            V.cosine(F.col("v"), F.col("cv")).alias("cs"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cs"), F.asc("centroid_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "centroid_id")
    )


def ivf_topk(
    emb: DataFrame,
    k: int = 10,
    nlist: int = 8,
    nprobe: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """IVF ANN top-k vs the deterministic query vector: probe the
    ``nprobe`` nearest inverted lists, exact rerank within them.
    (vec_id, cosine)."""
    cents = ivf_centroids(emb, nlist)
    assign = ivf_assign(emb, cents)
    q = query_vector(emb)
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "centroid_id",
            V.cosine(F.col("cv"), F.col("qv")).alias("cs"),
        )
        .orderBy(F.desc("cs"), F.asc("centroid_id"))
        .limit(nprobe)
        .select("centroid_id")
    )
    shortlist = _vecs(emb).join(assign, "vec_id").join(
        F.broadcast(probe), "centroid_id", "left_semi"
    )
    scored = shortlist.crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.round(V.cosine(F.col("v"), F.col("qv")), round_digits).alias(
            "cosine"
        ),
    )
    return (
        scored.orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "cosine")
    )
