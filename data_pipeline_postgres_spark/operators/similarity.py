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


def batch_topk(
    emb: DataFrame, k: int = 10, nq: int = 4, round_digits: int = 6
) -> DataFrame:
    """Multi-query exact retrieval: the ``nq`` smallest-vec_id vectors
    each fetch their cosine top-k over the corpus → (qid, vec_id,
    cosine) — the realistic batch-retrieval shape (one query vector at
    a time wastes the corpus scan).

    ONE corpus pass: the query set rides in as a broadcast array of
    (qid, qn, qv) structs with norms precomputed; each corpus row
    computes its own norm once, explodes to nq scored rows, and the
    per-query top-k is a rank-limited window — Spark's
    WindowGroupLimit rewrites it to a per-partition k-heap BEFORE the
    qid exchange (plan-asserted), so the shuffle carries ≤ k·nq rows
    per partition, never the scored corpus."""
    vs = _vecs(emb)
    qarr = (
        vs.orderBy("vec_id")
        .limit(nq)
        .select(
            F.struct(
                F.col("vec_id").alias("qid"),
                V.norm(F.col("v")).alias("qn"),
                F.col("v").alias("qv"),
            ).alias("s")
        )
        .agg(F.array_sort(F.collect_list("s")).alias("qs"))
    )
    scored = (
        vs.crossJoin(F.broadcast(qarr))
        .select(
            "vec_id",
            "v",
            V.norm(F.col("v")).alias("vn"),
            F.explode("qs").alias("q"),
        )
        .select(
            F.col("q.qid").alias("qid"),
            "vec_id",
            F.round(
                V.dot(F.col("v"), F.col("q.qv"))
                / (F.col("vn") * F.col("q.qn")),
                round_digits,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", "cosine")
    )


def range_search(
    emb: DataFrame,
    threshold: float = 0.3,
    nq: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """Radius (range) search: every corpus vector within cosine ≥
    ``threshold`` of each of the ``nq`` smallest-vec_id query vectors
    → (qid, vec_id, cosine), self-matches excluded.

    The third retrieval primitive next to top-k and ANN: "give me
    EVERYTHING closer than τ" (near-dup mining, semantic dedup
    candidate generation, recall-first retrieval).

    Strictly better plan than top-k at scale: after the broadcast
    query explode, admission is a pure FILTER — no window, no heap,
    no exchange at all. The corpus is scanned once, scored nq× inside
    whole-stage codegen, and only admitted rows leave the task.
    Cosines are rounded to ``round_digits`` BEFORE the threshold
    compare on both engines, so boundary admission is bit-identical.
    """
    vs = _vecs(emb)
    qarr = (
        vs.orderBy("vec_id")
        .limit(nq)
        .select(
            F.struct(
                F.col("vec_id").alias("qid"),
                V.norm(F.col("v")).alias("qn"),
                F.col("v").alias("qv"),
            ).alias("s")
        )
        .agg(F.array_sort(F.collect_list("s")).alias("qs"))
    )
    return (
        vs.crossJoin(F.broadcast(qarr))
        .select(
            "vec_id",
            V.norm(F.col("v")).alias("vn"),
            "v",
            F.explode("qs").alias("q"),
        )
        .select(
            F.col("q.qid").alias("qid"),
            "vec_id",
            F.round(
                V.dot(F.col("v"), F.col("q.qv"))
                / (F.col("vn") * F.col("q.qn")),
                round_digits,
            ).alias("cosine"),
        )
        .filter(
            (F.col("cosine") >= threshold)
            & (F.col("vec_id") != F.col("qid"))
        )
    )


def ivf_batch_topk(
    emb: DataFrame,
    k: int = 10,
    nq: int = 4,
    nlist: int = 8,
    nprobe: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Batch IVF ANN: each of the ``nq`` smallest-vec_id query vectors
    probes its own ``nprobe`` nearest inverted lists and reranks
    exactly within them → (qid, vec_id, cosine), top-k per query.

    The scale shape composes the two single-purpose plans: corpus rows
    get their inverted-list id from the narrow broadcast-array argmax
    (ONE pass, no shuffle), the per-query probe sets come from a
    window over the tiny nq×nlist relation, and the per-query cut is a
    rank-limited window (WindowGroupLimit per-partition heaps). The
    corpus is scanned once for assignment+scoring; only rows in probed
    lists reach the scoring join."""
    cents = ivf_centroids(emb, nlist)
    vs = _vecs(emb)
    qs = (
        vs.orderBy("vec_id")
        .limit(nq)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("v").alias("qv"),
        )
    )
    # per-query probe sets: tiny (nq × nlist) relation, window-ranked
    probe = (
        qs.crossJoin(F.broadcast(cents))
        .select(
            "qid",
            "centroid_id",
            V.cosine(F.col("qv"), F.col("cv")).alias("cs"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.desc("cs"), F.asc("centroid_id")
                )
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("qid", "centroid_id")
    )
    assigned = (
        vs.crossJoin(F.broadcast(_centroid_array(cents)))
        .withColumn(
            "centroid_id", _nearest_centroid(F.col("v"), F.col("cents"))
        )
        .drop("cents")
    )
    scored = (
        assigned.join(F.broadcast(probe), "centroid_id")
        .join(F.broadcast(qs), "qid")
        .select(
            "qid",
            "vec_id",
            F.round(
                V.cosine(F.col("v"), F.col("qv")), round_digits
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", "cosine")
    )


# -- sign LSH --------------------------------------------------------------


def _hyperplane(p: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane p: component d is mapped
    from md5("p:d") hex into [-1, 1). Reproducible everywhere.

    r15 (guide §4.2 + the r12 CollapseProject lesson): emitted as a
    LITERAL array, not a transform() HOF over the md5 expression — a
    lambda-bearing HOF is never constant-folded, so every dot(v, hp)
    consumer was re-evaluating dim md5s PER ROW (32 planes × 64
    components × n rows in the near-dup LSH plan). The Python md5
    below computes the bit-identical values once on the driver:
    int(md5hex[:8], 16) is exact in double, /2^31 is a power-of-two
    division (exact), and the -1.0 bracketing matches the old
    expression, so every bucket id is unchanged."""
    import hashlib

    vals = [
        int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16)
        / float(2**31)
        - 1.0
        for d in range(dim)
    ]
    return F.array(*[F.lit(v) for v in vals])


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
    planes: int = 8,
    flip: int = 6,
    dim: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """ANN top-k via query-directed multi-probe sign-LSH (Lv et al.,
    "Multi-Probe LSH", VLDB'07): besides the query's own bucket, probe
    every bucket reachable by flipping any subset of the ``flip``
    lowest-|margin| sign bits — the planes the query is least certain
    about, hence where a true neighbor most likely landed on the other
    side. Candidates = corpus rows in any of the 2^flip probe buckets;
    rerank is exact. (vec_id, cosine).

    Scale shape: one narrow corpus pass for buckets, a broadcast join
    against the 2^flip-row probe relation (never a corpus shuffle),
    exact cosine on ~2^flip/2^planes of the corpus, TakeOrdered top-k.
    Recall vs brute_topk is measured in tests and PLANS.md.

    Regime caveat: sign-LSH recall is a function of the neighbors'
    cosine — near-dup-grade neighbors (cosine ≳ 0.8, ≲1 expected sign
    disagreement across 8 planes) are recovered with high probability,
    while weak neighbors (cosine ≈ 0.35, ≈3 expected disagreements)
    land outside any fixed probe set most of the time. For generic
    top-k over weakly-similar corpora use ``ivf_topk`` — IVF prunes by
    partition geometry, not by similarity threshold.
    """
    buckets = sign_lsh_buckets(emb, planes, dim)
    vs = _vecs(emb).join(buckets, "vec_id")

    # One-row query relation with per-plane signed margins.
    margins = F.array(
        *[V.dot(F.col("v"), _hyperplane(p, dim)) for p in range(planes)]
    )
    q = (
        _vecs(emb)
        .orderBy("vec_id")
        .limit(1)
        .select(F.col("v").alias("qv"), margins.alias("m"))
    )
    base = F.aggregate(
        F.sequence(F.lit(0), F.lit(planes - 1)),
        F.lit(0).cast("bigint"),
        lambda acc, p: acc
        + F.when(
            F.element_at(F.col("m"), p + 1) >= 0,
            F.pow(F.lit(2.0), p).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint")),
    )
    # Plane indices sorted by |margin| ascending; keep the flip least
    # confident ones. (array_sort comparator instead of a struct sort:
    # struct field aliases do not survive inside HOF lambdas.)
    def _abs_m(p):
        return F.abs(F.element_at(F.col("m"), p.cast("int") + 1))

    flip_idx = F.slice(
        F.array_sort(
            F.sequence(F.lit(0), F.lit(planes - 1)),
            lambda a, b: F.when(_abs_m(a) < _abs_m(b), F.lit(-1))
            .when(_abs_m(a) > _abs_m(b), F.lit(1))
            .otherwise((a - b).cast("int")),
        ),
        1,
        flip,
    )
    # 2^flip probe buckets: base XOR each subset of the flip bits.
    probes = (
        q.select(
            "qv",
            base.alias("base"),
            flip_idx.alias("fi"),
            F.explode(
                F.sequence(F.lit(0), F.lit(2**flip - 1))
            ).alias("mask"),
        )
        .select(
            "qv",
            F.col("base")
            .bitwiseXOR(
                F.aggregate(
                    F.sequence(F.lit(0), F.lit(flip - 1)),
                    F.lit(0).cast("bigint"),
                    lambda acc, j: acc
                    + F.when(
                        F.col("mask").bitwiseAND(
                            F.pow(F.lit(2.0), j).cast("bigint")
                        )
                        != 0,
                        F.pow(
                            F.lit(2.0), F.element_at(F.col("fi"), j + 1)
                        ).cast("bigint"),
                    ).otherwise(F.lit(0).cast("bigint")),
                )
            )
            .alias("bucket"),
        )
    )
    scored = vs.join(F.broadcast(probes), "bucket").select(
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


# -- IVF-lite --------------------------------------------------------------


def ivf_centroids(emb: DataFrame, nlist: int = 8) -> DataFrame:
    """Coarse quantizer: the ``nlist`` smallest-vec_id vectors as seed
    centroids → (centroid_id 0.., cv). Deterministic stand-in for a
    KMeans fit (spark.ml KMeans(seed=…) slots in here unchanged).

    The corpus-wide reduction is ``orderBy().limit(nlist)``
    (TakeOrderedAndProject); centroid ids come from packing the
    ≤nlist seed rows into one sorted array and posexploding — no
    Window operator anywhere in the IVF plan."""
    seeds = _vecs(emb).orderBy("vec_id").limit(nlist)
    packed = seeds.agg(
        F.array_sort(F.collect_list(F.struct("vec_id", "v"))).alias("a")
    )
    return packed.select(
        F.posexplode("a").alias("centroid_id", "s")
    ).select("centroid_id", F.col("s.v").alias("cv"))


def _centroid_array(centroids: DataFrame) -> DataFrame:
    """Fold the tiny centroid relation into ONE row holding an
    id-sorted array of (centroid_id, cn, cv) structs, with each
    centroid's norm precomputed — so the per-vector argmax lambda never
    re-evaluates a norm per element (HOF lambdas are interpreted and
    re-run embedded expression trees per array element)."""
    return centroids.select(
        F.struct(
            F.col("centroid_id"),
            V.norm(F.col("cv")).alias("cn"),
            F.col("cv"),
        ).alias("s")
    ).agg(F.array_sort(F.collect_list("s")).alias("cents"))


def _nearest_centroid(v: Column, cents: Column) -> Column:
    """Narrow argmax over the broadcast centroid array: the
    centroid_id maximizing cosine(v, cv), computed as dot(v,cv)/cn —
    dividing by norm(v) is a constant positive per-row factor, so the
    argmax (ties included) is unchanged and the corpus norm is never
    evaluated. Ties break to the lowest centroid_id: the array is
    id-sorted and the fold keeps the incumbent on equality."""
    scored = F.transform(
        cents,
        lambda s: F.struct(
            (V.dot(v, s["cv"]) / s["cn"]).alias("score"),
            s["centroid_id"].alias("centroid_id"),
        ),
    )
    return F.aggregate(
        scored,
        F.struct(
            F.lit(float("-inf")).alias("score"),
            F.lit(-1).alias("centroid_id"),
        ),
        lambda acc, e: F.when(e["score"] > acc["score"], e).otherwise(acc),
    )["centroid_id"]


def ivf_centroids_kmeans(
    emb: DataFrame, nlist: int = 8, seed: int = 42, max_iter: int = 10
) -> DataFrame:
    """Trained coarse quantizer: ``spark.ml`` KMeans centers →
    (centroid_id, cv), drop-in for :func:`ivf_centroids` (which
    documents this swap). The model's centers are nlist×dim doubles —
    tiny by construction — so materializing them through the driver
    into a broadcast-able relation is not a distributed reduction."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = _vecs(emb).select(array_to_vector("v").alias("features"))
    model = KMeans(k=nlist, seed=seed, maxIter=max_iter).fit(feats)
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return emb.sparkSession.createDataFrame(
        rows, "centroid_id int, cv array<double>"
    )


def ivf_assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine:
    (vec_id, centroid_id). The centroid array is a broadcast 1-row
    relation and the argmax is a per-row array fold, so assignment is
    a fully narrow map over the corpus — no Exchange at all (the
    write-time clustering key at scale must not cost a shuffle)."""
    return (
        _vecs(emb)
        .crossJoin(F.broadcast(_centroid_array(centroids)))
        .select(
            "vec_id",
            _nearest_centroid(F.col("v"), F.col("cents")).alias(
                "centroid_id"
            ),
        )
    )


def ivf_topk(
    emb: DataFrame,
    k: int = 10,
    nlist: int = 8,
    nprobe: int = 2,
    round_digits: int = 6,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN top-k vs the deterministic query vector: probe the
    ``nprobe`` nearest inverted lists, exact rerank within them.
    (vec_id, cosine). ``centroids`` swaps in a trained quantizer
    (:func:`ivf_centroids_kmeans`); default is the deterministic
    seed-sample one."""
    cents = centroids if centroids is not None else ivf_centroids(emb, nlist)
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
    # Assignment is computed inline on the corpus scan (no self-join
    # back onto the vectors): one narrow pass tags each row with its
    # inverted list, then a broadcast semi-join prunes to the probed
    # lists — the only corpus-wide reduction left is the final
    # TakeOrderedAndProject.
    assigned = (
        _vecs(emb)
        .crossJoin(F.broadcast(_centroid_array(cents)))
        .withColumn(
            "centroid_id",
            _nearest_centroid(F.col("v"), F.col("cents")),
        )
        .drop("cents")
    )
    shortlist = assigned.join(
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


def pq_adc_topk(
    emb: DataFrame,
    k: int = 10,
    n_candidates: int = 400,
    m: int = 8,
    ksub: int = 16,
    round_digits: int = 6,
) -> DataFrame:
    """PQ/ADC approximate top-k (the IVFADC search half, Jégou et al.
    TPAMI'11): the query precomputes an m×ksub lookup table of
    subspace L2² distances to every codebook centroid; each corpus
    vector's approximate distance is then m ARRAY LOOKUPS summed (its
    stored PQ codes index the LUT) — no per-row vector arithmetic at
    all. The ADC top-``n_candidates`` are reranked with exact cosine.
    (vec_id, cosine).

    Scale shape: codes (m small ints/vector) are the only per-row
    state the scan touches — at 100 TB the raw vectors are cold
    storage and the code table is ~30× smaller; the LUT row
    broadcasts; both cuts are TakeOrderedAndProject. The ADC fold and
    the LUT build use the same left-fold bracketing as the DuckDB
    oracle, so the candidate set (and hence the result) is
    engine-identical.

    Defaults (shortlist 400, 16-entry sub-codebooks) are sized from
    the measured recall/cost curve at sf0.1 (PLANS.md): 50/16 gave
    recall@10 = 0.50, 400/16 → 0.90; 400/64 reaches 1.00 but
    quadruples ENCODE cost (argmin over 4× the centroids per
    subspace), which this operator pays inline per run — larger
    codebooks belong on the materialized index path
    (build_ivfpq_index), where encode is a one-time write-side cost.
    Both knobs stay O(1) per corpus row — the LUT is m×ksub doubles
    broadcast once, and the rerank touches n_candidates raw vectors.
    """
    from .embeddings import pq_codebook, pq_encode

    sub_dim = 64 // m
    cb = pq_codebook(emb, m, ksub)
    codes = pq_encode(emb, m, ksub)
    q = (
        _vecs(emb)
        .orderBy("vec_id")
        .limit(1)
        .select(F.col("v").alias("qv"))
    )

    def d2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda s, x: s + x,
        )

    def lut_for(s):
        subq = F.slice(F.col("qv"), s * sub_dim + 1, sub_dim)

        def one(cv):
            return d2(subq, cv)

        return F.transform(F.element_at(F.col("cb"), s + 1), one)

    lut = q.crossJoin(F.broadcast(cb)).select(
        "qv", F.array(*[lut_for(s) for s in range(m)]).alias("luts")
    )
    adc = F.element_at(F.element_at(F.col("luts"), 1), F.col("c0") + 1)
    for s in range(1, m):
        adc = adc + F.element_at(
            F.element_at(F.col("luts"), s + 1), F.col(f"c{s}") + 1
        )
    cand = (
        codes.crossJoin(F.broadcast(lut))
        .select("vec_id", adc.alias("_adc"), "qv")
        .orderBy("_adc", "vec_id")
        .limit(n_candidates)
    )
    return (
        cand.join(_vecs(emb), "vec_id")
        .select(
            "vec_id",
            F.round(V.cosine(F.col("v"), F.col("qv")), round_digits).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def build_ivfpq_index(
    spark,
    emb: DataFrame,
    out_dir: str,
    m: int = 8,
    ksub: int = 16,
    nlist: int = 8,
) -> None:
    """Materialize the on-disk IVF-PQ index: every vector's PQ codes
    co-located with its inverted list via ``partitionBy(centroid_id)``
    — write-time clustering, so a probe reads ONLY its lists'
    partitions (directory pruning, no data skipped row-by-row). The
    build is one narrow pass (broadcast centroids + broadcast
    codebook); a fingerprint marker skips rebuilds of an unchanged
    corpus. At 100 TB this layout IS the difference between a probe
    touching nprobe/nlist of the data and touching all of it.
    """
    import os

    from .embeddings import pq_encode

    fp = emb.agg(F.count("*"), F.sum("vec_id")).collect()[0]
    fingerprint = f"{fp[0]}:{fp[1]}:{m}:{ksub}:{nlist}"
    marker = os.path.join(out_dir, "_FINGERPRINT")
    if os.path.exists(marker) and open(marker).read() == fingerprint:
        return
    cents = ivf_centroids(emb, nlist)
    assigned = (
        _vecs(emb)
        .crossJoin(F.broadcast(_centroid_array(cents)))
        .select(
            "vec_id",
            _nearest_centroid(F.col("v"), F.col("cents")).alias(
                "centroid_id"
            ),
        )
    )
    index = pq_encode(emb, m, ksub).join(assigned, "vec_id")
    index.write.mode("overwrite").partitionBy("centroid_id").parquet(
        out_dir
    )
    with open(marker, "w") as f:
        f.write(fingerprint)


def ivfpq_index_search(
    spark,
    emb: DataFrame,
    out_dir: str,
    k: int = 10,
    n_candidates: int = 50,
    m: int = 8,
    ksub: int = 16,
    nlist: int = 8,
    nprobe: int = 2,
    round_digits: int = 6,
) -> DataFrame:
    """Full IVF-PQ search against the MATERIALIZED index: pick the
    query's ``nprobe`` nearest inverted lists, scan only those
    partitions of the code table (partition pruning on the
    ``centroid_id`` directory key), rank candidates by ADC lookups
    over the stored codes, exact-rerank the top ``n_candidates``.
    (vec_id, cosine).

    This is the end-to-end 100 TB vector-search architecture the
    in-memory operators (`sim_ann_ivf`, `sim_ann_pq_adc`) each
    demonstrate half of: raw vectors cold, compressed codes clustered
    on disk by list, probes touching nprobe/nlist of the index.
    """
    build_ivfpq_index(spark, emb, out_dir, m, ksub, nlist)
    sub_dim = 64 // m
    cents = ivf_centroids(emb, nlist)
    q = query_vector(emb)
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "centroid_id", V.cosine(F.col("cv"), F.col("qv")).alias("cs")
        )
        .orderBy(F.desc("cs"), F.asc("centroid_id"))
        .limit(nprobe)
        .select("centroid_id")
    )
    from .embeddings import pq_codebook

    cb = pq_codebook(emb, m, ksub)

    def d2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda s, x: s + x,
        )

    def lut_for(s):
        subq = F.slice(F.col("qv"), s * sub_dim + 1, sub_dim)

        def one(cv):
            return d2(subq, cv)

        return F.transform(F.element_at(F.col("cb"), s + 1), one)

    lut = q.crossJoin(F.broadcast(cb)).select(
        "qv", F.array(*[lut_for(s) for s in range(m)]).alias("luts")
    )
    idx = spark.read.parquet(out_dir).join(
        F.broadcast(probe), "centroid_id", "left_semi"
    )
    adc = F.element_at(F.element_at(F.col("luts"), 1), F.col("c0") + 1)
    for s in range(1, m):
        adc = adc + F.element_at(
            F.element_at(F.col("luts"), s + 1), F.col(f"c{s}") + 1
        )
    cand = (
        idx.crossJoin(F.broadcast(lut))
        .select("vec_id", adc.alias("_adc"), "qv")
        .orderBy("_adc", "vec_id")
        .limit(n_candidates)
    )
    return (
        cand.join(_vecs(emb), "vec_id")
        .select(
            "vec_id",
            F.round(V.cosine(F.col("v"), F.col("qv")), round_digits).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def knn_classify(
    emb: DataFrame, k: int = 5, nq: int = 16, round_digits: int = 6
) -> DataFrame:
    """Semi-supervised kNN label propagation: the ``nq`` smallest-
    vec_id vectors play an unlabeled probe batch; each is classified
    by majority vote of its ``k`` exact-cosine nearest neighbors in
    the remaining labeled corpus → (qid, true_label, pred_label,
    votes). The curation use: propagate human quality/topic labels
    from a seed set to the whole corpus.

    Ties: neighbor cut tiebreaks on vec_id (after 6-digit cosine
    rounding, mirrored by the oracle), vote tiebreaks on the smaller
    label — fully deterministic, so the op is hash-checked end to
    end. Scale shape: same ONE-corpus-pass contract as ``batch_topk``
    (probes ride in as a broadcast struct array; per-probe top-k is a
    rank-limited window → WindowGroupLimit per-partition heaps before
    the qid exchange); the vote aggregate then touches ≤ k·nq rows.
    At corpus-scale probe sets, swap the brute scorer for the IVF
    path (ivf_batch_topk) — the vote stage is unchanged.
    """
    vs = emb.select(
        "vec_id", V.as_double(F.col("embedding")).alias("v"), "label"
    )
    qarr = (
        vs.orderBy("vec_id")
        .limit(nq)
        .select(
            F.struct(
                F.col("vec_id").alias("qid"),
                F.col("label").alias("qlabel"),
                V.norm(F.col("v")).alias("qn"),
                F.col("v").alias("qv"),
            ).alias("s")
        )
        .agg(F.array_sort(F.collect_list("s")).alias("qs"))
    )
    scored = (
        vs.crossJoin(F.broadcast(qarr))
        .filter(
            ~F.array_contains(
                F.transform("qs", lambda s: s["qid"]), F.col("vec_id")
            )
        )
        .select(
            "vec_id",
            "label",
            V.norm(F.col("v")).alias("vn"),
            "v",
            F.explode("qs").alias("q"),
        )
        .select(
            F.col("q.qid").alias("qid"),
            F.col("q.qlabel").alias("qlabel"),
            "vec_id",
            "label",
            F.round(
                V.dot(F.col("v"), F.col("q.qv"))
                / (F.col("vn") * F.col("q.qn")),
                round_digits,
            ).alias("cosine"),
        )
    )
    w_nn = Window.partitionBy("qid").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    nn = scored.withColumn("rn", F.row_number().over(w_nn)).filter(
        F.col("rn") <= k
    )
    votes = nn.groupBy("qid", "qlabel", "label").agg(
        F.count("*").alias("votes")
    )
    w_v = Window.partitionBy("qid").orderBy(F.desc("votes"), F.asc("label"))
    return (
        votes.withColumn("r", F.row_number().over(w_v))
        .filter(F.col("r") == 1)
        .select(
            "qid",
            F.col("qlabel").alias("true_label"),
            F.col("label").alias("pred_label"),
            "votes",
        )
    )


def hard_negative_mining(
    emb: DataFrame, nq: int = 16, round_digits: int = 6
) -> DataFrame:
    """Contrastive-training hard-negative mining: for each of the
    ``nq`` smallest-vec_id probe vectors, the single most cosine-
    similar corpus vector carrying a DIFFERENT label → (qid, qlabel,
    neg_id, neg_label, cosine). The training-data use: the hardest
    negative per anchor is the pair a contrastive loss learns most
    from; mining it is one retrieval pass, not a separate system.

    Scale shape: identical ONE-corpus-pass contract as ``batch_topk``
    — probes ride in as a broadcast struct array (label included),
    each corpus row explodes to ≤ nq scored candidates AFTER the
    cheap label-inequality filter — but the top-1 cut is a plain
    ``max_by`` AGGREGATE, not a window: partial aggregation combines
    map-side, so the qid exchange carries exactly one candidate per
    (partition, probe), strictly less than even a WindowGroupLimit
    heap ships. Ties break on vec_id after 6-digit rounding (max over
    the (cosine, -neg_id) struct ≡ the oracle's ORDER BY cosine DESC,
    vec_id), so the op is hash-checked. At corpus-scale probe sets,
    swap the brute scorer for the IVF path and keep the label filter —
    the mining logic is unchanged.
    """
    vs = emb.select(
        "vec_id", V.as_double(F.col("embedding")).alias("v"), "label"
    )
    qarr = (
        vs.orderBy("vec_id")
        .limit(nq)
        .select(
            F.struct(
                F.col("vec_id").alias("qid"),
                F.col("label").alias("qlabel"),
                V.norm(F.col("v")).alias("qn"),
                F.col("v").alias("qv"),
            ).alias("s")
        )
        .agg(F.array_sort(F.collect_list("s")).alias("qs"))
    )
    scored = (
        vs.crossJoin(F.broadcast(qarr))
        .select(
            "vec_id",
            "label",
            V.norm(F.col("v")).alias("vn"),
            "v",
            F.explode("qs").alias("q"),
        )
        .filter(F.col("label") != F.col("q.qlabel"))
        .select(
            F.col("q.qid").alias("qid"),
            F.col("q.qlabel").alias("qlabel"),
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            F.round(
                V.dot(F.col("v"), F.col("q.qv"))
                / (F.col("vn") * F.col("q.qn")),
                round_digits,
            ).alias("cosine"),
        )
    )
    key = F.struct(F.col("cosine"), (-F.col("neg_id")).alias("tie"))
    return (
        scored.groupBy("qid", "qlabel")
        .agg(
            F.max_by("neg_id", key).alias("neg_id"),
            F.max_by("neg_label", key).alias("neg_label"),
            F.max("cosine").alias("cosine"),
        )
        .select("qid", "qlabel", "neg_id", "neg_label", "cosine")
    )


def matryoshka_agreement(
    emb: DataFrame,
    trunc_dim: int = 16,
    nq: int = 16,
    round_digits: int = 6,
) -> DataFrame:
    """Matryoshka/truncation QA: does nearest-neighbor retrieval
    survive keeping only the FIRST ``trunc_dim`` of 64 dimensions?
    For each of the ``nq`` smallest-vec_id probes, the top-1 cosine
    neighbor (self excluded) under the full vector AND under the
    prefix slice → (qid, nn_full, cos_full, nn_trunc, cos_trunc,
    agree). The aggregate agree-rate is the go/no-go for shipping
    truncated embeddings (4× index shrink) — per-probe rows keep the
    disagreements debuggable.

    Scale shape: ONE corpus pass computes BOTH similarities (the
    prefix slice and its norm are per-row expressions on data already
    in hand — no second scan), and BOTH top-1 cuts ride in one
    ``max_by`` aggregate over the same grouping: partial aggregation
    combines map-side, the qid exchange carries one candidate pair
    per (partition, probe), and no join or window appears anywhere.
    Ties break on vec_id after rounding (max over (cos, -vec_id)
    structs ≡ the oracle's ORDER BY cos DESC, vec_id).
    """
    vs = emb.select(
        "vec_id", V.as_double(F.col("embedding")).alias("v")
    ).withColumn("vt", F.slice(F.col("v"), 1, trunc_dim))
    qarr = (
        vs.orderBy("vec_id")
        .limit(nq)
        .select(
            F.struct(
                F.col("vec_id").alias("qid"),
                V.norm(F.col("v")).alias("qn"),
                F.col("v").alias("qv"),
                V.norm(F.col("vt")).alias("qtn"),
                F.col("vt").alias("qtv"),
            ).alias("s")
        )
        .agg(F.array_sort(F.collect_list("s")).alias("qs"))
    )
    scored = (
        vs.crossJoin(F.broadcast(qarr))
        .select(
            "vec_id",
            V.norm(F.col("v")).alias("vn"),
            V.norm(F.col("vt")).alias("vtn"),
            "v",
            "vt",
            F.explode("qs").alias("q"),
        )
        .filter(F.col("vec_id") != F.col("q.qid"))
        .select(
            F.col("q.qid").alias("qid"),
            "vec_id",
            F.round(
                V.dot(F.col("v"), F.col("q.qv"))
                / (F.col("vn") * F.col("q.qn")),
                round_digits,
            ).alias("cos_full"),
            F.round(
                V.dot(F.col("vt"), F.col("q.qtv"))
                / (F.col("vtn") * F.col("q.qtn")),
                round_digits,
            ).alias("cos_trunc"),
        )
    )
    kf = F.struct(F.col("cos_full"), (-F.col("vec_id")).alias("tie"))
    kt = F.struct(F.col("cos_trunc"), (-F.col("vec_id")).alias("tie"))
    return (
        scored.groupBy("qid")
        .agg(
            F.max_by("vec_id", kf).alias("nn_full"),
            F.max("cos_full").alias("cos_full"),
            F.max_by("vec_id", kt).alias("nn_trunc"),
            F.max("cos_trunc").alias("cos_trunc"),
        )
        .select(
            "qid",
            "nn_full",
            "cos_full",
            "nn_trunc",
            "cos_trunc",
            (F.col("nn_full") == F.col("nn_trunc")).alias("agree"),
        )
    )


def int8_codes(emb: DataFrame) -> DataFrame:
    """Fixed-point int8 codes for exact-integer retrieval: unit-normalize
    (double, ordered accumulation), then ``q_i = floor(x_i·127 + 0.5)``
    as BIGINT — a GLOBAL scale (1/127), unlike the per-vector max-abs
    scale of embeddings.int8_quantize, so dot products of two codes are
    directly comparable integers with no per-pair rescaling.

    Scale shape: one narrow map — at 100 TB this is the write-time
    compression pass (4 bytes → 1 byte per component) and every
    downstream integer dot is exact, so partial-agg order can never
    perturb a ranking."""
    # Materialize the norm as a column BEFORE the per-element transform:
    # a HOF lambda that closes over V.norm(v) would re-evaluate the full
    # O(d) reduction per element (the word_shingles trap — O(d^2)/row).
    # Zero-norm guard: an all-zero embedding would otherwise divide by
    # zero (NaN -> null codes that still consume top-k window slots
    # downstream); it quantizes to the all-zero code instead, which
    # scores 0 against every query — the correct "no direction" rank.
    vs = _vecs(emb).select("vec_id", "v", V.norm(F.col("v")).alias("nrm"))
    return vs.select(
        "vec_id",
        F.transform(
            "v",
            lambda x: F.when(F.col("nrm") == 0, F.lit(0))
            .otherwise(
                F.floor(x / F.col("nrm") * F.lit(127.0) + F.lit(0.5))
            )
            .cast("long"),
        ).alias("q"),
    )


def int8_batch_topk(emb: DataFrame, k: int = 10, nq: int = 4) -> DataFrame:
    """Quantized batch retrieval: exact INT top-k — each of the ``nq``
    smallest-vec_id query codes ranks the corpus by the int64 dot
    product of int8 codes (descending, vec_id tiebreak) →
    (qid, vec_id, qdot).

    All-integer scores make the ranking bit-stable across engines,
    partitionings, and accumulation orders — the property float cosine
    only gets after careful rounding. Same one-pass shape as
    batch_topk: broadcast query array, explode to nq scored rows,
    rank-limited window (WindowGroupLimit per-partition heaps), the
    qid exchange carries ≤ k·nq rows per partition."""
    codes = int8_codes(emb)
    qarr = (
        codes.orderBy("vec_id")
        .limit(nq)
        .select(
            F.struct(
                F.col("vec_id").alias("qid"), F.col("q").alias("qq")
            ).alias("s")
        )
        .agg(F.array_sort(F.collect_list("s")).alias("qs"))
    )
    scored = (
        codes.crossJoin(F.broadcast(qarr))
        .select("vec_id", "q", F.explode("qs").alias("qrec"))
        .select(
            F.col("qrec.qid").alias("qid"),
            "vec_id",
            F.aggregate(
                F.zip_with("q", "qrec.qq", lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("qdot"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("qdot"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", "vec_id", "qdot")
    )


def int8_recall_vs_float(
    emb: DataFrame, k: int = 10, nq: int = 4, round_digits: int = 6
) -> DataFrame:
    """Compression QA for the int8 retrieval path: per query,
    |int8 top-k ∩ float top-k| and recall@k → (qid, n_common, recall).

    Both sides are exact deterministic rankings (integer dots vs
    rounded cosine with vec_id tiebreaks), so the overlap is a
    hash-checkable scalar — the measured answer to "what does 4×
    compression cost at retrieval time", computed corpus-side with two
    rank-limited passes and a k·nq-row join, never a collect."""
    i8 = int8_batch_topk(emb, k=k, nq=nq).select("qid", "vec_id")
    fl = batch_topk(emb, k=k, nq=nq, round_digits=round_digits).select(
        "qid", "vec_id"
    )
    hits = i8.join(fl, ["qid", "vec_id"]).groupBy("qid").agg(
        F.count("*").alias("n_common")
    )
    return (
        i8.select("qid")
        .distinct()
        .join(hits, "qid", "left")
        .select(
            "qid",
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            (
                F.coalesce("n_common", F.lit(0)).cast("double")
                / F.lit(float(k))
            ).alias("recall"),
        )
    )


def mmr_rerank(
    emb: DataFrame,
    n_cand: int = 20,
    k: int = 10,
    lam: float = 0.7,
    one_minus_lam: float = 0.3,
    round_digits: int = 6,
) -> DataFrame:
    """Maximal Marginal Relevance rerank of the exact top-``n_cand``
    retrieval: greedily pick ``k`` results maximizing
    ``lam*rel(d) - (1-lam)*max_{s in S} sim(d, s)`` →
    (mmr_rank, vec_id, relevance, mmr_score_micro) — the diversity-
    aware second stage (Carbonell & Goldstein '98) every retrieval
    stack runs after the similarity cut.

    Execution: candidate scoring and the candidate-pair similarity
    matrix are distributed (one corpus scan → TakeOrderedAndProject
    top-``n_cand``; the pair matrix is a constant n_cand^2/2-row
    self-join of the checkpointed candidate relation). The greedy
    selection itself runs driver-side over those <=n_cand^2/2
    collected rows — a BOUNDED driver artifact (constant in corpus
    size), mirroring the oracle's unrolled float ops term for term
    (0.7*rel - 0.3*maxsim over round-6-snapped doubles, then
    micro-floor), so the result hashes bit-identically.
    """
    import math

    vs = _vecs(emb)
    q = query_vector(emb)
    cand = (
        vs.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "v",
            F.round(
                V.cosine(F.col("v"), F.col("qv")), round_digits
            ).alias("rel"),
        )
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(n_cand)
        .localCheckpoint(eager=False)
    )
    a = cand.select(
        F.col("vec_id").alias("ia"), F.col("v").alias("va")
    )
    b = cand.select(
        F.col("vec_id").alias("ib"), F.col("v").alias("vb")
    )
    sims = (
        a.join(b, F.col("ia") < F.col("ib"))
        .select(
            "ia",
            "ib",
            F.round(
                V.cosine(F.col("va"), F.col("vb")), round_digits
            ).alias("s"),
        )
        .collect()
    )
    rel_rows = cand.select("vec_id", "rel").collect()

    rel = {r.vec_id: r.rel for r in rel_rows}
    sim: dict[tuple[int, int], float] = {}
    for r in sims:
        sim[(r.ia, r.ib)] = r.s
        sim[(r.ib, r.ia)] = r.s
    maxsim = {vid: 0.0 for vid in rel}
    out = []
    selected: list[int] = []
    for rank in range(1, k + 1):
        best = None
        for vid in sorted(rel):
            if vid in selected:
                continue
            score = lam * rel[vid] - one_minus_lam * maxsim[vid]
            key = (-score, vid)
            if best is None or key < best[0]:
                best = (key, vid, score)
        if best is None:
            # corpus yielded fewer than k candidates: return the
            # short ranking instead of unpacking None
            # (r12-advisory fix)
            break
        _, pick, score = best
        selected.append(pick)
        out.append(
            (
                rank,
                pick,
                rel[pick],
                int(math.floor(score * 1000000.0)),
            )
        )
        for vid in rel:
            if vid in selected:
                continue
            s = sim.get((pick, vid), 0.0)
            if s > maxsim[vid]:
                maxsim[vid] = s
    spark = emb.sparkSession
    return spark.createDataFrame(
        out,
        "mmr_rank bigint, vec_id bigint, relevance double, "
        "mmr_score_micro bigint",
    )


def knn_block_topk(emb: DataFrame, k: int = 5) -> DataFrame:
    """Exact k-nearest-neighbor candidates by blocked all-pairs:
    (qid, nid, cosine) — for every vector, a SUPERSET cover of its
    global top-k built from per-block-pair local top-k cuts, to be
    reduced by one (qid)-keyed WindowGroupLimit.

    Same execution scheme as ``dedup.embedding_near_dup`` (hash
    blocks, broadcast B(B+1)/2 block-pair relation, ``applyInPandas``
    int64-quantized matmul per pair — every task holds <= 2/B of the
    corpus), but instead of thresholding, each task emits each side's
    LOCAL top-k against the other side (self-matches excluded). A
    vector's global top-k is contained in the union of its B local
    top-k lists, so the shuffled candidate relation is k*B rows per
    vector — LINEAR in corpus size; the O(n^2) matmul work stays
    inside the kernels and never materializes as rows. Cosine is the
    quantized-int64 half-up-rounded value of the near-dup family, so
    the same oracle formulation applies.
    """
    from .dedup import quantize_np

    n_blocks = 4
    src = emb.select(
        "vec_id", V.as_double(F.col("embedding")).alias("v")
    )
    spark = emb.sparkSession
    bp = spark.createDataFrame(
        [
            (bi, bj)
            for bi in range(n_blocks)
            for bj in range(bi, n_blocks)
        ],
        "bi int, bj int",
    )
    blocked = src.withColumn(
        "blk", F.pmod(F.col("vec_id"), F.lit(n_blocks)).cast("int")
    )
    rep = blocked.join(
        F.broadcast(bp),
        (F.col("blk") == F.col("bi")) | (F.col("blk") == F.col("bj")),
    )
    out_schema = "qid bigint, nid bigint, cosine double"
    scale = 1000000.0

    def local_topk(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "qid": pd.Series(dtype="int64"),
                "nid": pd.Series(dtype="int64"),
                "cosine": pd.Series(dtype="float64"),
            }
        )
        if pdf.empty:
            return empty
        bi, bj = int(pdf["bi"].iloc[0]), int(pdf["bj"].iloc[0])
        a_pdf = pdf[pdf["blk"] == bi]
        b_pdf = a_pdf if bi == bj else pdf[pdf["blk"] == bj]
        if a_pdf.empty or b_pdf.empty:
            return empty
        a_ids = a_pdf["vec_id"].to_numpy(dtype=np.int64)
        b_ids = b_pdf["vec_id"].to_numpy(dtype=np.int64)
        A = quantize_np(list(a_pdf["v"]))
        B = A if bi == bj else quantize_np(list(b_pdf["v"]))
        an = np.sqrt((A * A).sum(axis=1).astype(np.float64))
        bn = np.sqrt((B * B).sum(axis=1).astype(np.float64))
        cos = (A @ B.T).astype(np.float64) / np.outer(an, bn)
        cos = np.floor(cos * scale + 0.5) / scale

        def side(q_ids, n_ids, mat):
            # per row: top-k by (cosine desc, neighbor id asc),
            # excluding self-matches — fully vectorized via a
            # composite int64 key: cosine is quantized to 1e-6 so
            # round(cos*1e6) is integer in [-1e6, 1e6]; key =
            # c_int * 2^33 - nid orders exactly by (cos desc, nid
            # asc) and argpartition/argsort over it is tie-correct.
            kk = min(k, mat.shape[1])
            c_int = np.rint(mat * 1000000.0).astype(np.int64)
            # the composite key is tie-correct only while ids fit
            # under the 2^33 shift — fail loudly rather than silently
            # corrupt top-k order beyond ~8.6e9 ids (r12-advisory fix;
            # ValueError not assert, so the guard survives python -O)
            if n_ids.max(initial=0) >= (1 << 33):
                raise ValueError(
                    "vec_id >= 2^33 overflows the composite sort key; "
                    "widen the shift in knn_block_topk"
                )
            key = c_int * (1 << 33) - n_ids[None, :]
            # self-matches sink below everything
            key[q_ids[:, None] == n_ids[None, :]] = np.int64(-(1 << 62))
            take = min(kk, key.shape[1])
            part = np.argpartition(-key, take - 1, axis=1)[:, :take]
            pkeys = np.take_along_axis(key, part, axis=1)
            order = np.argsort(-pkeys, axis=1, kind="stable")
            top = np.take_along_axis(part, order, axis=1)
            tkeys = np.take_along_axis(key, top, axis=1)
            valid = tkeys > np.int64(-(1 << 62))
            rows = np.repeat(q_ids, take).reshape(-1)[valid.ravel()]
            cols = top.ravel()[valid.ravel()]
            return pd.DataFrame(
                {
                    "qid": rows,
                    "nid": n_ids[cols],
                    "cosine": mat[
                        np.repeat(
                            np.arange(mat.shape[0]), take
                        )[valid.ravel()],
                        cols,
                    ],
                }
            )

        parts = [side(a_ids, b_ids, cos)]
        if bi != bj:
            parts.append(side(b_ids, a_ids, cos.T))
        return pd.concat(parts, ignore_index=True)

    return rep.groupBy("bi", "bj").applyInPandas(
        local_topk, out_schema
    )


def ivf_knn_topk(
    emb: DataFrame, k: int = 5, nlist: int = 8, nprobe: int = 2
) -> DataFrame:
    """Approximate all-vectors k-NN candidates via IVF probing:
    (qid, nid, cosine) — each vector's local top-k against every
    inverted list it probes; the global approximate top-k is one
    (qid)-keyed WindowGroupLimit away. The ANN twin of
    :func:`knn_block_topk` (verdict r12 item 6): same int64-quantized
    cosine, same composite-key tie-break, but candidate generation is
    IVF-bounded instead of exhaustive.

    Scale shape: assignment and probe selection are NARROW per-row
    array folds over the broadcast centroid array (no exchange); the
    kernel relation shuffles each vector nprobe+1 times (its probe
    rows + its membership row) keyed on centroid_id, so per-task
    memory is one inverted list + its probers — at production scale
    nlist grows ~sqrt(n) to keep lists bounded, the standard IVF
    sizing. The quadratic scoring work stays inside the per-list
    matmul kernels and materializes only k rows per (vector, probed
    list)."""
    from .dedup import quantize_np

    src = _vecs(emb)
    cents = ivf_centroids(emb, nlist)
    carr = _centroid_array(cents)
    scored = src.crossJoin(F.broadcast(carr)).select(
        "vec_id",
        "v",
        F.transform(
            F.col("cents"),
            lambda s: F.struct(
                (-(V.dot(F.col("v"), s["cv"]) / s["cn"])).alias(
                    "negscore"
                ),
                s["centroid_id"].alias("centroid_id"),
            ),
        ).alias("scored"),
    )
    # membership = argmin(negscore) = the probe ranking's head, so
    # one sorted array serves both: slice nprobe for probes, element
    # 1 for the home list (struct order compares fields in sequence,
    # ties to the lowest centroid_id — identical to ivf_assign)
    ranked = scored.select(
        "vec_id",
        "v",
        F.slice(F.array_sort("scored"), 1, nprobe).alias("probes"),
    )
    probers = ranked.select(
        "vec_id",
        "v",
        F.explode("probes").alias("p"),
    ).select(
        "vec_id", "v", F.col("p.centroid_id").alias("centroid_id"),
        F.lit(1).alias("is_q"),
    )
    members = ranked.select(
        "vec_id",
        "v",
        F.element_at("probes", 1)["centroid_id"].alias("centroid_id"),
        F.lit(0).alias("is_q"),
    )
    rep = probers.unionByName(members)
    out_schema = "qid bigint, nid bigint, cosine double"
    scale = 1000000.0

    def list_topk(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "qid": pd.Series(dtype="int64"),
                "nid": pd.Series(dtype="int64"),
                "cosine": pd.Series(dtype="float64"),
            }
        )
        q_pdf = pdf[pdf["is_q"] == 1]
        m_pdf = pdf[pdf["is_q"] == 0]
        if q_pdf.empty or m_pdf.empty:
            return empty
        q_ids = q_pdf["vec_id"].to_numpy(dtype=np.int64)
        m_ids = m_pdf["vec_id"].to_numpy(dtype=np.int64)
        Q = quantize_np(list(q_pdf["v"]))
        M = quantize_np(list(m_pdf["v"]))
        qn = np.sqrt((Q * Q).sum(axis=1).astype(np.float64))
        mn = np.sqrt((M * M).sum(axis=1).astype(np.float64))
        cos = (Q @ M.T).astype(np.float64) / np.outer(qn, mn)
        cos = np.floor(cos * scale + 0.5) / scale
        # identical tie-break contract as knn_block_topk (ValueError
        # not assert, so the guard survives python -O)
        if m_ids.max(initial=0) >= (1 << 33):
            raise ValueError(
                "vec_id >= 2^33 overflows the composite sort key; "
                "widen the shift in ivf_knn_topk"
            )
        c_int = np.rint(cos * scale).astype(np.int64)
        key = c_int * (1 << 33) - m_ids[None, :]
        key[q_ids[:, None] == m_ids[None, :]] = np.int64(-(1 << 62))
        take = min(k, key.shape[1])
        part = np.argpartition(-key, take - 1, axis=1)[:, :take]
        pkeys = np.take_along_axis(key, part, axis=1)
        order = np.argsort(-pkeys, axis=1, kind="stable")
        top = np.take_along_axis(part, order, axis=1)
        tkeys = np.take_along_axis(key, top, axis=1)
        valid = tkeys > np.int64(-(1 << 62))
        rows = np.repeat(q_ids, take).reshape(-1)[valid.ravel()]
        cols = top.ravel()[valid.ravel()]
        return pd.DataFrame(
            {
                "qid": rows,
                "nid": m_ids[cols],
                "cosine": cos[
                    np.repeat(np.arange(cos.shape[0]), take)[
                        valid.ravel()
                    ],
                    cols,
                ],
            }
        )

    return rep.groupBy("centroid_id").applyInPandas(
        list_topk, out_schema
    )
