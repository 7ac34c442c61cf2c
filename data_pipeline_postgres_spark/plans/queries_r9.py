"""Round-9 query additions (SURVEY.md §2.12/§2.13 [EXT]): semantic
decontamination, k-core graph peeling, snapshot diff auditing, BPE
merge statistics, bigram-LM scoring, language-ID confusion, and
distributed PCA.

Conventions identical to queries_ext.py: every computed column is
aliased the same in the Spark plan and the DuckDB oracle; float
aggregation goes through int64 quantization (log2 micro-bits, 2^20
vector scale) so cross-partition sums are exact in any order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import text as TX
from ..operators import dedup, embeddings, graph, textstats
from .registry import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders")


# -- Semantic decontamination ----------------------------------------------
# The embedding-space sibling of decontaminate_ngram: a training
# vector is contaminated when it is semantically close (quantized
# cosine >= tau) to ANY eval-split vector. Same deterministic eval
# split idiom (vec_id % 11), same quantized-cosine math as the
# dedup_embedding family, aggregated per TRAINING vector.

_DECON_EMB_TAU = 0.30

_DECON_EMB_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
qv AS (
    SELECT vec_id,
           list_transform(v, x -> CAST(floor(
               x / sqrt(list_reduce(list_transform(v, y -> y*y),
                                    (a,b) -> a+b)) * 1048576.0 + 0.5
           ) AS BIGINT)) AS q
    FROM e
),
n AS (
    SELECT vec_id, q,
           sqrt(CAST(list_reduce(list_transform(q, x -> x*x),
                                 (a,b) -> a+b) AS DOUBLE)) AS nrm
    FROM qv
),
hits AS (
    SELECT tr.vec_id AS vec_id,
           floor(
               CAST(list_reduce(
                    list_transform(range(64), i -> ev.q[i+1] * tr.q[i+1]),
                    (x,y) -> x+y) AS DOUBLE)
               / (ev.nrm * tr.nrm) * 1000000.0 + 0.5) / 1000000.0 AS cosine
    FROM n ev JOIN n tr
      ON ev.vec_id % 11 = 0 AND tr.vec_id % 11 <> 0
)
SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
       MAX(cosine) AS max_cosine
FROM hits WHERE cosine >= {_DECON_EMB_TAU}e0
GROUP BY vec_id
"""


@query("decontaminate_embedding", _DECON_EMB_ORACLE)
def q_decontaminate_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic benchmark decontamination — the embedding-space member
    of the decontamination family (n-gram overlap:
    decontaminate_ngram): training vectors whose quantized cosine to
    ANY eval-split vector (deterministic vec_id % 11 split) reaches
    tau, with hit count and the worst offender's similarity →
    (vec_id, n_hits, max_cosine). Catches paraphrased/translated eval
    leakage that exact n-gram overlap misses.

    Scale shape: the asymmetric block matmul of
    dedup.embedding_incremental_near_dup — the eval set (small side)
    replicates to every corpus block, the corpus never re-shuffles;
    FLOPs are |eval|x|corpus| exact int64 dots; the per-vector
    aggregate is map-side combined. At 100 TB the sign-LSH band
    prefilter slots in front unchanged."""
    emb = _emb(spark, sf_dir)
    ev = emb.filter(F.col("vec_id") % 11 == 0)
    tr = emb.filter(F.col("vec_id") % 11 != 0)
    pairs = dedup.embedding_incremental_near_dup(
        ev, tr, threshold=_DECON_EMB_TAU
    )
    return pairs.groupBy(F.col("dup_of").alias("vec_id")).agg(
        F.count("*").alias("n_hits"),
        F.max("cosine").alias("max_cosine"),
    )


# -- k-core decomposition --------------------------------------------------
# Synchronous peeling, unrolled in the oracle exactly like the
# pagerank CTE chain — all-integer, so hash-checked. 12 rounds: the
# sf0.01 strong co-purchase graph reaches its k=3 fixpoint after 10
# (pytest asserts rounds and rounds+1 agree).

_KCORE_K = 3
_KCORE_ROUNDS = 12

# AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
# round references the previous one ~3x (degree, two alive joins) —
# un-materialized, the 12-round chain would inline the base scan 3^12
# times and exhaust file handles before planning finishes.
_KCORE_STEP = """
d{i} AS MATERIALIZED (
    SELECT src AS node, COUNT(*) AS deg FROM e{i} GROUP BY 1),
a{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE deg >= {k}),
e{next} AS MATERIALIZED (
    SELECT e.src, e.dst FROM e{i} e
    JOIN a{i} s ON e.src = s.node
    JOIN a{i} t ON e.dst = t.node
)"""

_KCORE_ORACLE = (
    """
WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS MATERIALIZED (
    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM basket a JOIN basket b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    GROUP BY 1, 2 HAVING COUNT(*) >= 2
),"""
    + ",".join(
        _KCORE_STEP.format(i=i, next=i + 1, k=_KCORE_K)
        for i in range(_KCORE_ROUNDS)
    )
    + f"""
SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS degree
FROM e{_KCORE_ROUNDS} GROUP BY 1
"""
)


@query("graph_kcore", _KCORE_ORACLE)
def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the strong co-purchase graph (weight >= 2): nodes
    surviving 12 synchronous peel-rounds (drop degree < 3, restrict
    edges, repeat) with their in-core degree — the dense backbone
    that separates structurally-embedded products from tendrils that
    merely touched a hub. Third hash-checked iterative algorithm
    (after PageRank and LPA): all-integer rounds need no fixed-point
    quantization at all; the oracle is the same 12 rounds as chained
    CTEs. Reads the STORED co-purchase edge index."""
    from .queries_analytics import _copurchase_edge_index

    edges = _copurchase_edge_index(spark, sf_dir).filter(
        F.col("weight") >= 2
    )
    return graph.kcore(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS)


# -- Snapshot diff audit ---------------------------------------------------
# Two deterministic snapshots derived from orders:
#   old  = o_orderkey % 10 != 3
#   new  = o_orderkey % 10 != 7, totalprice doubled where % 10 = 1
# so added = keys %10=3, removed = %10=7, changed = %10=1.

_DIFF_ORACLE = """
WITH old AS (
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 <> 3
),
new AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 10 = 1 THEN o_totalprice * 2e0
                ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey % 10 <> 7
)
SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
       CASE WHEN old.o_orderkey IS NULL THEN 'added'
            WHEN new.o_orderkey IS NULL THEN 'removed'
            ELSE 'changed' END AS change_type,
       old.o_totalprice AS old_totalprice,
       new.o_totalprice AS new_totalprice
FROM old FULL OUTER JOIN new USING (o_orderkey)
WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
   OR old.o_totalprice IS DISTINCT FROM new.o_totalprice
"""


@query("table_diff_audit", _DIFF_ORACLE)
def q_table_diff_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the migration/backfill validation primitive:
    given two versions of a keyed table, emit every key that was
    added, removed, or changed (with before/after values), silent on
    identical rows → (o_orderkey, change_type, old_totalprice,
    new_totalprice). The row-level companion of
    referential_integrity_sweep's count-level checks; in a CDC
    pipeline this is the audit that proves a merge applied cleanly.

    Scale shape: ONE full-outer sort-merge join co-partitioned on the
    key; values compared with null-safe column equality (never
    stringified row hashes — float formatting is not portable across
    engines). Both sides scan only the compared columns."""
    o = _orders(spark, sf_dir)
    old = o.filter(F.col("o_orderkey") % 10 != 3).select(
        "o_orderkey", F.col("o_totalprice").alias("old_totalprice")
    )
    new = o.filter(F.col("o_orderkey") % 10 != 7).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 10 == 1, F.col("o_totalprice") * 2.0
        )
        .otherwise(F.col("o_totalprice"))
        .alias("new_totalprice"),
    )
    j = old.join(new, "o_orderkey", "full_outer")
    return j.filter(
        F.col("old_totalprice").isNull()
        | F.col("new_totalprice").isNull()
        | ~F.col("old_totalprice").eqNullSafe(F.col("new_totalprice"))
    ).select(
        "o_orderkey",
        F.when(F.col("old_totalprice").isNull(), F.lit("added"))
        .when(F.col("new_totalprice").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
        .alias("change_type"),
        "old_totalprice",
        "new_totalprice",
    )


# -- BPE pair-merge statistics ---------------------------------------------

_BPE_PAIRS_ORACLE = r"""
WITH w AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
    FROM documents
),
p AS (
    SELECT w[i] || ' ' || w[i+1] AS pair
    FROM w, unnest(range(1, len(w))) AS t(i)
),
c AS (SELECT pair, COUNT(*) AS n FROM p GROUP BY 1)
SELECT pair, CAST(n AS BIGINT) AS n
FROM c ORDER BY n DESC, pair LIMIT 50
"""


@query("bpe_pair_merges", _BPE_PAIRS_ORACLE)
def q_bpe_pair_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE training iteration over the corpus: frequency of
    every ADJACENT token pair, top 50 by count — the merge-candidate
    table a tokenizer-training pipeline materializes each round
    (extends tokenizer_vocab_coverage's static-vocab view with the
    vocab-GROWTH signal). One shingle explode + one map-side-combined
    count shuffle + TakeOrderedAndProject — never a full sort."""
    toks = TX.tokens("text")
    pairs = _docs(spark, sf_dir).select(
        F.explode(TX.word_shingles(toks, 2)).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(50)
    )


# -- Bigram-LM document scoring --------------------------------------------
# Extends text_unigram_logprob one conditioning token deeper: score =
# mean log2 P(w2|w1) (MLE — every scored bigram exists in the corpus
# LM, count >= 1, so no smoothing is needed and log2 stays finite).
# Same int64 micro-bit quantization before any aggregation.

_BIGRAM_LOGPROB_ORACLE = r"""
WITH w AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
    FROM documents
),
bg AS (
    SELECT doc_id, w[i] AS w1, w[i+1] AS w2
    FROM w, unnest(range(1, len(w))) AS t(i)
),
tf AS (SELECT doc_id, w1, w2, COUNT(*) AS tf FROM bg GROUP BY 1, 2, 3),
cb AS (SELECT w1, w2, SUM(tf) AS cnt FROM tf GROUP BY 1, 2),
cl AS (SELECT w1, SUM(cnt) AS lcnt FROM cb GROUP BY 1),
lq AS (
    SELECT w1, w2,
           CAST(floor(log2(CAST(cnt AS DOUBLE) / CAST(lcnt AS DOUBLE))
                      * 1000000.0 + 0.5) AS BIGINT) AS lq
    FROM cb JOIN cl USING (w1)
),
agg AS (
    SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_bigrams,
           SUM(tf.tf * lq.lq) AS slq
    FROM tf JOIN lq USING (w1, w2)
    GROUP BY 1
)
SELECT doc_id, n_bigrams,
       CAST(slq AS DOUBLE)
       / (1000000.0 * CAST(n_bigrams AS DOUBLE)) AS mean_logp
FROM agg
"""


@query("text_bigram_logprob", _BIGRAM_LOGPROB_ORACLE)
def q_text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM document scoring: mean log2 P(w2|w1) per doc under
    the corpus's own MLE bigram model — one conditioning token deeper
    than text_unigram_logprob, separating locally-fluent text from
    bag-of-plausible-words garbage (scrambled word salad keeps its
    unigram score but collapses here).

    Determinism: per-bigram conditional log-probs quantize to int64
    micro-bits before aggregation (exact order-free sums); ONE double
    division at the end. Scale: one shingle explode, two key shuffles
    (doc-bigram tf, corpus LM), one bigram-keyed join — linear, LM
    never collected."""
    toks = TX.tokens("text")
    # split() never yields an empty array, so cnt >= 0 and slice/zip
    # produce an empty zip (row dropped by explode) on <2-token docs
    cnt = F.size(toks) - 1
    z = F.arrays_zip(F.slice(toks, 1, cnt), F.slice(toks, 2, cnt))
    bg = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(z).alias("s"))
        .select(
            "doc_id",
            F.col("s")["0"].alias("w1"),
            F.col("s")["1"].alias("w2"),
        )
    )
    tf = bg.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("tf"))
    cb = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("cnt"))
    cl = cb.groupBy("w1").agg(F.sum("cnt").alias("lcnt"))
    lq = cb.join(cl, "w1").select(
        "w1",
        "w2",
        F.floor(
            F.log2(
                F.col("cnt").cast("double") / F.col("lcnt").cast("double")
            )
            * F.lit(1_000_000.0)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("lq"),
    )
    agg = (
        tf.join(lq, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("tf") * F.col("lq")).alias("slq"),
        )
    )
    return agg.select(
        "doc_id",
        "n_bigrams",
        (
            F.col("slq").cast("double")
            / (F.lit(1_000_000.0) * F.col("n_bigrams").cast("double"))
        ).alias("mean_logp"),
    )


# -- Language-ID confusion matrix ------------------------------------------

_LANG_CONFUSION_ORACLE = r"""
WITH scores AS (
    SELECT doc_id, lang,
           len(regexp_extract_all(lower(text), '\b(the|and|of)\b'))  AS s_en,
           len(regexp_extract_all(lower(text), '\b(der|und|die)\b')) AS s_de,
           len(regexp_extract_all(lower(text), '\b(le|la|et)\b'))    AS s_fr,
           len(regexp_extract_all(lower(text), '\b(el|los|que)\b'))  AS s_es
    FROM documents
),
pred AS (
    SELECT doc_id, lang,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
                WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                ELSE 'es' END AS lang_pred
    FROM scores
),
cm AS (
    SELECT lang, lang_pred, COUNT(*) AS n_docs FROM pred GROUP BY 1, 2
),
tot AS (SELECT lang, SUM(n_docs) AS t FROM cm GROUP BY 1)
SELECT cm.lang, cm.lang_pred, CAST(cm.n_docs AS BIGINT) AS n_docs,
       CAST(cm.n_docs AS DOUBLE) / CAST(t AS DOUBLE) AS row_share
FROM cm JOIN tot USING (lang)
"""


@query("lang_id_confusion", _LANG_CONFUSION_ORACLE)
def q_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the declared ``lang`` column vs the
    marker-n-gram classifier (lang_id): (lang, lang_pred, n_docs,
    row_share) — the classifier-QA readout that decides whether the
    cheap language gate is trustworthy enough to route 100 TB of
    curation (precision per declared language at one glance). Two
    map-side-combined count shuffles over a <= |langs|^2 relation."""
    docs = _docs(spark, sf_dir)
    pred = textstats.lang_id(docs).select("doc_id", "lang_pred")
    cm = (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n_docs"))
    )
    tot = cm.groupBy("lang").agg(F.sum("n_docs").alias("t"))
    return cm.join(F.broadcast(tot), "lang").select(
        "lang",
        "lang_pred",
        "n_docs",
        (
            F.col("n_docs").cast("double") / F.col("t").cast("double")
        ).alias("row_share"),
    )


# -- Distributed PCA -------------------------------------------------------


@query("emb_pca_power_iteration")  # iterative linear algebra -> rows-only
def q_emb_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First principal component of the embedding cloud by power
    iteration on the exact int64 Gram matrix (one Arrow-batched
    partial-Gram pass per partition, d x d driver artifact, component
    broadcast back) — every vector's PC1 projection: (vec_id,
    pc1_proj). The drift/whitening primitive for embedding QA at
    100 TB: the only data-sized passes are the Gram accumulation and
    the final narrow projection. Accuracy-gated against full numpy
    PCA in tests/test_round9.py (top-eigenvector cosine > 0.999)."""
    return embeddings.pca_power_iteration(_emb(spark, sf_dir))
