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
    # (r15: localCheckpoint pins on tf and/or cb were interleaved-
    # A/B-measured at 1.3→1.8 s and REVERTED — the lineage-cut
    # relation loses stats, flipping downstream broadcasts to wider
    # joins, and the pin adds job boundaries; runtime exchange reuse
    # already dedups the repeated subtrees here. See OPTIMIZATION_
    # r15.md §14.)
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
    PCA in tests/test_round9.py (top-eigenvector cosine > 0.999; 0.99999999997 at sf0.1)."""
    return embeddings.pca_power_iteration(_emb(spark, sf_dir))


# -- Incremental SimHash dedup ---------------------------------------------
# Completes the incremental-dedup family across all four signatures:
# exact hash (dedup_incremental), MinHash (dedup_minhash_incremental),
# embedding (dedup_embedding_incremental) — and now SimHash. The
# corpus side is the STORED fingerprint index (_simhash_fp_index);
# only the day's batch is fingerprinted fresh.

_SIMHASH_INCR_ORACLE = r"""
WITH w AS (
    SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS w
    FROM documents
),
tok AS (SELECT DISTINCT doc_id, unnest(w) AS tok FROM w),
bits AS (
    SELECT doc_id, md5(tok) AS h, b
    FROM tok, (SELECT unnest(range(32)) AS b)
),
contrib AS (
    SELECT doc_id, b,
           2 * (CAST(floor(
                 (instr('0123456789abcdef',
                        substr(h, CAST(floor(b / 4) AS INT) + 1, 1)) - 1)
                 / power(2, 3 - (b % 4))) AS INT) % 2) - 1 AS c
    FROM bits
),
persum AS (SELECT doc_id, b, SUM(c) AS s FROM contrib GROUP BY 1, 2),
fps AS (
    SELECT p.doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN CAST(power(2, b) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS simhash,
           MIN(w.source) AS source
    FROM persum p JOIN w ON w.doc_id = p.doc_id
    GROUP BY 1
),
bands AS (
    SELECT doc_id, simhash, source,
           b AS band, (simhash >> (8 * b)) & 255 AS bv
    FROM fps, (SELECT unnest(range(4)) AS b)
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_id, c.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, c.simhash)) AS BIGINT) AS hamming
    FROM bands a
    JOIN bands c ON a.band = c.band AND a.bv = c.bv
    WHERE a.source = 'src0' AND c.source <> 'src0'
),
hit AS (SELECT * FROM cand WHERE hamming <= 3)
SELECT doc_id,
       CAST(min_by(doc_b, hamming * 281474976710656 + doc_b) AS BIGINT)
           AS dup_of,
       MIN(hamming) AS hamming
FROM hit GROUP BY doc_id
"""


@query("dedup_simhash_incremental", _SIMHASH_INCR_ORACLE)
def q_dedup_simhash_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Daily-ingest SimHash near-dup: BOTH sides are served from the
    STORED fingerprint index (queries_ext._simhash_fp_index covers
    the full table including today's batch — the index is keyed on
    the documents mtime, so a new ingest day rebuilds it), split into
    batch (source='src0') vs standing corpus, banded, and probed at
    hamming <= 3; per batch doc the closest corpus partner (ties ->
    smallest doc_id) -> (doc_id, dup_of, hamming). Completes the
    incremental-dedup family (exact hash / MinHash / embedding /
    SimHash). At 100 TB the same shape holds with an append-only
    index: fingerprint only the new day's partition and union it into
    the stored relation — fingerprints are write-once artifacts.

    Scale shape: standing per-day cost is batchx4 band keys
    equi-joined against the index's band projection — the corpus is
    never re-tokenized; the banded search is lossless at radius 3 by
    pigeonhole; the per-doc winner is min_by through map-side partial
    merges, no window over candidates."""
    from .queries_ext import _docs as _ext_docs
    from .queries_ext import _simhash_fp_index

    docs = _ext_docs(spark, sf_dir)
    idx = _simhash_fp_index(spark, sf_dir)
    batch_ids = docs.filter(F.col("source") == "src0").select("doc_id")
    corpus_ids = docs.filter(F.col("source") != "src0").select("doc_id")

    def _bands(fp: DataFrame) -> DataFrame:
        return fp.select(
            "doc_id",
            "simhash",
            F.posexplode(
                F.array(
                    *[
                        F.shiftright(F.col("simhash"), 8 * k).bitwiseAND(
                            F.lit(255)
                        )
                        for k in range(4)
                    ]
                )
            ).alias("band", "bv"),
        )

    b = _bands(idx.join(batch_ids, "doc_id", "left_semi")).alias("b")
    c = _bands(idx.join(corpus_ids, "doc_id", "left_semi")).alias("c")
    cand = (
        b.join(
            c,
            (F.col("b.band") == F.col("c.band"))
            & (F.col("b.bv") == F.col("c.bv")),
        )
        .select(
            F.col("b.doc_id").alias("doc_id"),
            F.col("c.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("b.simhash").bitwiseXOR(F.col("c.simhash"))
            )
            .cast("bigint")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .distinct()
    )
    # composite scalar min_by key (hamming in the high bits — it fits
    # in 2 bits, doc ids far below 2^48); a struct key would work in
    # Spark but DuckDB's min_by needs a scalar, so both engines rank
    # by the identical bigint
    key = F.col("hamming") * F.lit(1 << 48) + F.col("doc_b")
    return cand.groupBy("doc_id").agg(
        F.min_by("doc_b", key).alias("dup_of"),
        F.min("hamming").alias("hamming"),
    )


# -- Event sequence-pattern detection --------------------------------------

_PATTERN_ORACLE = """
WITH seq AS (
    SELECT user_id, event_type, ts, event_id,
           lead(event_type) OVER w AS next_type,
           lead(ts)         OVER w AS next_ts
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
hits AS (
    SELECT user_id, ts
    FROM seq
    WHERE event_type = 'view' AND next_type = 'purchase'
      AND next_ts - ts <= INTERVAL 1 HOUR
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
       MIN(ts) AS first_match_ts
FROM hits GROUP BY user_id
"""


@query("events_pattern_detect", _PATTERN_ORACLE)
def q_events_pattern_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence-pattern detection: per user,
    every IMMEDIATELY-ADJACENT view -> purchase transition completing
    within one hour -> (user_id, n_matches, first_match_ts). The
    conversion-micro-pattern primitive (funnel queries count eventual
    conversion; this demands adjacency + a time bound — intent
    signals, fraud bursts, alert-then-ack compliance windows).

    One user_id window shuffle with the unique (ts, event_id) sort
    key (the same Exchange the session/funnel/markov family rides),
    then a map-side-combined per-user aggregate; time bound compared
    in integer microseconds."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    hits = seq.filter(
        (F.col("event_type") == "view")
        & (F.col("next_type") == "purchase")
        & (us("next_ts") - us("ts") <= F.lit(3_600_000_000))
    )
    return hits.groupBy("user_id").agg(
        F.count("*").alias("n_matches"),
        F.min("ts").alias("first_match_ts"),
    )


# -- Column-entropy profiling ----------------------------------------------
# Entropy terms are quantized to int64 micro-bits BEFORE the per-column
# sum (the repo's order-free float contract), so the aggregate is exact
# regardless of partial-agg order.

_COL_ENTROPY_ORACLE = """
WITH vals AS (
    SELECT 'o_orderstatus' AS col_name, o_orderstatus AS v FROM orders
    UNION ALL
    SELECT 'o_orderpriority', o_orderpriority FROM orders
),
c AS (SELECT col_name, v, COUNT(*) AS n FROM vals GROUP BY 1, 2),
tot AS (SELECT col_name, SUM(n) AS t FROM c GROUP BY 1),
q AS (
    SELECT c.col_name,
           CAST(floor(-(CAST(c.n AS DOUBLE) / CAST(t AS DOUBLE))
                      * log2(CAST(c.n AS DOUBLE) / CAST(t AS DOUBLE))
                      * 1000000.0 + 0.5) AS BIGINT) AS lq
    FROM c JOIN tot USING (col_name)
)
SELECT q.col_name, CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(lq) AS DOUBLE) / 1000000.0 AS entropy_bits
FROM q GROUP BY 1
"""


@query("profile_column_entropy", _COL_ENTROPY_ORACLE)
def q_profile_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level Shannon entropy of the categorical order columns
    (status, priority): (col_name, n_distinct, entropy_bits) — the
    information-content profile behind encoding choices (dictionary
    vs plain), partition-key selection, and drift alerts (an entropy
    collapse means a value took over the column). Companion of
    profile_table's null/distinct sweep.

    Shape: one stack()-unpivot map, one (col, value) count shuffle
    collapsing to a tiny relation, per-term micro-bit quantization ->
    exact int64 sums in any order."""
    o = load_table(spark, sf_dir, "orders")
    vals = o.select(
        F.expr(
            "stack(2, 'o_orderstatus', o_orderstatus,"
            " 'o_orderpriority', o_orderpriority) AS (col_name, v)"
        )
    )
    c = vals.groupBy("col_name", "v").agg(F.count("*").alias("n"))
    tot = c.groupBy("col_name").agg(F.sum("n").alias("t"))
    p = F.col("n").cast("double") / F.col("t").cast("double")
    q = c.join(F.broadcast(tot), "col_name").select(
        "col_name",
        F.floor(-p * F.log2(p) * F.lit(1_000_000.0) + F.lit(0.5))
        .cast("bigint")
        .alias("lq"),
    )
    return q.groupBy("col_name").agg(
        F.count("*").alias("n_distinct"),
        (F.sum("lq").cast("double") / F.lit(1_000_000.0)).alias(
            "entropy_bits"
        ),
    )


# -- Packing fragmentation report ------------------------------------------

_PACK_FRAG_ORACLE = r"""
WITH t AS (
    SELECT doc_id,
           COALESCE(CAST(len(regexp_split_to_array(trim(text), '\s+'))
                    AS BIGINT), 0) AS n_tokens
    FROM documents
),
c AS (
    SELECT doc_id, n_tokens,
           SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
    FROM t
),
spans AS (
    SELECT doc_id,
           ((cum_before + n_tokens - 1) // 512 - cum_before // 512 + 1)
               AS n_spans
    FROM c WHERE n_tokens > 0
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (n_spans > 1) AS BIGINT) AS n_split_docs,
       CAST(COUNT(*) FILTER (n_spans > 1) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS split_frac,
       CAST(SUM(n_spans) AS BIGINT) AS total_spans,
       CAST(SUM(n_spans) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
           AS mean_spans_per_doc
FROM spans
"""


@query("docs_pack_fragmentation", _PACK_FRAG_ORACLE)
def q_docs_pack_fragmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-quality report over the concatenate-and-chunk layout
    (docs_pack_sequences, L=512): how many documents straddle a
    sequence boundary — (n_docs, n_split_docs, split_frac,
    total_spans, mean_spans_per_doc). Fragmentation is the quality
    cost of dense packing (a split doc trains with truncated
    context); this one-row report is the dial watched when choosing L
    or switching to best-fit packing.

    Shape: reuses the distributed prefix-sum placement, then pure
    span arithmetic per doc and ONE map-side-combined global
    aggregate — no new shuffle beyond the packing pass itself."""
    from ..operators import packing

    placed = packing.pack_sequences(_docs(spark, sf_dir))
    spans = placed.filter(F.col("n_tokens") > 0).select(
        (
            (
                (
                    F.col("seq_id") * 512
                    + F.col("seq_offset")
                    + F.col("n_tokens")
                    - 1
                )
                / 512
            ).cast("bigint")
            - F.col("seq_id")
            + 1
        ).alias("n_spans")
    )
    split = F.sum(
        F.when(F.col("n_spans") > 1, 1).otherwise(0)
    ).cast("bigint")
    return spans.agg(
        F.count("*").alias("n_docs"),
        split.alias("n_split_docs"),
        (split.cast("double") / F.count("*").cast("double")).alias(
            "split_frac"
        ),
        F.sum("n_spans").cast("bigint").alias("total_spans"),
        (
            F.sum("n_spans").cast("double")
            / F.count("*").cast("double")
        ).alias("mean_spans_per_doc"),
    )


# -- Streaming PII redaction -----------------------------------------------


def _pii_oracle() -> str:
    """The batch pii_redact oracle verbatim: an AvailableNow drain of
    a deterministic split through a stateless map equals the batch
    result row-for-row."""
    from . import queries_ext  # noqa: F401  (registers the batch oracle)
    from .registry import ORACLES

    return ORACLES["pii_redact"]

@query("stream_pii_redact", _pii_oracle())
def q_stream_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest-time PII scrub: stateless map-only streaming
    plan (no state store / watermark / shuffle), AvailableNow drain
    over 3 micro-batches; the spool equals the batch redaction, so
    the batch pii_redact SQL is the oracle
    (streaming/jobs.pii_redact_stream)."""
    from ..streaming import jobs as stream_jobs

    return stream_jobs.pii_redact_stream(spark, sf_dir)


# -- Shingle novelty -------------------------------------------------------

_NOVELTY_ORACLE = r"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
    FROM documents
),
sh AS (
    SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
    FROM toks, unnest(range(1, len(w) - 1)) AS t(i)
),
first AS (SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY 1)
SELECT sh.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN first_doc = sh.doc_id THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty_frac
FROM sh JOIN first USING (shingle)
GROUP BY sh.doc_id
"""


@query("docs_shingle_novelty", _NOVELTY_ORACLE)
def q_docs_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct word
    3-shingles whose FIRST occurrence (min doc_id, the ingestion
    order proxy) is this doc → (doc_id, n_shingles, n_novel,
    novelty_frac). The marginal-value curve of continued crawling —
    the doc-level companion of docs_vocab_growth's corpus curve: a
    feed whose new docs trend toward zero novelty is re-serving
    content and should be down-weighted or cut.

    Shape: one distinct-shingle shuffle (set semantics), one
    shingle-keyed min aggregate, one shingle-keyed join back, one
    doc-keyed aggregate — all linear in total shingle volume; exact
    ints with ONE division."""
    sh = dedup.doc_shingles(_docs(spark, sf_dir), 3)
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    ).cast("bigint")
    return (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            novel.alias("n_novel"),
            (
                novel.cast("double") / F.count("*").cast("double")
            ).alias("novelty_frac"),
        )
    )


# -- Bounded BFS from the dominant hub -------------------------------------

_BFS_ROUNDS = 10

_BFS_STEP = """
s{next} AS MATERIALIZED (
    SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM s{i}
        UNION ALL
        SELECT e.dst AS node, s{i}.dist + 1 AS dist
        FROM e JOIN s{i} ON e.src = s{i}.node
    ) GROUP BY node
)"""

_BFS_ORACLE = (
    """
WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS MATERIALIZED (
    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM basket a JOIN basket b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
deg AS (SELECT src AS node, COUNT(*) AS d FROM e GROUP BY 1),
s0 AS MATERIALIZED (
    SELECT node, CAST(0 AS BIGINT) AS dist
    FROM deg ORDER BY d DESC, node LIMIT 1
),"""
    + ",".join(
        _BFS_STEP.format(i=i, next=i + 1) for i in range(_BFS_ROUNDS)
    )
    + f"""
SELECT node, dist FROM s{_BFS_ROUNDS}
"""
)


@query("graph_bfs_distance", _BFS_ORACLE)
def q_graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance from the dominant hub (highest-degree node,
    node-id tiebreak) of the strong co-purchase graph, bounded at 10
    hops → (node, dist) for the reached subgraph. The
    reachability/radius probe behind "how much of the catalog is
    within k recommendation hops of the flagship product" — and the
    fourth hash-checked iterative algorithm (PageRank, LPA, k-core,
    BFS), again all-integer so the unrolled MATERIALIZED-CTE oracle
    is bit-exact with no fixed-point quantization.

    Per round: ONE src-keyed contribution join + one map-side-combined
    min aggregate over a relation bounded by the reached set; pytest
    asserts 10 rounds is the fixpoint at oracle scale (hub
    eccentricity 9 at sf0.01)."""
    from .queries_analytics import _copurchase_edge_index

    edges = _copurchase_edge_index(spark, sf_dir).filter(
        F.col("weight") >= 2
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("d")
    )
    hub = deg.orderBy(F.desc("d"), F.asc("node")).limit(1).select("node")
    return graph.bfs_distances(edges, hub, rounds=_BFS_ROUNDS)


# -- Malformed-CSV robustness ----------------------------------------------

_CSV_MALFORMED_ORACLE = """
SELECT CAST(COUNT(*) FILTER (doc_id % 13 <> 0) AS BIGINT) AS n_good,
       CAST(COUNT(*) FILTER (doc_id % 13 = 0) AS BIGINT) AS n_corrupt,
       CAST(SUM(n_chars) FILTER (doc_id % 13 <> 0) AS BIGINT)
           AS sum_chars_good
FROM documents
"""


@query("csv_malformed_permissive", _CSV_MALFORMED_ORACLE)
def q_csv_malformed_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-CSV ingestion (the reference's CSV interchange surface,
    hardened): a fixture CSV carries a type-corrupted numeric field
    on every 13th doc; the PERMISSIVE reader salvages good rows and
    quarantines bad ones in ``_corrupt_record`` instead of failing
    the job (FAILFAST) or silently dropping rows (DROPMALFORMED) →
    one summary row (n_good, n_corrupt, sum_chars_good). The oracle
    recomputes the summary from the source table, closing the loop on
    exactly which rows must survive.

    The fixture writes executor-side through the text sink; the scan
    is a single pass with the corrupt column materialized only for
    the rows that fail parsing."""
    import os

    from ..scratch import SCRATCH_ROOT

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(SCRATCH_ROOT, f"csv_malformed_{sf_tag}")
    lines = _docs(spark, sf_dir).select(
        F.concat_ws(
            ",",
            F.col("doc_id"),
            F.col("lang"),
            F.when(
                F.col("doc_id") % 13 == 0, F.lit("NOT_A_NUMBER")
            ).otherwise(F.col("n_chars").cast("string")),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(path)
    df = (
        spark.read.schema(
            "doc_id BIGINT, lang STRING, n_chars BIGINT,"
            " _corrupt_record STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    good = F.col("_corrupt_record").isNull()
    return df.agg(
        F.sum(good.cast("bigint")).alias("n_good"),
        F.sum((~good).cast("bigint")).alias("n_corrupt"),
        F.sum(F.when(good, F.col("n_chars"))).alias("sum_chars_good"),
    )


# -- Exact per-group mode ---------------------------------------------------

_MODE_ORACLE = """
WITH c AS (
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
    FROM orders GROUP BY 1, 2
),
r AS (
    SELECT o_orderpriority, o_orderstatus, n,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY n DESC, o_orderstatus) AS rk
    FROM c
)
SELECT o_orderpriority, o_orderstatus AS mode_status,
       CAST(n AS BIGINT) AS n
FROM r WHERE rk = 1
"""


@query("agg_mode_exact", _MODE_ORACLE)
def q_agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode: the most frequent order status per
    priority class, deterministic tie-break (count DESC, value ASC) —
    the categorical summary statistic profile/imputation passes need
    that approx sketches don't give. A bare max_by would tie-break
    nondeterministically in DuckDB, so BOTH engines rank explicitly.

    Shape: one map-side-combined count shuffle to a |priorities|x
    |statuses| relation, then a WindowGroupLimit-eligible rank-1 cut
    over that tiny relation."""
    from pyspark.sql import Window

    o = _orders(spark, sf_dir)
    c = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("n"), F.asc("o_orderstatus")
    )
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("mode_status"),
            "n",
        )
    )


# -- Compression-ratio quality signal --------------------------------------


@query("docs_compression_ratio")  # zlib kernel -> rows-only
def q_docs_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression ratio per document — the classic cheap
    complexity signal modern curation stacks run next to entropy
    (highly compressible text = templated/repetitive boilerplate;
    ratio near 1 = already-compressed or random garbage):
    (doc_id, raw_bytes, compressed_bytes, compression_ratio,
    low_complexity). Complements text_char_entropy: entropy sees the
    unigram character distribution, DEFLATE's LZ77 window also sees
    repeated SUBSTRINGS, so a doc of shuffled repeated sentences
    fools entropy but not the ratio.

    Python is unavoidable (no JVM zlib expression), so the hop is an
    Arrow-batched mapInPandas over a pruned 2-column projection —
    the repo's UDF policy (no row-at-a-time udfs); memory bounded by
    arrow.maxRecordsPerBatch. Rows-only check; kernel equivalence
    vs direct zlib is pytest-gated (tests/test_round9.py)."""

    def score(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            raw = pdf["text"].fillna("").str.encode("utf-8")
            rb = raw.str.len().astype("int64")
            cb = raw.map(
                lambda b: len(zlib.compress(b, 6))
            ).astype("int64")
            ratio = rb / cb.where(cb > 0, 1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "raw_bytes": rb,
                    "compressed_bytes": cb,
                    "compression_ratio": ratio.astype("float64"),
                    "low_complexity": ratio > 4.0,
                }
            )

    return (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .mapInPandas(
            score,
            "doc_id bigint, raw_bytes bigint, compressed_bytes bigint,"
            " compression_ratio double, low_complexity boolean",
        )
    )


# -- DSIR importance weights -------------------------------------------------
# Data Selection with Importance Resampling (hashed n-gram variant):
# score raw docs by the log-likelihood ratio of a TARGET (high-quality
# /in-domain) unigram-bucket distribution vs the RAW corpus
# distribution. Target = the deterministic doc_id % 97 split (the same
# eval-split idiom decontaminate_ngram uses as its stand-in corpus).

_DSIR_BUCKETS = 256

_DSIR_ORACLE = rf"""
WITH tok AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS t
    FROM documents
),
b AS (
    SELECT doc_id,
           ('0x' || substr(md5(t), 1, 4))::BIGINT % {_DSIR_BUCKETS} AS bk
    FROM tok
),
tgt AS (
    SELECT bk, COUNT(*) AS c FROM b WHERE doc_id % 97 = 0 GROUP BY 1
),
raw AS (
    SELECT bk, COUNT(*) AS c FROM b WHERE doc_id % 97 <> 0 GROUP BY 1
),
tt AS (SELECT SUM(c) AS n FROM tgt),
tr AS (SELECT SUM(c) AS n FROM raw),
buckets AS (SELECT unnest(range({_DSIR_BUCKETS})) AS bk),
lq AS (
    SELECT buckets.bk,
           CAST(floor(log2(
               (CAST(COALESCE(tgt.c, 0) + 1 AS DOUBLE)
                / CAST(tt.n + {_DSIR_BUCKETS} AS DOUBLE))
               / (CAST(COALESCE(raw.c, 0) + 1 AS DOUBLE)
                  / CAST(tr.n + {_DSIR_BUCKETS} AS DOUBLE))
           ) * 1000000.0 + 0.5) AS BIGINT) AS lq
    FROM buckets
    LEFT JOIN tgt ON tgt.bk = buckets.bk
    LEFT JOIN raw ON raw.bk = buckets.bk, tt, tr
)
SELECT b.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(lq.lq) AS DOUBLE) / 1000000.0 AS dsir_logweight
FROM b JOIN lq ON lq.bk = b.bk
WHERE b.doc_id % 97 <> 0
GROUP BY 1
"""


@query("docs_dsir_weights", _DSIR_ORACLE)
def q_docs_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling" — the hashed n-gram
    variant): every raw doc scored by sum over its tokens of
    log2 p_target(bucket)/p_raw(bucket), where tokens hash into 256
    md5 buckets and both distributions are add-one smoothed →
    (doc_id, n_tokens, dsir_logweight). The weight feeds Gumbel
    top-k / weighted sampling (docs_sample_weighted) to select raw
    data that looks like the target domain — the modern
    quality-targeting alternative to hand-written rule filters.

    Determinism: per-bucket log-ratios quantized to int64 micro-bits
    before the doc sum (order-free exact adds); hashing is the md5
    idiom both engines share bit-for-bit. Scale: two bucket-count
    aggregates (256 rows — broadcastable), one bucket-keyed join onto
    the token stream, one doc-keyed aggregate; the per-token state is
    ONE int64. At 100 TB the target distribution is a 256-row
    broadcast literal refreshed offline."""
    from ..catalog import spread_scan

    # r15: spread the single-row-group scan before the per-token md5
    # bucketing (guide §2.5; no-op at scale — see catalog.spread_scan).
    docs = spread_scan(_docs(spark, sf_dir), "doc_id")
    tok = docs.select(
        "doc_id", F.explode(TX.tokens("text")).alias("t")
    )
    bk = F.conv(F.substring(F.md5(F.col("t")), 1, 4), 16, 10).cast(
        "bigint"
    ) % _DSIR_BUCKETS
    b = tok.select("doc_id", bk.alias("bk"))
    is_tgt = F.col("doc_id") % 97 == 0
    counts = b.groupBy("bk").agg(
        F.sum(is_tgt.cast("bigint")).alias("ct"),
        F.sum((~is_tgt).cast("bigint")).alias("cr"),
    )
    tot = counts.agg(
        F.sum("ct").alias("nt"), F.sum("cr").alias("nr")
    )
    buckets = spark.range(_DSIR_BUCKETS).select(
        F.col("id").alias("bk")
    )
    sm = F.lit(_DSIR_BUCKETS)
    lq = (
        buckets.join(F.broadcast(counts), "bk", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bk",
            F.floor(
                F.log2(
                    (
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast(
                            "double"
                        )
                        / (F.col("nt") + sm).cast("double")
                    )
                    / (
                        (F.coalesce(F.col("cr"), F.lit(0)) + 1).cast(
                            "double"
                        )
                        / (F.col("nr") + sm).cast("double")
                    )
                )
                * F.lit(1_000_000.0)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("lq"),
        )
    )
    return (
        b.filter(~is_tgt)
        .join(F.broadcast(lq), "bk")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (
                F.sum("lq").cast("double") / F.lit(1_000_000.0)
            ).alias("dsir_logweight"),
        )
    )


# -- Streaming decontamination ---------------------------------------------


def _decon_ngram_oracle() -> str:
    """The batch decontaminate_ngram oracle verbatim (same output
    relation; the drain equals the batch answer)."""
    from . import queries_ext  # noqa: F401  (registers the batch oracle)
    from .registry import ORACLES

    return ORACLES["decontaminate_ngram"]


@query("stream_decontaminate", _decon_ngram_oracle())
def q_stream_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest-time benchmark decontamination: per
    micro-batch, training docs are flagged against the STATIC
    broadcast eval n-gram set inside foreachBatch (batch-local
    aggregate — a doc never spans files), so the streaming plan
    carries zero state store. AvailableNow drain ≡ the batch
    decontaminate_ngram query, same SQL oracle
    (streaming/jobs.decontaminate_stream)."""
    from ..streaming import jobs as stream_jobs

    return stream_jobs.decontaminate_stream(spark, sf_dir)


# -- IVF index-health balance report ---------------------------------------


def _ivf_balance_oracle() -> str:
    from .queries_ext import _duck_cos

    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS centroid_id, v AS cv
    FROM e ORDER BY vec_id LIMIT 8
),
assign AS (
    SELECT vec_id, centroid_id FROM (
        SELECT e.vec_id, c.centroid_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_duck_cos('e.v', 'c.cv')} DESC, c.centroid_id
               ) AS rn
        FROM e, cents c
    ) WHERE rn = 1
),
n AS (SELECT COUNT(*) AS t FROM e)
SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(COUNT(*) AS DOUBLE) / CAST(t AS DOUBLE) AS share
FROM assign, n GROUP BY centroid_id, t
"""


@query("sim_ivf_balance", _ivf_balance_oracle())
def q_sim_ivf_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF inverted-list balance report: vectors per list and list
    share under the exact coarse quantizer → (centroid_id, n_vecs,
    share). THE index-health check run after every (re)build: a hot
    list means probes that hit it scan far more than nprobe/nlist of
    the data and the quantizer needs retraining — at 100 TB this
    report is the difference between believing the partition-pruning
    math and knowing it.

    Shape: the same fully NARROW broadcast-array argmax assignment
    the search queries use (no Exchange until the |nlist|-row count
    aggregate), one tiny count shuffle, totals broadcast back."""
    from ..operators import similarity

    emb = _emb(spark, sf_dir)
    from ..operators.similarity import (
        _centroid_array,
        _nearest_centroid,
        _vecs,
        ivf_centroids,
    )

    cents = ivf_centroids(emb, 8)
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
    c = assigned.groupBy("centroid_id").agg(
        F.count("*").alias("n_vecs")
    )
    tot = c.agg(F.sum("n_vecs").alias("t"))
    return c.crossJoin(F.broadcast(tot)).select(
        "centroid_id",
        "n_vecs",
        (
            F.col("n_vecs").cast("double") / F.col("t").cast("double")
        ).alias("share"),
    )


# -- Gopher rule ablation ---------------------------------------------------


def _gopher_ablation_oracle() -> str:
    from . import queries_ext  # noqa: F401  (registers the batch oracle)
    from .registry import ORACLES

    g = ORACLES["docs_gopher_quality"].strip().rstrip()
    return f"""
WITH g AS ({g}),
g2 AS (
    SELECT *,
           CAST(NOT r_word_count AS INT) + CAST(NOT r_mean_len AS INT)
           + CAST(NOT r_symbol AS INT) + CAST(NOT r_alpha AS INT)
           + CAST(NOT r_stop AS INT) AS failcnt
    FROM g
),
tot AS (SELECT COUNT(*) AS t FROM g2),
u AS (
    SELECT 'r_word_count' AS rule,
           COUNT(*) FILTER (NOT r_word_count) AS n_fail,
           COUNT(*) FILTER (NOT r_word_count AND failcnt = 1)
               AS n_sole_fail
    FROM g2
    UNION ALL
    SELECT 'r_mean_len', COUNT(*) FILTER (NOT r_mean_len),
           COUNT(*) FILTER (NOT r_mean_len AND failcnt = 1) FROM g2
    UNION ALL
    SELECT 'r_symbol', COUNT(*) FILTER (NOT r_symbol),
           COUNT(*) FILTER (NOT r_symbol AND failcnt = 1) FROM g2
    UNION ALL
    SELECT 'r_alpha', COUNT(*) FILTER (NOT r_alpha),
           COUNT(*) FILTER (NOT r_alpha AND failcnt = 1) FROM g2
    UNION ALL
    SELECT 'r_stop', COUNT(*) FILTER (NOT r_stop),
           COUNT(*) FILTER (NOT r_stop AND failcnt = 1) FROM g2
)
SELECT rule, CAST(n_fail AS BIGINT) AS n_fail,
       CAST(n_sole_fail AS BIGINT) AS n_sole_fail,
       CAST(n_sole_fail AS DOUBLE) / CAST(t AS DOUBLE)
           AS marginal_pass_gain
FROM u, tot
"""


@query("docs_gopher_rule_ablation", _gopher_ablation_oracle())
def q_docs_gopher_rule_ablation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-rule ablation of the Gopher quality gate: for each of the
    five published rules, how many docs fail it at all (n_fail) and
    how many fail ONLY it (n_sole_fail — the docs the corpus would
    regain if the rule were dropped, as marginal_pass_gain). THE
    tuning readout for a rule filter: a rule with large n_fail but
    near-zero sole-fail is redundant with the others; a rule with a
    large sole-fail share is the binding constraint and deserves a
    threshold review before it deletes terabytes.

    Shape: one map-only rule pass (per-doc failed-rule count rides
    along), a 5-way stack() unpivot, and one map-side-combined
    aggregate to 5 rows; totals broadcast back."""
    from ..operators import textstats

    g = textstats.gopher_quality(_docs(spark, sf_dir))
    rules = ["r_word_count", "r_mean_len", "r_symbol", "r_alpha", "r_stop"]
    failcnt = sum(
        (~F.col(r)).cast("int") for r in rules
    )
    g2 = g.select(*rules).withColumn("failcnt", failcnt)
    stack_expr = "stack({}, {}) AS (rule, flag)".format(
        len(rules), ", ".join(f"'{r}', {r}" for r in rules)
    )
    u = g2.select(F.expr(stack_expr), "failcnt")
    agg = u.groupBy("rule").agg(
        F.sum((~F.col("flag")).cast("bigint")).alias("n_fail"),
        F.sum(
            ((~F.col("flag")) & (F.col("failcnt") == 1)).cast("bigint")
        ).alias("n_sole_fail"),
    )
    tot = g.agg(F.count("*").alias("t"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "rule",
        "n_fail",
        "n_sole_fail",
        (
            F.col("n_sole_fail").cast("double")
            / F.col("t").cast("double")
        ).alias("marginal_pass_gain"),
    )


# -- Conversion lag ---------------------------------------------------------

_CONV_LAG_ORACLE = """
WITH v AS (
    SELECT user_id, MIN(ts) AS first_view
    FROM events WHERE event_type = 'view' GROUP BY 1
),
p AS (
    SELECT v.user_id, v.first_view, MIN(e.ts) AS first_purchase
    FROM v JOIN events e
      ON e.user_id = v.user_id AND e.event_type = 'purchase'
     AND e.ts >= v.first_view
    GROUP BY 1, 2
),
lag AS (
    SELECT user_id,
           CAST(epoch_us(first_purchase) - epoch_us(first_view)
                AS BIGINT) AS lag_us
    FROM p
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       CAST(MIN(lag_us) AS BIGINT) AS min_lag_us,
       CAST(MAX(lag_us) AS BIGINT) AS max_lag_us,
       CAST(SUM(lag_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
           / 60000000e0 AS mean_lag_minutes
FROM lag
"""


@query("events_conversion_lag_stats", _CONV_LAG_ORACLE)
def q_events_conversion_lag_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-view → first-subsequent-purchase conversion lag, corpus
    level: (n_converted, min/max lag in integer microseconds, mean in
    minutes). The time-to-convert summary the attribution family
    (first/last touch) and the adjacency pattern (pattern_detect)
    don't give: how LONG intent takes to close, the input to choosing
    retargeting windows and the pattern_detect time bound.

    Shape: two user-keyed min-aggregates sharing one Exchange (the
    purchase side filters then joins on the same user key), lag math
    in exact integer microseconds, one global 1-row aggregate; ONE
    double division at the end."""
    ev = load_table(spark, sf_dir, "events")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id", "first_view")
        .agg(F.min("ts").alias("first_purchase"))
    )
    lag = p.select(
        (
            us("first_purchase") - us("first_view")
        ).alias("lag_us")
    )
    return lag.agg(
        F.count("*").alias("n_converted"),
        F.min("lag_us").alias("min_lag_us"),
        F.max("lag_us").alias("max_lag_us"),
        (
            F.sum("lag_us").cast("double")
            / F.count("*").cast("double")
            / F.lit(60_000_000.0)
        ).alias("mean_lag_minutes"),
    )


# -- Basket-size histogram --------------------------------------------------

_BASKET_HIST_ORACLE = """
WITH s AS (
    SELECT l_orderkey, COUNT(*) AS n_items
    FROM lineitem GROUP BY 1
)
SELECT CAST(n_items AS BIGINT) AS n_items,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM s GROUP BY 1 ORDER BY n_items
"""


@query("orders_basket_size_histogram", _BASKET_HIST_ORACLE)
def q_orders_basket_size_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order basket-size distribution: lines per order → order count
    per size. The fan-out profile read before sizing the co-purchase
    pair generation (pairs grow quadratically in basket size — this
    histogram is the denominator of that risk) and the classic
    order-mix sanity check. One map-side-combined count shuffle to
    |orders| keys, one tiny histogram aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_orderkey").agg(F.count("*").alias("n_items"))
    return (
        s.groupBy(F.col("n_items").cast("bigint").alias("n_items"))
        .agg(F.count("*").alias("n_orders"))
        .orderBy("n_items")
    )


# -- Hard-negative mining / Matryoshka QA ----------------------------------
# Two retrieval-adjacent training-data operators over the embeddings
# table, both the ONE-corpus-pass broadcast-probe shape of batch_topk
# (WindowGroupLimit per-partition heaps before the qid exchange).


def _hardneg_oracle() -> str:
    from .queries_ext import _duck_cos

    cos = _duck_cos("e.v", "q.qv")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
q AS (
    SELECT vec_id AS qid, label AS qlabel, v AS qv
    FROM e ORDER BY vec_id LIMIT 16
)
SELECT qid, qlabel, neg_id, neg_label, cosine FROM (
    SELECT q.qid, q.qlabel, e.vec_id AS neg_id, e.label AS neg_label,
           round({cos}, 6) AS cosine,
           row_number() OVER (
               PARTITION BY q.qid
               ORDER BY round({cos}, 6) DESC, e.vec_id
           ) AS rn
    FROM e, q
    WHERE e.label <> q.qlabel
) WHERE rn = 1
"""


@query("emb_hard_negative_mining", _hardneg_oracle())
def q_emb_hard_negative_mining(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Contrastive-training hard negatives: per probe vector, the
    single most cosine-similar corpus vector with a DIFFERENT label
    (operators/similarity.hard_negative_mining). The mined pair is
    what a contrastive loss learns most from; one retrieval pass, not
    a separate system."""
    from ..operators import similarity

    return similarity.hard_negative_mining(_emb(spark, sf_dir))


def _matryoshka_oracle() -> str:
    from .queries_ext import _duck_cos

    cosf = _duck_cos("e.v", "q.qv")

    def trunc_cos(a: str, b: str) -> str:
        dot = (
            f"list_reduce(list_transform(range(16), i -> {a}[i+1]*{b}[i+1]),"
            " (x,y) -> x+y)"
        )

        def ssq(v: str) -> str:
            return (
                f"list_reduce(list_transform(range(16), i -> {v}[i+1]*{v}[i+1]),"
                " (x,y) -> x+y)"
            )

        return f"({dot} / (sqrt({ssq(a)}) * sqrt({ssq(b)})))"

    cost = trunc_cos("e.v", "q.qv")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM e ORDER BY vec_id LIMIT 16),
scored AS (
    SELECT q.qid, e.vec_id,
           round({cosf}, 6) AS cos_full,
           round({cost}, 6) AS cos_trunc
    FROM e, q
    WHERE e.vec_id <> q.qid
),
nf AS (
    SELECT qid, vec_id AS nn_full, cos_full FROM (
        SELECT *, row_number() OVER (
            PARTITION BY qid ORDER BY cos_full DESC, vec_id
        ) AS rn FROM scored
    ) WHERE rn = 1
),
nt AS (
    SELECT qid, vec_id AS nn_trunc, cos_trunc FROM (
        SELECT *, row_number() OVER (
            PARTITION BY qid ORDER BY cos_trunc DESC, vec_id
        ) AS rn FROM scored
    ) WHERE rn = 1
)
SELECT nf.qid, nn_full, cos_full, nn_trunc, cos_trunc,
       nn_full = nn_trunc AS agree
FROM nf JOIN nt ON nf.qid = nt.qid
"""


@query("emb_matryoshka_agreement", _matryoshka_oracle())
def q_emb_matryoshka_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matryoshka/truncation QA: per probe, top-1 neighbor under the
    full 64 dims vs under the first 16, with an agreement flag
    (operators/similarity.matryoshka_agreement) — the go/no-go
    measurement for shipping 4x-smaller truncated embeddings."""
    from ..operators import similarity

    return similarity.matryoshka_agreement(_emb(spark, sf_dir))


# -- Entity resolution ------------------------------------------------------

_ENTITY_MATCH_ORACLE = """
WITH t AS (
    SELECT p_partkey AS key,
           list_distinct(regexp_split_to_array(p_name, ' ')) AS toks,
           regexp_split_to_array(p_name, ' ')[-1] || '|' || p_brand
               || '|' || p_type AS block,
           CAST(p_size AS BIGINT) AS sz,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100
                AS BIGINT) AS price_c
    FROM part
)
SELECT a_key, b_key, block, jaccard, size_delta, price_delta_cents
FROM (
    SELECT a.key AS a_key, b.key AS b_key, a.block AS block,
           CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
           / (len(a.toks) + len(b.toks)
              - len(list_intersect(a.toks, b.toks))) AS jaccard,
           abs(a.sz - b.sz) AS size_delta,
           abs(a.price_c - b.price_c) AS price_delta_cents
    FROM t a JOIN t b ON a.block = b.block AND a.key < b.key
) WHERE jaccard >= 0.3e0
"""


@query("part_entity_match", _ENTITY_MATCH_ORACLE)
def q_part_entity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over the part catalog: block on the
    composite (product noun, brand, type) key — duplicate listings
    agree on hard attributes; the name is what drifts — verify
    within-block pairs by exact token-set Jaccard >= 0.3, emit
    size/price deltas as match-rule features
    (operators/entity.blocked_name_match). Candidates are quadratic
    only inside a block — and the composite key is what keeps block
    frequency bounded by catalog granularity instead of the fixed
    noun vocabulary (noun-only blocking measured 25 M candidate pairs
    at sf0.1 vs 167 k composite; see operators/entity.py)."""
    from ..operators import entity

    return entity.blocked_name_match(load_table(spark, sf_dir, "part"))


# -- Int8 fixed-point retrieval ---------------------------------------------
# A GLOBAL-scale (1/127) int8 code path for the similarity family:
# unit-normalize, quantize once at write time, and every retrieval
# score is an exact int64 dot product — bit-stable in any accumulation
# order, so the ranking itself is hash-checkable with no rounding
# discipline at all. The recall twin measures what the 4x compression
# costs against the float cosine ranking.

_INT8_CODES_CTE = """
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
en AS (
    SELECT vec_id, v,
           sqrt(list_reduce(list_transform(v, y -> y*y),
                            (a,b) -> a+b)) AS nrm
    FROM e
),
c AS (
    SELECT vec_id,
           list_transform(v, x -> CASE WHEN nrm = 0e0
               THEN CAST(0 AS BIGINT)
               ELSE CAST(floor(x / nrm * 127e0 + 0.5e0) AS BIGINT)
           END) AS q
    FROM en
),
qs AS (SELECT vec_id AS qid, q AS qq FROM c ORDER BY vec_id LIMIT 4),
scored8 AS (
    SELECT qs.qid, c.vec_id,
           CAST(list_reduce(
               list_transform(range(64), i -> qs.qq[i+1] * c.q[i+1]),
               (x,y) -> x+y) AS BIGINT) AS qdot
    FROM c, qs
),
top8 AS (
    SELECT qid, vec_id, qdot FROM (
        SELECT *, row_number() OVER (
            PARTITION BY qid ORDER BY qdot DESC, vec_id) AS rn
        FROM scored8
    ) WHERE rn <= 10
)"""

_INT8_TOPK_ORACLE = f"""
WITH {_INT8_CODES_CTE}
SELECT qid, vec_id, qdot FROM top8
"""


@query("sim_topk_int8", _INT8_TOPK_ORACLE)
def q_sim_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized batch retrieval: each of the 4 smallest-vec_id query
    codes ranks the corpus by the EXACT int64 dot product of
    global-scale int8 codes (floor(x/||x||*127 + 0.5)) →
    (qid, vec_id, qdot). The compressed-index member of the sim_topk
    family: 4x smaller codes, integer arithmetic end-to-end, and a
    ranking that is bit-stable across engines and partitionings by
    construction rather than by rounding discipline.

    Shape: identical to sim_topk_batch — one narrow quantize pass,
    broadcast 4-code query array, rank-limited window
    (WindowGroupLimit per-partition heaps), the qid exchange carries
    <= k*nq rows per partition. At 100 TB the codes are the stored
    column (write once at ingest) and the float embeddings never
    leave cold storage for first-stage retrieval."""
    from ..operators import similarity

    return similarity.int8_batch_topk(_emb(spark, sf_dir), k=10, nq=4)


_INT8_RECALL_ORACLE = f"""
WITH {_INT8_CODES_CTE},
n AS (
    SELECT vec_id, v,
           sqrt(list_reduce(list_transform(v, y -> y*y),
                            (a,b) -> a+b)) AS nrm
    FROM e
),
qf AS (SELECT vec_id AS qid, v AS qv, nrm AS qn
       FROM n ORDER BY vec_id LIMIT 4),
scoredf AS (
    SELECT qf.qid, n.vec_id,
           round(list_reduce(
                     list_transform(range(64), i -> n.v[i+1]*qf.qv[i+1]),
                     (x,y) -> x+y) / (n.nrm * qf.qn), 6) AS cosine
    FROM n, qf
),
topf AS (
    SELECT qid, vec_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
        FROM scoredf
    ) WHERE rn <= 10
),
hits AS (
    SELECT t8.qid, COUNT(*) AS n_common
    FROM top8 t8 JOIN topf tf
      ON t8.qid = tf.qid AND t8.vec_id = tf.vec_id
    GROUP BY 1
)
SELECT q.qid,
       CAST(COALESCE(h.n_common, 0) AS BIGINT) AS n_common,
       CAST(COALESCE(h.n_common, 0) AS DOUBLE) / 10e0 AS recall
FROM (SELECT DISTINCT qid FROM top8) q
LEFT JOIN hits h USING (qid)
"""


@query("sim_topk_int8_recall", _INT8_RECALL_ORACLE)
def q_sim_topk_int8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression QA for the int8 retrieval path: per query,
    |int8 top-10 ∩ float top-10| and recall@10 → (qid, n_common,
    recall). Both rankings are exact and deterministic (integer dots
    vs rounded cosine, vec_id tiebreaks), so unlike the LSH/IVF
    recall studies (rows-only, accuracy-gated in pytest) this
    agreement measure is itself hash-checkable — the measured answer
    to "what does 4x compression cost at retrieval time".

    Shape: two rank-limited corpus passes sharing the scan + one
    k*nq-row join — nothing leaves the executors but 2*k*nq rows."""
    from ..operators import similarity

    return similarity.int8_recall_vs_float(_emb(spark, sf_dir), k=10, nq=4)


# -- Session path prefixes ---------------------------------------------------
# What do the first three steps of a session look like, and how often?
# The session-shape census the funnel (fixed pattern), markov (pairs),
# and pattern_detect (adjacent view->purchase) queries each project
# one slice of.

_SESSION_PATHS_ORACLE = """
WITH ev AS (
    SELECT user_id, event_id, event_type,
           epoch_us(CAST(ts AS TIMESTAMP)) AS us
    FROM events
),
lagged AS (
    SELECT *, CASE WHEN lag(us) OVER w IS NULL
                     OR us - lag(us) OVER w > 1800000000 THEN 1
                   ELSE 0 END AS is_new
    FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
sess AS (
    SELECT *, SUM(is_new) OVER (
        PARTITION BY user_id ORDER BY us, event_id
        ROWS UNBOUNDED PRECEDING) AS sid
    FROM lagged
),
ranked AS (
    SELECT user_id, sid, event_type,
           row_number() OVER (
               PARTITION BY user_id, sid ORDER BY us, event_id) AS rn
    FROM sess
),
paths AS (
    SELECT user_id, sid,
           string_agg(event_type, '>' ORDER BY rn) AS path
    FROM ranked WHERE rn <= 3 GROUP BY 1, 2
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY 1
"""


@query("events_session_paths", _SESSION_PATHS_ORACLE)
def q_events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-opening path census: sessionize per user on a 30-minute
    inactivity gap, take each session's first <= 3 event types in
    order, and count sessions per '>'-joined path → (path,
    n_sessions). The entry-pattern distribution that tells a product
    team what sessions actually open with, complementing
    events_funnel_batch (did a FIXED pattern complete) and
    events_markov_transitions (memoryless pair rates).

    Shape: ONE user_id Exchange serves the lag, the running
    session-id sum, and the per-session rank (same sort key
    (us, event_id) — Spark reuses the window Exchange/Sort); the
    path aggregate rides a (user_id, sid) shuffle whose output is at
    most |sessions| rows; the final census groups <= |event_types|^3
    paths. Gap math in exact integer microseconds."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    e2 = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    lagged = e2.withColumn(
        "is_new",
        (
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) > F.lit(1_800_000_000))
        ).cast("int"),
    )
    sess = lagged.withColumn(
        "sid",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ws = Window.partitionBy("user_id", "sid").orderBy("us", "event_id")
    ranked = sess.withColumn("rn", F.row_number().over(ws)).filter(
        F.col("rn") <= 3
    )
    paths = ranked.groupBy("user_id", "sid").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    return paths.groupBy("path").agg(F.count("*").alias("n_sessions"))


# -- Weighted median ---------------------------------------------------------
# Quantity-weighted median price per return flag: the weighted-quantile
# primitive (every unit of quantity votes, not every row). All-integer
# cumulative weights over cent-quantized prices -> hash-exact.

_WMEDIAN_ORACLE = """
WITH g AS (
    SELECT l_returnflag,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                AS BIGINT) AS price_c,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wt
    FROM lineitem GROUP BY 1, 2
),
c AS (
    SELECT *,
           SUM(wt) OVER (PARTITION BY l_returnflag ORDER BY price_c
                         ROWS UNBOUNDED PRECEDING) AS cum,
           SUM(wt) OVER (PARTITION BY l_returnflag) AS tot
    FROM g
)
SELECT l_returnflag,
       CAST(MIN(price_c) AS DOUBLE) / 100e0 AS wmedian_price,
       CAST(MIN(tot) AS BIGINT) AS total_weight
FROM c WHERE 2 * cum >= tot
GROUP BY 1
"""


@query("agg_weighted_median", _WMEDIAN_ORACLE)
def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (smallest value whose cumulative weight reaches
    half the total): quantity-weighted median extended price per
    return flag → (l_returnflag, wmedian_price, total_weight). The
    weighted-quantile primitive the unweighted family (agg_percentile,
    bucket_global_quantile) can't express — every unit of quantity
    votes, not every row.

    Shape: map-side-combined (flag, cent-price) pre-aggregate FIRST —
    the windows then run over |distinct prices| rows, not |lineitem|
    (the pre-agg is what makes a per-group running sum scale-safe:
    distinct cent prices are value-bounded regardless of row count);
    both windows and the half-total cut ride ONE flag Exchange.
    All-integer cumulative weights → exact."""
    li = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql import Window

    g = li.groupBy(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("price_c"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("wt"))
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("price_c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("l_returnflag")
    c = g.select(
        "l_returnflag",
        "price_c",
        F.sum("wt").over(wcum).alias("cum"),
        F.sum("wt").over(wtot).alias("tot"),
    )
    return (
        c.filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(
            (F.min("price_c").cast("double") / F.lit(100.0)).alias(
                "wmedian_price"
            ),
            F.min("tot").cast("long").alias("total_weight"),
        )
    )


# -- Holt linear-trend forecast ---------------------------------------------
# Double-exponential smoothing over the monthly revenue series, as an
# ORDERED fold: both engines evaluate the identical expression tree
# left-to-right over the identical month-sorted series, so the
# level/trend recurrence is bit-identical with no quantization at all
# (the ordered-fold contract of functions/vectors.py, applied to a
# recurrence instead of a sum). Seed = {l: y1, b: 0} — the uniform
# zero-trend init that needs no lookahead.
#
# The oracle is a RECURSIVE CTE, not list_reduce: DuckDB 1.0's
# list_reduce with a struct_pack accumulator updates fields
# SEQUENTIALLY — a later field expression sees earlier fields already
# overwritten (probe: (acc,e) -> struct_pack(l := acc.l + e.l,
# b := acc.l) over [1,2,3] yields b = 6, the NEW l, where a
# functional fold yields 3). Spark's F.aggregate is a proper
# functional fold, so the two diverge on any cross-referencing
# recurrence; row-at-a-time recursion has clean semantics.

_HOLT_ORACLE = """
WITH RECURSIVE m AS MATERIALIZED (
    SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                AS BIGINT) AS mk,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DOUBLE) AS rev
    FROM orders GROUP BY 1
),
ordered AS MATERIALIZED (
    SELECT row_number() OVER (ORDER BY mk) AS rn, rev FROM m
),
fit(rn, l, b) AS (
    SELECT 1, rev, 0e0 FROM ordered WHERE rn = 1
    UNION ALL
    SELECT o.rn,
           0.5e0 * o.rev + 0.5e0 * (f.l + f.b),
           0.25e0 * (0.5e0 * o.rev + 0.5e0 * (f.l + f.b) - f.l)
               + 0.75e0 * f.b
    FROM fit f JOIN ordered o ON o.rn = f.rn + 1
),
last AS (
    SELECT l, b FROM fit
    WHERE rn = (SELECT MAX(rn) FROM ordered)
)
SELECT CAST(h AS BIGINT) AS h,
       l + CAST(h AS DOUBLE) * b AS forecast
FROM last, unnest([1, 2, 3]) AS t(h)
"""


@query("orders_revenue_holt_forecast", _HOLT_ORACLE)
def q_orders_revenue_holt_forecast(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Holt double-exponential smoothing (alpha=0.5, beta=0.25) over
    the monthly revenue series, forecasting 1-3 months ahead →
    (h, forecast). The trend-aware forecaster the OLS family
    (events_trend_ols, rolling_slope) doesn't give: level and trend
    adapt recursively, recent months dominate.

    Shape: one decimal-exact month aggregate (map-side combined, ~Z
    rows for Z months REGARDLESS of order count — the series, not the
    table, is what's sequential), then the fold runs on that tiny
    sorted array in a single task. The recurrence is bit-identical
    across engines because both evaluate the same expression tree
    left-to-right over the same month-sorted list (ordered-fold
    contract) — no quantization needed."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("bigint")
        .alias("mk")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("rev")
    )
    xs = m.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("mk", "rev"))),
            lambda e: F.struct(
                e["rev"].alias("l"), F.lit(0.0).alias("b")
            ),
        ).alias("xs")
    )
    merge = lambda acc, e: F.struct(  # noqa: E731
        (
            F.lit(0.5) * e["l"]
            + F.lit(0.5) * (acc["l"] + acc["b"])
        ).alias("l"),
        (
            F.lit(0.25)
            * (
                F.lit(0.5) * e["l"]
                + F.lit(0.5) * (acc["l"] + acc["b"])
                - acc["l"]
            )
            + F.lit(0.75) * acc["b"]
        ).alias("b"),
    )
    fit = xs.select(
        F.aggregate(
            F.slice(F.col("xs"), 2, F.size("xs") - 1),
            F.element_at(F.col("xs"), 1),
            merge,
        ).alias("st")
    )
    return fit.select(
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("h"),
        "st",
    ).select(
        F.col("h").cast("long").alias("h"),
        (F.col("st.l") + F.col("h").cast("double") * F.col("st.b")).alias(
            "forecast"
        ),
    )


# -- Count-Min sketch --------------------------------------------------------
# The mergeable frequency sketch (Cormode & Muthukrishnan '05): d=4
# md5-derived hash rows x w=256 counters. Deterministic hashing makes
# the whole sketch — and its estimates — hash-checkable cross-engine,
# unlike the HLL/KLL family (library-internal randomness -> rows-only).

_CMS_D = 4
_CMS_W = 256

_CMS_ORACLE = rf"""
WITH toks AS (
    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
    FROM documents
),
exact AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_ct FROM toks GROUP BY 1
),
cells AS (
    SELECT exact_ct, r,
           ('0x' || substr(md5(tok || '#' || CAST(r AS VARCHAR)), 1, 15)
           )::BIGINT % {_CMS_W} AS bucket
    FROM exact, unnest([0, 1, 2, 3]) AS t(r)
),
sketch AS (
    SELECT r, bucket, CAST(SUM(exact_ct) AS BIGINT) AS counter
    FROM cells GROUP BY 1, 2
),
probes AS (
    SELECT tok, exact_ct FROM exact ORDER BY exact_ct DESC, tok LIMIT 20
),
pcells AS (
    SELECT tok, exact_ct, r,
           ('0x' || substr(md5(tok || '#' || CAST(r AS VARCHAR)), 1, 15)
           )::BIGINT % {_CMS_W} AS bucket
    FROM probes, unnest([0, 1, 2, 3]) AS t(r)
)
SELECT p.tok AS token, p.exact_ct,
       CAST(MIN(s.counter) AS BIGINT) AS cms_est
FROM pcells p JOIN sketch s ON s.r = p.r AND s.bucket = p.bucket
GROUP BY 1, 2
"""


def _cms_bucket(r: int) -> "F.Column":
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("tok"), F.lit(f"#{r}"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % F.lit(_CMS_W)
    )


@query("sketch_count_min_freq", _CMS_ORACLE)
def q_sketch_count_min_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation: build a d=4 x w=256 CMS
    over all token occurrences, then estimate the top-20 tokens'
    frequencies and report estimate vs truth → (token, exact_ct,
    cms_est), cms_est >= exact_ct by construction (property-tested).
    The mergeable point-frequency sketch the sketch family lacked
    (HLL: distinct counts; KLL: quantiles) — and, with md5-derived
    hashing, the only one whose estimates are deterministic enough to
    hash-check cross-engine rather than gate on error bounds.

    Scale shape: counters build from the (token, count) PRE-AGGREGATE
    (map-side combined), so the d·w-cell update shuffle carries at
    most d·w partial cells per partition regardless of corpus size;
    two-level rollup (shard sketches -> global sketch) is counter
    addition, the no-raw-rescan re-aggregation story shared with
    stream_hll_rollup. The probe joins a 4·|probes|-cell relation
    against the 1 024-cell sketch — both broadcast-size."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(F.explode(TX.tokens("text")).alias("tok"))
    exact = toks.groupBy("tok").agg(F.count("*").alias("exact_ct"))
    cells = exact.select(
        "exact_ct",
        F.posexplode(
            F.array(*[_cms_bucket(r) for r in range(_CMS_D)])
        ).alias("r", "bucket"),
    )
    sketch = cells.groupBy("r", "bucket").agg(
        F.sum("exact_ct").alias("counter")
    )
    probes = exact.orderBy(F.desc("exact_ct"), F.asc("tok")).limit(20)
    pcells = probes.select(
        F.col("tok").alias("token"),
        "exact_ct",
        F.posexplode(
            F.array(*[_cms_bucket(r) for r in range(_CMS_D)])
        ).alias("r", "bucket"),
    )
    return (
        pcells.join(F.broadcast(sketch), ["r", "bucket"])
        .groupBy("token", "exact_ct")
        .agg(F.min("counter").cast("long").alias("cms_est"))
    )


# -- Bloom membership sketch -------------------------------------------------
# The third deterministic sketch (CMS: point frequency; HLL: distinct;
# Bloom: membership): m=65536 bits, k=3 md5-derived hash functions over
# the set of customers who ever placed a 1-URGENT order (a selective subset; every customer has
# some order); probe = ALL customers. One summary row with the
# MEASURED false-positive rate.
#
# Sizing: r9 shipped m=4096 as a deliberate undersizing demo, but at
# bench scale (sf0.1, ~13k members) that filter saturates to FPR 1.0 —
# a useless operator, not a documentation point. m=2^16 keeps the
# filter working across the test scales (theory FPR ~9% at 13k
# members, ~0.02% at 1.3k) while still being 8 KiB — the measured-vs-
# theory comparison in PLANS.md is the honest capacity story.

_BLOOM_M = 65536
_BLOOM_K = 3

_BLOOM_ORACLE = f"""
WITH members AS (SELECT DISTINCT o_custkey AS k FROM orders
              WHERE o_orderpriority = '1-URGENT'),
bits AS (
    SELECT DISTINCT
           ('0x' || substr(md5(CAST(k AS VARCHAR) || '#'
                               || CAST(h AS VARCHAR)), 1, 15)
           )::BIGINT % {_BLOOM_M} AS bit
    FROM members, unnest([0, 1, 2]) AS t(h)
),
probes AS (
    SELECT c.c_custkey AS k,
           CASE WHEN m.k IS NULL THEN 0 ELSE 1 END AS actual
    FROM customer c LEFT JOIN members m ON m.k = c.c_custkey
),
pbits AS (
    SELECT p.k, p.actual,
           ('0x' || substr(md5(CAST(p.k AS VARCHAR) || '#'
                               || CAST(h AS VARCHAR)), 1, 15)
           )::BIGINT % {_BLOOM_M} AS bit
    FROM probes p, unnest([0, 1, 2]) AS t(h)
),
verdict AS (
    SELECT pb.k, pb.actual,
           CASE WHEN COUNT(b.bit) = {_BLOOM_K} THEN 1 ELSE 0 END AS hit
    FROM pbits pb LEFT JOIN bits b ON b.bit = pb.bit
    GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(actual) AS BIGINT) AS n_members,
       CAST(SUM(hit) AS BIGINT) AS n_bloom_positive,
       CAST(SUM(CASE WHEN hit = 1 AND actual = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_positive,
       CAST(SUM(CASE WHEN hit = 1 AND actual = 0 THEN 1 ELSE 0 END)
            AS DOUBLE)
           / CAST(COUNT(*) - SUM(actual) AS DOUBLE) AS fpr
FROM verdict
"""


def _bloom_bit(key: "F.Column", h: int) -> "F.Column":
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(key.cast("string"), F.lit(f"#{h}"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % F.lit(_BLOOM_M)
    )


@query("sketch_bloom_membership", _BLOOM_ORACLE)
def q_sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership with MEASURED false-positive rate:
    build an m=65536-bit / k=3 md5-hashed bloom over customers with an
    URGENT-priority order (a proper subset — every customer has SOME
    order, so membership must be selective for FPR to be defined),
    probe every customer, compare the sketch's verdict to
    ground truth → one row (n_probes, n_members, n_bloom_positive,
    n_false_positive, fpr). Completes the deterministic sketch trio
    (CMS: point frequency, Bloom: membership, vs the library HLL/KLL
    which are rows-only) — and makes the bit array itself a
    first-class RELATION of set bits, which is exactly the shape a
    join-pruning filter pushes to a scan (join_bloom_filtered uses
    Spark's built-in; this one is inspectable and mergeable by bit
    union).

    Scale shape: the set-bit relation is ≤ m rows REGARDLESS of
    member count — it broadcasts; probes explode to k rows each and
    the verdict is a map-side-combinable count-of-hits per key; no
    shuffle ever carries more than k rows per probe. The measured FPR
    vs the (1-e^(-kn/m))^k theory line is published in the PLANS.md
    accuracy table; at 100 TB, m scales with the member estimate (the
    bit relation stays broadcast-size into the millions of bits)."""
    members = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    bits = (
        members.select(
            F.explode(
                F.array(
                    *[_bloom_bit(F.col("k"), h) for h in range(_BLOOM_K)]
                )
            ).alias("bit")
        )
        .distinct()
        .withColumn("set_", F.lit(1))
    )
    probes = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("k"))
        .join(
            members.withColumn("actual", F.lit(1)),
            "k",
            "left",
        )
        .select("k", F.coalesce("actual", F.lit(0)).alias("actual"))
    )
    pbits = probes.select(
        "k",
        "actual",
        F.explode(
            F.array(*[_bloom_bit(F.col("k"), h) for h in range(_BLOOM_K)])
        ).alias("bit"),
    )
    verdict = (
        pbits.join(F.broadcast(bits), "bit", "left")
        .groupBy("k", "actual")
        .agg(
            (F.count("set_") == _BLOOM_K).cast("int").alias("hit")
        )
    )
    return verdict.agg(
        F.count("*").cast("long").alias("n_probes"),
        F.sum("actual").cast("long").alias("n_members"),
        F.sum("hit").cast("long").alias("n_bloom_positive"),
        F.sum(
            F.when((F.col("hit") == 1) & (F.col("actual") == 0), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_false_positive"),
        (
            F.sum(
                F.when(
                    (F.col("hit") == 1) & (F.col("actual") == 0), 1
                ).otherwise(0)
            ).cast("double")
            / (F.count("*") - F.sum("actual")).cast("double")
        ).alias("fpr"),
    )


_CMS_STREAM_ORACLE = rf"""
WITH toks AS (
    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
    FROM documents
),
exact AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_ct FROM toks GROUP BY 1
),
cells AS (
    SELECT exact_ct, r,
           ('0x' || substr(md5(tok || '#' || CAST(r AS VARCHAR)), 1, 15)
           )::BIGINT % {_CMS_W} AS bucket
    FROM exact, unnest([0, 1, 2, 3]) AS t(r)
)
SELECT CAST(r AS BIGINT) AS r, bucket,
       CAST(SUM(exact_ct) AS BIGINT) AS counter
FROM cells GROUP BY 1, 2
"""


@query("stream_cms_rollup", _CMS_STREAM_ORACLE)
def q_stream_cms_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Count-Min sketch maintenance (streaming/jobs.py
    cms_rollup_stream): the d×w counter matrix as the ONLY streaming
    state, drained over a 3-micro-batch split. Counter addition is
    commutative, so the drained sketch is bit-identical to the batch
    sketch — the repo's first hash-checked streaming sketch (HLL
    rollup is rows-only by library nature)."""
    from ..streaming import jobs as stream_jobs

    return stream_jobs.cms_rollup_stream(spark, sf_dir)


# -- Multimodal shard manifest ----------------------------------------------
# WebDataset-style shard layout for binary payloads: items in id order,
# each blob WHOLE in the shard where its start offset falls.

_SHARD_BYTES = 65536

_SHARD_MANIFEST_ORACLE = f"""
WITH m AS (
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
),
c AS (
    SELECT doc_id, n_bytes,
           SUM(n_bytes) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
               - n_bytes AS cb
    FROM m
),
s AS (
    -- cb is a window SUM → HUGEINT in DuckDB; without the cast the
    -- result column surfaces as decimal128 through Arrow and the
    -- driver's value-hash diverges from Spark's BIGINT even though
    -- row-sorted equality passes (CORRECTNESS_r10's only hash-fail).
    SELECT CAST(cb // {_SHARD_BYTES} AS BIGINT) AS shard_id,
           doc_id, n_bytes
    FROM c
)
SELECT shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(n_bytes) AS BIGINT) AS bytes_total,
       CAST(MIN(doc_id) AS BIGINT) AS first_id,
       CAST(MAX(doc_id) AS BIGINT) AS last_id
FROM s GROUP BY 1
"""


@query("multimodal_shard_manifest", _SHARD_MANIFEST_ORACLE)
def q_multimodal_shard_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WebDataset-style shard manifest over the binary payload lake:
    blobs laid out in doc_id order, each landing WHOLE in the 64 KiB
    shard where its start offset falls → (shard_id, n_items,
    bytes_total, first_id, last_id). The tar-shard layout step every
    multimodal training pipeline runs between curation and the data
    loader — contiguous id ranges per shard (manifest IS the index),
    deterministic, and resumable.

    Scale shape: the distributed prefix-sum idiom of pack_sequences
    (operators/packing.py byte_shard_manifest) — corpus-wide running
    totals are bucket-partitioned windows; the only GLOBAL window
    runs over the tiny per-bucket totals relation; assignment is then
    a narrow integer division and the manifest a map-side-combined
    aggregate. Start-offset sharding trades ≤ one-item overshoot per
    shard for a fully parallel layout (greedy close-at-budget is
    inherently sequential)."""
    from ..operators import multimodal, packing

    meta = multimodal.payload_meta(_docs(spark, sf_dir)).select(
        "doc_id", "n_bytes"
    )
    return packing.byte_shard_manifest(meta, shard_bytes=_SHARD_BYTES)


# -- Out-of-order ingestion audit -------------------------------------------
# How late do events arrive relative to ingestion order? The measured
# answer to "what watermark delay does this stream need" — read BEFORE
# picking withWatermark() bounds, the way basket_size_histogram is read
# before pair generation.

_OOO_AUDIT_ORACLE = """
WITH e AS (
    SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           epoch_us(CAST(ts AS TIMESTAMP))
               + ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
                 )::BIGINT % 3600000000 AS arr_us
    FROM events
),
p AS (
    SELECT event_id, us,
           MAX(us) OVER (ORDER BY arr_us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS prev_max
    FROM e
),
l AS (
    SELECT CASE WHEN prev_max IS NULL OR prev_max <= us THEN 0
                ELSE prev_max - us END AS late_us
    FROM p
)
SELECT CASE WHEN late_us = 0 THEN -1
            ELSE length(bin(late_us)) - 1 END AS late_pow2_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM l GROUP BY 1
"""


@query("events_out_of_order_audit", _OOO_AUDIT_ORACLE)
def q_events_out_of_order_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Event-time disorder audit: per event, lateness = (max event
    time seen earlier in ingestion order) − its own event time,
    histogrammed in power-of-2 microsecond buckets (−1 = in order) →
    (late_pow2_us, n_events). The measured input to choosing a
    streaming watermark: the p99 bucket IS the withWatermark() bound
    that keeps 99% of events inside state, and the residual share is
    the documented drop rate.

    The testdata stream is PERFECTLY sorted by event_id (measured:
    zero inversions at every sf), so ingestion order is modeled as
    event time + an md5-derived deterministic arrival delay in
    [0, 1h) — network jitter — to exercise the full path; on real
    data the arrival sequence is simply the ingestion order and the
    delay model drops out.

    Shape: the running max is the distributed prefix-MAX sibling of
    the packing prefix sum (operators/aggregate.
    bucketed_prefix_max_before): within-bucket exclusive window maxes
    + one tiny global window over per-bucket maxes broadcast back —
    no single-partition pass over the corpus; buckets are arrival-
    time ranges (ties stay inside a bucket, event_id tiebreak);
    lateness in exact integer microseconds; bit-length bucketing (no
    float log2)."""
    from ..operators import aggregate

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    delay = (
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
            16,
            10,
        ).cast("bigint")
        % F.lit(3_600_000_000)
    )
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        us.alias("us"),
        (us + delay).alias("arr_us"),
    )
    pm = aggregate.bucketed_prefix_max_before(
        ev,
        "arr_us",
        "us",
        bucket_width=600_000_000,  # 10-minute arrival-time buckets
        tiebreak="event_id",
    )
    late = pm.select(
        F.when(
            F.col("prev_max").isNull()
            | (F.col("prev_max") <= F.col("us")),
            F.lit(0).cast("long"),
        )
        .otherwise(F.col("prev_max") - F.col("us"))
        .alias("late_us")
    )
    return late.select(
        F.when(F.col("late_us") == 0, F.lit(-1))
        .otherwise(F.length(F.expr("bin(late_us)")) - 1)
        .cast("long")
        .alias("late_pow2_us")
    ).groupBy("late_pow2_us").agg(
        F.count("*").cast("long").alias("n_events")
    )


# -- Kneser-Ney bigram scoring ----------------------------------------------
# The production-grade LM quality signal: absolute discounting (D=0.75)
# with CONTINUATION-probability backoff (Kneser & Ney '95). MLE
# (text_bigram_logprob) overrates memorized frequent pairs;
# KN's continuation term asks "in how many contexts does this word
# appear" — the score that separates genuinely fluent text from
# high-frequency-collocation stuffing. Every scored bigram exists in
# the corpus (cnt >= 1 > D), so probabilities stay finite with no max().

_KN_LOGPROB_ORACLE = r"""
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
n1f AS (SELECT w1, COUNT(*) AS nf FROM cb GROUP BY 1),
n1p AS (SELECT w2, COUNT(*) AS np FROM cb GROUP BY 1),
tot AS (SELECT COUNT(*) AS b FROM cb),
lq AS (
    SELECT cb.w1, cb.w2,
           CAST(floor(log2(
               (CAST(cnt AS DOUBLE) - 0.75e0) / CAST(lcnt AS DOUBLE)
               + 0.75e0 * CAST(nf AS DOUBLE) / CAST(lcnt AS DOUBLE)
                 * (CAST(np AS DOUBLE) / CAST(b AS DOUBLE))
           ) * 1000000.0 + 0.5) AS BIGINT) AS lq
    FROM cb
    JOIN cl USING (w1)
    JOIN n1f USING (w1)
    JOIN n1p USING (w2)
    CROSS JOIN tot
),
agg AS (
    SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_bigrams,
           SUM(tf.tf * lq.lq) AS slq
    FROM tf JOIN lq ON tf.w1 = lq.w1 AND tf.w2 = lq.w2
    GROUP BY 1
)
SELECT doc_id, n_bigrams,
       CAST(slq AS DOUBLE)
       / (1000000.0 * CAST(n_bigrams AS DOUBLE)) AS mean_kn_logp
FROM agg
"""


@query("text_bigram_kn_logprob", _KN_LOGPROB_ORACLE)
def q_text_bigram_kn_logprob(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kneser-Ney smoothed bigram document scoring: mean log2
    P_KN(w2|w1) per doc with D=0.75 absolute discounting and
    continuation-probability backoff → (doc_id, n_bigrams,
    mean_kn_logp). The serious LM-quality member of the text-signal
    family — MLE (text_bigram_logprob) overrates memorized frequent
    pairs; the continuation term scores how PROMISCUOUSLY a word
    combines, the classic fix.

    Determinism: the KN probability is one identically-bracketed
    double expression in both engines over exact integer counts
    (discount 0.75 and all divisions exact-input); per-bigram log2
    quantizes to int64 micro-bits BEFORE aggregation (order-free
    sums), ONE double division at the end. Scale: the four model
    relations (pair counts, left counts, fan-out, fan-in) are
    map-side-combined shuffles on w1/w2; the 1-row bigram total
    broadcasts; scoring is one bigram-keyed join — linear, the LM
    never leaves the executors."""
    toks = TX.tokens("text")
    cnt_ = F.size(toks) - 1
    z = F.arrays_zip(F.slice(toks, 1, cnt_), F.slice(toks, 2, cnt_))
    bg = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(z).alias("s"))
        .select(
            "doc_id",
            F.col("s")["0"].alias("w1"),
            F.col("s")["1"].alias("w2"),
        )
    )
    # (r15: localCheckpoint pins on tf and/or cb were interleaved-
    # A/B-measured at 1.5→2.2 s and REVERTED — same cause as
    # text_bigram_logprob's note; see OPTIMIZATION_r15.md §14.)
    tf = bg.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("tf"))
    cb = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("cnt"))
    cl = cb.groupBy("w1").agg(F.sum("cnt").alias("lcnt"))
    n1f = cb.groupBy("w1").agg(F.count("*").alias("nf"))
    n1p = cb.groupBy("w2").agg(F.count("*").alias("np"))
    tot = cb.agg(F.count("*").alias("b"))
    p_kn = (
        (F.col("cnt").cast("double") - F.lit(0.75))
        / F.col("lcnt").cast("double")
        + F.lit(0.75)
        * F.col("nf").cast("double")
        / F.col("lcnt").cast("double")
        * (F.col("np").cast("double") / F.col("b").cast("double"))
    )
    lq = (
        cb.join(cl, "w1")
        .join(n1f, "w1")
        .join(n1p, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.floor(F.log2(p_kn) * F.lit(1_000_000.0) + F.lit(0.5))
            .cast("bigint")
            .alias("lq"),
        )
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
        ).alias("mean_kn_logp"),
    )


# -- Grouped OLS: discount elasticity per brand -----------------------------
# events_trend_ols fits ONE global line; the realistic analytical shape
# is a regression PER GROUP behind a dimension join. All four moments
# are exact int64 sums (discount in basis points, quantity integral),
# so the normal-equation arithmetic is engine-identical.

_BRAND_OLS_ORACLE = """
WITH li AS (
    SELECT l_partkey,
           CAST(CAST(l_discount AS DECIMAL(6,4)) * 10000 AS BIGINT) AS x,
           CAST(l_quantity AS BIGINT) AS y
    FROM lineitem
),
j AS (
    SELECT p.p_brand AS brand, x, y
    FROM li JOIN part p ON p.p_partkey = li.l_partkey
),
m AS (
    SELECT brand,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                AS DOUBLE) AS sxy,
           CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
                AS DOUBLE) AS sxx
    FROM j GROUP BY 1
)
SELECT brand, n,
       (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * sxx
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope_per_bp,
       (CAST(sy AS DOUBLE)
        - (CAST(n AS DOUBLE) * sxy
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (CAST(n AS DOUBLE) * sxx
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * CAST(sx AS DOUBLE))
           / CAST(n AS DOUBLE) AS intercept
FROM m
"""


@query("part_brand_discount_ols", _BRAND_OLS_ORACLE)
def q_part_brand_discount_ols(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-brand discount→quantity OLS: does a deeper discount move
    volume, brand by brand → (brand, n, slope_per_bp, intercept).
    The GROUPED regression shape events_trend_ols (one global line)
    doesn't cover: a moment aggregate behind a dimension join —
    the everyday elasticity read.

    Shape: part is the broadcast dim (key, brand only — column-pruned
    scan); the fact pass accumulates all four moments in ONE
    map-side-combined aggregate. Overflow policy (same as CUPED's
    moment pass): linear sums sx/sy stay exact int64 (x ≤ 10^4 bp,
    y ≤ 50 → safe past SF 10^6); the product sums Σxy/Σx² widen
    per-row through DECIMAL(19,0)×(19,0) and the normal-equation
    cross products n·Σxy, Σx·Σy run in DOUBLE — at SF100 n·Σxy
    reaches ~10^20, past int64, and non-ANSI Spark would wrap
    silently while DuckDB errors. DOUBLE arithmetic over identically
    bracketed expressions is bit-identical cross-engine; two double
    divisions per |brands| output row. No second fact scan, no
    window."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_discount").cast("decimal(6,4)") * 10000)
        .cast("bigint")
        .alias("x"),
        F.col("l_quantity").cast("bigint").alias("y"),
    )
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"),
        F.col("p_brand").alias("brand"),
    )
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    m = (
        li.join(F.broadcast(p), "l_partkey")
        .groupBy("brand")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(dec("x") * dec("y")).cast("double").alias("sxy"),
            F.sum(dec("x") * dec("x")).cast("double").alias("sxx"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    num = d("n") * F.col("sxy") - d("sx") * d("sy")
    den = d("n") * F.col("sxx") - d("sx") * d("sx")
    slope = num / den
    return m.select(
        "brand",
        "n",
        slope.alias("slope_per_bp"),
        ((d("sy") - slope * d("sx")) / d("n")).alias("intercept"),
    )


# -- Welch's t-test ----------------------------------------------------------
# The A/B experiment read: deterministic 50/50 assignment (user_id
# parity), purchase-value metric, Welch's unequal-variance t statistic
# + Welch-Satterthwaite df. All moments are exact int64 cent sums; the
# t/df arithmetic is one identically-bracketed double expression.

_AB_TTEST_ORACLE = """
WITH m AS (
    SELECT user_id % 2 AS grp,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
    FROM events WHERE event_type = 'purchase'
),
s AS (
    SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(c) AS BIGINT) AS sx,
           CAST(SUM(c * c) AS BIGINT) AS sq
    FROM m GROUP BY 1
),
w AS (
    SELECT
        MAX(CASE WHEN grp = 0 THEN n END) AS n_a,
        MAX(CASE WHEN grp = 1 THEN n END) AS n_b,
        MAX(CASE WHEN grp = 0 THEN sx END) AS sx_a,
        MAX(CASE WHEN grp = 1 THEN sx END) AS sx_b,
        MAX(CASE WHEN grp = 0 THEN sq END) AS sq_a,
        MAX(CASE WHEN grp = 1 THEN sq END) AS sq_b
    FROM s
),
v AS (
    SELECT n_a, n_b,
           CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
           CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
           (CAST(sq_a AS DOUBLE)
            - CAST(sx_a AS DOUBLE) * CAST(sx_a AS DOUBLE)
              / CAST(n_a AS DOUBLE)) / CAST(n_a - 1 AS DOUBLE)
               / CAST(n_a AS DOUBLE) AS va_n,
           (CAST(sq_b AS DOUBLE)
            - CAST(sx_b AS DOUBLE) * CAST(sx_b AS DOUBLE)
              / CAST(n_b AS DOUBLE)) / CAST(n_b - 1 AS DOUBLE)
               / CAST(n_b AS DOUBLE) AS vb_n
    FROM w
)
SELECT n_a, n_b,
       ma / 100e0 AS mean_a,
       mb / 100e0 AS mean_b,
       (ma - mb) / sqrt(va_n + vb_n) AS t_stat,
       (va_n + vb_n) * (va_n + vb_n)
       / (va_n * va_n / CAST(n_a - 1 AS DOUBLE)
          + vb_n * vb_n / CAST(n_b - 1 AS DOUBLE)) AS welch_df
FROM v
"""


@query("events_ab_welch_ttest", _AB_TTEST_ORACLE)
def q_events_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test over purchase value
    with deterministic 50/50 assignment (user_id parity) →
    (n_a, n_b, mean_a, mean_b, t_stat, welch_df). The experiment
    read-out primitive the anomaly family doesn't give: is the
    difference between two cohorts larger than their pooled noise.

    Determinism: the three moments per arm (n, Σ cents, Σ cents²) are
    exact int64 sums — cents ≤ 10^5, so Σc² stays under 2^63 through
    ~10^9 purchases per arm (DECIMAL widening documented beyond);
    every double op after that is one identically-bracketed
    expression (sqrt is correctly-rounded IEEE, oracle-safe).

    Shape: one filtered scan → ONE map-side-combined 2-group
    aggregate → a 2-row pivot into a single result row. Nothing else
    moves; at 100 TB this is the cheapest query in the engine."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 2).alias("grp"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("c"),
    )
    s = m.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("sx"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sq"),
    )
    w = s.agg(
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("grp") == 0, F.col("sx"))).alias("sx_a"),
        F.max(F.when(F.col("grp") == 1, F.col("sx"))).alias("sx_b"),
        F.max(F.when(F.col("grp") == 0, F.col("sq"))).alias("sq_a"),
        F.max(F.when(F.col("grp") == 1, F.col("sq"))).alias("sq_b"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    ma = d("sx_a") / d("n_a")
    mb = d("sx_b") / d("n_b")
    va_n = (
        (d("sq_a") - d("sx_a") * d("sx_a") / d("n_a"))
        / (F.col("n_a") - 1).cast("double")
        / d("n_a")
    )
    vb_n = (
        (d("sq_b") - d("sx_b") * d("sx_b") / d("n_b"))
        / (F.col("n_b") - 1).cast("double")
        / d("n_b")
    )
    v = w.select(
        "n_a",
        "n_b",
        ma.alias("ma"),
        mb.alias("mb"),
        va_n.alias("va_n"),
        vb_n.alias("vb_n"),
    )
    return v.select(
        "n_a",
        "n_b",
        (F.col("ma") / F.lit(100.0)).alias("mean_a"),
        (F.col("mb") / F.lit(100.0)).alias("mean_b"),
        (
            (F.col("ma") - F.col("mb"))
            / F.sqrt(F.col("va_n") + F.col("vb_n"))
        ).alias("t_stat"),
        (
            (F.col("va_n") + F.col("vb_n"))
            * (F.col("va_n") + F.col("vb_n"))
            / (
                F.col("va_n") * F.col("va_n")
                / (F.col("n_a") - 1).cast("double")
                + F.col("vb_n") * F.col("vb_n")
                / (F.col("n_b") - 1).cast("double")
            )
        ).alias("welch_df"),
    )


# -- Kaplan-Meier conversion curve ------------------------------------------
# Survival analysis over the event log: time from signup to first
# big-ticket purchase (value >= $150), RIGHT-CENSORED at last activity
# for users who never get there — the estimator that reads time-to-
# convert correctly when many subjects haven't converted yet (a plain
# mean over converters only is survivorship-biased). Survival is
# emitted as the cumulative quantized log2 (int64 micro-bits, exact
# running sum); S(t) = 2^(ubits/2^20) for the reader.

_KM_BIG = 150.0
_KM_DEAD_UBITS = -(10**9)  # d == n_risk: S hits exactly 0

_KM_ORACLE = f"""
WITH s AS (
    SELECT user_id, MIN(ts) AS st FROM events
    WHERE event_type = 'signup' GROUP BY 1
),
p AS (
    SELECT e.user_id, MIN(e.ts) AS pt
    FROM events e JOIN s ON s.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND e.value >= {_KM_BIG}e0
      AND e.ts >= s.st
    GROUP BY 1
),
last AS (
    SELECT e.user_id, MAX(e.ts) AS lt
    FROM events e JOIN s ON s.user_id = e.user_id
    GROUP BY 1
),
subj AS (
    SELECT s.user_id,
           CASE WHEN p.pt IS NOT NULL THEN 1 ELSE 0 END AS ev,
           (epoch_us(CAST(COALESCE(p.pt, last.lt) AS TIMESTAMP))
            - epoch_us(CAST(s.st AS TIMESTAMP))) // 86400000000
               AS t_days
    FROM s
    JOIN last ON last.user_id = s.user_id
    LEFT JOIN p ON p.user_id = s.user_id
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM subj),
grp AS (
    SELECT t_days,
           CAST(SUM(ev) AS BIGINT) AS d,
           CAST(SUM(1 - ev) AS BIGINT) AS c
    FROM subj GROUP BY 1
),
risk AS (
    SELECT t_days, d, c,
           n - COALESCE(SUM(d + c) OVER (ORDER BY t_days
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
    FROM grp, tot
),
terms AS (
    SELECT t_days, n_risk, d, c,
           CASE WHEN d = 0 THEN 0
                WHEN d < n_risk THEN CAST(floor(log2(
                    CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE)
                ) * 1000000.0 + 0.5) AS BIGINT)
                ELSE {_KM_DEAD_UBITS} END AS term
    FROM risk
)
SELECT t_days, CAST(n_risk AS BIGINT) AS n_risk, d AS d_events,
       c AS c_censored,
       CAST(SUM(term) OVER (ORDER BY t_days
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS log2_s_ubits
FROM terms
"""


@query("events_km_conversion_curve", _KM_ORACLE)
def q_events_km_conversion_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kaplan-Meier time-to-conversion: signup → first big-ticket
    purchase (value >= $150), right-censored at last activity →
    (t_days, n_risk, d_events, c_censored, log2_s_ubits). The
    survival-analysis primitive the retention family lacks: censored
    users stay in the risk set until they drop out, so the curve is
    unbiased where a converters-only mean is survivorship-biased.
    S(t) = 2^(ubits/2^20); a d = n_risk terminal bucket pins S to 0
    via an exact sentinel.

    Determinism: durations in exact integer days (µs div 86400e6);
    each KM factor's log2 quantizes to int64 micro-bits BEFORE the
    cumulative sum (exact in any order/engine); sentinel −10^9 for
    the S=0 step. Shape: three user-keyed aggregates sharing one
    Exchange, then the curve windows run over the DISTINCT-duration
    relation (≤ dataset-span days — tiny by construction, its
    single-partition window is safe the same way the bucket-totals
    windows are)."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("st"))
    )
    p = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & (F.col("value") >= F.lit(_KM_BIG))
        )
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("st"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    last = ev.join(s.select("user_id"), "user_id").groupBy("user_id").agg(
        F.max("ts").alias("lt")
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    subj = (
        s.join(last, "user_id")
        .join(p, "user_id", "left")
        .select(
            F.when(F.col("pt").isNotNull(), 1).otherwise(0).alias("ev"),
            F.expr(
                "(unix_micros(cast(coalesce(pt, lt) as timestamp))"
                " - unix_micros(cast(st as timestamp))) div 86400000000"
            ).alias("t_days"),
        )
    )
    grp = subj.groupBy("t_days").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.sum(1 - F.col("ev")).cast("bigint").alias("c"),
    )
    tot = subj.agg(F.count("*").cast("bigint").alias("n"))
    w_prev = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = grp.crossJoin(F.broadcast(tot)).select(
        "t_days",
        "d",
        "c",
        (
            F.col("n")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)
            )
        ).alias("n_risk"),
    )
    term = (
        F.when(F.col("d") == 0, F.lit(0).cast("bigint"))
        .when(
            F.col("d") < F.col("n_risk"),
            F.floor(
                F.log2(
                    (F.col("n_risk") - F.col("d")).cast("double")
                    / F.col("n_risk").cast("double")
                )
                * F.lit(1_000_000.0)
                + F.lit(0.5)
            ).cast("bigint"),
        )
        .otherwise(F.lit(_KM_DEAD_UBITS).cast("bigint"))
    )
    w_cum = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return risk.select(
        "t_days",
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("d").alias("d_events"),
        F.col("c").alias("c_censored"),
        term.alias("term"),
    ).select(
        "t_days",
        "n_risk",
        "d_events",
        "c_censored",
        F.sum("term").over(w_cum).cast("bigint").alias("log2_s_ubits"),
    )


# -- CUPED variance-reduced A/B readout -------------------------------------
# Deng et al. WSDM'13: regress the experiment metric on its own
# pre-period value and test the residual — same treatment effect,
# less variance, smaller detectable lift. theta and x-bar come from
# exact int64 moments; each user's adjusted metric is one
# identically-bracketed double, quantized to int64 (2^10 per cent)
# BEFORE the arm sums so the t statistic is engine-exact.

_CUPED_CUTOFF = "2024-01-16"
_CUPED_Q = 1024  # 2^10 — exact power-of-2 quantization scale

_CUPED_ORACLE = f"""
WITH u AS (
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                          AND ts < TIMESTAMP '{_CUPED_CUTOFF}'
                    THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS x,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                          AND ts >= TIMESTAMP '{_CUPED_CUTOFF}'
                    THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS y,
           user_id % 2 AS grp
    FROM events GROUP BY user_id
),
g AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
                AS DOUBLE) AS sxx,
           CAST(SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                AS DOUBLE) AS sxy
    FROM u
),
th AS (
    SELECT n,
           (CAST(n AS DOUBLE) * sxy
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * sxx
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta,
           CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
    FROM g
),
adj AS (
    SELECT grp, y,
           CAST(floor((CAST(y AS DOUBLE)
                       - theta * (CAST(x AS DOUBLE) - xbar))
                      * {_CUPED_Q}e0 + 0.5e0) AS BIGINT) AS q
    FROM u, th
),
arms AS (
    SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                AS DOUBLE) AS syy,
           CAST(SUM(q) AS BIGINT) AS sq,
           CAST(SUM(CAST(q AS DECIMAL(19,0)) * CAST(q AS DECIMAL(19,0)))
                AS DOUBLE) AS sqq
    FROM adj GROUP BY 1
),
w AS (
    SELECT MAX(CASE WHEN grp = 0 THEN n END) AS n_a,
           MAX(CASE WHEN grp = 1 THEN n END) AS n_b,
           MAX(CASE WHEN grp = 0 THEN sy END) AS sy_a,
           MAX(CASE WHEN grp = 1 THEN sy END) AS sy_b,
           MAX(CASE WHEN grp = 0 THEN syy END) AS syy_a,
           MAX(CASE WHEN grp = 1 THEN syy END) AS syy_b,
           MAX(CASE WHEN grp = 0 THEN sq END) AS sq_a,
           MAX(CASE WHEN grp = 1 THEN sq END) AS sq_b,
           MAX(CASE WHEN grp = 0 THEN sqq END) AS sqq_a,
           MAX(CASE WHEN grp = 1 THEN sqq END) AS sqq_b
    FROM arms
)
SELECT n_a, n_b, theta,
       (CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        - CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE))
       / sqrt(
           (syy_a - CAST(sy_a AS DOUBLE) * CAST(sy_a AS DOUBLE)
                    / CAST(n_a AS DOUBLE))
               / CAST(n_a - 1 AS DOUBLE) / CAST(n_a AS DOUBLE)
           + (syy_b - CAST(sy_b AS DOUBLE) * CAST(sy_b AS DOUBLE)
                      / CAST(n_b AS DOUBLE))
               / CAST(n_b - 1 AS DOUBLE) / CAST(n_b AS DOUBLE)
       ) AS t_raw,
       (CAST(sq_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        - CAST(sq_b AS DOUBLE) / CAST(n_b AS DOUBLE))
       / sqrt(
           (sqq_a - CAST(sq_a AS DOUBLE) * CAST(sq_a AS DOUBLE)
                    / CAST(n_a AS DOUBLE))
               / CAST(n_a - 1 AS DOUBLE) / CAST(n_a AS DOUBLE)
           + (sqq_b - CAST(sq_b AS DOUBLE) * CAST(sq_b AS DOUBLE)
                      / CAST(n_b AS DOUBLE))
               / CAST(n_b - 1 AS DOUBLE) / CAST(n_b AS DOUBLE)
       ) AS t_cuped
FROM th, w
"""


@query("events_cuped_ab_adjusted", _CUPED_ORACLE)
def q_events_cuped_ab_adjusted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al.
    WSDM'13): per user, post-period purchase revenue adjusted by its
    own pre-period value (theta = cov(x,y)/var(x)), then Welch t on
    raw vs adjusted → (n_a, n_b, theta, t_raw, t_cuped). The standard
    trick that shrinks experiment runtimes: same expected lift,
    provably lower variance, so |t_cuped| >= |t_raw| when the
    pre-period predicts the metric.

    Determinism: theta/x-bar from exact int64/decimal moments; each
    user's adjustment is ONE identically-bracketed double, quantized
    to int64 (2^10 per cent — an exact power-of-2 scale) BEFORE the
    arm sums; squared sums widen through DECIMAL(19,0)x(19,0)
    products so no count ever overflows. Shape: one user aggregate,
    one 1-row moment pass broadcast back, one arm aggregate — three
    map-side-combined shuffles on tiny relations after the scan."""
    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    cutoff = F.lit(_CUPED_CUTOFF).cast("timestamp")
    is_p = F.col("event_type") == "purchase"
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(is_p & (F.col("ts") < cutoff), cents).otherwise(0)
        )
        .cast("bigint")
        .alias("x"),
        F.sum(
            F.when(is_p & (F.col("ts") >= cutoff), cents).otherwise(0)
        )
        .cast("bigint")
        .alias("y"),
    ).withColumn("grp", F.col("user_id") % 2)
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    g = u.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(dec("x") * dec("x")).cast("double").alias("sxx"),
        F.sum(dec("x") * dec("y")).cast("double").alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    th = g.select(
        "n",
        (
            (d("n") * F.col("sxy") - d("sx") * d("sy"))
            / (d("n") * F.col("sxx") - d("sx") * d("sx"))
        ).alias("theta"),
        (d("sx") / d("n")).alias("xbar"),
    )
    adj = u.crossJoin(F.broadcast(th)).select(
        "grp",
        "y",
        F.floor(
            (d("y") - F.col("theta") * (d("x") - F.col("xbar")))
            * F.lit(float(_CUPED_Q))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("q"),
    )
    arms = adj.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(dec("y") * dec("y")).cast("double").alias("syy"),
        F.sum("q").cast("bigint").alias("sq"),
        F.sum(dec("q") * dec("q")).cast("double").alias("sqq"),
    )
    pick = lambda grp, c: F.max(  # noqa: E731
        F.when(F.col("grp") == grp, F.col(c))
    )
    w = arms.agg(
        pick(0, "n").alias("n_a"),
        pick(1, "n").alias("n_b"),
        pick(0, "sy").alias("sy_a"),
        pick(1, "sy").alias("sy_b"),
        pick(0, "syy").alias("syy_a"),
        pick(1, "syy").alias("syy_b"),
        pick(0, "sq").alias("sq_a"),
        pick(1, "sq").alias("sq_b"),
        pick(0, "sqq").alias("sqq_a"),
        pick(1, "sqq").alias("sqq_b"),
    )

    def welch(s_a, s_b, ss_a, ss_b):
        ma = d(s_a) / d("n_a")
        mb = d(s_b) / d("n_b")
        va_n = (
            (F.col(ss_a) - d(s_a) * d(s_a) / d("n_a"))
            / (F.col("n_a") - 1).cast("double")
            / d("n_a")
        )
        vb_n = (
            (F.col(ss_b) - d(s_b) * d(s_b) / d("n_b"))
            / (F.col("n_b") - 1).cast("double")
            / d("n_b")
        )
        return (ma - mb) / F.sqrt(va_n + vb_n)

    return w.crossJoin(F.broadcast(th.select("theta"))).select(
        "n_a",
        "n_b",
        "theta",
        welch("sy_a", "sy_b", "syy_a", "syy_b").alias("t_raw"),
        welch("sq_a", "sq_b", "sqq_a", "sqq_b").alias("t_cuped"),
    )


# -- Deterministic random walks ---------------------------------------------
# node2vec-style walk-corpus generation (Grover & Leskovec KDD'16,
# uniform p=q=1 case) with md5-derived neighbor choice: at node v,
# step k, follow the neighbor whose dense rank equals
# H(v, k) mod degree(v). Deterministic -> the walk corpus itself is
# hash-checkable, unlike RNG-based samplers.

_WALK_LEN = 4
_WALK_STARTS = 20


def _walks_prelude() -> str:
    """The shared CTE chain (edges -> ranked adjacency -> starts ->
    unrolled hops) used by graph_random_walks and the skip-gram
    derivation."""
    steps = []
    for k in range(1, _WALK_LEN + 1):
        prev = "w0" if k == 1 else f"w{k-1}"
        steps.append(
            f"""w{k} AS MATERIALIZED (
    SELECT {prev}.start, r.dst AS cur
    FROM {prev} JOIN ranked r
      ON r.src = {prev}.cur
     AND r.rnk = ('0x' || substr(md5(CAST({prev}.cur AS VARCHAR)
                                      || '#{k}'), 1, 8))::BIGINT % r.deg
)"""
        )
    return (
        """
WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pw AS (
    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM basket a JOIN basket b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    GROUP BY 1, 2
),
ranked AS MATERIALIZED (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS rnk,
           COUNT(*) OVER (PARTITION BY src) AS deg
    FROM pw
),
starts AS MATERIALIZED (
    SELECT src AS start
    FROM (SELECT DISTINCT src, deg FROM ranked)
    ORDER BY deg DESC, src LIMIT """
        + str(_WALK_STARTS)
        + """
),
w0 AS (SELECT start, start AS cur FROM starts),
"""
        + ",\n".join(steps)
    )


def _walks_select() -> str:
    sel = ["SELECT start, CAST(0 AS BIGINT) AS step, start AS node"
           " FROM starts"]
    for k in range(1, _WALK_LEN + 1):
        sel.append(
            f"SELECT start, CAST({k} AS BIGINT) AS step, cur AS node"
            f" FROM w{k}"
        )
    return "\nUNION ALL ".join(sel)


@query("graph_random_walks", _walks_prelude() + "\n" + _walks_select())
def q_graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform random walks over the stored co-purchase
    edge index: length-4 walks from the 20 highest-degree parts, next
    hop = neighbor at dense rank H(node, step) mod degree →
    (start, step, node). The walk-corpus generator behind
    DeepWalk/node2vec graph embeddings, made md5-deterministic so the
    sampled corpus itself hash-checks (an RNG sampler can only be
    rows-checked).

    Shape: neighbor ranking is ONE src-partitioned window over the
    stored edge index; each hop is a BROADCAST of the tiny frontier
    (≤ |starts| rows) onto the ranked relation — 4 broadcast joins,
    the edge set never re-shuffles, and walk count scales the
    frontier, never the edge side. At 100 TB the ranked index is the
    write-once artifact and hops stay frontier-broadcast joins."""
    from pyspark.sql import Window

    from ..scratch import stored_index
    from .queries_analytics import _copurchase_edge_index

    def build() -> DataFrame:
        e = _copurchase_edge_index(spark, sf_dir).select("src", "dst")
        wr = Window.partitionBy("src").orderBy("dst")
        wp = Window.partitionBy("src")
        return e.select(
            "src",
            "dst",
            (F.row_number().over(wr) - 1).alias("rnk"),
            F.count("*").over(wp).alias("deg"),
        )

    # the ranked adjacency is itself a write-once artifact: without
    # it, every hop join re-runs the src window over the full edge
    # relation (measured 4.1 s warm at sf0.1; 0.7 s from the index)
    ranked = stored_index(
        spark,
        sf_dir,
        "lineitem",
        "walk_ranked_adjacency",
        "ranked.parquet",
        build,
    )
    # r15 (guide §2.4): pin the tiny frontier (≤ _WALK_STARTS rows)
    # after the starts pick and after EVERY hop. Without the cuts,
    # part k's plan embeds hops 1..k AND the starts sort — the
    # _WALK_LEN+1-way union re-executed each hop O(len²/2) times and
    # re-scanned the ranked index ~15× per walk relation (60× in the
    # skip-gram self-join; plans/r15/graph_random_walks_before.txt).
    # localCheckpoint of a ≤20-row frontier costs one sub-100ms job
    # per hop and makes every hop execute exactly once at any scale.
    starts = (
        ranked.select("src", "deg")
        .distinct()
        .orderBy(F.desc("deg"), F.asc("src"))
        .limit(_WALK_STARTS)
        .select(F.col("src").alias("start"))
        .localCheckpoint(eager=False)
    )
    parts = [
        starts.select(
            "start",
            F.lit(0).cast("bigint").alias("step"),
            F.col("start").alias("node"),
        )
    ]
    cur = starts.select("start", F.col("start").alias("cur"))
    for k in range(1, _WALK_LEN + 1):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.col("cur").cast("string"), F.lit(f"#{k}"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        step = (
            ranked.join(F.broadcast(cur), ranked["src"] == cur["cur"])
            .filter(F.col("rnk") == h % F.col("deg"))
            .select("start", F.col("dst").alias("cur"))
            # lazy (r15 advisory): cuts lineage identically while
            # deferring execution to the first action, so EXPLAIN-only
            # callers don't run per-hop jobs at construction time
            .localCheckpoint(eager=False)  # ≤ |starts| rows
        )
        parts.append(
            step.select(
                "start",
                F.lit(k).cast("bigint").alias("step"),
                F.col("cur").alias("node"),
            )
        )
        cur = step
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# -- Deterministic bootstrap CI ---------------------------------------------
# Poisson bootstrap (Chamandy et al., Google 2012) made hash-exact:
# resample weights are Binomial(4, 1/4) read off four 2-bit fields of
# ONE md5 per (row, replicate) — E[w] = 1 like Poisson(1), no RNG, so
# the whole CI is value-hash-checkable. Per-replicate sums are exact
# int64; the only doubles are 100 independent divisions and two
# order-statistic picks (no float summation anywhere).

_BOOT_B = 100

_BOOT_CI_ORACLE = f"""
WITH m AS (
    SELECT event_id,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
    FROM events WHERE event_type = 'purchase'
),
x AS (
    SELECT b,
           ('0x' || substr(md5(CAST(event_id AS VARCHAR) || '#'
                               || CAST(b AS VARCHAR)), 1, 8)
           )::BIGINT AS h,
           c
    FROM m, unnest(range({_BOOT_B})) AS t(b)
),
w AS (
    SELECT b, c,
           CAST((h >> 0) & 3 = 0 AS BIGINT)
           + CAST((h >> 2) & 3 = 0 AS BIGINT)
           + CAST((h >> 4) & 3 = 0 AS BIGINT)
           + CAST((h >> 6) & 3 = 0 AS BIGINT) AS wt
    FROM x
),
rep AS (
    SELECT b, CAST(SUM(wt * c) AS BIGINT) AS swc,
           CAST(SUM(wt) AS BIGINT) AS sw
    FROM w GROUP BY 1
),
means AS (
    SELECT CAST(swc AS DOUBLE) / CAST(sw AS DOUBLE) / 100e0 AS mb,
           row_number() OVER (
               ORDER BY CAST(swc AS DOUBLE) / CAST(sw AS DOUBLE)) AS rn
    FROM rep
),
pt AS (
    SELECT CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100e0
               AS mean_value
    FROM m
)
SELECT pt.mean_value,
       (SELECT mb FROM means WHERE rn = 3) AS ci_lo,
       (SELECT mb FROM means WHERE rn = 98) AS ci_hi
FROM pt
"""


@query("agg_bootstrap_ci_mean", _BOOT_CI_ORACLE)
def q_agg_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson-bootstrap 95% CI for mean purchase value
    → (mean_value, ci_lo, ci_hi). Error bars with NO distributional
    assumption — the Welch/CUPED family's normal-theory complement —
    and, because resample weights are Binomial(4, 1/4) read off four
    2-bit fields of one md5 per (row, replicate), the whole interval
    is hash-exact where an RNG bootstrap couldn't even be
    row-checked. CI bounds are nearest-rank order statistics of the
    100 replicate means (picks, not float sums).

    Shape: ONE pass over the fact — each row fans out to B=100
    (replicate, weight) terms that partial-aggregate map-side into
    exactly B groups, so the shuffle carries ≤ B rows per partition
    at ANY scale; the B-row replicate relation sorts in one tiny
    task. Bootstrap's honest cost is the B× compute in the fan-out
    stage, all inside whole-stage codegen."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("c"),
    )
    x = m.select(
        "c",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        F.col("event_id"),
    ).select(
        "b",
        "c",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("event_id").cast("string"),
                        F.lit("#"),
                        F.col("b").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    )
    wt = sum(
        (F.shiftright(F.col("h"), 2 * j).bitwiseAND(3) == 0).cast(
            "bigint"
        )
        for j in range(4)
    )
    rep = (
        x.select("b", "c", wt.alias("wt"))
        .groupBy("b")
        .agg(
            F.sum(F.col("wt") * F.col("c")).cast("bigint").alias("swc"),
            F.sum("wt").cast("bigint").alias("sw"),
        )
    )
    from pyspark.sql import Window

    mb = F.col("swc").cast("double") / F.col("sw").cast("double")
    means = rep.select(
        (mb / F.lit(100.0)).alias("mb"),
        F.row_number().over(Window.orderBy(mb)).alias("rn"),
    )
    pt = m.agg(
        (
            F.sum("c").cast("double")
            / F.count("*").cast("double")
            / F.lit(100.0)
        ).alias("mean_value")
    )
    lo = means.filter(F.col("rn") == 3).select(
        F.col("mb").alias("ci_lo")
    )
    hi = means.filter(F.col("rn") == 98).select(
        F.col("mb").alias("ci_hi")
    )
    return pt.crossJoin(F.broadcast(lo)).crossJoin(F.broadcast(hi))


# -- BM25 retrieval ----------------------------------------------------------
# The sparse-retrieval complement of the dense ANN family (Robertson &
# Zaragoza '09): query-by-example BM25 over the corpus inverted index,
# k1=1.2, b=0.75. Per-(doc, term) scores quantize to int64 micro-bits
# BEFORE the per-doc sum (the repo's order-free float contract), so
# the ranking hash-checks.

_BM25_CTES = r"""
toks AS (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
    FROM documents
),
tf AS (
    SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks GROUP BY 1, 2
),
dl AS (
    SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS len FROM tf GROUP BY 1
),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(len) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS avglen
    FROM dl
),
df AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
q AS (
    SELECT DISTINCT w FROM toks
    WHERE doc_id = (SELECT MIN(doc_id) FROM documents)
),
scored AS (
    SELECT tf.doc_id,
           CAST(floor(
               log2((CAST(n - df.df AS DOUBLE) + 0.5e0)
                    / (CAST(df.df AS DOUBLE) + 0.5e0) + 1e0)
               * (CAST(tf.tf AS DOUBLE) * 2.2e0)
               / (CAST(tf.tf AS DOUBLE)
                  + 1.2e0 * (0.25e0 + 0.75e0 * CAST(dl.len AS DOUBLE)
                                      / avglen))
               * 1000000.0 + 0.5) AS BIGINT) AS s
    FROM tf
    JOIN q ON q.w = tf.w
    JOIN df ON df.w = tf.w
    JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats
)
"""

_BM25_ORACLE = f"""
WITH {_BM25_CTES}
SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score_ubits
FROM scored GROUP BY 1
ORDER BY score_ubits DESC, doc_id LIMIT 10
"""


@query("text_bm25_search", _BM25_ORACLE)
def q_text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 query-by-example retrieval: the min-doc_id document's
    terms score the whole corpus through the inverted index (k1=1.2,
    b=0.75, BM25+ idf), top-10 → (doc_id, score_ubits). The SPARSE
    retrieval primitive the dense family (sim_topk*, IVF, PQ) needs
    beside it — lexical recall catches what embedding recall misses,
    and hybrid search is just a score join of the two.

    Determinism: per-(doc, term) BM25 terms are identically-bracketed
    doubles over exact counts, quantized to int64 micro-bits BEFORE
    the per-doc sum; ranking on the exact int. Shape: tf/df/length
    relations are map-side-combined token shuffles (the inverted
    index); the query-term relation is tiny and broadcast; corpus
    never sees a cross join; final cut is TakeOrderedAndProject. At
    100 TB tf/df/dl are the write-once index artifacts and a query
    touches only its terms' postings."""
    return _bm25_scored(spark, sf_dir).orderBy(
        F.desc("score_ubits"), F.asc("doc_id")
    ).limit(10)


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BM25 score relation (doc_id, score_ubits) for the
    min-doc_id query — shared by text_bm25_search (top-10 cut) and
    search_hybrid_rrf (rank fusion)."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(TX.tokens("text")).alias("w"))
    # r15 (guide §2.4): tf — the inverted index — feeds FOUR consumers
    # (dl, stats via dl, df, scored) plus the query-term pick below.
    # Unpinned, each consumer's plan embeds its own tokenize + count
    # subtree with branch-specific column pruning, so runtime exchange
    # reuse cannot collapse them and the corpus was tokenized 5× (16
    # document scans in plans/r15/text_bm25_search_before.txt). Pinning
    # tf makes the corpus pass execute exactly once; everything
    # downstream reads the materialized (doc_id, w, tf) relation — at
    # 100 TB this is ONE corpus pass instead of five.
    tf = (
        toks.groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint()
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("len"))
    stats = dl.agg(
        F.count("*").alias("n"),
        (F.sum("len").cast("double") / F.count("*").cast("double")).alias(
            "avglen"
        ),
    )
    df = tf.groupBy("w").agg(F.count("*").alias("df"))
    qmin = docs.agg(F.min("doc_id").alias("qid"))
    # query terms from the pinned tf, not a fresh tokenize: tf rows
    # are distinct per (doc_id, w) by construction, so selecting the
    # min-doc's w IS the old toks.distinct() term set.
    q = (
        tf.join(F.broadcast(qmin), tf["doc_id"] == F.col("qid"))
        .select("w")
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    term = F.floor(
        F.log2(
            ((F.col("n") - F.col("df")).cast("double") + F.lit(0.5))
            / (d("df") + F.lit(0.5))
            + F.lit(1.0)
        )
        * (d("tf") * F.lit(2.2))
        / (
            d("tf")
            + F.lit(1.2)
            * (F.lit(0.25) + F.lit(0.75) * d("len") / F.col("avglen"))
        )
        * F.lit(1_000_000.0)
        + F.lit(0.5)
    ).cast("bigint")
    scored = (
        tf.join(F.broadcast(q), "w")
        .join(F.broadcast(df.join(F.broadcast(q), "w")), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", term.alias("s"))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("s").cast("bigint").alias("score_ubits")
    )


# -- Hybrid retrieval (RRF) --------------------------------------------------
# Reciprocal Rank Fusion (Cormack et al. SIGIR'09): fuse the BM25
# lexical top-10 and the dense cosine top-10 for the SAME query
# (doc_id 0 / its embedding vec_id 0 — embeddings.vec_id is the
# embedding of documents.doc_id in this lake layout) by
# score = sum 1/(60 + rank). Both input rankings are exact, and the
# fusion is a fixed-order two-term double sum, so the hybrid ranking
# hash-checks end-to-end.

_RRF_K = 60

_HYBRID_ORACLE = f"""
WITH {{bm25}},
lex AS (
    SELECT doc_id, row_number() OVER (
        ORDER BY score_ubits DESC, doc_id) AS r_lex
    FROM (SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score_ubits
          FROM scored GROUP BY 1)
    QUALIFY r_lex <= 10
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
qv AS (SELECT v AS qv FROM e WHERE vec_id = 0),
dns AS (
    SELECT vec_id AS doc_id, row_number() OVER (
        ORDER BY round(
            list_reduce(list_transform(range(64), i -> v[i+1]*qv[i+1]),
                        (x,y) -> x+y)
            / (sqrt(list_reduce(list_transform(v, x -> x*x),
                                (x,y) -> x+y))
               * sqrt(list_reduce(list_transform(qv, x -> x*x),
                                  (x,y) -> x+y))), 6) DESC,
            vec_id) AS r_dense
    FROM e, qv
    QUALIFY r_dense <= 10
)
SELECT COALESCE(lex.doc_id, dns.doc_id) AS doc_id,
       CAST(lex.r_lex AS BIGINT) AS r_lex,
       CAST(dns.r_dense AS BIGINT) AS r_dense,
       COALESCE(1e0 / ({_RRF_K}e0 + CAST(lex.r_lex AS DOUBLE)), 0e0)
       + COALESCE(1e0 / ({_RRF_K}e0 + CAST(dns.r_dense AS DOUBLE)), 0e0)
           AS rrf_score
FROM lex FULL OUTER JOIN dns ON lex.doc_id = dns.doc_id
""".format(bm25=_BM25_CTES)


@query("search_hybrid_rrf", _HYBRID_ORACLE)
def q_search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by Reciprocal Rank Fusion: BM25 lexical
    top-10 ∪ dense cosine top-10 for the same query document, fused
    as Σ 1/(60+rank) → (doc_id, r_lex, r_dense, rrf_score). The
    production search stack in one query — lexical recall catches
    literal matches embeddings smear, dense recall catches
    paraphrase lexical misses, and RRF needs no score calibration
    between the two.

    Shape: both arms are the already-proven retrieval shapes (BM25
    inverted-index join; one narrow corpus pass + rank-limited cut);
    the fusion is a FULL OUTER join of two ≤10-row relations — free.
    Both arms' rankings are exact, and the fused score is a
    fixed-order two-term double sum, so the hybrid result
    hash-checks."""
    from pyspark.sql import Window

    lex = (
        _bm25_scored(spark, sf_dir)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("score_ubits"), F.asc("doc_id")))
            .alias("r_lex"),
        )
        .filter(F.col("r_lex") <= 10)
    )
    from ..operators import similarity

    emb = _emb(spark, sf_dir)
    vs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qv = vs.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    from ..functions import vectors as V

    dns = (
        vs.crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(V.cosine(F.col("v"), F.col("qv")), 6).alias("cos"),
        )
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("cos"), F.asc("doc_id")))
            .alias("r_dense"),
        )
        .filter(F.col("r_dense") <= 10)
    )
    k = float(_RRF_K)
    return (
        lex.join(dns, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.col("r_lex").cast("bigint").alias("r_lex"),
            F.col("r_dense").cast("bigint").alias("r_dense"),
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(k) + F.col("r_lex").cast("double")),
                    F.lit(0.0),
                )
                + F.coalesce(
                    F.lit(1.0)
                    / (F.lit(k) + F.col("r_dense").cast("double")),
                    F.lit(0.0),
                )
            ).alias("rrf_score"),
        )
    )


_SKIPGRAM_ORACLE = (
    _walks_prelude()
    + ",\nwalks AS (\n"
    + _walks_select()
    + """
)
SELECT a.node AS center, b.node AS context,
       CAST(COUNT(*) AS BIGINT) AS n
FROM walks a JOIN walks b
  ON a.start = b.start AND abs(a.step - b.step) BETWEEN 1 AND 2
GROUP BY 1, 2
"""
)


@query("graph_walk_skipgram_pairs", _SKIPGRAM_ORACLE)
def q_graph_walk_skipgram_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Skip-gram training pairs from the deterministic walk corpus
    (window = 2, both directions) → (center, context, n) — the final
    derivation of the DeepWalk/node2vec pipeline: stored edge index →
    ranked adjacency → walks → (center, context) co-occurrence
    counts, which is exactly what a word2vec-style embedding trainer
    consumes. Counts are exact and the walks deterministic, so the
    training corpus itself hash-checks.

    Shape: the walk relation is tiny (|starts|·(len+1) rows); the
    window join is a self-join on the walk id — bounded by
    |walks|·(2·window), never touching the edge relation again."""
    # r15 (guide §2.4): pin the ≤ |starts|·(len+1)-row walk relation
    # before the self-join — otherwise the whole hop chain (stored-
    # index scans + frontier broadcasts) is embedded twice in the
    # join's plan and built twice.
    walks = q_graph_random_walks(spark, sf_dir).localCheckpoint(
        eager=False  # lazy pin (r15 advisory): no construction-time job
    )
    a, b = walks.alias("a"), walks.alias("b")
    dist = F.abs(F.col("a.step") - F.col("b.step"))
    return (
        a.join(
            b,
            (F.col("a.start") == F.col("b.start"))
            & (dist >= 1)
            & (dist <= 2),
        )
        .groupBy(
            F.col("a.node").alias("center"),
            F.col("b.node").alias("context"),
        )
        .agg(F.count("*").cast("bigint").alias("n"))
    )


# -- Distribution drift: PSI + KS -------------------------------------------
# The model-monitoring pair: Population Stability Index over fixed $20
# bins (the scorecard-industry drift alarm) and the two-sample
# Kolmogorov-Smirnov statistic (assumption-free CDF distance). Split =
# first vs second half of the month. KS is computed ENTIRELY in
# integers — D = max |c1·n2 − c2·n1| / (n1·n2) — so the supremum pick
# is exact; PSI terms quantize to µnats before the sum.

_DRIFT_CUTOFF = "2024-01-16"

_PSI_ORACLE = f"""
WITH m AS (
    SELECT CASE WHEN ts < TIMESTAMP '{_DRIFT_CUTOFF}' THEN 0 ELSE 1
           END AS half,
           CAST(floor(CAST(value AS DECIMAL(18,2)) / 20) AS BIGINT)
               AS bin
    FROM events WHERE event_type = 'purchase'
),
c AS (
    SELECT bin,
           CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS c1,
           CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS c2
    FROM m GROUP BY 1
),
n AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
             CAST(SUM(c2) AS BIGINT) AS n2 FROM c),
t AS (
    SELECT bin, c1, c2,
           CAST(floor(
               (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                - CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))
               * ln((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
                    / (CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE)))
               * 1000000.0 + 0.5) AS BIGINT) AS psi_ubits
    FROM c, n WHERE c1 > 0 AND c2 > 0
)
SELECT bin, c1, c2, psi_ubits FROM t
"""


@query("events_psi_value_drift", _PSI_ORACLE)
def q_events_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of purchase value between the two
    halves of the month, fixed $20 bins → (bin, c1, c2, psi_ubits).
    The scorecard-industry drift alarm (PSI > 0.1: investigate;
    > 0.25: retrain) as per-bin contributions — Σ psi_ubits / 10^6
    is the headline index, and the per-bin split says WHERE the
    distribution moved. Bins empty on either side are excluded (the
    standard convention; they'd send the log term to ±inf).

    Determinism: counts exact; each bin's (p−q)·ln(p/q) term is one
    identically-bracketed double quantized to int64 µnats. Shape:
    one filtered scan → map-side-combined bin counts → 1-row totals
    broadcast back; |bins| is value-range-bounded regardless of row
    count."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("ts") < F.lit(_DRIFT_CUTOFF).cast("timestamp"), 0
        )
        .otherwise(1)
        .alias("half"),
        F.floor(F.col("value").cast("decimal(18,2)") / 20)
        .cast("bigint")
        .alias("bin"),
    )
    c = m.groupBy("bin").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("c2"),
    )
    n = c.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    d = lambda x: F.col(x).cast("double")  # noqa: E731
    p = d("c1") / d("n1")
    q = d("c2") / d("n2")
    return (
        c.crossJoin(F.broadcast(n))
        .filter((F.col("c1") > 0) & (F.col("c2") > 0))
        .select(
            "bin",
            "c1",
            "c2",
            F.floor((p - q) * F.log(p / q) * F.lit(1_000_000.0) + F.lit(0.5))
            .cast("bigint")
            .alias("psi_ubits"),
        )
    )


_KS_ORACLE = f"""
WITH m AS (
    SELECT CASE WHEN ts < TIMESTAMP '{_DRIFT_CUTOFF}' THEN 0 ELSE 1
           END AS half,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
    FROM events WHERE event_type = 'purchase'
),
v AS (
    SELECT c,
           CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS d1,
           CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS d2
    FROM m GROUP BY 1
),
n AS (SELECT CAST(SUM(d1) AS BIGINT) AS n1,
             CAST(SUM(d2) AS BIGINT) AS n2 FROM v),
cum AS (
    SELECT c,
           SUM(d1) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS f1,
           SUM(d2) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS f2
    FROM v
),
gap AS (
    SELECT c, abs(f1 * n2 - f2 * n1) AS g, n1, n2 FROM cum, n
)
SELECT n1, n2,
       CAST(MAX(g) AS BIGINT) AS ks_num,
       CAST(MAX(g) AS DOUBLE)
           / (CAST(MAX(n1) AS DOUBLE) * CAST(MAX(n2) AS DOUBLE))
           AS ks_d
FROM gap GROUP BY n1, n2
"""


@query("events_ks_two_sample", _KS_ORACLE)
def q_events_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the month's
    two halves of purchase value → (n1, n2, ks_num, ks_d). The
    assumption-free CDF-distance complement of PSI (binned) and
    Welch (means): D = sup |F1 − F2|, computed ENTIRELY in integers
    as max |F1·n2 − F2·n1| over distinct cent values — the supremum
    is an exact integer pick, with ONE double division at the end.

    Shape: map-side-combined per-value counts (state = distinct cent
    values, value-range-bounded), running sums over that bounded
    relation, one max aggregate. The distinct-value pre-agg is what
    makes a CDF supremum scale-safe — the windows never see raw
    rows."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    m = ev.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("ts") < F.lit(_DRIFT_CUTOFF).cast("timestamp"), 0
        )
        .otherwise(1)
        .alias("half"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("c"),
    )
    v = m.groupBy("c").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("d1"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("d2"),
    )
    n = v.agg(
        F.sum("d1").cast("bigint").alias("n1"),
        F.sum("d2").cast("bigint").alias("n2"),
    )
    w = Window.orderBy("c").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = v.select(
        "c",
        F.sum("d1").over(w).alias("f1"),
        F.sum("d2").over(w).alias("f2"),
    )
    gap = cum.crossJoin(F.broadcast(n)).select(
        F.abs(
            F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")
        ).alias("g"),
        "n1",
        "n2",
    )
    return gap.groupBy("n1", "n2").agg(
        F.max("g").cast("bigint").alias("ks_num"),
        (
            F.max("g").cast("double")
            / (F.max("n1").cast("double") * F.max("n2").cast("double"))
        ).alias("ks_d"),
    )


# -- Mann-Whitney U ----------------------------------------------------------
# The rank-based two-sample test completing the stats suite (Welch:
# means under normality; KS: CDF distance; bootstrap: resampling).
# Doubled tie-averaged rank sums are EXACT integers: a value with d1/d2
# occurrences and cum_before predecessors contributes
# d1·(2·cum_before + d1 + d2 + 1) to 2·R1 — so U is exact in halves,
# and only the tie-corrected normal approximation is floating point.

_MWU_ORACLE = f"""
WITH m AS (
    SELECT user_id % 2 AS grp,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
    FROM events WHERE event_type = 'purchase'
),
v AS (
    SELECT c,
           CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS d1,
           CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS d2
    FROM m GROUP BY 1
),
cum AS (
    SELECT c, d1, d2,
           COALESCE(SUM(d1 + d2) OVER (ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cb
    FROM v
),
agg AS (
    SELECT CAST(SUM(d1) AS BIGINT) AS n1,
           CAST(SUM(d2) AS BIGINT) AS n2,
           CAST(SUM(d1 * (2 * cb + d1 + d2 + 1)) AS BIGINT) AS r1x2,
           CAST(SUM((d1 + d2) * (d1 + d2) * (d1 + d2) - (d1 + d2))
                AS BIGINT) AS tie3
    FROM cum
),
fin AS (
    SELECT n1, n2,
           CAST(2 * n1 * n2 + n1 * (n1 + 1) - r1x2 AS BIGINT) AS u_x2,
           CAST(n1 * n2 AS DOUBLE) / 12e0
           * (CAST(n1 + n2 + 1 AS DOUBLE)
              - CAST(tie3 AS DOUBLE)
                / (CAST(n1 + n2 AS DOUBLE)
                   * CAST(n1 + n2 - 1 AS DOUBLE))) AS vr
    FROM agg
)
SELECT n1, n2, u_x2,
       CASE WHEN vr > 0e0 THEN
           (CAST(u_x2 AS DOUBLE) / 2e0 - CAST(n1 * n2 AS DOUBLE) / 2e0)
           / sqrt(vr)
       ELSE NULL END AS z_stat
FROM fin
"""


@query("events_mann_whitney_u", _MWU_ORACLE)
def q_events_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U between the two deterministic cohorts of
    purchase value → (n1, n2, u_x2, z_stat). The nonparametric member
    of the testing suite — rank-based, so outliers and skew can't
    fake or mask a shift the way they can in a means test; u_x2 is
    the EXACT doubled U (tie-averaged ranks are half-integers), and
    only the tie-corrected normal z is floating point.

    Shape: per-cent-value counts (map-side combined, value-range-
    bounded), one running sum over that bounded relation, one moment
    aggregate — the same distinct-value pre-agg discipline as the KS
    statistic, and why a rank test scales at all (raw ranks would
    need a global sort; tie-grouped ranks need |distinct values|)."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    m = ev.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 2).alias("grp"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("c"),
    )
    v = m.groupBy("c").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("d1"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("d2"),
    )
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    cum = v.select(
        "d1",
        "d2",
        F.coalesce(
            F.sum(F.col("d1") + F.col("d2")).over(w), F.lit(0)
        ).alias("cb"),
    )
    t = F.col("d1") + F.col("d2")
    agg = cum.agg(
        F.sum("d1").cast("bigint").alias("n1"),
        F.sum("d2").cast("bigint").alias("n2"),
        F.sum(
            F.col("d1") * (2 * F.col("cb") + F.col("d1") + F.col("d2") + 1)
        )
        .cast("bigint")
        .alias("r1x2"),
        F.sum(t * t * t - t).cast("bigint").alias("tie3"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    ux2 = (
        2 * F.col("n1") * F.col("n2")
        + F.col("n1") * (F.col("n1") + 1)
        - F.col("r1x2")
    )
    # Degenerate guard: if every purchase value ties into one group
    # (or one cohort is empty) the tie-corrected variance is exactly
    # 0 and z would divide by zero — Spark and DuckDB disagree on
    # what that yields (NaN/NULL/error), so both sides emit NULL.
    vr = (
        (F.col("n1") * F.col("n2")).cast("double")
        / F.lit(12.0)
        * (
            (F.col("n1") + F.col("n2") + 1).cast("double")
            - d("tie3")
            / (
                (F.col("n1") + F.col("n2")).cast("double")
                * (F.col("n1") + F.col("n2") - 1).cast("double")
            )
        )
    )
    z = (
        ux2.cast("double") / F.lit(2.0)
        - (F.col("n1") * F.col("n2")).cast("double") / F.lit(2.0)
    ) / F.sqrt(vr)
    return agg.select(
        "n1",
        "n2",
        ux2.cast("bigint").alias("u_x2"),
        F.when(vr > 0, z)
        .otherwise(F.lit(None).cast("double"))
        .alias("z_stat"),
    )


# -- Chi-square independence ------------------------------------------------
# The categorical member of the shift-test suite (PSI: binned numeric;
# KS/MWU: continuous; this: is the event-type MIX independent of the
# cohort). (o-e)^2/e terms quantize to micro-units before the sum.

_CHI2_ORACLE = """
WITH m AS (
    SELECT user_id % 2 AS grp, event_type FROM events
),
c AS (
    SELECT grp, event_type, CAST(COUNT(*) AS BIGINT) AS o
    FROM m GROUP BY 1, 2
),
rt AS (SELECT grp, CAST(SUM(o) AS BIGINT) AS nr FROM c GROUP BY 1),
ct AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS nc FROM c GROUP BY 1),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM c),
t AS (
    SELECT c.grp, c.event_type, o,
           CAST(floor(
               (CAST(o AS DOUBLE)
                - CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE)
                  / CAST(n AS DOUBLE))
               * (CAST(o AS DOUBLE)
                  - CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE)
                    / CAST(n AS DOUBLE))
               / (CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE)
                  / CAST(n AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT) AS chi2_u
    FROM c JOIN rt USING (grp) JOIN ct USING (event_type)
    CROSS JOIN tot
)
SELECT grp, event_type, o, chi2_u FROM t
"""


@query("events_chi2_independence", _CHI2_ORACLE)
def q_events_chi2_independence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Chi-square test of independence between cohort and event-type
    mix → one row per cell (grp, event_type, o, chi2_u); the
    statistic is Σ chi2_u / 10^6 with df = (R−1)(C−1), and the
    per-cell terms localize WHICH behavior diverged. The categorical
    member of the shift suite (PSI: binned numeric; KS/MWU:
    continuous ranks; Welch/CUPED: means).

    Determinism: observed/marginal counts exact; each cell's
    (o−e)²/e is one identically-bracketed double quantized to int64
    micro-units. Shape: one map-side-combined cell count (R·C cells,
    cardinality-bounded), marginals derived FROM the cell relation
    (no second scan), broadcast joins of tiny marginal relations."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        (F.col("user_id") % 2).alias("grp"), "event_type"
    ).groupBy("grp", "event_type").agg(
        F.count("*").cast("bigint").alias("o")
    )
    rt = c.groupBy("grp").agg(F.sum("o").cast("bigint").alias("nr"))
    ct = c.groupBy("event_type").agg(
        F.sum("o").cast("bigint").alias("nc")
    )
    tot = c.agg(F.sum("o").cast("bigint").alias("n"))
    d = lambda x: F.col(x).cast("double")  # noqa: E731
    e = d("nr") * d("nc") / d("n")
    return (
        c.join(F.broadcast(rt), "grp")
        .join(F.broadcast(ct), "event_type")
        .crossJoin(F.broadcast(tot))
        .select(
            "grp",
            "event_type",
            "o",
            F.floor(
                (d("o") - e) * (d("o") - e) / e * F.lit(1_000_000.0)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("chi2_u"),
        )
    )


# -- Difference-in-differences ----------------------------------------------
# The causal-inference staple: effect = (treat_post − treat_pre) −
# (ctrl_post − ctrl_pre), the parallel-trends estimate that survives
# level differences between cohorts AND common time shocks. Four-cell
# moment aggregate, exact int64 cent sums, one identically-bracketed
# double expression for the estimate and its pooled SE.

_DID_ORACLE = f"""
WITH m AS (
    SELECT user_id % 2 AS grp,
           CASE WHEN ts < TIMESTAMP '{_CUPED_CUTOFF}' THEN 0 ELSE 1
           END AS post,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
    FROM events WHERE event_type = 'purchase'
),
s AS (
    SELECT grp, post, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(c) AS BIGINT) AS sx,
           CAST(SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
                AS DOUBLE) AS sq
    FROM m GROUP BY 1, 2
),
w AS (
    SELECT
        MAX(CASE WHEN grp = 1 AND post = 1 THEN CAST(sx AS DOUBLE)
                 / CAST(n AS DOUBLE) END) AS m_tp,
        MAX(CASE WHEN grp = 1 AND post = 0 THEN CAST(sx AS DOUBLE)
                 / CAST(n AS DOUBLE) END) AS m_t0,
        MAX(CASE WHEN grp = 0 AND post = 1 THEN CAST(sx AS DOUBLE)
                 / CAST(n AS DOUBLE) END) AS m_cp,
        MAX(CASE WHEN grp = 0 AND post = 0 THEN CAST(sx AS DOUBLE)
                 / CAST(n AS DOUBLE) END) AS m_c0,
        MAX(CASE WHEN grp = 1 AND post = 1 THEN
            (sq - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                  / CAST(n AS DOUBLE))
            / CAST(n - 1 AS DOUBLE) / CAST(n AS DOUBLE) END) AS v_tp,
        MAX(CASE WHEN grp = 1 AND post = 0 THEN
            (sq - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                  / CAST(n AS DOUBLE))
            / CAST(n - 1 AS DOUBLE) / CAST(n AS DOUBLE) END) AS v_t0,
        MAX(CASE WHEN grp = 0 AND post = 1 THEN
            (sq - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                  / CAST(n AS DOUBLE))
            / CAST(n - 1 AS DOUBLE) / CAST(n AS DOUBLE) END) AS v_cp,
        MAX(CASE WHEN grp = 0 AND post = 0 THEN
            (sq - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                  / CAST(n AS DOUBLE))
            / CAST(n - 1 AS DOUBLE) / CAST(n AS DOUBLE) END) AS v_c0
    FROM s
)
SELECT ((m_tp - m_t0) - (m_cp - m_c0)) / 100e0 AS did_effect,
       sqrt(v_tp + v_t0 + v_cp + v_c0) / 100e0 AS did_se,
       ((m_tp - m_t0) - (m_cp - m_c0))
           / sqrt(v_tp + v_t0 + v_cp + v_c0) AS did_t
FROM w
"""


@query("events_did_estimator", _DID_ORACLE)
def q_events_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences over the 2×2 (cohort × pre/post)
    design → (did_effect, did_se, did_t) in dollars. The
    causal-inference staple of the experiment family: immune to level
    differences between cohorts AND to common time shocks, under the
    parallel-trends assumption the pre-period exists to check.

    Determinism: four cells of exact moments (int64 cent sums,
    DECIMAL(19,0)²-widened squares); the estimate, its pooled SE, and
    the t ratio are one identically-bracketed double expression each
    (sqrt is correctly-rounded). Shape: ONE filtered scan →
    map-side-combined 4-group aggregate → a 4-row pivot — the
    cheapest possible causal readout at any scale."""
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit(_CUPED_CUTOFF).cast("timestamp")
    m = ev.filter(F.col("event_type") == "purchase").select(
        (F.col("user_id") % 2).alias("grp"),
        F.when(F.col("ts") < cutoff, 0).otherwise(1).alias("post"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("c"),
    )
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    s = m.groupBy("grp", "post").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("sx"),
        F.sum(dec("c") * dec("c")).cast("double").alias("sq"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mean = d("sx") / d("n")
    var_n = (
        (F.col("sq") - d("sx") * d("sx") / d("n"))
        / (F.col("n") - 1).cast("double")
        / d("n")
    )

    def cell(g, p, expr, alias):
        return F.max(
            F.when((F.col("grp") == g) & (F.col("post") == p), expr)
        ).alias(alias)

    w = s.agg(
        cell(1, 1, mean, "m_tp"),
        cell(1, 0, mean, "m_t0"),
        cell(0, 1, mean, "m_cp"),
        cell(0, 0, mean, "m_c0"),
        cell(1, 1, var_n, "v_tp"),
        cell(1, 0, var_n, "v_t0"),
        cell(0, 1, var_n, "v_cp"),
        cell(0, 0, var_n, "v_c0"),
    )
    eff = (F.col("m_tp") - F.col("m_t0")) - (
        F.col("m_cp") - F.col("m_c0")
    )
    se = F.sqrt(
        F.col("v_tp") + F.col("v_t0") + F.col("v_cp") + F.col("v_c0")
    )
    return w.select(
        (eff / F.lit(100.0)).alias("did_effect"),
        (se / F.lit(100.0)).alias("did_se"),
        (eff / se).alias("did_t"),
    )


# -- Holt backtest -----------------------------------------------------------
# Rolling-origin evaluation of the Holt forecaster: at every month t
# the PRIOR state's one-step forecast (l + b) is scored against the
# actual, THEN the state updates — the walk-forward discipline that
# measures a forecaster honestly (in-sample fit flatters). The error
# sum rides INSIDE the sequential fold, so it accumulates in the same
# order in both engines and the MAE is bit-identical.

_HOLT_BT_ORACLE = """
WITH RECURSIVE m AS MATERIALIZED (
    SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                AS BIGINT) AS mk,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DOUBLE) AS rev
    FROM orders GROUP BY 1
),
ordered AS MATERIALIZED (
    SELECT row_number() OVER (ORDER BY mk) AS rn, rev FROM m
),
fit(rn, l, b, s, k) AS (
    SELECT 1, rev, 0e0, 0e0, CAST(0 AS BIGINT)
    FROM ordered WHERE rn = 1
    UNION ALL
    SELECT o.rn,
           0.5e0 * o.rev + 0.5e0 * (f.l + f.b),
           0.25e0 * (0.5e0 * o.rev + 0.5e0 * (f.l + f.b) - f.l)
               + 0.75e0 * f.b,
           f.s + abs(o.rev - (f.l + f.b)),
           f.k + 1
    FROM fit f JOIN ordered o ON o.rn = f.rn + 1
)
SELECT k AS n_evals, s / CAST(k AS DOUBLE) AS mae
FROM fit WHERE rn = (SELECT MAX(rn) FROM ordered)
"""


@query("orders_holt_backtest", _HOLT_BT_ORACLE)
def q_orders_holt_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward backtest of the Holt forecaster
    (orders_revenue_holt_forecast's exact recurrence): every month is
    first predicted by the prior state's one-step forecast, then
    folded in → (n_evals, mae). The honest forecaster score —
    in-sample fit flatters; rolling-origin error is what a forecast
    consumer actually experiences.

    Determinism: the |error| sum accumulates INSIDE the sequential
    fold (same order both engines → bit-identical MAE, no
    quantization needed); same decimal-exact month aggregate, same
    tiny-array single-task fold shape as the forecast query."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("bigint")
        .alias("mk")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("rev")
    )
    xs = m.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("mk", "rev"))),
            lambda e: F.struct(
                e["rev"].alias("l"),
                F.lit(0.0).alias("b"),
                F.lit(0.0).alias("s"),
                F.lit(0).cast("bigint").alias("k"),
            ),
        ).alias("xs")
    )
    merge = lambda acc, e: F.struct(  # noqa: E731
        (
            F.lit(0.5) * e["l"] + F.lit(0.5) * (acc["l"] + acc["b"])
        ).alias("l"),
        (
            F.lit(0.25)
            * (
                F.lit(0.5) * e["l"]
                + F.lit(0.5) * (acc["l"] + acc["b"])
                - acc["l"]
            )
            + F.lit(0.75) * acc["b"]
        ).alias("b"),
        (acc["s"] + F.abs(e["l"] - (acc["l"] + acc["b"]))).alias("s"),
        (acc["k"] + 1).alias("k"),
    )
    fit = xs.select(
        F.aggregate(
            F.slice(F.col("xs"), 2, F.size("xs") - 1),
            F.element_at(F.col("xs"), 1),
            merge,
        ).alias("st")
    )
    return fit.select(
        F.col("st.k").alias("n_evals"),
        (F.col("st.s") / F.col("st.k").cast("double")).alias("mae"),
    )


# -- RAKE keyword extraction ------------------------------------------------
# Rapid Automatic Keyword Extraction (Rose et al. 2010): candidate
# phrases are maximal stopword-free token runs; word score =
# degree/frequency where degree sums the lengths of the phrases the
# word appears in (self included); phrase score = sum of member word
# scores. Word scores are exact integer ratios quantized by FLOOR
# integer division (both engines use floor-div on non-negative ints),
# so phrase sums are order-free int64 adds.

_RAKE_SCALE = 1_048_576
_RAKE_MAXLEN = 3
_RAKE_TOPK = 20

_RAKE_ORACLE = rf"""
WITH ts AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a
    FROM documents
),
tok AS (
    SELECT doc_id, i AS pos, a[i] AS tok
    FROM ts, unnest(range(1, len(a) + 1)) AS r(i)
),
seg AS (
    SELECT doc_id, pos, tok,
           tok IN ('the','a','and','of','to','in') AS is_stop,
           SUM(CASE WHEN tok IN ('the','a','and','of','to','in')
                    THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS seg
    FROM tok
),
ph AS (
    SELECT doc_id, seg,
           string_agg(tok, ' ' ORDER BY pos) AS phrase,
           COUNT(*) AS n_words
    FROM seg WHERE NOT is_stop
    GROUP BY 1, 2
    HAVING COUNT(*) BETWEEN 1 AND {_RAKE_MAXLEN}
),
pw AS (
    SELECT doc_id, seg, phrase, n_words,
           unnest(string_split(phrase, ' ')) AS w
    FROM ph
),
ws AS (
    SELECT w, COUNT(*) AS freq, SUM(n_words) AS deg
    FROM pw GROUP BY 1
),
wq AS (SELECT w, (deg * {_RAKE_SCALE}) // freq AS wq FROM ws),
inst AS (
    SELECT pw.doc_id, pw.seg, pw.phrase, pw.n_words,
           SUM(wq.wq) AS sq
    FROM pw JOIN wq ON pw.w = wq.w
    GROUP BY 1, 2, 3, 4
)
SELECT phrase, CAST(n_words AS BIGINT) AS n_words,
       CAST(COUNT(*) AS BIGINT) AS n_occur,
       CAST(sq AS DOUBLE) / {_RAKE_SCALE}.0 AS rake_score
FROM inst
GROUP BY phrase, n_words, sq
ORDER BY sq DESC, n_occur DESC, phrase
LIMIT {_RAKE_TOPK}
"""


@query("text_rake_keywords", _RAKE_ORACLE)
def q_text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction over the corpus: stopword-delimited
    candidate phrases (length <= 3), word score = degree/frequency,
    phrase score = sum of member word scores, global top-20 phrases.
    The classic unsupervised keyworder — in a curation stack it
    surfaces the corpus's dominant multi-word topics without an LM.

    Determinism: word scores are (deg*2^20) DIV freq — exact floor
    integer division on non-negative int64 in both engines — so every
    downstream sum is an order-free integer add; ONE double division
    at the end. Scale: one posexplode, token-key shuffles only
    (segment ids are a per-doc window over positions, partitioned by
    doc_id); the word-score relation is vocabulary-sized and the
    top-20 lands in TakeOrderedAndProject — nothing collects."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.posexplode(TX.tokens("text")).alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "tok")
    is_stop = F.col("tok").isin(*TX.STOPWORDS)
    w = Window.partitionBy("doc_id").orderBy("pos")
    seg = tok.select(
        "doc_id",
        "pos",
        "tok",
        is_stop.alias("is_stop"),
        F.sum(is_stop.cast("bigint")).over(w).alias("seg"),
    )
    ph = (
        seg.filter(~F.col("is_stop"))
        .groupBy("doc_id", "seg")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.count("*").alias("n_words"),
        )
        .filter(F.col("n_words").between(1, _RAKE_MAXLEN))
    )
    pw = ph.select(
        "doc_id",
        "seg",
        "phrase",
        "n_words",
        F.explode(F.split(F.col("phrase"), " ")).alias("w"),
    )
    ws = pw.groupBy("w").agg(
        F.count("*").alias("freq"), F.sum("n_words").alias("deg")
    )
    wq = ws.select(
        "w",
        F.expr(f"(deg * {_RAKE_SCALE}) div freq").alias("wq"),
    )
    inst = pw.join(wq, "w").groupBy(
        "doc_id", "seg", "phrase", "n_words"
    ).agg(F.sum("wq").alias("sq"))
    return (
        inst.groupBy("phrase", "n_words", "sq")
        .agg(F.count("*").cast("bigint").alias("n_occur"))
        .select(
            "phrase",
            F.col("n_words").cast("bigint").alias("n_words"),
            "n_occur",
            (F.col("sq").cast("double") / F.lit(float(_RAKE_SCALE)))
            .alias("rake_score"),
            "sq",
        )
        .orderBy(F.desc("sq"), F.desc("n_occur"), F.asc("phrase"))
        .limit(_RAKE_TOPK)
        .drop("sq")
    )


# -- Naive Bayes source classifier -----------------------------------------
# The trained-classifier member of the curation stack (fastText-style
# quality/domain classifiers in CCNet/RedPajama pipelines): multinomial
# NB over token counts, trained on the md5-free deterministic split
# doc_id % 5 <> 0, scored on the held-out fifth, reported as a
# source-level confusion matrix. All log-probabilities are add-one
# smoothed and int64-quantized before any aggregation.

# Shared CTE prelude: model training + per-(test doc, class) int64
# micro-bit scores. Consumed by the confusion-matrix oracle and the
# margin-calibration oracle below.
_NB_PRELUDE = r"""
WITH train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
test  AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
ttok AS (
    SELECT source,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
    FROM train
),
cnt AS (SELECT source, tok, COUNT(*) AS c FROM ttok GROUP BY 1, 2),
nsrc AS (SELECT source, SUM(c) AS n_src FROM cnt GROUP BY 1),
vocab AS (SELECT DISTINCT tok FROM ttok),
v AS (SELECT COUNT(*) AS v FROM vocab),
model AS (
    SELECT s.source, t.tok,
           CAST(floor(log2(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE)
                           / CAST(s.n_src + v.v AS DOUBLE))
                      * 1000000.0 + 0.5) AS BIGINT) AS lq
    FROM nsrc s CROSS JOIN vocab t CROSS JOIN v
    LEFT JOIN cnt c ON c.source = s.source AND c.tok = t.tok
),
lq0 AS (
    SELECT s.source,
           CAST(floor(log2(1.0 / CAST(s.n_src + v.v AS DOUBLE))
                      * 1000000.0 + 0.5) AS BIGINT) AS lq0
    FROM nsrc s CROSS JOIN v
),
prior AS (
    SELECT source,
           CAST(floor(log2(CAST(COUNT(*) AS DOUBLE)
                           / CAST((SELECT COUNT(*) FROM train) AS DOUBLE))
                      * 1000000.0 + 0.5) AS BIGINT) AS pq
    FROM train GROUP BY 1
),
dtok AS (
    SELECT doc_id, source AS true_source,
           unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
    FROM test
),
tf AS (
    SELECT doc_id, true_source, tok, COUNT(*) AS tf
    FROM dtok GROUP BY 1, 2, 3
),
score AS (
    SELECT tf.doc_id, tf.true_source, p.source,
           p.pq + SUM(tf.tf * COALESCE(m.lq, z.lq0)) AS sq
    FROM tf
    CROSS JOIN prior p
    JOIN lq0 z ON z.source = p.source
    LEFT JOIN model m ON m.source = p.source AND m.tok = tf.tok
    GROUP BY 1, 2, 3, p.pq
)"""

_NB_ORACLE = _NB_PRELUDE + r""",
pred AS (
    SELECT doc_id, true_source, source AS pred_source,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY sq DESC, source) AS rk
    FROM score
)
SELECT true_source, pred_source, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred WHERE rk = 1
GROUP BY 1, 2
"""


def _nb_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared Naive Bayes scoring relation: every held-out test doc
    scored against every source class. Returns (doc_id, true_source,
    source, sq) with sq the int64 micro-bit log-posterior. Used by
    the confusion-matrix query and the margin-calibration QA query —
    same model, same quantization, one implementation."""
    docs = _docs(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % 5 != 0)
    test = docs.filter(F.col("doc_id") % 5 == 0)

    ttok = train.select(
        "source", F.explode(TX.tokens("text")).alias("tok")
    )
    # r15 (guide §2.4): cnt — the (source, tok, c) NB model counts,
    # model-sized (≤ classes × vocab rows) — feeds nsrc, vocab, v and
    # the model join; unpinned, every consumer re-embedded its own
    # train tokenize subtree (18 documents scans in the margin-
    # calibration plan). Pin it once; vocab is derived from cnt
    # (distinct tok present in train — the identical set ttok's
    # distinct produced) so the train corpus is tokenized exactly
    # once at any scale.
    cnt = (
        ttok.groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    nsrc = cnt.groupBy("source").agg(F.sum("c").alias("n_src"))
    vocab = cnt.select("tok").distinct()
    v = vocab.agg(F.count("*").alias("v"))

    def q_log2(num, den):
        return (
            F.floor(F.log2(num / den) * F.lit(1e6) + F.lit(0.5))
            .cast("bigint")
        )

    model = (
        nsrc.crossJoin(F.broadcast(v))
        .crossJoin(vocab)
        .join(cnt, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            q_log2(
                (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double"),
                (F.col("n_src") + F.col("v")).cast("double"),
            ).alias("lq"),
        )
    )
    lq0 = nsrc.crossJoin(F.broadcast(v)).select(
        "source",
        q_log2(
            F.lit(1.0), (F.col("n_src") + F.col("v")).cast("double")
        ).alias("lq0"),
    )
    n_train = train.agg(F.count("*").alias("n_train"))
    prior = (
        train.groupBy("source")
        .agg(F.count("*").alias("nd"))
        .crossJoin(F.broadcast(n_train))
        .select(
            "source",
            q_log2(
                F.col("nd").cast("double"),
                F.col("n_train").cast("double"),
            ).alias("pq"),
        )
    )

    tf = (
        test.select(
            "doc_id",
            F.col("source").alias("true_source"),
            F.explode(TX.tokens("text")).alias("tok"),
        )
        .groupBy("doc_id", "true_source", "tok")
        .agg(F.count("*").alias("tf"))
    )
    return (
        tf.crossJoin(F.broadcast(prior))
        .join(F.broadcast(lq0), "source")
        .join(F.broadcast(model), ["source", "tok"], "left")
        .groupBy("doc_id", "true_source", "source", "pq")
        .agg(
            F.sum(
                F.col("tf") * F.coalesce(F.col("lq"), F.col("lq0"))
            ).alias("s1")
        )
        .select(
            "doc_id",
            "true_source",
            "source",
            (F.col("pq") + F.col("s1")).alias("sq"),
        )
    )


@query("docs_naive_bayes_source", _NB_ORACLE)
def q_docs_naive_bayes_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes source classifier, trained on 4/5 of
    the corpus (doc_id % 5 <> 0) and evaluated on the held-out fifth:
    add-one smoothed token log-likelihoods + class prior, argmax over
    sources, reported as the (true_source, pred_source, n_docs)
    confusion matrix. The shape of every fastText-style
    quality/domain classifier in a curation pipeline — train token
    stats, broadcast the model, score in one linear pass.

    Determinism: every log2 probability is quantized to int64
    micro-bits BEFORE aggregation (floor(log2(p)*1e6+0.5)); document
    scores are exact integer sums in any partition order; argmax ties
    break by source name. (On this signal-free synthetic corpus the
    matrix reads chance-level — exactly what a classifier-QA gate
    should report for it.) Scale: the model is vocab x classes — the
    standard NB model size, built with token-key shuffles and joined
    BROADCAST onto the test token stream; the test corpus never
    shuffles on anything but (doc, token); confusion output is
    classes^2 rows."""
    score = _nb_scores(spark, sf_dir)
    from pyspark.sql import Window

    wk = Window.partitionBy("doc_id").orderBy(
        F.desc("sq"), F.asc("source")
    )
    pred = score.select(
        "doc_id",
        "true_source",
        F.col("source").alias("pred_source"),
        F.row_number().over(wk).alias("rk"),
    ).filter(F.col("rk") == 1)
    return pred.groupBy("true_source", "pred_source").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )


# -- Theil-Sen robust trend -------------------------------------------------
# Median-of-pairwise-slopes regression (Theil 1950, Sen 1968) over the
# DAILY revenue series: the input to the pairwise stage is
# calendar-bounded (<= n_days rows at ANY corpus scale), so the
# all-pairs step is a deliberate, bounded exception to the no-all-pairs
# rule — n_days(n_days-1)/2 pairs of an already-aggregated relation.

_TS_ORACLE = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
    FROM orders GROUP BY 1
),
t0 AS (SELECT MIN(d) AS d0 FROM daily),
pts AS (
    SELECT datediff('day', t0.d0, daily.d) AS t,
           CAST(rev AS DOUBLE) AS y
    FROM daily, t0
),
pairs AS (
    SELECT (b.y - a.y) / CAST(b.t - a.t AS DOUBLE) AS slope,
           a.t AS t1, b.t AS t2
    FROM pts a JOIN pts b ON a.t < b.t
),
rk AS (
    SELECT slope,
           row_number() OVER (ORDER BY slope, t1, t2) AS rn,
           COUNT(*) OVER () AS n
    FROM pairs
)
SELECT CAST((SELECT COUNT(*) FROM pts) AS BIGINT) AS n_days,
       CAST(MAX(n) AS BIGINT) AS n_pairs,
       SUM(CASE WHEN rn IN ((n + 1) // 2, n // 2 + 1)
                THEN slope ELSE 0 END)
       / CAST(COUNT(CASE WHEN rn IN ((n + 1) // 2, n // 2 + 1)
                         THEN 1 END) AS DOUBLE) AS ts_slope
FROM rk
"""


# Ceiling on the exact all-pairs Theil-Sen path: 3,000 distinct days
# (~8 calendar years; the TPC-H-ish testdata spans ~2,400) ->
# <=4.5M pairwise slopes, comfortably inside one broadcast join +
# one bounded median sort (the 2,399-day bench case measures ~4s at
# sf0.1). Beyond it the query raises rather than silently going
# quadratic-in-calendar.
_TS_MAX_DAYS = 3000


@query("orders_theil_sen_trend", _TS_ORACLE)
def q_orders_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily order revenue: the median of
    all pairwise slopes (y_j - y_i)/(t_j - t_i) over the daily
    aggregate — the robust counterpart of events_trend_ols (up to
    ~29% outlier days cannot move it). Output: (n_days, n_pairs,
    ts_slope) in revenue units per day.

    Determinism: daily revenue is a DECIMAL(18,2) sum cast once to
    double; each slope is ONE IEEE division of exactly-representable
    operands, so both engines compute bit-identical slope values;
    the median picks rank-addressed elements under the total order
    (slope, t1, t2) and averages the middle two on even counts.
    Scale: the pairwise stage runs on the CALENDAR-BOUNDED daily
    relation (n_days rows no matter the corpus size), so the
    quadratic is O(days^2) ~ 266k pairs for two years — constant in
    data volume; everything upstream is one date-key shuffle.

    Long-calendar guard: the quadratic is constant in CORPUS size but
    not in CALENDAR length (a 10-year daily series is ~6.7M pairs
    into a broadcast join and a single-partition median sort), so the
    query self-limits at ``_TS_MAX_DAYS`` (3,000) distinct days. The
    guard is IN-PLAN (an ``assert_true`` over the 1-row t0 aggregate,
    folded into the day offset so Catalyst can't prune it — the
    global_rank pattern): plan construction stays action-free (the
    round-10 advisory: the old driver-side ``daily.count()`` guard
    paid a full orders scan at BUILD time for any caller that merely
    constructs the DataFrame), and the first action raises loudly
    naming ``orders_theil_sen_trend_long`` (queries_r15.py, the
    deterministic md5 pair-sample estimator implemented r15) as the
    long-calendar path instead of silently going
    quadratic-in-calendar."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    # localCheckpoint (lazy) pins the calendar-bounded daily
    # aggregate: the fact table is scanned EXACTLY once, and the t0
    # min and both sides of the pairwise self-join all read the
    # <=_TS_MAX_DAYS-row checkpoint instead of re-aggregating orders
    # (3-4 fact scans at 100 TB otherwise).
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "rev"
            )
        )
        .localCheckpoint(eager=False)
    )
    t0 = daily.agg(
        F.min("d").alias("d0"), F.count("*").alias("__nd")
    )
    calendar_ok = F.assert_true(
        F.col("__nd") <= F.lit(_TS_MAX_DAYS),
        F.concat(
            F.lit("orders_theil_sen_trend: "),
            F.col("__nd"),
            F.lit(
                f" distinct days exceeds the {_TS_MAX_DAYS}-day "
                "ceiling (quadratic pairwise-slope stage). For longer "
                "calendars use orders_theil_sen_trend_long "
                "(queries_r15.py): a deterministic md5 uniform pair "
                "sample, O(K*n) slopes, same triangular gap law as "
                "the exact pair set."
            ),
        ),
    )
    pts = daily.crossJoin(F.broadcast(t0)).select(
        (
            F.datediff(F.col("d"), F.col("d0"))
            + F.coalesce(calendar_ok.cast("int"), F.lit(0))
        ).alias("t"),
        F.col("rev").cast("double").alias("y"),
    )
    a = pts.alias("a")
    b = pts.alias("b")
    pairs = a.join(
        F.broadcast(b), F.col("a.t") < F.col("b.t")
    ).select(
        (
            (F.col("b.y") - F.col("a.y"))
            / (F.col("b.t") - F.col("a.t")).cast("double")
        ).alias("slope"),
        F.col("a.t").alias("t1"),
        F.col("b.t").alias("t2"),
    )
    # Median by TWO-LEVEL rank (operators/window.py global_rank —
    # the packing.py repartitionByRange prefix-sum pattern applied to
    # ranks), not a global row_number: the r9 version paid a
    # single-partition Exchange+Sort+Window over all ~2.9M pairs
    # (~3.5 s of the query's 5 s at sf0.1); the two-level form sorts
    # in parallel and its only window runs over the 32-row
    # partition-totals relation. (slope, t1, t2) is a total order
    # (t1, t2 unique per pair), satisfying global_rank's contract.
    # n_pairs and the two median ranks come IN-PLAN from the 1-row t0
    # aggregate (broadcast) — no driver-side count, construction stays
    # action-free.
    from ..operators.window import global_rank

    nd = t0.select(
        F.col("__nd").cast("bigint").alias("n_days"),
        F.expr("CAST(__nd * (__nd - 1) DIV 2 AS BIGINT)").alias(
            "n_pairs"
        ),
    )
    mid = (
        global_rank(pairs, ["slope", "t1", "t2"])
        .crossJoin(F.broadcast(nd))
        .filter(
            (F.col("rn") == F.expr("(n_pairs + 1) DIV 2"))
            | (F.col("rn") == F.expr("n_pairs DIV 2 + 1"))
        )
    )
    return mid.agg(
        F.coalesce(F.first("n_days"), F.lit(0)).alias("n_days"),
        F.coalesce(F.first("n_pairs"), F.lit(0)).alias("n_pairs"),
        (F.sum("slope") / F.count("*").cast("double")).alias("ts_slope"),
    ).select("n_days", "n_pairs", "ts_slope")


# -- PMI collocations -------------------------------------------------------
# Pointwise mutual information over adjacent token bigrams (Church &
# Hanks 1990): pmi(x,y) = log2(c(xy)*N / (c(x)*c(y))) with N the
# total token count. The classic collocation surfacer — in a curation
# stack it exposes boilerplate word pairs and domain phrases. The
# score is ONE double expression evaluated in the identical operation
# order in both engines (two exact int64->double products, one IEEE
# division, one log2), then quantized to int64 micro-bits as the
# ranking key, so the top-20 is hash-stable.

_PMI_MINC = 5
_PMI_TOPK = 20

_PMI_ORACLE = rf"""
WITH ts AS (
    SELECT regexp_split_to_array(trim(text), '\s+') AS a
    FROM documents
),
uni AS (SELECT unnest(a) AS tok FROM ts),
uc AS (SELECT tok, COUNT(*) AS c FROM uni GROUP BY 1),
n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uc),
bg AS (
    SELECT a[i] AS w1, a[i + 1] AS w2
    FROM ts, unnest(range(1, len(a))) AS r(i)
),
bc AS (
    SELECT w1, w2, COUNT(*) AS cxy
    FROM bg GROUP BY 1, 2
    HAVING COUNT(*) >= {_PMI_MINC}
),
sc AS (
    SELECT w1, w2, cxy,
           CAST(floor(log2((CAST(cxy AS DOUBLE) * CAST(n.n AS DOUBLE))
                           / (CAST(u1.c AS DOUBLE)
                              * CAST(u2.c AS DOUBLE)))
                      * 1000000.0 + 0.5) AS BIGINT) AS pq
    FROM bc
    CROSS JOIN n
    JOIN uc u1 ON bc.w1 = u1.tok
    JOIN uc u2 ON bc.w2 = u2.tok
)
SELECT w1, w2, CAST(cxy AS BIGINT) AS n_pair,
       CAST(pq AS DOUBLE) / 1000000.0 AS pmi
FROM sc
ORDER BY pq DESC, cxy DESC, w1, w2
LIMIT {_PMI_TOPK}
"""


@query("text_pmi_collocations", _PMI_ORACLE)
def q_text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent-bigram collocations by pointwise mutual
    information, with a min-count floor of 5 occurrences. PMI ranks
    pairs that co-occur far more than their unigram frequencies
    predict — the standard boilerplate/phrase detector run before
    tokenizer training.

    Determinism: pmi = log2((cxy*N)/(c1*c2)) is one fixed-order
    double expression over exact integer counts, quantized to int64
    micro-bits before ranking; ties break (count desc, bigram asc).
    Scale: bigrams come from arrays_zip of two shifted slices — pure
    map-side, no window shuffle; the only shuffles are the two
    token-key count aggregations and the two vocabulary-sized joins;
    top-20 lands in TakeOrderedAndProject."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(TX.tokens("text").alias("t"))
    cnt = F.size(F.col("t")) - 1
    bg = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("t"), 1, F.greatest(cnt, F.lit(0))),
                F.slice(F.col("t"), 2, F.greatest(cnt, F.lit(0))),
            )
        ).alias("z")
    ).select(F.col("z")["0"].alias("w1"), F.col("z")["1"].alias("w2"))

    uc = (
        docs.select(F.explode(TX.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    n = uc.agg(F.sum("c").cast("bigint").alias("n"))
    bc = (
        bg.groupBy("w1", "w2")
        .agg(F.count("*").alias("cxy"))
        .filter(F.col("cxy") >= _PMI_MINC)
    )
    u1 = uc.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uc.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    pq = F.floor(
        F.log2(
            (F.col("cxy").cast("double") * F.col("n").cast("double"))
            / (F.col("c1").cast("double") * F.col("c2").cast("double"))
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("bigint")
    return (
        bc.crossJoin(F.broadcast(n))
        .join(u1, "w1")
        .join(u2, "w2")
        .select(
            "w1",
            "w2",
            F.col("cxy").cast("bigint").alias("n_pair"),
            pq.alias("pq"),
        )
        .orderBy(
            F.desc("pq"), F.desc("n_pair"), F.asc("w1"), F.asc("w2")
        )
        .limit(_PMI_TOPK)
        .select(
            "w1",
            "w2",
            "n_pair",
            (F.col("pq").cast("double") / F.lit(1e6)).alias("pmi"),
        )
    )


# -- Winnowing fingerprints -------------------------------------------------
# Winnowing (Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the MOSS
# algorithm): hash every k-gram (k=3 word shingles here), slide a
# window of w=4 consecutive hashes, and select the minimum hash of
# each window, rightmost position on ties. The selected set is the
# document's fingerprint; any shared substring of length >= k+w-1
# tokens is GUARANTEED to produce at least one shared fingerprint.
# Hash = first 10 md5 hex digits (40-bit int); the tie rule is packed
# into one int64 key (hash * 2^20 + (2^20-1-pos)), so a single MIN
# implements "smallest hash, rightmost on ties" in both engines.
# (The 2^20 position budget bounds docs at ~1M tokens — far above
# this corpus; a production build would widen to 2^24.)

_WIN_W = 4
_WIN_TOPK = 20

_WIN_ORACLE = r"""
WITH ts AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
    FROM documents
),
sh AS (
    SELECT doc_id, i AS pos,
           t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS s
    FROM ts, unnest(range(1, len(t) - 1)) AS r(i)
),
h AS (
    SELECT doc_id, pos,
           ('0x' || substr(md5(s), 1, 10))::BIGINT * 1048576
               + (1048575 - pos) AS k
    FROM sh
),
m AS (SELECT doc_id, MAX(pos) AS m FROM h GROUP BY 1),
w AS (
    SELECT doc_id, unnest(range(1, greatest(m - 3, 1) + 1)) AS j
    FROM m
),
win AS (
    SELECT w.doc_id, w.j, MIN(h.k) AS sel
    FROM w
    JOIN h ON h.doc_id = w.doc_id
          AND h.pos >= w.j AND h.pos <= w.j + 3
    GROUP BY 1, 2
),
sel AS (SELECT DISTINCT doc_id, sel AS k FROM win)
SELECT k // 1048576 AS fingerprint,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_picks
FROM sel
GROUP BY 1
ORDER BY n_docs DESC, n_picks DESC, fingerprint
LIMIT 20
"""


@query("docs_winnowing_fingerprints", _WIN_ORACLE)
def q_docs_winnowing_fingerprints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS plagiarism-detector
    selection rule) over 3-word shingles with window w=4: the top-20
    fingerprints shared by the most documents, with total pick
    counts. In a dedup stack this is the guaranteed-recall substring
    detector — any shared run of >= 6 tokens yields a shared
    fingerprint, at ~2/(w+1) the storage of full shingling.

    Determinism: integer md5-derived hashes; the min-with-rightmost-
    tie rule is one packed-int64 MIN; dedup of selected (hash, pos)
    pairs is exact. Scale: the whole selection pipeline is array HOFs
    inside one projection — zero shuffles until the final
    fingerprint-key aggregation; per-doc cost is O(tokens * w)."""
    from ..catalog import spread_scan

    # r15: spread the single-row-group scan before the winnowing HOFs
    # (guide §2.5; no-op at scale — see catalog.spread_scan).
    docs = spread_scan(_docs(spark, sf_dir), "doc_id")
    base = docs.select(
        "doc_id", TX.tokens("text").alias("t")
    ).select(
        "doc_id", TX.word_shingles(F.col("t"), 3).alias("sh")
    )
    hashed = base.filter(F.size("sh") > 0).select(
        "doc_id",
        F.expr(
            "transform(sh, s -> cast(conv(substring(md5(s), 1, 10),"
            " 16, 10) as bigint))"
        ).alias("hs"),
    )
    keyed = hashed.select(
        "doc_id",
        F.expr(
            "transform(sequence(1, size(hs)), i ->"
            " hs[i - 1] * 1048576 + (1048575 - i))"
        ).alias("ks"),
    )
    sel = keyed.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform("
                    " sequence(1, greatest(size(ks) - 3, 1)),"
                    " j -> array_min(slice(ks, j,"
                    "   least(4, size(ks) - j + 1))))"
                )
            )
        ).alias("k"),
    )
    return (
        sel.select("doc_id", F.expr("k div 1048576").alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_picks"),
        )
        .orderBy(
            F.desc("n_docs"), F.desc("n_picks"), F.asc("fingerprint")
        )
        .limit(_WIN_TOPK)
    )


# -- Bucketed range join over burst windows ---------------------------------
# A range join with NO natural equi-key: intervals (the 3-day windows
# around each event type's 3 busiest days) joined to the event stream
# by ts-in-interval. The scale shape is interval bucketing — each
# interval explodes to its covered day buckets, the join runs as an
# EQUI-join on the day key (broadcast: the interval relation is
# types x 3 rows), and no non-equi theta join ever reaches the
# executor. This is the generic recipe for range joins Spark lacks
# natively: discretize the range axis, equi-join the buckets, then
# (for partial buckets) re-filter exactly — here buckets are whole
# days so no residual filter is needed.

_BURST_ORACLE = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS c
    FROM events GROUP BY 1, 2
),
top3 AS (
    SELECT event_type, d FROM (
        SELECT event_type, d,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY c DESC, d) AS rk
        FROM daily) WHERE rk <= 3
),
buckets AS (
    SELECT event_type AS burst_type, d AS center_day,
           CAST(d + o AS DATE) AS day
    FROM top3, unnest([-1, 0, 1]) AS r(o)
)
SELECT b.burst_type, b.center_day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events e
JOIN buckets b ON CAST(e.ts AS DATE) = b.day
GROUP BY 1, 2
"""


@query("events_burst_range_join", _BURST_ORACLE)
def q_events_burst_range_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Activity during burst windows: for each event type's 3 busiest
    days, the +/-1-day window's total traffic (all types) — events,
    distinct users, and summed value per (burst_type, center_day).
    The operator shape is a RANGE JOIN (ts within [center-1,
    center+1]) executed as a bucketed equi-join: each interval
    explodes to its day buckets and the stream joins on the day key.

    Determinism: exact counts; value sums ride DECIMAL(18,2); busiest
    days tiebreak (count desc, day asc). Scale: the interval relation
    is |types| x 3 rows — broadcast; the event stream is scanned ONCE
    and never shuffles on anything but the final (type, day) group
    key; no theta join appears in the plan."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "value",
    )
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("c"))
    wk = Window.partitionBy("event_type").orderBy(
        F.desc("c"), F.asc("d")
    )
    top3 = (
        daily.select(
            "event_type", "d", F.row_number().over(wk).alias("rk")
        )
        .filter(F.col("rk") <= 3)
    )
    buckets = top3.select(
        F.col("event_type").alias("burst_type"),
        F.col("d").alias("center_day"),
        F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("o"),
    ).select(
        "burst_type",
        "center_day",
        F.date_add(F.col("center_day"), F.col("o")).alias("day"),
    )
    return (
        ev.join(
            F.broadcast(buckets), F.to_date("ts") == F.col("day")
        )
        .groupBy("burst_type", "center_day")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


# -- NB margin calibration --------------------------------------------------

_NBCAL_ORACLE = _NB_PRELUDE + r""",
r2 AS (
    SELECT doc_id, true_source, source, sq,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY sq DESC, source) AS rk
    FROM score
),
doc AS (
    SELECT a.doc_id,
           CASE WHEN a.source = a.true_source THEN 1 ELSE 0 END
               AS correct,
           a.sq - b.sq AS margin
    FROM r2 a
    JOIN r2 b ON a.doc_id = b.doc_id AND b.rk = 2
    WHERE a.rk = 1
),
binned AS (
    SELECT correct, margin,
           CAST(ntile(5) OVER (ORDER BY margin, doc_id) AS BIGINT)
               AS margin_bin
    FROM doc
)
SELECT margin_bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(correct) AS BIGINT) AS n_correct,
       CAST(SUM(correct) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
           AS accuracy,
       CAST(MIN(margin) AS BIGINT) AS min_margin,
       CAST(MAX(margin) AS BIGINT) AS max_margin
FROM binned
GROUP BY 1
"""


@query("docs_nb_margin_calibration", _NBCAL_ORACLE)
def q_docs_nb_margin_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Calibration QA for the Naive Bayes source classifier: test
    docs are bucketed into margin quintiles (margin = top-1 minus
    top-2 log-posterior in micro-bits) and each bucket reports its
    empirical accuracy — the classifier-confidence reliability table
    every curation gate should publish before its scores are used as
    filtering thresholds. A calibrated classifier shows accuracy
    rising with margin; chance-level flat rows mean the scores carry
    no signal (the expected reading on this synthetic corpus).

    Determinism: margins are exact int64 differences of quantized
    scores; quintile assignment is ntile(5) under the total order
    (margin, doc_id); accuracy is one IEEE division of exact counts.
    Scale: reuses the NB scoring relation (broadcast model, linear
    token pass); the top-2 extraction is a per-doc window; the only
    global step is the ntile over the EVAL-SET-sized doc relation —
    bounded state by design (eval sets are small by construction,
    the corpus itself never enters the quintile window)."""
    from pyspark.sql import Window

    score = _nb_scores(spark, sf_dir)
    wk = Window.partitionBy("doc_id").orderBy(
        F.desc("sq"), F.asc("source")
    )
    r2 = score.select(
        "doc_id",
        "true_source",
        "source",
        "sq",
        F.row_number().over(wk).alias("rk"),
    )
    top1 = r2.filter(F.col("rk") == 1).select(
        "doc_id",
        F.when(F.col("source") == F.col("true_source"), 1)
        .otherwise(0)
        .alias("correct"),
        F.col("sq").alias("sq1"),
    )
    top2 = r2.filter(F.col("rk") == 2).select(
        "doc_id", F.col("sq").alias("sq2")
    )
    doc = top1.join(top2, "doc_id").select(
        "doc_id", "correct", (F.col("sq1") - F.col("sq2")).alias("margin")
    )
    wq = Window.orderBy("margin", "doc_id")
    binned = doc.select(
        "correct",
        "margin",
        F.ntile(5).over(wq).cast("bigint").alias("margin_bin"),
    )
    return binned.groupBy("margin_bin").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("correct").cast("bigint").alias("n_correct"),
        (
            F.sum("correct").cast("double")
            / F.count("*").cast("double")
        ).alias("accuracy"),
        F.min("margin").cast("bigint").alias("min_margin"),
        F.max("margin").cast("bigint").alias("max_margin"),
    )


# -- N-gram novelty curve -----------------------------------------------------
# Dataset redundancy growth curve: sweeping the corpus in ingest order
# (doc_id), what fraction of each slice's 3-gram shingles has never
# appeared in ANY earlier document? Falling novelty across buckets is
# the canonical "we are re-crawling the same web" signal and the
# standard pre-training argument for dedup budget (docs_vocab_growth
# tracks the VOCABULARY curve; this tracks phrase-level redundancy,
# which saturates far earlier). Reference scope: the reference has no
# text analytics; this extends its profiling family per SURVEY §2.13.

_NOVELTY_BUCKETS = 10

_NOVELTY_CURVE_ORACLE = r"""
WITH ts AS (
    SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
    FROM documents
),
sh AS (
    SELECT DISTINCT doc_id,
           ('0x' || substr(md5(t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]),
                           1, 15))::BIGINT AS h
    FROM ts, unnest(range(1, len(t) - 1)) AS r(i)
),
firsts AS (SELECT h, MIN(doc_id) AS first_doc FROM sh GROUP BY 1),
bounds AS (SELECT MIN(doc_id) AS mn, MAX(doc_id) AS mx FROM documents),
per_doc AS (
    SELECT s.doc_id,
           COUNT(*) AS n_sh,
           SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS n_new
    FROM sh s JOIN firsts f ON s.h = f.h
    GROUP BY 1
)
SELECT CAST(((p.doc_id - b.mn) * 10) // (b.mx - b.mn + 1) AS BIGINT)
           AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_sh) AS BIGINT) AS n_shingles,
       CAST(SUM(n_new) AS BIGINT) AS n_novel,
       CAST((SUM(n_new) * 1000000) // SUM(n_sh) AS BIGINT) AS novelty_ppm,
       CAST(CAST((SUM(n_new) * 1000000) // SUM(n_sh) AS BIGINT) AS DOUBLE)
           / 1000000e0 AS novel_frac
FROM per_doc p, bounds b
GROUP BY 1
ORDER BY bucket
"""


@query("docs_ngram_novelty_curve", _NOVELTY_CURVE_ORACLE)
def q_docs_ngram_novelty_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-corpus-decile 3-gram novelty: bucket documents into 10
    slices of the doc_id (ingest-order) range and report, per slice,
    the fraction of its distinct shingles whose FIRST corpus
    occurrence is in that slice's documents. The redundancy growth
    curve every crawl-heavy training corpus should publish — a
    phrase-level saturation signal that falls long before
    docs_vocab_growth's vocabulary curve flattens. Aggregates the
    same first-occurrence signal as docs_shingle_novelty (the per-doc
    table) to a fixed 10-row corpus-position summary.

    Determinism: shingles are set-deduped per doc; first occurrence is
    an integer MIN over doc_id; all bucket math is integer DIV over a
    broadcast (min, max) scalar — no floats until one final exact
    int-to-double division. Docs with < 3 tokens carry no shingles and
    are excluded (stated contract). Scale: shingles are 60-bit md5
    ints, so the two shuffle keys are fixed-width — the groupBy(h) and
    the join back on h share one hash partitioning; per-doc and
    per-bucket aggs are map-side-combinable; nothing is quadratic and
    nothing sorts globally (buckets come from the id RANGE, not a
    global ntile)."""
    from ..catalog import spread_scan

    # r15: spread the single-row-group scan before the per-shingle md5
    # work (guide §2.5; no-op at scale — see catalog.spread_scan).
    docs = spread_scan(_docs(spark, sf_dir), "doc_id")
    sh = (
        docs.select("doc_id", TX.tokens("text").alias("t"))
        .select("doc_id", TX.word_shingles(F.col("t"), 3).alias("sh"))
        .select("doc_id", F.explode("sh").alias("s"))
        .select(
            "doc_id",
            F.expr(
                "cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)"
            ).alias("h"),
        )
        .distinct()
    )
    firsts = sh.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        sh.join(firsts, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sh"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_new"),
        )
    )
    bounds = docs.agg(
        F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")
    )
    return (
        per_doc.crossJoin(F.broadcast(bounds))
        .select(
            F.expr(
                f"cast(((doc_id - mn) * {_NOVELTY_BUCKETS})"
                " div (mx - mn + 1) as bigint)"
            ).alias("bucket"),
            "n_sh",
            "n_new",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_sh").cast("bigint").alias("n_shingles"),
            F.sum("n_new").cast("bigint").alias("n_novel"),
            F.expr(
                "cast((sum(n_new) * 1000000) div sum(n_sh) as bigint)"
            ).alias("novelty_ppm"),
        )
        .select(
            "bucket",
            "n_docs",
            "n_shingles",
            "n_novel",
            "novelty_ppm",
            (F.col("novelty_ppm").cast("double") / F.lit(1e6)).alias(
                "novel_frac"
            ),
        )
        .orderBy("bucket")
    )
