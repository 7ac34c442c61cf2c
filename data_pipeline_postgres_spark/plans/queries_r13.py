"""Round-13 query additions (SURVEY.md §2.11/§2.12 [EXT]) — the
round-12 verdict's build list:

- ``dedup_payload_cdc``: byte-payload near-duplicate pairs over the
  content-defined chunk manifest instead of stride-1 8-grams — the
  production-scale path every payload-dedup docstring names (verdict
  r12 item 5). Same pair semantics (rare-feature Jaccard >= 0.5),
  ~1/128th the feature volume (one ~16-byte chunk per 16 bytes vs 8
  grams per byte);
- ``emb_mutual_knn_ann``: the ANN-candidate twin of
  ``emb_mutual_knn`` (verdict r12 item 6) — IVF-probed candidate
  lists, exact rerank, reciprocity join unchanged; rows-only with a
  recall gate against the exact query (the dedup_embedding_lsh
  precedent).

Conventions identical to queries_r9/r11/r12: every computed column
aliased the same in the Spark plan and the DuckDB oracle; counts CAST
to BIGINT on both sides; float only in single shared-literal
divisions evaluated as the identical IEEE op sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query
from .queries_r12 import (
    _CDC_ORACLE_TMPL,
    _PAYLOAD_DF_CAP,
    _PAYLOAD_J_MIN,
)

# ~16-byte average chunks for the pair finder: at the storage mask
# (64) a 2-chunk payload cannot separate an edited near-dup from a
# coincidental 1-chunk overlap (measured at sf0.001: both score
# j=1/3, c=1/2); at mask 16 the corpus is cleanly bimodal (true pairs
# j >= 0.5, best non-pair j <= 1/3 at sf0.001 and <= 1/7 at sf0.01)
# and the >= 0.5 pair set equals dedup_payload_shingle's exactly.
_CDC_PAIR_MASK = 16


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# -- Payload near-dup pairs over CDC chunks -----------------------------------
# dedup_payload_shingle is the honest-but-expensive exact surface:
# stride-1 byte 8-grams cost 8 features per payload byte. The
# content-defined chunk manifest (the multimodal_cdc_chunks fold at
# a finer mask) carries the SAME identity signal in ~1/128th the
# features (one chunk per ~16 bytes vs 8 grams per byte, boundaries
# re-synchronizing across edits), so the
# production pair-finder runs the identical rare-feature Jaccard over
# chunk hashes: drop chunks shared by more than _PAYLOAD_DF_CAP docs
# (boilerplate, no identity signal — the LSH-band df discipline that
# also bounds every join bucket to <= C(cap,2) pairs), Jaccard over
# each doc's remaining DISTINCT chunk set, keep pairs >= 0.5. On the
# test corpus the score is bimodal exactly like the 8-gram variant,
# and the >= 0.5 pair set is IDENTICAL to dedup_payload_shingle's
# (asserted in tests/test_round13.py at sf0.001 and by
# tools/check_queries.py at sf0.01).

_PAYLOAD_CDC_ORACLE = f"""
WITH manifest AS MATERIALIZED (
{_CDC_ORACLE_TMPL.format(mask=_CDC_PAIR_MASK)}
),
cs AS (SELECT DISTINCT doc_id, chunk_md5 FROM manifest),
freq AS (
    SELECT chunk_md5 FROM cs
    GROUP BY 1 HAVING COUNT(*) <= {_PAYLOAD_DF_CAP}
),
rare AS (
    SELECT cs.doc_id, cs.chunk_md5 FROM cs JOIN freq USING (chunk_md5)
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM rare GROUP BY 1),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_common
    FROM rare a
    JOIN rare b ON a.chunk_md5 = b.chunk_md5 AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
       CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard,
       CAST(n_common AS DOUBLE) / LEAST(sa.n, sb.n) AS containment
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common)
      >= {_PAYLOAD_J_MIN}e0
"""


@query("dedup_payload_cdc", _PAYLOAD_CDC_ORACLE)
def q_dedup_payload_cdc(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Byte-payload near-duplicate pairs over the content-defined
    chunk manifest: Jaccard >= 0.5 over rare (df <= 10) CDC chunk
    hashes → (doc_a, doc_b, n_common, jaccard, containment),
    doc_a < doc_b. The production-scale twin of
    ``dedup_payload_shingle``: gear-hash boundaries re-synchronize
    around edits, so near-identical payloads share almost all chunks
    and score ~1 while unrelated payloads share none — the same
    bimodal separation at ~1/128th the feature volume (one ~16-byte
    chunk per 16 bytes vs 8 grams per byte). ``containment``
    additionally
    reports n_common / min(|A|, |B|), the subset-detection number a
    chunk store quotes.

    Scale shape: the manifest is ONE O(bytes) map-side fold + explode
    (multimodal_cdc_chunks' plan, zero exchanges); the df cap bounds
    every chunk-hash join bucket to <= C(10,2) pairs exactly like an
    LSH band; the pair rollup and two size joins are candidate-
    driven. Feature volume is ~128x smaller than stride-1 8-grams, so
    the distinct/frequency/self-join shuffles move ~128x fewer rows —
    the reason this is the 100 TB path and the shingle query is the
    calibration surface.

    The chunk stream comes from the VECTORIZED kernel
    (``operators.multimodal.cdc_chunks_np``: one Arrow-batched hop,
    32 shifted uint32 vector adds), not the pure-SQL per-byte fold —
    identical boundaries (equality pytest'd per (doc, position)
    against the SQL fold), ~4x faster end-to-end; chunks join as raw
    bytes since only content equality matters and the ORACLE's
    md5-keyed formulation induces the same equivalence classes."""
    from ..operators import multimodal

    m = multimodal.cdc_chunks_np(
        _docs(spark, sf_dir), mask=_CDC_PAIR_MASK
    )
    cs = m.select("doc_id", "chunk").distinct()
    freq = (
        cs.groupBy("chunk")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= _PAYLOAD_DF_CAP)
        .select("chunk")
    )
    # rare feeds three consumers (sizes + both self-join sides):
    # lineage-cut once instead of re-running the manifest fold per
    # consumer (the dedup_payload_shingle discipline)
    rare = cs.join(freq, "chunk").localCheckpoint(eager=False)
    sz = rare.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = rare.select(F.col("doc_id").alias("doc_a"), "chunk")
    b = rare.select(F.col("doc_id").alias("doc_b"), "chunk")
    inter = (
        a.join(b, "chunk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    j = (
        inter.join(
            sz.select(
                F.col("doc_id").alias("doc_a"), F.col("n").alias("na")
            ),
            "doc_a",
        )
        .join(
            sz.select(
                F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")
            ),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
        .withColumn(
            "containment",
            F.col("n_common").cast("double")
            / F.least(F.col("na"), F.col("nb")),
        )
    )
    return j.filter(F.col("jaccard") >= _PAYLOAD_J_MIN).select(
        "doc_a", "doc_b", "n_common", "jaccard", "containment"
    )


# -- ANN-candidate mutual kNN ---------------------------------------------------
# emb_mutual_knn is the exact baseline: reciprocal 5-NN pairs over
# the blocked all-pairs kernel — correct, but the kernel's compute is
# quadratic in corpus size (inside tasks). The production twin
# generates each vector's candidate list by IVF probing instead
# (verdict r12 item 6; the dedup_embedding_lsh exact-plus-approximate
# precedent): assignment and probe selection are narrow broadcast-
# array folds, per-list local top-k runs in the same int64-quantized
# matmul kernel family, and the reciprocity join is unchanged.
# Rows-only (the md5-free IVF fold is SQL-expressible but the
# blocked kernel's quantized cosine is not worth mirroring twice —
# same posture as emb_* kernel queries); accuracy-gated in
# tests/test_round13.py and PLANS.md.
#
# Probe budget is REGIME-TUNED, honestly: this synthetic corpus has a
# near-flat spectrum (the sim_topk_lsh / sim_ann_ivf_kmeans finding —
# mutual-NN pairs live at weak cosine and scatter across lists), so
# the measured recall curve is nprobe 4 -> 0.52, 6 -> 0.81,
# 7 -> 0.92; finer quantizers do WORSE (nlist=16, nprobe=12: 0.85).
# nprobe=7 of 8 meets the >= 0.9 gate with real (12.5%) pruning; on
# production embeddings with genuine cluster structure the standard
# nprobe/nlist ~ 1/4 budget applies and the knob is this constant.

_MUTUAL_ANN_NPROBE = 7


@query("emb_mutual_knn_ann")  # kernel cosine not SQL-expressible
def q_emb_mutual_knn_ann(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reciprocal 5-NN pairs via IVF-probed candidates:
    (vec_id_a, vec_id_b, cosine) where each vector appears in the
    other's APPROXIMATE top-5 — the corpus-scale twin of
    ``emb_mutual_knn``, which stays as the exact baseline. Candidate
    lists come from probing each vector's nprobe=7 nearest of 8
    inverted lists with an exact per-list rerank (same quantized
    cosine as the exact kernel), so a true mutual pair is missed only
    when one endpoint's true neighbor hides in the unprobed list —
    measured recall 0.92 / precision 0.96 vs the exact query at both
    sf0.001 and sf0.01 (PLANS.md; pytest-gated >= 0.9; probe budget
    regime-tuned — see the block comment above).

    Scale shape: no exhaustive block pairing — each vector shuffles
    nprobe+1 rows keyed on centroid_id, every task holds ONE inverted
    list plus its probers, and at production scale nlist grows
    ~sqrt(n) (standard IVF sizing) so list size stays bounded. The
    reciprocity check is the same one self-equi-join on the swapped
    key pair."""
    from ..operators import similarity
    from .queries_r12 import _KNN_K

    emb = load_table(spark, sf_dir, "embeddings")
    cand = similarity.ivf_knn_topk(
        emb, k=_KNN_K, nlist=8, nprobe=_MUTUAL_ANN_NPROBE
    )
    wn = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("nid")
    )
    nn = (
        cand.withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") <= _KNN_K)
        .select("qid", "nid", "cosine")
        .localCheckpoint(eager=False)
    )
    swapped = nn.select(
        F.col("nid").alias("qid"), F.col("qid").alias("nid")
    )
    return (
        nn.join(swapped, ["qid", "nid"])
        .filter(F.col("qid") < F.col("nid"))
        .select(
            F.col("qid").alias("vec_id_a"),
            F.col("nid").alias("vec_id_b"),
            "cosine",
        )
    )
