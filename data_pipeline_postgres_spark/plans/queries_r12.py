"""Round-12 query additions (SURVEY.md §2.11/§2.12 [EXT]) — the
round-11 verdict's unfreeze list plus the families it opened:

- ``docs_pack_bestfit`` + ``docs_pack_efficiency``: first-fit-
  decreasing shelf packing over power-of-two length classes (no
  document ever splits) and the layout-decision row against
  concatenate-and-chunk;
- the BYTES tier of the dedup matrix: ``dedup_payload_shingle``
  (rare byte-8-gram Jaccard pairs), ``dedup_payload_incremental``
  (batch-vs-corpus containment), ``stream_payload_dedup`` (streaming
  gram-index twin), ``multimodal_cdc_chunks`` (content-defined
  gear-hash chunk manifest — the production byte-dedup primitive),
  and ``multimodal_cdc_dedup_ratio`` (chunk-store payoff number);
- exact-substring dedup diagnostics by HASH DOUBLING
  (operators/textdup.py): ``docs_dup_spectrum`` (corpus duplication
  mass per window length 2^k) and ``docs_dup_maxrun`` (per-doc
  removal criterion);
- ``docs_mix_capped_alloc``: the constrained mixture-weight solver
  (water-filling under per-source caps, unrolled + convergence-
  asserted);
- attribution: ``events_attribution_models`` (first/last/linear in
  one pass) and ``events_attribution_markov`` (removal effects over
  the journey chain).

Conventions identical to queries_r9/r11: every computed column
aliased the same in the Spark plan and the DuckDB oracle; counts CAST
to BIGINT on both sides; float recurrences quantized or evaluated as
the identical IEEE op sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import text as TX
from .registry import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# -- Best-fit (shelf) sequence packing ---------------------------------------
# docs_pack_sequences lays tokens out concatenate-and-chunk: zero
# padding, but documents straddle window boundaries
# (docs_pack_fragmentation measures how many). The classic no-split
# alternative is first-fit-decreasing; exact FFD is inherently
# sequential (every placement depends on all prior bin states), so
# the scalable variant used here is FFD over power-of-two LENGTH
# CLASSES (shelf / harmonic packing): round each doc's length up to a
# class c in {8,16,...,512}, and pack class-c docs c-aligned,
# 512/c per bin. Within a class every doc reserves the same slot
# size, so placement is pure rank arithmetic — rank within class
# (descending length, the "decreasing" part, so the fullest slots
# cluster in the earliest bins) maps to (bin, slot) by div/mod.
# Utilization is ≥ 50% on every shelf except possibly the last of
# each class (an item of class c has length > c/2), the standard
# shelf-packing bound.
#
# Scale shape: the only data-sized ordering is the two-level
# global_rank (range-partitioned parallel sorts + a prefix sum over
# the <=32-row totals relation — never a single-partition window);
# class offsets and bin bases are windows over the <=7-row class
# relation. Docs longer than the 512-token context clamp to class
# 512 (one full bin each, truncated — same policy as a trainer's
# hard context cut).

_PACK_L = 512
_PACK_CLASSES = (8, 16, 32, 64, 128, 256, 512)

_CLASS_CASE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN n <= {c} THEN {c}" for c in _PACK_CLASSES[:-1]
    )
    + " ELSE 512 END"
)

_TOKCNT_SQL = (
    "COALESCE(CAST(len(regexp_split_to_array(trim(text), '\\s+')) "
    "AS BIGINT), 0)"
)

_PACK_BESTFIT_ORACLE = rf"""
WITH t AS (
    SELECT doc_id, {_TOKCNT_SQL} AS n FROM documents
),
cl AS (
    SELECT doc_id, n, {_CLASS_CASE_SQL} AS c FROM t WHERE n > 0
),
r AS (
    SELECT doc_id, n, c,
           row_number() OVER (PARTITION BY c ORDER BY n DESC, doc_id)
               AS rn
    FROM cl
),
cnt AS (SELECT c, COUNT(*) AS m FROM cl GROUP BY 1),
bins AS (
    SELECT c, m, (m + ({_PACK_L} // c) - 1) // ({_PACK_L} // c) AS nb
    FROM cnt
),
base AS (
    SELECT c,
           COALESCE(SUM(nb) OVER (ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS b0
    FROM bins
)
SELECT r.doc_id, CAST(r.n AS BIGINT) AS n_tokens,
       CAST(r.c AS BIGINT) AS size_class,
       CAST(base.b0 + (r.rn - 1) // ({_PACK_L} // r.c) AS BIGINT)
           AS bin_id,
       CAST((r.rn - 1) % ({_PACK_L} // r.c) AS BIGINT) AS slot,
       CAST(((r.rn - 1) % ({_PACK_L} // r.c)) * r.c AS BIGINT)
           AS bin_offset
FROM r JOIN base USING (c)
"""


def _classed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n, c): positive-length docs with their length class."""
    toks = _docs(spark, sf_dir).select(
        "doc_id",
        F.coalesce(
            TX.ws_token_count("text").cast("bigint"), F.lit(0)
        ).alias("n"),
    ).filter(F.col("n") > 0)
    cls = F.lit(_PACK_CLASSES[-1])
    for c in reversed(_PACK_CLASSES[:-1]):
        cls = F.when(F.col("n") <= c, F.lit(c)).otherwise(cls)
    return toks.withColumn("c", cls.cast("bigint"))


@query("docs_pack_bestfit", _PACK_BESTFIT_ORACLE)
def q_docs_pack_bestfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing shelf packing: each document placed WHOLE
    in a 512-token bin — (doc_id, n_tokens, size_class, bin_id, slot,
    bin_offset). Docs round up to a power-of-two class; class-c bins
    hold 512/c docs at c-aligned offsets; within a class, docs pack
    in decreasing-length order (rank arithmetic, the distributable
    restriction of FFD). The no-split complement of
    docs_pack_sequences: zero fragmentation, bounded (<2x, >=50%
    shelf-utilization) padding — docs_pack_efficiency quantifies the
    trade against concatenate-and-chunk.

    Scale shape: rank-within-class comes from the two-level
    global_rank over the total order (class, length desc, doc_id) —
    range-partitioned parallel sorts, prefix sums only over the
    <=32-row partition-totals relation — minus a per-class offset
    from the <=7-row class-counts relation (broadcast). NO
    single-partition sort, NO data-sized window partition; every doc's
    (bin, slot) is closed-form from its rank."""
    from ..operators.window import global_rank

    cl = _classed(spark, sf_dir)
    ranked = global_rank(
        cl.withColumn("neg_n", -F.col("n")),
        ["c", "neg_n", "doc_id"],
    ).drop("neg_n")
    cnt = cl.groupBy("c").agg(F.count("*").alias("m"))
    cap = F.lit(_PACK_L) / F.col("c")  # exact: c divides 512
    w_c = Window.orderBy("c").rowsBetween(
        Window.unboundedPreceding, -1
    )
    meta = cnt.select(
        "c",
        F.coalesce(F.sum("m").over(w_c), F.lit(0)).alias("doc_off"),
        F.ceil(F.col("m") / cap).cast("bigint").alias("nb"),
    ).withColumn(
        "b0",
        F.coalesce(
            F.sum("nb").over(
                Window.orderBy("c").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    )
    j = ranked.join(F.broadcast(meta), "c")
    ric = F.col("rn") - F.col("doc_off") - 1  # 0-based rank in class
    cap_c = F.floor(F.lit(_PACK_L) / F.col("c")).cast("bigint")
    return j.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        F.col("c").alias("size_class"),
        (F.col("b0") + F.floor(ric / cap_c)).cast("bigint").alias(
            "bin_id"
        ),
        (ric % cap_c).cast("bigint").alias("slot"),
        ((ric % cap_c) * F.col("c")).cast("bigint").alias("bin_offset"),
    )


_PACK_EFF_ORACLE = rf"""
WITH t AS (
    SELECT doc_id, {_TOKCNT_SQL} AS n FROM documents
),
pos AS (SELECT doc_id, n FROM t WHERE n > 0),
chunk AS (
    SELECT doc_id, n,
           SUM(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n
               AS cb
    FROM pos
),
spans AS (
    SELECT ((cb + n - 1) // {_PACK_L} - cb // {_PACK_L} + 1) AS ns
    FROM chunk
),
cl AS (SELECT n, {_CLASS_CASE_SQL} AS c FROM pos),
shelf AS (
    SELECT CAST(SUM((m + ({_PACK_L} // c) - 1) // ({_PACK_L} // c))
               AS BIGINT) AS shelf_bins
    FROM (SELECT c, COUNT(*) AS m FROM cl GROUP BY 1)
),
tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS total_tokens,
           CAST(SUM(LEAST(n, {_PACK_L})) AS BIGINT) AS packed_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pos
)
SELECT tot.total_tokens, tot.n_docs,
       CAST((tot.total_tokens + {_PACK_L} - 1) // {_PACK_L} AS BIGINT)
           AS chunk_bins,
       (SELECT CAST(COUNT(*) FILTER (ns > 1) AS BIGINT) FROM spans)
           AS chunk_split_docs,
       (SELECT CAST(COUNT(*) FILTER (ns > 1) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) FROM spans)
           AS chunk_split_frac,
       shelf.shelf_bins,
       CAST(tot.packed_tokens AS DOUBLE)
           / CAST(shelf.shelf_bins * {_PACK_L} AS DOUBLE)
           AS shelf_util
FROM tot, shelf
"""


@query("docs_pack_efficiency", _PACK_EFF_ORACLE)
def q_docs_pack_efficiency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The packing-layout decision row: concatenate-and-chunk
    (docs_pack_sequences — minimal bins, splits documents) vs
    best-fit shelf packing (docs_pack_bestfit — zero splits, padded
    bins), one row: (total_tokens, n_docs, chunk_bins,
    chunk_split_docs, chunk_split_frac, shelf_bins, shelf_util).
    chunk_bins is also the bin-count lower bound, so
    shelf_bins/chunk_bins is exactly the padding overhead paid to
    never truncate a document's context.

    Scale shape: the chunk side reuses the distributed prefix-sum
    placement (packing.pack_sequences) + span arithmetic; the shelf
    side needs only per-class counts (one map-side-combined groupBy
    to <=7 rows). One final single-row agg each."""
    from ..operators import packing

    placed = packing.pack_sequences(_docs(spark, sf_dir)).filter(
        F.col("n_tokens") > 0
    )
    spans = placed.select(
        "n_tokens",
        (
            (
                (
                    F.col("seq_id") * _PACK_L
                    + F.col("seq_offset")
                    + F.col("n_tokens")
                    - 1
                )
                / _PACK_L
            ).cast("bigint")
            - F.col("seq_id")
            + 1
        ).alias("ns"),
    )
    split = F.sum(
        F.when(F.col("ns") > 1, 1).otherwise(0)
    ).cast("bigint")
    chunk = spans.agg(
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum(F.least(F.col("n_tokens"), F.lit(_PACK_L)))
        .cast("bigint")
        .alias("packed_tokens"),
        F.count("*").cast("bigint").alias("n_docs"),
        split.alias("chunk_split_docs"),
        (split.cast("double") / F.count("*").cast("double")).alias(
            "chunk_split_frac"
        ),
    )
    cl = _classed(spark, sf_dir)
    cap = F.lit(_PACK_L) / F.col("c")
    shelf = (
        cl.groupBy("c")
        .agg(F.count("*").alias("m"))
        .agg(
            F.sum(F.ceil(F.col("m") / cap).cast("bigint")).alias(
                "shelf_bins"
            )
        )
    )
    return chunk.crossJoin(F.broadcast(shelf)).select(
        "total_tokens",
        "n_docs",
        F.floor(
            (F.col("total_tokens") + _PACK_L - 1) / F.lit(_PACK_L)
        )
        .cast("bigint")
        .alias("chunk_bins"),
        "chunk_split_docs",
        "chunk_split_frac",
        "shelf_bins",
        (
            F.col("packed_tokens").cast("double")
            / (F.col("shelf_bins") * _PACK_L).cast("double")
        ).alias("shelf_util"),
    )


# -- Payload-level near-duplicate detection -----------------------------------
# The dedup matrix so far keys on text (exact/minhash/simhash),
# embeddings (cosine), and URLs; a multimodal corpus also needs
# BYTE-level dedup — re-encoded or re-downloaded assets whose bytes
# differ in a few spots. Identical payloads are one sha256 groupBy
# (the dedup_exact shape, and they surface here with jaccard = 1);
# near-duplicates need alignment-robust byte shingles: stride-1
# 8-byte grams (an insertion shifts every fixed block but preserves
# all other 8-grams).
#
# The candidate join is frequency-capped: 8-grams appearing in more
# than _PAYLOAD_DF_CAP docs are boilerplate (carry no identity
# signal) and are dropped BEFORE the self-join, so a bucket fans out
# at most C(cap,2) pairs — the same bounded-bucket discipline as
# MinHash LSH bands. Jaccard is computed over each doc's DISTINCT
# rare-gram set (the discriminative signature space); at sf0.01 the
# score is cleanly bimodal (25 pairs >= 0.5, next candidate < 0.3),
# calibrated against whole-payload 8-gram Jaccard ~0.99 on the same
# pairs.

_PAYLOAD_DF_CAP = 10
_PAYLOAD_J_MIN = 0.5

_PAYLOAD_DEDUP_ORACLE = f"""
WITH b AS (
    SELECT doc_id, encode(text) AS p FROM documents
    WHERE octet_length(encode(text)) >= 8
),
sh AS (
    SELECT DISTINCT doc_id, substr(to_hex(p), i * 2 + 1, 16) AS g
    FROM b,
         unnest(range(0, CAST(octet_length(p) AS BIGINT) - 7)) AS t(i)
),
freq AS (SELECT g FROM sh GROUP BY g HAVING COUNT(*) <= {_PAYLOAD_DF_CAP}),
rare AS (SELECT sh.doc_id, sh.g FROM sh JOIN freq USING (g)),
sz AS (SELECT doc_id, COUNT(*) AS n FROM rare GROUP BY 1),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_common
    FROM rare a JOIN rare b ON a.g = b.g AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
       CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common)
      >= {_PAYLOAD_J_MIN}e0
"""


@query("dedup_payload_shingle", _PAYLOAD_DEDUP_ORACLE)
def q_dedup_payload_shingle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Byte-payload near-duplicate pairs over the opaque binary
    column: Jaccard >= 0.5 over rare (df <= 10) stride-1 byte
    8-grams → (doc_a, doc_b, n_common, jaccard), doc_a < doc_b (under
    min-id survivor election doc_a is the survivor). Identical
    payloads surface with jaccard = 1; near-identical bytes
    (re-encodes, trailing-edit copies) score ~0.99 because stride-1
    grams are insertion-robust where fixed-offset blocks are not.

    Scale shape: shingling is one map-side explode (linear in bytes;
    a production variant swaps in content-defined chunks to cut the
    stride-1 constant, same plan shape); the df cap bounds every
    join bucket to <= C(10,2) pairs exactly like an LSH band; the
    pair rollup and two size joins are candidate-driven. Nothing
    quadratic outside the capped buckets."""
    from ..operators import multimodal

    b = (
        multimodal.attach_payload(_docs(spark, sf_dir))
        .select("doc_id", "payload")
        .filter(F.length("payload") >= 8)
    )
    hx = b.select("doc_id", F.hex("payload").alias("hx"))
    sh = (
        hx.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        (F.length("hx") / 2 - 8).cast("int"),
                    ),
                    lambda i: F.substring(
                        F.col("hx"), i * 2 + 1, 16
                    ),
                )
            ).alias("g"),
        )
        .distinct()
    )
    freq = (
        sh.groupBy("g")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= _PAYLOAD_DF_CAP)
        .select("g")
    )
    # rare feeds three consumers (sizes + both self-join sides);
    # localCheckpoint materializes the shingle stream once instead of
    # re-exploding the corpus per consumer
    rare = sh.join(freq, "g").localCheckpoint(eager=False)
    sz = rare.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = rare.select(F.col("doc_id").alias("doc_a"), "g")
    bb = rare.select(F.col("doc_id").alias("doc_b"), "g")
    inter = (
        a.join(bb, "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    j = (
        inter.join(
            sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_common")),
        )
    )
    return j.filter(F.col("jaccard") >= _PAYLOAD_J_MIN).select(
        "doc_a", "doc_b", "n_common", "jaccard"
    )


# -- Capped mixture-weight solver (water-filling) ------------------------------
# docs_mix_temperature_alloc computes the UNCONSTRAINED tau=1/2
# allocation; the practical allocator must respect per-source
# availability (you cannot draw 1.3 epochs from a source capped at
# 1). Water-filling: compute tentative sqrt-weighted shares of the
# remaining budget; sources whose share meets their cap FREEZE at the
# cap; redistribute the remaining budget over the remaining sources;
# repeat. Each round removes >=1 source or terminates, and on this
# corpus 2 freeze rounds suffice at every SF (measured: 97% budget
# caps 8/5/1 sources at sf0.001/0.01/0.1) — the plan unrolls
# _MIX_FREEZE_ROUNDS rounds and then ASSERTS convergence (any
# still-over-cap share raises rather than emitting a wrong
# allocation, the graph-fixpoint contract).
#
# Determinism: budget and caps are exact int64; each round's weight
# total folds IN SOURCE ORDER (sorted-list fold == DuckDB
# list_reduce); shares floor-quantize to int64 tokens via the
# identical double expression FLOOR((R * w) / W) on both sides.
# Residual risk is the standard quantized-float posture: a share
# landing within one ulp of an integer boundary could flip floor()
# cross-engine.

_MIX_FREEZE_ROUNDS = 3
_MIX_BUDGET_PCT = 97


def _mix_oracle() -> str:
    head = rf"""
WITH n AS (
    SELECT source,
           CAST(SUM(len(regexp_split_to_array(trim(text), '\s+')))
               AS BIGINT) AS n_tokens
    FROM documents GROUP BY 1
),
b AS (
    SELECT (SUM(n_tokens) * {_MIX_BUDGET_PCT}) // 100 AS budget FROM n
),
a0 AS (
    SELECT source, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS w,
           n_tokens AS cap
    FROM n
)"""
    rounds = []
    prev_a, prev_r = "a0", "(SELECT budget FROM b)"
    for k in range(1, _MIX_FREEZE_ROUNDS + 1):
        rounds.append(f""",
w{k} AS (
    SELECT list_reduce(list(w ORDER BY source), (x, y) -> x + y) AS wt
    FROM {prev_a}
),
s{k} AS (
    SELECT source, n_tokens, w, cap,
           CAST(FLOOR((CAST({prev_r} AS DOUBLE) * w)
               / (SELECT wt FROM w{k})) AS BIGINT) AS share
    FROM {prev_a}
),
f{k} AS (SELECT * FROM s{k} WHERE share >= cap),
a{k} AS (SELECT source, n_tokens, w, cap FROM s{k} WHERE share < cap),
r{k} AS (
    SELECT {prev_r} - COALESCE((SELECT SUM(cap) FROM f{k}), 0) AS rem
)""")
        prev_a, prev_r = f"a{k}", f"(SELECT rem FROM r{k})"
    K = _MIX_FREEZE_ROUNDS
    tail = f""",
wf AS (
    SELECT list_reduce(list(w ORDER BY source), (x, y) -> x + y) AS wt
    FROM a{K}
),
fin AS (
    SELECT source, n_tokens, cap,
           CAST(FLOOR((CAST((SELECT rem FROM r{K}) AS DOUBLE) * w)
               / (SELECT wt FROM wf)) AS BIGINT) AS alloc
    FROM a{K}
)
SELECT source, n_tokens, CAST(cap AS BIGINT) AS cap_tokens,
       CAST(alloc AS BIGINT) AS alloc_tokens, FALSE AS capped
FROM fin
{"".join(f'''UNION ALL
SELECT source, n_tokens, CAST(cap AS BIGINT) AS cap_tokens,
       CAST(cap AS BIGINT) AS alloc_tokens, TRUE AS capped
FROM f{k}
''' for k in range(1, K + 1))}"""
    return head + "".join(rounds) + tail


def _sorted_weight_sum(df: DataFrame) -> DataFrame:
    """1-row (wt): the active sources' weights folded in source
    order — the sorted-fold == list_reduce equivalence
    docs_mix_temperature_alloc established."""
    return (
        df.select(F.struct("source", "w").alias("s"))
        .agg(F.array_sort(F.collect_list("s")).alias("a"))
        .select(
            F.aggregate(
                F.transform("a", lambda s: s["w"]),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("wt")
        )
    )


@query("docs_mix_capped_alloc", _mix_oracle())
def q_docs_mix_capped_alloc(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Constrained mixture allocator: sqrt-temperature token shares
    under per-source availability caps (1 epoch), budget = 97% of
    corpus tokens, excess from capped sources redistributed by
    water-filling → (source, n_tokens, cap_tokens, alloc_tokens,
    capped). The solver step docs_mix_temperature_alloc's
    unconstrained answer needs before it can drive a real sampler.

    Scale shape: ONE map-side-combined count shuffle to the
    |sources|-row relation; every solver round is arithmetic over
    that bounded relation (1-row folds broadcast back) — cost is
    independent of corpus size. Convergence is ASSERTED in-plan
    after the fixed 3 freeze rounds (assert_true on the final
    shares), so a corpus needing a 4th round fails loudly instead of
    over-allocating."""
    n = (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.sum(F.size(TX.tokens("text")))
            .cast("bigint")
            .alias("n_tokens")
        )
    )
    a = n.select(
        "source",
        "n_tokens",
        F.sqrt(F.col("n_tokens").cast("double")).alias("w"),
        F.col("n_tokens").alias("cap"),
    ).localCheckpoint(eager=False)
    budget = a.agg(
        F.expr(f"(sum(cap) * {_MIX_BUDGET_PCT}) DIV 100").alias("rem")
    )
    frozen = []
    rem = budget
    for _ in range(_MIX_FREEZE_ROUNDS):
        wt = _sorted_weight_sum(a)
        s = (
            a.crossJoin(F.broadcast(rem))
            .crossJoin(F.broadcast(wt))
            .withColumn(
                "share",
                F.floor(
                    (F.col("rem").cast("double") * F.col("w"))
                    / F.col("wt")
                ).cast("bigint"),
            )
        )
        s = s.localCheckpoint(eager=False)
        frozen.append(
            s.filter(F.col("share") >= F.col("cap")).select(
                "source",
                "n_tokens",
                F.col("cap").cast("bigint").alias("cap_tokens"),
                F.col("cap").cast("bigint").alias("alloc_tokens"),
                F.lit(True).alias("capped"),
            )
        )
        newly_capped = s.filter(F.col("share") >= F.col("cap"))
        rem = (
            s.crossJoin(
                F.broadcast(
                    newly_capped.agg(
                        F.coalesce(F.sum("cap"), F.lit(0)).alias(
                            "__freed"
                        )
                    )
                )
            )
            .select((F.col("rem") - F.col("__freed")).alias("rem"))
            .limit(1)
        )
        a = s.filter(F.col("share") < F.col("cap")).select(
            "source", "n_tokens", "w", "cap"
        )
    wt = _sorted_weight_sum(a)
    fin = (
        a.crossJoin(F.broadcast(rem))
        .crossJoin(F.broadcast(wt))
        .withColumn(
            "alloc",
            F.floor(
                (F.col("rem").cast("double") * F.col("w"))
                / F.col("wt")
            ).cast("bigint"),
        )
        .withColumn(
            "__conv",
            F.assert_true(
                F.col("alloc") < F.col("cap"),
                F.lit(
                    "docs_mix_capped_alloc: a source still exceeds "
                    "its cap after the unrolled freeze rounds — "
                    "raise _MIX_FREEZE_ROUNDS"
                ),
            ),
        )
    )
    uncapped = fin.select(
        "source",
        "n_tokens",
        F.col("cap").cast("bigint").alias("cap_tokens"),
        (
            F.col("alloc")
            + F.coalesce(F.col("__conv").cast("bigint"), F.lit(0))
        ).alias("alloc_tokens"),
        F.lit(False).alias("capped"),
    )
    out = uncapped
    for fr in frozen:
        out = out.unionByName(fr)
    return out


# -- Incremental payload dedup -------------------------------------------------
# Completes the incremental-dedup family across all FIVE signatures:
# exact hash (dedup_incremental), MinHash (dedup_minhash_incremental),
# embedding (dedup_embedding_incremental), SimHash
# (dedup_simhash_incremental) — and now raw bytes. The day's batch
# (source 'src0', the family's split convention) probes the corpus's
# rare-gram inventory; the ingest question is CONTAINMENT ("how much
# of this new file's discriminative bytes already exist in its
# closest corpus partner"), not symmetric Jaccard — a small re-encode
# of a large stored asset should still flag.
#
# In production the corpus side is a STORED (gram, doc_id) index over
# corpus-rare grams (write-once per ingested partition, same
# append-only discipline as the simhash fingerprint index); rarity is
# a corpus-side statistic, so the batch never changes the index it
# probes.

_PAYLOAD_INCR_MIN_CONTAIN = 0.5

_PAYLOAD_INCR_ORACLE = f"""
WITH b AS (
    SELECT doc_id, source, encode(text) AS p FROM documents
    WHERE octet_length(encode(text)) >= 8
),
sh AS (
    SELECT DISTINCT doc_id, source,
           substr(to_hex(p), i * 2 + 1, 16) AS g
    FROM b,
         unnest(range(0, CAST(octet_length(p) AS BIGINT) - 7)) AS t(i)
),
corpus AS (SELECT doc_id, g FROM sh WHERE source <> 'src0'),
freq AS (SELECT g FROM corpus GROUP BY g
         HAVING COUNT(*) <= {_PAYLOAD_DF_CAP}),
crare AS (SELECT c.doc_id, c.g FROM corpus c JOIN freq USING (g)),
brare AS (
    SELECT s.doc_id, s.g FROM sh s JOIN freq USING (g)
    WHERE s.source = 'src0'
),
na AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM brare GROUP BY 1),
inter AS (
    SELECT b.doc_id, c.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM brare b JOIN crare c ON b.g = c.g GROUP BY 1, 2
)
SELECT i.doc_id,
       CAST(min_by(doc_b, (na.n - i.c) * 281474976710656 + doc_b)
           AS BIGINT) AS dup_of,
       MAX(i.c) AS n_common,
       CAST(MAX(i.c) AS DOUBLE) / CAST(MIN(na.n) AS DOUBLE)
           AS containment
FROM inter i JOIN na ON na.doc_id = i.doc_id
GROUP BY i.doc_id
HAVING CAST(MAX(i.c) AS DOUBLE) / CAST(MIN(na.n) AS DOUBLE)
       >= {_PAYLOAD_INCR_MIN_CONTAIN}e0
"""


@query("dedup_payload_incremental", _PAYLOAD_INCR_ORACLE)
def q_dedup_payload_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Daily-ingest byte-payload near-dup: the batch's (source 'src0')
    rare byte 8-grams probe the corpus's rare-gram inventory; per
    batch doc the corpus partner covering the most of its
    discriminative grams, kept when containment >= 0.5 →
    (doc_id, dup_of, n_common, containment). Containment (not
    Jaccard) is the ingest-side score: a small re-encode of a large
    stored asset still flags. Completes the incremental-dedup family
    (exact / MinHash / embedding / SimHash / bytes).

    Scale shape: rarity (df <= 10) is a corpus-side statistic — the
    stored-index production shape — so every join bucket fans out
    <= df_cap corpus partners per batch gram; standing per-day cost
    is batch-grams vs the index projection, the corpus is never
    re-shingled. Winner per batch doc is min_by on a composite
    scalar ((na - c) in the high bits: maximize coverage, tie ->
    smallest partner id) through map-side partial merges — no window
    over candidates."""
    from ..operators import multimodal

    b = (
        multimodal.attach_payload(
            _docs(spark, sf_dir).select("doc_id", "text", "source")
        )
        .join(
            _docs(spark, sf_dir).select("doc_id", "source"), "doc_id"
        )
        .select("doc_id", "source", "payload")
        .filter(F.length("payload") >= 8)
    )
    hx = b.select("doc_id", "source", F.hex("payload").alias("hx"))
    sh = (
        hx.select(
            "doc_id",
            "source",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        (F.length("hx") / 2 - 8).cast("int"),
                    ),
                    lambda i: F.substring(
                        F.col("hx"), i * 2 + 1, 16
                    ),
                )
            ).alias("g"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    corpus = sh.filter(F.col("source") != "src0").select("doc_id", "g")
    freq = (
        corpus.groupBy("g")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= _PAYLOAD_DF_CAP)
        .select("g")
    )
    crare = corpus.join(freq, "g").localCheckpoint(eager=False)
    brare = (
        sh.filter(F.col("source") == "src0")
        .select("doc_id", "g")
        .join(freq, "g")
        .localCheckpoint(eager=False)
    )
    na = brare.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n")
    )
    inter = (
        brare.join(
            crare.select(F.col("doc_id").alias("doc_b"), "g"), "g"
        )
        .groupBy("doc_id", "doc_b")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    key = (F.col("n") - F.col("c")) * F.lit(281474976710656) + F.col(
        "doc_b"
    )
    return (
        inter.join(na, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.min_by("doc_b", key).alias("dup_of"),
            F.max("c").alias("n_common"),
            (
                F.max("c").cast("double")
                / F.min("n").cast("double")
            ).alias("containment"),
        )
        .filter(F.col("containment") >= _PAYLOAD_INCR_MIN_CONTAIN)
    )


# -- Corpus duplication spectrum (hash doubling) -------------------------------
# The suffix-array dedup diagnostic (the "deduplicating training data"
# exact-substring line of work): for every window length 2^k, how much
# of the corpus token stream is part of a duplicated window. Naive
# evaluation re-shingles the corpus per k (sum_k N*2^k tokens touched);
# HASH DOUBLING computes every level in O(N) per round: a 2^k-window
# fingerprint is md5(h_{k-1}(pos) || h_{k-1}(pos + 2^(k-1))), so each
# round is ONE position-shift self-join of an N-row relation — the
# text is never touched again after round 0. Rank-style prefix
# doubling would need a dense-rank (two extra shuffles) per round;
# md5 doubling gets content-identity modulo collisions (~2^-64,
# identical in both engines, the repo-wide digest posture).
#
# Per-doc unique sentinels (chr(1) || doc_id) terminate each doc, so
# windows spanning a document boundary contain a globally unique
# token and can never count as duplicated — the generalized-suffix-
# array trick.

_SPECTRUM_ROUNDS = 8  # windows 2^0 .. 2^8 = 256 tokens


def _spectrum_oracle() -> str:
    from ..operators.textdup import oracle_level_ctes

    per_k = "\n  UNION ALL ".join(
        f"SELECT {k} AS k, h, COUNT(*) AS cnt FROM h{k} GROUP BY 1, 2"
        for k in range(_SPECTRUM_ROUNDS + 1)
    )
    return (
        oracle_level_ctes(_SPECTRUM_ROUNDS)
        + f"""
SELECT CAST(k AS BIGINT) AS k, CAST(1 << k AS BIGINT) AS win_tokens,
       CAST(COALESCE(SUM(cnt) FILTER (cnt >= 2), 0) AS BIGINT)
           AS n_dup_positions,
       CAST(COUNT(*) FILTER (cnt >= 2) AS BIGINT) AS n_dup_windows,
       CAST(MAX(cnt) AS BIGINT) AS max_multiplicity
FROM (
  {per_k}
) GROUP BY k
"""
    )


@query("docs_dup_spectrum", _spectrum_oracle())
def q_docs_dup_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication spectrum: for every window length
    2^k (k = 0..8), the number of corpus positions whose 2^k-token
    window occurs elsewhere, the number of distinct duplicated
    windows, and the worst multiplicity → (k, win_tokens,
    n_dup_positions, n_dup_windows, max_multiplicity). THE
    suffix-array-dedup tuning curve: pick the removal threshold where
    the spectrum's mass collapses (here 2 -> 4 tokens drops ~10x).

    Scale shape: hash doubling — round k is ONE equi-join of the
    N-row (pos, digest) relation onto itself shifted by 2^(k-1)
    (position is the join key; range partitioning keeps the shift
    join co-located), so all 9 levels cost O(9N) joins and the TEXT
    is scanned exactly once (round 0). Per-doc sentinel tokens make
    cross-document windows unique, so no window survives a doc
    boundary. Corpus positions come from the same two-level prefix
    sum as docs_pack_sequences — no single-partition window."""
    from ..operators import textdup

    level0, _ = textdup.position_stream(_docs(spark, sf_dir))
    levels = textdup.hash_doubling_levels(level0, _SPECTRUM_ROUNDS)
    out = None
    for k, lvl in enumerate(levels):
        cnt = lvl.groupBy("h").agg(F.count("*").alias("cnt"))
        row = cnt.agg(
            F.lit(k).cast("bigint").alias("k"),
            F.lit(1 << k).cast("bigint").alias("win_tokens"),
            F.coalesce(
                F.sum(F.when(F.col("cnt") >= 2, F.col("cnt"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_dup_positions"),
            F.sum(F.when(F.col("cnt") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_windows"),
            F.max("cnt").cast("bigint").alias("max_multiplicity"),
        )
        out = row if out is None else out.unionByName(row)
    return out


@query("stream_payload_dedup", _PAYLOAD_DEDUP_ORACLE)
def q_stream_payload_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of dedup_payload_shingle: 3-batch AvailableNow
    ingest maintaining an append-only payload-gram index; candidates
    admitted per batch under the sound grows-only df-cap prune;
    post-drain exact verify off the index (text shingled once, per
    batch). Equals the batch query after the drain, so the batch SQL
    oracle applies verbatim (streaming/jobs.payload_dedup_stream)."""
    from ..streaming import jobs as stream_jobs

    return stream_jobs.payload_dedup_stream(spark, sf_dir)


# -- Per-document longest duplicated run ---------------------------------------
# The spectrum aggregates corpus-wide; the REMOVAL decision is
# per-document: the longest (power-of-two-resolved) window in each
# doc that occurs elsewhere in the corpus. Exact-substring dedup
# policies delete or trim docs whose longest duplicated run exceeds a
# threshold — this is that triage column. Any duplicated window
# starting inside a doc lies entirely within it (a window crossing
# the boundary contains the doc's unique sentinel and cannot be
# duplicated), so the per-doc max is exact, not clipped.


def _maxrun_oracle() -> str:
    from ..operators.textdup import oracle_level_ctes

    per_k = "\n    UNION ALL ".join(
        f"""SELECT dp.doc_id, {k} AS k
    FROM h{k} l JOIN dup{k} USING (h) JOIN docpos dp USING (pos)"""
        for k in range(_SPECTRUM_ROUNDS + 1)
    )
    dups = "".join(
        f""",
dup{k} AS MATERIALIZED (
    SELECT h FROM h{k} GROUP BY h HAVING COUNT(*) >= 2
)"""
        for k in range(_SPECTRUM_ROUNDS + 1)
    )
    return (
        oracle_level_ctes(_SPECTRUM_ROUNDS)
        + dups
        + f""",
flags AS (
    {per_k}
)
SELECT d.doc_id,
       CAST(COALESCE(1 << MAX(f.k), 0) AS BIGINT) AS max_dup_win
FROM d LEFT JOIN flags f USING (doc_id)
GROUP BY d.doc_id
"""
    )


@query("docs_dup_maxrun", _maxrun_oracle())
def q_docs_dup_maxrun(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document longest duplicated window (power-of-two
    resolution): for each doc the largest 2^k such that some
    2^k-token window of the doc occurs elsewhere in the corpus →
    (doc_id, max_dup_win; 0 when even its 1-grams are unique). The
    per-document removal criterion behind exact-substring dedup
    ("drop/trim docs sharing a >= 64-token run with anything else"),
    resolved from the SAME hash-doubling levels as docs_dup_spectrum
    — the text is scanned once, each level once.

    Scale shape: per level, duplicated digests come from one
    groupBy(h) (map-side combined); flagged positions join back to
    the position->doc map (both sides shrink with k); the final
    per-doc max is one groupBy. Nothing rescans text; no data-sized
    window."""
    from ..operators import textdup

    level0, docmap = textdup.position_stream(_docs(spark, sf_dir))
    levels = textdup.hash_doubling_levels(level0, _SPECTRUM_ROUNDS)
    flags = None
    for k, lvl in enumerate(levels):
        dup = (
            lvl.groupBy("h")
            .agg(F.count("*").alias("cnt"))
            .filter(F.col("cnt") >= 2)
            .select("h")
        )
        f_k = (
            lvl.join(dup, "h")
            .join(docmap, "pos")
            .select("doc_id", F.lit(k).alias("k"))
            .distinct()
        )
        flags = f_k if flags is None else flags.unionByName(f_k)
    all_docs = _docs(spark, sf_dir).select("doc_id")
    best = flags.groupBy("doc_id").agg(F.max("k").alias("mk"))
    return (
        all_docs.join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                F.expr("cast(1 as bigint) * (1 << mk)"),
                F.lit(0),
            )
            .cast("bigint")
            .alias("max_dup_win"),
        )
    )


# -- Multi-model marketing attribution -----------------------------------------
# The events analytics family has funnels, sessions, and sequence
# patterns; ATTRIBUTION is the decision layer on top: when a purchase
# closes a journey, which touch channels get the credit? The three
# standard position rules in ONE pass: first-touch, last-touch, and
# linear (1/n per touch, floor-quantized to integer micro-credits so
# the sums are order-free exact int64 — the repo-wide posture for
# cross-engine additive floats).
#
# A journey = a user's events since their previous purchase; the
# purchase that closes it carries the conversion. Zero-touch
# conversions (a purchase with no preceding touch) credit nobody.

_ATTR_ORACLE = """
WITH e AS (
    SELECT user_id, event_type, ts, event_id,
           COUNT(*) FILTER (event_type = 'purchase') OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS jid
    FROM events
),
j AS (
    SELECT user_id, jid,
           COUNT(*) FILTER (event_type <> 'purchase') AS n_touch,
           COUNT(*) FILTER (event_type = 'purchase') AS closed,
           min_by(event_type, CASE WHEN event_type <> 'purchase'
                  THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS first_ch,
           max_by(event_type, CASE WHEN event_type <> 'purchase'
                  THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS last_ch
    FROM e GROUP BY 1, 2
),
conv AS (SELECT * FROM j WHERE closed > 0 AND n_touch > 0),
touches AS (
    SELECT e.event_type AS channel, c.n_touch
    FROM e JOIN conv c
      ON e.user_id = c.user_id AND e.jid = c.jid
    WHERE e.event_type <> 'purchase'
)
SELECT ch.channel,
       CAST(COALESCE(f.n, 0) AS BIGINT) AS first_touch,
       CAST(COALESCE(l.n, 0) AS BIGINT) AS last_touch,
       CAST(COALESCE(t.micro, 0) AS BIGINT) AS linear_micro
FROM (SELECT DISTINCT event_type AS channel FROM events
      WHERE event_type <> 'purchase') ch
LEFT JOIN (SELECT first_ch AS channel, COUNT(*) AS n FROM conv
           GROUP BY 1) f USING (channel)
LEFT JOIN (SELECT last_ch AS channel, COUNT(*) AS n FROM conv
           GROUP BY 1) l USING (channel)
LEFT JOIN (SELECT channel, SUM(1000000 // n_touch) AS micro
           FROM touches GROUP BY 1) t USING (channel)
"""


@query("events_attribution_models", _ATTR_ORACLE)
def q_events_attribution_models(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multi-model conversion attribution in one pass: per channel,
    conversions credited first-touch, last-touch, and linearly
    (integer micro-credits: floor(1e6 / n_touches) per touch, an
    order-free exact int64 sum) → (channel, first_touch, last_touch,
    linear_micro). A journey is a user's events since their previous
    purchase; the closing purchase converts it; zero-touch
    conversions credit nobody.

    Timestamp ties within a journey break on event_id for the
    journey SPLIT; first/last election keys on the event timestamp in
    microseconds (min_by/max_by over a scalar — ties impossible on
    this corpus's microsecond grid, and a tie would surface as a
    hash mismatch, not silent drift).

    Scale shape: one user-keyed shuffle feeds both the running
    purchase count and the journey rollup (same partitioning reused);
    journeys relation ~ #purchases; the per-channel rollups are
    bounded by |channels|. No data-sized unpartitioned window."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    e = ev.withColumn(
        "jid",
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).over(w),
            F.lit(0),
        ),
    )
    tkey = F.when(
        F.col("event_type") != "purchase", F.unix_micros("ts")
    )
    j = e.groupBy("user_id", "jid").agg(
        F.sum(
            F.when(F.col("event_type") != "purchase", 1).otherwise(0)
        ).alias("n_touch"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("closed"),
        F.min_by("event_type", tkey).alias("first_ch"),
        F.max_by("event_type", tkey).alias("last_ch"),
    )
    conv = j.filter((F.col("closed") > 0) & (F.col("n_touch") > 0))
    touches = (
        e.filter(F.col("event_type") != "purchase")
        .join(
            conv.select("user_id", "jid", "n_touch"),
            ["user_id", "jid"],
        )
        .select(F.col("event_type").alias("channel"), "n_touch")
    )
    channels = (
        ev.filter(F.col("event_type") != "purchase")
        .select(F.col("event_type").alias("channel"))
        .distinct()
    )
    f = conv.groupBy(F.col("first_ch").alias("channel")).agg(
        F.count("*").alias("fn")
    )
    l = conv.groupBy(F.col("last_ch").alias("channel")).agg(
        F.count("*").alias("ln")
    )
    t = touches.groupBy("channel").agg(
        F.sum(F.expr("1000000 DIV n_touch")).alias("micro")
    )
    return (
        channels.join(f, "channel", "left")
        .join(l, "channel", "left")
        .join(t, "channel", "left")
        .select(
            "channel",
            F.coalesce("fn", F.lit(0)).cast("bigint").alias(
                "first_touch"
            ),
            F.coalesce("ln", F.lit(0)).cast("bigint").alias(
                "last_touch"
            ),
            F.coalesce("micro", F.lit(0)).cast("bigint").alias(
                "linear_micro"
            ),
        )
    )


# -- Markov removal-effect attribution -----------------------------------------
# The data-driven complement to the position rules
# (events_attribution_models): build the journey transition chain
# (START -> touches -> purchase/NULL), and score each channel by its
# REMOVAL EFFECT — how much the chain's conversion probability drops
# when paths through that channel are cut (redirected to the NULL
# absorber), the standard Markov attribution construction.
#
# Conversion probability is the K-step absorption probability
# (K = 8 unrolled value-iteration steps — a pinned, deterministic
# metric rather than an iterate-to-tolerance fixpoint; the journey
# length distribution makes the K-step and exact absorption rankings
# agree). Both engines fold each state's update IN DESTINATION ORDER
# (sorted-list fold == list_reduce ORDER BY dst), so every double is
# the same IEEE op sequence.
#
# Scale shape: the data-sized work is ONE user-keyed shuffle (journey
# split + consecutive-pair extraction); the transition matrix is
# <= (|channels|+2)^2 rows — a bounded driver artifact (the PCA d x d
# Gram precedent) — and the 5 chains x 8 steps run on it driver-side,
# mirrored step-for-step by the oracle's unrolled CTEs.

_MARKOV_K = 8
_MARKOV_CHANNELS = ("click", "error", "signup", "view")

_MARKOV_TRANS_SQL = """
e AS (
    SELECT user_id, event_type, ts, event_id,
           COUNT(*) FILTER (event_type = 'purchase') OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS jid
    FROM events
),
seq AS (
    SELECT user_id, jid, event_type,
           row_number() OVER w AS rn,
           lead(event_type) OVER w AS nxt
    FROM e
    WINDOW w AS (PARTITION BY user_id, jid ORDER BY ts, event_id)
),
tr AS (
    SELECT 'START' AS src, event_type AS dst FROM seq WHERE rn = 1
    UNION ALL
    SELECT event_type, nxt FROM seq WHERE nxt IS NOT NULL
    UNION ALL
    SELECT event_type, 'NULL' FROM seq
    WHERE nxt IS NULL AND event_type <> 'purchase'
),
cnts AS MATERIALIZED (
    SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM tr GROUP BY 1, 2
),
bigt AS MATERIALIZED (
    SELECT src, dst,
           CAST(cnt AS DOUBLE)
               / CAST(SUM(cnt) OVER (PARTITION BY src) AS DOUBLE) AS p
    FROM cnts
)"""


def _markov_chain_ctes(tag: str, removed: str | None) -> str:
    """CTEs for one chain: redirected transitions + K unrolled
    value-iteration steps. p{tag}{K} holds (state, p)."""
    if removed is None:
        redirect = "SELECT src, dst, SUM(p) AS p FROM bigt GROUP BY 1, 2"
    else:
        redirect = f"""
    SELECT src,
           CASE WHEN dst = '{removed}' THEN 'NULL' ELSE dst END AS dst,
           SUM(p) AS p
    FROM bigt WHERE src <> '{removed}' GROUP BY 1, 2"""
    out = f""",
t{tag} AS MATERIALIZED ({redirect}),
p{tag}0 AS MATERIALIZED (
    SELECT DISTINCT src AS state, 0e0 AS p FROM t{tag}
)"""
    for k in range(1, _MARKOV_K + 1):
        out += f""",
p{tag}{k} AS MATERIALIZED (
    SELECT t.src AS state,
           list_reduce(
               list(t.p * CASE WHEN t.dst = 'purchase' THEN 1e0
                               WHEN t.dst = 'NULL' THEN 0e0
                               ELSE COALESCE(pk.p, 0e0) END
                    ORDER BY t.dst),
               (a, b) -> a + b) AS p
    FROM t{tag} t LEFT JOIN p{tag}{k - 1} pk ON pk.state = t.dst
    GROUP BY 1
)"""
    return out


def _markov_oracle() -> str:
    K = _MARKOV_K
    chains = _markov_chain_ctes("f", None) + "".join(
        _markov_chain_ctes(f"r{i}", c)
        for i, c in enumerate(_MARKOV_CHANNELS)
    )
    rows = "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS channel,
       (SELECT p FROM pf{K} WHERE state = 'START') AS p_conv_base,
       (SELECT p FROM pr{i}{K} WHERE state = 'START') AS p_conv_removed,
       1e0 - (SELECT p FROM pr{i}{K} WHERE state = 'START')
           / (SELECT p FROM pf{K} WHERE state = 'START')
           AS removal_effect"""
        for i, c in enumerate(_MARKOV_CHANNELS)
    )
    return f"WITH {_MARKOV_TRANS_SQL}{chains}\n{rows}"


def _markov_pconv(
    T: dict[tuple[str, str], float], removed: str | None
) -> float:
    """Driver-side mirror of the oracle's unrolled value iteration:
    identical redirect, identical sorted-destination fold, identical
    IEEE op sequence per step."""
    trans: dict[tuple[str, str], float] = {}
    for (s, d), p in T.items():
        if s == removed:
            continue
        dd = "NULL" if d == removed else d
        # the redirect merges at most two terms; IEEE addition of two
        # floats is commutative, so dict order cannot matter
        trans[(s, dd)] = trans.get((s, dd), 0.0) + p
    states = sorted({s for s, _ in trans})
    cur = {s: 0.0 for s in states}
    for _ in range(_MARKOV_K):
        nxt = {}
        for s in states:
            tot = 0.0
            for d in sorted(d for (ss, d) in trans if ss == s):
                pd = (
                    1.0
                    if d == "purchase"
                    else (0.0 if d == "NULL" else cur.get(d, 0.0))
                )
                tot += trans[(s, d)] * pd
            nxt[s] = tot
        cur = nxt
    return cur["START"]


@query("events_attribution_markov", _markov_oracle())
def q_events_attribution_markov(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Markov removal-effect attribution: per channel, the drop in
    the journey chain's 8-step conversion probability when paths
    through that channel are cut → (channel, p_conv_base,
    p_conv_removed, removal_effect). The data-driven counterpart of
    events_attribution_models' position rules: a channel earns credit
    for being LOAD-BEARING in converting paths, not for where it
    happens to sit.

    Scale shape: one user-keyed shuffle extracts journey transitions
    (the same split as the position models); the transition matrix is
    a <= (|channels|+2)^2-row bounded driver artifact (the PCA Gram
    precedent), and the 5 chains x 8 value-iteration steps run on it
    driver-side — mirrored step-for-step (same redirect, same
    sorted-destination IEEE fold) by the oracle's unrolled CTEs."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    e = ev.withColumn(
        "jid",
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).over(w),
            F.lit(0),
        ),
    )
    wj = Window.partitionBy("user_id", "jid").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.row_number().over(wj).alias("rn"),
        F.lead("event_type").over(wj).alias("nxt"),
    )
    trans = (
        seq.filter(F.col("rn") == 1)
        .select(
            F.lit("START").alias("src"),
            F.col("event_type").alias("dst"),
        )
        .unionByName(
            seq.filter(F.col("nxt").isNotNull()).select(
                F.col("event_type").alias("src"),
                F.col("nxt").alias("dst"),
            )
        )
        .unionByName(
            seq.filter(
                F.col("nxt").isNull()
                & (F.col("event_type") != "purchase")
            ).select(
                F.col("event_type").alias("src"),
                F.lit("NULL").alias("dst"),
            )
        )
        .groupBy("src", "dst")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    rows = trans.collect()  # bounded: <= (|channels|+2)^2 rows
    out_tot: dict[str, float] = {}
    for r in rows:
        out_tot[r["src"]] = out_tot.get(r["src"], 0) + r["cnt"]
    T = {
        (r["src"], r["dst"]): r["cnt"] / out_tot[r["src"]]
        for r in rows
    }
    base = _markov_pconv(T, None)
    data = [
        (
            c,
            base,
            _markov_pconv(T, c),
            1.0 - _markov_pconv(T, c) / base,
        )
        for c in _MARKOV_CHANNELS
    ]
    return spark.createDataFrame(
        data,
        "channel string, p_conv_base double, "
        "p_conv_removed double, removal_effect double",
    )


# -- Content-defined chunking (gear hash) ---------------------------------------
# The production byte-dedup primitive the stride-1 8-gram queries
# approximate: cut the payload at positions where a rolling GEAR hash
# of the last 32 bytes hits a mask (h % 64 == 0 → ~64-byte average
# chunks). Boundaries are a pure LOCAL function of the trailing
# window — an insertion shifts content but every boundary outside the
# edited neighborhood re-synchronizes, so near-identical payloads
# share almost all chunk hashes (the rsync/LBFS/backup-dedup
# property). Because the window is fixed at 32 bytes, h(pos) is
# expressible WITHOUT sequential recursion as a 32-term fold per
# position — both engines evaluate the identical nested
# transform/aggregate HOFs (O(32·n_bytes) per doc, linear, JVM-side).
#
# The gear table is md5-derived per byte value (first 8 hex chars →
# int32 range), identical in both engines; all arithmetic is mod 2^32
# (explicit `% 4294967296` — no engine-specific shift-overflow
# semantics in play).

import hashlib as _hashlib

_GEAR = tuple(
    int(_hashlib.md5(str(b).encode()).hexdigest()[:8], 16)
    for b in range(256)
)

_CDC_ORACLE = r"""
WITH gear AS (
    SELECT list_transform(range(0, 256),
        b -> ('0x' || substr(md5(CAST(b AS VARCHAR)), 1, 8))::BIGINT
    ) AS g
),
d AS (
    SELECT doc_id, lower(to_hex(encode(text))) AS hx,
           CAST(octet_length(encode(text)) AS BIGINT) AS nb
    FROM documents
),
bytes AS MATERIALIZED (
    SELECT doc_id, nb, hx, g,
           list_transform(range(0, nb),
               i -> ('0x' || substr(hx, CAST(i*2+1 AS INT), 2))::BIGINT
           ) AS bv
    FROM d, gear
),
bounds AS MATERIALIZED (
    SELECT doc_id, nb, hx,
           list_filter(range(0, nb),
               p -> list_reduce(
                        list_transform(
                            range(0, CAST(LEAST(p + 1, 32) AS BIGINT)),
                            j -> (g[CAST(bv[CAST(p - j + 1 AS INT)]
                                         AS INT) + 1]
                                  * (1 << j)) % 4294967296),
                        (a, b) -> (a + b) % 4294967296) % 64 = 0
                    AND p >= 31) AS cuts
    FROM bytes
)
SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
       CAST(s AS BIGINT) AS start_byte,
       CAST(e - s + 1 AS BIGINT) AS chunk_len,
       md5(substr(hx, CAST(s * 2 + 1 AS INT),
                  CAST((e - s + 1) * 2 AS INT))) AS chunk_md5
FROM (
    SELECT doc_id, nb, hx, cuts, ci,
           CASE WHEN ci = 0 THEN 0
                ELSE cuts[CAST(ci AS INT)] + 1 END AS s,
           CASE WHEN ci = len(cuts) THEN nb - 1
                ELSE cuts[CAST(ci + 1 AS INT)] END AS e
    FROM bounds, unnest(range(0, len(cuts) + 1)) AS t(ci)
)
"""


@query("multimodal_cdc_chunks", _CDC_ORACLE)
def q_multimodal_cdc_chunks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Content-defined chunk manifest over the opaque binary payload:
    gear-hash boundaries (32-byte rolling window, mask 64 → ~64-byte
    chunks) → (doc_id, chunk_idx, start_byte, chunk_len, chunk_md5).
    Boundaries re-synchronize after an edit, so near-identical
    payloads share almost all chunk hashes — the
    rsync/LBFS/backup-dedup primitive, and the production scale path
    the stride-1 8-gram dedup queries name.

    Scale shape: entirely map-side — per doc one nested HOF pass
    (O(32·n_bytes), JVM-evaluated, no Python) and one explode to
    ~n_bytes/64 manifest rows; zero exchanges before any downstream
    chunk-hash groupBy. The 32-byte fixed window is what makes each
    boundary a pure local function (no sequential scan, no
    recursion)."""
    from ..operators import multimodal

    b = multimodal.attach_payload(_docs(spark, sf_dir)).select(
        "doc_id", "payload"
    )
    d = b.select(
        "doc_id",
        F.lower(F.hex("payload")).alias("hx"),
        F.length("payload").cast("bigint").alias("nb"),
    )
    # The gear table embeds as 256 int64 LITERALS (python md5 ==
    # engine md5 of the same decimal strings). A transform()-built
    # array column here would be project-collapsed into the lambda
    # below and re-evaluated PER ELEMENT ACCESS (the round-9
    # HOF-closure trap: 8M accesses x 256 md5 calls hung the first
    # version); literals constant-fold instead.
    g_lit = "array(" + ", ".join(f"{v}L" for v in _GEAR) + ")"
    withbv = d.withColumn(
        "bv",
        F.expr(
            "transform(sequence(0, cast(nb as int) - 1), "
            "i -> cast(conv(substr(hx, i*2+1, 2), 16, 10) as bigint))"
        ),
        # localCheckpoint materializes bv as a physical array column —
        # without the barrier CollapseProject inlines the transform()
        # into every element_at() below (same trap as the gear table)
    ).localCheckpoint(eager=False)
    cuts = withbv.withColumn(
        "cuts",
        F.expr(
            f"""
filter(sequence(0, cast(nb as int) - 1),
  p -> aggregate(
         transform(sequence(0, cast(least(p + 1, 32) as int) - 1),
           j -> (element_at({g_lit},
                            cast(element_at(bv, p - j + 1) as int) + 1)
                 * shiftleft(1L, j)) % 4294967296L),
         0L, (a, b) -> (a + b) % 4294967296L) % 64 = 0
       AND p >= 31)
"""
        ),
    ).select("doc_id", "hx", "nb", "cuts")
    spans = cuts.select(
        "doc_id",
        "hx",
        "nb",
        "cuts",
        F.explode(
            F.sequence(F.lit(0), F.size("cuts"))
        ).alias("ci"),
    ).select(
        "doc_id",
        "hx",
        F.col("ci").cast("bigint").alias("chunk_idx"),
        F.when(F.col("ci") == 0, F.lit(0))
        .otherwise(F.get("cuts", F.col("ci") - 1) + 1)
        .cast("bigint")
        .alias("s"),
        F.when(
            F.col("ci") == F.size("cuts"), F.col("nb") - 1
        )
        .otherwise(F.get("cuts", F.col("ci")))
        .cast("bigint")
        .alias("e"),
    )
    return spans.select(
        "doc_id",
        "chunk_idx",
        F.col("s").alias("start_byte"),
        (F.col("e") - F.col("s") + 1).alias("chunk_len"),
        F.md5(
            F.expr(
                "substr(hx, cast(s * 2 + 1 as int), "
                "cast((e - s + 1) * 2 as int))"
            )
        ).alias("chunk_md5"),
    )


# -- CDC chunk-store dedup ratio ------------------------------------------------
# The backup-dedup headline number the chunk manifest exists for:
# store every chunk once, keyed by content hash — how many bytes does
# the chunk store hold vs the logical corpus? (The multimodal twin of
# docs_dedup_impact_tokens.) Unique-chunk bytes charge each distinct
# chunk_md5 its first occurrence's length (lengths are equal for
# equal content — md5 collision posture as everywhere).

_CDC_DEDUP_ORACLE = f"""
WITH manifest AS MATERIALIZED (
{_CDC_ORACLE}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(DISTINCT chunk_md5) AS BIGINT) AS n_unique_chunks,
       CAST(SUM(chunk_len) AS BIGINT) AS logical_bytes,
       CAST((SELECT SUM(l) FROM (
            SELECT MIN(chunk_len) AS l FROM manifest GROUP BY chunk_md5
       )) AS BIGINT) AS stored_bytes,
       CAST(SUM(chunk_len) AS DOUBLE) / CAST((SELECT SUM(l) FROM (
            SELECT MIN(chunk_len) AS l FROM manifest GROUP BY chunk_md5
       )) AS DOUBLE) AS dedup_ratio
FROM manifest
"""


@query("multimodal_cdc_dedup_ratio", _CDC_DEDUP_ORACLE)
def q_multimodal_cdc_dedup_ratio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Chunk-store deduplication ratio over the CDC manifest: store
    every distinct chunk once → (n_chunks, n_unique_chunks,
    logical_bytes, stored_bytes, dedup_ratio). The headline number a
    content-addressed blob store reports, and the payoff measurement
    for multimodal_cdc_chunks' boundary re-synchronization: near-dup
    payloads collapse onto shared chunks, so dedup_ratio > 1 exactly
    when the corpus carries byte-level redundancy.

    Scale shape: the manifest pass (map-only) + ONE chunk_md5-keyed
    groupBy (map-side combined) + one-row aggregates. Nothing else."""
    m = q_multimodal_cdc_chunks(spark, sf_dir).localCheckpoint(
        eager=False
    )
    stored = m.groupBy("chunk_md5").agg(
        F.min("chunk_len").alias("l")
    ).agg(F.sum("l").cast("bigint").alias("stored_bytes"))
    tot = m.agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        F.count_distinct("chunk_md5").cast("bigint").alias(
            "n_unique_chunks"
        ),
        F.sum("chunk_len").cast("bigint").alias("logical_bytes"),
    )
    return tot.crossJoin(F.broadcast(stored)).select(
        "n_chunks",
        "n_unique_chunks",
        "logical_bytes",
        "stored_bytes",
        (
            F.col("logical_bytes").cast("double")
            / F.col("stored_bytes").cast("double")
        ).alias("dedup_ratio"),
    )
