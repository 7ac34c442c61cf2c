"""Round-12 query additions (SURVEY.md §2.11 [EXT]): the three
highest-value items from the round-11 verdict's unfreeze list —

- ``docs_pack_bestfit`` + ``docs_pack_efficiency``: first-fit-
  decreasing sequence packing over power-of-two length classes (shelf
  packing — no document ever splits), and the one-row layout
  comparison against concatenate-and-chunk that
  ``docs_pack_fragmentation`` exists to motivate;
- ``dedup_payload_shingle``: PAYLOAD-level near-duplicate detection
  over the opaque binary column — byte 8-gram Jaccard with a
  document-frequency cap — completing the dedup matrix
  (text / embedding / URL / **bytes**);
- ``docs_mix_capped_alloc``: the constrained mixture-weight solver —
  temperature allocation (docs_mix_temperature_alloc) iterated under
  per-source availability caps with excess redistribution
  (water-filling), unrolled to a fixed round count like the graph
  fixpoints.

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
