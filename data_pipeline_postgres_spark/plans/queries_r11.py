"""Round-11 query additions (SURVEY.md §2.11/§2.12 [EXT]): the three
highest-value items from the round-10 verdict's unfreeze list —

- ``docs_bpe_train_merges``: a 3-round BPE trainer (the multi-round
  extension of ``bpe_pair_merges``, which computes only the first
  merge) — each round picks the most frequent adjacent pair and
  APPLIES the merge corpus-wide before recounting;
- ``docs_url_dedup_cap``: URL-canonicalization dedup + per-domain
  caps — the CommonCrawl-style curation step the source-cap family
  approximates but doesn't express at URL granularity;
- ``docs_snapshot_curation_diff``: cross-snapshot incremental
  curation diff — ``table_diff_audit``'s row-diff primitive composed
  with a quality gate, per-source transition counts.

Conventions identical to queries_r9.py: every computed column aliased
the same in the Spark plan and the DuckDB oracle; counts CAST to
BIGINT on both sides (DuckDB SUM/COUNT → HUGEINT through Arrow
otherwise — the multimodal_shard_manifest r10 lesson, now CI-gated by
tests/oracle_util.py's Arrow type-family check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import text as TX
from .registry import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# -- Multi-round BPE trainer -------------------------------------------------
# bpe_pair_merges materializes round 1's merge-candidate table;
# training a tokenizer runs the loop: argmax pair -> merge everywhere
# -> recount. Three unrolled supersteps, hash-checked end-to-end (the
# applied merges feed the next round's counts, so a single misplaced
# merge anywhere in the corpus changes the later rounds' winners).
#
# Greedy left-to-right non-overlapping merge without a sequential
# scan: a position i merges iff it matches the pair AND its distance
# from its run start is even. Run starts come from one bounded window
# per doc (last non-match position + 1) — overlap chains only happen
# for a==b pairs, and parity over match-runs resolves them exactly
# like the sequential greedy scan.

_BPE_ROUNDS = 3


def _bpe_round_sql(k: int) -> str:
    """CTE chain for one oracle merge round: counts -> top-1 pair ->
    positional explode -> greedy-merge flags -> rebuilt sequences.
    Every per-round CTE that later rounds re-reference is
    MATERIALIZED (DuckDB inlines plain CTEs; 3 rounds of ~3x fan-out
    would re-plan the base scan 3^rounds times)."""
    return f""",
c{k} AS (
    SELECT w[i] AS w1, w[i+1] AS w2, COUNT(*) AS n
    FROM r{k}, unnest(range(1, len(w))) AS t(i) GROUP BY 1, 2
),
top{k} AS MATERIALIZED (
    SELECT w1, w2, n FROM c{k} ORDER BY n DESC, w1, w2 LIMIT 1
),
e{k} AS (
    SELECT doc_id, CAST(i AS BIGINT) AS pos, w[i] AS tok
    FROM r{k}, unnest(range(1, len(w) + 1)) AS t(i)
),
w{k} AS (
    SELECT doc_id, pos, tok,
           lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS ltok
    FROM e{k}
),
m{k} AS (
    SELECT doc_id, pos, tok, ltok,
           COALESCE(tok = (SELECT w1 FROM top{k})
                    AND ltok = (SELECT w2 FROM top{k}), FALSE) AS mt
    FROM w{k}
),
g{k} AS (
    SELECT *, COALESCE(MAX(CASE WHEN NOT mt THEN pos END)
                  OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) + 1, 1) AS rs
    FROM m{k}
),
f{k} AS (
    SELECT *, mt AND ((pos - rs) % 2 = 0) AS mg,
           COALESCE(LAG(mt AND ((pos - rs) % 2 = 0))
                  OVER (PARTITION BY doc_id ORDER BY pos), FALSE) AS pm
    FROM g{k}
),
r{k + 1} AS MATERIALIZED (
    SELECT doc_id,
           list(CASE WHEN mg THEN tok || ltok ELSE tok END
                ORDER BY pos) AS w
    FROM f{k} WHERE NOT pm GROUP BY doc_id
)"""


_BPE_TRAIN_ORACLE = (
    r"""
WITH r1 AS MATERIALIZED (
    SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
    FROM documents
)"""
    + "".join(_bpe_round_sql(k) for k in range(1, _BPE_ROUNDS + 1))
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS merge_round, "
        f"w1 || ' ' || w2 AS pair, CAST(n AS BIGINT) AS n FROM top{k}"
        for k in range(1, _BPE_ROUNDS + 1)
    )
)


def _bpe_top_pair(seqs: DataFrame) -> DataFrame:
    """Most frequent adjacent pair of a (doc_id, toks) relation —
    deterministic argmax (n DESC, w1, w2): map-side-combined count
    shuffle + TakeOrderedAndProject(1)."""
    toks = F.col("toks")
    cnt = F.size(toks) - 1
    z = F.arrays_zip(F.slice(toks, 1, cnt), F.slice(toks, 2, cnt))
    return (
        seqs.select(F.explode(z).alias("s"))
        .select(F.col("s")["0"].alias("w1"), F.col("s")["1"].alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "w1", "w2")
        .limit(1)
    )


def _bpe_apply(seqs: DataFrame, top: DataFrame) -> DataFrame:
    """Apply one merge corpus-wide: greedy left-to-right
    non-overlapping replacement of the top pair in every sequence.

    All windows are PARTITIONED BY doc_id (documents are bounded
    length — no global window); the 1-row top pair rides a broadcast
    crossJoin; the rebuild groupBy reuses the window's doc_id hash
    partitioning (no extra exchange)."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    t = (
        seqs.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
        .crossJoin(F.broadcast(top.select("w1", "w2")))
        .withColumn("ltok", F.lead("tok").over(w))
        .withColumn(
            "mt",
            F.coalesce(
                (F.col("tok") == F.col("w1"))
                & (F.col("ltok") == F.col("w2")),
                F.lit(False),
            ),
        )
    )
    # run start = last non-match position + 1 (0-based explode ⇒
    # default 0); merge at even offsets from the run start — exactly
    # the sequential greedy scan, but one bounded window instead
    g = t.withColumn(
        "rs",
        F.coalesce(
            F.max(F.when(~F.col("mt"), F.col("pos"))).over(w_run) + 1,
            F.lit(0),
        ),
    ).withColumn(
        "mg", F.col("mt") & ((F.col("pos") - F.col("rs")) % 2 == 0)
    )
    kept = g.withColumn(
        "pm", F.coalesce(F.lag("mg").over(w), F.lit(False))
    ).filter(~F.col("pm"))
    return kept.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "pos",
                        F.when(
                            F.col("mg"),
                            F.concat(F.col("tok"), F.col("ltok")),
                        )
                        .otherwise(F.col("tok"))
                        .alias("newtok"),
                    )
                )
            ),
            lambda s: s["newtok"],
        ).alias("toks")
    )


@query("docs_bpe_train_merges", _BPE_TRAIN_ORACLE)
def q_docs_bpe_train_merges(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """3-round BPE trainer over the corpus: each round counts adjacent
    token pairs, picks the single most frequent (n DESC, pair ASC
    tie-break), and MERGES it everywhere before the next count →
    (merge_round, pair, n). Completes the tokenizer-prep story that
    bpe_pair_merges (round 1's candidate table only) opens; a single
    misplaced merge anywhere in the corpus changes later rounds'
    winners, so the hash check covers the apply step, not just the
    counts.

    Scale shape: 3 unrolled supersteps; per round one explode + one
    map-side-combined pair-count shuffle + TakeOrderedAndProject(1) +
    doc_id-partitioned windows (bounded by document length, never
    global) + a rebuild groupBy that reuses the window's hash
    partitioning. The winning pair is a 1-row broadcast. Linear in
    corpus size per round; rounds are a fixed constant (real trainers
    run this loop to vocab size — the shape per round is identical).
    """
    seqs = _docs(spark, sf_dir).select(
        "doc_id", TX.tokens("text").alias("toks")
    )
    outs = []
    for k in range(1, _BPE_ROUNDS + 1):
        top = _bpe_top_pair(seqs)
        outs.append(
            top.select(
                F.lit(k).cast("bigint").alias("merge_round"),
                F.concat_ws(" ", "w1", "w2").alias("pair"),
                F.col("n").cast("bigint").alias("n"),
            )
        )
        if k < _BPE_ROUNDS:
            # pin each rebuilt corpus: without the lineage cut, round
            # k's pair count AND round k+1's rebuild would each replay
            # every earlier round's windows (the recompute grows with
            # round depth — the superstep checkpoint idiom of
            # operators/graph.py)
            seqs = _bpe_apply(seqs, top).localCheckpoint(eager=False)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


# -- URL-canonicalization dedup + per-domain caps ----------------------------
# The crawl-curation step between raw fetch and content dedup: the
# same page is fetched under tracking params / fragments / case
# variants; canonicalize, keep ONE doc per canonical URL, then cap
# each domain's contribution (boilerplate farms otherwise dominate
# the mixture). documents has no url column, so one is SYNTHESIZED
# deterministically (host from source, path from md5(text) — coarse
# 2-hex-char paths so canonical collisions actually occur at test
# scale, variant decoration from doc_id % 4).

_URL_CAP = 5

_URL_DEDUP_ORACLE = f"""
WITH u AS (
    SELECT doc_id, n_chars,
           CASE doc_id % 4
             WHEN 0 THEN 'https://www.' || source || '.com/'
                         || substr(md5(text), 1, 2)
             WHEN 1 THEN 'https://www.' || source || '.com/'
                         || substr(md5(text), 1, 2) || '?utm_source=feed'
             WHEN 2 THEN 'https://www.' || source || '.com/'
                         || substr(md5(text), 1, 2) || '#section-2'
             ELSE 'HTTPS://WWW.' || upper(source) || '.COM/'
                  || substr(md5(text), 1, 2) || '/'
           END AS raw_url
    FROM documents
),
n AS (
    SELECT doc_id, n_chars,
           regexp_replace(
               regexp_replace(
                   regexp_replace(lower(raw_url), '[?#].*$', ''),
                   '/$', ''),
               '^https://www\\.', 'https://') AS norm_url
    FROM u
),
d AS (
    SELECT doc_id, n_chars, norm_url,
           regexp_extract(norm_url, '^https://([^/]+)', 1) AS domain
    FROM n
),
kept_url AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (
            PARTITION BY norm_url ORDER BY doc_id) AS rn
        FROM d
    ) WHERE rn = 1
),
capped AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (
            PARTITION BY domain
            ORDER BY n_chars DESC, doc_id) AS rk
        FROM kept_url
    ) WHERE rk <= {_URL_CAP}
),
raw_agg AS (
    SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_raw,
           CAST(COUNT(DISTINCT norm_url) AS BIGINT) AS n_urls
    FROM d GROUP BY 1
),
cap_agg AS (
    SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum
    FROM capped GROUP BY 1
)
SELECT domain, n_raw, n_urls, n_kept, kept_id_sum
FROM raw_agg JOIN cap_agg USING (domain)
"""


@query("docs_url_dedup_cap", _URL_DEDUP_ORACLE)
def q_docs_url_dedup_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup + per-domain cap funnel:
    (domain, n_raw, n_urls, n_kept, kept_id_sum). Canonicalization
    lower-cases, strips query/fragment, trailing slash, and the
    'www.' host prefix; one survivor per canonical URL (min doc_id —
    the crawl's canonical fetch); then each domain contributes at
    most {cap} docs ranked by length (n_chars DESC, doc_id
    tie-break). kept_id_sum pins the EXACT survivor set in the hash,
    not just its size.

    Scale shape: two key shuffles (canonical URL, then domain); both
    row_number windows are PARTITIONED (URL groups are variant-bounded,
    domain top-k compiles to WindowGroupLimit pre-shuffle heaps);
    COUNT(DISTINCT) is two-phase partial aggregation. Linear; no
    global window, no collect.
    """.format(cap=_URL_CAP)
    d0 = _docs(spark, sf_dir)
    path = F.substring(F.md5(F.col("text")), 1, 2)
    base = F.concat(
        F.lit("https://www."), F.col("source"), F.lit(".com/"), path
    )
    raw = (
        F.when(F.col("doc_id") % 4 == 0, base)
        .when(F.col("doc_id") % 4 == 1,
              F.concat(base, F.lit("?utm_source=feed")))
        .when(F.col("doc_id") % 4 == 2,
              F.concat(base, F.lit("#section-2")))
        .otherwise(
            F.concat(
                F.lit("HTTPS://WWW."),
                F.upper(F.col("source")),
                F.lit(".COM/"),
                path,
                F.lit("/"),
            )
        )
    )
    norm = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.lower(raw), r"[?#].*$", ""), r"/$", ""
        ),
        r"^https://www\.",
        "https://",
    )
    d = d0.select(
        "doc_id",
        "n_chars",
        norm.alias("norm_url"),
    ).withColumn(
        "domain", F.regexp_extract("norm_url", r"^https://([^/]+)", 1)
    )
    w_url = Window.partitionBy("norm_url").orderBy("doc_id")
    kept_url = (
        d.withColumn("rn", F.row_number().over(w_url))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    w_dom = Window.partitionBy("domain").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    capped = (
        kept_url.withColumn("rk", F.row_number().over(w_dom))
        .filter(F.col("rk") <= _URL_CAP)
    )
    raw_agg = d.groupBy("domain").agg(
        F.count("*").cast("bigint").alias("n_raw"),
        F.countDistinct("norm_url").cast("bigint").alias("n_urls"),
    )
    cap_agg = capped.groupBy("domain").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.sum("doc_id").cast("bigint").alias("kept_id_sum"),
    )
    return raw_agg.join(cap_agg, "domain")


# -- Cross-snapshot incremental curation diff --------------------------------
# table_diff_audit proves a merge applied cleanly at row level; the
# curation counterpart answers "what did the refresh do to my TRAINING
# SET": which docs entered/left the corpus between two snapshots, and
# how did the quality gate's verdict move for docs whose content
# changed. Snapshots derive deterministically from the one documents
# table (old: doc_id % 10 != 3; new: doc_id % 10 != 7 with %10==1 docs
# re-crawled, i.e. text appended).

_SNAP_GATE_LEN = 200
_SNAP_GATE_WC = 30

_SNAP_DIFF_ORACLE = rf"""
WITH old AS (
    SELECT doc_id, source, text FROM documents WHERE doc_id % 10 <> 3
),
new AS (
    SELECT doc_id, source,
           CASE WHEN doc_id % 10 = 1
                THEN text || ' updated after recrawl'
                ELSE text END AS text
    FROM documents WHERE doc_id % 10 <> 7
),
og AS (
    SELECT doc_id, source, text,
           CAST(length(text) >= {_SNAP_GATE_LEN}
                AND len(regexp_split_to_array(trim(text), '\s+'))
                    >= {_SNAP_GATE_WC} AS INT) AS old_pass
    FROM old
),
ng AS (
    SELECT doc_id, source, text,
           CAST(length(text) >= {_SNAP_GATE_LEN}
                AND len(regexp_split_to_array(trim(text), '\s+'))
                    >= {_SNAP_GATE_WC} AS INT) AS new_pass
    FROM new
),
j AS (
    SELECT COALESCE(og.source, ng.source) AS source,
           CASE WHEN og.doc_id IS NULL THEN 'added'
                WHEN ng.doc_id IS NULL THEN 'removed'
                WHEN og.text <> ng.text THEN 'changed'
                ELSE 'same' END AS change_type,
           og.old_pass, ng.new_pass
    FROM og FULL OUTER JOIN ng USING (doc_id)
)
SELECT source, change_type, old_pass, new_pass,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM j GROUP BY 1, 2, 3, 4
"""


@query("docs_snapshot_curation_diff", _SNAP_DIFF_ORACLE)
def q_docs_snapshot_curation_diff(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-snapshot curation diff: per (source, change_type,
    old_pass, new_pass) document counts between two corpus snapshots,
    where change_type ∈ added/removed/changed/same and the pass flags
    are a deterministic quality gate (length >= {ln} chars AND >= {wc}
    tokens) evaluated on each snapshot's own text. The refresh-audit a
    training pipeline runs before re-mixing: how many docs entered,
    left, and — for re-crawled content — flipped quality verdicts.

    Scale shape: ONE full-outer sort-merge join co-partitioned on
    doc_id (both gate projections are map-only), then one
    map-side-combined groupBy over a bounded key space (sources ×
    4 change types × 3x3 pass states). Linear; the gate never
    shuffles text.
    """.format(ln=_SNAP_GATE_LEN, wc=_SNAP_GATE_WC)
    d0 = _docs(spark, sf_dir)

    def gate(tcol):
        return (
            (F.length(tcol) >= _SNAP_GATE_LEN)
            & (F.size(F.split(F.trim(tcol), r"\s+")) >= _SNAP_GATE_WC)
        ).cast("int")

    old = d0.filter(F.col("doc_id") % 10 != 3).select(
        "doc_id",
        F.col("source").alias("o_source"),
        F.col("text").alias("o_text"),
        gate(F.col("text")).alias("old_pass"),
    )
    ntext = F.when(
        F.col("doc_id") % 10 == 1,
        F.concat(F.col("text"), F.lit(" updated after recrawl")),
    ).otherwise(F.col("text"))
    new = d0.filter(F.col("doc_id") % 10 != 7).select(
        "doc_id",
        F.col("source").alias("n_source"),
        ntext.alias("n_text"),
        gate(ntext).alias("new_pass"),
    )
    j = old.join(new, "doc_id", "full_outer").select(
        F.coalesce("o_source", "n_source").alias("source"),
        F.when(F.col("o_text").isNull(), F.lit("added"))
        .when(F.col("n_text").isNull(), F.lit("removed"))
        .when(F.col("o_text") != F.col("n_text"), F.lit("changed"))
        .otherwise(F.lit("same"))
        .alias("change_type"),
        "old_pass",
        "new_pass",
    )
    return j.groupBy(
        "source", "change_type", "old_pass", "new_pass"
    ).agg(F.count("*").cast("bigint").alias("n_docs"))
