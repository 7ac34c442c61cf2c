"""Round-15 query additions (SURVEY.md §2.11/§2.12 [EXT]):

- ``orders_theil_sen_trend_long``: the long-calendar Theil-Sen path
  the exact all-pairs query's 3,000-day raise-guard has pointed at
  since round 10 — a deterministic md5 uniform pair sample turns the
  O(days^2) slope stage into O(K·days) while keeping the estimator
  deterministic and oracle-checkable (VERDICT r14 item 7);
- ``orders_price_index_laspeyres``: monthly Laspeyres / Paasche /
  Fisher price indices over the common-parts basket vs a fixed base
  month — the standard retail price-level decomposition (volume vs
  price effects), in exact integer arithmetic per F7;
- ``lineitem_p_chart``: statistical-process-control p-chart of the
  weekly return rate with 3-sigma binomial control limits — the
  classic manufacturing/ops quality gate (sqrt is the one correctly
  rounded IEEE power, so the limits hash cross-engine);
- ``stream_ivm_agg_maintenance``: streaming twin of the r14 batch IVM
  query — a standing aggregate absorbs base/delete/insert refresh
  batches as signed partials in foreachBatch, arrival-order invariant
  because SUM/COUNT form an abelian group.
- ``tokenizer_bpe_apply``: the APPLY half of the BPE tokenizer family
  — train classic character-level BPE on the capped word-type table,
  encode distinct types with an Arrow-batched pandas UDF, publish
  per-source fertility; rows-only with an exact pure-Python
  reference-equality pytest gate.

Conventions identical to queries_r9..r14: every computed column
aliased the same in the Spark plan and the DuckDB oracle; counts CAST
to BIGINT on both sides; floats only via FLOOR over the identical
double expression, sqrt, or a single shared-literal division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

# -- orders_theil_sen_trend_long ---------------------------------------------------
# Exact Theil-Sen medians ALL n(n-1)/2 pairwise slopes — quadratic in
# calendar length, which is why orders_theil_sen_trend raises past
# 3,000 distinct days. The long-calendar estimator medians a
# DETERMINISTIC md5 pair sample: each day-rank r draws K=20 partner
# ranks j = md5(r#k) mod n, keeping j > r. Every ordered pair (r, j)
# has identical expected multiplicity K/n, so the sample's gap
# distribution is the SAME triangular law as the exhaustive pair set
# (a geometric-stride design was measured first and rejected: its
# uniform-over-scales gap law weights long-horizon slopes differently
# and diverged 3x from the exact median on the non-linear sf0.01
# revenue series; the uniform sample lands within sampling error).
# No RNG: both engines enumerate the identical md5 draws, so the
# estimate is hash-exact, not accuracy-gated.

_TSL_DRAWS = 20  # partner draws per day-rank -> ~K*n/2 sampled slopes


_TSL_ORACLE = f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
    FROM orders GROUP BY 1
),
t0 AS (SELECT MIN(d) AS d0, COUNT(*) AS nd FROM daily),
pts AS (
    SELECT row_number() OVER (ORDER BY daily.d) - 1 AS r,
           datediff('day', t0.d0, daily.d) AS t,
           CAST(rev AS DOUBLE) AS y
    FROM daily, t0
),
draws AS (
    SELECT pts.r, pts.t, pts.y,
           ('0x' || substr(md5(CAST(pts.r AS VARCHAR) || '#'
                               || CAST(ks.k AS VARCHAR)), 1, 15))::BIGINT
               % (SELECT nd FROM t0) AS j
    FROM pts CROSS JOIN range(0, {_TSL_DRAWS}) AS ks(k)
),
pairs AS (
    SELECT (b.y - a.y) / CAST(b.t - a.t AS DOUBLE) AS slope,
           a.t AS t1, b.t AS t2
    FROM draws a JOIN pts b ON b.r = a.j
    WHERE a.j > a.r
),
rk AS (
    SELECT slope,
           row_number() OVER (ORDER BY slope, t1, t2) AS rn,
           COUNT(*) OVER () AS n
    FROM pairs
)
SELECT CAST((SELECT nd FROM t0) AS BIGINT) AS n_days,
       CAST(MAX(n) AS BIGINT) AS n_slopes,
       SUM(CASE WHEN rn IN ((n + 1) // 2, n // 2 + 1)
                THEN slope ELSE 0 END)
       / CAST(COUNT(CASE WHEN rn IN ((n + 1) // 2, n // 2 + 1)
                         THEN 1 END) AS DOUBLE) AS ts_slope
FROM rk
"""


@query("orders_theil_sen_trend_long", _TSL_ORACLE)
def q_orders_theil_sen_trend_long(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Long-calendar Theil-Sen robust trend of daily order revenue:
    the median of pairwise slopes over a DETERMINISTIC md5-hash pair
    sample (each day-rank draws K=20 uniform partner ranks; kept if
    the partner is later) -> (n_days, n_slopes, ts_slope). This is the
    documented scale path of ``orders_theil_sen_trend``, whose exact
    all-pairs stage self-limits at 3,000 distinct days: the sample is
    O(K*n) slopes — a 100-year daily series is ~365k slopes, vs ~660M
    exact — and because every ordered pair has identical expected
    multiplicity K/n, the sampled slope multiset follows the SAME
    triangular gap law as the exhaustive pair set, so the sample
    median estimates the exact Theil-Sen median (measured at sf0.01:
    within the middle-quartile spread of the exact slope
    distribution), unlike scale-stratified designs that reweight
    slope horizons.

    Determinism: daily revenue is a DECIMAL(18,2) sum cast once to
    double; each slope is ONE IEEE division of exactly-representable
    operands (day-offset ints); the pair set is fixed by md5 (both
    engines hash the identical '{{r}}#{{k}}' strings and reduce mod n),
    so the result is hash-exact against the oracle, not
    accuracy-gated. Duplicate draws are kept (a multiset, as sampling
    theory wants); rank ties between identical slope rows cannot move
    the selected VALUES.

    Scale shape: day ranks come from operators.window.global_rank (no
    single-partition sort); the K-draw expansion is an explode of a
    literal array (map-only); pair formation is ONE equi-join of the
    draw relation on the partner rank (b.r = a.j), so the slope
    relation never goes quadratic; the median reuses global_rank over
    the O(K*n) slope multiset. The fact table is scanned once (the
    daily aggregate is lineage-pinned via localCheckpoint).
    """
    from ..operators.window import global_rank

    o = load_table(spark, sf_dir, "orders")
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
        F.min("d").alias("d0"), F.count("*").cast("bigint").alias("nd")
    )
    pts = (
        global_rank(daily, ["d"], rank_col="rn1")
        .crossJoin(F.broadcast(t0))
        .select(
            (F.col("rn1") - 1).cast("bigint").alias("r"),
            F.datediff(F.col("d"), F.col("d0")).cast("bigint").alias("t"),
            F.col("rev").cast("double").alias("y"),
            "nd",
        )
        .localCheckpoint(eager=False)
    )
    ks = F.explode(
        F.array(*[F.lit(k).cast("bigint") for k in range(_TSL_DRAWS)])
    ).alias("k")
    j = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("r").cast("string"),
                        F.lit("#"),
                        F.col("k").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % F.col("nd")
    )
    draws = (
        pts.select("r", "t", "y", "nd", ks)
        .select(
            F.col("t").alias("t1"),
            F.col("y").alias("y1"),
            "r",
            j.alias("j"),
        )
        .filter(F.col("j") > F.col("r"))
    )
    right = pts.select(
        F.col("r").alias("j"),
        F.col("t").alias("t2"),
        F.col("y").alias("y2"),
    )
    pairs = draws.join(right, "j").select(
        (
            (F.col("y2") - F.col("y1"))
            / (F.col("t2") - F.col("t1")).cast("double")
        ).alias("slope"),
        "t1",
        "t2",
    )
    ranked = global_rank(pairs, ["slope", "t1", "t2"]).localCheckpoint(
        eager=False
    )
    meta = ranked.agg(
        F.max("rn").cast("bigint").alias("n_slopes")
    ).crossJoin(F.broadcast(t0.select(F.col("nd").alias("n_days"))))
    mid = ranked.crossJoin(F.broadcast(meta)).filter(
        (F.col("rn") == F.expr("(n_slopes + 1) DIV 2"))
        | (F.col("rn") == F.expr("n_slopes DIV 2 + 1"))
    )
    return mid.agg(
        F.coalesce(F.first("n_days"), F.lit(0)).cast("bigint").alias(
            "n_days"
        ),
        F.coalesce(F.first("n_slopes"), F.lit(0)).cast("bigint").alias(
            "n_slopes"
        ),
        (F.sum("slope") / F.count("*").cast("double")).alias("ts_slope"),
    ).select("n_days", "n_slopes", "ts_slope")


# -- orders_price_index_laspeyres --------------------------------------------------
# The standard price-level decomposition a retail/procurement
# warehouse publishes monthly: Laspeyres (base-month basket at current
# prices), Paasche (current basket at base prices), Fisher (their
# geometric mean). Basket = parts traded in BOTH the base month and
# the current month; part price = monthly unit value (cents / qty).
# F7 discipline: every per-part index term is a single IEEE division
# of exact int64s times an exact int64, floor-quantized to micro-units
# BEFORE summation, so partial-agg order cannot move the hash; the
# final index is one double division of int64 sums.

_PIDX_BASE = "1995-01"


def _pidx_term(c: str, q: str, w: str) -> str:
    """Micro-quantized index term: (cents/qty) * weight_qty, floored
    to int64 micro-currency — identical literal text on both engines."""
    return (
        f"CAST(FLOOR((CAST({c} AS DOUBLE) / CAST({q} AS DOUBLE))"
        f" * CAST({w} AS DOUBLE) * 1000000e0 + 0.5e0) AS BIGINT)"
    )


_PIDX_ORACLE = f"""
WITH monthly AS (
    SELECT l_partkey, strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS m,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100e0 + 0.5e0)
                         AS BIGINT)) AS BIGINT) AS cents,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem GROUP BY 1, 2
),
base AS (
    SELECT l_partkey, cents AS c0, qty AS q0
    FROM monthly WHERE m = '{_PIDX_BASE}'
),
joined AS (
    SELECT monthly.m, monthly.cents AS ct, monthly.qty AS qt,
           base.c0, base.q0
    FROM monthly JOIN base USING (l_partkey)
    WHERE monthly.m <> '{_PIDX_BASE}'
),
sums AS (
    SELECT m,
           CAST(COUNT(*) AS BIGINT) AS n_parts_basket,
           SUM({_pidx_term('ct', 'qt', 'q0')}) AS l_num,
           SUM({_pidx_term('c0', 'q0', 'q0')}) AS l_den,
           SUM({_pidx_term('ct', 'qt', 'qt')}) AS p_num,
           SUM({_pidx_term('c0', 'q0', 'qt')}) AS p_den
    FROM joined GROUP BY 1
)
SELECT m, n_parts_basket,
       CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE) AS laspeyres,
       CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE) AS paasche,
       sqrt((CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE))
            * (CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE))) AS fisher
FROM sums
"""


@query("orders_price_index_laspeyres", _PIDX_ORACLE)
def q_orders_price_index_laspeyres(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Monthly Laspeyres / Paasche / Fisher price indices of the parts
    traded in both the base month ({base}) and each later month →
    (m, n_parts_basket, laspeyres, paasche, fisher). Part price is the
    monthly unit value (exact cents / exact quantity); Laspeyres
    weights current prices by the BASE month's quantities (pure price
    effect), Paasche by current quantities, Fisher is their geometric
    mean — sqrt is the one correctly-rounded IEEE power, so it is
    cross-engine hash-safe without quantization.

    Scale shape: the fact table aggregates once to the (part, month)
    unit-value relation (map-side combine), the base month is a
    per-part slice of it joined back on l_partkey (at 100 TB this is
    |parts|-row vs |parts x months|-row — an ordinary shuffled equi
    join that AQE may broadcast at small part counts), and the index
    sums are exact int64 micro-units per F7, so partial-agg order is
    irrelevant. No window over the fact table anywhere.
    """
    li = load_table(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        "l_partkey",
        F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM").alias(
            "m"
        ),
    ).agg(
        F.sum(
            F.expr(
                "CAST(FLOOR(l_extendedprice * 100e0 + 0.5e0) AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("cents"),
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias(
            "qty"
        ),
    )
    # r15 (guide §2.4, the repo's shared-relation rule): monthly feeds
    # the base-month slice AND the current-month side, and the pushed
    # month filters differ, so exchange reuse never fires — the
    # captured before-plan shows 4 parquet scans of the fact table.
    # The lazy localCheckpoint pins the |parts x months| unit-value
    # relation so lineitem is aggregated exactly once.
    monthly = monthly.localCheckpoint(eager=False)
    base = monthly.filter(F.col("m") == _PIDX_BASE).select(
        "l_partkey",
        F.col("cents").alias("c0"),
        F.col("qty").alias("q0"),
    )
    joined = (
        monthly.filter(F.col("m") != _PIDX_BASE)
        .withColumnRenamed("cents", "ct")
        .withColumnRenamed("qty", "qt")
        .join(base, "l_partkey")
    )
    sums = joined.groupBy("m").agg(
        F.count("*").cast("bigint").alias("n_parts_basket"),
        F.sum(F.expr(_pidx_term("ct", "qt", "q0"))).alias("l_num"),
        F.sum(F.expr(_pidx_term("c0", "q0", "q0"))).alias("l_den"),
        F.sum(F.expr(_pidx_term("ct", "qt", "qt"))).alias("p_num"),
        F.sum(F.expr(_pidx_term("c0", "q0", "qt"))).alias("p_den"),
    )
    lasp = F.col("l_num").cast("double") / F.col("l_den").cast("double")
    paas = F.col("p_num").cast("double") / F.col("p_den").cast("double")
    return sums.select(
        "m",
        "n_parts_basket",
        lasp.alias("laspeyres"),
        paas.alias("paasche"),
        F.sqrt(lasp * paas).alias("fisher"),
    )


q_orders_price_index_laspeyres.__doc__ = (
    q_orders_price_index_laspeyres.__doc__.replace("{base}", _PIDX_BASE)
)


# -- lineitem_p_chart --------------------------------------------------------------
# Statistical process control: a p-chart monitors a binomial fraction
# (here the weekly RETURN rate) against 3-sigma limits centered on the
# process mean — the Shewhart gate every ops/quality pipeline runs on
# defect-like rates. Exact arithmetic: per-week defect/total counts
# are int64; pbar and each week's p are single divisions; the sigma
# term is sqrt(pbar*(1-pbar)/n) — one multiply chain and a sqrt, all
# correctly-rounded IEEE ops, so the limits hash with no quantization.

_PCHART_ORACLE = """
WITH wk AS (
    SELECT CAST(date_trunc('week', CAST(l_shipdate AS DATE)) AS DATE)
               AS week,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returned
    FROM lineitem GROUP BY 1
),
tot AS (
    SELECT CAST(SUM(n_returned) AS DOUBLE) / CAST(SUM(n_items) AS DOUBLE)
               AS pbar
    FROM wk
)
SELECT week, n_items, n_returned,
       CAST(n_returned AS DOUBLE) / CAST(n_items AS DOUBLE) AS p,
       pbar,
       pbar + 3e0 * sqrt(pbar * (1e0 - pbar) / CAST(n_items AS DOUBLE))
           AS ucl,
       greatest(0e0, pbar - 3e0 * sqrt(pbar * (1e0 - pbar)
                                       / CAST(n_items AS DOUBLE))) AS lcl,
       (CAST(n_returned AS DOUBLE) / CAST(n_items AS DOUBLE)
        > pbar + 3e0 * sqrt(pbar * (1e0 - pbar)
                            / CAST(n_items AS DOUBLE)))
       OR (CAST(n_returned AS DOUBLE) / CAST(n_items AS DOUBLE)
           < greatest(0e0, pbar - 3e0 * sqrt(pbar * (1e0 - pbar)
                                             / CAST(n_items AS DOUBLE))))
           AS out_of_control
FROM wk CROSS JOIN tot
"""


@query("lineitem_p_chart", _PCHART_ORACLE)
def q_lineitem_p_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart p-chart of the weekly line-item return rate →
    (week, n_items, n_returned, p, pbar, ucl, lcl, out_of_control):
    each week's return fraction against 3-sigma binomial control
    limits centered on the global rate, with variable limits per week
    (sigma shrinks as sqrt(1/n)) — the standard SPC gate for
    defect-like rates, and the batch shape behind every streaming
    quality monitor.

    Determinism: counts are exact int64; p and pbar are single IEEE
    divisions; the limit is one multiply chain + sqrt (correctly
    rounded), so both engines produce bit-identical doubles and the
    boolean verdict needs no epsilon.

    Scale shape: one map-side-combined groupBy of the fact table to
    |weeks| rows, then a broadcast 1-row global mean — no window, no
    second fact scan; out-of-control weeks surface by filter. At
    100 TB the chart relation stays calendar-bounded.
    """
    li = load_table(spark, sf_dir, "lineitem")
    wk = li.groupBy(
        F.date_trunc("week", F.col("l_shipdate").cast("date"))
        .cast("date")
        .alias("week")
    ).agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("n_returned"),
    )
    # r15 (guide §2.4, the repo's shared-relation rule): wk feeds TWO
    # consumers (the 1-row pbar aggregate and the chart projection);
    # without a lineage cut each consumer re-runs the fact groupBy —
    # the captured before-plan shows 4 parquet scans, 0 reused
    # exchanges. The lazy localCheckpoint pins the calendar-bounded
    # weekly relation so the fact table is scanned exactly once, as
    # the docstring promises.
    wk = wk.localCheckpoint(eager=False)
    tot = wk.agg(
        (
            F.sum("n_returned").cast("double")
            / F.sum("n_items").cast("double")
        ).alias("pbar")
    )
    p = F.col("n_returned").cast("double") / F.col("n_items").cast(
        "double"
    )
    sig = F.sqrt(
        F.col("pbar")
        * (F.lit(1.0) - F.col("pbar"))
        / F.col("n_items").cast("double")
    )
    ucl = F.col("pbar") + F.lit(3.0) * sig
    lcl = F.greatest(F.lit(0.0), F.col("pbar") - F.lit(3.0) * sig)
    return wk.crossJoin(F.broadcast(tot)).select(
        "week",
        "n_items",
        "n_returned",
        p.alias("p"),
        "pbar",
        ucl.alias("ucl"),
        lcl.alias("lcl"),
        ((p > ucl) | (p < lcl)).alias("out_of_control"),
    )


# -- stream_ivm_agg_maintenance ----------------------------------------------------
# The oracle is the BATCH answer: a direct recompute of the refreshed
# relation — what the streaming signed-partial fold must converge to
# after the drain. Shares the refresh definition with the batch IVM
# query (queries_r14), so the two stay comparable operator twins.

from .queries_r14 import _IVM_ORACLE as _STREAM_IVM_ORACLE  # noqa: E402


@query("stream_ivm_agg_maintenance", _STREAM_IVM_ORACLE)
def q_stream_ivm_agg_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming incremental view maintenance: a 3-batch AvailableNow
    refresh stream (base load, delete batch, insert batch — each
    carrying a sign column) folds into a standing q1-style aggregate
    as signed decimal partials in foreachBatch; post-drain the
    standing aggregate equals the oracle's direct recompute of the
    refreshed relation bit for bit. Arrival-order INVARIANT (abelian
    aggregates), exactly-once via the batch_id-keyed version chain
    (streaming/jobs.ivm_agg_maintenance_stream)."""
    from ..streaming import jobs as stream_jobs

    return stream_jobs.ivm_agg_maintenance_stream(spark, sf_dir)


# -- tokenizer_bpe_apply -----------------------------------------------------------
# The missing APPLY half of the tokenizer family: bpe_pair_merges /
# docs_bpe_train_merges demonstrate merge SELECTION; this trains the
# classic character-level BPE (Sennrich et al. 2016) on the
# frequency-weighted word-type table and ENCODES the corpus with it,
# publishing per-source fertility — the number every tokenizer-budget
# decision (docs_token_budget_select, tokenizer_fertility_by_lang)
# consumes. Sequential merge application is not SQL-expressible, so
# this is a rows-only query with an EXACT pytest gate: the Spark
# pipeline's piece counts must equal an independent pure-Python
# reference encode of the whole corpus (tests/test_round15.py).

_BPE_APPLY_TRAIN_TYPES = 1 << 14  # train on the top-16k types
_BPE_APPLY_MERGES = 60


@query("tokenizer_bpe_apply")
def q_tokenizer_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a 60-merge character-level BPE on the corpus's top-16k
    word types (frequency-weighted, deterministic tie-breaks) and
    encode EVERY word with it -> per-source
    (source, n_word_types, n_words, n_pieces, fertility): fertility =
    BPE pieces per whitespace word, the compression measure tokenizer
    QA publishes per language/source slice.

    UDF policy (SURVEY §2.10): the encode kernel is an Arrow-batched
    pandas UDF applied to DISTINCT word types only — identical words
    encode identically, so the Python path touches |vocab| rows while
    the token stream stays JVM-side; per-type piece counts join back
    to the per-(source, type) frequency relation and aggregate with
    exact int64 arithmetic (fertility is the single final division).

    Scale shape: one explode + ONE (source, word) map-side-combined
    count of the corpus; the global type table derives from it by a
    second (small) aggregate. Training collects the CAPPED top-16k
    type rows — a bounded driver artifact in the documented class
    (Markov matrix, Gram matrix): real trainers cap candidate vocab
    identically, and the cap holds at any corpus size. The merge
    table ships to executors inside the UDF closure (~60 pairs).
    """
    from ..functions import text as TX
    from ..operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "source", F.explode(TX.tokens("text")).alias("w")
    ).filter(F.length("w") > 0)
    per_sw = words.groupBy("source", "w").agg(
        F.count("*").cast("bigint").alias("n")
    ).localCheckpoint(eager=False)
    top_types = (
        per_sw.groupBy("w")
        .agg(F.sum("n").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "w")
        .limit(_BPE_APPLY_TRAIN_TYPES)
        .collect()
    )
    merges = bpe.train_merges(
        [(r["w"], r["n"]) for r in top_types], _BPE_APPLY_MERGES
    )
    ranks = {pair: i for i, pair in enumerate(merges)}
    n_pieces = bpe.make_n_pieces_udf(ranks)
    types = per_sw.select("w").distinct().select(
        "w", n_pieces("w").alias("np")
    )
    return (
        per_sw.join(types, "w")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_word_types"),
            F.sum("n").cast("bigint").alias("n_words"),
            F.sum(F.col("n") * F.col("np")).cast("bigint").alias(
                "n_pieces"
            ),
            (
                F.sum(F.col("n") * F.col("np")).cast("double")
                / F.sum("n").cast("double")
            ).alias("fertility"),
        )
    )
