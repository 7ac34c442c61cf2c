"""Embedding-column operators (SURVEY.md §2.11 [EXT]): unit
normalization and per-group centroids — the feature-engineering passes
an embedding-bearing pipeline runs before clustering / ANN indexing.

Both are pure DataFrame ops (HOF transforms + one hash aggregation);
exactness follows the module's established quantization contract
(operators/dedup.py:quantize_col): sums of floats are never compared
across engines — sums of deterministic int64 quantizations are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import vectors as V
from .dedup import QSCALE, quantize_col


def unit_normalize(emb: DataFrame, head: int = 8) -> DataFrame:
    """L2 unit normalization, emitted component-wise:
    (vec_id, pos, u) for the first ``head`` components (u rounded to
    6 digits — the repo's cross-engine float contract).

    The norm folds over the FULL vector; only the emitted slice is
    truncated, to keep result sets row-bounded. Per-row map stage —
    at scale this pipelines into the ANN index writer.
    """
    v = V.as_double(F.col("embedding"))
    unit = F.transform(v, lambda x: F.round(x / V.norm(v), 6))
    return emb.select(
        "vec_id", F.posexplode(F.slice(unit, 1, head)).alias("pos", "u")
    )


def int8_quantize(emb: DataFrame) -> DataFrame:
    """Symmetric int8 quantization per vector — the storage/transport
    compression an embedding lake runs before ANN indexing (4× smaller
    than float32, 8× than float64): (vec_id, scale, q array<int>),
    component q_i = round_half_up(x_i / scale), scale = max|x| / 127
    (1.0 for the all-zero vector so q stays all-zero instead of NaN).

    Shape note: the per-component lambda must NOT embed the scale
    expression (HOF lambdas re-evaluate embedded subtrees per
    element — see functions/text.py:word_shingles). ``array_repeat``
    evaluates scale ONCE per row, then ``zip_with`` walks two
    materialized arrays with an element-only lambda. Rounding is
    floor(x+0.5) — engines disagree on round()'s double ties, never on
    floor.
    """
    v = V.as_double(F.col("embedding"))
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(maxabs > 0, maxabs / F.lit(127.0)).otherwise(F.lit(1.0))
    base = emb.select(
        "vec_id", v.alias("v"), scale.alias("scale")
    ).withColumn("scales", F.array_repeat(F.col("scale"), F.size(F.col("v"))))
    q = F.zip_with(
        F.col("v"),
        F.col("scales"),
        lambda x, s: F.floor(x / s + F.lit(0.5)).cast("int"),
    )
    return base.select("vec_id", "scale", q.alias("q"))


def centroid_per_label(emb: DataFrame) -> DataFrame:
    """Element-wise mean embedding per label:
    (label, pos, centroid, n_vecs).

    Float sums are order-dependent, so the mean goes through the
    module's deterministic int64 quantization: quantize each unit
    component to 2^20 (exact, engine-identical), SUM the integers
    (order-free), one double division at the end. One posexplode +
    one hash aggregation keyed by (label, pos) — map-side partials
    collapse the exchange to |labels|·64 rows.
    """
    q = quantize_col(V.as_double(F.col("embedding")))
    return (
        emb.select("label", F.posexplode(q).alias("pos", "qv"))
        .groupBy("label", "pos")
        .agg(
            (
                F.sum("qv").cast("double") / (F.lit(QSCALE) * F.count("*"))
            ).alias("centroid"),
            F.count("*").alias("n_vecs"),
        )
    )


def _jl_sign(i: int, j: int) -> int:
    """Deterministic ±1 from md5 parity — the Achlioptas/JL sign
    matrix entry for (input dim i, output dim j), identical constants
    emitted into the Spark plan and the DuckDB oracle."""
    import hashlib

    h = hashlib.md5(f"jl:{i}:{j}".encode()).hexdigest()
    return 1 if int(h[:2], 16) % 2 == 0 else -1


def jl_signs(in_dim: int = 64, out_dim: int = 16) -> list[list[int]]:
    """out_dim rows of in_dim signs (a materialized constant — at any
    scale this matrix is a few KB broadcast with the plan)."""
    return [
        [_jl_sign(i, j) for i in range(in_dim)] for j in range(out_dim)
    ]


def random_projection(
    emb: DataFrame, in_dim: int = 64, out_dim: int = 16
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with a
    deterministic ±1 sign matrix: y_j = Σ_i x_i·s_ij / √out_dim.
    The cheap front half of a two-stage ANN pipeline (project, index
    in 16-d, rerank survivors in full dimension) — 4× less vector
    I/O per comparison.

    Emitted component-wise (vec_id, pos, y) with the repo's 6-digit
    float contract. Pure narrow map: the sign matrix rides the plan
    as literals, each output component is an ordered left fold over
    doubles (≡ DuckDB list_reduce bit-for-bit), no shuffle anywhere.
    """
    signs = jl_signs(in_dim, out_dim)
    x = V.as_double(F.col("embedding"))
    scale = F.lit(float(out_dim) ** 0.5)
    comps = F.array(
        *[
            F.round(
                F.aggregate(
                    F.zip_with(
                        x,
                        F.array(*[F.lit(s) for s in signs[j]]),
                        lambda a, b: a * b.cast("double"),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                / scale,
                6,
            )
            for j in range(out_dim)
        ]
    )
    return emb.select(
        "vec_id", F.posexplode(comps).alias("pos", "y")
    )


def pq_codebook(emb: DataFrame, m: int = 8, k: int = 16) -> DataFrame:
    """Product-quantization codebook as ONE broadcast-able row:
    ``cb[s][c]`` = the 8-dim subvector (subspace s) of seed centroid c
    — the ``k`` smallest-vec_id vectors, mirroring the IVF seed
    quantizer (spark.ml KMeans per subspace drops in unchanged).
    """
    sub_dim = 64 // m
    seeds = (
        emb.select("vec_id", V.as_double(F.col("embedding")).alias("v"))
        .orderBy("vec_id")
        .limit(k)
    )
    packed = seeds.agg(
        F.array_sort(F.collect_list(F.struct("vec_id", "v"))).alias("a")
    )
    return packed.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda s: F.transform(
                F.col("a"),
                lambda st: F.slice(st["v"], s * sub_dim + 1, sub_dim),
            ),
        ).alias("cb")
    )


def pq_encode(emb: DataFrame, m: int = 8, k: int = 16) -> DataFrame:
    """Product-quantization encoding: split each 64-dim embedding into
    ``m`` contiguous subvectors and store, per subspace, the id of the
    nearest codebook centroid (L2², first-wins tie to the lowest id).
    (vec_id, c0..c{m-1} int) — 64 floats compressed to m small ints.

    Scale shape: the codebook row (m·k subvectors) broadcasts; the
    encode is a fully NARROW map — per row, m independent argmin folds
    over k centroids, all inside JVM higher-order functions; no
    exchange anywhere. At 100 TB this is the compression pass that
    turns a petabyte of raw vectors into the few-TB code table that
    IVFADC search scans; distances are exact double arithmetic with
    the same left-fold bracketing as the DuckDB oracle, so codes are
    engine-identical.
    """
    sub_dim = 64 // m
    cb = pq_codebook(emb, m, k)
    vs = emb.select(
        "vec_id", V.as_double(F.col("embedding")).alias("v")
    ).crossJoin(F.broadcast(cb))

    def d2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda s, x: s + x,
        )

    # fold state as a homogeneous double array [best_d, best_c, idx]
    # (struct field names do not survive inside HOF lambdas)
    init = F.array(
        F.lit(float("inf")), F.lit(-1.0), F.lit(0.0)
    )
    def make_step(subv):
        def step(acc, cv):
            d = d2(subv, cv)
            return F.array(
                F.least(F.element_at(acc, 1), d),
                F.when(d < F.element_at(acc, 1), F.element_at(acc, 3))
                .otherwise(F.element_at(acc, 2)),
                F.element_at(acc, 3) + 1.0,
            )

        return step

    cols = []
    for s in range(m):
        subv = F.slice(F.col("v"), s * sub_dim + 1, sub_dim)
        fold = F.aggregate(
            F.element_at(F.col("cb"), s + 1), init, make_step(subv)
        )
        cols.append(F.element_at(fold, 2).cast("int").alias(f"c{s}"))
    return vs.select("vec_id", *cols)


def centroid_drift(emb: DataFrame) -> DataFrame:
    """Per-label embedding drift between the corpus' even-id half
    (reference snapshot) and odd-id half (current snapshot): the L2
    distance between the two unit-space centroids —
    (label, n_ref, n_cur, l2_shift). The train/serve-skew and
    re-embedding monitor: a centroid that moves means the upstream
    encoder (or the data mix) changed for that label.

    Exactness contract: both centroids stay RATIONAL until the end —
    per-(label, pos, half) sums of the deterministic int64
    quantization (quantize_col), so the component difference
    qr·n_cur − qc·n_ref is exact integer math; its square widens
    through DECIMAL(19,0)→(38,0) (per-component |num| ≤
    2·n_ref·n_cur·2^20 — int64-safe through ~10^6 vectors per label,
    widen the product operands beyond that), the 64-term sum is an
    exact decimal, and the ONE final sqrt + division are
    deterministic IEEE ops (the 2^20·n_ref·n_cur denominator is a
    power-of-two-scaled exact double). Scale shape: one posexplode +
    one (label, pos) hash aggregate — map-side partials collapse the
    exchange to |labels|·64 rows; everything after is tiny.
    """
    q = quantize_col(V.as_double(F.col("embedding")))
    ex = emb.select(
        "label",
        (F.col("vec_id") % 2 == 0).alias("is_ref"),
        F.posexplode(q).alias("pos", "qv"),
    )
    m = ex.groupBy("label", "pos").agg(
        F.sum(F.when(F.col("is_ref"), F.col("qv"))).alias("qr"),
        F.sum(F.when(~F.col("is_ref"), F.col("qv"))).alias("qc"),
        F.count(F.when(F.col("is_ref"), F.lit(1))).alias("nr"),
        F.count(F.when(~F.col("is_ref"), F.lit(1))).alias("nc"),
    )
    num = (
        F.col("qr") * F.col("nc") - F.col("qc") * F.col("nr")
    ).cast("decimal(19,0)")
    s = (
        m.filter((F.col("nr") > 0) & (F.col("nc") > 0))
        .groupBy("label", "nr", "nc")
        .agg(F.sum(num * num).alias("s2"))
    )
    return s.select(
        "label",
        F.col("nr").alias("n_ref"),
        F.col("nc").alias("n_cur"),
        (
            F.sqrt(F.col("s2").cast("double"))
            / (F.lit(QSCALE) * (F.col("nr") * F.col("nc")).cast("double"))
        ).alias("l2_shift"),
    )


def outlier_distance(emb: DataFrame, k: int = 20) -> DataFrame:
    """Embedding QA: the ``k`` vectors FARTHEST from their own label
    centroid, per label — (label, vec_id, d2, rank). Mislabeled or
    corrupt embeddings surface at the top; the triage feed a corpus
    re-labeling pass consumes.

    Exactness: the centroid is the quantized-int rational (one
    deterministic division per component); each vector's squared
    distance folds over components IN ARRAY ORDER
    (zip_with + ordered aggregate ≡ DuckDB's list_reduce — the
    left-fold bracketing differs only by the exact +0.0 seed), so d2
    is bit-identical cross-engine and the (d2 DESC, vec_id) cut is
    stable. Scale shape: centroids aggregate to |labels|·64 rows and
    broadcast back; the distance pass is narrow; the per-label top-k
    runs as a WindowGroupLimit (rank pushed below the shuffle).
    """
    q = quantize_col(V.as_double(F.col("embedding")))
    m = (
        emb.select("label", F.posexplode(q).alias("pos", "qv"))
        .groupBy("label", "pos")
        .agg(F.sum("qv").alias("qs"), F.count("*").alias("n"))
    )
    cent = (
        m.select(
            "label",
            F.struct(
                "pos",
                (
                    F.col("qs").cast("double")
                    / (F.lit(QSCALE) * F.col("n").cast("double"))
                ).alias("c"),
            ).alias("s"),
        )
        .groupBy("label")
        .agg(F.array_sort(F.collect_list("s")).alias("ss"))
        .select(
            "label", F.transform("ss", lambda s: s["c"]).alias("carr")
        )
    )
    v = V.as_double(F.col("embedding"))
    d2 = F.aggregate(
        F.zip_with(v, F.col("carr"), lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    scored = emb.join(F.broadcast(cent), "label").select(
        "label", "vec_id", d2.alias("d2")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("label").orderBy(F.desc("d2"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("label", "vec_id", "d2", "rank")
    )


def pca_power_iteration(
    emb: DataFrame, squarings: int = 40, dim: int = 64
) -> DataFrame:
    """First principal component of the embedding cloud via power
    iteration on the covariance matrix, then every vector's PC1
    projection: (vec_id, pc1_proj).

    Distributed linear algebra the Spark way: the ONLY data-sized
    passes are (a) one mapInPandas computing each partition's exact
    int64 partial Gram Σqqᵀ (emitted as (i, j, g) triples — d² rows
    per partition, Arrow-batched, order-free integer sums), plus the
    component-sum aggregate for the mean, and (b) the final narrow
    projection pass. The d×d Gram (4096 scalars for d=64) is a
    BOUNDED driver artifact — same class as the fingerprint scalars,
    NOT an O(n) collect — on which the driver runs ``2^squarings``
    deterministic numpy power-iteration steps (fixed all-ones start,
    sign fixed by the largest-|component|), and the resulting unit
    vector broadcasts back as a literal.

    Exactness: vectors are quantized to int64 (floor(x·2^20 + 0.5))
    before the Gram, so the covariance entering power iteration is
    bit-identical regardless of partitioning; everything after is
    driver-deterministic. int64 headroom: |q| ≤ 2^20·max|x|, so each
    product ≤ ~2^40 — a single int64 accumulator cell is only exact
    for ~2^22 rows, so the kernel FLUSHES a partial Gram every 2^22
    rows (still d² triples per flush, Arrow-batched) and the
    cross-partition merge sums in DECIMAL(38,0), exact to ~2^126 —
    billions of rows never wrap. Rows-only check (power iteration is
    not SQL-expressible); accuracy-gated against full numpy PCA in
    pytest.
    """
    import numpy as np

    q = quantize_col(V.as_double(F.col("embedding")))
    src = emb.select("vec_id", q.alias("qv"))

    # |q·q| ≤ 2^40 per row pair-product; 2^22 rows keeps every int64
    # accumulator cell ≤ 2^62 with 2× margin before a flush.
    safe_rows = 1 << 22

    def partial_gram(batches):
        import numpy as np
        import pandas as pd

        ii, jj = np.nonzero(np.ones((dim, dim)))
        acc = np.zeros((dim, dim), dtype=np.int64)
        rows = 0
        seen = False
        for pdf in batches:
            if pdf.empty:
                continue
            seen = True
            M = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
            for s in range(0, len(M), safe_rows):
                blk = M[s : s + safe_rows]
                if rows + len(blk) > safe_rows:
                    yield pd.DataFrame(
                        {"i": ii, "j": jj, "g": acc[ii, jj]}
                    )
                    acc = np.zeros((dim, dim), dtype=np.int64)
                    rows = 0
                acc += blk.T @ blk
                rows += len(blk)
        if seen:
            yield pd.DataFrame({"i": ii, "j": jj, "g": acc[ii, jj]})

    gram_rows = (
        src.select("qv")
        .mapInPandas(partial_gram, "i int, j int, g bigint")
        .groupBy("i", "j")
        .agg(F.sum(F.col("g").cast("decimal(38,0)")).alias("g"))
        .collect()
    )  # bounded d*d artifact, not data-sized
    sums = (
        src.select(F.posexplode("qv").alias("pos", "q"))
        .groupBy("pos")
        .agg(
            F.sum(F.col("q").cast("decimal(38,0)")).alias("s"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    if not sums:
        # empty relation: no component, no projections
        return src.select(
            "vec_id", F.lit(0.0).alias("pc1_proj")
        ).limit(0)
    n = sums[0]["n"]
    mu = np.zeros(dim)
    for r in sums:
        mu[r["pos"]] = float(r["s"]) / n  # exact Decimal -> float64 once
    G = np.zeros((dim, dim))
    for r in gram_rows:
        G[r["i"], r["j"]] = float(r["g"])
    # covariance of the quantized data: (Σqqᵀ − n·μμᵀ) / n
    C = (G - n * np.outer(mu, mu)) / n
    # Power iteration by REPEATED SQUARING: M^(2^k) applied to the
    # all-ones start is 2^k classical power steps in k matrix-matrix
    # products (renormalized each squaring so entries stay finite).
    # Random/synthetic embedding clouds have near-flat spectra
    # (lambda2/lambda1 ~ 1 - 1e-4 at sf0.1) where hundreds of plain
    # steps visibly fail to converge; 2^40 effective steps contract
    # any gap >= 1e-11. Deterministic: a fixed function of the exact
    # int64 Gram.
    nC = np.linalg.norm(C)
    if nC == 0.0:
        # degenerate cloud (all vectors identical): every projection
        # onto any direction is 0 relative to the mean — pick e1
        # deterministically instead of dividing 0/0 into NaNs
        v = np.zeros(dim)
        v[0] = 1.0
    else:
        M = C / nC
        for _ in range(squarings):
            M = M @ M
            M = M / np.linalg.norm(M)
        v = M @ (np.ones(dim) / np.sqrt(dim))
        v = v / np.linalg.norm(v)
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v  # deterministic sign convention

    pc = F.array(*[F.lit(float(x)) for x in v])
    proj = F.aggregate(
        F.zip_with(F.col("qv"), pc, lambda x, c: x.cast("double") * c),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    mu_dot = float(mu @ v)
    return src.select(
        "vec_id",
        ((proj - F.lit(mu_dot)) / F.lit(QSCALE)).alias("pc1_proj"),
    )
