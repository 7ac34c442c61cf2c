"""Round-8 additions: Gini concentration, backlog sweep, rolling
slope, embedding drift/outlier QA, vocab growth, boilerplate n-grams,
pow2 length histogram, cross-source dedup matrix. Oracle parity runs
separately (test_oracle_parity.py); these are semantic gates — each
query's distributed answer is re-derived with an independent
driver-side (numpy/python) computation or a conservation law.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_pipeline_postgres_spark.catalog import load_table
from data_pipeline_postgres_spark.operators import dedup, embeddings
from data_pipeline_postgres_spark.plans import registry

from .conftest import SF_SMOKE

registry.load_all()
Q = registry.QUERIES


class TestGini:
    def test_matches_sequential_reference(self, spark):
        """The distributed Gini equals a driver-side recomputation
        from the raw per-user counts — exactly, because every moment
        is integer until the single final division."""
        got = {
            r["event_type"]: (r["n_users"], r["total_events"], r["gini"])
            for r in Q["events_user_gini"](spark, SF_SMOKE).collect()
        }
        ev = load_table(spark, SF_SMOKE, "events")
        raw = (
            ev.groupBy("event_type", "user_id")
            .agg(F.count("*").alias("x"))
            .collect()
        )
        by_type: dict[str, list[tuple[int, int]]] = {}
        for r in raw:
            by_type.setdefault(r["event_type"], []).append(
                (r["x"], r["user_id"])
            )
        for et, xs in by_type.items():
            xs.sort()  # (x, user_id) ascending — the query's rank order
            n = len(xs)
            sx = sum(x for x, _ in xs)
            six = sum((i + 1) * x for i, (x, _) in enumerate(xs))
            want = float(2 * six - (n + 1) * sx) / float(n * sx)
            assert got[et] == (n, sx, want)

    def test_bounds(self, spark):
        for r in Q["events_user_gini"](spark, SF_SMOKE).collect():
            assert 0.0 <= r["gini"] < 1.0


class TestBacklogSweep:
    def test_conservation(self, spark):
        """Every lineitem contributes exactly one +1 and one −1, so
        opened and shipped each total |lineitem| and the final
        backlog is exactly 0. (No per-day ≥0 assertion: the synthetic
        corpus contains ship-before-order rows, and a negative
        running value is precisely the data-quality signal the sweep
        surfaces for them.)"""
        rows = (
            Q["orders_ship_backlog_daily"](spark, SF_SMOKE)
            .orderBy("day")
            .collect()
        )
        assert rows
        li_n = load_table(spark, SF_SMOKE, "lineitem").count()
        assert sum(r["opened"] for r in rows) == li_n
        assert sum(r["shipped"] for r in rows) == li_n
        assert rows[-1]["open_backlog"] == 0
        # the running sum IS the prefix of the deltas
        run = 0
        for r in rows:
            run += r["opened"] - r["shipped"]
            assert r["open_backlog"] == run


class TestRollingSlope:
    def test_matches_sequential_reference(self, spark):
        """Each row's slope equals the normal-equation slope computed
        driver-side from the trailing ≤7 daily counts — exactly."""
        got = {
            (r["event_type"], r["day_offset"]): (r["n_win"], r["slope"])
            for r in Q["events_rolling_slope_7d"](spark, SF_SMOKE).collect()
        }
        daily = (
            load_table(spark, SF_SMOKE, "events")
            .groupBy(
                "event_type",
                F.datediff(
                    F.date_trunc("day", "ts").cast("date"),
                    F.lit("1995-01-01").cast("date"),
                ).alias("x"),
            )
            .agg(F.count("*").alias("y"))
            .collect()
        )
        series: dict[str, list[tuple[int, int]]] = {}
        for r in daily:
            series.setdefault(r["event_type"], []).append((r["x"], r["y"]))
        checked = 0
        for et, xs in series.items():
            xs.sort()
            for i in range(len(xs)):
                win = xs[max(0, i - 6) : i + 1]
                n = len(win)
                sx = sum(x for x, _ in win)
                sy = sum(y for _, y in win)
                sxx = sum(x * x for x, _ in win)
                sxy = sum(x * y for x, y in win)
                den = n * sxx - sx * sx
                want = (
                    float(n * sxy - sx * sy) / float(den)
                    if den > 0
                    else None
                )
                assert got[(et, xs[i][0])] == (n, want)
                checked += 1
        assert checked == len(got)


class TestEmbeddingDrift:
    def test_matches_numpy_mirror(self, spark):
        """l2_shift equals the numpy recomputation through the SAME
        quantization kernel (dedup.quantize_np) — bit-for-bit."""
        import numpy as np

        emb = load_table(spark, SF_SMOKE, "embeddings")
        got = {
            r["label"]: (r["n_ref"], r["n_cur"], r["l2_shift"])
            for r in Q["emb_label_drift"](spark, SF_SMOKE).collect()
        }
        rows = emb.collect()
        by_label: dict[int, dict[bool, list]] = {}
        for r in rows:
            by_label.setdefault(r["label"], {True: [], False: []})[
                r["vec_id"] % 2 == 0
            ].append(r["embedding"])
        for label, halves in by_label.items():
            nr, nc = len(halves[True]), len(halves[False])
            if nr == 0 or nc == 0:
                assert label not in got
                continue
            qr = dedup.quantize_np(np.array(halves[True], dtype=np.float64))
            qc = dedup.quantize_np(np.array(halves[False], dtype=np.float64))
            num = qr.sum(axis=0).astype(object) * nc - qc.sum(
                axis=0
            ).astype(object) * nr
            s2 = sum(int(v) * int(v) for v in num)
            want = math.sqrt(float(s2)) / (
                dedup.QSCALE * float(nr * nc)
            )
            assert got[label] == (nr, nc, want)

    def test_outlier_topk_agrees_with_numpy_argmax(self, spark):
        """The per-label rank-1 outlier is the vector with the
        numpy-computed maximum distance to the quantized centroid."""
        import numpy as np

        emb = load_table(spark, SF_SMOKE, "embeddings")
        rows = emb.collect()
        got = Q["emb_outlier_topk"](spark, SF_SMOKE).collect()
        assert got
        for r in got:
            assert r["d2"] >= 0.0
            assert 1 <= r["rank"] <= 20
        top1 = {
            r["label"]: r["vec_id"] for r in got if r["rank"] == 1
        }
        by_label: dict[int, list] = {}
        for r in rows:
            by_label.setdefault(r["label"], []).append(
                (r["vec_id"], r["embedding"])
            )
        for label, vecs in by_label.items():
            mat = np.array([v for _, v in vecs], dtype=np.float64)
            q = dedup.quantize_np(mat)
            cent = q.sum(axis=0) / (dedup.QSCALE * len(vecs))
            d2 = ((mat - cent) ** 2).sum(axis=1)
            best = min(
                zip(-d2, [vid for vid, _ in vecs])
            )  # max d2, tie → min vec_id
            assert top1[label] == best[1]


class TestVocabGrowth:
    def test_cumulative_equals_total_vocab(self, spark):
        from data_pipeline_postgres_spark.functions import text as TX

        rows = (
            Q["docs_vocab_growth"](spark, SF_SMOKE).orderBy("decile").collect()
        )
        assert rows
        assert all(0 <= r["decile"] <= 9 for r in rows)
        total_vocab = (
            load_table(spark, SF_SMOKE, "documents")
            .select(F.explode(TX.tokens("text")).alias("tok"))
            .distinct()
            .count()
        )
        assert rows[-1]["vocab_cum"] == total_vocab
        assert rows[-1]["vocab_cum"] == sum(r["n_new_tokens"] for r in rows)
        # curve is nondecreasing by construction
        cums = [r["vocab_cum"] for r in rows]
        assert cums == sorted(cums)


class TestLengthHistogram:
    def test_partition_of_docs(self, spark):
        from data_pipeline_postgres_spark.functions import text as TX

        rows = Q["docs_length_histogram_pow2"](spark, SF_SMOKE).collect()
        docs = load_table(spark, SF_SMOKE, "documents")
        n_nonempty = docs.filter(
            F.size(TX.tokens("text")) >= 1
        ).count()
        assert sum(r["n_docs"] for r in rows) == n_nonempty
        for r in rows:
            lo, hi = r["bucket_lo"], r["bucket_hi"]
            assert lo & (lo - 1) == 0  # power of two
            assert hi == 2 * lo - 1


class TestNearDupMatrix:
    def test_matrix_total_equals_pair_count(self, spark):
        docs = load_table(spark, SF_SMOKE, "documents")
        n_pairs = dedup.minhash_dedup(docs).count()
        rows = Q["docs_near_dup_rate_by_source"](spark, SF_SMOKE).collect()
        assert sum(r["n_pairs"] for r in rows) == n_pairs
        for r in rows:
            assert r["source_x"] <= r["source_y"]


class TestBoilerplate:
    def test_df_gate_and_frac(self, spark):
        rows = Q["docs_boilerplate_ngrams"](spark, SF_SMOKE).collect()
        n_docs = load_table(spark, SF_SMOKE, "documents").count()
        for r in rows:
            assert r["df"] >= 3
            assert r["doc_frac"] == r["df"] / n_docs


class TestPlanContracts:
    """Physical-plan assertions for the round-8 family: the scale
    claims in the docstrings are enforced, not aspirational."""

    def _plan(self, df) -> str:
        return df._jdf.queryExecution().executedPlan().toString()

    def test_boilerplate_topk_is_take_ordered(self, spark):
        plan = self._plan(Q["docs_boilerplate_ngrams"](spark, SF_SMOKE))
        assert "TakeOrderedAndProject" in plan

    def test_outlier_topk_is_window_group_limit(self, spark):
        plan = self._plan(Q["emb_outlier_topk"](spark, SF_SMOKE))
        assert "WindowGroupLimit" in plan

    def test_gini_rank_window_is_per_type(self, spark):
        """The rank window must be PARTITIONED (per event_type), not a
        global single-partition sort."""
        plan = self._plan(Q["events_user_gini"](spark, SF_SMOKE))
        assert "SinglePartition" not in plan

    def test_zscore_windows_are_per_type(self, spark):
        plan = self._plan(
            Q["events_anomaly_zscore_rolling"](spark, SF_SMOKE)
        )
        assert "SinglePartition" not in plan

    def test_drift_aggregate_is_partial(self, spark):
        """The (label, pos) quantized sums must map-side combine."""
        plan = self._plan(Q["emb_label_drift"](spark, SF_SMOKE))
        assert "partial_sum" in plan

    def test_mix_alloc_broadcasts_the_total(self, spark):
        plan = self._plan(Q["docs_mix_temperature_alloc"](spark, SF_SMOKE))
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan


class TestJdbcPartitionedScan:
    def test_generated_predicates_partition_the_table(self, spark):
        """The 8 WHERE clauses Spark's JDBCRelation would generate for
        (partitionColumn=o_orderkey, bounds=[min, max+1), num=8) are
        DISJOINT and COVERING — their slice row counts equal the
        query's report exactly, and they sum to the full table."""
        o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey")
        lo, up = o.agg(
            F.min("o_orderkey"), F.max("o_orderkey") + 1
        ).collect()[0]
        stride = up // 8 - lo // 8
        preds = []
        for i in range(8):
            lo_i = lo + i * stride
            hi_i = lo + (i + 1) * stride
            if i == 0:
                preds.append(F.col("o_orderkey") < hi_i)
            elif i == 7:
                preds.append(F.col("o_orderkey") >= lo_i)
            else:
                preds.append(
                    (F.col("o_orderkey") >= lo_i)
                    & (F.col("o_orderkey") < hi_i)
                )
        counts = [o.filter(p).count() for p in preds]
        total = o.count()
        assert sum(counts) == total  # covering AND disjoint (no overlap
        # can hide: any double-counted row would push the sum past total)
        got = {
            r["slice_id"]: r["n_rows"]
            for r in Q["jdbc_scan_partitioned"](spark, SF_SMOKE).collect()
        }
        for i, c in enumerate(counts):
            assert got.get(i, 0) == c
