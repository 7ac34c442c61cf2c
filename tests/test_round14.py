"""Round-14 additions: properties beyond the oracle differential
(which tests/test_oracle_parity.py already runs for every new query).
Each class pins the invariant that makes its query TRUSTWORTHY, not
just oracle-consistent — bloom transparency, fold exactness, layout
dominance, version-chain convergence."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_pipeline_postgres_spark.plans import registry

from .conftest import SF_SMOKE

registry.load_all()
SF = SF_SMOKE


class TestFileSkippingAudit:
    def test_clustered_layout_dominates(self, spark):
        rows = registry.QUERIES["layout_file_skipping_audit"](
            spark, SF
        ).collect()
        by = {(r.layout, r.q_label): r for r in rows}
        quarters = sorted({r.q_label for r in rows})
        assert len(quarters) == 8
        for q in quarters:
            c, a = by[("clustered", q)], by[("arrival", q)]
            # tighter zone maps can only skip MORE files (rate-wise)
            assert c.skip_rate >= a.skip_rate
            assert 0.0 <= a.skip_rate <= 1.0
            assert c.n_skipped <= c.n_files
        # month-files outside a quarter always prune: with ~7 years of
        # months, a 3-month quarter keeps <= 5 files (3 months + edge
        # overlap) -> the clustered rate is high where arrival's is ~0
        assert max(by[("clustered", q)].skip_rate for q in quarters) > 0.8

    def test_file_counts_constant_across_predicates(self, spark):
        rows = registry.QUERIES["layout_file_skipping_audit"](
            spark, SF
        ).collect()
        for layout in ("arrival", "clustered"):
            ns = {r.n_files for r in rows if r.layout == layout}
            assert len(ns) == 1  # workload never changes the layout


class TestPartitionSkewAudit:
    def test_counts_and_recommendation_consistent(self, spark):
        rows = registry.QUERIES["layout_partition_skew_audit"](
            spark, SF
        ).collect()
        total = (
            spark.read.parquet(f"{SF}/events.parquet").count()
        )
        assert sum(r.n_rows for r in rows) == total
        assert len(rows) <= 32
        for r in rows:
            # recommended_splits is the integer ceiling of skew_factor
            assert r.recommended_splits - 1 < r.skew_factor
            assert r.skew_factor <= r.recommended_splits
            assert r.recommended_splits >= 1


class TestErFuzzyName:
    def test_pairs_exact_distance_and_group_counts(self, spark):
        rows = registry.QUERIES["parts_er_fuzzy_name"](
            spark, SF
        ).collect()
        assert rows
        parts = spark.read.parquet(f"{SF}/part.parquet").collect()
        groups: dict = {}
        for r in parts:
            g = groups.setdefault((r.p_brand, r.p_name), [])
            g.append(r.p_partkey)

        def lev(a: str, b: str) -> int:
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(
                        min(
                            prev[j] + 1,
                            cur[-1] + 1,
                            prev[j - 1] + (ca != cb),
                        )
                    )
                prev = cur
            return prev[-1]

        rep = {
            (brand, name): (min(keys), len(keys))
            for (brand, name), keys in groups.items()
        }
        by_rep = {v[0]: (brand, name, v[1]) for (brand, name), v in rep.items()}
        for r in rows:
            ba, na, n_a = by_rep[r.part_a]
            bb, nb, n_b = by_rep[r.part_b]
            assert ba == bb == r.brand  # blocking is sound
            assert r.n_a == n_a and r.n_b == n_b
            assert na != nb  # exact dups collapsed, never paired
            assert 1 <= r.lev_dist == lev(na, nb) <= 2

    def test_distinct_name_completeness(self, spark):
        """The blocked + length-banded plan finds EVERY distinct-name
        pair within lev <= 2 (the band is a true lower bound)."""
        import itertools

        parts = spark.read.parquet(f"{SF}/part.parquet").collect()
        names: dict = {}
        for r in parts:
            names.setdefault(r.p_brand, set()).add(r.p_name)

        def lev2(a, b):
            if abs(len(a) - len(b)) > 2:
                return 3
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(
                        min(prev[j] + 1, cur[-1] + 1,
                            prev[j - 1] + (ca != cb))
                    )
                prev = cur
            return prev[-1]

        want = set()
        for brand, ns in names.items():
            for x, y in itertools.combinations(sorted(ns), 2):
                if 1 <= lev2(x, y) <= 2:
                    want.add((brand, x, y))
        got = registry.QUERIES["parts_er_fuzzy_name"](
            spark, SF
        ).count()
        assert got == len(want)

    def test_output_is_vocabulary_bounded(self, spark):
        """The scale contract that motivated the r14 rewrite: output
        pairs track DISTINCT names, not rows — duplicating every part
        must not change the pair count (only the member counts)."""
        p = spark.read.parquet(f"{SF}/part.parquet")
        import pyspark.sql.functions as SF_

        doubled_rows = p.unionByName(
            p.withColumn(
                "p_partkey", SF_.col("p_partkey") + 1000000
            )
        )
        import tempfile

        with tempfile.TemporaryDirectory() as tmp:
            doubled_rows.write.parquet(f"{tmp}/part.parquet")
            base = registry.QUERIES["parts_er_fuzzy_name"](
                spark, SF
            ).collect()
            doubled = registry.QUERIES["parts_er_fuzzy_name"](
                spark, tmp
            ).collect()
        assert len(doubled) == len(base)
        assert {(r.brand, r.part_a, r.part_b) for r in doubled} == {
            (r.brand, r.part_a, r.part_b) for r in base
        }
        assert all(r.n_a + r.n_b for r in base)
        by = {(r.brand, r.part_a, r.part_b): r for r in doubled}
        for r in base:
            d = by[(r.brand, r.part_a, r.part_b)]
            assert d.n_a == 2 * r.n_a and d.n_b == 2 * r.n_b


class TestPriceElasticity:
    def test_closed_form_matches_numpy(self, spark):
        import math

        import numpy as np

        rows = registry.QUERIES["parts_price_elasticity"](
            spark, SF
        ).collect()
        assert rows
        li = spark.read.parquet(f"{SF}/lineitem.parquet").collect()
        obs: dict = {}
        for r in li:
            if r.l_quantity > 0 and r.l_extendedprice > 0:
                xq = math.floor(
                    math.log(
                        r.l_extendedprice
                        * (1.0 - r.l_discount)
                        / r.l_quantity
                    )
                    * 1e4
                )
                yq = math.floor(math.log(r.l_quantity) * 1e4)
                obs.setdefault(r.l_partkey, []).append((xq, yq))
        for r in rows[:50]:
            pts = np.array(obs[r.p_partkey], dtype=np.float64)
            slope = np.polyfit(pts[:, 0], pts[:, 1], 1)[0]
            assert r.n_obs == len(pts) >= 5
            assert abs(r.elasticity - slope) < 1e-6


class TestDpGroupCounts:
    def test_noise_present_deterministic_and_scaled(self, spark):
        q = registry.QUERIES["customers_dp_group_counts"]
        a = {r.segment: r for r in q(spark, SF).collect()}
        b = {r.segment: r for r in q(spark, SF).collect()}
        assert a.keys() == b.keys() and len(a) >= 2
        for seg in a:
            assert a[seg].n_dp == b[seg].n_dp  # reproducible release
            assert a[seg].n_dp != a[seg].n  # noise actually applied
            # Laplace(b=1) at the deterministic quantiles stays modest
            assert abs(a[seg].n_dp - a[seg].n) < 20


class TestSupplierScorecard:
    def test_score_decomposition_bounds(self, spark):
        rows = registry.QUERIES["supplier_scorecard_weighted"](
            spark, SF
        ).collect()
        assert rows
        max_rev = max(r.revenue_cents for r in rows)
        for r in rows:
            # each normalized term is <= 1, latency/discount terms can
            # go negative only if a mean exceeded the max mean — never
            assert r.score <= 1.0 + 1e-9
            if r.revenue_cents == max_rev:
                assert r.score >= 0.5 - 1e-9  # full revenue term


class TestBloomIncremental:
    def test_bloom_is_transparent(self, spark):
        """The headline property: the bloom is a PREFILTER — the
        output must equal the plain exact dup map (false positives
        die at the verify join; false negatives are impossible)."""
        got = {
            tuple(r)
            for r in registry.QUERIES["dedup_bloom_incremental"](
                spark, SF
            ).collect()
        }
        d = spark.read.parquet(f"{SF}/documents.parquet")
        h = F.md5(
            F.substring(F.lower(F.trim(F.col("text"))), 1, 100)
        ).alias("h")
        batch = d.filter(
            (F.col("doc_id") % 10 == 7) & F.col("text").isNotNull()
        ).select("doc_id", h)
        corpus = d.filter(
            (F.col("doc_id") % 10 != 7) & F.col("text").isNotNull()
        ).select(F.col("doc_id").alias("c_doc_id"), h)
        want = {
            tuple(r)
            for r in batch.join(corpus, "h")
            .groupBy("doc_id")
            .agg(
                F.min("c_doc_id").cast("bigint").alias("dup_of"),
                F.count("*").cast("bigint").alias("n_corpus_copies"),
            )
            .collect()
        }
        assert got == want and got

    def test_plan_has_three_broadcast_semijoins(self, spark):
        plan = registry.QUERIES["dedup_bloom_incremental"](
            spark, SF
        )._jdf.queryExecution().executedPlan().toString()
        import re

        semis = len(re.findall(r"BroadcastHashJoin .*LeftSemi", plan))
        assert semis >= 3, f"bloom prefilter not in plan:\n{plan[:2000]}"


class TestIvfDeltaMerge:
    def test_conservation_and_balance(self, spark):
        rows = registry.QUERIES["emb_ivf_delta_merge"](
            spark, SF
        ).collect()
        assert len(rows) == 8
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        n_all = emb.count()
        n_delta = emb.filter(F.col("vec_id") % 10 == 7).count()
        assert sum(r.n_new for r in rows) == n_all
        assert sum(r.n_delta for r in rows) == n_delta
        for r in rows:
            assert r.n_new == r.n_old + r.n_delta
        assert abs(sum(r.load_ratio for r in rows) - 8.0) < 1e-9


class TestStreamScd2Apply:
    def test_version_chain_monotone_and_final_current_unique(
        self, spark
    ):
        from data_pipeline_postgres_spark.streaming import jobs

        final = jobs.scd2_apply_stream(spark, SF)
        rows = final.collect()
        dim_root = os.path.join(jobs._SCRATCH, "scd2_dim")
        versions = sorted(
            int(v[1:]) for v in os.listdir(dim_root)
            if v.startswith("v")
        )
        assert versions == [0, 1, 2]
        counts = [
            spark.read.parquet(
                os.path.join(dim_root, f"v{b}")
            ).count()
            for b in versions
        ]
        assert counts[0] < counts[1] < counts[2] == len(rows)
        # SCD2 invariants on the final dimension
        cur = [r for r in rows if r.is_current]
        by_key: dict = {}
        for r in rows:
            by_key.setdefault(r.o_custkey, []).append(r)
        assert len(cur) == len(by_key)  # exactly one current per key
        # r16 shape (FIXTURES.md F6): nullable TIMESTAMP_NTZ bounds,
        # NULL valid_to on exactly the open interval per key
        for k, ivs in by_key.items():
            ivs.sort(
                key=lambda r: (r.valid_from, r.o_orderkey)
            )
            for a, b in zip(ivs, ivs[1:]):
                assert a.valid_to == b.valid_from  # gap-free chain
            assert ivs[-1].valid_to is None
        assert all(
            (r.valid_to is None) == r.is_current for r in rows
        )


class TestIvmAggMaintenance:
    def test_maintained_equals_direct_recompute(self, spark):
        """IVM algebra check via an independent Spark path: aggregate
        the refreshed relation DIRECTLY and compare to the signed
        partial merge (the oracle proves it against DuckDB; this
        proves it against a second in-engine plan)."""
        got = {
            (r.l_returnflag, r.l_linestatus): (
                r.sum_qty,
                r.sum_base_price,
                r.count_order,
            )
            for r in registry.QUERIES["pipeline_ivm_agg_maintenance"](
                spark, SF
            ).collect()
        }
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        refreshed = li.filter(F.col("l_orderkey") % 97 != 0).select(
            "l_returnflag",
            "l_linestatus",
            F.col("l_quantity").cast("decimal(18,2)").alias("q"),
            F.col("l_extendedprice").cast("decimal(18,2)").alias("p"),
        ).unionByName(
            li.filter(F.col("l_orderkey") % 89 == 0).select(
                "l_returnflag",
                "l_linestatus",
                (F.col("l_quantity") + 1).cast("decimal(18,2)").alias("q"),
                F.col("l_extendedprice").cast("decimal(18,2)").alias("p"),
            )
        )
        want = {
            (r.l_returnflag, r.l_linestatus): (
                r.sum_qty,
                r.sum_base_price,
                r.count_order,
            )
            for r in refreshed.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("q").cast("double").alias("sum_qty"),
                F.sum("p").cast("double").alias("sum_base_price"),
                F.count("*").cast("bigint").alias("count_order"),
            )
            .collect()
        }
        assert got == want

    def test_delta_only_plan(self, spark):
        """The merge never re-aggregates the refreshed base: the plan
        holds exactly three aggregations over lineitem scans (base,
        deletes, inserts) plus the final partial merge — no join, no
        scan of a unioned refreshed relation."""
        plan = registry.QUERIES["pipeline_ivm_agg_maintenance"](
            spark, SF
        )._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan


class TestNibbleEntropy:
    def test_matches_python_and_bounds(self, spark):
        import math

        rows = registry.QUERIES["multimodal_nibble_entropy"](
            spark, SF
        ).collect()
        assert rows
        docs = {
            r.doc_id: r.text
            for r in spark.read.parquet(
                f"{SF}/documents.parquet"
            ).collect()
            if r.text
        }
        for r in rows[:100]:
            raw = docs[r.doc_id].encode("utf-8")
            assert r.n_bytes == len(raw)
            h = raw.hex().upper()
            total = 0
            for c in "0123456789ABCDEF":
                n = h.count(c)
                if n:
                    p = n / len(h)
                    total += math.floor(-p * math.log(p) * 1e6 + 0.5)
            want = total / 1e6
            assert abs(r.entropy_nats - want) < 1e-9
            assert 0.0 <= r.entropy_nats <= math.log(16) + 1e-6
            assert r.entropy_class == (
                "low" if r.entropy_nats < 1.5 else "normal"
            )


class TestShapleyAttribution:
    def test_efficiency_axiom_exact(self, spark):
        """Shapley's efficiency axiom, asserted on the x24 integers:
        the channel values sum EXACTLY to the total attributed
        conversions v(full) = converting journeys with >=1 touch."""
        rows = registry.QUERIES["events_attribution_shapley"](
            spark, SF
        ).collect()
        assert {r.channel for r in rows} == {
            "click", "error", "signup", "view",
        }
        ev = spark.read.parquet(f"{SF}/events.parquet").collect()
        by_user: dict = {}
        for e in ev:
            by_user.setdefault(e.user_id, []).append(e)
        bit = {"click": 1, "error": 2, "signup": 4, "view": 8}
        v_full = 0
        touched = dict.fromkeys(bit, 0)
        for es in by_user.values():
            es.sort(key=lambda e: (e.ts, e.event_id))
            mask, converted = 0, False
            journeys = []
            for e in es:
                if e.event_type == "purchase":
                    journeys.append((mask, True))
                    mask = 0
                else:
                    mask |= bit[e.event_type]
            for m, conv in journeys:
                if conv and m > 0:
                    v_full += 1
                    for c, b in bit.items():
                        if m & b:
                            touched[c] += 1
        assert sum(r.shapley_x24 for r in rows) == 24 * v_full
        for r in rows:
            assert r.n_journeys_touched == touched[r.channel]
            assert abs(r.shapley - r.shapley_x24 / 24.0) < 1e-12
            # null player upper bound: no channel can earn more than
            # the journeys it actually touched
            assert r.shapley <= r.n_journeys_touched + 1e-9


class TestEoqPolicy:
    def test_formula_exact(self, spark):
        import math

        rows = registry.QUERIES["parts_eoq_policy"](spark, SF).collect()
        assert rows
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        span = li.selectExpr(
            "datediff(max(cast(l_shipdate as date)),"
            " min(cast(l_shipdate as date))) + 1 as n"
        ).collect()[0].n
        price = {
            r.p_partkey: r.p_retailprice
            for r in spark.read.parquet(f"{SF}/part.parquet").collect()
        }
        qty: dict = {}
        for r in li.groupBy("l_partkey").agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("q")
        ).collect():
            qty[r.l_partkey] = r.q
        for r in rows[:50]:
            assert r.total_qty == qty[r.p_partkey]
            annual = r.total_qty * 365.0 / span
            assert r.annual_demand == annual
            assert r.eoq_units == math.sqrt(
                2.0 * annual * 100.0 / (0.2 * price[r.p_partkey])
            )
            assert r.reorder_point_units == annual / 365.0 * 7.0


class TestGapFillInterpolate:
    def test_interpolation_exact_and_gaps_present(self, spark):
        rows = registry.QUERIES["events_gap_fill_interpolate"](
            spark, SF
        ).collect()
        assert rows
        n_gap = sum(1 for r in rows if not r.is_observed)
        assert n_gap > 0  # the corpus genuinely exercises the lerp arm
        by_user: dict = {}
        for r in rows:
            by_user.setdefault(r.user_id, []).append(r)
        for series in by_user.values():
            series.sort(key=lambda r: r.day)
            # endpoints observed (calendar bounded by observations)
            assert series[0].is_observed and series[-1].is_observed
            obs = [
                (i, r.y_filled)
                for i, r in enumerate(series)
                if r.is_observed
            ]
            for (i0, y0), (i1, y1) in zip(obs, obs[1:]):
                for j in range(i0 + 1, i1):
                    want = y0 + (y1 - y0) * ((j - i0) / (i1 - i0))
                    assert series[j].y_filled == want
