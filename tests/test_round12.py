"""Round-12 semantic-invariant tests: shelf packing (no overflow, no
split, utilization bound), payload near-dup (both-branch
falsifiability, symmetry), and the capped mixture solver (budget
conservation, cap respect, BOTH capped and uncapped present)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_postgres_spark.plans import registry

registry.load_all()

SF = "/root/testdata/sf0.001"
L = 512


class TestPackBestfit:
    @pytest.fixture(scope="class")
    def placed(self, spark):
        return registry.QUERIES["docs_pack_bestfit"](spark, SF).cache()

    def test_every_positive_doc_placed_once(self, spark, placed):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        n_pos = docs.filter(
            F.size(F.split(F.trim("text"), r"\s+")) > 0
        ).count()
        assert placed.count() == n_pos
        assert placed.select("doc_id").distinct().count() == n_pos

    def test_docs_fit_their_class(self, placed):
        # class is the rounding-up target; docs longer than the
        # context clamp to the full-bin class (truncation policy)
        bad = placed.filter(
            (F.col("n_tokens") > F.col("size_class"))
            & (F.col("size_class") < L)
        )
        assert bad.count() == 0

    def test_no_bin_overflow_and_no_slot_collision(self, placed):
        per_bin = placed.groupBy("bin_id").agg(
            F.sum("size_class").alias("reserved"),
            F.count("*").alias("n"),
            F.count_distinct("slot").alias("slots"),
        )
        assert per_bin.filter(F.col("reserved") > L).count() == 0
        assert per_bin.filter(F.col("n") != F.col("slots")).count() == 0
        # a bin holds one class only (shelf invariant)
        mixed = placed.groupBy("bin_id").agg(
            F.count_distinct("size_class").alias("ncls")
        )
        assert mixed.filter(F.col("ncls") > 1).count() == 0

    def test_offsets_are_class_aligned(self, placed):
        bad = placed.filter(
            F.col("bin_offset") != F.col("slot") * F.col("size_class")
        )
        assert bad.count() == 0

    def test_decreasing_within_bin_ordering(self, placed):
        # FFD: within a class, earlier bins hold the longer docs —
        # min length of bin b >= max length of bin b+1 (same class)
        agg = (
            placed.groupBy("size_class", "bin_id")
            .agg(
                F.min("n_tokens").alias("mn"),
                F.max("n_tokens").alias("mx"),
            )
            .collect()
        )
        by_class: dict = {}
        for r in agg:
            by_class.setdefault(r["size_class"], []).append(
                (r["bin_id"], r["mn"], r["mx"])
            )
        for rows in by_class.values():
            rows.sort()
            for (_, mn, _), (_, _, mx_next) in zip(rows, rows[1:]):
                assert mn >= mx_next


class TestPackEfficiency:
    def test_tradeoff_row_is_consistent(self, spark):
        row = registry.QUERIES["docs_pack_efficiency"](
            spark, SF
        ).collect()[0]
        # chunk uses the bin-count lower bound; shelf pays padding
        assert row["shelf_bins"] >= row["chunk_bins"]
        assert 0.5 <= row["shelf_util"] <= 1.0 or row["shelf_bins"] <= 7
        # shelf never splits; chunk split count matches fragmentation
        frag = registry.QUERIES["docs_pack_fragmentation"](
            spark, SF
        ).collect()[0]
        assert row["chunk_split_docs"] == frag["n_split_docs"]
        assert row["n_docs"] == frag["n_docs"]
        # shelf bin count agrees with the placement query
        placed = registry.QUERIES["docs_pack_bestfit"](spark, SF)
        assert (
            placed.select("bin_id").distinct().count()
            == row["shelf_bins"]
        )


class TestPayloadDedup:
    def test_both_branches_and_symmetry(self, spark):
        pairs = registry.QUERIES["dedup_payload_shingle"](
            spark, SF
        ).cache()
        n = pairs.count()
        assert n > 0, "no near-dup payloads found: threshold unfalsifiable"
        assert pairs.filter(F.col("doc_a") >= F.col("doc_b")).count() == 0
        assert (
            pairs.filter(
                (F.col("jaccard") < 0.5) | (F.col("jaccard") > 1.0)
            ).count()
            == 0
        )
        # the threshold genuinely bites: the candidate space (pairs
        # sharing >=1 rare gram) is far larger than the admitted set
        assert n < 1000

    def test_known_near_dup_pair_detected(self, spark):
        # validated against whole-payload 8-gram Jaccard ~0.99: the
        # top-scoring pair must agree with a direct computation over
        # one pair of payloads
        pairs = registry.QUERIES["dedup_payload_shingle"](spark, SF)
        top = pairs.orderBy(F.desc("jaccard")).limit(1).collect()[0]
        docs = spark.read.parquet(f"{SF}/documents.parquet").filter(
            F.col("doc_id").isin(top["doc_a"], top["doc_b"])
        )
        texts = {r["doc_id"]: r["text"] for r in docs.collect()}

        def grams(t: str) -> set:
            b = t.encode()
            return {b[i : i + 8] for i in range(len(b) - 7)}

        ga, gb = grams(texts[top["doc_a"]]), grams(texts[top["doc_b"]])
        full_j = len(ga & gb) / len(ga | gb)
        assert full_j >= 0.8, (
            "top rare-gram pair is not a genuine near-dup "
            f"(full-gram jaccard {full_j:.2f})"
        )


class TestMixCappedAlloc:
    @pytest.fixture(scope="class", params=[SF, "/root/testdata/sf0.01"])
    def alloc(self, request, spark):
        return registry.QUERIES["docs_mix_capped_alloc"](
            spark, request.param
        ).cache()

    def test_both_outcomes_present(self, alloc):
        rows = alloc.collect()
        capped = [r for r in rows if r["capped"]]
        uncapped = [r for r in rows if not r["capped"]]
        assert capped, "no source capped: the solver branch is dead"
        assert uncapped, "every source capped: budget not binding"

    def test_caps_respected_and_budget_conserved(self, alloc):
        rows = alloc.collect()
        total = sum(r["n_tokens"] for r in rows)
        budget = total * 97 // 100
        for r in rows:
            assert r["alloc_tokens"] <= r["cap_tokens"]
            if r["capped"]:
                assert r["alloc_tokens"] == r["cap_tokens"]
            else:
                assert r["alloc_tokens"] < r["cap_tokens"]
        spent = sum(r["alloc_tokens"] for r in rows)
        # floor-quantization leaves at most one token of dust per
        # share computation (|sources| + rounds of floors)
        assert budget - len(rows) * 4 <= spent <= budget

    def test_capped_sources_are_the_small_ones(self, alloc):
        # sqrt weighting upsamples small sources — they hit the
        # 1-epoch cap first; every capped source must be smaller than
        # every uncapped one is NOT guaranteed (redistribution), but
        # the smallest source must cap and the largest must not
        rows = sorted(alloc.collect(), key=lambda r: r["n_tokens"])
        assert rows[0]["capped"]
        assert not rows[-1]["capped"]
