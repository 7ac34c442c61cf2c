"""Round-7 additions: containment dedup, market-basket pairs,
mergeable sketches, vocab coverage, binaryFile ingest, multi-probe
LSH. Oracle parity runs separately (test_oracle_parity.py); these are
the semantic/accuracy gates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_postgres_spark.catalog import load_table
from data_pipeline_postgres_spark.operators import (
    dedup,
    multimodal,
    similarity,
)
from data_pipeline_postgres_spark.plans import registry

from .conftest import SF_SMOKE

registry.load_all()


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents").cache()


class TestContainment:
    def test_containment_dominates_jaccard(self, docs):
        """|∩|/min(|A|,|B|) ≥ |∩|/|∪| always — every Jaccard-0.8 pair
        must reappear at containment ≥ 0.8, and a planted
        sub-document pair scores higher on containment."""
        sh = dedup.doc_shingles(docs)
        jac = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in dedup.jaccard_pairs(sh, None, 0.8).collect()
        }
        cont = {
            (r.doc_a, r.doc_b): r.containment
            for r in dedup.containment_pairs(sh, None, 0.8).collect()
        }
        assert jac, "fixture should contain near-dup pairs"
        for pair, j in jac.items():
            assert pair in cont
            assert cont[pair] >= j - 1e-12

    def test_planted_subdocument_found(self, spark):
        """A short doc embedded verbatim in a long one: Jaccard is
        tiny, containment is 1.0 — only the latter flags it."""
        short = "alpha beta gamma delta epsilon zeta"
        long = short + " " + " ".join(f"tok{i}" for i in range(200))
        df = spark.createDataFrame(
            [(1, short), (2, long)], ["doc_id", "text"]
        )
        sh = dedup.doc_shingles(df)
        cont = dedup.containment_pairs(sh, None, 0.9).collect()
        assert [(r.doc_a, r.doc_b) for r in cont] == [(1, 2)]
        assert cont[0].containment == pytest.approx(1.0)
        assert not dedup.jaccard_pairs(sh, None, 0.9).collect()


class TestCopurchase:
    def test_pairs_canonical_and_bounded(self, spark):
        out = registry.QUERIES["orders_copurchase_pairs"](
            spark, SF_SMOKE
        ).collect()
        assert 0 < len(out) <= 20
        for r in out:
            assert r.brand_a < r.brand_b
            assert r.n_orders >= 1
        # descending count order with deterministic tiebreak
        keys = [(-r.n_orders, r.brand_a, r.brand_b) for r in out]
        assert keys == sorted(keys)

    def test_pair_count_matches_manual(self, spark):
        """An order containing brands {X, Y} (deduped) contributes
        exactly one count to pair (X, Y)."""
        l = load_table(spark, SF_SMOKE, "lineitem")
        p = load_table(spark, SF_SMOKE, "part")
        basket = (
            l.join(p, l.l_partkey == p.p_partkey)
            .select("l_orderkey", "p_brand")
            .distinct()
        )
        out = registry.QUERIES["orders_copurchase_pairs"](spark, SF_SMOKE)
        top = out.first()
        a = basket.filter(F.col("p_brand") == top.brand_a).select(
            "l_orderkey"
        )
        b = basket.filter(F.col("p_brand") == top.brand_b).select(
            "l_orderkey"
        )
        assert a.intersect(b).count() == top.n_orders


class TestSketches:
    def test_hll_rollup_close_to_exact(self, spark):
        ev = load_table(spark, SF_SMOKE, "events")
        exact = {
            (r[0], r[1]): r[2]
            for r in ev.groupBy(
                "event_type", F.date_format("ts", "yyyy-MM").alias("m")
            )
            .agg(F.countDistinct("user_id"))
            .collect()
        }
        est = {
            (r.event_type, r.month): r.est_users
            for r in registry.QUERIES["agg_hll_sketch_rollup"](
                spark, SF_SMOKE
            ).collect()
        }
        assert set(est) == set(exact)
        for k in exact:
            assert abs(est[k] - exact[k]) <= max(0.05 * exact[k], 2), (
                k, est[k], exact[k],
            )

    def test_kll_rollup_close_to_exact(self, spark):
        exact = {
            r.o_orderstatus: (r.p50, r.p90, r.p99)
            for r in registry.QUERIES["agg_percentile"](
                spark, SF_SMOKE
            ).collect()
        }
        approx = {
            r.o_orderstatus: (r.p50, r.p90, r.p99)
            for r in registry.QUERIES["agg_kll_quantile_sketch"](
                spark, SF_SMOKE
            ).collect()
        }
        assert set(approx) == set(exact)
        for k, ex in exact.items():
            for a, b in zip(approx[k], ex):
                assert abs(a - b) / abs(b) <= 0.05, (k, approx[k], ex)


class TestVocabCoverage:
    def test_rates_and_totals(self, spark, docs):
        from data_pipeline_postgres_spark.functions import text as TX

        out = registry.QUERIES["tokenizer_vocab_coverage"](
            spark, SF_SMOKE
        )
        rows = out.collect()
        assert len(rows) == docs.count()
        for r in rows:
            assert 0.0 <= r.oov_rate <= 1.0
            assert 0 <= r.n_oov <= r.n_tokens
        # total token count matches the tokenizer's own census
        total = docs.select(
            F.sum(F.size(TX.tokens("text"))).alias("t")
        ).collect()[0].t
        assert sum(r.n_tokens for r in rows) == total


class TestBinaryFileIngest:
    def test_roundtrip_matches_payload_meta(self, spark, docs):
        out = {
            r.file_name: (r.n_bytes, r.content_sha)
            for r in registry.QUERIES["binary_file_ingest"](
                spark, SF_SMOKE
            ).collect()
        }
        meta = {
            f"doc_{r.doc_id}.bin": (r.n_bytes, r.content_sha)
            for r in multimodal.payload_meta(docs).collect()
        }
        assert out == meta


class TestMultiProbeLsh:
    def test_probe_count_and_subset(self, spark):
        emb = load_table(spark, SF_SMOKE, "embeddings").cache()
        brute = {
            r.vec_id: r.cosine
            for r in similarity.brute_topk(emb, k=10**6).collect()
        }
        got = similarity.lsh_topk(emb, k=10).collect()
        assert got
        for r in got:
            assert brute[r.vec_id] == r.cosine
        # flipping every bit of an exhaustive probe set (flip=planes)
        # must recover the exact top-k: all buckets probed
        full = similarity.lsh_topk(emb, k=10, planes=4, flip=4).collect()
        exact = similarity.brute_topk(emb, k=10).collect()
        assert [r.vec_id for r in full] == [r.vec_id for r in exact]
