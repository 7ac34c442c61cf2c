"""Round-13 tests: advisory fixes + new operators.

Covers (r12 advisory):
- Kaplan-Meier exhausted-risk-set edge (d_events == n_risk): the ln
  term must not evaluate ln(0) on either engine, and survival emits
  NULL from the exhausted bin on.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_postgres_spark.plans import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from tests.conftest import get_spark

    return get_spark()


class TestKaplanMeierExhaustedRiskSet:
    """The advertised NULL semantics are data-dependent; synthesize
    the data that hits them (r12 advisory, queries_r12.py KM oracle).

    Construction: the censored max-date holder lives in bin 0 while a
    long-lived churned customer lands alone in bin 1 — so bin 1's
    risk set is exactly its event count (d = n = 1), survival is 0
    from bin 1 on, and both engines must emit NULL without ever
    evaluating ln(0).
    """

    ROWS = [
        # custkey, orderdate            (w = 2020-12-31, cdate = 10-02)
        (1, "2020-12-01"),  # A censored: t=30  -> bin 0
        (1, "2020-12-31"),
        (2, "2019-01-01"),  # B churned:  t=151 -> bin 1
        (2, "2019-06-01"),
    ]

    @pytest.fixture(scope="class")
    def sf_dir(self, spark, tmp_path_factory):
        d = tmp_path_factory.mktemp("km_edge")
        spark.createDataFrame(
            [(k, ds) for k, ds in self.ROWS],
            "o_custkey bigint, ds string",
        ).select(
            "o_custkey",
            F.col("ds").cast("timestamp").alias("o_orderdate"),
        ).coalesce(1).write.mode("overwrite").parquet(
            str(d / "orders.parquet")
        )
        return str(d)

    def test_spark_emits_null_from_exhausted_bin(self, spark, sf_dir):
        rows = {
            r.t_bin: r
            for r in registry.QUERIES["customers_kaplan_meier"](
                spark, sf_dir
            ).collect()
        }
        assert set(rows) == {0, 1}
        assert rows[1].n_risk == rows[1].d_events == 1
        assert rows[0].km_logq_nano == 0  # no events in bin 0
        assert rows[1].km_logq_nano is None  # survival exactly 0

    def test_oracle_matches_on_the_edge(self, spark, sf_dir):
        import duckdb

        from tests.oracle_util import assert_matches_oracle

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{sf_dir}/orders.parquet/*.parquet')"
        )
        assert_matches_oracle(
            registry.QUERIES["customers_kaplan_meier"](spark, sf_dir),
            con,
            registry.ORACLES["customers_kaplan_meier"],
            name="customers_kaplan_meier[km-edge]",
        )


class TestCdcChunksKernel:
    """The vectorized gear kernel (operators/multimodal.cdc_chunks_np)
    must produce EXACTLY the SQL fold's chunks — same boundaries, same
    content — at the storage mask."""

    def test_kernel_equals_sql_fold_mask64(self, spark):
        from data_pipeline_postgres_spark.operators import multimodal
        from data_pipeline_postgres_spark.plans.queries_r12 import (
            q_multimodal_cdc_chunks,
        )

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = sorted(
            (r.doc_id, r.chunk.hex())
            for r in multimodal.cdc_chunks_np(docs, mask=64).collect()
        )
        import hashlib

        # SQL fold emits md5 over the lowercase-hex chunk string;
        # re-derive the same key from the kernel's raw bytes
        got_md5 = sorted(
            (d, hashlib.md5(hx.encode()).hexdigest()) for d, hx in got
        )
        want = sorted(
            (r.doc_id, r.chunk_md5)
            for r in q_multimodal_cdc_chunks(spark, SF).collect()
        )
        assert got_md5 == want


class TestPayloadCdcPairs:
    def test_pair_set_equals_shingle_at_test_sf(self, spark):
        """Verdict r12 item 5 gate: the CDC pair finder recovers the
        same >= 0.5-Jaccard pair set as dedup_payload_shingle on the
        test corpus. (At sf0.1 they deliberately DIVERGE: the shingle
        query's rare-gram signature saturates — precision 0.129 vs the
        CDC finder's 1.000 against uncapped byte-8-gram truth; see
        PLANS.md accuracy table.)"""
        sh = {
            (r.doc_a, r.doc_b)
            for r in registry.QUERIES["dedup_payload_shingle"](
                spark, SF
            ).collect()
        }
        cdc = {
            (r.doc_a, r.doc_b)
            for r in registry.QUERIES["dedup_payload_cdc"](
                spark, SF
            ).collect()
        }
        assert cdc == sh and len(cdc) > 0

    def test_scores_and_bounds(self, spark):
        rows = registry.QUERIES["dedup_payload_cdc"](
            spark, SF
        ).collect()
        for r in rows:
            assert r.doc_a < r.doc_b
            assert 0.5 <= r.jaccard <= 1.0
            assert r.jaccard <= r.containment <= 1.0
            assert r.n_common >= 1


class TestMutualKnnAnn:
    def test_recall_gate_vs_exact(self, spark):
        """Verdict r12 item 6 gate: ANN-candidate mutual kNN recovers
        >= 0.9 of the exact reciprocal pair set (dedup_embedding_lsh
        precedent; regime notes in queries_r13)."""
        exact = {
            (r.vec_id_a, r.vec_id_b)
            for r in registry.QUERIES["emb_mutual_knn"](
                spark, SF
            ).collect()
        }
        ann = {
            (r.vec_id_a, r.vec_id_b)
            for r in registry.QUERIES["emb_mutual_knn_ann"](
                spark, SF
            ).collect()
        }
        assert exact, "exact pair set empty"
        recall = len(ann & exact) / len(exact)
        precision = len(ann & exact) / len(ann)
        assert recall >= 0.9, f"recall {recall:.3f} < 0.9"
        assert precision >= 0.9, f"precision {precision:.3f} < 0.9"
