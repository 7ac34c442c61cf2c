"""[EXT] operator self-checks beyond the oracle gate: LSH recall
against exact ground truth, ANN vs brute-force overlap, multimodal
determinism, streaming ≡ batch (SURVEY.md §5 metamorphic strategy)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_postgres_spark.catalog import load_table
from data_pipeline_postgres_spark.operators import (
    dedup,
    multimodal,
    similarity,
    textstats,
)
from data_pipeline_postgres_spark.plans import registry
from data_pipeline_postgres_spark.streaming import jobs as stream_jobs

from .conftest import SF_SMOKE

registry.load_all()


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings").cache()


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.select("doc_a", "doc_b").collect()}


class TestDedup:
    def test_exact_dedup_partitions_corpus(self, docs):
        out = dedup.exact_dedup(docs)
        total = out.agg(F.sum("n_copies")).collect()[0][0]
        assert total == docs.count()
        assert out.select("text_hash").distinct().count() == out.count()

    def test_minhash_subset_of_exact_jaccard(self, docs):
        sh = dedup.doc_shingles(docs)
        exact = _pairs(dedup.jaccard_pairs(sh, None, 0.8))
        lsh = _pairs(dedup.minhash_dedup(docs))
        assert lsh <= exact
        assert lsh, "LSH found no near-dup pairs at all"

    def test_minhash_recall_on_high_jaccard(self, docs):
        """Pairs with j ≥ 0.95 collide in a band with prob
        1-(1-j^2)^4 ≈ 0.9999 — with the fixed md5 family the outcome
        is deterministic; requires (near-)total recall on them."""
        sh = dedup.doc_shingles(docs)
        strong = _pairs(dedup.jaccard_pairs(sh, None, 0.95))
        lsh = _pairs(dedup.minhash_dedup(docs))
        assert strong, "fixture should contain planted near-dups"
        missed = strong - lsh
        assert len(missed) <= max(1, len(strong) // 50), missed

    def test_minhash_ml_finds_strong_pairs(self, docs):
        """The spark.ml MinHashLSH variant must recover every planted
        ≥0.95-Jaccard pair the exact ground truth contains (its hash
        family differs from the md5 pipeline; the verify stage makes
        both exact over their candidates)."""
        sh = dedup.doc_shingles(docs)
        strong = _pairs(dedup.jaccard_pairs(sh, None, 0.95))
        ml = _pairs(dedup.minhash_dedup_ml(docs))
        exact = _pairs(dedup.jaccard_pairs(sh, None, 0.8))
        assert strong <= ml
        assert ml <= exact

    def test_simhash_close_for_near_dups(self, spark, docs):
        """A ≥0.95-Jaccard pair shares almost all tokens → hamming
        distance of simhashes must be small."""
        sh = dedup.doc_shingles(docs)
        strong = list(_pairs(dedup.jaccard_pairs(sh, None, 0.95)))[:20]
        sims = {
            r.doc_id: r.simhash for r in dedup.simhash(docs).collect()
        }
        for a, b in strong:
            ham = bin(sims[a] ^ sims[b]).count("1")
            assert ham <= 6, (a, b, ham)


class TestEmbeddingNearDup:
    def _pairs(self, df):
        return {
            (r.vec_id_a, r.vec_id_b, r.cosine)
            for r in df.select("vec_id_a", "vec_id_b", "cosine").collect()
        }

    def test_no_driver_collect(self, emb, monkeypatch):
        """The exact near-dup plan must never materialize the corpus
        on the driver: plan construction AND execution run with
        DataFrame.collect/toPandas forbidden."""
        from pyspark.sql import DataFrame

        def _boom(self, *a, **k):  # pragma: no cover - should not run
            raise AssertionError("driver-side materialization in near-dup")

        monkeypatch.setattr(DataFrame, "collect", _boom)
        monkeypatch.setattr(DataFrame, "toPandas", _boom)
        out = dedup.embedding_near_dup(emb)
        assert out.count() >= 0  # executes distributed, no driver hop

    def test_block_count_invariance(self, emb):
        """Blocked all-pairs is exact: the result cannot depend on the
        block count (1 block ≡ single-task ground truth)."""
        one = self._pairs(dedup.embedding_near_dup(emb, n_blocks=1))
        four = self._pairs(dedup.embedding_near_dup(emb, n_blocks=4))
        seven = self._pairs(dedup.embedding_near_dup(emb, n_blocks=7))
        assert one == four == seven
        assert one, "fixture should contain near-dup vectors"

    def test_lsh_subset_and_recall(self, emb):
        """The banded sign-LSH path verifies candidates with the same
        exact kernel → its pairs are a subset of the exact output;
        the md5-fixed hyperplanes make recall deterministic."""
        exact = self._pairs(dedup.embedding_near_dup(emb))
        approx = self._pairs(dedup.embedding_near_dup_lsh(emb))
        assert approx <= exact
        assert len(approx) >= 0.8 * len(exact)


class TestSimilarity:
    def test_topk_plans_use_take_ordered(self, emb):
        """The top-k reduction must be TakeOrderedAndProject
        (per-partition heaps + driver merge), never a row_number over
        an unpartitioned window (single-partition global sort)."""
        for df in (
            similarity.brute_topk(emb),
            similarity.lsh_topk(emb),
            similarity.ivf_topk(emb),
        ):
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "TakeOrderedAndProject" in plan
            assert "SinglePartition" not in plan


    def test_batch_topk_uses_window_group_limit(self, emb):
        """Per-query top-k must be rank-limit-pushed (per-partition
        k-heaps BEFORE the qid exchange), and never a single-partition
        global sort."""
        df = similarity.batch_topk(emb)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan
        assert "SinglePartition" not in plan
        rows = df.collect()
        assert len(rows) == 40  # 4 queries × top-10
        # every query finds itself at cosine 1.0 first
        for r in rows:
            if r.qid == r.vec_id:
                assert r.cosine == pytest.approx(1.0)

    def test_ivf_assign_is_narrow(self, emb):
        """Centroid assignment must be a narrow map over the corpus
        (broadcast centroid array + per-row fold argmax): no
        hash-partitioned Exchange and no window sort anywhere in the
        assignment plan."""
        assign = similarity.ivf_assign(emb, similarity.ivf_centroids(emb))
        plan = assign._jdf.queryExecution().executedPlan().toString()
        assert "hashpartitioning" not in plan
        assert "Window" not in plan
        # every vector gets exactly one list
        n = emb.count()
        assert assign.count() == n
        assert assign.select("vec_id").distinct().count() == n

    def test_lsh_topk_values_subset_of_brute(self, emb):
        brute = {
            r.vec_id: r.cosine for r in similarity.brute_topk(emb, k=500).collect()
        }
        approx = similarity.lsh_topk(emb, k=10).collect()
        assert approx
        for r in approx:
            assert brute[r.vec_id] == r.cosine

    def test_ivf_kmeans_recall(self, emb):
        """Trained-quantizer IVF: same plan shape, recall vs the exact
        top-10 at least as demanded of the seed quantizer."""
        cents = similarity.ivf_centroids_kmeans(emb)
        assert cents.count() == 8
        got = similarity.ivf_topk(emb, k=10, centroids=cents)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        brute = [r.vec_id for r in similarity.brute_topk(emb, k=10).collect()]
        ivf = [r.vec_id for r in got.collect()]
        assert len(ivf) == 10
        assert len(set(brute) & set(ivf)) >= 3
        assert brute[0] == ivf[0]

    def test_ivf_overlaps_brute(self, emb):
        brute = [r.vec_id for r in similarity.brute_topk(emb, k=10).collect()]
        ivf = [r.vec_id for r in similarity.ivf_topk(emb, k=10).collect()]
        assert len(ivf) == 10
        # probing 2/8 lists: require meaningful overlap with the truth
        assert len(set(brute) & set(ivf)) >= 3
        # the query vector itself (cosine 1.0) must always be found
        assert brute[0] == ivf[0]


class TestMultimodal:
    def test_decode_deterministic_and_complete(self, docs):
        a = {r.doc_id: (r.width, r.height, r.n_frames)
             for r in multimodal.decode_payloads(docs).collect()}
        b = {r.doc_id: (r.width, r.height, r.n_frames)
             for r in multimodal.decode_payloads(docs).collect()}
        assert a == b
        assert len(a) == docs.count()
        for w, h, n in a.values():
            assert 64 <= w < 128 and 64 <= h < 128 and 1 <= n <= 16

    def test_meta_has_no_payload_column(self, docs):
        out = multimodal.payload_meta(docs)
        assert "payload" not in out.columns
        assert dict(out.dtypes)["n_bytes"] == "bigint"


class TestStreaming:
    def test_tumbling_equals_batch(self, spark):
        stream = stream_jobs.tumbling_daily(spark, SF_SMOKE)
        batch = registry.QUERIES["window_tumbling_daily"](spark, SF_SMOKE)
        assert sorted(map(tuple, stream.collect())) == sorted(
            map(tuple, batch.collect())
        )

    def test_cdc_latest_idempotent(self, spark):
        r1 = sorted(map(tuple, stream_jobs.cdc_latest(spark, SF_SMOKE).collect()))
        r2 = sorted(map(tuple, stream_jobs.cdc_latest(spark, SF_SMOKE).collect()))
        assert r1 == r2


class TestTextAnalysis:
    def test_quality_ratios_bounded(self, docs):
        rows = textstats.quality_scores(docs).collect()
        assert len(rows) == docs.count()
        for r in rows:
            assert 0.0 <= r.stopword_ratio <= 1.0
            assert 0.0 <= r.punct_ratio <= 1.0
            assert r.mean_token_len > 0

    def test_fingerprint_clusters_near_dups(self, docs):
        """≥0.95-Jaccard pairs usually share their min-shingle-hash
        fingerprint (1-slot MinHash: P(match) = j)."""
        sh = dedup.doc_shingles(docs)
        strong = list(_pairs(dedup.jaccard_pairs(sh, None, 0.95)))
        fps = {r.doc_id: r.fingerprint for r in textstats.fingerprints(docs).collect()}
        hits = sum(1 for a, b in strong if fps[a] == fps[b])
        assert hits >= len(strong) * 0.7


class TestTextClean:
    """Behavior checks on hand fixtures — the synthetic corpus holds
    no control chars / PII, so the oracle gate alone would only prove
    the identity path."""

    @pytest.fixture(scope="class")
    def dirty(self, spark):
        from data_pipeline_postgres_spark.operators import textclean

        df = spark.createDataFrame(
            [
                (1, "  Hello\tWorld\x07 FROM\x00Spark  "),
                (2, "mail me at Bob.Smith+x@Example.org or 10.0.0.1"),
                (3, "call +1 555-123-4567 now"),
                (4, "spam spam spam spam spam spam spam spam spam spam"),
                (5, "a perfectly ordinary varied sentence with words"),
            ],
            "doc_id bigint, text string",
        )
        return textclean, df

    def test_normalize(self, dirty):
        tc, df = dirty
        out = {r.doc_id: r.norm_text for r in tc.normalize(df).collect()}
        assert out[1] == "hello world from spark"
        assert out[2].startswith("mail me at bob.smith+x@example.org")

    def test_pii_redact(self, dirty):
        tc, df = dirty
        rows = {r.doc_id: r for r in tc.pii_redact(df).collect()}
        assert rows[2].n_emails == 1 and rows[2].n_ips == 1
        assert "<EMAIL>" in rows[2].redacted and "<IP>" in rows[2].redacted
        assert "Bob.Smith" not in rows[2].redacted
        assert rows[3].n_phones == 1 and "<PHONE>" in rows[3].redacted
        assert rows[5].n_emails == rows[5].n_ips == rows[5].n_phones == 0

    def test_repetition_gate(self, dirty):
        tc, df = dirty
        rows = {r.doc_id: r for r in tc.repetition(df).collect()}
        assert not rows[4].keep  # one word repeated → degenerate
        assert rows[4].distinct_ratio == pytest.approx(0.1)
        assert rows[4].top_bigram_frac == pytest.approx(1.0)
        assert rows[5].keep
        assert rows[5].distinct_ratio == pytest.approx(1.0)

    def test_repetition_empty_doc_cross_engine_stable(self, spark):
        """Empty / whitespace-only docs: BOTH tokenizers (Spark split,
        DuckDB regexp_split_to_array) yield [''] — ONE empty token —
        so n_tokens is never 0 and the 0/0 divergence ADVICE r2
        flagged cannot arise; the n==0 guard in the operator (and its
        oracle) is defense-in-depth should the tokenizer change. Pin
        the actual contract: n_tokens=1, finite ratio, non-null keep."""
        from data_pipeline_postgres_spark.operators import textclean

        df = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "real words here again")],
            "doc_id bigint, text string",
        )
        rows = {r.doc_id: r for r in textclean.repetition(df).collect()}
        for d in (1, 2):
            assert rows[d].n_tokens == 1
            assert rows[d].distinct_ratio == 1.0
            assert rows[d].keep is not None
        assert rows[3].keep is not None


class TestSamplingAndIncremental:
    def test_stratified_sample_rates(self, spark, docs):
        """Hash-gated sample hits each stratum's rate within binomial
        noise, and is exactly reproducible."""
        from data_pipeline_postgres_spark.operators import sampling

        out = sampling.stratified_sample(docs, {"en": 100}, 1000)
        got = {r.lang: r.cnt for r in
               out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
        tot = {r.lang: r.cnt for r in
               docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
        assert got["en"] < tot["en"]  # en downsampled
        for lang in tot:
            if lang != "en":
                assert got.get(lang, 0) == tot[lang]  # rate 1000 = keep all
        again = sampling.stratified_sample(docs, {"en": 100}, 1000)
        assert sorted(r.doc_id for r in out.collect()) == sorted(
            r.doc_id for r in again.collect()
        )

    def test_incremental_dedup_model(self, spark):
        from data_pipeline_postgres_spark.operators import dedup as D

        new = spark.createDataFrame(
            [(10, "Alpha"), (11, "beta"), (12, " ALPHA  "), (13, "gamma")],
            "doc_id bigint, text string",
        )
        corpus = spark.createDataFrame(
            [(1, "beta"), (2, "delta")], "doc_id bigint, text string"
        )
        out = D.incremental_dedup(new, corpus)
        # beta exists in corpus → dropped; alpha dedups in-batch to 10
        assert sorted(r.doc_id for r in out.collect()) == [10, 13]


class TestEmbeddingOpsAndProfile:
    def test_centroid_hand_fixture(self, spark):
        from data_pipeline_postgres_spark.operators import embeddings

        df = spark.createDataFrame(
            [(1, [3.0, 4.0], 0), (2, [4.0, 3.0], 0), (3, [0.0, 1.0], 1)],
            "vec_id bigint, embedding array<float>, label int",
        )
        rows = {(r.label, r.pos): r for r in
                embeddings.centroid_per_label(df).collect()}
        # label 0: unit vecs (.6,.8) and (.8,.6) → centroid (.7,.7)
        assert rows[(0, 0)].centroid == pytest.approx(0.7, abs=1e-5)
        assert rows[(0, 1)].centroid == pytest.approx(0.7, abs=1e-5)
        assert rows[(0, 0)].n_vecs == 2
        assert rows[(1, 1)].centroid == pytest.approx(1.0, abs=1e-5)

    def test_unit_normalize_is_unit(self, spark, emb):
        from data_pipeline_postgres_spark.operators import embeddings

        out = embeddings.unit_normalize(emb, head=64)
        ss = (
            out.groupBy("vec_id")
            .agg(F.sum(F.col("u") * F.col("u")).alias("ss"))
            .agg(F.min("ss").alias("lo"), F.max("ss").alias("hi"))
            .first()
        )
        assert ss.lo == pytest.approx(1.0, abs=1e-4)
        assert ss.hi == pytest.approx(1.0, abs=1e-4)

    def test_profile_single_scan_and_nulls(self, spark):
        from data_pipeline_postgres_spark.operators import profile

        df = spark.createDataFrame(
            [(1, "a"), (2, None), (None, "a")], "k bigint, s string"
        )
        rows = {r.column: r for r in profile.profile_table(df).collect()}
        assert rows["k"].n_nulls == 1 and rows["k"].n_distinct == 2
        assert rows["s"].n_nulls == 1 and rows["s"].n_distinct == 1
        assert rows["k"].min_str == "1" and rows["k"].max_str == "2"
        # the whole profile must be ONE pass over the table
        from data_pipeline_postgres_spark.catalog import load_table
        from .conftest import SF_SMOKE

        plan = (
            profile.profile_table(load_table(spark, SF_SMOKE, "orders"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.count("Scan parquet") == 1

    def test_profile_approx_mode(self, spark):
        """approx mode: same shape, no Expand in the plan (the exact
        mode's count_distincts amplify the scan n_cols×), distincts
        within HLL tolerance of exact."""
        from data_pipeline_postgres_spark.catalog import load_table
        from data_pipeline_postgres_spark.operators import profile
        from .conftest import SF_SMOKE

        orders = load_table(spark, SF_SMOKE, "orders")
        approx = profile.profile_table(orders, exact=False)
        plan = approx._jdf.queryExecution().executedPlan().toString()
        assert "Expand" not in plan
        assert plan.count("Scan parquet") == 1
        exact = {r.column: r for r in profile.profile_table(orders).collect()}
        for r in approx.collect():
            e = exact[r.column]
            assert (r.n_rows, r.n_nulls, r.min_str, r.max_str) == (
                e.n_rows, e.n_nulls, e.min_str, e.max_str
            )
            # default HLL rsd is 5%
            assert abs(r.n_distinct - e.n_distinct) <= max(
                3, 0.1 * e.n_distinct
            )


class TestPacking:
    def test_pack_layout_model(self, spark):
        """Packed layout equals the plain running-total model, and the
        corpus-wide window is bucket-partitioned (the only global
        window runs over the tiny bucket-totals relation)."""
        from data_pipeline_postgres_spark.operators import packing

        rows = [(i, " ".join(["w"] * (3 + i % 5))) for i in range(50)]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {
            r.doc_id: (r.n_tokens, r.seq_id, r.seq_offset)
            for r in packing.pack_sequences(
                docs, context_len=16, bucket_width=8
            ).collect()
        }
        cum = 0
        for i, t in rows:
            n = len(t.split())
            assert got[i] == (n, cum // 16, cum % 16)
            cum += n
        plan = (
            packing.pack_sequences(docs, bucket_width=8)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "windowspecdefinition(bucket" in plan


class TestDedupClusters:
    def test_chain_and_clique(self, spark):
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
            "doc_a bigint, doc_b bigint",
        )
        got = {r.doc_id: r.cluster_id
               for r in dedup.dedup_clusters(pairs).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                       20: 20, 21: 20, 22: 20}

    def test_star_chain_and_clique(self, spark):
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
            "doc_a bigint, doc_b bigint",
        )
        got = {r.doc_id: r.cluster_id
               for r in dedup.dedup_clusters_star(pairs).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                       20: 20, 21: 20, 22: 20}

    def test_star_long_chain_converges(self, spark):
        """A 200-node chain has diameter 199 — min-label propagation's
        round budget can't cover it (it must raise, never return a
        partial answer) while star contraction converges in O(log n)
        rounds."""
        n = 200
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n)], "doc_a bigint, doc_b bigint"
        ).coalesce(4)
        got = {r.doc_id: r.cluster_id
               for r in dedup.dedup_clusters_star(pairs).collect()}
        assert got == {i: 0 for i in range(n + 1)}
        with pytest.raises(RuntimeError, match="did not converge"):
            dedup.dedup_clusters(pairs, max_iter=5)

    def test_matches_union_find_model(self, spark, docs):
        """Operator output equals a plain union-find over the same
        pair list (model-based check, SURVEY §5)."""
        pairs_df = dedup.jaccard_pairs(dedup.doc_shingles(docs), None, 0.8)
        pairs = [(r.doc_a, r.doc_b) for r in pairs_df.collect()]
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        model = {x: find(x) for x in parent}
        got = {r.doc_id: r.cluster_id
               for r in dedup.dedup_clusters(pairs_df).collect()}
        assert got == model


class TestPackingInvariance:
    def test_pack_partitioning_invariant(self, spark):
        """The packed layout is a function of the DATA (doc_id order),
        never of the physical partitioning — 1-partition and
        13-partition inputs must produce identical layouts."""
        from data_pipeline_postgres_spark.operators import packing

        rows = [(i, " ".join(["tok"] * (1 + (i * 7) % 11))) for i in range(200)]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        one = sorted(
            map(tuple, packing.pack_sequences(docs.coalesce(1)).collect())
        )
        many = sorted(
            map(tuple, packing.pack_sequences(docs.repartition(13)).collect())
        )
        assert one == many


class TestStreamingCheckpointRecovery:
    def test_available_now_resumes_from_checkpoint(self, spark, tmp_path):
        """Exactly-once incremental file-stream processing: run 1
        drains file A into the sink; run 2 REUSES the checkpoint, so
        with file B added it appends only B's rows (A is not
        reprocessed), and a third run with nothing new appends
        nothing. This is the recovery contract a daily-ingest
        production stream relies on after restarts."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        src = tmp_path / "src"
        src.mkdir()
        ckpt = str(tmp_path / "ckpt")
        sink = str(tmp_path / "sink")

        def write_file(name, ids):
            pq.write_table(
                pa.table({"event_id": pa.array(ids, pa.int64())}),
                str(src / name),
            )

        def drain():
            df = spark.readStream.schema("event_id bigint").parquet(
                str(src)
            )
            q = (
                df.writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return sorted(
                r.event_id for r in spark.read.parquet(sink).collect()
            )

        write_file("a.parquet", [1, 2, 3])
        assert drain() == [1, 2, 3]
        write_file("b.parquet", [4, 5])
        assert drain() == [1, 2, 3, 4, 5]  # only B appended
        assert drain() == [1, 2, 3, 4, 5]  # idempotent no-op run


class TestDecontaminateAndMixture:
    def test_flagged_docs_truly_overlap(self, docs):
        """Every flagged doc shares ≥1 distinct 4-gram with the eval
        split, and hit counts equal the true distinct-overlap size."""
        from data_pipeline_postgres_spark.operators import decontaminate

        flagged = {
            r.doc_id: r.n_hits
            for r in decontaminate.flag_contaminated(docs).collect()
        }
        ng = decontaminate.doc_ngrams(docs, 4).collect()
        ev = {r.ngram for r in ng if r.doc_id % 97 == 0}
        truth: dict[int, int] = {}
        for r in ng:
            if r.doc_id % 97 != 0 and r.ngram in ev:
                truth[r.doc_id] = truth.get(r.doc_id, 0) + 1
        assert flagged == truth

    def test_decontaminated_is_clean_partition(self, docs):
        """decontaminated + flagged partitions the training split."""
        from data_pipeline_postgres_spark.operators import decontaminate

        train_n = docs.filter(F.col("doc_id") % 97 != 0).count()
        clean = decontaminate.decontaminated(docs)
        bad = decontaminate.flag_contaminated(docs)
        assert clean.count() + bad.count() == train_n
        assert (
            clean.join(bad, "doc_id").count() == 0
        )

    def test_eval_ngrams_join_is_broadcast(self, docs):
        """The corpus side must not shuffle on the n-gram key: the
        eval-set join has to be a BroadcastHashJoin."""
        from data_pipeline_postgres_spark.operators import decontaminate

        plan = (
            decontaminate.flag_contaminated(docs)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan

    def test_mixture_copy_counts(self, docs):
        """n_copies(doc) = floor(w) + hash gate — check per-doc
        multiplicity and epoch numbering against a python replica."""
        import hashlib

        from data_pipeline_postgres_spark.operators import mixture

        weights = {"src0": 2500, "src1": 1300, "src2": 300}
        out = mixture.mix_sources(docs, weights, 700).collect()
        by_doc: dict[int, list[int]] = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r.epoch)
        for r in docs.select("doc_id", "source").collect():
            w = weights.get(r.source, 700)
            gate = (
                int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16)
                % 1000
            )
            expect = w // 1000 + (1 if gate < w % 1000 else 0)
            got = sorted(by_doc.get(r.doc_id, []))
            assert got == list(range(expect)), (r.doc_id, r.source)

    def test_mixture_is_map_only(self, docs):
        """The mixing plan must not contain any Exchange — it is a
        pure map (gate + generator), scan-pushable at 100 TB."""
        from data_pipeline_postgres_spark.operators import mixture

        plan = (
            mixture.mix_sources(docs, {"src0": 2500}, 700)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestRangeSearch:
    def test_range_matches_brute_force(self, emb):
        """Range admission ≡ brute-force top-N filtered at τ, for each
        query id (same rounding, same exclusion of self)."""
        n = emb.count()
        full = similarity.batch_topk(emb, k=n, nq=4)
        expect = {
            (r.qid, r.vec_id, r.cosine)
            for r in full.collect()
            if r.cosine >= 0.3 and r.qid != r.vec_id
        }
        got = {
            (r.qid, r.vec_id, r.cosine)
            for r in similarity.range_search(emb, 0.3, 4).collect()
        }
        assert got == expect

    def test_range_search_plan_has_no_exchange(self, emb):
        """Admission is a pure filter after the broadcast explode: no
        Exchange, no Window, no sort of the corpus."""
        plan = (
            similarity.range_search(emb)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in plan
        assert "Sort" not in plan.replace("TakeOrderedAndProject", "")


class TestSemanticDedup:
    def test_pairs_subset_of_exact_with_equal_scores(self, emb):
        """Cluster pruning may only DROP pairs vs the exact all-pairs
        kernel, never add or rescore them; dropped pairs must truly be
        cross-cluster."""
        exact = {
            (r.vec_id_a, r.vec_id_b): r.cosine
            for r in dedup.embedding_near_dup(emb).collect()
        }
        sem = {
            (r.vec_id_a, r.vec_id_b): r.cosine
            for r in dedup.semantic_dedup(emb).collect()
        }
        assert set(sem) <= set(exact)
        for k, v in sem.items():
            assert exact[k] == v
        cl = {
            r.vec_id: r.centroid_id
            for r in similarity.ivf_assign(
                emb, similarity.ivf_centroids(emb)
            ).collect()
        }
        for a, b in set(exact) - set(sem):
            assert cl[a] != cl[b]
        for a, b in sem:
            assert cl[a] == cl[b]

    def test_assignment_stays_narrow(self, emb):
        """The only Exchange in the whole plan is the centroid_id
        hash partition feeding applyInPandas — assignment itself must
        not shuffle the corpus."""
        plan = (
            dedup.semantic_dedup(emb)
            ._jdf.queryExecution().executedPlan().toString()
        )
        import re

        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


class TestCurationRound4:
    def test_paragraph_dedup_removes_later_copy(self, spark):
        """A block repeated across docs survives only in the earliest
        (doc_id, blk_pos); the later doc keeps its unique blocks."""
        words_a = " ".join(f"a{i}" for i in range(10))
        words_b = " ".join(f"b{i}" for i in range(10))
        df = spark.createDataFrame(
            [(1, words_a), (2, words_a + " " + words_b)],
            "doc_id long, text string",
        )
        out = {
            r.doc_id: (r.n_blocks_kept, r.clean_text)
            for r in dedup.paragraph_dedup(df, block_words=10).collect()
        }
        assert out[1] == (1, words_a)
        assert out[2] == (1, words_b)

    def test_paragraph_dedup_within_doc(self, spark):
        """A block repeated INSIDE one doc is kept once (first pos)."""
        blk = " ".join(f"w{i}" for i in range(10))
        df = spark.createDataFrame(
            [(7, blk + " " + blk)], "doc_id long, text string"
        )
        [r] = dedup.paragraph_dedup(df, block_words=10).collect()
        assert (r.n_blocks_kept, r.clean_text) == (1, blk)

    def test_inverted_index_rank_limit_pushed(self, docs):
        """Posting-list truncation must plan as WindowGroupLimit
        (per-partition top-k heaps BEFORE the term exchange) — the
        stopword-safety property."""
        from data_pipeline_postgres_spark.operators import indexing

        df = indexing.inverted_index(docs, k_postings=5)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan
        assert "SinglePartition" not in plan

    def test_inverted_index_df_exact_postings_truncated(self, docs):
        from data_pipeline_postgres_spark.operators import indexing

        rows = indexing.inverted_index(docs, k_postings=5).collect()
        n_docs = docs.count()
        for r in rows:
            assert 0 < r.df <= n_docs
            assert len(r.postings) == min(r.df, 5)
            assert r.postings == sorted(r.postings)

    def test_split_is_exhaustive_and_disjoint(self, docs):
        from data_pipeline_postgres_spark.operators import sampling

        out = sampling.train_val_test_split(docs)
        assert out.count() == docs.count()
        frac = {
            r.split: r.n
            for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
        }
        assert set(frac) == {"train", "val", "test"}
        assert frac["train"] > frac["val"]

    def test_shuffle_shard_positions_are_dense(self, docs):
        """Within every shard, pos must be exactly 1..shard_size."""
        from data_pipeline_postgres_spark.operators import sampling

        out = sampling.shuffle_shard(docs, n_shards=8)
        bad = (
            out.groupBy("shard")
            .agg(
                F.count("*").alias("n"),
                F.max("pos").alias("mx"),
                F.min("pos").alias("mn"),
                F.count_distinct("pos").alias("nd"),
            )
            .filter(
                (F.col("mx") != F.col("n"))
                | (F.col("mn") != 1)
                | (F.col("nd") != F.col("n"))
            )
            .count()
        )
        assert bad == 0


class TestIncrementalAggStream:
    def test_runs_multiple_microbatches_and_matches_batch(self, spark):
        """The foreachBatch view must be built from ≥2 genuine
        micro-batches (else the test proves nothing) and equal the
        one-shot batch daily aggregate."""
        import os

        from data_pipeline_postgres_spark.streaming import jobs

        got = {
            r.day: (r.n_events, r.sum_value)
            for r in jobs.incremental_agg_foreachbatch(
                spark, SF_SMOKE
            ).collect()
        }
        offsets = os.path.join(
            jobs._SCRATCH, "incr_ckpt", "offsets"
        )
        assert len(os.listdir(offsets)) >= 2
        ev = load_table(spark, SF_SMOKE, "events")
        want = {
            r.day: (r.n_events, r.sum_value)
            for r in ev.groupBy(
                F.date_trunc("day", "ts").cast("date").alias("day")
            )
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_value"),
            )
            .collect()
        }
        assert got == want


class TestProjectionAndKeepBest:
    def test_random_projection_is_narrow(self, emb):
        """JL projection must plan with zero Exchange nodes."""
        from data_pipeline_postgres_spark.operators import embeddings

        df = embeddings.random_projection(emb)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_random_projection_preserves_distances(self, emb):
        """JL guarantee (loose check): for sampled vector pairs the
        projected squared distance stays within 3× of the original
        (E[ratio]=1; 16 dims is noisy, so just bound it)."""
        import numpy as np

        rows = emb.orderBy("vec_id").limit(12).collect()
        from data_pipeline_postgres_spark.operators.embeddings import (
            jl_signs,
        )

        S = np.array(jl_signs(64, 16), dtype=float)
        ratios = []
        for i in range(0, 10, 2):
            a = np.array(rows[i].embedding, dtype=float)
            b = np.array(rows[i + 1].embedding, dtype=float)
            d0 = float(np.sum((a - b) ** 2))
            pa, pb = S @ a / 4.0, S @ b / 4.0
            d1 = float(np.sum((pa - pb) ** 2))
            if d0 > 0:
                ratios.append(d1 / d0)
        assert ratios and all(0.2 < r < 3.5 for r in ratios)

    def test_keep_best_winner_is_longest_member(self, spark, docs):
        from data_pipeline_postgres_spark.operators import dedup
        from data_pipeline_postgres_spark.plans import registry

        registry.load_all()
        kept = registry.QUERIES["dedup_cluster_keep_best"](
            spark, SF_SMOKE
        ).collect()
        pairs = dedup.jaccard_pairs(dedup.doc_shingles(docs), None, 0.8)
        labels = {
            r.doc_id: r.cluster_id
            for r in dedup.dedup_clusters(pairs).collect()
        }
        lens = {
            r.doc_id: r.n_chars
            for r in docs.select("doc_id", "n_chars").collect()
        }
        for r in kept:
            members = [d for d, c in labels.items() if c == r.cluster_id]
            assert r.kept_doc_id in members
            assert len(members) == r.n_members
            best = max(lens[m] for m in members)
            assert lens[r.kept_doc_id] == best == r.kept_n_chars
