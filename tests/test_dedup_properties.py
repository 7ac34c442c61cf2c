"""Property-based tests (hypothesis) for incremental dedup: for ANY
split of a corpus into (already-ingested, new batch) — including docs
with NULL text, whose content hash is NULL — the incremental result
must be exactly the full-corpus dedup survivors whose content is new
to the batch. Exercises the null-semantics seam between the anti-join
and the NOT EXISTS oracle (ADVICE r2)."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipeline_postgres_spark.operators import dedup

# tiny text alphabet so hash collisions across docs are common
TEXTS = st.one_of(st.none(), st.sampled_from(["a", "b", " a ", "A", "c d"]))
DOCS = st.lists(TEXTS, min_size=0, max_size=12)
SPLIT = st.integers(min_value=0, max_value=12)


def _df(spark, rows, id0=0):
    return spark.createDataFrame(
        [(id0 + i, t, "s") for i, t in enumerate(rows)],
        "doc_id bigint, text string, source string",
    )


def _norm_hash(t):
    if t is None:
        return None
    return hashlib.sha256(t.strip().lower().encode()).hexdigest()


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=DOCS, split=SPLIT)
def test_incremental_equals_full_minus_corpus(spark, docs, split):
    split = min(split, len(docs))
    corpus_rows, batch_rows = docs[:split], docs[split:]
    corpus = _df(spark, corpus_rows, id0=0)
    batch = _df(spark, batch_rows, id0=1000)

    got = sorted(
        (r.doc_id, r.text_hash)
        for r in dedup.incremental_dedup(batch, corpus).collect()
    )

    # model: group batch docs by normalized hash; keep min doc_id of
    # every hash group not present anywhere in the corpus. NULL-text
    # docs carry a NULL hash: they group TOGETHER within the batch
    # (GROUP BY treats nulls equal) but are never suppressed by corpus
    # nulls (equality of missing content is unknowable — both the
    # anti-join and the NOT EXISTS oracle agree on this).
    corpus_hashes = {
        h for h in (_norm_hash(t) for t in corpus_rows) if h is not None
    }
    groups = {}
    for i, t in enumerate(batch_rows):
        h = _norm_hash(t)
        if h not in corpus_hashes:
            groups.setdefault(h, 1000 + i)
    want = sorted(
        ((doc_id, h) for h, doc_id in groups.items()),
        key=lambda x: (x[0], x[1] or ""),
    )
    assert got == want


# -- connected components: star contraction vs model ------------------------

EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ),
    min_size=0,
    max_size=40,
)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=EDGES)
def test_star_contraction_equals_union_find(spark, edges):
    """dedup_clusters_star must label EVERY random graph exactly like
    a plain union-find (self-loops and duplicate edges included)."""
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    pairs = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.dedup_clusters_star(pairs).collect()
    }
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    model = {x: find(x) for x in parent}
    assert got == model


class TestIncrementalNearDupEdges:
    """Edge cases for the fuzzy incremental family (minhash bands,
    embedding matmul): empty sides and NULL text must yield empty
    results, never errors — the daily-ingest job runs unattended."""

    def test_minhash_empty_batch(self, spark):
        corpus = _df(spark, ["a b c d e", "f g h i j"])
        batch = _df(spark, [], id0=100)
        out = dedup.minhash_incremental_dedup(batch, corpus)
        assert out.count() == 0

    def test_minhash_empty_corpus(self, spark):
        batch = _df(spark, ["a b c d e"], id0=100)
        corpus = _df(spark, [])
        assert dedup.minhash_incremental_dedup(batch, corpus).count() == 0

    def test_minhash_reingest_batch_text_wins(self, spark):
        """Re-ingest guard (operators/dedup.py): a doc_id on BOTH
        sides means the batch supersedes the corpus row. The batch
        text must be compared ONLY against other-corpus docs — never
        against the stale same-id corpus text — and the two texts'
        shingles must never merge under one id (which would corrupt
        every Jaccard involving it)."""
        stale = "aa bb cc dd ee ff gg"
        fresh = "pp qq rr ss tt uu vv"
        # corpus: id 0 carries the stale text; id 1 is an exact copy
        # of the fresh text the batch will bring for id 0.
        corpus = _df(spark, [stale, fresh])
        batch = _df(spark, [fresh])  # same doc_id 0, different text
        out = dedup.minhash_incremental_dedup(batch, corpus).collect()
        # batch doc 0 matches corpus doc 1 (identical fresh text) and
        # must NOT match its own superseded id-0 row (jaccard vs the
        # stale text is 0 — any match would be cross-text leakage).
        assert [(r["doc_id"], r["dup_of"], r["jaccard"]) for r in out] == [
            (0, 1, 1.0)
        ]

    def test_minhash_reingest_guard_on_stored_band_index(self, spark):
        """Same supersede semantics when the corpus side is the
        STORED (doc_id, band_key) index: stale index rows for a
        re-ingested id are anti-joined out, so band keys from the old
        text can't admit candidates against it."""
        stale = "aa bb cc dd ee ff gg"
        fresh = "pp qq rr ss tt uu vv"
        corpus = _df(spark, [stale, fresh])
        cb = dedup.minhash_bands(
            dedup.doc_shingles(corpus, distinct=False)
        )
        batch = _df(spark, [stale])  # re-ingest id 0 with... its old
        # text, while the INDEX also holds id 0's old bands: the only
        # admissible partner is other-doc id 1 (no self-pair), and
        # stale-vs-stale gives no match since id 1 holds fresh text.
        out = dedup.minhash_incremental_dedup(
            batch, corpus, corpus_bands=cb
        ).collect()
        assert out == []
        # and a fresh-text re-ingest of id 0 matches ONLY id 1
        out2 = dedup.minhash_incremental_dedup(
            _df(spark, [fresh]), corpus, corpus_bands=cb
        ).collect()
        assert [(r["doc_id"], r["dup_of"], r["jaccard"]) for r in out2] == [
            (0, 1, 1.0)
        ]

    def test_minhash_null_text_never_matches(self, spark):
        corpus = _df(spark, ["w x y z q r s", None])
        batch = _df(spark, [None, "w x y z q r s"], id0=100)
        out = dedup.minhash_incremental_dedup(batch, corpus).collect()
        # identical real text matches; NULLs never appear on either side
        assert {r["doc_id"] for r in out} == {101}
        assert all(r["dup_of"] == 0 for r in out)
        assert all(r["jaccard"] == 1.0 for r in out)

    def _emb_df(self, spark, vecs, id0=0):
        return spark.createDataFrame(
            [(id0 + i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
            "vec_id bigint, embedding array<float>, label int",
        )

    def test_embedding_identical_vector_matches(self, spark):
        v = [1.0, 2.0, 3.0, 4.0]
        corpus = self._emb_df(spark, [v, [-9.0, 1.0, 0.0, 2.0]])
        batch = self._emb_df(spark, [v], id0=100)
        out = dedup.embedding_incremental_near_dup(
            batch, corpus, threshold=0.99
        ).collect()
        assert [(r["vec_id"], r["dup_of"]) for r in out] == [(100, 0)]
        assert out[0]["cosine"] == 1.0

    def test_embedding_empty_corpus(self, spark):
        batch = self._emb_df(spark, [[1.0, 0.0]], id0=100)
        corpus = self._emb_df(spark, [])
        out = dedup.embedding_incremental_near_dup(batch, corpus)
        assert out.count() == 0
