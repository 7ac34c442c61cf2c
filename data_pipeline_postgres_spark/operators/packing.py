"""Sequence packing for training-data preparation (SURVEY.md §2.11
[EXT]): lay the token stream of a document corpus out into fixed-size
context windows (concatenate-and-chunk packing — every trainer's input
layout) WITHOUT a global single-partition sort.

The layout is fully determined by an exact global running token count
in doc_id order. A naive ``Window.orderBy("doc_id")`` computes it in
ONE partition — the classic scale-killer. Instead the distributed
prefix-sum idiom:

1. range-bucket the corpus by doc_id (bucket order == id order);
2. per-bucket running totals — a window PARTITIONED by bucket, so
   every partition sorts only its slice;
3. aggregate one total per bucket (tiny relation ≈ n_docs /
   bucket_width rows), exclusive-prefix-sum THAT with a global window
   over the tiny relation only, and broadcast-join the offsets back.

cum_before(doc) = bucket_offset + within_bucket_cumsum − n_tokens is
exact, and each doc's placement follows arithmetically:
seq_id = cum_before div L, seq_offset = cum_before mod L. Documents
straddle window boundaries by design (the packed stream is
contiguous); a reader slices [seq_offset, …] from seq_id onward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TX


def pack_sequences(
    docs: DataFrame, context_len: int = 512, bucket_width: int = 1000
) -> DataFrame:
    """(doc_id, n_tokens, seq_id, seq_offset): each doc's position in
    the packed fixed-``context_len`` window stream, doc_id order."""
    toks = docs.select(
        "doc_id",
        F.coalesce(
            TX.ws_token_count("text").cast("bigint"), F.lit(0)
        ).alias("n_tokens"),
    )
    b = toks.withColumn("bucket", F.expr(f"doc_id div {bucket_width}"))
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = b.withColumn("cum_in", F.sum("n_tokens").over(w_in))
    # tiny per-bucket totals; the global window here runs over
    # ~n_docs/bucket_width rows, never the corpus
    totals = b.groupBy("bucket").agg(F.sum("n_tokens").alias("btot"))
    w_b = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "bucket",
        F.coalesce(F.sum("btot").over(w_b), F.lit(0)).alias("boff"),
    )
    cum_before = F.col("boff") + F.col("cum_in") - F.col("n_tokens")
    return (
        within.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            (cum_before / context_len).cast("bigint").alias("seq_id"),
            (cum_before % context_len).alias("seq_offset"),
        )
    )


def pack_manifest(
    docs: DataFrame, context_len: int = 512, bucket_width: int = 1000
) -> DataFrame:
    """Reader-side packing manifest: one row per (sequence, doc slice)
    — the lookup a trainer's data loader actually consumes to
    assemble window ``seq_id`` from raw documents:
    (seq_id, doc_id, doc_offset, seq_offset, len).

    Derived arithmetically from ``pack_sequences``'s placement (a doc
    starting at global token cb spans sequences cb div L through
    (cb+n-1) div L; each span's bounds are max/min intersections), so
    the only work beyond the prefix sum is one explode over a doc's
    span list — output rows ≈ total_tokens/L + n_docs, never more
    than one per (doc, window) intersection. Zero-token docs occupy
    no span and are absent by construction.
    """
    L = context_len
    p = pack_sequences(docs, L, bucket_width).filter(F.col("n_tokens") > 0)
    cb = F.col("seq_id") * L + F.col("seq_offset")
    last = F.floor((cb + F.col("n_tokens") - 1) / L).cast("bigint")
    spans = p.withColumn("_cb", cb).withColumn(
        "s", F.explode(F.sequence(F.col("seq_id"), last))
    )
    start = F.greatest(F.col("s") * L, F.col("_cb"))
    end = F.least((F.col("s") + 1) * L, F.col("_cb") + F.col("n_tokens"))
    return spans.select(
        F.col("s").alias("seq_id"),
        "doc_id",
        (start - F.col("_cb")).cast("bigint").alias("doc_offset"),
        (start - F.col("s") * L).cast("bigint").alias("seq_offset"),
        (end - start).cast("bigint").alias("len"),
    )


def byte_shard_manifest(
    sized: DataFrame,
    shard_bytes: int = 65536,
    bucket_width: int = 1000,
    id_col: str = "doc_id",
    size_col: str = "n_bytes",
) -> DataFrame:
    """WebDataset-style shard manifest over any (id, size) relation:
    items are laid out in id order and each item lands WHOLE in the
    shard where its start offset falls (shard = cum_before div
    shard_bytes) → (shard_id, n_items, bytes_total, first_id,
    last_id). Start-offset sharding keeps assignment a pure function
    of the exclusive prefix sum — greedy close-at-budget sharding is
    inherently sequential — at the cost of shards overshooting the
    budget by at most one item.

    Same distributed prefix-sum shape as pack_sequences: the only
    global window runs over the tiny per-bucket totals relation,
    never the corpus."""
    b = sized.select(
        F.col(id_col).alias("id"),
        F.col(size_col).cast("bigint").alias("sz"),
    ).withColumn("bucket", F.expr(f"id div {bucket_width}"))
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = b.withColumn("cum_in", F.sum("sz").over(w_in))
    totals = b.groupBy("bucket").agg(F.sum("sz").alias("btot"))
    w_b = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "bucket",
        F.coalesce(F.sum("btot").over(w_b), F.lit(0)).alias("boff"),
    )
    placed = within.join(F.broadcast(offsets), "bucket").select(
        "id",
        "sz",
        F.expr(f"(boff + cum_in - sz) div {shard_bytes}").alias(
            "shard_id"
        ),
    )
    return placed.groupBy("shard_id").agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum("sz").cast("long").alias("bytes_total"),
        F.min("id").alias("first_id"),
        F.max("id").alias("last_id"),
    )
