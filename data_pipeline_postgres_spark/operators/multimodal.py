"""Multimodal column plumbing (SURVEY.md §2.11 [EXT]).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct alongside. The Spark-side plumbing — schema, batch
iteration, partition sizing — is real and tested; the actual
image/audio decode is STUBBED with a deterministic fake (the decode
libraries are not in this container) behind ``fake_decode_batch``,
clearly marked below.

Scale design: payload bytes travel executor→executor only on explicit
repartition; ``mapInPandas`` streams Arrow record batches through the
Python worker, so per-batch memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — the knob to tune
when payloads are MBs, not bytes. Metadata-only queries never touch
the payload column (column pruning keeps binary out of the scan).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Synthesize an opaque binary payload column + typed metadata from
    ``documents`` (stand-in for real image/audio bytes):
    (doc_id, payload binary, meta struct<mime, n_bytes, content_sha>).
    """
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(payload).cast("bigint").alias("n_bytes"),
            F.sha2(F.col("text"), 256).alias("content_sha"),
        ).alias("meta"),
    )


def payload_meta(docs: DataFrame) -> DataFrame:
    """Metadata projection — flat columns so the scan prunes the
    payload: (doc_id, mime, n_bytes, content_sha)."""
    with_payload = attach_payload(docs)
    return with_payload.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.content_sha").alias("content_sha"),
    )


def fake_decode_batch(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """STUB decode: deterministic pseudo-dimensions from payload bytes.

    A real implementation calls PIL/ffmpeg here (NOT INSTALLED in this
    container); the contract — bytes in, typed dims out, vectorized
    over an Arrow batch — is identical.
    """
    import pandas as pd

    payloads = pdf["payload"]
    first = payloads.map(lambda b: b[0] if len(b) else 0)
    last = payloads.map(lambda b: b[-1] if len(b) else 0)
    n = payloads.map(len)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "width": (64 + (first % 64)).astype("int32"),
            "height": (64 + (last % 64)).astype("int32"),
            "n_frames": (1 + (n % 16)).astype("int32"),
        }
    )


def frame_sample(docs: DataFrame, every: int = 4) -> DataFrame:
    """Frame-sampling plan for video-ish payloads: every ``every``-th
    frame's (index, byte offset, length) per doc — the addressing a
    decoder worker needs to fetch ONLY the sampled frames instead of
    whole payloads (at 100 TB the ranged reads are the point; full
    payloads never move).

    Frame count/geometry derive deterministically from payload length
    (mirroring ``fake_decode_batch``'s stub contract: n_frames =
    1 + n_bytes % 16, fixed-size frames); the sampling itself is pure
    JVM-side arithmetic — sequence + explode, no Python hop, fully
    oracle-checkable: (doc_id, frame_idx, byte_offset, frame_bytes).
    """
    meta = attach_payload(docs).select(
        "doc_id", F.col("meta.n_bytes").alias("n_bytes")
    )
    geo = meta.select(
        "doc_id",
        "n_bytes",
        (F.lit(1) + F.col("n_bytes") % 16).cast("int").alias("n_frames"),
    ).withColumn(
        "frame_bytes",
        F.floor(F.col("n_bytes") / F.col("n_frames")).cast("bigint"),
    )
    return geo.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0), F.col("n_frames") - 1, F.lit(every)
            )
        ).alias("frame_idx"),
        "frame_bytes",
    ).select(
        "doc_id",
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        (F.col("frame_idx") * F.col("frame_bytes")).alias("byte_offset"),
        "frame_bytes",
    )


def decode_payloads(docs: DataFrame) -> DataFrame:
    """Decode/feature-extract pass over payload batches via
    ``mapInPandas`` (Arrow-batched — the only sanctioned Python hop):
    (doc_id, width, height, n_frames)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield fake_decode_batch(pdf)

    payloads = attach_payload(docs).select("doc_id", "payload")
    return payloads.mapInPandas(run, DECODED_SCHEMA)


def cdc_chunks_np(docs: DataFrame, mask: int) -> DataFrame:
    """Content-defined chunk stream via a vectorized Arrow-batched
    kernel: (doc_id, chunk binary) — the fast twin of the pure-SQL
    gear fold in ``plans.queries_r12.q_multimodal_cdc_chunks``.

    Identical boundary semantics, proven by construction: a position
    p >= 31 is a cut iff the 32-byte windowed gear hash
    ``sum_{j<32} G[b[p-j]] * 2^j (mod 2^32)`` hits the mask. Because
    cut eligibility REQUIRES p >= 31, every evaluated window lies
    wholly inside its document, so the kernel computes the hash for a
    whole Arrow batch at once over the concatenated payload bytes —
    32 shifted vector adds (uint64 wraparound is harmless: the final
    ``& 0xFFFFFFFF`` is exact since 2^32 divides 2^64) — and masks
    out each document's first 31 positions afterwards.
    ``tests/test_round13.py`` asserts chunk-content equality against
    the SQL fold per (doc, position).

    The chunk travels as RAW BYTES, not an md5 string: downstream
    consumers join on chunk content equality, and ~mask-byte binaries
    are cheaper to shuffle than 32-char hex strings. Scale shape: one
    map-side Arrow hop, zero exchanges, per-task memory bounded by
    the Arrow batch size."""
    import numpy as np
    import pandas as pd

    from ..plans.queries_r12 import _GEAR

    gear = np.array(_GEAR, dtype=np.uint64)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("chunk", T.BinaryType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if pdf.empty:
                continue
            payloads = [bytes(p) for p in pdf["payload"]]
            lens = np.fromiter(
                (len(p) for p in payloads), dtype=np.int64
            )
            if lens.sum() == 0:
                continue
            allb = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            gv = gear[allb]
            h = gv.copy()
            for j in range(1, 32):
                h[j:] += gv[:-j] << np.uint64(j)
            h &= np.uint64(0xFFFFFFFF)
            is_cut = (h & np.uint64(mask - 1)) == 0
            # positions within 31 of each doc start are ineligible
            offs = np.concatenate(([0], np.cumsum(lens)))
            pos = np.arange(len(allb), dtype=np.int64)
            doc_ix = np.searchsorted(offs, pos, side="right") - 1
            is_cut &= (pos - offs[doc_ix]) >= 31
            out_ids, out_chunks = [], []
            ids = pdf["doc_id"].to_numpy()
            for k, p in enumerate(payloads):
                if not len(p):
                    continue
                local = (
                    np.flatnonzero(is_cut[offs[k]:offs[k + 1]]) + 1
                )
                starts = np.concatenate(([0], local))
                ends = np.concatenate((local, [len(p)]))
                for s, e in zip(starts, ends):
                    out_ids.append(ids[k])
                    out_chunks.append(p[s:e])
            yield pd.DataFrame({"doc_id": out_ids, "chunk": out_chunks})

    payloads = attach_payload(docs).select("doc_id", "payload")
    return payloads.mapInPandas(run, schema)
