"""Checkpoint-restart exactly-once: the fault-tolerance half of the
Structured Streaming story the AvailableNow suite and the
continuous-trigger soak don't cover. A query drains PART of its
source, is stopped (simulating a crash/redeploy), and a NEW query
object restarts from the same checkpoint — the final sink must equal
the batch answer with no duplicated and no lost micro-batch, because
the checkpoint's WAL + commit log replay exactly the uncommitted
work.

foreachBatch alone is at-least-once: a kill between the sink write
and the checkpoint commit replays that batch on restart. Exactly-once
therefore comes from the sink being IDEMPOTENT PER batch_id —
batch_ids are stable across restarts, so writing each batch to its
own deterministic location with overwrite semantics absorbs any
replay. That (sink-side idempotence x stable batch ids) is the
documented Structured Streaming contract this test pins down, with
the kill point landing mid-drain.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def test_restart_from_checkpoint_is_exactly_once(spark, tmp_path):
    docs = spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet"))
    src = str(tmp_path / "src")
    os.makedirs(src)
    # land 4 single-file micro-batches
    for i in range(4):
        docs.filter(F.col("doc_id") % 4 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")

    def make_query(stop_after: int | None):
        """Start the stream; if stop_after is given, stop the query as
        soon as that many batches committed (mid-drain kill)."""
        seen = []

        def sink(batch_df, batch_id):
            # idempotent by construction: the batch's stable id IS the
            # target, overwrite absorbs a replay of a half-committed
            # batch after restart
            batch_df.select("doc_id", "n_chars").write.mode(
                "overwrite"
            ).parquet(os.path.join(spool, f"batch_{batch_id}"))
            seen.append(batch_id)

        q = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if stop_after is None:
            q.awaitTermination()
        else:
            import time

            deadline = time.monotonic() + 120
            while len(seen) < stop_after and time.monotonic() < deadline:
                time.sleep(0.1)
            q.stop()
            q.awaitTermination()
        return seen

    first = make_query(stop_after=2)
    assert len(first) >= 2, "kill point never reached"
    # restart with a FRESH query object on the same checkpoint: only
    # the not-yet-committed batches replay
    second = make_query(stop_after=None)

    got = (
        spark.read.parquet(os.path.join(spool, "batch_*"))
        .groupBy()
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("doc_id").alias("nd"),
            F.sum("n_chars").alias("s"),
        )
        .collect()[0]
    )
    want = docs.agg(
        F.count("*").alias("n"),
        F.countDistinct("doc_id").alias("nd"),
        F.sum("n_chars").alias("s"),
    ).collect()[0]
    # exactly-once: counts equal AND no doc duplicated (n == nd)
    assert got.n == want.n, f"lost or duplicated rows: {got.n} != {want.n}"
    assert got.nd == want.nd
    assert got.n == got.nd
    assert got.s == want.s
    # the restart resumed from the checkpoint rather than starting
    # over: it processed strictly fewer batches than a cold run would
    assert len(second) < 4
