"""Streaming ingest: encode transcript micro-batches as they arrive.

The reference has no streaming at all (SURVEY.md §2.9 — its
"streaming" is out-of-core single-file pipelining), and the north_rule
is batch; this module is the incremental-arrival story on top of the
same engine: a Structured Streaming source feeds ``foreachBatch``,
each micro-batch runs the normal ``encode_table`` (with resume
semantics intact — the manifest dedupes groups across batches AND
restarts), so a continuously-landing transcript directory becomes a
continuously-growing encoded table with exactly-once-per-group commit.

Also provides a watermarked per-conversation turn-rate aggregation as
the streaming-analytics example (tumbling windows + late-data bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..encode_job import encode_table
from ..schema import TRANSCRIPT_SCHEMA


def stream_encode(
    spark: SparkSession,
    input_dir: str,
    io,
    checkpoint_dir: str,
    salt_rows: int = 65_536,
    codec: str = "auto",
    max_files_per_trigger: int = 8,
    compact_every: int | None = None,
    compact_chunk_rows: int = 65_536,
    compact_time_bucket=None,
):
    """readStream over a landing directory → encode each micro-batch.

    Returns the StreamingQuery; callers trigger availableNow (tests) or
    leave it running (production). Group-level idempotence comes from
    the engine's own manifest anti-join, so a replayed micro-batch
    (at-least-once source) cannot double-encode a completed group.

    ``compact_every=N`` runs ``maintenance.compact_blocks`` after every
    N-th non-empty epoch — streaming is the main producer of
    under-filled blocks (each epoch commits its own small groups), and
    in-line compaction keeps read amplification bounded without a
    separate maintenance job. Pass ``compact_time_bucket`` to keep the
    rewrite time-clustered: epochs are naturally time-ordered, and a
    window-less compact would merge their tight ts zone maps into
    timeline-wide ones, un-pruning ``decode_time_slice``. Compaction
    runs inside the foreachBatch callback (single writer — no
    concurrent-commit hazard); a compaction failure fails the epoch,
    and the next trigger retries it (the encode commit is idempotent).
    """
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    seen = {"epochs": 0}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        encode_table(
            spark,
            batch_df,
            io,
            run_id=f"stream_epoch_{epoch_id}",
            codec=codec,
            salt_rows=salt_rows,
            resume=True,
            # an epoch REPLAY skips its own committed groups; earlier
            # epochs' groups (same keys, disjoint data) never suppress it
            resume_scope="run",
        )
        seen["epochs"] += 1
        if compact_every and seen["epochs"] % compact_every == 0:
            import logging

            from ..maintenance import compact_blocks

            result = compact_blocks(
                spark, io,
                chunk_rows=compact_chunk_rows,
                salt_rows=salt_rows,
                codec=codec,
                time_bucket=compact_time_bucket,
                run_id=f"stream_compact_{epoch_id}",
            )
            if result.get("skipped"):
                # surface, never swallow: a convergence-guard skip here
                # usually means the epoch cadence produces blocks the
                # rewrite can't improve (fill already at the key floor)
                logging.getLogger("parquet_converter_spark").info(
                    "in-line compaction at epoch %s skipped: %s",
                    epoch_id, result["skipped"],
                )

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def turn_rate_windows(stream: DataFrame, window: str = "5 minutes", late: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window turn counts per role — the
    streaming-aggregation shape (late data bounded by the watermark)."""
    return (
        stream.withWatermark("ts", late)
        .groupBy(F.window("ts", window), "role")
        .agg(F.count("*").alias("turns"), F.approx_count_distinct("conv_id").alias("convs"))
    )
