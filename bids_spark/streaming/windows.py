"""Structured-Streaming twins of the batch event operators.

The batch expression tree (operators/events.py) is reused verbatim on
the streaming DataFrame — one definition, two execution modes — with a
watermark bounding state for late data:

- windowed_counts_stream: tumbling-window agg over a file-landing
  stream.  In append mode a window emits exactly once, after the
  watermark passes its end; rows arriving later than the watermark are
  dropped (tested in tests/test_streaming_events.py).
- run_to_memory: drive a streaming frame with trigger(availableNow)
  into a named in-memory sink and block until drained — the test/CLI
  harness path.  Checkpointed: a restart resumes, never double-counts.

Scale: state per (window × event_type) is thousands of rows; the
watermark evicts closed windows, so state is bounded regardless of
stream length — the property that matters at a 100 TB/day event feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from bids_spark.operators.events import pin_utc, windowed_agg

# ts is TIMESTAMP_NTZ — matches what spark.read.parquet infers for the
# events table, so batch and stream share one epoch rule (events._epoch_us)
EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(
    spark: SparkSession, landing_dir: str, max_files: int | None = None
) -> DataFrame:
    r = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files is not None:
        r = r.option("maxFilesPerTrigger", max_files)
    return r.parquet(landing_dir)


def windowed_counts_stream(
    stream_df: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Same aggregation as the batch op, on a watermarked stream.
    Watermarks require a TIMESTAMP (ltz) column, so the NTZ wall clock
    is pinned as UTC first — the exact rule the batch op applies."""
    pinned = stream_df.withColumn("_ts_utc", pin_utc(F.col("ts")))
    return windowed_agg(
        pinned.withWatermark("_ts_utc", watermark), "_ts_utc", window
    )


def run_to_memory(
    agg: DataFrame,
    query_name: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """One availableNow drain into `query_name` (spark.table(...)).
    Memory sink is NOT checkpoint-recoverable — single-run use only
    (tests/demos); multi-run pipelines use run_to_parquet."""
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_parquet(agg: DataFrame, out_dir: str, checkpoint_dir: str) -> None:
    """One availableNow drain appended to a parquet sink — the durable,
    checkpoint-recoverable path (exactly-once across restarts)."""
    q = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
