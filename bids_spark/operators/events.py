"""Event-stream operators over the `events` table.

The reference has no event/stream analytics (its only temporal data is
a formatted file date, `bids/output.py:66`), but a web-scale ingest
pipeline always carries an event log (crawl fetches, user queries);
these are the standard temporal operators over it:

- windowed_counts: tumbling-window counts/sums per event_type — the
  batch twin of the Structured Streaming aggregation in
  `streaming/windows.py` (same expression tree on both paths).
- sessionize: gap-based sessions per user — lag + running-sum window
  functions, the classic sessionization dataflow.

All outputs use integer epoch values (unix seconds / micros), never
raw timestamps: the driver's oracle compare round-trips values through
pandas, where a naive timestamp silently picks up the session
timezone; integers are timezone-proof on both engines.

Scale notes: windowed_counts is one partial-aggregated groupBy
(map-side combine, shuffle on (window, type) — thousands of groups,
never data-sized).  sessionize shuffles once on user_id and sorts
within user — the per-user ordered-window pattern that survives any
corpus size as long as a single user's history fits a partition (true
for web logs; a pathological user would need re-salting by day).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pin_utc(ts: Column) -> Column:
    """TIMESTAMP_NTZ wall clock → TIMESTAMP instant, pinning the wall
    clock AS UTC (parquet timestamps load as NTZ in Spark 4).  Apply
    exactly ONCE: on an already-LTZ column under a non-UTC session this
    would shift the instant."""
    return F.to_utc_timestamp(ts, "UTC")


def _epoch_us(ts: Column) -> Column:
    """Epoch microseconds of an NTZ wall clock, independent of the
    session timezone — matches DuckDB's epoch_us on naive timestamps."""
    return F.unix_micros(pin_utc(ts))


def windowed_agg(events: DataFrame, ts_col: str, window: str) -> DataFrame:
    """Tumbling-window agg over an already-pinned TIMESTAMP column —
    the expression tree shared verbatim by the batch and streaming
    paths (streaming watermarks `ts_col` before calling this)."""
    return (
        events.groupBy(
            F.window(ts_col, window).alias("w"), "event_type"
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            (F.unix_micros(F.col("w.start")) / F.lit(1_000_000))
            .cast("long")
            .alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def windowed_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """(win_start unix-sec, event_type, n_events, sum_value) per
    tumbling window.  Window boundaries are epoch-aligned on the wall
    clock — timezone-independent."""
    pinned = events.withColumn("_ts_utc", pin_utc(F.col("ts")))
    return windowed_agg(pinned, "_ts_utc", window)


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions: a new session starts when a user's
    inter-event gap exceeds `gap_minutes`.  Output one row per session:
    (user_id, session_no, sess_start_us, sess_end_us, n_events).

    Comparisons use integer epoch-microseconds (unix_micros /
    epoch_us) so Spark and DuckDB evaluate identical arithmetic; ties
    within a user are ordered by (ts, event_id) — fully deterministic.
    """
    us = _epoch_us(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(us).over(w)
    is_new = F.when(
        prev.isNull() | ((us - prev) > gap_minutes * 60 * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess_no = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = events.select(
        "user_id", us.alias("ev_us"), sess_no.cast("long").alias("session_no")
    )
    return tagged.groupBy("user_id", "session_no").agg(
        F.min("ev_us").alias("sess_start_us"),
        F.max("ev_us").alias("sess_end_us"),
        F.count("*").cast("long").alias("n_events"),
    )
