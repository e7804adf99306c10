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
for web logs).  A pathological hot user engages the two-phase salted
plan (per-(user, day) local sessions + session-grain merge — exact,
property-tested), auto-triggered by the SKEW_USER_SHARE probe.
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


#: Auto-salting trigger: the hot user must own at least this share of
#: all events AND at least this many events before the two-phase path
#: engages (below that, one sorted partition is cheaper than a second
#: shuffle).  Module-level so tests and pipeline owners can tune.
SKEW_USER_SHARE = 0.2
SKEW_MIN_EVENTS = 100_000
_DAY_US = 86_400 * 1_000_000


def _skew_salting_needed(events: DataFrame) -> bool:
    """One tiny two-level agg (map-side combined; output is one row):
    does a single user dominate enough to blow the per-user sort
    partition?"""
    r = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").alias("mx"), F.sum("c").alias("tot"))
        .first()
    )
    tot = int(r["tot"] or 0)
    return (
        tot > 0
        and int(r["mx"]) >= SKEW_MIN_EVENTS
        and int(r["mx"]) / tot >= SKEW_USER_SHARE
    )


def sessionize(
    events: DataFrame, gap_minutes: int = 30, salted: bool | None = None
) -> DataFrame:
    """Gap-based sessions: a new session starts when a user's
    inter-event gap exceeds `gap_minutes`.  Output one row per session:
    (user_id, session_no, sess_start_us, sess_end_us, n_events).

    Comparisons use integer epoch-microseconds (unix_micros /
    epoch_us) so Spark and DuckDB evaluate identical arithmetic; ties
    within a user are ordered by (ts, event_id) — fully deterministic.

    `salted` — the single-hot-user skew fallback (the documented
    residual of the plain path: its per-user window sort needs one
    user's whole history in one partition):
      * False: one shuffle on user_id (right when no user dominates —
        web-log reality);
      * True: two-phase — local sessions per (user_id, day), then a
        SESSION-grain merge per user.  The hot partition shrinks from
        the user's full history to one day of it, and the merge input
        is session rows (orders of magnitude smaller than events).
        Exact for any gap: phase 2 re-joins exactly the sessions the
        day boundary split (same `> gap` predicate on the boundary
        delta), so salted ≡ plain — property-tested;
      * None (default): auto — engage the salted plan iff the
        SKEW_USER_SHARE/SKEW_MIN_EVENTS probe fires (one tiny agg).
    """
    if salted is None:
        salted = _skew_salting_needed(events)
    gap_us = gap_minutes * 60 * 1_000_000
    if salted:
        return _sessionize_salted(events, gap_us)
    us = _epoch_us(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag(us).over(w)
    is_new = F.when(
        prev.isNull() | ((us - prev) > gap_us),
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


def _sessionize_salted(events: DataFrame, gap_us: int) -> DataFrame:
    """Two-phase skew-tolerant sessionize (see sessionize docstring).

    Correctness does not depend on WHERE the day boundaries fall —
    any chunking monotone in event time is repaired exactly by the
    phase-2 merge — only the skew bound does (one user-day per
    partition)."""
    us = _epoch_us(F.col("ts"))
    ev = events.select(
        "user_id", us.alias("ev_us"), "event_id"
    ).withColumn("day", (F.col("ev_us") / F.lit(_DAY_US)).cast("long"))
    w1 = Window.partitionBy("user_id", "day").orderBy("ev_us", "event_id")
    prev = F.lag("ev_us").over(w1)
    new1 = F.when(
        prev.isNull() | ((F.col("ev_us") - prev) > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    local = (
        ev.withColumn(
            "lsess",
            F.sum(new1).over(
                w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "day", "lsess")
        .agg(
            F.min("ev_us").alias("s"),
            F.max("ev_us").alias("e"),
            F.count("*").alias("n"),
        )
    )
    # phase 2 over SESSION rows: consecutive local sessions merge iff
    # the boundary delta is within the gap — the same predicate the
    # event-level walk applies to the same two timestamps
    w2 = Window.partitionBy("user_id").orderBy("s", "e")
    pe = F.lag("e").over(w2)
    new2 = F.when(
        pe.isNull() | ((F.col("s") - pe) > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    merged = local.withColumn(
        "session_no",
        F.sum(new2)
        .over(w2.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return merged.groupBy("user_id", "session_no").agg(
        F.min("s").alias("sess_start_us"),
        F.max("e").alias("sess_end_us"),
        F.sum("n").cast("long").alias("n_events"),
    )
