"""Streaming twins of the event operators: batch/stream parity and
watermark late-data semantics."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from bids_spark.operators.events import sessionize, windowed_counts
from bids_spark.streaming import windows as sw


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.slow
def test_stream_windowed_parity(spark, tmp_path):
    """complete-mode streaming agg over a 3-chunk landing dir must
    equal the batch op over the full table (same expression tree)."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    land = str(tmp_path / "land")
    for i in range(3):
        ev.filter(f"event_id % 3 = {i}").write.mode("append").parquet(land)
    stream = sw.read_events_stream(spark, land, max_files=2)
    agg = sw.windowed_counts_stream(stream, "1 hour", "2 hours")
    sw.run_to_memory(agg, "wc_complete", str(tmp_path / "ck"), "complete")
    got = _rows(spark.table("wc_complete"))
    want = _rows(windowed_counts(ev, "1 hour"))
    assert got == want


@pytest.mark.slow
def test_stream_append_drops_late_rows(spark, tmp_path):
    """append mode: a row older than the watermark is dropped — its
    window never reaches the sink; closed in-time windows do."""
    land, ck = str(tmp_path / "land"), str(tmp_path / "ck")
    out = str(tmp_path / "out")
    base = datetime(2024, 3, 1, 0, 0, 0)

    def write(rows):
        spark.createDataFrame(
            [
                (i, t, 1, "click", 1.0, "{}")
                for i, t in enumerate(rows)
            ],
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string",
        ).write.mode("append").parquet(land)

    # batch 1: events at hours 10..20 → watermark advances to 18:00
    write([base + timedelta(hours=h) for h in range(10, 21)])
    stream = sw.read_events_stream(spark, land)
    agg = sw.windowed_counts_stream(stream, "1 hour", "2 hours")
    sw.run_to_parquet(agg, out, ck)
    # batch 2: one row at hour 2 — far below the 18:00 watermark
    write([base + timedelta(hours=2)])
    # batch 3: a fresh row at hour 30 pushes the watermark past all
    # earlier windows so everything emittable flushes
    write([base + timedelta(hours=30)])
    stream2 = sw.read_events_stream(spark, land)
    agg2 = sw.windowed_counts_stream(stream2, "1 hour", "2 hours")
    sw.run_to_parquet(agg2, out, ck)

    emitted = {r["win_start"] for r in spark.read.parquet(out).collect()}
    from datetime import timezone

    # wall clock pinned as UTC — matches the engine's NTZ epoch rule
    h = lambda x: int(  # noqa: E731
        (base + timedelta(hours=x)).replace(tzinfo=timezone.utc).timestamp()
    )
    assert h(10) in emitted and h(20) in emitted
    assert h(2) not in emitted, "late row below watermark must be dropped"


def test_sessionize_semantics(spark):
    """Planted gaps: two users, one with a 31-min gap (2 sessions),
    one continuous (1 session)."""
    base = datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (1, base, 100),
        (2, base + timedelta(minutes=10), 100),
        (3, base + timedelta(minutes=41, seconds=1), 100),  # gap > 30 min
        (4, base + timedelta(minutes=50), 100),
        (5, base, 200),
        (6, base + timedelta(minutes=29), 200),
    ]
    ev = spark.createDataFrame(
        [(i, t, u, "c", 0.0, "{}") for i, t, u in rows],
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )
    out = {
        (r["user_id"], r["session_no"]): r
        for r in sessionize(ev, gap_minutes=30).collect()
    }
    assert len(out) == 3
    assert out[(100, 1)]["n_events"] == 2
    assert out[(100, 2)]["n_events"] == 2
    assert out[(200, 1)]["n_events"] == 2
    s2 = out[(100, 2)]
    assert s2["sess_end_us"] - s2["sess_start_us"] == (50 - 41) * 60_000_000 - 1_000_000


@pytest.mark.slow
def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: after an epilogue event
    pushes the watermark past every real session's timeout, the set of
    emitted sessions equals the batch sessionize output exactly."""
    from bids_spark.streaming import sessions as ss
    from bids_spark.streaming import windows as sw

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").cache()
    land, ck, out = (str(tmp_path / d) for d in ("land", "ck", "out"))
    # time-ordered chunks, one file each → deterministic micro-batch order
    lo, hi = ev.selectExpr("min(ts)", "max(ts)").first()
    span = (hi - lo) / 3
    for i in range(3):
        chunk = ev.filter(
            (ev.ts >= lo + i * span)
            & (ev.ts < (lo + (i + 1) * span if i < 2 else hi + span))
        )
        chunk.coalesce(1).write.mode("append").parquet(land)
    stream = sw.read_events_stream(spark, land, max_files=1)
    agg = ss.sessionize_stream(stream, gap_minutes=30, watermark="1 hour")
    sw.run_to_parquet(agg, out, ck)

    # epilogue: dummy user far in the future → every real session
    # times out and emits in the second drain
    from datetime import timedelta

    spark.createDataFrame(
        [(999999, hi + timedelta(days=10), 999999, "x", 0.0, "{}")],
        sw.EVENTS_SCHEMA,
    ).write.mode("append").parquet(land)
    stream2 = sw.read_events_stream(spark, land, max_files=1)
    agg2 = ss.sessionize_stream(stream2, gap_minutes=30, watermark="1 hour")
    sw.run_to_parquet(agg2, out, ck)

    got = sorted(
        tuple(r)
        for r in spark.read.parquet(out).filter("user_id != 999999").collect()
    )
    want = sorted(tuple(r) for r in sessionize(ev, gap_minutes=30).collect())
    assert got == want


def test_sessionize_single_shuffle_plan(spark):
    """The whole sessionize dataflow must reuse ONE hash-partitioning
    on user_id: windows + final aggregate, no second Exchange."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = (
        sessionize(ev)._jdf.queryExecution().executedPlan().toString()
    )
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_windowed_counts_partial_agg_plan(spark):
    """Map-side combine: HashAggregate below the single Exchange."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = (
        windowed_counts(ev)._jdf.queryExecution().executedPlan().toString()
    )
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    assert "HashAggregate" in plan.split("Exchange")[-1]


@pytest.mark.slow
def test_stateful_sessionize_numbering_survives_timeout(spark, tmp_path):
    """A session closed by TIMEOUT must not reset the user's session
    numbering: the next session continues at session_no+1 (counter-only
    retained state)."""
    from bids_spark.streaming import sessions as ss
    from bids_spark.streaming import windows as sw

    land, ck, out = (str(tmp_path / d) for d in ("land", "ck", "out"))
    base = datetime(2024, 4, 1, 10, 0, 0)

    def feed(rows):
        spark.createDataFrame(
            [(i, t, u, "c", 0.0, "{}") for i, (t, u) in enumerate(rows)],
            sw.EVENTS_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(land)
        stream = sw.read_events_stream(spark, land)
        agg = ss.sessionize_stream(
            stream, gap_minutes=30, watermark="1 hour",
            retention_minutes=600,
        )
        sw.run_to_parquet(agg, out, ck)

    feed([(base, 1)])                                   # session 1 opens
    feed([(base + timedelta(hours=3), 999)])            # wm → session 1 times out
    feed([(base + timedelta(hours=3, minutes=30), 1)])  # user 1 returns
    feed([(base + timedelta(hours=10), 999)])           # wm → session 2 times out

    got = sorted(
        (r["session_no"], r["n_events"])
        for r in spark.read.parquet(out).filter("user_id = 1").collect()
    )
    assert got == [(1, 1), (2, 1)], got


# ---------------------------------------------------------------------------
# hot-user skew fallback (two-phase salted sessionize)
# ---------------------------------------------------------------------------


def _as_rows(df):
    return sorted(
        (r["user_id"], r["session_no"], r["sess_start_us"],
         r["sess_end_us"], r["n_events"])
        for r in df.collect()
    )


def test_salted_sessionize_identical_to_plain(spark):
    """Exactness of the two-phase plan: random events with one hot
    user whose sessions straddle day boundaries (incl. a multi-day
    session chained through midnight at exactly-gap and within-gap
    deltas) — salted ≡ plain for several gaps."""
    import random

    from bids_spark.operators import events as ev_ops

    rng = random.Random(7)
    day = 86_400
    rows = []
    eid = 0
    # hot user: bursts every few minutes across 5 days, some gaps
    # exactly at the threshold (must NOT split: predicate is >)
    t = 1_700_000_000
    for _ in range(2000):
        t += rng.choice([60, 120, 1800, 1801, 7200])
        rows.append((eid, 1, t)); eid += 1
    # a session crossing midnight with tiny deltas
    mid = (t // day + 1) * day
    for dt in (-120, -60, 30, 90):
        rows.append((eid, 1, mid + dt)); eid += 1
    # cold users
    for u in range(2, 30):
        t2 = 1_700_000_000 + u * 37
        for _ in range(rng.randint(1, 20)):
            t2 += rng.choice([60, 4000])
            rows.append((eid, u, t2)); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, sec bigint"
    ).select(
        "event_id", "user_id",
        # session tz is UTC (session.get_spark) so LTZ→NTZ keeps the
        # wall clock
        F.timestamp_seconds("sec").cast("timestamp_ntz").alias("ts"),
    )
    for gap in (5, 30, 90):
        plain = _as_rows(ev_ops.sessionize(ev, gap_minutes=gap,
                                           salted=False))
        salted = _as_rows(ev_ops.sessionize(ev, gap_minutes=gap,
                                            salted=True))
        assert salted == plain, gap


def test_salted_plan_bounds_hot_partition(spark):
    """One user owning 50% of events: the salted phase-1 partition key
    is (user_id, day), so the hot user's rows split across days — the
    max per-key group is bounded by one day of their history, not the
    whole history.  Plan-asserted: the first window sort partitions by
    (user_id, day)."""
    from bids_spark.operators import events as ev_ops

    n = 4000
    rows = [(i, 1, 1_700_000_000 + i * 3600) for i in range(n)]  # 1/hour, ~167 days
    rows += [(n + i, 2 + (i % 50), 1_700_000_000 + i * 60)
             for i in range(n)]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, sec bigint"
    ).select("event_id", "user_id",
             F.timestamp_seconds("sec").cast("timestamp_ntz").alias("ts"))
    df = ev_ops.sessionize(ev, gap_minutes=30, salted=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "day" in plan  # phase-1 window partitions by (user_id, day)
    # the hot user's largest phase-1 group is one day = 24 events
    grouped = (
        ev.select("user_id",
                  (ev_ops._epoch_us(F.col("ts")) / ev_ops._DAY_US)
                  .cast("long").alias("day"))
        .groupBy("user_id", "day").count()
        .agg(F.max("count")).first()[0]
    )
    assert grouped <= 60 < n / 2


def test_skew_probe_threshold(spark, monkeypatch):
    from bids_spark.operators import events as ev_ops

    skewed = spark.createDataFrame(
        [(i, 1 if i < 500 else 2 + i % 10,
          1_700_000_000 + i * 60) for i in range(1000)],
        "event_id bigint, user_id bigint, sec bigint",
    ).select("event_id", "user_id",
             F.timestamp_seconds("sec").cast("timestamp_ntz").alias("ts"))
    # below SKEW_MIN_EVENTS: probe declines even at 50% share
    assert not ev_ops._skew_salting_needed(skewed)
    monkeypatch.setattr(ev_ops, "SKEW_MIN_EVENTS", 100)
    assert ev_ops._skew_salting_needed(skewed)
    uniform = spark.createDataFrame(
        [(i, i % 50, 1_700_000_000 + i * 60) for i in range(1000)],
        "event_id bigint, user_id bigint, sec bigint",
    ).select("event_id", "user_id",
             F.timestamp_seconds("sec").cast("timestamp_ntz").alias("ts"))
    assert not ev_ops._skew_salting_needed(uniform)
