"""Stateful streaming sessionization via applyInPandasWithState.

The custom-stateful-operator path: gap-based sessions (the batch twin
is ``operators/events.sessionize``) maintained as per-user state
across micro-batches.  A session CLOSES and is emitted when

- a newer event for the same user arrives more than `gap` after the
  session's last event (closed by data), or
- the event-time watermark passes last_event + gap (closed by
  timeout) — so every session eventually emits exactly once without
  unbounded state.

Rows later than the watermark are dropped by Spark before the
stateful operator (standard watermark semantics); within a micro-batch
rows are sorted by event time, so ordering only needs to hold across
batches at watermark granularity.

Scale: state is one open session (4 longs) per active user, evicted
by timeout — bounded by concurrently-active users, not history.  The
Arrow/pandas kernel touches only each batch's rows for the keys in
that batch (the applyInPandas batching model).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, session_no long, sess_start_us long, sess_end_us long, "
    "n_events long"
)
# open session carried across batches: numbering + bounds + size
STATE_SCHEMA = (
    "session_no long, sess_start_us long, sess_end_us long, n_events long"
)


def _session_fn(gap_us: int):
    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, int, int]] = []
        if state.hasTimedOut:
            sno, start, end, n = state.get
            closed.append((user_id, sno, start, end, n))
            state.remove()
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_no", "sess_start_us", "sess_end_us",
                    "n_events",
                ],
            )
            return
        # ev_us is precomputed epoch-microseconds (a plain long) — the
        # kernel never parses timestamps, so pandas timezone handling
        # can't skew it
        ts = pd.concat([p["ev_us"] for p in pdfs]).sort_values().to_numpy()
        if state.exists:
            sno, start, end, n = state.get
        else:
            sno, start, end, n = 1, int(ts[0]), int(ts[0]), 0
        for t in ts:
            t = int(t)
            if n > 0 and t - end > gap_us:
                closed.append((user_id, sno, start, end, n))
                sno, start, n = sno + 1, t, 0
            end_new = t if n == 0 else max(end, t)
            start = t if n == 0 else start
            end = end_new
            n += 1
        state.update((sno, start, end, n))
        # close-by-timeout once the watermark passes last_event + gap;
        # must stay above the current watermark (backlog replays)
        state.setTimeoutTimestamp(
            max((end + gap_us) // 1000, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_no", "sess_start_us", "sess_end_us",
                    "n_events",
                ],
            )

    return fn


def sessionize_stream(
    stream_df: DataFrame, gap_minutes: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """Emitted rows = CLOSED sessions, schema identical to the batch
    ``sessionize`` output.  Input must carry an event-time `ts`."""
    from pyspark.sql import functions as F

    gap_us = gap_minutes * 60 * 1_000_000
    # stateful ops require a TIMESTAMP (ltz) event-time column: pin the
    # NTZ wall clock as a UTC instant (same rule as events._epoch_us),
    # and carry epoch micros as a plain long for the kernel
    ltz = F.to_utc_timestamp(F.col("ts"), "UTC")
    prepared = stream_df.withColumn("ts", ltz).withColumn(
        "ev_us", F.unix_micros(ltz)
    )
    return (
        prepared.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_us),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
