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

Scale: state is one open-session record (4 longs) per active user;
after a session closes it shrinks to a counter-only record kept for a
bounded retention (default 10× gap) so numbering continues for
returning users, then the user is forgotten entirely — state is
bounded by users active within the retention window, not by history.
The Arrow/pandas kernel touches only each batch's rows for the keys in
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


_COLS = ["user_id", "session_no", "sess_start_us", "sess_end_us", "n_events"]


def _session_fn(gap_us: int, retention_us: int):
    """State is (sno, start, end, n); n == 0 marks a COUNTER-ONLY state
    (no open session) kept for `retention_us` after the last session
    closes, so a returning user's next session continues the numbering
    instead of restarting at 1 (batch-twin parity).  A user silent
    longer than the retention is forgotten — bounded state — and
    restarts at session_no 1 (documented divergence)."""

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int, int, int]] = []
        if state.hasTimedOut:
            sno, start, end, n = state.get
            if n > 0:
                # open session closes by timeout; retain the counter
                closed.append((user_id, sno, start, end, n))
                state.update((sno, 0, 0, 0))
                state.setTimeoutTimestamp(
                    state.getCurrentWatermarkMs() + retention_us // 1000
                )
                yield pd.DataFrame(closed, columns=_COLS)
            else:
                # counter-only state expired: forget the user
                state.remove()
            return
        # ev_us is precomputed epoch-microseconds (a plain long) — the
        # kernel never parses timestamps, so pandas timezone handling
        # can't skew it
        ts = pd.concat([p["ev_us"] for p in pdfs]).sort_values().to_numpy()
        if state.exists:
            sno, start, end, n = state.get
            if n == 0:
                sno += 1  # counter-only → next session number
        else:
            sno, start, end, n = 1, 0, 0, 0
        for t in ts:
            t = int(t)
            if n > 0 and t - end > gap_us:
                closed.append((user_id, sno, start, end, n))
                sno, n = sno + 1, 0
            if n == 0:
                start = end = t
                n = 1
            else:
                # min/max: an out-of-order (but within-watermark) event
                # extends the open session in both directions; batch
                # may instead report a separate earlier session — the
                # documented cross-batch-disorder divergence
                start, end, n = min(start, t), max(end, t), n + 1
        state.update((sno, start, end, n))
        # close-by-timeout once the watermark passes last_event + gap;
        # must stay above the current watermark (backlog replays)
        state.setTimeoutTimestamp(
            max((end + gap_us) // 1000, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield pd.DataFrame(closed, columns=_COLS)

    return fn


def sessionize_stream(
    stream_df: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    retention_minutes: int | None = None,
) -> DataFrame:
    """Emitted rows = CLOSED sessions, schema identical to the batch
    ``sessionize`` output.  Input must carry an event-time `ts`.
    `retention_minutes` bounds how long a user's session COUNTER
    outlives their last session (default 10× gap) — see _session_fn."""
    from pyspark.sql import functions as F

    from bids_spark.operators.events import pin_utc

    gap_us = gap_minutes * 60 * 1_000_000
    retention_us = (retention_minutes or gap_minutes * 10) * 60 * 1_000_000
    # stateful ops require a TIMESTAMP (ltz) event-time column: pin the
    # NTZ wall clock as a UTC instant (the single pin_utc rule), and
    # carry epoch micros as a plain long for the kernel
    ltz = pin_utc(F.col("ts"))
    prepared = stream_df.withColumn("ts", ltz).withColumn(
        "ev_us", F.unix_micros(ltz)
    )
    return (
        prepared.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_us, retention_us),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
