"""Streaming gap-based sessionization — the cross-batch analogue of
``operators.sessions``.

Per-user state is ONE open session ``(start_ms, last_ms, n)``: events
extend it, a within-batch gap larger than ``gap`` closes it (emitted
immediately) and opens the next, and the event-time timeout emits the
open session once the watermark passes ``last + gap`` — the natural
close: no event inside the gap can still arrive once the watermark is
past it (any such event would be older than the watermark and dropped
upstream).

Scale/state design: state is 3 longs + a timeout per ACTIVE user — not
per event — and is removed the moment the session is emitted, so the
state store is bounded by users active within one gap horizon.  The
shuffle carries (user, ts, id) rows only.

Parity (pinned in test_streaming): for in-order event delivery the
emitted sessions equal batch :func:`~boon_spark.operators.sessions.
session_stats` rows exactly — (user, start_ms, end_ms, n_events).
Within-horizon LATE events are merged conservatively into the open
session (``start = min``, ``last = max``); a late event that batch
would have placed in an earlier, already-emitted session is the one
divergence, inherent to single-pass streaming and bounded by the
watermark delay.

Timeout bookkeeping follows ``near_dup.make_collider``: Arrow hands
event times tz-NAIVE in the session timezone (localize before
``.timestamp()``); the timeout target only ever advances; an
EventTimeTimeout never fires in a trigger where the key HAS data, so
logically-expired state resets inline.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sessions import gap_ms_of
from .near_dup import _horizon_ms

STATE_SCHEMA = "start_ms long, last_ms long, n long, timeout_ms long"
OUTPUT_SCHEMA = "user_id string, start_ms long, end_ms long, n_events long"


def make_sessionizer(gap_ms: int, session_tz: str = "UTC"):
    """The per-user stateful function, exposed for direct unit testing
    of the open/close/timeout contract."""

    def fn(key, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        user = key[0]
        if state.hasTimedOut:
            start, last, n, _t = state.get
            state.remove()
            yield pd.DataFrame([{"user_id": user, "start_ms": start,
                                 "end_ms": last, "n_events": n}])
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.dropna(subset=["ts"])
        if rows.empty:
            return  # any previously-armed timeout stays in force
        rows = rows.sort_values(["ts", "_eid"], kind="mergesort")
        ts = rows["ts"]
        if getattr(ts.dt, "tz", None) is None:
            ts = ts.dt.tz_localize(session_tz, ambiguous=False,
                                   nonexistent="shift_forward")
        ms_list = (ts.astype("int64") // 1_000_000).tolist()

        out = []
        start = None
        prev_timeout = 0
        if state.exists:
            start, last, n, prev_timeout = state.get
            if prev_timeout and state.getCurrentWatermarkMs() > prev_timeout:
                # watermark already passed the close but the key got
                # data this trigger, so the timeout can't fire: emit
                # the expired session inline and start fresh
                out.append({"user_id": user, "start_ms": start,
                            "end_ms": last, "n_events": n})
                start = None
        for ms in ms_list:
            if start is None:
                start, last, n = ms, ms, 1
            elif ms - last > gap_ms:
                out.append({"user_id": user, "start_ms": start,
                            "end_ms": last, "n_events": n})
                start, last, n = ms, ms, 1
            else:
                n += 1
                # conservative merge for within-horizon late rows
                last = max(last, ms)
                start = min(start, ms)
        target = max(prev_timeout, last + gap_ms + 1,
                     state.getCurrentWatermarkMs() + 1)
        state.update((start, last, n, target))
        state.setTimeoutTimestamp(target)
        if out:
            yield pd.DataFrame(out)

    return fn


def sessions_stream(stream_df: DataFrame, *, user_col: str = "user_id",
                    ts_col: str = "ts", id_col: str = "event_id",
                    gap="30 minutes",
                    watermark: str = "10 minutes") -> DataFrame:
    """Streaming session aggregates: one ``(user_id, start_ms, end_ms,
    n_events)`` row per CLOSED session — closed by a larger-than-gap
    in-batch silence or by the watermark passing ``last + gap``."""
    g = gap_ms_of(gap)
    _horizon_ms(watermark)  # validate the interval early, same message
    # watermarks reject TIMESTAMP_NTZ — convert wall clock AS UTC, the
    # same instant mapping batch _epoch_ms uses
    from pyspark.sql.types import TimestampNTZType
    if isinstance(stream_df.schema[ts_col].dataType, TimestampNTZType):
        stream_df = stream_df.withColumn(
            ts_col, F.to_utc_timestamp(F.col(ts_col), "UTC"))
    src = (stream_df
           .select(F.col(user_col).cast("string").alias("user_id"),
                   F.col(ts_col).alias("ts"),
                   # native dtype preserved: the (ts, id) tiebreak must
                   # sort like the batch operator's, not lexically
                   F.col(id_col).alias("_eid"))
           .filter(F.col("ts").isNotNull())
           .withWatermark("ts", watermark))
    session_tz = stream_df.sparkSession.conf.get(
        "spark.sql.session.timeZone")
    return (src.groupBy("user_id")
            .applyInPandasWithState(
                make_sessionizer(g, session_tz),
                OUTPUT_SCHEMA, STATE_SCHEMA,
                "append", GroupStateTimeout.EventTimeTimeout))
