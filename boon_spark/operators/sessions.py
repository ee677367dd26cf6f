"""Gap-based event sessionization: assign each event to a session that
closes when the user goes quiet for longer than ``gap``.

The training-pipeline shape this exists for: interaction logs become
training sequences per (user, session) — "sessionize, then pack each
session's events into a context window".  The operator is deliberately
deterministic end to end so the DuckDB oracle reproduces session
boundaries exactly: events order by (event time, event id) — the id
breaks timestamp ties — and the gap test is integer millisecond
arithmetic (``unix_millis`` here, ``epoch_ms`` in the oracle; both
truncate).

Scale shape: ONE shuffle on the user key; the within-user sort is
Spark's spillable window sort (a hyperactive user costs time on one
task, never memory — for bot-grade keys pre-split by coarse time bucket
when ``gap`` is much smaller than the bucket).  The lag and the running
sum share one partitioning/ordering, so Catalyst plans them as window
passes over a single exchange+sort; :func:`session_stats` groups by
(user, session_idx), which the user-hash partitioning already
clusters — no second exchange (pinned in test_plans_curation).

Streaming analogue: :mod:`..streaming.sessions_stream` (same gap rule,
per-user bounded state, sessions emitted when the watermark passes
their close; == batch pinned for in-order delivery).

NULL event times are excluded (an event with no time belongs to no
session) — the same contract as the watermark path in streaming.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["sessionize", "session_stats", "session_stats_oracle_sql"]


def gap_ms_of(gap) -> int:
    """Milliseconds of a gap given as an int (ms) or a pandas-parseable
    interval string ("30 minutes", "12h")."""
    if isinstance(gap, int):
        ms = gap
    else:
        try:
            ms = int(pd.Timedelta(gap).total_seconds() * 1000)
        except ValueError as e:
            raise ValueError(f"cannot parse gap {gap!r}: {e}") from e
    if ms <= 0:
        raise ValueError(f"gap must be positive, got {gap!r}")
    return ms


def _epoch_ms(df: DataFrame, ts_col: str):
    """Exact epoch milliseconds for TIMESTAMP and TIMESTAMP_NTZ alike.
    ``unix_millis`` rejects NTZ; an NTZ wall clock is read AS UTC —
    exactly DuckDB's ``epoch_ms`` on a naive timestamp, so oracles
    match without a session-timezone dependency."""
    from pyspark.sql.types import TimestampNTZType
    col = F.col(ts_col)
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        col = F.to_utc_timestamp(col, "UTC")
    return F.unix_millis(col)


def sessionize(df: DataFrame, *, user_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               gap="30 minutes",
               session_col: str = "session_idx") -> DataFrame:
    """``df`` (minus NULL-time events) plus a 1-based ``session_col``:
    the user's session counter, incremented whenever the previous event
    is more than ``gap`` milliseconds older."""
    g = gap_ms_of(gap)
    ms = _epoch_ms(df, ts_col)
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc())
    kept = df.filter(F.col(ts_col).isNotNull())
    prev = F.lag(ms).over(w)
    new_s = F.when(prev.isNull() | ((ms - prev) > F.lit(g)), 1) \
        .otherwise(0)
    flagged = kept.withColumn("_new_s", new_s)
    run = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (flagged
            .withColumn(session_col,
                        F.sum("_new_s").over(run).cast("long"))
            .drop("_new_s"))


def session_stats(df: DataFrame, *, user_col: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id",
                  gap="30 minutes") -> DataFrame:
    """Per-session aggregates: ``(user, session_idx, n_events,
    start_ms, end_ms, duration_ms)`` — all integer-exact (epoch
    milliseconds), oracle-comparable."""
    ms = _epoch_ms(df, ts_col)
    sess = sessionize(df, user_col=user_col, ts_col=ts_col,
                      id_col=id_col, gap=gap)
    return (sess.groupBy(user_col, "session_idx")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                 F.min(ms).cast("long").alias("start_ms"),
                 F.max(ms).cast("long").alias("end_ms"))
            .withColumn("duration_ms",
                        (F.col("end_ms") - F.col("start_ms"))
                        .cast("long")))


def session_stats_oracle_sql(*, events_sql: str, gap,
                             user_sql: str = "user_id",
                             ts_sql: str = "ts",
                             id_sql: str = "event_id") -> str:
    """DuckDB reproduction of :func:`session_stats` — same (ts, id)
    ordering, same integer-ms gap test (``epoch_ms`` = ``unix_millis``:
    both truncate)."""
    g = gap_ms_of(gap)
    return f"""
        WITH ev AS (
          SELECT {user_sql} AS u, {id_sql} AS eid, {ts_sql} AS ts,
                 epoch_ms({ts_sql}) AS ms
          FROM ({events_sql}) WHERE {ts_sql} IS NOT NULL
        ), flagged AS (
          SELECT u, ms, ts, eid,
                 CASE WHEN lag(ms) OVER w IS NULL
                        OR ms - lag(ms) OVER w > {g}
                      THEN 1 ELSE 0 END AS new_s
          FROM ev
          WINDOW w AS (PARTITION BY u ORDER BY ts ASC, eid ASC)
        ), sess AS (
          SELECT u, ms,
                 sum(new_s) OVER (PARTITION BY u ORDER BY ts ASC, eid ASC
                                  ROWS UNBOUNDED PRECEDING) AS session_idx
          FROM flagged
        )
        SELECT u AS {user_sql},
               CAST(session_idx AS BIGINT) AS session_idx,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(min(ms) AS BIGINT) AS start_ms,
               CAST(max(ms) AS BIGINT) AS end_ms,
               CAST(max(ms) - min(ms) AS BIGINT) AS duration_ms
        FROM sess GROUP BY u, session_idx
    """
