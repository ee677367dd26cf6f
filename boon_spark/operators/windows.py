"""Tumbling event-time window aggregates — the fixed-window counterpart
of gap-based :mod:`.sessions`.

Batch: a window is ``floor(epoch_ms / width) · width`` — epoch-aligned
(1970-01-01 UTC), exactly how Spark's built-in ``F.window`` aligns its
tumbling windows, so the streaming counterpart
(:func:`~boon_spark.streaming.windows_stream.window_counts_stream`,
built on the NATIVE watermark + windowed-aggregation path) produces the
same ``window_start_ms`` integers — pinned in tests.

Scale: one shuffle keyed on (window [, group]); counts partially
aggregate map-side, so the exchange carries at most
windows × groups × partitions rows.  NULL event times are excluded
(no time, no window) — the watermark contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sessions import _epoch_ms, gap_ms_of

__all__ = ["window_counts", "window_counts_oracle_sql"]


def window_counts(df: DataFrame, *, ts_col: str = "ts",
                  window="1 hour",
                  group_col: str | None = None) -> DataFrame:
    """Per-window (optionally per-group) event counts:
    ``(window_start_ms [, group], n_events)`` — all exact integers."""
    w = gap_ms_of(window)
    ms = _epoch_ms(df, ts_col)
    # pmod, not %: truncating modulo would misalign pre-1970 events
    # (F.window floors; batch must floor identically)
    start = ((ms - F.pmod(ms, F.lit(w)))).cast("long") \
        .alias("window_start_ms")
    keys = [start] + ([F.col(group_col)] if group_col else [])
    return (df.filter(F.col(ts_col).isNotNull())
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).cast("long").alias("n_events")))


def window_counts_oracle_sql(*, events_sql: str, window,
                             ts_sql: str = "ts",
                             group_sql: str | None = None) -> str:
    """DuckDB reproduction — same integer floor-to-width arithmetic on
    ``epoch_ms`` (the double-mod renders pmod: floor alignment even
    for pre-1970 events)."""
    w = gap_ms_of(window)
    g = f", {group_sql}" if group_sql else ""
    return f"""
        SELECT CAST(epoch_ms({ts_sql})
                    - ((epoch_ms({ts_sql}) % {w} + {w}) % {w})
                    AS BIGINT)
                 AS window_start_ms{g},
               CAST(count(*) AS BIGINT) AS n_events
        FROM ({events_sql})
        WHERE {ts_sql} IS NOT NULL
        GROUP BY window_start_ms{g}
    """
