"""Streaming tumbling-window counts on Spark's NATIVE windowed
aggregation — the one streaming shape the engine's other operators
deliberately avoid (they need custom state), shown here on the built-in
path: ``withWatermark`` + ``groupBy(F.window(...))`` + append mode,
with finalized windows emitted once the watermark passes their end.

Structured Streaming handles the state store, eviction, and exactly-
once emission; this module's job is only to project the result to the
same integer ``(window_start_ms [, group], n_events)`` schema as batch
:func:`~boon_spark.operators.windows.window_counts` — equality pinned
in tests (Spark's tumbling windows are epoch-aligned, exactly the
batch operator's floor arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sessions import gap_ms_of

__all__ = ["window_counts_stream"]


def window_counts_stream(stream: DataFrame, *, ts_col: str = "ts",
                         window="1 hour", watermark: str = "10 minutes",
                         group_col: str | None = None) -> DataFrame:
    """Append-mode finalized window counts: ``(window_start_ms
    [, group], n_events)`` — the batch integers, emitted when the
    watermark passes each window's end."""
    gap_ms_of(window)  # validate/normalize early, same error message
    w_str = window if isinstance(window, str) else f"{window} milliseconds"
    # the watermark machinery itself rejects TIMESTAMP_NTZ
    # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) — convert wall clock AS UTC
    # up front, the same instant mapping batch _epoch_ms uses
    from pyspark.sql.types import TimestampNTZType
    if isinstance(stream.schema[ts_col].dataType, TimestampNTZType):
        stream = stream.withColumn(
            ts_col, F.to_utc_timestamp(F.col(ts_col), "UTC"))
    src = (stream.filter(F.col(ts_col).isNotNull())
                 .withWatermark(ts_col, watermark))
    keys = [F.window(F.col(ts_col), w_str)]
    if group_col:
        keys.append(F.col(group_col))
    agg = src.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"))
    cols = [F.unix_millis(F.col("window.start")).cast("long")
            .alias("window_start_ms")]
    if group_col:
        cols.append(F.col(group_col))
    return agg.select(*cols, "n_events")
