"""Tumbling event-time windows (operators/windows.py +
streaming/windows_stream.py) and per-group heavy hitters
(cleaning.group_topk).

The DuckDB oracle gates (`event_windows`, `source_topk`) pin
cross-engine bit-exactness; this file pins window alignment, NULL
handling, the native-streaming == batch equality, and group_topk
ranking.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from boon_spark.operators.windows import window_counts

DDL = "event_id bigint, user_id bigint, ts string"


def _frame(spark, rows):
    return (spark.createDataFrame(rows, DDL)
            .withColumn("ts", F.to_timestamp("ts")))


def test_window_alignment_and_nulls(spark):
    df = _frame(spark, [
        (1, 1, "2024-01-01 00:10:00"),
        (2, 1, "2024-01-01 00:50:00"),
        (3, 1, "2024-01-01 01:10:00"),
        (4, 1, None),
    ])
    out = {r.window_start_ms: r.n_events
           for r in window_counts(df, window="1 hour").collect()}
    h0 = int(pd.Timestamp("2024-01-01", tz="UTC").timestamp() * 1000)
    assert out == {h0: 2, h0 + 3600_000: 1}  # NULL ts excluded


def test_window_counts_stream_matches_batch(spark, tmp_path):
    """Native watermark + windowed agg emits the SAME integers as the
    batch floor arithmetic (epoch alignment shared)."""
    from boon_spark.streaming.windows_stream import window_counts_stream
    rows = [(i, 1 + i % 3,
             str(pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=7 * i)))
            for i in range(60)]
    df = _frame(spark, rows).withColumn(
        "event_type", F.concat(F.lit("t"), (F.col("user_id") % 2)
                               .cast("string")))
    path = str(tmp_path / "win_in")
    df.filter(F.col("event_id") < 30).coalesce(1) \
        .write.parquet(path + "/p1")
    df.filter(F.col("event_id") >= 30).coalesce(1) \
        .write.parquet(path + "/p2")
    # flush sentinel advances the watermark past every real window
    _frame(spark, [(999, 9, "2024-02-01 00:00:00")]) \
        .withColumn("event_type", F.lit("tz")).coalesce(1) \
        .write.parquet(path + "/p3")
    stream = (spark.readStream
              .schema("event_id bigint, user_id bigint, ts timestamp, "
                      "event_type string")
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", 1).parquet(path))
    out = window_counts_stream(stream, window="1 hour",
                               watermark="1 minute",
                               group_col="event_type")
    q = (out.writeStream.format("memory").queryName("t_win")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.window_start_ms, r.event_type, r.n_events)
           for r in spark.sql("select * from t_win").collect()
           if r.event_type != "tz"}
    want = {(r.window_start_ms, r.event_type, r.n_events)
            for r in window_counts(df, window="1 hour",
                                   group_col="event_type").collect()}
    assert got == want and len(want) > 4


def test_group_topk(spark):
    from boon_spark.operators.cleaning import group_topk
    agg = spark.createDataFrame(
        [("a", 1, 5), ("a", 2, 5), ("a", 3, 9), ("a", 4, 1),
         ("b", 7, 2)],
        "g string, token bigint, n bigint")
    out = [(r.g, r.rank, r.token)
           for r in group_topk(agg, 2, group_col="g")
           .orderBy("g", "rank").collect()]
    # ties on n=5 break by ascending token
    assert out == [("a", 1, 3), ("a", 2, 1), ("b", 1, 7)]
    with pytest.raises(ValueError, match=r"k must be"):
        group_topk(agg, 0, group_col="g")


def test_pre_epoch_events_floor_align(spark):
    # pmod, not %: a truncating modulo would put a 1969 event in a
    # window STARTING AFTER it (and diverge from native F.window)
    df = _frame(spark, [(1, 1, "1969-12-31 23:30:00")])
    r = window_counts(df, window="1 hour").first()
    assert r.window_start_ms == -3_600_000 and r.n_events == 1


def test_window_counts_stream_accepts_ntz(spark, tmp_path):
    # events-table timestamps are TIMESTAMP_NTZ; the stream projection
    # must localize window.start like batch _epoch_ms (regression:
    # unix_millis rejects NTZ)
    from boon_spark.streaming.windows_stream import window_counts_stream
    src = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00")], "event_id bigint, ts string") \
        .withColumn("ts", F.expr("to_timestamp_ntz(ts)"))
    path = str(tmp_path / "ntz_in")
    src.coalesce(1).write.parquet(path + "/p1")
    spark.createDataFrame([(9, "2024-02-01 00:00:00")],
                          "event_id bigint, ts string") \
        .withColumn("ts", F.expr("to_timestamp_ntz(ts)")) \
        .coalesce(1).write.parquet(path + "/p2")
    stream = (spark.readStream
              .schema("event_id bigint, ts timestamp_ntz")
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", 1).parquet(path))
    out = window_counts_stream(stream, window="1 hour",
                               watermark="1 minute")
    q = (out.writeStream.format("memory").queryName("t_ntz")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {(r.window_start_ms, r.n_events)
            for r in spark.sql("select * from t_ntz").collect()}
    want = {(r.window_start_ms, r.n_events)
            for r in window_counts(src, window="1 hour").collect()}
    assert want <= rows and len(want) == 1
