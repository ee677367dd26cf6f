"""Gap-based sessionization (operators/sessions.py +
streaming/sessions_stream.py).

The DuckDB oracle gate (`sessions` in test_oracle_parity) pins
cross-engine bit-exactness at sf0.01; this file pins the semantics on
crafted frames (boundaries, tie-breaks, NULL times), the one-exchange
plan shape, the stateful function's open/close/timeout contract, and
streaming == batch parity for in-order delivery.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from boon_spark.operators.sessions import (gap_ms_of, session_stats,
                                           sessionize)

DDL = "event_id bigint, user_id bigint, ts string"


def _frame(spark, rows):
    return (spark.createDataFrame(rows, DDL)
            .withColumn("ts", F.to_timestamp("ts")))


def test_session_boundaries_and_ties(spark):
    df = _frame(spark, [
        # user 1: two sessions split by a 2h silence (gap=1h)
        (1, 1, "2024-01-01 00:00:00"),
        (2, 1, "2024-01-01 00:30:00"),
        (3, 1, "2024-01-01 02:31:00"),
        # exactly gap is NOT a split (strict >)
        (4, 1, "2024-01-01 03:31:00"),
        # user 2: same timestamps -> ordered by event_id, one session
        (6, 2, "2024-01-01 00:00:00"),
        (5, 2, "2024-01-01 00:00:00"),
    ])
    out = sessionize(df, gap="1 hour").orderBy("user_id", "session_idx",
                                               "event_id").collect()
    by = {(r.user_id, r.event_id): r.session_idx for r in out}
    assert by[(1, 1)] == 1 and by[(1, 2)] == 1
    assert by[(1, 3)] == 2 and by[(1, 4)] == 2
    assert by[(2, 5)] == 1 and by[(2, 6)] == 1
    stats = {(r.user_id, r.session_idx): r
             for r in session_stats(df, gap="1 hour").collect()}
    s11 = stats[(1, 1)]
    assert s11.n_events == 2 and s11.duration_ms == 30 * 60_000
    assert stats[(2, 1)].n_events == 2
    assert stats[(2, 1)].duration_ms == 0


def test_null_event_times_are_excluded(spark):
    df = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:00"), (2, 1, None)], DDL) \
        .withColumn("ts", F.to_timestamp("ts"))
    out = sessionize(df, gap="1 hour").collect()
    assert [r.event_id for r in out] == [1]


def test_gap_parsing(spark):
    assert gap_ms_of("12 hours") == 12 * 3600_000
    assert gap_ms_of(500) == 500
    with pytest.raises(ValueError, match=r"gap must be positive"):
        gap_ms_of(0)
    with pytest.raises(ValueError, match=r"cannot parse gap"):
        gap_ms_of("one eternity")


def test_session_stats_plan_single_exchange(spark):
    """sessionize + stats = ONE user-hash exchange: the second window
    rides the first's partitioning/ordering and the (user, session_idx)
    aggregation is satisfied by user-hash clustering."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = session_stats(ev, gap="12 hours") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Sort ") == 1, plan


class FakeState:
    def __init__(self, value=None, watermark_ms=0, timed_out=False):
        self._v, self.exists = value, value is not None
        self.hasTimedOut = timed_out
        self._wm = watermark_ms
        self.removed, self.timeout_ms = False, None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v, self.exists = v, True

    def remove(self):
        self.removed, self.exists = True, False

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms

    def getCurrentWatermarkMs(self):
        return self._wm


def _pdf(rows):
    return pd.DataFrame(rows, columns=["_eid", "ts"]).assign(
        ts=lambda d: pd.to_datetime(d["ts"]))


def test_sessionizer_open_close_timeout():
    from boon_spark.streaming.sessions_stream import make_sessionizer
    fn = make_sessionizer(3600_000, "UTC")
    st = FakeState()
    # batch 1: two events 10 min apart -> one open session, no output
    out = list(fn(("u1",), iter([_pdf([
        (1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:10:00")])]), st))
    assert out == [] and st.exists
    start, last, n, target = st._v
    assert n == 2 and last - start == 600_000
    assert st.timeout_ms == target == last + 3600_000 + 1
    # batch 2: a 2h-later event closes the open session inline
    out = list(fn(("u1",), iter([_pdf([(3, "2024-01-01 02:30:00")])]), st))
    assert len(out) == 1
    closed = out[0].iloc[0]
    assert closed["n_events"] == 2 and closed["end_ms"] - \
        closed["start_ms"] == 600_000
    assert st._v[2] == 1  # the new open session holds one event
    # timeout trigger: open session emitted, state removed
    st2 = FakeState(value=st._v, timed_out=True)
    out = list(fn(("u1",), iter([]), st2))
    assert len(out) == 1 and out[0].iloc[0]["n_events"] == 1
    assert st2.removed


def test_sessionizer_expired_state_resets_inline():
    from boon_spark.streaming.sessions_stream import make_sessionizer
    fn = make_sessionizer(1000, "UTC")
    base = int(pd.Timestamp("2024-01-01", tz="UTC").timestamp() * 1000)
    # state closed at base+2001, watermark far past it, new data arrives
    st = FakeState(value=(base, base + 1000, 2, base + 2001),
                   watermark_ms=base + 10_000)
    out = list(fn(("u1",), iter([_pdf([(9, "2024-01-01 00:00:20")])]), st))
    assert len(out) == 1  # the expired session is emitted inline
    assert out[0].iloc[0]["n_events"] == 2
    assert st._v[2] == 1  # fresh session for the new event


def test_sessions_stream_matches_batch(spark, tmp_path):
    """In-order delivery across micro-batches -> emitted sessions equal
    batch session_stats exactly on (user, start, end, n_events)."""
    from boon_spark.streaming.sessions_stream import sessions_stream
    rows = []
    eid = 0
    for u in (1, 2, 3):
        t = pd.Timestamp("2024-01-01 00:00:00") + pd.Timedelta(minutes=u)
        for s in range(3):           # 3 sessions per user
            for k in range(2 + s):   # 2..4 events per session
                rows.append((eid, u, str(t)))
                eid += 1
                t += pd.Timedelta(minutes=10)
            t += pd.Timedelta(hours=3)  # silence > gap
    df = _frame(spark, rows)
    # one parquet file per event-time third, fed one per trigger
    path = str(tmp_path / "sess_in")
    cut1 = pd.Timestamp("2024-01-01 04:00:00")
    cut2 = pd.Timestamp("2024-01-01 08:00:00")
    df.filter(F.col("ts") < F.lit(cut1)) \
        .coalesce(1).write.parquet(path + "/p1")
    df.filter((F.col("ts") >= F.lit(cut1)) & (F.col("ts") < F.lit(cut2))) \
        .coalesce(1).write.parquet(path + "/p2")
    df.filter(F.col("ts") >= F.lit(cut2)) \
        .coalesce(1).write.parquet(path + "/p3")
    # flush sentinel: a far-future event for a dummy user advances the
    # watermark past every real session's close
    _frame(spark, [(999, 99, "2024-02-01 00:00:00")]) \
        .coalesce(1).write.parquet(path + "/p4")
    stream = (spark.readStream
              .schema("event_id bigint, user_id bigint, ts timestamp")
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", 1).parquet(path))
    out = sessions_stream(stream, gap="1 hour", watermark="1 minute")
    q = (out.writeStream.format("memory").queryName("t_sess")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(int(r.user_id), r.start_ms, r.end_ms, r.n_events)
           for r in spark.sql("select * from t_sess").collect()}
    want = {(r.user_id, r.start_ms, r.end_ms, r.n_events)
            for r in session_stats(df, gap="1 hour").collect()}
    assert got == want and len(want) == 9
