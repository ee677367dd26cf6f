"""Streaming near-duplicate detection — the cross-batch analogue of
``operators.dedup.minhash_lsh_pairs``.

Each arriving document is shingled and MinHash-banded with the SAME
pipeline as the batch operator (``_minhash_banded``), then its band keys
flow into a custom stateful operator (``applyInPandasWithState``): state
is one ``(first_id, n)`` entry per band key inside the watermark
horizon, and every later document hitting a known key is emitted as a
collision against the key's FIRST document.  A document colliding on ≥1
band is a near-dup candidate (same candidate rule as the batch bucket
join); exact-Jaccard verification of candidates is a batch-side join by
construction (the stream no longer holds the first document's text).

Scale/state design for 10^12 docs/day:

* state is per BAND KEY, not per document — ``(16-byte key, first_id,
  count)`` — and is EVICTED by an event-time timeout one watermark
  horizon after the key's last arrival (boundless band-key state is the
  same OOM shape the exact ``dedup_stream`` avoids via
  ``dropDuplicatesWithinWatermark``);
* the shuffle carries ``(doc_id, band, key, ts)`` rows only — never
  shingle arrays or text (the batch band-exchange rule, pinned there);
* emissions are per (colliding doc, band); downstream dedup to pairs is
  a stateless ``dropDuplicates`` within any bounded window the consumer
  chooses.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "first_id string, n long, timeout_ms long"
OUTPUT_SCHEMA = ("doc_id string, band int, key long, first_id string, "
                 "n_prior long")


def _horizon_ms(watermark: str) -> int:
    """Milliseconds of a Spark interval string — delegated to
    ``pd.Timedelta``, which parses the same compound/abbreviated forms
    ``withWatermark`` accepts ("1 hour 30 minutes", "10 min", "250 ms");
    a clear message (not an unpacking error) otherwise."""
    try:
        ms = int(pd.Timedelta(watermark).total_seconds() * 1000)
    except ValueError as e:
        raise ValueError(
            f"cannot parse watermark interval {watermark!r}: {e}") from e
    if ms <= 0:
        raise ValueError(
            f"watermark interval must be positive, got {watermark!r}")
    return ms


def make_collider(horizon_ms: int, session_tz: str = "UTC"):
    """The per-band-key stateful function, exposed for direct unit
    testing of the state/timeout contract.

    Timeout bookkeeping has two traps this handles explicitly:

    * Arrow hands event times to pandas tz-NAIVE **in the session
      timezone** — a bare ``.timestamp()`` would read them as UTC,
      mis-setting the timeout by the tz offset (aborting the query west
      of UTC where the target lands below the watermark, leaking state
      east of it).  The batch max is localized to ``session_tz`` first
      (``ambiguous=False`` pins the DST fold hour to standard time —
      deterministic, ≤1h conservative during the fold);
    * a late-but-within-horizon batch must not move eviction BACKWARD,
      so the timeout target is stored in state and only ever advances
      (and the engine requires it to exceed the current watermark).
    """

    def collide(key, pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed the key's horizon: drop the entry — the
            # state store stays bounded by keys seen within the horizon
            state.remove()
            return
        band, bkey = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        # defense in depth: the engine filters NULL event times before
        # the stateful operator (a NULL ts has no place in a watermarked
        # horizon), but a direct caller's NaT would otherwise reach
        # .timestamp() below and ABORT the whole query
        rows = rows.dropna(subset=["ts"])
        if rows.empty:
            return  # any previously-armed timeout stays in force
        # event-time order within the batch so "first" is deterministic
        rows = rows.sort_values(["ts", "_id"], kind="mergesort")
        if state.exists:
            first_id, n, prev_timeout = state.get
            # an EventTimeTimeout only fires in a trigger where the key
            # has NO new data — a key whose horizon the watermark has
            # already passed but that receives a row in this very
            # trigger would otherwise collide against logically-expired
            # state.  Honor the horizon semantics directly: expired
            # state resets before processing.
            if prev_timeout and state.getCurrentWatermarkMs() > prev_timeout:
                first_id, n = None, 0
        else:
            first_id, n, prev_timeout = None, 0, 0
        out = []
        for doc_id in rows["_id"]:
            if first_id is None:
                first_id = doc_id
            elif doc_id != first_id:
                out.append({"doc_id": doc_id, "band": band, "key": bkey,
                            "first_id": first_id, "n_prior": n})
            n += 1
        max_ts = pd.Timestamp(rows["ts"].max())
        if max_ts.tzinfo is None:
            max_ts = max_ts.tz_localize(session_tz, ambiguous=False,
                                        nonexistent="shift_forward")
        target = max(prev_timeout,
                     int(max_ts.timestamp() * 1000) + horizon_ms,
                     state.getCurrentWatermarkMs() + 1)
        state.update((first_id, n, target))
        state.setTimeoutTimestamp(target)
        if out:
            yield pd.DataFrame(out)

    return collide


def near_dup_stream(stream_df: DataFrame, *, text_col: str = "text",
                    id_col: str = "doc_id", ts_col: str = "ts",
                    watermark: str = "10 minutes",
                    num_hashes: int = 16, bands: int = 4,
                    shingle_n: int = 3,
                    hash_family: str = "xxhash64") -> DataFrame:
    """Streaming MinHash band-collision candidates:
    ``(doc_id, band, key, first_id, n_prior)`` rows, one per band a
    document shares with an earlier document inside the watermark
    horizon.  Banding is byte-identical to the batch
    :func:`~boon_spark.operators.dedup.minhash_lsh_pairs` (shared
    ``_minhash_banded``)."""
    from ..operators.dedup import _minhash_banded

    _sig, banded = _minhash_banded(
        stream_df, text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
        hash_family=hash_family, passthrough=(ts_col,))
    # OUTPUT_SCHEMA/STATE_SCHEMA declare the ids as string — cast here so
    # a non-string id_col (bigint doc ids) doesn't die with an Arrow type
    # error inside applyInPandasWithState (ADVICE r4; contamination_stream
    # casts the same way)
    banded = (banded.withColumn("_id", F.col("_id").cast("string"))
              .withColumnRenamed(ts_col, "ts")
              # a NULL event time passes the watermark predicate (NULL <
              # wm is NULL, row kept) and would reach the collider as
              # NaT, where .timestamp() raises and kills the query — one
              # malformed row must not abort the stream (r5 review)
              .filter(F.col("ts").isNotNull())
              .withWatermark("ts", watermark))
    session_tz = stream_df.sparkSession.conf.get(
        "spark.sql.session.timeZone")
    return (banded.groupBy("band", "key")
            .applyInPandasWithState(
                make_collider(_horizon_ms(watermark), session_tz),
                OUTPUT_SCHEMA, STATE_SCHEMA,
                "append", GroupStateTimeout.EventTimeTimeout))
