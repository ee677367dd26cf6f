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
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "first_id string, n long"
OUTPUT_SCHEMA = ("doc_id string, band int, key long, first_id string, "
                 "n_prior long")


def _horizon_ms(watermark: str) -> int:
    qty, unit = watermark.split()
    mult = {"millisecond": 1, "milliseconds": 1,
            "second": 1_000, "seconds": 1_000,
            "minute": 60_000, "minutes": 60_000,
            "hour": 3_600_000, "hours": 3_600_000,
            "day": 86_400_000, "days": 86_400_000}[unit]
    return int(qty) * mult


def make_collider(horizon_ms: int):
    """The per-band-key stateful function, exposed for direct unit
    testing of the state/timeout contract."""

    def collide(key, pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # watermark passed the key's horizon: drop the entry — the
            # state store stays bounded by keys seen within the horizon
            state.remove()
            return
        band, bkey = key
        rows = pd.concat(list(pdfs), ignore_index=True)
        # event-time order within the batch so "first" is deterministic
        rows = rows.sort_values(["ts", "_id"], kind="mergesort")
        if state.exists:
            first_id, n = state.get
        else:
            first_id, n = None, 0
        out = []
        max_ts = None
        for doc_id, ts in zip(rows["_id"], rows["ts"]):
            if first_id is None:
                first_id = doc_id
            elif doc_id != first_id:
                out.append({"doc_id": doc_id, "band": band, "key": bkey,
                            "first_id": first_id, "n_prior": n})
            n += 1
            max_ts = ts
        state.update((first_id, n))
        if max_ts is not None:
            state.setTimeoutTimestamp(
                int(max_ts.timestamp() * 1000) + horizon_ms)
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
    banded = banded.withColumnRenamed(ts_col, "ts") \
        .withWatermark("ts", watermark)
    return (banded.groupBy("band", "key")
            .applyInPandasWithState(
                make_collider(_horizon_ms(watermark)),
                OUTPUT_SCHEMA, STATE_SCHEMA,
                "append", GroupStateTimeout.EventTimeTimeout))
