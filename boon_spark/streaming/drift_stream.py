"""Streaming distribution drift: per-key CUMULATIVE histograms across
micro-batches with a running PSI against a fixed reference distribution.

The streaming analogue of :mod:`..operators.drift` (the north-star's
"distribution-drift via chunked KS/PSI on n_tok histograms"): batch
drift compares two static tables; here the observed side accumulates
forever through a custom stateful operator (``applyInPandasWithState``,
Arrow batches, state = one count vector per key — O(keys × buckets), a
few KB per source).  Bucketing runs JVM-side via ``width_bucket`` with
the exact semantics of :func:`..operators.drift.histogram`, so the
running PSI converges to the batch PSI over the same rows (pinned by
test_streaming_drift).

boon has no streaming surface — this is Spark-native scope from
SURVEY.md §2.6/§streaming.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.drift import histogram

DRIFT_OUTPUT = ("key string, batch_rows long, n_total long, "
                "psi double, drifted boolean")
DRIFT_STATE = "counts array<long>"


def reference_probs(ref_df: DataFrame, value_col: str, *, lo: float,
                    hi: float, buckets: int) -> list:
    """Bucket probabilities of the reference table (length buckets+2:
    underflow bucket 0, overflow bucket buckets+1) — computed once on
    the driver; the histogram itself is buckets+2 rows regardless of
    table size."""
    rows = histogram(ref_df, value_col, lo, hi, buckets).collect()
    counts = [0] * (buckets + 2)
    for r in rows:
        counts[int(r.bucket)] = int(r.cnt)
    n = sum(counts)
    if n == 0:
        raise ValueError("reference table has no non-null values "
                         f"in {value_col!r}")
    return [c / n for c in counts]


def make_drift_updater(nb: int, ref: list, psi_threshold: float,
                       eps: float, dead_after: str | None):
    """The per-key stateful function, exposed for direct unit testing.

    Dead-input detection: with ``applyInPandasWithState`` the data path
    only ever runs for keys WITH rows in the trigger (so ``n >= 1`` and
    psi is always computable there — a "no rows yet" arm in the data
    path would be unreachable, r5 review).  A key that goes SILENT is
    caught by a processing-time timeout instead: after ``dead_after``
    without data the key emits ``(batch_rows=0, psi=NULL,
    drifted=true)`` — mirroring ``drift_check``'s NULL-metrics →
    ``valid=False`` rule — and the timeout re-arms, so a dead source
    keeps flagging once per interval until data resumes."""

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            counts = list(state.get[0]) if state.exists else [0] * nb
            yield pd.DataFrame([{
                "key": key[0], "batch_rows": 0,
                "n_total": sum(counts), "psi": None, "drifted": True}])
            if dead_after:
                state.setTimeoutDuration(dead_after)
            return
        counts = list(state.get[0]) if state.exists else [0] * nb
        batch_rows = 0
        for pdf in pdfs:
            batch_rows += len(pdf)
            vc = pdf["bucket"].value_counts()
            for bucket, cnt in vc.items():
                i = int(bucket)
                if 0 <= i < nb:
                    counts[i] += int(cnt)
        state.update((counts,))
        if dead_after:
            state.setTimeoutDuration(dead_after)
        n = sum(counts)
        psi = 0.0
        for i in range(nb):
            po = counts[i] / n
            psi += (ref[i] - po) * math.log((ref[i] + eps) / (po + eps))
        yield pd.DataFrame([{
            "key": key[0], "batch_rows": batch_rows, "n_total": n,
            "psi": psi, "drifted": psi > psi_threshold}])

    return update


def streaming_drift(stream_df: DataFrame, *, value_col: str, key_col: str,
                    ref_probs: list, lo: float, hi: float, buckets: int,
                    psi_threshold: float = 0.2,
                    eps: float = 1e-6,
                    dead_after: str | None = None) -> DataFrame:
    """Per-``key_col`` running PSI of ``value_col`` against
    ``ref_probs`` (from :func:`reference_probs`), emitted every
    micro-batch.  PSI formula matches
    :func:`..operators.drift.drift_metrics`:
    ``sum((p_ref - p_obs) * log((p_ref+eps)/(p_obs+eps)))``.

    ``dead_after`` (e.g. ``"30 minutes"``) arms a processing-time
    timeout per key: a source that stops sending data is flagged
    ``drifted=true`` with ``psi=NULL`` once per interval (see
    :func:`make_drift_updater`); without it, silent keys simply stop
    emitting."""
    nb = buckets + 2
    if len(ref_probs) != nb:
        raise ValueError(f"ref_probs must have {nb} entries")

    b = F.width_bucket(F.col(value_col).cast("double"),
                       F.lit(float(lo)), F.lit(float(hi)), F.lit(buckets))
    base = (stream_df
            .select(F.col(key_col).cast("string").alias("_key"),
                    b.alias("bucket"))
            .filter(F.col("bucket").isNotNull()))
    update = make_drift_updater(nb, list(ref_probs), psi_threshold, eps,
                                dead_after)
    timeout = GroupStateTimeout.ProcessingTimeTimeout if dead_after \
        else GroupStateTimeout.NoTimeout
    return (base.groupBy("_key")
            .applyInPandasWithState(update, DRIFT_OUTPUT, DRIFT_STATE,
                                    "update", timeout))
