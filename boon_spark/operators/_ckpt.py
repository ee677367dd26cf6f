"""Lazy local-checkpoint pinning for twice-consumed intermediate frames.

The repo's r5 law: no ReusedExchange forms across a broadcast boundary,
so a frame with several consumers must be materialized once.  Rounds
5–6 used ``persist()``; round 7 measured that a LAZY ``localCheckpoint``
is strictly better for the count/posting-sized intermediates here:

- the checkpoint captures the frame AFTER AQE's partition coalescing,
  so downstream stages run at the size-appropriate partition count —
  a persisted plan instead pins the raw shuffle partitioning
  (``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning`` is
  false by default), which at bench scale meant 64-task stages over
  kilobyte frames (measured: pmi's scoring phase 3.3 s persisted vs
  0.5 s checkpointed);
- the logical plan truncates to a ``LogicalRDD``, so every downstream
  analysis/optimization pass stops re-walking the upstream tree.

Trade (documented, deliberate — same call ``connected_components`` has
made since r6): a local checkpoint is not lineage-recoverable.  On
executor loss the query fails and retries from the source instead of
recomputing the lost blocks — acceptable for intra-query intermediates;
pass-through ``persist`` remains the right tool for frames that must
survive executor churn mid-query on a long job.

``release()`` frees the blocks NOW: ``DataFrame.unpersist()`` is a
CacheManager no-op for a checkpointed frame (its blocks are RDD-level
cache behind the ``LogicalRDD`` node — the measured r6 finding in
``clusters._release_checkpoint``), so release goes through the RDD.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["pin", "release"]


def pin(df: DataFrame) -> DataFrame:
    """Lazily local-checkpoint ``df``: the first action materializes it
    once (with AQE-final partitioning and truncated lineage); every
    later consumer reads the materialized blocks."""
    return df.localCheckpoint(eager=False)


def release(df: DataFrame) -> None:
    """Free a pinned frame's storage blocks immediately (RDD-level;
    falls back to the DataFrame call for plain persisted frames)."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith(".LogicalRDD"):
            plan.rdd().unpersist(False)
            return
    except Exception:
        pass
    df.unpersist()
