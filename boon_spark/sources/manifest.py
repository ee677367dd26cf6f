"""Resumable per-partition validation with a lineage manifest.

The north_rule requires: per-partition pass/fail verdicts + violation rows,
"checkpointing validated-partition lineage and metrics to a resumable
manifest so reruns skip completed partitions".  boon has no analogue
(single-instance validation) — this is the genuinely new engineering of
SURVEY.md §7 step 5.

Design (scale-first):

* ONE Spark job validates every *pending* partition: completed partitions
  are excluded with a partition-column filter, which Catalyst pushes into
  the scan (partition pruning on Iceberg/hive-layout tables — skipped
  partitions are never read, not read-and-dropped);
* per-partition metrics come from a single ``groupBy(partition_col)`` over
  the annotated frame (map-side combine; partition count is small);
* violations land under ``violations_path`` partitioned by the same
  column, so each partition's output is independently replaceable
  (``partitionOverwriteMode=dynamic``);
* the manifest itself is one tiny parquet file per completed partition,
  written atomically (tmp + rename) on the driver with pyarrow — no Spark
  job, no read-modify-write races, append-only lineage;
* a manifest entry records the **spec hash**: rerunning with a changed
  constraint suite invalidates prior completions automatically.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def spec_hash(spec) -> str:
    return hashlib.sha256(
        json.dumps(spec, sort_keys=True, default=str).encode()).hexdigest()[:16]


class ValidationManifest:
    """Append-only lineage of validated partitions."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    @staticmethod
    def _is_entry(fname: str) -> bool:
        # dotfiles are in-progress temp writes: a crash between write and
        # rename must never leave a truncated file that entries() then
        # chokes on forever
        return fname.endswith(".parquet") and not fname.startswith(".")

    def entries(self) -> list[dict]:
        import pyarrow.parquet as pq
        out = []
        for f in sorted(os.listdir(self.path)):
            if self._is_entry(f):
                out.extend(pq.read_table(
                    os.path.join(self.path, f)).to_pylist())
        return out

    def completed(self, shash: str) -> set[str]:
        return {e["partition"] for e in self.entries()
                if e["status"] == "complete" and e["spec_hash"] == shash}

    def record(self, partition: str, shash: str, metrics: dict) -> str:
        import pyarrow as pa
        import pyarrow.parquet as pq
        row = {
            "partition": str(partition),
            "status": "complete",
            "spec_hash": shash,
            "n_rows": int(metrics.get("n_rows", 0)),
            "n_invalid": int(metrics.get("n_invalid", 0)),
            "n_violations": int(metrics.get("n_violations", 0)),
            "valid": bool(metrics.get("valid", False)),
            # last streaming micro-batch applied to this entry (-1 for
            # batch jobs): foreachBatch replays after a crash re-deliver
            # the same batch_id, and the streaming bridge uses this to
            # skip re-accumulating an already-applied batch
            "batch_id": int(metrics.get("batch_id", -1)),
            # the streaming run that applied that batch: batch ids are
            # per-checkpoint, so replay detection keys on (run, batch) —
            # a fresh checkpoint's batch 0 is new work, not a replay
            "run_id": str(metrics.get("run_id", "")),
            "finished_at": time.time(),
        }
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}")
        final = os.path.join(
            self.path, f"{_safe(partition)}-{uuid.uuid4().hex[:8]}.parquet")
        pq.write_table(pa.Table.from_pylist([row]), tmp)
        os.rename(tmp, final)  # atomic on POSIX
        return os.path.basename(final)

    def invalidate(self, partition: str, *,
                   keep: Optional[str] = None) -> None:
        """Drop lineage for one partition (forces recompute on next run).

        Candidate files are pre-filtered by the ``_safe(partition)-``
        filename prefix ``record`` always writes, then confirmed by
        content (``_safe`` is lossy, so two partitions can share a
        prefix) — without the filter each invalidate reads EVERY entry
        file, which is O(total partitions) driver parquet reads per
        call on a long-lived manifest.  ``keep`` skips one filename:
        the replace path records the new entry FIRST, then removes the
        old ones, so a crash between the two leaves an extra stale
        entry (cleaned up on the partition's next touch) rather than a
        missing one (which would lose the cumulative counts a replayed
        streaming batch needs)."""
        import pyarrow.parquet as pq
        pref = f"{_safe(partition)}-"
        for f in list(os.listdir(self.path)):
            if not self._is_entry(f) or not f.startswith(pref) \
                    or f == keep:
                continue
            p = os.path.join(self.path, f)
            rows = pq.read_table(p).to_pylist()
            if any(str(r["partition"]) == str(partition) for r in rows):
                os.remove(p)


NULL_PARTITION = "__null__"


def partition_key_col(partition_col: str):
    """THE manifest partition-key expression: Spark cast-to-string with
    the ``__null__`` sentinel for SQL NULL.  Every reader and writer of
    manifest keys must derive them through this one helper — a drifted
    copy (e.g. Python ``str()`` producing "None"/"True" where the
    manifest holds "__null__"/"true") makes a re-seen partition look
    permanently complete and silently skips its rows."""
    return F.coalesce(F.col(partition_col).cast("string"),
                      F.lit(NULL_PARTITION))


def collect_partition_rows(df: DataFrame, partition_col: str,
                           max_partitions: int) -> list:
    """Distinct ``(_v = native value, _p = manifest key)`` rows of a
    frame, with the loud high-cardinality guard (the driver-side
    collect a ``doc_id`` partition column would otherwise OOM).  Shared
    by :func:`validate_partitioned` and the streaming bridge so each
    micro-batch pays this scan ONCE."""
    rows = (df.select(F.col(partition_col).alias("_v"),
                      partition_key_col(partition_col).alias("_p"))
            .distinct().limit(max_partitions + 1).collect())
    if len(rows) > max_partitions:
        raise ValueError(
            f"partition column {partition_col!r} has more than "
            f"{max_partitions} distinct values — not a partition column; "
            f"pick a coarser column or raise max_partitions")
    return rows


def _safe(s) -> str:
    return "".join(c if c.isalnum() or c in "-_." else "_" for c in str(s))


def _remove_stale_violations(violations_path: str, partition_col: str,
                             pending: set) -> None:
    """Delete existing violation output dirs for partitions about to be
    re-validated — dynamic partition overwrite never touches a partition
    that produces ZERO rows, so a now-clean partition would otherwise
    keep its stale violation files forever.  Local-filesystem best
    effort (object-store paths are left to the overwrite)."""
    import shutil
    from urllib.parse import unquote

    if not os.path.isdir(violations_path):
        return
    prefix = f"{partition_col}="
    for d in os.listdir(violations_path):
        if not d.startswith(prefix):
            continue
        val = unquote(d[len(prefix):])
        key = NULL_PARTITION if val == "__HIVE_DEFAULT_PARTITION__" else val
        if key in pending:
            shutil.rmtree(os.path.join(violations_path, d),
                          ignore_errors=True)


def validate_partitioned(spark: SparkSession, df: DataFrame, spec,
                         partition_col: str, manifest_path: str, *,
                         violations_path: Optional[str] = None,
                         row_id: Optional[str] = None,
                         max_partitions: int = 100_000,
                         violations_mode: str = "overwrite",
                         resources: Optional[dict] = None,
                         loader=None, assert_format: bool = False,
                         assert_content: bool = False,
                         default_draft=None,
                         partition_rows: Optional[list] = None,
                         force_pending: Optional[set] = None,
                         metrics_transform=None,
                         violations_batch: Optional[str] = None,
                         replace_entries: bool = False) -> dict:
    """Validate all pending partitions of ``df`` in one job; returns
    ``{"pending": [...], "skipped": [...], "metrics": {partition: {...}}}``.

    Rerunning after a partial failure (or after
    ``ValidationManifest.invalidate(p)``) recomputes only the partitions
    without a matching manifest entry.

    ``max_partitions`` guards the driver-side collect of distinct
    partition values: a manifest keyed by a high-cardinality column
    (someone passing ``doc_id``) would otherwise OOM the driver and
    produce a useless million-entry manifest — fail loudly instead.

    The streaming bridge's hooks (batch callers can ignore all five):

    * ``partition_rows`` — pre-collected :func:`collect_partition_rows`
      output, so a micro-batch is not re-scanned for keys the handler
      already collected;
    * ``force_pending`` — validate exactly these partition keys instead
      of consulting ``manifest.completed`` (replay detection happens in
      the handler against (run_id, batch_id) stamps; the entries are NOT
      pre-invalidated, so a crash mid-handler cannot lose the prior
      cumulative counts);
    * ``metrics_transform(partition, metrics) -> metrics`` — applied
      before each entry is recorded (the handler merges prior cumulative
      counts and stamps the (run_id, batch_id) pair HERE, atomically
      with the entry write — stamping in a second pass left a crash
      window where counts were written unstamped and a replay
      double-applied the batch);
    * ``violations_batch`` — adds a ``_vbatch`` literal column and
      partitions violations by (partition_col, _vbatch) with DYNAMIC
      overwrite: a replayed batch rewrites exactly its own
      (partition, batch) output instead of appending duplicates —
      violations become idempotent under foreachBatch redelivery;
    * ``replace_entries`` — after recording a partition's entry, remove
      that partition's OLDER entry files (new-then-remove: a crash
      between the two leaves a stale extra entry, cleaned on next touch,
      never a missing one).
    """
    from ..engine import Engine

    shash = spec_hash(spec)
    manifest = ValidationManifest(manifest_path)

    # NULL partition values get a sentinel key so they are validated and
    # recorded like any other partition (isin() never matches SQL NULL).
    # The RAW value is collected alongside the string key: the pruning
    # filter must compare the column in its NATIVE type — an isin over
    # cast-to-string does not convert to an Iceberg/hive partition
    # predicate, so "skipped" partitions would be scanned and discarded
    # row-by-row instead of pruned.
    vrows = partition_rows if partition_rows is not None else \
        collect_partition_rows(df, partition_col, max_partitions)
    # a string key can collect SEVERAL distinct native values (e.g.
    # decimal scale variants rendering to the same text): keep them ALL —
    # dropping one would leave its rows unvalidated while the partition
    # key is recorded complete
    raw_of: dict[str, list] = {}
    for r in vrows:
        raw_of.setdefault(r._p, []).append(r._v)
    all_parts = list(raw_of)
    if force_pending is not None:
        pending = sorted(set(all_parts) & set(force_pending))
        skipped = sorted(set(all_parts) - set(force_pending))
    else:
        done = manifest.completed(shash)
        pending = sorted(set(all_parts) - done)
        skipped = sorted(set(all_parts) & done)
    if not pending:
        return {"pending": [], "skipped": skipped, "metrics": {}}

    # partition-pruning filter: completed partitions are never scanned
    # (native-typed `col IN (...)` + `IS NULL` both push to the scan)
    cond = F.col(partition_col).isin(
        [v for p in pending if p != NULL_PARTITION for v in raw_of[p]])
    if NULL_PARTITION in pending:
        cond = cond | F.col(partition_col).isNull()
    sub = df.filter(cond)
    eng = Engine.from_schema(spec, row_id=row_id,
                             resources=resources, loader=loader,
                             assert_format=assert_format,
                             assert_content=assert_content,
                             default_draft=default_draft)
    ann = eng.annotate(sub)

    if violations_path:
        if violations_mode == "overwrite" and violations_batch is None:
            # dynamic overwrite only touches partitions that produce
            # rows — a re-validated partition that is now CLEAN would
            # keep its stale violation files, so pending partitions' old
            # output is removed first (local-fs best effort; on object
            # stores, downstream reads should treat the MANIFEST as the
            # verdict source of truth)
            _remove_stale_violations(violations_path, partition_col,
                                     set(pending))
        # explode_outer + null filter prunes passing rows (empty arrays)
        # without the inferred-filter pushdown blowup (engine.violations)
        vio = (ann.select(partition_col,
                          F.explode_outer("violations").alias("v"))
               .filter(F.col("v").isNotNull())
               .select(partition_col, "v.instance_location",
                       "v.keyword_location", "v.error"))
        if violations_batch is not None:
            # per-(partition, batch) layout: a foreachBatch replay
            # dynamically overwrites exactly its own output dirs (a
            # deterministic batch re-produces the same rows), never
            # appends duplicates and never touches earlier batches
            (vio.withColumn("_vbatch", F.lit(violations_batch))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(partition_col, "_vbatch")
                .parquet(violations_path))
        else:
            (vio.write.mode("overwrite" if violations_mode == "overwrite"
                            else "append")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(partition_col)
                .parquet(violations_path))

    rows = (ann.groupBy(partition_key_col(partition_col).alias("_p"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum((~F.col("valid")).cast("long")).alias("n_invalid"),
                 F.sum("violation_count").alias("n_violations"),
                 F.min(F.col("valid").cast("int")).alias("_all_valid"))
            .collect())
    metrics = {}
    for r in rows:
        m = {"n_rows": r.n_rows, "n_invalid": r.n_invalid,
             "n_violations": r.n_violations, "valid": bool(r._all_valid)}
        if metrics_transform is not None:
            m = metrics_transform(r._p, m)
        fname = manifest.record(r._p, shash, m)
        if replace_entries:
            manifest.invalidate(r._p, keep=fname)
        metrics[r._p] = m
    return {"pending": pending, "skipped": skipped, "metrics": metrics}
