"""Per-partition / per-group column statistics — boon's
``minimum``/``maximum``/``required``/``uniqueItems`` semantics
(reference ``src/validator.rs:520-536,214-219,351-356``) lifted to
column-level metrics (SURVEY.md §2.6).

Everything is a single ``groupBy().agg()`` with map-side partial
aggregation; ``approx_count_distinct`` is Spark's built-in HyperLogLog++
(relative sd configurable), so the distinct estimate never shuffles raw
values — only fixed-size sketches.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_stats(df: DataFrame, columns: Sequence[str], *,
                 by: Optional[Sequence[str]] = None,
                 rsd: float = 0.05,
                 exact_distinct: bool = False) -> DataFrame:
    """One row per group with min/max/null_rate/approx-distinct per column.

    Output columns: ``<col>_min, <col>_max, <col>_null_rate,
    <col>_distinct`` plus ``n_rows``.  ``exact_distinct=True`` swaps HLL
    for an exact count (used by the DuckDB-oracle tests; HLL in prod).
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        col = F.col(c)
        aggs += [
            F.min(col).alias(f"{c}_min"),
            F.max(col).alias(f"{c}_max"),
            F.avg(col.isNull().cast("double")).alias(f"{c}_null_rate"),
            (F.countDistinct(col) if exact_distinct
             else F.approx_count_distinct(col, rsd)).alias(f"{c}_distinct"),
        ]
    if by:
        return df.groupBy(*by).agg(*aggs)
    return df.agg(*aggs)


def partition_stats(df: DataFrame, columns: Sequence[str],
                    **kw) -> DataFrame:
    """Stats keyed by physical partition id — the per-partition verdict
    building block (SURVEY.md §7 step 5)."""
    return column_stats(
        df.withColumn("_pid", F.spark_partition_id()),
        columns, by=["_pid"], **kw)
