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


def value_quantiles(df: DataFrame, column: str,
                    qs: Sequence[float] = (0.25, 0.5, 0.75, 0.9, 0.99),
                    *, by: Optional[str] = None) -> DataFrame:
    """EXACT discrete quantiles for a bounded-cardinality column,
    scale-safely: ``(q_ppm, value)`` (plus the group column with
    ``by=``) where ``value`` is the smallest column value whose
    cumulative count reaches the quantile — SQL ``percentile_disc``
    semantics.

    Why not the built-ins, at 10^12 rows: ``percentile`` (exact)
    buffers every value per group in one aggregation state — the OOM
    shape; ``percentile_approx`` is scale-safe but approximate AND
    engine-specific (its KLL/GK sketch is not reproducible in DuckDB,
    so it can never be oracle-paired).  For columns with bounded
    distinct values (lengths, counts, scores, ages — the audit
    columns), the histogram route is exact and cheap: one
    ``groupBy(value).count`` whose shuffle carries only DISTINCT values
    (the boundedness contract), then a cumulative window over that tiny
    counts frame.

    The quantile test is integer-exact in any engine: value v is the
    q-quantile iff ``cum(v) * 1_000_000 >= q_ppm * N`` (qs are
    floored to ppm; int64-safe for N up to ~9.2e12 rows per group).
    NULLs are excluded (SQL aggregate semantics, both engines).
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    ppms = []
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantiles must be in (0, 1], got {q}")
        ppms.append(int(q * 1_000_000))
    from pyspark.sql import Window
    keys = [by] if by else []
    counts = (df.filter(F.col(column).isNotNull())
              .groupBy(*keys, F.col(column).alias("_v"))
              .agg(F.count(F.lit(1)).cast("long").alias("_n")))
    w = (Window.partitionBy(*keys) if keys else Window.partitionBy()) \
        .orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy(*keys) if keys else Window.partitionBy()
    cum = (counts.withColumn("_cum", F.sum("_n").over(w))
           .withColumn("_tot", F.sum("_n").over(wt)))
    qdf = df.sparkSession.createDataFrame(
        [(p,) for p in ppms], "q_ppm long")
    hit = (cum.crossJoin(F.broadcast(qdf))
           .filter(F.col("_cum") * F.lit(1_000_000)
                   >= F.col("q_ppm") * F.col("_tot"))
           .groupBy(*keys, "q_ppm")
           .agg(F.min("_v").alias("value")))
    return hit.select(*keys, "q_ppm", "value")


def value_quantiles_oracle_sql(column: str,
                               qs: Sequence[float] = (0.25, 0.5, 0.75,
                                                      0.9, 0.99),
                               *, by: Optional[str] = None,
                               table: str = "documents") -> str:
    """DuckDB query reproducing :func:`value_quantiles` bit-for-bit
    (same ppm flooring, same integer threshold test)."""
    ppms = ", ".join(f"({int(q * 1_000_000)})" for q in qs)
    key_sel = f"{by}, " if by else ""
    key_grp = f"{by}, " if by else ""
    part = f"PARTITION BY {by} " if by else ""
    return f"""
        WITH counts AS (
          SELECT {key_sel}{column} AS _v,
                 CAST(count(*) AS BIGINT) AS _n
          FROM {table} WHERE {column} IS NOT NULL
          GROUP BY {key_grp}{column}),
        cum AS (
          SELECT *,
                 CAST(sum(_n) OVER ({part}ORDER BY _v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS _cum,
                 CAST(sum(_n) OVER ({part.rstrip() or ''}) AS BIGINT)
                   AS _tot
          FROM counts),
        q(q_ppm) AS (VALUES {ppms})
        SELECT {key_sel}CAST(q_ppm AS BIGINT) AS q_ppm,
               min(_v) AS value
        FROM cum, q
        WHERE _cum * 1000000 >= q_ppm * _tot
        GROUP BY {key_grp}q_ppm
    """
