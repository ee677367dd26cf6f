"""Skew-aware aggregation helper.

The north_rule calls out explicit skew handling: the input's ``source``
column is heavily skewed (80% 'web' in the FIXTURES distribution), so any
``groupBy(source)`` funnels most rows through one reducer.  Two-stage
salted aggregation bounds per-reducer load: partial-aggregate on
``(key, salt)``, then final-aggregate on ``key``.

Only *algebraic* aggregates (sum/count/min/max + things derivable from
them, like avg = sum/count) can be salted this way; that covers every
metric the stats/drift operators need.  AQE's skew handling
(``spark.sql.adaptive.skewJoin``) covers joins; this helper covers
aggregations, where AQE does not split skewed groups.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_stats(df: DataFrame, keys: Sequence[str], value_col: str, *,
                 salt_buckets: int = 16,
                 salt_col: Optional[str] = None) -> DataFrame:
    """Per-key count/sum/min/max/avg/null-count of ``value_col`` computed
    via a two-stage salted aggregation.  Result is identical to the
    direct ``groupBy(keys)`` (tested), but no reducer ever sees more than
    ~1/salt_buckets of the hottest key."""
    salt = (F.pmod(F.xxhash64(*[F.col(k) for k in keys] + [F.col(salt_col)]),
                   F.lit(salt_buckets))
            if salt_col else
            F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(),
                   F.lit(salt_buckets)))
    v = F.col(value_col)
    partial = (df
               .withColumn("_salt", salt)
               .groupBy(*keys, "_salt")
               .agg(F.count(F.lit(1)).alias("_n"),
                    F.sum(v).alias("_sum"),
                    F.min(v).alias("_min"),
                    F.max(v).alias("_max"),
                    F.sum(v.isNull().cast("long")).alias("_nulls")))
    return (partial
            .groupBy(*keys)
            .agg(F.sum("_n").alias("n_rows"),
                 F.sum("_sum").alias(f"{value_col}_sum"),
                 F.min("_min").alias(f"{value_col}_min"),
                 F.max("_max").alias(f"{value_col}_max"),
                 (F.sum("_sum") / (F.sum("_n") - F.sum("_nulls")))
                 .alias(f"{value_col}_avg"),
                 F.sum("_nulls").alias(f"{value_col}_nulls")))
