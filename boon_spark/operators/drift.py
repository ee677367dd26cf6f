"""Distribution-drift detection (KS / PSI) on a numeric column between two
samples (e.g. current vs reference corpus, or between sources).

boon has no cross-row analogue (SURVEY.md §2.6) — this is the Spark-native
extension the north_rule mandates.  Design:

* histogram aggregation per side: ``width_bucket`` → ``groupBy(bucket)`` —
  two map-side-combined shuffles over *buckets*, never raw rows;
* the statistic itself (KS sup-distance over the bucket CDFs, PSI sum) is
  computed over the tiny bucket table — either driver-side via the
  returned DataFrame or fully in Spark (``drift_metrics``);
* **skew**: grouping keys here are ``(side, bucket)`` — bounded
  cardinality, so the classic skewed-``source`` problem is handled by
  salting the *count* aggregation: we pre-aggregate by
  ``(side, bucket, salt)`` then re-aggregate, bounding any single
  reducer's load (two-stage agg; see ``salt_buckets``).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def histogram(df: DataFrame, value_col: str, lo: float, hi: float,
              buckets: int, *, side: str = "a",
              salt_buckets: int = 0) -> DataFrame:
    """Bucketed counts of ``value_col`` in [lo, hi] (+under/overflow
    buckets 0 and buckets+1 via ``width_bucket`` semantics)."""
    b = F.width_bucket(F.col(value_col).cast("double"),
                       F.lit(float(lo)), F.lit(float(hi)), F.lit(buckets))
    base = df.select(b.alias("bucket")).filter(F.col("bucket").isNotNull())
    if salt_buckets > 1:
        # two-stage (salted) aggregation: partial by (bucket, salt), then
        # final by bucket — bounds reducer load under extreme skew
        salted = (base
                  .withColumn("_salt", F.pmod(F.monotonically_increasing_id(),
                                              F.lit(salt_buckets)))
                  .groupBy("bucket", "_salt")
                  .agg(F.count(F.lit(1)).alias("cnt"))
                  .groupBy("bucket").agg(F.sum("cnt").alias("cnt")))
    else:
        salted = base.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    return salted.select(F.lit(side).alias("side"), "bucket", "cnt")


def drift_metrics(hist_a: DataFrame, hist_b: DataFrame, *,
                  eps: float = 1e-6) -> DataFrame:
    """KS statistic + PSI from two bucket tables.  Pure DataFrame ops over
    the (tiny) histogram — returns a 1-row DataFrame
    ``(ks_stat, psi, n_a, n_b)``."""
    h = hist_a.unionByName(hist_b)
    pivoted = (h.groupBy("bucket")
               .pivot("side", ["a", "b"])
               .agg(F.first("cnt"))
               .na.fill(0))
    tot = pivoted.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    # the CDF window runs over the POST-AGGREGATION histogram — at most
    # buckets+2 rows regardless of input size, so a single partition is
    # correct and bounded.  The partition key must be constant but NOT
    # foldable (a bare lit gets constant-folded out of the window spec
    # and the "No Partition Defined" WARN returns, masking real
    # single-partition windows over big data elsewhere).
    one_part = F.coalesce(F.col("bucket") * F.lit(0), F.lit(0))
    cdf_w = Window.partitionBy(one_part).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0)
    # try_divide: an EMPTY side (na/nb = 0) must yield NULL metrics (the
    # caller's verdict coalesces to False), not an ANSI DIVIDE_BY_ZERO
    # crash of the whole job
    withp = (pivoted.crossJoin(F.broadcast(tot))
             .withColumn("pa", F.try_divide(F.col("a"), F.col("na")))
             .withColumn("pb", F.try_divide(F.col("b"), F.col("nb")))
             .withColumn("cdfa", F.sum("pa").over(cdf_w))
             .withColumn("cdfb", F.sum("pb").over(cdf_w)))
    return withp.agg(
        F.max(F.abs(F.col("cdfa") - F.col("cdfb"))).alias("ks_stat"),
        F.sum((F.col("pa") - F.col("pb")) *
              F.log((F.col("pa") + eps) / (F.col("pb") + eps))).alias("psi"),
        F.first("na").alias("n_a"),
        F.first("nb").alias("n_b"))


def drift_check(df_a: DataFrame, df_b: DataFrame, value_col: str, *,
                lo: float, hi: float, buckets: int = 64,
                psi_threshold: float = 0.2,
                ks_threshold: Optional[float] = None,
                salt_buckets: int = 0) -> DataFrame:
    """End-to-end drift check → 1-row DataFrame with metrics + verdict."""
    ha = histogram(df_a, value_col, lo, hi, buckets, side="a",
                   salt_buckets=salt_buckets)
    hb = histogram(df_b, value_col, lo, hi, buckets, side="b",
                   salt_buckets=salt_buckets)
    m = drift_metrics(ha, hb)
    verdict = F.col("psi") <= psi_threshold
    if ks_threshold is not None:
        verdict = verdict & (F.col("ks_stat") <= ks_threshold)
    # an EMPTY side makes the metrics NULL (sum/0 divisions) — a dead
    # input stream must fail the check loudly, not return valid=NULL
    return m.select("*", F.coalesce(verdict, F.lit(False)).alias("valid"))
