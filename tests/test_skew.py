"""Salted aggregation equals direct aggregation on skewed keys."""

from pyspark.sql import functions as F

from boon_spark.operators.skew import salted_stats


def test_salted_stats_matches_direct(spark):
    # 90% of rows under one key — the skew case the helper exists for
    df = spark.range(5000).select(
        F.when(F.col("id") % 10 < 9, F.lit("web")).otherwise(F.lit("wiki"))
        .alias("source"),
        (F.col("id") % 777).cast("double").alias("v"))
    direct = {r.source: r for r in
              df.groupBy("source")
              .agg(F.count(F.lit(1)).alias("n_rows"),
                   F.sum("v").alias("v_sum"),
                   F.min("v").alias("v_min"),
                   F.max("v").alias("v_max"),
                   F.avg("v").alias("v_avg")).collect()}
    salted = {r.source: r for r in
              salted_stats(df, ["source"], "v", salt_buckets=8).collect()}
    assert set(direct) == set(salted)
    for k in direct:
        assert direct[k].n_rows == salted[k].n_rows
        assert abs(direct[k].v_sum - salted[k].v_sum) < 1e-6
        assert direct[k].v_min == salted[k].v_min
        assert direct[k].v_max == salted[k].v_max
        assert abs(direct[k].v_avg - salted[k].v_avg) < 1e-9


def test_salted_stats_handles_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("b", None)],
        "k string, v double")
    r = {x.k: x for x in salted_stats(df, ["k"], "v",
                                      salt_buckets=4).collect()}
    assert r["a"].n_rows == 3 and r["a"].v_nulls == 1
    assert abs(r["a"].v_avg - 2.0) < 1e-12
    assert r["b"].v_nulls == 1
