"""Deterministic sketches (operators/sketches.py): HLL distinct and
Count-Min frequency.

The DuckDB oracle gates (hll_distinct / cms_freq in test_oracle_parity)
pin cross-engine bit-exactness; this file pins the properties that make
the sketches trustworthy at 10^12 rows: the HLL error bound and
partitioning independence, the Count-Min `est >= exact` guarantee over
EVERY key (not just the audited top-k), NULL-key exclusion, loud size
guards, and the bounded-shuffle build shape.
"""

import pytest
from pyspark.sql import functions as F

from boon_spark.operators.sketches import (build_cms, cms_estimate,
                                           cms_topk_report, hll_registers,
                                           hll_report)


@pytest.fixture(scope="module")
def keyed(spark):
    # 3000 distinct keys, skewed repeats on the low ids
    rows = [(i, f"k{i % 1000}") for i in range(3000)]
    rows += [(10000 + i, f"k{i % 7}") for i in range(700)]
    return spark.createDataFrame(rows, "rid bigint, key string")


def test_hll_error_within_bound(spark, keyed):
    # p=10 -> m=1024, standard error 1.04/sqrt(m) ~ 3.25%; assert 4 sigma
    exact = keyed.select("key").distinct().count()
    est = hll_report(keyed, key_col="key", p=10).first()["est_hll"]
    assert abs(est - exact) / exact < 4 * 1.04 / (1 << 5)


def test_hll_is_partitioning_independent(keyed):
    a = hll_report(keyed.repartition(1), key_col="key", p=9).first()
    b = hll_report(keyed.repartition(13), key_col="key", p=9).first()
    assert a["harmonic_scaled"] == b["harmonic_scaled"]
    assert a["est_raw"] == b["est_raw"]


def test_hll_registers_shape_and_null_keys(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), (None,), ("a",)], "key string")
    regs = hll_registers(df, key_col="key", p=6)
    # NULL excluded; duplicate key hits the same register
    assert regs.count() <= 2
    assert regs.agg(F.max("rho")).first()[0] <= (60 - 6) + 1


def test_hll_p_guard(keyed):
    with pytest.raises(ValueError, match=r"p must be"):
        hll_report(keyed, key_col="key", p=3)
    with pytest.raises(ValueError, match=r"p must be"):
        hll_report(keyed, key_col="key", p=19)


def test_cms_overestimates_only_everywhere(keyed):
    # tiny sketch -> collisions guaranteed; the guarantee must hold for
    # EVERY key, not just the top-k
    cms = build_cms(keyed, key_col="key", depth=3, width=32)
    exact = (keyed.groupBy("key")
             .agg(F.count(F.lit(1)).cast("long").alias("exact_n")))
    both = cms_estimate(exact, cms, key_col="key").collect()
    assert all(r["est_n"] >= r["exact_n"] for r in both)
    assert any(r["est_n"] > r["exact_n"] for r in both)  # collisions real


def test_cms_weighted_build(spark):
    # the NULL-weight row is excluded like a NULL key (regression: a
    # cell fed only NULL weights used to crash the driver unpack)
    df = spark.createDataFrame(
        [("a", 5), ("a", 3), ("b", 2), ("z", None)],
        "key string, w int")
    cms = build_cms(df, key_col="key", depth=2, width=16, weight_col="w")
    assert cms["total"] == 10
    est = cms_estimate(df.select("key").distinct(), cms,
                       key_col="key").collect()
    by_key = {r["key"]: r["est_n"] for r in est}
    assert by_key["a"] >= 8 and by_key["b"] >= 2


def test_cms_null_keys_estimate_null(spark):
    df = spark.createDataFrame([("a",), (None,)], "key string")
    cms = build_cms(df, key_col="key", depth=2, width=16)
    rows = {r["key"]: r["est_n"]
            for r in cms_estimate(df, cms, key_col="key").collect()}
    assert rows["a"] >= 1 and rows[None] is None


def test_cms_guards(keyed):
    with pytest.raises(ValueError, match=r"depth"):
        build_cms(keyed, key_col="key", depth=0)
    with pytest.raises(ValueError, match=r"width"):
        build_cms(keyed, key_col="key", width=1)
    with pytest.raises(ValueError, match=r"max_cells"):
        build_cms(keyed, key_col="key", depth=64, width=1 << 20)


def test_cms_build_shuffle_is_sketch_bounded(keyed):
    """The build's only exchange carries (i, p) cells — partial
    map-side aggregation must sit below it so the exchange is bounded
    by depth*width per partition, not by corpus rows."""
    key = F.col("key").cast("string")
    from boon_spark.operators.sketches import _cms_pos
    rows = (keyed.filter(key.isNotNull())
            .select(F.lit(1).cast("long").alias("n"),
                    F.explode(F.array(*[
                        F.struct(F.lit(i).alias("i"),
                                 _cms_pos(key, i, 32, 50923).alias("p"))
                        for i in range(3)])).alias("c"))
            .groupBy(F.col("c.i"), F.col("c.p")).agg(F.sum("n")))
    plan = rows._jdf.queryExecution().executedPlan().toString()
    before_exchange = plan.split("Exchange")[-1]  # text BELOW = upstream
    assert "HashAggregate" in before_exchange, plan


def test_cms_topk_report_ranks_deterministically(keyed):
    out = cms_topk_report(keyed, 5, key_col="key", depth=3, width=32)
    rows = out.orderBy("rank").collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    # the 7 hot keys dominate: top-5 are all k0..k6 variants
    assert all(r["exact_n"] >= 100 for r in rows)
    assert all(r["est_n"] >= r["exact_n"] for r in rows)
