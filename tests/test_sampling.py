"""Deterministic hash-based sampling / splitting (operators/sampling.py).

The DuckDB oracle gates (hash_sample / split_counts in test_oracle_parity)
pin cross-engine bit-exactness; this file pins the properties that make
hash sampling the right tool at 10^12 rows: partitioning independence,
seed-shared subset/monotonicity, cross-table alignment, and split
exhaustiveness.
"""

import pytest
from pyspark.sql import functions as F

from boon_spark.operators.sampling import (hash_sample, sample_uniform,
                                           split_assign,
                                           stratified_sample)


@pytest.fixture(scope="module")
def keyed(spark):
    return spark.createDataFrame(
        [(i, "s%d" % (i % 3)) for i in range(400)], "k bigint, s string")


def _ids(df):
    return {r.k for r in df.select("k").collect()}


def test_membership_is_partitioning_independent(keyed):
    a = _ids(hash_sample(keyed.repartition(1), 0.4, key_col="k"))
    b = _ids(hash_sample(keyed.repartition(13), 0.4, key_col="k"))
    c = _ids(hash_sample(keyed.orderBy(F.desc("k")), 0.4, key_col="k"))
    assert a == b == c and 0 < len(a) < 400
    # the same call on DataFrame.sample is NOT stable (the reason this
    # operator exists) — documented, not asserted: sample() draws from a
    # per-partition RNG.


def test_smaller_fraction_is_subset(keyed):
    small = _ids(hash_sample(keyed, 0.1, key_col="k", seed=3))
    big = _ids(hash_sample(keyed, 0.3, key_col="k", seed=3))
    assert small <= big
    other = _ids(hash_sample(keyed, 0.3, key_col="k", seed=4))
    assert other != big  # seeds are independent hash families


def test_cross_table_alignment(spark, keyed):
    # sampling two tables by the same key keeps them aligned: the
    # "sample the users, keep all their events" pattern
    events = spark.createDataFrame(
        [(i % 400, i) for i in range(1000)], "k bigint, ev bigint")
    users_kept = _ids(hash_sample(keyed, 0.25, key_col="k", seed=9))
    events_kept = {r.k for r in hash_sample(
        events, 0.25, key_col="k", seed=9).select("k").collect()}
    assert events_kept == {k for k in users_kept}


def test_fraction_bounds_and_extremes(keyed):
    assert _ids(hash_sample(keyed, 0.0, key_col="k")) == set()
    assert len(_ids(hash_sample(keyed, 1.0, key_col="k"))) == 400
    with pytest.raises(ValueError, match=r"fraction"):
        hash_sample(keyed, 1.5, key_col="k")


def test_stratified_fractions_and_default(keyed):
    out = stratified_sample(keyed, {"s0": 1.0, "s1": 0.5},
                            strata_col="s", key_col="k", seed=2)
    got = {r.k: r.s for r in out.collect()}
    # s0 kept entirely, s2 (unlisted, default 0.0) dropped entirely
    assert {k for k, s in got.items() if s == "s0"} == \
        {k for k in range(400) if k % 3 == 0}
    assert not any(s == "s2" for s in got.values())
    # s1 rows are exactly the per-row uniform check at 0.5
    s1_all = keyed.filter(F.col("s") == "s1").select(
        "k", (sample_uniform(F.col("k"), seed=2) < 0.5).alias("keep"))
    want = {r.k for r in s1_all.collect() if r.keep}
    assert {k for k, s in got.items() if s == "s1"} == want
    with pytest.raises(ValueError, match=r"stratum"):
        stratified_sample(keyed, {"s0": -0.1}, strata_col="s",
                          key_col="k")


def test_split_assign_partitions_exhaustively(keyed):
    out = split_assign(keyed, {"train": 0.8, "val": 0.1, "test": 0.1},
                       key_col="k", seed=5)
    rows = out.groupBy("split").count().collect()
    counts = {r.split: r["count"] for r in rows}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == 400  # every row labeled exactly once
    assert counts["train"] > counts.get("val", 0)
    # weights normalize: 8/1/1 == 0.8/0.1/0.1
    out2 = split_assign(keyed, {"train": 8, "val": 1, "test": 1},
                        key_col="k", seed=5)
    assert {(r.k, r.split) for r in out.collect()} == \
        {(r.k, r.split) for r in out2.collect()}
    with pytest.raises(ValueError, match=r"non-empty"):
        split_assign(keyed, {}, key_col="k")


def test_xxhash_family_fast_path(keyed):
    out = hash_sample(keyed, 0.5, key_col="k", hash_family="xxhash64")
    n = out.count()
    assert 0 < n < 400
    u = keyed.select(sample_uniform(
        F.col("k"), hash_family="xxhash64").alias("u"))
    lo, hi = u.agg(F.min("u"), F.max("u")).first()
    assert 0.0 <= lo and hi < 1.0
    with pytest.raises(ValueError, match=r"hash_family"):
        hash_sample(keyed, 0.5, key_col="k", hash_family="sha1")


def test_sample_plan_is_scan_side_filter(keyed):
    plan = hash_sample(keyed, 0.4, key_col="k")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_group_cap_respects_k_and_is_monotone(keyed):
    from boon_spark.operators.sampling import group_cap
    out = group_cap(keyed, 20, group_col="s", key_col="k", seed=3)
    per = {r.s: r["n"] for r in
           out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert per == {"s0": 20, "s1": 20, "s2": 20}
    # monotone: k=5 survivors are a subset of k=20 survivors, with the
    # SAME ranks (raising k only adds rows)
    small = {(r.k, r.cap_rank) for r in
             group_cap(keyed, 5, group_col="s", key_col="k",
                       seed=3).collect()}
    big = {(r.k, r.cap_rank) for r in out.collect()}
    assert small <= big and len(small) == 15


def test_group_cap_is_partitioning_independent(keyed):
    from boon_spark.operators.sampling import group_cap
    a = _ids(group_cap(keyed.repartition(1), 7, group_col="s",
                       key_col="k", seed=1))
    b = _ids(group_cap(keyed.repartition(17), 7, group_col="s",
                       key_col="k", seed=1))
    c = _ids(group_cap(keyed.orderBy(F.desc("k")), 7, group_col="s",
                       key_col="k", seed=1))
    assert a == b == c and len(a) == 21


def test_group_cap_rejects_bad_k(keyed):
    from boon_spark.operators.sampling import group_cap
    with pytest.raises(ValueError, match=r"k must be >= 1"):
        group_cap(keyed, 0, group_col="s", key_col="k")
