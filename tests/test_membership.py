"""Deterministic Bloom-filter membership: build/test semantics, the
no-false-negative invariant, bit-exact false-positive reproduction in
DuckDB, and the zero-shuffle plan shape."""

import duckdb
import pytest
from pyspark.sql import functions as F

from boon_spark.operators.membership import (bloom_stats, build_bloom,
                                             membership_report,
                                             membership_report_oracle_sql,
                                             might_contain)


def _members(spark, n=40):
    return spark.createDataFrame([(f"m{i:03d}",) for i in range(n)],
                                 "doc_id string")


def test_build_guards(spark):
    m = _members(spark)
    with pytest.raises(ValueError, match="multiple of 64"):
        build_bloom(m, m_bits=100)
    with pytest.raises(ValueError, match="multiple of 64"):
        build_bloom(m, m_bits=0)
    with pytest.raises(ValueError, match="max_bits"):
        build_bloom(m, m_bits=1 << 28)
    with pytest.raises(ValueError, match="k_hashes"):
        build_bloom(m, k_hashes=0)


def test_no_false_negatives_and_null_semantics(spark):
    members = _members(spark)
    bloom = build_bloom(members, m_bits=1 << 12, k_hashes=4)
    probe = spark.createDataFrame(
        [(f"m{i:03d}",) for i in range(40)] + [("absent-x",), (None,)],
        "doc_id string")
    got = {r.doc_id: r.maybe_member
           for r in might_contain(probe, bloom).collect()}
    # every member MUST test True — a bloom has no false negatives
    assert all(got[f"m{i:03d}"] for i in range(40))
    # NULL keys test NULL (three-valued), never False/True
    assert got[None] is None
    # n_set_bits bounded by k*n and the stats are coherent
    st = bloom_stats(bloom)
    assert 0 < st["n_set_bits"] <= 4 * 40
    assert 0.0 < st["fill_ratio"] < 1.0
    assert 0.0 <= st["fp_estimate"] <= 1.0


def test_int_keys_cast_like_strings(spark):
    # integer keys go through the same string cast in build and test
    members = spark.createDataFrame([(i,) for i in range(20)],
                                    "doc_id long")
    bloom = build_bloom(members, m_bits=1 << 12, k_hashes=3)
    probe = spark.createDataFrame([(5,), (9999,)], "doc_id long")
    got = {r.doc_id: r.maybe_member
           for r in might_contain(probe, bloom).collect()}
    assert got[5] is True


def test_report_matches_oracle_with_false_positives(spark):
    # tiny bitmap => guaranteed false positives; both engines must
    # count the SAME ones (the bloom is deterministic end to end)
    rows = [(f"k{i:04d}",) for i in range(300)]
    corpus = spark.createDataFrame(rows, "doc_id string")
    members = corpus.filter(F.substring("doc_id", 5, 1).isin("0", "2"))
    got = membership_report(corpus, members, m_bits=256,
                            k_hashes=2).first()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", rows)
    want = con.execute(membership_report_oracle_sql(
        members_sql="SELECT doc_id FROM t WHERE substr(doc_id, 5, 1) "
                    "IN ('0', '2')",
        corpus_sql="SELECT doc_id FROM t",
        m_bits=256, k_hashes=2)).fetchone()
    assert (got.n_keys, got.n_maybe, got.n_true, got.n_false_pos) == \
        tuple(want)
    # non-degenerate: the tiny bitmap really produced false positives,
    # and every true member was found
    assert got.n_false_pos > 0
    assert got.n_maybe == got.n_true + got.n_false_pos
    assert got.n_true == members.count()


def test_might_contain_is_shuffle_free(spark):
    members = _members(spark)
    bloom = build_bloom(members, m_bits=1 << 12)
    probe = spark.createDataFrame([("a",), ("b",)], "doc_id string")
    plan = (might_contain(probe, bloom)
            ._jdf.queryExecution().executedPlan().toString())
    # the whole check is a broadcast-variable pandas UDF over the scan
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan or "EvalPython" in plan


def test_might_contain_streaming_equals_batch(spark, tmp_path):
    # the check is a stateless broadcast-bitmap map — mode-agnostic by
    # construction; pin that a readStream frame scores identically
    members = _members(spark)
    bloom = build_bloom(members, m_bits=256, k_hashes=2)
    rows = [(f"m{i:03d}",) for i in range(0, 40, 3)] + \
           [(f"x{i:03d}",) for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id string")
    p = str(tmp_path / "bloom_in")
    df.coalesce(1).write.parquet(p)
    want = {(r.doc_id, r.maybe_member)
            for r in might_contain(df, bloom).collect()}
    stream = spark.readStream.schema("doc_id string").parquet(p)
    out = str(tmp_path / "bloom_out")
    (might_contain(stream, bloom).writeStream
     .format("parquet").option("path", out)
     .option("checkpointLocation", str(tmp_path / "ck"))
     .trigger(availableNow=True).start().awaitTermination(120))
    got = {(r.doc_id, r.maybe_member)
           for r in spark.read.parquet(out).collect()}
    assert got == want and got
