"""Token-budget source mixing: rates, sampling, audit, oracle parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from boon_spark.operators.mixing import (MIX_SEED, mix_stats,
                                         mix_stats_oracle_sql,
                                         source_token_rates,
                                         token_budget_sample)

ROWS = [
    # (doc_id, source, n_tok)  — src_a rich, src_b poor, src_c tiny,
    # src_z untargeted, NULL source, zero-token targeted source src_e
    *[(i, "src_a", 100) for i in range(40)],
    *[(100 + i, "src_b", 50) for i in range(10)],
    *[(200 + i, "src_c", 10) for i in range(4)],
    *[(300 + i, "src_z", 100) for i in range(5)],
    (400, None, 100),
    (401, "src_e", 0),
]
TARGETS = {"src_a": 5.0, "src_b": 4.0, "src_c": 1.0, "src_e": 1.0,
           "src_missing": 2.0}
def _weight():
    return F.col("n_tok")


def _df(spark):
    return spark.createDataFrame(ROWS,
                                 "doc_id long, source string, n_tok long")


def _con():
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, source VARCHAR, "
                "n_tok BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", ROWS)
    return con


def test_rates_binding_source_keeps_everything(spark):
    rates = {r.source: r for r in
             source_token_rates(_df(spark), TARGETS,
                                weight=_weight()).collect()}
    # untargeted / NULL / zero-token sources take no part
    assert set(rates) == {"src_a", "src_b", "src_c"}
    # src_c is binding: 40 tokens against share 1/13 runs out first
    # (quota 520 < src_b's 1625 < src_a's 10400), so it keeps everything
    # and the richer sources downsample toward the mixture
    assert rates["src_c"].rate == 1.0
    assert 0 < rates["src_a"].rate < rates["src_b"].rate < 1.0
    assert rates["src_a"].n_tokens == 4000


def test_sample_partitioning_independent(spark):
    df = _df(spark)
    a = {r.doc_id for r in
         token_budget_sample(df, TARGETS, weight=_weight()).collect()}
    b = {r.doc_id for r in
         token_budget_sample(df.repartition(7), TARGETS,
                             weight=_weight()).collect()}
    assert a == b and a
    # schema passes through unchanged
    assert set(token_budget_sample(df, TARGETS, weight=_weight()).columns) \
        == {"doc_id", "source", "n_tok"}


def test_mix_stats_matches_oracle_bit_exact(spark):
    got = [(r.source, r.n_docs_kept, r.n_tokens_kept, r.achieved_ppm,
            r.target_ppm)
           for r in mix_stats(_df(spark), TARGETS, weight=_weight())
           .orderBy("source").collect()]
    want = _con().execute(mix_stats_oracle_sql(
        TARGETS, weight_sql="n_tok", table="t") +
        " ORDER BY source").fetchall()
    assert got == [tuple(w) for w in want]
    assert got  # non-degenerate


def test_target_validation():
    import boon_spark.operators.mixing as m
    with pytest.raises(ValueError, match="non-empty"):
        m._normalized_shares({})
    with pytest.raises(ValueError, match="> 0"):
        m._normalized_shares({"a": 1.0, "b": 0.0})
    with pytest.raises(ValueError, match="> 0"):
        m._normalized_shares({"a": -1.0})


def test_plan_broadcast_rates_no_corpus_shuffle(spark, tmp_path):
    df = _df(spark)
    p = str(tmp_path / "mix.parquet")
    df.write.parquet(p)
    corpus = spark.read.parquet(p)
    plan = (token_budget_sample(corpus, TARGETS, weight=_weight())
            ._jdf.queryExecution().executedPlan().toString())
    # the rate table comes back as a broadcast; the corpus row path has
    # no hash-partitioned exchange (only the tiny per-source aggregate
    # shuffles)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_seed_isolates_from_other_sampling_families(spark):
    df = _df(spark)
    kept_default = {r.doc_id for r in
                    token_budget_sample(df, TARGETS,
                                        weight=_weight()).collect()}
    kept_other = {r.doc_id for r in
                  token_budget_sample(df, TARGETS, weight=_weight(),
                                      seed=MIX_SEED + 1).collect()}
    assert kept_default != kept_other


def test_apply_token_budget_on_stream_matches_batch(spark, tmp_path):
    # fit-on-batch / apply-on-stream: the rate filter is row-local, so
    # streaming membership equals batch membership exactly
    from boon_spark.operators.mixing import (apply_token_budget,
                                             source_token_rates)
    df = _df(spark)
    p = str(tmp_path / "mix_stream")
    df.filter(F.col("doc_id") < 100).coalesce(1).write.parquet(p + "/a")
    df.filter(F.col("doc_id") >= 100).coalesce(1).write.parquet(p + "/b")
    rates = {r.source: r.rate for r in
             source_token_rates(df, TARGETS, weight=_weight()).collect()}
    batch = {r.doc_id for r in
             token_budget_sample(df, TARGETS, weight=_weight()).collect()}
    stream = (spark.readStream.schema("doc_id long, source string, n_tok long")
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", 1).parquet(p))
    out = apply_token_budget(stream, rates)
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("t_mix")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.sql("select doc_id from t_mix").collect()}
    assert got == batch and got


def test_apply_token_budget_validates_rates(spark):
    from boon_spark.operators.mixing import apply_token_budget
    with pytest.raises(ValueError, match="rates must be"):
        apply_token_budget(_df(spark), {"src_a": 1.5})


def test_sample_preserves_user_rate_column(spark):
    df = _df(spark).withColumn("rate", F.lit(0.123))
    out = token_budget_sample(df, TARGETS, weight=_weight())
    assert "rate" in out.columns
    assert all(r.rate == 0.123 for r in out.select("rate").collect())


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SRC = ["s1", "s2", "s3", "s4"]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(rows=st.lists(
    st.tuples(st.sampled_from(_SRC + [None]),
              st.one_of(st.none(), st.integers(0, 500))),
    min_size=1, max_size=30),
    weights=st.lists(st.floats(0.01, 10.0, allow_nan=False),
                     min_size=2, max_size=4))
def test_mix_stats_cross_engine_fuzz(spark, rows, weights):
    # the float-parity claim under fire: random corpora and random
    # target shares through both engines — every IEEE step must agree
    targets = {s: w for s, w in zip(_SRC, weights)}
    data = [(i, s, n) for i, (s, n) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, source string, n_tok long")
    got = sorted(tuple(r) for r in
                 mix_stats(df, targets,
                           weight=F.coalesce(F.col("n_tok"), F.lit(0)))
                 .collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, source VARCHAR, n_tok BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", data)
    want = sorted(tuple(w) for w in con.execute(mix_stats_oracle_sql(
        targets, weight_sql="coalesce(n_tok, 0)", table="t")).fetchall())
    con.close()
    assert got == want, f"rows={rows!r} weights={weights!r}"
