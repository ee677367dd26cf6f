"""cosine_topk must handle non-numeric id columns (string doc_ids)."""

from pyspark.sql import functions as F

from boon_spark.operators.similarity import cosine_topk


def test_cosine_topk_string_ids(spark):
    emb = spark.range(20).select(
        F.concat(F.lit("doc-"), F.lpad(F.col("id").cast("string"), 3, "0"))
        .alias("doc_id"),
        F.transform(F.sequence(F.lit(1), F.lit(8)),
                    lambda i: (F.pmod(F.xxhash64(F.col("id"), i),
                                      F.lit(100)) / 100).cast("float"))
        .alias("embedding"))
    q = emb.limit(2)
    out = cosine_topk(emb, q, k=3, id_col="doc_id").collect()
    assert len(out) == 6
    assert all(r.neighbor_id is not None and r.neighbor_id.startswith("doc-")
               for r in out)


def _emb(spark, n, dim=8):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(1), F.lit(dim)),
                    lambda i: (F.pmod(F.xxhash64(F.col("id"), i),
                                      F.lit(100)) / 100).cast("float"))
        .alias("embedding"))


def test_cosine_topk_null_embeddings_not_neighbors(spark):
    # ADVICE r2 (high): null cosines sorted FIRST on the negated-cosine key
    # and evicted real neighbors map-side.  A corpus with null vectors must
    # return only real rows at rank 1..k.
    emb = _emb(spark, 20)
    nulls = spark.range(3).select(
        (F.col("id") + 1000).alias("vec_id"),
        F.lit(None).cast("array<float>").alias("embedding"))
    corpus = emb.unionByName(nulls)
    q = emb.filter(F.col("vec_id") < 2)
    out = cosine_topk(corpus, q, k=4, id_col="vec_id").collect()
    assert len(out) == 8
    assert all(r.neighbor_id < 1000 for r in out), \
        "null-embedding rows must never appear as neighbors"
    # and the ranking matches the unpolluted corpus exactly
    clean = cosine_topk(emb, q, k=4, id_col="vec_id").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, clean))


def test_cosine_topk_many_queries_chunked(spark):
    # many queries × few partitions: the broadcast is chunked at
    # max_queries_per_pass and results are identical to a single pass
    emb = _emb(spark, 60).coalesce(2)
    q = emb.filter(F.col("vec_id") < 30)
    chunked = cosine_topk(emb, q, k=3, id_col="vec_id",
                          max_queries_per_pass=7).collect()
    single = cosine_topk(emb, q, k=3, id_col="vec_id",
                         max_queries_per_pass=10_000).collect()
    assert sorted(map(tuple, chunked)) == sorted(map(tuple, single))
    assert len(chunked) == 30 * 3


def test_cosine_topk_collect_is_sub_bucketed(spark):
    # the partial collect_list group key must include the _sub bucket so
    # the sort-based agg fallback processes bounded groups (≈ partition
    # rows / sub_buckets), never one whole-partition × Q buffer
    emb = _emb(spark, 50)
    q = emb.filter(F.col("vec_id") < 2)
    plan = cosine_topk(emb, q, k=3, id_col="vec_id")._jdf \
        .queryExecution().executedPlan().toString()
    agg_lines = [ln for ln in plan.splitlines()
                 if "partial_collect_list" in ln]
    assert agg_lines, "map-side partial top-k missing from plan"
    assert any("_sub" in ln for ln in agg_lines), \
        "partial collect group key lost the _sub bound"
