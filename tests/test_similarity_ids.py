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
