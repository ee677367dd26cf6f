"""Training-data pipeline operators: dedup, decontamination, ANN.

These are the Spark-native extensions beyond boon's row-local keyword
evaluator (SURVEY.md §2.9) — the operations a pre-training data
pipeline runs next to validation:

    spark-submit --py-files dist/boon_spark.zip examples/04_data_pipeline.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from boon_spark.operators.dedup import (cross_table_contamination,
                                        exact_duplicates,
                                        minhash_lsh_bucket_stats,
                                        minhash_lsh_pairs)
from boon_spark.operators.similarity import cosine_topk, lsh_topk_quantized

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = (SparkSession.builder.appName("boon-spark-pipeline")
         .master(os.environ.get("SPARK_MASTER", "local[4]"))
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
docs = spark.read.parquet(f"{SF}/documents.parquet")
emb = spark.read.parquet(f"{SF}/embeddings.parquet")

# -- exact dedup: hash-groupBy with bounded example buffers --
dups = exact_duplicates(docs)
print("exact duplicate groups:", dups.count())

# -- near-dup pairs: MinHash banding + exact-Jaccard verify, with the
#    no-silent-truncation audit companion --
pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.5)
print("near-dup pairs:", pairs.count())
stats = minhash_lsh_bucket_stats(docs).collect()[0]
print(f"bucket audit: {stats.n_buckets} buckets, "
      f"{stats.n_dropped_buckets} dropped (cap), "
      f"largest={stats.largest_bucket}")

# -- decontamination: docs from most sources checked against a
#    "benchmark" (sources src0/src1 stand in); containment metric
#    catches an eval item EMBEDDED in a larger training doc --
bench = docs.filter(F.col("source").isin("src0", "src1"))
corpus = docs.filter(~F.col("source").isin("src0", "src1"))
hits = cross_table_contamination(corpus, bench, threshold=0.5)
print("contaminated training docs:")
hits.orderBy("corpus_id").show(10)

# -- ANN: exact brute-force top-k (the verifier) vs the quantized
#    LSH-bucketed scale path --
queries = emb.filter(F.col("vec_id") < 3)
exact = cosine_topk(emb, queries, k=3)
# 4 signature bits ≈ 16 buckets — sized to this tiny demo corpus; at
# real scale use more bits (smaller buckets) and the multiprobe default
approx = lsh_topk_quantized(emb, queries, k=3, dim=64, bits=4)
e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
print(f"ANN recall vs exact at k=3: {len(e & a)}/{len(e)}")

spark.stop()
