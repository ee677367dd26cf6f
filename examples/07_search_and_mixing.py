"""Lexical search, domain mixing, context windows, and the composed
curation pipeline — the late-round-5 operator families:

    spark-submit --py-files dist/boon_spark.zip \
        examples/07_search_and_mixing.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from boon_spark.operators.mixing import mix_stats, token_budget_sample
from boon_spark.operators.pipeline import curation_stats
from boon_spark.operators.search import bm25_df_stats, bm25_topk, doc_len, doc_tokens
from boon_spark.operators.tokens import synthetic_tokens, token_windows

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = (SparkSession.builder.appName("boon-spark-search-mixing")
         .master(os.environ.get("SPARK_MASTER", "local[4]"))
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
docs = spark.read.parquet(f"{SF}/documents.parquet")

# 1. Lexical BM25 search: pull the most relevant documents for a few
#    keyword queries (integer-quantized scoring — reproducible in any
#    engine; only postings matching the query terms ever shuffle)
queries = (docs.filter(F.col("doc_id") % 100 == 1)
           .select(F.col("doc_id").alias("query_id"),
                   F.array_join(F.slice(doc_tokens(F.col("text")), 3, 4),
                                " ").alias("query_text")))
print("BM25 top-3 per query:")
bm25_topk(docs, queries, k=3).orderBy("query_id", "rank").show(9)
print("term document frequencies (the audit companion):")
bm25_df_stats(docs, queries).orderBy(F.col("df").desc()).show(5)

# 2. Domain mixing: resample sources toward a target token mixture;
#    the binding source keeps everything, the rest downsample.
#    Membership is a pure function of doc_id — rerun-stable.
targets = {"src0": 5.0, "src1": 3.0, "src2": 2.0}
mixed = token_budget_sample(docs, targets, weight=doc_len(F.col("text")))
print("mixed corpus rows:", mixed.count())
print("achieved vs target mixture (ppm):")
mix_stats(docs, targets, weight=doc_len(F.col("text"))) \
    .orderBy("source").show()

# 3. Sliding context windows: expand long docs into overlapping
#    W=64 / stride=48 token windows (here over synthetic token arrays)
toks = synthetic_tokens(docs.select(
    "doc_id", doc_len(F.col("text")).alias("n_tok")))
wins = token_windows(toks, 64, 48)
wins.agg(F.count("*").alias("n_windows"),
         F.sum("n_tok").alias("window_tokens")).show()

# 4. The composed pipeline: quality filter -> exact dedup -> sample ->
#    split, one call (synthetic text has no English stopwords, so that
#    rule is relaxed)
print("curated per-(split, source) stats:")
curation_stats(docs, thresholds={"min_stopword_hits": 0,
                                 "min_words": 40}) \
    .orderBy("split", "source").show(8)

spark.stop()
