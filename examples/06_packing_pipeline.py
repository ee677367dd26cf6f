"""Corpus → training chunks: clean → vocab → budget → pack → provenance.

The tokens-side round-5 families composed as a pre-training data-prep
tail: C4 line cleaning, vocabulary/top-k, context-length budgeting, the
distributed concat-and-chunk packing pass, and the chunk↔document
provenance map a lineage store would persist.

    spark-submit --py-files dist/boon_spark.zip examples/06_packing_pipeline.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from boon_spark.operators.cleaning import c4_line_flags, vocab_topk
from boon_spark.operators.packing import (chunk_doc_map, pack_chunks,
                                          packing_stats, truncation_stats)
from boon_spark.operators.text import whitespace_token_count

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
C = 256  # training context length

spark = (SparkSession.builder.appName("boon-spark-packing")
         .master(os.environ.get("SPARK_MASTER", "local[4]"))
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
docs = spark.read.parquet(f"{SF}/documents.parquet")

# 1. C4-style line cleaning verdicts (the synthetic corpus is
#    single-line word soup with no terminal punctuation, so the line
#    filter strips nearly everything — on a real corpus you'd join
#    filter("keep") and pack clean_text; here we report the verdicts
#    and pack the raw text so the rest of the pipeline has material)
flags = c4_line_flags(docs)
flags.groupBy("keep").agg(F.count("*").alias("n_docs")).show()

# 2. vocabulary head — what a tokenizer build would start from
print("top-10 tokens:")
vocab_topk(docs, 10).show(truncate=False)

# 3. token counts → context-length budgeting: what does C cost us?
lens = docs.select(
    "doc_id", whitespace_token_count(F.col("text")).cast("int")
    .alias("n_tok")).withColumn("source", F.lit("all"))
print(f"truncation/padding budget at max_len={C}:")
truncation_stats(lens, C).show()

# 4. pack: the distributed prefix sum assigns every document its global
#    stream interval and spanned chunks
packed = pack_chunks(lens, C)
packed.orderBy("doc_id").show(5)
print("packing audit:")
packing_stats(lens, C).show()

# 5. provenance: chunk -> contributing documents (what a lineage store
#    persists next to the materialized chunks)
m = chunk_doc_map(lens, C)
print("chunk fill (every chunk exactly C tokens except the last):")
(m.groupBy("chunk_id")
 .agg(F.count("*").alias("n_docs"), F.sum("n_tok_in_chunk").alias("n_tok"))
 .orderBy("chunk_id").show(5))

spark.stop()
print("packing pipeline complete")
