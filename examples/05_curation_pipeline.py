"""End-to-end corpus curation: quality-filter → PII-mask → dedup →
deterministic split.

The round-5 operator families composed the way a pre-training data
pipeline actually chains them.  Every stage is a narrow transformation
over the corpus scan except exact dedup (one digest shuffle), so the
whole pipeline is two stages at any scale:

    spark-submit --py-files dist/boon_spark.zip examples/05_curation_pipeline.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from boon_spark.operators.dedup import exact_duplicates
from boon_spark.operators.pii import mask_pii
from boon_spark.operators.repetition import (gopher_quality_flags,
                                             repetition_metrics)
from boon_spark.operators.sampling import hash_sample, split_assign

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = (SparkSession.builder.appName("boon-spark-curation")
         .master(os.environ.get("SPARK_MASTER", "local[4]"))
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
docs = spark.read.parquet(f"{SF}/documents.parquet")

# 1. Gopher repetition/quality rules — the synthetic corpus is short
#    word-soup, so relax the length floor to keep some of it
flags = gopher_quality_flags(docs, thresholds={"min_words": 10,
                                               "min_stopword_hits": 1})
kept = docs.join(flags.filter("keep").select("doc_id"), "doc_id")
print("kept after quality rules:", kept.count(), "/", docs.count())

# inspect WHY documents were dropped
flags.agg(*[F.sum(F.col(c).cast("int")).alias(c)
            for c in flags.columns if c.startswith("fail_")]).show()

# metric distribution (one zero-shuffle projection)
repetition_metrics(kept).agg(
    F.round(F.avg("top_2gram_char_frac"), 3).alias("avg_top2"),
    F.round(F.avg("alpha_word_frac"), 3).alias("avg_alpha"),
    F.max("n_words").alias("max_words")).show()

# 2. PII masking (codegen chain; counts show what was scrubbed)
masked = mask_pii(kept, with_counts=True)
masked.agg(*[F.sum(c).alias(c) for c in masked.columns
             if c.startswith("n_pii_")]).show()

# 3. Exact dedup on the MASKED text (mask first: two docs differing
#    only in a phone number ARE duplicates for training purposes)
dups = exact_duplicates(masked, text_col="text", id_col="doc_id")
print("exact duplicate groups after masking:", dups.count())

# 4. Deterministic split — membership is a pure function of doc_id,
#    stable across reruns, repartitions, and cluster sizes
final = split_assign(masked.select("doc_id", "text", "source"),
                     {"train": 0.9, "val": 0.05, "test": 0.05},
                     key_col="doc_id", seed=42)
final.groupBy("split").count().orderBy("split").show()

# a 10% pilot subset of train — hash_sample with the same seed is a
# SUBSET of any larger fraction, so scaling the pilot up later only
# ADDS documents
pilot = hash_sample(final.filter("split = 'train'"), 0.1,
                    key_col="doc_id", seed=7)
print("pilot rows:", pilot.count())

spark.stop()
