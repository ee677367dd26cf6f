"""Round-6 operator families: deterministic sketches, per-domain caps,
sessionization, and LM-based quality scoring.

    spark-submit --py-files dist/boon_spark.zip \
        examples/08_sketches_sessions_lm.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = (SparkSession.builder.appName("boon-spark-r6")
         .master(os.environ.get("SPARK_MASTER", "local[4]"))
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
docs = spark.read.parquet(f"{SF}/documents.parquet")
events = spark.read.parquet(f"{SF}/events.parquet")

# --- sketches: HLL distinct + Count-Min frequency --------------------
from boon_spark.operators.sketches import cms_topk_report, hll_report

print("== HLL distinct doc texts (p=10) ==")
hll_report(docs, key_col="text", p=10).show()

print("== Count-Min heavy hitters over n_chars (tiny sketch) ==")
cms_topk_report(docs, 8, key_col="n_chars", depth=3, width=64).show()

# --- per-source cap ---------------------------------------------------
from boon_spark.operators.sampling import group_cap

print("== cap: keep <= 5 docs per source (deterministic hash rank) ==")
capped = group_cap(docs, 5, group_col="source", key_col="doc_id")
capped.groupBy("source").count().orderBy("source").show(5)

# --- sessionization ---------------------------------------------------
from boon_spark.operators.sessions import session_stats

print("== sessions (gap = 12h): longest 5 ==")
sess = session_stats(events, gap="12 hours")
sess.orderBy(F.desc("n_events"), "user_id", "session_idx").show(5)

# --- LM scoring + collocations ----------------------------------------
from boon_spark.operators.lm import (fit_bigram_lm, pmi_collocations,
                                     score_bigram_lm)
from boon_spark.operators.tokens import synthetic_tokens

lens = docs.select(
    "doc_id",
    F.coalesce(F.size(F.split(F.trim(F.col("text")), r"\s+")),
               F.lit(0)).cast("long").alias("n_tok"))
tok = synthetic_tokens(lens.withColumn("g", F.col("doc_id")), gen_col="g")
model = fit_bigram_lm(tok)
print(f"== bigram LM: vocab = {model['vocab']} ==")
scored = score_bigram_lm(tok, model)
print("lowest-perplexity docs (most in-distribution):")
scored.orderBy("avg_nll_mq64", "doc_id").show(5)

print("== top collocations by quantized PMI ==")
pmi_collocations(tok, 10, min_count=3).show()

# --- stupid-backoff trigram (Brants et al. 2007) -----------------------
from boon_spark.operators.lm import fit_backoff_lm, score_backoff_lm

tri_model = fit_backoff_lm(tok)
print("== trigram stupid-backoff scores (lowest 5) ==")
score_backoff_lm(tok, tri_model).orderBy("avg_nll_mq64", "doc_id").show(5)

# --- streaming LM (batch mode — the scorer is mode-agnostic) ----------
from boon_spark.streaming.lm_stream import collect_lm_model, lm_score_stream

lm = collect_lm_model(model)
n_stream = lm_score_stream(tok, lm).count()
n_batch = scored.count()
assert n_stream == n_batch, (n_stream, n_batch)
print(f"stream scorer == batch on {n_batch} docs")

spark.stop()
print("ok")
