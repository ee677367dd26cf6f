"""Structured Streaming: per-row validation, watermarked violation
rates, and cross-batch drift (engine-native scope; boon has no
streaming surface)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from boon_spark.streaming.drift_stream import (reference_probs,
                                               streaming_drift)
from boon_spark.streaming.validate_stream import violation_rate

spark = (SparkSession.builder.appName("boon-spark-streaming")
         .getOrCreate())

SPEC = {"properties": {"n_chars": {"minimum": 0, "maximum": 400}},
        "required": ["doc_id"]}

DOCS = "/root/testdata/sf0.001/documents.parquet"
ref_df = spark.read.parquet(DOCS)
probs = reference_probs(ref_df, "n_chars", lo=0, hi=500, buckets=32)

# the streaming file source wants a DIRECTORY; pathGlobFilter scopes
# it to the documents table only
stream = (spark.readStream.schema(ref_df.schema)
          .option("maxFilesPerTrigger", 1)
          .option("pathGlobFilter", "documents.parquet")
          .parquet("/root/testdata/sf0.001/"))

# watermarked per-minute violation rates (requires a timestamp column;
# documents has none, so derive a synthetic one for the demo)
from pyspark.sql import functions as F

with_ts = stream.withColumn(
    "ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")))
rate_q = (violation_rate(with_ts, SPEC, ts_col="ts", row_id="doc_id")
          .writeStream.format("console").outputMode("complete")
          .trigger(availableNow=True).start())
rate_q.awaitTermination(120)

# running per-source PSI against the reference distribution
drift_q = (streaming_drift(stream, value_col="n_chars", key_col="source",
                           ref_probs=probs, lo=0, hi=500, buckets=32)
           .writeStream.format("console").outputMode("update")
           .trigger(availableNow=True).start())
drift_q.awaitTermination(120)
spark.stop()
