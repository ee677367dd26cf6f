"""Quickstart: validate a parquet table against a constraint schema.

The Spark analogue of boon's basic compile-then-validate flow
(reference tests/examples.rs example_from_files):

    spark-submit --py-files dist/boon_spark.zip examples/01_quickstart.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from boon_spark import validate_table

TABLE = sys.argv[1] if len(sys.argv) > 1 \
    else "/root/testdata/sf0.001/documents.parquet"

spark = (SparkSession.builder.appName("boon-spark-quickstart")
         .getOrCreate())

spec = {
    "schema": {
        "required": ["doc_id"],
        "properties": {
            "doc_id": {"type": "integer"},
            "n_chars": {"minimum": 0, "maximum": 400},
            "lang": {"enum": ["en", "de", "fr", "es", "zh"]},
            "source": {"pattern": "^src[0-9]$"},
        },
    },
    "unique": ["doc_id"],
}

out = validate_table(spark.read.parquet(TABLE), spec, row_id="doc_id")
out["result"].flag().show()                      # whole-table verdict
out["row_violations"].show(10, truncate=60)      # boon basic-output units
out["unique_violations"].show(5)
spark.stop()
