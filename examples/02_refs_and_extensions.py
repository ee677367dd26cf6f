"""Cross-document $ref, recursive schemas, and registries — the Spark
analogues of boon's add_resource / UrlLoader / register_format examples
(reference tests/examples.rs:33-230)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from boon_spark import Engine, register_format

spark = (SparkSession.builder.appName("boon-spark-refs").getOrCreate())

# -- cross-document $ref via resources= (boon add_resource) --
lib = {"$id": "https://example.com/lib.json",
       "$defs": {"short_text": {"type": "string", "maxLength": 512}}}
eng = Engine.from_schema(
    {"properties": {
        "text": {"$ref": "https://example.com/lib.json#/$defs/short_text"}}},
    row_id="doc_id", resources={"https://example.com/lib.json": lib})

# -- recursive schema over a nested struct column (unrolled to the
#    column type's depth at plan time; boon guards this at runtime).
#    tree_eng validates a whole row shaped like a node; tree_root below
#    applies the same recursion to a nested struct COLUMN --
tree_eng = Engine.from_schema(
    {"$defs": {"node": {"properties": {
        "v": {"maximum": 100},
        "child": {"$ref": "#/$defs/node"}}}},
     "$ref": "#/$defs/node"},
    row_id="id")

# -- custom format as a JVM column expression (stays codegen'd) --
register_format("even-length", lambda c: F.length(c) % 2 == 0,
                column_expr=True)

docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
eng.validate(docs).flag().show()

# exercise the recursive engine over a nested struct built from docs
nested = docs.select(
    "doc_id",
    F.struct(F.col("n_chars").alias("v"),
             F.struct((F.col("n_chars") - 200).alias("v")).alias("child")
             ).alias("tree"))
tree_root = Engine.from_schema(
    {"$defs": {"node": {"properties": {
        "v": {"maximum": 100},
        "child": {"$ref": "#/$defs/node"}}}},
     "properties": {"tree": {"$ref": "#/$defs/node"}}},
    row_id="doc_id")
tree_root.validate(nested).violations().show(5, truncate=60)

# and the custom format
fmt_eng = Engine.from_schema(
    {"properties": {"lang": {"format": "even-length"}}},
    row_id="doc_id", assert_format=True)
fmt_eng.validate(docs).summary().show()
spark.stop()
