"""Source abstraction: Iceberg when available, parquet otherwise.

The production target is Iceberg (north_rule); this sandbox has no
Iceberg runtime jars, so the reader degrades to parquet with the same
call shape.  Partition-pruning behavior is equivalent for the engine's
purposes: both push `partition_col IN (...)` filters to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, location: str, *,
               fmt: str = "auto") -> DataFrame:
    """``location`` is an Iceberg table identifier (``catalog.db.tbl``),
    a parquet path, or a JSON/JSONL/CSV file — boon's CLI validates raw
    JSON instance documents (cli/src/main.rs:231-276); newline-delimited
    JSON through ``spark.read.json`` is the distributed re-expression of
    that workflow.  ``fmt='auto'`` prefers Iceberg when the runtime has
    it and the location looks like a table identifier, then dispatches
    on the file extension (default parquet)."""
    if fmt == "iceberg" or (fmt == "auto" and "/" not in location
                            and iceberg_available(spark)):
        return spark.read.format("iceberg").load(location)
    low = location.rstrip("/").lower()
    if fmt == "json" or (fmt == "auto" and
                         low.endswith((".json", ".jsonl", ".ndjson"))):
        # multiLine=false: one JSON document per line (JSONL), the
        # splittable layout — a single giant multi-line document cannot
        # be parallelized and is not a 10^12-row shape
        return spark.read.json(location)
    if fmt == "csv" or (fmt == "auto" and low.endswith(".csv")):
        return spark.read.option("header", "true") \
            .option("inferSchema", "true").csv(location)
    return spark.read.parquet(location)
