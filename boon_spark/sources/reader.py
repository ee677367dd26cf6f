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
    """``location`` is an Iceberg table identifier (``catalog.db.tbl``)
    or a parquet path.  ``fmt='auto'`` prefers Iceberg when the runtime
    has it and the location looks like a table identifier."""
    if fmt == "iceberg" or (fmt == "auto" and "/" not in location
                            and iceberg_available(spark)):
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)
