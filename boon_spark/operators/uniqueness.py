"""Table-level uniqueness — boon's ``uniqueItems``
(reference ``src/validator.rs:351-356``) lifted from array to table.

boon reports the first duplicate pair ``(i, j)`` (``UniqueItems { got: [i,
j] }``, ``src/lib.rs:503-505``); at table scale we report *every* occurrence
of every duplicated key, each violation naming the duplicate count and the
other occurrences' row ids — strictly more information, same contract.

Scale notes: one hash shuffle on the key (map-side partial count first).
doc_id-style keys are high-cardinality → naturally well-distributed; no
salting needed here (contrast drift.py).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_unique(df: DataFrame, cols: list[str], *,
                 row_id: Optional[str] = None,
                 max_examples: int = 5) -> DataFrame:
    """Violation rows for duplicated key tuples.

    Returns ``(instance_location, keyword_location, error, dup_count)``.
    """
    if isinstance(cols, str):
        cols = [cols]
    key = F.concat_ws("|", *[F.coalesce(F.col(c).cast("string"), F.lit("␀"))
                             for c in cols])
    kw_loc = "/x-unique/" + ",".join(cols)
    ids = F.col(row_id) if row_id else F.col(cols[0])
    grouped = (df
               .select(key.alias("_key"), ids.cast("string").alias("_rid"))
               .groupBy("_key")
               .agg(F.count(F.lit(1)).alias("dup_count"),
                    F.slice(F.collect_list("_rid"), 1, max_examples)
                    .alias("_rids"))
               .filter(F.col("dup_count") > 1))
    return grouped.select(
        F.concat(F.lit("/"), F.col("_key")).alias("instance_location"),
        F.lit(kw_loc).alias("keyword_location"),
        F.concat(F.lit("duplicate key: "), F.col("dup_count").cast("string"),
                 F.lit(" rows share this key (e.g. rows "),
                 F.array_join("_rids", ", "), F.lit(")")).alias("error"),
        F.col("dup_count"))
