"""Per-row token-array equality vs a reference table — boon's deep
``equals`` (reference ``src/util.rs:348-388``) applied row-wise at table
scale (the input_hint invariant).

Scale notes: an equi-join on the key.  At 10^12 rows both sides are big —
this is a sort-merge/shuffled-hash join on ``doc_id`` (high-cardinality,
skew-free).  If both tables are bucketed by the key on disk (Iceberg
bucket(doc_id, N)), Spark elides the shuffle entirely — recommend that
layout in production.  The array comparison itself is a single JVM-side
``==`` on array columns (no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_equality(cur: DataFrame, ref: DataFrame, *, key: str = "doc_id",
                   columns: list[str] | None = None) -> DataFrame:
    """Violation rows where ``cur`` and ``ref`` disagree on ``columns``
    (default: all shared non-key columns), plus keys missing from ``ref``
    (reported once per row as ``/x-equality/_missing`` — an explicit
    ref-side marker, because ``~eqNullSafe(NULL, NULL)`` is false and a
    missing row whose compared columns are all NULL would otherwise pass
    silently)."""
    if columns is None:
        columns = [c for c in cur.columns
                   if c in set(ref.columns) and c != key]
    r = ref.select(key, F.lit(True).alias("_ref_present"),
                   *[F.col(c).alias(f"_ref_{c}") for c in columns])
    joined = cur.select(key, *columns).join(r, on=key, how="left")

    present = F.col("_ref_present").isNotNull()
    checks = [F.when(~present, F.struct(
        F.concat(F.lit("/"), F.col(key).cast("string"))
        .alias("instance_location"),
        F.lit("/x-equality/_missing").alias("keyword_location"),
        F.lit("key missing from reference").alias("error")))]
    for c in columns:
        mismatch = present & ~F.col(c).eqNullSafe(F.col(f"_ref_{c}"))
        checks.append(F.when(mismatch, F.struct(
            F.concat(F.lit("/"), F.col(key).cast("string"),
                     F.lit(f"/{c}")).alias("instance_location"),
            F.lit(f"/x-equality/{c}").alias("keyword_location"),
            F.lit(f"value differs from reference for column '{c}'")
            .alias("error"))))
    arr = F.filter(F.array(*checks), lambda v: v.isNotNull())
    return (joined.select(arr.alias("_viols"))
            .filter(F.size("_viols") > 0)
            .select(F.explode("_viols").alias("v"))
            .select("v.instance_location", "v.keyword_location", "v.error"))
