"""Row-level invariant checks expressed as SQL predicates.

The flagship use is the input_hint invariant ``n_tok == size(tokens)`` —
a row-local expression that rides the same single projection as the
keyword checks (no shuffle, codegen'd).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_invariants(df: DataFrame, invariants: list[dict], *,
                     row_id: Optional[str] = None) -> DataFrame:
    """``invariants``: list of ``{"name": str, "expr": sql_bool_expr}``.
    Returns violation rows (one per failed invariant per row)."""
    iloc = (F.concat(F.lit("/"), F.coalesce(F.col(row_id).cast("string"),
                                            F.lit("?")))
            if row_id else F.lit("/"))
    structs = []
    for inv in invariants:
        name, expr = inv["name"], inv["expr"]
        ok = F.coalesce(F.expr(expr), F.lit(False))
        structs.append(F.when(~ok, F.struct(
            iloc.alias("instance_location"),
            F.lit(f"/x-invariants/{name}").alias("keyword_location"),
            F.lit(f"invariant failed: {expr}").alias("error"))))
    arr = F.filter(F.array(*structs), lambda v: v.isNotNull())
    return (df.select(arr.alias("_viols"))
            .filter(F.size("_viols") > 0)
            .select(F.explode("_viols").alias("v"))
            .select("v.instance_location", "v.keyword_location", "v.error"))
