"""Deterministic cardinality / frequency sketches: HyperLogLog distinct
counts and Count-Min frequency estimates, integer-exact and
cross-engine reproducible.

The 100 TB shapes these exist for:

- **HLL**: "how many distinct doc_ids / URLs / token k-grams are in
  this corpus" without the full-width shuffle an exact
  ``count(distinct)`` needs.  Spark's ``approx_count_distinct`` is
  implementation-defined (its HLL++ register hashing is not
  reproducible outside the JVM), so runs can't be verified against
  another engine and reruns of *sampled* audits can't be compared.
  This HLL is the md5 hash family end to end: DuckDB builds the SAME
  registers from the same keys and the estimate reproduces bit-exactly
  — including its error.
- **CMS**: "estimated frequency of any key, from a sketch whose size
  is fixed" — the shuffle is bounded by the SKETCH (``depth × width``
  cells after map-side combine), not by the number of distinct keys,
  which is what makes it viable where a per-key ``groupBy`` is not.
  The classic Count-Min guarantee holds and is oracle-verified:
  ``estimate >= exact`` always, with overestimation only from hash
  collisions — collisions the DuckDB oracle reproduces exactly.

Integer-exactness (the repo's oracle-parity rule — no raw floats in
compared output):

- HLL registers are max-of-rho integers.  The harmonic sum is kept as
  the EXACT integer ``S = Σ_j 2^(R+1-M_j)`` (R = 60-p remaining hash
  bits; empty registers contribute ``2^(R+1)``), which fits int64 for
  p >= 11.  The raw estimate ``alpha·m²/Σ2^(-M_j)`` becomes one exact
  integer floor-division in decimal(38,0): ``alpha_num·m²·2^(R+1) DIV
  (alpha_den·S)`` with alpha rendered as an exact integer fraction in
  BOTH engines.  The float bias corrections (linear counting) are
  reported alongside for users but are NOT part of compared output.
- CMS cells are exact integer counts; estimates are integer minima.

Reference semantics: the sketch layer extends boon's per-partition
column-stats surface (SURVEY.md §2.6 — approx-distinct audit) the way
``bloom_member`` extends membership; boon itself (a row-local JSON
validator) has no analogue to copy.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _hash_shingle

__all__ = ["hll_registers", "hll_report", "hll_report_oracle_sql",
           "build_cms", "cms_estimate", "cms_topk_report",
           "cms_topk_oracle_sql"]

#: salt family bases — distinct from BLOOM_SALT (12721) and every
#: other md5 family in dedup/tokens
HLL_SALT = 40427
CMS_SALT = 50923

#: the md5 hash family is 15 hex digits = 60 bits
_HASH_BITS = 60


def _alpha_fraction(m: int) -> tuple[int, int]:
    """HLL bias constant alpha_m as an EXACT integer fraction (ppb),
    computed once in Python and rendered into both engines."""
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    return round(alpha * 10**9), 10**9


def _rho_thresholds(r_bits: int) -> list[int]:
    """Descending powers of two partitioning the r_bits-wide remainder
    into leading-zero classes — the ONE rho definition both engines
    render from."""
    return [1 << (r_bits - 1 - i) for i in range(r_bits)]


def _rho_col(w: Column, r_bits: int) -> Column:
    """rho = leading zeros of the r_bits-wide remainder + 1, as a pure
    integer when-chain (no log2 — float logs round unpredictably at
    power-of-two boundaries)."""
    expr = F.lit(r_bits + 1)  # w == 0: all r_bits are "zeros"
    for rho, thr in reversed(list(enumerate(_rho_thresholds(r_bits), 1))):
        expr = F.when(w >= F.lit(thr), F.lit(rho)).otherwise(expr)
    return expr


def hll_registers(df: DataFrame, *, key_col: str, p: int = 12,
                  salt: int = HLL_SALT) -> DataFrame:
    """The m = 2^p HLL registers of ``df[key_col]`` (NULL keys are
    excluded — "no key", like every hash-family operator): one row per
    OCCUPIED register ``(bucket, rho)`` where rho = max over keys of
    (leading zeros of the remaining 60-p hash bits) + 1.

    One ``groupBy(bucket).max`` — the only exchange, carrying at most
    m rows after map-side combine regardless of corpus size.
    """
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    m = 1 << p
    r_bits = _HASH_BITS - p
    key = F.col(key_col).cast("string")
    h = _hash_shingle(key, salt)
    # h is 60 bits — beyond double precision, so the bucket/remainder
    # split must stay integral: h % 2^p and h >> p (h >= 0)
    w = F.shiftrightunsigned(h, p)
    return (df.filter(key.isNotNull())
              .select((h % m).alias("bucket"),
                      _rho_col(w, r_bits).alias("rho"))
              .groupBy("bucket")
              .agg(F.max("rho").alias("rho")))


def hll_report(df: DataFrame, *, key_col: str, p: int = 12,
               salt: int = HLL_SALT) -> DataFrame:
    """One-row HLL cardinality report with integer-exact internals:

    - ``n_occupied``: registers hit (bigint)
    - ``n_zero``: empty registers = m - n_occupied (bigint)
    - ``harmonic_scaled``: S = Σ_j 2^(R+1-M_j) exactly (bigint;
      R = 60-p, empty registers contribute 2^(R+1))
    - ``est_raw``: floor(alpha_num·m²·2^(R+1) / (alpha_den·S)) — the
      raw HLL estimate as ONE exact decimal(38,0) floor division
    - ``est_hll`` (double): the user-facing estimate with the standard
      small-range linear-counting correction — informational, NOT for
      oracle comparison (contains ln()).

    Compared gate output should select the four integer columns.
    """
    m = 1 << p
    r_bits = _HASH_BITS - p
    alpha_num, alpha_den = _alpha_fraction(m)
    regs = hll_registers(df, key_col=key_col, p=p, salt=salt)
    # S = Σ 2^(R+1-M_j) <= m·2^(R+1) = 2^p·2^(61-p) = 2^61 for EVERY
    # allowed p — always inside int64, no guard needed
    # occupied-register partial sum: Σ 2^(R+1-M_j) — shiftleft needs a
    # literal count in pyspark, so route through the SQL form
    part = regs.agg(
        F.count(F.lit(1)).cast("long").alias("n_occupied"),
        F.sum(F.expr(f"shiftleft(1L, {r_bits + 1} - rho)"))
        .cast("long").alias("s_occ"))
    empty_term = 1 << (r_bits + 1)
    out = part.select(
        "n_occupied",
        (F.lit(m) - F.col("n_occupied")).cast("long").alias("n_zero"),
        (F.coalesce(F.col("s_occ"), F.lit(0))
         + (F.lit(m) - F.col("n_occupied")) * F.lit(empty_term))
        .cast("long").alias("harmonic_scaled"))
    # exact integral division (matches DuckDB's HUGEINT `//`): Spark's
    # `div` on decimals returns the integral quotient without the
    # rounding a decimal `/` could introduce at precision 38
    num = alpha_num * m * m * (1 << (r_bits + 1))
    out = out.withColumn(
        "est_raw",
        F.expr(f"CAST('{num}' AS DECIMAL(38,0)) div "
               f"(CAST({alpha_den} AS DECIMAL(38,0)) "
               f"* CAST(harmonic_scaled AS DECIMAL(38,0)))")
        .cast("long"))
    # user-facing corrected estimate (float; informational only)
    lc = F.when(
        (F.col("est_raw") <= F.lit(int(2.5 * m)))
        & (F.col("n_zero") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("n_zero")))
    return out.withColumn(
        "est_hll", F.coalesce(lc, F.col("est_raw").cast("double")))


def hll_report_oracle_sql(*, corpus_sql: str, key_sql: str,
                          p: int = 12, salt: int = HLL_SALT) -> str:
    """DuckDB reproduction of :func:`hll_report`'s integer columns —
    same md5 hash, same rho when-chain, same decimal floor division
    (DuckDB CAST(double AS BIGINT) rounds, so the division stays in
    HUGEINT/DECIMAL and uses // semantics via CAST of floor)."""
    m = 1 << p
    r_bits = _HASH_BITS - p
    alpha_num, alpha_den = _alpha_fraction(m)
    h = (f"CAST(concat('0x', substr(md5(concat(CAST({key_sql} AS "
         f"VARCHAR), '#{salt}')), 1, 15)) AS BIGINT)")
    arms = " ".join(
        f"WHEN w >= {thr} THEN {rho}"
        for rho, thr in enumerate(_rho_thresholds(r_bits), 1))
    empty_term = 1 << (r_bits + 1)
    num = alpha_num * m * m * (1 << (r_bits + 1))
    return f"""
        WITH keyed AS (
          SELECT {h} % {m} AS bucket, {h} // {m} AS w
          FROM ({corpus_sql}) WHERE {key_sql} IS NOT NULL
        ), regs AS (
          SELECT bucket,
                 max(CASE {arms} ELSE {r_bits + 1} END) AS rho
          FROM keyed GROUP BY bucket
        ), part AS (
          SELECT CAST(count(*) AS BIGINT) AS n_occupied,
                 CAST(sum(CAST(1 AS BIGINT) << ({r_bits + 1} - rho))
                      AS BIGINT) AS s_occ
          FROM regs
        )
        SELECT n_occupied,
               CAST({m} - n_occupied AS BIGINT) AS n_zero,
               CAST(coalesce(s_occ, 0)
                    + ({m} - n_occupied) * CAST({empty_term} AS BIGINT)
                    AS BIGINT) AS harmonic_scaled,
               CAST(CAST({num} AS HUGEINT)
                    // (CAST({alpha_den} AS HUGEINT)
                        * (coalesce(s_occ, 0)
                           + ({m} - n_occupied)
                             * CAST({empty_term} AS BIGINT)))
                    AS BIGINT) AS est_raw
        FROM part
    """


# ----------------------------------------------------------------- #
# Count-Min sketch                                                    #
# ----------------------------------------------------------------- #


def _cms_pos(key: Column, i: int, width: int, salt: int) -> Column:
    """Row ``i``'s cell for a key — the ONE position definition (build,
    estimate UDF, and the DuckDB oracle all mirror it)."""
    return _hash_shingle(key, salt + 7 * i) % width


def build_cms(df: DataFrame, *, key_col: str, depth: int = 4,
              width: int = 1 << 10, salt: int = CMS_SALT,
              weight_col: str | None = None,
              max_cells: int = 1 << 22) -> dict:
    """Deterministic Count-Min sketch of ``df[key_col]`` occurrences
    (or of ``weight_col`` sums; NULL keys AND NULL weights are
    excluded — "no key / no contribution", the hash-family contract).
    Returns ``{"depth", "width", "salt", "total",
    "cells": np.ndarray<int64>[depth, width]}``.

    Scale shape: each row explodes to ``depth`` (row, pos) cells and
    ONE count aggregation packs them — after map-side combine the
    exchange carries at most ``partitions × depth × width`` rows, so
    the shuffle is bounded by the SKETCH size, never by the number of
    distinct keys (the whole point vs an exact per-key groupBy).
    ``depth × width`` must stay under ``max_cells`` (loud ValueError —
    the cells come back to the driver and ride out as a broadcast).
    """
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    if width < 2:
        raise ValueError(f"width must be >= 2, got {width}")
    if depth * width > max_cells:
        raise ValueError(
            f"depth*width={depth * width} exceeds max_cells={max_cells} "
            f"— a {depth * width * 8 // (1 << 20)} MiB sketch; raise "
            f"max_cells only if driver and executors can hold it")
    key = F.col(key_col).cast("string")
    wcol = (F.col(weight_col).cast("long") if weight_col
            else F.lit(1).cast("long"))
    base = df.filter(key.isNotNull())
    if weight_col:
        # NULL weights are excluded like NULL keys (a NULL-weight row
        # has no defined contribution); without this, a cell fed only
        # NULL weights sums to NULL and the driver unpack crashes
        base = base.filter(F.col(weight_col).isNotNull())
    rows = (base
              .select(wcol.alias("n"),
                      F.explode(F.array(*[
                          F.struct(F.lit(i).alias("i"),
                                   _cms_pos(key, i, width, salt)
                                   .alias("p"))
                          for i in range(depth)])).alias("c"))
              .groupBy(F.col("c.i").alias("i"), F.col("c.p").alias("p"))
              .agg(F.sum("n").alias("n"))
              .collect())
    cells = np.zeros((depth, width), dtype=np.int64)
    for r in rows:
        cells[int(r["i"]), int(r["p"])] = int(r["n"])
    return {"depth": depth, "width": width, "salt": salt,
            "total": int(cells[0].sum()), "cells": cells}


def _py_cms_positions(key: str, depth: int, width: int,
                      salt: int) -> list:
    out = []
    for i in range(depth):
        h = hashlib.md5(
            f"{key}#{salt + 7 * i}".encode()).hexdigest()[:15]
        out.append(int(h, 16) % width)
    return out


def cms_estimate(df: DataFrame, cms: dict, *, key_col: str,
                 out_col: str = "est_n") -> DataFrame:
    """``df`` plus the Count-Min frequency estimate of each key:
    ``min_i cells[i][pos_i(key)]`` — an upper bound on the true count,
    exact when no hash collides.  The cells ride out as a broadcast
    numpy array; the lookup is an Arrow-batched pandas UDF — zero
    shuffle.  NULL keys estimate NULL."""
    d, w, salt = cms["depth"], cms["width"], cms["salt"]
    b_cells = df.sparkSession.sparkContext.broadcast(cms["cells"])

    @F.pandas_udf("long")
    def _est(keys: pd.Series) -> pd.Series:
        cells = b_cells.value
        out = []
        for key in keys:
            if key is None:
                out.append(None)
                continue
            out.append(min(
                int(cells[i, p]) for i, p in
                enumerate(_py_cms_positions(str(key), d, w, salt))))
        return pd.Series(out, dtype=object)

    return df.withColumn(out_col, _est(F.col(key_col).cast("string")))


def cms_topk_report(df: DataFrame, k: int, *, key_col: str,
                    depth: int = 4, width: int = 1 << 10,
                    salt: int = CMS_SALT) -> DataFrame:
    """Heavy-hitters audit: top-``k`` keys by EXACT count with their
    CMS estimates side by side — ``(key, exact_n, est_n)``, ranked by
    (exact desc, key asc).  ``est_n >= exact_n`` always (the Count-Min
    guarantee, asserted by the oracle bit-for-bit since collisions are
    deterministic).  The exact side is a per-key count over the SAME
    keys being audited; the take rides :func:`..cleaning.ranked_topk`
    (TakeOrderedAndProject — the counts frame never moves to one
    partition)."""
    from .cleaning import ranked_topk
    cms = build_cms(df, key_col=key_col, depth=depth, width=width,
                    salt=salt)
    key = F.col(key_col).cast("string")
    exact = (df.filter(key.isNotNull())
               .groupBy(key.alias("key"))
               .agg(F.count(F.lit(1)).cast("long").alias("n")))
    top = ranked_topk(exact, int(k), key_col="key")
    return (cms_estimate(top, cms, key_col="key")
            .select("key", F.col("n").alias("exact_n"),
                    F.col("est_n").cast("long").alias("est_n"),
                    F.col("rank").cast("long").alias("rank")))


def cms_topk_oracle_sql(*, corpus_sql: str, key_sql: str, k: int,
                        depth: int = 4, width: int = 1 << 10,
                        salt: int = CMS_SALT) -> str:
    """Bit-exact DuckDB reproduction of :func:`cms_topk_report` — the
    oracle builds the SAME cells (group by (i, pos)) and takes the same
    min over depth lookups, so collision overestimates reproduce
    exactly."""
    def pos(key: str, i_expr: str) -> str:
        return (f"CAST(concat('0x', substr(md5(concat({key}, '#', "
                f"CAST({salt} + 7 * {i_expr} AS VARCHAR))), 1, 15)) "
                f"AS BIGINT) % {width}")

    return f"""
        WITH corp AS (
          SELECT CAST({key_sql} AS VARCHAR) AS key
          FROM ({corpus_sql}) WHERE {key_sql} IS NOT NULL
        ), cells AS (
          SELECT i, {pos('key', 'i')} AS p,
                 CAST(count(*) AS BIGINT) AS n
          FROM corp, range({depth}) t(i)
          GROUP BY i, p
        ), exact AS (
          SELECT key, CAST(count(*) AS BIGINT) AS exact_n
          FROM corp GROUP BY key
        ), ranked AS (
          SELECT key, exact_n,
                 row_number() OVER (ORDER BY exact_n DESC, key ASC)
                   AS rank
          FROM exact
        ), top AS (
          SELECT * FROM ranked WHERE rank <= {int(k)}
        ), est AS (
          -- inner join is exact here (every corpus key contributed to
          -- all depth cells, so a match always exists) — and DuckDB
          -- rejects correlated OUTER joins but accepts this form
          SELECT top.key, min(c.n) AS est_n
          FROM top, range({depth}) t(i), cells c
          WHERE c.i = t.i AND c.p = {pos('top.key', 't.i')}
          GROUP BY top.key
        )
        SELECT top.key, top.exact_n,
               CAST(est.est_n AS BIGINT) AS est_n,
               CAST(top.rank AS BIGINT) AS rank
        FROM top JOIN est ON top.key = est.key
    """
