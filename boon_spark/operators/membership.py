"""Approximate membership (Bloom filter) over a key column: build a
deterministic bitmap from a member table, test any corpus against it
row-locally.

The 100 TB shape this exists for: "drop every document whose key is in
this big blocklist / seen-set" where the member set is large (10^6–10^9
keys — too big for an IN-set literal) but the corpus is enormous.  A
join answers it with a corpus-wide shuffle; a broadcast Bloom filter
answers it with a pure Arrow-batched map over the scan — zero corpus
shuffle, one small aggregation over the member table, and a fixed
false-positive rate that is FINE for the standard uses (a blocklist FP
drops one extra doc; a seen-set FP re-checks one key exactly).

Spark's built-in ``df.stat.bloomFilter`` is implementation-defined
murmur hashing — unusable for cross-engine verification.  This bloom is
deterministic end to end: bit positions are the md5 hash family
(:func:`..dedup._hash_shingle` — ``hash(key || '#i·salt') % m_bits``
for i = 0..k-1), so DuckDB builds the IDENTICAL filter from the same
member table and the gate compares engine vs oracle bit-for-bit,
false positives included.

Build shape: the member scan explodes to k bit positions per key
(8-byte rows), then ONE ``bit_or`` aggregation packs them into
``m_bits/64`` words — the only exchange, carrying at most
``m_bits/64`` rows (loud ``ValueError`` above ``max_bits``; 2^27 bits
= 16 MiB bitmap ≈ 1% FP at 10^7 keys with k=7).  Test shape: the
bitmap rides to executors as a broadcast numpy array; the check is a
vectorized pandas UDF (k md5s per row — same per-row cost class as
the shingling family).

Sizing (standard formulas): FP rate ≈ (1 - e^(-k·n/m))^k; optimal
k = (m/n)·ln 2.  :func:`bloom_stats` reports the measured fill ratio
so the estimate can be checked against reality.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _hash_shingle

__all__ = ["build_bloom", "might_contain", "bloom_stats",
           "membership_report"]

#: salt family base separating bloom hashes from every other md5 family
BLOOM_SALT = 12721


def _pos_expr(key: Column, i: int, m_bits: int, salt: int) -> Column:
    """Bit position ``i`` of a key — the ONE position definition
    (build, test UDF, and the DuckDB oracle all mirror it):
    ``md5hash(key || '#' || (salt + 7·i)) % m_bits``."""
    return _hash_shingle(key, salt + 7 * i) % m_bits


def build_bloom(members: DataFrame, *, key_col: str = "doc_id",
                m_bits: int = 1 << 16, k_hashes: int = 4,
                salt: int = BLOOM_SALT,
                max_bits: int = 1 << 27) -> dict:
    """Deterministic Bloom filter of ``members[key_col]`` (keys cast to
    string; NULL keys are excluded — a NULL is "no key", same as every
    hash-family operator).  Returns a dict model: ``{"m_bits",
    "k_hashes", "salt", "n_set_bits", "words": np.ndarray<uint64>}``,
    broadcast-ready for :func:`might_contain`.

    ``m_bits`` must be a multiple of 64 and at most ``max_bits`` (loud
    ValueError — a bitmap the driver can't hold should never be built
    silently).  The member scan is aggregated into ``m_bits/64``
    bit-or words; only those words come back to the driver.
    """
    if m_bits < 64 or m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, "
                         f"got {m_bits}")
    if m_bits > max_bits:
        raise ValueError(
            f"m_bits={m_bits} exceeds max_bits={max_bits} — a "
            f"{m_bits // 8 // (1 << 20)} MiB bitmap; raise max_bits "
            f"only if the driver and executors can hold it")
    if k_hashes < 1:
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes}")
    key = F.col(key_col).cast("string")
    pos = (members
           .filter(key.isNotNull())
           .select(F.explode(F.array(*[
               _pos_expr(key, i, m_bits, salt)
               for i in range(k_hashes)])).alias("p")))
    words = (pos
             .groupBy((F.col("p") / 64).cast("long").alias("w"))
             # pyspark's F.shiftleft only takes a literal shift — the
             # SQL form accepts a column
             .agg(F.bit_or(F.expr("shiftleft(1L, cast(p % 64 as int))"))
                  .alias("bits"))
             .collect())
    arr = np.zeros(m_bits // 64, dtype=np.uint64)
    for r in words:
        arr[int(r["w"])] = np.uint64(int(r["bits"]) & ((1 << 64) - 1))
    n_set = int(sum(bin(int(x)).count("1") for x in arr))
    return {"m_bits": m_bits, "k_hashes": k_hashes, "salt": salt,
            "n_set_bits": n_set, "words": arr}


def _py_positions(key: str, m_bits: int, k_hashes: int,
                  salt: int) -> list:
    """Driver/worker-side mirror of :func:`_pos_expr` (15-hex-digit md5
    prefix as an integer — exactly ``_hash_shingle``)."""
    out = []
    for i in range(k_hashes):
        h = hashlib.md5(
            f"{key}#{salt + 7 * i}".encode()).hexdigest()[:15]
        out.append(int(h, 16) % m_bits)
    return out


def might_contain(df: DataFrame, bloom: dict, *,
                  key_col: str = "doc_id",
                  out_col: str = "maybe_member") -> DataFrame:
    """``df`` plus a boolean ``out_col``: True iff every bloom bit of
    the key is set (NULL keys test NULL — three-valued like every
    hash-family operator).  The bitmap rides to executors via a Spark
    broadcast; the check is an Arrow-batched pandas UDF (k md5s per
    row, vectorized bit test against the shared numpy bitmap) — zero
    shuffle, the corpus never moves.
    """
    m, k, salt = bloom["m_bits"], bloom["k_hashes"], bloom["salt"]
    b_words = df.sparkSession.sparkContext.broadcast(bloom["words"])

    @F.pandas_udf("boolean")
    def _check(keys: pd.Series) -> pd.Series:
        words = b_words.value
        out = []
        for key in keys:
            if key is None:
                out.append(None)
                continue
            hit = True
            for p in _py_positions(str(key), m, k, salt):
                if not (int(words[p >> 6]) >> (p & 63)) & 1:
                    hit = False
                    break
            out.append(hit)
        return pd.Series(out, dtype=object)

    return df.withColumn(out_col, _check(F.col(key_col).cast("string")))


def bloom_stats(bloom: dict) -> dict:
    """Audit companion: measured fill ratio and the implied
    false-positive estimate ``fill^k`` (a FILTER-side property —
    exact for the bitmap at hand, no corpus needed)."""
    m, k = bloom["m_bits"], bloom["k_hashes"]
    fill = bloom["n_set_bits"] / m
    return {"m_bits": m, "k_hashes": k, "n_set_bits": bloom["n_set_bits"],
            "fill_ratio": fill, "fp_estimate": math.pow(fill, k)}


def membership_report(df: DataFrame, members: DataFrame, *,
                      key_col: str = "doc_id",
                      m_bits: int = 1 << 16, k_hashes: int = 4,
                      salt: int = BLOOM_SALT) -> DataFrame:
    """End-to-end audit over a corpus: one row ``(n_keys, n_maybe,
    n_true, n_false_pos)`` — bloom verdict counts vs EXACT membership
    (left-anti-join ground truth).  ``n_false_pos`` is deterministic
    (the bloom is), so the row is oracle-comparable bit-for-bit; at
    production scale run it on a sample to price the FP rate before
    trusting the filter alone.  NULL keys are excluded from all four
    counts (they test NULL, not False)."""
    bloom = build_bloom(members, key_col=key_col, m_bits=m_bits,
                        k_hashes=k_hashes, salt=salt)
    checked = might_contain(df, bloom, key_col=key_col)
    truth = members.select(
        F.col(key_col).cast("string").alias("_mk")).distinct()
    key = F.col(key_col).cast("string")
    j = (checked.filter(key.isNotNull())
         .join(truth, key == F.col("_mk"), "left")
         .select(F.col("maybe_member").alias("_maybe"),
                 F.col("_mk").isNotNull().alias("_true")))
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(F.when(F.col("_maybe"), 1).otherwise(0)).cast("long")
        .alias("n_maybe"),
        F.sum(F.when(F.col("_true"), 1).otherwise(0)).cast("long")
        .alias("n_true"),
        F.sum(F.when(F.col("_maybe") & ~F.col("_true"), 1).otherwise(0))
        .cast("long").alias("n_false_pos"))


# ----------------------------------------------------------------- #
# DuckDB oracle generators                                            #
# ----------------------------------------------------------------- #

#: one bit position in DuckDB — the _hash_shingle idiom over {key}
_POS_SQL = ("CAST(concat('0x', substr(md5(concat({key}, '#', "
            "CAST({salt} + 7 * i AS VARCHAR))), 1, 15)) AS BIGINT) "
            "% {m}")


def membership_report_oracle_sql(*, members_sql: str, corpus_sql: str,
                                 key_sql: str = "doc_id",
                                 m_bits: int = 1 << 16,
                                 k_hashes: int = 4,
                                 salt: int = BLOOM_SALT) -> str:
    """Bit-exact reproduction of :func:`membership_report`: the oracle
    builds the SAME bloom (distinct bit positions of the member keys)
    and declares a corpus key "maybe" iff all ``k_hashes`` of its
    positions are present — false positives reproduce exactly.

    ``members_sql`` / ``corpus_sql`` are full SELECTs yielding a
    ``{key_sql}`` column."""
    pos = _POS_SQL.format(key=f"CAST({key_sql} AS VARCHAR)",
                          salt=salt, m=m_bits)
    return f"""
        WITH mem AS ({members_sql}),
        corp AS ({corpus_sql}),
        bits AS (
          SELECT DISTINCT {pos} AS p
          FROM mem, range({k_hashes}) t(i)
          WHERE {key_sql} IS NOT NULL
        ), cand AS (
          SELECT CAST({key_sql} AS VARCHAR) AS key
          FROM corp WHERE {key_sql} IS NOT NULL
        ), verdict AS (
          SELECT key,
                 (SELECT count(*) FROM range({k_hashes}) t(i)
                  WHERE ({_POS_SQL.format(key='key', salt=salt,
                                          m=m_bits)})
                        IN (SELECT p FROM bits)) = {k_hashes} AS maybe,
                 key IN (SELECT DISTINCT CAST({key_sql} AS VARCHAR)
                         FROM mem WHERE {key_sql} IS NOT NULL) AS truth
          FROM cand
        )
        SELECT CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_maybe,
               CAST(sum(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_true,
               CAST(sum(CASE WHEN maybe AND NOT truth THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_false_pos
        FROM verdict
    """
