"""Deterministic hash-based sampling and dataset splitting.

The pipeline staple Spark's own ``DataFrame.sample`` cannot provide:
``sample`` draws from a per-partition RNG seeded by (seed, partition
index), so its output CHANGES whenever the partitioning does — a
repartition, a cluster resize, or AQE coalescing silently reshuffles
which rows are "sampled".  At 10^12 rows that makes reruns
irreproducible and train/test splits leaky.

Here membership is a pure function of the ROW KEY: a 60-bit md5-derived
hash mapped to a uniform [0, 1) double, compared against the fraction.
Properties that matter at scale:

- **rerun-stable and partitioning-independent** — the same key lands in
  the same split on any cluster size, any engine (the DuckDB oracles
  reproduce membership bit-for-bit; so would pandas).
- **zero shuffle** — a codegen'd filter/projection on the scan.
- **consistent across tables** — sampling two tables by the same join
  key yields aligned samples (the classic "sample the users, keep all
  their events" pattern).
- **nested splits don't collide** — different ``seed`` values give
  independent hashes; the same seed at a smaller fraction gives a
  SUBSET (fraction 0.1 ⊂ fraction 0.2), which is exactly what staged
  scale-up experiments want.

The md5 family is the cross-engine-reproducible default (same contract
as :mod:`dedup`'s oracle-paired hash family); ``hash_family="xxhash64"``
is the cheaper JVM-only variant for when reproducibility outside Spark
doesn't matter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 2^60 — the hash is 15 hex digits = 60 bits, so hash / 2^60 ∈ [0, 1).
_HASH_SPACE = float(1 << 60)


def _key_hash(key: Column, seed: int, hash_family: str) -> Column:
    if hash_family == "md5":
        return F.conv(F.substring(
            F.md5(F.concat(key.cast("string"), F.lit(f"#{seed}"))),
            1, 15), 16, 10).cast("long")
    if hash_family == "xxhash64":
        # shift into non-negative 60-bit space to share the uniform map
        return F.shiftrightunsigned(
            F.xxhash64(key.cast("string"), F.lit(seed)), 4)
    raise ValueError(f"unknown hash_family: {hash_family!r}")


def sample_uniform(key: Column, *, seed: int = 0,
                   hash_family: str = "md5") -> Column:
    """Deterministic uniform [0, 1) double for a row key: an exact
    integer divided by 2^60 — the same IEEE division in any engine."""
    return _key_hash(key, seed, hash_family) / F.lit(_HASH_SPACE)


def hash_sample(df: DataFrame, fraction: float, *, key_col: str,
                seed: int = 0, hash_family: str = "md5") -> DataFrame:
    """Keep rows whose key-hash uniform falls below ``fraction``.

    A plain filter — no shuffle, no RNG state, membership independent of
    partitioning and cluster size.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(
        sample_uniform(F.col(key_col), seed=seed,
                       hash_family=hash_family) < F.lit(float(fraction)))


def stratified_sample(df: DataFrame, fractions: dict, *, strata_col: str,
                      key_col: str, seed: int = 0,
                      default_fraction: float = 0.0,
                      hash_family: str = "md5") -> DataFrame:
    """Per-stratum ``hash_sample``: ``fractions`` maps stratum value →
    keep fraction; unlisted strata use ``default_fraction``.

    The per-row threshold is a when-chain over the (small, driver-known)
    strata map — still a single codegen'd filter, no shuffle.  Because
    every stratum shares one hash, raising one stratum's fraction only
    ADDS rows (monotone refreshes).
    """
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be in "
                             f"[0, 1], got {f}")
    thr = F.lit(float(default_fraction))
    for s, f in fractions.items():
        thr = F.when(F.col(strata_col) == F.lit(s),
                     F.lit(float(f))).otherwise(thr)
    return df.filter(
        sample_uniform(F.col(key_col), seed=seed,
                       hash_family=hash_family) < thr)


def split_assign(df: DataFrame, weights: dict, *, key_col: str,
                 seed: int = 0, split_col: str = "split",
                 hash_family: str = "md5") -> DataFrame:
    """Add a deterministic split label: ``weights`` maps label → weight
    (normalized to sum 1); the key-hash uniform is cut at the cumulative
    bounds IN DICT ORDER (Python dicts preserve insertion order, so
    ``{"train": .9, "val": .05, "test": .05}`` means train = [0, .9)).

    The same key always lands in the same split — across reruns,
    repartitions, engines, and even across TABLES keyed by the same id,
    which is what keeps a user-keyed train/test split leak-free when new
    event tables join the pipeline.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    neg = {k: v for k, v in weights.items() if v < 0}
    if neg:
        # a negative weight makes the cumulative bounds non-monotone:
        # the earlier label's arm absorbs the later ones silently
        raise ValueError(f"weights must be >= 0, got {neg}")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive number")
    u = sample_uniform(F.col(key_col), seed=seed, hash_family=hash_family)
    labels = list(weights)
    expr = F.lit(labels[-1])  # last label absorbs u up to 1.0
    cum = 0.0
    bounds = []
    for lbl in labels[:-1]:
        cum += float(weights[lbl]) / total
        bounds.append((lbl, cum))
    for lbl, bound in reversed(bounds):
        expr = F.when(u < F.lit(bound), F.lit(lbl)).otherwise(expr)
    return df.withColumn(split_col, expr)


def group_cap(df: DataFrame, k: int, *, group_col: str, key_col: str,
              seed: int = 0, hash_family: str = "md5",
              rank_col: str = "cap_rank") -> DataFrame:
    """Keep at most ``k`` rows per group, chosen deterministically by
    key-hash rank — the per-domain / per-source cap every web-corpus
    curation pipeline applies (cap boilerplate-heavy domains before
    they dominate the token budget).

    Selection is ``row_number`` over (group, ORDER BY key-hash, key):
    the kept subset is a pure function of the keys, so it is rerun- and
    partitioning-stable, and raising ``k`` only ADDS rows (the rank of
    a surviving row never changes).  Ties on the 60-bit hash are broken
    by ascending key — the repo-wide oracle-parity rule.

    Scale: ONE shuffle on ``group_col``; the within-group sort is
    Spark's spillable window sort, so a hot group costs time on one
    task, never memory.  If a single group can exceed one task's
    time budget (a 10^9-doc domain), pre-thin it first with
    ``hash_sample`` at ``fraction ≈ safety·k/count`` and re-apply this
    exact cap to the survivors — the hash-rank ordering makes the
    two-stage result identical whenever the pre-thin keeps ≥ k rows.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql.window import Window
    h = _key_hash(F.col(key_col), seed, hash_family)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (df.withColumn(rank_col, F.row_number().over(w))
              .filter(F.col(rank_col) <= F.lit(int(k))))


def group_cap_oracle_sql(*, table_sql: str, k: int, group_sql: str,
                         key_sql: str, seed: int = 0,
                         rank_col: str = "cap_rank") -> str:
    """DuckDB subquery reproducing md5 ``group_cap`` membership
    bit-for-bit: same 60-bit integer hash, same (hash, key) ordering."""
    h = (f"CAST(concat('0x', substr(md5(concat(CAST({key_sql} AS "
         f"VARCHAR), '#{seed}')), 1, 15)) AS BIGINT)")
    return (f"(SELECT *, row_number() OVER (PARTITION BY {group_sql} "
            f"ORDER BY {h} ASC, {key_sql} ASC) AS {rank_col} "
            f"FROM {table_sql}) WHERE {rank_col} <= {int(k)}")


def _uniform_sql(key_sql: str, seed: int) -> str:
    return (f"(CAST(concat('0x', substr(md5(concat(CAST({key_sql} AS "
            f"VARCHAR), '#{seed}')), 1, 15)) AS BIGINT) "
            f"/ 1152921504606846976.0)")


def hash_sample_oracle_where(*, key_sql: str, fraction: float,
                             seed: int = 0) -> str:
    """DuckDB WHERE-clause reproducing md5 ``hash_sample`` membership
    bit-for-bit (same 60-bit integer, same IEEE division; fraction
    rendered via repr = shortest exact round-trip)."""
    return f"{_uniform_sql(key_sql, seed)} < {float(fraction)!r}"


def split_assign_oracle_case(*, key_sql: str, weights: dict,
                             seed: int = 0) -> str:
    """DuckDB CASE expression reproducing ``split_assign`` labels
    bit-for-bit — the cumulative bounds are computed HERE with the same
    Python float accumulation the Spark side uses, then rendered via
    repr, so both engines compare against identical doubles."""
    neg = {k: v for k, v in weights.items() if v < 0}
    if neg:
        raise ValueError(f"weights must be >= 0, got {neg}")
    total = float(sum(weights.values()))
    u = _uniform_sql(key_sql, seed)
    labels = list(weights)
    cum = 0.0
    arms = []

    def sq(lbl) -> str:  # '' escaping: labels are user strings
        return "'" + str(lbl).replace("'", "''") + "'"

    for lbl in labels[:-1]:
        cum += float(weights[lbl]) / total
        arms.append(f"WHEN {u} < {cum!r} THEN {sq(lbl)}")
    return ("CASE " + " ".join(arms) +
            f" ELSE {sq(labels[-1])} END")
