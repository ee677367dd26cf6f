"""Source-weighted token-budget mixing (domain reweighting).

A training corpus is never used raw: sources are re-weighted to a
target token mixture (The Pile, LLaMA, and every data card publish one
— "67% web, 15% code, …").  This operator turns a target share table
into per-source deterministic sampling rates and applies them with the
:mod:`.sampling` hash filter, so the mix is reproducible, partitioning-
independent, and leak-free across reruns.

Rate construction: let ``tokens_s`` be the corpus token count of source
``s`` and ``share_s`` the (normalized) target share.  The largest
achievable output respecting the mixture is limited by the BINDING
source — the one whose corpus runs out first:

    c      = min_s  tokens_s / share_s        (the output token budget)
    rate_s = least(1.0,  (c * share_s) / tokens_s)

so the binding source keeps (essentially) everything and every other
source downsamples to match.  Rates are expected token rates; actual
kept tokens fluctuate around them (documents are kept whole — the audit
:func:`mix_stats` reports the achieved mixture in ppm).

Cross-engine bit-parity (the oracle rule): shares are normalized in
PYTHON and rendered via ``repr`` into both engines; every float step —
``tokens/share``, ``min``, ``(c*share)/tokens``, ``least(1.0, ·)``,
and the final ``uniform < rate`` comparison — is the same IEEE double
operation in the same order on both sides, so membership is
bit-identical.  Sources NOT in the target table are dropped (so is a
NULL source).  A target source absent from the corpus (or with zero
tokens) simply cannot contribute — it takes no part in the budget
``min`` and the achieved mixture renormalizes over the present sources
(documented behavior; check :func:`mix_stats` before training).

Scale shape (10^12 rows): one count/sum aggregation per source (tiny —
#sources rows), rates joined back as a BROADCAST, then a row-local
codegen'd hash filter on the scan.  The corpus shuffles zero times.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import (_uniform_sql, sample_uniform,
                       stratified_sample)

#: seed separating the mixing family's hash from other sampling uses
MIX_SEED = 7717


def _normalized_shares(targets: dict) -> dict:
    if not targets:
        raise ValueError("targets must be non-empty")
    bad = {s: w for s, w in targets.items() if not w > 0}
    if bad:
        raise ValueError(f"target shares must be > 0, got {bad}")
    total = float(sum(targets.values()))
    return {s: float(w) / total for s, w in targets.items()}


def source_token_rates(df: DataFrame, targets: dict, *,
                       strata_col: str = "source",
                       weight: Column) -> DataFrame:
    """Per-source sampling rates hitting the target mixture:
    ``(source, n_docs, n_tokens, rate)``.  ``weight`` is the per-row
    token-count expression (e.g. ``doc_len(F.col("text"))`` or
    ``F.size("tokens")``).  See the module docstring for the rate
    formula and the parity contract."""
    shares = _normalized_shares(targets)
    share = F.lit(None).cast("double")
    for s, w in shares.items():
        share = F.when(F.col(strata_col) == F.lit(s), F.lit(w)) \
            .otherwise(share)
    per = (df.select(F.col(strata_col).alias("source"),
                     weight.cast("long").alias("_w"))
           .groupBy("source")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.coalesce(F.sum("_w"), F.lit(0)).cast("long")
                .alias("n_tokens"))
           .withColumn("_share", share)
           .filter(F.col("_share").isNotNull() & (F.col("n_tokens") > 0)))
    budget = per.agg(F.min(F.col("n_tokens") / F.col("_share"))
                     .alias("_c"))
    return (per.crossJoin(F.broadcast(budget))
            .select("source", "n_docs", "n_tokens",
                    F.least(F.lit(1.0),
                            (F.col("_c") * F.col("_share"))
                            / F.col("n_tokens")).alias("rate")))


def token_budget_sample(df: DataFrame, targets: dict, *,
                        strata_col: str = "source",
                        key_col: str = "doc_id",
                        weight: Column, seed: int = MIX_SEED) -> DataFrame:
    """The mixed corpus: rows kept whole, per-source rates from
    :func:`source_token_rates` applied via the deterministic md5 hash
    filter (``sampling.sample_uniform``).  Returns ``df``'s rows (plus
    nothing) — sources outside ``targets`` are dropped."""
    rates = source_token_rates(df, targets, strata_col=strata_col,
                               weight=weight)
    u = sample_uniform(F.col(key_col), seed=seed)
    # internal alias: a user column named "rate" must survive untouched
    return (df.join(F.broadcast(rates.select(
        F.col("source").alias(strata_col),
        F.col("rate").alias("_mix_rate"))), strata_col)
        .filter(u < F.col("_mix_rate"))
        .drop("_mix_rate"))


def apply_token_budget(df: DataFrame, rates: dict, *,
                       strata_col: str = "source",
                       key_col: str = "doc_id",
                       seed: int = MIX_SEED) -> DataFrame:
    """Stateless application of PRECOMPUTED per-source rates (source →
    rate, e.g. ``source_token_rates(...)`` collected off a batch
    snapshot): a pure row-local filter, so it works unchanged on a
    STREAMING frame — the standard fit-on-batch / apply-on-stream
    pattern for keeping a live ingest on the target mixture.  Sources
    missing from ``rates`` are dropped (rate 0), matching
    :func:`token_budget_sample`'s treatment of untargeted sources."""
    bad = {s: r for s, r in rates.items()
           if not 0.0 <= float(r) <= 1.0}
    if bad:
        raise ValueError(f"rates must be in [0, 1], got {bad}")
    # delegate to the shared per-stratum hash filter (one definition of
    # the when-chain + uniform comparison); default_fraction=0.0 drops
    # unlisted sources, same as token_budget_sample's inner join
    return stratified_sample(df, {s: float(r) for s, r in rates.items()},
                             strata_col=strata_col, key_col=key_col,
                             seed=seed)


def mix_stats(df: DataFrame, targets: dict, *,
              strata_col: str = "source", key_col: str = "doc_id",
              weight: Column, seed: int = MIX_SEED) -> DataFrame:
    """Achieved-mixture audit of :func:`token_budget_sample`:
    ``(source, n_docs_kept, n_tokens_kept, achieved_ppm, target_ppm)``
    — both mixtures as integral parts-per-million.  ``target_ppm`` is
    ``floor(share * 1e6)`` over the FULL normalized target, computed in
    PYTHON and rendered as a literal (an in-engine renormalizing float
    SUM over per-source rows would be order-dependent and break
    bit-parity); when a target source is missing from the corpus the
    achieved column simply won't reach it — that gap is the audit
    signal."""
    kept = (token_budget_sample(df, targets, strata_col=strata_col,
                                key_col=key_col, weight=weight, seed=seed)
            .select(F.col(strata_col).alias("source"),
                    weight.cast("long").alias("_w")))
    per = (kept.groupBy("source")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs_kept"),
                F.coalesce(F.sum("_w"), F.lit(0)).cast("long")
                .alias("n_tokens_kept")))
    shares = _normalized_shares(targets)
    target_ppm = F.lit(None).cast("long")
    for s, w in shares.items():
        target_ppm = F.when(F.col("source") == F.lit(s),
                            F.lit(int(w * 1_000_000))).otherwise(target_ppm)
    tot = per.agg(
        F.coalesce(F.sum("n_tokens_kept"), F.lit(0)).alias("_tt"))
    from .packing import _div
    # decimal(38,0) BEFORE the *1e6: a kept corpus above ~9.2e12 tokens
    # would overflow the int64 multiply under ANSI mode (the quotient
    # itself is <= 1e6 — only the intermediate needs the width)
    ppm = _div(F.col("n_tokens_kept").cast("decimal(38,0)")
               * F.lit(1_000_000), F.col("_tt"))
    return (per.crossJoin(F.broadcast(tot))
            .select("source", "n_docs_kept", "n_tokens_kept",
                    F.when(F.col("_tt") > 0, ppm)
                    .otherwise(F.lit(0)).cast("long")
                    .alias("achieved_ppm"),
                    target_ppm.cast("long").alias("target_ppm")))


# ----------------------------------------------------------------- #
# DuckDB oracle generators                                           #
# ----------------------------------------------------------------- #


def _sq(s) -> str:
    """SQL single-quoted literal with '' escaping (a source named
    "o'reilly" must not break the generated oracle)."""
    return "'" + str(s).replace("'", "''") + "'"


def _share_case(targets: dict, col: str = "source") -> str:
    shares = _normalized_shares(targets)
    arms = " ".join(f"WHEN {col} = {_sq(s)} THEN {w!r}"
                    for s, w in shares.items())
    return f"CASE {arms} ELSE NULL END"


def _mix_ctes(targets: dict, *, weight_sql: str, key_sql: str,
              strata_col: str, table: str, seed: int) -> str:
    """CTE chain mirroring the engine float-for-float: per-source sums →
    budget min → rates → hash-filtered kept rows."""
    return f"""
        rows0 AS (
          SELECT {strata_col} AS source, {key_sql} AS _key,
                 CAST({weight_sql} AS BIGINT) AS _w
          FROM {table}),
        per AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(coalesce(sum(_w), 0) AS BIGINT) AS n_tokens,
                 {_share_case(targets)} AS _share
          FROM rows0 GROUP BY source),
        perf AS (
          SELECT * FROM per
          WHERE _share IS NOT NULL AND n_tokens > 0),
        budget AS (
          SELECT min(n_tokens / _share) AS _c FROM perf),
        rates AS (
          SELECT source, n_docs, n_tokens,
                 least(1.0, (b._c * _share) / n_tokens) AS rate
          FROM perf, budget b),
        kept AS (
          SELECT r0.source, r0._key, r0._w
          FROM rows0 r0 JOIN rates r ON r.source = r0.source
          WHERE {_uniform_sql('r0._key', seed)} < r.rate)"""


def mix_stats_oracle_sql(targets: dict, *, weight_sql: str,
                         key_sql: str = "doc_id",
                         strata_col: str = "source",
                         table: str = "documents",
                         seed: int = MIX_SEED) -> str:
    """DuckDB query reproducing :func:`mix_stats` bit-for-bit (shares
    normalized HERE with the same Python float math, rendered via repr,
    so both engines compare identical doubles)."""
    ctes = _mix_ctes(targets, weight_sql=weight_sql, key_sql=key_sql,
                     strata_col=strata_col, table=table, seed=seed)
    shares = _normalized_shares(targets)
    ppm_arms = " ".join(f"WHEN source = {_sq(s)} THEN {int(w * 1_000_000)}"
                        for s, w in shares.items())
    return f"""
        WITH {ctes},
        per_kept AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs_kept,
                 CAST(coalesce(sum(_w), 0) AS BIGINT) AS n_tokens_kept
          FROM kept GROUP BY source),
        tot AS (
          SELECT CAST(coalesce(sum(n_tokens_kept), 0) AS BIGINT) AS _tt
          FROM per_kept)
        SELECT source, n_docs_kept, n_tokens_kept,
               CAST(CASE WHEN t._tt > 0
                    THEN (CAST(n_tokens_kept AS HUGEINT) * 1000000)
                         // t._tt
                    ELSE 0 END AS BIGINT) AS achieved_ppm,
               CAST(CASE {ppm_arms} ELSE NULL END AS BIGINT) AS target_ppm
        FROM per_kept, tot t
    """
