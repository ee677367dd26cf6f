"""Sequence packing: concat-and-chunk assignment of documents to
fixed-length training chunks, plus context-length budgeting stats.

The GPT-style pretraining pipeline concatenates every tokenized document
in a deterministic order and slices the stream into ``context_len``-token
chunks; each document therefore owns the half-open token interval
``[start_tok, start_tok + n_tok)`` of the global stream and spans chunks
``floor(start/C) .. floor((end-1)/C)``.  Everything here derives from
that exclusive prefix sum of the length column in ``order_col`` order.

The prefix sum is computed DISTRIBUTED (the naive
``Window.orderBy(order_col)`` moves the whole corpus to one partition —
a scale-killer this module exists to avoid):

1. sample ``order_col`` (seeded, deterministic) and pick ``n_buckets-1``
   ordered split points on the driver — the classic range-partitioner
   sketch, but with explicit, inspectable boundaries so the bucket id is
   a pure function of the row (no reliance on physical partition ids);
2. local cumulative sums per bucket via
   ``Window.partitionBy(bucket).orderBy(order_col)`` — ONE full shuffle,
   parallel across buckets;
3. bucket totals via a map-side-combined ``groupBy(bucket)`` aggregation
   (n_buckets rows), cumulated on the driver-sized table and broadcast
   back as per-bucket offsets.

Boundary quality affects only balance, never correctness: any split
points yield the same ``start_tok``.  Cost: two cheap one-column passes
(count + sample) plus the totals aggregation and the windowed pass.

Contract: ``order_col`` must be a NON-NULL, UNIQUE total order (ties
make a prefix sum ill-defined in any engine; NULL ordering also differs
between Spark — NULLS FIRST — and DuckDB — NULLS LAST).  NULL lengths
count as 0 tokens (the document occupies no stream positions but keeps
a defined ``start_tok``).

All chunk arithmetic is integral (``div`` / ``%``) — no double-rounded
``floor(x / C)``, so results stay exact past 2^53 total tokens (a
10^12-sequence corpus at 10^4 tokens/doc is 10^16 positions).

Oracle parity: the whole family is reproducible in ANSI SQL with a
single ``SUM(...) OVER (ORDER BY ...)`` window (the oracle may use the
single-partition form — it runs on sf0.01) and ``//`` integer division.

Scale notes (100 TB): the only full-data exchange is the bucket window
(step 2).  ``n_buckets`` bounds its parallelism — size it at or above
``spark.sql.shuffle.partitions``.  ``chunk_doc_map`` explodes one row
per (document, spanned chunk): with C >= typical document length the
blow-up factor is < 2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_offsets", "pack_chunks", "chunk_doc_map",
           "materialize_chunks", "packing_stats", "truncation_stats"]


def _split_points(df: DataFrame, order_col: str, n_buckets: int,
                  sample_rows: int, seed: int) -> list:
    """Driver-side ordered split points from a seeded sample.  Returns
    at most ``n_buckets - 1`` distinct values; fewer (or none) when the
    sample has too few distinct keys — correctness is unaffected.

    The sample is the hash-order top-K (``xxhash64(key, seed)`` —
    pseudo-random, deterministic), which plans as
    ``TakeOrderedAndProject``: one pass, per-partition partial top-K.
    A ``Bernoulli`` sample would need the exact row count first to size
    its fraction — a whole extra corpus scan for nothing (r5 finding)."""
    if n_buckets <= 1:
        return []
    sample = (df.select(order_col)
              .where(F.col(order_col).isNotNull())
              .orderBy(F.xxhash64(F.col(order_col).cast("string"),
                                  F.lit(seed)))
              .limit(4 * sample_rows).collect())
    vals = sorted({r[0] for r in sample})
    if len(vals) < 2:
        return []
    step = len(vals) / n_buckets
    return sorted({vals[int(i * step)] for i in range(1, n_buckets)})


def global_offsets(df: DataFrame, *, len_col: str = "n_tok",
                   order_col: str = "doc_id", n_buckets: int = 256,
                   sample_rows: int = 1 << 16,
                   seed: int = 9407) -> DataFrame:
    """All input columns plus ``start_tok``: the exclusive prefix sum of
    ``len_col`` in ``order_col`` order (see module docstring for the
    distributed two-level cumsum and the order-column contract)."""
    pts = _split_points(df, order_col, n_buckets, sample_rows, seed)
    if pts:
        barr = F.array(*[F.lit(p) for p in pts])
        bucket = F.size(F.filter(barr, lambda b: b <= F.col(order_col)))
    else:
        bucket = F.lit(0)
    length = F.coalesce(F.col(len_col).cast("bigint"), F.lit(0))
    d = df.withColumn("_bkt", bucket)

    w = (Window.partitionBy("_bkt").orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = d.withColumn("_cum", F.sum(length).over(w))

    # bucket totals straight from the pre-window frame: map-side partial
    # aggregation, never a second pass over the windowed exchange
    totals = d.groupBy("_bkt").agg(F.sum(length).alias("_tot"))
    wo = (Window.orderBy("_bkt")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offsets = (totals
               .withColumn("_off", F.sum("_tot").over(wo) - F.col("_tot"))
               .select("_bkt", "_off"))

    return (local.join(F.broadcast(offsets), "_bkt")
            .withColumn("start_tok",
                        (F.col("_off") + F.col("_cum") - length)
                        .cast("bigint"))
            .drop("_bkt", "_cum", "_off"))


def _div(a: Column, b) -> Column:
    """Exact integral floor division for non-negative operands.
    ``(a - a % b)`` is an exact multiple of ``b``; routing the division
    through decimal(38,0) keeps it exact past 2^53, where double
    division would silently round (a 10^12-doc corpus can exceed 2^53
    scaled stream positions)."""
    b = F.lit(b) if isinstance(b, int) else b
    return ((a - a % b).cast("decimal(38,0)") / b).cast("bigint")


def pack_chunks(df: DataFrame, context_len: int, *,
                len_col: str = "n_tok", order_col: str = "doc_id",
                n_buckets: int = 256, sample_rows: int = 1 << 16,
                seed: int = 9407) -> DataFrame:
    """Per-document chunk assignment at ``context_len``: input columns
    plus ``start_tok``, ``end_tok``, ``first_chunk``, ``last_chunk``
    (NULL for zero-length documents) and ``n_chunks`` spanned."""
    if context_len < 1:
        raise ValueError(f"context_len must be >= 1, got {context_len}")
    out = global_offsets(df, len_col=len_col, order_col=order_col,
                         n_buckets=n_buckets, sample_rows=sample_rows,
                         seed=seed)
    length = F.coalesce(F.col(len_col).cast("bigint"), F.lit(0))
    start = F.col("start_tok")
    end = start + length
    first = _div(start, context_len)
    last = _div(end - 1, context_len)
    nonempty = length > 0
    return (out
            .withColumn("end_tok", end.cast("bigint"))
            .withColumn("first_chunk",
                        F.when(nonempty, first).cast("bigint"))
            .withColumn("last_chunk",
                        F.when(nonempty, last).cast("bigint"))
            .withColumn("n_chunks",
                        F.when(nonempty, last - first + 1)
                        .otherwise(F.lit(0)).cast("bigint")))


def chunk_doc_map(df: DataFrame, context_len: int, *,
                  len_col: str = "n_tok", order_col: str = "doc_id",
                  **kw) -> DataFrame:
    """One row per (chunk, contributing document): ``(chunk_id,
    order_col, n_tok_in_chunk)`` — the provenance map from training
    chunks back to source documents.  Zero-length documents contribute
    no rows."""
    packed = pack_chunks(df, context_len, len_col=len_col,
                         order_col=order_col, **kw)
    chunk = F.explode(
        F.when(F.col("n_chunks") > 0,
               F.sequence(F.col("first_chunk"), F.col("last_chunk")))
        .otherwise(F.array().cast("array<bigint>"))).alias("chunk_id")
    c = F.col("chunk_id")
    lo = F.greatest(F.col("start_tok"), c * context_len)
    hi = F.least(F.col("end_tok"), (c + 1) * context_len)
    return (packed.select(order_col, "start_tok", "end_tok", chunk)
            .select(c.cast("bigint").alias("chunk_id"),
                    F.col(order_col),
                    (hi - lo).cast("bigint").alias("n_tok_in_chunk")))


def materialize_chunks(df: DataFrame, context_len: int, *,
                       tokens_col: str = "tokens",
                       len_col: str = "n_tok",
                       order_col: str = "doc_id", **kw) -> DataFrame:
    """The assembled training chunks themselves: ``(chunk_id, tokens,
    n_tok, n_docs)`` where ``tokens`` is the ``context_len``-token
    slice of the concatenated document stream (the last chunk may be
    shorter; no padding token is injected — that is the trainer's
    choice).

    Each document contributes ``slice(tokens, lo - start + 1, hi - lo)``
    to every chunk it spans; pieces are shuffled BY CHUNK (the per-chunk
    aggregation state is bounded at ``context_len`` tokens) and
    reassembled in stream order with ``array_sort`` over (position,
    piece) structs — ``collect_list`` order is nondeterministic, the
    sort restores it.  ``len_col`` must equal ``size(tokens_col)``
    (validate with the invariants operator first; a mismatch silently
    misaligns the stream).
    """
    packed = pack_chunks(df, context_len, len_col=len_col,
                         order_col=order_col, **kw)
    chunk = F.explode(
        F.when(F.col("n_chunks") > 0,
               F.sequence(F.col("first_chunk"), F.col("last_chunk")))
        .otherwise(F.array().cast("array<bigint>"))).alias("chunk_id")
    pieces = packed.select(
        "start_tok", "end_tok", F.col(tokens_col).alias("_toks"), chunk)
    c = F.col("chunk_id")
    lo = F.greatest(F.col("start_tok"), c * context_len)
    hi = F.least(F.col("end_tok"), (c + 1) * context_len)
    piece = F.slice(F.col("_toks"),
                    (lo - F.col("start_tok") + 1).cast("int"),
                    (hi - lo).cast("int"))
    parts = pieces.select(
        c.cast("bigint").alias("chunk_id"),
        (lo - c * context_len).cast("int").alias("_pos"),
        piece.alias("_piece"))
    assembled = F.flatten(F.transform(
        F.array_sort(F.collect_list(F.struct("_pos", "_piece"))),
        lambda s: s["_piece"]))
    return (parts.groupBy("chunk_id")
            .agg(assembled.alias("tokens"),
                 F.count(F.lit(1)).cast("bigint").alias("n_docs"))
            .withColumn("n_tok", F.size("tokens").cast("bigint"))
            .select("chunk_id", "tokens", "n_tok", "n_docs"))


def packing_stats(df: DataFrame, context_len: int, *,
                  len_col: str = "n_tok", order_col: str = "doc_id",
                  **kw) -> DataFrame:
    """One-row packing audit at ``context_len``: ``n_docs``,
    ``total_tokens``, ``n_chunks`` (= ceil(total/C)), ``tail_pad``
    (padding in the final partial chunk), ``boundary_docs`` (documents
    split across a chunk boundary), ``pad_baseline_chunks`` /
    ``pad_baseline_waste`` (the no-packing alternative: each document
    padded to a multiple of C) and ``pack_efficiency_permille``
    (1000 × total / (n_chunks × C), integral)."""
    packed = pack_chunks(df, context_len, len_col=len_col,
                         order_col=order_col, **kw)
    length = F.coalesce(F.col(len_col).cast("bigint"), F.lit(0))
    per_doc_chunks = _div(length + (context_len - 1), context_len)
    agg = packed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(length).cast("bigint").alias("total_tokens"),
        F.sum(F.when(F.col("n_chunks") > 1, 1).otherwise(0))
        .cast("bigint").alias("boundary_docs"),
        F.sum(per_doc_chunks).cast("bigint").alias("pad_baseline_chunks"))
    total = F.coalesce(F.col("total_tokens"), F.lit(0))
    n_chunks = _div(total + (context_len - 1), context_len)
    return agg.select(
        "n_docs",
        total.alias("total_tokens"),
        n_chunks.alias("n_chunks"),
        (n_chunks * context_len - total).cast("bigint").alias("tail_pad"),
        F.coalesce(F.col("boundary_docs"), F.lit(0)).alias("boundary_docs"),
        F.coalesce(F.col("pad_baseline_chunks"), F.lit(0))
        .alias("pad_baseline_chunks"),
        (F.coalesce(F.col("pad_baseline_chunks"), F.lit(0)) * context_len
         - total).cast("bigint").alias("pad_baseline_waste"),
        F.when(n_chunks > 0, _div(total * 1000, n_chunks * context_len))
        .otherwise(F.lit(0)).cast("bigint")
        .alias("pack_efficiency_permille"))


def truncation_stats(df: DataFrame, max_len: int, *,
                     len_col: str = "n_tok",
                     by: str | None = "source") -> DataFrame:
    """Context-length budgeting per group (or corpus-wide when ``by`` is
    None): document counts, totals, documents over budget, tokens lost
    to truncate-at-``max_len`` and padding wasted by pad-to-``max_len``.
    A single map-side-combined aggregation — the cheap first question
    before committing to a context length."""
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    length = F.coalesce(F.col(len_col).cast("bigint"), F.lit(0))
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(length).cast("bigint").alias("total_tokens"),
        F.sum(F.when(length > max_len, 1).otherwise(0))
        .cast("bigint").alias("n_over_budget"),
        F.sum(F.greatest(length - max_len, F.lit(0)))
        .cast("bigint").alias("tokens_lost_truncate"),
        F.sum(F.lit(max_len) - F.least(length, F.lit(max_len)))
        .cast("bigint").alias("pad_waste"),
    ]
    return df.groupBy(by).agg(*aggs) if by else df.agg(*aggs)


# ----------------------------------------------------------------- #
# DuckDB oracle generators                                           #
# ----------------------------------------------------------------- #

#: per-document whitespace token count over the documents view — the
#: same definition as the token_count gate (regexp_split_to_array of
#: trimmed text; '' splits to [''] → 1, matching Spark's split).  NULL
#: text coalesces to n=0 because the ENGINE coalesces NULL lengths to 0
#: ("the document occupies no stream positions but keeps a defined
#: start_tok") — without it the oracle's window SUM(n)-n and pad sums
#: would yield NULL where the engine yields defined integers
#: (CLAUDE.md: oracles must model NULL semantics explicitly)
_DOC_LENS_SQL = """
  SELECT doc_id,
         CAST(coalesce(
             len(regexp_split_to_array(trim(text), '\\s+')), 0)
           AS BIGINT) AS n,
         source
  FROM documents
"""

#: exclusive prefix sum in doc_id order (the oracle runs at sf0.01, so
#: the single-partition window form is fine THERE; the engine side uses
#: the distributed two-level cumsum)
_OFFSETS_SQL = _DOC_LENS_SQL + """
), o AS (
  SELECT doc_id, n, source,
         CAST(SUM(n) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) - n AS BIGINT) AS start_tok
  FROM t
"""


def pack_chunks_oracle_sql(context_len: int) -> str:
    """DuckDB reproduction of the ``seq_pack`` gate (chunk arithmetic
    via ``//``: DuckDB integer division floors for the non-negative
    operands here, matching the engine's exact integral ``_div``)."""
    c = context_len
    return f"""
        WITH t AS ({_OFFSETS_SQL})
        SELECT doc_id, start_tok,
               CAST(start_tok + n AS BIGINT) AS end_tok,
               CAST(CASE WHEN n > 0 THEN start_tok // {c} END AS BIGINT)
                 AS first_chunk,
               CAST(CASE WHEN n > 0 THEN (start_tok + n - 1) // {c} END
                    AS BIGINT) AS last_chunk,
               CAST(CASE WHEN n > 0
                         THEN (start_tok + n - 1) // {c}
                              - start_tok // {c} + 1
                    ELSE 0 END AS BIGINT) AS n_chunks
        FROM o
    """


def packing_stats_oracle_sql(context_len: int) -> str:
    c = context_len
    return f"""
        WITH t AS ({_OFFSETS_SQL})
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(coalesce(sum(n), 0) AS BIGINT) AS total_tokens,
               CAST((coalesce(sum(n), 0) + {c - 1}) // {c} AS BIGINT)
                 AS n_chunks,
               CAST((coalesce(sum(n), 0) + {c - 1}) // {c} * {c}
                    - coalesce(sum(n), 0) AS BIGINT) AS tail_pad,
               CAST(coalesce(sum(CASE WHEN n > 0 AND
                                       (start_tok + n - 1) // {c}
                                       > start_tok // {c}
                                  THEN 1 ELSE 0 END), 0) AS BIGINT)
                 AS boundary_docs,
               CAST(coalesce(sum((n + {c - 1}) // {c}), 0) AS BIGINT)
                 AS pad_baseline_chunks,
               CAST(coalesce(sum((n + {c - 1}) // {c}), 0) * {c}
                    - coalesce(sum(n), 0) AS BIGINT)
                 AS pad_baseline_waste,
               CAST(CASE WHEN coalesce(sum(n), 0) > 0
                         THEN coalesce(sum(n), 0) * 1000
                              // ((coalesce(sum(n), 0) + {c - 1})
                                  // {c} * {c})
                    ELSE 0 END AS BIGINT) AS pack_efficiency_permille
        FROM o
    """


def chunk_doc_map_oracle_sql(context_len: int) -> str:
    """Per-chunk fill: the provenance map grouped by chunk."""
    c = context_len
    return f"""
        WITH t AS ({_OFFSETS_SQL}),
        m AS (
          SELECT unnest(range(start_tok // {c},
                              (start_tok + n - 1) // {c} + 1))
                   AS chunk_id,
                 start_tok, start_tok + n AS end_tok
          FROM o WHERE n > 0
        )
        SELECT CAST(chunk_id AS BIGINT) AS chunk_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(least(end_tok, (chunk_id + 1) * {c})
                        - greatest(start_tok, chunk_id * {c}))
                    AS BIGINT) AS n_tok
        FROM m GROUP BY chunk_id
    """


def materialize_chunks_oracle_sql(context_len: int, *,
                                  gen_sql: str = "doc_id",
                                  vocab: int = 997) -> str:
    """DuckDB reproduction of the ``chunk_tokens`` gate: chunks
    assembled from md5-synthetic token arrays (see
    :mod:`.tokens`), compared as md5 of the comma-joined tokens —
    byte-exact chunk content, not just counts."""
    from .tokens import _synth_cte
    c = context_len
    return f"""
        WITH t AS ({_synth_cte(gen_sql, vocab)}
        ), o AS (
          SELECT doc_id, n, toks,
                 CAST(SUM(n) OVER (ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) - n AS BIGINT)
                   AS start_tok
          FROM tok
        ), m AS (
          SELECT unnest(range(start_tok // {c},
                              (start_tok + n - 1) // {c} + 1))
                   AS chunk_id,
                 start_tok, start_tok + n AS end_tok, toks
          FROM o WHERE n > 0
        ), p AS (
          SELECT chunk_id,
                 greatest(start_tok, chunk_id * {c}) - chunk_id * {c}
                   AS pos,
                 toks[CAST(greatest(start_tok, chunk_id * {c})
                           - start_tok + 1 AS BIGINT)
                      :CAST(least(end_tok, (chunk_id + 1) * {c})
                            - start_tok AS BIGINT)] AS piece
          FROM m
        ), g AS (
          SELECT CAST(chunk_id AS BIGINT) AS chunk_id,
                 flatten(list(piece ORDER BY pos)) AS toks,
                 CAST(count(*) AS BIGINT) AS n_docs
          FROM p GROUP BY chunk_id
        )
        SELECT chunk_id, md5(array_to_string(toks, ',')) AS tokens_md5,
               CAST(len(toks) AS BIGINT) AS n_tok, n_docs
        FROM g
    """


def truncation_stats_oracle_sql(max_len: int) -> str:
    m = max_len
    return f"""
        WITH t AS ({_DOC_LENS_SQL})
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n) AS BIGINT) AS total_tokens,
               CAST(sum(CASE WHEN n > {m} THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_over_budget,
               CAST(sum(greatest(n - {m}, 0)) AS BIGINT)
                 AS tokens_lost_truncate,
               CAST(sum({m} - least(n, {m})) AS BIGINT) AS pad_waste
        FROM t GROUP BY source
    """
