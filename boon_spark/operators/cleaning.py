"""Corpus cleaning: C4-style line filtering, corpus-level boilerplate
line removal, and corpus token frequencies.

The row-local pass re-expresses the line/page heuristics of the public
C4 pipeline (Raffel et al. 2020, "Exploring the Limits of Transfer
Learning...", §2.2) with deterministic definitions a SQL oracle can
reproduce byte-for-byte; the corpus-level pass is the frequent-line
("boilerplate") removal of the public CCNet / RefinedWeb pipelines —
a genuinely distributed operator: line document-frequencies are a
corpus-wide aggregation, not a per-row map.

Deterministic definitions (chosen for bit-exact DuckDB parity):

- *lines*: the raw text split on ``\\n``, trailing empties kept (both
  engines keep them; empty lines never pass any predicate).
- C4 keep-line predicate: the space-trimmed line ends in ``.``, ``!``,
  ``?`` or ``"`` (checked via its last character — no ``$`` anchor, so
  the Java-vs-RE2 end-of-line divergence on ``\\r`` cannot arise),
  has at least ``min_words`` ``\\S+`` tokens, and does not contain
  ``javascript`` case-insensitively.
- C4 keep-page predicate: the CLEANED text has >= 3 sentence marks
  (``[.!?]`` occurrences), and the RAW text contains neither
  ``lorem ipsum`` (case-insensitive) nor ``{``.
- Boilerplate: a line is hot when its document frequency (distinct
  documents containing the EXACT raw line; whitespace-only lines are
  never candidates) reaches ``min_df``.  Hot lines are removed
  verbatim; every other line (order, duplicates, leading whitespace)
  survives untouched.

Oracle contract: Java's ``\\S`` excludes ``\\x0B`` (vertical tab) from
words where RE2's does not — same measured caveat as
:mod:`.repetition`; exact over text without vertical tabs.

NULL text yields NULL outputs (callers validate presence separately).

Scale notes (100 TB):

- :func:`c4_line_flags` is one pure-JVM projection, zero shuffle.  The
  line filter is a higher-order function, so the projection runs
  interpreted rather than whole-stage-codegen'd — acceptable here
  because this is a transform operator, not the validation hot path
  (CLAUDE.md invariant), and the per-line work is trivial; it is NOT
  the 15µs/element slice+concat case that made ``word_shingles`` go to
  Arrow.
- :func:`remove_boilerplate` shuffles only 8-byte line hashes (+8-byte
  partial counts) — never line strings; within-document dedup happens
  row-locally (``array_distinct``) before the explode, so the exchange
  carries one row per (document, distinct line).  The hot set is
  collected to the driver and pushed back as a broadcast-style IN-set
  filter: a frequent-line table at a df-threshold worth removing is
  small by construction (``max_hot`` guards the assumption LOUDLY —
  a ValueError, never silent truncation; :func:`boilerplate_stats` is
  the audit companion).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _hash_shingle, _hash_shingle_fast, normalized_text

#: salt separating boilerplate line hashes from every other md5 family
_BOILER_SALT = 9109


def _c4_keep_line(line: Column, min_words: int) -> Column:
    t = F.trim(line)
    return (F.substring(t, -1, 1).isin(".", "!", "?", '"')
            & (F.regexp_count(t, F.lit(r"\S+")) >= F.lit(min_words))
            & ~F.contains(F.lower(line), F.lit("javascript")))


def c4_clean_text(text: Column, *, min_words: int = 5) -> Column:
    """The C4 line-filtered text: lines failing the keep-line predicate
    removed, survivors re-joined with ``\\n``."""
    lines = F.split(text, "\n", -1)
    return F.array_join(
        F.filter(lines, lambda l: _c4_keep_line(l, min_words)), "\n")


def c4_line_flags(df: DataFrame, *, text_col: str = "text",
                  id_col: str = "doc_id",
                  min_words: int = 5) -> DataFrame:
    """Per-document C4 cleaning verdicts: ``(id_col, clean_text,
    n_lines, n_lines_kept, n_sentences, keep)``.

    ``keep`` is the page-level predicate over the cleaned text (>= 3
    sentence marks, no ``lorem ipsum``, no ``{``).  One row-local
    projection — zero shuffle at any scale.
    """
    text = F.col(text_col)
    lines = F.split(text, "\n", -1)
    kept = F.filter(lines, lambda l: _c4_keep_line(l, min_words))
    clean = F.array_join(kept, "\n")
    n_sent = F.regexp_count(clean, F.lit(r"[.!?]"))
    keep = ((n_sent >= 3)
            & ~F.contains(F.lower(text), F.lit("lorem ipsum"))
            & ~F.contains(text, F.lit("{")))
    return df.select(
        F.col(id_col), clean.alias("clean_text"),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(kept).cast("bigint").alias("n_lines_kept"),
        n_sent.cast("bigint").alias("n_sentences"),
        keep.alias("keep"))


def _line_hash(line: Column, hash_family: str) -> Column:
    if hash_family == "md5":
        return _hash_shingle(line, _BOILER_SALT)
    if hash_family == "xxhash64":
        return _hash_shingle_fast(line, _BOILER_SALT)
    raise ValueError(f"unknown hash_family: {hash_family!r}")


def _hot_line_counts(df: DataFrame, *, text_col: str, id_col: str,
                     hash_family: str) -> DataFrame:
    """Document frequency per line hash: ``(h, df)``.  Within-document
    dedup is row-local (``array_distinct`` before the explode), so the
    one shuffle carries 8-byte hashes with map-side partial counts."""
    lines = F.split(F.col(text_col), "\n", -1)
    cand = F.array_distinct(F.filter(lines, lambda l: F.trim(l) != ""))
    return (df.select(F.col(id_col),
                      F.explode(cand).alias("_line"))
            .select(_line_hash(F.col("_line"), hash_family).alias("h"))
            .groupBy("h")
            .agg(F.count(F.lit(1)).cast("bigint").alias("df")))


def boilerplate_stats(df: DataFrame, *, min_df: int,
                      text_col: str = "text", id_col: str = "doc_id",
                      hash_family: str = "md5") -> DataFrame:
    """Audit companion: one row ``(n_hot_lines, max_df,
    n_candidate_lines)`` — how many distinct lines reach ``min_df``,
    the hottest line's document frequency, and the distinct-candidate
    count, so a ``max_hot`` ValueError can be sized correctly."""
    counts = _hot_line_counts(df, text_col=text_col, id_col=id_col,
                              hash_family=hash_family)
    return counts.agg(
        F.sum(F.when(F.col("df") >= min_df, 1).otherwise(0))
        .cast("bigint").alias("n_hot_lines"),
        F.max("df").cast("bigint").alias("max_df"),
        F.count(F.lit(1)).cast("bigint").alias("n_candidate_lines"))


def remove_boilerplate(df: DataFrame, *, min_df: int,
                       text_col: str = "text", id_col: str = "doc_id",
                       max_hot: int = 10_000,
                       hash_family: str = "md5") -> DataFrame:
    """Remove corpus-frequent ("boilerplate") lines: every line whose
    document frequency reaches ``min_df`` is deleted from every
    document.  Returns ``(id_col, clean_text, n_lines_removed)``.

    Two-phase: (1) an 8-byte-hash document-frequency aggregation (the
    only shuffle); (2) the hot hashes come back to the driver and are
    applied as a row-local IN-set line filter over the original scan —
    the corpus itself never shuffles.  More than ``max_hot`` hot lines
    raises (the hot set must stay broadcast-sized; raise ``min_df`` or
    ``max_hot``, and consult :func:`boilerplate_stats`) — a loud error,
    never silent truncation.
    """
    if min_df < 2:
        raise ValueError(f"min_df must be >= 2, got {min_df}")
    counts = _hot_line_counts(df, text_col=text_col, id_col=id_col,
                              hash_family=hash_family)
    hot_rows = (counts.filter(F.col("df") >= min_df)
                .orderBy(F.col("df").desc(), F.col("h").asc())
                .limit(max_hot + 1).collect())
    if len(hot_rows) > max_hot:
        raise ValueError(
            f"more than max_hot={max_hot} boilerplate lines at "
            f"min_df={min_df}; raise max_hot or min_df "
            f"(see boilerplate_stats)")
    hot = [r.h for r in hot_rows]

    text = F.col(text_col)
    lines = F.split(text, "\n", -1)
    if hot:
        kept = F.filter(
            lines, lambda l: ~_line_hash(l, hash_family).isin(hot))
    else:
        kept = lines
    return df.select(
        F.col(id_col),
        F.array_join(kept, "\n").alias("clean_text"),
        (F.size(lines) - F.size(kept)).cast("bigint")
        .alias("n_lines_removed"))


def token_frequencies(df: DataFrame, *, text_col: str = "text",
                      min_count: int = 1) -> DataFrame:
    """Corpus-wide token counts over the shared normalization:
    ``(token, n)`` with ``n`` = total occurrences.  One shuffle on the
    token with map-side partial counts — the classic vocabulary-build
    aggregation; empty tokens (empty documents) are excluded."""
    words = F.split(normalized_text(F.col(text_col)), " ")
    out = (df.select(F.explode(words).alias("token"))
           .filter(F.col("token") != "")
           .groupBy("token")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out


def ranked_topk(agg: DataFrame, k: int, *,
                key_col: str = "token") -> DataFrame:
    """Deterministic ordered take over a ``(key_col, n)`` counts frame:
    ``(rank, key_col, n)`` by (n desc, key asc) — a total order, so the
    result is oracle-comparable.  The take is ``orderBy(...).limit(k)``
    — Spark plans it as ``TakeOrderedAndProject`` (per-partition partial
    top-k merged on the driver), so a counts table that reaches hundreds
    of millions of rows on a web corpus is never moved to one partition;
    the rank window then runs over only the ``k`` survivors.  Shared by
    :func:`vocab_topk` and :func:`..tokens.token_topk` (one definition
    of the tie-break and the take shape)."""
    from pyspark.sql import Window
    order = [F.col("n").desc(), F.col(key_col).asc()]
    top = agg.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return (top.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .select("rank", key_col, "n"))


def vocab_topk(df: DataFrame, k: int, *, text_col: str = "text") \
        -> DataFrame:
    """Top-``k`` corpus tokens: ``(rank, token, n)``, ties broken by
    ascending token (see :func:`ranked_topk` for the plan shape)."""
    return ranked_topk(token_frequencies(df, text_col=text_col), k)


# ----------------------------------------------------------------- #
# DuckDB oracle generators                                           #
# ----------------------------------------------------------------- #

#: the keep-line predicate in DuckDB, over lambda variable ``l``
_KEEP_LINE_SQL = ("substr(trim(l), -1, 1) IN ('.', '!', '?', '\"') "
                  "AND len(regexp_extract_all(trim(l), '\\S+')) >= {mw} "
                  "AND NOT contains(lower(l), 'javascript')")


def c4_clean_oracle_sql(*, min_words: int = 5,
                        text_sql: str = "text") -> str:
    """DuckDB reproduction of the ``c4_clean`` gate query: per-document
    md5 of the cleaned text, line counts, and the page verdict.
    ``text_sql`` lets the gate run over synthetically suffixed text."""
    keep_line = _KEEP_LINE_SQL.format(mw=min_words)
    return f"""
        WITH s AS (
          SELECT doc_id, {text_sql} AS text,
                 string_split({text_sql}, chr(10)) AS ls
          FROM documents
        ), k AS (
          SELECT doc_id, text, ls,
                 list_filter(ls, l -> {keep_line}) AS kept
          FROM s
        ), c AS (
          SELECT doc_id, text, ls, kept,
                 array_to_string(kept, chr(10)) AS ct
          FROM k
        )
        SELECT doc_id, md5(ct) AS clean_md5,
               CAST(len(ls) AS BIGINT) AS n_lines,
               CAST(len(kept) AS BIGINT) AS n_lines_kept,
               -- NULL arm spelled out (CLAUDE.md oracle rule): the
               -- engine yields keep=NULL for NULL text; CASE WHEN is
               -- NULL-false and would collapse it to 0
               CAST(CASE WHEN text IS NULL THEN NULL
                         WHEN len(regexp_extract_all(ct, '[.!?]')) >= 3
                         AND NOT contains(lower(text), 'lorem ipsum')
                         AND NOT contains(text, '{{')
                    THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM c
    """


def remove_boilerplate_oracle_sql(*, min_df: int,
                                  extra_line_sql: str | None = None) \
        -> str:
    """DuckDB reproduction of ``remove_boilerplate`` — hot lines by
    STRING (the engine's 60-bit md5 hashes are collision-free on any
    real corpus; the gate corpus is tiny).  ``extra_line_sql`` appends
    a synthetic line to each document the same way the gate query does,
    so the gate can guarantee hot lines exist in synthetic data."""
    text = "text" if extra_line_sql is None else \
        f"(text || chr(10) || {extra_line_sql})"
    return f"""
        WITH s AS (
          SELECT doc_id, string_split({text}, chr(10)) AS ls
          FROM documents
        ), cand AS (
          SELECT DISTINCT doc_id, unnest(ls) AS line FROM s
        ), freq AS (
          SELECT line, count(*) AS df FROM cand
          WHERE trim(line) <> '' GROUP BY line
        ), hotl AS (
          SELECT coalesce(list(line ORDER BY line), []) AS hl
          FROM freq WHERE df >= {min_df}
        ), o AS (
          SELECT doc_id,
                 list_filter(ls, x -> NOT list_contains(hl, x)) AS kept,
                 len(ls) AS n0
          FROM s, hotl
        )
        SELECT doc_id,
               md5(array_to_string(kept, chr(10))) AS clean_md5,
               CAST(n0 - len(kept) AS BIGINT) AS n_lines_removed
        FROM o
    """


def vocab_topk_oracle_sql(k: int) -> str:
    """DuckDB reproduction of ``vocab_topk`` (same normalization CTE as
    every shingle oracle; same (n desc, token asc) total order)."""
    return f"""
        WITH norm AS (
          SELECT lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))
                 AS nt
          FROM documents
        ), tok AS (
          SELECT unnest(string_split(nt, ' ')) AS token FROM norm
          WHERE nt <> ''
        ), agg AS (
          SELECT token, CAST(count(*) AS BIGINT) AS n
          FROM tok WHERE token <> '' GROUP BY token
        )
        SELECT CAST(row_number() OVER (ORDER BY n DESC, token ASC)
                    AS BIGINT) AS rank, token, n
        FROM agg
        ORDER BY rank LIMIT {k}
    """


def group_topk(agg: DataFrame, k: int, *, group_col: str,
               key_col: str = "token", n_col: str = "n") -> DataFrame:
    """Per-group top-``k`` over a ``(group, key, n)`` counts frame:
    ``rank`` by (n desc, key asc) WITHIN each group — the per-domain /
    per-source heavy-hitters view of :func:`ranked_topk`.

    One shuffle on the group key; the within-group sort is the
    spillable window sort (a hot group costs one task's time, never
    memory).  Unlike the global take there is no TakeOrderedAndProject
    for per-group top-k — for extreme group counts pre-prune the counts
    frame with a ``n >= threshold`` filter before ranking (any
    threshold below the group's k-th count is lossless)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window
    w = Window.partitionBy(group_col).orderBy(
        F.col(n_col).desc(), F.col(key_col).asc())
    return (agg.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= F.lit(int(k)))
            .select(group_col, "rank", key_col, n_col))
