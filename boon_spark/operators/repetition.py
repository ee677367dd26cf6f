"""Gopher-style repetition and quality filters for training-data
pipelines (Rae et al. 2021, "Scaling Language Models: Methods, Analysis
& Insights from Training Gopher", Table A1 — public paper).

Every metric is ROW-LOCAL: one Arrow-batched projection, zero shuffle,
embarrassingly parallel at any scale.  Text normalization stays JVM-side
(shared :func:`~boon_spark.operators.dedup.normalized_text`) so the
regex semantics match the DuckDB oracles exactly; the per-document
frequency counting (a hash map per row — not expressible as a
whole-stage-codegen Column without a higher-order-function penalty, see
``word_shingles``'s measured 9x) runs as a pandas UDF over the
already-normalized text.

Deterministic definitions (chosen so a SQL oracle can reproduce them
bit-for-bit; all divisions are IEEE double divisions of exact integers,
identical in any engine):

- *words*: the ``\\s+``-normalized, lowercased text split on single
  spaces; empty text has zero words.
- *word n-grams*: positions ``i = 0 .. len(words)-n`` — a document with
  fewer than ``n`` words has NO n-grams (metrics 0.0), unlike shingling
  which emits one whole-text shingle.
- ``top_{n}gram_char_frac``: ``count(g) * chars(g) / chars(norm_text)``
  for the most frequent n-gram ``g``; ties broken by (more characters
  first, then lexicographically smaller); capped at 1.0 (overlapping
  occurrences can cover more characters than the text has).
- ``dup_{n}gram_char_frac``: ``sum over grams with count >= 2 of
  count(g) * chars(g) / chars(norm_text)``, capped at 1.0.
- *lines*: the RAW text split on ``\\n``, empty strings dropped;
  *paragraphs*: split on ``\\n\\n``, empty strings dropped.
- ``dup_line_frac`` = ``(n_lines - n_distinct_lines) / n_lines``;
  ``dup_line_char_frac`` = characters in every occurrence of a line
  whose count >= 2, over total line characters (same for paragraphs).
- ``bullet_line_frac``: lines matching ``^[ \\t]*[-*•]``;
  ``ellipsis_line_frac``: lines matching ``(\\.\\.\\.|…)[ \\t]*$``.
- ``alpha_word_frac``: fraction of words containing ``[a-z]`` (the
  normalized text is lowercased, so this is "has an ASCII letter").
- ``symbol_word_ratio``: (``#`` count + non-overlapping ``...`` count +
  ``…`` count, on the RAW text) / max(n_words, 1).
- ``stopword_hits``: how many DISTINCT members of Gopher's 8-word list
  (the, be, to, of, and, that, have, with) occur as words.

NULL text yields NULL metrics (callers validate presence separately).

Oracle contract (measured, pinned by the brute-force fuzz): Java's
``\\s`` is the ASCII set ``[ \\t\\n\\x0B\\f\\r]`` — NOT Python's
Unicode set (``\\x85``/``\\xa0`` are words here, not whitespace) — and
RE2's drops ``\\x0B`` from even that, so the DuckDB oracles are exact
over text without vertical tabs (the corpus has none).
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StructField,
                               StructType)

from .dedup import normalized_text

STOPWORDS_8 = ("the", "be", "to", "of", "and", "that", "have", "with")

_BULLET_RE = re.compile(r"^[ \t]*[-*•]")
_ELLIPSIS_RE = re.compile(r"(\.\.\.|…)[ \t]*$")
_ALPHA_RE = re.compile(r"[a-z]")

#: Gopher Table-A1 rejection thresholds (a doc FAILS a rule when the
#: metric crosses the bound).  min_words/max_words and word-length
#: bounds are the paper's 50/100k and 3/10.
GOPHER_THRESHOLDS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_word_ratio": 0.1,
    "max_bullet_line_frac": 0.9,
    "max_ellipsis_line_frac": 0.3,
    "min_alpha_word_frac": 0.8,
    "min_stopword_hits": 2,
    "max_dup_line_frac": 0.30,
    "max_dup_para_frac": 0.30,
    "max_dup_line_char_frac": 0.20,
    "max_dup_para_char_frac": 0.20,
    "max_top_2gram_char_frac": 0.20,
    "max_top_3gram_char_frac": 0.18,
    "max_top_4gram_char_frac": 0.16,
    "max_dup_5gram_char_frac": 0.15,
    "max_dup_6gram_char_frac": 0.14,
    "max_dup_7gram_char_frac": 0.13,
    "max_dup_8gram_char_frac": 0.12,
    "max_dup_9gram_char_frac": 0.11,
    "max_dup_10gram_char_frac": 0.10,
}

DEFAULT_TOP_NS = (2, 3, 4)
DEFAULT_DUP_NS = (5, 6, 7, 8, 9, 10)


def _doc_metrics(raw: str, norm: str, top_ns, dup_ns) -> dict:
    """All metrics for one document (plain Python; the UDF maps this
    over an Arrow batch).  ``norm`` is the JVM-normalized text."""
    words = norm.split(" ") if norm else []
    n_words = len(words)
    n_chars = len(norm)
    word_chars = sum(len(w) for w in words)
    word_set = set(words)
    out = {
        "n_words": n_words,
        "mean_word_len": (word_chars / n_words) if n_words else 0.0,
        "alpha_word_frac": (sum(1 for w in words if _ALPHA_RE.search(w))
                            / n_words) if n_words else 0.0,
        "stopword_hits": sum(1 for s in STOPWORDS_8 if s in word_set),
        "symbol_word_ratio": (raw.count("#") + raw.count("...") +
                              raw.count("…")) / max(n_words, 1),
    }

    for n in top_ns:
        key = f"top_{n}gram_char_frac"
        if n_words < n or n_chars == 0:
            out[key] = 0.0
            continue
        cnt = Counter(" ".join(words[i:i + n])
                      for i in range(n_words - n + 1))
        # most frequent; ties -> more chars, then lexicographically least
        g, c = min(cnt.items(), key=lambda kv: (-kv[1], -len(kv[0]), kv[0]))
        out[key] = min(1.0, (c * len(g)) / n_chars)

    for n in dup_ns:
        key = f"dup_{n}gram_char_frac"
        if n_words < n or n_chars == 0:
            out[key] = 0.0
            continue
        cnt = Counter(" ".join(words[i:i + n])
                      for i in range(n_words - n + 1))
        dup_chars = sum(c * len(g) for g, c in cnt.items() if c >= 2)
        out[key] = min(1.0, dup_chars / n_chars)

    for unit, sep in (("line", "\n"), ("para", "\n\n")):
        parts = [p for p in raw.split(sep) if p]
        n_parts = len(parts)
        if n_parts == 0:
            out[f"dup_{unit}_frac"] = 0.0
            out[f"dup_{unit}_char_frac"] = 0.0
            if unit == "line":
                out["n_lines"] = 0
                out["bullet_line_frac"] = 0.0
                out["ellipsis_line_frac"] = 0.0
            continue
        cnt = Counter(parts)
        out[f"dup_{unit}_frac"] = (n_parts - len(cnt)) / n_parts
        total = sum(len(p) for p in parts)
        dup_chars = sum(c * len(p) for p, c in cnt.items() if c >= 2)
        out[f"dup_{unit}_char_frac"] = (dup_chars / total) if total else 0.0
        if unit == "line":
            out["n_lines"] = n_parts
            out["bullet_line_frac"] = sum(
                1 for p in parts if _BULLET_RE.search(p)) / n_parts
            out["ellipsis_line_frac"] = sum(
                1 for p in parts if _ELLIPSIS_RE.search(p)) / n_parts
    return out


def _metric_fields(top_ns, dup_ns) -> list[StructField]:
    longs = ["n_words", "n_lines", "stopword_hits"]
    doubles = (["mean_word_len", "alpha_word_frac", "symbol_word_ratio",
                "dup_line_frac", "dup_line_char_frac", "dup_para_frac",
                "dup_para_char_frac", "bullet_line_frac",
                "ellipsis_line_frac"] +
               [f"top_{n}gram_char_frac" for n in top_ns] +
               [f"dup_{n}gram_char_frac" for n in dup_ns])
    return ([StructField(c, LongType()) for c in longs] +
            [StructField(c, DoubleType()) for c in doubles])


def repetition_metrics(df: DataFrame, *, text_col: str = "text",
                       id_col: str = "doc_id",
                       top_ns: tuple = DEFAULT_TOP_NS,
                       dup_ns: tuple = DEFAULT_DUP_NS,
                       keep_cols: tuple = ()) -> DataFrame:
    """Per-document repetition/quality metrics: ``(id_col, <keep_cols>,
    <metrics>)``.

    One Arrow-batched projection — no shuffle, no driver round-trip; at
    100 TB this is a pure map over the corpus scan, and the metric
    columns prune to exactly what downstream selects.  ``keep_cols``
    pass through unchanged — the downstream-filter alternative (join the
    metric frame back on the id) would shuffle the whole corpus.
    """
    fields = _metric_fields(top_ns, dup_ns)
    schema = StructType(fields)
    names = [f.name for f in fields]
    empty = {n: None for n in names}

    @F.pandas_udf(schema)
    def _metrics(raw: pd.Series, norm: pd.Series) -> pd.DataFrame:
        rows = [
            empty if r is None else _doc_metrics(r, s, top_ns, dup_ns)
            for r, s in zip(raw, norm)
        ]
        return pd.DataFrame(rows, columns=names, dtype=object)

    t = F.col(text_col)
    # asNondeterministic: quality-filter consumers filter on metric
    # columns, and the optimizer pushes that filter below this
    # projection by CLONING the UDF — two ArrowEvalPython nodes, every
    # document's metrics computed twice (guide §4.4; measured r7 in the
    # curation pipeline: stage 1 1.66s -> single-eval cost).  The
    # function is semantically deterministic; results are unchanged.
    return (df.select(F.col(id_col), *[F.col(c) for c in keep_cols],
                      _metrics.asNondeterministic()(
                          t, normalized_text(t)).alias("_m"))
            .select(id_col, *keep_cols, "_m.*"))


def gopher_quality_flags(df: DataFrame, *, text_col: str = "text",
                         id_col: str = "doc_id",
                         thresholds: dict | None = None) -> DataFrame:
    """Per-document Gopher filter verdicts over the full rule set.

    Returns ``(id_col, fail_length, fail_symbols, fail_layout,
    fail_dictionary, fail_line_rep, fail_ngram_rep, keep)`` — the six
    rule groups of Gopher Table A1, plus the conjunction.  Threshold
    overrides merge over :data:`GOPHER_THRESHOLDS`.
    """
    th = dict(GOPHER_THRESHOLDS)
    th.update(thresholds or {})
    m = repetition_metrics(df, text_col=text_col, id_col=id_col)

    def col(n: str) -> Column:
        return F.col(n)

    fail_length = (col("n_words") < th["min_words"]) | \
        (col("n_words") > th["max_words"]) | \
        (col("mean_word_len") < th["min_mean_word_len"]) | \
        (col("mean_word_len") > th["max_mean_word_len"])
    fail_symbols = col("symbol_word_ratio") > th["max_symbol_word_ratio"]
    fail_layout = \
        (col("bullet_line_frac") > th["max_bullet_line_frac"]) | \
        (col("ellipsis_line_frac") > th["max_ellipsis_line_frac"])
    fail_dictionary = \
        (col("alpha_word_frac") < th["min_alpha_word_frac"]) | \
        (col("stopword_hits") < th["min_stopword_hits"])
    fail_line_rep = \
        (col("dup_line_frac") > th["max_dup_line_frac"]) | \
        (col("dup_para_frac") > th["max_dup_para_frac"]) | \
        (col("dup_line_char_frac") > th["max_dup_line_char_frac"]) | \
        (col("dup_para_char_frac") > th["max_dup_para_char_frac"])
    ngram_terms = [col(f"top_{n}gram_char_frac") >
                   th[f"max_top_{n}gram_char_frac"]
                   for n in DEFAULT_TOP_NS]
    ngram_terms += [col(f"dup_{n}gram_char_frac") >
                    th[f"max_dup_{n}gram_char_frac"]
                    for n in DEFAULT_DUP_NS]
    fail_ngram_rep = ngram_terms[0]
    for t in ngram_terms[1:]:
        fail_ngram_rep = fail_ngram_rep | t

    groups = {
        "fail_length": fail_length,
        "fail_symbols": fail_symbols,
        "fail_layout": fail_layout,
        "fail_dictionary": fail_dictionary,
        "fail_line_rep": fail_line_rep,
        "fail_ngram_rep": fail_ngram_rep,
    }
    out = m.select(id_col, *[v.alias(k) for k, v in groups.items()])
    keep = ~F.col("fail_length")
    for k in list(groups)[1:]:
        keep = keep & ~F.col(k)
    return out.withColumn("keep", keep)


def ppm(col: Column) -> Column:
    """``floor(metric * 1e6)`` as bigint — the oracle-comparable integer
    projection of a deterministic double metric (floor, never cast:
    DuckDB's CAST(double AS BIGINT) rounds)."""
    return F.floor(col * F.lit(1_000_000.0)).cast("bigint")


# DuckDB CTEs shared by the oracle generators: normalized words, the
# top-2-gram winner (ties: count desc, chars desc, gram asc — the same
# total order _doc_metrics minimizes), duplicated-5-gram chars, and the
# RAW-text line/paragraph duplicate fractions (dlf/dlcf/dpf/dpcf —
# non-empty split parts, NULL text stays NULL, partless text is 0.0,
# exactly _doc_metrics' arms).
# ``w[i] || ' ' || w[i+1]`` equals Python's ``' '.join`` exactly, and
# the CASE guard mirrors "empty text has zero words" (DuckDB
# string_split('', ' ') would yield ['']).
_NGRAM_CTES = r"""
norm AS (
  SELECT doc_id, text,
         lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS nt
  FROM documents
), base AS (
  SELECT doc_id, text, nt,
         CASE WHEN nt = '' THEN []::VARCHAR[]
              ELSE string_split(nt, ' ') END AS w,
         length(nt) AS nc
  FROM norm
), base2 AS (
  SELECT doc_id, text, nt, w, nc, len(w) AS nw FROM base
), g2 AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(nw - 1, 0) + 1),
         i -> w[i] || ' ' || w[i + 1])) AS g
  FROM base2
), c2 AS (
  SELECT doc_id, g, count(*) AS c, length(g) AS lg
  FROM g2 GROUP BY doc_id, g
), t2 AS (
  SELECT doc_id, c * lg AS chars FROM (
    SELECT doc_id, c, lg,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY c DESC, lg DESC, g ASC) AS rn
    FROM c2) WHERE rn = 1
), g5 AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(nw - 4, 0) + 1),
         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
              w[i+3] || ' ' || w[i+4])) AS g
  FROM base2
), c5 AS (
  SELECT doc_id, g, count(*) AS c, length(g) AS lg
  FROM g5 GROUP BY doc_id, g
), d5 AS (
  SELECT doc_id, sum(CASE WHEN c >= 2 THEN c * lg ELSE 0 END) AS chars
  FROM c5 GROUP BY doc_id
), lc AS (
  SELECT doc_id, p, count(*) AS c, length(p) AS lp
  FROM (SELECT doc_id, unnest(list_filter(
            string_split(text, chr(10)), x -> x <> '')) AS p
        FROM norm)
  GROUP BY doc_id, p
), lmet AS (
  SELECT doc_id,
         CAST(sum(c) - count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
           AS dlf,
         CAST(sum(CASE WHEN c >= 2 THEN c * lp ELSE 0 END) AS DOUBLE)
           / CAST(sum(c * lp) AS DOUBLE) AS dlcf
  FROM lc GROUP BY doc_id
), pc AS (
  SELECT doc_id, p, count(*) AS c, length(p) AS lp
  FROM (SELECT doc_id, unnest(list_filter(
            string_split(text, chr(10) || chr(10)), x -> x <> '')) AS p
        FROM norm)
  GROUP BY doc_id, p
), pmet AS (
  SELECT doc_id,
         CAST(sum(c) - count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
           AS dpf,
         CAST(sum(CASE WHEN c >= 2 THEN c * lp ELSE 0 END) AS DOUBLE)
           / CAST(sum(c * lp) AS DOUBLE) AS dpcf
  FROM pc GROUP BY doc_id
), met AS (
  SELECT b.doc_id, b.nw,
         CASE WHEN b.text IS NULL THEN NULL
              ELSE coalesce(lmet.dlf, 0.0) END AS dlf,
         CASE WHEN b.text IS NULL THEN NULL
              ELSE coalesce(lmet.dlcf, 0.0) END AS dlcf,
         CASE WHEN b.text IS NULL THEN NULL
              ELSE coalesce(pmet.dpf, 0.0) END AS dpf,
         CASE WHEN b.text IS NULL THEN NULL
              ELSE coalesce(pmet.dpcf, 0.0) END AS dpcf,
         least(1.0, coalesce(CAST(t2.chars AS DOUBLE)
                             / nullif(b.nc, 0), 0.0)) AS top2,
         least(1.0, coalesce(CAST(d5.chars AS DOUBLE)
                             / nullif(b.nc, 0), 0.0)) AS dup5,
         CASE WHEN b.nw = 0 THEN 0.0
              ELSE CAST(b.nc - (b.nw - 1) AS DOUBLE) / b.nw END AS mwl,
         CASE WHEN b.nw = 0 THEN 0.0
              ELSE CAST(len(list_filter(b.w,
                   x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / b.nw
              END AS awf,
         (CAST(list_contains(b.w, 'the') AS INT) +
          CAST(list_contains(b.w, 'be') AS INT) +
          CAST(list_contains(b.w, 'to') AS INT) +
          CAST(list_contains(b.w, 'of') AS INT) +
          CAST(list_contains(b.w, 'and') AS INT) +
          CAST(list_contains(b.w, 'that') AS INT) +
          CAST(list_contains(b.w, 'have') AS INT) +
          CAST(list_contains(b.w, 'with') AS INT)) AS stop_hits,
         CAST(length(b.text) - length(replace(b.text, '#', ''))
              + (length(b.text) - length(replace(b.text, '...', ''))) // 3
              + length(b.text) - length(replace(b.text, '…', ''))
              AS DOUBLE) / greatest(b.nw, 1) AS swr
  FROM base2 b LEFT JOIN t2 USING (doc_id) LEFT JOIN d5 USING (doc_id)
       LEFT JOIN lmet USING (doc_id) LEFT JOIN pmet USING (doc_id)
)"""


def repetition_metrics_oracle_sql() -> str:
    """DuckDB reproduction of the ``repetition_metrics`` gate query:
    per-document floor(frac*1e6) of the top-2-gram / dup-5-gram
    character fractions, bit-exact (see module docstring for why the
    doubles agree)."""
    return f"""
        WITH {_NGRAM_CTES}
        SELECT doc_id,
               CAST(floor(top2 * 1000000.0) AS BIGINT) AS top2_ppm,
               CAST(floor(dup5 * 1000000.0) AS BIGINT) AS dup5_ppm,
               CAST(nw AS BIGINT) AS n_words
        FROM met
    """


def gopher_flags_oracle_sql() -> str:
    """DuckDB reproduction of the ``gopher_flags`` gate query: rejection
    counts over the word-level Gopher rules."""
    return f"""
        WITH {_NGRAM_CTES}
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN nw < 50 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_short,
               CAST(sum(CASE WHEN mwl < 3.0 OR mwl > 10.0 THEN 1 ELSE 0
                    END) AS BIGINT) AS n_wordlen,
               CAST(sum(CASE WHEN awf < 0.8 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_low_alpha,
               CAST(sum(CASE WHEN stop_hits < 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_low_stop,
               CAST(sum(CASE WHEN swr > 0.1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_symbols,
               CAST(sum(CASE WHEN top2 > 0.20 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_top2,
               CAST(sum(CASE WHEN dup5 > 0.15 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup5
        FROM met
    """


def brute_force_metrics(raw: str | None, *, top_ns=DEFAULT_TOP_NS,
                        dup_ns=DEFAULT_DUP_NS) -> dict | None:
    """Driver-side single-doc reference (tests): normalizes in Python
    with the same semantics the JVM applies.  Two traps the fuzz caught:
    Spark/DuckDB ``trim`` strips SPACES only (``strip(' ')``, not
    ``strip()``), and Java's ``\\s`` is the ASCII set ``[ \\t\\n\\v\\f\\r]``
    while Python's is Unicode-aware (``\\x85``, ``\\xa0``, ...) —
    ``re.ASCII`` pins the Java set."""
    if raw is None:
        return None
    norm = re.sub(r"\s+", " ", raw.strip(" "), flags=re.ASCII).lower()
    return _doc_metrics(raw, norm, top_ns, dup_ns)
