"""Composed curation pipeline: quality filter → exact dedup → sample →
split, oracle-exact END TO END.

Each stage already exists as an operator with its own bit-exact DuckDB
oracle; this module pins that they COMPOSE — the practical question a
pipeline owner actually has ("if I chain the filter, the dedup, the
sampler, and the splitter, is the result still reproducible outside
Spark?").  One gate query covers the full chain with one generated
oracle assembled from the stage generators, so a drift in ANY stage's
cross-engine contract surfaces here even if its own gate still passes
on the stage in isolation.

Stages (all reusing the shared definitions — no re-implementations):

1. **quality filter** — the SQL-expressible subset of the Gopher rules
   over :func:`..repetition.repetition_metrics` columns
   (:data:`REDUCED_RULES`; thresholds from ``GOPHER_THRESHOLDS``),
   including the line/paragraph duplicate fractions (r6 — their oracle
   CTEs live in ``repetition._NGRAM_CTES``).  Still outside the
   composed oracle: bullet/ellipsis layout fracs and the n>2 top- /
   n>5 dup-gram tails.  NULL-text rows have NULL metrics, so every
   comparison is NULL and both engines drop them (SQL three-valued
   logic is the shared semantics).
2. **exact dedup** — keep the minimum-id document per
   ``md5(normalized_text)`` group (same hash as
   :func:`..dedup.exact_duplicates`).
3. **deterministic sample** — :func:`..sampling.hash_sample`.
4. **split + stats** — :func:`..sampling.split_assign`, then
   per-(split, source) document/token counts (token = the shared
   :func:`..search.doc_len` definition).

Scale shape: stage 1 is a pure Arrow-batched map (metrics computed with
pass-through columns — never a corpus self-join); stage 2 is the one
content shuffle (16-byte digest keys); stages 3–4 are row-local filters
plus a tiny final aggregate.  The corpus crosses the wire once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalized_text
from .repetition import GOPHER_THRESHOLDS, repetition_metrics
from .sampling import (hash_sample, hash_sample_oracle_where,
                       split_assign, split_assign_oracle_case)
from .search import _NORM_SQL, _dl_sql, doc_len

#: the SQL-expressible Gopher subset: (engine metric column, oracle
#: ``met`` column, operator, threshold key) — ONE table renders both
#: engines' predicates, so they cannot drift
REDUCED_RULES = (
    ("n_words", "nw", ">=", "min_words"),
    ("n_words", "nw", "<=", "max_words"),
    ("mean_word_len", "mwl", ">=", "min_mean_word_len"),
    ("mean_word_len", "mwl", "<=", "max_mean_word_len"),
    ("alpha_word_frac", "awf", ">=", "min_alpha_word_frac"),
    ("stopword_hits", "stop_hits", ">=", "min_stopword_hits"),
    ("symbol_word_ratio", "swr", "<=", "max_symbol_word_ratio"),
    ("top_2gram_char_frac", "top2", "<=", "max_top_2gram_char_frac"),
    ("dup_5gram_char_frac", "dup5", "<=", "max_dup_5gram_char_frac"),
    ("dup_line_frac", "dlf", "<=", "max_dup_line_frac"),
    ("dup_line_char_frac", "dlcf", "<=", "max_dup_line_char_frac"),
    ("dup_para_frac", "dpf", "<=", "max_dup_para_frac"),
    ("dup_para_char_frac", "dpcf", "<=", "max_dup_para_char_frac"),
)


def _keep_predicate(thresholds: dict):
    pred = None
    for col, _, op, key in REDUCED_RULES:
        t = thresholds[key]
        c = F.col(col)
        term = c >= F.lit(t) if op == ">=" else c <= F.lit(t)
        pred = term if pred is None else pred & term
    return pred


def curate(df: DataFrame, *, text_col: str = "text",
           id_col: str = "doc_id", strata_col: str = "source",
           sample_fraction: float = 0.5, sample_seed: int = 33,
           split_weights: dict | None = None, split_seed: int = 34,
           thresholds: dict | None = None,
           len_col: str | None = None) -> DataFrame:
    """The curated, split corpus: ``df``'s rows that pass the reduced
    quality rules, survive exact dedup (min-id keeper), and fall in the
    deterministic sample — with a ``split`` label appended.  See the
    module docstring for stage semantics and the scale shape.

    ``len_col``: optionally materialize the shared ``doc_len`` token
    count under this name in the STAGE-1 projection — i.e. before the
    dedup exchange, where the scan parallelism is still available —
    so downstream audits never re-run the tokenizing regex on the
    (AQE-coalesced, possibly single-task) post-window side (r7; guide
    §2.3 project-early)."""
    th = dict(GOPHER_THRESHOLDS)
    th.update(thresholds or {})
    m = repetition_metrics(df, text_col=text_col, id_col=id_col,
                           keep_cols=(strata_col, text_col))
    extra = ([doc_len(F.col(text_col)).alias(len_col)]
             if len_col else [])
    kept = (m.filter(_keep_predicate(th))
            .select(id_col, strata_col, text_col, *extra))
    h = F.md5(normalized_text(F.col(text_col)))
    w = Window.partitionBy("_h")
    surv = (kept.withColumn("_h", h)
            .withColumn("_keep", F.min(id_col).over(w))
            .filter(F.col(id_col) == F.col("_keep"))
            .drop("_h", "_keep"))
    samp = hash_sample(surv, sample_fraction, key_col=id_col,
                       seed=sample_seed)
    weights = split_weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    return split_assign(samp, weights, key_col=id_col, seed=split_seed)


def curation_stats(df: DataFrame, **kw) -> DataFrame:
    """Per-(split, source) audit of :func:`curate`: ``(split, source,
    n_docs, n_tokens)`` — the end-to-end composition gate's output."""
    strata_col = kw.get("strata_col", "source")
    out = curate(df, len_col="_dl", **kw)
    return (out.groupBy(F.col("split"), F.col(strata_col).alias("source"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.coalesce(F.sum("_dl"), F.lit(0))
                 .cast("long").alias("n_tokens")))


# ----------------------------------------------------------------- #
# DuckDB oracle generator                                            #
# ----------------------------------------------------------------- #


def _keep_where(thresholds: dict) -> str:
    terms = []
    for _, met, op, key in REDUCED_RULES:
        t = thresholds[key]
        lit = repr(float(t)) if isinstance(t, float) else str(t)
        terms.append(f"m.{met} {op} {lit}")
    return " AND ".join(terms)


def curation_stats_oracle_sql(*, sample_fraction: float = 0.5,
                              sample_seed: int = 33,
                              split_weights: dict | None = None,
                              split_seed: int = 34,
                              thresholds: dict | None = None) -> str:
    """DuckDB query reproducing :func:`curation_stats` bit-for-bit,
    assembled from the STAGE generators: the repetition ``met`` CTEs,
    the dedup hash, the hash-sample WHERE, and the split CASE."""
    from .repetition import _NGRAM_CTES
    th = dict(GOPHER_THRESHOLDS)
    th.update(thresholds or {})
    weights = split_weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    where = hash_sample_oracle_where(key_sql="doc_id",
                                     fraction=sample_fraction,
                                     seed=sample_seed)
    case = split_assign_oracle_case(key_sql="doc_id", weights=weights,
                                    seed=split_seed)
    return f"""
        WITH {_NGRAM_CTES},
        kept AS (
          SELECT d.doc_id, d.source, d.text
          FROM documents d JOIN met m ON m.doc_id = d.doc_id
          WHERE {_keep_where(th)}),
        surv AS (
          SELECT doc_id, source, text FROM (
            SELECT *, min(doc_id) OVER (PARTITION BY
              md5({_NORM_SQL.format(c='text')})) AS _keep
            FROM kept)
          WHERE doc_id = _keep),
        samp AS (
          SELECT doc_id, source, text FROM surv WHERE {where})
        SELECT {case} AS split, source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(coalesce(sum({_dl_sql('text')}), 0) AS BIGINT)
                 AS n_tokens
        FROM samp GROUP BY 1, 2
    """
