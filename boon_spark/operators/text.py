"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All JVM-side column expressions (regexp_count / length arithmetic) —
no Python in the hot path — so they ride whole-stage codegen and compose
with the validation projection.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# language → stopword alternation (word-bounded).  Deliberately small and
# deterministic: a heuristic n-gram/stopword scorer, not a model.
LANG_PATTERNS = {
    "en": r"\b(the|and|of|to|is|in|that|it|was|for)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ich|ein|zu|den)\b",
    "fr": r"\b(le|la|les|et|est|que|une|des|dans|pour)\b",
    "es": r"\b(el|los|las|es|una|que|por|con|para|del)\b",
}
# zh: CJK character density instead of stopwords
CJK_PATTERN = r"[一-鿿]"


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language evidence counts (integer columns)."""
    out = {lang: F.regexp_count(text, F.lit(pat))
           for lang, pat in LANG_PATTERNS.items()}
    out["zh"] = F.regexp_count(text, F.lit(CJK_PATTERN))
    return out


def language_id(text: Column) -> Column:
    """Predicted language label: argmax of evidence counts with a fixed
    priority order (en > de > fr > es > zh) on ties; 'und' when no
    evidence at all."""
    scores = lang_scores(text)
    order = ["en", "de", "fr", "es", "zh"]
    best = reduce(lambda a, b: F.greatest(a, b),
                  [scores[k] for k in order])
    expr = F.lit("und")
    for lang in reversed(order):
        expr = F.when((scores[lang] == best) & (best > 0),
                      F.lit(lang)).otherwise(expr)
    return expr


def whitespace_token_count(text: Column) -> Column:
    return F.size(F.split(F.trim(text), r"\s+"))


def bpe_ish_token_count(text: Column) -> Column:
    """Approximate BPE token count: words + standalone punctuation, with a
    4-chars-per-token correction for long words (a cheap stand-in for
    subword splitting)."""
    words = F.regexp_count(text, F.lit(r"[A-Za-z0-9_]+"))
    punct = F.regexp_count(text, F.lit(r"[^\sA-Za-z0-9_]"))
    long_chars = F.length(F.regexp_replace(text, r"[^A-Za-z0-9_]", ""))
    subword_extra = F.greatest(
        (long_chars / F.lit(4)).cast("long") - words, F.lit(0))
    return (words + punct + subword_extra).cast("long")


def quality_components(text: Column) -> dict[str, Column]:
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_punct = F.regexp_count(text, F.lit(r"[.!?,;:]"))
    n_stop = F.regexp_count(
        text, F.lit(r"\b(the|and|of|to|a|is|in|that)\b"))
    n_words = whitespace_token_count(text)
    return {
        "n_chars": n_chars,
        "alpha_ratio": n_alpha / F.greatest(n_chars, F.lit(1)),
        "punct_per_word": n_punct / F.greatest(n_words, F.lit(1)),
        "stopword_ratio": n_stop / F.greatest(n_words, F.lit(1)),
        "mean_word_len": n_chars / F.greatest(n_words, F.lit(1)),
    }


def quality_score(text: Column) -> Column:
    """Composite quality in [0, 1]: length sweet-spot, alphabetic density,
    sane punctuation rate, stopword presence."""
    c = quality_components(text)
    len_score = F.least(c["n_chars"] / F.lit(200.0), F.lit(1.0)) * \
        F.when(c["n_chars"] > 20000, F.lit(0.5)).otherwise(F.lit(1.0))
    alpha_score = c["alpha_ratio"]
    punct_score = F.when(c["punct_per_word"] > 1.0, F.lit(0.3)) \
        .otherwise(F.lit(1.0))
    stop_score = F.least(c["stopword_ratio"] * F.lit(5.0), F.lit(1.0))
    return ((len_score + alpha_score + punct_score + stop_score) / 4) \
        .cast("double")


def rolling_fingerprint(text: Column, *, window: int = 4) -> Column:
    """Winnowing-style document fingerprint: minimum md5-derived hash over
    the document's word ``window``-grams — robust to local edits away from
    the minimizing window (contrast md5-of-whole-text)."""
    from .dedup import _hash_shingle, word_shingles
    sh = word_shingles(text, window)
    return F.coalesce(
        F.array_min(F.transform(sh, lambda s: _hash_shingle(s, 0))),
        F.lit(0).cast("long"))


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One projection adding lang_pred / token counts / quality /
    fingerprint columns."""
    t = F.col(text_col)
    comp = quality_components(t)
    return df.select(
        "*",
        language_id(t).alias("lang_pred"),
        whitespace_token_count(t).cast("long").alias("n_tokens_ws"),
        bpe_ish_token_count(t).alias("n_tokens_bpe"),
        quality_score(t).alias("quality"),
        comp["alpha_ratio"].alias("alpha_ratio"),
        comp["stopword_ratio"].alias("stopword_ratio"),
        rolling_fingerprint(t).alias("fingerprint"))


def fertility_stats(df: DataFrame, *, chars_col: str = "n_chars",
                    ntok_col: str = "n_tok",
                    by: str = "source") -> DataFrame:
    """Tokenizer fertility audit per group: ``(by, n_docs, sum_chars,
    sum_toks, fertility_ppm)`` where fertility_ppm = chars per token in
    parts-per-million (``1e6·Σchars DIV Σtoks`` — exact integer, the
    repo's no-raw-float rule).  The audit every tokenizer swap runs:
    fertility regressions mean the new vocab splits this source's text
    into more pieces.  Docs with zero/NULL tokens are counted in
    ``n_docs`` but excluded from both sums (a 0-token doc has no
    fertility).  One partial-aggregated group shuffle."""
    tok = F.coalesce(F.col(ntok_col).cast("long"), F.lit(0))
    chars = F.coalesce(F.col(chars_col).cast("long"), F.lit(0))
    pos = tok > 0
    return (df.groupBy(by)
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum(F.when(pos, chars).otherwise(0)).cast("long")
                 .alias("sum_chars"),
                 F.sum(F.when(pos, tok).otherwise(0)).cast("long")
                 .alias("sum_toks"))
            .withColumn("fertility_ppm",
                        F.expr("CASE WHEN sum_toks > 0 THEN "
                               "(sum_chars * 1000000) div sum_toks "
                               "ELSE NULL END").cast("long")))
