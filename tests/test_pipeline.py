"""Composed curation pipeline: stage composition, oracle parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from boon_spark.operators.pipeline import (REDUCED_RULES, curate,
                                           curation_stats,
                                           curation_stats_oracle_sql)

#: easy thresholds so tiny test docs can pass; min_words=3 stays active
EASY = {"min_words": 3, "min_stopword_hits": 0, "min_mean_word_len": 1.0,
        "max_top_2gram_char_frac": 1.0, "max_dup_5gram_char_frac": 1.0}

DOCS = [
    (1, "srcA", "the quick brown fox jumps over the lazy dog"),
    (2, "srcA", "the quick brown fox jumps over the lazy dog"),  # dup of 1
    (3, "srcA", "The  Quick  Brown Fox jumps over the lazy dog"),  # norm-dup
    (4, "srcB", "completely different words in another document here"),
    (5, "srcB", "too short"),                       # fails min_words=3? no: 2 words
    (6, "srcB", None),                              # NULL text
    (7, "srcA", "yet another unique document with plenty of words inside"),
    (8, "srcB", "numbers 123 456 789 000 111 222"),  # low alpha frac
    (9, "srcA", "same line here\nsame line here\nsame line here\n"
                "a unique closing line"),            # dup_line_frac 0.5
    (10, "srcB", "para one sits right here\n\npara one sits right here"
                 "\n\nthe closing paragraph text"),  # dup_para_frac 1/3
]


def _df(spark):
    return spark.createDataFrame(DOCS,
                                 "doc_id long, source string, text string")


def _con():
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, source VARCHAR, "
                "text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", DOCS)
    return con


def test_curate_stage_semantics(spark):
    out = {r.doc_id: r.split
           for r in curate(_df(spark), sample_fraction=1.0,
                           thresholds=EASY).collect()}
    # doc 5 (2 words) fails min_words; doc 6 NULL text; doc 8 alpha frac;
    # docs 2 and 3 are exact dups of 1 after normalization — min id kept
    assert 1 in out
    assert 2 not in out and 3 not in out
    assert 5 not in out and 6 not in out and 8 not in out
    assert 4 in out and 7 in out
    # the r6 line/paragraph duplicate rules (active at the 0.30/0.20
    # Gopher defaults — EASY doesn't relax them)
    assert 9 not in out and 10 not in out
    assert set(out.values()) <= {"train", "val", "test"}


def test_stats_match_oracle_bit_exact(spark):
    got = [(r.split, r.source, r.n_docs, r.n_tokens)
           for r in curation_stats(_df(spark), sample_fraction=0.7,
                                   thresholds=EASY)
           .orderBy("split", "source").collect()]
    want = _con().execute(
        curation_stats_oracle_sql(sample_fraction=0.7, thresholds=EASY)
        + " ORDER BY split, source").fetchall()
    assert got == [tuple(w) for w in want]
    assert got  # non-degenerate


def test_default_thresholds_apply(spark):
    # with the real Gopher defaults every tiny doc fails min_words=50
    assert curate(_df(spark)).count() == 0


def test_rule_table_covers_both_renderings():
    # every rule names a real engine metric and a real met column
    from boon_spark.operators.repetition import GOPHER_THRESHOLDS
    for col, met, op, key in REDUCED_RULES:
        assert key in GOPHER_THRESHOLDS
        assert op in (">=", "<=")


def test_no_corpus_self_join_in_plan(spark, tmp_path):
    df = _df(spark)
    p = str(tmp_path / "cur.parquet")
    df.write.parquet(p)
    plan = (curate(spark.read.parquet(p), thresholds=EASY)
            ._jdf.queryExecution().executedPlan().toString())
    # metrics pass through keep_cols — the corpus is never joined back
    # to itself (stage 1 is a pure Arrow map; only the dedup window
    # exchanges)
    assert "Join" not in plan
    assert "ArrowEvalPython" in plan or "EvalPython" in plan


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_word = st.sampled_from(["alpha", "beta", "gamma", "the", "and",
                         "words", "of", "text", "x1", "..."])


@st.composite
def _pdoc(draw):
    pick = draw(st.integers(0, 10))
    if pick == 0:
        return draw(st.sampled_from([None, "", "  "]))
    words = draw(st.lists(_word, min_size=1, max_size=10))
    # newline-bearing joiners exercise the r6 line/para dup rules
    sep = draw(st.sampled_from([" ", " ", " ", "\n", "\n\n"]))
    return sep.join(words)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(docs=st.lists(_pdoc(), min_size=1, max_size=12),
       frac=st.floats(0.1, 1.0, allow_nan=False))
def test_curation_pipeline_cross_engine_fuzz(spark, docs, frac):
    # the full four-stage composition under random corpora and random
    # sample fractions — duplicates (hypothesis repeats docs often)
    # exercise the dedup stage, NULL/blank docs the filter stage
    rows = [(i, "src%d" % (i % 3), t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = sorted(tuple(r) for r in
                 curation_stats(df, sample_fraction=frac,
                                thresholds=EASY).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, source VARCHAR, "
                "text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)",
                    [(i, s, t) for i, s, t in rows])
    want = sorted(tuple(w) for w in con.execute(curation_stats_oracle_sql(
        sample_fraction=frac, thresholds=EASY)).fetchall())
    con.close()
    assert got == want, f"docs={docs!r} frac={frac!r}"
