"""Gopher-style repetition/quality filters (operators/repetition.py).

The oracle-paired gate queries (repetition_metrics / gopher_flags in
__spark_entry__.py, exercised by test_oracle_parity) pin the n-gram and
word-level metrics against DuckDB bit-for-bit; this file pins the rest:
hand-computed values for every metric family, the full flag rule set,
NULL/empty/whitespace edges, the brute-force parity of the Arrow
plumbing, and the zero-shuffle plan claim.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from boon_spark.operators.repetition import (GOPHER_THRESHOLDS,
                                             brute_force_metrics,
                                             gopher_quality_flags,
                                             repetition_metrics)

DOCS = [
    ("a", "a a a a a"),
    ("b", "one two one two one two seven"),
    ("c", "dup line\ndup line\nunique\n- bullet\nend..."),
    ("d", None),
    ("e", ""),
    ("f", "\n the  THE the\tbe of and that have with # ... … x9"),
    ("g", "para one\n\npara one\n\npara two"),
    ("h", "p q r s t p q r s t x y z"),
    ("i", "こんにちは world  こん"),
]


def _collect(spark, docs):
    df = spark.createDataFrame(docs, "doc_id string, text string")
    return {r["doc_id"]: r.asDict()
            for r in repetition_metrics(df).collect()}


def test_hand_computed_values(spark):
    rows = _collect(spark, DOCS)
    # "a a a a a": 'a a' x4, 4*3=12 chars > 9 total -> capped
    assert rows["a"]["top_2gram_char_frac"] == 1.0
    assert rows["a"]["dup_5gram_char_frac"] == 0.0  # one 5-gram, count 1
    assert rows["a"]["mean_word_len"] == 1.0
    # "one two" x3 of 7 chars over 29 normalized chars
    assert rows["b"]["top_2gram_char_frac"] == 21 / 29
    assert rows["b"]["stopword_hits"] == 0
    # lines: [dup line, dup line, unique, - bullet, end...]
    assert rows["c"]["dup_line_frac"] == 1 / 5
    assert rows["c"]["dup_line_char_frac"] == 16 / 36
    assert rows["c"]["bullet_line_frac"] == 1 / 5
    assert rows["c"]["ellipsis_line_frac"] == 1 / 5
    assert rows["c"]["dup_para_frac"] == 0.0  # no blank line -> 1 para
    # NULL text -> NULL metrics
    assert all(v is None for k, v in rows["d"].items() if k != "doc_id")
    # empty text -> zero words/lines, all-zero metrics
    assert rows["e"]["n_words"] == 0 and rows["e"]["n_lines"] == 0
    assert rows["e"]["top_2gram_char_frac"] == 0.0
    # 7 of the 8 Gopher stopwords (no 'a'... 'the' dup counts once)
    assert rows["f"]["stopword_hits"] == 7
    assert rows["f"]["symbol_word_ratio"] == 3 / rows["f"]["n_words"]
    # paragraphs: [para one, para one, para two]
    assert rows["g"]["dup_para_frac"] == 1 / 3
    assert rows["g"]["dup_para_char_frac"] == 16 / 24
    # "p q r s t" appears twice among the nine 5-grams: 2*9 chars / 25
    assert rows["h"]["dup_5gram_char_frac"] == 18 / 25
    # non-ASCII words carry no [a-z]
    assert rows["i"]["alpha_word_frac"] == 1 / 3


def test_matches_brute_force(spark):
    rows = _collect(spark, DOCS)
    for did, txt in DOCS:
        want = brute_force_metrics(txt)
        got = {k: v for k, v in rows[did].items() if k != "doc_id"}
        if want is None:
            assert all(v is None for v in got.values())
        else:
            assert got == want, f"doc {did}: {got} != {want}"


def test_gopher_flags_full_rule_set(spark):
    # >=50 DISTINCT words (a repeated sentence would trip the dup-ngram
    # rules), stopwords present, mean word length in [3, 10]
    long_ok = " ".join([f"w{i}x" for i in range(48)] +
                       ["the", "and", "of", "that", "have", "with"])
    docs = [
        ("ok", long_ok),
        ("short", "too short to keep the and"),
        ("bullets", "\n".join(["- item %d the of" % i for i in range(10)])
         + "\n" + " ".join(["the and of that filler word"] * 10)),
        ("dups", "\n".join(["same line the of and"] * 10)),
        ("symbols", "# " * 30 + "the and of that have with be to"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    out = {r["doc_id"]: r.asDict()
           for r in gopher_quality_flags(df).collect()}
    assert out["ok"]["keep"] is True
    assert out["short"]["fail_length"] is True
    assert out["bullets"]["fail_layout"] is True
    assert out["dups"]["fail_line_rep"] is True
    assert out["dups"]["fail_ngram_rep"] is True
    assert out["symbols"]["fail_symbols"] is True
    for d in ("short", "bullets", "dups", "symbols"):
        assert out[d]["keep"] is False
    # threshold override flips a rule
    relaxed = {r["doc_id"]: r.asDict() for r in gopher_quality_flags(
        df, thresholds={"min_words": 5}).collect()}
    assert relaxed["short"]["fail_length"] is False


def test_thresholds_complete():
    # every ngram rule key referenced by gopher_quality_flags exists
    for n in (2, 3, 4):
        assert f"max_top_{n}gram_char_frac" in GOPHER_THRESHOLDS
    for n in (5, 6, 7, 8, 9, 10):
        assert f"max_dup_{n}gram_char_frac" in GOPHER_THRESHOLDS


def test_plan_is_zero_shuffle(spark):
    df = spark.createDataFrame(DOCS[:3], "doc_id string, text string")
    plan = repetition_metrics(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan


_text_st = st.one_of(
    st.none(),
    st.text(alphabet=st.sampled_from(list("ab# .\t\n…")), max_size=60),
    st.text(max_size=80),
    st.lists(st.sampled_from(
        ["the", "be", "of", "x", "...", "- b", "word word word"]),
        max_size=15).map("\n".join))


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(texts=st.lists(_text_st, min_size=1, max_size=10))
def test_metrics_match_brute_force_fuzz(spark, texts):
    rows = _collect(spark, [(str(i), t) for i, t in enumerate(texts)])
    for i, t in enumerate(texts):
        want = brute_force_metrics(t)
        got = {k: v for k, v in rows[str(i)].items() if k != "doc_id"}
        if want is None:
            assert all(v is None for v in got.values())
        else:
            assert got == want, f"text={t!r}: {got} != {want}"
