"""C4 line cleaning, boilerplate removal, and vocab aggregation."""

import pytest
from pyspark.sql import functions as F

from boon_spark.operators.cleaning import (boilerplate_stats,
                                           c4_clean_text, c4_line_flags,
                                           remove_boilerplate,
                                           token_frequencies, vocab_topk)

KEEP = "A perfectly fine sentence with enough words to pass!"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_c4_line_predicate_branches(spark):
    text = "\n".join([
        KEEP,                          # kept
        "short line.",                 # < 5 words
        "JavaScript is required to view this page properly.",  # js
        "no terminal punctuation here at all",                 # punct
        "Quoted endings count as terminal punctuation here.\"",  # kept
        "   Trailing spaces after the punctuation survive trim.   ",
        "",                            # empty
    ])
    out = c4_line_flags(_df(spark, [(1, text)])).collect()[0]
    assert out.n_lines == 7
    assert out.n_lines_kept == 3
    assert out.clean_text.split("\n") == [
        KEEP,
        "Quoted endings count as terminal punctuation here.\"",
        "   Trailing spaces after the punctuation survive trim.   ",
    ]


@pytest.mark.parametrize("text,keep", [
    # 3 kept lines each ending '!' = exactly 3 sentence marks → keep
    (KEEP + "\n" + KEEP + "\n" + KEEP, True),
    ("One two three four five six.\nSeven eight nine ten eleven!\n"
     "Twelve thirteen fourteen fifteen sixteen?", True),
    ("One two three four five six.\nlorem ipsum dolor sit amet here.\n"
     "Seven eight nine ten eleven!\nTwelve thirteen fourteen fifteen?",
     False),                                      # lorem ipsum
    ("One two three four five six. {\nSeven eight nine ten eleven!\n"
     "Twelve thirteen fourteen fifteen sixteen?", False),  # brace
    ("Only two sentence marks in this cleaned text.\n"
     "Second proper sentence with enough words here!", False),
])
def test_c4_page_verdict(spark, text, keep):
    row = c4_line_flags(_df(spark, [(1, text)])).collect()[0]
    assert bool(row.keep) is keep


def test_c4_null_and_empty(spark):
    rows = c4_line_flags(_df(spark, [(1, None), (2, "")])) \
        .orderBy("doc_id").collect()
    assert rows[0].clean_text is None and rows[0].keep is None
    assert rows[1].clean_text == "" and rows[1].n_lines == 1 \
        and rows[1].n_lines_kept == 0 and bool(rows[1].keep) is False


def test_c4_clean_text_column_matches_flags(spark):
    df = _df(spark, [(1, KEEP + "\nshort line.\n" + KEEP)])
    a = df.select(c4_clean_text(F.col("text")).alias("c")).collect()[0].c
    b = c4_line_flags(df).collect()[0].clean_text
    assert a == b == KEEP + "\n" + KEEP


BOILER = "Subscribe to our newsletter today!"


def _boiler_df(spark, n=10):
    rows = [(i, f"Unique line number {i} stays.\n{BOILER}\n"
                f"Another unique {i} line.") for i in range(n)]
    rows.append((n, "No boilerplate in this one."))
    return _df(spark, rows)


@pytest.mark.parametrize("family", ["md5", "xxhash64"])
def test_remove_boilerplate(spark, family):
    out = remove_boilerplate(_boiler_df(spark), min_df=10,
                             hash_family=family) \
        .orderBy("doc_id").collect()
    assert [r.n_lines_removed for r in out] == [1] * 10 + [0]
    assert out[0].clean_text == ("Unique line number 0 stays.\n"
                                 "Another unique 0 line.")
    assert out[10].clean_text == "No boilerplate in this one."


def test_remove_boilerplate_no_hot_lines_is_identity(spark):
    df = _boiler_df(spark)
    out = remove_boilerplate(df, min_df=100).orderBy("doc_id").collect()
    src = df.orderBy("doc_id").collect()
    assert all(o.clean_text == s.text and o.n_lines_removed == 0
               for o, s in zip(out, src))


def test_remove_boilerplate_within_doc_repeats_count_once(spark):
    # 3 docs each repeating the line twice: df = 3 (distinct docs), so
    # min_df=4 leaves it; min_df=3 removes BOTH copies per doc
    rows = [(i, f"{BOILER}\nmiddle {i}\n{BOILER}") for i in range(3)]
    df = _df(spark, rows)
    kept = remove_boilerplate(df, min_df=4).collect()
    assert all(r.n_lines_removed == 0 for r in kept)
    gone = remove_boilerplate(df, min_df=3).orderBy("doc_id").collect()
    assert all(r.n_lines_removed == 2 for r in gone)
    assert gone[0].clean_text == "middle 0"


def test_remove_boilerplate_guards(spark):
    df = _boiler_df(spark)
    with pytest.raises(ValueError, match="min_df"):
        remove_boilerplate(df, min_df=1)
    with pytest.raises(ValueError, match="max_hot"):
        # every per-doc unique line is hot at min_df=2? no — make the
        # shared line hot and cap at 0 to force the loud error
        remove_boilerplate(df, min_df=2, max_hot=0)
    with pytest.raises(ValueError, match="hash_family"):
        remove_boilerplate(df, min_df=2, hash_family="sha1")


def test_boilerplate_stats(spark):
    row = boilerplate_stats(_boiler_df(spark), min_df=10).collect()[0]
    assert row.n_hot_lines == 1
    assert row.max_df == 10
    # 10 docs x 3 distinct lines (2 unique + shared) + 1 single-line doc
    assert row.n_candidate_lines == 22


def test_whitespace_lines_never_hot(spark):
    rows = [(i, f"   \nreal {i} line.\n   ") for i in range(5)]
    out = remove_boilerplate(_df(spark, rows), min_df=2) \
        .orderBy("doc_id").collect()
    assert all(r.n_lines_removed == 0 for r in out)
    assert out[0].clean_text == "   \nreal 0 line.\n   "


def test_vocab_topk_deterministic_ties(spark):
    df = _df(spark, [(1, "b a"), (2, "a b"), (3, "c")])
    rows = vocab_topk(df, 3).orderBy("rank").collect()
    assert [(r.rank, r.token, r.n) for r in rows] == \
        [(1, "a", 2), (2, "b", 2), (3, "c", 1)]


def test_token_frequencies_min_count_and_empty(spark):
    df = _df(spark, [(1, "x x y"), (2, ""), (3, None)])
    rows = {r.token: r.n for r in token_frequencies(df).collect()}
    assert rows == {"x": 2, "y": 1}
    rows2 = {r.token: r.n
             for r in token_frequencies(df, min_count=2).collect()}
    assert rows2 == {"x": 2}
